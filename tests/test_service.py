"""Inference service tests (config #5): width routing, dynamic batching,
future resolution, stats."""

import numpy as np
import pytest

from vistaocr_tpu.data import build_synthetic_dataset
from vistaocr_tpu.data.synth import SynthConfig, SyntheticLineGenerator
from vistaocr_tpu.serve import OcrService, ServiceConfig
from vistaocr_tpu.train import PRESETS, TrainConfig, fit


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    d = tmp_path_factory.mktemp("svc_data")
    cfg = SynthConfig(language="charset", charset="abcdeo ", min_words=1, max_words=3)
    data = build_synthetic_dataset(
        str(d), num_train=96, num_val=16, height=32, max_width=384,
        config=cfg, seed=21,
    )
    run = str(tmp_path_factory.mktemp("svc_run"))
    base = dict(PRESETS["synth-tiny"])
    base.update(
        data_dir=data, snapshot_dir=run, epochs=200, max_steps=250,
        val_interval_steps=125, log_interval=100, batch_pixels=2**17,
        bucket_widths=(128, 256, 384), seed=3,
    )
    fit(TrainConfig(**base), log=lambda *a: None)
    return run + "/best", data


class TestService:
    def test_end_to_end_ocr(self, snapshot):
        snap, data = snapshot
        svc = OcrService(snap, ServiceConfig(max_batch=8, max_wait_ms=20.0,
                                             warmup=False))
        try:
            gen = SyntheticLineGenerator(
                SynthConfig(language="charset", charset="abcdeo ",
                            min_words=1, max_words=3),
                seed=99,
            )
            pairs = [gen.sample(height=32, max_width=380) for _ in range(12)]
            results = svc.ocr_lines([img for img, _ in pairs])
            assert len(results) == 12
            # the model trained to ~0 CER on this distribution: most lines
            # should come back exactly right
            exact = sum(r.text == text for r, (_, text) in zip(results, pairs))
            assert exact >= 8, [
                (r.text, t) for r, (_, t) in zip(results, pairs)
            ]
            assert svc.stats["lines"] == 12
            assert svc.stats["batches"] >= 1
            assert all(r.latency_ms > 0 for r in results)
        finally:
            svc.close()

    def test_width_routing(self, snapshot):
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(max_batch=4, warmup=False))
        try:
            narrow = np.full((32, 100), 255, np.uint8)
            wide = np.full((32, 350), 255, np.uint8)
            r1 = svc.submit(narrow).result(timeout=30)
            r2 = svc.submit(wide).result(timeout=30)
            assert r1.bucket_width == 128
            assert r2.bucket_width == 384
        finally:
            svc.close()

    def test_serve_align_coarsens_fine_ladders(self, snapshot):
        """Training ladders are fine (align=32); serving re-buckets onto
        serve_align multiples so requests don't fragment across rungs
        (measured 1448 -> 60 lines/s when a 26-rung ladder leaked into
        the service)."""
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(warmup=False, serve_align=128))
        try:
            assert all(w % 128 == 0 for w in svc.contract.bucket_widths)
            # top rung still covers the snapshot ladder's max width
            assert svc.contract.bucket_widths[-1] >= 384
        finally:
            svc.close()
        svc = OcrService(snap, ServiceConfig(warmup=False, serve_align=0))
        try:
            assert svc.contract.bucket_widths == (128, 256, 384)
        finally:
            svc.close()

    def test_init_timings_recorded(self, snapshot):
        """init_timings attributes the startup cost (ledger evidence:
        the 50k L.G init is warmup compiles, not host table builds)."""
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(max_batch=8, warmup=False))
        try:
            t = svc.init_timings
            assert set(t) == {"load_s", "tables_s", "warmup_s",
                              "warmup_graphs"}
            assert t["warmup_s"] == 0.0  # warmup=False pays nothing
            assert t["warmup_graphs"] == (
                len(svc.contract.bucket_widths) * len(svc._batch_sizes))
        finally:
            svc.close()

    def test_odd_height_input_normalized(self, snapshot):
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(max_batch=2, warmup=False))
        try:
            img = np.full((77, 200), 255, np.uint8)  # wrong height: resized
            r = svc.submit(img).result(timeout=30)
            assert isinstance(r.text, str)
        finally:
            svc.close()

    @pytest.mark.parametrize("beam_impl", ["device", "host"])
    def test_beam_decoder_modes_agree(self, snapshot, beam_impl):
        """Beam-mode service end to end in both engines; the device
        (vectorized on-TPU) and host (oracle) engines must produce the
        same transcripts on a trained model without an LM."""
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(
            max_batch=8, warmup=False, decoder="beam", beam_impl=beam_impl,
        ))
        try:
            gen = SyntheticLineGenerator(
                SynthConfig(language="charset", charset="abcdeo ",
                            min_words=1, max_words=3),
                seed=123,
            )
            pairs = [gen.sample(height=32, max_width=380) for _ in range(8)]
            results = svc.ocr_lines([img for img, _ in pairs])
            exact = sum(r.text == text for r, (_, text) in zip(results, pairs))
            assert exact >= 5, [
                (r.text, t) for r, (_, t) in zip(results, pairs)
            ]
            if not hasattr(TestService, "_beam_texts"):
                TestService._beam_texts = {}
            TestService._beam_texts[beam_impl] = [r.text for r in results]
            if len(TestService._beam_texts) == 2:
                assert (TestService._beam_texts["device"]
                        == TestService._beam_texts["host"])
        finally:
            svc.close()

    def test_device_resize_matches_host_resize(self, snapshot):
        """Odd-height requests: the on-device height normalization
        (ops/resize.py fused into the bucket graph) must transcribe the
        same as the round-2 host PIL path."""
        snap, _ = snapshot
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=77,
        )
        import numpy as np
        from PIL import Image

        imgs = []
        for _ in range(6):
            img, _t = gen.sample(height=32, max_width=350)
            h = np.random.default_rng(len(imgs)).integers(20, 60)
            scaled = np.asarray(Image.fromarray(img).resize(
                (img.shape[1] * h // 32, int(h)), Image.BILINEAR))
            imgs.append(scaled)

        out = {}
        for dev in (True, False):
            svc = OcrService(snap, ServiceConfig(
                max_batch=8, warmup=False, device_resize=dev))
            try:
                out[dev] = [r.text for r in svc.ocr_lines(imgs)]
            finally:
                svc.close()
        assert out[True] == out[False], out

    def test_submit_stress_mixed_load(self, snapshot):
        """Concurrency soak for the pipelined workers + batch-size
        ladder: many clients flooding submit() with mixed widths,
        heights (raw + contract), and arrival jitter. Every future must
        resolve with a correct-shaped result, no deadlocks, and the
        correct-height lines must still transcribe exactly (the model
        trained to ~0 CER on this distribution)."""
        import threading

        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(
            max_batch=8, max_wait_ms=3.0, warmup=False, pipeline_depth=3,
        ))
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=5,
        )
        rng = np.random.default_rng(9)
        jobs = []  # (image, expected_text_or_None)
        for i in range(48):
            img, text = gen.sample(height=32, max_width=370)
            if i % 3 == 2:  # mixed-height (raw/device-resize) requests
                from PIL import Image

                h = int(rng.integers(24, 48))
                img = np.asarray(Image.fromarray(img).resize(
                    (img.shape[1] * h // 32, h), Image.BILINEAR))
                jobs.append((img, None))
            else:
                jobs.append((img, text))

        results: dict = {}
        errors: list = []

        def client(idxs):
            try:
                futs = [(k, svc.submit(jobs[k][0])) for k in idxs]
                for k, f in futs:
                    results[k] = f.result(timeout=120)
            except Exception as e:  # pragma: no cover - failure reporting
                errors.append(e)

        try:
            threads = [
                threading.Thread(target=client, args=(range(c, 48, 4),))
                for c in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=180)
            assert not errors, errors
            assert len(results) == 48
            exact = sum(
                results[k].text == expect
                for k, (_, expect) in enumerate(jobs)
                if expect is not None
            )
            checked = sum(1 for _, e in jobs if e is not None)
            assert exact >= checked - 4, (exact, checked)
            assert svc.stats["lines"] == 48
        finally:
            svc.close()

    def test_mesh_sharded_serving_matches_single_device(self, snapshot):
        """Data-parallel serving (C18 at serve time): with mesh_data=-1
        the per-bucket graphs compile under GSPMD with the batch axis
        split over the ('data',) mesh — transcripts must be identical to
        single-device serving, and the compiled batch sizes must divide
        the mesh."""
        snap, _ = snapshot
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=44,
        )
        imgs = [gen.sample(height=32, max_width=370)[0] for _ in range(16)]
        out = {}
        for mesh_data in (0, -1):
            svc = OcrService(snap, ServiceConfig(
                max_batch=16, warmup=False, mesh_data=mesh_data,
            ))
            try:
                if mesh_data == -1:
                    n = svc._nshard
                    assert n > 1  # conftest provides 8 virtual devices
                    assert all(s % n == 0 for s in svc._batch_sizes)
                out[mesh_data] = [r.text for r in svc.ocr_lines(imgs)]
            finally:
                svc.close()
        assert out[0] == out[-1]


class TestConfidence:
    def test_greedy_confidence(self, snapshot):
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(max_batch=8, warmup=False))
        try:
            gen = SyntheticLineGenerator(
                SynthConfig(language="charset", charset="abcdeo ",
                            min_words=1, max_words=3),
                seed=7,
            )
            imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(6)]
            results = svc.ocr_lines(imgs)
            for r in results:
                assert r.confidence is not None
                assert 0.0 < r.confidence <= 1.0
            # a trained model on in-distribution input is confident
            assert np.median([r.confidence for r in results]) > 0.5
        finally:
            svc.close()

    def test_device_beam_confidence(self, snapshot):
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(
            max_batch=8, warmup=False, decoder="beam", beam_impl="device",
        ))
        try:
            gen = SyntheticLineGenerator(
                SynthConfig(language="charset", charset="abcdeo ",
                            min_words=1, max_words=3),
                seed=8,
            )
            imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(4)]
            results = svc.ocr_lines(imgs)
            for r in results:
                assert r.confidence is not None
                assert 0.0 < r.confidence <= 1.0
        finally:
            svc.close()

    def test_host_beam_has_no_confidence(self, snapshot):
        snap, _ = snapshot
        svc = OcrService(snap, ServiceConfig(
            max_batch=4, warmup=False, decoder="beam", beam_impl="host",
        ))
        try:
            img = np.full((32, 120), 255, np.uint8)
            r = svc.submit(img).result(timeout=60)
            assert r.confidence is None
        finally:
            svc.close()


class TestDeviceLMFusion:
    """Interleaved on-device LM fusion (order <= 3 dense table) at the
    service level: must agree with the host interleaved engine on the
    same LM, and report confidence through the packed wire."""

    def _lm_path(self, data, tmp_path, order=3):
        from vistaocr_tpu.data.shards import ShardedLineDataset
        from vistaocr_tpu.decode.lm import train_char_lm

        ds = ShardedLineDataset(data, "train")
        p = str(tmp_path / f"lm{order}.arpa")
        train_char_lm(list(ds.transcripts()), order=order).write_arpa(p)
        return p

    def test_fused_matches_host_interleaved(self, snapshot, tmp_path):
        snap, data = snapshot
        lm_path = self._lm_path(data, tmp_path, order=3)
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=41,
        )
        imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(8)]
        from vistaocr_tpu.decode import BeamConfig

        bc = BeamConfig(beam_width=8, topk=4, lm_alpha=0.5, lm_beta=0.2)
        results = {}
        for impl in ("device", "host"):
            svc = OcrService(snap, ServiceConfig(
                max_batch=8, warmup=False, decoder="beam", beam_impl=impl,
                lm_path=lm_path, beam=bc,
            ))
            try:
                results[impl] = svc.ocr_lines(imgs)
                if impl == "device":
                    assert svc._lm_table is not None  # fused path active
            finally:
                svc.close()
        for rd, rh in zip(results["device"], results["host"]):
            assert rd.uxxxx == rh.uxxxx
            assert rd.confidence is not None and 0 < rd.confidence <= 1.0

    def test_fused_4gram_matches_host_interleaved(self, snapshot, tmp_path):
        """Order-4 serving now fuses through the hashed context table
        (VERDICT r3 task 2) instead of falling to the 4.4x-slower
        two-pass; strings must match the host interleaved engine."""
        snap, data = snapshot
        lm_path = self._lm_path(data, tmp_path, order=4)
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=43,
        )
        imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(8)]
        from vistaocr_tpu.decode import BeamConfig
        from vistaocr_tpu.decode.lm import ArpaLM

        bc = BeamConfig(beam_width=8, topk=4, lm_alpha=0.5, lm_beta=0.2)
        svc = OcrService(snap, ServiceConfig(
            max_batch=8, warmup=False, decoder="beam", beam_impl="device",
            lm_path=lm_path, beam=bc,
        ))
        try:
            assert svc._lm_hash_kw  # hashed order-4 fusion active
            assert not svc._beam_all  # no two-pass fallback
            got = svc.ocr_lines(imgs)
        finally:
            svc.close()
        # host oracle: python expansion with the same 4-gram ArpaLM
        from vistaocr_tpu.checkpoint import load_model
        from vistaocr_tpu.decode.beam import prefix_beam_search

        model, variables, al, contract = load_model(snap)
        lm = ArpaLM.read_arpa(lm_path)
        import jax.numpy as jnp

        for img, r in zip(imgs, got):
            w = img.shape[1]
            pad = np.full((32, 384), 255, np.uint8)
            pad[:, :w] = img
            lp, fm = model.apply(
                variables, jnp.asarray(pad[None]),
                jnp.asarray([w], jnp.int32), train=False)
            T = int(np.asarray(fm).sum())
            hyps = prefix_beam_search(
                np.asarray(lp)[0, :T], al, bc, lm=lm)
            assert r.uxxxx == hyps[0][0]

    def test_device_lm_false_uses_two_pass(self, snapshot, tmp_path):
        snap, data = snapshot
        lm_path = self._lm_path(data, tmp_path, order=3)
        from vistaocr_tpu.decode import BeamConfig

        svc = OcrService(snap, ServiceConfig(
            max_batch=4, warmup=False, decoder="beam", beam_impl="device",
            lm_path=lm_path, device_lm=False,
            beam=BeamConfig(lm_alpha=0.5),
        ))
        try:
            assert svc._lm_table is None and svc._beam_all
            img = np.full((32, 120), 255, np.uint8)
            r = svc.submit(img).result(timeout=60)
            assert isinstance(r.uxxxx, str)
        finally:
            svc.close()


class TestDeviceLexicon:
    """Lexicon-constrained serving: the device-trie path must agree with
    the host-expansion path on the same word list."""

    def test_device_matches_host_lexicon(self, snapshot, tmp_path):
        from vistaocr_tpu.data.shards import ShardedLineDataset
        from vistaocr_tpu.text import uxxxx_to_utf8

        snap, data = snapshot
        ds = ShardedLineDataset(data, "train")
        words = set()
        for tr in ds.transcripts():
            words.update(uxxxx_to_utf8(tr).split())
        wl = str(tmp_path / "words.txt")
        with open(wl, "w") as f:
            f.write("\n".join(sorted(words)))
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=52,
        )
        imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(8)]
        out = {}
        for impl in ("device", "host"):
            svc = OcrService(snap, ServiceConfig(
                max_batch=8, warmup=False, decoder="beam", beam_impl=impl,
                lexicon_path=wl,
            ))
            try:
                if impl == "device":
                    assert svc._lex_kw  # device trie active
                out[impl] = [r.uxxxx for r in svc.ocr_lines(imgs)]
            finally:
                svc.close()
        assert out["device"] == out["host"]
        # every hypothesis is a concatenation of lexicon words
        for u in out["device"]:
            text = "".join(
                chr(int(t[1:], 16)) for t in u.split()) if u else ""
            for w in text.split():
                assert w in words

    def test_device_word_lm_matches_host(self, snapshot, tmp_path):
        """Full L∘G serving: device (dense trie + word-bigram tables)
        vs host expansion — identical transcripts."""
        from vistaocr_tpu.data.shards import ShardedLineDataset
        from vistaocr_tpu.decode import BeamConfig
        from vistaocr_tpu.decode.lm import train_char_lm
        from vistaocr_tpu.text import uxxxx_to_utf8

        snap, data = snapshot
        ds = ShardedLineDataset(data, "train")
        sentences = [uxxxx_to_utf8(t) for t in ds.transcripts()]
        words = sorted({w for s in sentences for w in s.split()})
        wl = str(tmp_path / "w.txt")
        with open(wl, "w") as f:
            f.write("\n".join(words))
        glm = str(tmp_path / "g.arpa")
        train_char_lm(sentences, order=2).write_arpa(glm)
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=62,
        )
        imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(6)]
        bc = BeamConfig(beam_width=8, topk=4, word_lm_alpha=0.6,
                        word_lm_beta=0.3)
        out = {}
        for impl in ("device", "host"):
            svc = OcrService(snap, ServiceConfig(
                max_batch=8, warmup=False, decoder="beam", beam_impl=impl,
                lexicon_path=wl, word_lm_path=glm, beam=bc,
            ))
            try:
                out[impl] = [r.uxxxx for r in svc.ocr_lines(imgs)]
            finally:
                svc.close()
        assert out["device"] == out["host"]


class TestOpenVocabServing:
    """Round 5 (VERDICT r4 missing #4): the <unk> character bypass must
    be reachable and tested WHERE SERVING HAPPENS. Round 4 measured the
    hard lexicon 2-4x worse than greedy at any nonzero OOV rate; the
    service must (a) honor beam.lex_unk_logp, (b) match the offline
    run_inference path string-for-string on an OOV-bearing split."""

    def test_unk_service_matches_run_inference_on_oov_split(
            self, snapshot, tmp_path):
        from vistaocr_tpu.data.shards import ShardedLineDataset
        from vistaocr_tpu.decode import BeamConfig
        from vistaocr_tpu.infer import run_inference
        from vistaocr_tpu.text import uxxxx_to_utf8

        snap, data = snapshot
        ds = ShardedLineDataset(data, "val")
        recs = [ds[i] for i in range(len(ds))]
        # Lexicon = only the words of the FIRST HALF of the val split:
        # the rest of the split contains words the lexicon never saw
        # (genuine OOV at serving time on this toy distribution).
        half = max(1, len(recs) // 2)
        lex_words = sorted({w for r in recs[:half] for w in r.text.split()})
        all_words = {w for r in recs for w in r.text.split()}
        assert all_words - set(lex_words), "split has no OOV words"
        wl = str(tmp_path / "oov_words.txt")
        with open(wl, "w") as f:
            f.write("\n".join(lex_words))

        lam = -2.5
        out_path = str(tmp_path / "hyps.jsonl")
        run_inference(snap, data, "val", decoder="beam",
                      beam_impl="device", lexicon_path=wl,
                      lex_unk_logp=lam, out_path=out_path,
                      log=lambda *a: None)
        import json as _json

        with open(out_path) as f:
            offline = {r["id"]: r["hyp_uxxxx"]
                       for r in map(_json.loads, f)}

        svc = OcrService(snap, ServiceConfig(
            max_batch=8, warmup=False, decoder="beam",
            lexicon_path=wl, beam=BeamConfig(lex_unk_logp=lam),
        ))
        try:
            results = svc.ocr_lines([r.image for r in recs])
        finally:
            svc.close()
        served = {r.id: res.uxxxx for r, res in zip(recs, results)}
        assert served == {r.id: offline[r.id] for r in recs}
        # the bypass is ACTIVE: at least one served hypothesis spells a
        # word outside the lexicon (a hard constraint can't do that)
        lex = set(lex_words)
        assert any(w not in lex
                   for res in results
                   for w in uxxxx_to_utf8(res.uxxxx).split() if w)

    def test_http_cli_wires_unk_and_quantize(self, snapshot, tmp_path,
                                             monkeypatch):
        """The HTTP front's argparse must thread --lex-unk-logp and
        --quantize into ServiceConfig (VERDICT r4: an HTTP deployment
        could not be configured open-vocab at all)."""
        from vistaocr_tpu.serve import http_server

        snap, _ = snapshot
        wl = str(tmp_path / "w.txt")
        with open(wl, "w") as f:
            f.write("ab\ncd\n")
        captured = {}

        def fake_serve(snapshot_, port, host, cfg):
            captured["cfg"] = cfg

        monkeypatch.setattr(http_server, "serve", fake_serve)
        http_server.main([
            "--snapshot", snap, "--decoder", "beam", "--lexicon", wl,
            "--lex-unk-logp", "-2.5", "--quantize", "none",
            "--quantize-float-prefix", "2",
        ])
        cfg = captured["cfg"]
        assert cfg.beam.lex_unk_logp == -2.5
        assert cfg.lexicon_path == wl
        assert cfg.quantize == "none"
        assert cfg.quantize_float_prefix == 2
        # without --lexicon the unk flag is inert (no constraint to
        # escape), matching BeamConfig's semantics
        http_server.main([
            "--snapshot", snap, "--lex-unk-logp", "-2.5",
        ])
        assert captured["cfg"].beam.lex_unk_logp == 0.0


class TestDeviceDeskew:
    def test_skewed_lines_decode_with_device_deskew(self, snapshot):
        """Lines sheared by ~2 deg (small enough that no ink clips off
        the 32-px canvas): with device_deskew the decode must be closer
        to the straight originals than without it."""
        import math

        from vistaocr_tpu.text import cer_wer, utf8_to_uxxxx

        snap, _ = snapshot
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=2),
            seed=83,
        )
        t = math.tan(math.radians(2.0))
        straight, skewed = [], []
        for _ in range(10):
            img, _txt = gen.sample(height=32, max_width=220)
            straight.append(img)
            H, W = img.shape
            sk = np.full_like(img, 255)
            cx = (W - 1) / 2.0
            for y in range(H):
                for xx in range(W):
                    src = y + (xx - cx) * t
                    if 0 <= int(round(src)) < H:
                        sk[y, xx] = img[int(round(src)), xx]
            skewed.append(sk)

        out = {}
        for name, imgs, dsk in (("straight", straight, False),
                                ("skew_raw", skewed, False),
                                ("skew_deskewed", skewed, True)):
            svc = OcrService(snap, ServiceConfig(
                max_batch=16, warmup=False, device_deskew=dsk))
            try:
                out[name] = [utf8_to_uxxxx(r.text)
                             for r in svc.ocr_lines(imgs)]
            finally:
                svc.close()
        cer_desk, _ = cer_wer(out["skew_deskewed"], out["straight"])
        cer_raw, _ = cer_wer(out["skew_raw"], out["straight"])
        # correction must bring the decode closer to the straight truth
        assert cer_desk <= cer_raw, (cer_desk, cer_raw)
        assert cer_desk < 0.15, (cer_desk, cer_raw, out)


class TestQuantizedServing:
    """int8 on the serving surface (round 5): ServiceConfig(quantize=
    'int8') loads the snapshot's shipped qstack and swaps the conv stack
    in every per-bucket graph; quality must hold at the service level."""

    def test_int8_requires_shipped_qstack(self, snapshot, tmp_path):
        import shutil

        snap, _ = snapshot
        bare = str(tmp_path / "bare")
        shutil.copytree(snap, bare)
        qf = tmp_path / "bare" / "qstack.msgpack"
        if qf.exists():
            qf.unlink()
        with pytest.raises(ValueError, match="qstack"):
            OcrService(bare, ServiceConfig(warmup=False, quantize="int8"))

    def test_unknown_quantize_mode_rejected(self, snapshot):
        snap, _ = snapshot
        with pytest.raises(ValueError, match="quantize"):
            OcrService(snap, ServiceConfig(warmup=False, quantize="int4"))

    def test_int8_service_matches_float(self, snapshot):
        """Service-level CER parity: int8 transcripts must agree with the
        float service on nearly every line (greedy AND device beam), and
        quality vs ground truth must hold — BASELINE config #5's quality
        gate on the quantized path."""
        from vistaocr_tpu.models.quant import quantize_snapshot

        snap, data = snapshot
        quantize_snapshot(snap, data, calib_batches=2, batch_pixels=2**17)
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=301,
        )
        pairs = [gen.sample(height=32, max_width=380) for _ in range(16)]
        imgs = [img for img, _ in pairs]
        for decoder in ("greedy", "beam"):
            outs = {}
            for q in ("none", "int8"):
                svc = OcrService(snap, ServiceConfig(
                    max_batch=16, warmup=False, decoder=decoder,
                    quantize=q))
                try:
                    outs[q] = [r.text for r in svc.ocr_lines(imgs)]
                finally:
                    svc.close()
            same = sum(a == b for a, b in zip(outs["none"], outs["int8"]))
            assert same >= 14, (decoder, list(zip(outs["none"],
                                                  outs["int8"])))
            exact = sum(t == text for t, (_, text)
                        in zip(outs["int8"], pairs))
            assert exact >= 11, (decoder, outs["int8"])


class TestLargeVocabServing:
    """L∘G serving beyond the dense word-table cap (round 5): a >8k-word
    lexicon routes through the hashed Katz bigram form
    (decode/lm.device_word_tables) and must still match the host
    expansion string-for-string."""

    def test_hashed_word_tables_match_host_at_9k_words(self, snapshot,
                                                       tmp_path):
        import itertools

        from vistaocr_tpu.data.shards import ShardedLineDataset
        from vistaocr_tpu.decode import BeamConfig
        from vistaocr_tpu.decode.lm import DENSE_WORD_CAP, train_char_lm
        from vistaocr_tpu.text import uxxxx_to_utf8

        snap, data = snapshot
        ds = ShardedLineDataset(data, "train")
        sentences = [uxxxx_to_utf8(t) for t in ds.transcripts()]
        corpus_words = sorted({w for s in sentences for w in s.split()})
        # pad the lexicon past the dense cap with synthetic junk words
        # (the realistic shape: a big vocabulary, mostly irrelevant)
        junk = ("".join(t) for n in (3, 4, 5)
                for t in itertools.product("abcdeo", repeat=n))
        words = sorted(set(corpus_words) | set(
            itertools.islice(junk, DENSE_WORD_CAP + 1000)))
        assert len(words) > DENSE_WORD_CAP
        wl = str(tmp_path / "w9k.txt")
        with open(wl, "w") as f:
            f.write("\n".join(words))
        glm = str(tmp_path / "g.arpa")
        train_char_lm(sentences, order=2).write_arpa(glm)
        gen = SyntheticLineGenerator(
            SynthConfig(language="charset", charset="abcdeo ",
                        min_words=1, max_words=3),
            seed=71,
        )
        imgs = [gen.sample(height=32, max_width=380)[0] for _ in range(6)]
        bc = BeamConfig(beam_width=8, topk=4, word_lm_alpha=0.6,
                        word_lm_beta=0.3)
        out = {}
        for impl in ("device", "host"):
            svc = OcrService(snap, ServiceConfig(
                max_batch=8, warmup=False, decoder="beam", beam_impl=impl,
                lexicon_path=wl, word_lm_path=glm, beam=bc,
            ))
            try:
                if impl == "device":  # the hashed path must be active
                    assert "word_uni" in svc._lex_kw
                    assert "word_table" not in svc._lex_kw
                out[impl] = [r.uxxxx for r in svc.ocr_lines(imgs)]
            finally:
                svc.close()
        assert out["device"] == out["host"]
