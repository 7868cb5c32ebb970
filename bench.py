"""Headline benchmark: training throughput in text-lines/sec/chip.

Protocol (BASELINE.md): flagship CnnLstmOcr (bf16 compute) trained on
synthetic 32px lines over a realistic bucket mix; wall-clock over timed
steps AFTER per-bucket compilation; lines/sec = global lines / seconds /
chips. Eval forward throughput is reported alongside.

Baseline: the reference publishes no numbers (BASELINE.json.published =
{}), and its GPU throughput is unavailable in this environment. We anchor
``vs_baseline`` to a NOMINAL reference of 1000 lines/sec/chip for the
2017-era PyTorch+cuDNN+warp-ctc stack on a contemporary GPU — a generous
literature-anchored estimate (see BASELINE.md rows 5-6); the north-star
target of >=5x the reference therefore reads as vs_baseline >= 5.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

NOMINAL_REFERENCE_LINES_PER_SEC = 1000.0

# Recorded bands: the UNION of fenced runs (builder sessions + the
# driver's BENCH_r0N.json) — relay transfer variance is real, so the
# honest quote is the whole band, including the driver-recorded lows
# (greedy 2211 and L.G 1377 in BENCH_r03; fused-LM 1412 and lm4 1123 in
# BENCH_r04). Value = (lo, hi, n_samples); a band with fewer than 3
# fenced samples prints as PROVISIONAL until it has seen enough runs to
# mean anything (VERDICT r4 weak #3: a one-measurement band is not a
# band). Each service metric prints where the current run landed so
# drift is visible run-over-run.
RECORDED_BANDS = {
    "service greedy": (2211, 3318, 8),
    # 1800 observed once in a round-4 builder run whose whole service
    # section ran slow (submit mb128 880 vs 1563); an immediate fresh-
    # process re-probe of the same snapshot read 2482-2605, so the band
    # keeps the low honestly but it is session skew, not a regression.
    # r05 run D read 1293 during a depressed relay window (the SAME
    # run's later rows landed at or above their band highs: int8 3340,
    # submit mb32 1968) — kept honestly, same skew pattern.
    "service beam (device)": (1293, 2605, 8),
    # r05 fenced run C read 1409 — 0.2% under the old 1412 low; folded.
    "service beam+LM (fused)": (1409, 1516, 8),
    # r04 builder 1157, r04 driver 1123, r05 builder 1027 (a slow-
    # service-session sample like the beam 1800 case: the same run's
    # other rows sat mid-band, so kept honestly but not representative),
    # r05 fenced runs A/B 1078/1123
    "service beam+4gramLM (fused)": (1027, 1157, 7),
    # r03 driver 1377, r04 builder 1624, r04 driver 1646, r05 A 1650
    "service beam+lexicon+wordLM": (1377, 1650, 8),
    # Round-5 rows: samples = fenced runs A/B/C/D this round
    # (docs/design.md round-5 ledger).
    "service 50k L.G": (1150, 1219, 4),
    # int8 at service shapes swings with the relay window: 2261-2521 in
    # runs A-C, 3340 in run D's fast window (ABOVE the float high) —
    # within-session float-vs-int8 ordering is not stable; see the
    # ledger's int8 serving verdict.
    "service greedy int8": (2261, 3340, 4),
    # mb=32 run A read 700 with every submit row in the same session low
    # (relay-session skew, the beam-1800 pattern); run D read 1968.
    "submit mb=32": (700, 1968, 4),
    "submit mb=128": (1155, 1526, 4),
}


def _band_note(name: str, value: float) -> str:
    if name not in RECORDED_BANDS:
        return "no recorded band yet"
    lo, hi, n = RECORDED_BANDS[name]
    where = ("in" if lo <= value <= hi else
             "BELOW" if value < lo else "ABOVE")
    prov = " PROVISIONAL(<3 samples)" if n < 3 else ""
    return f"{where} recorded band {lo}-{hi}{prov}"

BENCH_DATA = os.environ.get("BENCH_DATA_DIR", "/tmp/vistaocr_bench_data_16k")
TIMED_STEPS = int(os.environ.get("BENCH_STEPS", "100"))
WARMUP_STEPS = int(os.environ.get("BENCH_WARMUP", "10"))
CACHE_DIR = os.environ.get("JAX_CACHE_DIR", "/tmp/vistaocr_jax_cache")


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _force(x):
    """True device fence: block_until_ready on the tunneled axon backend
    returns at dispatch-ack, not completion (measured: a matmul chain
    "finished" at 187 PFLOPs). A scalar readback forces real completion;
    programs execute in dispatch order, so fencing the last one fences
    the stream."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _ensure_data():
    from vistaocr_tpu.data import build_synthetic_dataset

    if not os.path.exists(os.path.join(BENCH_DATA, "manifest.json")):
        # IAM-scale corpus: per-epoch work large enough that the fixed
        # per-program dispatch on the relay (~8 ms) stays amortized even
        # with the fine 26-rung ladder (one epoch program per bucket).
        build_synthetic_dataset(
            BENCH_DATA,
            num_train=16384,
            num_val=512,
            height=32,
            max_width=1024,
            seed=123,
        )
    return BENCH_DATA


def main():
    import jax

    # Multi-host bench: BENCH_COORDINATOR_ADDRESS=host:port (+ counts)
    # initializes jax.distributed before the first backend touch; the
    # mesh/sharding code below is unchanged (SURVEY.md §5).
    if os.environ.get("BENCH_COORDINATOR_ADDRESS"):
        from vistaocr_tpu.train import maybe_init_distributed

        maybe_init_distributed(
            os.environ["BENCH_COORDINATOR_ADDRESS"],
            int(os.environ.get("BENCH_NUM_PROCESSES", "1")),
            int(os.environ.get("BENCH_PROCESS_ID", "0")),
        )

    # Persistent compilation cache: per-bucket graphs compile once per
    # machine, not once per bench run.
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from vistaocr_tpu.data import BatchPipeline, ShapeContract, ShardedLineDataset
    from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
    from vistaocr_tpu.parallel import MeshConfig, make_mesh, replicated, shard_batch_arrays
    from vistaocr_tpu.text import Alphabet
    from vistaocr_tpu.train import TrainState, make_eval_step, make_train_step

    data_dir = _ensure_data()
    n_chips = len(jax.devices())
    mesh = make_mesh(MeshConfig(model=1))

    from vistaocr_tpu.data.buckets import make_ladder

    ds = ShardedLineDataset(data_dir, "train")
    alphabet = Alphabet.build(ds.transcripts())
    # Corpus-tuned ladder (SURVEY.md C7). align=32 keeps measured padding
    # waste at ~4% (the old align=128 ladder measured 14.5% despite its
    # nominal 6% bound — the bound was below the alignment floor, so the
    # greedy merge kept every rung).
    ladder = make_ladder(
        ds.widths,
        stride=4,
        align=int(os.environ.get("BENCH_LADDER_ALIGN", "32")),
        max_waste=float(os.environ.get("BENCH_MAX_WASTE", "0.03")),
    )
    _log(f"bucket ladder: {ladder}")
    contract = ShapeContract(bucket_widths=ladder)
    cfg = ModelConfig(
        num_classes=alphabet.num_classes,
        compute_dtype="bfloat16",
        lstm_impl=os.environ.get("BENCH_LSTM_IMPL", "auto"),
    )
    model = CnnLstmOcr(cfg)
    variables = model.init_params(jax.random.PRNGKey(0))

    # Clip applied in-step (reuses the metrics gnorm, one less tree pass).
    tx = optax.chain(optax.identity(), optax.scale_by_adam())
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    state = jax.device_put(state, replicated(mesh))
    train_step = make_train_step(model, tx, label_average=False, grad_clip=5.0)
    eval_step = make_eval_step(model)

    pipe = BatchPipeline(
        ds, alphabet, contract,
        batch_pixels=int(os.environ.get("BENCH_BATCH_PIXELS", 2**22)),
        batch_multiple=mesh.shape["data"],
        drop_remainder=True,
        seed=7,
    )
    if os.environ.get("BENCH_DEVICE_CACHE", "1") == "1":
        from vistaocr_tpu.data.device_cache import DeviceCache

        pipe = DeviceCache(pipe)
        _log("device cache enabled")
    sharding = shard_batch_arrays(mesh)
    lr = jnp.asarray(1e-3, jnp.float32)
    # rbg keys ride the TPU hardware RNG: threefry dropout-mask generation
    # alone measured 3.5 ms/step at the W=512 bucket (scripts/profile_ablate).
    rng = jax.random.key(0, impl="rbg")

    def batches():
        epoch = 0
        while True:
            yield from pipe.device_epoch(epoch, sharding=sharding)
            epoch += 1

    stream = batches()

    fused = os.environ.get("BENCH_FUSED", "1") == "1" and hasattr(
        pipe, "epoch_plan"
    )

    # Warmup: compile every bucket shape + a few steady steps. In fused
    # mode the epoch programs ARE the training graphs — skip the per-step
    # compiles entirely (halves the cold-cache compile count; the driver
    # runs bench on fresh machines).
    if not fused:
        _log(f"bucket shapes to compile: {pipe.batch_shapes()}")
        seen = set()
        warm = 0
        t_warm = time.time()
        while warm < WARMUP_STEPS or len(seen) < len(pipe.batch_shapes()):
            b = next(stream)
            t_one = time.time()
            state, m = train_step(
                state, b.images, b.widths, b.labels, b.label_lengths,
                jnp.asarray(b.valid, jnp.float32), lr, rng,
            )
            _force(m["loss"])
            if b.images.shape not in seen:
                _log(f"compiled train {b.images.shape} in {time.time()-t_one:.1f}s")
            seen.add(b.images.shape)
            warm += 1
        _log(f"warmup done in {time.time()-t_warm:.1f}s ({warm} steps)")
    if fused:
        from vistaocr_tpu.train import make_train_epoch

        train_epoch = make_train_epoch(model, tx, label_average=False,
                                       grad_clip=5.0)
        # Stack epochs per dispatch exactly as fit() does (epoch_stack):
        # the relay's fixed per-program cost is measurable against the
        # fine ladder's per-bucket row counts.
        stack = int(os.environ.get("BENCH_EPOCH_STACK", "4"))
        # compile each bucket's epoch program
        for b_idx, arrays, idx, w in pipe.epoch_plan(0, stack=stack):
            state, m = train_epoch(state, *arrays, idx, w, lr, rng)
        _force(m["loss"])
        _log("epoch programs compiled")
        lines = 0
        t0 = time.time()
        epoch = stack
        while lines < TIMED_STEPS * 120:  # comparable work volume
            for b_idx, arrays, idx, w in pipe.epoch_plan(epoch, stack=stack):
                state, m = train_epoch(state, *arrays, idx, w, lr, rng)
                lines += int(idx.shape[0] * idx.shape[1])
            epoch += stack
        _force(m["loss"])
    else:
        lines = 0
        t0 = time.time()
        for _ in range(TIMED_STEPS):
            b = next(stream)
            state, m = train_step(
                state, b.images, b.widths, b.labels, b.label_lengths,
                jnp.asarray(b.valid, jnp.float32), lr, rng,
            )
            lines += b.size
        _force(m["loss"])
    train_lps = lines / (time.time() - t0) / n_chips
    _log(f"train timing done: {train_lps:.0f} lines/s/chip (fused={fused})")

    # Warm up eval graphs (one compile per bucket shape), then time.
    seen_eval = set()
    while len(seen_eval) < len(pipe.batch_shapes()):
        b = next(stream)
        if b.images.shape in seen_eval:
            continue
        out = eval_step(state.params, state.batch_stats, b.images, b.widths)
        _force(out[0])
        seen_eval.add(b.images.shape)
    _log("eval graphs compiled")

    # Timed eval forward.
    lines = 0
    t0 = time.time()
    for _ in range(max(TIMED_STEPS // 3, 20)):
        b = next(stream)
        out = eval_step(state.params, state.batch_stats, b.images, b.widths)
        lines += b.size
    _force(out[0])
    eval_lps = lines / (time.time() - t0) / n_chips

    # Serving path (BASELINE.json config #5): width-routed dynamically
    # batched OcrService, measured end-to-end (submit -> Future result,
    # host normalize + device forward + decode). Futures resolve with host
    # strings, so no extra fencing is needed. BENCH_SERVICE=0 skips.
    svc_lps = svc_beam_lps = 0.0
    svc_lm_fused_lps = svc_lm_2pass_lps = svc_lg_lps = 0.0
    svc_lm4_fused_lps = svc_lg50_lps = 0.0
    init_50k = {}
    if os.environ.get("BENCH_SERVICE", "1") == "1":
        import tempfile

        from vistaocr_tpu.checkpoint import save_snapshot
        from vistaocr_tpu.serve import OcrService, ServiceConfig

        snap = tempfile.mkdtemp(prefix="vistaocr_bench_snap_")
        save_snapshot(
            snap,
            variables={
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            },
            model_config=cfg, alphabet=alphabet, contract=contract, step=0,
        )
        val = ShardedLineDataset(data_dir, "val")
        imgs = [val[i].image for i in range(len(val))]

        svc = OcrService(snap, ServiceConfig(max_batch=128, max_wait_ms=2.0))
        svc.ocr_lines(imgs)  # full untimed pass: every bucket's path hot
        t0 = time.time()
        res = svc.ocr_lines(imgs)
        svc_lps = len(res) / (time.time() - t0) / n_chips
        svc.close()
        _log(f"service greedy: {svc_lps:.0f} lines/s/chip "
             f"({_band_note('service greedy', svc_lps)})")

        # Beam service: the vectorized on-device engine (default). Round 2's
        # host C++ engine measured 150 lines/s/chip on a 256-line subset;
        # the device engine decodes the whole batch in parallel on-TPU.
        svc_b = OcrService(
            snap,
            ServiceConfig(max_batch=128, max_wait_ms=2.0, decoder="beam"),
        )
        svc_b.ocr_lines(imgs)  # untimed warm pass
        t0 = time.time()
        res = svc_b.ocr_lines(imgs)
        svc_beam_lps = len(res) / (time.time() - t0) / n_chips
        svc_b.close()
        _log(f"service beam (device): {svc_beam_lps:.0f} lines/s/chip "
             f"({_band_note('service beam (device)', svc_beam_lps)})")

        # Beam + LM service, both fusion modes: interleaved on-device
        # (dense order-3 table inside the search) vs two-pass host
        # rescoring of the top-W finals. Same LM, same inputs.
        from vistaocr_tpu.decode import BeamConfig
        from vistaocr_tpu.decode.lm import train_char_lm

        lm_path = os.path.join(snap, "bench_lm3.arpa")
        train_char_lm(
            [val.transcript(i) for i in range(len(val))], order=3
        ).write_arpa(lm_path)
        bc = BeamConfig(lm_alpha=0.4, lm_beta=0.4)
        for name, dev_lm in (("fused", True), ("2pass", False)):
            svc_l = OcrService(snap, ServiceConfig(
                max_batch=128, max_wait_ms=2.0, decoder="beam",
                lm_path=lm_path, beam=bc, device_lm=dev_lm,
            ))
            svc_l.ocr_lines(imgs)  # untimed warm pass
            t0 = time.time()
            res = svc_l.ocr_lines(imgs)
            lps = len(res) / (time.time() - t0) / n_chips
            svc_l.close()
            if dev_lm:
                svc_lm_fused_lps = lps
            else:
                svc_lm_2pass_lps = lps
            note = (f" ({_band_note('service beam+LM (fused)', lps)})"
                    if dev_lm else "")
            _log(f"service beam+LM ({name}): {lps:.0f} lines/s/chip{note}")

        # Beam + 4-gram LM, fused via the hashed context table
        # (decode/lm.hashed_logp_table) — the quality-recommended order
        # previously fell off the 4.4x two-pass cliff (345 vs 1516 in
        # BENCH_r03); the hashed path keeps it interleaved on device.
        lm4_path = os.path.join(snap, "bench_lm4.arpa")
        train_char_lm(
            [val.transcript(i) for i in range(len(val))], order=4
        ).write_arpa(lm4_path)
        svc_l4 = OcrService(snap, ServiceConfig(
            max_batch=128, max_wait_ms=2.0, decoder="beam",
            lm_path=lm4_path, beam=bc,
        ))
        assert svc_l4._lm_hash_kw, "4-gram service did not take the hashed path"
        svc_l4.ocr_lines(imgs)  # untimed warm pass
        t0 = time.time()
        res = svc_l4.ocr_lines(imgs)
        svc_lm4_fused_lps = len(res) / (time.time() - t0) / n_chips
        svc_l4.close()
        _log(f"service beam+4gramLM (hash-fused): "
             f"{svc_lm4_fused_lps:.0f} lines/s/chip "
             f"({_band_note('service beam+4gramLM (fused)', svc_lm4_fused_lps)})")

        # Full constrained stack: device beam + lexicon trie + word
        # bigram fused in one program (the L∘G decode on device).
        from vistaocr_tpu.text import uxxxx_to_utf8

        sentences = [
            uxxxx_to_utf8(val.transcript(i)) for i in range(len(val))
        ]
        words = sorted({w for snt in sentences for w in snt.split()})
        wl_path = os.path.join(snap, "bench_words.txt")
        with open(wl_path, "w") as f:
            f.write("\n".join(words))
        wlm_path = os.path.join(snap, "bench_word2.arpa")
        train_char_lm(sentences, order=2).write_arpa(wlm_path)
        svc_lg = OcrService(snap, ServiceConfig(
            max_batch=128, max_wait_ms=2.0, decoder="beam",
            lexicon_path=wl_path, word_lm_path=wlm_path,
            beam=BeamConfig(word_lm_alpha=0.6, word_lm_beta=0.3),
        ))
        svc_lg.ocr_lines(imgs)  # untimed warm pass
        t0 = time.time()
        res = svc_lg.ocr_lines(imgs)
        svc_lg_lps = len(res) / (time.time() - t0) / n_chips
        svc_lg.close()
        _log(f"service beam+lexicon+wordLM (L.G fused): "
             f"{svc_lg_lps:.0f} lines/s/chip "
             f"({_band_note('service beam+lexicon+wordLM', svc_lg_lps)})")

        # Kaldi-scale L∘G: the same fused stack behind a 50k-word lexicon
        # (corpus words + synthetic fillers — the realistic shape: a big
        # vocabulary, mostly irrelevant to any one line). Routes through
        # the hashed Katz word tables (decode/lm.device_word_tables; the
        # dense form would be 10 GiB at this V). BENCH_BIGLEX=0 skips.
        if os.environ.get("BENCH_BIGLEX", "1") == "1":
            import itertools

            import numpy as _np50

            rng50 = _np50.random.default_rng(31)
            letters = "abcdefghijklmnopqrstuvwxyz"
            fillers = {
                "".join(rng50.choice(list(letters), rng50.integers(3, 10)))
                for _ in range(70000)
            }
            # sorted() before islice: set iteration order is process-
            # random, and a different 50k subset changes the trie node
            # count — new table SHAPES, so every per-bucket graph
            # recompiles instead of hitting the persistent cache
            big_words = sorted(set(words) | set(
                itertools.islice(iter(sorted(fillers)), 50000)))
            wl50_path = os.path.join(snap, "bench_words50k.txt")
            with open(wl50_path, "w") as f:
                f.write("\n".join(big_words))
            t0 = time.time()
            svc_lg50 = OcrService(snap, ServiceConfig(
                max_batch=128, max_wait_ms=2.0, decoder="beam",
                lexicon_path=wl50_path, word_lm_path=wlm_path,
                beam=BeamConfig(word_lm_alpha=0.6, word_lm_beta=0.3),
            ))
            assert "word_uni" in svc_lg50._lex_kw, (
                "50k-word service did not take the hashed word path")
            init_50k = dict(svc_lg50.init_timings,
                            total_s=round(time.time() - t0, 1))
            _log(f"50k-word L.G service init: {init_50k['total_s']}s "
                 f"(breakdown {svc_lg50.init_timings}), vocab "
                 f"{len(big_words)}")
            svc_lg50.ocr_lines(imgs)  # untimed warm pass
            t0 = time.time()
            res = svc_lg50.ocr_lines(imgs)
            svc_lg50_lps = len(res) / (time.time() - t0) / n_chips
            svc_lg50.close()
            _log(f"service beam+50k-lexicon+wordLM (hashed L.G): "
                 f"{svc_lg50_lps:.0f} lines/s/chip "
                 f"({_band_note('service 50k L.G', svc_lg50_lps)})")

    # int8 serving row (round 5): quantize the bench snapshot's conv
    # stack once (models/quant.quantize_snapshot ships qstack.msgpack
    # into the snapshot dir), then serve greedy with the int8 per-bucket
    # graphs. The eval step is ~75% conv at these shapes and int8 conv
    # fwd fenced at 1.29x (models/quant.py) — this row harvests it on
    # the product surface. BENCH_INT8=0 skips.
    svc_int8_lps = eval_int8_lps = 0.0
    if (os.environ.get("BENCH_SERVICE", "1") == "1"
            and os.environ.get("BENCH_INT8", "1") == "1"):
        from vistaocr_tpu.models.quant import (
            load_qstack,
            make_quantized_eval_step,
            quantize_snapshot,
        )

        quantize_snapshot(snap, data_dir, split="train", calib_batches=4)

        # int8 eval forward over the same stream as the float eval row
        qstep = make_quantized_eval_step(
            model, jax.device_put(load_qstack(snap)))
        seen_q = set()
        while len(seen_q) < len(pipe.batch_shapes()):
            b = next(stream)
            if b.images.shape in seen_q:
                continue
            out = qstep(state.params, state.batch_stats, b.images, b.widths)
            _force(out[0])
            seen_q.add(b.images.shape)
        lines = 0
        t0 = time.time()
        for _ in range(max(TIMED_STEPS // 3, 20)):
            b = next(stream)
            out = qstep(state.params, state.batch_stats, b.images, b.widths)
            lines += b.size
        _force(out[0])
        eval_int8_lps = lines / (time.time() - t0) / n_chips
        _log(f"eval int8: {eval_int8_lps:.0f} lines/s/chip "
             f"(float eval {eval_lps:.0f})")
        svc_q = OcrService(snap, ServiceConfig(
            max_batch=128, max_wait_ms=2.0, quantize="int8",
        ))
        svc_q.ocr_lines(imgs)  # full untimed pass: every bucket's path hot
        t0 = time.time()
        res = svc_q.ocr_lines(imgs)
        svc_int8_lps = len(res) / (time.time() - t0) / n_chips
        svc_q.close()
        _log(f"service greedy int8: {svc_int8_lps:.0f} lines/s/chip "
             f"({_band_note('service greedy int8', svc_int8_lps)})")

    # Online latency-shaped path (submit() futures + max_wait batching):
    # N concurrent submitters drive the queues; report lines/s + p50/p99
    # end-to-end latency. Round-5 protocol (VERDICT r4 weak #2: a
    # 384-line window let ONE ~1.8 s stall read as an 8x collapse):
    # the first flood on a fresh service is the COLD window, reported
    # separately; the headline aggregates repeated floods to >= 3000
    # steady-state lines, so a one-off stall costs its share of 30x more
    # work instead of dominating. BENCH_SUBMIT=0 skips.
    submit_stats = {}
    if (os.environ.get("BENCH_SERVICE", "1") == "1"
            and os.environ.get("BENCH_SUBMIT", "1") == "1"):
        import threading

        import numpy as _np

        from vistaocr_tpu.serve import OcrService, ServiceConfig

        def _flood(svc, sub, nclients=8):
            """One 8-client burst: every client submits its shard at once
            (the r03/r04 flood shape, kept so latencies stay comparable
            across rounds). Returns (lines, seconds, latencies)."""
            lat = []
            lock = threading.Lock()

            def client(shard):
                fs = [svc.submit(img) for img in shard]
                ls = [f.result(timeout=300).latency_ms for f in fs]
                with lock:
                    lat.extend(ls)

            shards = [sub[i::nclients] for i in range(nclients)]
            t0 = time.time()
            ths = [threading.Thread(target=client, args=(s,))
                   for s in shards]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            return len(sub), time.time() - t0, lat

        steady_lines = int(os.environ.get("BENCH_SUBMIT_LINES", "3072"))
        for mb in (32, 128):
            svc_o = OcrService(snap, ServiceConfig(
                max_batch=mb, max_wait_ms=2.0,
            ))
            sub = imgs[:384]
            # cold window: first flood after service init (warmup has
            # compiled every rung; this catches residual first-touch
            # stalls without letting them into the headline)
            n, dt, lat = _flood(svc_o, sub)
            cold = {
                "lines_per_sec_per_chip": round(n / dt / n_chips, 1),
                "p99_ms": round(float(_np.percentile(lat, 99)), 1),
            }
            tot_n, tot_dt, all_lat = 0, 0.0, []
            while tot_n < steady_lines:
                n, dt, lat = _flood(svc_o, sub)
                tot_n += n
                tot_dt += dt
                all_lat.extend(lat)
            lps = tot_n / tot_dt / n_chips
            submit_stats[f"submit_mb{mb}"] = {
                "lines_per_sec_per_chip": round(lps, 1),
                "p50_ms": round(float(_np.percentile(all_lat, 50)), 1),
                "p99_ms": round(float(_np.percentile(all_lat, 99)), 1),
                "steady_lines": tot_n,
                "cold": cold,
            }
            # Paced-arrival latency probe (round 5): the flood's p99 is a
            # throughput number in disguise — an instantaneous 384-line
            # burst at throughput T bounds the last line's latency below
            # by 384/T (~330 ms at the measured mb=128 rate), so "flood
            # p99 < 300 ms" is mathematically unreachable. Real tail
            # latency is measured under arrivals the service can absorb:
            # one client paced at 70% of the measured flood throughput;
            # p50/p99 then reflect service time + max_wait batching +
            # residual queueing only.
            rate = max(50.0, 0.7 * lps)
            n_paced = 768
            fs, t0 = [], time.time()
            for i in range(n_paced):
                target = t0 + i / rate
                now = time.time()
                if target > now:
                    time.sleep(target - now)
                fs.append(svc_o.submit(sub[i % len(sub)]))
            plat = [f.result(timeout=300).latency_ms for f in fs]
            submit_stats[f"submit_mb{mb}"]["paced"] = {
                "rate_lines_per_sec": round(rate, 1),
                "p50_ms": round(float(_np.percentile(plat, 50)), 1),
                "p99_ms": round(float(_np.percentile(plat, 99)), 1),
            }
            svc_o.close()
            _log(f"submit mb={mb}: {submit_stats[f'submit_mb{mb}']} "
                 f"({_band_note(f'submit mb={mb}', lps)})")

    print(json.dumps({
        "metric": "train_lines_per_sec_per_chip",
        "value": round(train_lps, 1),
        "unit": "lines/sec/chip",
        "vs_baseline": round(train_lps / NOMINAL_REFERENCE_LINES_PER_SEC, 3),
        "extra": {
            "eval_lines_per_sec_per_chip": round(eval_lps, 1),
            "service_lines_per_sec_per_chip": round(svc_lps, 1),
            "service_beam_lines_per_sec_per_chip": round(svc_beam_lps, 1),
            "service_beam_lm_fused_lines_per_sec_per_chip": round(
                svc_lm_fused_lps, 1),
            "service_beam_lm_2pass_lines_per_sec_per_chip": round(
                svc_lm_2pass_lps, 1),
            "service_beam_lm4_fused_lines_per_sec_per_chip": round(
                svc_lm4_fused_lps, 1),
            "service_beam_lexicon_wordlm_lines_per_sec_per_chip": round(
                svc_lg_lps, 1),
            "service_int8_lines_per_sec_per_chip": round(svc_int8_lps, 1),
            "eval_int8_lines_per_sec_per_chip": round(eval_int8_lps, 1),
            "service_beam_50k_lexicon_wordlm_lines_per_sec_per_chip":
                round(svc_lg50_lps, 1),
            **({"init_50k": init_50k} if init_50k else {}),
            "chips": n_chips,
            "timed_steps": TIMED_STEPS,
            "compute_dtype": "bfloat16",
            "params_m": round(sum(
                x.size for x in jax.tree.leaves(variables["params"])) / 1e6, 1),
            **submit_stats,
        },
    }))


def _main_guarded():
    try:
        main()
    except Exception as e:  # one JSON line even on failure, so the driver
        # records a diagnosable result instead of nothing
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "train_lines_per_sec_per_chip",
            "value": 0.0,
            "unit": "lines/sec/chip",
            "vs_baseline": 0.0,
            "extra": {"error": f"{type(e).__name__}: {str(e)[:300]}"},
        }))
        raise SystemExit(1)


if __name__ == "__main__":
    _main_guarded()
