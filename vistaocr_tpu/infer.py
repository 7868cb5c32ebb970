"""Batch inference / evaluation entry — component C17 (SURVEY.md §2).

Loads a self-describing snapshot (checkpoint.load_model — the
FromSavedWeights contract), runs a split through per-bucket compiled
graphs, writes hypotheses and a CER/WER report.

Usage:
    python -m vistaocr_tpu.infer --snapshot <dir>/best --data <dataset> \
        --split test [--out hyps.jsonl]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

import jax
import numpy as np

from .checkpoint import load_model
from .data.pipeline import BatchPipeline
from .data.shards import ShardedLineDataset
from .text import cer_wer, uxxxx_to_utf8
from .text.bidi import display_order as _bidi_display
from .text.bidi import is_rtl_line as _bidi_is_rtl
from .train import make_eval_step


def _collect_refs(indices, valid, ds, refs, ids):
    for i, v in zip(indices, valid):
        if v:
            refs.append(ds.transcript(int(i)))
            ids.append(ds[int(i)].id)


# Dispatch-ahead window for the two-phase loop below. Each in-flight entry
# pins its decoded device tensors (and, in beam mode, the batch's [B,T,K]
# log-probs) in HBM until finalized — unbounded dispatch of a corpus-scale
# split would grow device memory linearly with split size. 16 batches is
# deep enough to keep H2D/compute/D2H pipelining over the relay while
# bounding resident bytes to tens of MB.
_INFLIGHT_WINDOW = 16


def _host_prefetch(arrays):
    """Async device->host copies: np.asarray at finalize time then finds
    the bytes already local instead of paying the relay's ~75 ms
    round trip per array per batch (serve/service.py has the numbers)."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass


class _PosteriorDumper:
    """Per-frame posterior export — the reference's lattice/prob-dump
    surface (SURVEY.md §3.3: decode entry can "dump per-frame
    posteriors ... for external WFST/n-gram LM decoding"). The rebuild's
    LM fusion is in-process, but the export path stays so external
    tooling (WFST decoders, rescoring experiments, error analysis) can
    consume the model's outputs without re-running the TPU.

    Layout: <dir>/meta.json (alphabet + provenance) and one
    posteriors_<n>.npz per batch: ids (valid rows only), frames, and
    f16 log_probs trimmed to the batch's max valid frame count.
    Consume with ``iter_posteriors``.
    """

    def __init__(self, out_dir, alphabet, snapshot, split, ds):
        import os

        self.dir = out_dir
        self.ds = ds
        self.n = 0
        self.q = []
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({
                "format": "vistaocr_tpu.posteriors.v1",
                "alphabet": json.loads(alphabet.to_json()),
                "snapshot": snapshot,
                "split": split,
            }, f, ensure_ascii=False)

    def add(self, batch, log_probs, frame_mask):
        _host_prefetch((log_probs, frame_mask))
        self.q.append((batch.indices, batch.valid, log_probs, frame_mask))

    def flush_one(self):
        import os

        indices, valid, log_probs, frame_mask = self.q.pop(0)
        lp = np.asarray(log_probs)
        frames = np.asarray(frame_mask).sum(axis=1).astype(np.int32)
        keep = np.flatnonzero(np.asarray(valid))
        if keep.size == 0:
            return
        frames = frames[keep]
        fmax = int(frames.max())
        np.savez_compressed(
            os.path.join(self.dir, f"posteriors_{self.n:05d}.npz"),
            ids=np.array([self.ds.id(int(indices[i])) for i in keep]),
            frames=frames,
            log_probs=lp[keep, :fmax].astype(np.float16),
        )
        self.n += 1

    def close(self):
        while self.q:
            self.flush_one()


def iter_posteriors(dump_dir):
    """Yield ``(line_id, log_probs[T, V] float32)`` from a
    ``--dump-posteriors`` directory, trimmed to each line's true frame
    count. Pairs with ``load_posterior_alphabet``."""
    import glob
    import os

    for path in sorted(glob.glob(os.path.join(dump_dir, "posteriors_*.npz"))):
        with np.load(path) as z:
            ids, frames, lp = z["ids"], z["frames"], z["log_probs"]
            for i in range(len(ids)):
                yield str(ids[i]), lp[i, : int(frames[i])].astype(np.float32)


def iter_posterior_batches(dump_dir):
    """Yield ``(ids [n], frames [n] int32, log_probs [n, fmax, V] f32)``
    per dump file — the dump's own batch granularity. Lines within a file
    came from one bucketed batch, so their frame counts are already
    similar: the natural chunking for batch consumers (decode.offline's
    beam path) without materializing the corpus."""
    import glob
    import os

    for path in sorted(glob.glob(os.path.join(dump_dir, "posteriors_*.npz"))):
        with np.load(path) as z:
            yield (
                [str(i) for i in z["ids"]],
                z["frames"].astype(np.int32),
                z["log_probs"].astype(np.float32),
            )


def load_posterior_alphabet(dump_dir):
    import os

    from .text import Alphabet

    with open(os.path.join(dump_dir, "meta.json")) as f:
        meta = json.load(f)
    return Alphabet.from_json(json.dumps(meta["alphabet"]))


def run_inference(
    snapshot: str,
    data_dir: str,
    split: str = "test",
    *,
    batch_pixels: int = 2**21,
    out_path: Optional[str] = None,
    eval_align: int = 128,  # re-bucket the snapshot ladder (0 = keep)
    decoder: str = "greedy",  # greedy | beam
    beam_impl: str = "device",  # device (vectorized on-TPU) | host (oracle)
    beam_config=None,
    lm_path: Optional[str] = None,
    lm_alpha: float = 0.5,
    lm_beta: float = 0.0,
    dump_posteriors: Optional[str] = None,
    nbest: int = 1,
    lexicon_path: Optional[str] = None,
    lex_unk_logp: float = 0.0,  # <unk> bypass per-char penalty (0 = hard)
    word_lm_path: Optional[str] = None,
    word_lm_alpha: float = 0.5,
    word_lm_beta: float = 0.0,
    quantize: str = "none",  # "none" | "int8" (PTQ conv stack, models/quant.py)
    quantize_float_prefix: int = 0,  # first N convs stay float (mixed int8)
    calib_batches: int = 4,
    log=print,
) -> dict:
    from .decode import BeamConfig, beam_decode, load_lm
    from .runtime import enable_compile_cache

    enable_compile_cache()
    model, variables, alphabet, contract = load_model(snapshot)
    if eval_align:
        # Fine training ladders are wrong for one-shot eval: every rung is
        # a compiled graph (~25 for an auto-tuned snapshot), and even
        # persistent-cache loads cost ~1 s/graph on this host. Re-bucket
        # onto eval_align multiples — same rationale and math as
        # serve.ServiceConfig.serve_align; CER is unaffected (width masks
        # carry the true widths).
        import dataclasses as _dc

        coarse = tuple(sorted({
            -(-w // eval_align) * eval_align for w in contract.bucket_widths
        }))
        contract = _dc.replace(contract, bucket_widths=coarse)
    # Snapshots deserialize to host numpy; pin weights on device once so
    # each batch doesn't re-upload them (serve/service.py has the numbers).
    variables = jax.device_put(variables)
    # comma-joined corpus specs evaluate like they train (open_dataset)
    from .data.shards import open_dataset

    ds = open_dataset(data_dir, split)
    pipe = BatchPipeline(
        ds, alphabet, contract, batch_pixels=batch_pixels,
        drop_remainder=False, shuffle=False,
    )
    if pipe.dropped:
        log(f"warning: {pipe.dropped} lines fit no bucket; skipped")
    eval_step = make_eval_step(model)
    if quantize != "none":
        # Int8 PTQ of the conv feature extractor (models/quant.py): BN
        # folded into per-channel int8 weights, activation scales frozen
        # from the split's first few batches. bridge/BLSTM/head keep the
        # model dtype, logits stay f32 — only the conv stack changes.
        if quantize != "int8":
            raise ValueError(f"unknown --quantize mode {quantize!r}")
        from .models.quant import (
            calibration_batches,
            load_qstack,
            make_quantized_eval_step,
            quantize_model,
        )

        # Prefer the snapshot's shipped int8 artifact (models/quant.py
        # quantize_snapshot): self-describing checkpoints extend to int8
        # — no calibration pass, deterministic across invocations.
        qstack = load_qstack(snapshot)
        if qstack is not None:
            qstack = jax.device_put(qstack)
            log("int8 PTQ: loaded stored qstack from snapshot")
        else:
            # Calibrate from the TRAIN split when the dataset has one
            # (ADVICE r4: scoring the calibration split is mild leakage);
            # only fall back to the scored split for split-less bundles.
            calib = calibration_batches(
                data_dir, snapshot, calib_batches=calib_batches,
                batch_pixels=batch_pixels, split="train")
            qstack = jax.device_put(quantize_model(model, variables, calib))
            log(f"int8 PTQ: conv stack quantized "
                f"(calibrated over {len(calib)} train batches)")
        eval_step = make_quantized_eval_step(
            model, qstack, float_prefix=quantize_float_prefix)

    lexicon = None
    if lexicon_path:
        if decoder != "beam":
            raise ValueError("--lexicon needs --decoder beam")
        from .decode.lexicon import Lexicon

        lexicon = Lexicon.read_words(alphabet, lexicon_path)
    if nbest > 1 and decoder != "beam":
        raise ValueError("--nbest needs --decoder beam")
    word_lm = None
    if word_lm_path:
        if decoder != "beam":
            raise ValueError("--word-lm needs --decoder beam")
        from .decode.lm import ArpaLM

        word_lm = ArpaLM.read_arpa(word_lm_path)
        if beam_impl == "device" and (
            lexicon is None or word_lm.order > 3
        ):
            raise ValueError(
                "device word fusion needs --lexicon and a word LM of "
                "order <= 3 (bigram dense/hashed, trigram hashed); use "
                "--beam-impl host otherwise"
            )
    # One LM load, picked for the engine that will actually run: the
    # host PYTHON expansion (n-best, or a >bigram word LM) needs the
    # Python ArpaLM; every other path takes load_lm's choice (NativeLM
    # when the C++ engine is built — it fuses lexicon/word tables
    # directly).
    py_expansion = beam_impl == "host" and (
        nbest > 1 or (word_lm is not None and word_lm.order > 2)
    )
    if not lm_path:
        lm = None
    elif py_expansion:
        from .decode.lm import ArpaLM

        lm = ArpaLM.read_arpa(lm_path)
    else:
        lm = load_lm(lm_path, alphabet)
    if decoder == "beam" and beam_config is None:
        beam_config = BeamConfig(
            lm_alpha=lm_alpha if lm else 0.0, lm_beta=lm_beta,
            word_lm_alpha=word_lm_alpha if word_lm is not None else 0.0,
            word_lm_beta=word_lm_beta,
            lex_unk_logp=lex_unk_logp if lexicon is not None else 0.0,
        )
    dumper = (
        _PosteriorDumper(dump_posteriors, alphabet, snapshot, split, ds)
        if dump_posteriors else None
    )

    hyps, refs, ids = [], [], []
    confs: list = []  # per-line confidence; parallel to hyps where defined
    lm_fusion = None  # set to "device-interleaved" when the dense path runs
    nbest_lists: list = []  # per-line ranked (uxxxx, score), --nbest > 1
    t0 = time.time()
    # Two-phase, as in serve.OcrService.ocr_lines: dispatch every batch's
    # DEVICE work first (dispatch is async, so H2D/compute/D2H pipeline
    # over the interconnect instead of serializing each batch behind the
    # host decode + relay round-trip), then finalize host-side in order.
    from collections import deque

    ds_widths = ds.widths

    def _conf_of(line_index: int, logp: float) -> float:
        # normalize the decode's log-prob by the line's frame count (known
        # host-side from its true width) -> per-frame geometric mean
        frames = contract.frames_for_width(int(ds_widths[line_index]))
        return float(np.exp(min(logp / max(frames, 1), 0.0)))

    if decoder == "beam" and beam_impl == "device":
        from .decode.device_beam import beam_scan_program, device_beam_decode

        # Interleaved on-device LM fusion when the ARPA order is <= 3
        # (decode/lm.dense_logp_table) or exactly 4 (hashed context
        # table, decode/lm.hashed_logp_table): exact oracle math inside
        # the search, no host rescoring, greedy-shaped packed wire.
        # Higher orders keep the two-pass rescoring path.
        lm_table = None
        lm_hash_kw = {}
        if lm is not None and beam_config.lm_alpha != 0:
            from .decode.lm import ArpaLM, dense_logp_table

            py_lm = (lm if isinstance(lm, ArpaLM)
                     else ArpaLM.read_arpa(lm_path))
            if 2 <= py_lm.order <= 3:
                lm_table = jax.device_put(
                    np.asarray(dense_logp_table(py_lm, alphabet)))
                lm_fusion = "device-interleaved"
            elif py_lm.order == 4:
                from .decode.lm import hashed_logp_table

                tabs = hashed_logp_table(py_lm, alphabet)
                lm_table = jax.device_put(np.asarray(tabs["t3"]))
                lm_hash_kw = dict(
                    lm_hash_keys=jax.device_put(tabs["keys"]),
                    lm_hash_vals=jax.device_put(tabs["vals"]),
                    lm_rows=jax.device_put(tabs["rows"]),
                    lm_probes=int(tabs["probes"]),
                )
                lm_fusion = "device-interleaved-4gram"
        # On-device lexicon constraint (Lexicon.dense_tables) composes
        # with the fused LM; an order>3 LM + lexicon needs --beam-impl
        # host (two-pass rescoring cannot see the constraint).
        lex_kw = {}
        if lexicon is not None:
            if lm is not None and beam_config.lm_alpha != 0 \
                    and lm_table is None:
                raise ValueError(
                    "device lexicon decoding with an LM needs order <= 4 "
                    "(fused); use --beam-impl host for higher orders"
                )
            use_unk = beam_config.lex_unk_logp != 0.0
            next_tbl, boundary = lexicon.dense_tables(unk=use_unk)
            lex_kw = dict(
                lex_next=jax.device_put(next_tbl),
                lex_boundary=jax.device_put(boundary),
            )
            if use_unk:
                lex_kw.update(
                    lex_unk_logp=float(beam_config.lex_unk_logp),
                    space_id=lexicon.space_id,
                )
            if word_lm is not None and beam_config.word_lm_alpha != 0:
                from .decode.lm import (
                    device_word_tables,
                    word_unk_logp,
                )

                # dense up to 8k words, hashed Katz form beyond
                wt = device_word_tables(word_lm, lexicon.words)
                lex_kw.update(
                    {k: (v if isinstance(v, int) else jax.device_put(v))
                     for k, v in wt.items()},
                    word_ids=jax.device_put(
                        lexicon.word_id_table(unk=use_unk)),
                    space_id=lexicon.space_id,
                    word_alpha=float(beam_config.word_lm_alpha),
                    word_beta=float(beam_config.word_lm_beta),
                )
                if use_unk:
                    lex_kw["word_unk_logp"] = float(word_unk_logp(word_lm))
                lm_fusion = (lm_fusion or "") + "+device-word"
        if (lm_table is not None or lex_kw) and nbest > 1:
            # Constrained n-best ON DEVICE: the fused all-beams scan
            # returns every slot's fused final (interleaved LM + lexicon
            # gating + trailing word), so --nbest composes with
            # --lexicon/--word-lm without the host expansion.
            from .decode.device_beam import device_beam_nbest

            fused_prog = beam_scan_program(beam_config, all_beams=True,
                                           fused_lm=True)
            fused_kw = dict(lex_kw)
            if lm_table is not None:
                fused_kw["lm_table"] = lm_table
                fused_kw.update(lm_hash_kw)

            def prog(lp, fm):
                return fused_prog(lp, fm, **fused_kw)

            def finalize(entry):
                indices, valid, pre = entry
                lists = device_beam_nbest(
                    alphabet, beam_config, pre, valid=valid, nbest=nbest,
                )
                for ranked in lists:
                    hyps.append(ranked[0][0] if ranked else "")
                    confs.append(None)
                    nbest_lists.append(ranked)
                _collect_refs(indices, valid, ds, refs, ids)
        elif lm_table is not None or lex_kw:
            from .decode.greedy import SCORE_SCALE as _SC
            from .decode.greedy import collapse_frames as _collapse

            fused_prog = beam_scan_program(beam_config, fused_lm=True)
            fused_kw = dict(lex_kw)
            if lm_table is not None:
                fused_kw["lm_table"] = lm_table
                fused_kw.update(lm_hash_kw)

            def prog(lp, fm):
                # drop totals: fused finalize reads only the packed row,
                # and each fetched array costs a fixed ~75 ms on the relay
                # (ADVICE r3 medium) — only packed may leave the device
                _, packed = fused_prog(lp, fm, **fused_kw)
                return (packed,)

            def finalize(entry):
                indices, valid, pre = entry
                (packed,) = pre
                packed = np.asarray(packed)  # [B, T+1]
                for i in np.flatnonzero(np.asarray(valid)):
                    hyps.append(_collapse(packed[i, :-1], alphabet))
                    confs.append(_conf_of(
                        int(indices[i]), packed[i, -1] / _SC
                    ))
                _collect_refs(indices, valid, ds, refs, ids)
        elif nbest > 1:
            from .decode.device_beam import device_beam_nbest

            prog = beam_scan_program(beam_config, all_beams=True)

            def finalize(entry):
                indices, valid, pre = entry
                lists = device_beam_nbest(
                    alphabet, beam_config, pre, lm=lm, valid=valid,
                    nbest=nbest,
                )
                for ranked in lists:
                    hyps.append(ranked[0][0] if ranked else "")
                    confs.append(None)
                    nbest_lists.append(ranked)
                _collect_refs(indices, valid, ds, refs, ids)
        else:
            prog = beam_scan_program(
                beam_config,
                all_beams=lm is not None and beam_config.lm_alpha != 0,
            )

            def finalize(entry):
                indices, valid, pre = entry
                scored = device_beam_decode(
                    None, None, alphabet, beam_config, lm=lm,
                    valid=valid, precomputed=pre, return_scores=True,
                )
                kept = [i for i in np.flatnonzero(np.asarray(valid))]
                for (hyp, ctc), i in zip(scored, kept):
                    hyps.append(hyp)
                    confs.append(_conf_of(int(indices[i]), ctc))
                _collect_refs(indices, valid, ds, refs, ids)

        inflight = deque()
        for batch in pipe.device_epoch(0):
            log_probs, frame_mask = eval_step(
                variables["params"], variables["batch_stats"],
                batch.images, batch.widths,
            )
            pre = prog(log_probs, frame_mask)
            _host_prefetch(pre)
            if dumper:
                dumper.add(batch, log_probs, frame_mask)
                if len(dumper.q) >= _INFLIGHT_WINDOW:
                    dumper.flush_one()
            inflight.append((batch.indices, batch.valid, pre))
            if len(inflight) >= _INFLIGHT_WINDOW:
                finalize(inflight.popleft())
        while inflight:
            finalize(inflight.popleft())
    elif decoder == "beam":
        from .decode.beam import beam_topk

        def finalize(entry):
            indices, valid, log_probs, frame_mask, topk = entry
            decoded = beam_decode(
                log_probs, frame_mask, alphabet, beam_config, lm=lm,
                valid=valid, precomputed_topk=topk, lexicon=lexicon,
                word_lm=word_lm, nbest=nbest,
            )
            if nbest > 1:  # ranked (uxxxx, score) lists per line
                for ranked in decoded:
                    hyps.append(ranked[0][0] if ranked else "")
                    confs.append(None)
                    nbest_lists.append(ranked)
            else:
                hyps.extend(decoded)
                confs.extend([None] * len(decoded))  # host: no scores
            _collect_refs(indices, valid, ds, refs, ids)

        k = None
        inflight = deque()
        for batch in pipe.device_epoch(0):
            log_probs, frame_mask = eval_step(
                variables["params"], variables["batch_stats"],
                batch.images, batch.widths,
            )
            if k is None:
                k = min(beam_config.topk, log_probs.shape[-1])
            if dumper:
                dumper.add(batch, log_probs, frame_mask)
                if len(dumper.q) >= _INFLIGHT_WINDOW:
                    dumper.flush_one()
            # keep only what finalize needs — dropping the batch object
            # frees its device-resident images as soon as the step retires
            inflight.append((batch.indices, batch.valid, log_probs,
                             frame_mask, beam_topk(log_probs, k)))
            if len(inflight) >= _INFLIGHT_WINDOW:
                finalize(inflight.popleft())
        while inflight:
            finalize(inflight.popleft())
    else:
        from .decode.greedy import (
            SCORE_SCALE,
            collapse_frames,
            greedy_frames_packed,
        )

        def finalize(entry):
            indices, valid, size, pre = entry
            packed = np.asarray(pre)  # [B, T+1]: id rows + score column
            for i in range(size):
                if not valid[i]:
                    continue
                hyps.append(collapse_frames(packed[i, :-1], alphabet))
                confs.append(_conf_of(
                    int(indices[i]), packed[i, -1] / SCORE_SCALE
                ))
            _collect_refs(indices, valid, ds, refs, ids)

        inflight = deque()
        for batch in pipe.device_epoch(0):
            log_probs, frame_mask = eval_step(
                variables["params"], variables["batch_stats"],
                batch.images, batch.widths,
            )
            pre = greedy_frames_packed(log_probs, frame_mask)
            _host_prefetch((pre,))
            if dumper:
                dumper.add(batch, log_probs, frame_mask)
                if len(dumper.q) >= _INFLIGHT_WINDOW:
                    dumper.flush_one()
            inflight.append((batch.indices, batch.valid, batch.size, pre))
            if len(inflight) >= _INFLIGHT_WINDOW:
                finalize(inflight.popleft())
        while inflight:
            finalize(inflight.popleft())
    if dumper:
        dumper.close()
    dt = max(time.time() - t0, 1e-9)
    c, w = cer_wer(hyps, refs)
    report = {
        "snapshot": snapshot,
        "split": split,
        "decoder": (
            f"{decoder}:{beam_impl}" if decoder == "beam" else decoder
        ),
        **({"lm_fusion": lm_fusion} if lm_fusion else {}),
        **({"quantize": quantize} if quantize != "none" else {}),
        "lines": len(hyps),
        "cer": round(c, 5),
        "wer": round(w, 5),
        "lines_per_sec": round(len(hyps) / dt, 1),
    }
    scored = [c for c in confs if c is not None]
    if scored:
        report["mean_confidence"] = round(float(np.mean(scored)), 5)
    if out_path:
        if len(confs) != len(hyps):  # defensive: never misalign the report
            confs = [None] * len(hyps)
        with open(out_path, "w") as f:
            for n, (lid, hyp, ref, conf) in enumerate(
                zip(ids, hyps, refs, confs)
            ):
                hyp_text = uxxxx_to_utf8(hyp)
                rec = {
                    "id": lid,
                    "hyp_uxxxx": hyp,
                    "hyp_text": hyp_text,
                    "ref_uxxxx": ref,
                    "conf": round(conf, 5) if conf is not None else None,
                }
                if _bidi_is_rtl(hyp_text):
                    # RTL models emit scan-order text (text/bidi.py,
                    # round 5); ship the reading-order form alongside
                    rec["hyp_text_logical"] = _bidi_display(hyp_text)
                if nbest_lists:
                    rec["nbest"] = [
                        {"hyp_uxxxx": h, "hyp_text": uxxxx_to_utf8(h),
                         "score": round(s_, 4)}
                        for h, s_ in nbest_lists[n]
                    ]
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    log(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--out", default=None)
    p.add_argument("--batch-pixels", type=int, default=2**21)
    p.add_argument("--eval-align", type=int, default=128,
                   help="re-bucket the snapshot ladder onto this alignment "
                        "for eval (fewer compiled graphs); 0 keeps it")
    p.add_argument("--decoder", choices=("greedy", "beam"), default="greedy")
    p.add_argument("--beam-impl", choices=("device", "host"), default="device",
                   help="beam engine: vectorized on-TPU search (device) or "
                        "the host C++/Python oracle expansion (host)")
    p.add_argument("--word-lm", default=None, metavar="ARPA",
                   help="word-level ARPA LM (utf8 word tokens): fuse at "
                        "word boundaries (with --beam-impl host) — the "
                        "Kaldi-era G.fst workflow")
    p.add_argument("--word-lm-alpha", type=float, default=0.5)
    p.add_argument("--word-lm-beta", type=float, default=0.0)
    p.add_argument("--lexicon", default=None, metavar="WORDS",
                   help="word list (one per line, utf8): constrain beam "
                        "hypotheses to lexicon words (with --beam-impl "
                        "host) — the Kaldi-era lexicon-FST workflow")
    p.add_argument("--lex-unk-logp", type=float, default=0.0,
                   help="with --lexicon: per-character log penalty for "
                        "out-of-lexicon words (<unk> character-bypass "
                        "escape, e.g. -4); 0 keeps the HARD constraint")
    p.add_argument("--nbest", type=int, default=1,
                   help="with --decoder beam: write the top-N ranked "
                        "hypotheses per line into --out (the reference "
                        "era's n-best export); composes with "
                        "--lexicon/--word-lm on either beam impl")
    p.add_argument("--dump-posteriors", default=None, metavar="DIR",
                   help="also export per-frame log-probs (f16 npz per "
                        "batch + alphabet meta) for external decoding/"
                        "rescoring — the reference's prob-dump surface")
    p.add_argument("--lm", default=None, help="ARPA LM path for beam fusion")
    p.add_argument("--lm-alpha", type=float, default=0.5)
    p.add_argument("--lm-beta", type=float, default=0.0)
    p.add_argument("--quantize", choices=("none", "int8"), default="none",
                   help="int8: post-training-quantize the conv stack "
                        "(BN-folded per-channel int8 weights, calibrated "
                        "activation scales; ~1.3x conv forward on v5e — "
                        "models/quant.py)")
    p.add_argument("--quantize-float-prefix", type=int, default=0,
                   help="with --quantize int8: keep the first N convs "
                        "in float (mixed precision; the full-resolution "
                        "stage pays the activation round/clip hardest "
                        "while gaining the least from int8 MACs)")
    p.add_argument("--calib-batches", type=int, default=4,
                   help="with --quantize: calibration batches drawn from "
                        "the split before eval")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run_inference(
        args.snapshot, args.data, args.split,
        batch_pixels=args.batch_pixels, out_path=args.out,
        eval_align=args.eval_align,
        decoder=args.decoder, beam_impl=args.beam_impl, lm_path=args.lm,
        lm_alpha=args.lm_alpha, lm_beta=args.lm_beta,
        dump_posteriors=args.dump_posteriors,
        nbest=args.nbest,
        lexicon_path=args.lexicon,
        lex_unk_logp=args.lex_unk_logp,
        word_lm_path=args.word_lm,
        word_lm_alpha=args.word_lm_alpha,
        word_lm_beta=args.word_lm_beta,
        quantize=args.quantize,
        quantize_float_prefix=args.quantize_float_prefix,
        calib_batches=args.calib_batches,
    )


if __name__ == "__main__":
    main()
