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
    ds = ShardedLineDataset(data_dir, split)
    pipe = BatchPipeline(
        ds, alphabet, contract, batch_pixels=batch_pixels,
        drop_remainder=False, shuffle=False,
    )
    if pipe.dropped:
        log(f"warning: {pipe.dropped} lines fit no bucket; skipped")
    eval_step = make_eval_step(model)

    lm = load_lm(lm_path, alphabet) if lm_path else None
    if decoder == "beam" and beam_config is None:
        beam_config = BeamConfig(
            lm_alpha=lm_alpha if lm else 0.0, lm_beta=lm_beta
        )

    hyps, refs, ids = [], [], []
    t0 = time.time()
    # Two-phase, as in serve.OcrService.ocr_lines: dispatch every batch's
    # DEVICE work first (dispatch is async, so H2D/compute/D2H pipeline
    # over the interconnect instead of serializing each batch behind the
    # host decode + relay round-trip), then finalize host-side in order.
    from collections import deque

    if decoder == "beam" and beam_impl == "device":
        from .decode.device_beam import beam_scan_program, device_beam_decode

        prog = beam_scan_program(
            beam_config, all_beams=lm is not None and beam_config.lm_alpha != 0
        )

        def finalize(entry):
            indices, valid, pre = entry
            hyps.extend(device_beam_decode(
                None, None, alphabet, beam_config, lm=lm,
                valid=valid, precomputed=pre,
            ))
            _collect_refs(indices, valid, ds, refs, ids)

        inflight = deque()
        for batch in pipe.device_epoch(0):
            log_probs, frame_mask = eval_step(
                variables["params"], variables["batch_stats"],
                batch.images, batch.widths,
            )
            pre = prog(log_probs, frame_mask)
            _host_prefetch(pre)
            inflight.append((batch.indices, batch.valid, pre))
            if len(inflight) >= _INFLIGHT_WINDOW:
                finalize(inflight.popleft())
        while inflight:
            finalize(inflight.popleft())
    elif decoder == "beam":
        from .decode.beam import beam_topk

        def finalize(entry):
            indices, valid, log_probs, frame_mask, topk = entry
            hyps.extend(beam_decode(
                log_probs, frame_mask, alphabet, beam_config, lm=lm,
                valid=valid, precomputed_topk=topk,
            ))
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
            # keep only what finalize needs — dropping the batch object
            # frees its device-resident images as soon as the step retires
            inflight.append((batch.indices, batch.valid, log_probs,
                             frame_mask, beam_topk(log_probs, k)))
            if len(inflight) >= _INFLIGHT_WINDOW:
                finalize(inflight.popleft())
        while inflight:
            finalize(inflight.popleft())
    else:
        from .decode.greedy import collapse_frames, greedy_frames

        def finalize(entry):
            indices, valid, size, pre = entry
            frames = np.asarray(pre)
            hyps.extend(
                collapse_frames(frames[i], alphabet)
                for i in range(size)
                if valid[i]
            )
            _collect_refs(indices, valid, ds, refs, ids)

        inflight = deque()
        for batch in pipe.device_epoch(0):
            log_probs, frame_mask = eval_step(
                variables["params"], variables["batch_stats"],
                batch.images, batch.widths,
            )
            pre = greedy_frames(log_probs, frame_mask)
            _host_prefetch((pre,))
            inflight.append((batch.indices, batch.valid, batch.size, pre))
            if len(inflight) >= _INFLIGHT_WINDOW:
                finalize(inflight.popleft())
        while inflight:
            finalize(inflight.popleft())
    dt = max(time.time() - t0, 1e-9)
    c, w = cer_wer(hyps, refs)
    report = {
        "snapshot": snapshot,
        "split": split,
        "decoder": (
            f"{decoder}:{beam_impl}" if decoder == "beam" else decoder
        ),
        "lines": len(hyps),
        "cer": round(c, 5),
        "wer": round(w, 5),
        "lines_per_sec": round(len(hyps) / dt, 1),
    }
    if out_path:
        with open(out_path, "w") as f:
            for lid, hyp, ref in zip(ids, hyps, refs):
                f.write(json.dumps({
                    "id": lid,
                    "hyp_uxxxx": hyp,
                    "hyp_text": uxxxx_to_utf8(hyp),
                    "ref_uxxxx": ref,
                }, ensure_ascii=False) + "\n")
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
    p.add_argument("--lm", default=None, help="ARPA LM path for beam fusion")
    p.add_argument("--lm-alpha", type=float, default=0.5)
    p.add_argument("--lm-beta", type=float, default=0.0)
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
    )


if __name__ == "__main__":
    main()
