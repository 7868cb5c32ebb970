"""Corpus-scale quality run: synthesize a degraded corpus, train a preset
on-chip, then evaluate greedy vs beam(+char-LM) on the held-out test
split. This is the recipe behind the quality table in docs/design.md
(Farsi/Arabic printed in round 2; the handwriting-shaped run in round 3).

Run (handwriting preset, 16k lines):
    PYTHONPATH=/root/.axon_site:. python scripts/quality_run.py \
        --kind handwriting --out /tmp/vistaocr_hw

Kinds:
    handwriting  en words + slant/elastic/stroke-jitter degradations,
                 trained with --preset handwriting (configs #2/#3 shape)
    printed-fa / printed-ar   the round-2 printed recipes (kept for
                 reproducibility)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", default="handwriting",
                   choices=("handwriting", "printed-fa", "printed-ar"))
    p.add_argument("--out", default="/tmp/vistaocr_quality")
    p.add_argument("--num-train", type=int, default=16384)
    p.add_argument("--num-test", type=int, default=1024)
    p.add_argument("--max-steps", type=int, default=3000)
    p.add_argument("--height", type=int, default=32,
                   help="line height in px (resolution-scaling studies: "
                        "the reference program's follow-up work varied "
                        "input resolution; CER/throughput trade off)")
    p.add_argument("--seed", type=int, default=31)
    p.add_argument("--lm-order", type=int, default=4)
    p.add_argument("--lm-alpha", type=float, default=0.4)
    p.add_argument("--lm-beta", type=float, default=0.4)
    args = p.parse_args()

    import jax  # noqa: F401  (axon backend registered by sitecustomize)

    from vistaocr_tpu.data import build_synthetic_dataset
    from vistaocr_tpu.data.shards import ShardedLineDataset
    from vistaocr_tpu.data.synth import HANDWRITING_DEGRADATIONS, SynthConfig
    from vistaocr_tpu.decode.lm import train_char_lm
    from vistaocr_tpu.infer import run_inference
    from vistaocr_tpu.train import PRESETS, TrainConfig, fit

    data_dir = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")

    if args.kind == "handwriting":
        synth = SynthConfig(language="en", **HANDWRITING_DEGRADATIONS)
        preset = "handwriting"
    elif args.kind == "printed-fa":
        synth = SynthConfig(language="fa", noise=0.15, blur_prob=0.3,
                            rotate_max_deg=1.5)
        preset = "printed"
    else:
        synth = SynthConfig(language="ar", noise=0.15, blur_prob=0.3,
                            rotate_max_deg=1.5)
        preset = "printed"

    if not os.path.exists(os.path.join(data_dir, "manifest.json")):
        t0 = time.time()
        build_synthetic_dataset(
            data_dir, num_train=args.num_train, num_val=1024,
            num_test=args.num_test, height=args.height, max_width=2048,
            config=synth, seed=args.seed,
        )
        print(f"# corpus built in {time.time()-t0:.0f}s", flush=True)

    cfg = TrainConfig(**{
        **PRESETS[preset],
        "data_dir": data_dir,
        "snapshot_dir": run_dir,
        "line_height": args.height,
        "max_steps": args.max_steps,
        "val_interval_steps": 500,
        "log_interval": 200,
        "resume": True,
    })
    t0 = time.time()
    summary = fit(cfg)
    print(f"# trained {summary['steps']} steps in {time.time()-t0:.0f}s: "
          f"val CER {summary['last_val_cer']:.4f}", flush=True)

    # char LM over the train transcripts (decode/lm.py)
    lm_path = os.path.join(args.out, f"char{args.lm_order}.arpa")
    if not os.path.exists(lm_path):
        ds = ShardedLineDataset(data_dir, "train")
        lm = train_char_lm(list(ds.transcripts()), order=args.lm_order)
        lm.write_arpa(lm_path)

    rows = {}
    for decoder, kw in (
        ("greedy", {}),
        ("beam", dict(lm_path=lm_path, lm_alpha=args.lm_alpha,
                      lm_beta=args.lm_beta)),
    ):
        rep = run_inference(
            os.path.join(run_dir, "best"), data_dir, "test",
            decoder=decoder, **kw,
        )
        rows[decoder] = rep
    print(json.dumps({
        "kind": args.kind,
        "height": args.height,
        "steps": summary["steps"],
        "val_cer": summary["last_val_cer"],
        "greedy": {k: rows["greedy"][k] for k in ("cer", "wer", "lines")},
        "beam_lm": {k: rows["beam"][k] for k in ("cer", "wer", "lines")},
    }))


if __name__ == "__main__":
    main()
