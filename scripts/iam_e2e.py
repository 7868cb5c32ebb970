"""IAM-format end-to-end: render a synthetic corpus in the STANDARD IAM
directory layout (ascii/lines.txt with '|' word separators and seg
states, lines/<top>/<form>/<id>.png crops at native height, Aachen-style
splits/*.uttlist), run the real ``data.iam.prepare_iam`` over that tree,
train the ``handwriting`` preset on the result, and evaluate greedy vs
beam+LM — so the C3 prep path (SURVEY.md §2) is exercised tree-to-CER,
not just fixture-tested.

    PYTHONPATH=/root/.axon_site:. python scripts/iam_e2e.py --out /tmp/iam_e2e
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_iam_tree(
    root: str,
    *,
    num_forms: int = 800,
    lines_per_form: int = 8,
    render_height: int = 48,
    err_every: int = 37,
    seed: int = 13,
    val_forms: float = 0.06,
    test_forms: float = 0.06,
) -> dict:
    """Write a synthetic corpus in IAM's on-disk layout. Returns counts.

    - ``ascii/lines.txt``: ``id seg graylevel n x y w h transcription``
      rows, words '|'-separated, comment header — the exact shape
      ``data.iam.parse_lines_txt`` consumes;
    - ``lines/<top>/<form>/<line_id>.png``: native-height grayscale crops
      (prep height-normalizes them, exercising ``normalize_line``);
    - ``splits/{train,val,test}.uttlist``: FORM-granularity ids (the
      prefix-match branch of ``_assign_split``).

    Every ``err_every``-th line is marked seg_state ``err`` with a
    deliberately corrupted transcription — the skip_err policy's target.
    """
    import random

    import numpy as np
    from PIL import Image

    from vistaocr_tpu.data.synth import (
        HANDWRITING_DEGRADATIONS,
        SynthConfig,
        SyntheticLineGenerator,
    )

    rng = random.Random(seed)
    gen = SyntheticLineGenerator(
        SynthConfig(language="en", **HANDWRITING_DEGRADATIONS), seed=seed
    )
    os.makedirs(os.path.join(root, "ascii"), exist_ok=True)
    os.makedirs(os.path.join(root, "splits"), exist_ok=True)

    forms = [f"w{f // 100:02d}-{f % 100:03d}" for f in range(num_forms)]
    split_of = {}
    for form in forms:
        r = rng.random()
        split_of[form] = (
            "val" if r < val_forms
            else "test" if r < val_forms + test_forms
            else "train"
        )
    with open(os.path.join(root, "ascii", "lines.txt"), "w",
              encoding="utf-8") as lf:
        lf.write("# synthetic IAM-format corpus (vistaocr_tpu iam_e2e)\n")
        n_lines = n_err = 0
        for form in forms:
            top = form.split("-")[0]
            d = os.path.join(root, "lines", top, form)
            os.makedirs(d, exist_ok=True)
            for k in range(lines_per_form):
                line_id = f"{form}-{k:02d}"
                img, text = gen.sample(height=render_height, max_width=3072)
                Image.fromarray(img).save(os.path.join(d, line_id + ".png"))
                seg = "ok"
                if err_every and n_lines % err_every == err_every - 1:
                    seg = "err"
                    text = text[: max(1, len(text) // 2)]  # truncated seg
                    n_err += 1
                h, w = img.shape
                lf.write(
                    f"{line_id} {seg} 128 1 0 0 {w} {h} "
                    f"{text.replace(' ', '|')}\n"
                )
                n_lines += 1
    for split in ("train", "val", "test"):
        with open(os.path.join(root, "splits", f"{split}.uttlist"), "w") as f:
            for form in forms:
                if split_of[form] == split:
                    f.write(form + "\n")
    counts = {s: sum(v == s for v in split_of.values())
              for s in ("train", "val", "test")}
    return {"forms": counts, "lines": n_lines, "err_lines": n_err}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/vistaocr_iam_e2e")
    p.add_argument("--num-forms", type=int, default=800)
    p.add_argument("--lines-per-form", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=1500)
    p.add_argument("--skip-err", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="drop seg=err lines at prep (their transcripts are "
                        "deliberately corrupted); --no-skip-err keeps them "
                        "(the reference-era ok+err recipe)")
    p.add_argument("--seed", type=int, default=13)
    p.add_argument("--lm-order", type=int, default=4)
    p.add_argument("--lm-alpha", type=float, default=0.4)
    p.add_argument("--lm-beta", type=float, default=0.4)
    args = p.parse_args()

    import jax  # noqa: F401  (axon backend registered by sitecustomize)

    from vistaocr_tpu.data.iam import prepare_iam
    from vistaocr_tpu.data.shards import ShardedLineDataset
    from vistaocr_tpu.decode.lm import train_char_lm
    from vistaocr_tpu.infer import run_inference
    from vistaocr_tpu.train import PRESETS, TrainConfig, fit

    tree = os.path.join(args.out, "iam_root")
    data_dir = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")

    if not os.path.exists(os.path.join(tree, "ascii", "lines.txt")):
        t0 = time.time()
        stats = build_iam_tree(
            tree, num_forms=args.num_forms,
            lines_per_form=args.lines_per_form, seed=args.seed,
        )
        print(f"# IAM tree built in {time.time()-t0:.0f}s: {stats}",
              flush=True)
    if not os.path.exists(os.path.join(data_dir, "manifest.json")):
        t0 = time.time()
        prepare_iam(tree, data_dir, height=32, skip_err=args.skip_err)
        print(f"# prep in {time.time()-t0:.0f}s", flush=True)

    cfg = TrainConfig(**{
        **PRESETS["handwriting"],
        "data_dir": data_dir,
        "snapshot_dir": run_dir,
        "max_steps": args.max_steps,
        "val_interval_steps": 500,
        "log_interval": 200,
        "resume": True,
    })
    t0 = time.time()
    summary = fit(cfg)
    print(f"# trained {summary['steps']} steps in {time.time()-t0:.0f}s: "
          f"val CER {summary['last_val_cer']:.4f}", flush=True)

    lm_path = os.path.join(args.out, f"char{args.lm_order}.arpa")
    if not os.path.exists(lm_path):
        ds = ShardedLineDataset(data_dir, "train")
        train_char_lm(
            list(ds.transcripts()), order=args.lm_order
        ).write_arpa(lm_path)

    rows = {}
    for decoder, kw in (
        ("greedy", {}),
        ("beam", dict(lm_path=lm_path, lm_alpha=args.lm_alpha,
                      lm_beta=args.lm_beta)),
    ):
        rows[decoder] = run_inference(
            os.path.join(run_dir, "best"), data_dir, "test",
            decoder=decoder, **kw,
        )
    print(json.dumps({
        "kind": "iam-tree",
        "steps": summary["steps"],
        "val_cer": summary["last_val_cer"],
        "greedy": {k: rows["greedy"][k] for k in ("cer", "wer", "lines")},
        "beam_lm": {k: rows["beam"][k] for k in ("cer", "wer", "lines")},
    }))


if __name__ == "__main__":
    main()
