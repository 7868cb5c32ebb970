"""MADCAT-format end-to-end: compose synthetic Arabic PAGE images plus
MDF-style XML (zones > lines with polygon coords and per-token <seg>
text), run the real ``data.madcat.prepare_madcat`` over the tree (polygon
crops, Arabic policy, page-level splits), train the ``printed`` preset,
and evaluate greedy vs beam+LM — the C4 twin of scripts/iam_e2e.py
(SURVEY.md §2): the prep path proven tree-to-CER on its native layout.

    PYTHONPATH=/root/.axon_site:. python scripts/madcat_e2e.py --out /tmp/madcat_e2e
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_madcat_tree(
    root: str,
    *,
    num_pages: int = 400,
    lines_per_page: int = 12,
    render_height: int = 44,
    seed: int = 7,
) -> dict:
    """Write a synthetic corpus in MADCAT's on-disk layout. Returns counts.

    Each page: ``lines_per_page`` RTL lines rendered by the synthesizer,
    stacked onto one grayscale page image with jittered x-offsets and
    inter-line gaps; ``madcat/<page>.madcat.xml`` records each line as
    <zone><line id><coords points="x,y ..."/><token><seg>word</seg>...
    with a SIX-point polygon (rectangle with clipped corners) so the
    prep's polygon masking path runs, not just bounding boxes.
    """
    import numpy as np
    from PIL import Image

    from vistaocr_tpu.data.synth import SynthConfig, SyntheticLineGenerator

    rng = np.random.default_rng(seed)
    gen = SyntheticLineGenerator(
        SynthConfig(language="ar", noise=0.15, blur_prob=0.3,
                    rotate_max_deg=1.5),
        seed=seed,
    )
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "madcat"), exist_ok=True)

    n_lines = 0
    gap, margin = 14, 20
    for p in range(num_pages):
        page_id = f"ar_{p:04d}"
        rendered = [gen.sample(height=render_height, max_width=1800)
                    for _ in range(lines_per_page)]
        page_w = max(im.shape[1] for im, _ in rendered) + 2 * margin + 40
        page_h = margin * 2 + sum(
            im.shape[0] + gap for im, _ in rendered
        )
        page = np.full((page_h, page_w), 235, np.uint8)  # paper-ish gray
        xml = ['<?xml version="1.0" encoding="UTF-8"?>', "<madcat>", "<zone>"]
        y = margin
        for k, (im, text) in enumerate(rendered):
            h, w = im.shape
            x = margin + int(rng.integers(0, 40))
            page[y : y + h, x : x + w] = np.minimum(
                page[y : y + h, x : x + w], im
            )
            # six-point polygon: rectangle with two clipped corners
            c = min(6, h // 3)
            pts = [
                (x + c, y), (x + w, y), (x + w, y + h),
                (x, y + h), (x, y + c), (x + c, y),
            ]
            pts_s = " ".join(f"{px},{py}" for px, py in pts)
            toks = "".join(
                f"<token><seg>{t}</seg></token>" for t in text.split()
            )
            xml.append(
                f'<line id="l{k:02d}"><coords points="{pts_s}"/>{toks}</line>'
            )
            y += h + gap
            n_lines += 1
        xml += ["</zone>", "</madcat>"]
        Image.fromarray(page).save(
            os.path.join(root, "images", page_id + ".png")
        )
        with open(os.path.join(root, "madcat", page_id + ".madcat.xml"),
                  "w", encoding="utf-8") as f:
            f.write("\n".join(xml))
    return {"pages": num_pages, "lines": n_lines}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/vistaocr_madcat_e2e")
    p.add_argument("--num-pages", type=int, default=400)
    p.add_argument("--lines-per-page", type=int, default=12)
    p.add_argument("--max-steps", type=int, default=1500)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--lm-order", type=int, default=4)
    p.add_argument("--lm-alpha", type=float, default=0.4)
    p.add_argument("--lm-beta", type=float, default=0.4)
    args = p.parse_args()

    import jax  # noqa: F401  (axon backend registered by sitecustomize)

    from vistaocr_tpu.data.madcat import prepare_madcat
    from vistaocr_tpu.data.shards import ShardedLineDataset
    from vistaocr_tpu.decode.lm import train_char_lm
    from vistaocr_tpu.infer import run_inference
    from vistaocr_tpu.train import PRESETS, TrainConfig, fit

    tree = os.path.join(args.out, "madcat_root")
    data_dir = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")

    if not os.path.isdir(os.path.join(tree, "madcat")):
        t0 = time.time()
        stats = build_madcat_tree(
            tree, num_pages=args.num_pages,
            lines_per_page=args.lines_per_page, seed=args.seed,
        )
        print(f"# MADCAT tree built in {time.time()-t0:.0f}s: {stats}",
              flush=True)
    if not os.path.exists(os.path.join(data_dir, "manifest.json")):
        t0 = time.time()
        prepare_madcat(tree, data_dir, height=32)
        print(f"# prep in {time.time()-t0:.0f}s", flush=True)

    cfg = TrainConfig(**{
        **PRESETS["printed"],
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
        "kind": "madcat-tree",
        "steps": summary["steps"],
        "val_cer": summary["last_val_cer"],
        "greedy": {k: rows["greedy"][k] for k in ("cer", "wer", "lines")},
        "beam_lm": {k: rows["beam"][k] for k in ("cer", "wer", "lines")},
    }))


if __name__ == "__main__":
    main()
