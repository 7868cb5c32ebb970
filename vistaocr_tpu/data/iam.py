"""IAM handwriting corpus prep — component C3 (SURVEY.md §2).

Consumes the standard IAM lines distribution (reconstructed reference
behavior: parse IAM metadata, crop/collect line images, normalize
transcripts, write the training store [M]):

    iam_root/
      ascii/lines.txt          # id seg graylevel n x y w h transcription
      lines/a01/a01-000u/a01-000u-00.png   # pre-cropped line images
      (optional) splits/{train,val,test}.uttlist  # one line-id prefix per row

lines.txt transcription uses '|' as the word separator; seg_state "err"
lines are kept or dropped via ``skip_err`` (the reference-era recipes
trained on ok+err [M]; default keeps both).

Output: the shard store (data/shards.py) with uxxxx transcripts — from
here on IAM is indistinguishable from any other corpus.

Usage:
    python -m vistaocr_tpu.data.iam --iam-root <dir> --out <dataset_dir>
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from ..text import utf8_to_uxxxx
from .shards import ShardWriter, write_manifest
from .transforms import normalize_line


def parse_lines_txt(path: str, skip_err: bool = False) -> List[Tuple[str, str]]:
    """-> [(line_id, transcript_text)] in file order."""
    out = []
    with open(path, encoding="utf-8", errors="replace") as f:
        for raw in f:
            if raw.startswith("#") or not raw.strip():
                continue
            parts = raw.rstrip("\n").split(" ", 8)
            if len(parts) < 9:
                continue
            line_id, seg = parts[0], parts[1]
            if skip_err and seg != "ok":
                continue
            text = parts[8].replace("|", " ")
            out.append((line_id, text))
    return out


def line_image_path(iam_root: str, line_id: str) -> str:
    # a01-000u-00 -> lines/a01/a01-000u/a01-000u-00.png
    form = line_id.rsplit("-", 1)[0]  # a01-000u
    top = form.split("-")[0]  # a01
    return os.path.join(iam_root, "lines", top, form, line_id + ".png")


def load_split_lists(iam_root: str) -> Optional[Dict[str, set]]:
    """Reads splits/{train,val,test}.uttlist if present (Aachen-style
    line/form id lists); returns None when absent."""
    d = os.path.join(iam_root, "splits")
    if not os.path.isdir(d):
        return None
    splits = {}
    for split in ("train", "val", "test"):
        p = os.path.join(d, f"{split}.uttlist")
        if os.path.exists(p):
            with open(p) as f:
                splits[split] = {l.strip() for l in f if l.strip()}
    return splits or None


def _assign_split(line_id: str, splits: Optional[Dict[str, set]], rng) -> str:
    if splits:
        for name, ids in splits.items():
            # match on full line id or its form prefix
            if line_id in ids or line_id.rsplit("-", 1)[0] in ids:
                return name
        return ""  # not in any list -> excluded
    r = rng.random()
    return "train" if r < 0.9 else ("val" if r < 0.95 else "test")


def prepare_iam(
    iam_root: str,
    out_dir: str,
    *,
    height: int = 32,
    max_width: int = 2048,
    skip_err: bool = False,
    do_deskew: bool = False,
    seed: int = 0,
    log=print,
) -> str:
    lines = parse_lines_txt(
        os.path.join(iam_root, "ascii", "lines.txt"), skip_err=skip_err
    )
    splits = load_split_lists(iam_root)
    rng = random.Random(seed)

    writers = {
        s: ShardWriter(out_dir, s, height) for s in ("train", "val", "test")
    }
    counts = {s: 0 for s in writers}
    missing = excluded = 0
    for line_id, text in lines:
        split = _assign_split(line_id, splits, rng)
        if not split:
            excluded += 1
            continue
        img_path = line_image_path(iam_root, line_id)
        if not os.path.exists(img_path):
            missing += 1
            continue
        img = Image.open(img_path)
        norm = normalize_line(img, height, do_deskew=do_deskew, max_width=max_width)
        writers[split].add(line_id, norm, utf8_to_uxxxx(text))
        counts[split] += 1

    shard_lists = {s: w.close() for s, w in writers.items() if counts[s]}
    write_manifest(
        out_dir, height, shard_lists,
        extra={"source": "iam", "skip_err": skip_err, "counts": counts},
    )
    log(f"IAM prep: {counts}, missing images: {missing}, excluded: {excluded}")
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iam-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--max-width", type=int, default=2048)
    p.add_argument("--skip-err", action="store_true")
    p.add_argument("--deskew", action="store_true")
    args = p.parse_args(argv)
    prepare_iam(
        args.iam_root, args.out, height=args.height, max_width=args.max_width,
        skip_err=args.skip_err, do_deskew=args.deskew,
    )


if __name__ == "__main__":
    main()
