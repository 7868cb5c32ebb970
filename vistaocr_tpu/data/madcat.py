"""MADCAT Arabic corpus prep — component C4 (SURVEY.md §2).

Consumes LDC MADCAT-style page layouts: one MDF XML per page image, zones
containing line elements with polygon coordinates and per-token Arabic
text (reconstructed reference behavior: parse zones/polygons, crop RTL
line images, apply an explicit Arabic normalization policy, write the
training store [M]). Expected layout::

    madcat_root/
      images/<page-id>.png|.jpg|.tif
      madcat/<page-id>.madcat.xml

The parser accepts the MDF element shapes commonly found in MADCAT
releases: <zone><line id=...><coords points="x,y x,y ..."/>
<token><seg>text</seg></token>...</line></zone> and tolerates attribute
variants (points vs x/y child elements).

Arabic normalization policy (SURVEY.md hard-part #5 — EXPLICIT, tested):
- tokens are joined with a single space in XML document order (MADCAT
  token order within a line IS the logical reading order), then the line
  is converted to DISPLAY order (``display_order=True`` default,
  text/bidi.py): CTC labels must be in scan order, and round 5 measured
  the cost of training on logical-order RTL labels (flat 76% CER in the
  open-vocab hard regime — docs/design.md "Round 5: RTL display
  order"). CER over display order equals CER over logical order for
  pure-RTL lines (edit distance is reversal-invariant); pass
  ``--logical-order`` to reproduce the pre-round-5 store;
- optional diacritic stripping (``strip_diacritics``): removes Arabic
  harakat (U+064B..U+0652, U+0670), default OFF;
- optional presentation-form folding (``fold_presentation``): NFKC on
  the Arabic presentation blocks (U+FB50..U+FEFF) only, default ON —
  MADCAT ground truth is already in base forms, but scanned-along
  metadata sometimes is not;
- tatweel (U+0640) removal, default ON.

Usage:
    python -m vistaocr_tpu.data.madcat --madcat-root <dir> --out <dir>
"""

from __future__ import annotations

import argparse
import glob
import os
import random
import unicodedata
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from ..text import utf8_to_uxxxx
from .shards import ShardWriter, write_manifest
from .transforms import normalize_line

_DIACRITICS = set(
    [chr(c) for c in range(0x064B, 0x0653)] + [chr(0x0670)]
)
_TATWEEL = chr(0x0640)


@dataclass
class ArabicPolicy:
    strip_diacritics: bool = False
    fold_presentation: bool = True
    remove_tatweel: bool = True
    # Store transcripts in DISPLAY order (text/bidi.display_order): CTC
    # labels must be in scan order, and an RTL line's scan order is the
    # reverse of its logical order. Round 5 measured the cost of logical
    # labels (the pre-round-5 default): a line-global reversal the BLSTM
    # must learn — flat 76% CER in the Arabic open-vocab hard regime,
    # ~2-5x CER tax even on closed vocabularies (docs/design.md "Round
    # 5: RTL display order"). display_order(hyp) restores logical order
    # for reporting; CER is reversal-invariant for pure-RTL lines.
    display_order: bool = True

    def apply(self, text: str) -> str:
        if self.fold_presentation:
            text = "".join(
                unicodedata.normalize("NFKC", ch)
                if 0xFB50 <= ord(ch) <= 0xFEFF
                else ch
                for ch in text
            )
        if self.remove_tatweel:
            text = text.replace(_TATWEEL, "")
        if self.strip_diacritics:
            text = "".join(ch for ch in text if ch not in _DIACRITICS)
        text = " ".join(text.split())  # collapse whitespace
        if self.display_order:
            from ..text.bidi import display_order

            text = display_order(text)
        return text


def _parse_points(line_el) -> Optional[np.ndarray]:
    """Polygon points from <coords points="x,y x,y"> or <point x= y=/>."""
    coords = line_el.find("coords")
    if coords is None:
        coords = line_el
    pts_attr = coords.get("points")
    pts: List[Tuple[float, float]] = []
    if pts_attr:
        for pair in pts_attr.replace(";", " ").split():
            x, y = pair.split(",")[:2]
            pts.append((float(x), float(y)))
    else:
        for pt in coords.findall("point"):
            pts.append((float(pt.get("x")), float(pt.get("y"))))
    if len(pts) < 2:
        return None
    return np.array(pts, dtype=np.float64)


def _line_text(line_el) -> str:
    toks = []
    for tok in line_el.iter("token"):
        seg = tok.find("seg")
        text = (seg.text if seg is not None else tok.text) or ""
        text = text.strip()
        if text:
            toks.append(text)
    if not toks:  # fall back to any bare text payload
        text = "".join(line_el.itertext()).strip()
        toks = text.split()
    return " ".join(toks)


def parse_madcat_xml(xml_path: str):
    """-> [(line_id, polygon ndarray [N,2], raw_text)] for one page."""
    tree = ET.parse(xml_path)
    root = tree.getroot()
    out = []
    for i, line_el in enumerate(root.iter("line")):
        line_id = line_el.get("id") or f"line{i:03d}"
        poly = _parse_points(line_el)
        text = _line_text(line_el)
        if poly is None or not text:
            continue
        out.append((line_id, poly, text))
    return out


def crop_polygon(page: np.ndarray, poly: np.ndarray, pad: int = 2) -> np.ndarray:
    """Bounding-box crop with everything outside the polygon whitened
    (zones can overlap vertically in MADCAT pages)."""
    h, w = page.shape[:2]
    x0 = max(0, int(poly[:, 0].min()) - pad)
    x1 = min(w, int(np.ceil(poly[:, 0].max())) + pad)
    y0 = max(0, int(poly[:, 1].min()) - pad)
    y1 = min(h, int(np.ceil(poly[:, 1].max())) + pad)
    if x1 <= x0 or y1 <= y0:
        return np.zeros((0, 0), np.uint8)
    crop = page[y0:y1, x0:x1].copy()
    if len(poly) >= 3:
        from PIL import ImageDraw

        m = Image.new("L", (x1 - x0, y1 - y0), 0)
        ImageDraw.Draw(m).polygon(
            [(float(x - x0), float(y - y0)) for x, y in poly], fill=255
        )
        mask = np.asarray(m) == 0
        crop[mask] = 255
    return crop


def prepare_madcat(
    madcat_root: str,
    out_dir: str,
    *,
    height: int = 32,
    max_width: int = 2048,
    policy: ArabicPolicy = ArabicPolicy(),
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    seed: int = 0,
    log=print,
) -> str:
    xml_paths = sorted(glob.glob(os.path.join(madcat_root, "madcat", "*.xml")))
    rng = random.Random(seed)
    writers = {s: ShardWriter(out_dir, s, height) for s in ("train", "val", "test")}
    counts = {s: 0 for s in writers}
    pages_missing = 0

    for xml_path in xml_paths:
        page_id = os.path.basename(xml_path).split(".")[0]
        img_path = None
        for ext in (".png", ".jpg", ".jpeg", ".tif", ".tiff"):
            cand = os.path.join(madcat_root, "images", page_id + ext)
            if os.path.exists(cand):
                img_path = cand
                break
        if img_path is None:
            pages_missing += 1
            continue
        page = np.asarray(Image.open(img_path).convert("L"), dtype=np.uint8)
        # page-level split keeps writers/pages out of both train and eval
        r = rng.random()
        split = (
            "test" if r < test_frac else "val" if r < test_frac + val_frac else "train"
        )
        for line_id, poly, raw in parse_madcat_xml(xml_path):
            text = policy.apply(raw)
            if not text:
                continue
            crop = crop_polygon(page, poly)
            if crop.size == 0 or min(crop.shape) < 4:
                continue
            norm = normalize_line(crop, height, max_width=max_width)
            writers[split].add(f"{page_id}_{line_id}", norm, utf8_to_uxxxx(text))
            counts[split] += 1

    shard_lists = {s: w.close() for s, w in writers.items() if counts[s]}
    write_manifest(
        out_dir, height, shard_lists,
        extra={
            "source": "madcat",
            "policy": vars(policy),
            "counts": counts,
        },
    )
    log(f"MADCAT prep: {counts}, pages missing images: {pages_missing}")
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--madcat-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--max-width", type=int, default=2048)
    p.add_argument("--strip-diacritics", action="store_true")
    p.add_argument("--keep-tatweel", action="store_true")
    p.add_argument("--logical-order", action="store_true",
                   help="store logical-order transcripts (pre-round-5 "
                        "behavior; trains a line-global reversal into "
                        "the model — see ArabicPolicy.display_order)")
    args = p.parse_args(argv)
    prepare_madcat(
        args.madcat_root, args.out, height=args.height, max_width=args.max_width,
        policy=ArabicPolicy(
            strip_diacritics=args.strip_diacritics,
            remove_tatweel=not args.keep_tatweel,
            display_order=not args.logical_order,
        ),
    )


if __name__ == "__main__":
    main()
