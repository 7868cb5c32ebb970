"""Alignment-based error analysis over uxxxx transcripts.

The reference era's eval workflow ends in "write hypotheses + CER/WER
report" (SURVEY.md §2 C17); in practice error analysis then happens by
aligning hypothesis to reference and counting confusions. This module
provides that surface natively: Levenshtein alignments with backtrace,
corpus confusion tallies, and a CLI that turns an infer/offline
hypotheses JSONL into a readable report.

    python -m vistaocr_tpu.text.align --hyps hyps.jsonl \
        --data dataset/ --split test --top 20
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

from .error_rates import _char_tokens
from .uxxxx import uxxxx_to_utf8

# An alignment op: (kind, hyp_token, ref_token) where kind is one of
# "ok" | "sub" | "ins" (hyp token with no ref) | "del" (ref token missed).
AlignOp = Tuple[str, Optional[str], Optional[str]]


def align_tokens(hyp: Sequence[str], ref: Sequence[str]) -> List[AlignOp]:
    """Minimal-edit alignment of hyp to ref with backtrace. Ties prefer
    diagonal (match/substitution), then insertion (hyp-consuming), then
    deletion — deterministic so confusion tallies are reproducible."""
    H, R = len(hyp), len(ref)
    # dp[i][j] = edits aligning hyp[:i] to ref[:j]
    dp = [[0] * (R + 1) for _ in range(H + 1)]
    for i in range(1, H + 1):
        dp[i][0] = i
    for j in range(1, R + 1):
        dp[0][j] = j
    for i in range(1, H + 1):
        hi = hyp[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, R + 1):
            row[j] = min(
                prev[j - 1] + (hi != ref[j - 1]),
                prev[j] + 1,
                row[j - 1] + 1,
            )
    ops: List[AlignOp] = []
    i, j = H, R
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + (
            hyp[i - 1] != ref[j - 1]
        ):
            kind = "ok" if hyp[i - 1] == ref[j - 1] else "sub"
            ops.append((kind, hyp[i - 1], ref[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            ops.append(("ins", hyp[i - 1], None))
            i -= 1
        else:
            ops.append(("del", None, ref[j - 1]))
            j -= 1
    ops.reverse()
    return ops


def align(hyp_uxxxx: str, ref_uxxxx: str) -> List[AlignOp]:
    """Character-token alignment of two uxxxx transcript strings."""
    return align_tokens(_char_tokens(hyp_uxxxx), _char_tokens(ref_uxxxx))


def error_report(
    hyps: Sequence[str],
    refs: Sequence[str],
    ids: Optional[Sequence[str]] = None,
    top: int = 20,
    confs: Optional[Sequence[Optional[float]]] = None,
) -> dict:
    """Corpus error analysis. Returns:

    - ``cer``/``wer``: standard corpus aggregates (edits / ref length);
    - ``substitutions``/``insertions``/``deletions``: the ``top`` most
      frequent confusions, each ``{hyp, ref, count}`` with utf8 glyphs;
    - ``worst_lines``: the ``top`` lines by edit count, with per-line
      CER and aligned diff strings for eyeballing;
    - with ``confs`` (per-line confidences from infer/serve/offline),
      ``calibration``: per-confidence-bucket line counts + exact-match
      rates — does low confidence actually flag the bad lines?
    """
    from .error_rates import cer_wer

    if len(hyps) != len(refs):
        raise ValueError(f"hyp/ref count mismatch: {len(hyps)} vs {len(refs)}")
    subs: Counter = Counter()
    inss: Counter = Counter()
    dels: Counter = Counter()
    lines = []
    for n, (h, r) in enumerate(zip(hyps, refs)):
        ops = align(h, r)
        edits = 0
        for kind, ht, rt in ops:
            if kind == "sub":
                subs[(ht, rt)] += 1
                edits += 1
            elif kind == "ins":
                inss[ht] += 1
                edits += 1
            elif kind == "del":
                dels[rt] += 1
                edits += 1
        if edits:
            rlen = max(len(_char_tokens(r)), 1)
            lines.append({
                "id": ids[n] if ids is not None else str(n),
                "edits": edits,
                "cer": round(edits / rlen, 5),
                "hyp": uxxxx_to_utf8(h),
                "ref": uxxxx_to_utf8(r),
            })
    lines.sort(key=lambda d: -d["edits"])
    c, w = cer_wer(hyps, refs)

    calibration = None
    if confs is not None:
        edges = [0.0, 0.5, 0.8, 0.9, 0.95, 0.99, 1.0001]
        buckets = [
            {"conf_lo": edges[i], "conf_hi": min(edges[i + 1], 1.0),
             "lines": 0, "exact": 0}
            for i in range(len(edges) - 1)
        ]
        for h, r, cf in zip(hyps, refs, confs):
            if cf is None:
                continue
            for i, bk in enumerate(buckets):
                # match against the RAW upper edge (1.0001) so cf == 1.0
                # lands in the top bucket; conf_hi is display-clamped
                if edges[i] <= cf < edges[i + 1]:
                    bk["lines"] += 1
                    bk["exact"] += int(h == r)
                    break
        calibration = [
            {**bk, "exact_rate": round(bk["exact"] / bk["lines"], 4)}
            for bk in buckets if bk["lines"]
        ]

    def _tok(t: Optional[str]) -> str:
        return uxxxx_to_utf8(t) if t else ""

    return {
        "lines": len(hyps),
        "lines_with_errors": len(lines),
        "cer": round(c, 5),
        "wer": round(w, 5),
        "substitutions": [
            {"hyp": _tok(h), "ref": _tok(r), "count": n}
            for (h, r), n in subs.most_common(top)
        ],
        "insertions": [
            {"hyp": _tok(t), "count": n} for t, n in inss.most_common(top)
        ],
        "deletions": [
            {"ref": _tok(t), "count": n} for t, n in dels.most_common(top)
        ],
        "worst_lines": lines[:top],
        **({"calibration": calibration} if calibration else {}),
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Confusion/error report from a hypotheses JSONL "
        "(infer --out / decode.offline --out) against dataset references"
    )
    p.add_argument("--hyps", required=True, help="JSONL with id + hyp_uxxxx")
    p.add_argument("--data", required=True, help="dataset dir")
    p.add_argument("--split", default="test")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--json", action="store_true",
                   help="emit the raw report dict instead of tables")
    args = p.parse_args(argv)

    from ..data.shards import open_dataset

    ds = open_dataset(args.data, args.split)
    refs_by_id: Dict[str, str] = {
        lid: ds.transcript(i) for i, lid in enumerate(ds.ids())
    }
    ids, hyps, refs, confs = [], [], [], []
    with open(args.hyps) as f:
        for line in f:
            rec = json.loads(line)
            if rec["id"] in refs_by_id:
                ids.append(rec["id"])
                hyps.append(rec["hyp_uxxxx"])
                refs.append(refs_by_id[rec["id"]])
                confs.append(rec.get("conf"))
    rep = error_report(
        hyps, refs, ids=ids, top=args.top,
        confs=confs if any(c is not None for c in confs) else None,
    )
    if args.json:
        print(json.dumps(rep, ensure_ascii=False))
        return rep
    print(f"lines {rep['lines']}  with-errors {rep['lines_with_errors']}  "
          f"CER {rep['cer']:.4f}  WER {rep['wer']:.4f}")
    for name in ("substitutions", "insertions", "deletions"):
        rows = rep[name]
        if rows:
            print(f"\ntop {name}:")
            for r in rows:
                left = f"{r.get('hyp', '')!r}->{r.get('ref', '')!r}" \
                    if name == "substitutions" else \
                    repr(r.get("hyp") or r.get("ref"))
                print(f"  {r['count']:6d}  {left}")
    if rep.get("calibration"):
        print("\nconfidence calibration (exact-match rate per bucket):")
        for bk in rep["calibration"]:
            print(f"  [{bk['conf_lo']:.2f}, {bk['conf_hi']:.2f})  "
                  f"lines={bk['lines']:5d}  exact={bk['exact_rate']:.3f}")
    if rep["worst_lines"]:
        print("\nworst lines:")
        for d in rep["worst_lines"]:
            print(f"  {d['id']}  edits={d['edits']} cer={d['cer']}")
            print(f"    hyp: {d['hyp']}")
            print(f"    ref: {d['ref']}")
    return rep


if __name__ == "__main__":
    main()
