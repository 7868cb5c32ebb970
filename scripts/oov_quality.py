"""Hard-regime, open-vocabulary quality benchmark + OOV stress of the
constrained decode stack (VERDICT r3 next-round task 1).

Round-3's quality rows all sat at 0.03-1% CER on a closed ~143-word
vocabulary with 0% OOV — the one condition under which a hard lexicon
cannot lose. This run:

1. builds a HARD corpus: thousands-word Zipfian vocabulary
   (data/synth.make_vocabulary) + digits + punctuation + degradations
   heavier than the handwriting preset (OPEN_VOCAB_HARD), with a
   training budget tuned so greedy test CER lands in the literature's
   3-10% band (BASELINE.md row 5);
2. measures the unconstrained decode ladder there
   (greedy / beam / beam + fused 4-gram char LM);
3. builds controlled OOV test splits — 0/10/30% of tokens drawn from a
   held-out vocabulary the lexicon (and training data) never saw — and
   measures the constrained ladder per OOV bucket:
   greedy / lexicon-HARD / lexicon+<unk> bypass / L∘G (+word bigram),
   demonstrating where the hard constraint collapses and what the
   bypass (decode/beam BeamConfig.lex_unk_logp) recovers.

Run on the chip:
    PYTHONPATH=/root/.axon_site:. python scripts/oov_quality.py \
        --out /tmp/vistaocr_oov

Results are recorded in docs/design.md ("Open-vocabulary quality").
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
    p.add_argument("--out", default="/tmp/vistaocr_oov")
    p.add_argument("--language", default="en", choices=("en", "ar", "fa"),
                   help="corpus language (round 5 generalization: the "
                        "r4 protocol was English-only — VERDICT missing "
                        "#2); ar/fa exercise RTL + the larger packed-key "
                        "K and the table-build cost at Arabic alphabets")
    p.add_argument("--vocab", type=int, default=4000,
                   help="training/lexicon vocabulary size")
    p.add_argument("--oov-vocab", type=int, default=1000,
                   help="held-out words (never in training or lexicon)")
    p.add_argument("--num-train", type=int, default=16384)
    p.add_argument("--num-test", type=int, default=768)
    p.add_argument("--max-steps", type=int, default=1500,
                   help="training budget: tuned so greedy test CER lands "
                        "in the 3-10% hard regime")
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--seed", type=int, default=47)
    p.add_argument("--lm-alpha", type=float, default=0.4)
    p.add_argument("--lm-beta", type=float, default=0.4)
    p.add_argument("--unk-logp", type=float, default=-3.0)
    p.add_argument("--unk-sweep", default="-1,-2,-3,-4,-6",
                   help="comma-separated λ values swept at 10%% OOV")
    p.add_argument("--word-lm-alpha", type=float, default=0.6)
    p.add_argument("--word-lm-beta", type=float, default=0.3)
    p.add_argument("--oov-rates", default="0.0,0.1,0.3")
    args = p.parse_args()

    import jax  # noqa: F401  (axon backend registered by sitecustomize)

    from vistaocr_tpu.data import build_synthetic_dataset
    from vistaocr_tpu.data.shards import ShardedLineDataset
    from vistaocr_tpu.data.synth import (
        OPEN_VOCAB_HARD,
        SynthConfig,
        make_vocabulary,
    )
    from vistaocr_tpu.decode.lm import train_char_lm
    from vistaocr_tpu.infer import run_inference
    from vistaocr_tpu.text import uxxxx_to_utf8
    from vistaocr_tpu.train import PRESETS, TrainConfig, fit

    vocab = make_vocabulary(args.vocab + args.oov_vocab, seed=args.seed,
                            language=args.language)
    train_words = vocab[: args.vocab]
    # OOV words must stay within the trained CHARSET (an alphabet miss
    # is a different failure mode than a lexicon miss); at 4k train
    # words every letter is covered, but filter defensively
    charset = set("".join(train_words))
    oov_words = [w for w in vocab[args.vocab:] if set(w) <= charset]

    data_dir = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")
    os.makedirs(args.out, exist_ok=True)

    # Corpus: train/val/test in the FULL hard regime (digits + punct);
    # extra letters-only test splits at controlled OOV rates for the
    # lexicon sweep (a lexicon over words can't honestly cover free
    # digit strings/punctuated forms, so the constrained rows use the
    # letters-only splits — documented in docs/design.md).
    if not os.path.exists(os.path.join(data_dir, "manifest.json")):
        t0 = time.time()
        build_synthetic_dataset(
            data_dir, num_train=args.num_train, num_val=1024,
            num_test=args.num_test, height=args.height, max_width=2048,
            config=SynthConfig(language=args.language,
                               words=train_words, **OPEN_VOCAB_HARD),
            seed=args.seed,
        )
        print(f"# hard corpus built in {time.time()-t0:.0f}s", flush=True)
    oov_rates = [float(r) for r in args.oov_rates.split(",")]
    sweep_cfg = {**OPEN_VOCAB_HARD, "digit_prob": 0.0, "punct_prob": 0.0}
    oov_dirs = {}
    for rate in oov_rates:
        d = os.path.join(args.out, f"oov{int(rate*100):02d}")
        oov_dirs[rate] = d
        if os.path.exists(os.path.join(d, "manifest.json")):
            continue
        build_synthetic_dataset(
            d, num_train=0, num_val=0, num_test=args.num_test,
            height=args.height, max_width=2048,
            config=SynthConfig(language=args.language,
                               words=train_words, oov_words=oov_words,
                               oov_rate=rate, **sweep_cfg),
            seed=args.seed + int(rate * 100) + 7,
        )
    print("# OOV splits ready", flush=True)

    cfg = TrainConfig(**{
        **PRESETS["handwriting"],
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

    ds = ShardedLineDataset(data_dir, "train")
    transcripts = list(ds.transcripts())
    lm_path = os.path.join(args.out, "char4.arpa")
    if not os.path.exists(lm_path):
        train_char_lm(transcripts, order=4).write_arpa(lm_path)
    lm3_path = os.path.join(args.out, "char3.arpa")
    if not os.path.exists(lm3_path):
        train_char_lm(transcripts, order=3).write_arpa(lm3_path)
    wlm_path = os.path.join(args.out, "word2.arpa")
    if not os.path.exists(wlm_path):
        sentences = [uxxxx_to_utf8(t) for t in transcripts]
        train_char_lm(sentences, order=2).write_arpa(wlm_path)
    lex_path = os.path.join(args.out, "lexicon.txt")
    if not os.path.exists(lex_path):
        # The decode space is the STORED transcript space: display order
        # for RTL corpora (text/bidi.py; a pure-RTL word's display form
        # is its reversed char sequence). The word LMs above are already
        # consistent (trained on stored transcripts).
        from vistaocr_tpu.text.bidi import display_order

        with open(lex_path, "w") as f:
            f.write("\n".join(display_order(w) for w in train_words))

    snap = os.path.join(run_dir, "best")
    quiet = dict(log=lambda *a: None)

    # --- LM table build cost at this alphabet size (VERDICT r4 weak #5:
    # nobody had timed a non-Latin-alphabet 4-gram service cold start;
    # the dense build is (K+1)^2*K lm.logp calls, the hashed build adds
    # R*K more) -------------------------------------------------------
    from vistaocr_tpu.checkpoint import load_model
    from vistaocr_tpu.decode.lm import (
        ArpaLM,
        dense_logp_table,
        hashed_logp_table,
    )

    _, _, alphabet, _ = load_model(snap)
    lm3 = ArpaLM.read_arpa(lm3_path)
    lm4 = ArpaLM.read_arpa(lm_path)
    t0 = time.time()
    dense_logp_table(lm3, alphabet)
    t_dense = time.time() - t0
    t0 = time.time()
    tabs = hashed_logp_table(lm4, alphabet)
    t_hash = time.time() - t0
    table_build = {
        "K": alphabet.num_classes,
        "dense3_build_s": round(t_dense, 2),
        "hashed4_build_s": round(t_hash, 2),
        "hashed_rows": int(tabs["rows"].shape[0]),
        "hashed_probes": int(tabs["probes"]),
    }
    print(f"# table build at K={alphabet.num_classes}: "
          f"dense3 {t_dense:.2f}s, hashed4 {t_hash:.2f}s "
          f"(R={table_build['hashed_rows']})", flush=True)

    def row(rep):
        return {k: rep[k] for k in ("cer", "wer", "lines")}

    # --- unconstrained ladder on the full hard test split -------------
    ladder = {}
    for name, kw in (
        ("greedy", dict(decoder="greedy")),
        ("beam", dict(decoder="beam")),
        ("beam_lm3", dict(decoder="beam", lm_path=lm3_path,
                          lm_alpha=args.lm_alpha, lm_beta=args.lm_beta)),
        ("beam_lm4", dict(decoder="beam", lm_path=lm_path,
                          lm_alpha=args.lm_alpha, lm_beta=args.lm_beta)),
    ):
        t0 = time.time()
        ladder[name] = row(run_inference(snap, data_dir, "test",
                                         **kw, **quiet))
        print(f"# ladder {name}: CER {ladder[name]['cer']:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # --- constrained sweep per OOV rate -------------------------------
    sweep = {}
    for rate, d in oov_dirs.items():
        rows = {}
        for name, kw in (
            ("greedy", dict(decoder="greedy")),
            ("lex_hard", dict(decoder="beam", lexicon_path=lex_path)),
            ("lex_unk", dict(decoder="beam", lexicon_path=lex_path,
                             lex_unk_logp=args.unk_logp)),
            ("lg_unk", dict(decoder="beam", lexicon_path=lex_path,
                            lex_unk_logp=args.unk_logp,
                            word_lm_path=wlm_path,
                            word_lm_alpha=args.word_lm_alpha,
                            word_lm_beta=args.word_lm_beta)),
        ):
            t0 = time.time()
            rows[name] = row(run_inference(snap, d, "test", **kw, **quiet))
            print(f"# oov{int(rate*100):02d} {name}: "
                  f"CER {rows[name]['cer']:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
        sweep[f"oov{int(rate*100):02d}"] = rows

    # --- λ sweep at 10% OOV -------------------------------------------
    lam_rows = {}
    if 0.1 in oov_dirs and args.unk_sweep:
        for lam in (float(x) for x in args.unk_sweep.split(",")):
            rep = run_inference(snap, oov_dirs[0.1], "test",
                                decoder="beam", lexicon_path=lex_path,
                                lex_unk_logp=lam, **quiet)
            lam_rows[str(lam)] = row(rep)
            print(f"# λ={lam}: CER {rep['cer']:.4f}", flush=True)

    print(json.dumps({
        "regime": "open-vocab-hard",
        "language": args.language,
        "table_build": table_build,
        "vocab": args.vocab, "oov_vocab": args.oov_vocab,
        "steps": summary["steps"],
        "val_cer": summary["last_val_cer"],
        "ladder_full": ladder,
        "oov_sweep": sweep,
        "unk_lambda_sweep_oov10": lam_rows,
    }))


if __name__ == "__main__":
    main()
