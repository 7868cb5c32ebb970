"""Generate the frozen L∘G device-decode bundle (VERDICT r3 next-round
task 4): one fused device beam decode — char 3-gram LM + lexicon trie +
word-bigram LM, all inside the scan — over fixed posteriors, with the
expected strings recorded. The companion test reruns the fused stack and
asserts the strings byte-match, pinning the end-to-end fused decode (not
only engine-vs-engine parity, which would drift in lockstep if the shared
scoring convention changed).

Run from the repo root:  python tests/golden/make_lg_bundle.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from vistaocr_tpu.decode.beam import BeamConfig, prefix_beam_search  # noqa: E402
from vistaocr_tpu.decode.device_beam import beam_scan_collapsed  # noqa: E402
from vistaocr_tpu.decode.lexicon import Lexicon  # noqa: E402
from vistaocr_tpu.decode.lm import (  # noqa: E402
    dense_logp_table,
    dense_word_logp_table,
    train_char_lm,
)
from vistaocr_tpu.text import Alphabet, utf8_to_uxxxx  # noqa: E402

WORDS = ["cab", "bad", "ace", "bed", "cad", "be", "ad", "dab"]
CFG = dict(beam_width=8, topk=4, prune_logp=-12.0,
           lm_alpha=0.6, lm_beta=0.2, word_alpha=0.8, word_beta=0.3)


def main():
    out_dir = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.default_rng(20260819)
    alphabet = Alphabet.from_charset("abcde ")
    lex = Lexicon.from_words(alphabet, WORDS)

    sents = [" ".join(rng.choice(WORDS, rng.integers(1, 4)))
             for _ in range(160)]
    char_lm = train_char_lm([utf8_to_uxxxx(s) for s in sents], order=3)
    word_lm = train_char_lm(sents, order=2)  # tokens = utf8 words
    char_lm.write_arpa(os.path.join(out_dir, "lg_char_lm.arpa"))
    word_lm.write_arpa(os.path.join(out_dir, "lg_word_lm.arpa"))

    B, T, K = 6, 20, alphabet.num_classes
    logits = rng.normal(0, 3.0, (B, T, K)).astype(np.float32)
    logits[..., 0] += 2.0  # CTC-shaped: blank-heavy frames
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    frames = rng.integers(T // 2, T + 1, B).astype(np.int32)
    mask = np.arange(T)[None, :] < frames[:, None]

    next_tbl, boundary = lex.dense_tables()
    _, packed = beam_scan_collapsed(
        jnp.asarray(log_probs), jnp.asarray(mask),
        beam_width=CFG["beam_width"], topk=CFG["topk"],
        prune_logp=CFG["prune_logp"],
        lm_table=jnp.asarray(dense_logp_table(char_lm, alphabet, order=3)),
        lm_alpha=CFG["lm_alpha"], lm_beta=CFG["lm_beta"],
        lex_next=jnp.asarray(next_tbl), lex_boundary=jnp.asarray(boundary),
        word_table=jnp.asarray(dense_word_logp_table(word_lm, lex.words)),
        word_ids=jnp.asarray(lex.word_id_table()),
        space_id=lex.space_id,
        word_alpha=CFG["word_alpha"], word_beta=CFG["word_beta"],
    )
    packed = np.asarray(packed)
    device_hyps = []
    for b in range(B):
        row = packed[b, :-1]
        device_hyps.append(alphabet.decode(row[row != 0].tolist()))

    # host-oracle agreement gate at bundle creation
    cfg = BeamConfig(beam_width=CFG["beam_width"], topk=CFG["topk"],
                     prune_logp=CFG["prune_logp"], lm_alpha=CFG["lm_alpha"],
                     lm_beta=CFG["lm_beta"], word_lm_alpha=CFG["word_alpha"],
                     word_lm_beta=CFG["word_beta"])
    for b in range(B):
        hyps = prefix_beam_search(log_probs[b, : frames[b]], alphabet, cfg,
                                  lm=char_lm, lexicon=lex, word_lm=word_lm)
        assert device_hyps[b] == hyps[0][0], (b, device_hyps[b], hyps[:3])

    np.savez_compressed(os.path.join(out_dir, "lg_bundle.npz"),
                        log_probs=log_probs, frames=frames)
    with open(os.path.join(out_dir, "lg_bundle.json"), "w") as f:
        json.dump({
            "alphabet": json.loads(alphabet.to_json()),
            "words": WORDS,
            "config": CFG,
            "device_lg": device_hyps,
        }, f, indent=2)
    print("L∘G bundle written:", device_hyps)


if __name__ == "__main__":
    main()
