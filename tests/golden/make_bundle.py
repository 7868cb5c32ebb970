"""Generate the frozen decode/parity bundle (SURVEY.md §4 "Parity").

Run from the repo root:  python tests/golden/make_bundle.py

Freezes random-but-deterministic posteriors plus the current decode +
metric outputs. The companion test asserts these stay byte-identical —
any change to greedy collapse, beam scoring, or CER/WER tokenization
trips it, which is exactly what the reference-parity gate needs.
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

from vistaocr_tpu.decode import BeamConfig, beam_decode, greedy_decode  # noqa: E402
from vistaocr_tpu.decode.beam import prefix_beam_search  # noqa: E402
from vistaocr_tpu.text import Alphabet, cer_wer, utf8_to_uxxxx  # noqa: E402


def main():
    out_dir = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.default_rng(20260816)
    alphabet = Alphabet.from_charset("abcdefghijklmnopqrstuvwxyz ")
    B, T, K = 6, 24, alphabet.num_classes
    logits = rng.normal(0, 2.5, (B, T, K)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    frames = rng.integers(T // 2, T + 1, B).astype(np.int32)
    mask = np.arange(T)[None, :] < frames[:, None]

    refs = [utf8_to_uxxxx(s) for s in
            ["the cat", "sat on", "a mat", "dogs run", "we go", "ok"]]

    greedy = greedy_decode(jnp.asarray(log_probs), jnp.asarray(mask), alphabet)
    beam = beam_decode(jnp.asarray(log_probs), jnp.asarray(mask), alphabet,
                       BeamConfig(beam_width=8, topk=6))
    # force the PYTHON beam path too (native may or may not be built)
    beam_py = []
    for b in range(B):
        hyps = prefix_beam_search(log_probs[b, : frames[b]], alphabet,
                                  BeamConfig(beam_width=8, topk=6))
        beam_py.append(hyps[0][0])
    assert beam == beam_py, "native/python beam disagree at bundle creation"

    g_cer, g_wer = cer_wer(greedy, refs)
    b_cer, b_wer = cer_wer(beam, refs)

    np.savez_compressed(
        os.path.join(out_dir, "decode_bundle.npz"),
        log_probs=log_probs, frames=frames,
    )
    with open(os.path.join(out_dir, "decode_bundle.json"), "w") as f:
        json.dump({
            "alphabet": json.loads(alphabet.to_json()),
            "refs": refs,
            "greedy": greedy,
            "beam": beam,
            "greedy_cer": g_cer, "greedy_wer": g_wer,
            "beam_cer": b_cer, "beam_wer": b_wer,
        }, f, indent=2)
    print("bundle written:", greedy[:2], f"cer={g_cer:.4f}")


if __name__ == "__main__":
    main()
