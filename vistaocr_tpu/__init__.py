"""vistaocr_tpu — a TPU-native text-line OCR framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
isi-vista/VistaOCR (segmentation-free CNN-BLSTM-CTC line OCR):

- ``text``     : uxxxx transcript codec, alphabet, CER/WER metrics
- ``data``     : sharded host pipeline, width-bucketed batching, synthetic
                 line rendering, corpus prep (IAM / MADCAT)
- ``models``   : CNN feature extractor + width-major bidirectional LSTM +
                 CTC head, built for MXU-friendly shapes under jit/pjit
- ``ops``      : CTC loss (pure-jax oracle + Pallas kernel), fused LSTM
                 steps, on-device preprocessing
- ``decode``   : greedy CTC collapse, prefix beam search with n-gram LM
- ``parallel`` : mesh construction and sharding rules (DP first-class,
                 TP-ready annotations)
- ``serve``    : batched width-routed inference service

Reference parity notes cite the reconstructed survey (SURVEY.md) since the
upstream tree was unavailable; component numbers (C1..C19) refer to
SURVEY.md section 2.
"""

__version__ = "0.1.0"

# Lazy top-level conveniences (PEP 562): `from vistaocr_tpu import
# OcrService` etc. without paying subpackage (and jax) import cost for
# `import vistaocr_tpu` alone.
_LAZY = {
    "OcrService": ("vistaocr_tpu.serve", "OcrService"),
    "ServiceConfig": ("vistaocr_tpu.serve", "ServiceConfig"),
    "run_inference": ("vistaocr_tpu.infer", "run_inference"),
    "fit": ("vistaocr_tpu.train", "fit"),
    "TrainConfig": ("vistaocr_tpu.train", "TrainConfig"),
    "load_model": ("vistaocr_tpu.checkpoint", "load_model"),
    "Alphabet": ("vistaocr_tpu.text", "Alphabet"),
    "cer_wer": ("vistaocr_tpu.text", "cer_wer"),
    "build_synthetic_dataset": ("vistaocr_tpu.data",
                                "build_synthetic_dataset"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
