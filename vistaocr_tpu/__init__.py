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
