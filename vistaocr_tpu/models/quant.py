"""Post-training int8 quantization of the conv feature extractor (PTQ).

The eval/serve forward is conv-dominated (conv fwd ~75% of the eval step
at production shapes — docs/design.md step anatomy), and v5e's MXU runs
int8 MACs at roughly twice the bf16 rate. Fenced on chip
(scripts/profile_int8_infer.py, B=256 W=512 flagship stack):

  bf16 baseline           10.37 ms/step
  int8, dynamic scales    10.95 ms/step  REJECTED — the per-layer
                          max|x| reductions cost more than int8 saves
  int8, static scales      8.04 ms/step  0.775x (1.29x faster)

So the shipped design is CALIBRATED static scales: per-output-channel
symmetric int8 weights with BatchNorm folded in (inference running
stats), per-conv-input per-tensor scales frozen from a few calibration
batches. The quantized stack replaces only the conv feature extractor;
bridge/BLSTM/head stay in the model's compute dtype with f32 logits, so
CTC posteriors keep their precision contract.

Reference parity note: the reference (SURVEY.md C17 row) serves f32/f16
torch; int8 PTQ is a capability ADDITION on the TPU side, gated behind
``infer --quantize int8`` and off by default. Quality gate: greedy CER
must survive quantization (tests/test_quant.py pins this end-to-end).

Headroom not taken (documented, not built): activations after ReLU are
non-negative, so unsigned/asymmetric activation quantization would buy
one more bit; XLA's int8 conv path does not currently expose a zero-
point epilogue worth the extra elementwise work at these shapes.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.preprocess import preprocess_images
from .blstm import BLSTMStack
from .cnnlstm import ModelConfig

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5  # flax.linen.BatchNorm default, as used by ConvStack


def _conv_names(config: ModelConfig):
    """(si, ci) pairs in application order."""
    for si, st in enumerate(config.stages):
        for ci in range(st.num_convs):
            yield si, ci


def fold_conv_params(
    params, batch_stats, config: ModelConfig
) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
    """Fold inference-mode BatchNorm into the conv weights.

    conv(x, w) -> BN(y) = (y - mean) * gamma/sqrt(var+eps) + beta
    becomes conv(x, w * a) + b with a = gamma/sqrt(var+eps) (per output
    channel) and b = beta - mean * a. Returns (kernels f32 [3,3,ci,co],
    biases f32 [co]) in application order; conv0_0 is the model's
    top-level ``stem_kernel``.
    """
    kernels, biases = [], []
    for si, ci in _conv_names(config):
        if si == 0 and ci == 0:
            w = params["stem_kernel"]
        else:
            w = params["cnn"][f"conv{si}_{ci}"]["kernel"]
        w = jnp.asarray(w, jnp.float32)
        if config.conv_norm == "batch":
            bn = params["cnn"][f"bn{si}_{ci}"]
            st = batch_stats["cnn"][f"bn{si}_{ci}"]
            a = jnp.asarray(bn["scale"], jnp.float32) * jax.lax.rsqrt(
                jnp.asarray(st["var"], jnp.float32) + _BN_EPS
            )
            b = jnp.asarray(bn["bias"], jnp.float32) - jnp.asarray(
                st["mean"], jnp.float32) * a
            kernels.append(w * a)  # a broadcasts over the co (last) axis
            biases.append(b)
        else:
            kernels.append(w)
            biases.append(jnp.zeros((w.shape[-1],), jnp.float32))
    return tuple(kernels), tuple(biases)


def _pool(x, pool, impl):
    if pool == (1, 1):
        return x
    if impl == "stride":
        return x[:, :: pool[0], :: pool[1], :]
    import flax.linen as nn

    return nn.max_pool(x, window_shape=pool, strides=pool, padding="SAME")


def folded_conv_features(
    kernels, biases, images, widths, config: ModelConfig,
    *, collect_maxes: bool = False,
):
    """Float reference path over the FOLDED params: must match the
    model's eval-mode conv features (tests pin this). Doubles as the
    calibration forward when ``collect_maxes`` (returns per-conv-input
    max|x| alongside the features)."""
    dtype = config.dtype
    x = preprocess_images(
        images, widths, standardize=config.standardize_input, dtype=dtype)
    maxes = []
    i = 0
    for si, st in enumerate(config.stages):
        for _ in range(st.num_convs):
            if collect_maxes:
                maxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = jax.lax.conv_general_dilated(
                x, kernels[i].astype(dtype), (1, 1), "SAME",
                dimension_numbers=_DN, preferred_element_type=dtype,
            )
            x = jax.nn.relu(
                (y.astype(jnp.float32) + biases[i]).astype(dtype))
            i += 1
        x = _pool(x, st.pool, config.conv_pool)
    if collect_maxes:
        return x, jnp.stack(maxes)
    return x


def calibrate_in_scales(
    kernels, biases, config: ModelConfig,
    batches: Iterable[Tuple[jax.Array, jax.Array]],
) -> np.ndarray:
    """Freeze per-conv-input scales from calibration data: scale_i =
    max over batches of max|input_i| / 127. ``batches`` yields
    (images [B,H,W] uint8, widths [B] int32)."""

    @jax.jit
    def step(ks, bs, images, widths):
        _, m = folded_conv_features(
            ks, bs, images, widths, config, collect_maxes=True)
        return m

    m = None
    n = 0
    for images, widths in batches:
        mm = np.asarray(step(kernels, biases, images, widths))
        m = mm if m is None else np.maximum(m, mm)
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return (np.maximum(m, 1e-6) / 127.0).astype(np.float32)


def quantize_conv_stack(kernels, biases, in_scales) -> dict:
    """Per-output-channel symmetric int8 weights + frozen input scales.
    Returns a plain pytree (jit-friendly): kernels int8, wscales f32
    [co], biases f32 [co], in_scales f32 scalars. The folded FLOAT
    kernels ride along (``fkernels``, ~2 MB at flagship size) so a
    mixed-precision prefix (``float_prefix`` in
    ``quantized_conv_features``) can be chosen at serve time without
    re-calibration."""
    qk, ws = [], []
    for k in kernels:
        s = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0 + 1e-12
        qk.append(jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8))
        ws.append(s.astype(jnp.float32))
    return {
        "kernels": tuple(qk),
        "fkernels": tuple(jnp.asarray(k, jnp.float32) for k in kernels),
        "wscales": tuple(ws),
        "biases": tuple(jnp.asarray(b, jnp.float32) for b in biases),
        "in_scales": tuple(
            jnp.float32(s) for s in np.asarray(in_scales).reshape(-1)),
    }


def quantized_conv_features(qstack, images, widths, config: ModelConfig,
                            *, float_prefix: int = 0):
    """int8 conv feature extractor: quantize input with the FROZEN
    per-conv scale, int8 x int8 conv accumulating int32 on the MXU,
    dequantize + bias + relu in the compute dtype.

    ``float_prefix``: run the first N convs with the folded FLOAT
    kernels instead. The activation quantize (round/clip at input
    resolution) is most expensive exactly where the MXU's int8 win is
    smallest — the pre-pool full-resolution stage — so a mixed stack
    can beat both all-float and all-int8 at small (service) batch
    shapes. Requires a qstack with ``fkernels`` (always written since
    round 5)."""
    dtype = config.dtype
    if float_prefix and "fkernels" not in qstack:
        raise ValueError(
            "float_prefix needs a qstack with folded float kernels "
            "(re-create qstack.msgpack; older artifacts lack 'fkernels')"
        )
    x = preprocess_images(
        images, widths, standardize=config.standardize_input, dtype=dtype)
    i = 0
    for si, st in enumerate(config.stages):
        for _ in range(st.num_convs):
            if i < float_prefix:
                y = jax.lax.conv_general_dilated(
                    x, qstack["fkernels"][i].astype(dtype), (1, 1), "SAME",
                    dimension_numbers=_DN, preferred_element_type=dtype,
                )
                x = jax.nn.relu(
                    (y.astype(jnp.float32)
                     + qstack["biases"][i]).astype(dtype))
            else:
                s_in = qstack["in_scales"][i]
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) * (1.0 / s_in)),
                    -127, 127,
                ).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, qstack["kernels"][i], (1, 1), "SAME",
                    dimension_numbers=_DN,
                    preferred_element_type=jnp.int32,
                )
                x = jax.nn.relu((
                    y.astype(jnp.float32) * (s_in * qstack["wscales"][i])
                    + qstack["biases"][i]
                ).astype(dtype))
            i += 1
        x = _pool(x, st.pool, config.conv_pool)
    return x


def sequence_head_apply(config: ModelConfig, params, feats, widths):
    """Bridge + BLSTM + f32 head over precomputed conv features —
    mirrors CnnLstmOcr.__call__ after the conv stack exactly (eval
    mode; dropout off). Returns (log_probs, frame_mask)."""
    dtype = config.dtype
    b, hp, t, c = feats.shape
    x = jnp.transpose(feats, (0, 2, 1, 3)).reshape(b, t, hp * c)

    frames = -(-widths // config.width_stride)
    tpos = jax.lax.broadcasted_iota(jnp.int32, (b, t), dimension=1)
    frame_mask = tpos < frames[:, None]

    br = params["bridge"]
    x = jax.nn.relu(
        jnp.dot(x, br["kernel"].astype(dtype)) + br["bias"].astype(dtype))

    x = BLSTMStack(
        hidden=config.lstm_hidden,
        layers=config.lstm_layers,
        dropout=config.dropout,
        dtype=dtype,
        impl=config.lstm_impl,
    ).apply({"params": params["blstm"]}, x, frame_mask, train=False)

    hd = params["head"]
    logits = (x.astype(jnp.float32) @ jnp.asarray(hd["kernel"], jnp.float32)
              + jnp.asarray(hd["bias"], jnp.float32))
    return jax.nn.log_softmax(logits, axis=-1), frame_mask


def quantize_model(
    model, variables,
    batches: Iterable[Tuple[jax.Array, jax.Array]],
) -> dict:
    """Fold + calibrate + quantize in one call. ``batches`` yields a few
    (images, widths) calibration batches (4-8 is plenty: the scales are
    corpus maxima, which saturate fast)."""
    kernels, biases = fold_conv_params(
        variables["params"], variables.get("batch_stats", {}), model.config)
    in_scales = calibrate_in_scales(kernels, biases, model.config, batches)
    return quantize_conv_stack(kernels, biases, in_scales)


QSTACK_FILE = "qstack.msgpack"


def save_qstack(snapshot_dir: str, qstack: dict) -> str:
    """Persist a quantized conv stack INTO a snapshot directory as an
    optional artifact (round-5: the self-describing-checkpoint invariant
    — CLAUDE.md — extends to int8: serve/infer must be able to run
    quantized from the directory alone, no calibration data at load).
    Written atomically like checkpoint.save_snapshot's files."""
    import os

    from flax import serialization

    # msgpack packs lists, not tuples; arrays go through np.asarray
    payload = serialization.msgpack_serialize(
        {k: [np.asarray(x) for x in v] for k, v in qstack.items()})
    dst = os.path.join(snapshot_dir, QSTACK_FILE)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, dst)
    return dst


def load_qstack(snapshot_dir: str):
    """Load a stored quantized conv stack, or None if the snapshot has
    no int8 artifact. Restores the jit-friendly pytree shape
    (msgpack round-trips tuples as dicts of index keys)."""
    import os

    from flax import serialization

    path = os.path.join(snapshot_dir, QSTACK_FILE)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def _tup(v):
        if isinstance(v, dict):  # {'0': ..., '1': ...} from a tuple
            return tuple(v[k] for k in sorted(v, key=int))
        return tuple(v)

    out = {
        "kernels": _tup(raw["kernels"]),
        "wscales": _tup(raw["wscales"]),
        "biases": _tup(raw["biases"]),
        "in_scales": tuple(
            jnp.float32(np.asarray(s)) for s in _tup(raw["in_scales"])),
    }
    if "fkernels" in raw:  # absent in pre-round-5 artifacts
        out["fkernels"] = _tup(raw["fkernels"])
    return out


def calibration_batches(data_dir: str, snapshot: str, *,
                        calib_batches: int = 4, batch_pixels: int = 2**19,
                        split: str = "train"):
    """Draw calibration (images, widths) batches from a dataset split.

    Defaults to the TRAIN split so reported quantized CER on eval splits
    is leakage-free (ADVICE r4: calibrating on the scored split is mild
    test-set leakage); falls back to whatever split exists.
    """
    from ..checkpoint import load_model
    from ..data.pipeline import BatchPipeline
    from ..data.shards import open_dataset

    _, _, alphabet, contract = load_model(snapshot)
    try:
        ds = open_dataset(data_dir, split)
    except (FileNotFoundError, KeyError):
        ds = open_dataset(data_dir, "test")
    pipe = BatchPipeline(ds, alphabet, contract, batch_pixels=batch_pixels,
                         drop_remainder=False, shuffle=False)
    out = []
    for b in pipe.epoch(0):
        out.append((b.images, b.widths))
        if len(out) >= max(calib_batches, 1):
            break
    return out


def quantize_snapshot(snapshot: str, data_dir: str, *,
                      split: str = "train", calib_batches: int = 4,
                      batch_pixels: int = 2**19) -> str:
    """Fold + calibrate + quantize a snapshot's conv stack and ship the
    result into the snapshot directory (``qstack.msgpack``). After this,
    ``infer --quantize int8`` and ``ServiceConfig(quantize='int8')`` run
    from the directory alone."""
    from ..checkpoint import load_model

    model, variables, _, _ = load_model(snapshot)
    batches = calibration_batches(
        data_dir, snapshot, calib_batches=calib_batches,
        batch_pixels=batch_pixels, split=split)
    qstack = quantize_model(model, variables, batches)
    return save_qstack(snapshot, qstack)


def make_quantized_eval_step(model, qstack, *, float_prefix: int = 0):
    """Drop-in replacement for train.make_eval_step: same signature
    (params, batch_stats, images, widths) -> (log_probs, frame_mask);
    batch_stats is unused (already folded into the int8 kernels).
    ``float_prefix`` selects the mixed mode (see
    quantized_conv_features)."""
    cfg = model.config

    @jax.jit
    def step(params, qs, images, widths):
        feats = quantized_conv_features(
            qs, images, widths, cfg, float_prefix=float_prefix)
        return sequence_head_apply(cfg, params, feats, widths)

    def eval_step(params, batch_stats, images, widths):
        del batch_stats
        return step(params, qstack, images, widths)

    return eval_step


def main(argv=None):
    """CLI: calibrate + quantize a snapshot's conv stack and store the
    int8 artifact inside the snapshot directory.

    Usage: python -m vistaocr_tpu.models.quant --snapshot <dir>/best \
               --data <dataset> [--split train] [--calib-batches 4]
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="train",
                   help="calibration split (train by default: keeps "
                        "quantized eval CER leakage-free)")
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--batch-pixels", type=int, default=2**19)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    out = quantize_snapshot(
        args.snapshot, args.data, split=args.split,
        calib_batches=args.calib_batches, batch_pixels=args.batch_pixels)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
