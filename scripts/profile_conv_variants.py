"""Conv residual fencing (VERDICT r3 task 5): the conv stack sustains
~120 of ~152 TFLOPs and is ~54% of the train step — the one perf claim
without measured-and-rejected entries behind it. This harness times the
CONV STACK ONLY (f+b, relu between convs, pools; BN off so formulation
deltas aren't diluted) as one K-step lax.scan program per variant — the
in-context discipline of profile_ablate.py — and checks grad numerics
against the baseline:

  baseline      flagship stack via lax.conv_general_dilated (what XLA
                autodiff does for dx/dW)
  stem_im2col   the narrow first conv (C_in=1, contraction depth 9 —
                MXU-starved) reformulated as patch-extraction + matmul
  dw_f32        custom-vjp conv: dx/dW written EXPLICITLY as convs with
                the standard transpose formulation, f32 dW accumulation
                (control for the next variant: same transposes)
  dw_bf16       same, but the dW conv accumulates in bf16 and upcasts —
                the 'dW precision variant' angle

Run: PYTHONPATH=/root/.axon_site:. python scripts/profile_conv_variants.py
Results go to docs/design.md ("Round-4 conv fencing").
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/vistaocr_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vistaocr_tpu.models.cnn import DEFAULT_STAGES  # noqa: E402

DN = ("NHWC", "HWIO", "NHWC")


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def conv_plain(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )


def _dx_conv(dy, k):
    kT = jnp.flip(k, (0, 1)).swapaxes(2, 3)  # [3,3,Co,Ci]
    return jax.lax.conv_general_dilated(
        dy, kT.astype(dy.dtype), (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=dy.dtype,
    )


def _dw_conv(x, dy, acc_dtype):
    # dW[h,w,ci,co] = sum_{b,y,x} x[b,y+h-1,x+w-1,ci] * dy[b,y,x,co]:
    # a conv with batch<->feature swapped on the lhs and dy as the kernel
    out = jax.lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)),   # [Ci, H, W, B]
        jnp.transpose(dy, (1, 2, 0, 3)),  # [H, W, B, Co]
        (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
        preferred_element_type=acc_dtype,
    )  # [Ci, 3, 3, Co]
    return jnp.transpose(out, (1, 2, 0, 3)).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_custom(x, k, acc_dtype):
    return conv_plain(x, k)


def _cc_fwd(x, k, acc_dtype):
    return conv_plain(x, k), (x, k)


def _cc_bwd(acc_dtype, res, dy):
    x, k = res
    return _dx_conv(dy, k), _dw_conv(x, dy, acc_dtype)


conv_custom.defvjp(_cc_fwd, _cc_bwd)


def stem_im2col(x, k):
    # [B,H,W,1] -> 3x3 patches [B,H,W,9] -> matmul with k [9,C0]
    pats = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), "SAME", dimension_numbers=DN,
    )  # [B, H, W, 9]
    return jnp.einsum(
        "bhwp,pc->bhwc", pats, k.reshape(9, -1).astype(x.dtype),
        preferred_element_type=x.dtype,
    )


# Winograd F(2x2, 3x3): 2.25x multiply reduction for 3x3 stride-1 convs.
# XLA never emits this on TPU (direct conv rides the MXU); the open
# question is whether the 16-matmul Winograd-domain contraction at
# BHW/4 tiles beats direct 9-deep contraction despite the 4x tile
# materialization the transforms force through HBM in plain XLA.
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)
_TIN = np.einsum("ai,bj->abij", _BT, _BT).reshape(16, 16)
_TOUT = np.einsum("pi,qj->pqij", _AT, _AT).reshape(4, 16)


def winograd_conv(x, k):
    Bb, H, W, Ci = x.shape
    Co = k.shape[-1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tiles = [
        jax.lax.slice(xp, (0, i, j, 0), (Bb, i + H - 1, j + W - 1, Ci),
                      (1, 2, 2, 1))
        for i in range(4) for j in range(4)
    ]
    d = jnp.stack(tiles)  # [16, B, H/2, W/2, Ci]
    U = jnp.einsum("ai,bj,ijco->abco", _G, _G,
                   k.astype(jnp.float32)).reshape(16, Ci, Co)
    V = jnp.einsum("ut,tbhwc->ubhwc", jnp.asarray(_TIN, x.dtype), d)
    M = jnp.einsum("ubhwc,uco->ubhwo", V, U.astype(x.dtype),
                   preferred_element_type=x.dtype)
    Y = jnp.einsum("vu,ubhwo->vbhwo", jnp.asarray(_TOUT, x.dtype), M)
    return (Y.reshape(2, 2, Bb, H // 2, W // 2, Co)
             .transpose(2, 3, 0, 4, 1, 5).reshape(Bb, H, W, Co))


def max_pool(x, pool):
    if pool == (1, 1):
        return x
    import flax.linen as nn

    return nn.max_pool(x, window_shape=pool, strides=pool, padding="SAME")


def stack(kernels, x, *, variant):
    i = 0
    for si, st in enumerate(DEFAULT_STAGES):
        for ci in range(st.num_convs):
            k = kernels[i]
            i += 1
            if si == 0 and ci == 0 and variant == "stem_im2col":
                x = stem_im2col(x, k)
            elif variant == "winograd" and not (si == 0 and ci == 0):
                # stem stays direct: contraction depth 1 is MXU-starved
                # in BOTH formulations and Winograd only shrinks it
                x = winograd_conv(x, k)
            elif variant == "dw_f32":
                x = conv_custom(x, k, jnp.float32)
            elif variant == "dw_bf16":
                x = conv_custom(x, k, jnp.bfloat16)
            else:
                x = conv_plain(x, k)
            x = jax.nn.relu(x)
        x = max_pool(x, st.pool)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch-pixels", type=int, default=2**22)
    ap.add_argument("--scan-steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None,
                    choices=("cpu", "tpu", "axon"))
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    H, W, K = 32, args.width, args.scan_steps
    B = max(8, args.batch_pixels // (H * W) // 8 * 8)
    print(f"# B={B} W={W} scan_steps={K}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1, (B, H, W, 1)).astype(np.float32), jnp.bfloat16)
    kernels = []
    cin = 1
    for st in DEFAULT_STAGES:
        for _ in range(st.num_convs):
            kernels.append(jnp.asarray(
                rng.normal(0, 0.05, (3, 3, cin, st.channels)), jnp.float32))
            cin = st.channels
    kernels = tuple(kernels)

    def build(variant):
        def loss_fn(ks):
            y = stack(ks, x, variant=variant)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        def prog(ks):
            def body(ks, _):
                loss, g = jax.value_and_grad(loss_fn)(ks)
                ks = jax.tree.map(lambda a, b: a - 1e-6 * b, ks, g)
                return ks, loss

            ks, losses = jax.lax.scan(body, ks, None, length=K)
            return ks, losses[-1]

        return jax.jit(prog)

    # grad-numerics reference (one step, f32 sums of grads per kernel)
    def gref(variant):
        def loss_fn(ks):
            y = stack(ks, x, variant=variant)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        return jax.jit(jax.grad(loss_fn))(kernels)

    g0 = gref("baseline")
    results = {}
    variants = ("baseline", "stem_im2col", "dw_f32", "dw_bf16", "winograd")
    if os.environ.get("CONV_VARIANTS"):
        variants = tuple(os.environ["CONV_VARIANTS"].split(","))
        if "baseline" not in variants:
            variants = ("baseline",) + variants
    for variant in variants:
        g = gref(variant)
        rel = max(
            float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g0))
        )
        prog = build(variant)
        ks, last = prog(kernels)  # compile
        fence(last)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            ks2, last = prog(kernels)
            fence(last)
            times.append((time.time() - t0) / K * 1000)
        ms = min(times)
        results[variant] = ms
        print(f"# {variant:12s} {ms:7.2f} ms/step  grad_rel_err={rel:.2e}",
              flush=True)

    base = results["baseline"]
    for v, ms in results.items():
        if v != "baseline":
            print(f"# {v}: {ms/base:5.3f}x of baseline "
                  f"({'WIN' if ms < base * 0.97 else 'no win'})",
                  flush=True)


if __name__ == "__main__":
    main()
