"""Int8 inference fencing (round 4): can v5e's int8 MXU path (nominal
~2x bf16 MACs) buy eval/serve throughput through XLA?

The serving forward is conv-dominated (conv fwd ~11.4 of ~13.5 ms at the
eval bucket), so the experiment is conv-first. Protocol matches
profile_conv_variants.py: one K-step lax.scan per variant (in-context,
no per-dispatch skew), scalar-fenced readback, min-of-reps. Forward
ONLY — this is the serving path; weights are quantized OUTSIDE the timed
program (static at serve time), activations inside (that cost is real).

Probes, in order:
  matmul        anchor: does XLA lower int8 x int8 -> int32 dot to the
                double-rate MXU at all? If a clean [4096x512x512] matmul
                shows no win, convs never will.
  baseline      bf16 flagship conv stack forward (relu + pools)
  int8_dyn      per-conv dynamic per-tensor activation scale
                (max-reduction each layer — honest serving cost),
                per-output-channel weight scales, int8 conv -> int32,
                dequant+relu in bf16
  int8_static   activation scales precomputed (offline calibration),
                no in-graph max reductions — the best-case bound

Output-vs-baseline relative error is reported per variant (quality gate:
int8 only ships if CER survives, but that's a later question — this
script answers whether there is any speed to buy).

Run: PYTHONPATH=/root/.axon_site:. python scripts/profile_int8_infer.py
Results go to docs/design.md (round-4 ledger).
"""

from __future__ import annotations

import argparse
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


def max_pool(x, pool):
    if pool == (1, 1):
        return x
    import flax.linen as nn

    return nn.max_pool(x, window_shape=pool, strides=pool, padding="SAME")


def quant_weights(kernels):
    """Per-output-channel symmetric int8; returns (int8 kernels, scales)."""
    qs, ss = [], []
    for k in kernels:
        s = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0 + 1e-12  # [Co]
        qs.append(jnp.round(k / s).astype(jnp.int8))
        ss.append(s.astype(jnp.float32))
    return tuple(qs), tuple(ss)


def conv_bf16(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )


def conv_int8(xq, kq):
    return jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32,
    )


def fwd_stack(x, kernels, qkernels, wscales, ascales, *, variant):
    i = 0
    for si, st in enumerate(DEFAULT_STAGES):
        for _ in range(st.num_convs):
            if variant == "baseline":
                x = conv_bf16(x, kernels[i])
            else:
                if variant == "int8_dyn":
                    sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + 1e-12
                else:  # int8_static: calibrated constants, no reduction
                    sx = ascales[i]
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / sx), -127, 127
                ).astype(jnp.int8)
                y = conv_int8(xq, qkernels[i])
                x = (y.astype(jnp.float32) * (sx * wscales[i])).astype(
                    jnp.bfloat16)
            x = jax.nn.relu(x)
            i += 1
        x = max_pool(x, st.pool)
    return x


def time_scan(prog, K, reps):
    last = prog(jnp.float32(1.0))
    fence(last)
    times = []
    for _ in range(reps):
        t0 = time.time()
        last = prog(jnp.float32(1.0))
        fence(last)
        times.append((time.time() - t0) / K * 1000)
    return min(times)


def matmul_probe(K, reps):
    """Anchor: plain dot, bf16 vs int8->int32, same M/N/K."""
    rng = np.random.default_rng(1)
    M, Kd, N = 4096, 512, 512
    a16 = jnp.asarray(rng.normal(0, 1, (M, Kd)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(0, 1, (Kd, N)), jnp.bfloat16)
    a8 = jnp.clip(jnp.round(a16.astype(jnp.float32) * 40), -127, 127
                  ).astype(jnp.int8)
    b8 = jnp.clip(jnp.round(b16.astype(jnp.float32) * 40), -127, 127
                  ).astype(jnp.int8)

    def build(dot):
        # roll the lhs by the (traced) step index so the dot can't be
        # hoisted or constant-folded out of the scan; the 2 MB permute
        # is noise next to the matmul, and both variants pay it
        def prog(s):
            def body(s, idx):
                y = dot(idx)
                m = jnp.mean(y.astype(jnp.float32))
                return 1.0 + 1e-20 * m, m
            s, ms = jax.lax.scan(body, s, jnp.arange(K))
            return ms[-1]
        return jax.jit(prog)

    p16 = build(lambda idx: jnp.dot(
        jnp.roll(a16, idx, axis=0), b16,
        preferred_element_type=jnp.bfloat16))
    p8 = build(lambda idx: jax.lax.dot(
        jnp.roll(a8, idx, axis=0), b8, preferred_element_type=jnp.int32))
    t16 = time_scan(p16, K, reps)
    t8 = time_scan(p8, K, reps)
    gmacs = M * Kd * N / 1e9
    print(f"# matmul [{M}x{Kd}x{N}] bf16 {t16:7.3f} ms "
          f"({gmacs/t16:6.1f} TMAC/s)   int8 {t8:7.3f} ms "
          f"({gmacs/t8:6.1f} TMAC/s)   int8 {t16/t8:5.2f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch-pixels", type=int, default=2**22)
    ap.add_argument("--scan-steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None,
                    choices=("cpu", "tpu", "axon"))
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    H, W, K = 32, args.width, args.scan_steps
    B = max(8, args.batch_pixels // (H * W) // 8 * 8)
    print(f"# B={B} W={W} scan_steps={K} (forward only)", flush=True)

    matmul_probe(K, args.reps)

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
    qkernels, wscales = quant_weights(kernels)

    # offline "calibration" for the static variant: run the int8_dyn
    # scale computation once on this batch and freeze the values
    ascales = []
    xx = x
    i = 0
    for st in DEFAULT_STAGES:
        for _ in range(st.num_convs):
            ascales.append(jnp.float32(
                float(jnp.max(jnp.abs(xx.astype(jnp.float32)))) / 127.0
                + 1e-12))
            xx = jax.nn.relu(conv_bf16(xx, kernels[i]))
            i += 1
        xx = max_pool(xx, st.pool)
    ascales = tuple(ascales)

    def build(variant):
        def prog(s):
            def body(s, _):
                y = fwd_stack(x * s.astype(x.dtype), kernels, qkernels,
                              wscales, ascales, variant=variant)
                m = jnp.mean(y.astype(jnp.float32))
                return 1.0 + 1e-20 * m, m
            s, ms = jax.lax.scan(body, s, None, length=K)
            return ms[-1]
        return jax.jit(prog)

    yref = fwd_stack(x, kernels, qkernels, wscales, ascales,
                     variant="baseline").astype(jnp.float32)
    results = {}
    for variant in ("baseline", "int8_dyn", "int8_static"):
        y = fwd_stack(x, kernels, qkernels, wscales, ascales,
                      variant=variant).astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(y - yref)) / (jnp.max(jnp.abs(yref))
                                                  + 1e-12))
        ms = time_scan(build(variant), K, args.reps)
        results[variant] = ms
        print(f"# {variant:12s} {ms:7.2f} ms/step  out_rel_err={rel:.2e}",
              flush=True)

    base = results["baseline"]
    for v, ms in results.items():
        if v != "baseline":
            print(f"# {v}: {ms/base:5.3f}x of baseline "
                  f"({'WIN' if ms < base * 0.97 else 'no win'})", flush=True)


if __name__ == "__main__":
    main()
