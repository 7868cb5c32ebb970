"""Break down the ConvStack's f+b cost by op class on the real chip.

Times, at one bucket shape:
  stack      full ConvStack (conv+BN+relu+pool) fwd and f+b
  convs      the 6 convs alone (chained, same shapes)
  bn         the 6 BNs alone (training mode, batch stats)
  pool       the 3 max_pools alone
  pool_cvjp  max_pool with a custom masked-upsample backward
             (XLA lowers pool grad via SelectAndScatter, historically slow)

Run: PYTHONPATH=/root/.axon_site:. python scripts/profile_conv.py
"""

from __future__ import annotations

import argparse
import functools
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/vistaocr_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    return (time.time() - t0) / iters * 1e3


CHANNELS = [(1, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256)]
# spatial shape (H, W divisor) entering each conv for 32px lines
SPATIAL = [(32, 1), (32, 1), (16, 2), (16, 2), (8, 4), (8, 4)]
POOLS = [((2, 2), (32, 1), 64), ((2, 2), (16, 2), 128), ((2, 1), (8, 4), 256)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_cvjp(x, window):
    return nn.max_pool(x, window_shape=window, strides=window, padding="SAME")


def _mp_fwd(x, window):
    y = nn.max_pool(x, window_shape=window, strides=window, padding="SAME")
    return y, (x, y)


def _mp_bwd(window, res, dy):
    x, y = res
    wh, ww = window
    B, H, W, C = x.shape
    # Upsample y and dy back to input resolution (SAME padding: output
    # dim = ceil(in/w); slice after repeat covers the ragged tail).
    y_up = jnp.repeat(jnp.repeat(y, wh, axis=1), ww, axis=2)[:, :H, :W, :]
    dy_up = jnp.repeat(jnp.repeat(dy, wh, axis=1), ww, axis=2)[:, :H, :W, :]
    return (jnp.where(x == y_up, dy_up, 0.0).astype(x.dtype),)


max_pool_cvjp.defvjp(_mp_fwd, _mp_bwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch-pixels", type=int, default=2**22)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    H, W = 32, args.width
    B = max(8, args.batch_pixels // (H * W) // 8 * 8)
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    print(f"# B={B} H={H} W={W} dtype={args.dtype}")

    from vistaocr_tpu.models.cnn import ConvStack

    conv = ConvStack(dtype=dt)
    x_in = jnp.asarray(rng.standard_normal((B, H, W, 1)), dt)
    cv = conv.init(jax.random.PRNGKey(0), x_in, train=False)

    def stack_f(v, x):
        out, _ = conv.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    def stack_fb(v, x):
        return jax.grad(
            lambda v, x: jnp.sum(stack_f(v, x).astype(jnp.float32)),
            argnums=(0, 1))(v, x)

    print(f"stack_f    {timeit(jax.jit(stack_f), cv, x_in, iters=args.iters):8.2f} ms")
    print(f"stack_fb   {timeit(jax.jit(stack_fb), cv, x_in, iters=args.iters):8.2f} ms")

    # convs alone, chained at true shapes
    keys = jax.random.split(jax.random.PRNGKey(1), len(CHANNELS))
    kernels = [
        jax.random.normal(k, (3, 3, ci, co), dt) * 0.05
        for k, (ci, co) in zip(keys, CHANNELS)
    ]

    def convs_only(kernels, x):
        xs = x
        for i, ((ci, co), (h, wd)) in enumerate(zip(CHANNELS, SPATIAL)):
            if xs.shape[1] != h:  # emulate pooling's shape change by slicing
                xs = xs[:, : h, : W // wd, : ci]
            xs = jax.lax.conv_general_dilated(
                xs, kernels[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
            if i in (1, 3):  # shape bridge to next stage's channel count
                xs = jnp.concatenate([xs, xs], axis=-1)[..., : CHANNELS[i + 1][0]]
                xs = xs[:, ::2, ::2, :]
        return xs

    def convs_fb(kernels, x):
        return jax.grad(
            lambda ks, x: jnp.sum(convs_only(ks, x).astype(jnp.float32)),
            argnums=(0,))(kernels, x)

    print(f"convs_f    {timeit(jax.jit(convs_only), kernels, x_in, iters=args.iters):8.2f} ms")
    print(f"convs_fb   {timeit(jax.jit(convs_fb), kernels, x_in, iters=args.iters):8.2f} ms")

    # per-conv breakdown: fwd / dx / dw
    for i, ((ci, co), (h, wd)) in enumerate(zip(CHANNELS, SPATIAL)):
        xi = jnp.asarray(rng.standard_normal((B, h, W // wd, ci)), dt)
        ki = kernels[i]

        def one(k, x):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )

        tf = timeit(jax.jit(one), ki, xi, iters=args.iters)
        tdx = timeit(
            jax.jit(lambda k, x: jax.grad(
                lambda x: jnp.sum(one(k, x).astype(jnp.float32)))(x)),
            ki, xi, iters=args.iters)
        tdw = timeit(
            jax.jit(lambda k, x: jax.grad(
                lambda k: jnp.sum(one(k, x).astype(jnp.float32)))(k)),
            ki, xi, iters=args.iters)
        mac = B * h * (W // wd) * 9 * ci * co
        print(f"conv{i} [{ci:>3}->{co:>3}]@{h}x{W//wd}: "
              f"f {tf:6.2f}  dx {tdx:6.2f}  dw {tdw:6.2f} ms   "
              f"f_tflops {2*mac/tf/1e9:6.1f}")

    # BN alone (training stats) at each activation shape
    tot_f = tot_fb = 0.0
    for (ci, co), (h, wd) in zip(CHANNELS, SPATIAL):
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9, dtype=dt)
        xi = jnp.asarray(rng.standard_normal((B, h, W // wd, co)), dt)
        bv = bn.init(jax.random.PRNGKey(0), xi)

        def bn_f(v, x):
            out, _ = bn.apply(v, x, mutable=["batch_stats"])
            return out

        def bn_fb(v, x):
            return jax.grad(
                lambda v, x: jnp.sum(bn_f(v, x).astype(jnp.float32)),
                argnums=(0, 1))(v, x)

        tot_f += timeit(jax.jit(bn_f), bv, xi, iters=args.iters)
        tot_fb += timeit(jax.jit(bn_fb), bv, xi, iters=args.iters)
    print(f"bn_f (6x)  {tot_f:8.2f} ms")
    print(f"bn_fb (6x) {tot_fb:8.2f} ms")

    # pools alone: XLA grad (SelectAndScatter) vs custom masked-upsample
    for name, pool_fn in (
        ("pool_xla", lambda x, w: nn.max_pool(x, w, strides=w, padding="SAME")),
        ("pool_cvjp", max_pool_cvjp),
    ):
        tot_f = tot_fb = 0.0
        for w, (h, wd), ch in POOLS:
            xi = jnp.asarray(rng.standard_normal((B, h, W // wd, ch)), dt)

            def p_f(x):
                return pool_fn(x, w)

            def p_fb(x):
                return jax.grad(lambda x: jnp.sum(p_f(x).astype(jnp.float32)))(x)

            tot_f += timeit(jax.jit(p_f), xi, iters=args.iters)
            tot_fb += timeit(jax.jit(p_fb), xi, iters=args.iters)
        print(f"{name:10s} f(3x) {tot_f:6.2f}  fb(3x) {tot_fb:6.2f} ms")


if __name__ == "__main__":
    main()
