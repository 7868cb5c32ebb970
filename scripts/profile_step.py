"""Phase profiler for the flagship train step on the real chip.

Times each phase of the training step with scalar-readback fences (the
axon relay acks at dispatch, not completion — CLAUDE.md / docs/design.md
measurement protocol). Run:

    PYTHONPATH=/root/.axon_site:. python scripts/profile_step.py [--width 512]

Phases measured (all at the same bucket shape):
  full       forward + CTC + backward + optimizer (the product step)
  fwd_loss   forward + CTC, no grad
  fwd_model  model forward only (conv + bridge + lstm + head)
  conv_f[b]  conv stack alone, fwd and fwd+bwd
  lstm_f[b]  BLSTM stack alone (Pallas), fwd and fwd+bwd
  ctc_f[b]   CTC loss alone (Pallas), fwd and fwd+bwd
  opt        optimizer update alone (clip + adam + apply)
"""

from __future__ import annotations

import argparse
import time

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/vistaocr_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch-pixels", type=int, default=2**22)
    ap.add_argument("--num-classes", type=int, default=96)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lstm-impl", default="auto")
    ap.add_argument("--ctc-impl", default="auto")
    args = ap.parse_args()

    from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
    from vistaocr_tpu.models.blstm import BLSTMStack
    from vistaocr_tpu.models.cnn import ConvStack
    from vistaocr_tpu.ops.ctc import mean_ctc_loss
    from vistaocr_tpu.train import TrainState

    H, W = 32, args.width
    B = max(8, args.batch_pixels // (H * W) // 8 * 8)
    T = -(-W // 4)
    L = max(8, T // 2)
    print(f"# bucket: B={B} H={H} W={W} T={T} L={L} dtype={args.dtype}")

    cfg = ModelConfig(
        num_classes=args.num_classes, compute_dtype=args.dtype,
        lstm_impl=args.lstm_impl,
    )
    model = CnnLstmOcr(cfg)
    variables = model.init_params(jax.random.PRNGKey(0), batch=8, width=W)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W), dtype=np.uint8))
    widths = jnp.asarray(
        rng.integers(W // 2, W + 1, (B,), dtype=np.int32))
    labels = jnp.asarray(rng.integers(1, args.num_classes, (B, L), np.int32))
    lls = jnp.asarray(rng.integers(L // 2, L + 1, (B,), dtype=np.int32))
    weights = jnp.ones((B,), jnp.float32)

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.scale_by_adam())
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), step=jnp.asarray(0, jnp.int32),
    )
    lr = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.PRNGKey(1)

    res = {}

    # --- full step (non-donating clone of make_train_step, so the same
    # state can be re-fed across timing iterations) ---
    def _train_step_fn(state, images, widths, labels, lls, weights, lr, key):
        dropout_rng = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            outs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, widths, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            log_probs, frame_mask = outs
            frames = frame_mask.sum(axis=1).astype(jnp.int32)
            loss = mean_ctc_loss(
                log_probs, frames, labels, lls, sample_weights=weights,
                label_average=False, impl=args.ctc_impl,
            )
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1)
        return new_state, loss

    full_nd = jax.jit(_train_step_fn)
    res["full"] = timeit(
        lambda: full_nd(state, images, widths, labels, lls, weights, lr, key)[1],
        iters=args.iters)

    # --- forward + loss, no grad ---
    def _fwd_loss(params, batch_stats):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, widths, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        log_probs, frame_mask = outs
        frames = frame_mask.sum(axis=1).astype(jnp.int32)
        return mean_ctc_loss(log_probs, frames, labels, lls,
                             sample_weights=weights, label_average=False,
                             impl=args.ctc_impl)

    res["fwd_loss"] = timeit(
        jax.jit(_fwd_loss), state.params, state.batch_stats, iters=args.iters)

    # --- model forward only ---
    def _fwd_model(params, batch_stats):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, widths, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return outs[0]

    res["fwd_model"] = timeit(
        jax.jit(_fwd_model), state.params, state.batch_stats, iters=args.iters)

    # --- conv stack alone ---
    conv = ConvStack(dtype=jnp.dtype(args.dtype))
    x_in = jnp.asarray(
        rng.standard_normal((B, H, W, 1)), jnp.dtype(args.dtype))
    cv = conv.init(jax.random.PRNGKey(0), x_in, train=False)

    def _conv_f(v, x):
        out, _ = conv.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    res["conv_f"] = timeit(jax.jit(_conv_f), cv, x_in, iters=args.iters)

    def _conv_fb(v, x):
        def loss(v):
            out, _ = conv.apply(v, x, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(lambda v: loss(v))(v)

    res["conv_fb"] = timeit(jax.jit(_conv_fb), cv, x_in, iters=args.iters)

    # --- LSTM stack alone ---
    blstm = BLSTMStack(hidden=cfg.lstm_hidden, layers=cfg.lstm_layers,
                       dropout=0.0, dtype=jnp.dtype(args.dtype),
                       impl=args.lstm_impl)
    seq = jnp.asarray(
        rng.standard_normal((B, T, cfg.bridge_dim)), jnp.dtype(args.dtype))
    fmask = jnp.ones((B, T), bool)
    bv = blstm.init(jax.random.PRNGKey(0), seq, fmask, train=False)

    def _lstm_f(v, s):
        return blstm.apply(v, s, fmask, train=False)

    res["lstm_f"] = timeit(jax.jit(_lstm_f), bv, seq, iters=args.iters)

    def _lstm_fb(v, s):
        def loss(v, s):
            return jnp.sum(blstm.apply(v, s, fmask, train=False).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))(v, s)

    res["lstm_fb"] = timeit(jax.jit(_lstm_fb), bv, seq, iters=args.iters)

    # --- CTC alone ---
    lp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((B, T, args.num_classes)), jnp.float32))
    frames = jnp.full((B,), T, jnp.int32)

    def _ctc_f(lp):
        return mean_ctc_loss(lp, frames, labels, lls, sample_weights=weights,
                             label_average=False, impl=args.ctc_impl)

    res["ctc_f"] = timeit(jax.jit(_ctc_f), lp, iters=args.iters)

    def _ctc_fb(lp):
        return jax.grad(_ctc_f)(lp)

    res["ctc_fb"] = timeit(jax.jit(_ctc_fb), lp, iters=args.iters)

    # --- optimizer alone ---
    fake_grads = jax.tree.map(jnp.ones_like, state.params)

    def _opt(opt_state, params):
        updates, new_opt = tx.update(fake_grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        return optax.apply_updates(params, updates)

    res["opt"] = timeit(jax.jit(_opt), state.opt_state, state.params,
                        iters=args.iters)

    print(f"# lines-equivalent per step: {B}")
    for k, v in res.items():
        print(f"{k:10s} {v:8.2f} ms")
    bwd_est = res["full"] - res["fwd_loss"]
    print(f"# bwd+opt (full - fwd_loss): {bwd_est:.2f} ms")
    print(f"# lines/s at this bucket: {B / res['full'] * 1e3:.0f}")


if __name__ == "__main__":
    main()
