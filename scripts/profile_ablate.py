"""In-context ablation profiling of the fused train step.

The standalone phase profiler (profile_step.py) is distorted by the
relay's fixed per-program dispatch cost and by losing XLA's cross-op
overlap. Here every variant is ONE jitted program running K train steps
as a lax.scan over the same device-resident batch (the shape of the
production epoch-fused trainer), so deltas between variants are honest:

  full       the production step (conv+BN+BLSTM+CTC+adam)
  lstm0      lstm_layers=0 (bridge feeds the head directly)
  nobn       conv_norm='none' (convs+relu only)
  noctc      CTC replaced by a masked mean of log-probs (trivial loss)
  fwd        forward+CTC only, no grad/optimizer

Run: PYTHONPATH=/root/.axon_site:. python scripts/profile_ablate.py
"""

from __future__ import annotations

import argparse
import os
import time

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch-pixels", type=int, default=2**22)
    ap.add_argument("--num-classes", type=int, default=96)
    ap.add_argument("--scan-steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
    from vistaocr_tpu.ops.ctc import mean_ctc_loss
    from vistaocr_tpu.train import TrainState, _apply_lr, _clip_by_known_norm

    H, W = 32, args.width
    B = max(8, args.batch_pixels // (H * W) // 8 * 8)
    T = -(-W // 4)
    L = 63
    K = args.scan_steps
    print(f"# B={B} W={W} T={T} L={L} scan_steps={K}")

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W), dtype=np.uint8))
    widths = jnp.asarray(rng.integers(W // 2, W + 1, (B,), dtype=np.int32))
    labels = jnp.asarray(rng.integers(1, args.num_classes, (B, L), np.int32))
    lls = jnp.asarray(rng.integers(L // 2, L + 1, (B,), dtype=np.int32))
    weights = jnp.ones((B,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    key = (
        jax.random.key(1, impl="rbg")
        if jax.default_backend() in ("tpu", "axon")
        else jax.random.PRNGKey(1)
    )

    def build(variant):
        kw = dict(num_classes=args.num_classes, compute_dtype="bfloat16")
        loss_kind = "ctc"
        train = True
        opt = "adam"
        if variant == "lstm0":
            kw["lstm_layers"] = 0
        elif variant == "nobn":
            kw["conv_norm"] = "none"
        elif variant == "nopool":
            kw["conv_pool"] = "stride"
        elif variant == "nodrop":
            kw["dropout"] = 0.0
        elif variant == "noctc":
            loss_kind = "mean"
        elif variant == "noopt":
            opt = "sgd_plain"
        elif variant == "convonly":
            kw.update(lstm_layers=0, conv_norm="none", dropout=0.0)
            loss_kind = "mean"
        elif variant == "fwdtrain":
            loss_kind = "mean_nograd"
        elif variant == "fwd":
            train = False
        model = CnnLstmOcr(ModelConfig(**kw))
        variables = model.init_params(jax.random.PRNGKey(0), batch=8, width=W)
        tx = optax.chain(optax.identity(), optax.scale_by_adam())
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.asarray(0, jnp.int32),
        )

        def loss_of(params, batch_stats, dropout_rng):
            outs, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, widths, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            log_probs, frame_mask = outs
            if loss_kind in ("ctc", "mean_nograd"):
                frames = frame_mask.sum(axis=1).astype(jnp.int32)
                loss = mean_ctc_loss(log_probs, frames, labels, lls,
                                     sample_weights=weights,
                                     label_average=False)
            else:
                loss = jnp.mean(log_probs * frame_mask[..., None])
            return loss, updates["batch_stats"]

        if not train:
            def prog(state):
                def body(carry, _):
                    outs = model.apply(
                        {"params": state.params,
                         "batch_stats": state.batch_stats},
                        images, widths, train=False,
                    )
                    return carry + jnp.sum(outs[0][:, 0, 0]), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=K)
                return acc
        elif loss_kind == "mean_nograd":
            def prog(state):
                def body(carry, i):
                    drng = jax.random.fold_in(key, i)
                    loss, _ = loss_of(state.params, state.batch_stats, drng)
                    return carry + loss, None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), jnp.arange(K))
                return acc
        else:
            def prog(state):
                def body(st, _):
                    drng = jax.random.fold_in(key, st.step)
                    (loss, new_bs), grads = jax.value_and_grad(
                        loss_of, has_aux=True)(st.params, st.batch_stats, drng)
                    if opt == "sgd_plain":
                        new_params = _apply_lr(st.params, grads, lr)
                        new_opt = st.opt_state
                    else:
                        gnorm = optax.global_norm(grads)
                        grads_c = _clip_by_known_norm(grads, gnorm, 5.0)
                        updates, new_opt = tx.update(
                            grads_c, st.opt_state, st.params)
                        new_params = _apply_lr(st.params, updates, lr)
                    return st.replace(
                        params=new_params, batch_stats=new_bs,
                        opt_state=new_opt, step=st.step + 1), loss

                st, losses = jax.lax.scan(body, state, None, length=K)
                return losses[-1]

        return jax.jit(prog), state

    results = {}
    for variant in ("full", "fwdtrain", "lstm0", "nobn", "nopool", "nodrop",
                    "noctc", "noopt", "convonly", "fwd"):
        prog, state = build(variant)
        out = prog(state)  # compile + 1 run
        fence(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            out = prog(state)
            fence(out)
            best = min(best, (time.time() - t0) / K * 1e3)
        results[variant] = best
        print(f"{variant:8s} {best:8.2f} ms/step")

    f = results["full"]
    for k, v in results.items():
        if k != "full":
            print(f"# delta full - {k}: {f - v:.2f} ms")
    print(f"# lines/s at this bucket: {B / f * 1e3:.0f}")

    # --- conv backward localization: dx chain vs dW accumulation --------
    # Same 6-conv chain as the flagship stack (pooling as stride slices so
    # only convs are in play), run as an in-scan K-step loop with weight
    # updates (defeats loop hoisting). Modes:
    #   chain_fwdonly  loss consumed, no grads (weights perturbed per step)
    #   chain_full     grads wrt all kernels (dx chain + all dW)
    #   chain_dw       stop_grad on every conv INPUT (all dW, no dx chain)
    #   chain_dx       grads wrt the first kernel only (dx chain, 1 dW)
    dt = jnp.bfloat16
    CH = [(1, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256)]
    rng2 = np.random.default_rng(1)
    ks = [
        jnp.asarray(rng2.standard_normal((3, 3, ci, co)) * 0.05, dt)
        for ci, co in CH
    ]
    x0 = jnp.asarray(rng2.standard_normal((B, H, W, 1)), dt)

    def chain(ks, mode):
        x = x0
        aux = 0.0
        for i, k in enumerate(ks):
            xin = jax.lax.stop_gradient(x) if mode == "dw" else x
            x = jax.lax.conv_general_dilated(
                xin, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
            if mode == "dw":
                aux = aux + jnp.mean(x.astype(jnp.float32))
            if i in (1, 3):  # stage end: subsample + channel bridge
                x = x[:, ::2, ::2, :]
        final = jnp.mean(x.astype(jnp.float32))
        return aux + final if mode == "dw" else final

    def conv_prog(mode):
        def prog(ks):
            def body(ks, _):
                if mode == "fwdonly":
                    loss = chain(ks, mode)
                    ks = [k * (1.0 - 1e-6 * loss.astype(dt)) for k in ks]
                    return ks, loss
                if mode == "dx":
                    loss, g0 = jax.value_and_grad(
                        lambda k0: chain([k0] + ks[1:], mode))(ks[0])
                    ks = [ks[0] - 1e-6 * g0] + ks[1:]
                    return ks, loss
                loss, gs = jax.value_and_grad(lambda ks: chain(ks, mode))(ks)
                ks = [k - 1e-6 * g for k, g in zip(ks, gs)]
                return ks, loss

            ks2, losses = jax.lax.scan(body, ks, None, length=K)
            return losses[-1]

        return jax.jit(prog)

    for mode in ("fwdonly", "full", "dw", "dx"):
        prog = conv_prog(mode)
        out = prog(ks)
        fence(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            out = prog(ks)
            fence(out)
            best = min(best, (time.time() - t0) / K * 1e3)
        print(f"chain_{mode:8s} {best:8.2f} ms/step")


if __name__ == "__main__":
    main()
