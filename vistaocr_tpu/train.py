"""Training entry point — component C15 (SURVEY.md §2, §3.1).

Reference behavior reproduced (argparse CLI, epoch loop of
forward/CTC/backward/clip/step, periodic greedy-decode validation with
CER/WER, best-CER snapshotting, LR decay on plateau [H-behavior]) on a
TPU-native engine:

- one jit-compiled ``train_step`` per bucket shape (static shapes; the
  bucket ladder bounds the compile set), with donated state;
- DP over a ('data','model') mesh: batches are device_put with a
  NamedSharding on 'data' by the pipeline's prefetch thread; XLA inserts
  the gradient all-reduce over ICI — there is no collective code here;
- lr rides in as a scalar argument (plateau decay changes it without
  recompiling);
- metrics stream to JSONL with lines/sec/chip first-class (it is the
  BASELINE.json headline metric).

Usage:
    python -m vistaocr_tpu.train --preset synth-tiny --snapshot-dir /tmp/run
    python -m vistaocr_tpu.train --data <dir> --snapshot-dir <dir> [...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .checkpoint import (
    has_opt_state,
    load_opt_state,
    load_snapshot,
    promote,
    save_snapshot,
)
from .data.buckets import ShapeContract
from .data.pipeline import BatchPipeline
from .data.shards import ShardedLineDataset
from .decode.greedy import greedy_decode  # noqa: F401 (re-exported for callers)
from .models import CnnLstmOcr, ModelConfig
from .models.cnn import ConvStageSpec
from .ops.ctc import mean_ctc_loss
from .parallel import (
    MeshConfig,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch_arrays,
)
from .text import Alphabet, cer_wer


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------
@dataclasses.dataclass
class TrainConfig:
    data_dir: str = ""
    snapshot_dir: str = ""
    # model
    line_height: int = 32
    lstm_hidden: int = 512
    lstm_layers: int = 2
    bridge_dim: int = 512
    dropout: float = 0.1
    augment: float = 0.0  # train-time on-device degradation strength
    compute_dtype: str = "bfloat16"
    tiny_model: bool = False  # config #1 scale
    # data
    bucket_widths: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1536, 2048)
    # Corpus-tuned ladder (data/buckets.make_ladder): replaces
    # bucket_widths with an align=32 ladder fit to the train corpus's
    # width histogram (measured ~4% padding waste vs 14.5% for the static
    # align=128 ladder). Deterministic per corpus, so resume re-derives
    # the same ladder.
    auto_ladder: bool = False
    max_label_len: int = 256
    batch_pixels: int = 2**21
    # optimization
    optimizer: str = "adam"  # adam | sgd
    lr: float = 1e-3
    momentum: float = 0.9
    grad_clip: float = 5.0
    label_average: bool = False
    ctc_impl: str = "auto"  # auto | scan | pallas (ops/ctc.py)
    epochs: int = 50
    max_steps: int = 0  # 0 = unlimited
    # validation / snapshots
    val_interval_steps: int = 500
    plateau_patience: int = 3
    plateau_decay: float = 0.5
    min_lr: float = 1e-6
    # misc
    seed: int = 0
    mesh_model: int = 1
    resume: bool = False
    log_interval: int = 50
    # Device-resident dataset cache (data/device_cache.py): per-epoch
    # shuffling via on-device gather, zero steady-state H2D. "auto" enables
    # it on TPU backends when the store fits device_cache_bytes.
    device_cache: str = "auto"  # auto | on | off
    device_cache_bytes: int = 4 * 2**30
    # Epoch-fused trainer (make_train_epoch): runs segments of steps as one
    # lax.scan over the device-resident data — the headline-perf path.
    # Requires the device cache; "auto" follows it. Batch order within a
    # segment shares one bucket (coarser interleaving than per-step
    # shuffle); parity runs can force "off".
    fused_epochs: str = "auto"  # auto | on | off
    # Fused path: stack this many epochs' index rows per bucket into one
    # scan dispatch (see DeviceCache.epoch_plan). 1 = per-epoch dispatch.
    # RESUME CAVEAT: snapshots taken mid-stack (val cadence) record the
    # stack's START epoch, so an interrupted run replays up to epoch_stack
    # epochs of already-seen data on resume (step keeps counting; only
    # data exposure is duplicated). Snapshot meta records the exact
    # position ("stack_rows_done"/"stack_epochs") for auditability.
    epoch_stack: int = 4
    # Capture a jax.profiler trace for steps [profile_start, profile_stop)
    # into <snapshot_dir>/profile (view with tensorboard-plugin-profile).
    profile_start: int = 0
    profile_stop: int = 0

    def model_config(self, num_classes: int) -> ModelConfig:
        stages = (
            (
                ConvStageSpec(16, 1, (2, 2)),
                ConvStageSpec(32, 1, (2, 2)),
                ConvStageSpec(32, 1, (2, 1)),
            )
            if self.tiny_model
            else (
                ConvStageSpec(64, 2, (2, 2)),
                ConvStageSpec(128, 2, (2, 2)),
                ConvStageSpec(256, 2, (2, 1)),
            )
        )
        return ModelConfig(
            num_classes=num_classes,
            line_height=self.line_height,
            stages=stages,
            bridge_dim=self.bridge_dim if not self.tiny_model else 64,
            lstm_hidden=self.lstm_hidden if not self.tiny_model else 64,
            lstm_layers=self.lstm_layers if not self.tiny_model else 1,
            dropout=self.dropout,
            augment=self.augment,
            compute_dtype=self.compute_dtype,
        )

    def contract(self) -> ShapeContract:
        return ShapeContract(
            height=self.line_height,
            bucket_widths=tuple(self.bucket_widths),
            width_stride=4,
            max_label_len=self.max_label_len,
        )


PRESETS = {
    # BASELINE.json config #1: CPU-runnable synthetic smoke training.
    "synth-tiny": dict(
        tiny_model=True,
        compute_dtype="float32",
        bucket_widths=(128, 256, 384, 512),
        batch_pixels=2**18,
        lr=3e-3,
        dropout=0.0,
        val_interval_steps=100,
        epochs=30,
    ),
    # Full-scale synthetic / IAM-shaped run on TPU.
    "full": dict(auto_ladder=True),
    # BASELINE.json config #2/#3: real handwriting (IAM / MADCAT). MADCAT's
    # large alphabet + wide RTL lines want the wider ladder + label budget.
    "handwriting": dict(
        bucket_widths=(256, 384, 512, 768, 1024, 1536, 2048),
        auto_ladder=True,
        max_label_len=256,
        dropout=0.2,
        epochs=120,
        plateau_patience=4,
    ),
    # BASELINE.json config #4: printed multilingual (e.g. Farsi) — cleaner
    # glyphs converge faster; decode with beam+LM via infer --decoder beam.
    "printed": dict(
        bucket_widths=(128, 256, 384, 512, 768, 1024),
        auto_ladder=True,
        dropout=0.1,
        lr=2e-3,
        epochs=60,
    ),
}


# --------------------------------------------------------------------------
# Train state & steps
# --------------------------------------------------------------------------
class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    cfg: TrainConfig, include_clip: bool = True
) -> optax.GradientTransformation:
    """``include_clip=False`` swaps the clip stage for ``optax.identity()``
    — same opt_state pytree (both are EmptyState, so checkpoints stay
    interchangeable) — for callers that clip inside the train step instead
    (reusing the metrics gnorm saves one full gradient-tree pass)."""
    if cfg.optimizer == "adam":
        core = optax.scale_by_adam()
    elif cfg.optimizer == "sgd":
        core = optax.trace(decay=cfg.momentum, nesterov=False)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    first = (
        optax.clip_by_global_norm(cfg.grad_clip)
        if include_clip
        else optax.identity()
    )
    return optax.chain(first, core)


def _clip_by_known_norm(grads, gnorm, max_norm):
    """optax.clip_by_global_norm math with the norm precomputed (it is
    always needed for metrics): t * (max_norm / gnorm) iff gnorm >= max."""
    trigger = gnorm < max_norm

    def clip_fn(t):
        return jax.lax.select(
            trigger, t, (t / gnorm.astype(t.dtype)) * max_norm
        )

    return jax.tree.map(clip_fn, grads)


def _apply_lr(params, updates, lr):
    """params - lr * updates in ONE tree pass (instead of scale-then-add)."""
    return jax.tree.map(
        lambda p, u: p - (lr * u).astype(p.dtype), params, updates
    )


def make_train_step(model: CnnLstmOcr, tx, label_average: bool,
                    ctc_impl: str = "auto", grad_clip: float = None):
    """``grad_clip``: when set, gradients are clipped IN the step reusing
    the metrics gnorm — pass a tx built with include_clip=False so the
    clip isn't applied twice (twice is a no-op mathematically, but wastes
    a full tree pass)."""
    def train_step(state, images, widths, labels, label_lengths, weights, lr, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                widths,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            log_probs, frame_mask = outs
            frames = frame_mask.sum(axis=1).astype(jnp.int32)
            loss = mean_ctc_loss(
                log_probs,
                frames,
                labels,
                label_lengths,
                sample_weights=weights,
                label_average=label_average,
                impl=ctc_impl,
            )
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        gnorm = optax.global_norm(grads)
        if grad_clip is not None:
            grads = _clip_by_known_norm(grads, gnorm, grad_clip)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = _apply_lr(state.params, updates, lr)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "gnorm": gnorm}

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_epoch(model: CnnLstmOcr, tx, label_average: bool,
                     ctc_impl: str = "auto", batch_shardings=None,
                     grad_clip: float = None):
    """Epoch-fused trainer: one jitted program runs a whole bucket's worth
    of steps as a lax.scan over device-resident data, gathering each batch
    by index on device. Removes per-step host dispatch entirely — on a
    host-weak TPU rig the Python step loop is measurable overhead.

    Returns fn(state, images_all, widths_all, labels_all, ll_all,
               idx [nb, B], weights [nb, B], lr, rng) -> (state, metrics).
    Ordering note: batches inside one call share a bucket (static shapes),
    so inter-bucket interleaving happens at the granularity of these calls
    — coarser than the reference's per-batch shuffle; CER parity runs can
    use the per-step path (fit(..., fused_epochs=False)).

    ``batch_shardings`` (dict from parallel.shard_batch_arrays): when set,
    each scan-gathered batch is constrained to its 'data'-axis sharding so
    DP stays sharded even though the resident arrays are replicated."""

    def train_epoch(state, images_all, widths_all, labels_all, ll_all,
                    idx, weights, lr, rng):
        def body(state, inp):
            idx_b, w_b = inp
            images = images_all[idx_b]
            widths = widths_all[idx_b]
            labels = labels_all[idx_b]
            lls = ll_all[idx_b]
            if batch_shardings is not None:
                images = jax.lax.with_sharding_constraint(
                    images, batch_shardings["images"])
                widths = jax.lax.with_sharding_constraint(
                    widths, batch_shardings["widths"])
                labels = jax.lax.with_sharding_constraint(
                    labels, batch_shardings["labels"])
                lls = jax.lax.with_sharding_constraint(
                    lls, batch_shardings["label_lengths"])
            dropout_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                outs, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, widths, train=True, mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng},
                )
                log_probs, frame_mask = outs
                frames = frame_mask.sum(axis=1).astype(jnp.int32)
                loss = mean_ctc_loss(
                    log_probs, frames, labels, lls,
                    sample_weights=w_b, label_average=label_average,
                    impl=ctc_impl,
                )
                return loss, updates["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            gnorm = optax.global_norm(grads)
            if grad_clip is not None:
                grads = _clip_by_known_norm(grads, gnorm, grad_clip)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = _apply_lr(state.params, updates, lr)
            new_state = state.replace(
                params=new_params, batch_stats=new_bs, opt_state=new_opt,
                step=state.step + 1,
            )
            return new_state, (loss, gnorm)

        state, (losses, gnorms) = jax.lax.scan(body, state, (idx, weights))
        return state, {
            "loss": jnp.mean(losses),
            "last_loss": losses[-1],
            "gnorm": gnorms[-1],
        }

    return jax.jit(train_epoch, donate_argnums=(0,))


def make_eval_step(model: CnnLstmOcr):
    def eval_step(params, batch_stats, images, widths):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            widths,
            train=False,
        )

    return jax.jit(eval_step)


# --------------------------------------------------------------------------
# Validation
# --------------------------------------------------------------------------
def evaluate(
    eval_step, params, batch_stats, pipe: BatchPipeline, alphabet: Alphabet,
    sharding=None,
) -> Tuple[float, float, float]:
    """Greedy-decode the whole split; returns (CER, WER, lines/sec).

    Multi-host: every process runs the same collective eval steps (the
    pipeline plan is deterministic, so batches match), then all-gathers
    the tiny [B, T] decode tensor so each process computes the SAME
    CER — keeping PlateauController state identical across the cluster
    (a diverging lr schedule would desynchronize the collective steps)."""
    from .decode.greedy import collapse_frames, greedy_frames

    multi = jax.process_count() > 1
    hyps, refs = [], []
    t0 = time.time()
    n = 0
    for batch in pipe.device_epoch(0, sharding=sharding):
        log_probs, frame_mask = eval_step(
            params, batch_stats, batch.images, batch.widths
        )
        pre = greedy_frames(log_probs, frame_mask)
        if multi:
            from jax.experimental import multihost_utils

            pre = multihost_utils.process_allgather(pre, tiled=True)
        frames = np.asarray(pre)
        hyps.extend(
            collapse_frames(frames[i], alphabet)
            for i in range(batch.size)
            if batch.valid[i]
        )
        refs.extend(
            pipe.dataset.transcript(int(i))
            for i, v in zip(batch.indices, batch.valid)
            if v
        )
        n += int(batch.valid.sum())
    dt = max(time.time() - t0, 1e-9)
    c, w = cer_wer(hyps, refs)
    return c, w, n / dt


class PlateauController:
    """LR decay on dev-CER plateau — the reference's schedule [H-behavior]."""

    def __init__(self, lr: float, patience: int, decay: float, min_lr: float):
        self.lr = lr
        self.patience = patience
        self.decay = decay
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad = 0

    def update(self, cer: float) -> bool:
        """Returns True if this is a new best CER."""
        if cer < self.best - 1e-6:
            self.best = cer
            self.bad = 0
            return True
        self.bad += 1
        if self.bad > self.patience:
            self.lr = max(self.min_lr, self.lr * self.decay)
            self.bad = 0
        return False


# --------------------------------------------------------------------------
# Fit
# --------------------------------------------------------------------------
def fit(cfg: TrainConfig, *, mesh=None, log=print) -> dict:
    """Run training; returns summary dict. Importable for tests/benchmarks."""
    from .runtime import enable_compile_cache

    enable_compile_cache()
    t_setup = time.time()
    if mesh is None:
        mesh = make_mesh(MeshConfig(model=cfg.mesh_model))
    n_data = mesh.shape["data"]

    contract = cfg.contract()
    # data_dir accepts comma-separated corpora (joint training over e.g.
    # real + synthetic lines); see data/shards.open_dataset
    from .data.shards import open_dataset

    train_ds = open_dataset(cfg.data_dir, "train")
    val_ds = None
    try:
        val_ds = open_dataset(cfg.data_dir, "val")
    except KeyError:
        pass

    if cfg.auto_ladder:
        # Corpus-tuned rungs (C7); on resume the checkpoint's contract wins
        # below, and re-deriving from the same corpus is deterministic.
        from .data.buckets import make_ladder

        ladder = make_ladder(
            train_ds.widths,
            stride=contract.width_stride,
            align=32,
            max_waste=0.03,
            max_width=max(cfg.bucket_widths),
        )
        contract = dataclasses.replace(contract, bucket_widths=ladder)
        log(f"auto ladder: {ladder}")

    resume_dir = os.path.join(cfg.snapshot_dir, "last")
    resuming = cfg.resume and os.path.exists(os.path.join(resume_dir, "meta.json"))

    if resuming:
        variables, model_config, alphabet, contract, meta = load_snapshot(resume_dir)
        start_step = meta["step"]
        start_epoch = meta.get("extra", {}).get("epoch", 0)
        log(f"resuming from {resume_dir} at step {start_step}")
    else:
        alphabet = Alphabet.build(train_ds.transcripts())
        model_config = cfg.model_config(alphabet.num_classes)
        start_step, start_epoch = 0, 0

    model = CnnLstmOcr(model_config)
    if not resuming:
        variables = model.init_params(jax.random.PRNGKey(cfg.seed))

    # Clip is applied inside the train step (reusing the metrics gnorm);
    # include_clip=False keeps the opt_state pytree identical for resume.
    tx = make_optimizer(cfg, include_clip=False)
    opt_state = tx.init(variables["params"])
    if resuming and has_opt_state(resume_dir):
        opt_state = load_opt_state(resume_dir, opt_state)

    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
        step=jnp.asarray(start_step, jnp.int32),
    )
    # Replicate state across the mesh (DP); TP shards activate if model>1.
    state = jax.device_put(
        state,
        param_shardings(state, mesh)
        if mesh.shape["model"] > 1
        else replicated(mesh),
    )

    train_step = make_train_step(model, tx, cfg.label_average, cfg.ctc_impl,
                                 grad_clip=cfg.grad_clip)
    eval_step = make_eval_step(model)

    train_pipe = BatchPipeline(
        train_ds,
        alphabet,
        contract,
        batch_pixels=cfg.batch_pixels,
        batch_multiple=n_data,
        drop_remainder=True,
        shuffle=True,
        seed=cfg.seed,
    )
    if train_pipe.dropped:
        log(f"warning: {train_pipe.dropped} train lines fit no bucket; dropped")
    # Multi-host discipline (SURVEY.md §5 distributed row): every process
    # must derive the SAME epoch plan (same corpus, same seed) or the
    # collective steps would consume different data. Compare plan
    # fingerprints across the cluster before training starts.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        fp = np.asarray(
            train_pipe.plan_fingerprint(start_epoch), np.uint32
        )
        fps = np.asarray(multihost_utils.process_allgather(fp))
        if not (fps == fps[0]).all():
            raise RuntimeError(
                f"epoch-plan fingerprint differs across processes: {fps.tolist()} "
                "— all processes must see the same dataset and seed"
            )
    val_pipe = (
        BatchPipeline(
            val_ds,
            alphabet,
            contract,
            batch_pixels=cfg.batch_pixels,
            batch_multiple=n_data,
            drop_remainder=False,
            shuffle=False,
        )
        if val_ds is not None and len(val_ds)
        else None
    )
    data_sharding = shard_batch_arrays(mesh)

    use_cache = cfg.device_cache == "on" or (
        cfg.device_cache == "auto"
        and jax.default_backend() in ("tpu", "axon")
    )
    if use_cache and cfg.device_cache_bytes:
        from .data.device_cache import DeviceCache

        try:
            # Resident arrays replicated across the mesh: the per-step
            # batch-sharding of gathered batches is then a LOCAL slice on
            # every device, not a cross-device copy.
            cache_sharding = replicated(mesh)
            train_pipe = DeviceCache(
                train_pipe, sharding=cache_sharding,
                max_bytes=cfg.device_cache_bytes,
            )
            if val_pipe is not None:
                val_pipe = DeviceCache(
                    val_pipe, sharding=cache_sharding,
                    max_bytes=cfg.device_cache_bytes,
                )
            log("device cache: dataset resident on device")
        except MemoryError as e:
            log(f"device cache disabled ({e}); streaming")

    # Epoch-fused trainer (the headline-perf path): needs the device cache's
    # epoch_plan (resident arrays + index matrices). "auto" rides the cache.
    use_fused = cfg.fused_epochs == "on" or (
        cfg.fused_epochs == "auto" and hasattr(train_pipe, "epoch_plan")
    )
    if cfg.fused_epochs == "on" and not hasattr(train_pipe, "epoch_plan"):
        raise ValueError(
            "fused_epochs='on' requires the device cache (device_cache='on' "
            "with a sufficient device_cache_bytes cap)"
        )
    train_epoch = (
        make_train_epoch(
            model, tx, cfg.label_average, cfg.ctc_impl,
            batch_shardings=data_sharding, grad_clip=cfg.grad_clip,
        )
        if use_fused
        else None
    )
    if use_fused:
        log("fused epochs: training runs as per-bucket lax.scan segments")

    plateau = PlateauController(
        cfg.lr, cfg.plateau_patience, cfg.plateau_decay, cfg.min_lr
    )
    # Dropout rng: the rbg impl uses the TPU hardware RNG — threefry mask
    # generation alone measured 3.5 ms/step at the W=512 bucket
    # (scripts/profile_ablate.py). CPU keeps threefry (rbg there is slow
    # and the parity tests pin threefry draws).
    rng = (
        jax.random.key(cfg.seed + 1, impl="rbg")
        if jax.default_backend() in ("tpu", "axon")
        else jax.random.PRNGKey(cfg.seed + 1)
    )
    # Only process 0 touches the (possibly shared) filesystem: snapshots,
    # metrics, best-promotion. Every process still COMPUTES identically
    # (validation, plateau lr) so the collective schedule stays in sync.
    is_primary = jax.process_index() == 0
    os.makedirs(cfg.snapshot_dir or ".", exist_ok=True)
    metrics_path = os.path.join(cfg.snapshot_dir, "metrics.jsonl")
    metrics_f = (
        open(metrics_path, "a") if cfg.snapshot_dir and is_primary else None
    )

    def emit(rec: dict):
        if metrics_f:
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()

    def snapshot(tag: str, step: int, epoch: int, extra: dict):
        path = os.path.join(cfg.snapshot_dir, tag)
        if not is_primary:
            return path
        save_snapshot(
            path,
            variables={
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            },
            model_config=model_config,
            alphabet=alphabet,
            contract=contract,
            step=step,
            opt_state=state.opt_state,
            extra={"epoch": epoch, "train_config": dataclasses.asdict(cfg), **extra},
        )
        return path

    log(
        f"training: {len(train_ds)} lines, alphabet={alphabet.num_classes}, "
        f"mesh=data:{n_data}xmodel:{mesh.shape['model']}, "
        f"setup {time.time()-t_setup:.1f}s"
    )

    step = start_step
    best_cer = plateau.best
    window_lines, window_t0 = 0, time.time()
    last_val = (float("nan"), float("nan"))
    stop = False
    summary_lines_per_sec = 0.0
    profiling = False

    def profile_tick():
        nonlocal profiling
        if cfg.profile_stop <= 0:
            return
        if step >= cfg.profile_start and step < cfg.profile_stop and not profiling:
            jax.profiler.start_trace(os.path.join(cfg.snapshot_dir, "profile"))
            profiling = True
        elif step >= cfg.profile_stop and profiling:
            jax.profiler.stop_trace()
            profiling = False
            log(f"profile trace written to {cfg.snapshot_dir}/profile")

    def check_divergence(m, epoch: int):
        # Fail fast on divergence (SURVEY.md §5: fail-fast + deterministic
        # resume is the failure-handling model). Note: the NaN-safe CTC
        # clamps unreachable paths to -1e30, so NaN'd parameters surface as
        # a ~1e30 loss rather than NaN — guard on magnitude as well as
        # finiteness.
        loss_now = float(m["loss"])
        gnorm_now = float(m["gnorm"])
        if (not np.isfinite(loss_now) or abs(loss_now) > 1e20
                or not np.isfinite(gnorm_now)):
            snapshot("diverged", step, epoch, {"loss": loss_now})
            raise FloatingPointError(
                f"divergence at step {step}: loss={loss_now}, "
                f"gnorm={gnorm_now}; state saved to "
                f"{cfg.snapshot_dir}/diverged (resume from an "
                f"earlier snapshot with a lower lr)"
            )
        return loss_now, gnorm_now

    def log_window(m, epoch: int, loss_now: float, gnorm_now: float):
        nonlocal window_lines, window_t0, summary_lines_per_sec
        dt = max(time.time() - window_t0, 1e-9)
        lps = window_lines / dt
        summary_lines_per_sec = lps
        rec = {
            "step": step,
            "epoch": epoch,
            "loss": round(loss_now, 4),
            "gnorm": round(gnorm_now, 3),
            "lr": plateau.lr,
            "lines_per_sec": round(lps, 1),
        }
        log(f"step {step}: {rec}")
        emit(rec)
        window_lines, window_t0 = 0, time.time()

    # Fractional progress within the current stacked epoch plan, recorded
    # into snapshot meta so an interrupted fused run's duplicate-replay
    # window (see TrainConfig.epoch_stack) is visible after the fact.
    stack_progress = {"stack_rows_done": 0, "stack_epochs": 1}

    def run_validation(epoch: int):
        nonlocal best_cer, last_val
        c, w, v_lps = evaluate(
            eval_step, state.params, state.batch_stats, val_pipe,
            alphabet, sharding=data_sharding,
        )
        last_val = (c, w)
        is_best = plateau.update(c)
        rec = {
            "step": step,
            "val_cer": round(c, 5),
            "val_wer": round(w, 5),
            "val_lines_per_sec": round(v_lps, 1),
            "lr": plateau.lr,
            "best": is_best,
        }
        log(f"val @ {step}: {rec}")
        emit(rec)
        snapshot("last", step, epoch,
                 {"val_cer": c, "val_wer": w, **stack_progress})
        if is_best:
            best_cer = c
            if is_primary:
                promote(
                    os.path.join(cfg.snapshot_dir, "last"),
                    os.path.join(cfg.snapshot_dir, "best"),
                )

    # max_steps, when set, is the binding limit (epochs then only bounds
    # the no-max_steps case); the epoch loop just keeps cycling data.
    end_epoch = cfg.epochs if not cfg.max_steps else 10**9
    cur_epoch = start_epoch
    epoch = start_epoch
    while epoch < end_epoch:
        if stop:
            break
        cur_epoch = epoch
        # Fused path stacks epoch_stack epochs of index rows per bucket
        # into one plan: fewer, longer fused-scan dispatches (per-program
        # fixed cost is measurable when a bucket's epoch is a handful of
        # rows). Validation/snapshot cadence is step-based and segments
        # still chop at val_interval_steps, so only DATA ORDER coarsens
        # (bucket-major over the stacked epochs) — the documented fused-
        # mode tradeoff.
        stride = (
            max(1, min(cfg.epoch_stack, end_epoch - epoch)) if use_fused else 1
        )
        stack_progress["stack_rows_done"] = 0
        stack_progress["stack_epochs"] = stride
        if use_fused:
            # Each bucket's stacked epochs form one [nb, B] index matrix;
            # run it as lax.scan segments of <= val_interval_steps rows so
            # validation/snapshot cadence survives. Segment shapes repeat
            # across epoch groups (bucket membership is fixed), so the
            # compile set stays bounded at <= 2 programs per bucket.
            seg = max(1, cfg.val_interval_steps)
            for b_idx, arrays, idx, w in train_pipe.epoch_plan(
                epoch, stack=stride
            ):
                if stop:
                    break
                for k0 in range(0, idx.shape[0], seg):
                    profile_tick()
                    idx_k = idx[k0 : k0 + seg]
                    w_k = w[k0 : k0 + seg]
                    if cfg.max_steps:
                        remaining = start_step + cfg.max_steps - step
                        if remaining <= 0:
                            stop = True
                            break
                        if remaining < idx_k.shape[0]:
                            idx_k = idx_k[:remaining]
                            w_k = w_k[:remaining]
                    lr = jnp.asarray(plateau.lr, jnp.float32)
                    state, m = train_epoch(
                        state, *arrays, idx_k, w_k, lr, rng
                    )
                    step += idx_k.shape[0]
                    stack_progress["stack_rows_done"] += idx_k.shape[0]
                    window_lines += int(idx_k.shape[0] * idx_k.shape[1])
                    loss_now, gnorm_now = check_divergence(m, epoch)
                    log_window(m, epoch, loss_now, gnorm_now)
                    if (
                        val_pipe is not None
                        and step // cfg.val_interval_steps
                        > (step - idx_k.shape[0]) // cfg.val_interval_steps
                    ):
                        run_validation(epoch)
                    if cfg.max_steps and step >= start_step + cfg.max_steps:
                        stop = True
                        break
        else:
            for batch in train_pipe.device_epoch(epoch, sharding=data_sharding):
                profile_tick()
                lr = jnp.asarray(plateau.lr, jnp.float32)
                weights = jnp.asarray(batch.valid, jnp.float32)
                state, m = train_step(
                    state,
                    batch.images,
                    batch.widths,
                    batch.labels,
                    batch.label_lengths,
                    weights,
                    lr,
                    rng,
                )
                step += 1
                window_lines += batch.size
                if step % cfg.log_interval == 0:
                    loss_now, gnorm_now = check_divergence(m, epoch)
                    log_window(m, epoch, loss_now, gnorm_now)
                if step % cfg.val_interval_steps == 0 and val_pipe is not None:
                    run_validation(epoch)
                if cfg.max_steps and step >= start_step + cfg.max_steps:
                    stop = True
                    break
        epoch += stride
        if not stop:
            cur_epoch = epoch
            snapshot("last", step, cur_epoch, {})

    if profiling:
        jax.profiler.stop_trace()
    # Final snapshot records the REAL epoch so resume re-enters the loop
    # where training actually stopped (mid-epoch stops resume same-epoch).
    snapshot("last", step, cur_epoch, {"final": True})
    if metrics_f:
        metrics_f.close()
    return {
        "steps": step,
        "best_cer": best_cer if best_cer != float("inf") else None,
        "last_val_cer": last_val[0],
        "last_val_wer": last_val[1],
        "lines_per_sec": summary_lines_per_sec,
        "snapshot_dir": cfg.snapshot_dir,
    }


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------
def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    p.add_argument(
        "--platform", default=None, choices=("cpu", "tpu", "axon"),
        help="override jax platform (e.g. cpu for the smoke preset)",
    )
    # Multi-host launch (SURVEY.md §5 distributed backend): one process per
    # host, jax.distributed.initialize() makes jax.devices() span hosts and
    # XLA lays collectives over ICI within a slice / DCN across slices.
    # Everything downstream (mesh, shardings) is unchanged.
    p.add_argument(
        "--coordinator-address", default=None, metavar="HOST:PORT",
        help="multi-host: coordinator address (enables "
             "jax.distributed.initialize)",
    )
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank")
    for f in dataclasses.fields(TrainConfig):
        name = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            # BooleanOptionalAction (--flag / --no-flag) so preset-enabled
            # booleans can be switched OFF from the CLI too.
            p.add_argument(
                name, action=argparse.BooleanOptionalAction, default=None
            )
        elif f.name == "bucket_widths":
            p.add_argument(name, type=str, default=None,
                           help="comma-separated widths")
        else:
            typ = type(f.default) if f.default is not None else str
            p.add_argument(name, type=typ, default=None)
    return p


def config_from_args(args) -> TrainConfig:
    base = dict(PRESETS.get(args.preset or "", {}))
    for f in dataclasses.fields(TrainConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            if f.name == "bucket_widths" and isinstance(v, str):
                v = tuple(int(x) for x in v.split(","))
            base[f.name] = v
    return TrainConfig(**base)


def maybe_init_distributed(
    coordinator_address=None, num_processes=None, process_id=None
):
    """jax.distributed.initialize() when a coordinator is configured —
    must run before the first backend touch (make_mesh / jax.devices)."""
    if not coordinator_address:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    maybe_init_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    cfg = config_from_args(args)
    if not cfg.data_dir:
        raise SystemExit("--data-dir is required")
    if not cfg.snapshot_dir:
        raise SystemExit("--snapshot-dir is required")
    summary = fit(cfg)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
