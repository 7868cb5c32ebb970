"""Child process for tests/test_multihost.py: joins a 2-process CPU
jax.distributed cluster (4 virtual devices per process -> 8 global).

Modes:
  step (default): one sharded train step on the tiny flagship; prints the
      loss. The parent asserts both processes print the SAME loss —
      GSPMD's gradient all-reduce ran across process boundaries.
  fit <data_dir> <snap_dir>: a short REAL ``train.fit()`` run (epoch
      plans, validation, plateau lr, snapshots) over a shared corpus +
      snapshot dir. The parent asserts both processes report the same
      val CER and that only process 0 wrote snapshots/metrics.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=4 \
     python multihost_child.py <pid> <nproc> <port> [fit <data> <snap>]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

if len(sys.argv) > 4 and sys.argv[4] == "fit":
    from vistaocr_tpu.train import PRESETS, TrainConfig, fit

    data_dir, snap_dir = sys.argv[5], sys.argv[6]
    cfg = TrainConfig(**{
        **PRESETS["synth-tiny"],
        "data_dir": data_dir,
        "snapshot_dir": snap_dir,
        "max_steps": 10,
        "val_interval_steps": 5,
        "epochs": 1000,
        "device_cache": "off",
        "fused_epochs": "off",
        "log_interval": 5,
    })
    summary = fit(cfg, log=lambda *a, **k: None)
    print(
        f"MHFIT steps={summary['steps']} "
        f"cer={summary['last_val_cer']:.6f} pid={jax.process_index()}",
        flush=True,
    )
    sys.exit(0)

import numpy as np
import jax.numpy as jnp
import optax

from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
from vistaocr_tpu.models.cnn import ConvStageSpec
from vistaocr_tpu.parallel import MeshConfig, make_mesh, replicated, shard_batch_arrays
from vistaocr_tpu.train import TrainState, make_train_step

assert jax.process_count() == nproc
mesh = make_mesh(MeshConfig(data=len(jax.devices()), model=1))
sh = shard_batch_arrays(mesh)

# Identical global batch on every process: jax.device_put with a
# cross-process sharding places each process's addressable shards.
B = 16
rng = np.random.default_rng(0)
images = jax.device_put(
    rng.integers(0, 255, (B, 32, 64), dtype=np.uint8), sh["images"])
widths = jax.device_put(np.full((B,), 64, np.int32), sh["widths"])
labels = jax.device_put(
    np.tile(np.array([[1, 2, 3, 0]], np.int32), (B, 1)), sh["labels"])
lls = jax.device_put(np.full((B,), 3, np.int32), sh["label_lengths"])
wt = jax.device_put(np.ones((B,), np.float32), sh["widths"])

cfg = ModelConfig(
    num_classes=16,
    stages=(ConvStageSpec(8, 1, (2, 2)), ConvStageSpec(16, 1, (2, 2)),
            ConvStageSpec(16, 1, (2, 1))),
    bridge_dim=32, lstm_hidden=32, lstm_layers=1, dropout=0.0,
    compute_dtype="float32",
)
model = CnnLstmOcr(cfg)
variables = jax.tree.map(
    np.asarray, model.init_params(jax.random.PRNGKey(0), batch=2, width=64))
tx = optax.chain(optax.identity(), optax.scale_by_adam())
state = TrainState(
    params=variables["params"], batch_stats=variables["batch_stats"],
    opt_state=tx.init(variables["params"]), step=jnp.asarray(0, jnp.int32))
state = jax.device_put(state, replicated(mesh))

step_fn = make_train_step(model, tx, label_average=False, grad_clip=5.0)
state, m = step_fn(state, images, widths, labels, lls, wt,
                   jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(1))
print(f"MHLOSS {float(m['loss']):.6f} STEP {int(state.step)}", flush=True)
