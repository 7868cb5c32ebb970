"""Device mesh + sharding rules — component C18 rebuilt TPU-native.

The reference has at most single-node DataParallel (SURVEY.md §2
parallelism table); the rebuild makes DP first-class and leaves TP as a
config change, per the survey's accounting:

- mesh axes: ('data', 'model'). DP shards the batch on 'data'; gradients
  are all-reduced by XLA over ICI (no NCCL-style code anywhere — the
  collectives fall out of GSPMD sharding propagation).
- TP (model > 1) shards the wide gate/bridge/head matrices on their
  output axis across 'model'. The model is small (~10-20M params), so
  this exists to prove the mesh design scales, not because parity needs
  it.
- multi-host: jax.distributed.initialize() before make_mesh() makes
  jax.devices() span hosts; everything below is unchanged (DCN between
  slices, ICI within — XLA lays collectives accordingly).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter partitioning rules: path-regex -> PartitionSpec. Matmul weights
# shard their OUTPUT axis on 'model' (column parallel); everything else is
# replicated. With model=1 these all collapse to replication.
_TP_RULES = (
    (re.compile(r".*blstm.*_wx$"), P(None, "model")),
    (re.compile(r".*blstm.*_wh$"), P(None, "model")),
    (re.compile(r".*blstm.*_b$"), P("model")),
    (re.compile(r".*bridge.*kernel$"), P(None, "model")),
    (re.compile(r".*bridge.*bias$"), P("model")),
    (re.compile(r".*head.*kernel$"), P(None, None)),  # head stays replicated:
    # its output axis is the alphabet, consumed by log_softmax + CTC which
    # want the full class axis resident.
)


def _spec_for(path: str, use_tp: bool) -> P:
    if use_tp:
        for rx, spec in _TP_RULES:
            if rx.match(path):
                return spec
    return P()


def param_shardings(variables, mesh: Mesh):
    """Pytree of NamedShardings matching ``variables`` (params+batch_stats).

    TP rules activate only when the mesh has a nontrivial 'model' axis.
    """
    use_tp = mesh.shape["model"] > 1

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    specs = {path_str(kp): _spec_for(path_str(kp), use_tp) for kp, _ in flat}

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, variables)


def shard_batch_arrays(mesh: Mesh):
    """Sharding dict for BatchPipeline.device_epoch: every array field is
    batch-sharded on its leading axis."""
    s = batch_sharding(mesh)
    return {"images": s, "widths": s, "labels": s, "label_lengths": s}
