"""Self-describing checkpoints — component C16 (SURVEY.md §2).

The reference's snapshot carries weights PLUS alphabet, line height and
architecture hyperparams so decode can rebuild the exact model from one
file (`FromSavedWeights` [M]). The rebuild keeps that property:

    snapshot_dir/
      meta.json          # ModelConfig, Alphabet, ShapeContract, step,
                         # best CER, optimizer/dataset bookkeeping
      weights.msgpack    # flax-serialized {params, batch_stats}
      opt_state.msgpack  # optional (training resume only)

``load_model`` needs only the snapshot directory — the exact
FromSavedWeights contract. Training keeps ``last/`` and ``best/``
(best dev CER) snapshots, as the reference does [M].
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import jax
from flax import serialization

from .data.buckets import ShapeContract
from .models import CnnLstmOcr, ModelConfig
from .text import Alphabet

_WEIGHTS = "weights.msgpack"
_OPT = "opt_state.msgpack"
_META = "meta.json"


def _atomic_write(dst: str, payload: bytes):
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, dst)


def save_snapshot(
    path: str,
    *,
    variables: Any,  # {'params': ..., 'batch_stats': ...}
    model_config: ModelConfig,
    alphabet: Alphabet,
    contract: ShapeContract,
    step: int = 0,
    opt_state: Any = None,
    extra: Optional[dict] = None,
) -> str:
    os.makedirs(path, exist_ok=True)
    variables = jax.device_get(variables)
    # Every file goes through tmp+rename, meta.json LAST: a snapshot is
    # valid iff meta.json exists, so a crash mid-save can never leave a
    # meta.json pointing at truncated weights (the resume/fail-fast story
    # depends on last/ always being loadable).
    _atomic_write(os.path.join(path, _WEIGHTS), serialization.to_bytes(variables))
    if opt_state is not None:
        _atomic_write(
            os.path.join(path, _OPT),
            serialization.to_bytes(jax.device_get(opt_state)),
        )
    meta = {
        "version": 1,
        "step": int(step),
        "model_config": json.loads(model_config.to_json()),
        "alphabet": json.loads(alphabet.to_json()),
        "contract": json.loads(contract.to_json()),
    }
    if extra:
        meta["extra"] = extra
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, ensure_ascii=False)
    os.replace(tmp, os.path.join(path, _META))
    return path


def load_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        return json.load(f)


def load_snapshot(
    path: str,
) -> Tuple[Any, ModelConfig, Alphabet, ShapeContract, dict]:
    """Returns (variables, model_config, alphabet, contract, meta)."""
    meta = load_meta(path)
    model_config = ModelConfig.from_json(json.dumps(meta["model_config"]))
    alphabet = Alphabet.from_json(json.dumps(meta["alphabet"]))
    contract = ShapeContract.from_json(json.dumps(meta["contract"]))

    # Deserialize against a freshly-initialized target so tree structure,
    # shapes and dtypes are validated rather than trusted.
    model = CnnLstmOcr(model_config)
    target = model.init_params(jax.random.PRNGKey(0))
    with open(os.path.join(path, _WEIGHTS), "rb") as f:
        variables = serialization.from_bytes(jax.device_get(target), f.read())
    return variables, model_config, alphabet, contract, meta


def load_opt_state(path: str, target: Any) -> Any:
    with open(os.path.join(path, _OPT), "rb") as f:
        return serialization.from_bytes(jax.device_get(target), f.read())


def has_opt_state(path: str) -> bool:
    return os.path.exists(os.path.join(path, _OPT))


def load_model(path: str) -> Tuple[CnnLstmOcr, Any, Alphabet, ShapeContract]:
    """The FromSavedWeights equivalent: snapshot dir -> ready-to-apply
    (model, variables, alphabet, contract)."""
    variables, cfg, alphabet, contract, _ = load_snapshot(path)
    return CnnLstmOcr(cfg), variables, alphabet, contract


def promote(src: str, dst: str):
    """Copy snapshot ``src`` over ``dst`` atomically-ish (used for best/)."""
    tmp = dst + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.replace(tmp, dst)
