"""Process-level runtime knobs shared by the entry points.

The compile cache matters operationally on this rig: the fine bucket
ladders mean ~25 compiled graphs per entry point, at tens of seconds
each — without the persistent cache every `infer`/serve/train start
pays that again (measured: `infer` on a 1024-line split spent ~110 s of
its ~130 s wall recompiling eval graphs it had already built in the
previous run).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = "/tmp/vistaocr_jax_cache"
_enabled = False


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (or $JAX_CACHE_DIR, or the shared default). Safe to call from every
    entry point; first caller wins."""
    global _enabled
    if _enabled:
        return
    cache = path or os.environ.get("JAX_CACHE_DIR", _DEFAULT_CACHE)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
