"""Persistent XLA compilation cache.

The vision tower deliberately unrolls 27 Pallas kernels (see
models/vision_encoder.py), which costs minutes of one-time compilation
on the remote-compile TPU path. Enabling JAX's persistent cache makes
that a once-per-machine cost: subsequent processes (serving restarts,
bench re-runs, eval shards) hit the disk cache and start in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "COGSTREAM_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "cogstream_jax"))

_enabled = False


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> str:
    """Idempotently switch on the persistent compilation cache."""
    global _enabled
    import jax

    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
