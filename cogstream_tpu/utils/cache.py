"""Persistent XLA compilation cache.

The vision tower deliberately unrolls 27 Pallas kernels (see
models/vision_encoder.py), which costs minutes of one-time compilation
on the remote-compile TPU path. Enabling JAX's persistent cache makes
that a once-per-machine cost: subsequent processes (serving restarts,
bench re-runs, eval shards) hit the disk cache and start in seconds.

CPU-backend entries are host-keyed: XLA:CPU caches AOT machine code
compiled for the *exact* host CPU feature set, and JAX's cache key does
not include it — an entry written on one machine deserializes fine on
another but then executes illegal instructions (observed as SIGILL/
SIGSEGV/hangs mid-test-suite when the cache directory outlives the
host, e.g. on shared or snapshotted home volumes). TPU executables are
device binaries dispatched over the runtime and do not embed host
machine code, so the TPU cache stays shared at the directory root.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform

_DEFAULT_DIR = os.environ.get(
    "COGSTREAM_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "cogstream_jax"))

_enabled = False


def _cpu_host_tag() -> str:
    """Fingerprint of the host CPU's instruction-set features.

    Hashes /proc/cpuinfo's ``flags`` line PLUS the ``model name``:
    the flags line alone is NOT sufficient — LLVM derives extra tuning
    features from the CPU *model* (e.g. ``+prefer-no-scatter`` /
    ``+prefer-no-gather`` on some Intel parts), and two hosts with
    byte-identical flags lines were observed producing AOT entries the
    other rejects ("Machine type used for XLA:CPU compilation doesn't
    match"). The model name pins the microarchitecture those derived
    features come from.
    """
    try:
        with open("/proc/cpuinfo") as f:
            keyed = []
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    keyed.append(line)
                    if len(keyed) == 2:
                        break
            if keyed:
                return hashlib.sha1("".join(keyed).encode()).hexdigest()[:12]
    except OSError:
        pass
    return _platform.machine() or "unknown"


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> str:
    """Idempotently switch on the persistent compilation cache.

    Returns the directory actually configured (for the CPU backend, a
    host-keyed subdirectory of ``cache_dir`` — see module docstring).
    """
    global _enabled
    import jax

    if _enabled:
        return jax.config.jax_compilation_cache_dir
    # Resolve the backend WITHOUT initializing it: jax.default_backend()
    # claims the device, and bench.py must enable the cache before
    # spawning its overlap subprocess — two processes attached to the
    # axon tunnel crash the TPU worker (the 3x-retried
    # ingest_overlap_bench_error of 2026-08-20). The platform is pinned
    # in this image (sitecustomize sets axon; tests pin cpu), so the
    # config answers; fall back to backend init only when unpinned.
    platforms = jax.config.jax_platforms or ""
    if platforms:
        is_cpu = platforms.split(",")[0] == "cpu"
    else:
        is_cpu = jax.default_backend() == "cpu"
    if is_cpu:
        cache_dir = os.path.join(
            cache_dir, f"cpu-{jax.__version__}-{_cpu_host_tag()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return cache_dir
