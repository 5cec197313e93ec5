"""Atomic JSON writes (the race-free replacement for the reference's
whole-file rewrites, SURVEY.md §5)."""

import json
import os

from cogstream_tpu.utils.io import atomic_write_json, atomic_write_text


def test_atomic_write_and_replace(tmp_path):
    p = str(tmp_path / "x.json")
    atomic_write_json(p, {"a": 1})
    assert json.load(open(p)) == {"a": 1}
    atomic_write_json(p, {"a": 2})
    assert json.load(open(p)) == {"a": 2}
    # no stray temp files left behind
    assert [f for f in os.listdir(tmp_path)
            if f.startswith(".tmp_")] == []


def test_atomic_write_failure_leaves_original(tmp_path, monkeypatch):
    p = str(tmp_path / "y.json")
    atomic_write_json(p, {"ok": True})

    class Boom:
        def __str__(self):
            raise RuntimeError("serialization failure")

    try:
        atomic_write_text(p, Boom())   # write() raises TypeError
    except Exception:
        pass
    assert json.load(open(p)) == {"ok": True}   # original intact
    assert [f for f in os.listdir(tmp_path)
            if f.startswith(".tmp_")] == []      # temp cleaned up


def test_compilation_cache_dir_is_host_keyed_on_cpu(tmp_path, monkeypatch):
    """CPU-backend persistent-cache entries are XLA:CPU AOT machine code
    for the compiling host's exact CPU features, and JAX's cache key
    omits those — an entry from another machine SIGILLs at execution.
    enable_compilation_cache must therefore namespace the CPU cache by a
    host fingerprint (utils/cache.py module docstring)."""
    import jax

    from cogstream_tpu.utils import cache as cache_mod

    monkeypatch.setattr(cache_mod, "_enabled", False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = cache_mod.enable_compilation_cache(str(tmp_path))
        assert got.startswith(str(tmp_path) + os.sep)
        tag = os.path.basename(got)
        assert tag.startswith(f"cpu-{jax.__version__}-")
        assert os.path.isdir(got)
        # idempotent: second call reports the configured dir unchanged
        assert cache_mod.enable_compilation_cache("/elsewhere") == got
        # same-host stability: the fingerprint is deterministic
        assert cache_mod._cpu_host_tag() == tag.rsplit("-", 1)[1]
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_compilation_cache_does_not_claim_a_device(tmp_path):
    """enable_compilation_cache must not initialize the JAX backend:
    bench.py enables the cache BEFORE spawning its overlap subprocess,
    and a parent that has attached to the axon tunnel makes the child's
    attach crash the TPU worker (single-holder constraint; observed as
    3x ingest_overlap_bench_error on 2026-08-20). With the platform
    pinned (as this image's sitecustomize and the test conftest both
    do), the cache decision must come from config alone."""
    import subprocess
    import sys

    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")   # pinned, like conftest
from cogstream_tpu.utils.cache import enable_compilation_cache
d = enable_compilation_cache({str(tmp_path)!r})
from jax._src import xla_bridge
assert xla_bridge._backends == {{}}, f"backend initialized: {{list(xla_bridge._backends)}}"
assert "cpu-" in d
print("NOINIT-OK")
"""
    out = subprocess.run([sys.executable, "-c", code], text=True,
                         capture_output=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "NOINIT-OK" in out.stdout
