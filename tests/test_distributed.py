"""Multi-host helpers: retry wrapper, single-host init no-op, and a
REAL two-process ``jax.distributed`` run.

The reference only ever exercises its NCCL paths by launching actual
torchrun jobs (SURVEY.md §4); the in-suite analogue here spawns two OS
processes, each with its own 4-device XLA CPU client, joins them
through ``initialize_if_needed`` (the same helper a two-host v5e
deployment calls), and runs a DPxTP computation whose global-batch
reduction must cross the process boundary — collectives over the
DCN-analogue axis, not just a coordination handshake."""

import os
import socket
import subprocess
import sys

import pytest

from cogstream_tpu.parallel.distributed import (
    initialize_if_needed, with_retries)


def test_initialize_single_host_noop():
    pi, pc = initialize_if_needed()
    assert (pi, pc) == (0, 1)


def test_with_retries_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    seen = []
    out = with_retries(flaky, max_attempts=5, backoff_s=0.0,
                       on_error=lambda a, e: seen.append(a))
    assert out == "ok"
    assert calls["n"] == 3
    assert seen == [0, 1]


def test_with_retries_raises_after_exhaustion():
    def always():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        with_retries(always, max_attempts=2, backoff_s=0.0)


def test_two_process_distributed_dp_tp():
    """Two real processes x 4 virtual CPU devices each = one 8-device
    global mesh; the data axis spans the process boundary and the
    global-batch mean is verified against single-host numpy on both
    ranks."""
    with socket.socket() as s:              # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)              # worker sets its own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"MULTIHOST OK pid={i} devices=8" in out, out
    # both ranks computed the identical replicated global loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)


def test_with_retries_rejects_zero_attempts():
    with pytest.raises(ValueError, match="max_attempts"):
        with_retries(lambda: 1, max_attempts=0)
