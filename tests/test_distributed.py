"""Multi-host helpers: retry wrapper, single-host init no-op."""

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
