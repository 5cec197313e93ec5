"""Multi-host initialization + fault tolerance helpers.

The reference bootstraps NCCL process groups from torchrun env vars
(first_stage_training.py:422-430) and recovers from failures with
hand-maintained resume constants (second_stage_training.py:236-239).
TPU-native replacement: ``jax.distributed.initialize`` (one call; the
TPU runtime discovers peers), SPMD over a global mesh so there is no
per-rank program divergence, and orbax checkpoints for recovery
(train/checkpoint.py). DCN only ever carries data-parallel gradient
reductions; everything else rides ICI.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Tuple, TypeVar

import jax

T = TypeVar("T")


def initialize_if_needed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op on a
    single host. Returns (process_index, process_count)."""
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    on_multihost_tpu = "TPU_WORKER_HOSTNAMES" in os.environ and \
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if explicit or on_multihost_tpu:
        try:
            jax.distributed.initialize(
                coordinator_address=explicit,
                num_processes=num_processes,
                process_id=process_id)
        except RuntimeError as e:
            # tolerate ONLY re-initialization; a failed bringup
            # (unreachable coordinator, dead peer) must not silently
            # degrade to a 1-process run with wrong shards
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def with_retries(fn: Callable[[], T], max_attempts: int = 3,
                 backoff_s: float = 5.0, on_error=None) -> T:
    """Failure-detection wrapper for per-item work (the structured
    version of the reference's try/except-and-continue train loop,
    second_stage_training.py:161-164)."""
    if max_attempts < 1:
        raise ValueError(f"max_attempts={max_attempts} must be >= 1")
    last = None
    for attempt in range(max_attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — deliberate catch-all
            last = e
            if on_error:
                on_error(attempt, e)
            if attempt + 1 < max_attempts:    # no sleep after the last
                time.sleep(backoff_s * (attempt + 1))
    raise last


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (post-checkpoint, pre-eval fences)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
