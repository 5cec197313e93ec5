"""Device mesh construction and sharding rules.

The reference distributes with NCCL process groups (torchrun DDP at
first_stage_training.py:422-430, DeepSpeed ZeRO-2 via default_config.yaml).
TPU-native replacement: one 2-axis ``jax.sharding.Mesh`` — ``data`` for
batch parallelism, ``model`` for Megatron-style tensor parallelism — and
``PartitionSpec`` annotations; XLA emits the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    If only one of the axis sizes is given, the other is inferred. With
    neither given, all devices go on the model axis (TP) — the right
    default for a 7B model on a v5e-8 slice (16 GB weights must shard,
    SURVEY.md §7 "hard parts").
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None and model_parallel is None:
        data_parallel, model_parallel = 1, n
    elif data_parallel is None:
        data_parallel = n // model_parallel
    elif model_parallel is None:
        model_parallel = n // data_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices")
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def divisible(dim: int, mesh: Mesh, axis: str = MODEL_AXIS) -> bool:
    return dim % mesh.shape[axis] == 0
