"""Subprocess worker for the real 2-process ``jax.distributed`` test.

Each worker is a separate OS process with its own XLA CPU client
holding 4 virtual devices; ``jax.distributed.initialize`` joins them
into one 8-device global system — the same topology as two v5e hosts
joined over DCN (SURVEY.md §5 "distributed communication backend"; the
reference bootstraps the analogous NCCL group from torchrun env vars,
first_stage_training.py:422-430).

The computation is the framework's standard DPxTP layout: the ``data``
mesh axis spans the two processes (the DCN axis), ``model`` stays
process-local (the ICI axis). The global-batch mean forces a
cross-process reduction, so a passing run proves real inter-process
collectives, not just coordination-service handshakes.

Invoked by tests/test_distributed.py as:
    python tests/multihost_worker.py <port> <process_id> <num_processes>
Prints one line ``MULTIHOST OK pid=<i> devices=<n> loss=<x>`` on
success; any assertion or collective failure exits nonzero.
"""

import os
import sys


def main() -> None:
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # Platform forcing mirrors tests/conftest.py: the image pins
    # JAX_PLATFORMS=axon and sitecustomize imports jax at interpreter
    # startup, so flip the platform through jax.config after import;
    # XLA_FLAGS is still unread (no backend exists yet).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cogstream_tpu.parallel.distributed import (
        initialize_if_needed, sync_global_devices)

    pi, pc = initialize_if_needed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=pid)
    assert (pi, pc) == (pid, nprocs), (pi, pc)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cogstream_tpu.parallel.mesh import make_mesh

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * nprocs, n_global
    assert n_local == 4, n_local

    # data axis spans processes (DCN), model axis is process-local (ICI)
    mesh = make_mesh(data_parallel=nprocs, model_parallel=4)

    B, Din, Dout = 8, 16, 32
    rng = np.random.default_rng(0)          # same seed on every process
    x_full = rng.normal(size=(B, Din)).astype(np.float32)
    w_full = rng.normal(size=(Din, Dout)).astype(np.float32)

    # Each process contributes its own batch shard; the global array is
    # assembled from process-local data (the multi-host ingest path).
    x_sharding = NamedSharding(mesh, P("data", None))
    w_sharding = NamedSharding(mesh, P(None, "model"))
    x = jax.make_array_from_process_local_data(
        x_sharding, x_full[pid * (B // nprocs):(pid + 1) * (B // nprocs)])
    w = jax.device_put(w_full, w_sharding)

    @jax.jit
    def loss_fn(x, w):
        y = x @ w
        return jnp.mean(y * y)              # global-batch mean → cross-process psum

    loss = float(jax.jit(loss_fn, out_shardings=NamedSharding(mesh, P()))(x, w))
    expect = float(np.mean((x_full @ w_full) ** 2))
    assert abs(loss - expect) < 1e-4 * max(1.0, abs(expect)), (loss, expect)

    sync_global_devices("multihost-test-done")
    print(f"MULTIHOST OK pid={pid} devices={n_global} loss={loss:.6f}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
