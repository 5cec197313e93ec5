"""Pipeline parallelism for the decoder — GPipe microbatch schedule
over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.3: TP/PP both
absent upstream; its scale ceiling is DDP + ZeRO-2). This module adds
the PP axis the TPU way: the decoder's stacked ``[L, ...]`` layer
pytree (models/qwen2.py) is sharded on its LEADING axis across the
``pipe`` mesh axis — each device holds a contiguous ``L/P`` stage — and
a ``shard_map`` runs the classic GPipe schedule: microbatches enter at
stage 0, activations hop stage→stage over the ICI ring via
``ppermute``, and stage P-1 collects final hidden states. Each stage
runs its layer shard with the SAME scanned block code as the single
-device path (``qwen2_forward`` with ``apply_final_norm=False``; the
norm runs once after the last stage), so PP composes with LoRA
adapters (their stacked
``layers`` leaves shard identically) and remat for free.

Schedule: with M microbatches and P stages the loop runs M+P-1 ticks;
at tick t stage s processes microbatch t-s (stage 0 re-reads its last
microbatch during drain — the output is never written, it just keeps
the collective schedule uniform). Bubble fraction is the textbook
(P-1)/(M+P-1); pick M >= 4*P for <20% bubble.

Where PP fits this framework: TP over ICI is the first choice for 7B
on one v5e slice (parallel/sharding.py); PP is the axis that crosses
SLICE boundaries well — activation hops are point-to-point (one
[mb, S, H] tensor per tick) rather than TP's per-layer all-reduces, so
the ``pipe`` axis can ride DCN between slices while ``data`` / tensor
axes stay inside each slice. Expert parallelism is n/a (dense Qwen2 —
SURVEY.md §2.3).

Training/scoring path only (cache-free); decode latency wants TP, not
PP. Differentiable end to end: ``ppermute``'s transpose is the reverse
permutation, so ``jax.grad`` of a loss over this forward IS 1F1B-less
GPipe backward (activations for all live microbatches are kept; use
``remat=True`` to rematerialize blocks instead).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import qwen2
from ..ops.ring_attention import mark_varying
from .mesh import DATA_AXIS

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def make_pipeline_mesh(
    n_stages: int,
    data_parallel: int = 1,
    devices: Optional[List[jax.Device]] = None,
) -> Mesh:
    """(data, pipe) mesh: batch parallelism × pipeline stages."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_stages * data_parallel
    if len(devices) < need:
        raise ValueError(
            f"pipeline mesh {data_parallel}x{n_stages} needs {need} "
            f"devices, have {len(devices)}")
    if len(devices) > need:
        import warnings

        warnings.warn(
            f"pipeline mesh {data_parallel}x{n_stages} uses {need} of "
            f"{len(devices)} devices; the rest idle — raise "
            "data_parallel (or stages) to cover them", stacklevel=2)
    arr = np.asarray(devices[:need]).reshape(data_parallel, n_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def _stage_specs(tree, n_layers: int, axis: str):
    """PartitionSpec pytree sharding every stacked [L, ...] leaf of a
    decoder/adapter ``layers`` subtree on its leading axis."""
    def leaf_spec(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_layers:
            return P(axis)
        return P()
    return jax.tree.map(leaf_spec, tree)


def _adapter_specs(adapters, n_layers: int, axis: str):
    """Specs for the qwen2 adapter bundle: each (tree, gate) pair's
    ``layers`` subtree shards by stage; everything else (gates,
    lm_head/projector adapters) is replicated."""
    specs = []
    for tree, gate in adapters:
        tspec = {}
        for key, node in tree.items():
            if key == "layers":
                tspec[key] = _stage_specs(node, n_layers, axis)
            else:
                tspec[key] = jax.tree.map(lambda _: P(), node)
        specs.append((tspec, P()))
    return specs


def pipeline_decoder_forward(
    params,                         # qwen2 params (stacked [L] layers)
    inputs_embeds: jax.Array,       # [B, S, H]
    positions: jax.Array,           # [B, S] int32; -1 = padding
    cfg,                            # Qwen2Config
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    num_microbatches: Optional[int] = None,
    adapters=None,
    lora_scale: float = 2.0,
    remat: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Pipelined cache-free decoder forward. Returns hidden [B, S, H]
    (same contract as ``qwen2_forward`` without a cache, final norm
    applied). ``B`` must divide ``num_microbatches`` × any ``data``
    axis; ``L`` must divide the ``pipe`` axis size.

    LoRA dropout (training): the per-stage key folds in the stage index
    (stages hold disjoint layers — without the fold every stage would
    replay the same per-layer key stream) and the microbatch index
    (microbatches are separate activation draws, as rows of one dense
    batch are)."""
    n_stages = int(mesh.shape[axis])
    n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(
            f"pipe={n_stages} stages must divide L={n_layers} layers")
    B, S, H = inputs_embeds.shape
    if num_microbatches:
        M = num_microbatches
    else:
        # auto: smallest divisor of B >= 4*stages (<20% bubble); B
        # itself always divides, so the search cannot fail
        M = next(c for c in range(min(B, 4 * n_stages), B + 1)
                 if B % c == 0)
    if B % M:
        raise ValueError(f"microbatches M={M} must divide B={B}")
    mb = B // M

    dp = int(mesh.shape.get(DATA_AXIS, 1))
    if mb % dp:
        raise ValueError(
            f"data axis {dp} must divide microbatch size {mb}")

    emb_mb = inputs_embeds.reshape(M, mb, S, H)
    pos_mb = positions.reshape(M, mb, S)
    adapters = adapters or []

    batch_spec = P(None, DATA_AXIS) if DATA_AXIS in mesh.shape else P()

    def fwd(layers_local, fnorm, ads, emb_mb, pos_mb):
        stage = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(emb_mb[0])
        state0 = mark_varying(zero, axis)
        out0 = mark_varying(jnp.zeros_like(emb_mb), axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, out = carry
            src = jnp.minimum(t, M - 1)
            x_in = jnp.where(stage == 0,
                             jax.lax.dynamic_index_in_dim(
                                 emb_mb, src, keepdims=False),
                             state)
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            pos = jax.lax.dynamic_index_in_dim(
                pos_mb, mb_idx, keepdims=False)
            dkey = None
            if dropout_rng is not None and dropout_rate > 0.0:
                dkey = jax.random.fold_in(
                    jax.random.fold_in(dropout_rng, stage), mb_idx)
            x_out, _ = qwen2.qwen2_forward(
                {"layers": layers_local}, x_in, pos, cfg,
                adapters=ads or None, lora_scale=lora_scale,
                remat=remat, dropout_rate=dropout_rate,
                dropout_rng=dkey, apply_final_norm=False)
            dst = jnp.clip(t - (n_stages - 1), 0, M - 1)
            write = (stage == n_stages - 1) & (t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(out, dst, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, x_out, cur), dst, 0)
            state = jax.lax.ppermute(x_out, axis, perm)
            return (state, out), None

        (_, out), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(M + n_stages - 1))
        out = qwen2.rms_norm(out, fnorm, cfg.rms_norm_eps)
        # only the last stage holds real outputs — psum broadcasts them
        # (every other stage contributes zeros), making the result
        # invariant over the pipe axis as the out_spec requires
        out = jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)),
            axis)
        return out

    layer_specs = _stage_specs(params["layers"], n_layers, axis)
    norm_specs = jax.tree.map(lambda _: P(), params["final_norm"])
    ad_specs = _adapter_specs(adapters, n_layers, axis)

    out = shard_map(
        fwd, mesh=mesh,
        in_specs=(layer_specs, norm_specs, ad_specs,
                  batch_spec, batch_spec),
        out_specs=batch_spec,
    )(params["layers"], params["final_norm"], adapters, emb_mb, pos_mb)
    return out.reshape(B, S, H)
