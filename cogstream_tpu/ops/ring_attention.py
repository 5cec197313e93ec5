"""Ring (context-parallel) causal attention over a mesh axis.

The reference handles long video context purely algorithmically (token
budgets + compression; no ring/context parallelism anywhere — SURVEY.md
§5 "long-context"), capping the LM at 32k tokens on one device. This op
removes that ceiling the TPU way: shard the SEQUENCE across a mesh
axis, keep every device's K/V shard resident, and rotate the shards
around the ICI ring with ``ppermute`` while folding each arrival into a
flash-style online-softmax carry (m, l, acc) — the same accumulation as
ops/attention.chunked_causal_gqa_attention, with "next chunk" replaced
by "neighbor's shard". Each fold is itself chunked (``kv_chunk``), so
live memory is O(S_local * kv_chunk) — never the S_local^2 score block
— and shards travel in their native dtype (bf16 K/V ride the ICI at
half the bytes of f32; the fold keeps bf16 GEMM inputs with f32
accumulation — see ops/attention.gemm_dtype). The local shard
folds first and the scan runs axis_size-1 rotations, so no transferred
shard is ever discarded.

Causality is the framework's absolute-position rule (q_pos >= kv_pos,
kv_pos >= 0), so the fold is order-independent and shard boundaries
need no special casing. Runs inside ``shard_map``; see
models/qwen2.qwen2_forward_sp for the full decoder integration.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mark_varying(x, axis_name: str):
    """Mark a constant as varying over a shard_map axis (newer
    shard_map tracks varying-manual-axes types; scan carries must match
    the per-device values they fold with). pcast is pvary's
    replacement. Shared by the ring fold here and the GPipe schedule
    (parallel/pipeline.py)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    if hasattr(jax.lax, "pvary"):
        return jax.lax.pvary(x, (axis_name,))
    return x


_mark_varying = mark_varying  # internal call sites predate the rename


def ring_causal_gqa_attention(
    q: jax.Array,               # [B, S_local, Hq, D] this device's shard
    k: jax.Array,               # [B, S_local, Hkv, D]
    v: jax.Array,               # [B, S_local, Hkv, D]
    q_positions: jax.Array,     # [B, S_local] absolute; -1 = padding
    kv_positions: jax.Array,    # [B, S_local]
    axis_name: str,
    axis_size: int,             # static ring length (mesh.shape[axis])
    scale: Optional[float] = None,
    kv_chunk: int = 1024,       # static inner fold chunk
) -> jax.Array:
    """Fold the local KV shard, then axis_size-1 ppermute rotations,
    each folded into the online-softmax carry. Returns
    [B, S_local, Hq, D]; fully-masked (padding) queries yield zeros."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(D) ** 0.5

    from .attention import gemm_dtype
    gd = gemm_dtype(q.dtype)
    qg = q.astype(gd).reshape(B, S, Hkv, G, D)

    # pad shards once so every fold splits evenly into kv_chunk pieces
    # (padding travels the ring too — a few percent of bytes, and pos
    # -1 masks it everywhere)
    C = min(kv_chunk, S)
    pad = (-S) % C
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kv_positions = jnp.pad(kv_positions, ((0, 0), (0, pad)),
                               constant_values=-1)
    n_chunks = (S + pad) // C

    q_valid = (q_positions >= 0)[:, :, None]

    def fold(m, l, acc, kb, vb, pb):
        kc = kb.reshape(B, n_chunks, C, Hkv, D)
        vc = vb.reshape(B, n_chunks, C, Hkv, D)
        pc = pb.reshape(B, n_chunks, C)

        def step(carry, xs):
            m, l, acc = carry
            kx, vx, px = xs                 # [B,C,Hkv,D], ", [B,C]
            s = jnp.einsum("bshgd,bchd->bhgsc", qg, kx.astype(gd),
                           preferred_element_type=jnp.float32) * scale
            mask = (q_positions[:, :, None] >= px[:, None, :]) \
                & (px[:, None, :] >= 0) & q_valid
            s = jnp.where(mask[:, None, None], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            safe_m = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
            p = jnp.exp(s - safe_m[..., None])
            p = jnp.where(mask[:, None, None], p, 0.0)
            alpha = jnp.exp(jnp.where(m <= NEG_INF / 2, NEG_INF,
                                      m - m_new))
            l = l * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhgsc,bchd->bhgsd", p.astype(gd), vx.astype(gd),
                preferred_element_type=jnp.float32)
            return (m_new, l, acc), None

        (m, l, acc), _ = jax.lax.scan(
            step, (m, l, acc),
            (kc.transpose(1, 0, 2, 3, 4), vc.transpose(1, 0, 2, 3, 4),
             pc.transpose(1, 0, 2)))
        return m, l, acc

    m0 = _mark_varying(jnp.full((B, Hkv, G, S), NEG_INF, jnp.float32),
                       axis_name)
    l0 = _mark_varying(jnp.zeros((B, Hkv, G, S), jnp.float32),
                       axis_name)
    a0 = _mark_varying(jnp.zeros((B, Hkv, G, S, D), jnp.float32),
                       axis_name)
    # local shard first, then axis_size-1 rotations
    m, l, acc = fold(m0, l0, a0, k, v, kv_positions)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def body(carry, _):
        m, l, acc, kb, vb, pb = carry
        kb = jax.lax.ppermute(kb, axis_name, perm)   # native dtype
        vb = jax.lax.ppermute(vb, axis_name, perm)
        pb = jax.lax.ppermute(pb, axis_name, perm)
        m, l, acc = fold(m, l, acc, kb, vb, pb)
        return (m, l, acc, kb, vb, pb), None

    if axis_size > 1:
        (m, l, acc, *_), _ = jax.lax.scan(
            body, (m, l, acc, k, v, kv_positions), None,
            length=axis_size - 1)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D).astype(
        q.dtype)
