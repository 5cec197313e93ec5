"""Ring (context-parallel) causal attention over a mesh axis.

The reference handles long video context purely algorithmically (token
budgets + compression; no ring/context parallelism anywhere — SURVEY.md
§5 "long-context"), capping the LM at 32k tokens on one device. This op
removes that ceiling the TPU way: shard the SEQUENCE across a mesh
axis, keep every device's K/V shard resident, and rotate the shards
around the ICI ring with ``ppermute`` while folding each arrival into a
flash-style online-softmax carry (m, l, acc) — the same accumulation as
ops/attention.chunked_causal_gqa_attention, with "next chunk" replaced
by "neighbor's shard". No device ever materializes the full [S, S]
score matrix or the gathered K/V, so max context scales linearly with
the number of chips, and the P permute steps overlap compute with ICI
transfers.

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


def ring_causal_gqa_attention(
    q: jax.Array,               # [B, S_local, Hq, D] this device's shard
    k: jax.Array,               # [B, S_local, Hkv, D]
    v: jax.Array,               # [B, S_local, Hkv, D]
    q_positions: jax.Array,     # [B, S_local] absolute; -1 = padding
    kv_positions: jax.Array,    # [B, S_local]
    axis_name: str,
    axis_size: int,             # static ring length (mesh.shape[axis])
    scale: Optional[float] = None,
) -> jax.Array:
    """One ring pass: fold the local KV shard, then axis_size-1
    ppermute rotations, each folded into the online-softmax carry.
    Returns [B, S_local, Hq, D]; fully-masked (padding) queries yield
    zeros."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(D) ** 0.5

    qf = q.astype(jnp.float32).reshape(B, S, Hkv, G, D) * scale

    def fold(m, l, acc, kb, vb, pb):
        s = jnp.einsum("bshgd,bchd->bhgsc", qf, kb)      # [B,Hkv,G,S,C]
        mask = (q_positions[:, :, None] >= pb[:, None, :]) \
            & (pb[:, None, :] >= 0) \
            & (q_positions[:, :, None] >= 0)
        s = jnp.where(mask[:, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        safe_m = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(mask[:, None, None], p, 0.0)
        alpha = jnp.exp(jnp.where(m <= NEG_INF / 2, NEG_INF, m - m_new))
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgsc,bchd->bhgsd", p, vb)
        return m_new, l, acc

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def body(carry, _):
        m, l, acc, kb, vb, pb = carry
        m, l, acc = fold(m, l, acc, kb, vb, pb)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        pb = jax.lax.ppermute(pb, axis_name, perm)
        return (m, l, acc, kb, vb, pb), None

    m0 = jnp.full((B, Hkv, G, S), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, S), jnp.float32)
    a0 = jnp.zeros((B, Hkv, G, S, D), jnp.float32)
    if hasattr(jax.lax, "pvary"):
        # newer shard_map tracks varying-manual-axes types: constants
        # must be marked as varying over the ring axis to join the carry
        m0, l0, a0 = (jax.lax.pvary(x, (axis_name,))
                      for x in (m0, l0, a0))
    kb = k.astype(jnp.float32)
    vb = v.astype(jnp.float32)
    (m, l, acc, *_), _ = jax.lax.scan(
        body, (m0, l0, a0, kb, vb, kv_positions), None, length=axis_size)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D).astype(
        q.dtype)
