"""Attention primitives (XLA reference paths).

Two shapes of attention exist in this framework:

* **Varlen segment attention** for the vision tower: a flat [N, heads,
  head_dim] token stream where tokens may only attend within their own
  image/frame segment. The reference does this with flash-attn's
  ``cu_seqlens`` API (modeling_videollama3_encoder.py:309-312); the
  TPU-native formulation replaces cumulative lengths with **per-token
  segment ids** — an equality mask the Pallas kernel can evaluate
  blockwise (see ops/flash_attention.py for the fused kernel; this file
  holds the jnp reference used on CPU and in tests).

* **Causal GQA attention** for the decoder, with an optional KV cache
  region (see ops/decode_attention.py for the Pallas decode kernel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def segment_ids_from_lengths(lengths: np.ndarray, total: Optional[int] = None) -> np.ndarray:
    """Host-side: per-token segment ids from per-segment lengths.

    Tokens beyond ``sum(lengths)`` (padding up to ``total``) get id -1,
    which matches no real segment — padded queries attend to nothing and
    are masked out downstream.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = int(lengths.sum())
    ids = np.repeat(np.arange(len(lengths), dtype=np.int32), lengths)
    if total is not None and total > n:
        ids = np.concatenate([ids, np.full(total - n, -1, np.int32)])
    return ids


def segment_attention(
    q: jax.Array,            # [N, H, D]
    k: jax.Array,            # [N, H, D]
    v: jax.Array,            # [N, H, D]
    segment_ids: jax.Array,  # [N] int32, -1 = padding
    scale: Optional[float] = None,
) -> jax.Array:
    """Block-diagonal (within-segment) bidirectional attention."""
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    qf = q.astype(jnp.float32) * scale
    logits = jnp.einsum("qhd,khd->hqk", qf, k.astype(jnp.float32))
    same = (segment_ids[:, None] == segment_ids[None, :]) & (segment_ids[:, None] >= 0)
    logits = jnp.where(same[None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def causal_gqa_attention(
    q: jax.Array,               # [B, S, Hq, D]
    k: jax.Array,               # [B, T, Hkv, D]
    v: jax.Array,               # [B, T, Hkv, D]
    q_positions: jax.Array,     # [B, S] absolute positions of queries
    kv_valid: Optional[jax.Array] = None,   # [B, T] bool — which cache slots hold real tokens
    kv_positions: Optional[jax.Array] = None,  # [B, T] absolute positions of kv tokens
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal grouped-query attention over a (possibly padded) KV region.

    Causality is expressed with *absolute positions* rather than index
    offsets so the same code serves prefill (S == T, positions equal)
    and cached decode (S == 1, T == cache length). Padded KV slots are
    masked with ``kv_valid``.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    if kv_positions is None:
        kv_positions = q_positions

    qf = q.astype(jnp.float32).reshape(B, S, Hkv, groups, D) * scale
    logits = jnp.einsum("bshgd,bthd->bhgst", qf, k.astype(jnp.float32))

    mask = q_positions[:, :, None] >= kv_positions[:, None, :]  # [B, S, T]
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, :]
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgst,bthd->bshgd", probs, v.astype(jnp.float32))
    return out.reshape(B, S, Hq, D).astype(q.dtype)
