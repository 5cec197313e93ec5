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
  region. Decode stays on this XLA path by design: single-token decode
  is HBM-bound on cache reads, which XLA already streams at full
  bandwidth — a custom kernel has nothing left to win (STATUS.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def gemm_dtype(dtype) -> jnp.dtype:
    """GEMM *input* dtype for attention score/value matmuls.

    Half-precision inputs stay half: the MXU runs bf16xbf16 at full rate
    with f32 accumulation (requested via ``preferred_element_type``),
    which is the standard flash-attention numerics — upcasting Q/K/V to
    f32 first would push the GEMMs onto the multi-pass f32 path at a
    fraction of the rate, and prefill attention is GEMM-bound. Anything
    wider (f32 params on CPU in tests, f64) keeps full f32 math so the
    HF-parity suites see unchanged numerics.
    """
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)):
        return dtype
    return jnp.dtype(jnp.float32)


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
    chunk_threshold: int = 1 << 22,   # S*T above this → chunked path
) -> jax.Array:
    """Causal grouped-query attention over a (possibly padded) KV region.

    Causality is expressed with *absolute positions* rather than index
    offsets so the same code serves prefill (S == T, positions equal)
    and cached decode (S == 1, T == cache length). Padded KV slots are
    masked with ``kv_valid``.

    Long sequences dispatch to the chunked online-softmax path (below):
    the dense form materializes [B, Hkv, G, S, T] logits, which is
    30 TB at the 32k context the model supports (config.json:17) —
    shapes are static so the dispatch is a Python-level decision.
    """
    S, T = q.shape[1], k.shape[1]
    if S * T > chunk_threshold:
        return chunked_causal_gqa_attention(
            q, k, v, q_positions, kv_valid, kv_positions, scale)
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    if kv_positions is None:
        kv_positions = q_positions

    gd = gemm_dtype(q.dtype)
    qg = q.astype(gd).reshape(B, S, Hkv, groups, D)
    # scale applied to the f32 logits, not the half-precision inputs
    logits = jnp.einsum("bshgd,bthd->bhgst", qg, k.astype(gd),
                        preferred_element_type=jnp.float32) * scale

    mask = (q_positions[:, :, None] >= kv_positions[:, None, :]) \
        & (kv_positions[:, None, :] >= 0)       # pos -1 = invisible slot
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, :]
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows (padded queries) zero out instead of softmax's
    # uniform fallback — matches the chunked path's l=0 guard
    probs = probs * mask[:, None, None]
    out = jnp.einsum("bhgst,bthd->bshgd", probs.astype(gd), v.astype(gd),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, S, Hq, D).astype(q.dtype)


def chunked_causal_gqa_attention(
    q: jax.Array,               # [B, S, Hq, D]
    k: jax.Array,               # [B, T, Hkv, D]
    v: jax.Array,               # [B, T, Hkv, D]
    q_positions: jax.Array,     # [B, S]
    kv_valid: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    kv_chunk: int = 1024,
) -> jax.Array:
    """Flash-style online-softmax attention expressed in XLA: a
    ``lax.scan`` over KV chunks carrying (m, l, acc), O(S * kv_chunk)
    live memory instead of O(S * T). Scan-compatible (it lives inside
    the decoder's layer scan where a Pallas custom call would degrade
    16x — see models/vision_encoder.py) and MXU-friendly: every step is
    two [S, chunk] x [chunk, D] GEMM batches.
    """
    B, S, Hq, D = q.shape
    T = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    if kv_positions is None:
        kv_positions = q_positions
    if kv_valid is None:
        kv_valid = jnp.ones((B, T), jnp.bool_)

    pad = (-T) % kv_chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kv_positions = jnp.pad(kv_positions, ((0, 0), (0, pad)),
                               constant_values=-1)
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, pad)))
    n_chunks = (T + pad) // kv_chunk

    gd = gemm_dtype(q.dtype)
    qg = q.astype(gd).reshape(B, S, Hkv, G, D)
    kc = k.astype(gd).reshape(B, n_chunks, kv_chunk, Hkv, D)
    vc = v.astype(gd).reshape(B, n_chunks, kv_chunk, Hkv, D)
    pc = kv_positions.reshape(B, n_chunks, kv_chunk)
    uc = kv_valid.reshape(B, n_chunks, kv_chunk)

    def step(carry, xs):
        m, l, acc = carry                       # [B,Hkv,G,S], ", [B,Hkv,G,S,D]
        kb, vb, pb, ub = xs                     # [B,C,Hkv,D], ", [B,C], [B,C]
        s = jnp.einsum("bshgd,bchd->bhgsc", qg, kb,      # [B,Hkv,G,S,C]
                       preferred_element_type=jnp.float32) * scale
        mask = (q_positions[:, :, None] >= pb[:, None, :]) \
            & ub[:, None, :] & (pb[:, None, :] >= 0)     # [B,S,C]
        s = jnp.where(mask[:, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        safe_m = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(mask[:, None, None], p, 0.0)
        alpha = jnp.exp(jnp.where(m <= NEG_INF / 2, NEG_INF, m - m_new))
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgsc,bchd->bhgsd", p.astype(gd), vb,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((B, Hkv, G, S), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, S), jnp.float32)
    a0 = jnp.zeros((B, Hkv, G, S, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        step, (m0, l0, a0),
        (kc.transpose(1, 0, 2, 3, 4), vc.transpose(1, 0, 2, 3, 4),
         pc.transpose(1, 0, 2), uc.transpose(1, 0, 2)))
    out = acc / jnp.maximum(l, 1e-30)[..., None]        # [B,Hkv,G,S,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D).astype(q.dtype)
