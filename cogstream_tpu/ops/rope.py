"""Rotary position embeddings: 1D (decoder) and 2D (vision grids).

The decoder uses standard RoPE with theta=1e6 (config.json:26) in
half-split layout (rotate_half convention). The vision tower uses the
Qwen2-VL-style 2D rotary scheme: each patch gets (row, col) position
ids traversed in merge-block order, and the per-head rotation concatenates
row-frequencies and col-frequencies (modeling_videollama3_encoder.py:
154-183,405-434 describe the reference semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_frequencies(head_dim: int, theta: float) -> jax.Array:
    """inv_freq [head_dim//2]."""
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def rope_angles(positions: jax.Array, head_dim: int, theta: float) -> jax.Array:
    """[..., head_dim//2] rotation angles for integer positions."""
    inv = rope_frequencies(head_dim, theta)
    return positions.astype(jnp.float32)[..., None] * inv


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Apply half-split RoPE.

    x: [..., seq, heads, head_dim]; angles: [..., seq, head_dim//2]
    (broadcast over the heads axis).
    """
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos = jnp.concatenate([cos, cos], axis=-1)[..., :, None, :]
    sin = jnp.concatenate([sin, sin], axis=-1)[..., :, None, :]
    orig = x.dtype
    x = x.astype(jnp.float32)
    return ((x * cos) + (rotate_half(x) * sin)).astype(orig)


# ---------------------------------------------------------------------------
# 2D vision RoPE
# ---------------------------------------------------------------------------

def grid_position_ids(t: int, h: int, w: int, merge_size: int) -> np.ndarray:
    """(row, col) ids per patch in merge-block traversal order — the order
    the image processor serializes patches in (patchify layout). Host-side
    numpy: grids are static per bucket.

    Returns [t*h*w, 2] int32.
    """
    rows = np.arange(h, dtype=np.int32)[:, None].repeat(w, axis=1)
    cols = np.arange(w, dtype=np.int32)[None, :].repeat(h, axis=0)

    def blockify(a):
        a = a.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
        return a.transpose(0, 2, 1, 3).reshape(-1)

    per_frame = np.stack([blockify(rows), blockify(cols)], axis=-1)  # [h*w, 2]
    return np.tile(per_frame, (t, 1))


def vision_rope_angles(
    pos_ids: jax.Array,  # [N, 2] (row, col)
    head_dim: int,
    theta: float = 10000.0,
) -> jax.Array:
    """Per-patch rotation angles [N, head_dim//2]: the first half of the
    angle vector rotates by row position, the second half by column —
    matching the reference's flatten of stacked (h, w) frequency pairs."""
    quarter = head_dim // 4
    inv = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter))
    row_ang = pos_ids[:, 0].astype(jnp.float32)[:, None] * inv  # [N, d/4]
    col_ang = pos_ids[:, 1].astype(jnp.float32)[:, None] * inv  # [N, d/4]
    return jnp.concatenate([row_ang, col_ang], axis=-1)          # [N, d/2]


def rope_half_permutation(head_dim: int) -> jax.Array:
    """[head_dim, head_dim] fp32 matrix P with ``x @ P == rotate_half(x)``.

    One ±1 entry per column, so every output element is a single exact
    product — bit-identical to the slice/negate/concat form. Why a
    matmul: rotate_half's half-split slicing lands mid-lane on TPU
    (head_dim 72 pads to 128 lanes) and XLA lowers it to cross-lane
    rotate fusions that measured ~88 ms/forward across the 27-layer
    tower at 32x1024 tokens; as a tiny constant matmul the shuffle
    rides the MXU for ~1.5 ms total.
    """
    half = head_dim // 2
    perm = np.zeros((head_dim, head_dim), np.float32)
    for j in range(half):
        perm[j + half, j] = -1.0   # out[:half] = -x[half:]
        perm[j, j + half] = 1.0    # out[half:] =  x[:half]
    return jnp.asarray(perm)


def vision_rope_cos_sin(angles: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Precompute broadcastable (cos, sin) [N, 1, head_dim] ONCE per
    forward — angles are layer-independent; evaluating the
    transcendentals inside every layer wastes 54 passes."""
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos2 = jnp.concatenate([cos, cos], axis=-1)[:, None, :]
    sin2 = jnp.concatenate([sin, sin], axis=-1)[:, None, :]
    return cos2, sin2


def apply_vision_rope_cs(x: jax.Array, cos2: jax.Array, sin2: jax.Array,
                         perm: jax.Array) -> jax.Array:
    """x: [N, heads, head_dim]; cos2/sin2 from vision_rope_cos_sin;
    perm from rope_half_permutation. fp32 rotation like the reference;
    the permutation matmul is exact (single ±1 term per output)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    rot = jnp.einsum("nhd,de->nhe", xf, perm)
    return ((xf * cos2) + (rot * sin2)).astype(orig)


def apply_vision_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """x: [N, heads, head_dim]; angles: [N, head_dim//2].

    Matches apply_rotary_pos_emb_vision (ref :161-170): cos/sin are
    repeated twice along the last dim and combined with rotate_half.
    """
    cos2, sin2 = vision_rope_cos_sin(angles)
    return apply_vision_rope_cs(x, cos2, sin2,
                                rope_half_permutation(x.shape[-1]))
