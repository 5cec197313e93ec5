"""Fused LayerNorm Pallas kernel for the vision tower.

The reference tower LayerNorms in fp32 (torch upcasts LN;
modeling_videollama3_encoder.py uses stock nn.LayerNorm). The jnp
transliteration (models/vision_encoder._layernorm) is numerically
right but lowers through f32 elementwise passes; this kernel is the
single-pass form — rows block into VMEM, mean/variance reduce in f32
on the VPU, normalize+affine apply in-register, one bf16 store. Same
math as the jnp path (two-pass centered variance like jnp.var), so
outputs agree to bf16 rounding and the golden parity tests vs the
reference tower hold unchanged.

Measured on v5e at 32x1024 tokens: the whole tower's 54 in-loop norms
cost ~14 ms via the jnp form and ~8 ms fused (identity-LN ablation:
337 ms floor, 344.5 ms fused, 350.6 ms jnp) — a ~2% encoder win. An
earlier code state measured the jnp form at ~83 ms; the token-major
packed rewrite changed what XLA fuses, shrinking the gap. Kept: the
win is real, tested, and the kernel is the template for future fused
elementwise passes.

Rows must divide the block; the vision encoder's packed path always
pads the token stream to the flash block multiple (>=128), and the
wrapper falls back to the jnp form for odd shapes (e.g. the final
post-LN after the pad is sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_ROWS = 512


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                  # [BN, H]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * scale_ref[...].astype(jnp.float32)
                  + bias_ref[...].astype(jnp.float32)
                  ).astype(o_ref.dtype)


def pallas_layernorm(
    x: jax.Array,            # [N, H]
    scale: jax.Array,        # [H]
    bias: jax.Array,         # [H]
    eps: float,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
) -> jax.Array:
    """Single-pass LayerNorm over the last axis. Falls back to the jnp
    form when the shape doesn't block cleanly (non-128-multiple lanes
    or too few rows)."""
    N, H = x.shape
    bn = min(block_rows, N)
    while bn > 0 and N % bn:
        bn //= 2
    if bn < 8 or H % 128:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return (y * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(x.dtype)

    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, H), lambda i: (i, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, H), bias.reshape(1, H))
