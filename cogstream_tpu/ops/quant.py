"""Int8 / int4 / NF4 weight quantization — the TPU analogue of the
reference's NF4 base quantization (bitsandbytes,
second_stage_training.py:266-271, SURVEY.md §2.2 N5).

Three schemes, all dequantized on the fly inside the matmul input cast
(XLA fuses the dequant into the GEMM prologue, so quantized layers
read 2-4x less HBM — the actual bottleneck — at negligible MXU cost):

- **int8**: symmetric per-output-channel, ``scale = max|w| / 127``.
  ``{"q": int8 [..., din, dout], "scale": f32 [..., dout]}``.
- **int4**: symmetric group-wise (group_size rows of din share a
  scale, default 64 like bitsandbytes' blocksize), two values packed
  per byte along din. ``{"q4": int8 [..., din/2, dout], "scale":
  f32 [..., din/G, dout]}``.
- **nf4**: the QLoRA 16-entry normal-quantile codebook with group-wise
  absmax — the reference's exact scheme. Same packed layout; the
  scheme rides the packed dtype (``uint8`` = NF4 codebook indices,
  ``int8`` = uniform two's-complement nibbles) so quantized trees stay
  plain array pytrees that scan/jit like the bf16 originals.

The 8-bit optimizer (AdamW8bit, ref :303) is unnecessary here:
optimizer state shards across the mesh with the params (ZeRO-3-like
placement falls out of GSPMD specs).

Quantized kernels ride the same pytrees (incl. the stacked [L] decoder
layout); ``models.qwen2.dense`` consumes every form.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

# QLoRA's NF4 codebook: the 16 quantiles of N(0,1) scaled to [-1, 1]
# (public constants from the QLoRA paper / bitsandbytes).
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534,
    0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0)


def quantize_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8 over the last axis."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.squeeze(-2)}


def dequantize_int8(qp: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (qp["q"].astype(jnp.float32)
            * qp["scale"][..., None, :]).astype(dtype)


def _group(w: jax.Array, group_size: int):
    *lead, din, dout = w.shape
    if din % group_size or din % 2:
        raise ValueError(
            f"din={din} must divide group_size={group_size} and 2")
    return w.reshape(*lead, din // group_size, group_size, dout)


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """[..., din, dout] 4-bit values → [..., din/2, dout] bytes (even
    row in the low nibble, odd row in the high nibble)."""
    lo = q[..., 0::2, :].astype(jnp.uint8) & 0xF
    hi = q[..., 1::2, :].astype(jnp.uint8) & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8)


def _unpack_nibbles(p: jax.Array) -> jax.Array:
    """Inverse of _pack_nibbles → unsigned 0..15 per nibble."""
    lo = p & 0xF
    hi = p >> 4
    *lead, half, dout = p.shape
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, half * 2, dout)


def quantize_int4(w: jax.Array, group_size: int = 64,
                  nf4: bool = True) -> Dict[str, jax.Array]:
    """Group-wise 4-bit quantization over the last-but-one (din) axis.

    ``nf4=True`` snaps each absmax-normalized weight to the nearest
    NF4 codebook entry (the reference's scheme); ``nf4=False`` is
    symmetric uniform int4 (q ∈ [-7, 7])."""
    wf = w.astype(jnp.float32)
    g = _group(wf, group_size)                      # [..., n, G, dout]
    absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    absmax = jnp.maximum(absmax, 1e-8)
    if nf4:
        code = jnp.asarray(NF4_CODE, jnp.float32)
        norm = g / absmax                           # [-1, 1]
        idx = jnp.argmin(
            jnp.abs(norm[..., None] - code), axis=-1).astype(jnp.uint8)
        # uint8 dtype tags the NF4 scheme (see dequantize_int4)
        return {"q4": _pack_nibbles(idx.reshape(*wf.shape)),
                "scale": absmax.squeeze(-2)}
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8)
    # two's-complement nibbles; int8 dtype tags the uniform scheme
    return {"q4": _pack_nibbles(q.reshape(*wf.shape)).astype(jnp.int8),
            "scale": scale.squeeze(-2)}


def dequantize_int4(qp: Dict[str, jax.Array],
                    dtype=jnp.bfloat16) -> jax.Array:
    """Unpack + rescale; the whole chain fuses into the consumer GEMM's
    prologue under jit (integer shifts + one gather/multiply). The
    packed dtype selects the scheme: uint8 = NF4 codebook indices,
    int8 = uniform two's-complement nibbles."""
    packed = qp["q4"]
    is_nf4 = packed.dtype == jnp.uint8
    nib = _unpack_nibbles(packed.astype(jnp.uint8))     # 0..15
    *lead, din, dout = nib.shape
    n_groups = qp["scale"].shape[-2]
    group_size = din // n_groups
    if is_nf4:
        code = jnp.asarray(NF4_CODE, jnp.float32)
        vals = code[nib.astype(jnp.int32)]              # NF4 lookup
    else:
        signed = nib.astype(jnp.int32)
        vals = jnp.where(signed >= 8, signed - 16,
                         signed).astype(jnp.float32)
    g = vals.reshape(*lead, n_groups, group_size, dout)
    w = g * qp["scale"][..., None, :]
    return w.reshape(*lead, din, dout).astype(dtype)


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and ("q" in p or "q4" in p) and "scale" in p


def dequantize(qp: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    """Dispatch on the stored scheme."""
    if "q4" in qp:
        return dequantize_int4(qp, dtype)
    return dequantize_int8(qp, dtype)


def quantize_tree(params: Any, predicate=None, bits: int = 8,
                  group_size: int = 64, nf4: bool = True) -> Any:
    """Replace every dense ``kernel`` leaf with its quantized form
    (``bits`` = 8 or 4; 4 with ``nf4=True`` is the reference's QLoRA
    base scheme).

    ``predicate(path_key)`` may veto individual kernels (e.g. keep
    norms / embeddings full precision — they are tiny anyway).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def quant(w):
        if bits == 8:
            return quantize_int8(w)
        try:
            return quantize_int4(w, group_size=group_size, nf4=nf4)
        except ValueError:
            # din not divisible by the group (e.g. the vision conv
            # patch-embed's 3*14*14=588): int8 for that kernel
            return quantize_int8(w)

    def walk(node, name=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "kernel" and (predicate is None or predicate(name)):
                    out[k] = quant(v)
                else:
                    out[k] = walk(v, k)
            return out
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node
    return walk(params)


def quantized_bytes(params: Any) -> int:
    """Device bytes of a (possibly partially) quantized tree."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
