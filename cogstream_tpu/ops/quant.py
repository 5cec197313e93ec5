"""Int8 weight quantization — the TPU analogue of the reference's NF4
base quantization (bitsandbytes, second_stage_training.py:266-271,
SURVEY.md §2.2 N5).

Symmetric per-output-channel int8: ``q = round(w / scale)`` with
``scale = max|w| / 127`` per column. Dequantization happens on the fly
inside the matmul input cast — XLA fuses the int8→bf16 multiply into
the GEMM prologue, so quantized layers read 2x less HBM (the actual
bottleneck) at negligible MXU cost. The 8-bit optimizer (AdamW8bit,
ref :303) is unnecessary here: optimizer state shards across the mesh
with the params (ZeRO-3-like placement falls out of GSPMD specs).

Quantized kernels are dicts ``{"q": int8 [..., din, dout], "scale":
f32 [..., dout]}`` and ride the same pytrees (incl. the stacked [L]
decoder layout); ``models.qwen2.dense`` consumes either form.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


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


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "q" in p and "scale" in p


def quantize_tree(params: Any, predicate=None) -> Any:
    """Replace every dense ``kernel`` leaf with its int8 form.

    ``predicate(path_key)`` may veto individual kernels (e.g. keep
    norms / embeddings full precision — they are tiny anyway).
    """
    def walk(node, name=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "kernel" and (predicate is None or predicate(name)):
                    out[k] = quantize_int8(v)
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
