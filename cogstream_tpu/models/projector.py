"""Vision→LM projector (C5).

``mlp2x_gelu``: Linear(vision_hidden → lm_hidden) → GELU(exact) →
Linear(lm_hidden → lm_hidden), matching ``build_mlp`` semantics
(cogreasoner_chat.py:179-211; weights ``mm_projector.readout.{0,2}``).
"""

from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_projector_params(key, vision_hidden: int, lm_hidden: int,
                          projector_type: str = "mlp2x_gelu",
                          dtype=jnp.bfloat16) -> Dict:
    if projector_type == "linear":
        depth = 1
    else:
        m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
        if not m:
            raise ValueError(f"Unknown projector type: {projector_type}")
        depth = int(m.group(1))
    layers = []
    dims = [vision_hidden] + [lm_hidden] * depth
    keys = jax.random.split(key, depth)
    for i in range(depth):
        scale = 1.0 / np.sqrt(dims[i])
        layers.append({
            "kernel": jax.random.uniform(
                keys[i], (dims[i], dims[i + 1]), jnp.float32,
                -scale, scale).astype(dtype),
            "bias": jnp.zeros((dims[i + 1],), dtype),
        })
    return {"layers": layers}


def projector_forward(params: Dict, x: jax.Array) -> jax.Array:
    from ..ops.quant import materialize_kernel

    layers = params["layers"]
    for i, layer in enumerate(layers):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        w = materialize_kernel(layer["kernel"], x.dtype)
        x = x @ w + layer["bias"].astype(x.dtype)
    return x
