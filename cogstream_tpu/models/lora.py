"""LoRA adapter trees.

The reference trains two PEFT LoRA adapters (r=8, alpha=16, dropout 0.1
on q/k/v/o/gate/up/down — first_stage_training.py:448-465; stage 2 also
adapts ``mm_projector.readout`` — second_stage_training.py:252-255) and
hot-swaps them per turn at inference (answer_generate.py:181-182).

Here an adapter is a pytree *mirroring* the dense param tree: every
adapted kernel ``[din, dout]`` gets ``{"a": [din, r], "b": [r, dout]}``;
per-layer entries are STACKED with a leading [L] axis so the adapter
rides the decoder's layer-scan (models/qwen2.qwen2_forward). Both
adapters stay resident on device and are gated by traced scalars inside
jit — switching adapters never recompiles and never round-trips to host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig, LoRAConfig, Qwen2Config


def init_qwen2_lora(
    key: jax.Array,
    cfg: Qwen2Config,
    lora: LoRAConfig,
    dtype=jnp.float32,
) -> Dict:
    """LoRA tree for the decoder. ``a`` is gaussian-init, ``b`` zeros
    (standard LoRA: delta starts at zero)."""
    H, D = cfg.hidden_size, cfg.head_dim
    kv_out = cfg.num_key_value_heads * D
    I = cfg.intermediate_size
    dims = {
        "attn.q_proj": (H, H),
        "attn.k_proj": (H, kv_out),
        "attn.v_proj": (H, kv_out),
        "attn.o_proj": (H, H),
        "mlp.gate_proj": (H, I),
        "mlp.up_proj": (H, I),
        "mlp.down_proj": (I, H),
    }
    wanted = set(lora.target_modules)
    L = cfg.num_hidden_layers
    layer: Dict = {"attn": {}, "mlp": {}}
    keys = jax.random.split(key, len(dims))
    for (path, (din, dout)), k in zip(sorted(dims.items()), keys):
        group, name = path.split(".")
        if name not in wanted:
            continue
        layer[group][name] = {
            # stacked [L, din, r]: per-layer independent gaussian init
            "a": (jax.random.normal(k, (L, din, lora.rank)) /
                  np.sqrt(din)).astype(dtype),
            "b": jnp.zeros((L, lora.rank, dout), dtype),
        }
    return {"layers": layer}


def init_projector_lora(key: jax.Array, cfg: CogReasonerConfig,
                        lora: LoRAConfig, dtype=jnp.float32) -> Dict:
    dims = [(cfg.vision.hidden_size, cfg.text.hidden_size),
            (cfg.text.hidden_size, cfg.text.hidden_size)]
    keys = jax.random.split(key, len(dims))
    layers = []
    for (din, dout), k in zip(dims, keys):
        layers.append({
            "a": (jax.random.normal(k, (din, lora.rank)) /
                  np.sqrt(din)).astype(dtype),
            "b": jnp.zeros((lora.rank, dout), dtype),
        })
    return {"layers": layers}


def init_cogreasoner_lora(key: jax.Array, cfg: CogReasonerConfig,
                          lora: LoRAConfig, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    tree = {"text": init_qwen2_lora(k1, cfg.text, lora, dtype)}
    if lora.include_projector:
        tree["projector"] = init_projector_lora(k2, cfg, lora, dtype)
    return tree


def num_lora_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


# ---------------------------------------------------------------------------
# PEFT interchange (load reference-trained adapters)
# ---------------------------------------------------------------------------

_PEFT_RE_HINT = (
    "base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight")


def qwen2_lora_from_peft_state_dict(sd: Dict, cfg: Qwen2Config,
                                    dtype=jnp.float32) -> Dict:
    """PEFT adapter_model state dict → our LoRA tree.

    PEFT stores ``lora_A.weight`` as [r, din] and ``lora_B.weight`` as
    [dout, r]; our layout is a=[din, r], b=[r, dout] — transpose once.
    """
    name_map = {
        "self_attn.q_proj": ("attn", "q_proj"),
        "self_attn.k_proj": ("attn", "k_proj"),
        "self_attn.v_proj": ("attn", "v_proj"),
        "self_attn.o_proj": ("attn", "o_proj"),
        "mlp.gate_proj": ("mlp", "gate_proj"),
        "mlp.up_proj": ("mlp", "up_proj"),
        "mlp.down_proj": ("mlp", "down_proj"),
    }

    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x)

    layers = [dict(attn={}, mlp={}) for _ in range(cfg.num_hidden_layers)]
    for name, tensor in sd.items():
        if ".lora_A." not in name and ".lora_B." not in name:
            continue
        parts = name.split(".layers.")
        if len(parts) != 2:
            continue
        rest = parts[1]
        idx, rest = rest.split(".", 1)
        li = int(idx)
        for hf_name, (group, ours) in name_map.items():
            if rest.startswith(hf_name):
                slot = layers[li][group].setdefault(ours, {})
                arr = _np(tensor)
                if ".lora_A." in name:
                    slot["a"] = arr.T.astype(np.float32)
                else:
                    slot["b"] = arr.T.astype(np.float32)
                break

    from .qwen2 import stack_layer_list

    stacked = stack_layer_list(layers)
    return {"layers": jax.tree.map(lambda x: jnp.asarray(x, dtype), stacked)}
