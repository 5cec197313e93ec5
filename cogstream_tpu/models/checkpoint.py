"""Checkpoint I/O: HF-safetensors ↔ pytree conversion and sharded load.

The reference ships one flat 16 GB safetensors checkpoint (779 tensors,
``model.safetensors.index.json``: LM + ``model.vision_encoder.*`` +
``model.mm_projector.readout.{0,2}``). This module maps that naming onto
our functional pytrees and places each tensor directly onto its mesh
shard (so a 7B load never materializes unsharded on one chip).

Orbax handles the framework's own native checkpoints
(train/checkpoint.py); this file is only the HF interchange path.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig


def _t(x) -> np.ndarray:
    """torch/numpy tensor → numpy (host)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu()
        if x.dtype.__str__() == "torch.bfloat16":
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


def _lin(w, b=None, dtype=jnp.bfloat16):
    p = {"kernel": jnp.asarray(_t(w).T, dtype)}
    if b is not None:
        p["bias"] = jnp.asarray(_t(b), dtype)
    return p


def _ln(w, b, dtype=jnp.float32):
    return {"scale": jnp.asarray(_t(w), dtype),
            "bias": jnp.asarray(_t(b), dtype)}


def qwen2_params_from_state_dict(sd: Dict, cfg, prefix: str = "model.",
                                 dtype=None) -> Dict:
    """HF Qwen2 state dict → our decoder pytree.

    ``sd`` maps names like ``model.layers.0.self_attn.q_proj.weight``
    (the reference checkpoint layout) to tensors.
    """
    dtype = dtype or cfg.jnp_dtype
    params = {
        "embed_tokens": jnp.asarray(_t(sd[f"{prefix}embed_tokens.weight"]), dtype),
        "final_norm": {"scale": jnp.asarray(_t(sd[f"{prefix}norm.weight"]), jnp.float32)},
        "lm_head": _lin(sd["lm_head.weight"], dtype=dtype),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}layers.{i}."
        layers.append({
            "input_norm": {"scale": jnp.asarray(
                _t(sd[lp + "input_layernorm.weight"]), jnp.float32)},
            "post_attn_norm": {"scale": jnp.asarray(
                _t(sd[lp + "post_attention_layernorm.weight"]), jnp.float32)},
            "attn": {
                "q_proj": _lin(sd[lp + "self_attn.q_proj.weight"],
                               sd[lp + "self_attn.q_proj.bias"], dtype),
                "k_proj": _lin(sd[lp + "self_attn.k_proj.weight"],
                               sd[lp + "self_attn.k_proj.bias"], dtype),
                "v_proj": _lin(sd[lp + "self_attn.v_proj.weight"],
                               sd[lp + "self_attn.v_proj.bias"], dtype),
                "o_proj": _lin(sd[lp + "self_attn.o_proj.weight"], dtype=dtype),
            },
            "mlp": {
                "gate_proj": _lin(sd[lp + "mlp.gate_proj.weight"], dtype=dtype),
                "up_proj": _lin(sd[lp + "mlp.up_proj.weight"], dtype=dtype),
                "down_proj": _lin(sd[lp + "mlp.down_proj.weight"], dtype=dtype),
            },
        })
    from .qwen2 import stack_layer_list

    params["layers"] = stack_layer_list(layers)  # [L, ...] for the scan
    return params


def vision_params_from_state_dict(sd: Dict, cfg,
                                  prefix: str = "model.vision_encoder.",
                                  dtype=None) -> Dict:
    """Reference vision tower state dict → our encoder pytree.

    The conv patch embedding [hidden, C, ps, ps] flattens to our
    ``[C*ps*ps, hidden]`` matmul kernel (same (c, ph, pw) row order the
    image processor serializes patches in).
    """
    dtype = dtype or cfg.jnp_dtype
    conv_w = _t(sd[prefix + "embeddings.patch_embedding.weight"])
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(conv_w.reshape(conv_w.shape[0], -1).T, dtype),
            "bias": jnp.asarray(_t(sd[prefix + "embeddings.patch_embedding.bias"]), dtype),
        },
        "post_ln": _ln(sd[prefix + "post_layernorm.weight"],
                       sd[prefix + "post_layernorm.bias"]),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layers.append({
            "ln1": _ln(sd[lp + "layer_norm1.weight"], sd[lp + "layer_norm1.bias"]),
            "ln2": _ln(sd[lp + "layer_norm2.weight"], sd[lp + "layer_norm2.bias"]),
            "attn": {
                "q": _lin(sd[lp + "self_attn.q_proj.weight"],
                          sd[lp + "self_attn.q_proj.bias"], dtype),
                "k": _lin(sd[lp + "self_attn.k_proj.weight"],
                          sd[lp + "self_attn.k_proj.bias"], dtype),
                "v": _lin(sd[lp + "self_attn.v_proj.weight"],
                          sd[lp + "self_attn.v_proj.bias"], dtype),
                "o": _lin(sd[lp + "self_attn.out_proj.weight"],
                          sd[lp + "self_attn.out_proj.bias"], dtype),
            },
            "mlp": {
                "fc1": _lin(sd[lp + "mlp.fc1.weight"], sd[lp + "mlp.fc1.bias"], dtype),
                "fc2": _lin(sd[lp + "mlp.fc2.weight"], sd[lp + "mlp.fc2.bias"], dtype),
            },
        })
    # vision keeps a per-layer list (see models/vision_encoder.py)
    params["layers"] = layers
    return params


def projector_params_from_state_dict(sd: Dict,
                                     prefix: str = "model.mm_projector.readout.",
                                     dtype=jnp.bfloat16) -> Dict:
    layers = []
    idx = 0
    while f"{prefix}{idx}.weight" in sd:
        layers.append(_lin(sd[f"{prefix}{idx}.weight"],
                           sd[f"{prefix}{idx}.bias"], dtype))
        idx += 2  # GELU between linears has no params
    return {"layers": layers}


def _unstack(tree) -> list:
    """Stacked [L, ...] layer tree → list of per-layer trees (host)."""
    L = jax.tree.leaves(tree)[0].shape[0]
    host = jax.tree.map(np.asarray, tree)
    return [jax.tree.map(lambda x: x[i], host) for i in range(L)]


def merge_lora(params: Dict, lora: Dict, lora_scale: float = 2.0) -> Dict:
    """Fold LoRA deltas into the base kernels: kernel' = kernel +
    a @ b * lora_scale — the PEFT ``merge_and_unload`` equivalent
    (gate 1.0 inference, models/qwen2.dense). Works on stacked [L]
    decoder trees and the projector's per-layer list alike; leaves
    without an adapter pass through untouched."""
    def fold(p, l):
        if isinstance(p, list):
            ls = l if isinstance(l, list) else [None] * len(p)
            return [fold(pi, li) for pi, li in zip(p, ls)]
        if not isinstance(p, dict):
            return p
        if ("kernel" in p and isinstance(l, dict)
                and "a" in l and "b" in l):
            a = jnp.asarray(l["a"]).astype(jnp.float32)
            b = jnp.asarray(l["b"]).astype(jnp.float32)
            delta = jnp.einsum("...ir,...ro->...io", a, b) * lora_scale
            kern = p["kernel"]
            if isinstance(kern, dict):
                # int8-quantized base (ops/quant.py): merging forces a
                # dequantize — the delta is dense; result is bf16
                w = (kern["q"].astype(jnp.float32)
                     * kern["scale"][..., None, :])
                return dict(p, kernel=(w + delta).astype(jnp.bfloat16))
            return dict(p, kernel=(
                kern.astype(jnp.float32) + delta).astype(kern.dtype))
        return {k: fold(v, l.get(k) if isinstance(l, dict) else None)
                for k, v in p.items()}

    return fold(params, lora or {})


def save_cogreasoner_to_hf(params: Dict, cfg: CogReasonerConfig,
                           out_dir: str, dtype=None) -> str:
    """Write the pytree back as a reference-layout HF checkpoint
    (model.safetensors + index + config.json) — the exact inverse of
    ``load_cogreasoner_from_hf``, so weights trained in this framework
    deploy straight into the torch/HF stack (the reference's
    ``save_pretrained`` parity, second_stage_training.py:182-202).
    int8-quantized kernels (ops/quant.py) dequantize on export."""
    from safetensors.numpy import save_file

    from ..config import save_hf_config

    dtype = dtype or cfg.text.jnp_dtype
    os.makedirs(out_dir, exist_ok=True)
    sd: Dict[str, np.ndarray] = {}

    def kern_host(kernel):
        if isinstance(kernel, dict):    # int8: dequantize
            return (np.asarray(kernel["q"], np.float32)
                    * np.asarray(kernel["scale"], np.float32)[None, :])
        return np.asarray(kernel)

    def W(name, lin, dt=None):
        sd[name] = np.asarray(jnp.asarray(
            kern_host(lin["kernel"]).T).astype(dt or dtype))
        if "bias" in lin:
            sd[name.replace(".weight", ".bias")] = np.asarray(
                jnp.asarray(lin["bias"]).astype(dt or dtype))

    def A(name, arr, dt=None):
        sd[name] = np.asarray(jnp.asarray(arr).astype(dt or dtype))

    text = params["text"]
    A("model.embed_tokens.weight", text["embed_tokens"])
    A("model.norm.weight", text["final_norm"]["scale"])
    W("lm_head.weight", text["lm_head"])
    for i, layer in enumerate(_unstack(text["layers"])):
        lp = f"model.layers.{i}."
        A(lp + "input_layernorm.weight", layer["input_norm"]["scale"])
        A(lp + "post_attention_layernorm.weight",
          layer["post_attn_norm"]["scale"])
        for pj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            W(lp + f"self_attn.{pj}.weight", layer["attn"][pj])
        for pj in ("gate_proj", "up_proj", "down_proj"):
            W(lp + f"mlp.{pj}.weight", layer["mlp"][pj])

    vis = params["vision"]
    vp = "model.vision_encoder."
    pe = vis["patch_embed"]
    ps, C = cfg.vision.patch_size, cfg.vision.num_channels
    sd[vp + "embeddings.patch_embedding.weight"] = np.asarray(
        jnp.asarray(kern_host(pe["kernel"]).T
                    .reshape(-1, C, ps, ps)).astype(dtype))
    sd[vp + "embeddings.patch_embedding.bias"] = np.asarray(
        jnp.asarray(pe["bias"]).astype(dtype))
    A(vp + "post_layernorm.weight", vis["post_ln"]["scale"])
    A(vp + "post_layernorm.bias", vis["post_ln"]["bias"])
    for i, layer in enumerate(vis["layers"]):
        lp = f"{vp}encoder.layers.{i}."
        for ln in ("1", "2"):
            A(lp + f"layer_norm{ln}.weight", layer[f"ln{ln}"]["scale"])
            A(lp + f"layer_norm{ln}.bias", layer[f"ln{ln}"]["bias"])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "out_proj")):
            W(lp + f"self_attn.{theirs}.weight", layer["attn"][ours])
        W(lp + "mlp.fc1.weight", layer["mlp"]["fc1"])
        W(lp + "mlp.fc2.weight", layer["mlp"]["fc2"])

    for j, lin in enumerate(params["projector"]["layers"]):
        W(f"model.mm_projector.readout.{2 * j}.weight", lin)

    shard = "model.safetensors"
    save_file(sd, os.path.join(out_dir, shard))
    total = sum(int(a.nbytes) for a in sd.values())
    from ..utils.io import atomic_write_json

    atomic_write_json(
        os.path.join(out_dir, "model.safetensors.index.json"),
        {"metadata": {"total_size": total},
         "weight_map": {name: shard for name in sd}})
    save_hf_config(cfg, os.path.join(out_dir, "config.json"))
    return out_dir


def load_cogreasoner_from_hf(model_dir: str, cfg: CogReasonerConfig,
                             dtype=None, mesh=None) -> Dict:
    """Load the full CogReasoner pytree from a HF checkpoint directory
    with safetensors shards (streaming shard by shard to bound host RAM).

    With ``mesh`` the assembled tree is placed leaf-by-leaf onto the
    GSPMD specs (parallel/sharding.py) — a 7B load lands directly in
    its tensor-parallel layout; no chip ever holds the unsharded 16 GB
    (SURVEY.md §7 "hard parts": 7B fits v5e-8 only sharded).
    """
    from safetensors import safe_open  # lazy: only needed on this path

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    sd: Dict[str, np.ndarray] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
        for shard in shards:
            with safe_open(os.path.join(model_dir, shard), framework="np") as fh:
                for name in fh.keys():
                    sd[name] = fh.get_tensor(name)
    else:
        with safe_open(os.path.join(model_dir, "model.safetensors"),
                       framework="np") as fh:
            for name in fh.keys():
                sd[name] = fh.get_tensor(name)

    params = {
        "text": qwen2_params_from_state_dict(sd, cfg.text, dtype=dtype),
        "vision": vision_params_from_state_dict(sd, cfg.vision, dtype=dtype),
        "projector": projector_params_from_state_dict(
            sd, dtype=dtype or cfg.text.jnp_dtype),
    }
    if mesh is not None:
        from ..parallel.sharding import cogreasoner_param_specs, shard_params

        params = shard_params(params,
                              cogreasoner_param_specs(cfg, mesh), mesh)
    return params
