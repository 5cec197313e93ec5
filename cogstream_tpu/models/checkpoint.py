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


class _Lazy:
    """Deferred parameter leaf.

    ``fn()`` produces the host numpy array already in our layout
    (transposed / stacked / reshaped); ``dtype`` is the on-device target.
    A leaf is realized exactly once — either locally (``jnp.asarray``)
    or straight onto a ``NamedSharding`` via ``device_put``, which splits
    on host so no device ever allocates the unsharded array. The host
    copy is a local temporary freed as soon as the transfer returns.
    """

    __slots__ = ("fn", "dtype")

    def __init__(self, fn, dtype):
        self.fn, self.dtype = fn, dtype

    def realize(self, sharding=None):
        host = self.fn()
        if host.dtype != np.dtype(self.dtype):
            host = host.astype(self.dtype)
        if sharding is None:
            return jnp.asarray(host)
        return jax.device_put(host, sharding)


def _is_lazy(x) -> bool:
    return isinstance(x, _Lazy)


def _realize_tree(tree, shardings=None):
    """Realize a _Lazy tree leaf-by-leaf (streaming: one host leaf at a
    time). With ``shardings`` (same structure, NamedSharding leaves)
    every array lands directly in its mesh layout."""
    if shardings is None:
        return jax.tree.map(lambda l: l.realize(), tree, is_leaf=_is_lazy)
    return jax.tree.map(lambda l, s: l.realize(s), tree, shardings,
                        is_leaf=_is_lazy)


def _one(sd, name: str, dtype, transpose: bool = False) -> _Lazy:
    if transpose:
        return _Lazy(lambda: _t(sd[name]).T, dtype)
    return _Lazy(lambda: _t(sd[name]), dtype)


def _lazy_lin(sd, base: str, bias: bool, dtype) -> Dict:
    p = {"kernel": _one(sd, base + ".weight", dtype, transpose=True)}
    if bias:
        p["bias"] = _one(sd, base + ".bias", dtype)
    return p


def _lazy_ln(sd, base: str, dtype=jnp.float32) -> Dict:
    return {"scale": _one(sd, base + ".weight", dtype),
            "bias": _one(sd, base + ".bias", dtype)}


def qwen2_params_from_state_dict(sd: Dict, cfg, prefix: str = "model.",
                                 dtype=None, lazy: bool = False) -> Dict:
    """HF Qwen2 state dict → our decoder pytree.

    ``sd`` maps names like ``model.layers.0.self_attn.q_proj.weight``
    (the reference checkpoint layout) to tensors; any Mapping works,
    including the on-demand safetensors view used by
    ``load_cogreasoner_from_hf``, so a tensor is only read when its leaf
    is realized. With ``lazy=True`` the returned tree holds _Lazy
    thunks; each stacked [L, ...] decoder leaf reads its L per-layer
    tensors straight into one preallocated stack (no 2x copy).
    """
    dtype = dtype or cfg.jnp_dtype
    L = cfg.num_hidden_layers

    def stacked(suffix: str, dt, transpose: bool = False) -> _Lazy:
        def read():
            first = _t(sd[f"{prefix}layers.0.{suffix}"])
            if transpose:
                first = first.T
            out = np.empty((L,) + first.shape, first.dtype)
            out[0] = first
            for i in range(1, L):
                m = _t(sd[f"{prefix}layers.{i}.{suffix}"])
                out[i] = m.T if transpose else m
            return out
        return _Lazy(read, dt)

    def slin(base: str, bias: bool) -> Dict:
        p = {"kernel": stacked(base + ".weight", dtype, transpose=True)}
        if bias:
            p["bias"] = stacked(base + ".bias", dtype)
        return p

    params = {
        "embed_tokens": _one(sd, f"{prefix}embed_tokens.weight", dtype),
        "final_norm": {"scale": _one(sd, f"{prefix}norm.weight", jnp.float32)},
        "lm_head": {"kernel": _one(sd, "lm_head.weight", dtype,
                                   transpose=True)},
        # stacked [L, ...] leaves for the lax.scan (models/qwen2)
        "layers": {
            "input_norm": {"scale": stacked("input_layernorm.weight",
                                            jnp.float32)},
            "post_attn_norm": {"scale": stacked(
                "post_attention_layernorm.weight", jnp.float32)},
            "attn": {
                "q_proj": slin("self_attn.q_proj", True),
                "k_proj": slin("self_attn.k_proj", True),
                "v_proj": slin("self_attn.v_proj", True),
                "o_proj": slin("self_attn.o_proj", False),
            },
            "mlp": {
                "gate_proj": slin("mlp.gate_proj", False),
                "up_proj": slin("mlp.up_proj", False),
                "down_proj": slin("mlp.down_proj", False),
            },
        },
    }
    return params if lazy else _realize_tree(params)


def vision_params_from_state_dict(sd: Dict, cfg,
                                  prefix: str = "model.vision_encoder.",
                                  dtype=None, lazy: bool = False) -> Dict:
    """Reference vision tower state dict → our encoder pytree.

    The conv patch embedding [hidden, C, ps, ps] flattens to our
    ``[C*ps*ps, hidden]`` matmul kernel (same (c, ph, pw) row order the
    image processor serializes patches in).
    """
    dtype = dtype or cfg.jnp_dtype

    def conv_kernel():
        w = _t(sd[prefix + "embeddings.patch_embedding.weight"])
        return w.reshape(w.shape[0], -1).T

    params = {
        "patch_embed": {
            "kernel": _Lazy(conv_kernel, dtype),
            "bias": _one(sd, prefix + "embeddings.patch_embedding.bias",
                         dtype),
        },
        "post_ln": _lazy_ln(sd, prefix + "post_layernorm"),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layers.append({
            "ln1": _lazy_ln(sd, lp + "layer_norm1"),
            "ln2": _lazy_ln(sd, lp + "layer_norm2"),
            "attn": {
                "q": _lazy_lin(sd, lp + "self_attn.q_proj", True, dtype),
                "k": _lazy_lin(sd, lp + "self_attn.k_proj", True, dtype),
                "v": _lazy_lin(sd, lp + "self_attn.v_proj", True, dtype),
                "o": _lazy_lin(sd, lp + "self_attn.out_proj", True, dtype),
            },
            "mlp": {
                "fc1": _lazy_lin(sd, lp + "mlp.fc1", True, dtype),
                "fc2": _lazy_lin(sd, lp + "mlp.fc2", True, dtype),
            },
        })
    # vision keeps a per-layer list (see models/vision_encoder.py)
    params["layers"] = layers
    return params if lazy else _realize_tree(params)


def projector_params_from_state_dict(sd: Dict,
                                     prefix: str = "model.mm_projector.readout.",
                                     dtype=jnp.bfloat16,
                                     lazy: bool = False) -> Dict:
    layers = []
    idx = 0
    while f"{prefix}{idx}.weight" in sd:
        layers.append(_lazy_lin(sd, f"{prefix}{idx}", True, dtype))
        idx += 2  # GELU between linears has no params
    tree = {"layers": layers}
    return tree if lazy else _realize_tree(tree)


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


class _LazyStateDict:
    """name → tensor view over a safetensors checkpoint directory.

    Each ``__getitem__`` reads exactly one tensor from its (mmap'd)
    shard file, so nothing caches and peak host RAM during a load is a
    single stacked leaf — never the whole reference state dict (16 GB
    for the 7B, ``model.safetensors.index.json`` with 779 tensors).
    """

    def __init__(self, model_dir: str):
        self._dir = model_dir
        self._handles: Dict[str, object] = {}
        index_path = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(index_path):
            with open(index_path) as f:
                self._map = json.load(f)["weight_map"]
        else:
            shard = "model.safetensors"
            self._map = {name: shard for name in self._handle(shard).keys()}

    def _handle(self, shard: str):
        if shard not in self._handles:
            from safetensors import safe_open  # lazy import

            self._handles[shard] = safe_open(
                os.path.join(self._dir, shard), framework="np")
        return self._handles[shard]

    def __getitem__(self, name: str) -> np.ndarray:
        return self._handle(self._map[name]).get_tensor(name)

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def __iter__(self):
        return iter(self._map)

    def __len__(self) -> int:
        return len(self._map)


def _lazy_quant8(leaf: _Lazy) -> Dict:
    """Rewrite one kernel _Lazy into a lazy int8 quant dict.

    Quantization happens on HOST numpy (same math as
    ops/quant.quantize_int8: per-output-channel symmetric absmax), so
    the device only ever receives the packed int8 tensor + f32 scales —
    required for serving 7B on one 16 GB chip, where the bf16 kernel
    could never land first. The two output leaves share one cached
    computation; each array is popped (freed) as its leaf realizes.
    """
    state: Dict[str, np.ndarray] = {}

    def compute() -> Dict[str, np.ndarray]:
        if not state:
            w = leaf.fn().astype(np.float32)
            scale = np.maximum(
                np.abs(w).max(axis=-2, keepdims=True) / 127.0, 1e-8)
            state["q"] = np.clip(np.round(w / scale), -127,
                                 127).astype(np.int8)
            state["scale"] = np.squeeze(scale, -2).astype(np.float32)
        return state

    return {"q": _Lazy(lambda: compute().pop("q"), np.int8),
            "scale": _Lazy(lambda: compute().pop("scale"), np.float32)}


def _lazy_quant4u(leaf: _Lazy) -> Dict:
    """Rewrite one kernel _Lazy into a lazy rank-1 UNIFORM int4 quant
    dict — host-numpy mirror of ops/quant.quantize_int4_rank1(nf4=False)
    (same alternating-absmax fit, same split-halves packing, bit-equal
    output), so a 4-bit 7B loads for serving without a bf16 or offline
    conversion step. Uniform (not cubic) because it is the scheme the
    fused Pallas GEMV routes (ops/quant_gemv.py). Every decoder kernel
    has even din (hidden/intermediate sizes); an odd one errors loudly
    rather than silently degrading."""
    state: Dict[str, np.ndarray] = {}

    def compute() -> Dict[str, np.ndarray]:
        if not state:
            w = leaf.fn().astype(np.float32)
            *lead, din, dout = w.shape
            if din % 2:
                raise ValueError(
                    f"int4 load needs even din, got kernel {w.shape}; "
                    "use quantize_text_bits=8 for this checkpoint")
            aw = np.abs(w)
            r = np.maximum(aw.max(axis=-1, keepdims=True), 1e-8)
            c = None
            for _ in range(8):                      # iters parity
                c = np.maximum((aw / r).max(axis=-2, keepdims=True),
                               1e-8)
                r = np.maximum((aw / c).max(axis=-1, keepdims=True),
                               1e-8)
            q = np.clip(np.round(w / (r * c) * 7.0), -7,
                        7).astype(np.int8)
            lo = q[..., : din // 2, :].astype(np.uint8) & 0xF
            hi = q[..., din // 2:, :].astype(np.uint8) & 0xF
            state["q4"] = (lo | (hi << 4)).view(np.int8)
            state["scale"] = np.squeeze(c, -2).astype(np.float32)
            state["rscale"] = np.squeeze(r, -1).astype(np.float32)
            state["code"] = np.broadcast_to(
                np.float32(1.0 / 7.0),
                tuple(lead) + (1,)).copy()          # static uniform tag
        return state

    return {k: _Lazy((lambda kk: lambda: compute().pop(kk))(k), dt)
            for k, dt in (("q4", np.int8), ("scale", np.float32),
                          ("rscale", np.float32), ("code", np.float32))}


def _quantize_lazy_kernels(tree: Dict, bits: int) -> Dict:
    """Recursively replace every ``kernel`` _Lazy with a lazy quant
    dict — int8 per-channel or rank-1 uniform int4 (embeddings/norms/
    biases stay full precision — they are tiny)."""
    fn = _lazy_quant8 if bits == 8 else _lazy_quant4u
    out = {}
    for k, v in tree.items():
        if k == "kernel" and _is_lazy(v):
            out[k] = fn(v)
        elif isinstance(v, dict):
            out[k] = _quantize_lazy_kernels(v, bits)
        else:
            out[k] = v
    return out


def load_cogreasoner_from_hf(model_dir: str, cfg: CogReasonerConfig,
                             dtype=None, mesh=None,
                             quantize_text_bits: Optional[int] = None,
                             ) -> Dict:
    """Load the full CogReasoner pytree from a HF checkpoint directory.

    Streaming: the state dict is an on-demand safetensors view
    (_LazyStateDict) and the converters emit _Lazy thunks, so each leaf
    is read from disk, assembled on host, transferred, and freed before
    the next one — host RAM peaks at one stacked [L, ...] decoder leaf,
    not the full 16 GB checkpoint. With ``mesh`` every leaf is placed
    by ``device_put`` directly under its GSPMD NamedSharding
    (parallel/sharding.cogreasoner_param_specs): a 7B load lands in its
    tensor-parallel layout without any device ever allocating an
    unsharded leaf (SURVEY.md §7 "hard parts": 7B fits v5e-8 only
    sharded). Reference layout: model.safetensors(.index.json) with LM
    + ``model.vision_encoder.*`` + ``model.mm_projector.readout.*``.

    ``quantize_text_bits`` quantizes every DECODER kernel on host as
    it streams through, so neither host nor device ever holds a bf16
    decoder: 8 = per-channel symmetric int8 (exactly
    ops/quant.quantize_int8; 7B fits a single v5e), 4 = rank-1 UNIFORM
    int4 (exactly ops/quant.quantize_int4_rank1(nf4=False); half int8's
    weight HBM, and decode rides the fused Pallas GEMV incl. the
    optional W4A8 mode — config.w4a8_decode). Serve CLI
    ``--quantize-weights int8|int4``. The cubic-codebook 4-bit quality
    scheme stays an offline conversion (ops/quant.quantize_tree).
    """
    if quantize_text_bits not in (None, 4, 8):
        raise ValueError(
            "load-time quantization supports bits 4 or 8 "
            f"(got bits={quantize_text_bits})")
    sd = _LazyStateDict(model_dir)
    text = qwen2_params_from_state_dict(sd, cfg.text, dtype=dtype,
                                        lazy=True)
    if quantize_text_bits is not None:
        text = _quantize_lazy_kernels(text, quantize_text_bits)
    lazy = {
        "text": text,
        "vision": vision_params_from_state_dict(sd, cfg.vision, dtype=dtype,
                                                lazy=True),
        "projector": projector_params_from_state_dict(
            sd, dtype=dtype or cfg.text.jnp_dtype, lazy=True),
    }
    if mesh is None:
        return _realize_tree(lazy)
    from ..parallel.sharding import (adapt_specs_to_quantized,
                                     cogreasoner_param_specs,
                                     specs_to_shardings)

    specs = cogreasoner_param_specs(cfg, mesh)
    if quantize_text_bits is not None:
        specs = adapt_specs_to_quantized(lazy, specs)
    shardings = specs_to_shardings(specs, mesh)
    return _realize_tree(lazy, shardings)
