"""PartitionSpecs for every parameter pytree — the GSPMD sharding plan.

The reference scales with NCCL DDP + DeepSpeed ZeRO-2 (SURVEY.md §2.3);
the TPU-native plan is a 2-axis ``Mesh(data, model)``: parameters carry
Megatron-style tensor-parallel specs on the ``model`` axis, the batch
rides ``data``, and XLA emits all collectives (all-gather / psum /
reduce-scatter) over ICI from these annotations — no hand-written comm.

Layout rules (per the scaling-book recipe):
* attention q/k/v kernels shard the *head* (output) dim; o_proj shards
  the input dim → one psum per attention block;
* MLP gate/up shard the hidden (output) dim; down shards the input dim
  → one psum per MLP;
* embed_tokens shards the vocab rows; lm_head shards the vocab cols
  (the final logits psum/all-gather is deferred to sampling which only
  needs argmax/top-k per shard);
* norms / biases on sharded dims follow their kernel; everything small
  is replicated;
* a dim is sharded only when divisible by the mesh axis — e.g. the 4 KV
  heads of Qwen2-7B stay replicated at TP=8 (Hkv < TP), exactly the
  Megatron fallback.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CogReasonerConfig, Qwen2Config, VisionEncoderConfig
from .mesh import DATA_AXIS, MODEL_AXIS


def _axis_if_divisible(dim: int, mesh: Mesh, axis: str = MODEL_AXIS):
    return axis if dim % mesh.shape[axis] == 0 else None


def _dense_spec(din: int, dout: int, mesh: Mesh, shard: str,
                has_bias: bool) -> Dict[str, P]:
    """shard = 'out' (column-parallel) or 'in' (row-parallel) or 'none'."""
    if shard == "out":
        ax = _axis_if_divisible(dout, mesh)
        spec = {"kernel": P(None, ax)}
        if has_bias:
            spec["bias"] = P(ax)
    elif shard == "in":
        ax = _axis_if_divisible(din, mesh)
        spec = {"kernel": P(ax, None)}
        if has_bias:
            spec["bias"] = P(None)
    else:
        spec = {"kernel": P(None, None)}
        if has_bias:
            spec["bias"] = P(None)
    return spec


def _stack_specs(tree: Any) -> Any:
    """Prepend the stacked-layer [L] axis (unsharded) to every spec —
    decoder layer params are stacked for the lax.scan (models/qwen2)."""
    return jax.tree.map(lambda p: P(None, *p), tree,
                        is_leaf=lambda x: isinstance(x, P))


def qwen2_param_specs(cfg: Qwen2Config, mesh: Mesh) -> Dict:
    H = cfg.hidden_size
    kv_out = cfg.num_key_value_heads * cfg.head_dim
    I = cfg.intermediate_size
    V = cfg.vocab_size
    layer = {
        "input_norm": {"scale": P(None)},
        "post_attn_norm": {"scale": P(None)},
        "attn": {
            "q_proj": _dense_spec(H, H, mesh, "out", True),
            "k_proj": _dense_spec(H, kv_out, mesh, "out", True),
            "v_proj": _dense_spec(H, kv_out, mesh, "out", True),
            "o_proj": _dense_spec(H, H, mesh, "in", False),
        },
        "mlp": {
            "gate_proj": _dense_spec(H, I, mesh, "out", False),
            "up_proj": _dense_spec(H, I, mesh, "out", False),
            "down_proj": _dense_spec(I, H, mesh, "in", False),
        },
    }
    return {
        "embed_tokens": P(_axis_if_divisible(V, mesh), None),
        "final_norm": {"scale": P(None)},
        "lm_head": _dense_spec(H, V, mesh, "out", False),
        "layers": _stack_specs(layer),
    }


def vision_param_specs(cfg: VisionEncoderConfig, mesh: Mesh) -> Dict:
    H = cfg.hidden_size
    I = cfg.intermediate_size
    ln = {"scale": P(None), "bias": P(None)}
    layer = {
        "ln1": dict(ln),
        "ln2": dict(ln),
        "attn": {
            "q": _dense_spec(H, H, mesh, "out", True),
            "k": _dense_spec(H, H, mesh, "out", True),
            "v": _dense_spec(H, H, mesh, "out", True),
            "o": _dense_spec(H, H, mesh, "in", True),
        },
        "mlp": {
            "fc1": _dense_spec(H, I, mesh, "out", True),
            "fc2": _dense_spec(I, H, mesh, "in", True),
        },
    }
    return {
        "patch_embed": _dense_spec(cfg.num_channels * cfg.patch_size ** 2,
                                   H, mesh, "none", True),
        "post_ln": dict(ln),
        # vision layers are a per-layer list (models/vision_encoder.py);
        # deep-copied per index — [layer]*N would alias ONE dict whose
        # mutation silently changes every layer's spec
        "layers": [{k: (dict(v) if isinstance(v, dict) else v)
                    for k, v in layer.items()}
                   for _ in range(cfg.num_hidden_layers)],
    }


def projector_param_specs(cfg: CogReasonerConfig, mesh: Mesh) -> Dict:
    # first linear column-parallel, second row-parallel
    specs = []
    vin, lh = cfg.vision.hidden_size, cfg.text.hidden_size
    specs.append(_dense_spec(vin, lh, mesh, "out", True))
    specs.append(_dense_spec(lh, lh, mesh, "in", True))
    return {"layers": specs}


def cogreasoner_param_specs(cfg: CogReasonerConfig, mesh: Mesh) -> Dict:
    return {
        "text": qwen2_param_specs(cfg.text, mesh),
        "vision": vision_param_specs(cfg.vision, mesh),
        "projector": projector_param_specs(cfg, mesh),
    }


def lora_specs_like(lora_tree: Any, param_specs: Any) -> Any:
    """Specs for a LoRA tree, derived from the dense tree it adapts:
    ``a`` [din, r] inherits the kernel's input-dim placement, ``b``
    [r, dout] its output-dim placement. Walks only the keys present in
    the (possibly partial) LoRA tree."""
    def walk(lnode, snode, stacked=False):
        if isinstance(lnode, dict):
            if set(lnode.keys()) == {"a", "b"}:
                k = snode["kernel"]
                # stacked decoder entries carry a leading [L] axis
                din_ax = k[-2] if len(k) >= 2 else None
                dout_ax = k[-1] if len(k) >= 1 else None
                lead = (None,) if stacked else ()
                return {"a": P(*lead, din_ax, None),
                        "b": P(*lead, None, dout_ax)}
            # decoder "layers" is a stacked dict; projector "layers" is a
            # plain per-entry list (2-layer MLP) — only the former gains
            # the leading [L] axis
            return {key: walk(v, snode[key],
                              stacked or (key == "layers"
                                          and isinstance(v, dict)))
                    for key, v in lnode.items()}
        if isinstance(lnode, list):
            return [walk(v, snode[i], False)
                    for i, v in enumerate(lnode)]
        return lnode
    return walk(lora_tree, param_specs)


def specs_to_shardings(specs: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs, is_leaf=lambda x: isinstance(x, P))


def adapt_specs_to_quantized(params: Any, specs: Any) -> Any:
    """Align a spec tree with a (possibly) quantized param tree: where a
    ``kernel`` leaf became a quantized dict (ops/quant.py), the kernel's
    P expands onto its components — ``q``/``q4`` keep the [.., din,
    dout] placement (packed rows shard like rows), scales replicate on
    the group axis and follow the kernel's output-dim placement."""
    def walk(pnode, snode):
        if isinstance(pnode, dict) and isinstance(snode, P):
            axes = tuple(snode)
            if len(axes) >= 2:
                *lead, din_ax, dout_ax = axes
            else:
                lead, din_ax, dout_ax = [], None, None
            if "q4" in pnode:
                out = {"q4": P(*lead, din_ax, dout_ax)}
                if "rscale" in pnode:   # rank-1 serving scheme
                    out["scale"] = P(*lead, dout_ax)
                    # replicated: packed rows pair (p, p+din/2), so a
                    # contiguous row shard of rscale would misalign —
                    # and it is only [din] f32
                    out["rscale"] = P(*lead, None)
                    out["code"] = P(*lead, None)    # [2] coefficients
                else:                   # group scheme
                    out["scale"] = P(*lead, None, dout_ax)
                return out
            if "q" in pnode:
                return {"q": P(*lead, din_ax, dout_ax),
                        "scale": P(*lead, dout_ax)}
            return snode
        if isinstance(pnode, dict) and isinstance(snode, dict):
            missing = [k for k in pnode if k not in snode]
            if missing:
                # a None spec would surface as an opaque tree-structure
                # mismatch deep inside shard_params
                raise KeyError(
                    f"params keys {missing} have no PartitionSpec")
            return {k: walk(v, snode[k]) for k, v in pnode.items()}
        if isinstance(pnode, list) and isinstance(snode, list):
            return [walk(p, s) for p, s in zip(pnode, snode)]
        return snode
    return walk(params, specs)


def shard_params(params: Any, specs: Any, mesh: Mesh) -> Any:
    """Place a (host or single-device) pytree onto the mesh per specs."""
    shardings = specs_to_shardings(
        adapt_specs_to_quantized(params, specs), mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def ensure_cogreasoner_sharded(params: Any,
                               cfg: CogReasonerConfig,
                               mesh: Optional[Mesh]) -> Any:
    """Place a CogReasoner tree under its serving specs — idempotent.

    The one entry point every serving construct uses (engine, session,
    pool, server): a server shards once and hands the tree to the
    sessions/pools it creates, whose own calls then short-circuit
    instead of sweeping the full tree through device_put again. All
    placements go through shard_params (whole-tree consistent), so the
    first leaf's sharding decides.
    """
    if mesh is None:
        return params
    leaf = next(iter(jax.tree.leaves(params)), None)
    if (leaf is not None and hasattr(leaf, "sharding")
            and isinstance(getattr(leaf, "sharding", None), NamedSharding)
            and leaf.sharding.mesh == mesh):
        return params
    return shard_params(params, cogreasoner_param_specs(cfg, mesh), mesh)


def kv_cache_specs(cfg: Qwen2Config, mesh: Mesh):
    """KVCache sharding: batch on data; KV heads on model when divisible
    (they are not for Qwen2-7B at TP=8 → replicated, matching Megatron)."""
    from ..models.qwen2 import KVCache

    hkv_ax = _axis_if_divisible(cfg.num_key_value_heads, mesh)
    b_ax = DATA_AXIS
    return KVCache(
        k=P(None, b_ax, None, hkv_ax, None),
        v=P(None, b_ax, None, hkv_ax, None),
        pos=P(b_ax, None),
        write_index=P(),
    )


def place_kv_cache(cache, cfg: Qwen2Config, mesh: Mesh):
    """Place a KVCache onto the mesh under the serving plan. The batch
    dim must divide the data axis (solo sessions → use a data=1 mesh)."""
    b = cache.k.shape[1]
    specs = kv_cache_specs(cfg, mesh)
    if b % mesh.shape[DATA_AXIS] != 0:
        specs = jax.tree.map(
            lambda p: P(*(None if ax == DATA_AXIS else ax for ax in p)),
            specs, is_leaf=lambda x: isinstance(x, P))
    return jax.tree.map(jax.device_put, cache,
                        specs_to_shardings(specs, mesh))
