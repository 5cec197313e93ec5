"""Qwen2 decoder (GQA) — the CogReasoner language model, TPU-first.

Capability parity with the reference LM (Qwen2-7B: 28 layers, hidden
3584, 28 query / 4 KV heads, SwiGLU 18944, RMSNorm, RoPE theta=1e6 —
config.json:10-43, consumed via HF ``Qwen2ForCausalLM`` in
cogreasoner_chat.py:587-917).

TPU-native design deltas:

* **Position-tagged KV cache.** Cache slots store the *absolute
  position* of their token (-1 = empty/invalidated). Attention masks on
  ``q_pos >= kv_pos & kv_pos >= 0`` — so the same kernel serves prefill,
  decode, *cross-turn KV reuse* (history keeps its slots between turns;
  the reference re-prefills the whole conversation every turn, SURVEY.md
  §3.1 note) and *history retrieval* (dropping an unselected QA turn is
  one scatter of -1 into the position row, not a re-tokenization).
* **Branchless multi-adapter LoRA.** Both adapters (language_module /
  full_module, answer_generate.py:181-182) stay resident; a per-call
  gate vector selects the active one inside jit — no host-side
  ``set_adapter`` swap.
* Static shapes: prefill lengths are bucketed by callers; padding slots
  carry position -1 and never win attention.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen2Config
from ..ops.attention import causal_gqa_attention
from ..ops.rope import apply_rope, rope_angles

Params = Dict


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _dense_init(key, din, dout, dtype, bias: bool):
    scale = 1.0 / np.sqrt(din)
    p = {"kernel": jax.random.uniform(key, (din, dout), jnp.float32,
                                      -scale, scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def init_qwen2_params(key: jax.Array, cfg: Qwen2Config) -> Params:
    dtype = cfg.jnp_dtype
    n = cfg.num_hidden_layers
    keys = jax.random.split(key, n + 3)
    H, D = cfg.hidden_size, cfg.head_dim
    kv_out = cfg.num_key_value_heads * D
    params: Params = {
        "embed_tokens": (jax.random.normal(keys[0], (cfg.vocab_size, H))
                         * 0.02).astype(dtype),
        "final_norm": {"scale": jnp.ones((H,), jnp.float32)},
        "lm_head": _dense_init(keys[1], H, cfg.vocab_size, dtype, bias=False),
        "layers": [],
    }
    for i in range(n):
        ks = jax.random.split(keys[i + 2], 7)
        params["layers"].append({
            "input_norm": {"scale": jnp.ones((H,), jnp.float32)},
            "post_attn_norm": {"scale": jnp.ones((H,), jnp.float32)},
            "attn": {
                # Qwen2: q/k/v carry bias, o does not
                "q_proj": _dense_init(ks[0], H, H, dtype, bias=True),
                "k_proj": _dense_init(ks[1], H, kv_out, dtype, bias=True),
                "v_proj": _dense_init(ks[2], H, kv_out, dtype, bias=True),
                "o_proj": _dense_init(ks[3], H, H, dtype, bias=False),
            },
            "mlp": {
                "gate_proj": _dense_init(ks[4], H, cfg.intermediate_size, dtype, False),
                "up_proj": _dense_init(ks[5], H, cfg.intermediate_size, dtype, False),
                "down_proj": _dense_init(ks[6], cfg.intermediate_size, H, dtype, False),
            },
        })
    return params


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------

def dense(x: jax.Array, p: Dict, lora: Optional[List[Tuple[Dict, jax.Array]]] = None,
          lora_scale: float = 1.0) -> jax.Array:
    """Dense layer with optional gated LoRA deltas.

    ``lora`` is a list of (adapter_params, gate) pairs; each adapter is
    ``{"a": [din, r], "b": [r, dout]}``. Gates are traced scalars, so
    adapter switching costs two small matmuls, never a recompile.
    """
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    if lora:
        for adapter, gate in lora:
            if adapter is None:
                continue
            delta = (x @ adapter["a"].astype(x.dtype)) @ adapter["b"].astype(x.dtype)
            y = y + delta * (gate * lora_scale).astype(x.dtype)
    return y


def _layer_lora(adapters, layer_idx: int, path: str):
    """Collect (adapter, gate) pairs for one projection from the adapter
    bundle: ``adapters = [(tree, gate), ...]`` where tree mirrors params."""
    if not adapters:
        return None
    out = []
    for tree, gate in adapters:
        node = tree
        for part in ("layers", layer_idx, *path.split(".")):
            if node is None:
                break
            if isinstance(part, int):
                node = node[part] if part < len(node) else None
            else:
                node = node.get(part) if isinstance(node, dict) else None
        if node is not None:
            out.append((node, gate))
    return out or None


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    k: jax.Array          # [L, B, max_len, Hkv, D]
    v: jax.Array          # [L, B, max_len, Hkv, D]
    pos: jax.Array        # [B, max_len] int32; -1 = empty/invalidated slot
    write_index: jax.Array  # [] int32 — next free slot

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(cfg: Qwen2Config, batch: int, max_len: int,
                  dtype=None) -> KVCache:
    dtype = dtype or cfg.jnp_dtype
    L, Hkv, D = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    return KVCache(
        k=jnp.zeros((L, batch, max_len, Hkv, D), dtype),
        v=jnp.zeros((L, batch, max_len, Hkv, D), dtype),
        pos=jnp.full((batch, max_len), -1, jnp.int32),
        write_index=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, p: Dict, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * p["scale"]).astype(x.dtype)


def embed(params: Params, input_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed_tokens"], input_ids, axis=0)


def qwen2_forward(
    params: Params,
    inputs_embeds: jax.Array,      # [B, S, H]
    positions: jax.Array,          # [B, S] int32; -1 marks padding tokens
    cfg: Qwen2Config,
    cache: Optional[KVCache] = None,
    adapters: Optional[List[Tuple[Dict, jax.Array]]] = None,
    lora_scale: float = 2.0,
    remat: bool = False,
    kv_allowed: Optional[jax.Array] = None,   # [B, max_len] bool per-turn visibility
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack. Returns (hidden [B, S, H], updated cache).

    Without a cache: causal self-attention over the S new tokens only
    (training / one-shot scoring). With a cache: K/V of the new tokens
    are written at ``write_index`` and attention spans the whole cache
    buffer, masked by stored positions.

    ``remat=True`` rematerializes each decoder block on the backward
    pass (jax.checkpoint) — the TPU replacement for the reference's
    ``gradient_checkpointing_enable`` + DeepSpeed activation
    checkpointing (first_stage_training.py:495, default_config.yaml:6-9).
    """
    B, S, H = inputs_embeds.shape
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    x = inputs_embeds
    angles = rope_angles(jnp.maximum(positions, 0), D, cfg.rope_theta)  # [B,S,D/2]

    if remat and cache is None:
        def block(x, layer, layer_adapters):
            def lora_for(path):
                if not layer_adapters:
                    return None
                out = [(t, g) for t, g in layer_adapters[path] or []]
                return out or None

            h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
            ap = layer["attn"]
            q = dense(h, ap["q_proj"], lora_for("attn.q_proj"),
                      lora_scale).reshape(B, S, Hq, D)
            k = dense(h, ap["k_proj"], lora_for("attn.k_proj"),
                      lora_scale).reshape(B, S, Hkv, D)
            v = dense(h, ap["v_proj"], lora_for("attn.v_proj"),
                      lora_scale).reshape(B, S, Hkv, D)
            q = apply_rope(q, angles)
            k = apply_rope(k, angles)
            attn = causal_gqa_attention(
                q, k, v, q_positions=positions,
                kv_valid=positions >= 0, kv_positions=positions)
            x = x + dense(attn.reshape(B, S, Hq * D), ap["o_proj"],
                          lora_for("attn.o_proj"), lora_scale)
            h = rms_norm(x, layer["post_attn_norm"], cfg.rms_norm_eps)
            mp = layer["mlp"]
            gate = dense(h, mp["gate_proj"], lora_for("mlp.gate_proj"), lora_scale)
            up = dense(h, mp["up_proj"], lora_for("mlp.up_proj"), lora_scale)
            return x + dense(jax.nn.silu(gate) * up, mp["down_proj"],
                             lora_for("mlp.down_proj"), lora_scale)

        block = jax.checkpoint(block)
        paths = ("attn.q_proj", "attn.k_proj", "attn.v_proj", "attn.o_proj",
                 "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")
        for li, layer in enumerate(params["layers"]):
            layer_adapters = {p: _layer_lora(adapters, li, p) for p in paths}
            x = block(x, layer, layer_adapters)
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, None

    new_k, new_v = [], []
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        ap = layer["attn"]
        q = dense(h, ap["q_proj"], _layer_lora(adapters, li, "attn.q_proj"),
                  lora_scale).reshape(B, S, Hq, D)
        k = dense(h, ap["k_proj"], _layer_lora(adapters, li, "attn.k_proj"),
                  lora_scale).reshape(B, S, Hkv, D)
        v = dense(h, ap["v_proj"], _layer_lora(adapters, li, "attn.v_proj"),
                  lora_scale).reshape(B, S, Hkv, D)
        q = apply_rope(q, angles)
        k = apply_rope(k, angles)

        if cache is not None:
            ck = jax.lax.dynamic_update_slice(
                cache.k[li], k.astype(cache.k.dtype),
                (0, cache.write_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache.v[li], v.astype(cache.v.dtype),
                (0, cache.write_index, 0, 0))
            new_k.append(ck)
            new_v.append(cv)
            kv_pos = jax.lax.dynamic_update_slice(
                cache.pos, positions, (0, cache.write_index))
            kv_valid = kv_pos >= 0
            if kv_allowed is not None:
                # per-turn history retrieval: unselected turns' slots are
                # invisible to THIS turn's queries but stay resident —
                # the next turn may reselect them (runtime/session.py)
                kv_valid = kv_valid & kv_allowed
            attn = causal_gqa_attention(
                q, ck.astype(q.dtype), cv.astype(q.dtype),
                q_positions=positions,
                kv_valid=kv_valid,
                kv_positions=kv_pos,
            )
        else:
            attn = causal_gqa_attention(
                q, k, v,
                q_positions=positions,
                kv_valid=positions >= 0,
                kv_positions=positions,
            )
        x = x + dense(attn.reshape(B, S, Hq * D), ap["o_proj"],
                      _layer_lora(adapters, li, "attn.o_proj"), lora_scale)

        h = rms_norm(x, layer["post_attn_norm"], cfg.rms_norm_eps)
        mp = layer["mlp"]
        gate = dense(h, mp["gate_proj"], _layer_lora(adapters, li, "mlp.gate_proj"), lora_scale)
        up = dense(h, mp["up_proj"], _layer_lora(adapters, li, "mlp.up_proj"), lora_scale)
        x = x + dense(jax.nn.silu(gate) * up, mp["down_proj"],
                      _layer_lora(adapters, li, "mlp.down_proj"), lora_scale)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

    new_cache = None
    if cache is not None:
        new_pos = jax.lax.dynamic_update_slice(
            cache.pos, positions, (0, cache.write_index))
        new_cache = KVCache(
            k=jnp.stack(new_k), v=jnp.stack(new_v),
            pos=new_pos, write_index=cache.write_index + S)
    return x, new_cache


def lm_logits(params: Params, hidden: jax.Array,
              adapters=None, lora_scale: float = 2.0) -> jax.Array:
    head = params["lm_head"]
    lora = None
    if adapters:
        lora = [(t.get("lm_head"), g) for t, g in adapters
                if isinstance(t, dict) and t.get("lm_head") is not None] or None
    return dense(hidden, head, lora, lora_scale)
