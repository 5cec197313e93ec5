"""Qwen2 decoder (GQA) — the CogReasoner language model, TPU-first.

Capability parity with the reference LM (Qwen2-7B: 28 layers, hidden
3584, 28 query / 4 KV heads, SwiGLU 18944, RMSNorm, RoPE theta=1e6 —
config.json:10-43, consumed via HF ``Qwen2ForCausalLM`` in
cogreasoner_chat.py:587-917).

TPU-native design deltas:

* **Scan over stacked layers.** Per-layer parameters are stacked with a
  leading [L] axis and the stack runs under one ``lax.scan`` — the HLO
  contains ONE decoder block regardless of depth, so 28-layer compiles
  stay fast and the decode loop body stays small. (An unrolled Python
  loop of HF-style modules would emit 28 copies of the graph into both
  prefill and every decode step.)
* **Position-tagged KV cache.** Cache slots store the *absolute
  position* of their token (-1 = empty/invalidated). Attention masks on
  ``q_pos >= kv_pos & kv_pos >= 0`` — so the same kernel serves prefill,
  decode, *cross-turn KV reuse* (history keeps its slots between turns;
  the reference re-prefills the whole conversation every turn, SURVEY.md
  §3.1 note) and *history retrieval* (a per-turn ``kv_allowed``
  visibility mask, runtime/session.py).
* **Branchless multi-adapter LoRA.** Both adapters (language_module /
  full_module, answer_generate.py:181-182) stay resident as stacked
  trees; traced scalar gates select the active one inside jit — no
  host-side ``set_adapter`` swap, no recompile.
* Static shapes: prefill lengths are bucketed by callers; padding slots
  carry position -1 and never win attention.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

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


def stack_layer_list(layers: List[Dict]) -> Dict:
    """[per-layer tree] → one tree with leading [L] on every leaf.
    Preallocates on host to avoid a 2x copy of 7B-scale stacks."""
    L = len(layers)

    def stack(*leaves):
        first = np.asarray(leaves[0])
        out = np.empty((L,) + first.shape, first.dtype)
        for i, leaf in enumerate(leaves):
            out[i] = np.asarray(leaf)
        return jnp.asarray(out)

    return jax.tree.map(stack, *layers)


def init_qwen2_params(key: jax.Array, cfg: Qwen2Config) -> Params:
    dtype = cfg.jnp_dtype
    n = cfg.num_hidden_layers
    keys = jax.random.split(key, n + 3)
    H, D = cfg.hidden_size, cfg.head_dim
    kv_out = cfg.num_key_value_heads * D
    layers = []
    for i in range(n):
        ks = jax.random.split(keys[i + 2], 7)
        layers.append({
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
    return {
        "embed_tokens": (jax.random.normal(keys[0], (cfg.vocab_size, H))
                         * 0.02).astype(dtype),
        "final_norm": {"scale": jnp.ones((H,), jnp.float32)},
        "lm_head": _dense_init(keys[1], H, cfg.vocab_size, dtype, bias=False),
        "layers": stack_layer_list(layers),
    }


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------

def dense(x: jax.Array, p: Dict, lora: Optional[List[Tuple[Dict, jax.Array]]] = None,
          lora_scale: float = 1.0,
          lora_dropout: Optional[Tuple[float, jax.Array]] = None,
          w8a8: bool = False) -> jax.Array:
    """Dense layer with optional gated LoRA deltas.

    ``lora`` is a list of (adapter_params, gate) pairs; each adapter is
    ``{"a": [din, r], "b": [r, dout]}``. Gates are traced scalars, so
    adapter switching costs two small matmuls, never a recompile.

    ``lora_dropout`` = (rate, key) applies inverted dropout to the
    ADAPTER input only (PEFT lora_dropout semantics — the frozen dense
    path never drops; reference recipe r=8 α=16 dropout 0.1,
    first_stage_training.py:458-465). Training-only: callers omit it at
    inference.
    """
    kern = p["kernel"]
    if isinstance(kern, dict):  # quantized (ops/quant.py): dequant
        # fuses into the GEMM prologue — 2x (int8) or 4x (int4/nf4)
        # less weight HBM traffic
        from ..ops.quant import quantized_matmul

        y = quantized_matmul(x, kern, x.dtype, w8a8=w8a8)
    else:
        y = x @ kern.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    if lora:
        xa = x
        if lora_dropout is not None:
            rate, key = lora_dropout
            keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
            xa = jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
        for adapter, gate in lora:
            if adapter is None:
                continue
            delta = (xa @ adapter["a"].astype(x.dtype)) @ adapter["b"].astype(x.dtype)
            y = y + delta * (gate * lora_scale).astype(x.dtype)
    return y


_GEMV_SITES = (("attn", "q_proj"), ("attn", "k_proj"),
               ("attn", "v_proj"), ("attn", "o_proj"),
               ("mlp", "gate_proj"), ("mlp", "up_proj"),
               ("mlp", "down_proj"))


def _split_stacked_gemv(layers: Dict, m: int):
    """(xs_layers, heavy) for the decode scan. A pallas operand must be
    a materialized buffer, so feeding the int4 GEMV kernel from
    ``lax.scan``'s per-layer weight slice makes XLA copy each layer's
    packed bytes first — measured 327 GB/s effective vs 566 GB/s
    indexed on the 7B MLP stack (ops/quant_gemv._gemv_kernel_idx).
    Here every kernel the indexed route covers (stacked rank-1 UNIFORM
    int4, decode-sized m) is pulled OUT of the scanned xs into
    ``heavy``; the scan instead carries a layer index and the restored
    view (_restore_gemv) hands dense() the full stacked dict + index.
    Returns (layers, None) when nothing qualifies — zero-cost then."""
    from ..ops import quant
    from ..ops.quant_gemv import gemv_viable_stacked

    if not quant._gemv_route_ok():
        return layers, None
    heavy = {}
    for grp, name in _GEMV_SITES:
        kern = layers.get(grp, {}).get(name, {}).get("kernel")
        if isinstance(kern, dict) and gemv_viable_stacked(kern, m):
            heavy[(grp, name)] = kern
    if not heavy:
        return layers, None
    light = dict(layers)
    for (grp, name), _ in heavy.items():
        proj = {k: v for k, v in light[grp][name].items()
                if k != "kernel"}
        light[grp] = {**light[grp], name: proj}
    return light, heavy


def _restore_gemv(layer: Dict, heavy, idx) -> Dict:
    """Re-attach the pulled-out stacked kernels as indexed views
    (``{"layer": idx, ...stacked leaves...}`` — ops/quant.int4_matmul
    routes these to the indexed kernel)."""
    if heavy is None:
        return layer
    out = dict(layer)
    for (grp, name), kern in heavy.items():
        proj = {**out[grp][name], "kernel": {**kern, "layer": idx}}
        out[grp] = {**out[grp], name: proj}
    return out


def _adapter_layers(adapters) -> Tuple[Tuple[Any, ...], Tuple[Any, ...]]:
    """Split adapter bundle into (stacked layer-trees, gates)."""
    if not adapters:
        return (), ()
    trees, gates = [], []
    for tree, gate in adapters:
        node = tree.get("layers") if isinstance(tree, dict) else None
        trees.append(node)
        gates.append(gate)
    return tuple(trees), tuple(gates)


def _lora_at(ad_slices, gates, group: str, name: str):
    """Per-layer adapter slices for one projection → dense()'s lora arg."""
    out = []
    for tree, gate in zip(ad_slices, gates):
        if not isinstance(tree, dict):
            continue
        node = tree.get(group, {}).get(name) if isinstance(
            tree.get(group), dict) else None
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
    write_slots: Optional[jax.Array] = None,  # [B, S] per-row cache slots (pooled mode)
    side_cache: Optional[KVCache] = None,     # lockstep decode side buffer
    cache_rows: Optional[jax.Array] = None,   # [B] cache row per input row
    attn_override=None,   # cache-free attention impl: f(q, k, v, positions)
    dropout_rate: float = 0.0,                # LoRA dropout (train only)
    dropout_rng: Optional[jax.Array] = None,
    apply_final_norm: bool = True,   # False: pipeline stages (blocks only)
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack. Returns (hidden [B, S, H], updated cache).

    Without a cache: causal self-attention over the S new tokens only
    (training / one-shot scoring). With a cache: K/V of the new tokens
    are written at ``write_index`` and attention spans the whole cache
    buffer, masked by stored positions (AND ``kv_allowed`` if given).

    ``remat=True`` rematerializes each scanned block on the backward
    pass — the TPU replacement for gradient checkpointing + DeepSpeed
    activation checkpointing (first_stage_training.py:495,
    default_config.yaml:6-9).

    ``write_slots`` switches the cache write from the shared
    ``write_index`` slice to a per-row scatter — the pooled-serving
    mode where B independent sessions share one cache tensor, each row
    at its own fill level (runtime/pool.py). Slots >= max_len are
    dropped (the convention for masked/finished rows).

    ``side_cache`` is the pooled DECODE fast path: per-step scatters
    into the big pooled cache cost ~2 ms/step on v5e, so generated
    tokens instead append to this small lockstep buffer (shared
    write_index — every row decodes step i together) with plain
    dynamic-slice writes; attention reads main-cache ⊕ side; the caller
    merges side → main once per turn (runtime/generate.py). ``cache``
    is read-only in this mode and the updated SIDE cache is returned.

    ``cache_rows`` maps input rows onto cache rows (B_in <= B_pool) —
    the single-storage pool mode where a subset of sessions operate
    directly on the shared [B_pool] cache tensor without row copies.
    Requires ``write_slots`` (or ``side_cache``); reads gather the
    addressed rows, writes scatter back, and the FULL pool cache is
    returned. ``kv_allowed`` stays per-INPUT-row [B_in, max_len].
    """
    B, S, H = inputs_embeds.shape
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    # static trace-time switch: prefill-length programs run int8
    # kernels W8A8 (serving opt-in); decode/verify programs (small S)
    # keep the weight-only dequant form — unless w4a8_decode routes
    # them to the int8-activation int4 GEMV (uniform rank-1 kernels)
    w8 = (cfg.w8a8_prefill and S >= 16) or (cfg.w4a8_decode and S < 16)
    x = inputs_embeds
    angles = rope_angles(jnp.maximum(positions, 0), D, cfg.rope_theta)  # [B,S,D/2]

    ad_trees, gates = _adapter_layers(adapters)

    if cache is not None:
        pos_out = None
        kv_allowed_main = kv_allowed
        if side_cache is not None:
            side_pos = jax.lax.dynamic_update_slice(
                side_cache.pos, positions, (0, side_cache.write_index))
            main_pos = cache.pos if cache_rows is None \
                else cache.pos[cache_rows]
            kv_pos = jnp.concatenate([main_pos, side_pos], axis=1)
        elif write_slots is not None:
            rows = (cache_rows if cache_rows is not None
                    else jnp.arange(B))[:, None]
            pos_out = cache.pos.at[rows, write_slots].set(
                positions, mode="drop")
            kv_pos = pos_out if cache_rows is None \
                else pos_out[cache_rows]
        else:
            kv_pos = jax.lax.dynamic_update_slice(
                cache.pos, positions, (0, cache.write_index))
        if pos_out is None:
            pos_out = kv_pos
        kv_valid = kv_pos >= 0
        if kv_allowed is not None:
            # per-turn history retrieval: unselected turns' slots are
            # invisible to THIS turn's queries but stay resident —
            # the next turn may reselect them (runtime/session.py)
            if side_cache is not None:
                kv_allowed = jnp.concatenate(
                    [kv_allowed,
                     jnp.ones(side_pos.shape, jnp.bool_)], axis=1)
            kv_valid = kv_valid & kv_allowed

        # Pallas attention routing (ops/lm_attention; SURVEY N1 decoder
        # half). Static trace-time decisions; the XLA paths below stay
        # the reference/off-TPU/mesh implementation. Effective-position
        # arrays (all validity folded into one int32 compare) are built
        # ONCE here — they are layer-invariant, so nothing
        # position-related recomputes inside the scan.
        from ..ops import lm_attention as lma

        use_dec_kernel = use_pf_kernel = False
        if attn_override is None and lma.route_ok():
            if side_cache is not None:
                use_dec_kernel = lma.decode_viable(
                    B, S, cache.k.shape[2], side_cache.k.shape[2],
                    Hq, Hkv, D)
                if use_dec_kernel:
                    eff_main_rep = jnp.repeat(
                        lma.effective_kv_positions(main_pos,
                                                   kv_allowed_main),
                        Hkv, axis=1)
                    eff_side_rep = jnp.repeat(
                        lma.effective_kv_positions(side_cache.pos),
                        Hkv, axis=1)
            else:
                use_pf_kernel = lma.prefill_viable(
                    B, S, kv_pos.shape[1], Hq, Hkv, D)
                if use_pf_kernel:
                    eff_pf = jnp.where(kv_valid, kv_pos, lma.SENTINEL)

    def _site_drop(dkey, site: int):
        """(rate, per-site key) for dense()'s lora_dropout, or None."""
        if dkey is None:
            return None
        return (dropout_rate, jax.random.fold_in(dkey, site))

    def block(x, layer, ad, dkey=None):
        lora = functools.partial(_lora_at, ad, gates)
        dp = functools.partial(_site_drop, dkey)
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        ap = layer["attn"]
        q = dense(h, ap["q_proj"], lora("attn", "q_proj"),
                  lora_scale, dp(0), w8a8=w8).reshape(B, S, Hq, D)
        k = dense(h, ap["k_proj"], lora("attn", "k_proj"),
                  lora_scale, dp(1), w8a8=w8).reshape(B, S, Hkv, D)
        v = dense(h, ap["v_proj"], lora("attn", "v_proj"),
                  lora_scale, dp(2), w8a8=w8).reshape(B, S, Hkv, D)
        q = apply_rope(q, angles)
        k = apply_rope(k, angles)
        return x, h, q, k, v

    def finish_block(x, attn, layer, ad, dkey=None):
        lora = functools.partial(_lora_at, ad, gates)
        dp = functools.partial(_site_drop, dkey)
        ap, mp = layer["attn"], layer["mlp"]
        x = x + dense(attn.reshape(B, S, Hq * D), ap["o_proj"],
                      lora("attn", "o_proj"), lora_scale, dp(3),
                      w8a8=w8)
        h = rms_norm(x, layer["post_attn_norm"], cfg.rms_norm_eps)
        gate = dense(h, mp["gate_proj"], lora("mlp", "gate_proj"),
                     lora_scale, dp(4), w8a8=w8)
        up = dense(h, mp["up_proj"], lora("mlp", "up_proj"), lora_scale,
                   dp(5), w8a8=w8)
        return x + dense(jax.nn.silu(gate) * up, mp["down_proj"],
                         lora("mlp", "down_proj"), lora_scale, dp(6),
                         w8a8=w8)

    if cache is None:
        # LoRA dropout rides the training (cache-free) branch only:
        # per-layer keys are scanned alongside the stacked params
        train_drop = dropout_rng is not None and dropout_rate > 0.0
        if train_drop:
            n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
            layer_keys = jax.random.split(dropout_rng, n_layers)

        def body(x, xs):
            if train_drop:
                layer, ad, dkey = xs
            else:
                (layer, ad), dkey = xs, None
            x, h, q, k, v = block(x, layer, ad, dkey)
            if attn_override is not None:
                # e.g. the sequence-parallel ring (qwen2_forward_sp)
                attn = attn_override(q, k, v, positions)
            else:
                attn = causal_gqa_attention(
                    q, k, v, q_positions=positions,
                    kv_valid=positions >= 0, kv_positions=positions)
            return finish_block(x, attn, layer, ad, dkey), None

        if remat:
            body = jax.checkpoint(body)
        xs = ((params["layers"], ad_trees, layer_keys) if train_drop
              else (params["layers"], ad_trees))
        x, _ = jax.lax.scan(body, x, xs)
        # apply_final_norm=False runs the blocks only — the pipeline-
        # parallel path (parallel/pipeline.py) feeds each stage its
        # layer shard and applies the norm once after the last stage.
        if apply_final_norm:
            x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, None

    # decode/verify scans: pull indexed-GEMV kernels out of the xs so
    # the scan carries a layer index instead of slicing the packed
    # weights (see _split_stacked_gemv; no-op unless serving stacked
    # uniform int4 on one chip at decode-sized B*S)
    layers_xs, gemv_heavy = _split_stacked_gemv(params["layers"], B * S)
    layer_idx = jnp.arange(
        jax.tree.leaves(params["layers"])[0].shape[0], dtype=jnp.int32)

    if side_cache is not None:
        if use_dec_kernel:
            # splash kernel: the main cache and side buffer stay
            # STACKED operands selected by the scanned layer index (a
            # scan-sliced pallas operand would be copied first — the
            # quant_gemv lesson); the fresh K/V enter as their own
            # block, so the per-layer xs carry only the side write.
            def body(x, xs):
                layer, ad, sk, sv, li = xs
                layer = _restore_gemv(layer, gemv_heavy, li)
                x, h, q, k, v = block(x, layer, ad)
                attn = lma.decode_splash_attention(
                    q, k, v, cache.k, cache.v,
                    side_cache.k, side_cache.v, li, positions,
                    eff_main_rep, eff_side_rep, rows=cache_rows)
                sk = jax.lax.dynamic_update_slice(
                    sk, k.astype(sk.dtype),
                    (0, side_cache.write_index, 0, 0))
                sv = jax.lax.dynamic_update_slice(
                    sv, v.astype(sv.dtype),
                    (0, side_cache.write_index, 0, 0))
                return finish_block(x, attn, layer, ad), (sk, sv)

            x, (new_sk, new_sv) = jax.lax.scan(
                body, x, (layers_xs, ad_trees,
                          side_cache.k, side_cache.v, layer_idx))
            x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
            new_side = KVCache(k=new_sk, v=new_sv, pos=side_pos,
                               write_index=side_cache.write_index + S)
            return x, new_side

        def body(x, xs):
            layer, ad, ck, cv, sk, sv, li = xs
            layer = _restore_gemv(layer, gemv_heavy, li)
            x, h, q, k, v = block(x, layer, ad)
            sk = jax.lax.dynamic_update_slice(
                sk, k.astype(sk.dtype), (0, side_cache.write_index, 0, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, v.astype(sv.dtype), (0, side_cache.write_index, 0, 0))
            if cache_rows is not None:
                ck, cv = ck[cache_rows], cv[cache_rows]
            attn = causal_gqa_attention(
                q,
                jnp.concatenate([ck, sk], axis=1).astype(q.dtype),
                jnp.concatenate([cv, sv], axis=1).astype(q.dtype),
                q_positions=positions, kv_valid=kv_valid,
                kv_positions=kv_pos)
            return finish_block(x, attn, layer, ad), (sk, sv)

        x, (new_sk, new_sv) = jax.lax.scan(
            body, x, (layers_xs, ad_trees,
                      cache.k, cache.v, side_cache.k, side_cache.v,
                      layer_idx))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        new_side = KVCache(k=new_sk, v=new_sv, pos=side_pos,
                           write_index=side_cache.write_index + S)
        return x, new_side

    def body(x, xs):
        layer, ad, ck, cv, li = xs
        layer = _restore_gemv(layer, gemv_heavy, li)
        x, h, q, k, v = block(x, layer, ad)
        if write_slots is not None:
            rows = (cache_rows if cache_rows is not None
                    else jnp.arange(B))[:, None]
            ck = ck.at[rows, write_slots].set(k.astype(ck.dtype),
                                              mode="drop")
            cv = cv.at[rows, write_slots].set(v.astype(cv.dtype),
                                              mode="drop")
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, cache.write_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, cache.write_index, 0, 0))
        ck_r = ck if cache_rows is None else ck[cache_rows]
        cv_r = cv if cache_rows is None else cv[cache_rows]
        if use_pf_kernel:
            # flash kernel on the updated per-layer cache slice: the
            # operand copy that forces is ~2% of prefill attention
            # time at depth, and the online-softmax stats stay in
            # VMEM (the XLA chunked path round-trips them through HBM
            # every KV chunk — the 16k-prefill cliff, VERDICT r4 #1)
            attn = lma.prefill_flash_attention(
                q, ck_r, cv_r, positions, eff_pf)
        else:
            attn = causal_gqa_attention(
                q, ck_r.astype(q.dtype), cv_r.astype(q.dtype),
                q_positions=positions, kv_valid=kv_valid,
                kv_positions=kv_pos)
        return finish_block(x, attn, layer, ad), (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (layers_xs, ad_trees, cache.k, cache.v, layer_idx))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    new_cache = KVCache(k=new_k, v=new_v, pos=pos_out,
                        write_index=cache.write_index + S)
    return x, new_cache


def qwen2_forward_sp(
    params: Params,
    inputs_embeds: jax.Array,      # [B, S, H]; S divisible by axis size
    positions: jax.Array,          # [B, S]; -1 = padding
    cfg: Qwen2Config,
    mesh,
    axis: str = "model",
    adapters: Optional[List[Tuple[Dict, jax.Array]]] = None,
    lora_scale: float = 2.0,
    remat: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """SEQUENCE-PARALLEL decoder forward (cache-free): activations shard
    [B, S/P, H] along mesh axis ``axis`` and attention runs the ICI
    ring (ops/ring_attention) — no device materializes the full
    sequence, so trainable/scoreable context scales linearly with the
    axis size. The reference caps context at 32k on one device and has
    no sequence parallelism at all (SURVEY.md §5). MLP/norms are
    token-local, so only K/V shards travel (P-1 ppermute hops).

    Weights (and LoRA adapters) are replicated along ``axis``; combine
    with tensor parallelism on a second axis for weight sharding.
    Returns hidden states [B, S, H] (same contract as qwen2_forward
    without a cache)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.ring_attention import ring_causal_gqa_attention

    n = int(mesh.shape[axis])
    assert inputs_embeds.shape[1] % n == 0, \
        f"S={inputs_embeds.shape[1]} must divide the {axis}={n} axis"

    def fwd(p, ad, emb, pos):
        def ring(q, k, v, q_positions):
            return ring_causal_gqa_attention(
                q, k, v, q_positions, q_positions, axis, n)

        # LoRA dropout: the adapter input is sequence-sharded, so each
        # shard needs its own mask draw — fold in the ring position
        # (without it every shard would repeat the same pattern)
        dkey = None
        if dropout_rng is not None and dropout_rate > 0.0:
            dkey = jax.random.fold_in(dropout_rng,
                                      jax.lax.axis_index(axis))
        hidden, _ = qwen2_forward(
            p, emb, pos, cfg, adapters=ad, lora_scale=lora_scale,
            remat=remat, attn_override=ring,
            dropout_rate=dropout_rate, dropout_rng=dkey)
        return hidden

    return shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None),
    )(params, adapters, inputs_embeds, positions)


def lm_logits(params: Params, hidden: jax.Array,
              adapters=None, lora_scale: float = 2.0,
              w8a8: bool = False) -> jax.Array:
    """``w8a8`` mirrors dense(): decode loops pass cfg.w4a8_decode so a
    uniform-int4 lm_head's per-step full-vocab read (272 MB at 7B)
    rides the W4A8 GEMV too; sliced heads (logit_ids) and non-q4
    kernels are unaffected by it."""
    head = params["lm_head"]
    lora = None
    if adapters:
        lora = [(t.get("lm_head"), g) for t, g in adapters
                if isinstance(t, dict) and t.get("lm_head") is not None] or None
    return dense(hidden, head, lora, lora_scale, w8a8=w8a8)
