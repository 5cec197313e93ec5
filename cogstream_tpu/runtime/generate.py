"""Prefill + autoregressive decode, fully under jit.

The reference leans on HF ``generate`` (cogreasoner_chat.py:802-807,
877-908) — a Python loop dispatching one CUDA kernel batch per token.
The TPU-native shape is one compiled program: prefill writes the prompt
into the position-tagged KV cache and the decode loop is a
``lax.while_loop`` whose carry is (cache, tokens, done) — zero host
sync until the whole generation finishes.

Prompt lengths are bucketed (static shapes); padded prompt slots carry
position -1 and are invisible to attention (models/qwen2.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Qwen2Config
from ..models import qwen2
from ..models.qwen2 import KVCache
from .sampling import apply_repetition_penalty, sample_token

PAD_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


def bucket_length(n: int, buckets=PAD_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"sequence length {n} exceeds largest bucket")


class GenerateResult(NamedTuple):
    tokens: jax.Array       # [B, max_new_tokens] int32 (eos-padded)
    num_tokens: jax.Array   # [B] int32 — tokens generated incl. eos
    cache: KVCache          # cache after prompt+generation


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_p",
                     "top_k", "repetition_penalty", "eos_id",
                     "lora_scale", "kv_window", "stop_ids", "logit_ids"),
    donate_argnums=(4,),   # cache: update in place, never copy the
                           # whole KV tensor (callers always rebind)
)
def generate_tokens(
    params,
    inputs_embeds: jax.Array,    # [B, S, H] prompt embeddings (padded)
    positions: jax.Array,        # [B, S] int32, -1 on padding
    last_index: jax.Array,       # [B] int32 index of final real prompt token
    cache: KVCache,
    key: jax.Array,
    cfg: Qwen2Config,
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    penalty_ids: Optional[jax.Array] = None,  # [B, S] ctx ids (-1 pad)
    vocab_mask: Optional[jax.Array] = None,
    adapters=None,
    lora_scale: float = 2.0,
    kv_allowed: Optional[jax.Array] = None,   # [B, max_len] per-turn visibility
    write_slots: Optional[jax.Array] = None,  # [B, S] pooled-mode prompt slots
    active: Optional[jax.Array] = None,       # [B] bool — rows with a real request
    cache_rows: Optional[jax.Array] = None,   # [B] cache row per input row
    kv_window: Optional[int] = None,          # static read window (pooled)
    stop_ids: Optional[tuple] = None,         # grammar-complete tokens
    logit_ids: Optional[tuple] = None,        # static sampling support
) -> GenerateResult:
    """One compiled prefill+decode. In pooled mode (``write_slots``)
    every batch row is an independent session at its own cache fill
    level: prompt K/V scatter to per-row slots, generated tokens extend
    each row contiguously after its prompt, and ``active=False`` rows
    (no request this round) are treated as immediately done.
    ``cache_rows`` addresses a subset of a larger pool cache (B input
    rows onto B_pool cache rows); the returned cache is the full pool.

    ``kv_window`` (pooled decode only) bounds the per-step cache READ
    to the first ``kv_window`` slots — every step otherwise streams the
    full [B, max_len] K/V through HBM even when rows are nearly empty.
    The caller guarantees all live slots (incl. this turn's prompt) sit
    below the window; generated tokens live in the side buffer during
    the loop, so they are always visible regardless of the window."""
    B = inputs_embeds.shape[0]
    max_len = cache.max_len

    # ``logit_ids``: a STATIC sampling support (constrained decoding,
    # e.g. the retrieval selector's ~20 allowed tokens). The lm_head is
    # sliced to those columns ONCE before the loop, so every decode
    # step computes a [B, K] GEMV instead of reading the full-vocab
    # head (545 MB/step at int8-7B). Sampling over the sliced logits
    # is exactly sampling over vocab_mask-ed full logits: softmax /
    # argmax restricted to the same support.
    if logit_ids is not None:
        if repetition_penalty != 1.0:
            raise ValueError("logit_ids + repetition_penalty unsupported")
        if vocab_mask is not None:
            raise ValueError("pass either logit_ids or vocab_mask")
        from ..ops.quant import slice_output_channels

        lid = jnp.asarray(logit_ids, jnp.int32)
        head = dict(params["lm_head"])
        head["kernel"] = slice_output_channels(head["kernel"], lid)
        if "bias" in head:
            head["bias"] = jnp.take(head["bias"], lid, axis=-1)
        lm_params = {"lm_head": head}
        lm_adapters = None
        if adapters:
            lm_adapters = []
            for t, g in adapters:
                if isinstance(t, dict) and t.get("lm_head") is not None:
                    t = {"lm_head": {
                        "a": t["lm_head"]["a"],
                        "b": jnp.take(t["lm_head"]["b"], lid, axis=-1)}}
                lm_adapters.append((t, g))

        def _logits(h):
            return qwen2.lm_logits(lm_params, h, lm_adapters, lora_scale)

        def _to_vocab(idx):
            return lid[idx]
    else:
        def _logits(h):
            return qwen2.lm_logits(params, h, adapters, lora_scale)

        def _to_vocab(idx):
            return idx

    # solo windowed mode: the decode loop WRITES to its carried cache,
    # so slice the window up front (prompt + generation land inside it)
    # and write it back after the loop — one window-sized copy instead
    # of max_len-sized reads on every step
    full_cache = None
    if (write_slots is None and kv_window is not None
            and kv_window < max_len):
        full_cache = cache
        cache = KVCache(
            jax.lax.slice_in_dim(cache.k, 0, kv_window, axis=2),
            jax.lax.slice_in_dim(cache.v, 0, kv_window, axis=2),
            cache.pos[:, :kv_window], cache.write_index)
        if kv_allowed is not None:
            kv_allowed = kv_allowed[:, :kv_window]

    # ---- prefill -----------------------------------------------------------
    hidden, cache = qwen2.qwen2_forward(
        params, inputs_embeds, positions, cfg, cache=cache,
        adapters=adapters, lora_scale=lora_scale, kv_allowed=kv_allowed,
        write_slots=write_slots, cache_rows=cache_rows)
    last_h = jnp.take_along_axis(
        hidden, last_index[:, None, None].astype(jnp.int32), axis=1)  # [B,1,H]
    logits = _logits(last_h)[:, 0]
    key, sk = jax.random.split(key)
    # repetition penalty (HF generation_config parity): a [B, vocab]
    # presence mask of context + generated-so-far tokens, updated in
    # the decode carry. Skipped entirely (no [B, V] state) at 1.0.
    use_pen = repetition_penalty != 1.0
    V = logits.shape[-1]
    if use_pen:
        ids_src = (penalty_ids if penalty_ids is not None
                   else jnp.zeros((B, 0), jnp.int32))
        clip = jnp.where(ids_src >= 0, ids_src, V)   # pads drop
        seen0 = jnp.zeros((B, V), jnp.bool_).at[
            jnp.arange(B)[:, None], clip].set(True, mode="drop")
        logits = apply_repetition_penalty(logits, seen0,
                                          repetition_penalty)
    else:
        seen0 = jnp.zeros((B, 1), jnp.bool_)         # dummy carry leaf
    first_tok = _to_vocab(sample_token(logits, sk, temperature, top_p,
                                       vocab_mask, top_k=top_k))
    if use_pen:
        seen0 = seen0.at[jnp.arange(B), first_tok].set(True)
    first_pos = jnp.take_along_axis(positions, last_index[:, None], axis=1)[:, 0] + 1

    # ``stop_ids``: tokens that complete the output grammar (e.g. the
    # selector's closing ``]``). Unlike eos they are REAL output — the
    # row keeps the token, then pads with eos — but continuing to
    # decode past them would only burn sequential weight-bound steps.
    def _finished(t):
        d = t == eos_id
        for s in (stop_ids or ()):
            d = d | (t == s)
        return d

    tokens0 = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first_tok)
    done0 = _finished(first_tok)
    if active is not None:
        done0 = done0 | ~active
    pooled = write_slots is not None
    if pooled:
        # generated tokens extend each row right after its prompt; during
        # decode they accumulate in a small lockstep SIDE buffer (plain
        # slice writes — per-step scatters into the big pooled cache cost
        # ~2 ms/step) and merge back into the rows afterwards
        next_slot0 = jnp.max(
            jnp.where(positions >= 0, write_slots, -1), axis=1) + 1
        side0 = qwen2.KVCache(
            k=jnp.zeros((cache.k.shape[0], B, max_new_tokens)
                        + cache.k.shape[3:], cache.k.dtype),
            v=jnp.zeros((cache.v.shape[0], B, max_new_tokens)
                        + cache.v.shape[3:], cache.v.dtype),
            pos=jnp.full((B, max_new_tokens), -1, jnp.int32),
            write_index=jnp.zeros((), jnp.int32),
        )
    else:
        next_slot0 = jnp.zeros((B,), jnp.int32)  # unused
        side0 = None

    # bounded decode reads: slice the read-only main cache (and its
    # visibility mask) to the static window
    if pooled and kv_window is not None and kv_window < max_len:
        read_cache = KVCache(
            jax.lax.slice_in_dim(cache.k, 0, kv_window, axis=2),
            jax.lax.slice_in_dim(cache.v, 0, kv_window, axis=2),
            cache.pos[:, :kv_window], cache.write_index)
        kv_allowed_dec = (None if kv_allowed is None
                          else kv_allowed[:, :kv_window])
    else:
        read_cache = cache
        kv_allowed_dec = kv_allowed

    class Carry(NamedTuple):
        i: jax.Array
        cache: KVCache       # pooled mode: the (small) side buffer
        tokens: jax.Array
        cur: jax.Array       # [B] token to feed next
        pos: jax.Array       # [B] its position
        done: jax.Array      # [B]
        key: jax.Array
        seen: jax.Array      # [B, V] ctx presence (dummy [B,1] if off)

    def cond(c: Carry):
        return (c.i < max_new_tokens) & (~jnp.all(c.done))

    def body(c: Carry):
        emb = qwen2.embed(params, c.cur[:, None])
        step_pos = jnp.where(c.done, -1, c.pos)[:, None]
        if pooled:
            hidden, cache2 = qwen2.qwen2_forward(
                params, emb, step_pos, cfg,
                cache=read_cache,  # main: read-only, window-sliced
                adapters=adapters, lora_scale=lora_scale,
                kv_allowed=kv_allowed_dec, side_cache=c.cache,
                cache_rows=cache_rows)
        else:
            hidden, cache2 = qwen2.qwen2_forward(
                params, emb, step_pos, cfg, cache=c.cache,
                adapters=adapters, lora_scale=lora_scale,
                kv_allowed=kv_allowed)
        logits = _logits(hidden)[:, 0]
        key, sk = jax.random.split(c.key)
        if use_pen:
            logits = apply_repetition_penalty(logits, c.seen,
                                              repetition_penalty)
        nxt = _to_vocab(sample_token(logits, sk, temperature, top_p,
                                     vocab_mask, top_k=top_k))
        nxt = jnp.where(c.done, eos_id, nxt)
        seen = (c.seen.at[jnp.arange(B), nxt].set(True)
                if use_pen else c.seen)
        tokens = jax.lax.dynamic_update_slice(
            c.tokens, nxt[:, None], (0, c.i))
        done = c.done | _finished(nxt)
        return Carry(c.i + 1, cache2, tokens, nxt, c.pos + 1, done, key,
                     seen)

    init = Carry(jnp.asarray(1, jnp.int32), side0 if pooled else cache,
                 tokens0, first_tok, first_pos.astype(jnp.int32),
                 done0, key, seen0)
    final = jax.lax.while_loop(cond, body, init)

    num = jnp.sum(
        jnp.cumsum((final.tokens == eos_id).astype(jnp.int32), axis=1) == 0,
        axis=1) + 1
    num = jnp.minimum(num, max_new_tokens)

    if pooled:
        # merge the side buffer into each row once: side slot i → main
        # slot next_slot0[b]+i where the side holds a real token
        side = final.cache
        tgt = next_slot0[:, None] + jnp.arange(max_new_tokens)[None]
        tgt = jnp.where(side.pos >= 0, tgt, max_len)       # drop pads
        rows = (cache_rows if cache_rows is not None
                else jnp.arange(B))[:, None]
        merged = qwen2.KVCache(
            k=cache.k.at[:, rows, tgt].set(side.k, mode="drop"),
            v=cache.v.at[:, rows, tgt].set(side.v, mode="drop"),
            pos=cache.pos.at[rows, tgt].set(side.pos, mode="drop"),
            write_index=cache.write_index,
        )
        return GenerateResult(final.tokens, num.astype(jnp.int32), merged)

    if full_cache is not None:   # write the solo window back
        fc = final.cache
        restored = KVCache(
            jax.lax.dynamic_update_slice(full_cache.k, fc.k,
                                         (0, 0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(full_cache.v, fc.v,
                                         (0, 0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(full_cache.pos, fc.pos, (0, 0)),
            fc.write_index)
        return GenerateResult(final.tokens, num.astype(jnp.int32),
                              restored)

    return GenerateResult(final.tokens, num.astype(jnp.int32), final.cache)


def decode_new_tokens(tokens, num_tokens, tokenizer, batch_index: int = 0,
                      skip_special_tokens: bool = True) -> str:
    """Host-side: trim at eos and decode."""
    import numpy as np

    t = np.asarray(tokens)[batch_index]
    n = int(np.asarray(num_tokens)[batch_index])
    ids = t[:n].tolist()
    if ids and ids[-1] == tokenizer.eos_token_id:
        ids = ids[:-1]
    return tokenizer.decode(ids, skip_special_tokens=skip_special_tokens)
