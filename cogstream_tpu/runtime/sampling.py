"""Token sampling under jit: greedy, temperature, top-p, and static
vocab-mask constrained decoding.

The reference constrains the retrieval module with a LogitsProcessor
that -inf's everything outside {digits, brackets, comma, yes/no, eos}
(qaselect_module_predict.py:86-103). Here the allowed set is a static
boolean vocab mask baked into the jitted sample step — no host
round-trip per token.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def build_vocab_mask(vocab_size: int, allowed_ids) -> jnp.ndarray:
    """Boolean [vocab] mask, True = allowed."""
    mask = jnp.zeros((vocab_size,), jnp.bool_)
    return mask.at[jnp.asarray(list(allowed_ids), jnp.int32)].set(True)


def apply_repetition_penalty(
    logits: jax.Array,                  # [B, vocab]
    seen_mask: jax.Array,               # [B, vocab] bool — tokens in ctx
    penalty: float,
) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor semantics: logits of tokens
    already present in the context divide by the penalty when positive
    and multiply when negative (runs on RAW logits, before the
    temperature/top-k/top-p warpers — the reference's production decode
    uses penalty 1.05 from model/generation_config.json)."""
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, pen, logits)


def sample_token(
    logits: jax.Array,                  # [B, vocab] (last-position logits)
    key: jax.Array,
    temperature: float = 0.0,
    top_p: float = 1.0,
    vocab_mask: Optional[jax.Array] = None,   # [vocab] bool
    top_k: int = 0,
) -> jax.Array:
    """Sample next token ids [B]. temperature==0 → greedy. Warper
    order matches HF generate: temperature → top-k → top-p."""
    logits = logits.astype(jnp.float32)
    if vocab_mask is not None:
        logits = jnp.where(vocab_mask[None, :], logits, NEG_INF)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if 0 < top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits >= kth, logits, NEG_INF)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits >= cutoff, logits, NEG_INF)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
