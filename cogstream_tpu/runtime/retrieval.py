"""Historic Dialogue Retrieval (C8): constrained selector decoding.

Rebuild of ``qaselect_module_predict``
(`/root/reference/model/qaselect_module_predict.py:5-127`). The few-shot
prompt text is a model-facing interface and is kept verbatim; the
constrained decoding (digits/brackets/yes/no/eos only, ≤50 new tokens,
greedy) runs inside the jitted decode loop instead of a per-token host
LogitsProcessor, with the lm_head sliced to the static allowed-id set
(``logit_ids``) and an early stop at the grammar-closing ``]``.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen2Config
from ..models import qwen2
from ..models.qwen2 import KVCache, init_kv_cache
from ..processor.tokenizer import (constrained_selector_token_ids,
                                   selector_stop_token_ids)
from .generate import bucket_length, decode_new_tokens, generate_tokens

# Prompt text mirrors format_example (qaselect_module_predict.py:11-61) —
# it is the interface the stage-1-trained selector adapter expects.
SELECTOR_SYSTEM = """<|im_start|>system
You are a QA-pair filtering assistant. Your task is to identify which of the historical QA pairs are helpful for answering the current question and determine if the historical QA pairs alone are sufficient to answer it.

A QA pair is considered helpful if it provides:
- Relevant background information, context, or details
- Additional facts or insights that can be used to answer the current question
- Matching roles, scenarios, or domain knowledge that could support the answer

Output a single bracketed sequence:
- Start with 'yes' if the historical QA pairs are insufficient to fully answer the question (additional visual information may be needed).
- Start with 'no' if the current question can be fully answered using only the historical QA pairs (no additional visual information needed).
- Follow with the indices (starting from 0) of the helpful QA pairs, e.g., [yes,0,5] or [no,0,5].
- If no QA pairs are helpful, output [yes] or [no] based on the question's dependency.
- Do not add extra text or explanation — only output the bracketed sequence.
<|im_end|>"""

SELECTOR_DEMO = """\nExample:
Current Question: What causes earthquakes?
Historical QA Pairs:
0. Q: How to measure earthquakes? A: Using the Richter scale
1. Q: What is tectonic plate? A: Massive rock slabs beneath crust
2. Q: What is the weather like today? A: Sunny and warm
→ Output: [no,1]
------------------------------
Example:
Current Question: What does an earthquake look like?
Historical QA Pairs:
0. Q: How to measure earthquakes? A: Using the Richter scale
1. Q: What is tectonic plate? A: Massive rock slabs beneath crust
2. Q: What is the weather like today? A: Sunny and warm
→ Output: [yes]
------------------------------"""


def selector_prefix_text(include_demo: bool = True) -> str:
    """The turn-invariant head of the selector prompt (system rubric +
    few-shot demos + the ``Current Question:`` tag). Everything through
    this string is byte-identical across turns and sessions, so its KV
    can be prefilled once and reused (Selector prefix cache)."""
    demo = SELECTOR_DEMO if include_demo else ""
    return (f"{SELECTOR_SYSTEM}"
            f"<|im_start|>user\n{demo}"
            f"\nCurrent Question:")


def build_selector_prompt(
    current_question: str,
    hist_qs: List[str],
    hist_as: List[str],
    include_demo: bool = True,
) -> str:
    user = f""" {current_question}

Historical QA Pairs (ordered by time):"""
    for i, (q, a) in enumerate(zip(hist_qs, hist_as)):
        user += f"\n{i}. Q: {q}\n   A: {a}"
    user += ("\nGenerate a bracketed sequence (e.g., [yes,0,5] or [no,0,5]) "
             "indicating the dependency (yes or no) and the indices of "
             "helpful QA pairs. Only output the bracketed sequence.")
    return (f"{selector_prefix_text(include_demo)}{user}<|im_end|>"
            f"<|im_start|>assistant\n")


def window_selector_history(
    tokenizer,
    current_question: str,
    hist_qs: List[str],
    hist_as: List[str],
    max_prompt_tokens: int,
    include_demo: bool = True,
):
    """Trim history to the most recent turns whose serialized selector
    prompt fits ``max_prompt_tokens``. Returns (qs, as, offset): the
    windowed lists plus how many oldest turns were dropped — selection
    indices decoded against the window map back as ``i + offset``.

    The reference serializes ALL history every turn and would
    eventually exceed the model context on an unbounded stream
    (qaselect_module_predict.py:63-127 has no cap); sessions here run
    indefinitely (compaction/eviction), so the selector prompt must be
    bounded too. Recency is the right truncation: the selector's own
    training data orders pairs by time."""
    qs, as_ = list(hist_qs), list(hist_as)
    offset = 0
    while qs:
        prompt = build_selector_prompt(current_question, qs, as_,
                                       include_demo)
        if len(tokenizer.encode(prompt)) <= max_prompt_tokens:
            break
        drop = max(1, len(qs) // 8)
        qs, as_ = qs[drop:], as_[drop:]
        offset += drop
    return qs, as_, offset


def _remap_selection(selection: str, offset: int) -> str:
    """Shift windowed selection indices back to absolute turn ids."""
    if not offset:
        return selection
    from .history import parse_selection, selection_string

    if_visual, idx = parse_selection(selection)
    return selection_string(if_visual, [i + offset for i in idx])


# Decode-cap buckets: each distinct max_new_tokens compiles its own
# decode program (static arg), so the history-derived cap snaps up to
# one of these. 50 is the reference's constant ceiling
# (qaselect_module_predict.py:107-115).
CAP_BUCKETS = (12, 24, 36, 50)


def maximal_selection(history_len: int) -> str:
    """The longest grammatical selector output over ``history_len``
    history QAs: dependency marker plus EVERY index selected."""
    return "[yes" + "".join(f",{i}" for i in range(history_len)) + "]"


def selector_token_cap(history_len: int, tokenizer,
                       ceiling: int = 50, buckets=CAP_BUCKETS) -> int:
    """Worst-case decode length for a grammatical selection over
    ``history_len`` history QAs, bucketed.

    The constrained grammar output is ``[yes,i1,...,iK]`` with distinct
    indices drawn from 0..H-1, so the longest legitimate decode is the
    maximal selection (every index once) plus eos — measured EXACTLY by
    tokenizing it with the serving tokenizer (BPE emits 'yes' as one
    token, the byte fallback as three; a closed-form bound would be
    wrong for one of them). The reference always decodes up to a
    constant 50-token cap (qaselect_module_predict.py:107-115) — but
    with H history turns the selector can never legitimately need more
    than this bound, and the worst-case turn cost (an untrained
    selector that never emits ``]``) converges to the typical case for
    short histories. Parity: tests/test_selector_cap.py."""
    need = len(tokenizer.encode(maximal_selection(history_len))) + 1
    for b in buckets:
        if need <= b:
            return min(b, ceiling)
    return ceiling


def normalize_selection(text: str) -> str:
    """Bracket-normalize the raw decode (ref :120-127)."""
    text = text.strip()
    if text == "":
        return "[yes]"
    if not text.endswith("]"):
        text += "]"
    if not text.startswith("["):
        text = "[" + text
    return text


@functools.partial(jax.jit, static_argnames=("cfg", "lora_scale"))
def _prefix_kv_device(params, ids, cfg: Qwen2Config, adapters,
                      lora_scale: float) -> KVCache:
    """One-time prefill of the turn-invariant selector prompt head:
    returns an exact-length [L, 1, P, Hkv, D] KV cache of the prefix
    (positions 0..P-1). Compiled once per prefix length per process."""
    P = ids.shape[0]
    emb = qwen2.embed(params, ids)[None]
    positions = jnp.arange(P, dtype=jnp.int32)[None]
    cache = init_kv_cache(cfg, 1, P)
    _, cache = qwen2.qwen2_forward(
        params, emb, positions, cfg, cache=cache, adapters=adapters,
        lora_scale=lora_scale)
    return cache


@functools.partial(jax.jit, static_argnames=("total", "batch"))
def _splice_prefix_cache(pre: KVCache, total: int, batch: int) -> KVCache:
    """Build a fresh [batch, total]-slot turn cache whose first P slots
    hold the shared prefix KV (broadcast over rows) with write_index =
    P, so the suffix prefill continues right after it. One jitted
    dispatch — assembling with eager ``.at`` sets would cost 3 axon
    round trips (~5 ms each)."""
    L, _, P, Hkv, D = pre.k.shape
    k = jnp.zeros((L, batch, total, Hkv, D), pre.k.dtype)
    v = jnp.zeros((L, batch, total, Hkv, D), pre.v.dtype)
    k = k.at[:, :, :P].set(pre.k)
    v = v.at[:, :, :P].set(pre.v)
    pos = jnp.full((batch, total), -1, jnp.int32).at[:, :P].set(pre.pos)
    return KVCache(k, v, pos, jnp.asarray(P, jnp.int32))


class Selector:
    """Runs the constrained retrieval decode with the language adapter.

    The prompt's head (system rubric + few-shot demos + the
    ``Current Question:`` tag, ~40% of a typical selector prompt) is
    byte-identical every turn; its KV is prefilled ONCE
    (``_prefix_kv_device``) and spliced into each turn's cache, so the
    per-turn prefill covers only the question + history suffix — often
    a whole pad bucket smaller. Exactness is guaranteed by a per-call
    token check: the suffix path engages only when the full prompt's
    ids literally start with the cached prefix ids (BPE merges never
    cross the split in practice — the prefix ends at ``:`` and the
    suffix starts with a space-prefixed word — but a mismatch simply
    falls back to the full prefill). The reference re-prefills the
    whole selector prompt per turn (qaselect_module_predict.py:63-127).
    """

    def __init__(self, params, cfg: Qwen2Config, tokenizer,
                 adapters=None, lora_scale: float = 2.0,
                 max_new_tokens: int = 50, prefix_cache: bool = True):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.adapters = adapters
        self.lora_scale = lora_scale
        self.max_new_tokens = max_new_tokens
        # unbounded-stream guard: history serialized into the selector
        # prompt windows to the newest turns that fit (the largest pad
        # bucket minus decode headroom; window_selector_history)
        from .generate import PAD_BUCKETS

        self.max_prompt_tokens = PAD_BUCKETS[-1] - max_new_tokens
        # static sampling support: generate_tokens slices the lm_head
        # to these ~20 columns, so each selector decode step skips the
        # full-vocab logits read (545 MB at int8-7B) — same greedy
        # choice as the dense vocab_mask it replaces
        self.allowed_ids = tuple(constrained_selector_token_ids(tokenizer))
        # the selection is grammar-complete at ']' — stop there instead
        # of decoding filler up to the 50-token cap (each decode step
        # re-reads the full quantized weight set)
        self.stop_ids = tuple(selector_stop_token_ids(tokenizer))
        self.prefix_cache = prefix_cache
        self._cap_cache = {}     # history len -> bucketed decode cap
        self._prefix = {}        # include_demo -> (ids np, KVCache)
        self.prefix_hits = 0     # suffix-path engagements (observability)

    def _prefix_for(self, include_demo: bool):
        """Lazy shared prefix KV for this (params, adapters) pair."""
        if not self.prefix_cache:
            return None
        got = self._prefix.get(include_demo)
        if got is None:
            ids = np.asarray(self.tokenizer.encode(
                selector_prefix_text(include_demo)), np.int32)
            cache = _prefix_kv_device(
                self.params, jnp.asarray(ids), self.cfg, self.adapters,
                self.lora_scale)
            got = (ids, cache)
            self._prefix[include_demo] = got
        return got

    def _cap_for(self, history_lens) -> int:
        """History-derived decode cap (never above the configured
        ceiling): the largest windowed history in the batch bounds the
        longest grammatical selection any row can need."""
        h = max(history_lens) if history_lens else 0
        key = (h, self.max_new_tokens)   # ceiling is mutable (benches
        got = self._cap_cache.get(key)   # lower it mid-session)
        if got is None:
            got = selector_token_cap(h, self.tokenizer,
                                     self.max_new_tokens)
            self._cap_cache[key] = got
        return got

    def _prep_batch(self, ids_list, include_demo: bool, cap: int):
        """Pad/position a batch of full selector prompts, continuing
        from the shared prefix KV when every row's ids literally start
        with the cached prefix ids (else: full prefill, same result)."""
        B = len(ids_list)
        pre = self._prefix_for(include_demo)
        if pre is not None:
            pids, pcache = pre
            P = len(pids)
            if all(len(i) > P and np.array_equal(i[:P], pids)
                   for i in ids_list):
                sufs = [i[P:] for i in ids_list]
                S = bucket_length(max(len(s) for s in sufs))
                padded = np.zeros((B, S), np.int32)
                positions = np.full((B, S), -1, np.int32)
                last = np.zeros((B,), np.int32)
                for b, s in enumerate(sufs):
                    padded[b, :len(s)] = s
                    positions[b, :len(s)] = np.arange(P, P + len(s))
                    last[b] = len(s) - 1
                cache = _splice_prefix_cache(pcache, P + S + cap, B)
                self.prefix_hits += 1
                return padded, positions, last, cache
        S = bucket_length(max(len(i) for i in ids_list))
        padded = np.zeros((B, S), np.int32)
        positions = np.full((B, S), -1, np.int32)
        last = np.zeros((B,), np.int32)
        for b, ids in enumerate(ids_list):
            padded[b, :len(ids)] = ids
            positions[b, :len(ids)] = np.arange(len(ids))
            last[b] = len(ids) - 1
        cache = init_kv_cache(self.cfg, B, S + cap)
        return padded, positions, last, cache

    def select_batch(self, items, include_demo: bool = True,
                     key: Optional[jax.Array] = None) -> List[str]:
        """Batched constrained retrieval: ``items`` is a list of
        (current_question, hist_qs, hist_as); one prefill+decode covers
        all of them (used by the pooled serving path)."""
        windowed = [window_selector_history(
            self.tokenizer, q, hq, ha, self.max_prompt_tokens,
            include_demo) for q, hq, ha in items]
        prompts = [build_selector_prompt(q, hq, ha, include_demo)
                   for (q, _, _), (hq, ha, _) in zip(items, windowed)]
        ids_list = [np.asarray(self.tokenizer.encode(p), np.int32)
                    for p in prompts]
        cap = self._cap_for([len(hq) for hq, _, _ in windowed])
        padded, positions, last, cache = self._prep_batch(
            ids_list, include_demo, cap)
        emb = qwen2.embed(self.params, jnp.asarray(padded))
        result = generate_tokens(
            self.params, emb, jnp.asarray(positions),
            jnp.asarray(last), cache,
            key if key is not None else jax.random.PRNGKey(0),
            self.cfg, cap, self.tokenizer.eos_token_id,
            temperature=0.0, logit_ids=self.allowed_ids,
            adapters=self.adapters, lora_scale=self.lora_scale,
            stop_ids=self.stop_ids)
        toks = np.asarray(result.tokens)
        nums = np.asarray(result.num_tokens)
        outs = []
        for b in range(len(ids_list)):
            ids_out = toks[b, :int(nums[b])].tolist()
            if ids_out and ids_out[-1] == self.tokenizer.eos_token_id:
                ids_out = ids_out[:-1]
            outs.append(_remap_selection(
                normalize_selection(self.tokenizer.decode(
                    ids_out, skip_special_tokens=True)),
                windowed[b][2]))
        return outs

    def select(self, current_question: str, hist_qs: List[str],
               hist_as: List[str], include_demo: bool = True,
               key: Optional[jax.Array] = None) -> str:
        hist_qs, hist_as, offset = window_selector_history(
            self.tokenizer, current_question, hist_qs, hist_as,
            self.max_prompt_tokens, include_demo)
        prompt = build_selector_prompt(current_question, hist_qs, hist_as,
                                       include_demo)
        ids = np.asarray(self.tokenizer.encode(prompt), np.int32)
        cap = self._cap_for([len(hist_qs)])
        padded, positions, last, cache = self._prep_batch([ids],
                                                          include_demo,
                                                          cap)
        emb = qwen2.embed(self.params, jnp.asarray(padded))
        result = generate_tokens(
            self.params, emb, jnp.asarray(positions),
            jnp.asarray(last), cache,
            key if key is not None else jax.random.PRNGKey(0),
            self.cfg, cap, self.tokenizer.eos_token_id,
            temperature=0.0, logit_ids=self.allowed_ids,
            adapters=self.adapters, lora_scale=self.lora_scale,
            stop_ids=self.stop_ids)
        text = decode_new_tokens(result.tokens, result.num_tokens,
                                 self.tokenizer)
        return _remap_selection(normalize_selection(text), offset)
