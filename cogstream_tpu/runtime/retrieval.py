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

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen2Config
from ..models import qwen2
from ..models.qwen2 import init_kv_cache
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


def build_selector_prompt(
    current_question: str,
    hist_qs: List[str],
    hist_as: List[str],
    include_demo: bool = True,
) -> str:
    demo = SELECTOR_DEMO if include_demo else ""
    user = f"""{demo}
Current Question: {current_question}

Historical QA Pairs (ordered by time):"""
    for i, (q, a) in enumerate(zip(hist_qs, hist_as)):
        user += f"\n{i}. Q: {q}\n   A: {a}"
    user += ("\nGenerate a bracketed sequence (e.g., [yes,0,5] or [no,0,5]) "
             "indicating the dependency (yes or no) and the indices of "
             "helpful QA pairs. Only output the bracketed sequence.")
    return (f"{SELECTOR_SYSTEM}"
            f"<|im_start|>user\n{user}<|im_end|>"
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


class Selector:
    """Runs the constrained retrieval decode with the language adapter."""

    def __init__(self, params, cfg: Qwen2Config, tokenizer,
                 adapters=None, lora_scale: float = 2.0,
                 max_new_tokens: int = 50):
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

    def select_batch(self, items, include_demo: bool = True,
                     key: Optional[jax.Array] = None) -> List[str]:
        """Batched constrained retrieval: ``items`` is a list of
        (current_question, hist_qs, hist_as); one prefill+decode covers
        all of them (used by the pooled serving path)."""
        import numpy as np

        windowed = [window_selector_history(
            self.tokenizer, q, hq, ha, self.max_prompt_tokens,
            include_demo) for q, hq, ha in items]
        prompts = [build_selector_prompt(q, hq, ha, include_demo)
                   for (q, _, _), (hq, ha, _) in zip(items, windowed)]
        ids_list = [np.asarray(self.tokenizer.encode(p), np.int32)
                    for p in prompts]
        B = len(ids_list)
        S = bucket_length(max(len(i) for i in ids_list))
        padded = np.zeros((B, S), np.int32)
        positions = np.full((B, S), -1, np.int32)
        last = np.zeros((B,), np.int32)
        for b, ids in enumerate(ids_list):
            padded[b, :len(ids)] = ids
            positions[b, :len(ids)] = np.arange(len(ids))
            last[b] = len(ids) - 1
        cache = init_kv_cache(self.cfg, B, S + self.max_new_tokens)
        emb = qwen2.embed(self.params, jnp.asarray(padded))
        result = generate_tokens(
            self.params, emb, jnp.asarray(positions),
            jnp.asarray(last), cache,
            key if key is not None else jax.random.PRNGKey(0),
            self.cfg, self.max_new_tokens, self.tokenizer.eos_token_id,
            temperature=0.0, logit_ids=self.allowed_ids,
            adapters=self.adapters, lora_scale=self.lora_scale,
            stop_ids=self.stop_ids)
        toks = np.asarray(result.tokens)
        nums = np.asarray(result.num_tokens)
        outs = []
        for b in range(B):
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
        S = bucket_length(len(ids))
        padded = np.zeros((1, S), np.int32)
        padded[0, :len(ids)] = ids
        positions = np.full((1, S), -1, np.int32)
        positions[0, :len(ids)] = np.arange(len(ids))

        cache = init_kv_cache(self.cfg, 1, S + self.max_new_tokens)
        emb = qwen2.embed(self.params, jnp.asarray(padded))
        if self.adapters:
            # adapter deltas must also shape the prompt representations
            emb = emb  # embeddings are not LoRA targets; forward applies them
        result = generate_tokens(
            self.params, emb, jnp.asarray(positions),
            jnp.asarray([len(ids) - 1], jnp.int32), cache,
            key if key is not None else jax.random.PRNGKey(0),
            self.cfg, self.max_new_tokens, self.tokenizer.eos_token_id,
            temperature=0.0, logit_ids=self.allowed_ids,
            adapters=self.adapters, lora_scale=self.lora_scale,
            stop_ids=self.stop_ids)
        text = decode_new_tokens(result.tokens, result.num_tokens,
                                 self.tokenizer)
        return _remap_selection(normalize_selection(text), offset)
