"""Selector prefix-KV cache: exactness and engagement.

The selector prompt's head (system rubric + demos + ``Current
Question:``) is turn-invariant, so Selector prefills it once and
splices its KV into every turn's cache (runtime/retrieval.py
``_prefix_kv_device`` / ``_splice_prefix_cache``). These tests pin:

1. the prompt-builder refactor is byte-identical to the original
   serialization (the stage-1-trained adapter's interface — reference
   qaselect_module_predict.py:5-61);
2. greedy selections through the prefix path equal the full-prefill
   path exactly (solo and batched);
3. the prefix path actually engages (guard against silent fallback).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.models import qwen2
from cogstream_tpu.processor.tokenizer import ByteTokenizer
from cogstream_tpu.runtime.retrieval import (SELECTOR_DEMO,
                                             SELECTOR_SYSTEM, Selector,
                                             build_selector_prompt,
                                             selector_prefix_text)


def _reference_prompt(q, hist_qs, hist_as, include_demo=True):
    """The original single-string construction, inlined verbatim."""
    demo = SELECTOR_DEMO if include_demo else ""
    user = f"""{demo}
Current Question: {q}

Historical QA Pairs (ordered by time):"""
    for i, (hq, ha) in enumerate(zip(hist_qs, hist_as)):
        user += f"\n{i}. Q: {hq}\n   A: {ha}"
    user += ("\nGenerate a bracketed sequence (e.g., [yes,0,5] or [no,0,5]) "
             "indicating the dependency (yes or no) and the indices of "
             "helpful QA pairs. Only output the bracketed sequence.")
    return (f"{SELECTOR_SYSTEM}"
            f"<|im_start|>user\n{user}<|im_end|>"
            f"<|im_start|>assistant\n")


HIST_QS = ["what color is the car?", "who entered the room?",
           "what is on the table?"]
HIST_AS = ["a red sedan", "a man in a blue coat", "three books and a cup"]


@pytest.mark.parametrize("include_demo", [True, False])
def test_prompt_builder_byte_identical(include_demo):
    got = build_selector_prompt("why did he leave?", HIST_QS, HIST_AS,
                                include_demo)
    want = _reference_prompt("why did he leave?", HIST_QS, HIST_AS,
                             include_demo)
    assert got == want
    assert got.startswith(selector_prefix_text(include_demo))


def test_prefix_path_matches_full_prefill(tiny_config):
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0),
                                     tiny_config.text)
    sel_pc = Selector(params, tiny_config.text, tok)
    sel_full = Selector(params, tiny_config.text, tok,
                        prefix_cache=False)
    for turn in range(1, len(HIST_QS) + 1):
        q = f"question number {turn}?"
        a = sel_pc.select(q, HIST_QS[:turn], HIST_AS[:turn])
        b = sel_full.select(q, HIST_QS[:turn], HIST_AS[:turn])
        assert a == b
    assert sel_pc.prefix_hits == len(HIST_QS)
    assert sel_full.prefix_hits == 0


def test_prefix_path_matches_full_prefill_batch(tiny_config):
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(1),
                                     tiny_config.text)
    items = [("what now?", HIST_QS[:2], HIST_AS[:2]),
             ("and after that?", HIST_QS, HIST_AS)]
    sel_pc = Selector(params, tiny_config.text, tok)
    sel_full = Selector(params, tiny_config.text, tok,
                        prefix_cache=False)
    assert sel_pc.select_batch(items) == sel_full.select_batch(items)
    assert sel_pc.prefix_hits == 1


def test_prefix_path_with_adapters(tiny_config):
    """The language adapter shapes the prefix KV too — selections with
    a LoRA adapter must agree between the two paths."""
    from cogstream_tpu.config import LoRAConfig
    from cogstream_tpu.models.lora import init_qwen2_lora

    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(2),
                                     tiny_config.text)
    lora = init_qwen2_lora(jax.random.PRNGKey(3), tiny_config.text,
                           LoRAConfig(rank=2))
    # b is zero-init (delta = 0); perturb so the adapter actually acts
    lora = jax.tree_util.tree_map(lambda x: x + 0.02, lora)
    adapters = [(lora, jnp.float32(1.0))]
    sel_pc = Selector(params, tiny_config.text, tok, adapters=adapters)
    sel_full = Selector(params, tiny_config.text, tok, adapters=adapters,
                        prefix_cache=False)
    q = "what changed since the start?"
    assert sel_pc.select(q, HIST_QS, HIST_AS) == \
        sel_full.select(q, HIST_QS, HIST_AS)
    assert sel_pc.prefix_hits == 1


def test_bpe_split_stability_qwen2():
    """With the real Qwen2 BPE vocab, no merge crosses the prefix/suffix
    boundary (the engagement precondition on the 7B serving path)."""
    import os

    ref = "/root/reference/model"
    if not os.path.isdir(ref):
        pytest.skip("reference tokenizer not mounted")
    from cogstream_tpu.processor.tokenizer import HFTokenizer

    tok = HFTokenizer(ref)
    pre = tok.encode(selector_prefix_text())
    full = tok.encode(build_selector_prompt(
        "what is happening right now?", HIST_QS, HIST_AS))
    assert full[:len(pre)] == pre
    assert len(pre) > 300        # the prefix is the bulk of the prompt
