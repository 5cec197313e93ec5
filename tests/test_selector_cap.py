"""History-derived selector decode cap (runtime/retrieval.py
``selector_token_cap``).

The reference always decodes the selector up to a constant 50-token
cap (qaselect_module_predict.py:107-115), but the constrained grammar
output ``[yes,i1,...,iK]`` over H history QAs is bounded by H — the
longest legitimate decode selects every index once. These tests pin:

1. the bound is CORRECT by construction for any tokenizer (the cap is
   derived by tokenizing the maximal grammatical selection + eos) and
   the bucketing/monotonicity hold for both the byte tokenizer and the
   real Qwen2 BPE vocab when mounted;
2. the capped decode cannot truncate ANY grammatical selection: with
   the model decode stubbed to emit the maximal selection for its
   history, the parsed result under the derived cap equals the result
   under the reference's constant 50 exactly, at every history length
   crossing a bucket edge;
3. the cap actually engages (a short history decodes a small bucket,
   a long one a bigger bucket) on the real tiny-model path.
"""

import os

import jax
import numpy as np
import pytest

from cogstream_tpu.models import qwen2
from cogstream_tpu.processor.tokenizer import ByteTokenizer
from cogstream_tpu.runtime import retrieval
from cogstream_tpu.runtime.generate import GenerateResult
from cogstream_tpu.runtime.retrieval import (CAP_BUCKETS, Selector,
                                             maximal_selection,
                                             selector_token_cap)


def _tokenizers():
    toks = [("byte", ByteTokenizer(image_token_id=1000))]
    ref = "/root/reference/model"
    if os.path.isdir(ref):
        from cogstream_tpu.processor.tokenizer import HFTokenizer

        toks.append(("qwen2-bpe", HFTokenizer(ref)))
    return toks


def test_cap_bounds_maximal_selection():
    """cap(H) must cover the worst grammatical output + eos under the
    SAME tokenizer that will decode it."""
    for name, tok in _tokenizers():
        for h in range(0, 40):
            n_tok = len(tok.encode(maximal_selection(h))) + 1  # + eos
            cap = selector_token_cap(h, tok)
            assert n_tok <= cap or cap == 50, (name, h, n_tok, cap)


def test_cap_monotone_and_bucketed():
    for name, tok in _tokenizers():
        caps = [selector_token_cap(h, tok) for h in range(0, 60)]
        assert all(a <= b for a, b in zip(caps, caps[1:])), name
        assert set(caps) <= set(CAP_BUCKETS), name
        assert caps[0] == CAP_BUCKETS[0], name
        assert selector_token_cap(1000, tok) == 50, name
        # the ceiling argument still wins (callers can lower it)
        assert selector_token_cap(30, tok, ceiling=10) == 10, name


def test_capped_decode_never_truncates_grammatical(tiny_config,
                                                   monkeypatch):
    """Stub the jitted decode to emit the MAXIMAL grammatical selection
    for the row's history (truncated at whatever cap the Selector
    passed): the derived cap must reproduce the constant-50 result
    byte-for-byte at every history length crossing a bucket edge."""
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0),
                                     tiny_config.text)

    state = {"h": 0}

    def fake_generate(params, emb, positions, last, cache, key, cfg,
                      max_new_tokens, eos_id, **kw):
        ids = tok.encode(maximal_selection(state["h"])) + [eos_id]
        ids = ids[:max_new_tokens]           # the cap under test
        toks = np.full((emb.shape[0], max_new_tokens), eos_id, np.int32)
        toks[0, :len(ids)] = ids
        return GenerateResult(toks, np.asarray([len(ids)], np.int32),
                              cache)

    monkeypatch.setattr(retrieval, "generate_tokens", fake_generate)

    sel = Selector(params, tiny_config.text, tok)
    sel_flat = Selector(params, tiny_config.text, tok)
    sel_flat._cap_for = lambda lens: 50      # the reference's constant

    # history lengths straddling every bucket edge for the byte
    # tokenizer (caps 12/24/36), incl. the largest H whose maximal
    # selection still fits 50 tokens
    for h in [0, 1, 2, 3, 4, 6, 8, 10, 12, 14]:
        state["h"] = h
        qs = [f"q{i}?" for i in range(h)]
        as_ = [f"a{i}." for i in range(h)]
        got = sel.select("what now?", qs, as_)
        want = sel_flat.select("what now?", qs, as_)
        assert got == want == maximal_selection(h), (h, got, want)


def test_cap_engages_for_short_history(tiny_config):
    """A 3-turn history must decode the smallest bucket, not 50 — on
    the real (unstubbed) decode path."""
    captured = {}
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0),
                                     tiny_config.text)
    sel = Selector(params, tiny_config.text, tok)
    orig = sel._cap_for

    def spy(lens):
        captured["cap"] = orig(lens)
        return captured["cap"]

    sel._cap_for = spy
    sel.select("now?", ["a?"] * 3, ["b."] * 3)
    assert captured["cap"] == CAP_BUCKETS[0]
    sel.select("now?", ["a?"] * 20, ["b."] * 20)
    assert captured["cap"] == selector_token_cap(20, tok)
    assert captured["cap"] > CAP_BUCKETS[0]
