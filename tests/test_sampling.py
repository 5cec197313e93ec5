"""Sampling parity with the reference's generation_config.json decode:
top-k warper, HF repetition-penalty semantics, config loader, and the
session/engine plumbing."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.runtime.sampling import (
    apply_repetition_penalty, sample_token)


def test_repetition_penalty_hf_semantics():
    logits = jnp.asarray([[2.0, -2.0, 1.0, -1.0]])
    seen = jnp.asarray([[True, True, False, False]])
    out = apply_repetition_penalty(logits, seen, 2.0)
    # positive seen logits divide, negative multiply, unseen unchanged
    np.testing.assert_allclose(np.asarray(out[0]),
                               [1.0, -4.0, 1.0, -1.0])


def test_top_k_one_is_greedy():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    greedy = sample_token(logits, jax.random.PRNGKey(0), temperature=0.0)
    topk1 = sample_token(logits, jax.random.PRNGKey(1), temperature=0.9,
                         top_k=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(topk1))


def test_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0] + [-10.0] * 11])
    seen_ids = set()
    for i in range(40):
        tok = int(sample_token(logits, jax.random.PRNGKey(i),
                               temperature=2.0, top_k=3)[0])
        seen_ids.add(tok)
    assert seen_ids <= {2, 3, 4}   # only the top 3 ever sampled


def test_generation_config_loader(tmp_path):
    from cogstream_tpu.config import load_generation_config

    d = tmp_path / "m"
    d.mkdir()
    with open(d / "generation_config.json", "w") as f:
        json.dump({"do_sample": True, "temperature": 0.7, "top_k": 20,
                   "top_p": 0.8, "repetition_penalty": 1.05,
                   "eos_token_id": [151645, 151643]}, f)
    gc = load_generation_config(str(d))
    assert gc.sampling_kwargs == {"temperature": 0.7, "top_p": 0.8,
                                  "top_k": 20,
                                  "repetition_penalty": 1.05,
                                  "extra_eos_ids": (151645, 151643)}
    # greedy when do_sample is false — but the repetition-penalty
    # PROCESSOR and the secondary eos ids still apply (HF runs both in
    # greedy search; only top-k/top-p are sampling-gated)
    with open(d / "generation_config.json", "w") as f:
        json.dump({"do_sample": False, "temperature": 0.7,
                   "repetition_penalty": 1.05}, f)
    assert load_generation_config(str(d)).sampling_kwargs == {
        "temperature": 0.0, "repetition_penalty": 1.05,
        "extra_eos_ids": (151645, 151643)}
    # absent file → reference defaults
    assert load_generation_config(str(tmp_path)).top_k == 20


def test_generate_tokens_repetition_penalty_blocks_repeats(tiny_config):
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    S, NEW = 8, 12
    ids = rng.integers(3, 200, size=(1, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)

    def run(pen):
        cache = init_kv_cache(cfg, 1, S + NEW)
        r = generate_tokens(
            params, emb, pos, last, cache, jax.random.PRNGKey(0), cfg,
            NEW, eos_id=-1, temperature=0.0, repetition_penalty=pen,
            penalty_ids=jnp.asarray(ids))
        return np.asarray(r.tokens)[0]

    free = run(1.0)
    hard = run(1e6)
    # an extreme penalty forbids any token from appearing twice
    # (including the prompt's tokens); greedy tiny-random models repeat
    assert len(set(hard.tolist())) == NEW
    assert not (set(hard.tolist()) & set(ids[0].tolist()))
    # the penalty actually changed the trajectory
    assert not np.array_equal(free, hard) or len(set(free.tolist())) == NEW


def test_session_ask_sampling_args(tiny_config):
    """top_k=1 sampling decodes identically to greedy through the
    session path (plumbing check for ask's new sampling params)."""
    import dataclasses

    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = dataclasses.replace(
        tiny_config, compression=CompressionConfig(
            frames_per_event=2, keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)

    outs = []
    for kwargs in ({}, {"temperature": 0.8, "top_k": 1}):
        sess = StreamingSession(params, cfg, tok, max_len=1024,
                                use_pallas=False)
        outs.append(sess.ask("hello there?", mode="AC",
                             max_new_tokens=8, **kwargs)["text"])
    assert outs[0] == outs[1]

    # repetition-penalty plumbing: runs and returns text
    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            use_pallas=False)
    r = sess.ask("hello there?", mode="AC", max_new_tokens=8,
                 repetition_penalty=1.05)
    assert isinstance(r["text"], str)


def test_generate_tokens_stop_ids(tiny_config):
    """stop_ids halt the decode right AFTER the stop token: the token
    is kept in the output (it is real grammar, e.g. the selector's
    closing bracket), the remainder is eos-padded."""
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    S, NEW = 8, 12
    ids = rng.integers(3, 200, size=(1, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)

    def run(stop_ids):
        cache = init_kv_cache(cfg, 1, S + NEW)
        r = generate_tokens(
            params, emb, pos, last, cache, jax.random.PRNGKey(0), cfg,
            NEW, eos_id=-1, temperature=0.0, stop_ids=stop_ids)
        return np.asarray(r.tokens)[0], int(np.asarray(r.num_tokens)[0])

    free, _ = run(None)
    # pick a token the free greedy run emits mid-sequence as the stop
    k = NEW // 2
    stop = int(free[k])
    first = int(np.argmax(free == stop))       # its first occurrence
    stopped, num = run((stop,))
    np.testing.assert_array_equal(stopped[:first + 1], free[:first + 1])
    assert stopped[first] == stop              # stop token is kept
    assert (stopped[first + 1:] == -1).all()   # eos-padded after
    assert num == first + 2 or num == NEW      # incl. trailing eos


def test_selector_stops_on_closing_bracket(tiny_config):
    """The Selector's constrained decode halts at ']' instead of
    decoding filler to the 50-token cap (production turn latency)."""
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.processor.tokenizer import (
        ByteTokenizer, selector_stop_token_ids)
    from cogstream_tpu.runtime.retrieval import Selector

    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    close = tok.encode("]")
    assert len(close) == 1
    assert close[0] in selector_stop_token_ids(tok)

    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0),
                                     tiny_config.text)
    sel = Selector(params, tiny_config.text, tok)
    assert close[0] in sel.stop_ids
    out = sel.select("what happened?", ["earlier q"], ["earlier a"])
    # normalized bracket form regardless of where the decode halted
    assert out.startswith("[") and out.endswith("]")
    # at most one closing bracket can have been decoded
    assert out.count("]") == 1


def test_logit_ids_matches_vocab_mask(tiny_config):
    """Constrained decode via the sliced lm_head (static logit_ids)
    produces exactly the tokens of the dense vocab_mask path."""
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens
    from cogstream_tpu.runtime.sampling import build_vocab_mask

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    S, NEW = 8, 10
    allowed = tuple(sorted(rng.choice(cfg.vocab_size, 20,
                                      replace=False).tolist()))
    ids = rng.integers(3, 200, size=(2, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (2, 1)))
    last = jnp.asarray([S - 1, S - 1], jnp.int32)

    def run(temperature=0.0, **kw):
        cache = init_kv_cache(cfg, 2, S + NEW)
        r = generate_tokens(
            params, emb, pos, last, cache, jax.random.PRNGKey(0), cfg,
            NEW, eos_id=-1, temperature=temperature, **kw)
        return np.asarray(r.tokens)

    dense = run(vocab_mask=build_vocab_mask(cfg.vocab_size,
                                            list(allowed)))
    sliced = run(logit_ids=allowed)
    np.testing.assert_array_equal(dense, sliced)
    assert set(sliced.ravel().tolist()) <= set(allowed)

    # sampled (temperature>0) parity: restricted softmax == masked
    dense_t = run(vocab_mask=build_vocab_mask(cfg.vocab_size,
                                              list(allowed)),
                  temperature=0.7)
    sliced_t = run(logit_ids=allowed, temperature=0.7)
    assert set(sliced_t.ravel().tolist()) <= set(allowed)
    # same PRNG key stream, but the categorical draw is over K vs V
    # categories — distributions match, draws need not; greedy above
    # is the bitwise contract


def test_generate_tokens_extra_eos_stops_and_maps(tiny_config):
    """A secondary terminator (generation_config eos_token_id list)
    stops decode exactly where the token appears and is recorded AS the
    primary eos, so num_tokens / fed-slot bookkeeping stay on the
    single ``== eos_id`` convention."""
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    S, NEW = 12, 24
    ids = rng.integers(3, 200, size=(1, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)

    def run(**kw):
        r = generate_tokens(
            params, emb, pos, last, init_kv_cache(cfg, 1, S + NEW),
            jax.random.PRNGKey(0), cfg, NEW, eos_id=2,
            temperature=0.0, **kw)
        return np.asarray(r.tokens)[0], int(np.asarray(r.num_tokens)[0])

    free, n_free = run()
    assert n_free == NEW, "tiny greedy run should not hit eos"
    xe = int(free[NEW // 2])
    i = int(np.argmax(free == xe))          # first occurrence

    toks, n = run(extra_eos_ids=(xe,))
    np.testing.assert_array_equal(toks[:i], free[:i])
    assert toks[i] == 2 and n == i + 1      # mapped to primary eos
    assert (toks[i:] == 2).all()


def test_selector_windows_unbounded_history(tiny_config):
    """An unbounded stream's history must window to the newest turns
    that fit the prompt budget (window_selector_history), with decoded
    indices remapped to ABSOLUTE turn ids — without the window, the
    serialized prompt eventually exceeds the largest pad bucket and
    every FCC ask crashes."""
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.retrieval import (
        Selector, build_selector_prompt, window_selector_history,
        _remap_selection)

    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    qs = [f"question number {i} about the scene?" for i in range(40)]
    as_ = [f"answer number {i} with some detail." for i in range(40)]

    wq, wa, off = window_selector_history(
        tok, "current?", qs, as_, max_prompt_tokens=2000)
    assert off > 0 and wq == qs[off:] and wa == as_[off:]
    prompt = build_selector_prompt("current?", wq, wa)
    assert len(tok.encode(prompt)) <= 2000
    # most-recent turns survive; indices shift back by the offset
    assert _remap_selection("[yes,0,2]", off) == \
        f"[yes,{off},{off + 2}]"
    assert _remap_selection("[no]", off) == "[no]"

    # end-to-end: select() on the oversized history must not crash
    # (without the window, bucket_length would raise once the prompt
    # passed the largest bucket) and must return a valid bracket form.
    # Random weights may decode arbitrary digit VALUES — the grammar
    # constrains characters, not magnitude — and out-of-range indices
    # are harmless downstream (_allowed_mask matches by turn id).
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0),
                                     tiny_config.text)
    sel = Selector(params, tiny_config.text, tok)
    sel.max_prompt_tokens = 2000
    out = sel.select("current?", qs, as_)
    assert out.startswith("[") and out.endswith("]")
