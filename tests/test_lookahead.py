"""Prompt-lookup speculative decoding: EXACT greedy parity.

The lookahead decoder must emit byte-identical token streams to the
vanilla greedy path — verification re-derives every token from the
model's own argmax, so drafting can only change HOW MANY forwards run,
never what comes out. Tiny random models loop on short token cycles,
which exercises the accept path heavily; varied seeds exercise
rejects.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.models import qwen2
from cogstream_tpu.models.qwen2 import init_kv_cache
from cogstream_tpu.runtime.generate import (generate_tokens,
                                            generate_tokens_lookahead)


def _setup(tiny_config, seed, S=12):
    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 200, size=(1, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)
    return cfg, params, ids, emb, pos, last


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lookahead_exact_greedy_parity(tiny_config, seed):
    cfg, params, ids, emb, pos, last = _setup(tiny_config, seed)
    S, NEW, K = ids.shape[1], 24, 4

    base = generate_tokens(
        params, emb, pos, last, init_kv_cache(cfg, 1, S + NEW),
        jax.random.PRNGKey(0), cfg, NEW, eos_id=2, temperature=0.0)
    la = generate_tokens_lookahead(
        params, emb, pos, last,
        init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(ids),
        cfg, NEW, eos_id=2, lookahead_k=K)

    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(la.tokens))
    np.testing.assert_array_equal(np.asarray(base.num_tokens),
                                  np.asarray(la.num_tokens))
    # the speculative path may use at most num-1 verify forwards
    # (all-rejected) — never more
    n = int(np.asarray(la.num_tokens)[0])
    steps = int(np.asarray(la.steps))
    assert steps <= max(n - 1, 0) + 1

    # cache parity: write_index and the live-position row must be
    # indistinguishable from the vanilla path's (exit normalization
    # rewinds past rejected AND fed-but-cut slots)
    wi = int(np.asarray(la.cache.write_index))
    base_wi = int(np.asarray(base.cache.write_index))
    assert wi == base_wi
    cpos = np.asarray(la.cache.pos)[0]
    assert (cpos[wi:] == -1).all()
    np.testing.assert_array_equal(cpos[:wi],
                                  np.asarray(base.cache.pos)[0][:wi])


def test_lookahead_accelerates_repetitive_sequences(tiny_config):
    """Tiny greedy models settle into cycles; the bigram draft must
    then accept, emitting multiple tokens per forward."""
    accelerated = 0
    for seed in range(6):
        cfg, params, ids, emb, pos, last = _setup(tiny_config, seed)
        S, NEW, K = ids.shape[1], 24, 4
        la = generate_tokens_lookahead(
            params, emb, pos, last,
            init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(ids),
            cfg, NEW, eos_id=2, lookahead_k=K)
        n = int(np.asarray(la.num_tokens)[0])
        if n >= NEW // 2 and int(np.asarray(la.steps)) < n - 1:
            accelerated += 1
    assert accelerated >= 1, "no seed produced an accepted draft"


def test_lookahead_stop_ids(tiny_config):
    """stop_ids semantics match the base path through the chunked
    emit: the stop token is kept, everything after is eos."""
    cfg, params, ids, emb, pos, last = _setup(tiny_config, 1)
    S, NEW, K = ids.shape[1], 16, 4
    free = generate_tokens_lookahead(
        params, emb, pos, last,
        init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(ids),
        cfg, NEW, eos_id=2, lookahead_k=K)
    toks = np.asarray(free.tokens)[0]
    stop = int(toks[NEW // 2])
    la = generate_tokens_lookahead(
        params, emb, pos, last,
        init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(ids),
        cfg, NEW, eos_id=2, lookahead_k=K, stop_ids=(stop,))
    base = generate_tokens(
        params, emb, pos, last, init_kv_cache(cfg, 1, S + NEW),
        jax.random.PRNGKey(0), cfg, NEW, eos_id=2, temperature=0.0,
        stop_ids=(stop,))
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(la.tokens))
    # stop-terminal cache parity: vanilla never feeds the stop token,
    # so exactly the pre-stop emissions occupy generation slots; the
    # lookahead exit must not leave the extra slot (possibly a rejected
    # verify-bonus draft) live
    wi = int(np.asarray(la.cache.write_index))
    assert wi == int(np.asarray(base.cache.write_index))
    cpos = np.asarray(la.cache.pos)[0]
    assert (cpos[wi:] == -1).all()
    np.testing.assert_array_equal(cpos[:wi],
                                  np.asarray(base.cache.pos)[0][:wi])


def test_lookahead_decoupled_corpus(tiny_config):
    """The match corpus (prompt_ids + corpus_last) may be bucketed
    independently of the embeds: a wider, padded corpus holding the
    same ids yields byte-identical output — the engine's spliced-media
    case where text-id length != embed length."""
    cfg, params, ids, emb, pos, last = _setup(tiny_config, 0)
    S, NEW, K = ids.shape[1], 24, 4

    aligned = generate_tokens_lookahead(
        params, emb, pos, last,
        init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(ids),
        cfg, NEW, eos_id=2, lookahead_k=K)

    C = S + 20
    wide = np.full((1, C), -1, np.int32)
    wide[0, :S] = ids
    decoupled = generate_tokens_lookahead(
        params, emb, pos, last,
        init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(wide),
        cfg, NEW, eos_id=2, lookahead_k=K,
        corpus_last=jnp.asarray([S - 1], jnp.int32))

    np.testing.assert_array_equal(np.asarray(aligned.tokens),
                                  np.asarray(decoupled.tokens))
    np.testing.assert_array_equal(np.asarray(aligned.num_tokens),
                                  np.asarray(decoupled.num_tokens))
    assert (int(np.asarray(decoupled.steps))
            == int(np.asarray(aligned.steps)))


def test_lookahead_kv_window(tiny_config):
    """Windowed solo mode: identical output to the unwindowed call, and
    cache slots at/after the window are untouched."""
    cfg, params, ids, emb, pos, last = _setup(tiny_config, 3)
    S, NEW, K = ids.shape[1], 16, 4
    win = S + NEW + K + 1
    big = win + 64

    full = generate_tokens_lookahead(
        params, emb, pos, last, init_kv_cache(cfg, 1, big),
        jnp.asarray(ids), cfg, NEW, eos_id=2, lookahead_k=K)
    wind = generate_tokens_lookahead(
        params, emb, pos, last, init_kv_cache(cfg, 1, big),
        jnp.asarray(ids), cfg, NEW, eos_id=2, lookahead_k=K,
        kv_window=win)

    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(wind.tokens))
    np.testing.assert_array_equal(np.asarray(full.cache.pos)[0][:win],
                                  np.asarray(wind.cache.pos)[0][:win])
    assert (np.asarray(wind.cache.pos)[0][win:] == -1).all()

    with pytest.raises(ValueError):
        generate_tokens_lookahead(
            params, emb, pos, last, init_kv_cache(cfg, 1, big),
            jnp.asarray(ids), cfg, NEW, eos_id=2, lookahead_k=K,
            kv_window=S + NEW)   # window too small for k+1 overhang


def _make_session(max_len=1024):
    import dataclasses
    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = CogReasonerConfig.tiny()
    cfg = dataclasses.replace(
        cfg, compression=CompressionConfig(frames_per_event=2,
                                           keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    return StreamingSession(params, cfg, tok, max_len=max_len)


def test_session_ask_lookahead_parity():
    """A multi-turn streamed dialogue answered with lookahead_k=4 must
    be indistinguishable — text, slot ranges, write_index, cache
    positions — from the vanilla decoder's, across AC and FCC turns."""
    rng = np.random.default_rng(0)
    t, gh, gw, ms = 2, 4, 4, 2
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)

    results = []
    for k in (0, 4):
        s = _make_session()
        s.append_stream_segment(pv, (t, gh, gw), ms,
                                timestamps=[0.0, 1.0])
        r1 = s.ask("what is happening?", mode="AC", max_new_tokens=12,
                   lookahead_k=k)
        s.append_stream_segment(pv, (t, gh, gw), ms,
                                timestamps=[2.0, 3.0])
        r2 = s.ask("and now?", mode="FCC", max_new_tokens=12,
                   lookahead_k=k)
        results.append((r1, r2, s))

    (b1, b2, bs), (l1, l2, ls) = results
    assert b1["text"] == l1["text"]
    assert b2["text"] == l2["text"]
    assert bs.write_index == ls.write_index
    assert [(r.kind, r.start, r.end, r.turn) for r in bs.ranges] \
        == [(r.kind, r.start, r.end, r.turn) for r in ls.ranges]
    np.testing.assert_array_equal(np.asarray(bs.cache.pos),
                                  np.asarray(ls.cache.pos))
    assert ls.last_lookahead_steps is not None


def test_session_ask_lookahead_sampling_falls_back():
    """lookahead_k with sampling params silently uses the vanilla
    decoder (same key discipline → identical sampled output)."""
    rng = np.random.default_rng(0)
    t, gh, gw, ms = 2, 4, 4, 2
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)

    outs = []
    for k in (0, 4):
        s = _make_session()
        s.append_stream_segment(pv, (t, gh, gw), ms,
                                timestamps=[0.0, 1.0])
        r = s.ask("what?", mode="AC", max_new_tokens=8,
                  temperature=0.7, lookahead_k=k)
        outs.append(r["text"])
    assert outs[0] == outs[1]


def test_lookahead_cache_reusable_for_next_turn(tiny_config):
    """After a lookahead turn the cache must be indistinguishable from
    a vanilla turn's: a follow-up prefill+decode on top of each yields
    identical continuations (the session KV-reuse contract)."""
    cfg, params, ids, emb, pos, last = _setup(tiny_config, 2)
    S, NEW, K = ids.shape[1], 12, 4
    total = S + NEW + K + 1 + 8 + 12  # + follow-up prompt and decode

    base = generate_tokens(
        params, emb, pos, last, init_kv_cache(cfg, 1, total),
        jax.random.PRNGKey(0), cfg, NEW, eos_id=2, temperature=0.0)
    la = generate_tokens_lookahead(
        params, emb, pos, last, init_kv_cache(cfg, 1, total),
        jnp.asarray(ids), cfg, NEW, eos_id=2, lookahead_k=K)

    rng = np.random.default_rng(9)
    ids2 = rng.integers(3, 200, size=(1, 8)).astype(np.int32)
    emb2 = qwen2.embed(params, jnp.asarray(ids2))

    outs = []
    for res in (base, la):
        n_prev = int(np.asarray(res.num_tokens)[0])
        start = S + n_prev  # next position after the emitted stream
        pos2 = jnp.asarray(
            np.arange(start, start + 8, dtype=np.int32)[None])
        r2 = generate_tokens(
            params, emb2, pos2, jnp.asarray([7], jnp.int32), res.cache,
            jax.random.PRNGKey(0), cfg, 12, eos_id=2, temperature=0.0)
        outs.append(np.asarray(r2.tokens))
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.parametrize("accept", [0, 2, 4])
def test_lookahead_fixed_schedule_deterministic(tiny_config, accept):
    """fixed_draft/fixed_accept (the reproducible-bench mode): with the
    teacher = the model's own greedy continuation, every verify step
    accepts EXACTLY ``accept`` drafts, the step count is closed-form,
    and the emitted stream still equals vanilla greedy byte-for-byte —
    on every run."""
    cfg, params, ids, emb, pos, last = _setup(tiny_config, 7)
    S, NEW, K = ids.shape[1], 24, 4

    base = generate_tokens(
        params, emb, pos, last, init_kv_cache(cfg, 1, S + NEW + K),
        jax.random.PRNGKey(0), cfg, NEW + K, eos_id=-1, temperature=0.0)
    teacher = jnp.asarray(np.asarray(base.tokens)[0], jnp.int32)

    def run():
        return generate_tokens_lookahead(
            params, emb, pos, last,
            init_kv_cache(cfg, 1, S + NEW + K + 1), jnp.asarray(ids),
            cfg, NEW, eos_id=-1, lookahead_k=K,
            fixed_draft=teacher, fixed_accept=accept)

    la = run()
    np.testing.assert_array_equal(np.asarray(base.tokens)[:, :NEW],
                                  np.asarray(la.tokens))
    steps = int(np.asarray(la.steps))
    assert steps == -(-(NEW - 1) // (accept + 1))
    # determinism across runs: identical steps AND tokens
    la2 = run()
    assert int(np.asarray(la2.steps)) == steps
    np.testing.assert_array_equal(np.asarray(la.tokens),
                                  np.asarray(la2.tokens))
