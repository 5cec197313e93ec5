"""Pooled multi-session batched decode: parity with solo sessions."""

import dataclasses

import numpy as np
import jax
import pytest

from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
from cogstream_tpu.processor.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    return cfg, params, tok


def test_pool_batched_ask_matches_solo(setup):
    from cogstream_tpu.runtime.pool import SessionPool
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = setup
    rng = np.random.default_rng(0)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    questions = {0: "what is happening?", 1: "who is there?"}

    pool = SessionPool(params, cfg, tok, n_rows=3, max_len=1024,
                       summary_forward=False)
    r0 = pool.open()
    r1 = pool.open()
    pool.ingest(r0, pv, (t, gh, gw), 2, [0.0, 1.0])
    pool.ingest(r1, pv, (t, gh, gw), 2, [0.0, 1.0])
    batch_out = pool.ask_batch([(r0, questions[0]), (r1, questions[1])],
                               mode="AC", max_new_tokens=8)

    # solo references (greedy → deterministic)
    for row, q in questions.items():
        solo = StreamingSession(params, cfg, tok, max_len=1024,
                                summary_forward=False)
        solo.append_stream_segment(pv, (t, gh, gw), 2, [0.0, 1.0])
        want = solo.ask(q, mode="AC", max_new_tokens=8)
        assert batch_out[row]["text"] == want["text"], (
            row, batch_out[row]["text"], want["text"])

    # sessions stay consistent: a follow-up SOLO ask on the pool row works
    follow = pool.ask(r0, "again?", mode="AC", max_new_tokens=4)
    assert isinstance(follow["text"], str)
    assert pool.sessions[r0].hist_qs == [questions[0], "again?"]


def test_pool_sampled_decode_reproducible(setup):
    """temperature>0 batch decodes follow the pool's seeded key chain:
    same seed → identical outputs, different seed → (almost surely)
    different samples. Regression for the unseeded host RNG."""
    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    rng = np.random.default_rng(1)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)

    def run(seed):
        pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                           summary_forward=False, seed=seed)
        r = pool.open()
        pool.ingest(r, pv, (t, gh, gw), 2, [0.0, 1.0])
        out = pool.ask_batch([(r, "describe this")], mode="AC",
                             max_new_tokens=12, temperature=1.0)
        return out[r]["text"]

    assert run(7) == run(7)
    texts = {run(s) for s in (7, 8, 9)}
    assert len(texts) > 1


def test_pool_partial_batch_and_capacity(setup):
    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=512,
                       summary_forward=False)
    a = pool.open()
    b = pool.open()
    with pytest.raises(RuntimeError):
        pool.open()                       # full
    out = pool.ask_batch([(a, "only one active?")], mode="AC",
                         max_new_tokens=4)
    assert set(out) == {a}
    pool.close(b)
    c = pool.open()                       # row reused
    assert c == b


def test_pooled_generate_matches_standard(setup):
    """Side-buffer pooled decode must produce the same greedy tokens as
    the standard shared-index path when rows start at offset 0."""
    import jax.numpy as jnp

    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg, params, tok = setup
    text = params["text"]
    tcfg = cfg.text
    B, S, NEW, ML = 3, 16, 8, 128
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 200, size=(B, S)).astype(np.int32)
    emb = qwen2.embed(text, jnp.asarray(ids))
    positions = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
    last = jnp.asarray([S - 1] * B, jnp.int32)

    ref = generate_tokens(text, emb, positions, last,
                          init_kv_cache(tcfg, B, ML),
                          jax.random.PRNGKey(0), tcfg, NEW, eos_id=-1)

    # per-row offsets 0 / 7 / 19: same visible content, pooled layout
    slots = np.stack([np.arange(o, o + S)
                      for o in (0, 7, 19)]).astype(np.int64)
    out = generate_tokens(text, emb, positions, last,
                          init_kv_cache(tcfg, B, ML),
                          jax.random.PRNGKey(0), tcfg, NEW, eos_id=-1,
                          write_slots=jnp.asarray(slots),
                          active=jnp.asarray([True] * B))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))
    # merged cache rows carry the generated tokens at slot offsets
    pos_out = np.asarray(out.cache.pos)
    for b, o in enumerate((0, 7, 19)):
        n = int(np.asarray(out.num_tokens)[b]) - 1
        assert (pos_out[b, o + S:o + S + n] >= 0).all()


def test_pool_single_storage_and_isolation(setup):
    """Sessions bound to the pool share ONE cache tensor (no mirrors);
    per-row traffic — ingest, solo ask, eviction/compaction — never
    disturbs other rows."""
    from cogstream_tpu.runtime.pool import SessionPool
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = setup
    rng = np.random.default_rng(3)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)

    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=512,
                       summary_forward=False)
    a, b = pool.open(), pool.open()
    sa, sb = pool.sessions[a], pool.sessions[b]
    assert sa.cache is pool.cache and sb.cache is pool.cache

    pool.ingest(b, pv, (t, gh, gw), 2, [0.0, 1.0])
    b_wi = sb.write_index
    b_pos = np.asarray(pool.cache.pos[b]).copy()

    # hammer row a: repeated ingest forces eviction + in-place row
    # compaction on the shared tensor
    for seg in range(8):
        pool.ingest(a, pv, (t, gh, gw), 2,
                    [2.0 * seg, 2.0 * seg + 1.0])
    assert sa.write_index <= 512
    # pooled rows pack tightly: fill level == live range size exactly
    assert sa.write_index == sum(r.end - r.start for r in sa.ranges)
    # row b untouched, bit for bit
    np.testing.assert_array_equal(np.asarray(pool.cache.pos[b]), b_pos)
    assert sb.write_index == b_wi

    # row-b solo ask (cache_rows path) matches a standalone session
    out_b = pool.ask(b, "what was shown?", mode="AC", max_new_tokens=8)
    solo = StreamingSession(params, cfg, tok, max_len=512,
                            summary_forward=False)
    solo.append_stream_segment(pv, (t, gh, gw), 2, [0.0, 1.0])
    want = solo.ask("what was shown?", mode="AC", max_new_tokens=8)
    assert out_b["text"] == want["text"]

    # row a still answers after heavy eviction
    out_a = pool.ask(a, "and here?", mode="AC", max_new_tokens=4)
    assert isinstance(out_a["text"], str)


def test_pooled_ask_stream_matches_solo(setup):
    """Chunked streaming decode on a pool row == solo session greedy."""
    from cogstream_tpu.runtime.pool import SessionPool
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = setup
    rng = np.random.default_rng(4)
    pv = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)

    solo = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    solo.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    want = solo.ask("what now?", mode="AC", max_new_tokens=24)

    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                       summary_forward=False)
    r = pool.open()
    pool.ingest(r, pv, (2, 4, 4), 2, [0.0, 1.0])
    deltas, final = [], None
    for item in pool.sessions[r].ask_stream("what now?", mode="AC",
                                            max_new_tokens=24, chunk=8):
        if isinstance(item, dict):
            final = item
        else:
            deltas.append(item)
    assert final is not None and "".join(deltas) == final["text"]
    assert final["text"] == want["text"]
    # follow-up batched turn on the same row still lines up
    out = pool.ask_batch([(r, "again?")], mode="AC", max_new_tokens=4)
    assert isinstance(out[r]["text"], str)


def test_ingest_batch_matches_sequential(setup):
    """One fused batched ingest dispatch == per-row ingests: identical
    host state (ranges, events, fill levels) and identical greedy
    answers afterwards."""
    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    rng = np.random.default_rng(7)
    t, gh, gw = 2, 4, 4
    pv = {r: rng.normal(size=(t * gh * gw, 3 * 14 * 14))
          .astype(np.float32) for r in (0, 1)}

    def mk():
        p = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                        summary_forward=False)
        return p, p.open(), p.open()

    seq, a1, b1 = mk()
    seq.ingest(a1, pv[0], (t, gh, gw), 2, [0.0, 1.0])
    seq.ingest(b1, pv[1], (t, gh, gw), 2, [0.0, 1.0])

    bat, a2, b2 = mk()
    bat.ingest_batch([(a2, pv[0], (t, gh, gw), 2, [0.0, 1.0]),
                      (b2, pv[1], (t, gh, gw), 2, [0.0, 1.0])])

    for x, y in ((a1, a2), (b1, b2)):
        sx, sy = seq.sessions[x], bat.sessions[y]
        assert sx.write_index == sy.write_index
        assert [(r.kind, r.start, r.end) for r in sx.ranges] == \
            [(r.kind, r.start, r.end) for r in sy.ranges]
        assert len(sx.events) == len(sy.events)
        for ex, ey in zip(sx.events, sy.events):
            assert ex.shadow_slots == ey.shadow_slots
            assert ex.keyframe_mask == ey.keyframe_mask
            np.testing.assert_allclose(np.asarray(ex.rep),
                                       np.asarray(ey.rep),
                                       rtol=1e-4, atol=1e-5)

    qs = {0: "what is happening?", 1: "who is there?"}
    out_seq = seq.ask_batch([(a1, qs[0]), (b1, qs[1])], mode="AC",
                            max_new_tokens=8)
    out_bat = bat.ask_batch([(a2, qs[0]), (b2, qs[1])], mode="AC",
                            max_new_tokens=8)
    assert out_seq[a1]["text"] == out_bat[a2]["text"]
    assert out_seq[b1]["text"] == out_bat[b2]["text"]

    # mixed segment shapes are rejected (fall back to ingest())
    with pytest.raises(ValueError):
        bat.ingest_batch([(a2, pv[0], (t, gh, gw), 2, [2.0, 3.0]),
                          (b2, pv[1][: gh * gw], (1, gh, gw), 2, [2.0])])


def test_pool_with_fp8_kv(setup):
    """Pool + fp8 KV cache compose."""
    import jax.numpy as jnp

    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=512,
                       summary_forward=False,
                       kv_dtype=jnp.float8_e4m3fn)
    assert pool.cache.k.dtype == jnp.float8_e4m3fn
    a = pool.open()
    b = pool.open()
    out = pool.ask_batch([(a, "one?"), (b, "two?")], mode="AC",
                         max_new_tokens=4)
    assert set(out) == {a, b}
    assert all(isinstance(r["text"], str) for r in out.values())


def test_pool_open_restored_row(setup, tmp_path):
    """A solo-session snapshot restores into a pool row and continues
    with the same greedy answer as the solo continuation."""
    from cogstream_tpu.runtime.pool import SessionPool
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = setup
    rng = np.random.default_rng(21)
    pv = rng.integers(0, 255, (2 * 4 * 4, 3 * 14 * 14), dtype=np.uint8)
    solo = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    solo.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    path = str(tmp_path / "row.npz")
    solo.save(path)
    want = solo.ask("what now?", mode="AC", max_new_tokens=8)

    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                       summary_forward=False)
    r = pool.open_restored(path)
    got = pool.ask(r, "what now?", mode="AC", max_new_tokens=8)
    assert got["text"] == want["text"]
    # batched turn on the restored row afterwards
    out = pool.ask_batch([(r, "more?")], mode="AC", max_new_tokens=4)
    assert out[r]["turn"] == 1


def test_ingest_batch_rejects_mixed_dtypes(setup):
    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                       summary_forward=False)
    a, b = pool.open(), pool.open()
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (2 * 4 * 4, 3 * 14 * 14), dtype=np.uint8)
    f32 = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)
    with pytest.raises(ValueError, match="uniform pixel dtype"):
        pool.ingest_batch([(a, u8, (2, 4, 4), 2, [0.0, 1.0]),
                           (b, f32, (2, 4, 4), 2, [0.0, 1.0])])


def test_flush_event_reps_mixed_shapes_and_k_bucket(setup):
    """Events whose per-frame row counts differ must not stack into one
    batch (grid change mid-window); odd event counts pad to a pow-2
    batch with discarded rows."""
    import jax.numpy as jnp

    from cogstream_tpu.runtime.session import (
        EventRecord, PendingFrame, StreamingSession, flush_event_reps)

    cfg, params, tok = setup
    s = StreamingSession(params, cfg, tok, max_len=512)
    H = cfg.text.hidden_size
    rng = np.random.default_rng(1)

    def pend(fid, merged, n_kept):
        return PendingFrame(
            fid, float(fid), rng.normal(size=(H,)).astype(np.float32),
            np.arange(n_kept, dtype=np.int64), 10 + fid,
            rng.normal(size=(merged, H)).astype(np.float32), n_kept)

    evs = []
    # same frame count + same FIRST frame rows, different totals
    for shapes in ((4, 4), (4, 16), (4, 4)):   # 3 events → K buckets to 4
        ev = EventRecord(frame_ids=[0, 1])
        frames = [pend(i, m, min(2, m)) for i, m in enumerate(shapes)]
        s._rep_pending.append((ev, frames))
        evs.append(ev)
    flush_event_reps([s])
    assert not s._rep_pending
    for ev in evs:
        assert ev.rep is not None and ev.rep.shape == (H,)
        assert np.isfinite(np.asarray(ev.rep)).all()


def test_kv_window_matches_unwindowed(setup):
    """kv_window bounds decode READS only: tokens and cache contents
    match the unwindowed run exactly, solo and pooled."""
    import jax.numpy as jnp

    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg, params, tok = setup
    text, tcfg = params["text"], cfg.text
    B, S, NEW, ML, W = 2, 16, 8, 4096, 1024
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 200, size=(B, S)).astype(np.int32)
    emb = qwen2.embed(text, jnp.asarray(ids))
    positions = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
    last = jnp.asarray([S - 1] * B, jnp.int32)

    # solo path
    ref = generate_tokens(text, emb, positions, last,
                          init_kv_cache(tcfg, B, ML),
                          jax.random.PRNGKey(0), tcfg, NEW, eos_id=-1)
    win = generate_tokens(text, emb, positions, last,
                          init_kv_cache(tcfg, B, ML),
                          jax.random.PRNGKey(0), tcfg, NEW, eos_id=-1,
                          kv_window=W)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(win.tokens))
    np.testing.assert_array_equal(np.asarray(ref.cache.pos),
                                  np.asarray(win.cache.pos))
    np.testing.assert_allclose(
        np.asarray(ref.cache.k[:, :, :S + NEW], np.float32),
        np.asarray(win.cache.k[:, :, :S + NEW], np.float32))

    # pooled path (per-row offsets + side-buffer merge)
    slots = np.stack([np.arange(o, o + S)
                      for o in (0, 37)]).astype(np.int64)
    ref_p = generate_tokens(text, emb, positions, last,
                            init_kv_cache(tcfg, B, ML),
                            jax.random.PRNGKey(0), tcfg, NEW, eos_id=-1,
                            write_slots=jnp.asarray(slots),
                            active=jnp.asarray([True] * B))
    win_p = generate_tokens(text, emb, positions, last,
                            init_kv_cache(tcfg, B, ML),
                            jax.random.PRNGKey(0), tcfg, NEW, eos_id=-1,
                            write_slots=jnp.asarray(slots),
                            active=jnp.asarray([True] * B),
                            kv_window=W)
    np.testing.assert_array_equal(np.asarray(ref_p.tokens),
                                  np.asarray(win_p.tokens))
    np.testing.assert_array_equal(np.asarray(ref_p.cache.pos),
                                  np.asarray(win_p.cache.pos))


def test_session_ask_with_active_window(setup):
    """A large-cache session (window engaged) answers identically to a
    small-cache session (window off) over the same content."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = setup
    rng = np.random.default_rng(5)
    pv = rng.integers(0, 255, (2 * 4 * 4, 3 * 14 * 14), dtype=np.uint8)

    big = StreamingSession(params, cfg, tok, max_len=8192,
                           summary_forward=False)
    assert big._kv_window(300) == 1024     # window active
    big.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    a = big.ask("what?", mode="AC", max_new_tokens=8)

    small = StreamingSession(params, cfg, tok, max_len=1024,
                             summary_forward=False)
    assert small._kv_window(300) is None   # window off
    small.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    b = small.ask("what?", mode="AC", max_new_tokens=8)
    assert a["text"] == b["text"]


def test_pool_on_tp_mesh_matches_unsharded(setup):
    """SessionPool(mesh=...) — params under TP specs, the shared cache
    rows on the data axis — answers a 2-row batched ask with exactly
    the unsharded pool's greedy texts."""
    from cogstream_tpu.parallel.mesh import make_mesh
    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    rng = np.random.default_rng(0)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    reqs = [(0, "what is happening?"), (1, "who is there?")]

    outs = []
    for mesh in (None, make_mesh(data_parallel=2, model_parallel=2,
                                 devices=jax.devices()[:4])):
        pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                           summary_forward=False, mesh=mesh)
        for r in (pool.open(), pool.open()):
            pool.ingest(r, pv, (t, gh, gw), 2, [0.0, 1.0])
        outs.append(pool.ask_batch(reqs, mode="AC", max_new_tokens=8))
    assert outs[0][0]["text"] == outs[1][0]["text"]
    assert outs[0][1]["text"] == outs[1][1]["text"]


def test_pool_nc_mode_masks_history(setup):
    """ask_batch(mode="NC") must match StreamingSession.ask's NC
    semantics — past turns INVISIBLE — not fall through to the
    everything-visible AC branch."""
    from cogstream_tpu.runtime.pool import SessionPool
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = setup
    rng = np.random.default_rng(3)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)

    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                       summary_forward=False)
    r = pool.open()
    pool.ingest(r, pv, (t, gh, gw), 2, [0.0, 1.0])
    pool.ask_batch([(r, "first question?")], mode="AC", max_new_tokens=6)
    got = pool.ask_batch([(r, "and now?")], mode="NC",
                         max_new_tokens=8)[r]

    solo = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    solo.append_stream_segment(pv, (t, gh, gw), 2, [0.0, 1.0])
    solo.ask("first question?", mode="AC", max_new_tokens=6)
    want = solo.ask("and now?", mode="NC", max_new_tokens=8)
    assert got["text"] == want["text"]


def test_pool_rows_sample_independently(setup):
    """Two rows asking the same question at temperature>0 must draw
    from DIFFERENT key streams (per-row rng seed)."""
    from cogstream_tpu.runtime.pool import SessionPool

    cfg, params, tok = setup
    pool = SessionPool(params, cfg, tok, n_rows=2, max_len=1024,
                       summary_forward=False)
    r0, r1 = pool.open(), pool.open()
    k0 = np.asarray(jax.random.key_data(pool.sessions[r0]._key))
    k1 = np.asarray(jax.random.key_data(pool.sessions[r1]._key))
    assert not np.array_equal(k0, k1)
