"""Training step + streaming session tests (tiny config, CPU mesh)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.config import CompressionConfig, LoRAConfig
from cogstream_tpu.models import qwen2
from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
from cogstream_tpu.models.lora import init_qwen2_lora
from cogstream_tpu.processor.tokenizer import ByteTokenizer
from cogstream_tpu.train.trainer import (
    bind_text_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def test_lora_text_train_step_reduces_loss(tiny_config):
    cfg = tiny_config.text
    lora_cfg = LoRAConfig(rank=4)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    lora = init_qwen2_lora(jax.random.PRNGKey(1), cfg, lora_cfg)

    rng = np.random.default_rng(0)
    B, S = 2, 32
    ids = rng.integers(3, 200, size=(B, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, : S // 2] = -100
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}

    tx = make_optimizer(learning_rate=5e-2, total_steps=20, warmup_steps=1)
    step = make_train_step(tx, bind_text_loss(cfg, lora_cfg), donate=False)
    state = init_train_state(tx, lora)

    losses = []
    for _ in range(8):
        state, loss = step(params, state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_constrained_loss_masks_vocab(tiny_config):
    from cogstream_tpu.train.trainer import masked_cross_entropy

    logits = jnp.zeros((1, 4, 10))
    labels = jnp.asarray([[-100, 2, 3, -100]])
    vm = np.zeros(10, bool)
    vm[[2, 3]] = True
    loss_con, n = masked_cross_entropy(logits, labels, jnp.asarray(vm))
    loss_fre, _ = masked_cross_entropy(logits, labels)
    # constrained: uniform over 2 allowed tokens → ln 2; free: ln 10
    assert np.isclose(float(loss_con), np.log(2), atol=1e-5)
    assert np.isclose(float(loss_fre), np.log(10), atol=1e-5)
    assert int(n) == 2


@pytest.fixture(scope="module")
def session_setup():
    from cogstream_tpu.config import CogReasonerConfig

    cfg = CogReasonerConfig.tiny()
    cfg = dataclasses.replace(
        cfg, compression=CompressionConfig(frames_per_event=2,
                                           keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    return cfg, params, tok


def test_streaming_session_turns(session_setup):
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=2048)
    rng = np.random.default_rng(0)

    t, gh, gw, ms = 2, 4, 4, 2
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (t, gh, gw), ms, timestamps=[0.0, 1.0])
    assert sess.total_frames == 2
    assert len(sess.events) == 1          # frames_per_event=2 → one event
    w0 = sess.write_index
    assert w0 > 0

    r1 = sess.ask("what is happening?", mode="AC", max_new_tokens=8)
    assert isinstance(r1["text"], str)
    assert sess.write_index > w0

    # second segment + FCC turn exercises selector + kv_allowed masking
    sess.append_stream_segment(pv, (t, gh, gw), ms, timestamps=[2.0, 3.0])
    r2 = sess.ask("and now?", mode="FCC", max_new_tokens=8)
    assert r2["turn"] == 1
    assert sess.hist_qs == ["what is happening?", "and now?"]
    # history tokens kept their slots: ranges are disjoint & ordered
    starts = [r.start for r in sess.ranges]
    assert starts == sorted(starts)
    ends = [r.end for r in sess.ranges]
    assert all(e <= s for e, s in zip(ends[:-1], starts[1:]))


def test_streaming_session_encoder_int8(session_setup):
    """encoder_int8=True: the session quantizes the vision tower to the
    W8A8 serving form at init and a full ingest+ask turn still runs."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=2048,
                            encoder_int8=True)
    assert isinstance(
        sess.params["vision"]["layers"][0]["attn"]["q"]["kernel"], dict)
    rng = np.random.default_rng(0)
    t, gh, gw, ms = 2, 4, 4, 2
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (t, gh, gw), ms, timestamps=[0.0, 1.0])
    r = sess.ask("what is happening?", mode="AC", max_new_tokens=8)
    assert isinstance(r["text"], str)


def test_session_event_pruning_mask(session_setup):
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    # force the pruning path: compression active from the 1st event and
    # every event scores below threshold=2.0 (cosine sim <= 1)
    cfg = dataclasses.replace(cfg, compression=dataclasses.replace(
        cfg.compression, min_events_for_compression=1,
        similarity_threshold=2.0))
    sess = StreamingSession(params, cfg, tok, max_len=2048)
    rng = np.random.default_rng(1)
    t, gh, gw = 4, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (t, gh, gw), 2,
                               timestamps=[0.0, 1.0, 2.0, 3.0])
    assert len(sess.events) == 2
    qids = np.asarray(tok.encode("test question"), np.int32)
    allowed = sess._allowed_mask(True, [], qids)
    # pruned events: keyframes stay full-res (shadow hidden), other
    # frames collapse to exactly their pooled shadow slot
    assert any(r.kind == "shadow" for r in sess.ranges)
    for ev in sess.events:
        assert sum(ev.keyframe_mask) == cfg.compression.keyframes_per_event
        for is_key, slots, shadow in zip(ev.keyframe_mask, ev.frame_slots,
                                         ev.shadow_slots):
            if is_key:
                assert allowed[np.asarray(slots, int)].all()
                assert not allowed[shadow]
            else:
                assert not allowed[np.asarray(slots, int)].any()
                assert allowed[shadow]
    # with if_visual=False every stream AND shadow slot is hidden
    blocked = sess._allowed_mask(False, [], qids)
    for r in sess.ranges:
        if r.kind in ("stream", "shadow"):
            assert not blocked[r.start:r.end].any()
    # nothing prunes when events score above threshold: full-res kept,
    # all shadows hidden
    lo = dataclasses.replace(cfg, compression=dataclasses.replace(
        cfg.compression, similarity_threshold=-2.0))
    sess.cfg = lo
    open_mask = sess._allowed_mask(True, [], qids)
    for ev in sess.events:
        for slots, shadow in zip(ev.frame_slots, ev.shadow_slots):
            assert open_mask[np.asarray(slots, int)].all()
            assert not open_mask[shadow]


def test_prefetched_question_rep_mask_parity(session_setup):
    """_prefetch_question_rep (the ask-path overlap that rides the
    question-rep + event-rep fetches under the selector's round trip)
    must yield the exact same visibility mask as the lazy path, and
    must populate every event's rep_host mirror."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    cfg = dataclasses.replace(cfg, compression=dataclasses.replace(
        cfg.compression, min_events_for_compression=1,
        similarity_threshold=2.0))
    sess = StreamingSession(params, cfg, tok, max_len=2048)
    rng = np.random.default_rng(3)
    t, gh, gw = 4, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (t, gh, gw), 2,
                               timestamps=[0.0, 1.0, 2.0, 3.0])
    qids = np.asarray(tok.encode("test question"), np.int32)
    pre = sess._prefetch_question_rep(qids)
    assert pre is not None
    lazy = sess._allowed_mask(True, [], qids)          # populates rep_host
    for ev in sess.events:
        ev.rep_host = None                             # force re-fetch
    eager = sess._allowed_mask(True, [], qids, prefetched=pre)
    np.testing.assert_array_equal(lazy, eager)
    assert all(ev.rep_host is not None for ev in sess.events)
    # below the compression floor the prefetch declines (returns None)
    hi = dataclasses.replace(cfg, compression=dataclasses.replace(
        cfg.compression, min_events_for_compression=99))
    sess.cfg = hi
    assert sess._prefetch_question_rep(qids) is None


def test_shadow_slot_holds_exact_pooled_token(session_setup):
    """The shadow slot's cached V must equal v_proj(rms_norm(pooled)),
    where pooled is the engine path's pool_minor_frames value — i.e. the
    pooled token entered the decoder EXACTLY (v depends only on the
    token's own embedding, so this checks input-embedding parity)."""
    from cogstream_tpu.models import cogreasoner
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=2048,
                            summary_forward=False)
    rng = np.random.default_rng(5)
    t, gh, gw, ms = 2, 4, 4, 2
    merged = (gh // ms) * (gw // ms)
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (t, gh, gw), ms, [0.0, 1.0])

    rows = t * gh * gw
    pad_rows = -(-rows // 1024) * 1024    # same bucket as ingest
    mm = cogreasoner.encode_images(
        params, pv, np.array([[t, gh, gw]]), np.array([ms]), cfg,
        pad_to=pad_rows)
    pooled = jnp.mean(mm[: t * merged].reshape(t, merged, -1), axis=1)

    shadow = [r for r in sess.ranges if r.kind == "shadow"][0]
    assert shadow.end - shadow.start == t
    layer0 = jax.tree.map(lambda x: x[0], params["text"]["layers"])
    h = qwen2.rms_norm(pooled.astype(cfg.text.jnp_dtype)[None],
                       layer0["input_norm"], cfg.text.rms_norm_eps)
    v = qwen2.dense(h, layer0["attn"]["v_proj"])[0].reshape(
        t, cfg.text.num_key_value_heads, cfg.text.head_dim)
    got = np.asarray(sess.cache.v[0, 0, shadow.start:shadow.end],
                     np.float32)
    np.testing.assert_allclose(got, np.asarray(v, np.float32),
                               rtol=2e-5, atol=2e-5)

    # shadow positions follow the segment's, consecutively
    pos = np.asarray(sess.cache.pos[0, shadow.start:shadow.end])
    stream = [r for r in sess.ranges if r.kind == "stream"][0]
    pos_stream_last = np.asarray(sess.cache.pos[0, stream.end - 1])
    assert (pos == pos_stream_last + 1 + np.arange(t)).all()


def test_session_compaction_and_eviction(session_setup):
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=2048,
                            summary_forward=False)
    rng = np.random.default_rng(2)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (t, gh, gw), 2, [0.0, 1.0])
    sess.ask("first question?", mode="AC", max_new_tokens=4)
    sess.append_stream_segment(pv, (t, gh, gw), 2, [2.0, 3.0])
    before = sess.write_index
    n_ranges = len(sess.ranges)

    # compact away the first QA turn; stream + system survive
    n_new = sess.compact(lambda r: not (r.kind in ("question", "answer")
                                        and r.turn == 0))
    assert n_new < before                     # pads + turn reclaimed
    assert sess.write_index == n_new
    kinds = [r.kind for r in sess.ranges]
    assert "question" not in kinds
    starts = [r.start for r in sess.ranges]
    assert starts == sorted(starts)
    # ranges are now back-to-back (no pad gaps)
    for a, b in zip(sess.ranges[:-1], sess.ranges[1:]):
        assert a.end == b.start
    # events survived with remapped slots inside the live region
    for ev in sess.events:
        for s in ev.frame_slots:
            assert (np.asarray(s) < n_new).all()

    # the session still answers after compaction
    r = sess.ask("still working?", mode="AC", max_new_tokens=4)
    assert isinstance(r["text"], str)


def test_session_eviction_makes_room(session_setup):
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=512,
                            summary_forward=False)
    rng = np.random.default_rng(3)
    t, gh, gw = 2, 4, 4
    pv = rng.normal(size=(t * gh * gw, 3 * 14 * 14)).astype(np.float32)
    # keep streaming far past the cache size — old segments must evict
    for seg in range(8):
        sess.append_stream_segment(pv, (t, gh, gw), 2,
                                   [2.0 * seg, 2.0 * seg + 1.0])
    assert sess.write_index <= 512
    r = sess.ask("what now?", mode="AC", max_new_tokens=4)
    assert isinstance(r["text"], str)
    assert sess.write_index <= 512


def test_session_reset_reuses_buffers(session_setup):
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    sess.ask("one?", mode="AC", max_new_tokens=4)
    assert sess.hist_qs
    sess.reset()
    assert sess.hist_qs == [] and sess.total_frames == 0
    assert len(sess.ranges) == 1 and sess.ranges[0].kind == "system"
    r = sess.ask("fresh?", mode="AC", max_new_tokens=4)
    assert r["turn"] == 0


def test_session_fp8_kv_cache(session_setup):
    import jax.numpy as jnp

    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False,
                            kv_dtype=jnp.float8_e4m3fn)
    assert sess.cache.k.dtype == jnp.float8_e4m3fn
    rng = np.random.default_rng(4)
    pv = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    r = sess.ask("what?", mode="AC", max_new_tokens=4)
    assert isinstance(r["text"], str)
    # fp8 path stays close to the fp32-cache reference on short ctx
    ref = StreamingSession(params, cfg, tok, max_len=1024,
                           summary_forward=False)
    ref.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    r2 = ref.ask("what?", mode="AC", max_new_tokens=4)
    assert isinstance(r2["text"], str)


def test_ask_stream_matches_ask(session_setup):
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    rng = np.random.default_rng(6)
    pv = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)

    ref = StreamingSession(params, cfg, tok, max_len=1024,
                           summary_forward=False)
    ref.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    want = ref.ask("what now?", mode="AC", max_new_tokens=24)

    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    sess.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    deltas = []
    final = None
    for item in sess.ask_stream("what now?", mode="AC",
                                max_new_tokens=24, chunk=8):
        if isinstance(item, dict):
            final = item
        else:
            deltas.append(item)
    assert final is not None
    assert "".join(deltas) == final["text"]
    # greedy streaming must equal the one-shot answer
    assert final["text"] == want["text"]
    # position bookkeeping must match ask() exactly — the terminal
    # sampled token is never fed back, so counting it would open a
    # 1-position RoPE gap per streamed turn
    assert sess.next_pos == ref.next_pos
    assert sess._wi == ref._wi
    # follow-up turn must also produce identical text on both paths
    want2 = ref.ask("and again?", mode="AC", max_new_tokens=8)
    r2 = sess.ask("and again?", mode="AC", max_new_tokens=8)
    assert r2["turn"] == 1
    assert r2["text"] == want2["text"]


def test_ask_stream_truncated_keeps_wi_in_sync(session_setup):
    """Truncation at max_new_tokens must not count a phantom
    continuation slot: host mirror == device write_index."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    # eos_id=2 from tiny config virtually never sampled at random init,
    # so max_new_tokens=16 with chunk=8 truncates at the cap
    for item in sess.ask_stream("count forever", mode="AC",
                                max_new_tokens=16, chunk=8):
        pass
    assert sess._wi == int(np.asarray(sess.cache.write_index))
    # next turn slots line up exactly
    r = sess.ask("next?", mode="AC", max_new_tokens=4)
    assert sess._wi == int(np.asarray(sess.cache.write_index))


def test_session_ingest_raw_uint8(session_setup):
    """End-to-end ingest with RAW uint8 pixel rows (device-side
    normalization): same slot layout as the float path and a working
    turn after."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 255, (2 * 4 * 4, 3 * 14 * 14), dtype=np.uint8)
    x = raw.reshape(raw.shape[0], 3, -1).astype(np.float32)
    normed = ((x * np.float32(1.0 / 255.0) - 0.5) / 0.5).reshape(
        raw.shape)

    s_u8 = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False)
    s_u8.append_stream_segment(raw, (2, 4, 4), 2, [0.0, 1.0])
    s_f = StreamingSession(params, cfg, tok, max_len=1024,
                           summary_forward=False)
    s_f.append_stream_segment(normed, (2, 4, 4), 2, [0.0, 1.0])
    assert [(r.kind, r.start, r.end) for r in s_u8.ranges] == \
        [(r.kind, r.start, r.end) for r in s_f.ranges]
    a = s_u8.ask("what?", mode="AC", max_new_tokens=8)
    b = s_f.ask("what?", mode="AC", max_new_tokens=8)
    assert a["text"] == b["text"]


def test_session_save_restore_continuity(session_setup, tmp_path):
    """A restored snapshot continues the conversation EXACTLY: same
    greedy answer, same slot bookkeeping, same RNG stream — serving
    restarts don't lose live streams."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    rng = np.random.default_rng(13)
    pv = rng.integers(0, 255, (2 * 4 * 4, 3 * 14 * 14), dtype=np.uint8)

    a = StreamingSession(params, cfg, tok, max_len=1024)
    a.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    a.ask("what happened?", mode="AC", max_new_tokens=8)
    path = str(tmp_path / "sess.npz")
    a.save(path)
    want = a.ask("and then?", mode="AC", max_new_tokens=8)

    b = StreamingSession(params, cfg, tok, max_len=1024)
    b.load_state(path)
    assert b.write_index == int(np.asarray(b.cache.write_index))
    assert b.hist_qs == ["what happened?"]
    assert len(b.events) == 1 and b.events[0].rep is not None
    got = b.ask("and then?", mode="AC", max_new_tokens=8)
    assert got["text"] == want["text"]
    assert got["cache_tokens"] == want["cache_tokens"]
    # a second segment after restore still ingests cleanly
    b.append_stream_segment(pv, (2, 4, 4), 2, [2.0, 3.0])
    assert b.total_frames == 4


def test_session_save_restore_fp8(session_setup, tmp_path):
    """Snapshot roundtrip with an extension-dtype (fp8) cache."""
    from cogstream_tpu.runtime.session import StreamingSession

    cfg, params, tok = session_setup
    s = StreamingSession(params, cfg, tok, max_len=512,
                         summary_forward=False,
                         kv_dtype=jnp.float8_e4m3fn)
    s.ask("hello?", mode="AC", max_new_tokens=4)
    path = str(tmp_path / "fp8.npz")
    s.save(path)
    r = StreamingSession(params, cfg, tok, max_len=512,
                         summary_forward=False,
                         kv_dtype=jnp.float8_e4m3fn)
    r.load_state(path)
    assert r.cache.k.dtype == jnp.float8_e4m3fn
    np.testing.assert_array_equal(
        np.asarray(r.cache.k[:, 0, :r.write_index], np.float32),
        np.asarray(s.cache.k[:, 0, :s.write_index], np.float32))
    out = r.ask("again?", mode="AC", max_new_tokens=4)
    assert out["turn"] == 1
