"""32k-window StreamingSession composition (VERDICT r4 missing #2).

The axon backend cannot compile any single program with a 32768-token
sequence (STATUS.md round 4), so deep sessions must compose from
<=16k-token programs: chunked prefill through the position-tagged
cache (exact — chunk N+1 attends back through the cache) plus bucketed
decode windows. These tests prove the composition logic at CPU scale
(a shrunk ``max_prefill_chunk``) and exercise a real 32k-deep window.

Reference: the model is a 32,768-token LM (config.json:17
max_position_embeddings); the reference serves it as one monolithic
torch forward.
"""

import numpy as np
import jax
import pytest

from cogstream_tpu.runtime.session import StreamingSession

_CACHE = {}


def _demo_session(max_len=4096, **kw):
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer

    if "cfg" not in _CACHE:
        _CACHE["cfg"] = CogReasonerConfig.tiny()
        _CACHE["params"] = init_cogreasoner_params(
            jax.random.PRNGKey(0), _CACHE["cfg"])
    cfg = _CACHE["cfg"]
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    return StreamingSession(_CACHE["params"], cfg, tok,
                            max_len=max_len, **kw), tok


def test_chunked_prefill_exact():
    """A long text prefill split into chunk programs produces the same
    cache contents, ranges, and answers as the monolithic program."""
    sess_a, tok = _demo_session()
    sess_b, _ = _demo_session()
    sess_b.max_prefill_chunk = 96    # force splitting (bucket multiple)

    ids = np.asarray((tok.encode("All work and no play makes Jack "
                                 "a dull boy. ") * 40)[:300], np.int32)
    ra = sess_a._prefill_text(ids, kind="qa")
    rb = sess_b._prefill_text(ids, kind="qa")
    assert (ra.start, ra.end) == (rb.start, rb.end)
    assert sess_a.next_pos == sess_b.next_pos

    ca, cb = sess_a.cache, sess_b.cache
    np.testing.assert_array_equal(np.asarray(ca.pos), np.asarray(cb.pos))
    # real slots hold identical K/V (pad slots differ: the chunked
    # variant bucketed differently — they are invisible, pos -1)
    live = np.asarray(ca.pos)[0] >= 0
    np.testing.assert_allclose(
        np.asarray(ca.k, np.float32)[:, :, live],
        np.asarray(cb.k, np.float32)[:, :, live], rtol=2e-2, atol=2e-2)

    # identical greedy answers on top of either cache
    ans_a = sess_a.ask("What does Jack do?", mode="NC",
                       max_new_tokens=8, temperature=0.0)
    ans_b = sess_b.ask("What does Jack do?", mode="NC",
                       max_new_tokens=8, temperature=0.0)
    assert ans_a == ans_b


def test_chunk_tail_bucketing():
    """Full chunks are bucket multiples — the composite range must be
    slot-contiguous with only the TAIL bucket padded."""
    sess, tok = _demo_session()
    sess.max_prefill_chunk = 64
    wi0 = sess.write_index
    ids = np.arange(150, dtype=np.int32) % 50 + 10
    r = sess._prefill_text(ids, kind="qa")
    assert r.start == wi0 and r.end == wi0 + 150
    # 64 + 64 + bucket(22) = 160 slots consumed
    assert sess.write_index == wi0 + 64 + 64 + 32
    pos = np.asarray(sess.cache.pos)[0]
    assert (pos[r.start:r.end] >= 0).all()
    assert (pos[r.end:sess.write_index] == -1).all()


def test_kv_window_deep():
    f = StreamingSession.kv_window_for
    # <=16k caches: behavior unchanged (halving windows only)
    assert f(3000, 16384) == 3072
    assert f(10000, 16384) is None
    # 32k caches: fine windows below 16k, coarse 4096-step above,
    # full-cache reads only at the very top
    assert f(3000, 32768) == 3072
    assert f(17000, 32768) == 20480
    assert f(24100, 32768) == 24576
    assert f(31000, 32768) is None


@pytest.mark.slow
def test_session_32k_window():
    """A real max_len=32768 session: drive the cache past the 16k
    single-program boundary with chunked prefills, then ask — the
    deep-window decode path (kv_window > 16k) must produce a sane
    turn and an intact position stream."""
    sess, tok = _demo_session(max_len=32768)
    # 17.5k tokens of history through the chunk composition
    ids = np.asarray((tok.encode("The quick brown fox jumps over the "
                                 "lazy dog. ") * 2000)[:17500], np.int32)
    sess._prefill_text(ids, kind="qa")
    assert sess.write_index > 16384
    w = sess._kv_window(sess.write_index + 64 + 32)
    assert w is not None and 16384 < w < 32768
    ans = sess.ask("What jumps?", mode="NC", max_new_tokens=8,
                   temperature=0.0)
    assert isinstance(ans, str)
    pos = np.asarray(sess.cache.pos)[0]
    live = pos[pos >= 0]
    # position stream is strictly increasing across the chunk seams
    assert (np.diff(live) > 0).all()
    assert live.max() >= 17500
