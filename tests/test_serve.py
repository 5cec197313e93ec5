"""HTTP serving front-end: end-to-end over localhost with the tiny model."""

import dataclasses
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import jax
import pytest


@pytest.fixture(scope="module")
def server_port():
    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer, make_handler

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=2048,
                           use_pallas=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_serve_session_ask(server_port):
    port = server_port
    r = _post(port, "/session", {"session_id": "t1"})
    assert r["session_id"] == "t1"
    # text-only ask (no video ingested yet)
    r = _post(port, "/ask", {"session_id": "t1", "question": "hello?",
                             "mode": "AC", "max_new_tokens": 4})
    assert "text" in r and r["turn"] == 0

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["ask"]["n"] == 1


def test_serve_errors(server_port):
    port = server_port
    # missing field → 400
    try:
        _post(port, "/ask", {"session_id": "t1"})
        assert False, "should have raised"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown session → 404
    try:
        _post(port, "/ask", {"session_id": "nope", "question": "x"})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


import urllib.error  # noqa: E402  (used in test above)


def test_pooled_server_concurrent_asks():
    """Two concurrent /ask requests over a pooled server batch into one
    decode and both return."""
    import dataclasses
    import threading as th

    import jax

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=1024,
                           use_pallas=False, pool_rows=2)
    server.create("a")
    server.create("b")

    results = {}

    def run(sid, q):
        results[sid] = server.ask(sid, q, mode="AC", max_new_tokens=4)

    t1 = th.Thread(target=run, args=("a", "first?"))
    t2 = th.Thread(target=run, args=("b", "second?"))
    t1.start(); t2.start()
    t1.join(timeout=300); t2.join(timeout=300)
    assert set(results) == {"a", "b"}
    assert all("text" in r for r in results.values())
    # follow-up turn on one session still consistent
    r2 = server.ask("a", "again?", mode="AC", max_new_tokens=4)
    assert r2["turn"] == 1


def test_ask_stream_endpoint(server_port):
    """Chunked /ask_stream: text deltas then 0x1e + JSON meta."""
    port = server_port
    _post(port, "/session", {"session_id": "s"})
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/ask_stream",
        data=json.dumps({"session_id": "s", "question": "hello?",
                         "mode": "AC", "max_new_tokens": 8}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        raw = r.read()
    assert b"\x1e" in raw
    text, meta = raw.rsplit(b"\x1e", 1)
    meta = json.loads(meta)
    assert meta["text"] == text.decode()
    assert meta["turn"] == 0


def test_pooled_server_concurrent_ingest_and_stream():
    """Concurrent ingests coalesce through the frontend into the fused
    batched path; pooled sessions stream incrementally."""
    import dataclasses
    import threading as th

    import jax

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=1024,
                           use_pallas=False, pool_rows=2)
    server.create("a")
    server.create("b")
    rng = np.random.default_rng(0)
    pv = rng.integers(0, 255, (2 * 4 * 4, 3 * 14 * 14), dtype=np.uint8)

    def ingest(sid):
        server.frontend.ingest(server._row_of[sid], pv, (2, 4, 4), 2,
                               [0.0, 1.0])

    t1 = th.Thread(target=ingest, args=("a",))
    t2 = th.Thread(target=ingest, args=("b",))
    t1.start(); t2.start()
    t1.join(timeout=300); t2.join(timeout=300)
    assert server.sessions["a"].total_frames == 2
    assert server.sessions["b"].total_frames == 2

    # pooled streaming: incremental deltas, then the result dict
    items = list(server.ask_stream("a", "what is happening?", mode="AC",
                                   max_new_tokens=12))
    final = items[-1]
    assert isinstance(final, dict)
    assert "".join(items[:-1]) == final["text"]
    # batched ask on the other row still consistent afterwards
    r = server.ask("b", "and here?", mode="AC", max_new_tokens=4)
    assert r["turn"] == 0


def test_restore_twice_does_not_leak_rows(tmp_path):
    import dataclasses

    import jax

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=512,
                           use_pallas=False, pool_rows=2)
    server.create("a")
    path = str(tmp_path / "a.npz")
    server.save_session("a", path)
    # retried restores over the same id must release the old row
    for _ in range(3):
        server.restore_session("a", path)
    assert len(server.pool.sessions) == 1
    server.create("b")     # a free row still exists
    assert len(server.pool.sessions) == 2


def test_pool_row_lifecycle_no_leaks():
    """Row accounting under retries/failures: duplicate create releases
    the old row; a failed restore is transactional (original session
    intact, no row leaked)."""
    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=512,
                           use_pallas=False, pool_rows=2)

    # retried create over the same id must not burn rows
    for _ in range(4):
        server.create("a")
    assert len(server.pool.sessions) == 1

    # minted ids are unique under the lock (no len()-based collision)
    sid = server.create()["session_id"]
    assert sid != "a" and sid in server.sessions
    assert len(server.pool.sessions) == 2

    # failed restore: transactional — nothing leaked, old session alive
    old_row = server._row_of["a"]
    with pytest.raises(Exception):
        server.restore_session("a", "/nonexistent/snapshot.npz")
    assert server._row_of["a"] == old_row
    assert len(server.pool.sessions) == 2
    r = server.ask("a", "still alive?", mode="AC", max_new_tokens=4)
    assert isinstance(r["text"], str)


def test_ingest_preprocess_worker_error_propagates(tmp_path, monkeypatch):
    """A failure inside the preprocess-ahead worker thread (resize,
    device_put, mask) must surface as the ingest call's exception —
    not hang the chunk queue or silently truncate the stream."""
    cv2 = pytest.importorskip("cv2")
    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor import image_processor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=2048,
                           use_pallas=False, ingest_chunk_frames=2)
    server.create("x")

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(60):   # 6 s → 3 chunks at 2 frames/chunk, 1 fps
        w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    w.release()

    calls = {"n": 0}
    orig = image_processor.ImageProcessor.__call__

    def boom(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:      # fail on the SECOND chunk, mid-stream
            raise RuntimeError("preprocess exploded")
        return orig(self, *a, **kw)

    monkeypatch.setattr(image_processor.ImageProcessor, "__call__", boom)
    with pytest.raises(RuntimeError, match="preprocess exploded"):
        server.ingest("x", path, start=0.0, end=6.0, fps=1.0)
    # the server stays usable afterwards (no wedged queue/lock)
    monkeypatch.setattr(image_processor.ImageProcessor, "__call__", orig)
    r = server.ingest("x", path, start=0.0, end=2.0, fps=1.0)
    assert r["frames"] >= 2


def test_ingest_rows_cap_splits_dispatches_same_stream():
    """ingest_rows_cap sub-chunking (the axon large-program fault
    mitigation): a capped server ingests the same video through MORE,
    smaller encode dispatches but lands the same stream — same frame
    count, events still seal, asks still answer. (Exact cache_tokens
    may differ: each append pads to its own bucket.)"""
    import dataclasses
    import os
    import tempfile

    import cv2

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)

    with tempfile.TemporaryDirectory() as td:
        video = os.path.join(td, "clip.mp4")
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                            (64, 64))
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (64, 64, 3), np.uint8)
        for i in range(8 * 8):
            f = base.copy()
            f[:16, :16] = (i * 7) % 255
            w.write(f)
        w.release()

        results = {}
        for name, cap in (("raw", 0), ("capped", 1)):
            # cap=1 row → max_t clamps to 1 frame per dispatch (the
            # most aggressive split possible)
            srv = SessionServer(params, cfg, tok, max_len=2048,
                                use_pallas=False,
                                ingest_chunk_frames=4,
                                ingest_rows_cap=cap)
            srv.create("s")
            r = srv.ingest("s", video, 0.0, 8.0, 1.0)
            sess = srv.sessions["s"]
            a = srv.ask("s", "what happened?", "AC", 4)
            results[name] = (r["frames"], sess.total_frames,
                             len(sess.events), a["turn"])
        assert results["raw"][0] == results["capped"][0] == 8
        assert results["raw"][1] == results["capped"][1]
        assert results["raw"][2] == results["capped"][2]
        assert results["capped"][3] == 0
