"""Chunked decode-ahead frame streaming (N2 integration): backend
parity with the buffered loader, back-pressure, and the serving ingest
path through the ring."""

import dataclasses
import time

import numpy as np
import pytest

from cogstream_tpu.processor import video_loader
from cogstream_tpu.processor.frame_stream import open_frame_stream


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("fs") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(7)
    for i in range(80):   # 8 s at 10 fps
        frame = rng.integers(0, 255, (48, 64, 3), np.uint8)
        frame[:8, :8] = i * 3  # deterministic marker
        w.write(frame)
    w.release()
    return path


def _collect(stream):
    # chunks are HWC; transpose to CHW for comparison with load_video
    frames, ts = [], []
    for chunk, t in stream:
        assert chunk.dtype == np.uint8 and chunk.shape[3] == 3
        frames.extend(f.transpose(2, 0, 1) for f in chunk)
        ts.extend(t)
    return frames, ts


def test_chunk_stream_matches_buffered_loader(clip):
    """The chunked stream yields the same frames/timestamps the
    buffered load_video path decodes."""
    ref_frames, ref_ts, _ = video_loader.load_video(
        clip, fps=2.0, max_frames=128)
    stream = open_frame_stream(clip, fps=2.0, chunk_frames=5,
                               max_frames=128)
    assert stream is not None
    frames, ts = _collect(stream)
    assert len(frames) == len(ref_frames)
    assert ts == pytest.approx(ref_ts)
    for a, b in zip(frames, ref_frames):
        assert np.array_equal(a, b)
    assert stream.frames_seen == len(frames)


def test_chunk_stream_trim_window(clip):
    ref_frames, ref_ts, _ = video_loader.load_video(
        clip, start_time=2.0, end_time=6.0, fps=2.0)
    stream = open_frame_stream(clip, start=2.0, end=6.0, fps=2.0,
                               chunk_frames=3)
    frames, ts = _collect(stream)
    assert len(frames) == len(ref_frames)
    assert ts == pytest.approx(ref_ts)
    for a, b in zip(frames, ref_frames):
        assert np.array_equal(a, b)


def test_chunk_stream_max_frames_subsample(clip):
    """Pre-selected indices equal load_video's post-hoc subsample."""
    ref_frames, ref_ts, _ = video_loader.load_video(
        clip, fps=10.0, max_frames=12)
    stream = open_frame_stream(clip, fps=10.0, chunk_frames=4,
                               max_frames=12)
    if video_loader.have_ffmpeg() and stream.backend == "cv2-thread":
        # max_frames forces the cv2 backend while load_video used
        # ffmpeg — different decoders, bit parity not defined
        stream.close()
        pytest.skip("decoder mismatch on ffmpeg hosts")
    frames, ts = _collect(stream)
    assert len(frames) == len(ref_frames) == 12
    assert ts == pytest.approx(ref_ts)
    for a, b in zip(frames, ref_frames):
        assert np.array_equal(a, b)


def test_decode_runs_ahead_of_slow_consumer(clip):
    """With a slow consumer the decoder buffers ahead (the overlap the
    reference gets from decord's threading)."""
    stream = open_frame_stream(clip, fps=10.0, chunk_frames=2,
                               ring_frames=8)
    lead = 0
    for _ in stream:
        time.sleep(0.05)     # pretend the TPU is busy encoding
        lead = max(lead, stream.buffered)
    assert lead > 0
    assert stream.buffered_max >= lead


def test_early_close_no_hang(clip):
    stream = open_frame_stream(clip, fps=10.0, chunk_frames=4,
                               ring_frames=4)
    next(iter(stream))
    t0 = time.time()
    stream.close()           # reader thread must unblock from full ring
    assert time.time() - t0 < 3.0


def test_frame_dir_returns_none(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    assert open_frame_stream(str(d)) is None


def test_serving_ingest_through_chunked_stream(clip):
    """SessionServer.ingest streams the segment through the decode-ahead
    path chunk by chunk; the session cache fills and the response
    carries the overlap diagnostics."""
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
    server = SessionServer(params, cfg, tok, max_len=2048,
                           use_pallas=False, ingest_chunk_frames=3)
    server.create("s1")
    r = server.ingest("s1", clip, start=0.0, end=6.0, fps=1.0)
    assert r["frames"] == 6
    assert r["cache_tokens"] > 0
    assert r["decode_backend"] in ("cv2-thread", "native-ring")
    assert r["decode_buffered_max"] >= 0
    # a question over the ingested stream still works
    out = server.ask("s1", "what happened?", mode="AC",
                     max_new_tokens=4)
    assert "text" in out

    # chunked ingest must match an unchunked one in visual token count:
    # the pinned whole-window resize target gives every chunk one grid
    server2 = SessionServer(params, cfg, tok, max_len=2048,
                            use_pallas=False, ingest_chunk_frames=64)
    server2.create("s1")
    r2 = server2.ingest("s1", clip, start=0.0, end=6.0, fps=1.0)
    assert r2["frames"] == 6
    sess1 = server.sessions["s1"]
    sess2 = server2.sessions["s1"]
    img1 = sum(r.end - r.start for r in sess1.ranges
               if r.kind == "shadow")
    img2 = sum(r.end - r.start for r in sess2.ranges
               if r.kind == "shadow")
    assert img1 == img2      # same frame count ingested


def test_pooled_serving_ingest_through_chunked_stream(clip):
    """Pooled rows ingest through the chunked stream too: each chunk
    rides the batching frontend into the fused pool dispatch."""
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
    server = SessionServer(params, cfg, tok, max_len=2048,
                           use_pallas=False, pool_rows=2,
                           ingest_chunk_frames=3)
    server.create("p1")
    r = server.ingest("p1", clip, start=0.0, end=5.0, fps=1.0)
    assert r["frames"] == 5
    assert r["cache_tokens"] > 0
    assert r["decode_backend"] in ("cv2-thread", "native-ring")
    out = server.ask("p1", "anything?", mode="AC", max_new_tokens=4)
    assert "text" in out
    # the collector thread is a daemon; it dies with the process
