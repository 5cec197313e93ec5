"""Video loading: cv2 fallback semantics + native ring decoder (when
ffmpeg exists) + frame-dir path (C2)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cogstream_tpu.processor import video_loader


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("v") / "c.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (128, 96))
    for i in range(60):   # 6 s @ 10 fps
        frame = np.full((96, 128, 3), i * 4 % 255, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_fps_resample_and_timestamps(clip):
    frames, ts, dur = video_loader.load_video(clip, fps=2, max_frames=64)
    assert 10 <= len(frames) <= 13          # ~6s * 2fps
    assert frames[0].shape[0] == 3          # CHW
    steps = np.diff(ts)
    assert np.allclose(steps, 0.5, atol=0.01)
    assert 5.5 <= dur <= 6.5


def test_trim_window(clip):
    frames, ts, _ = video_loader.load_video(clip, start_time=2.0,
                                            end_time=4.0, fps=1)
    assert 1 <= len(frames) <= 3
    assert all(2.0 <= t <= 4.0 for t in ts)


def test_max_frames_uniform_subsample(clip):
    frames, ts, _ = video_loader.load_video(clip, fps=10, max_frames=5)
    assert len(frames) == 5
    assert ts == sorted(ts)


def test_size_snapping(clip):
    frames, _, _ = video_loader.load_video(clip, fps=1, size=56,
                                           size_divisible=14)
    c, h, w = frames[0].shape
    assert h % 14 == 0 and w % 14 == 0
    assert min(h, w) >= 42


def test_temporal_factor_padding(clip):
    frames, ts, _ = video_loader.load_video(clip, fps=1, max_frames=64,
                                            temporal_factor=4)
    assert len(frames) % 4 == 0
    assert len(ts) == len(frames)


def test_frame_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(6):
        Image.fromarray(
            np.full((32, 48, 3), i * 40, np.uint8)).save(
            d / f"{i:04d}.jpg")
    frames, ts, dur = video_loader.load_video(str(d), fps=1,
                                              max_frames=4)
    assert len(frames) == 4


def test_missing_file_raises():
    with pytest.raises(Exception):
        video_loader.load_video("/nonexistent/nope.mp4")


@pytest.mark.skipif(not video_loader.have_ffmpeg(),
                    reason="no ffmpeg binary on this host")
def test_native_ring_decoder(clip):
    from cogstream_tpu.processor.native_video import (
        decode_video, is_available)

    if not is_available():
        pytest.skip("native lib unavailable")
    frames = decode_video(clip, 128, 96, fps=5)
    assert frames.shape[1:] == (96, 128, 3)
    assert len(frames) >= 25


def test_trim_keeps_whole_second_labels_and_duration(clip):
    """ffmpeg-path parity on the cv2 fallback: trim shifts which
    instants are SAMPLED, but labels stay on the whole-second grid from
    start_time and the returned duration ignores the trim (the
    reference labels arange(start, start+duration) after setpts,
    processing_cogreasoner.py:411)."""
    frames, ts, dur = video_loader.load_video(clip, fps=1, trim_time=0.3)
    assert ts == [float(i) for i in range(len(ts))]   # 0,1,2,... not 0.3,...
    assert 5.5 <= dur <= 6.5                          # NOT reduced by trim
    # trim drops roughly the head instant's worth of samples, not more
    assert len(frames) >= 5


def test_duration_full_file_with_start_only(clip):
    """start_time without end_time returns the FULL file duration (the
    reference subtracts only the stream-start clamp delta) — both
    backends must agree or cross-segment trim alignment skews."""
    _, _, dur = video_loader.load_video(clip, start_time=2.0, fps=1)
    assert 5.5 <= dur <= 6.5


def test_temporal_factor_pads_full_block_on_multiple():
    """Reference parity: len % tf == 0 still pads a FULL tf block
    (pad = tf - len % tf, ref :421-424)."""
    f = [np.zeros((3, 4, 4), np.uint8)] * 4
    frames, ts = video_loader.temporal_pad(list(f), [0.0, 1.0, 2.0, 3.0],
                                           temporal_factor=2, step=1.0)
    assert len(frames) == 6 and ts[-1] == 5.0
    frames, ts = video_loader.temporal_pad(list(f)[:3], [0.0, 1.0, 2.0],
                                           temporal_factor=2, step=1.0)
    assert len(frames) == 4


def test_frame_dir_honors_fps(tmp_path):
    from PIL import Image

    d = tmp_path / "frames2"
    d.mkdir()
    for i in range(6):
        Image.fromarray(
            np.full((32, 48, 3), i * 40, np.uint8)).save(
            d / f"{i:04d}.jpg")
    _, ts, dur = video_loader.load_video(str(d), fps=1, max_frames=64)
    assert ts == [float(i) for i in range(6)]      # 1 fps grid, not 3
    assert dur == 6.0


def test_cv2_plan_shared_with_stream(clip):
    """The chunked cv2 stream and the buffered loader must select the
    SAME frames and labels (one shared cv2_frame_plan)."""
    from cogstream_tpu.processor.frame_stream import open_frame_stream

    if video_loader.have_ffmpeg():
        pytest.skip("cv2 is not this host's buffered backend")
    frames, ts, _ = video_loader.load_video(clip, fps=2, max_frames=64)
    stream = open_frame_stream(clip, fps=2, chunk_frames=4, max_frames=64)
    assert stream is not None
    got_ts = []
    for chunk, chunk_ts in stream:
        got_ts.extend(chunk_ts)
    assert got_ts == ts


@pytest.fixture(scope="module")
def long_clip(tmp_path_factory):
    """Distinct-content 40 fps clip long enough that sparse sampling
    crosses the SEEK_MIN_STRIDE threshold."""
    path = str(tmp_path_factory.mktemp("v2") / "long.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 40,
                        (128, 96))
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (96, 128, 3), np.uint8)
    for i in range(400):   # 10 s @ 40 fps
        f = base.copy()
        f[:16, :16] = (i * 3) % 255
        f[16:32, :16] = (i * 7) % 255
        w.write(f)
    w.release()
    return path


def test_seek_access_matches_sequential(long_clip):
    """Sparse sampling seeks with CAP_PROP_POS_FRAMES; the frames must
    be bit-identical to the sequential grab/retrieve walk (the parity
    guard for the seek escalation in cv2_iter_wanted)."""
    src_idx = np.arange(0, 400, 40)   # stride 40 >= SEEK_MIN_STRIDE
    assert src_idx[1] - src_idx[0] >= video_loader.SEEK_MIN_STRIDE

    def collect(allow_seek):
        cap = cv2.VideoCapture(long_clip)
        out = {p: f.copy() for p, f in
               video_loader.cv2_iter_wanted(cap, src_idx,
                                            allow_seek=allow_seek)}
        cap.release()
        return out

    seq, skp = collect(False), collect(True)
    assert sorted(seq) == sorted(skp) == list(range(len(src_idx)))
    for p in seq:
        assert np.array_equal(seq[p], skp[p]), p


def test_seek_not_engaged_for_dense_sampling(long_clip, monkeypatch):
    """Dense strides stay on the (faster-at-this-stride) sequential
    walk — seeking must not engage below the threshold."""
    calls = []
    real_cap = cv2.VideoCapture

    class SpyCap:
        def __init__(self, path):
            self._c = real_cap(path)

        def set(self, prop, val):
            calls.append((prop, val))
            return self._c.set(prop, val)

        def __getattr__(self, k):
            return getattr(self._c, k)

    cap = SpyCap(long_clip)
    src_idx = np.arange(0, 400, 8)   # stride 8 < SEEK_MIN_STRIDE
    n = sum(1 for _ in video_loader.cv2_iter_wanted(cap, src_idx))
    cap._c.release()
    assert n == len(src_idx)
    assert not calls


def test_duplicate_wanted_indices_with_seek(long_clip):
    """fps above source rate wants the same frame repeatedly; the seek
    path must yield every duplicate without re-seeking per entry."""
    src_idx = np.asarray([0, 0, 40, 40, 40, 80])
    cap = cv2.VideoCapture(long_clip)
    got = list(video_loader.cv2_iter_wanted(cap, src_idx))
    cap.release()
    assert [p for p, _ in got] == list(range(6))
    assert np.array_equal(got[0][1], got[1][1])
    assert np.array_equal(got[2][1], got[3][1])


def test_seek_path_skips_failed_reads(long_clip):
    """A wanted frame whose post-seek read fails must be SKIPPED (its
    entries dropped) — the same corrupt-frame semantics the sequential
    walk has — and later wanted frames must still arrive."""
    real = cv2.VideoCapture(long_clip)

    class FailAt:
        def __init__(self, cap, fail_target):
            self._c = cap
            self._fail = fail_target
            self._last_seek = None

        def set(self, prop, val):
            self._last_seek = int(val)
            return self._c.set(prop, val)

        def read(self):
            if self._last_seek == self._fail:
                return False, None
            return self._c.read()

        def __getattr__(self, k):
            return getattr(self._c, k)

    src_idx = np.arange(0, 400, 40)       # seek path (stride 40)
    cap = FailAt(real, 120)
    got = list(video_loader.cv2_iter_wanted(cap, src_idx))
    real.release()
    want_positions = [p for p in range(len(src_idx))
                      if src_idx[p] != 120]
    assert [p for p, _ in got] == want_positions
