"""RUNTIME tests for the native ring decoder (native/videoio.cpp).

This image has no ffmpeg binary, so the compile-smoke test
(test_native_compile.py) was the only coverage until round 5. Here a
STUB ``ffmpeg`` executable (a tiny Python script on a prepended PATH)
feeds the ring/pipe machinery deterministic rawvideo, exercising the
paths the reference relies on decord/ffmpeg for
(processing_cogreasoner.py:156-160,362-407 / SURVEY.md N2-N3):
frame-exact delivery, EOF, partial trailing frames, ring back-pressure
and wraparound, decode-ahead buffering, and the mid-stream /
stalled-child close paths (the latter found a join-before-kill
deadlock in vio_close).
"""

import os
import stat
import threading
import time

import numpy as np
import pytest

from cogstream_tpu.processor import native_video

W, H = 32, 8
FRAME_BYTES = W * H * 3

# pure-stdlib stub: importing numpy costs ~2.5 s of interpreter startup
# on this 1-core box, which dominated every timing assertion
_STUB = """#!/usr/bin/env python3
import os, sys, time
mode = os.environ.get("STUB_MODE", "frames")
w = int(os.environ["STUB_W"]); h = int(os.environ["STUB_H"])
n = int(os.environ["STUB_N"])
out = sys.stdout.buffer
base = list(range(w * h * 3))
for i in range(n):
    out.write(bytes((j + i * 7) % 256 for j in base))
    out.flush()
if mode == "partial":
    out.write(b"\\x00" * (w * h * 3 // 2)); out.flush()
elif mode == "hang":
    time.sleep(3600)
"""


def _frame(i):
    return ((np.arange(FRAME_BYTES) + i * 7) % 256).astype(
        np.uint8).reshape(H, W, 3)


@pytest.fixture()
def stub_ffmpeg(tmp_path, monkeypatch):
    p = tmp_path / "ffmpeg"
    p.write_text(_STUB)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.setenv("STUB_W", str(W))
    monkeypatch.setenv("STUB_H", str(H))
    if native_video._load() is None:
        pytest.skip("native videoio library unavailable (no g++)")

    def set_mode(mode="frames", n=8):
        monkeypatch.setenv("STUB_MODE", mode)
        monkeypatch.setenv("STUB_N", str(n))
    return set_mode


def test_frames_bit_exact_and_eof(stub_ffmpeg):
    stub_ffmpeg("frames", n=6)
    s = native_video.NativeVideoStream("dummy.mp4", W, H, fps=1.0)
    got = list(s)
    assert len(got) == 6
    for i, f in enumerate(got):
        np.testing.assert_array_equal(f, _frame(i))


def test_partial_trailing_frame_dropped(stub_ffmpeg):
    stub_ffmpeg("partial", n=4)
    got = list(native_video.NativeVideoStream("d.mp4", W, H))
    assert len(got) == 4
    np.testing.assert_array_equal(got[-1], _frame(3))


def test_ring_backpressure_and_wrap(stub_ffmpeg):
    """More frames than ring slots: the reader must block on the full
    ring, wrap, and still deliver every frame in order."""
    stub_ffmpeg("frames", n=64)
    s = native_video.NativeVideoStream("d.mp4", W, H, ring_frames=4)
    time.sleep(0.3)            # let the reader fill the ring and block
    assert s.buffered <= 4
    got = list(s)
    assert len(got) == 64
    for i in (0, 3, 17, 63):
        np.testing.assert_array_equal(got[i], _frame(i))


def test_decode_ahead_buffering(stub_ffmpeg):
    """The ring fills while the consumer does nothing — the overlap the
    native path exists for."""
    stub_ffmpeg("frames", n=8)
    s = native_video.NativeVideoStream("d.mp4", W, H, ring_frames=8)
    deadline = time.monotonic() + 20.0
    while s.buffered < 8 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert s.buffered == 8
    s.close()


def test_midstream_close_returns_promptly(stub_ffmpeg):
    stub_ffmpeg("frames", n=1000)
    frames = native_video.decode_video("d.mp4", W, H, max_frames=3)
    assert frames.shape == (3, H, W, 3)


def test_stalled_child_close_no_deadlock(stub_ffmpeg):
    """A hung decoder (child alive, writing nothing) must not wedge
    close(): vio_close kills the child first so the reader's blocked
    read() returns."""
    stub_ffmpeg("hang", n=2)
    s = native_video.NativeVideoStream("d.mp4", W, H)
    f0 = next(s)
    np.testing.assert_array_equal(f0, _frame(0))
    done = threading.Event()

    def closer():
        s.close()
        done.set()

    t = threading.Thread(target=closer, daemon=True)
    t.start()
    assert done.wait(10.0), "vio_close deadlocked on a stalled child"


def test_missing_binary_open_fails_cleanly(tmp_path, monkeypatch):
    if native_video._load() is None:
        pytest.skip("native videoio library unavailable (no g++)")
    monkeypatch.setenv("PATH", str(tmp_path))   # no ffmpeg anywhere
    s = native_video.NativeVideoStream("d.mp4", W, H)
    # exec fails in the child (exit 127) -> pipe closes -> clean EOF
    assert list(s) == []
