"""Host-side video decode (C2).

The reference decodes with an ffmpeg subprocess pipe (fps filter +
scale + rawvideo, processing_cogreasoner.py:326-429) with decord/gif
fallbacks. On TPU hosts the same ffmpeg path is the right call — decode
stays on CPU and overlaps with TPU compute — so this module shells out
to the ffmpeg binary directly (no ffmpeg-python dependency) and falls
back to a frame-directory reader for tests/datasets of extracted frames.

Output contract matches the reference: ``(frames [T][3,H,W] uint8,
timestamps [T] seconds, duration)`` with fps sampling, uniform fallback
to ``max_frames``, and optional temporal-factor padding.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_FFMPEG = shutil.which("ffmpeg")
_FFPROBE = shutil.which("ffprobe")


def have_ffmpeg() -> bool:
    return _FFMPEG is not None and _FFPROBE is not None


def probe_video(path: str) -> dict:
    out = subprocess.run(
        [_FFPROBE, "-v", "error", "-print_format", "json",
         "-show_format", "-show_streams", path],
        capture_output=True, check=True)
    return json.loads(out.stdout)


def _video_stream(info: dict) -> dict:
    for s in info["streams"]:
        if s.get("codec_type") == "video":
            return s
    raise ValueError("no video stream")


def load_video(
    video_path: str,
    start_time: Optional[float] = None,
    end_time: Optional[float] = None,
    fps: Optional[float] = 1.0,
    max_frames: Optional[int] = 128,
    size: Optional[int] = None,
    size_divisible: int = 1,
    temporal_factor: int = 1,
    trim_time: float = 0.0,
) -> Tuple[List[np.ndarray], List[float], float]:
    """Decode frames at ``fps`` with optional trim/scale.

    Mirrors the reference decode semantics (processing_cogreasoner.py:
    326-429): seek via input-side ss/t, optional head-trim, fps filter
    with round=up, optional shortest-side scale snapped to
    ``size_divisible``, uniform subsample to ``max_frames``, timestamps
    spaced 1/fps from start_time.
    """
    if os.path.isdir(video_path):
        return _load_frame_dir(video_path, fps=fps, max_frames=max_frames)
    if not have_ffmpeg():
        # OpenCV fallback (its bundled decoder) — same contract
        return _load_video_cv2(video_path, start_time, end_time, fps,
                               max_frames, size, size_divisible,
                               temporal_factor, trim_time)

    info = probe_video(video_path)
    duration = float(info["format"]["duration"])
    vs = _video_stream(info)
    w, h = int(vs["width"]), int(vs["height"])
    stream_start = float(vs.get("start_time", 0.0) or 0.0)

    do_trim = start_time is not None or end_time is not None
    if start_time is not None:
        new_start = max(stream_start, start_time)
        duration -= new_start - start_time
        start_time = new_start
    else:
        start_time = stream_start
    if end_time is not None:
        duration = min(duration, end_time - start_time)

    if size is not None:
        scale = size / min(w, h)
        new_w, new_h = round(w * scale), round(h * scale)
    else:
        new_w, new_h = w, h
    new_w = new_w // size_divisible * size_divisible
    new_h = new_h // size_divisible * size_divisible

    frames = _decode_native_ring(video_path, new_w, new_h, w, h, fps,
                                 start_time, duration, do_trim, trim_time)
    if frames is None:
        cmd = [_FFMPEG, "-nostdin", "-v", "error"]
        if do_trim:
            cmd += ["-ss", str(start_time), "-t", str(duration)]
        cmd += ["-i", video_path]

        filters = []
        if trim_time > 0:
            end = math.floor(duration - trim_time) + trim_time
            filters.append(f"trim=start={trim_time}:end={end}")
            filters.append("setpts=PTS-STARTPTS")
        if fps is not None:
            filters.append(f"fps=fps={fps}:round=up")
        if new_w != w or new_h != h:
            filters.append(f"scale={new_w}:{new_h}")
        if filters:
            cmd += ["-vf", ",".join(filters)]
        cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:"]

        out = subprocess.run(cmd, capture_output=True, check=True).stdout
        n = len(out) // (new_h * new_w * 3)
        frames = np.frombuffer(
            out[: n * new_h * new_w * 3], np.uint8).reshape(
            n, new_h, new_w, 3).transpose(0, 3, 1, 2)

    if fps is not None:
        timestamps = np.arange(start_time, start_time + duration + 1 / fps,
                               1 / fps)[:len(frames)]
    else:
        timestamps = np.linspace(start_time, start_time + duration,
                                 len(frames))

    if max_frames is not None and len(frames) > max_frames:
        idx = np.linspace(0, len(frames) - 1, max_frames, dtype=int)
        frames = frames[idx]
        timestamps = timestamps[idx]

    frames = list(frames)
    timestamps = [float(t) for t in timestamps]
    frames, timestamps = temporal_pad(frames, timestamps,
                                      temporal_factor, 1 / (fps or 1.0))
    return frames, timestamps, duration


def _decode_native_ring(video_path, new_w, new_h, src_w, src_h, fps,
                        start_time, duration, do_trim, trim_time):
    """Decode via the C++ ffmpeg-pipe ring (native/videoio.cpp) when the
    library is available: the decode thread runs AHEAD of the Python
    copy loop instead of buffering the whole segment's rawvideo bytes
    (the decord role, SURVEY.md §2.2 N2). The ring's ffmpeg args mirror
    this module's subprocess command, so frames are bit-identical.
    Returns None (→ subprocess fallback) for the trim_time filter, which
    the ring does not implement."""
    if trim_time > 0:
        return None
    try:
        from . import native_video

        if not native_video.is_available():
            return None
        scale = (new_w != src_w or new_h != src_h)
        out = native_video.decode_video(
            video_path, new_w, new_h, fps or 0.0,
            start_time if do_trim else 0.0,
            (start_time + duration) if do_trim else 0.0,
            apply_scale=scale)
        return out.transpose(0, 3, 1, 2)
    except Exception:
        return None


def cv2_source_count(cap) -> Tuple[int, float]:
    """(frame count, source fps) for a cv2 capture, counting by grab()
    when the container reports 0 frames (some codecs/streams do while
    still decoding fine — trusting the 0 would silently truncate the
    video to one frame). Counting rewinds the capture via re-open, so
    call before any read."""
    import cv2

    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    n_src = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    return n_src, src_fps


def cv2_frame_plan(
    n_src: int,
    src_fps: float,
    start_time: Optional[float],
    end_time: Optional[float],
    fps: Optional[float],
    max_frames: Optional[int],
    trim_time: float = 0.0,
):
    """SHARED cv2 frame-selection plan — the single source of truth for
    both the buffered loader below and the chunked cv2-thread stream
    (frame_stream._cv2_stream); the two previously carried drifting
    copies of this math.

    Mirrors the ffmpeg path's semantics exactly:
    - sampled instants ride the fps grid from ``start + trim_time``
      inside the (trimmed) window;
    - LABELS ride the fps grid from ``start_time`` regardless of trim
      (the reference's setpts reset + arange labeling: trim changes
      which instants are sampled, never the whole-second labels);
    - returned ``duration`` follows the reference: the full-file
      duration clamped only by ``end_time`` (processing_cogreasoner.py
      :366-379 subtracts only the stream-start clamp delta);
    - ``max_frames`` uniform-subsamples the sampled set.

    Returns (src_idx [N] int64, labels [N] float, duration).
    """
    if n_src <= 0 or src_fps <= 0:
        raise ValueError("cv2_frame_plan needs a known frame count")
    file_duration = n_src / src_fps
    t0 = max(0.0, start_time) if start_time is not None else 0.0
    duration = file_duration
    if end_time is not None:
        duration = min(duration, end_time - t0)
    # decode stops at EOF: the sampleable window never passes file end
    window = max(0.0, min(duration, file_duration - t0))
    sample_start = t0 + trim_time
    if trim_time > 0:
        # ffmpeg filter: trim=start=trim:end=floor(dur-trim)+trim
        window = min(window, math.floor(window - trim_time) + trim_time)
    step = 1.0 / fps if fps else 1.0 / src_fps
    # exclusive end == ffmpeg fps round=up count: ceil(span*fps), with
    # exact multiples giving span*fps (an inclusive end would overshoot
    # by one on exact multiples)
    sample_ts = np.arange(sample_start,
                          max(t0 + window, sample_start + 1e-6), step)
    src_idx = np.minimum((sample_ts * src_fps).astype(np.int64),
                         n_src - 1)
    labels = np.arange(t0, t0 + duration + step, step)[:len(src_idx)]
    if len(labels) < len(src_idx):          # numeric edge
        labels = t0 + np.arange(len(src_idx)) * step
    if max_frames is not None and len(src_idx) > max_frames:
        sel = np.linspace(0, len(src_idx) - 1, max_frames, dtype=int)
        src_idx, labels = src_idx[sel], labels[sel]
    return src_idx, labels, float(duration)


# Seek-vs-sequential crossover. Measured on this host (640x360 mp4v,
# stride 24): sequential grab walks ~3000 decoded fps (0.34 ms/frame)
# while each CAP_PROP_POS_FRAMES seek costs ~11 ms (keyframe re-decode)
# — sequential WINS at typical 24-30 fps sources sampled at 1 fps, so
# the reference's decord random access (processing_cogreasoner.py:
# 156-160) is NOT the model here. Seeking pays off only when the
# sampling stride is much larger than a GOP (sparse sampling of long
# high-fps sources) — gate it there.
SEEK_MIN_STRIDE = 32


def cv2_iter_wanted(cap, src_idx, allow_seek: bool = True):
    """Yield ``(want_pos, bgr_frame)`` for each wanted source index of
    a cv2 capture positioned at frame 0 — the shared access strategy
    for the buffered loader and the streaming reader thread.

    Dense sampling walks sequentially with ``grab()`` (decode without
    the BGR convert/copy) and ``retrieve()`` only on wanted frames.
    Sparse sampling (min stride ≥ ``SEEK_MIN_STRIDE``) seeks with
    ``CAP_PROP_POS_FRAMES`` instead — frame-accurate for the codecs
    OpenCV's ffmpeg backend decodes here (parity-tested vs the
    sequential walk in tests/test_video_loader.py).

    A wanted frame that fails to decode is skipped (its entries are
    dropped), matching the sequential reader's corrupt-frame semantics.
    """
    import cv2

    n = len(src_idx)
    if n == 0:
        return
    strides = np.diff(np.unique(src_idx))
    sparse = (allow_seek and len(strides)
              and int(strides.min()) >= SEEK_MIN_STRIDE)
    if sparse:
        want_pos = 0
        while want_pos < n:
            tgt = int(src_idx[want_pos])
            cap.set(cv2.CAP_PROP_POS_FRAMES, tgt)
            ok, frame = cap.read()
            if not ok:
                want_pos += 1
                continue
            while want_pos < n and src_idx[want_pos] == tgt:
                yield want_pos, frame
                want_pos += 1
        return
    want_pos, idx = 0, 0
    while want_pos < n:
        if not cap.grab():
            break
        frame = None
        while want_pos < n and src_idx[want_pos] == idx:
            if frame is None:
                ok, frame = cap.retrieve()
                if not ok:
                    while want_pos < n and src_idx[want_pos] == idx:
                        want_pos += 1
                    break
            yield want_pos, frame
            want_pos += 1
        idx += 1


def temporal_pad(frames: List, timestamps: List[float],
                 temporal_factor: int, step: float):
    """Reference temporal padding (processing_cogreasoner.py:421-424):
    ``pad = tf - len % tf`` — a FULL extra block when the count is
    already a multiple (the trained model saw that behavior)."""
    if temporal_factor > 1 and frames:
        pad = temporal_factor - len(frames) % temporal_factor
        frames.extend([frames[-1]] * pad)
        base = timestamps[-1]   # capture BEFORE extending — a lazy
        # generator reading timestamps[-1] would see its own appends
        timestamps.extend(base + step * (i + 1) for i in range(pad))
    return frames, timestamps


def _load_video_cv2(video_path, start_time, end_time, fps, max_frames,
                    size, size_divisible, temporal_factor,
                    trim_time: float = 0.0):
    """cv2.VideoCapture decode path (hosts without an ffmpeg binary —
    e.g. the TPU image ships OpenCV's bundled decoder instead). Frame
    selection, labels and duration all come from ``cv2_frame_plan`` —
    the ffmpeg path's exact semantics."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 cannot open {video_path}")
    n_src, src_fps = cv2_source_count(cap)
    if n_src <= 0:
        # unknown frame count: count by grab() (no decode-to-BGR cost),
        # then reopen for the real pass
        while cap.grab():
            n_src += 1
        cap.release()
        if n_src == 0:
            raise RuntimeError(f"cv2 decoded zero frames from {video_path}")
        cap = cv2.VideoCapture(video_path)

    src_idx_wanted, labels, duration = cv2_frame_plan(
        n_src, src_fps, start_time, end_time, fps, max_frames, trim_time)
    step = 1.0 / fps if fps else 1.0 / src_fps

    frames: List[np.ndarray] = []
    timestamps: List[float] = []
    for want_pos, frame in cv2_iter_wanted(cap, src_idx_wanted):
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if size is not None:
            h, w = rgb.shape[:2]
            scale = size / min(w, h)
            nw = round(w * scale) // size_divisible * size_divisible
            nh = round(h * scale) // size_divisible * size_divisible
            rgb = cv2.resize(rgb, (nw, nh),
                             interpolation=cv2.INTER_AREA)
        frames.append(rgb.transpose(2, 0, 1))
        timestamps.append(float(labels[want_pos]))
    cap.release()

    frames, timestamps = temporal_pad(frames, timestamps,
                                      temporal_factor, step)
    return frames, timestamps, duration


def _load_frame_dir(path: str, fps=None, max_frames=None):
    """Directory of extracted frames (sorted by filename) — the test and
    dataset-pipeline path (ref load_video_from_ids :146-149)."""
    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".npy")))
    from PIL import Image

    frames = []
    for f in files:
        p = os.path.join(path, f)
        if f.endswith(".npy"):
            a = np.load(p)
        else:
            a = np.asarray(Image.open(p).convert("RGB"))
        if a.ndim == 3 and a.shape[2] == 3:
            a = a.transpose(2, 0, 1)
        frames.append(a.astype(np.uint8))
    # extracted-frame dirs carry no timing metadata: the caller's fps
    # is taken as the extraction rate (ignoring it put every frame-dir
    # dataset on a silent 3 fps grid regardless of the requested fps)
    assumed_fps = float(fps) if fps else 3.0
    duration = len(frames) / assumed_fps
    timestamps = [i / assumed_fps for i in range(len(frames))]
    if max_frames is not None and len(frames) > max_frames:
        idx = np.linspace(0, len(frames) - 1, max_frames, dtype=int)
        frames = [frames[i] for i in idx]
        timestamps = [timestamps[i] for i in idx]
    return frames, timestamps, duration
