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
    if temporal_factor > 1 and frames:
        pad = (-len(frames)) % temporal_factor
        if pad:
            frames.extend([frames[-1]] * pad)
            step = 1 / (fps or 1.0)
            timestamps.extend(timestamps[-1] + step * (i + 1)
                              for i in range(pad))

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


def _load_video_cv2(video_path, start_time, end_time, fps, max_frames,
                    size, size_divisible, temporal_factor,
                    trim_time: float = 0.0):
    """cv2.VideoCapture decode path (hosts without an ffmpeg binary —
    e.g. the TPU image ships OpenCV's bundled decoder instead).
    Mirrors the ffmpeg path's semantics: ``trim_time`` trims a
    fractional head off the window (the processor's cross-segment
    timestamp alignment) and the returned duration is the trimmed
    window's, not the whole file's."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 cannot open {video_path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    n_src = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    file_duration = n_src / src_fps if n_src else 0.0
    t0 = start_time or 0.0
    t1 = min(end_time, file_duration) if end_time is not None \
        else file_duration
    window = max(0.0, t1 - t0)
    if trim_time > 0:
        # ffmpeg path: trim=start=trim_time:end=floor(dur-trim)+trim
        end_in_window = math.floor(window - trim_time) + trim_time
        t1 = t0 + min(window, end_in_window)
        t0 = t0 + trim_time
    duration = max(0.0, t1 - t0)
    step = 1.0 / fps if fps else 1.0 / src_fps

    wanted = np.arange(t0, max(t1, t0 + 1e-6), step)
    frames: List[np.ndarray] = []
    timestamps: List[float] = []
    src_idx_wanted = np.minimum((wanted * src_fps).astype(int),
                                max(n_src - 1, 0))
    want_pos = 0
    idx = 0
    while want_pos < len(src_idx_wanted):
        ok, frame = cap.read()
        if not ok:
            break
        while (want_pos < len(src_idx_wanted)
               and src_idx_wanted[want_pos] == idx):
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if size is not None:
                h, w = rgb.shape[:2]
                scale = size / min(w, h)
                nw = round(w * scale) // size_divisible * size_divisible
                nh = round(h * scale) // size_divisible * size_divisible
                rgb = cv2.resize(rgb, (nw, nh),
                                 interpolation=cv2.INTER_AREA)
            frames.append(rgb.transpose(2, 0, 1))
            timestamps.append(float(wanted[want_pos]))
            want_pos += 1
        idx += 1
    cap.release()

    if max_frames is not None and len(frames) > max_frames:
        sel = np.linspace(0, len(frames) - 1, max_frames, dtype=int)
        frames = [frames[i] for i in sel]
        timestamps = [timestamps[i] for i in sel]
    if temporal_factor > 1 and frames:
        pad = (-len(frames)) % temporal_factor
        if pad:
            frames.extend([frames[-1]] * pad)
            timestamps.extend(timestamps[-1] + step * (i + 1)
                              for i in range(pad))
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
    assumed_fps = 3.0
    duration = len(frames) / assumed_fps
    timestamps = [i / assumed_fps for i in range(len(frames))]
    if max_frames is not None and len(frames) > max_frames:
        idx = np.linspace(0, len(frames) - 1, max_frames, dtype=int)
        frames = [frames[i] for i in idx]
        timestamps = [timestamps[i] for i in idx]
    return frames, timestamps, duration
