#!/usr/bin/env python
"""Minimal repro harness for the chunked-ingest TPU-worker crash.

Round-3 observation (CLAUDE.md, VERDICT r3 weak #2): the camera-to-
cache chunked ingest (``bench_e2e_ingest_7b`` / ``SessionServer
.ingest``) kills the axon TPU worker with ``UNAVAILABLE: ... kernel
fault`` on ~half of attempts at chunk 16 (deterministically at chunk
32), while the single-thread segment ingest (``bench_session_7b_*``)
has never crashed. The deltas between the two paths are exactly the
pipeline stages this harness isolates:

- a cv2 decode-ahead thread (frame_stream),
- a preprocess-ahead worker thread,
- the worker thread starting each chunk's host->device pixel upload
  (``jax.device_put``) WHILE the main thread's previous-chunk device
  dispatch + scalar fetch are in flight.

Matrix (``--mode``):
- ``overlap``   — production shape: worker thread + overlapped put
- ``noput``     — worker thread, but uploads ride the dispatch
                  (``upload_ahead=False``)
- ``serial``    — no preprocess thread (``preprocess_ahead=False``;
                  the cv2 decode-ahead thread inside FrameChunkStream
                  remains)
- ``nothread``  — ZERO threads: all frames decoded up front on the
                  main thread, then the same 16-frame chunked
                  dispatches — isolates the pure device cadence

Orchestrator/child split like bench.py: a crashed worker wedges the
in-process client, so each ATTEMPT (warm-up ingest + N measured
ingests) runs in a child process; the parent tallies exit codes
(0 clean / 17 worker crash) and prints a JSON summary line.

Usage (serialize with everything else — one TPU process at a time):
    python tools/ingest_crash_repro.py --mode overlap --attempts 6
    python tools/ingest_crash_repro.py --child --mode serial ...
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VIDEO_PATH = os.environ.get("COGSTREAM_REPRO_VIDEO",
                            "/tmp/cogstream_repro_clip.mp4")


def make_video(path: str) -> None:
    """Deterministic 128 s / 24 fps clip, identical content to
    bench_e2e_ingest_7b's (static base + moving blocks)."""
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                        (640, 360))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (360, 640, 3), np.uint8)
    for i in range(24 * 128):
        frame = base.copy()
        frame[:40, :40] = (i * 5) % 255
        frame[80:120, (i // 24 * 8) % 600:(i // 24 * 8) % 600 + 40] \
            = 255 - (i % 255)
        w.write(frame)
    w.release()


def _nothread_ingest(server, sid: str, chunk: int, frames, ts) -> int:
    """Chunked dispatches identical to serve.ingest's, but from
    already-decoded frames on the calling thread — no cv2 reader, no
    preprocess worker."""
    from cogstream_tpu.processor.image_processor import (
        ImageProcessor, smart_resize_single_factor)

    sess = server.sessions[sid]
    proc = ImageProcessor(server.cfg.processor)
    pc = server.cfg.processor
    target = smart_resize_single_factor(
        [frames[0]], pc.patch_size * pc.video_merge_size,
        pc.min_tokens, pc.max_tokens, num_frames_override=len(frames))
    n = 0
    for s in range(0, len(frames), chunk):
        blk = frames[s:s + chunk]
        batch = proc([blk], modals=["video"], raw_uint8=True,
                     target_sizes=target)
        server._dispatch_batch(sid, sess, batch,
                               list(ts[s:s + len(blk)]))
        n += len(blk)
    return n


def child(mode: str, chunk: int, ingests: int,
          encoder_int8: bool = True, use_pallas: bool = True,
          pace_ms: float = 0.0, sync_chunks: bool = False,
          scheme: str = "int8", rows_cap: int = 0) -> int:
    sys.path.insert(0, REPO)
    import bench
    from cogstream_tpu.runtime.serve import SessionServer
    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # scheme int4u: same shapes/cadence with ~3.7 GB more HBM headroom
    # (4.8 GB weights vs 8.5) — discriminates memory pressure from a
    # size-dependent program fault
    if scheme == "int8":
        cfg = bench._session_cfg_7b(w8a8_prefill=True)
    else:
        cfg = bench._session_cfg_7b(w4a8_decode=True)
    ctx = bench.Ctx()
    params = ctx.cogreasoner_7b_params(scheme, cfg)
    tok, _ = bench._tokenizer_for(cfg)
    # dispatch_pace_ms: a minimum gap between dispatches discriminates
    # a worker-side dispatch-cadence race (paced = clean) from a
    # shape-dependent kernel bug (paced = crashes) — and is the
    # production mitigation knob when it holds
    server = SessionServer(
        params, cfg, tok, max_len=4096, use_pallas=use_pallas,
        encoder_int8=encoder_int8, ingest_chunk_frames=chunk,
        upload_ahead=(mode == "overlap"),
        preprocess_ahead=(mode not in ("serial", "nothread")),
        dispatch_pace_ms=pace_ms,
        # default 0 = RAW chunk shapes (the experiment must reproduce
        # the uncapped program sizes); pass --rows-cap 4096 to measure
        # the production mitigation
        ingest_rows_cap=rows_cap)
    if sync_chunks:
        # drain the device after every chunk dispatch: the ingest path
        # leaves the event-summary forward RUNNING async (its result
        # is only fetched lazily at ask time), so chunk N's summary
        # overlaps chunk N+1's encode on device. A trailing trivial
        # program + fetch proves the queue drained (single execution
        # stream) — if this is clean, concurrent-program pressure is
        # the trigger and drain-per-chunk is the fix.
        import jax
        import jax.numpy as jnp

        orig_db = server._dispatch_batch

        def synced(*a, **kw):
            r = orig_db(*a, **kw)
            jax.device_get(jnp.zeros((), jnp.float32) + 1.0)
            return r

        server._dispatch_batch = synced
    pre = None
    if mode == "nothread":
        # decode ONCE up front on this thread (cv2 sequential read);
        # every ingest below then replays the same chunk cadence with
        # zero live threads
        import cv2 as _cv2

        cap = _cv2.VideoCapture(VIDEO_PATH)
        fps_v = cap.get(_cv2.CAP_PROP_FPS) or 24.0
        frames, ts = [], []
        want = 0.0
        i = 0
        while len(frames) < 128:
            ok, f = cap.read()
            if not ok:
                break
            if i >= want:
                frames.append(
                    _cv2.cvtColor(f, _cv2.COLOR_BGR2RGB))
                ts.append(i / fps_v)
                want += fps_v          # 1 fps sampling
            i += 1
        cap.release()
        pre = (frames, ts)
        print(f"  decoded {len(frames)} frames up front", flush=True)
    try:
        def one_ingest(sid):
            server.create(sid)
            t0 = time.perf_counter()
            if pre is not None:
                n = _nothread_ingest(server, sid, chunk, *pre)
                backend = "nothread"
            else:
                r = server.ingest(sid, VIDEO_PATH, start=0.0,
                                  end=128.0, fps=1.0)
                n, backend = r["frames"], r["decode_backend"]
            dt = time.perf_counter() - t0
            return n / dt, backend

        one_ingest("warm")
        for i in range(ingests):
            sid = f"run{i}"
            fps, backend = one_ingest(sid)
            print(f"  ingest {i}: {fps:.1f} fps ({backend})",
                  flush=True)
            # free the session's cache footprint before the next one
            del server.sessions[sid]
    except Exception as e:  # noqa: BLE001
        msg = repr(e)[:400]
        print(f"  CHILD EXCEPTION: {msg}", flush=True)
        if "UNAVAILABLE" in msg or "INTERNAL" in msg or \
                "DEADLINE" in msg:
            return 17
        return 1
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--mode", default="overlap",
                    choices=["overlap", "noput", "serial", "nothread"])
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--attempts", type=int, default=6)
    ap.add_argument("--ingests", type=int, default=3,
                    help="measured ingests per attempt (after warm-up)")
    ap.add_argument("--no-encoder-int8", action="store_true",
                    help="bf16 vision tower (isolate the W8A8 kernels)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="XLA attention everywhere (isolate Pallas)")
    ap.add_argument("--pace-ms", type=float, default=0.0,
                    help="sleep between chunk dispatches (cadence test)")
    ap.add_argument("--sync-chunks", action="store_true",
                    help="drain the device after each chunk dispatch")
    ap.add_argument("--scheme", default="int8",
                    choices=["int8", "int4u"],
                    help="decoder base (int4u = memory-headroom probe)")
    ap.add_argument("--rows-cap", type=int, default=0,
                    help="ingest_rows_cap (0 = raw chunk shapes)")
    args = ap.parse_args()

    if args.child:
        return child(args.mode, args.chunk, args.ingests,
                     encoder_int8=not args.no_encoder_int8,
                     use_pallas=not args.no_pallas,
                     pace_ms=args.pace_ms, sync_chunks=args.sync_chunks,
                     scheme=args.scheme, rows_cap=args.rows_cap)

    if not os.path.exists(VIDEO_PATH):
        make_video(VIDEO_PATH)
    extra = []
    if args.no_encoder_int8:
        extra.append("--no-encoder-int8")
    if args.no_pallas:
        extra.append("--no-pallas")
    if args.pace_ms:
        extra += ["--pace-ms", str(args.pace_ms)]
    if args.sync_chunks:
        extra.append("--sync-chunks")
    if args.scheme != "int8":
        extra += ["--scheme", args.scheme]
    if args.rows_cap:
        extra += ["--rows-cap", str(args.rows_cap)]
    results = []
    for a in range(args.attempts):
        t0 = time.perf_counter()
        try:
            # per-child timeout: besides crashing outright, a wedged
            # worker can STALL the child indefinitely (observed: child
            # blocked at ~0% CPU for 12+ min after a prior crash) —
            # count that as rc 99
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--mode", args.mode, "--chunk", str(args.chunk),
                 "--ingests", str(args.ingests)] + extra,
                timeout=900).returncode
        except subprocess.TimeoutExpired:
            rc = 99
        dt = time.perf_counter() - t0
        results.append(rc)
        print(f"attempt {a}: rc={rc} ({dt:.0f}s)", flush=True)
        if rc in (17, 99) and a + 1 < args.attempts:
            time.sleep(90)      # crashed worker takes ~min to return
    crashes = sum(1 for r in results if r in (17, 99))
    print(json.dumps({"mode": args.mode, "chunk": args.chunk,
                      "attempts": args.attempts,
                      "ingests_per_attempt": args.ingests,
                      "encoder_int8": not args.no_encoder_int8,
                      "use_pallas": not args.no_pallas,
                      "pace_ms": args.pace_ms,
                      "sync_chunks": args.sync_chunks,
                      "scheme": args.scheme,
                      "rows_cap": args.rows_cap,
                      "crashes": crashes, "rcs": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
