"""Minimal production serving front-end for streaming sessions.

JSON-over-HTTP (stdlib only — no server deps in the TPU image):

    POST /session            {"session_id"?}            → creates a session
    POST /ingest             {"session_id", "video_path", "start", "end",
                              "fps"?}                   → decode+encode+cache
    POST /ask                {"session_id", "question", "mode"?,
                              "lookahead_k"?}           → answer + latency
    POST /ask_stream         same body → chunked text deltas, then a
                             0x1e record separator + final JSON meta
    POST /save               {"session_id", "path"}     → snapshot to disk
    POST /restore            {"session_id", "path"}     → recreate from
                             a snapshot (restart recovery, no re-ingest)
    GET  /stats                                         → per-stage timers

One TPU process serves many sessions; requests are serialized through a
lock (the model is one jitted program — concurrency comes from batching,
a later milestone). The reference has no serving story at all (its
"serving" is the torchrun eval script, answer_generate.py).

Crash recovery (``--supervise``): a TPU-worker crash (axon
``UNAVAILABLE: kernel fault`` — observed intermittently on the chunked
ingest path) WEDGES the in-process JAX client; no in-process retry can
recover. The serving process therefore runs under a supervisor: a fatal
backend error turns into a 503 ``{"backend_fatal": true}`` response,
the child exits (rc 17), the supervisor relaunches it, and the fresh
process restores every session from its auto-snapshot
(``--auto-snapshot-dir``: each successful /ingest and /ask snapshots
the session; boot restores all ``*.snap.npz`` found). Clients retry
503s after the restart window and keep their streams.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np


class UnknownSession(Exception):
    pass


def _backend_fatal(e: BaseException) -> bool:
    """True for errors that wedge the JAX client for good (TPU worker
    crash / lost tunnel): the process must be replaced, not retried.

    Both the TYPE and the status substring must match: a non-backend
    error whose message merely contains e.g. "UNAVAILABLE" (an upstream
    HTTP error string surfaced through ingest) must NOT take down the
    whole serving process and its in-flight sessions."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:     # older jax
        from jaxlib.xla_extension import XlaRuntimeError as JaxRuntimeError
    if not isinstance(e, JaxRuntimeError):
        return False
    msg = repr(e)
    return ("UNAVAILABLE" in msg or "INTERNAL" in msg
            or "DEADLINE_EXCEEDED" in msg)


# Fault injection for recovery tests: when set to N, the N-th solo
# ingest chunk dispatch raises a synthetic backend-fatal error —
# the CPU-simulated analogue of the axon worker's mid-ingest
# 'kernel fault' (tests/test_serve_recovery.py).
_FAULT_ENV = "COGSTREAM_FAULT_INGEST_DISPATCH"
_dispatch_counter = 0


class BatchingFrontend:
    """Opportunistic request batching over a SessionPool: /ask and
    /ingest calls enqueue and block; a collector thread flushes every
    ``flush_ms``. Pending ingests flush first (grouped by segment shape
    into ONE pool.ingest_batch dispatch), then pending questions (one
    per row, grouped by decode params) run in a single pooled
    prefill+decode. Under concurrent load the weights are read once per
    decode step for the whole batch and N streams' segments encode in
    one program."""

    def __init__(self, pool, flush_ms: float = 15.0, lock=None,
                 extra_eos_ids: tuple = ()):
        self.pool = pool
        self.extra_eos_ids = tuple(extra_eos_ids)
        self.lock = lock or threading.Lock()   # serializes vs ingest
        self.flush_ms = flush_ms
        self._queue: list = []
        self._ingest_queue: list = []
        self._cv = threading.Condition()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def ask(self, row: int, question: str, mode: str = "FCC",
            max_new_tokens: int = 256) -> Dict:
        item = {"row": row, "q": question, "mode": mode,
                "new": max_new_tokens, "event": threading.Event(),
                "result": None, "error": None}
        with self._cv:
            self._queue.append(item)
            self._cv.notify()
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def ingest(self, row: int, pixel_values, grid_size, merge_size,
               timestamps) -> None:
        item = {"row": row, "args": (pixel_values, tuple(grid_size),
                                     int(merge_size), list(timestamps)),
                "event": threading.Event(), "error": None}
        with self._cv:
            self._ingest_queue.append(item)
            self._cv.notify()
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]

    def _flush_ingests(self, pending: list) -> None:
        # group by segment shape; same-shape groups take the fused
        # batched path, one request per row per flush
        by_shape: Dict = {}
        leftover = []
        seen_rows = set()
        for it in pending:
            pv, grid, ms, ts = it["args"]
            if it["row"] in seen_rows:
                leftover.append(it)
                continue
            seen_rows.add(it["row"])
            by_shape.setdefault((grid, ms), []).append(it)
        for (grid, ms), items in by_shape.items():
            try:
                with self.lock:
                    if len(items) == 1:
                        it = items[0]
                        self.pool.ingest(it["row"], it["args"][0], grid,
                                         ms, it["args"][3])
                    else:
                        self.pool.ingest_batch(
                            [(it["row"], it["args"][0], grid, ms,
                              it["args"][3]) for it in items])
            except Exception as e:  # noqa: BLE001
                for it in items:
                    it["error"] = e
            for it in items:
                it["event"].set()
        if leftover:
            with self._cv:
                self._ingest_queue = leftover + self._ingest_queue
                self._cv.notify()

    def _loop(self):
        import time as _t

        while True:
            with self._cv:
                while not self._queue and not self._ingest_queue:
                    self._cv.wait()
            _t.sleep(self.flush_ms / 1000.0)   # let a batch accumulate
            with self._cv:
                pending, self._queue = self._queue, []
                pending_ing, self._ingest_queue = self._ingest_queue, []
            if pending_ing:
                self._flush_ingests(pending_ing)
            # one request per row per batch; group by decode params
            by_params: Dict = {}
            leftover = []
            seen_rows = set()
            for it in pending:
                key = (it["mode"], it["new"])
                if it["row"] in seen_rows:
                    leftover.append(it)
                    continue
                seen_rows.add(it["row"])
                by_params.setdefault(key, []).append(it)
            for (mode, new), items in by_params.items():
                try:
                    with self.lock:
                        out = self.pool.ask_batch(
                            [(it["row"], it["q"]) for it in items],
                            mode=mode, max_new_tokens=new,
                            extra_eos_ids=self.extra_eos_ids)
                    for it in items:
                        it["result"] = out[it["row"]]
                except Exception as e:  # noqa: BLE001
                    for it in items:
                        it["error"] = e
                for it in items:
                    it["event"].set()
            if leftover:
                with self._cv:
                    self._queue = leftover + self._queue
                    self._cv.notify()


class SessionServer:
    def __init__(self, params, cfg, tokenizer, adapters=None,
                 max_len: int = 16384, use_pallas: bool = True,
                 pool_rows: int = 0, ingest_chunk_frames: int = 16,
                 mesh=None, lookahead_k: int = 0,
                 extra_eos_ids: tuple = (), encoder_int8: bool = False,
                 upload_ahead: bool = True,
                 preprocess_ahead: bool = True,
                 auto_snapshot_dir: Optional[str] = None,
                 dispatch_pace_ms: float = 0.0,
                 ingest_rows_cap: int = 4096):
        from ..utils.profiling import StageTimer
        from .session import StreamingSession

        # mesh: TP-sharded serving (params sharded once here; sessions/
        # pool receive the sharded tree). lookahead_k: server default
        # for speculative greedy decodes on solo sessions (per-request
        # "lookahead_k" overrides; pooled batch decode ignores it).
        # encoder_int8: W8A8 vision tower for ingest (~1.2x encode).
        from ..parallel.sharding import ensure_cogreasoner_sharded

        if encoder_int8 and not isinstance(
                params["vision"]["layers"][0]["attn"]["q"]["kernel"], dict):
            from ..models.vision_encoder import quantize_vision_w8a8

            params = {**params,
                      "vision": quantize_vision_w8a8(params["vision"])}
        params = ensure_cogreasoner_sharded(params, cfg, mesh)
        self.mesh = mesh
        self.lookahead_k = lookahead_k
        # the checkpoint's full terminator set (generation_config
        # eos_token_id list) — applied to every decode, as HF does
        self.extra_eos_ids = tuple(extra_eos_ids)
        self._mk = lambda: StreamingSession(
            params, cfg, tokenizer, adapters=adapters, max_len=max_len,
            use_pallas=use_pallas, mesh=mesh)
        self.sessions: Dict[str, object] = {}
        self.lock = threading.Lock()
        self.timer = StageTimer()
        self.cfg = cfg
        # frames per chunked-ingest dispatch; the decoder streams ahead
        # of the TPU encode between dispatches
        self.ingest_chunk_frames = ingest_chunk_frames
        # Pipeline-stage switches (both default ON — the measured-fast
        # serving shape). upload_ahead: the preprocess worker starts
        # the chunk's host->device pixel upload while the previous
        # chunk's device work is in flight. preprocess_ahead: run
        # decode->preprocess in a worker thread at all (OFF = strictly
        # serial single-thread ingest). Separable for fault isolation:
        # tools/ingest_crash_repro.py measures each stage's
        # contribution to the chunked-ingest TPU-worker 'kernel fault'.
        self.upload_ahead = upload_ahead
        self.preprocess_ahead = preprocess_ahead
        # Crash-recovery state (module docstring): when
        # auto_snapshot_dir is set, every successful /ingest and /ask
        # snapshots the session there (atomic npz; cost = one cache
        # fetch — ~0.2 s/GB over PCIe, tens of seconds over the dev
        # tunnel, so it is OPT-IN). A supervised child (env
        # COGSTREAM_SERVE_SUPERVISED=1, set by run_supervised) exits
        # on backend-fatal errors so the supervisor can replace it.
        self.auto_snapshot_dir = auto_snapshot_dir
        if auto_snapshot_dir:
            os.makedirs(auto_snapshot_dir, exist_ok=True)
        self.supervised = \
            os.environ.get("COGSTREAM_SERVE_SUPERVISED") == "1"
        self._exit_code = 0
        # Minimum gap between chunked-ingest device dispatches. The
        # axon worker intermittently dies ('kernel fault') under the
        # UNPACED chunk cadence with every host-side stage removed
        # (tools/ingest_crash_repro.py: crashes with no threads, no
        # async upload, no Pallas) — pacing the dispatches is the
        # measured mitigation; see STATUS.md round-4 notes for rates.
        # 0 disables (no cost on stable backends).
        self.dispatch_pace_ms = float(dispatch_pace_ms)
        self._last_dispatch = 0.0
        # Patch-row cap per ingest encode dispatch (_dispatch_batch
        # docstring: large encode programs fault the axon worker
        # probabilistically; 4096 rows = the measured-stable bucket,
        # ~10x lower crash rate than 8192 at equal-or-better fps).
        # 0 disables the split (stable backends).
        self.ingest_rows_cap = int(ingest_rows_cap)
        self.pool = None
        self.frontend = None
        self._row_of: Dict[str, int] = {}
        self._next_sid = 0
        if pool_rows > 0:
            from .pool import SessionPool

            self.pool = SessionPool(
                params, cfg, tokenizer, n_rows=pool_rows,
                max_len=max_len, adapters=adapters,
                use_pallas=use_pallas, mesh=mesh)
            self.frontend = BatchingFrontend(
                self.pool, lock=self.lock,
                extra_eos_ids=tuple(extra_eos_ids))

    def _get(self, session_id: str):
        if session_id not in self.sessions:
            raise UnknownSession(f"unknown session {session_id!r}")
        return self.sessions[session_id]

    def create(self, session_id: Optional[str] = None) -> Dict:
        """Create a session. Without an id one is minted under the lock
        (a monotonic counter — deriving it from len(sessions) outside
        the lock let concurrent creates collide on the same id).
        Creating over an existing id replaces it, releasing the old
        pool row (a retried POST /session must not leak rows)."""
        with self.lock:
            if session_id is None:
                session_id = f"s{self._next_sid}"
                self._next_sid += 1
            if self.pool is not None:
                old = self._row_of.pop(session_id, None)
                if old is not None:
                    self.pool.close(old)
                row = self.pool.open()
                self._row_of[session_id] = row
                self.sessions[session_id] = self.pool.sessions[row]
            else:
                self.sessions[session_id] = self._mk()
        return {"session_id": session_id}

    def _dispatch_segment(self, session_id: str, sess, proc,
                          frames: np.ndarray, timestamps: List[float],
                          target_sizes=None) -> None:
        """Preprocess one uint8 frame block — [t,H,W,3] from the chunk
        stream or [t,3,H,W] from the buffered loader (ImageProcessor
        detects either) — and dispatch its ingest (batched frontend /
        pool / bare session)."""
        batch = proc([frames], modals=["video"], raw_uint8=True,
                     target_sizes=target_sizes)
        self._dispatch_batch(session_id, sess, batch, timestamps)

    def _dispatch_batch(self, session_id: str, sess, batch,
                        timestamps: List[float], pv_device=None,
                        keep_mask=None) -> None:
        """Dispatch an already-preprocessed batch (the preprocess-ahead
        ingest thread hands these over directly, optionally with the
        pixel rows already device_put and the keep mask precomputed —
        both overlap the previous chunk's device work).

        Oversized chunks split into sub-dispatches of at most
        ``ingest_rows_cap`` patch rows each: the axon worker faults
        intermittently on LARGE encode programs (measured per-dispatch
        crash rates — 16384-row bucket deterministic, 8192 ~2%,
        4096 ~0.3%; tools/ingest_crash_repro.py, STATUS.md round 4)
        with every other variable (threads, uploads, Pallas, pacing,
        queue depth, resident-weight footprint) exonerated. In the
        SOLO precomputed-mask path the sliced keep masks stay
        semantically exact: a frame's mask references its predecessor,
        which the previous sub-dispatch has already written to the
        cache. In pool/frontend mode (and solo without a precomputed
        mask) each sub-dispatch recomputes its mask from its own first
        frame, so a split keeps the first frame of every sub-chunk
        fully — token usage can grow slightly with the split, never
        shrink, and correctness is unaffected (kept tokens are a
        superset)."""
        t, gh, gw = batch.grid_sizes[0]
        grid = (int(t), int(gh), int(gw))
        ms = int(batch.merge_sizes[0])
        rows_pf = grid[1] * grid[2]
        max_t = (max(1, self.ingest_rows_cap // rows_pf)
                 if self.ingest_rows_cap else grid[0])
        merged_pf = (grid[1] // ms) * (grid[2] // ms)
        for s in range(0, grid[0], max_t):
            tt = min(max_t, grid[0] - s)
            if tt == grid[0]:       # common case: no split
                pv, pvd, km, ts = (batch.pixel_values, pv_device,
                                   keep_mask, timestamps)
            else:
                pv = batch.pixel_values[s * rows_pf:(s + tt) * rows_pf]
                pvd = (None if pv_device is None else
                       pv_device[s * rows_pf:(s + tt) * rows_pf])
                km = (None if keep_mask is None else
                      keep_mask.reshape(grid[0], merged_pf)[s:s + tt])
                ts = list(timestamps[s:s + tt])
            self._dispatch_one(session_id, sess, pv, (tt,) + grid[1:],
                               ms, ts, pvd, km)

    def _dispatch_one(self, session_id: str, sess, pixel_values, grid,
                      ms: int, timestamps: List[float], pv_device,
                      keep_mask) -> None:
        fault_n = os.environ.get(_FAULT_ENV)
        if fault_n is not None:
            global _dispatch_counter
            _dispatch_counter += 1
            if _dispatch_counter >= int(fault_n):
                from jax.errors import JaxRuntimeError

                # the real backend type — _backend_fatal now requires it
                raise JaxRuntimeError(
                    "UNAVAILABLE: kernel fault (injected by "
                    f"{_FAULT_ENV})")
        if self.dispatch_pace_ms > 0:
            gap = time.monotonic() - self._last_dispatch
            wait = self.dispatch_pace_ms / 1e3 - gap
            if wait > 0:
                time.sleep(wait)
            self._last_dispatch = time.monotonic()
        if self.frontend is not None:
            # concurrent streams' segments coalesce into ONE fused
            # batched ingest dispatch
            self.frontend.ingest(self._row_of[session_id],
                                 pixel_values, grid, ms, timestamps)
        elif self.pool is not None:
            with self.lock:
                self.pool.ingest(self._row_of[session_id],
                                 pixel_values, grid, ms, timestamps)
        else:
            with self.lock:
                sess.append_stream_segment(
                    pixel_values, grid, ms, timestamps,
                    pixel_values_device=pv_device, keep_mask=keep_mask)

    def ingest(self, session_id: str, video_path: str,
               start: Optional[float], end: Optional[float],
               fps: float = 1.0) -> Dict:
        from ..processor.frame_stream import open_frame_stream
        from ..processor.image_processor import ImageProcessor
        from ..processor.video_loader import load_video

        with self.timer.stage("ingest"):
            # video decode + preprocess run OUTSIDE the model lock —
            # only the device dispatch serializes. RAW uint8 rows cost
            # 4x less host->device bandwidth (device-side normalize).
            sess = self._get(session_id)
            proc = ImageProcessor(self.cfg.processor)
            stream = open_frame_stream(
                video_path, start=start, end=end, fps=fps,
                chunk_frames=self.ingest_chunk_frames,
                max_frames=self.cfg.processor.max_frames)
            if stream is not None:
                # chunked decode-ahead path: the decoder (native ring /
                # cv2 thread) runs AHEAD of the per-chunk TPU encode, so
                # decode overlaps compute. Per-frame stream blocks make
                # chunked appends serialize identically to one big one;
                # the resize target pins to the WHOLE window's frame
                # budget so every chunk shares one grid. (The pixel-diff
                # keep mask restarts per chunk — each chunk's first
                # frame keeps all its tokens.)
                from ..processor.image_processor import (
                    smart_resize_single_factor)

                # preprocess-AHEAD: resize+patchify of chunk k+1 runs
                # in a worker thread while chunk k's device ingest is
                # in flight, so the host stages (decode thread →
                # preprocess thread) both overlap TPU encode. Serial,
                # the three stages sum to ~1/124 + 1/134 + 1/32 s per
                # frame at 7B (≈21 fps); pipelined, the slowest stage
                # (device ingest) sets the rate.
                import queue as _queue

                pq: "_queue.Queue" = _queue.Queue(maxsize=2)
                perr: list = []

                solo = self.frontend is None and self.pool is None
                state = {"target": None}

                def _prep(chunk):
                    if state["target"] is None:
                        pc = self.cfg.processor
                        total = max(stream.total_frames_hint,
                                    len(chunk))
                        state["target"] = smart_resize_single_factor(
                            [chunk[0]],
                            pc.patch_size * pc.video_merge_size,
                            pc.min_tokens, pc.max_tokens,
                            num_frames_override=total)
                    batch = proc([chunk], modals=["video"],
                                 raw_uint8=True,
                                 target_sizes=state["target"])
                    pv_dev = keep = None
                    if solo and self.upload_ahead:
                        # start the host->device pixel upload NOW
                        # (async; ~0.5 s of wire time per 16-frame
                        # chunk over the tunnel) and compute the
                        # pixel-diff mask — both overlap the previous
                        # chunk's ingest
                        import jax as _jax

                        t, gh, gw = batch.grid_sizes[0]
                        pv_dev = _jax.device_put(
                            batch.pixel_values)
                        keep = sess.ingest_keep_mask(
                            batch.pixel_values,
                            (int(t), int(gh), int(gw)),
                            int(batch.merge_sizes[0]))
                    return batch, pv_dev, keep

                def _preprocess_worker():
                    try:
                        for chunk, ts in stream:
                            batch, pv_dev, keep = _prep(chunk)
                            pq.put((batch, ts, pv_dev, keep))
                    except Exception as e:  # noqa: BLE001
                        perr.append(e)
                    finally:
                        pq.put(None)

                import threading as _threading

                with stream:
                    if self.preprocess_ahead:
                        th = _threading.Thread(
                            target=_preprocess_worker, daemon=True)
                        th.start()
                        while True:
                            item = pq.get()
                            if item is None:
                                break
                            batch, ts, pv_dev, keep = item
                            self._dispatch_batch(session_id, sess,
                                                 batch, ts,
                                                 pv_device=pv_dev,
                                                 keep_mask=keep)
                        th.join(timeout=5.0)
                        if perr:
                            raise perr[0]
                    else:
                        # strictly serial single-thread ingest (fault
                        # isolation / conservative deployments)
                        for chunk, ts in stream:
                            batch, pv_dev, keep = _prep(chunk)
                            self._dispatch_batch(session_id, sess,
                                                 batch, ts,
                                                 pv_device=pv_dev,
                                                 keep_mask=keep)
                decode_stats = {
                    "backend": stream.backend,
                    "buffered_max": stream.buffered_max,
                }
                n_frames = stream.frames_seen
            else:
                # buffered fallback: frame dirs, or native needing
                # post-hoc uniform subsampling
                frames, timestamps, _ = load_video(
                    video_path, start_time=start, end_time=end, fps=fps,
                    max_frames=self.cfg.processor.max_frames)
                self._dispatch_segment(session_id, sess,
                                       proc, np.stack(frames),
                                       timestamps)
                decode_stats = {"backend": "buffered",
                                "buffered_max": 0}
                n_frames = len(frames)
        self._auto_snapshot(session_id)
        # request-local (NOT server state): concurrent ingests for
        # different sessions must not cross-contaminate response stats
        return {"frames": n_frames, "cache_tokens": sess.write_index,
                "decode_backend": decode_stats["backend"],
                "decode_buffered_max": decode_stats["buffered_max"]}

    def ask(self, session_id: str, question: str, mode: str = "FCC",
            max_new_tokens: int = 512,
            lookahead_k: Optional[int] = None) -> Dict:
        if self.frontend is not None:
            with self.lock:
                self._get(session_id)
                row = self._row_of[session_id]
            # block WITHOUT the lock — the collector thread takes it to
            # run the pooled decode; concurrent asks batch together
            # (batched decode has no speculative path — lookahead_k is
            # a solo-session lever)
            with self.timer.stage("ask"):
                out = self.frontend.ask(row, question, mode=mode,
                                        max_new_tokens=max_new_tokens)
            self._auto_snapshot(session_id)
            return out
        k = self.lookahead_k if lookahead_k is None else lookahead_k
        with self.lock:
            sess = self._get(session_id)
            with self.timer.stage("ask"):
                out = sess.ask(question, mode=mode,
                               max_new_tokens=max_new_tokens,
                               lookahead_k=k,
                               extra_eos_ids=self.extra_eos_ids)
        self._auto_snapshot(session_id)
        return out

    def ask_stream(self, session_id: str, question: str,
                   mode: str = "FCC", max_new_tokens: int = 512):
        """Generator of text deltas, ending with the result dict.

        Pooled sessions stream too (single-storage rows make
        session.ask_stream row-safe); the model lock is held for the
        stream's duration, so concurrent batched asks queue behind it —
        the latency/throughput trade a streaming client opts into."""
        with self.lock:
            sess = self._get(session_id)
            with self.timer.stage("ask"):
                yield from sess.ask_stream(
                    question, mode=mode, max_new_tokens=max_new_tokens,
                    extra_eos_ids=self.extra_eos_ids)

    def save_session(self, session_id: str, path: str) -> Dict:
        """Snapshot a live session to disk (atomic npz)."""
        with self.lock:
            sess = self._get(session_id)
            sess.save(path)
        return {"session_id": session_id, "path": path,
                "cache_tokens": sess.write_index}

    def restore_session(self, session_id: str, path: str) -> Dict:
        """Recreate a session from a snapshot (restart recovery).
        Restoring over an existing id replaces it. TRANSACTIONAL: the
        snapshot loads onto a fresh row FIRST; only on success is the
        old row released and the mapping swapped — a failed restore
        leaves the original session fully usable and leaks nothing
        (briefly needs one spare row)."""
        with self.lock:
            if self.pool is not None:
                row = self.pool.open_restored(path)   # raises → no change
                old = self._row_of.pop(session_id, None)
                if old is not None:
                    self.pool.close(old)
                self._row_of[session_id] = row
                self.sessions[session_id] = self.pool.sessions[row]
            else:
                sess = self._mk()
                sess.load_state(path)
                self.sessions[session_id] = sess
        return {"session_id": session_id,
                "cache_tokens": self.sessions[session_id].write_index,
                "turns": len(self.sessions[session_id].hist_qs)}

    def stats(self) -> Dict:
        return self.timer.summary()

    # ---- crash recovery (module docstring) ---------------------------

    def _snap_path(self, session_id: str) -> str:
        return os.path.join(self.auto_snapshot_dir,
                            f"{session_id}.snap.npz")

    def _auto_snapshot(self, session_id: str) -> None:
        """Post-request snapshot so a supervisor restart can restore
        the stream. Best-effort: a snapshot failure must not fail the
        request that produced good output (it is logged to stderr)."""
        if not self.auto_snapshot_dir:
            return
        try:
            with self.lock:
                sess = self.sessions.get(session_id)
                if sess is not None:
                    with self.timer.stage("snapshot"):
                        sess.save(self._snap_path(session_id))
        except Exception as e:  # noqa: BLE001
            print(f"auto-snapshot of {session_id!r} failed: {e!r}",
                  file=sys.stderr)

    def restore_all(self) -> List[str]:
        """Boot-time recovery: restore every ``*.snap.npz`` in the
        auto-snapshot dir (a fresh supervised child inherits the
        crashed one's streams). Per-session best-effort — one corrupt
        snapshot must not block the rest."""
        if not self.auto_snapshot_dir:
            return []
        restored = []
        for fn in sorted(os.listdir(self.auto_snapshot_dir)):
            if not fn.endswith(".snap.npz"):
                continue
            sid = fn[: -len(".snap.npz")]
            try:
                self.restore_session(
                    sid, os.path.join(self.auto_snapshot_dir, fn))
                restored.append(sid)
            except Exception as e:  # noqa: BLE001
                print(f"restore of {sid!r} failed: {e!r}",
                      file=sys.stderr)
        return restored

    def request_shutdown(self, code: int = 17) -> None:
        """Fatal-backend escape hatch: in a supervised child, exit
        shortly (letting the in-flight 503 flush) so the supervisor
        replaces the process — the wedged JAX client cannot be fixed
        in-process. Outside supervision this only records the code
        (tests and embedded servers must not be killed)."""
        self._exit_code = code
        if not self.supervised:
            return

        def _die():
            time.sleep(0.5)
            os._exit(code)

        threading.Thread(target=_die, daemon=True).start()


def make_handler(server: SessionServer):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                return self._json(200, server.stats())
            return self._json(404, {"error": "unknown path"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._json(400, {"error": "bad json"})
            try:
                if self.path == "/session":
                    return self._json(200, server.create(
                        req.get("session_id")))
                if self.path == "/ingest":
                    return self._json(200, server.ingest(
                        req["session_id"], req["video_path"],
                        req.get("start"), req.get("end"),
                        req.get("fps", 1.0)))
                if self.path == "/ask":
                    return self._json(200, server.ask(
                        req["session_id"], req["question"],
                        req.get("mode", "FCC"),
                        req.get("max_new_tokens", 512),
                        lookahead_k=req.get("lookahead_k")))
                if self.path == "/save":
                    return self._json(200, server.save_session(
                        req["session_id"], req["path"]))
                if self.path == "/restore":
                    return self._json(200, server.restore_session(
                        req["session_id"], req["path"]))
                if self.path == "/ask_stream":
                    # resolve the session BEFORE sending headers so
                    # 404/400 stay clean status codes
                    server._get(req["session_id"])
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; charset=utf-8")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    try:
                        for item in server.ask_stream(
                                req["session_id"], req["question"],
                                req.get("mode", "FCC"),
                                req.get("max_new_tokens", 512)):
                            if isinstance(item, dict):
                                self.wfile.write(b"\x1e")
                                self.wfile.write(
                                    json.dumps(item).encode())
                            else:
                                self.wfile.write(item.encode())
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionError, OSError):
                        # the CLIENT went away mid-stream — nothing to
                        # tell it, and writing the in-band record (or
                        # letting the outer handler send a second HTTP
                        # status line into a half-open socket) would
                        # only corrupt the protocol. Session state was
                        # committed by ask_stream's finally block.
                        pass
                    except Exception as e:  # headers already sent:
                        # emit an in-band error record, never a second
                        # status line
                        try:
                            self.wfile.write(b"\x1e" + json.dumps(
                                {"error": f"{type(e).__name__}: {e}"}
                            ).encode())
                        except OSError:
                            pass    # died while reporting — drop it
                    return None
                return self._json(404, {"error": "unknown path"})
            except UnknownSession as e:
                return self._json(404, {"error": str(e)})
            except KeyError as e:
                return self._json(400, {"error": f"missing field {e}"})
            except Exception as e:
                if _backend_fatal(e):
                    # TPU worker crash: tell the client to retry after
                    # the restart window, then (under supervision) exit
                    # so the supervisor replaces the wedged process
                    self._json(503, {
                        "error": f"{type(e).__name__}: {e}",
                        "backend_fatal": True,
                        "recovering": server.supervised})
                    server.request_shutdown(17)
                    return None
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):   # quiet
            pass

    return Handler


def serve(server: SessionServer, port: int = 8787):
    restored = server.restore_all()
    if restored:
        print(f"restored {len(restored)} session(s) from "
              f"{server.auto_snapshot_dir}: {restored}", flush=True)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(server))
    httpd.serve_forever()


def run_supervised(child_argv: List[str], max_restarts: int = 20,
                   cooldown_s: float = 1.0) -> int:
    """Supervisor loop: run the serving child, replace it when it dies
    (rc != 0 — rc 17 is the deliberate backend-fatal exit). The child
    sees COGSTREAM_SERVE_SUPERVISED=1, which arms request_shutdown and
    boot restore. ``cooldown_s``: a crashed axon TPU worker takes ~a
    minute to come back — pass ~90 there; CPU tests use ~0."""
    env = dict(os.environ)
    env["COGSTREAM_SERVE_SUPERVISED"] = "1"
    restarts = 0
    while True:
        rc = subprocess.run(child_argv, env=env).returncode
        if rc == 0:
            return 0
        restarts += 1
        if restarts > max_restarts:
            print(f"serve child died rc={rc}; restart budget "
                  f"({max_restarts}) exhausted", file=sys.stderr)
            return rc
        print(f"serve child died rc={rc}; restarting "
              f"({restarts}/{max_restarts}) after {cooldown_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(cooldown_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--max-len", type=int, default=16384)
    ap.add_argument("--pool-rows", type=int, default=0,
                    help=">0 enables pooled batched serving")
    ap.add_argument("--encoder-int8", action="store_true",
                    help="W8A8 vision tower (faster ingest encode)")
    ap.add_argument("--quantize-weights", choices=("int8", "int4"),
                    help="quantize decoder kernels at load (host-side "
                         "streaming): int8 = per-channel (7B fits ONE "
                         "v5e), int4 = rank-1 uniform (half int8's HBM; "
                         "decode rides the fused Pallas GEMV — faster "
                         "than int8 at half the memory)")
    ap.add_argument("--w8a8-prefill", action="store_true",
                    help="int8-activation prefill GEMMs on int8 "
                         "decoder weights (requires --quantize-weights; "
                         "decode steps stay weight-only)")
    ap.add_argument("--w4a8-decode", action="store_true",
                    help="int8-activation DECODE steps on int4 decoder "
                         "weights (requires --quantize-weights int4): "
                         "161 tok/s 7B decode vs 142 weight-only "
                         "int4 and 98 int8 on one v5e")
    ap.add_argument("--supervise", action="store_true",
                    help="run under a supervisor: TPU-worker crashes "
                         "(UNAVAILABLE) exit+relaunch the serving "
                         "process; sessions restore from "
                         "--auto-snapshot-dir")
    ap.add_argument("--auto-snapshot-dir",
                    help="snapshot each session after every successful "
                         "/ingest and /ask; boot restores all snapshots "
                         "(required for --supervise recovery to keep "
                         "streams)")
    ap.add_argument("--restart-cooldown", type=float, default=90.0,
                    help="seconds between supervisor relaunches (a "
                         "crashed TPU worker takes ~a minute to return)")
    ap.add_argument("--dispatch-pace-ms", type=float, default=0.0,
                    help="minimum gap between chunked-ingest device "
                         "dispatches — the measured mitigation for the "
                         "axon worker's intermittent kernel fault "
                         "under rapid ingest cadence (STATUS.md)")
    args = ap.parse_args()

    if args.supervise:
        child_argv = [sys.executable, "-m",
                      "cogstream_tpu.runtime.serve"] + [
            a for a in sys.argv[1:] if a != "--supervise"]
        raise SystemExit(run_supervised(
            child_argv, cooldown_s=args.restart_cooldown))

    from ..config import load_generation_config, load_hf_config
    from ..models.checkpoint import load_cogreasoner_from_hf
    from ..processor.tokenizer import load_tokenizer

    cfg = load_hf_config(f"{args.model_dir}/config.json")
    text_flags = {}
    if args.w8a8_prefill:
        if not args.quantize_weights:
            raise SystemExit("--w8a8-prefill requires --quantize-weights")
        text_flags["w8a8_prefill"] = True
    if args.w4a8_decode:
        if args.quantize_weights != "int4":
            raise SystemExit("--w4a8-decode requires "
                             "--quantize-weights int4")
        text_flags["w4a8_decode"] = True
    if text_flags:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, **text_flags))
    params = load_cogreasoner_from_hf(
        args.model_dir, cfg,
        quantize_text_bits={"int8": 8, "int4": 4}.get(
            args.quantize_weights))
    tok = load_tokenizer(args.model_dir, cfg.image_token_index,
                         cfg.text.vocab_size)
    print(f"serving on :{args.port}"
          + (f" (pooled x{args.pool_rows})" if args.pool_rows else ""))
    eos = load_generation_config(args.model_dir).eos_token_ids
    serve(SessionServer(params, cfg, tok, max_len=args.max_len,
                        pool_rows=args.pool_rows,
                        extra_eos_ids=tuple(eos or ()),
                        encoder_int8=args.encoder_int8,
                        auto_snapshot_dir=args.auto_snapshot_dir,
                        dispatch_pace_ms=args.dispatch_pace_ms),
          args.port)


if __name__ == "__main__":
    main()
