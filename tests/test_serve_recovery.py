"""Supervised serving survives a mid-ingest TPU-worker crash.

VERDICT r3 weak #2 / next #2: the chunked camera-to-cache ingest
intermittently kills the axon TPU worker ('UNAVAILABLE: kernel
fault') and the wedged JAX client cannot recover in-process. The
serving answer is the supervisor + auto-snapshot + boot-restore chain
(runtime/serve.py module docstring). This test proves the WHOLE chain
on CPU with an injected mid-ingest backend-fatal fault
(COGSTREAM_FAULT_INGEST_DISPATCH — the worker-kill simulation):

  healthy ingest+ask → snapshot → CRASH mid-second-ingest → client
  sees 503 {"backend_fatal": true} → supervisor relaunches → fresh
  process restores the session → /ask works with history intact,
  no /session re-create, no re-ingest.
"""
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(port, path, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _wait_up(port, deadline_s=180):
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=5):
                return
        except Exception:
            time.sleep(0.5)
    raise TimeoutError("server did not come up")


def test_supervised_server_recovers_from_injected_worker_crash(tmp_path):
    import cv2

    video = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                        (64, 64))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 64, 3), np.uint8)
    for i in range(8 * 8):          # 8 s @ 8 fps → 8 frames at fps=1
        f = base.copy()
        f[:16, :16] = (i * 7) % 255
        w.write(f)
    w.release()

    snapdir = str(tmp_path / "snaps")
    port = _free_port()
    env = dict(os.environ)
    # ingest at fps=1 over 8 s = 8 frames = 4 chunks of 2: the first
    # ingest dispatches 4 chunks; the fault fires on dispatch #6 —
    # mid-way through the SECOND ingest
    env["COGSTREAM_FAULT_INGEST_DISPATCH"] = "6"
    sup = subprocess.Popen(
        [sys.executable, os.path.join(HERE, "serve_recovery_child.py"),
         "--port", str(port), "--snapdir", snapdir],
        env=env, start_new_session=True)
    try:
        _wait_up(port)
        r = _post(port, "/session", {"session_id": "s1"})
        assert r["session_id"] == "s1"
        r = _post(port, "/ingest", {"session_id": "s1",
                                    "video_path": video,
                                    "start": 0.0, "end": 8.0,
                                    "fps": 1.0})
        assert r["frames"] == 8 and r["cache_tokens"] > 0
        tokens_before = r["cache_tokens"]
        r = _post(port, "/ask", {"session_id": "s1",
                                 "question": "what happened?",
                                 "mode": "AC", "max_new_tokens": 4})
        assert r["turn"] == 0
        # snapshot exists (written after ingest and after ask)
        assert os.path.exists(os.path.join(snapdir, "s1.snap.npz"))

        # second ingest hits the injected fault mid-way → 503 with the
        # backend_fatal marker (the client's retry signal)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/ingest", {"session_id": "s1",
                                    "video_path": video,
                                    "start": 0.0, "end": 8.0,
                                    "fps": 1.0})
        assert ei.value.code == 503
        body = json.loads(ei.value.read())
        assert body["backend_fatal"] is True
        assert body["recovering"] is True   # supervised child

        # the supervisor replaces the process; the fresh child restores
        # s1 from its snapshot at boot
        time.sleep(1.0)
        _wait_up(port)
        # NO /session re-create, NO re-ingest: the restored session
        # answers with its history (turn index 1 proves the restored
        # turn-0 Q/A) over the restored cache
        r = _post(port, "/ask", {"session_id": "s1",
                                 "question": "and now?",
                                 "mode": "AC", "max_new_tokens": 4})
        assert r["turn"] == 1
        saved = _post(port, "/save", {"session_id": "s1",
                                      "path": str(tmp_path / "x.npz")})
        assert saved["cache_tokens"] >= tokens_before
    finally:
        os.killpg(os.getpgid(sup.pid), signal.SIGKILL)
        sup.wait(timeout=10)
