"""Minimal production serving front-end for streaming sessions.

JSON-over-HTTP (stdlib only — no server deps in the TPU image):

    POST /session            {"session_id"?}            → creates a session
    POST /ingest             {"session_id", "video_path", "start", "end",
                              "fps"?}                   → decode+encode+cache
    POST /ask                {"session_id", "question", "mode"?}
                                                        → answer + latency
    GET  /stats                                         → per-stage timers

One TPU process serves many sessions; requests are serialized through a
lock (the model is one jitted program — concurrency comes from batching,
a later milestone). The reference has no serving story at all (its
"serving" is the torchrun eval script, answer_generate.py).
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np


class UnknownSession(Exception):
    pass


class SessionServer:
    def __init__(self, params, cfg, tokenizer, adapters=None,
                 max_len: int = 16384, use_pallas: bool = True):
        from ..utils.profiling import StageTimer
        from .session import StreamingSession

        self._mk = lambda: StreamingSession(
            params, cfg, tokenizer, adapters=adapters, max_len=max_len,
            use_pallas=use_pallas)
        self.sessions: Dict[str, object] = {}
        self.lock = threading.Lock()
        self.timer = StageTimer()
        self.cfg = cfg

    def _get(self, session_id: str):
        if session_id not in self.sessions:
            raise UnknownSession(f"unknown session {session_id!r}")
        return self.sessions[session_id]

    def create(self, session_id: str) -> Dict:
        with self.lock:
            self.sessions[session_id] = self._mk()
        return {"session_id": session_id}

    def ingest(self, session_id: str, video_path: str,
               start: Optional[float], end: Optional[float],
               fps: float = 1.0) -> Dict:
        from ..processor.image_processor import ImageProcessor
        from ..processor.video_loader import load_video

        with self.lock:
            sess = self._get(session_id)
            with self.timer.stage("ingest"):
                frames, timestamps, _ = load_video(
                    video_path, start_time=start, end_time=end, fps=fps,
                    max_frames=self.cfg.processor.max_frames)
                proc = ImageProcessor(self.cfg.processor)
                batch = proc([np.stack(frames)], modals=["video"])
                t, gh, gw = batch.grid_sizes[0]
                sess.append_stream_segment(
                    batch.pixel_values, (int(t), int(gh), int(gw)),
                    int(batch.merge_sizes[0]), timestamps)
        return {"frames": len(frames), "cache_tokens": sess.write_index}

    def ask(self, session_id: str, question: str, mode: str = "FCC",
            max_new_tokens: int = 512) -> Dict:
        with self.lock:
            sess = self._get(session_id)
            with self.timer.stage("ask"):
                out = sess.ask(question, mode=mode,
                               max_new_tokens=max_new_tokens)
        return out

    def stats(self) -> Dict:
        return self.timer.summary()


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
                    sid = req.get("session_id") or f"s{len(server.sessions)}"
                    return self._json(200, server.create(sid))
                if self.path == "/ingest":
                    return self._json(200, server.ingest(
                        req["session_id"], req["video_path"],
                        req.get("start"), req.get("end"),
                        req.get("fps", 1.0)))
                if self.path == "/ask":
                    return self._json(200, server.ask(
                        req["session_id"], req["question"],
                        req.get("mode", "FCC"),
                        req.get("max_new_tokens", 512)))
                return self._json(404, {"error": "unknown path"})
            except UnknownSession as e:
                return self._json(404, {"error": str(e)})
            except KeyError as e:
                return self._json(400, {"error": f"missing field {e}"})
            except Exception as e:
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):   # quiet
            pass

    return Handler


def serve(server: SessionServer, port: int = 8787):
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(server))
    httpd.serve_forever()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--max-len", type=int, default=16384)
    args = ap.parse_args()

    from ..config import load_hf_config
    from ..models.checkpoint import load_cogreasoner_from_hf
    from ..processor.tokenizer import HFTokenizer

    cfg = load_hf_config(f"{args.model_dir}/config.json")
    params = load_cogreasoner_from_hf(args.model_dir, cfg)
    tok = HFTokenizer(args.model_dir)
    print(f"serving on :{args.port}")
    serve(SessionServer(params, cfg, tok, max_len=args.max_len),
          args.port)


if __name__ == "__main__":
    main()
