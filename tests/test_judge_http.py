"""OpenAICompatJudge / MLLMClient against a LOCAL OpenAI-schema stub.

The reference shipped judge clients that were missing from its repo
entirely (eval_1_IA.py:4-5) — these tests prove ours actually speaks
the OpenAI chat-completions wire format with no network and no openai
SDK (the TPU image ships neither): a stdlib ``http.server`` answers
``POST /v1/chat/completions`` and the client's retry, model-fallback,
score-extraction, usage-accounting and judge-directory None-score
resume behaviors are exercised end-to-end.
"""

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from cogstream_tpu.evaluate.judges import (OpenAICompatJudge,
                                           extract_scores, judge_directory,
                                           judge_video)


class _Stub:
    """Scriptable chat-completions endpoint. ``script`` is a list of
    planned responses: dicts (JSON body parts) or int HTTP errors; the
    last entry repeats once the script is exhausted."""

    def __init__(self, script):
        self.script = list(script)
        self.requests = []          # parsed request bodies, in order
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                assert self.path.endswith("/chat/completions")
                n = int(self.headers["Content-Length"])
                body = json.loads(self.rfile.read(n).decode())
                stub.requests.append(
                    {"body": body,
                     "auth": self.headers.get("Authorization")})
                plan = (stub.script.pop(0) if len(stub.script) > 1
                        else stub.script[0])
                if isinstance(plan, int):
                    self.send_response(plan)
                    self.end_headers()
                    return
                payload = {
                    "choices": [{"message": {
                        "content": plan.get("content", "")}}],
                    "usage": plan.get("usage",
                                      {"prompt_tokens": 7,
                                       "completion_tokens": 3}),
                }
                raw = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def log_message(self, *a):      # quiet
                pass

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/v1"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture
def stub_factory():
    stubs = []

    def make(script):
        s = _Stub(script)
        stubs.append(s)
        return s

    yield make
    for s in stubs:
        s.close()


def _judge(stub, **kw):
    return OpenAICompatJudge("judge-model", api_key="test-key",
                             base_url=stub.url, backoff=lambda s: None,
                             **kw)


def test_happy_path_scores_and_usage(stub_factory):
    stub = stub_factory([{"content": "Score: 7\nScore: 9",
                          "usage": {"prompt_tokens": 11,
                                    "completion_tokens": 5}}])
    j = _judge(stub)
    text = j.chat("sys rubric", "user items")
    assert extract_scores(text) == [7.0, 9.0]
    assert j.prompt_tokens == 11 and j.completion_tokens == 5
    body = stub.requests[0]["body"]
    assert body["model"] == "judge-model"
    assert body["temperature"] == 0.0
    assert [m["role"] for m in body["messages"]] == ["system", "user"]
    assert stub.requests[0]["auth"] == "Bearer test-key"


def test_retry_on_server_error(stub_factory):
    stub = stub_factory([500, {"content": "Score: 6"}])
    j = _judge(stub)
    assert extract_scores(j.chat("s", "u")) == [6.0]
    assert len(stub.requests) == 2       # one failure, one success


def test_fallback_model_after_half_retries(stub_factory):
    stub = stub_factory([500, 500, 500, {"content": "Score: 4"}])
    j = _judge(stub, max_retries=5, fallback_model="fallback-model")
    assert extract_scores(j.chat("s", "u")) == [4.0]
    models = [r["body"]["model"] for r in stub.requests]
    assert models[0] == "judge-model"
    assert models[-1] == "fallback-model"


def test_exhausted_retries_raise(stub_factory):
    stub = stub_factory([500])
    j = _judge(stub, max_retries=3)
    with pytest.raises(Exception):
        j.chat("s", "u")
    assert len(stub.requests) == 3


def test_judge_video_batching_over_http(stub_factory):
    """IA batches 5 items per call; the short batch pads with None."""
    stub = stub_factory([{"content": "Score: 8\nScore: 5\nScore: 10"}])
    j = _judge(stub)
    items = [{"question": f"q{i}", "prediction": f"p{i}",
              "ground_truth": f"g{i}"} for i in range(4)]
    scores = judge_video("IA", j, items)
    assert scores == [8.0, 5.0, 10.0, None]
    assert len(stub.requests) == 1       # one batched call for 4 items
    user = stub.requests[0]["body"]["messages"][1]["content"]
    assert "Item 4:" in user and "Give exactly 4" in user


def test_judge_directory_none_score_resume(stub_factory, tmp_path):
    """A judged file whose extraction failed (None) must re-judge ONLY
    the missing QA on the next pass — the merge-resume behavior the
    reference lacks (it skips whole existing files,
    eval_1_IA.py:107-109)."""
    pred = tmp_path / "pred"
    out = tmp_path / "out"
    os.makedirs(pred)
    video = {"QAs": [
        {"question": "q0", "prediction": "p0", "answer": "a0"},
        {"question": "q1", "prediction": "p1", "answer": "a1"},
    ]}
    with open(pred / "v.json", "w") as f:
        json.dump(video, f)

    # pass 1: DC judges per-item; q0 scores, q1's reply has no score
    stub = stub_factory([{"content": "Score: 9"},
                         {"content": "no score here"}])
    judge_directory("DC", _judge(stub), str(pred), str(out),
                    log=lambda *a: None)
    with open(out / "v.json") as f:
        judged = json.load(f)
    assert judged["QAs"][0]["scores"]["DC"] == 9.0
    assert judged["QAs"][1]["scores"]["DC"] is None

    # pass 2: only the None QA is re-sent
    stub2 = stub_factory([{"content": "Score: 3"}])
    judge_directory("DC", _judge(stub2), str(pred), str(out),
                    log=lambda *a: None)
    with open(out / "v.json") as f:
        judged = json.load(f)
    assert judged["QAs"][0]["scores"]["DC"] == 9.0   # untouched
    assert judged["QAs"][1]["scores"]["DC"] == 3.0
    assert len(stub2.requests) == 1
    assert "q1" in stub2.requests[0]["body"]["messages"][1]["content"]
