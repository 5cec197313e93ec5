"""Atomic JSON writes (the race-free replacement for the reference's
whole-file rewrites, SURVEY.md §5)."""

import json
import os

from cogstream_tpu.utils.io import atomic_write_json, atomic_write_text


def test_atomic_write_and_replace(tmp_path):
    p = str(tmp_path / "x.json")
    atomic_write_json(p, {"a": 1})
    assert json.load(open(p)) == {"a": 1}
    atomic_write_json(p, {"a": 2})
    assert json.load(open(p)) == {"a": 2}
    # no stray temp files left behind
    assert [f for f in os.listdir(tmp_path)
            if f.startswith(".tmp_")] == []


def test_atomic_write_failure_leaves_original(tmp_path, monkeypatch):
    p = str(tmp_path / "y.json")
    atomic_write_json(p, {"ok": True})

    class Boom:
        def __str__(self):
            raise RuntimeError("serialization failure")

    try:
        atomic_write_text(p, Boom())   # write() raises TypeError
    except Exception:
        pass
    assert json.load(open(p)) == {"ok": True}   # original intact
    assert [f for f in os.listdir(tmp_path)
            if f.startswith(".tmp_")] == []      # temp cleaned up
