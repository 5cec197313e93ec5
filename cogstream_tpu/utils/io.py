"""Atomic file IO.

The reference's append-to-JSON helpers re-read and rewrite whole files
non-atomically (generation.py:13-34, split_videos.py:42-64 — a known
race if parallelized, SURVEY.md §5 "race detection"). Every writer in
this framework goes through tmp-file + rename, which is atomic on
POSIX, so concurrent pipeline shards can never interleave partial JSON.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def atomic_write_text(path: str, text: str) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_", suffix=".part")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def atomic_write_json(path: str, obj: Any, indent: int = 1) -> None:
    atomic_write_text(path, json.dumps(obj, indent=indent))
