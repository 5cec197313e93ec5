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
            f.flush()
            os.fsync(f.fileno())   # durability: a rename that commits
            # before the data blocks flush leaves a truncated file that
            # resumable pipelines would skip forever
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def atomic_write_json(path: str, obj: Any, indent: int = 1) -> None:
    atomic_write_text(path, json.dumps(obj, indent=indent))


def atomic_write_npz(path: str, **arrays: Any) -> None:
    """np.savez via tmp-file + rename (atomic on POSIX)."""
    import numpy as np

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_", suffix=".npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def pack_array(a) -> tuple:
    """(uint8 byte view, dtype name) — lets np.savez carry extension
    dtypes (bfloat16, float8) that its header format can't express."""
    import numpy as np

    a = np.ascontiguousarray(np.asarray(a))
    if a.ndim == 0:
        # unpack_array cannot restore a 0-d shape (it returns the byte
        # view re-typed) — silently promoting to (1,) would break the
        # documented round trip; reject loudly instead
        raise ValueError("pack_array: 0-d arrays don't round-trip; "
                         "reshape to (1,) at the call site")
    return a.view(np.uint8), a.dtype.name


def unpack_array(b, dtype_name: str):
    """Inverse of pack_array."""
    import ml_dtypes  # jax dependency, always present
    import numpy as np

    try:
        dt = np.dtype(dtype_name)
    except TypeError:
        dt = np.dtype(getattr(ml_dtypes, dtype_name))
    return np.asarray(b).view(dt)
