"""Compile-smoke guard for the native decoder (VERDICT r3 next #8).

native/videoio.cpp spawns the ffmpeg BINARY over a pipe (no libav dev
headers), so it compiles on any host with g++ — only RUNNING it needs
ffmpeg. Round 3 had no CI compile at all, so the 220-line C++ file
could rot silently; this test rebuilds it from source into a temp dir,
loads the result with ctypes, and checks the exact C API the Python
binding (processor/native_video.py) declares.
"""
import ctypes
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.quick

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "videoio.cpp")

API = ["vio_open", "vio_next", "vio_buffered", "vio_frames_decoded",
       "vio_close"]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_videoio_compiles_and_exports_the_ctypes_api(tmp_path):
    out = str(tmp_path / "libvideoio_test.so")
    r = subprocess.run(
        ["g++", "-O2", "-Wall", "-Werror", "-std=c++17", "-fPIC",
         "-pthread", "-shared", "-o", out, SRC],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lib = ctypes.CDLL(out)
    for sym in API:
        assert hasattr(lib, sym), f"missing symbol {sym}"


def test_python_binding_declares_only_exported_symbols():
    """The ctypes wrapper and the C source must agree on the symbol
    set — catches drift even on hosts without a toolchain."""
    with open(SRC, encoding="utf-8") as f:
        cpp = f.read()
    wrapper = os.path.join(ROOT, "cogstream_tpu", "processor",
                           "native_video.py")
    with open(wrapper, encoding="utf-8") as f:
        py = f.read()
    for sym in API:
        assert sym in cpp, f"{sym} gone from videoio.cpp"
        assert sym in py, f"{sym} gone from native_video.py"
