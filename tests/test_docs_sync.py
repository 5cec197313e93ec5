"""README perf figures must be generated from a checked-in bench
artifact (round-1 verdict: hand-written numbers drifted 2.5x above the
measured JSON). tools/sync_bench_docs.py owns the block between the
bench-sync markers; this test re-renders it from the artifact the block
names and asserts the README matches byte-for-byte."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_block_in_sync():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "sync_bench_docs.py"),
         "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
