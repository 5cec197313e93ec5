"""Bench-artifact line contract.

The driver captures a **2000-char stdout tail** and parses the LAST
line. Round 3's cumulative artifact line grew to 2057 chars, so it
arrived front-truncated and ``BENCH_r03.json`` had ``parsed: null``
(third round running — VERDICT r3 weak #1 / next #1). ``bench._emit``
now follows every full line with a COMPACT line hard-capped under
``bench.COMPACT_BUDGET`` (1900) chars; these tests pin that contract so
field growth can never silently re-break driver parsing.

bench.py imports no JAX at module scope, so this suite is pure-host.
"""
from __future__ import annotations

import io
import json
import sys

import pytest

import bench

# Every field name any section has ever emitted (union of the r3 local
# artifact's 61 keys and the round-4 additions), with worst-case-width
# values: floats serialized at full repr width, strings at their real
# lengths. If a new section adds fields, extend this list — the compact
# cap holds regardless (addition stops before the budget), but the
# inclusion assertions below document which fields are priority.
ALL_KNOWN_FIELDS = {
    "decode_tokens_per_sec": 11085.6123,
    "decoder_size": "0.5B-demo",
    "encoder_forward_s": 0.28671234,
    "encoder_int8_fps": 132.4212,
    "ingest_e2e_7b_backend": "cv2-thread",
    "ingest_e2e_7b_buffered_max": 16,
    "ingest_e2e_fps_7b": 43.4123,
    "int4_7b_decode_tok_s": 52.9712,
    "int4_7b_prefill_tok_s": 7756.112,
    "int4_7b_prefill_w4a8_tok_s": 8915.712,
    "int4_w4a8_7b_decode_tok_s": 154.0512,
    "int4u_7b_decode_tok_s": 141.5112,
    "int8_7b_decode_16k_tok_s_bf16kv": 61.2312,
    "int8_7b_decode_16k_tok_s_fp8kv": 64.9112,
    "int8_7b_decode_tok_s": 99.6312,
    "int8_7b_prefill_16k_tok_s": 2880.612,
    "int8_7b_prefill_32k_tok_s": 2412.312,
    "int8_7b_decode_32k_tok_s_bf16kv": 68.1212,
    "int8_7b_decode_32k_tok_s_fp8kv": 74.3412,
    "int8_7b_prefill_16k_w8a8_tok_s": 3227.312,
    "int8_7b_prefill_tok_s": 8121.412,
    "int8_7b_prefill_w8a8_tok_s": 10886.612,
    "kmeans_s": 0.047812,
    "la_7b_int4_decode_tok_s": 742.4712,
    "la_7b_int4_verify_vs_step": 0.49812,
    "la_7b_int8_decode_tok_s": 518.7412,
    "la_7b_int8_steps_for_64": 13,
    "la_verify_vs_decode_step": 0.94912,
    "la_7b_int8_fixed_decode_tok_s": 312.4412,
    "la_7b_int4_fixed_decode_tok_s": 489.1212,
    "pooled_7b_int4_ask_tok_s_b16": 1206.912,
    "pooled_7b_int4_ask_tok_s_b4": 421.712,
    "pooled_7b_int4_ask_tok_s_b8": 784.612,
    "pooled_7b_int4_decode_tok_s_b16": 1720.612,
    "pooled_7b_int4_decode_tok_s_b4": 608.312,
    "pooled_7b_int4_decode_tok_s_b8": 1083.112,
    "pooled_7b_int8_ask_tok_s_b4": 297.212,
    "pooled_7b_int8_ask_tok_s_b8": 563.512,
    "pooled_7b_int8_decode_tok_s_b4": 381.512,
    "pooled_7b_int8_decode_tok_s_b8": 736.612,
    "pooled_decode_tok_s_b4": 1105.412,
    "pooled_ingest_fps_b4": 69.612,
    "prefill_16k_tokens_per_sec": 24548.012,
    "prefill_tokens_per_sec": 33919.012,
    "preprocess_fps": 116.212,
    "preprocess_fps_raw": 158.212,
    "selector_cap_7b": 24,
    "session_7b_tokenizer": "qwen2-bpe",
    "session_ingest_fps": 76.312,
    "session_ingest_fps_7b": 32.912,
    "session_ingest_fps_7b_int4": 39.812,
    "session_ingest_fps_7b_w8a8": 37.312,
    "stage2_train_steps_per_sec": 3.94712,
    "stage2_7b_train_step_s": 1.84212,
    "stage2_7b_train_tok_s": 2224.112,
    "tunnel_upload_mbps": 39.912,
    "turn_p50_fcc_7b_int4_s": 0.554112,
    "turn_p50_fcc_7b_int4_typical_s": 0.482212,
    "turn_p50_fcc_7b_int8_s": 0.751812,
    "turn_p50_fcc_7b_int8_typical_s": 0.633612,
    "turn_p50_fcc_7b_w8a8_typical_s": 0.66412,
    "turn_p50_fcc_s": 0.190512,
    "turn_p50_s": 0.130412,
}


def _full_art():
    art = {"_encoder_fps": 62.112345, "_platform": "tpu",
           "_budget_skipped": ["train_stage2", "pool_demo"],
           "_done": ["encoder"], "_attempts": {"encoder": 1}}
    art.update(ALL_KNOWN_FIELDS)
    # a couple of error fields as a crashed run would carry
    art["e2e_ingest_7b_error"] = "XlaRuntimeError('UNAVAILABLE: " + \
        "worker process crashed due to error ... kernel fault')"[:300]
    art["quant4_error"] = "RuntimeError('x')"
    return art


def test_compact_line_fits_driver_tail_window():
    """THE round-4 contract: with every known field populated at
    worst-case width, the compact line stays under the 2000-char driver
    tail (with margin)."""
    line = json.dumps(bench._assemble_compact(_full_art()))
    assert len(line) < 1900, len(line)
    # and it round-trips
    back = json.loads(line)
    assert back["metric"] == "encoder_frames_per_sec_per_chip"
    assert back["compact"] is True


def test_compact_line_caps_even_with_unknown_field_growth():
    """Future sections adding arbitrarily many fields cannot re-break
    the cap: unknown fields never enter the compact line, and priority
    addition stops before the budget."""
    art = _full_art()
    for i in range(300):
        art[f"future_section_metric_with_a_long_name_{i:03d}"] = 12345.6789
    line = json.dumps(bench._assemble_compact(art))
    assert len(line) <= bench.COMPACT_BUDGET
    back = json.loads(line)
    allowed = set(bench.COMPACT_FIELDS) | {
        "metric", "value", "unit", "vs_baseline", "platform", "compact",
        "errors"}
    assert set(back) <= allowed


def test_compact_line_carries_headline_and_7b_serving_fields():
    back = json.loads(json.dumps(bench._assemble_compact(_full_art())))
    for k in ("value", "vs_baseline", "platform",
              "session_ingest_fps_7b", "turn_p50_fcc_7b_int8_s",
              "int8_7b_decode_tok_s", "ingest_e2e_fps_7b",
              "int8_7b_decode_16k_tok_s_bf16kv",
              "turn_p50_fcc_7b_int4_s", "budget_skipped"):
        assert k in back, k
    assert back["errors"] == 2


def test_emit_last_stdout_line_is_compact_and_parseable():
    """_emit prints the full line THEN the compact line — any stdout
    tail ends with a parseable line."""
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        bench._emit(_full_art())
    finally:
        sys.stdout = old
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 2
    assert len(json.loads(lines[0])) > len(json.loads(lines[1]))
    last = lines[-1]
    assert len(last) < 1900
    assert json.loads(last)["compact"] is True


def test_partial_artifact_compact_is_small_and_valid():
    """Early emissions (headline only) must also satisfy the contract —
    a crash after section 1 still leaves a parseable tail."""
    art = {"_encoder_fps": 62.0, "_platform": "tpu",
           "encoder_forward_s": 0.51}
    line = json.dumps(bench._assemble_compact(art))
    assert len(line) < 400
    assert json.loads(line)["value"] == 62.0


def test_post_crash_sibling_map_names_real_fields():
    """Every POST_CRASH_SIBLINGS key/value must be a known artifact
    field, so the depressed-section guard can actually fire."""
    for k, sib in bench.POST_CRASH_SIBLINGS.items():
        assert k in ALL_KNOWN_FIELDS, k
        assert sib in ALL_KNOWN_FIELDS, sib
