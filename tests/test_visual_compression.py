"""run_visual_compression gating (C7 orchestration): the
question-independent pixel-diff mask is ALWAYS on (the reference
applies _get_compression_mask even when event selection returns [],
cogreasoner_chat.py:552-555), event machinery only engages on uniform
pure-video streams with K < T, and skewed events respect the summary
pad budget."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
from cogstream_tpu.models.cogreasoner import (
    build_summary_batch, init_cogreasoner_params, run_visual_compression)
from cogstream_tpu.processor.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    return cfg, params, tok


def _static_video(t, gh, gw, ps=14):
    """Frames identical except the first — pixel-diff should drop
    nearly everything after frame 0."""
    rng = np.random.default_rng(0)
    base = rng.normal(size=(gh * gw, 3 * ps * ps)).astype(np.float32)
    return np.tile(base, (t, 1))


def test_pixel_diff_runs_without_event_selection(setup):
    """A short stream (below min_events_for_compression) still gets the
    static-scene token drop."""
    cfg, params, tok = setup
    t, gh, gw, ms = 4, 4, 4, 2
    merged = (gh // ms) * (gw // ms)
    pv = _static_video(t, gh, gw)
    mm = jnp.asarray(np.random.default_rng(1).normal(
        size=(t * merged, cfg.text.hidden_size)).astype(np.float32))
    r = run_visual_compression(
        params, cfg, tok, mm, jnp.asarray(pv),
        np.array([[t, gh, gw]]), np.array([ms]), ["video"],
        np.arange(t, dtype=np.float64), np.array([1, 2], np.int32),
        jax.random.PRNGKey(0))
    keep = np.asarray(r.keep_visual)
    assert r.minor_frames is None            # event machinery inactive
    assert keep[:merged].all()               # frame 0 keeps everything
    # identical later frames collapse to min_tokens each
    assert keep[merged:].sum() == (t - 1) * cfg.compression.min_tokens_per_frame


def test_mixed_grids_skip_event_machinery_not_pixel_diff(setup):
    """Two video items with different merged counts: clustering would
    mix tokens across frame boundaries, so events must stay off — but
    each item still gets its own pixel-diff mask."""
    cfg, params, tok = setup
    cfg2 = dataclasses.replace(cfg, compression=CompressionConfig(
        frames_per_event=1, min_events_for_compression=2))
    t1, t2 = 3, 3
    pv1 = _static_video(t1, 4, 4)
    pv2 = _static_video(t2, 6, 6)
    m1 = (4 // 2) * (4 // 2)
    m2 = (6 // 2) * (6 // 2)
    mm = jnp.asarray(np.random.default_rng(2).normal(
        size=(t1 * m1 + t2 * m2, cfg.text.hidden_size)).astype(np.float32))
    r = run_visual_compression(
        params, cfg2, tok, mm,
        jnp.asarray(np.concatenate([pv1, pv2])),
        np.array([[t1, 4, 4], [t2, 6, 6]]), np.array([2, 2]),
        ["video", "video"],
        np.arange(t1 + t2, dtype=np.float64), np.array([1], np.int32),
        jax.random.PRNGKey(0))
    assert r.minor_frames is None
    keep = np.asarray(r.keep_visual)
    assert keep.shape == (t1 * m1 + t2 * m2,)
    assert keep[:m1].all() and keep[t1 * m1:t1 * m1 + m2].all()
    assert not keep.all()                    # static frames compressed


def test_k_equals_t_skips_clustering_gracefully(setup):
    """frames_per_event=1 → K == T: kmeans cannot run; the turn must
    degrade to pixel-diff-only instead of raising."""
    cfg, params, tok = setup
    cfg2 = dataclasses.replace(cfg, compression=CompressionConfig(
        frames_per_event=1, min_events_for_compression=2))
    t, gh, gw, ms = 4, 4, 4, 2
    merged = (gh // ms) * (gw // ms)
    mm = jnp.asarray(np.random.default_rng(3).normal(
        size=(t * merged, cfg.text.hidden_size)).astype(np.float32))
    r = run_visual_compression(
        params, cfg2, tok, mm, jnp.asarray(_static_video(t, gh, gw)),
        np.array([[t, gh, gw]]), np.array([ms]), ["video"],
        np.arange(t, dtype=np.float64), np.array([1], np.int32),
        jax.random.PRNGKey(0))
    assert r.minor_frames is None and np.asarray(r.keep_visual).any()


def test_summary_batch_caps_event_frames(setup):
    """summary_max_frames_per_event bounds a skewed cluster's prompt
    and pad_events_to gives stable K buckets."""
    _, _, tok = setup
    assignments = np.zeros((50,), np.int64)   # one giant event
    sb = build_summary_batch(tok, assignments, np.arange(50.0), 4, 1,
                             max_frames_per_event=8, pad_events_to=4)
    assert sb.input_ids.shape[0] == 4         # K padded
    assert (sb.feat_src[0] >= 0).sum() == 8 * 4   # capped frames
    assert (sb.positions[1:, 0] == 0).all()   # pad rows stay NaN-free
    assert (sb.positions[1:, 1:] == -1).all()