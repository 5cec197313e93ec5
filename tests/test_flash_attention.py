"""Pallas varlen flash attention vs the jnp reference path.

Runs in interpreter mode on the virtual-CPU platform (conftest); the
same kernel compiles on TPU. Mirrors the contract of flash-attn's
varlen API used by the reference encoder
(modeling_videollama3_encoder.py:309-312).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.ops.attention import (
    segment_attention,
    segment_ids_from_lengths,
)
from cogstream_tpu.ops.flash_attention import (
    FlashRanges,
    kv_block_ranges,
    segment_flash_attention,
)


def test_kv_block_ranges_block_diagonal():
    # two segments of 128 → q block 0 only needs kv block 0, etc.
    seg = segment_ids_from_lengths(np.array([128, 128]))
    starts, counts, kmax = kv_block_ranges(seg, 128, 128)
    assert starts.tolist() == [0, 1]
    assert counts.tolist() == [1, 1]
    assert kmax == 1


def test_kv_block_ranges_straddle():
    # a 200-token segment straddles two kv blocks
    seg = segment_ids_from_lengths(np.array([200, 56]))
    starts, counts, kmax = kv_block_ranges(seg, 128, 128)
    assert starts.tolist() == [0, 0]
    assert counts.tolist() == [2, 2]


@pytest.mark.parametrize("lengths,total", [
    ([64, 64], 128),
    ([100, 57, 200, 43], 428),     # padded to 512 internally
    ([300], 300),
])
def test_flash_matches_reference(rng, lengths, total):
    seg = segment_ids_from_lengths(np.array(lengths), total=total)
    N = seg.shape[0]
    H, D = 2, 24
    q = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    ref = segment_attention(q, k, v, jnp.asarray(seg))
    out = segment_flash_attention(q, k, v, seg, interpret=True)
    real = int(sum(lengths))
    np.testing.assert_allclose(np.asarray(out)[:real],
                               np.asarray(ref)[:real], atol=2e-5)


def test_adaptive_block_search():
    """FlashRanges.build picks the block size minimizing grid steps:
    whole-frame tiles for uniform segments (the 3.1x encoder win),
    something sane for ragged ones."""
    # 8 uniform 1024-token frames → one frame per block, kmax=1
    seg = segment_ids_from_lengths(np.array([1024] * 8))
    r = FlashRanges.build(seg)
    assert r.block_q == 1024 and r.kmax == 1
    assert (r.n_padded // r.block_q) * r.kmax == 8
    # ragged segments: whatever wins the search must cover correctly
    seg2 = segment_ids_from_lengths(np.array([1196] * 4))
    r2 = FlashRanges.build(seg2)
    steps_128 = None
    for b in (128, r2.block_q):
        rr = FlashRanges.build(seg2, block_q=b)
        steps = (rr.n_padded // b) * rr.kmax
        if b == 128:
            steps_128 = steps
    chosen = (r2.n_padded // r2.block_q) * r2.kmax
    assert chosen <= steps_128


def test_adaptive_block_correctness_ragged(rng):
    """Adaptively-chosen big blocks stay numerically correct on
    segments that straddle block boundaries."""
    lengths = [300, 170, 250]
    seg = segment_ids_from_lengths(np.array(lengths))
    r = FlashRanges.build(seg)
    assert r.block_q > 128         # the search picked a big block
    N = seg.shape[0]
    q = jnp.asarray(rng.normal(size=(N, 2, 16)), jnp.float32)
    out = segment_flash_attention(q, q, q, seg, ranges=r, interpret=True)
    ref = segment_attention(q, q, q, jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_flash_inside_jit_with_prebuilt_ranges(rng):
    lengths = [60, 68]
    seg = segment_ids_from_lengths(np.array(lengths))
    N = seg.shape[0]
    ranges = FlashRanges.build(seg)
    q = jnp.asarray(rng.normal(size=(N, 2, 16)), jnp.float32)

    @jax.jit
    def f(q, seg_dev):
        return segment_flash_attention(q, q, q, seg_dev, ranges=ranges,
                                       interpret=True)

    out = f(q, jnp.asarray(seg))
    ref = segment_attention(q, q, q, jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vision_encoder_pallas_path_matches(tiny_config, rng):
    from cogstream_tpu.models.vision_encoder import (
        init_vision_params, vision_encoder_forward)

    cfg = tiny_config.vision
    grid_sizes = np.array([[2, 4, 4]])   # 2 frames of 4x4 patches
    merge_sizes = np.array([2])
    n = int(np.prod(grid_sizes[0]))
    pv = rng.normal(size=(n, 3 * cfg.patch_size ** 2)).astype(np.float32)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    ref = vision_encoder_forward(params, pv, grid_sizes, merge_sizes, cfg,
                                 use_pallas=False)
    out = vision_encoder_forward(params, pv, grid_sizes, merge_sizes, cfg,
                                 use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_uniform_frame_block_candidate():
    """Non-power-of-two uniform frames get an EXACT whole-frame block:
    the 640x360 streaming resize yields 24x42 = 1008-patch frames where
    the best power-of-two block (1024) straddles frames at kmax=3 —
    3x the masked work (measured 3x encode time at 7B e2e ingest)."""
    seg = segment_ids_from_lengths(np.array([1008] * 16))
    r = FlashRanges.build(seg)
    assert r.block_q == 1008 and r.kmax == 1
    assert r.n_padded == 16 * 1008
    # frames not a sublane multiple keep the power-of-two search
    seg2 = segment_ids_from_lengths(np.array([1196] * 4))
    r2 = FlashRanges.build(seg2)
    assert r2.block_q in (128, 256, 512, 1024)


def test_uniform_frame_block_numerics(rng):
    """Aligned odd-size blocks stay numerically exact vs the dense
    reference (interpret mode)."""
    seg = segment_ids_from_lengths(np.array([136] * 16))
    r = FlashRanges.build(seg)
    assert r.block_q == 136 and r.kmax == 1
    N = seg.shape[0]
    q = jnp.asarray(rng.normal(size=(N, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(N, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, 2, 16)), jnp.float32)
    out = segment_flash_attention(q, k, v, seg, ranges=r, interpret=True)
    ref = segment_attention(q, k, v, jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_vision_encoder_padded_beyond_frames(rng):
    """The session pads encode shapes to 1024-row buckets; the
    whole-frame block candidate must stay correct when trailing pad
    rows (-1 segments) round the buffer past the frame grid."""
    lengths = np.array([136] * 6)
    seg = segment_ids_from_lengths(lengths)
    n = seg.shape[0]                       # 816
    pad_to = 1024
    seg_pad = np.concatenate([seg, np.full((pad_to - n,), -1, np.int32)])
    r = FlashRanges.build(seg_pad)
    q = jnp.asarray(rng.normal(size=(pad_to, 2, 16)), jnp.float32)
    out = segment_flash_attention(q, q, q, seg_pad, ranges=r,
                                  interpret=True)
    ref = segment_attention(q, q, q, jnp.asarray(seg_pad))
    np.testing.assert_allclose(np.asarray(out[:n]), np.asarray(ref[:n]),
                               atol=2e-5)
