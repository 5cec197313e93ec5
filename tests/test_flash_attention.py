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
