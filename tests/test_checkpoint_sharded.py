"""Sharded HF checkpoint load lands every leaf directly under its GSPMD
spec, with no unsharded device intermediates left behind.

The reference ships one flat 16 GB safetensors checkpoint; on a 16 GB
v5e chip the load only works if no device ever materializes an
unsharded leaf (SURVEY.md §7). These tests exercise
``load_cogreasoner_from_hf(mesh=...)`` on the 8-virtual-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.config import CogReasonerConfig
from cogstream_tpu.models.checkpoint import (load_cogreasoner_from_hf,
                                             save_cogreasoner_to_hf)
from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
from cogstream_tpu.parallel.sharding import (cogreasoner_param_specs,
                                             specs_to_shardings)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path_factory.mktemp("ckpt") / "hf")
    save_cogreasoner_to_hf(params, cfg, out, dtype=jnp.float32)
    return out, cfg


def test_sharded_load_matches_specs(hf_dir, mesh8):
    out, cfg = hf_dir
    before = {id(a) for a in jax.live_arrays()}
    loaded = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32,
                                      mesh=mesh8)
    shardings = specs_to_shardings(cogreasoner_param_specs(cfg, mesh8),
                                   mesh8)
    leaves, treedef = jax.tree.flatten(loaded)
    shard_leaves = jax.tree.flatten(shardings)[0]
    assert len(leaves) == len(shard_leaves)
    for leaf, want in zip(leaves, shard_leaves):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            leaf.shape, leaf.sharding, want)

    # Nothing unsharded survived the load: every array the load created
    # is one of the returned (spec-sharded) leaves.
    leaf_ids = {id(l) for l in leaves}
    new = [a for a in jax.live_arrays() if id(a) not in before]
    strays = [a for a in new if id(a) not in leaf_ids]
    assert not strays, [(a.shape, a.sharding) for a in strays]


def test_sharded_load_values_match_local(hf_dir, mesh8):
    out, cfg = hf_dir
    local = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32)
    sharded = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32,
                                       mesh=mesh8)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        local, sharded)


def test_lazy_state_dict_reads_on_demand(hf_dir):
    from cogstream_tpu.models.checkpoint import _LazyStateDict

    out, _ = hf_dir
    sd = _LazyStateDict(out)
    assert len(sd) > 0
    name = next(iter(sd))
    assert name in sd
    first = sd[name]
    assert isinstance(first, np.ndarray)
    assert "definitely.not.a.weight" not in sd


def test_quantized_load_matches_quantize_tree(hf_dir):
    """quantize_text_bits=8 must equal loading bf16 then running
    ops/quant.quantize_tree — same q/scale math, just streamed on host
    so no bf16 decoder ever materializes (7B on one 16 GB chip)."""
    from cogstream_tpu.ops.quant import quantize_tree

    out, cfg = hf_dir
    plain = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32)
    want = quantize_tree(plain["text"])
    got = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32,
                                   quantize_text_bits=8)
    # vision/projector untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        plain["vision"], got["vision"])
    kern = got["text"]["layers"]["attn"]["q_proj"]["kernel"]
    assert kern["q"].dtype == jnp.int8
    assert not isinstance(got["text"]["embed_tokens"], dict)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=1e-6),
        want, got["text"])


def test_quantized_sharded_load_lands_on_adapted_specs(hf_dir, mesh8):
    from cogstream_tpu.parallel.sharding import adapt_specs_to_quantized

    out, cfg = hf_dir
    got = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32,
                                   mesh=mesh8, quantize_text_bits=8)
    specs = adapt_specs_to_quantized(
        got, cogreasoner_param_specs(cfg, mesh8))
    shardings = specs_to_shardings(specs, mesh8)
    leaves = jax.tree.flatten(got)[0]
    shard_leaves = jax.tree.flatten(shardings)[0]
    assert len(leaves) == len(shard_leaves)
    for leaf, want in zip(leaves, shard_leaves):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            leaf.shape, leaf.sharding, want)


def test_int4_load_matches_quantize_tree(hf_dir):
    """quantize_text_bits=4 must equal loading bf16 then running
    quantize_tree(bits=4, rank1=True, nf4=False) — the host-numpy
    rank-1 fit mirrors the jnp one bit-for-bit, so a 4-bit 7B loads
    for serving with no bf16 decoder or offline conversion step."""
    from cogstream_tpu.ops.quant import quantize_tree

    out, cfg = hf_dir
    plain = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32)
    want = quantize_tree(plain["text"], bits=4, rank1=True, nf4=False)
    got = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32,
                                   quantize_text_bits=4)
    kern = got["text"]["layers"]["attn"]["q_proj"]["kernel"]
    assert kern["q4"].dtype == jnp.int8
    assert kern["code"].shape[-1] == 1     # uniform tag (GEMV route)
    assert not isinstance(got["text"]["embed_tokens"], dict)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=1e-6),
        want, got["text"])


def test_int4_sharded_load_lands_on_adapted_specs(hf_dir, mesh8):
    from cogstream_tpu.parallel.sharding import adapt_specs_to_quantized

    out, cfg = hf_dir
    got = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32,
                                   mesh=mesh8, quantize_text_bits=4)
    specs = adapt_specs_to_quantized(
        got, cogreasoner_param_specs(cfg, mesh8))
    shardings = specs_to_shardings(specs, mesh8)
    leaves = jax.tree.flatten(got)[0]
    shard_leaves = jax.tree.flatten(shardings)[0]
    assert len(leaves) == len(shard_leaves)
    for leaf, want in zip(leaves, shard_leaves):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            leaf.shape, leaf.sharding, want)
