"""Pipeline parallelism (parallel/pipeline.py): GPipe-microbatched
decoder forward matches the single-device forward bit-for-bit-ish, with
LoRA adapters sharded by stage, padding rows masked, and gradients
flowing through the ppermute schedule.

The reference has no PP at all (SURVEY.md §2.3) — these tests exist to
keep the TPU-native axis honest: same numerics as the dense scan, any
(data × pipe) layout, differentiable end to end.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.config import LoRAConfig
from cogstream_tpu.models import qwen2
from cogstream_tpu.models.lora import init_cogreasoner_lora
from cogstream_tpu.parallel.pipeline import (
    make_pipeline_mesh, pipeline_decoder_forward)


@pytest.fixture(scope="module")
def setup(tiny_config):
    # 4 layers so the stage axis can be 2 or 4
    cfg = dataclasses.replace(tiny_config.text, num_hidden_layers=4)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 8, 16
    ids = rng.integers(3, 100, size=(B, S)).astype(np.int32)
    pos = np.tile(np.arange(S, dtype=np.int32), (B, 1))
    pos[-1, -4:] = -1      # padding tokens must stay masked through PP
    emb = qwen2.embed(params, jnp.asarray(ids))
    ref, _ = qwen2.qwen2_forward(params, emb, jnp.asarray(pos), cfg)
    return cfg, params, emb, jnp.asarray(pos), ref


@pytest.mark.parametrize("stages,dp,microbatches", [
    (2, 1, 4), (4, 1, 8), (4, 2, 4), (2, 4, 2),
])
def test_pipeline_matches_dense(setup, stages, dp, microbatches):
    cfg, params, emb, pos, ref = setup
    mesh = make_pipeline_mesh(n_stages=stages, data_parallel=dp)
    out = pipeline_decoder_forward(
        params, emb, pos, cfg, mesh, num_microbatches=microbatches)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-5)


def test_pipeline_with_lora_adapters(setup, tiny_config):
    cfg, params, emb, pos, _ = setup
    full = dataclasses.replace(tiny_config, text=cfg)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), full,
                                 LoRAConfig())
    adapters = [(lora["text"], jnp.float32(1.0))]
    ref, _ = qwen2.qwen2_forward(params, emb, pos, cfg,
                                 adapters=adapters)
    mesh = make_pipeline_mesh(n_stages=4, data_parallel=2)
    out = pipeline_decoder_forward(
        params, emb, pos, cfg, mesh, num_microbatches=4,
        adapters=adapters)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-5)


def test_pipeline_gradients_match_dense(setup, tiny_config):
    """jax.grad through the ppermute schedule (GPipe backward) equals
    the dense-scan gradient, including with per-block remat."""
    cfg, params, emb, pos, _ = setup
    full = dataclasses.replace(tiny_config, text=cfg)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), full,
                                 LoRAConfig())
    ad = lora["text"]
    mesh = make_pipeline_mesh(n_stages=4, data_parallel=1)

    def loss_pp(ad):
        h = pipeline_decoder_forward(
            params, emb, pos, cfg, mesh, num_microbatches=4,
            adapters=[(ad, jnp.float32(1.0))], remat=True)
        return jnp.mean(h.astype(jnp.float32) ** 2)

    def loss_ref(ad):
        h, _ = qwen2.qwen2_forward(
            params, emb, pos, cfg, adapters=[(ad, jnp.float32(1.0))])
        return jnp.mean(h.astype(jnp.float32) ** 2)

    g_pp = jax.grad(loss_pp)(ad)
    g_ref = jax.grad(loss_ref)(ad)
    scale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g_ref))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=max(scale * 2e-2, 1e-7)),
        g_pp, g_ref)


def test_pipeline_rejects_bad_shapes(setup):
    cfg, params, emb, pos, _ = setup
    mesh = make_pipeline_mesh(n_stages=4, data_parallel=1)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_decoder_forward(params, emb, pos, cfg, mesh,
                                 num_microbatches=3)
    cfg3 = dataclasses.replace(cfg, num_hidden_layers=3)
    params3 = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg3)
    with pytest.raises(ValueError, match="stages must divide"):
        pipeline_decoder_forward(params3, emb, pos, cfg3, mesh,
                                 num_microbatches=4)


def test_pipeline_auto_microbatches_non_pow2_batch(setup):
    """Auto microbatch selection must pick a DIVISOR of B: B=10 with 2
    stages wants >= 8, so the smallest valid choice is 10 — the old
    min(B, 4*stages) picked 8 and crashed on its own default."""
    cfg, params, _, _, _ = setup
    rng = np.random.default_rng(3)
    B, S = 10, 16
    ids = rng.integers(3, 100, size=(B, S)).astype(np.int32)
    pos = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
    emb = qwen2.embed(params, jnp.asarray(ids))
    mesh = make_pipeline_mesh(n_stages=2, data_parallel=1)
    out = pipeline_decoder_forward(params, emb, pos, cfg, mesh)
    ref, _ = qwen2.qwen2_forward(params, emb, pos, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
