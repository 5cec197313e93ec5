"""Qwen2 decoder: parity with HF transformers, KV-cache consistency,
position-tagged masking, LoRA gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.config import Qwen2Config
from cogstream_tpu.models.checkpoint import qwen2_params_from_state_dict
from cogstream_tpu.models.qwen2 import (
    embed,
    init_kv_cache,
    init_qwen2_params,
    lm_logits,
    qwen2_forward,
)

TINY = Qwen2Config(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, dtype="float32")


def _hf_model():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.Qwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.Qwen2ForCausalLM(cfg).eval(), torch


def test_parity_with_hf_qwen2():
    model, torch = _hf_model()
    params = qwen2_params_from_state_dict(
        model.state_dict(), TINY, dtype=np.float32)

    ids = np.array([[3, 17, 254, 9, 88, 151, 2]], np.int64)
    with torch.no_grad():
        theirs = model(torch.from_numpy(ids)).logits.numpy()

    positions = jnp.arange(ids.shape[1], dtype=jnp.int32)[None]
    hidden, _ = qwen2_forward(params, embed(params, jnp.asarray(ids)),
                              positions, TINY)
    ours = np.asarray(lm_logits(params, hidden))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_cache_matches_full_forward():
    key = jax.random.PRNGKey(0)
    params = init_qwen2_params(key, TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 9)))
    x = embed(params, ids)
    pos = jnp.arange(9, dtype=jnp.int32)[None]

    full, _ = qwen2_forward(params, x, pos, TINY)

    cache = init_kv_cache(TINY, batch=1, max_len=16)
    h1, cache = qwen2_forward(params, x[:, :5], pos[:, :5], TINY, cache=cache)
    outs = [h1]
    for i in range(5, 9):
        hi, cache = qwen2_forward(params, x[:, i:i + 1], pos[:, i:i + 1],
                                  TINY, cache=cache)
        outs.append(hi)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_invalidated_cache_slots_are_ignored():
    """Scattering -1 into cache.pos must make those tokens invisible —
    the primitive behind history retrieval (drop unselected QA turns)."""
    key = jax.random.PRNGKey(1)
    params = init_qwen2_params(key, TINY)
    rng = np.random.default_rng(1)
    ids_all = rng.integers(0, 256, (1, 8))
    # sequence A = tokens 0..3, junk = 4..5, continuation = 6..7
    ids_clean = np.concatenate([ids_all[:, :4], ids_all[:, 6:]], axis=1)

    x_all = embed(params, jnp.asarray(ids_all))
    cache = init_kv_cache(TINY, 1, 16)
    _, cache = qwen2_forward(params, x_all[:, :6],
                             jnp.arange(6, dtype=jnp.int32)[None], TINY,
                             cache=cache)
    # invalidate the junk tokens (slots 4,5)
    cache = cache._replace(pos=cache.pos.at[:, 4:6].set(-1))
    h_last, _ = qwen2_forward(params, x_all[:, 6:],
                              jnp.array([[4, 5]], jnp.int32), TINY,
                              cache=cache)

    x_clean = embed(params, jnp.asarray(ids_clean))
    full, _ = qwen2_forward(params, x_clean,
                            jnp.arange(6, dtype=jnp.int32)[None], TINY)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(full[:, 4:]),
                               rtol=1e-4, atol=1e-4)


def test_padding_positions_masked():
    key = jax.random.PRNGKey(2)
    params = init_qwen2_params(key, TINY)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 5)))
    x = embed(params, ids)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    base, _ = qwen2_forward(params, x, pos, TINY)

    pad = jnp.zeros((1, 3, TINY.hidden_size), x.dtype)
    xp = jnp.concatenate([x, pad], axis=1)
    posp = jnp.concatenate([pos, jnp.full((1, 3), -1, jnp.int32)], axis=1)
    padded, _ = qwen2_forward(params, xp, posp, TINY)
    np.testing.assert_allclose(np.asarray(padded[:, :5]), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def _tiny_lora(key, params, rank=2):
    """Adapter tree mirroring params for q_proj only (stacked [L])."""
    k1, k2 = jax.random.split(key)
    L, din, dout = params["layers"]["attn"]["q_proj"]["kernel"].shape
    return {"layers": {"attn": {"q_proj": {
        "a": jax.random.normal(k1, (L, din, rank)) * 0.1,
        "b": jax.random.normal(k2, (L, rank, dout)) * 0.1,
    }}}}


def test_lora_gating():
    key = jax.random.PRNGKey(3)
    params = init_qwen2_params(key, TINY)
    adapter = _tiny_lora(jax.random.PRNGKey(4), params)
    ids = jnp.asarray([[5, 6, 7]])
    x = embed(params, ids)
    pos = jnp.arange(3, dtype=jnp.int32)[None]

    base, _ = qwen2_forward(params, x, pos, TINY)
    off, _ = qwen2_forward(params, x, pos, TINY,
                           adapters=[(adapter, jnp.float32(0.0))])
    on, _ = qwen2_forward(params, x, pos, TINY,
                          adapters=[(adapter, jnp.float32(1.0))])
    np.testing.assert_allclose(np.asarray(off), np.asarray(base),
                               rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-4


def test_chunked_attention_matches_dense():
    from cogstream_tpu.ops.attention import (
        causal_gqa_attention, chunked_causal_gqa_attention)

    rng = np.random.default_rng(0)
    B, S, T, Hq, Hkv, D = 2, 48, 80, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
    qp = jnp.asarray(np.tile(np.arange(32, 32 + S), (B, 1)))
    kp = jnp.asarray(np.tile(np.arange(T), (B, 1)))
    valid = jnp.asarray(rng.random((B, T)) > 0.1)
    ref = causal_gqa_attention(q, k, v, qp, valid, kp)
    out = chunked_causal_gqa_attention(q, k, v, qp, valid, kp,
                                       kv_chunk=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    # long-context dispatch picks the chunked path implicitly
    out2 = causal_gqa_attention(q, k, v, qp, valid, kp,
                                chunk_threshold=64)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=2e-5)


def test_bf16_attention_matches_f32_reference():
    """bf16 inputs route the GEMMs through half-precision inputs with
    f32 accumulation (ops/attention.gemm_dtype); the result must stay
    within bf16 rounding of the full-f32 reference on both the dense
    and chunked paths."""
    from cogstream_tpu.ops.attention import (
        causal_gqa_attention, chunked_causal_gqa_attention, gemm_dtype)

    assert gemm_dtype(jnp.bfloat16) == jnp.bfloat16
    assert gemm_dtype(jnp.float32) == jnp.float32

    rng = np.random.default_rng(7)
    B, S, T, Hq, Hkv, D = 2, 40, 72, 4, 2, 16
    qf = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
    qp = jnp.asarray(np.tile(np.arange(32, 32 + S), (B, 1)))
    kp = jnp.asarray(np.tile(np.arange(T), (B, 1)))
    valid = jnp.asarray(rng.random((B, T)) > 0.1)

    ref = np.asarray(causal_gqa_attention(qf, kf, vf, qp, valid, kp))
    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (qf, kf, vf))
    for out in (
        causal_gqa_attention(qb, kb, vb, qp, valid, kp),
        chunked_causal_gqa_attention(qb, kb, vb, qp, valid, kp,
                                     kv_chunk=32),
    ):
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   atol=4e-2)


def test_chunked_attention_gradients_match():
    from cogstream_tpu.ops.attention import (
        causal_gqa_attention, chunked_causal_gqa_attention)

    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, D = 1, 40, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])

    def loss_dense(q, k, v):
        return jnp.sum(causal_gqa_attention(q, k, v, pos) ** 2)

    def loss_chunk(q, k, v):
        return jnp.sum(chunked_causal_gqa_attention(
            q, k, v, pos, kv_chunk=16) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    gc = jax.grad(loss_chunk, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gd, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_hf_export_roundtrip(tmp_path):
    """save_cogreasoner_to_hf is the exact inverse of
    load_cogreasoner_from_hf: weights trained here deploy back into the
    reference/HF layout with identical forwards."""
    import jax.numpy as jnp

    import os

    from cogstream_tpu.config import CogReasonerConfig, load_hf_config
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.checkpoint import (
        load_cogreasoner_from_hf, save_cogreasoner_to_hf)
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    out = save_cogreasoner_to_hf(params, cfg, str(tmp_path / "ckpt"),
                                 dtype=jnp.float32)
    cfg2 = load_hf_config(os.path.join(out, "config.json"))
    assert cfg2.text.num_hidden_layers == cfg.text.num_hidden_layers
    assert cfg2.vision.hidden_size == cfg.vision.hidden_size

    params2 = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0, atol=0)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 200, size=(1, 16)), jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    h1, _ = qwen2.qwen2_forward(params["text"], qwen2.embed(
        params["text"], ids), pos, cfg.text)
    h2, _ = qwen2.qwen2_forward(params2["text"], qwen2.embed(
        params2["text"], ids), pos, cfg.text)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_merge_lora_matches_adapter_forward():
    """Folding LoRA into the base == running with the resident adapter
    (PEFT merge_and_unload parity), decoder and projector both."""
    import jax.numpy as jnp

    from cogstream_tpu.config import CogReasonerConfig, LoRAConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.checkpoint import merge_lora
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.models.lora import init_cogreasoner_lora
    from cogstream_tpu.models.projector import projector_forward

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), cfg,
                                 LoRAConfig(rank=2,
                                            include_projector=True))
    # b is zero-init (delta 0); randomize so the merge is non-trivial
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(
            jax.random.PRNGKey(2), x.shape, x.dtype), lora)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 200, size=(1, 16)), jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    want, _ = qwen2.qwen2_forward(
        params["text"], qwen2.embed(params["text"], ids), pos, cfg.text,
        adapters=[(lora["text"], jnp.float32(1.0))], lora_scale=2.0)

    merged = merge_lora(params, lora, lora_scale=2.0)
    got, _ = qwen2.qwen2_forward(
        merged["text"], qwen2.embed(merged["text"], ids), pos, cfg.text)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # projector LoRA folds too (multimodal_loss_fn applies it as a
    # per-linear delta on the same inputs → kernel' = kernel + a@b*s)
    x = jnp.asarray(rng.normal(size=(4, cfg.vision.hidden_size)),
                    jnp.float32)
    base = projector_forward(params["projector"], x)
    got_p = projector_forward(merged["projector"], x)
    assert np.abs(np.asarray(got_p) - np.asarray(base)).max() > 0


def test_export_loads_into_torch_hf():
    """The exported safetensors load straight into torch transformers'
    Qwen2ForCausalLM and reproduce our logits — round-trip proof that
    training here deploys to the reference/HF stack."""
    import os
    import tempfile

    from safetensors import safe_open

    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.checkpoint import save_cogreasoner_to_hf
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params

    model, torch = _hf_model()
    # build a full CogReasoner tree whose text half mirrors TINY
    cfg = CogReasonerConfig.tiny()
    import dataclasses
    cfg = dataclasses.replace(cfg, text=TINY)
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)

    with tempfile.TemporaryDirectory() as td:
        out = save_cogreasoner_to_hf(params, cfg, td, dtype=jnp.float32)
        sd = {}
        with safe_open(os.path.join(out, "model.safetensors"),
                       framework="pt") as fh:
            for name in fh.keys():
                if name.startswith(("model.layers.", "model.embed_",
                                    "model.norm.", "lm_head.")):
                    sd[name] = fh.get_tensor(name)
        missing, unexpected = model.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        assert not [m for m in missing if "rotary" not in m], missing

    ids = np.array([[3, 17, 254, 9, 88, 151, 2]], np.int64)
    with torch.no_grad():
        theirs = model(torch.from_numpy(ids)).logits.numpy()
    positions = jnp.arange(ids.shape[1], dtype=jnp.int32)[None]
    hidden, _ = qwen2_forward(
        params["text"], embed(params["text"], jnp.asarray(ids)),
        positions, TINY)
    ours = np.asarray(lm_logits(params["text"], hidden))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_w8a8_prefill_parity_and_decode_path_untouched():
    """w8a8_prefill=True runs int8 kernels' prefill GEMMs with int8
    activations (MXU double-rate serving mode). Prefill hidden states
    must stay close to the weight-only dequant form, and decode-length
    programs (S < 16) must be BIT-identical with the flag on or off —
    the switch is trace-time on S, so the weights-bound decode path
    never pays the activation-quant ops."""
    import dataclasses

    from cogstream_tpu.ops.quant import quantize_tree

    key = jax.random.PRNGKey(9)
    params = init_qwen2_params(key, TINY)
    q8 = quantize_tree(params, bits=8,
                       predicate=lambda name: name != "embed_tokens")
    cfg_w8 = dataclasses.replace(TINY, w8a8_prefill=True)

    rng = np.random.default_rng(5)
    ids = rng.integers(3, TINY.vocab_size, size=(2, 32)).astype(np.int32)
    x = embed(q8, jnp.asarray(ids))
    pos = jnp.tile(jnp.arange(32, dtype=jnp.int32), (2, 1))

    ref, _ = qwen2_forward(q8, x, pos, TINY)
    out, _ = qwen2_forward(q8, x, pos, cfg_w8)
    ref, out = np.asarray(ref), np.asarray(out)
    num = np.sum(ref * out, axis=-1)
    den = np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    assert (num / np.maximum(den, 1e-9)).min() > 0.99

    # decode step (S=1): same program with or without the flag
    cache_a = init_kv_cache(TINY, 1, 8, dtype=jnp.float32)
    cache_b = init_kv_cache(TINY, 1, 8, dtype=jnp.float32)
    step = embed(q8, jnp.asarray(ids[:1, :1]))
    p1 = jnp.zeros((1, 1), jnp.int32)
    da, _ = qwen2_forward(q8, step, p1, TINY, cache=cache_a)
    db, _ = qwen2_forward(q8, step, p1, cfg_w8, cache=cache_b)
    np.testing.assert_array_equal(np.asarray(da), np.asarray(db))

    # q4 kernels ignore the flag (weight-only unpack feeds a bf16 dot)
    q4 = quantize_tree(params, bits=4, group_size=32,
                       predicate=lambda name: name != "embed_tokens")
    a, _ = qwen2_forward(q4, x, pos, TINY)
    b, _ = qwen2_forward(q4, x, pos, cfg_w8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_attention_masks_invisible_and_padded_rows():
    """Dense causal_gqa_attention must match the chunked path's
    semantics: kv slots at position -1 are invisible even without
    kv_valid, and fully-masked query rows return zeros (not softmax's
    uniform average over stale slots)."""
    from cogstream_tpu.ops.attention import (
        causal_gqa_attention, chunked_causal_gqa_attention)

    rng = np.random.default_rng(11)
    B, S, T, Hq, Hkv, D = 1, 3, 8, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
    q_pos = jnp.asarray([[0, 1, -1]], jnp.int32)       # last row padded
    kv_pos = jnp.asarray([[0, 1, -1, -1, -1, -1, -1, -1]], jnp.int32)
    dense = np.asarray(causal_gqa_attention(q, k, v, q_pos,
                                            kv_positions=kv_pos))
    chunked = np.asarray(chunked_causal_gqa_attention(
        q, k, v, q_pos, kv_positions=kv_pos, kv_chunk=4))
    np.testing.assert_allclose(dense, chunked, rtol=1e-5, atol=1e-5)
    # padded query row is exactly zero on both paths
    np.testing.assert_array_equal(dense[0, 2], np.zeros((Hq, D)))
    # the invisible kv slots changed nothing: recompute with only the
    # two real slots
    ref = np.asarray(causal_gqa_attention(
        q[:, :2], k[:, :2], v[:, :2], q_pos[:, :2]))
    np.testing.assert_allclose(dense[0, :2], ref[0], rtol=1e-5, atol=1e-5)
