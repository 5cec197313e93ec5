"""Int8 quantization (N5 analogue) + profiling utils."""

import numpy as np
import jax
import jax.numpy as jnp

from cogstream_tpu.ops.quant import (
    dequantize_int8, is_quantized, quantize_int8, quantize_tree)


def test_int8_roundtrip_error_small(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    qp = quantize_int8(w)
    assert qp["q"].dtype == jnp.int8
    back = dequantize_int8(qp, jnp.float32)
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01    # 127-level symmetric quant ~0.4% worst case


def test_quantized_decoder_forward_close(tiny_config, rng):
    from cogstream_tpu.models import qwen2

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params)
    assert is_quantized(qparams["layers"]["attn"]["q_proj"]["kernel"])
    # stacked [L] layout preserved through quantization
    assert qparams["layers"]["attn"]["q_proj"]["kernel"]["q"].shape[0] \
        == cfg.num_hidden_layers

    ids = jnp.asarray(rng.integers(3, 200, size=(1, 16)))
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    h_full, _ = qwen2.qwen2_forward(params, qwen2.embed(params, ids),
                                    pos, cfg)
    h_q, _ = qwen2.qwen2_forward(qparams, qwen2.embed(qparams, ids),
                                 pos, cfg)
    # int8 base keeps activations close (LoRA training tolerates this)
    err = np.abs(np.asarray(h_full - h_q)).mean()
    ref = np.abs(np.asarray(h_full)).mean()
    assert err / ref < 0.05, (err, ref)


def test_stage_timer_summary():
    from cogstream_tpu.utils.profiling import StageTimer

    t = StageTimer()
    for v in (0.01, 0.02, 0.03):
        t.record("encode", v)
    with t.stage("decode"):
        pass
    s = t.summary()
    assert s["encode"]["n"] == 3
    assert abs(s["encode"]["p50_s"] - 0.02) < 1e-9
    assert "decode" in s


def test_qlora_train_step_on_int8_base(tiny_config):
    """QLoRA analogue: frozen int8 base + trainable LoRA (the
    reference's NF4 + LoRA mode, second_stage_training.py:266-294)."""
    from cogstream_tpu.config import LoRAConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.lora import init_qwen2_lora
    from cogstream_tpu.train.trainer import (
        bind_text_loss, init_train_state, make_optimizer, make_train_step)

    cfg = tiny_config.text
    lora_cfg = LoRAConfig(rank=4)
    params = quantize_tree(
        qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg))
    lora = init_qwen2_lora(jax.random.PRNGKey(1), cfg, lora_cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 200, size=(2, 24)).astype(np.int32)
    labels = ids.copy()
    labels[:, :12] = -100
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}

    tx = make_optimizer(5e-2, total_steps=10, warmup_steps=1)
    step = make_train_step(tx, bind_text_loss(cfg, lora_cfg), donate=False)
    state = init_train_state(tx, lora)
    losses = []
    for _ in range(6):
        state, loss = step(params, state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


# ---------------------------------------------------------------------------
# 4-bit (int4 / NF4) base quantization — the reference's QLoRA scheme
# (second_stage_training.py:266-271)
# ---------------------------------------------------------------------------


def test_int4_pack_roundtrip(rng):
    from cogstream_tpu.ops.quant import dequantize_int4, quantize_int4

    w = jnp.asarray(rng.normal(size=(128, 32)), jnp.float32)
    qp = quantize_int4(w, group_size=64, nf4=False)
    assert qp["q4"].shape == (64, 32)       # two values per byte
    assert qp["q4"].dtype == jnp.int8       # int8 tags the uniform scheme
    assert qp["scale"].shape == (2, 32)     # one scale per 64-row group
    back = dequantize_int4(qp, jnp.float32)
    assert back.shape == w.shape
    # uniform int4: error bounded by half a quantization step per group
    step = np.asarray(qp["scale"])
    err = np.abs(np.asarray(back - w))
    bound = np.repeat(step, 64, axis=0) * 0.5 + 1e-6
    assert (err <= bound).all()


def test_nf4_beats_uniform_on_gaussian(rng):
    from cogstream_tpu.ops.quant import dequantize_int4, quantize_int4

    w = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32)
    rmse = {}
    for nf4 in (True, False):
        qp = quantize_int4(w, nf4=nf4)
        back = dequantize_int4(qp, jnp.float32)
        rmse[nf4] = float(jnp.sqrt(jnp.mean((back - w) ** 2)))
    # the NF4 codebook is matched to normal weights (QLoRA's rationale)
    assert rmse[True] < rmse[False]


def test_nf4_codebook_values_exact():
    from cogstream_tpu.ops.quant import (
        NF4_CODE, POLY_NF4_CODE, quantize_int4)

    # the stored codebook is the degree-7 polynomial through the
    # canonical NF4 quantiles — NF4 to within bf16 precision (the
    # polynomial form is what lets dequant fuse into the GEMM instead
    # of a 16-entry gather; see ops/quant.py docstring)
    np.testing.assert_allclose(np.asarray(POLY_NF4_CODE),
                               np.asarray(NF4_CODE), rtol=0, atol=3e-3)

    w = jnp.asarray(np.array(POLY_NF4_CODE, np.float32)[:, None])
    qp = quantize_int4(w, group_size=16, nf4=True)
    from cogstream_tpu.ops.quant import dequantize_int4

    back = dequantize_int4(qp, jnp.float32)
    # codebook entries quantize to themselves (absmax = 1) up to the
    # f32 Horner evaluation's rounding
    np.testing.assert_allclose(np.asarray(back), np.asarray(w),
                               rtol=0, atol=5e-5)


def test_int4_fused_matmul_matches_dequant(rng):
    """int4_matmul's fused fast path (split halves + group-aligned
    3D dot) must equal the materializing dequant, both schemes."""
    from cogstream_tpu.ops.quant import (
        dequantize_int4, int4_matmul, quantize_int4)

    w = jnp.asarray(rng.normal(size=(256, 48)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 256)), jnp.float32)
    for nf4 in (True, False):
        qp = quantize_int4(w, group_size=64, nf4=nf4)  # 2 groups/half
        ref = x @ dequantize_int4(qp, jnp.float32)
        got = int4_matmul(x, qp, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-4)


def test_int4_rank1_roundtrip_and_fused_matmul(rng):
    """The rank-1 serving scheme: w ≈ code(nib)·r[p]·c[o]; fused
    matmul path must equal the materializing dequant."""
    from cogstream_tpu.ops.quant import (
        dequantize_int4, int4_matmul, quantize_int4, quantize_int4_rank1)

    # structured weights (per-row/col variance — rank-1's home turf)
    w = (rng.normal(size=(256, 48))
         * np.exp(rng.normal(0, 0.5, (256, 1)))
         * np.exp(rng.normal(0, 0.5, (1, 48))))
    w = jnp.asarray(w, jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 256)), jnp.float32)
    for nf4 in (True, False):
        qp = quantize_int4_rank1(w, nf4=nf4)
        assert set(qp) == {"q4", "scale", "rscale", "code"}
        assert qp["q4"].dtype == jnp.int8     # signed cubic/uniform nibbles
        assert qp["scale"].shape == (48,)
        assert qp["rscale"].shape == (256,)
        # 1-element code statically tags the uniform scheme
        assert qp["code"].shape == ((2,) if nf4 else (1,))
        back = dequantize_int4(qp, jnp.float32)
        rel = float(jnp.sqrt(jnp.mean((back - w) ** 2))
                    / jnp.sqrt(jnp.mean(w ** 2)))
        assert rel < 0.2, rel
        ref = x @ back
        got = int4_matmul(x, qp, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-3)
    # on row/col-structured weights rank-1 NF4 should at least match
    # group-64 NF4 (probe: 0.100 vs 0.106 rel RMSE)
    e_r1 = float(jnp.sqrt(jnp.mean(
        (dequantize_int4(quantize_int4_rank1(w), jnp.float32) - w) ** 2)))
    e_g = float(jnp.sqrt(jnp.mean(
        (dequantize_int4(quantize_int4(w), jnp.float32) - w) ** 2)))
    assert e_r1 < 1.25 * e_g, (e_r1, e_g)


def test_int4_rank1_decoder_forward_close(tiny_config, rng):
    from cogstream_tpu.models import qwen2

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_tree(params, bits=4, rank1=True)
    kern = q4["layers"]["attn"]["q_proj"]["kernel"]
    assert "rscale" in kern and kern["q4"].dtype == jnp.int8
    # stacked [L] kernels carry per-layer codebook coefficients so the
    # decoder scan can slice them
    assert kern["code"].shape == (cfg.num_hidden_layers, 2)

    ids = jnp.asarray(rng.integers(3, 200, size=(1, 16)))
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    h_full, _ = qwen2.qwen2_forward(params, qwen2.embed(params, ids),
                                    pos, cfg)
    h_q, _ = qwen2.qwen2_forward(q4, qwen2.embed(q4, ids), pos, cfg)
    err = np.abs(np.asarray(h_full - h_q)).mean()
    ref = np.abs(np.asarray(h_full)).mean()
    assert err / ref < 0.25, (err, ref)


def test_int4_decoder_forward_close(tiny_config, rng):
    from cogstream_tpu.models import qwen2

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_tree(params, bits=4)
    kern = q4["layers"]["attn"]["q_proj"]["kernel"]
    assert is_quantized(kern) and "q4" in kern
    assert kern["q4"].dtype == jnp.uint8    # uint8 tags the NF4 scheme
    # stacked [L] layout: packed din halves, leading L intact
    assert kern["q4"].shape[0] == cfg.num_hidden_layers
    assert kern["q4"].shape[1] == cfg.hidden_size // 2

    ids = jnp.asarray(rng.integers(3, 200, size=(1, 16)))
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    h_full, _ = qwen2.qwen2_forward(params, qwen2.embed(params, ids),
                                    pos, cfg)
    h_q, _ = qwen2.qwen2_forward(q4, qwen2.embed(q4, ids), pos, cfg)
    err = np.abs(np.asarray(h_full - h_q)).mean()
    ref = np.abs(np.asarray(h_full)).mean()
    # 4-bit base is coarser than int8 (random tiny-init weights are the
    # worst case — no outlier structure for the codebook to exploit);
    # usable-for-QLoRA is asserted functionally by the train-step test
    assert err / ref < 0.25, (err, ref)


def test_int4_memory_half_of_int8(tiny_config):
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.ops.quant import quantized_bytes

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    # exclude the (unquantized, dominant at tiny scale) embeddings
    b8 = quantized_bytes(quantize_tree(params)["layers"])
    b4 = quantized_bytes(quantize_tree(params, bits=4)["layers"])
    assert b4 < 0.62 * b8   # ~0.5 + group-scale overhead


def test_qlora_train_step_on_nf4_base(tiny_config):
    """The reference's exact mode: frozen NF4 base + trainable LoRA
    (second_stage_training.py:266-294)."""
    from cogstream_tpu.config import LoRAConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.lora import init_qwen2_lora
    from cogstream_tpu.train.trainer import (
        bind_text_loss, init_train_state, make_optimizer, make_train_step)

    cfg = tiny_config.text
    lora_cfg = LoRAConfig(rank=4)
    params = quantize_tree(
        qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg), bits=4)
    lora = init_qwen2_lora(jax.random.PRNGKey(1), cfg, lora_cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 200, size=(2, 24)).astype(np.int32)
    labels = ids.copy()
    labels[:, :12] = -100
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}

    tx = make_optimizer(5e-2, total_steps=10, warmup_steps=1)
    step = make_train_step(tx, bind_text_loss(cfg, lora_cfg), donate=False)
    state = init_train_state(tx, lora)
    losses = []
    for _ in range(6):
        state, loss = step(params, state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_slice_output_channels_all_schemes(rng):
    """slice_output_channels(qp)[ids] matmuls identically to slicing
    the full quantized matmul's output columns — for plain, int8,
    group-int4 and rank-1 kernels (the constrained-decode lm_head
    path)."""
    from cogstream_tpu.ops.quant import (
        quantize_int8, quantize_int4, quantize_int4_rank1,
        quantized_matmul, slice_output_channels)

    din, dout, k = 64, 96, 7
    w = jnp.asarray(rng.normal(size=(din, dout)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, din)), jnp.bfloat16)
    ids = jnp.asarray(sorted(rng.choice(dout, k, replace=False)),
                      jnp.int32)

    # plain array
    plain = slice_output_channels(w, ids)
    np.testing.assert_array_equal(np.asarray(plain),
                                  np.asarray(w[:, ids]))

    for qp in (quantize_int8(w),
               quantize_int4(w, group_size=32),
               quantize_int4_rank1(w)):
        full = quantized_matmul(x, qp, jnp.float32)
        small = quantized_matmul(x, slice_output_channels(qp, ids),
                                 jnp.float32)
        np.testing.assert_allclose(np.asarray(full[:, ids]),
                                   np.asarray(small), rtol=1e-5,
                                   atol=1e-5)


def test_w8a8_ste_gradient(rng):
    """W8A8 under differentiation (stage-2 --w8a8-forward): the primal
    is the serving int8 path bit-for-bit; the activation gradient is
    EXACTLY the weight-only path's (straight-through estimator — the
    frozen base needs no weight grad)."""
    import jax

    from cogstream_tpu.ops.quant import (int8_act_matmul,
                                         quantize_int8,
                                         quantize_int8_act,
                                         quantized_matmul)

    din, dout = 64, 96
    w = jnp.asarray(rng.normal(size=(din, dout)), jnp.float32)
    qp = quantize_int8(w)
    x = jnp.asarray(rng.normal(size=(5, din)), jnp.float32)

    # primal parity with the explicit serving chain
    y = quantized_matmul(x, qp, jnp.float32, w8a8=True)
    xq, sx = quantize_int8_act(x)
    ref = int8_act_matmul(xq, sx, qp["q"], qp["scale"], jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    # STE gradient == weight-only gradient, exactly
    g_w8 = jax.grad(
        lambda x: jnp.sum(jnp.sin(
            quantized_matmul(x, qp, jnp.float32, w8a8=True))))(x)
    g_wo = jax.grad(
        lambda x: jnp.sum(jnp.sin(
            quantized_matmul(x, qp, jnp.float32, w8a8=False))))(x)
    assert float(jnp.max(jnp.abs(g_w8))) > 0
    # the two losses differ (act quant) so sin' differs slightly; the
    # LINEAR part of the cotangent path is identical — compare with a
    # linear loss for exactness
    gl_w8 = jax.grad(lambda x: jnp.sum(
        quantized_matmul(x, qp, jnp.float32, w8a8=True)))(x)
    gl_wo = jax.grad(lambda x: jnp.sum(
        quantized_matmul(x, qp, jnp.float32, w8a8=False)))(x)
    np.testing.assert_allclose(np.asarray(gl_w8), np.asarray(gl_wo),
                               rtol=1e-5, atol=1e-5)
    del g_w8, g_wo


def test_w8a8_forward_trains_lora(rng):
    """End-to-end: a LoRA adapter under an int8 W8A8 base receives
    usable gradients (the pre-STE behavior zeroed every gradient below
    the first base GEMM)."""
    import jax

    from cogstream_tpu.config import Qwen2Config
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.ops.quant import quantize_tree

    import dataclasses

    cfg = Qwen2Config(vocab_size=128, hidden_size=128,
                      intermediate_size=192, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=1,
                      dtype="float32", w8a8_prefill=True)
    params = quantize_tree(
        qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg), bits=8)
    r = 4
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    lora = {"layers": {"mlp": {"down_proj": {
        "a": jnp.asarray(rng.normal(size=(L, cfg.intermediate_size, r))
                         * 0.02, jnp.float32),
        "b": jnp.zeros((L, r, H), jnp.float32)}}}}
    ids = jnp.asarray(rng.integers(1, 127, (1, 32)), jnp.int32)
    pos = jnp.arange(32, dtype=jnp.int32)[None]

    def loss(lo):
        emb = qwen2.embed(params, ids)
        h, _ = qwen2.qwen2_forward(params, emb, pos, cfg,
                                   adapters=[(lo, jnp.float32(1.0))])
        lg = qwen2.lm_logits(params, h)
        return -jnp.mean(jax.nn.log_softmax(lg)[..., 0])

    g = jax.grad(loss)(lora)
    gb = g["layers"]["mlp"]["down_proj"]["b"]
    assert float(jnp.max(jnp.abs(gb))) > 0, \
        "LoRA b-matrix received zero gradient through the W8A8 base"
