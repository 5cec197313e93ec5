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
