"""Fused-unpack int4 GEMV kernel (ops/quant_gemv.py) — interpret-mode
parity against the materializing dequant, across schemes, M sizes, and
odd shapes. The real-chip perf claim is validated by
tools/int4_gemv_probe.py; here we pin numerics and dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.ops import quant
from cogstream_tpu.ops.quant import (dequantize_int4, int4_matmul,
                                     quantize_int4_rank1)
from cogstream_tpu.ops.quant_gemv import (gemv_viable, int4_rank1_gemv,
                                          _largest_divisor)

RNG = np.random.default_rng(7)


def _mk(din, dout, nf4=True):
    w = jnp.asarray(RNG.normal(size=(din, dout)).astype(np.float32))
    return w, quantize_int4_rank1(w, nf4=nf4)


@pytest.mark.parametrize("nf4", [True, False])
@pytest.mark.parametrize("m", [1, 3, 8, 17])
def test_cubic_kernel_matches_dequant(nf4, m):
    _, qp = _mk(512, 256, nf4=nf4)
    x = jnp.asarray(RNG.normal(size=(m, 512)).astype(np.float32))
    ref = x @ dequantize_int4(qp, jnp.float32)
    y = int4_rank1_gemv(x, qp, jnp.float32, interpret=True,
                        block_n=128, block_k=128)
    assert y.shape == ref.shape
    # bf16 dots: tolerance is bf16 rounding of the accumulated products
    err = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 2e-2


def test_uniform_static_and_w4a8():
    _, qp = _mk(512, 256, nf4=False)
    # the 1-element code shape is the static tag the kernel infers
    # uniform=... from (no flag passed here)
    assert qp["code"].shape == (1,)
    x = jnp.asarray(RNG.normal(size=(2, 512)).astype(np.float32))
    ref = x @ dequantize_int4(qp, jnp.float32)
    yu = int4_rank1_gemv(x, qp, jnp.float32,
                         interpret=True, block_n=128, block_k=128)
    assert float(jnp.max(jnp.abs(yu - ref)) / jnp.max(jnp.abs(ref))) < 2e-2
    yw = int4_rank1_gemv(x, qp, jnp.float32, w4a8=True,
                         interpret=True, block_n=128, block_k=128)
    # + per-row int8 activation rounding
    assert float(jnp.max(jnp.abs(yw - ref)) / jnp.max(jnp.abs(ref))) < 4e-2


def test_3d_batch_and_bf16_out():
    _, qp = _mk(256, 384)
    x = jnp.asarray(RNG.normal(size=(2, 5, 256)).astype(np.float32))
    y = int4_rank1_gemv(x, qp, jnp.bfloat16, interpret=True,
                        block_n=128, block_k=128)
    assert y.shape == (2, 5, 384) and y.dtype == jnp.bfloat16
    ref = (x @ dequantize_int4(qp, jnp.float32))
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))
                / jnp.max(jnp.abs(ref)))
    assert err < 3e-2


def test_viability_gate():
    _, qp = _mk(512, 256)
    assert gemv_viable(qp, 1)
    assert gemv_viable(qp, 64)
    assert not gemv_viable(qp, 65)          # prefill-sized M: XLA path
    # stacked [L] kernels never route to the kernel
    _, qps = _mk(512, 256)
    qps = {k: v[None] for k, v in qps.items()}
    assert not gemv_viable(qps, 1)
    # group-wise (no rscale) scheme is not the kernel's format
    from cogstream_tpu.ops.quant import quantize_int4
    w = jnp.asarray(RNG.normal(size=(512, 256)).astype(np.float32))
    assert not gemv_viable(quantize_int4(w), 1)
    # unblockable dout (not a multiple of 128)
    w2 = jnp.asarray(RNG.normal(size=(512, 200)).astype(np.float32))
    assert not gemv_viable(quantize_int4_rank1(w2), 1)


def test_largest_divisor():
    assert _largest_divisor(1792, 256, 128) == 256
    assert _largest_divisor(9472, 256, 128) == 256
    assert _largest_divisor(4608, 512, 128) == 512
    assert _largest_divisor(152064, 512, 128) == 512
    assert _largest_divisor(200, 512, 128) is None


def test_int4_matmul_dispatch_identical_off_tpu():
    """On CPU the dispatch must stay on the XLA path (backend gate) —
    int4_matmul output is bit-identical with the flag toggled."""
    _, qp = _mk(512, 256)
    x = jnp.asarray(RNG.normal(size=(1, 512)).astype(np.float32))
    old = quant.USE_GEMV_KERNEL
    try:
        quant.USE_GEMV_KERNEL = True
        a = int4_matmul(x, qp, jnp.float32)
        quant.USE_GEMV_KERNEL = False
        b = int4_matmul(x, qp, jnp.float32)
    finally:
        quant.USE_GEMV_KERNEL = old
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dispatch_act_int8_routes_w4a8(monkeypatch):
    """quantized_matmul(w8a8=True) on a uniform tree reaches the W4A8
    kernel variant when the platform gate is open (config.w4a8_decode's
    path): output differs bitwise from the weight-only kernel (the
    activation rounding) but stays within its tolerance."""
    from cogstream_tpu.ops.quant import quantized_matmul

    _, qp = _mk(512, 256, nf4=False)
    x = jnp.asarray(RNG.normal(size=(1, 512)).astype(np.float32))
    monkeypatch.setattr(quant, "_gemv_route_ok", lambda: True)
    ref = x @ dequantize_int4(qp, jnp.float32)
    yw = quantized_matmul(x, qp, jnp.float32, w8a8=True)
    y0 = quantized_matmul(x, qp, jnp.float32, w8a8=False)
    assert float(jnp.max(jnp.abs(yw - ref)) / jnp.max(jnp.abs(ref))) < 4e-2
    assert not np.array_equal(np.asarray(yw), np.asarray(y0))


def test_w4a8_decode_flag_plumbs_to_decode_steps(monkeypatch):
    """cfg.w4a8_decode flips dense()'s w8a8 on S<16 programs (decode/
    verify) and leaves prefill-length programs weight-only; lm_logits
    forwards it too."""
    import dataclasses

    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.ops import quant as quant_mod

    cfg = dataclasses.replace(CogReasonerConfig.tiny().text,
                              w4a8_decode=True)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    params = quant.quantize_tree(params, bits=4, rank1=True, nf4=False)

    seen = []
    orig = quant_mod.quantized_matmul

    def spy(x, qp, out_dtype=None, w8a8=False):
        seen.append(bool(w8a8))
        return orig(x, qp, out_dtype, w8a8=w8a8)

    monkeypatch.setattr(quant_mod, "quantized_matmul", spy)

    cache = qwen2.init_kv_cache(cfg, 1, 64)
    emb = jnp.zeros((1, 1, cfg.hidden_size), jnp.float32)
    pos = jnp.asarray([[0]], jnp.int32)
    hidden, cache = qwen2.qwen2_forward(params, emb, pos, cfg,
                                        cache=cache)
    qwen2.lm_logits(params, hidden, w8a8=cfg.w4a8_decode)
    assert seen and all(seen)          # decode step: every GEMM W4A8

    seen.clear()
    emb32 = jnp.zeros((1, 32, cfg.hidden_size), jnp.float32)
    pos32 = jnp.arange(32, dtype=jnp.int32)[None]
    qwen2.qwen2_forward(params, emb32, pos32, cfg,
                        cache=qwen2.init_kv_cache(cfg, 1, 64))
    assert seen and not any(seen)      # prefill: weight-only


def _mk_stacked(L, din, dout):
    ws, qps = [], []
    for _ in range(L):
        w, qp = _mk(din, dout, nf4=False)
        ws.append(w)
        qps.append(qp)
    stacked = {k: jnp.stack([q[k] for q in qps]) for k in qps[0]}
    return ws, qps, stacked


def test_indexed_stacked_gemv_matches_dequant():
    """The layer-indexed kernel (stacked weights, scalar-prefetch
    index_map) matches the per-layer dequant reference for every
    layer, bf16-dot and w4a8 variants."""
    from cogstream_tpu.ops.quant_gemv import (gemv_viable_stacked,
                                              int4_rank1_gemv_stacked)

    L = 3
    ws, qps, stacked = _mk_stacked(L, 256, 256)
    assert gemv_viable_stacked(stacked, 1)
    x = jnp.asarray(RNG.normal(size=(2, 256)).astype(np.float32))
    for l in range(L):
        ref = x @ dequantize_int4(qps[l], jnp.float32)
        y = int4_rank1_gemv_stacked(x, stacked,
                                    jnp.asarray(l, jnp.int32),
                                    jnp.float32, interpret=True)
        err = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 2e-2, (l, err)
        yw = int4_rank1_gemv_stacked(x, stacked,
                                     jnp.asarray(l, jnp.int32),
                                     jnp.float32, w4a8=True,
                                     interpret=True)
        errw = float(jnp.max(jnp.abs(yw - ref)) / jnp.max(jnp.abs(ref)))
        assert errw < 4e-2, (l, errw)


def test_stacked_dispatch_and_fallback(monkeypatch):
    """int4_matmul on a stacked tree + 'layer' index: kernel route when
    the gate is open, layer-gathered dequant fallback when closed —
    both match the per-layer reference."""
    from cogstream_tpu.ops.quant import int4_matmul

    L = 2
    ws, qps, stacked = _mk_stacked(L, 256, 256)
    x = jnp.asarray(RNG.normal(size=(1, 256)).astype(np.float32))
    qp = {**stacked, "layer": jnp.asarray(1, jnp.int32)}
    ref = x @ dequantize_int4(qps[1], jnp.float32)
    # gate closed (CPU): gathers the layer slice, exact dequant matmul
    y0 = int4_matmul(x, qp, jnp.float32)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    monkeypatch.setattr(quant, "_gemv_route_ok", lambda: True)
    y1 = int4_matmul(x, qp, jnp.float32)
    err = float(jnp.max(jnp.abs(y1 - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 2e-2


def test_qwen2_decode_scan_uses_indexed_kernels(monkeypatch):
    """Decode-sized qwen2_forward on a stacked uniform-int4 tree routes
    every projection through the indexed GEMV (no per-layer slice copy)
    and matches the pure-XLA forward within kernel tolerance."""
    import dataclasses

    from cogstream_tpu.config import Qwen2Config
    from cogstream_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512, bos_token_id=1,
                      eos_token_id=2, dtype="float32")
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(1), cfg)
    params = quant.quantize_tree(params, bits=4, rank1=True, nf4=False)

    layers_xs, heavy = qwen2._split_stacked_gemv(params["layers"], 1)
    assert heavy is None                 # gate closed on CPU: no-op

    emb = jnp.asarray(RNG.normal(size=(1, 1, 256)).astype(np.float32))
    pos = jnp.asarray([[3]], jnp.int32)

    def fwd():
        cache = qwen2.init_kv_cache(cfg, 1, 16)
        h, c = qwen2.qwen2_forward(params, emb, pos, cfg, cache=cache)
        return h, c

    ref_h, ref_c = fwd()
    monkeypatch.setattr(quant, "_gemv_route_ok", lambda: True)
    layers_xs, heavy = qwen2._split_stacked_gemv(params["layers"], 1)
    assert heavy is not None and len(heavy) == 7   # all sites pulled
    got_h, got_c = fwd()
    err = float(jnp.max(jnp.abs(got_h - ref_h))
                / (float(jnp.max(jnp.abs(ref_h))) + 1e-9))
    assert err < 3e-2
    # the KV cache the indexed path wrote matches too
    kerr = float(jnp.max(jnp.abs(got_c.k - ref_c.k)))
    assert kerr < 3e-2 * float(jnp.max(jnp.abs(ref_c.k)) + 1e-9)


def test_w4a8_prefill_materializing_branch():
    """act_int8 at prefill-sized M (kernel not viable / gate closed):
    uniform trees take the int8-dot materializing branch within
    activation-rounding tolerance; cubic trees ignore the flag
    bit-for-bit (their codebook bends nibbles off-integer)."""
    from cogstream_tpu.ops.quant import int4_matmul

    x = jnp.asarray(RNG.normal(size=(128, 512)).astype(np.float32))
    _, qpu = _mk(512, 256, nf4=False)
    ref = x @ dequantize_int4(qpu, jnp.float32)
    y = int4_matmul(x, qpu, jnp.float32, act_int8=True)
    err = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 4e-2
    y0 = int4_matmul(x, qpu, jnp.float32, act_int8=False)
    assert not np.array_equal(np.asarray(y), np.asarray(y0))
    _, qpc = _mk(512, 256, nf4=True)
    a = int4_matmul(x, qpc, jnp.float32, act_int8=True)
    b = int4_matmul(x, qpc, jnp.float32, act_int8=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_indexed_route_composes_with_lora_adapters(monkeypatch):
    """LoRA adapters scan alongside the restructured xs: the indexed
    int4 route must leave adapter deltas bit-identical (they ride the
    dense bf16 path on top of the quantized base)."""
    import dataclasses

    from cogstream_tpu.config import Qwen2Config, LoRAConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.lora import init_qwen2_lora

    cfg = Qwen2Config(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512, bos_token_id=1,
                      eos_token_id=2, dtype="float32")
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(1), cfg)
    params = quant.quantize_tree(params, bits=4, rank1=True, nf4=False)
    ad = init_qwen2_lora(jax.random.PRNGKey(7), cfg, LoRAConfig())
    # standard LoRA inits b to zeros (delta 0) — randomize so adapter
    # deltas actually flow through the restructured scan
    ad = jax.tree.map(
        lambda v: (jnp.asarray(RNG.normal(size=v.shape)
                               .astype(np.float32)) * 0.05
                   if v.shape[-2] == LoRAConfig().rank else v), ad)
    adapters = [(ad, jnp.asarray(1.0))]

    emb = jnp.asarray(RNG.normal(size=(1, 1, 256)).astype(np.float32))
    pos = jnp.asarray([[0]], jnp.int32)

    def fwd():
        cache = qwen2.init_kv_cache(cfg, 1, 16)
        h, _ = qwen2.qwen2_forward(params, emb, pos, cfg, cache=cache,
                                   adapters=adapters)
        return h

    ref = fwd()
    monkeypatch.setattr(quant, "_gemv_route_ok", lambda: True)
    got = fwd()
    err = float(jnp.max(jnp.abs(got - ref))
                / (float(jnp.max(jnp.abs(ref))) + 1e-9))
    assert err < 3e-2


def test_int4_session_with_fp8_kv(monkeypatch):
    """Serving-matrix corner: rank-1 uniform int4 decoder (indexed GEMV
    route forced) + fp8 KV cache + W4A8 decode in one streaming
    session — the capacity-max single-chip configuration."""
    import dataclasses

    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = CogReasonerConfig.tiny()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(
            cfg.text, hidden_size=256, intermediate_size=512,
            num_attention_heads=4, num_key_value_heads=2,
            vocab_size=1024, w4a8_decode=True))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    params = {**params,
              "text": quant.quantize_tree(params["text"], bits=4,
                                          rank1=True, nf4=False)}
    monkeypatch.setattr(quant, "_gemv_route_ok", lambda: True)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False,
                            kv_dtype=jnp.float8_e4m3fn)
    assert sess.cache.k.dtype == jnp.float8_e4m3fn
    rng = np.random.default_rng(4)
    pv = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    r = sess.ask("what?", mode="FCC", max_new_tokens=4)
    assert isinstance(r["text"], str)
    assert r["selection"] is not None
