"""Parity tests for the LM Pallas attention kernels (ops/lm_attention)
against the XLA reference path (ops/attention.causal_gqa_attention),
run in interpreter mode on CPU.

The kernels replace the decoder-side half of SURVEY.md N1 (flash-attn
requested for the LM at first_stage_training.py:444,
second_stage_training.py:277, answer_generate.py:177).
"""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.ops.attention import causal_gqa_attention
from cogstream_tpu.ops import lm_attention as lma


def _mk_cache(rng, B, T, Hkv, D, fill, dtype=jnp.float32,
              holes=True, allowed=False):
    """Position-tagged cache region: ``fill`` real slots per row (with
    optional invisible holes), the rest empty (pos -1)."""
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), dtype)
    pos = np.full((B, T), -1, np.int32)
    for b in range(B):
        pos[b, :fill] = np.arange(fill)
        if holes and fill > 4:
            # evicted/invalidated slots inside the live region
            pos[b, fill // 3] = -1
            pos[b, fill // 2] = -1
    pos = jnp.asarray(pos)
    allow = None
    if allowed:
        a = rng.random((B, T)) > 0.3
        a[:, :2] = True
        allow = jnp.asarray(a)
    return k, v, pos, allow


def _xla_ref(q, k, v, qpos, kvpos, allow):
    valid = kvpos >= 0
    if allow is not None:
        valid = valid & allow
    return causal_gqa_attention(q, k, v, q_positions=qpos,
                                kv_valid=valid, kv_positions=kvpos)


# ---------------------------------------------------------------------------
# prefill kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("B,S,T,Hq,Hkv,fill", [
    (1, 128, 1024, 4, 2, 500),     # history + new chunk
    (2, 256, 2048, 8, 2, 1024),    # batched, deeper
    (1, 128, 1024, 4, 4, 0),       # MHA, empty cache (pure prefill)
    (1, 128, 1024, 7, 1, 300),     # G=7 (the Qwen2 group), Hkv=1
])
def test_prefill_parity(B, S, T, Hq, Hkv, fill):
    rng = np.random.default_rng(0)
    D = 128
    k, v, pos, allow = _mk_cache(rng, B, T, Hkv, D, fill, allowed=True)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    # new chunk occupies positions fill..fill+S-1, tail padded
    qpos = np.full((B, S), -1, np.int32)
    real = S - 17
    for b in range(B):
        qpos[b, :real] = fill + np.arange(real)
    qpos = jnp.asarray(qpos)
    # the chunk's own K/V are already written into the cache (as in
    # qwen2_forward: attention runs on the updated cache slice)
    kc = k.at[:, fill:fill + real].set(
        jnp.asarray(rng.standard_normal((B, real, Hkv, D)), jnp.float32))
    vc = v.at[:, fill:fill + real].set(
        jnp.asarray(rng.standard_normal((B, real, Hkv, D)), jnp.float32))
    pc = pos.at[:, fill:fill + real].set(qpos[:, :real])

    ref = _xla_ref(q, kc, vc, qpos, pc, allow)
    eff = lma.effective_kv_positions(pc, allow)
    out = lma.prefill_flash_attention(q, kc, vc, qpos, eff,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # padded queries produce exact zeros (matches the XLA guard)
    assert np.all(np.asarray(out)[:, real:] == 0.0)


def test_prefill_block_skip_counts():
    """The in-jit block counts must cover every participating block."""
    rng = np.random.default_rng(1)
    B, S, T, Hq, Hkv, D = 1, 128, 2048, 4, 2, 128
    k, v, pos, _ = _mk_cache(rng, B, T, Hkv, D, fill=128)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    qpos = jnp.asarray(128 + np.arange(S, dtype=np.int32))[None]
    kc = k.at[:, 128:128 + S].set(
        jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32))
    pc = pos.at[:, 128:128 + S].set(qpos)
    ref = _xla_ref(q, kc, v, qpos, pc, None)
    eff = lma.effective_kv_positions(pc)
    out = lma.prefill_flash_attention(q, kc, v, qpos, eff,
                                      block_q=128, block_k=256,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_fp8_cache():
    rng = np.random.default_rng(2)
    B, S, T, Hq, Hkv, D = 1, 128, 1024, 4, 2, 128
    fill = 256
    k, v, pos, _ = _mk_cache(rng, B, T, Hkv, D, fill, dtype=jnp.bfloat16)
    k8 = k.astype(jnp.float8_e4m3fn)
    v8 = v.astype(jnp.float8_e4m3fn)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.bfloat16)
    qpos = jnp.asarray(fill + np.arange(S, dtype=np.int32))[None]
    pc = pos.at[:, fill:fill + S].set(qpos)
    ref = _xla_ref(q, k8.astype(q.dtype), v8.astype(q.dtype),
                   qpos, pc, None)
    eff = lma.effective_kv_positions(pc)
    out = lma.prefill_flash_attention(q, k8, v8, qpos, eff,
                                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------

def _decode_setup(rng, L, B, T, Ts, S, Hq, Hkv, fills, side_fill,
                  dtype=jnp.float32, cache_dtype=None, allowed=False,
                  done=None, Bp=None, rows=None):
    D = 128
    cache_dtype = cache_dtype or dtype
    Bp = Bp or B
    mk = jnp.asarray(rng.standard_normal((L, Bp, T, Hkv, D)), cache_dtype)
    mv = jnp.asarray(rng.standard_normal((L, Bp, T, Hkv, D)), cache_dtype)
    mpos = np.full((Bp, T), -1, np.int32)
    for b in range(Bp):
        f = fills[b % len(fills)]
        mpos[b, :f] = np.arange(f)
        if f > 4:
            mpos[b, f // 2] = -1
    mpos = jnp.asarray(mpos)
    sk = jnp.asarray(rng.standard_normal((L, B, Ts, Hkv, D)), cache_dtype)
    sv = jnp.asarray(rng.standard_normal((L, B, Ts, Hkv, D)), cache_dtype)
    spos = np.full((B, Ts), -1, np.int32)
    rr = np.asarray(rows if rows is not None else np.arange(B))
    for b in range(B):
        base = fills[rr[b] % len(fills)]
        spos[b, :side_fill] = base + np.arange(side_fill)
    spos = jnp.asarray(spos)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), dtype)
    kn = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), dtype)
    vn = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), dtype)
    step_pos = np.zeros((B, S), np.int32)
    for b in range(B):
        base = fills[rr[b] % len(fills)] + side_fill
        step_pos[b] = base + np.arange(S)
        if done is not None and done[b]:
            step_pos[b] = -1
    step_pos = jnp.asarray(step_pos)
    allow = None
    if allowed:
        a = rng.random((B, T)) > 0.3
        a[:, 0] = True
        allow = jnp.asarray(a)
    return mk, mv, mpos, sk, sv, spos, q, kn, vn, step_pos, allow


def _decode_xla_ref(li, q, kn, vn, mk, mv, mpos, sk, sv, spos,
                    step_pos, allow, rows=None):
    """XLA reference mirroring qwen2_forward's side_cache branch at one
    layer: concat main ⊕ side ⊕ fresh."""
    B = q.shape[0]
    r = np.asarray(rows if rows is not None else np.arange(B))
    kcat = jnp.concatenate([mk[li][r], sk[li], kn.astype(mk.dtype)], axis=1)
    vcat = jnp.concatenate([mv[li][r], sv[li], vn.astype(mv.dtype)], axis=1)
    pcat = jnp.concatenate([mpos[r], spos, step_pos], axis=1)
    valid = pcat >= 0
    if allow is not None:
        full = jnp.concatenate(
            [allow, jnp.ones(spos.shape, bool),
             jnp.ones(step_pos.shape, bool)], axis=1)
        valid = valid & full
    return causal_gqa_attention(q, kcat.astype(q.dtype),
                                vcat.astype(q.dtype),
                                q_positions=step_pos, kv_valid=valid,
                                kv_positions=pcat)


@pytest.mark.parametrize("B,S,Hq,Hkv,fills,done", [
    (1, 1, 4, 2, [900], None),
    (2, 1, 8, 2, [700, 123], [False, True]),     # a finished row
    (1, 4, 7, 1, [640], None),                   # verify-width, G=7
    (3, 1, 4, 4, [512, 0, 77], None),            # MHA, an empty row
])
def test_decode_parity(B, S, Hq, Hkv, fills, done):
    rng = np.random.default_rng(3)
    L, T, Ts = 3, 2048, 32
    setup = _decode_setup(rng, L, B, T, Ts, S, Hq, Hkv, fills,
                          side_fill=5, allowed=True, done=done)
    mk, mv, mpos, sk, sv, spos, q, kn, vn, step_pos, allow = setup
    eff_m = jnp.repeat(lma.effective_kv_positions(mpos, allow),
                       Hkv, axis=1)
    eff_s = jnp.repeat(lma.effective_kv_positions(spos), Hkv, axis=1)
    for li in range(L):
        ref = _decode_xla_ref(li, q, kn, vn, mk, mv, mpos, sk, sv,
                              spos, step_pos, allow)
        out = lma.decode_splash_attention(
            q, kn, vn, mk, mv, sk, sv, jnp.int32(li), step_pos,
            eff_m, eff_s, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer {li}")


def test_decode_cache_rows():
    """Pooled single-storage mode: input rows address pool rows."""
    rng = np.random.default_rng(4)
    L, B, Bp, T, Ts, S, Hq, Hkv = 2, 2, 4, 2048, 32, 1, 4, 2
    rows = np.asarray([3, 1], np.int32)
    setup = _decode_setup(rng, L, B, T, Ts, S, Hq, Hkv,
                          fills=[100, 800, 40, 600], side_fill=3,
                          Bp=Bp, rows=rows)
    mk, mv, mpos, sk, sv, spos, q, kn, vn, step_pos, _ = setup
    eff_m_all = lma.effective_kv_positions(mpos)
    eff_m = jnp.repeat(eff_m_all[rows], Hkv, axis=1)
    eff_s = jnp.repeat(lma.effective_kv_positions(spos), Hkv, axis=1)
    for li in range(L):
        ref = _decode_xla_ref(li, q, kn, vn, mk, mv, mpos, sk, sv,
                              spos, step_pos, None, rows=rows)
        out = lma.decode_splash_attention(
            q, kn, vn, mk, mv, sk, sv, jnp.int32(li), step_pos,
            eff_m, eff_s, rows=jnp.asarray(rows), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_fp8_cache():
    rng = np.random.default_rng(5)
    L, B, T, Ts, S, Hq, Hkv = 2, 2048, 2048, 32, 1, 4, 2
    L = 2
    setup = _decode_setup(rng, L, 1, T, Ts, S, Hq, Hkv, [1500], 4,
                          dtype=jnp.bfloat16,
                          cache_dtype=jnp.float8_e4m3fn)
    mk, mv, mpos, sk, sv, spos, q, kn, vn, step_pos, _ = setup
    eff_m = jnp.repeat(lma.effective_kv_positions(mpos), Hkv, axis=1)
    eff_s = jnp.repeat(lma.effective_kv_positions(spos), Hkv, axis=1)
    ref = _decode_xla_ref(0, q, kn, vn, mk, mv, mpos, sk, sv, spos,
                          step_pos, None)
    out = lma.decode_splash_attention(
        q, kn, vn, mk, mv, sk, sv, jnp.int32(0), step_pos,
        eff_m, eff_s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_viability_gates():
    assert lma.prefill_viable(1, 2048, 16384, 28, 4, 128)
    assert not lma.prefill_viable(1, 32, 16384, 28, 4, 128)   # tiny S
    assert not lma.prefill_viable(1, 2048, 16384, 28, 4, 64)  # head dim
    # the splash kernel is OPT-IN on the real backend (axon stability,
    # see decode_viable's docstring)
    assert not lma.decode_viable(1, 1, 16384, 64, 28, 4, 128)
    os.environ["COGSTREAM_LM_ATTN_DECODE"] = "1"
    try:
        assert lma.decode_viable(1, 1, 16384, 64, 28, 4, 128)
        assert not lma.decode_viable(1, 1, 512, 64, 28, 4, 128)
        assert not lma.decode_viable(1, 1, 16384, 50, 28, 4, 128)
    finally:
        del os.environ["COGSTREAM_LM_ATTN_DECODE"]


# ---------------------------------------------------------------------------
# integrated route (qwen2_forward / generate_tokens with kernels forced)
# ---------------------------------------------------------------------------

def _tiny_cfg():
    from cogstream_tpu.config import Qwen2Config

    return Qwen2Config(vocab_size=512, hidden_size=512,
                       intermediate_size=768, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       dtype="float32")


def _run_routes(fn, monkeypatch):
    """Run ``fn()`` with the Pallas route off, then forced (interpret),
    clearing jit caches in between (the route is a trace-time
    decision)."""
    monkeypatch.setenv("COGSTREAM_LM_ATTN", "off")
    jax.clear_caches()
    ref = fn()
    monkeypatch.setenv("COGSTREAM_LM_ATTN", "interpret")
    # the splash decode kernel is opt-in on the real backend (axon
    # stability, see ops/lm_attention.decode_viable) — force it here
    # so the integrated route stays covered
    monkeypatch.setenv("COGSTREAM_LM_ATTN_DECODE", "1")
    jax.clear_caches()
    out = fn()
    monkeypatch.delenv("COGSTREAM_LM_ATTN")
    monkeypatch.delenv("COGSTREAM_LM_ATTN_DECODE")
    jax.clear_caches()
    return ref, out


def test_qwen2_forward_prefill_route(monkeypatch):
    from cogstream_tpu.models import qwen2

    cfg = _tiny_cfg()
    rng = np.random.default_rng(7)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    B, S, T = 1, 128, 2048
    emb = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)),
                      jnp.float32)
    pos = jnp.asarray(np.arange(S, dtype=np.int32))[None]

    def run():
        cache = qwen2.init_kv_cache(cfg, B, T)
        h, c = qwen2.qwen2_forward(params, emb, pos, cfg, cache=cache)
        return np.asarray(h), np.asarray(c.pos)

    (h0, p0), (h1, p1) = _run_routes(run, monkeypatch)
    np.testing.assert_allclose(h1, h0, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(p1, p0)


def test_generate_tokens_route_parity(monkeypatch):
    """Full prefill+decode program: identical greedy tokens and an
    identical final cache through the kernel route."""
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = _tiny_cfg()
    rng = np.random.default_rng(8)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(1), cfg)
    B, S, T = 1, 128, 2048
    emb = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.3,
                      jnp.float32)
    pos = np.full((B, S), -1, np.int32)
    pos[:, :100] = np.arange(100)
    pos = jnp.asarray(pos)
    last = jnp.asarray([99], jnp.int32)

    def run():
        cache = qwen2.init_kv_cache(cfg, B, T)
        r = generate_tokens(
            params, emb, pos, last, cache, jax.random.PRNGKey(2), cfg,
            max_new_tokens=8, eos_id=0, temperature=0.0)
        return (np.asarray(r.tokens), np.asarray(r.num_tokens),
                np.asarray(r.cache.k), np.asarray(r.cache.pos),
                int(r.cache.write_index))

    ref, out = _run_routes(run, monkeypatch)
    np.testing.assert_array_equal(out[0], ref[0])
    np.testing.assert_array_equal(out[1], ref[1])
    np.testing.assert_allclose(out[2], ref[2], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(out[3], ref[3])
    assert out[4] == ref[4]
