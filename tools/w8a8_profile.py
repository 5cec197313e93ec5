"""W8A8 prefill headroom profile (VERDICT r4 weak #6).

``int8_7b_prefill_w8a8_tok_s`` measured 10,494 tok/s ≈ 147 TOP/s
against the ~204 TOP/s in-program XLA int8 GEMM ceiling this chip
measured on encoder shapes (CLAUDE.md) — where do the other cycles go?
This probe decomposes the prefill into its parts, each timed as a
CHAINED in-program loop over the stacked 28-layer weights (axon's
~4-5 ms fixed dispatch overhead makes single-op timings meaningless —
CLAUDE.md):

  gemm_<site>       the four decoder GEMM shapes, W8A8 vs weight-only
  actquant          the dynamic per-row int8 activation quant alone
  attn              prefill attention at the probed S (XLA vs kernel)
  norms_rope        the residual/norm/rope glue at S

Run on an idle host. Usage: python tools/w8a8_profile.py [S=512]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.ops import quant
    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = presets.cogreasoner_7b().text
    H, I = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    rng = np.random.default_rng(0)

    def sync(x):
        leaf = jnp.reshape(jax.tree.leaves(x)[0], (-1,))[:1]
        float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(fn, *args, iters=3):
        sync(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    out = {"S": S}
    sites = {"qkvo": (H, H + 2 * cfg.num_key_value_heads * cfg.head_dim
                      + H),
             "gate_up": (H, 2 * I),
             "down": (I, H)}
    x0 = jnp.asarray(rng.normal(size=(S, H)) * 0.1, jnp.bfloat16)

    for name, (din, dout) in sites.items():
        # stacked [L, din, dout] int8 weights; one jitted scan chains
        # the L matmuls so the dispatch overhead amortizes
        w = {"q": jnp.asarray(
                 rng.integers(-127, 127, (L, din, dout)), jnp.int8),
             "scale": jnp.full((L, dout), 1e-2, jnp.float32)}
        xx = jnp.asarray(rng.normal(size=(S, din)) * 0.1, jnp.bfloat16)

        def run(w, xx, w8a8):
            def body(c, wl):
                y = quant.quantized_matmul(
                    xx * (1.0 + 0 * c), wl, jnp.bfloat16, w8a8=w8a8)
                # full-output dependency: a y[0,0]-only carry let XLA
                # DCE most matmul columns (gate_up "measured" 299
                # TFLOP/s, above the 197 bf16 peak)
                return c + jnp.float32(jnp.sum(y)), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jax.tree.map(lambda a: a, w))
            return c

        for w8a8 in (False, True):
            f = jax.jit(lambda w, xx, m=w8a8: run(w, xx, m))
            dt = timed(f, w, xx)
            tops = 2 * S * din * dout * L / dt / 1e12
            out[f"gemm_{name}_{'w8a8' if w8a8 else 'bf16act'}_tops"] = \
                round(tops, 1)
            out[f"gemm_{name}_{'w8a8' if w8a8 else 'bf16act'}_ms"] = \
                round(dt * 1e3, 2)
        del w

    # activation quant alone, chained L times per site-shaped input
    def aq(x):
        def body(c, _):
            q, s = quant.quantize_int8_act(x + c)
            return c + jnp.float32(q[0, 0]) * jnp.float32(s[0, 0]), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(L))
        return c

    dt = timed(jax.jit(aq), x0)
    out["actquant_ms_per_l_sites"] = round(dt * 1e3, 2)

    # attention at depth: S x S causal prefill chained over layers
    from cogstream_tpu.ops import lm_attention as lma
    from cogstream_tpu.ops.attention import causal_gqa_attention

    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, \
        cfg.head_dim
    q = jnp.asarray(rng.normal(size=(1, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, S, Hkv, D)), jnp.bfloat16)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    eff = lma.effective_kv_positions(pos)

    def attn_xla(q, k, v):
        def body(c, _):
            a = causal_gqa_attention(q + c, k, v, q_positions=pos,
                                     kv_valid=pos >= 0,
                                     kv_positions=pos)
            return c + a[0, 0, 0, 0].astype(jnp.bfloat16) * 0, a[0, 0, 0, 0]
        _, ys = jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(L))
        return ys

    def attn_krn(q, k, v):
        def body(c, _):
            a = lma.prefill_flash_attention(q + c, k, v, pos, eff)
            return c + a[0, 0, 0, 0] * 0, a[0, 0, 0, 0]
        _, ys = jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(L))
        return ys

    out["attn_xla_ms"] = round(timed(jax.jit(attn_xla), q, k, v) * 1e3, 2)
    if jax.default_backend() == "tpu":
        out["attn_kernel_ms"] = round(
            timed(jax.jit(attn_krn), q, k, v) * 1e3, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
