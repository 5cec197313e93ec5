#!/usr/bin/env python
"""Bisect the int4u decode regression (VERDICT r4 weak #1).

r3 measured int4u_7b_decode_tok_s = 174.26; r4 (after the side-buffer
solo decode loop, commit bc804bf) measured 145.93/148.61.  At these
rates the step-time delta is ~1.1 ms/step — too large for the
concatenate of a 544-slot cache (≈62 MB/step ≈ 75 us).  This probe
runs BOTH loop styles in one process at the exact bench shape
(S=512, NEW=32, marginal differencing) so the delta is attributable:

  A. "old" r3-style loop: lax.scan carrying the FULL cache; each step
     is qwen2_forward with cache only (the bottom body in qwen2.py —
     per-layer dynamic_update_slice writes, xs->ys cache).
  B. "new" production loop: generate_tokens (read-only main cache +
     lockstep side buffer + one merge).

Optionally sweeps depths (PROBE_DEPTHS) to see whether the delta is
depth-independent (fixed per-step overhead) or scales with T.
Run serialized on the real chip with an idle host.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bench
    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens
    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = presets.cogreasoner_7b().text
    scheme = os.environ.get("PROBE_SCHEME", "int4u")
    # ONE variant per process: mixing both loops' executables in one
    # process put the backend in a degraded state (old-loop spread
    # 62%, new-loop marginals consistently <=0 — same pathology family
    # as the resident-executable panic in bench_longctx_7b's comment)
    variant = os.environ.get("PROBE_VARIANT", "new")
    ctx = bench.Ctx()
    params = ctx.text7b(scheme)
    # 56-step marginal window (~0.4 s of signal at int4u rates): the
    # bench's 24-step window is fine inside bench's long-lived process
    # but a cold probe process sees more tunnel jitter
    NEW, SHORT = 64, 8
    out = {}

    depths = [int(x) for x in os.environ.get(
        "PROBE_DEPTHS", "512").split(",")]

    for S in depths:
        emb = qwen2.embed(params, jnp.zeros((1, S), jnp.int32))
        positions = jnp.asarray(np.arange(S, dtype=np.int32)[None])
        last = jnp.asarray([S - 1], jnp.int32)

        def run_new(new):
            cache = init_kv_cache(cfg, 1, S + NEW)
            return generate_tokens(params, emb, positions, last, cache,
                                   jax.random.PRNGKey(0), cfg, new,
                                   eos_id=-1, temperature=0.0)

        def make_old(new):
            @jax.jit
            def run(params, emb, positions, last):
                cache = init_kv_cache(cfg, 1, S + NEW)
                hidden, cache = qwen2.qwen2_forward(
                    params, emb, positions, cfg, cache=cache)
                last_h = jnp.take_along_axis(
                    hidden, last[:, None, None], axis=1)
                tok = jnp.argmax(qwen2.lm_logits(params, last_h)[:, 0],
                                 -1)
                pos0 = jnp.take_along_axis(
                    positions, last[:, None], axis=1)[:, 0] + 1

                def step(carry, _):
                    tok, pos, cache = carry
                    emb1 = qwen2.embed(params, tok[:, None])
                    h, cache = qwen2.qwen2_forward(
                        params, emb1, pos[:, None], cfg, cache=cache)
                    ntok = jnp.argmax(
                        qwen2.lm_logits(params, h)[:, 0], -1)
                    return (ntok, pos + 1, cache), tok

                (tok, _, _), toks = jax.lax.scan(
                    step, (tok, pos0, cache), None, length=new - 1)
                return toks.sum() + tok.sum()
            return run

        if variant == "old":
            old_s = make_old(SHORT)
            old_l = make_old(NEW)
            rs = lambda: old_s(params, emb, positions, last)
            rl = lambda: old_l(params, emb, positions, last)
        else:
            rs = lambda: run_new(SHORT)
            rl = lambda: run_new(NEW)
        bench._sync(rs()); bench._sync(rl())

        def marginal():
            dt_s = bench._median_time(rs, iters=3, warmup=0)
            dt_l = bench._median_time(rl, iters=3, warmup=0)
            return (NEW - SHORT) / max(dt_l - dt_s, 1e-9)

        samples = sorted(marginal() for _ in range(5))
        out[f"{variant}_{S}_tok_s"] = round(samples[2], 2)
        out[f"{variant}_{S}_spread"] = round(
            (samples[4] - samples[0]) / max(samples[2], 1e-9), 3)
        print(json.dumps(out), flush=True)

    print("FINAL " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
