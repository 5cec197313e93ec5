#!/usr/bin/env python
"""Decompose the deep-cache decode gap (VERDICT r3 weak #3 / next #3).

At 16k cache depth the int8-7B marginal decode step measures ~16.4 ms
(61 tok/s) against a ~10.4 ms roofline (7.6 GB weights + 0.94 GB KV
over ~819 GB/s). Hypothesis: the SOLO decode scan passes cache.k/v as
scan **xs** and emits the updated layers as scan **ys** — each step
then rewrites the full [B,T,Hkv,D] layer slice (16.8 MB x 2 x 28 =
941 MB of writes per step, plus possible read amplification if the
dynamic-update-slice can't fuse), costs that scale with T. The POOLED
branch already avoids this: the main cache is a read-only xs, fresh
K/V go to a small lockstep side buffer (ys of side size), merged once
per turn.

Probes (run serialized on the real chip, idle host):
  A. depth sweep of the SOLO marginal decode step: slope vs T gives
     effective bytes/slot/step (theory: 57.3 KB read-only).
  B. the same sweep through the POOLED (side-buffer) path at B=1.
  C. XLA cost_analysis bytes for one solo decode step at 16k.
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
    ctx = bench.Ctx()
    params = ctx.text7b("int8")
    NEW = 32
    out = {}

    depths = [int(x) for x in os.environ.get(
        "PROBE_DEPTHS", "2048,4096,8192,16384").split(",")]

    for LS in depths:
        emb = qwen2.embed(params, jnp.zeros((1, LS), jnp.int32))
        positions = jnp.asarray(np.arange(LS, dtype=np.int32)[None])
        last = jnp.asarray([LS - 1], jnp.int32)

        def run_solo(new):
            cache = init_kv_cache(cfg, 1, LS + NEW)
            return generate_tokens(params, emb, positions, last, cache,
                                   jax.random.PRNGKey(0), cfg, new,
                                   eos_id=-1, temperature=0.0)

        def run_pooled(new):
            # B=1 "pool": write_slots routes prefill through the
            # scatter path and the decode loop through the read-only
            # main cache + side buffer branch
            cache = init_kv_cache(cfg, 1, LS + NEW)
            ws = jnp.asarray(np.arange(LS, dtype=np.int32)[None])
            return generate_tokens(params, emb, positions, last, cache,
                                   jax.random.PRNGKey(0), cfg, new,
                                   eos_id=-1, temperature=0.0,
                                   write_slots=ws,
                                   active=jnp.ones((1,), bool))

        for name, run in (("solo", run_solo), ("pooled", run_pooled)):
            dt_s = bench._median_time(lambda: run(NEW // 4),
                                      iters=3, warmup=1)
            dt_l = bench._median_time(lambda: run(NEW),
                                      iters=3, warmup=1)
            step_ms = (dt_l - dt_s) / (NEW - NEW // 4) * 1e3
            out[f"{name}_step_ms_{LS}"] = round(step_ms, 3)
            print(f"{name} T={LS}: {step_ms:.2f} ms/step "
                  f"({1e3 / step_ms:.1f} tok/s)", flush=True)

    # slopes: bytes/slot/step implied by the depth sweep
    for name in ("solo", "pooled"):
        xs = [d for d in depths if f"{name}_step_ms_{d}" in out]
        if len(xs) >= 2:
            t0, t1 = xs[0], xs[-1]
            dms = out[f"{name}_step_ms_{t1}"] - out[f"{name}_step_ms_{t0}"]
            bps = dms * 1e-3 * 819e9 / (t1 - t0)
            out[f"{name}_bytes_per_slot"] = round(bps, 1)
            print(f"{name}: implied {bps / 1024:.1f} KB/slot/step "
                  f"(theory 57.3 read-only)", flush=True)

    # C: XLA's own cost analysis of one solo decode step at the deepest
    LS = depths[-1]
    cache = init_kv_cache(cfg, 1, LS + NEW)
    emb1 = qwen2.embed(params, jnp.zeros((1, 1), jnp.int32))
    pos1 = jnp.asarray([[LS]], jnp.int32)

    @jax.jit
    def step(params, cache, emb1, pos1):
        h, c2 = qwen2.qwen2_forward(params, emb1, pos1, cfg, cache=cache)
        return qwen2.lm_logits(params, h)[:, -1], c2

    try:
        comp = step.lower(params, cache, emb1, pos1).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        for k in ("bytes accessed", "bytes accessed0{}",
                  "bytes accessed output"):
            if k in ca:
                out[f"cost_{k.replace(' ', '_')}"] = float(ca[k])
        print({k: v for k, v in ca.items()
               if "bytes" in k and v > 1e6}, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e!r}", flush=True)

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
