"""A/B probe: XLA LM attention vs the round-5 Pallas kernels
(ops/lm_attention) on the real chip.

Reuses the bench sections verbatim so both routes measure the exact
production programs; the route toggles through COGSTREAM_LM_ATTN
("off" = XLA, "auto" = kernels on single-chip TPU), which is a
trace-time decision — caches are cleared between routes.

Usage (repo root, idle host — CLAUDE.md bench discipline):
    python tools/lm_attn_probe.py longctx      # 16k prefill + decode
    python tools/lm_attn_probe.py quant4u      # int4u short decode
    python tools/lm_attn_probe.py quant4u 512  # + kernel at min_t 512
    python tools/lm_attn_probe.py quant8
    python tools/lm_attn_probe.py session      # full int8 session
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def run(section: str, env: str):
    import jax

    os.environ["COGSTREAM_LM_ATTN"] = env
    jax.clear_caches()
    ctx = bench.Ctx()
    fn = {
        "longctx": lambda: bench.bench_longctx_7b(ctx),
        "longctx32": lambda: bench.bench_longctx32_7b(ctx),
        "quant4u": lambda: bench.bench_7b_quantized(ctx, "int4u"),
        "quant4u_w4a8": lambda: bench.bench_7b_quantized(ctx, "int4u",
                                                        True),
        "quant8": lambda: bench.bench_7b_quantized(ctx, "int8"),
        "session": lambda: bench.bench_session_7b_quant(ctx, "int8"),
        "pool": lambda: bench.bench_pool_7b(ctx, "int8"),
    }[section]
    out = fn()
    ctx.free()
    print(json.dumps({"section": section, "route": env, **out}),
          flush=True)
    return out


def main():
    args = sys.argv[1:]
    section = args[0] if args else "longctx"
    routes = [a for a in args[1:] if a in ("off", "auto")] or \
        ["off", "auto"]
    for a in args[1:]:
        if a.isdigit():
            os.environ["COGSTREAM_LM_ATTN_MIN_T"] = a
    for env in routes:
        run(section, env)


if __name__ == "__main__":
    main()
