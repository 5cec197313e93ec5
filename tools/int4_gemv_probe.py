"""Real-chip probe: fused-unpack int4 GEMV kernel vs the XLA paths.

Measures the 28-layer 7B MLP stack (gate/up/down, the decode step's
weight bulk) at decode M, for each weight path:

- int8-xla:       quantized_matmul on int8 weights (today's speed mode)
- int4-xla:       int4_matmul on rank-1 4-bit (XLA materializes unpack)
- int4-pallas:    ops/quant_gemv cubic codebook, bf16 dots
- int4-pallas-u:  uniform codebook folded into scales, bf16 dots
- int4-pallas-w4a8: uniform + per-row int8 activations, int8 MXU dots

Timing discipline (CLAUDE.md): the layer stack runs inside ONE jit
program repeated R times by lax.fori_loop; we difference R=1 vs R=3 so
neither dispatch overhead (~4-5 ms on axon) nor the first pass's cold
effects pollute the marginal per-pass time; sync by fetching a scalar.

Run standalone with the host otherwise idle (serialize with other
real-chip work): python tools/int4_gemv_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cogstream_tpu.ops.quant import CUBIC_A, CUBIC_C, quantized_matmul
from cogstream_tpu.ops import quant_gemv

L, H, I = 28, 3584, 18944
M = int(sys.argv[1]) if len(sys.argv) > 1 else 1


RNG = np.random.default_rng(0)


def synth_int8(din, dout):
    # random data passed as jit ARGUMENTS (never captured constants):
    # constant weights let XLA fold dot(x, const) algebraically and the
    # probe then reports impossible >HBM-roofline rates
    return {"q": jnp.asarray(RNG.integers(-127, 128, (L, din, dout),
                                          dtype=np.int8)),
            "scale": jnp.full((L, dout), 1e-3, jnp.float32)}


def synth_int4(din, dout):
    return {"q4": jnp.asarray(RNG.integers(0, 256, (L, din // 2, dout),
                                           dtype=np.uint8).view(np.int8)),
            "scale": jnp.full((L, dout), 1e-2, jnp.float32),
            "rscale": jnp.full((L, din), 1.0, jnp.float32),
            "code": jnp.broadcast_to(
                jnp.asarray([CUBIC_A, CUBIC_C], jnp.float32), (L, 2))}


def mlp_weights(synth):
    return {"gate": synth(H, I), "up": synth(H, I), "down": synth(I, H)}


def make_run(mm):
    def layer(x, p):
        g = mm(x, p["gate"])
        u = mm(x, p["up"])
        y = mm(jax.nn.silu(g) * u, p["down"])
        return jnp.tanh(y), None

    def passes(r, x, params):
        def body(_, x):
            y, _ = jax.lax.scan(layer, x, params)
            return y
        return jax.lax.fori_loop(0, r, body, x)

    return jax.jit(passes, static_argnums=0)


def bench(name, params, mm):
    x = jnp.ones((M, H), jnp.bfloat16)
    run = make_run(mm)
    ts = {}
    for r in (1, 3):
        float(jnp.sum(run(r, x, params)))         # compile + warm
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(r, x, params)))     # forced sync fetch
            best.append(time.perf_counter() - t0)
        ts[r] = float(np.median(best))
    per_pass = (ts[3] - ts[1]) / 2.0
    gb = sum(v.size * v.dtype.itemsize
             for v in jax.tree.leaves(params)) / 1e9
    print(f"{name:18s} per-pass {per_pass*1e3:7.2f} ms   "
          f"weights {gb:5.2f} GB   eff {gb/per_pass:6.0f} GB/s",
          flush=True)
    return per_pass


def main():
    print(f"platform={jax.default_backend()} M={M}", flush=True)
    from cogstream_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    p8 = mlp_weights(synth_int8)
    bench("int8-xla", p8, lambda x, qp: quantized_matmul(x, qp, x.dtype))
    del p8

    p4 = mlp_weights(synth_int4)
    from cogstream_tpu.ops import quant
    from cogstream_tpu.ops.quant import int4_matmul
    # int4_matmul now auto-routes decode-M to the kernel on TPU; pin
    # the flag off so this row measures the materializing XLA path
    quant.USE_GEMV_KERNEL = False
    bench("int4-xla", p4, lambda x, qp: int4_matmul(x, qp, x.dtype))
    quant.USE_GEMV_KERNEL = True
    bench("int4-dispatch", p4,
          lambda x, qp: int4_matmul(x, qp, x.dtype))
    bench("int4-pallas", p4,
          lambda x, qp: quant_gemv.int4_rank1_gemv(x, qp, x.dtype))
    bench("int4-pallas-u", p4,
          lambda x, qp: quant_gemv.int4_rank1_gemv(x, qp, x.dtype,
                                                   uniform=True))
    bench("int4-pallas-w4a8", p4,
          lambda x, qp: quant_gemv.int4_rank1_gemv(x, qp, x.dtype,
                                                   w4a8=True))


if __name__ == "__main__":
    main()
