"""Fused-unpack 4-bit GEMV — a Pallas kernel for the rank-1 serving
scheme (ops/quant.py ``quantize_int4_rank1``).

Decode at 7B is weights-bound: every step reads the full weight set
once, so step time ≈ weight bytes / HBM bandwidth. int8 weights hit
~80% of that roofline through XLA because the dequant (convert +
column scale) fuses into the GEMM prologue. The 4-bit scheme reads
HALF the bytes but XLA materializes the nibble unpack (shift ops
cannot fuse into an MXU operand), so its step time measured ~1.9x
int8 instead of 0.5x. This kernel does the unpack inside Pallas where
the packed block is already in VMEM, with the weight traffic equal to
the packed bytes. Measured (tools/int4_gemv_probe.py, v5e, 28-layer
7B MLP stack at M=1, random weights as jit args): int8-XLA 8.2 ms,
int4-XLA 15.0 ms, this kernel 14.5 ms cubic / 10.5 ms uniform /
7.5 ms w4a8 — the uniform scheme approaches int8 step time at half
the HBM bytes and capacity, and w4a8 (int8 MXU dots) beats int8-XLA
outright. The bf16-dot forms sit above the 2.9 GB / 819 GB/s ≈
3.5 ms HBM bound because the VPU unpack (widen→shift→convert, ~4
ops/weight; +4 for the cubic codebook, which puts cubic at XLA
parity — the quant.py dispatch therefore routes UNIFORM trees only)
plus the bf16 MXU weight-load passes are the binding resource, not
HBM:

- the grid pipeline streams ``q4`` blocks HBM→VMEM with automatic
  double buffering (no manual DMA), so unpack overlaps the next
  block's fetch;
- unpack is integer-only and minimal: widen int8→int32 (1 op/byte),
  ``u >> 4`` for the high nibble, ``(u << 28) >> 28`` for the
  sign-extended low nibble (3 shifts/byte = 1.5 ops/weight), one
  convert to f32 per weight;
- the cubic codebook ``v = s·(A + C·s²)`` (quant.py CUBIC_*) is three
  VPU ops per weight, read from SMEM so one kernel serves both the
  cubic and uniform (C = 0) schemes; ``uniform=True`` additionally
  offers a static variant that skips the codebook entirely (its 1/7
  folds into the column scale);
- rank-1 scales never touch the hot loop: ``rscale`` multiplies into
  the (tiny) activations outside, ``scale`` is a [1, block_n]
  epilogue multiply at the final K step.

Split-halves packing (quant.py ``_pack_split``) is what makes the
unpack this cheap: the low-nibble plane pairs with the first half of
``x`` rows and the high-nibble plane with the second half, so the
kernel issues two plain dots per block with no interleave shuffle.

SERVING ONLY: no custom VJP (the rank-1 scheme is the serving format;
training quantization stays group-wise NF4 on the materializing
path). The reference's analogue is bitsandbytes' fused NF4 CUDA
dequant (second_stage_training.py:266-271); this is its TPU form.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor(n: int, target: int, floor: int) -> Optional[int]:
    """Largest d ≤ target with d | n, d a multiple of ``floor`` (lane
    alignment: blocks must be multiples of 128 in each tiled dim)."""
    d = (min(target, n) // floor) * floor
    while d >= floor:
        if n % d == 0:
            return d
        d -= floor
    return None


def _gemv_kernel(code_ref, xl_ref, xh_ref, q_ref, scale_ref, out_ref,
                 acc_ref, *, uniform: bool):
    """bf16-dot variant: nibbles dequantize (optionally through the
    cubic codebook) to bf16 and feed the MXU's bf16 path. The dots must
    NOT be f32 — an f32 MXU pass costs ~8x bf16 and at decode's tiny M
    the pass count is set by K·N alone, so f32 would swamp the halved
    HBM reads."""
    k = pl.program_id(1)
    u = q_ref[:].astype(jnp.int32)
    # split-halves unpack: low nibble = original row p, high nibble =
    # row p + din/2; both sign-extended two's-complement in [-8, 7]
    hi = (u >> 4).astype(jnp.float32)
    lo = ((u << 28) >> 28).astype(jnp.float32)
    if not uniform:
        a = code_ref[0, 0]
        c = code_ref[0, 1]
        lo = lo * (a + c * (lo * lo))
        hi = hi * (a + c * (hi * hi))
    part = (jnp.dot(xl_ref[:], lo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + jnp.dot(xh_ref[:], hi.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32))

    @pl.when(k == 0)
    def _():
        acc_ref[:] = part

    @pl.when(k > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:]).astype(out_ref.dtype)


def _gemv_kernel_w4a8(sx_ref, xl_ref, xh_ref, q_ref, scale_ref,
                      out_ref, accl_ref, acch_ref):
    """int8-dot variant (uniform codebook only): nibbles narrow to
    int8 and the dots ride the MXU's int8 path — half the weight-load
    pass time of bf16, which is what binds a tiny-M GEMV when HBM
    isn't. Activations arrive pre-quantized per row (int8) with their
    scales in ``sx`` [M, 2] (column 0 = low half, 1 = high half)."""
    k = pl.program_id(1)
    u = q_ref[:].astype(jnp.int32)
    hi = (u >> 4).astype(jnp.int8)
    lo = ((u << 28) >> 28).astype(jnp.int8)
    pl_ = jax.lax.dot_general(
        xl_ref[:], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    ph_ = jax.lax.dot_general(
        xh_ref[:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == 0)
    def _():
        accl_ref[:] = pl_
        acch_ref[:] = ph_

    @pl.when(k > 0)
    def _():
        accl_ref[:] = accl_ref[:] + pl_
        acch_ref[:] = acch_ref[:] + ph_

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        y = (accl_ref[:].astype(jnp.float32) * sx_ref[:, 0:1]
             + acch_ref[:].astype(jnp.float32) * sx_ref[:, 1:2])
        out_ref[:] = (y * scale_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_n", "block_k", "uniform",
                     "interpret"))
def _gemv_call(xl, xh, packed, scale, code, *, out_dtype, block_n,
               block_k, uniform, interpret):
    mp = xl.shape[0]
    half, dout = packed.shape
    grid = (dout // block_n, half // block_k)
    return pl.pallas_call(
        functools.partial(_gemv_kernel, uniform=uniform),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda n, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mp, block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, block_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dout), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        interpret=interpret,
    )(code, xl, xh, packed, scale)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_n", "block_k", "interpret"))
def _gemv_call_w4a8(xlq, xhq, sx, packed, scale, *, out_dtype, block_n,
                    block_k, interpret):
    mp = xlq.shape[0]
    half, dout = packed.shape
    grid = (dout // block_n, half // block_k)
    return pl.pallas_call(
        _gemv_kernel_w4a8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, 2), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, block_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dout), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.int32),
                        pltpu.VMEM((mp, block_n), jnp.int32)],
        interpret=interpret,
    )(sx, xlq, xhq, packed, scale)


def gemv_viable(qp: Dict[str, jax.Array], m: int,
                m_max: int = 64) -> bool:
    """True when the Pallas path applies: a 2D rank-1 kernel, blockable
    shapes, and a decode-sized M (large-M prefill GEMMs are
    compute-bound — XLA's materializing path is already at parity
    there, and the f32 M-padded kernel would waste MXU)."""
    packed = qp.get("q4")
    if packed is None or "rscale" not in qp or packed.ndim != 2:
        return False
    if m > m_max:
        return False
    half, dout = packed.shape
    return (_largest_divisor(half, 256, 128) is not None
            and _largest_divisor(dout, 512, 128) is not None)


def int4_rank1_gemv(x: jax.Array, qp: Dict[str, jax.Array],
                    out_dtype=None, *, uniform: Optional[bool] = None,
                    w4a8: bool = False,
                    block_n: int = 512, block_k: int = 256,
                    interpret: Optional[bool] = None) -> jax.Array:
    """``x @ W`` with W in rank-1 packed-int4 form, unpacked inside the
    kernel (see module docstring).

    ``uniform`` statically skips the codebook arithmetic — inferred
    from the tree's static scheme tag (1-element ``code`` =
    ``quantize_int4_rank1(nf4=False)``) when None; forcing True on a
    cubic tree is a perf-probe-only move (drops the C·s³ term). The
    cubic path reads its coefficients from SMEM and is exact for both
    schemes. ``w4a8=True`` (implies uniform) additionally quantizes
    the activations per row to int8 so the dots ride the MXU int8
    path; activation rounding means it is serving-only, like quant.py's
    W8A8 prefill (measured 7.5 ms vs the uniform bf16-dot variant's
    10.5 on the 7B MLP stack — int8 dots halve the MXU weight-load
    pass time, and even beat int8-XLA's 8.2 ms at half its HBM)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = out_dtype or x.dtype
    packed, scale = qp["q4"], qp["scale"]
    if uniform is None:
        uniform = qp["code"].shape[-1] == 1
    half, dout = packed.shape
    din = 2 * half
    bk = _largest_divisor(half, block_k, 128)
    bn = _largest_divisor(dout, block_n, 128)
    if bk is None or bn is None:
        raise ValueError(f"unblockable int4 shape {(din, dout)}")
    *lead, _ = x.shape
    xf = x.reshape(-1, din).astype(jnp.float32)
    m = xf.shape[0]
    r = qp["rscale"].astype(jnp.float32)
    xl = xf[:, :half] * r[None, :half]
    xh = xf[:, half:] * r[None, half:]
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        pad = ((0, mp - m), (0, 0))
        xl = jnp.pad(xl, pad)
        xh = jnp.pad(xh, pad)
    sc = scale.astype(jnp.float32)
    if uniform or w4a8:
        # fold the uniform codebook slope (code[0], e.g. 1/7) into the
        # column scale; the kernel then dots the raw nibbles
        sc = sc * qp["code"][0]
    if w4a8:
        def q8(v):
            ax = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True),
                             1e-6)
            q = jnp.clip(jnp.round(v * (127.0 / ax)),
                         -127, 127).astype(jnp.int8)
            return q, ax * (1.0 / 127.0)
        xlq, sxl = q8(xl)
        xhq, sxh = q8(xh)
        sx = jnp.concatenate([sxl, sxh], axis=1)
        y = _gemv_call_w4a8(xlq, xhq, sx, packed, sc.reshape(1, dout),
                            out_dtype=jnp.dtype(dtype), block_n=bn,
                            block_k=bk, interpret=bool(interpret))
        return y[:m].reshape(*lead, dout)
    code = qp["code"].astype(jnp.float32).reshape(-1)
    if code.shape[0] == 1:                  # uniform tag: pad C = 0 so
        code = jnp.pad(code, (0, 1))        # the SMEM block stays (1, 2)
    y = _gemv_call(xl.astype(jnp.bfloat16), xh.astype(jnp.bfloat16),
                   packed, sc.reshape(1, dout), code.reshape(1, 2),
                   out_dtype=jnp.dtype(dtype), block_n=bn, block_k=bk,
                   uniform=uniform, interpret=bool(interpret))
    return y[:m].reshape(*lead, dout)
