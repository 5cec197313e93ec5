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
the packed bytes.

Two lessons bought with measurements (v5e, marginal in-program timing,
random weights as jit args — constant weights let XLA fold the dots):

1. **Block sizes.** The first cut used 128 KB blocks (256x512) and ran
   grid-step-overhead-bound: lm_head 262 GB/s. Whole-half bk + bn to a
   ~3 MB VMEM budget streams the same head at 844 GB/s (_pick_blocks).
2. **Never feed a pallas operand from a scan slice.** A pallas operand
   must be a materialized buffer, so ``lax.scan``'s per-layer weight
   slice forces XLA to COPY each layer's packed bytes before the call:
   the 28-layer 7B MLP stack measured 327 GB/s sliced vs 566 GB/s
   through the layer-INDEXED kernels (_gemv_kernel_idx: weights stay
   stacked in HBM; a scalar-prefetched layer index drives the
   index_map). models/qwen2 pulls routed kernels out of the scanned
   xs and carries the index instead (_split_stacked_gemv).

End-to-end 7B decode (bench_7b_quantized, same day, one v5e):
int8-XLA 98 tok/s, int4-XLA ~53, this kernel 142 uniform / 161 W4A8
(per-row int8 activations, int8 MXU dots — halves the MXU weight-load
passes) — 4-bit is 1.45-1.65x FASTER than int8 at half its HBM and
capacity. The remaining gap to the ~3.5 ms pure-HBM bound is VPU
unpack (widen→shift→convert, ~4 ops/weight; +4 for the cubic
codebook, which puts cubic at XLA parity — the quant.py dispatch
therefore routes UNIFORM trees only) plus the MXU weight-load passes:

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


# Per-block VMEM budget for the packed-q4 block (double-buffered by the
# grid pipeline). Measured on v5e (block-size sweep, 7B shapes): the
# default 128 KB blocks leave the kernel grid-step-overhead-bound
# (lm_head 262 GB/s); whole-half bk with bn up to this budget streams
# at 844 GB/s (1792x1536 = 2.75 MB); 4.2 MB blocks exceed Mosaic's
# 16 MB scoped-vmem stack and fail to compile.
_BLOCK_BUDGET = 3 * 2 ** 20
_BK_CAP = 4736


def _pick_blocks(half: int, dout: int):
    """Auto block sizes: bk = the whole packed-row half when it divides
    into lanes (one K step — the grid then streams pure N blocks), bn
    as wide as the VMEM budget allows. Returns None when the shape
    cannot block (not 128-multiple divisible)."""
    bk = _largest_divisor(half, _BK_CAP, 128)
    if bk is None:
        return None
    bn_target = max(512, (_BLOCK_BUDGET // bk) // 128 * 128)
    bn = _largest_divisor(dout, bn_target, 128)
    if bn is None:
        return None
    return bk, bn


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


def _gemv_kernel_idx(l_ref, xl_ref, xh_ref, q_ref, scale_ref, out_ref,
                     acc_ref):
    """Layer-INDEXED uniform variant: the weights stay stacked
    [L, half, dout] in HBM and the grid's index_map selects layer
    ``l_ref[0]`` block-by-block (scalar prefetch). This exists because
    a pallas operand must be a materialized buffer: feeding the kernel
    from ``lax.scan``'s per-layer slice makes XLA copy each layer's
    packed bytes to a fresh buffer first — measured 327 GB/s effective
    on the 7B MLP stack vs 566 GB/s indexed (the head, unstacked, hits
    844 GB/s). The uniform code slope and rscale fold into the
    activations outside, so the kernel is pure nibble-unpack + dots +
    column-scale epilogue."""
    del l_ref                                   # consumed by index_maps
    k = pl.program_id(1)
    u = q_ref[0].astype(jnp.int32)
    hi = (u >> 4).astype(jnp.float32)
    lo = ((u << 28) >> 28).astype(jnp.float32)
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
        out_ref[:] = (acc_ref[:] * scale_ref[0]).astype(out_ref.dtype)


def _gemv_kernel_idx_w4a8(l_ref, sx_ref, xl_ref, xh_ref, q_ref,
                          scale_ref, out_ref, accl_ref, acch_ref):
    """Indexed + int8 activations (see _gemv_kernel_w4a8)."""
    del l_ref
    k = pl.program_id(1)
    u = q_ref[0].astype(jnp.int32)
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
        out_ref[:] = (y * scale_ref[0]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_n", "block_k", "interpret"))
def _gemv_call_idx(layer, xl, xh, packed, scale, *, out_dtype, block_n,
                   block_k, interpret):
    mp = xl.shape[0]
    L, half, dout = packed.shape
    grid = (dout // block_n, half // block_k)
    return pl.pallas_call(
        _gemv_kernel_idx,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((mp, block_k), lambda n, k, lr: (0, k)),
                pl.BlockSpec((mp, block_k), lambda n, k, lr: (0, k)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda n, k, lr: (lr[0], k, n)),
                pl.BlockSpec((1, 1, block_n),
                             lambda n, k, lr: (lr[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((mp, block_n),
                                   lambda n, k, lr: (0, n)),
            scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, dout), out_dtype),
        interpret=interpret,
    )(layer, xl, xh, packed, scale.reshape(L, 1, dout))


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_n", "block_k", "interpret"))
def _gemv_call_idx_w4a8(layer, xlq, xhq, sx, packed, scale, *,
                        out_dtype, block_n, block_k, interpret):
    mp = xlq.shape[0]
    L, half, dout = packed.shape
    grid = (dout // block_n, half // block_k)
    return pl.pallas_call(
        _gemv_kernel_idx_w4a8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((mp, 2), lambda n, k, lr: (0, 0)),
                pl.BlockSpec((mp, block_k), lambda n, k, lr: (0, k)),
                pl.BlockSpec((mp, block_k), lambda n, k, lr: (0, k)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda n, k, lr: (lr[0], k, n)),
                pl.BlockSpec((1, 1, block_n),
                             lambda n, k, lr: (lr[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((mp, block_n),
                                   lambda n, k, lr: (0, n)),
            scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.int32),
                            pltpu.VMEM((mp, block_n), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, dout), out_dtype),
        interpret=interpret,
    )(layer, sx, xlq, xhq, packed, scale.reshape(L, 1, dout))


def gemv_viable_stacked(qp: Dict[str, jax.Array], m: int,
                        m_max: int = 64) -> bool:
    """Indexed-route gate: stacked [L, half, dout] rank-1 UNIFORM
    trees at decode-sized M with blockable shapes."""
    packed = qp.get("q4")
    if packed is None or "rscale" not in qp or packed.ndim != 3:
        return False
    if qp["code"].shape[-1] != 1 or m > m_max:
        return False
    return _pick_blocks(packed.shape[1], packed.shape[2]) is not None


def int4_rank1_gemv_stacked(x: jax.Array, qp: Dict[str, jax.Array],
                            layer: jax.Array, out_dtype=None, *,
                            w4a8: bool = False,
                            interpret: Optional[bool] = None) -> jax.Array:
    """``x @ W[layer]`` with W stacked [L, din, dout] in rank-1 UNIFORM
    packed-int4 form — the decode-scan form: the scan carries the layer
    INDEX and the kernel reads blocks straight out of the stacked HBM
    buffer, so no per-layer slice copy ever materializes (see
    _gemv_kernel_idx). ``layer`` is a traced int32 scalar."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = out_dtype or x.dtype
    packed, scale = qp["q4"], qp["scale"]
    L, half, dout = packed.shape
    din = 2 * half
    blocks = _pick_blocks(half, dout)
    if blocks is None:
        raise ValueError(f"unblockable int4 shape {(din, dout)}")
    bk, bn = blocks
    *lead, _ = x.shape
    xf = x.reshape(-1, din).astype(jnp.float32)
    m = xf.shape[0]
    # rscale and the uniform code slope fold into the (tiny) activations
    r = qp["rscale"][layer].astype(jnp.float32) * qp["code"][layer, 0]
    xf = xf * r[None, :]
    xl, xh = xf[:, :half], xf[:, half:]
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        pad = ((0, mp - m), (0, 0))
        xl = jnp.pad(xl, pad)
        xh = jnp.pad(xh, pad)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
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
        y = _gemv_call_idx_w4a8(lidx, xlq, xhq, sx, packed,
                                scale.astype(jnp.float32),
                                out_dtype=jnp.dtype(dtype), block_n=bn,
                                block_k=bk, interpret=bool(interpret))
        return y[:m].reshape(*lead, dout)
    y = _gemv_call_idx(lidx, xl.astype(jnp.bfloat16),
                       xh.astype(jnp.bfloat16), packed,
                       scale.astype(jnp.float32),
                       out_dtype=jnp.dtype(dtype), block_n=bn,
                       block_k=bk, interpret=bool(interpret))
    return y[:m].reshape(*lead, dout)


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
    return _pick_blocks(*packed.shape) is not None


def int4_rank1_gemv(x: jax.Array, qp: Dict[str, jax.Array],
                    out_dtype=None, *, uniform: Optional[bool] = None,
                    w4a8: bool = False,
                    block_n: Optional[int] = None,
                    block_k: Optional[int] = None,
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
    if block_k is None and block_n is None:
        blocks = _pick_blocks(half, dout)   # measured policy (v5e sweep)
        bk, bn = blocks if blocks else (None, None)
    else:
        bk = _largest_divisor(half, block_k or 256, 128)
        bn = _largest_divisor(dout, block_n or 512, 128)
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
