"""Int8 / int4 / NF4 weight quantization — the TPU analogue of the
reference's NF4 base quantization (bitsandbytes,
second_stage_training.py:266-271, SURVEY.md §2.2 N5).

Three schemes. All are designed so the dequant fuses into the consumer
GEMM under jit — quantized layers read 2-4x less HBM (decode's actual
bottleneck) at negligible MXU cost:

- **int8**: symmetric per-output-channel, ``scale = max|w| / 127``.
  ``{"q": int8 [..., din, dout], "scale": f32 [..., dout]}``.
- **int4**: symmetric group-wise (``group_size`` rows of din share a
  scale, default 64 like bitsandbytes' blocksize). Two values packed
  per byte along din in a SPLIT-HALVES layout: the low nibble of
  packed row ``p`` holds original row ``p``, the high nibble holds row
  ``p + din/2``. ``{"q4": [..., din/2, dout], "scale":
  f32 [..., din/G, dout]}``.
- **nf4**: a 4-bit codebook with the reference's NF4 shape (the 16
  N(0,1) quantiles) and group-wise absmax. The codebook is the
  degree-7 polynomial fit through the canonical NF4 points (max
  deviation 0.0022 ≈ bf16 rounding), so dequantization is seven fused
  multiply-adds on the VPU instead of a 16-entry table gather — XLA
  cannot fuse a gather into a matmul operand, and a materialized
  dequant costs more HBM than it saves (measured 26x slower decode).
  Quantization snaps to the polynomial's own values, so pack→unpack is
  exact.

Why split halves instead of interleaved even/odd rows: the consumer
matmul becomes ``x_lo @ W_lo + x_hi @ W_hi`` where each half's unpack
is a pure elementwise shift — no stack/reshape in the graph between
the loaded bytes and the dot operand, which is the difference between
XLA fusing the dequant into the GEMM prologue and materializing a
full-precision copy of the weights.

Measured ceiling (v5e, marginal step rate — prefill not charged to
decode): int8 7B decodes at ~98-105 tok/s ≈ 745 GB/s of weight reads,
~90% of the HBM roofline; the 4-bit scheme reads half the bytes but
XLA materializes the unpacked-int8 nibbles as an intermediate, so its
step time landed at ~2x int8 rather than 0.5x. The Pallas fused-unpack
GEMV (quant_gemv.py) inverts that for the UNIFORM rank-1 scheme:
unpack happens in VMEM on bytes the grid pipeline already fetched,
and the decode scan feeds the kernel the STACKED weights plus a layer
index (scalar-prefetch index_map) so no per-layer slice copy ever
materializes. End-to-end 7B decode, same bench same day: int8-XLA
98 tok/s, int4-XLA ~53, int4 uniform kernel 142, its W4A8 variant
(per-row int8 activations, int8 MXU dots) 161 — uniform rank-1 int4
is 1.45-1.65x FASTER than int8 at HALF the weight HBM/capacity, the
speed AND capacity serving scheme. The cubic codebook's extra 4 VPU
ops/weight put its kernel at XLA parity — cubic stays the QUALITY
4-bit scheme (XLA path; the dispatch skips it).

The packed dtype tags the scheme (``uint8`` = NF4 codebook indices
0..15, ``int8`` = uniform two's-complement nibbles), so quantized
trees stay plain array pytrees that scan/jit/shard like the bf16
originals (parallel/sharding.py maps ``q4``/``scale`` to the same
PartitionSpec axes as the kernel they replace).

The 8-bit optimizer (AdamW8bit, ref :303) is unnecessary here:
optimizer state shards across the mesh with the params (ZeRO-3-like
placement falls out of GSPMD specs).

Quantized kernels ride the same pytrees (incl. the stacked [L] decoder
layout); ``models.qwen2.dense`` consumes every form via
``quantized_matmul``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# QLoRA's NF4 codebook: the 16 quantiles of N(0,1) scaled to [-1, 1]
# (public constants from the QLoRA paper / bitsandbytes).
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534,
    0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0)

# Degree-7 fit of NF4_CODE over nibble index u ∈ [0, 15], constrained
# to hit ±1 exactly at the endpoints so absmax round-trips exactly:
# p(u) = line(u) + u(u-15)·q(u) with q degree-5 least-squares
# (computed once at import; deterministic). POLY_NF4_CODE — the
# codebook actually stored/dequantized — deviates from canonical NF4
# by at most 2.2e-3, far below the codebook's own minimum level
# spacing (0.08), i.e. NF4 to within bf16 precision.
def _fit_nf4_poly():
    u = np.arange(16, dtype=np.float64)
    nf4 = np.asarray(NF4_CODE, np.float64)
    line = -1.0 + (2.0 / 15.0) * u
    w = u * (u - 15.0)
    basis = np.stack([w * u ** k for k in range(6)], axis=1)
    coef, *_ = np.linalg.lstsq(basis, nf4 - line, rcond=None)
    import numpy.polynomial.polynomial as npp
    full = npp.polyadd(np.array([-1.0, 2.0 / 15.0]),
                       npp.polymul(np.array([0.0, -15.0, 1.0]), coef))
    return full[::-1]                       # descending, for Horner


# Serving switch for the Pallas fused-unpack int4 GEMV (quant_gemv.py):
# on TPU, decode-sized UNIFORM rank-1 int4 matmuls route through the
# kernel (2D heads directly; the decoder scan via the layer-indexed
# form, models/qwen2._split_stacked_gemv). Measured end-to-end 7B
# decode: 53 tok/s XLA -> 142 kernel (161 W4A8) vs int8's 98. Cubic
# trees measured at XLA parity, so they stay on XLA. Set False to
# force pure XLA everywhere.
USE_GEMV_KERNEL = True

_NF4_POLY = _fit_nf4_poly()
POLY_NF4_CODE = tuple(
    np.polyval(_NF4_POLY, np.arange(16)).tolist())


def _nf4_poly_eval(u: jax.Array) -> jax.Array:
    """Horner evaluation of the polynomial codebook at u ∈ [0, 15]
    (f32). Seven FMAs — fuses into the consumer GEMM's operand."""
    acc = jnp.full(u.shape, np.float32(_NF4_POLY[0]))
    for c in _NF4_POLY[1:]:
        acc = acc * u + np.float32(c)
    return acc


def quantize_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8 over the last axis."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.squeeze(-2)}


def dequantize_int8(qp: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (qp["q"].astype(jnp.float32)
            * qp["scale"][..., None, :]).astype(dtype)


def _group(w: jax.Array, group_size: int):
    *lead, din, dout = w.shape
    if din % group_size or din % 2:
        raise ValueError(
            f"group_size={group_size} and 2 must divide din={din}")
    return w.reshape(*lead, din // group_size, group_size, dout)


def _pack_split(vals: jax.Array) -> jax.Array:
    """[..., din, dout] 4-bit values (low 4 bits significant) →
    [..., din/2, dout] bytes. Split-halves layout: row p of the packed
    array holds original row ``p`` in the low nibble and row
    ``p + din/2`` in the high nibble."""
    *lead, din, dout = vals.shape
    lo = vals[..., : din // 2, :].astype(jnp.uint8) & 0xF
    hi = vals[..., din // 2:, :].astype(jnp.uint8) & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8)


def _unpack_halves(packed: jax.Array):
    """packed bytes → (lo_half, hi_half) nibble arrays, each
    [..., din/2, dout]. ``int8`` input yields sign-extended
    two's-complement values in [-8, 7]; ``uint8`` yields codebook
    indices in [0, 15]. Pure elementwise shifts — fuses."""
    if packed.dtype == jnp.int8:
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(packed, jnp.int8(4)), jnp.int8(4))
        hi = jax.lax.shift_right_arithmetic(packed, jnp.int8(4))
    else:
        lo = packed & jnp.uint8(0xF)
        hi = packed >> jnp.uint8(4)
    return lo, hi


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    """Full [..., din, dout] nibble array (for materializing paths)."""
    lo, hi = _unpack_halves(packed)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_int4(w: jax.Array, group_size: int = 64,
                  nf4: bool = True) -> Dict[str, jax.Array]:
    """Group-wise 4-bit quantization over the last-but-one (din) axis.

    ``nf4=True`` snaps each absmax-normalized weight to the nearest
    entry of the polynomial NF4 codebook (see module docstring);
    ``nf4=False`` is symmetric uniform int4 (q ∈ [-7, 7]). Groups run
    contiguously along din. When din/2 also divides group_size the
    halves contain whole groups and ``int4_matmul`` takes its fused
    fast path (true for every real decoder shape); otherwise the
    consumer falls back to a materializing dequant."""
    wf = w.astype(jnp.float32)
    g = _group(wf, group_size)                      # [..., n, G, dout]
    absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    absmax = jnp.maximum(absmax, 1e-8)
    if nf4:
        code = jnp.asarray(POLY_NF4_CODE, jnp.float32)
        norm = g / absmax                           # [-1, 1]
        idx = jnp.argmin(
            jnp.abs(norm[..., None] - code), axis=-1).astype(jnp.uint8)
        # uint8 dtype tags the NF4 scheme (see dequantize_int4)
        return {"q4": _pack_split(idx.reshape(*wf.shape)),
                "scale": absmax.squeeze(-2)}
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8)
    # two's-complement nibbles; int8 dtype tags the uniform scheme
    return {"q4": _pack_split(q.reshape(*wf.shape)).astype(jnp.int8),
            "scale": scale.squeeze(-2)}


# The rank-1 serving scheme's nonuniform codebook is CUBIC:
# value(s) = s·(A + C·s²) for signed nibble s ∈ [-7, 7], with
# value(±7) = ±1. Three multiplies — measured to fuse into the GEMM at
# int8-parity step time, where the degree-7 NF4 Horner chain (1.6x) and
# any table gather (3x) do not. A = 0.065 minimizes Gaussian
# quantization RMSE over the one-parameter family: 0.0284 vs canonical
# NF4's 0.0269 and uniform's 0.0412 (normalized RMSE, N(0,1) weights).
CUBIC_A = 0.065
CUBIC_C = (1.0 - 7.0 * CUBIC_A) / 343.0
CUBIC_CODE = tuple(
    float(s * (CUBIC_A + CUBIC_C * s * s)) for s in range(-7, 8))


def quantize_int4_rank1(w: jax.Array, nf4: bool = True,
                        iters: int = 8) -> Dict[str, jax.Array]:
    """4-bit with rank-1 (row ⊗ column) scales — the SERVING scheme.

    ``w[p, o] ≈ code(nib[p, o]) · rscale[p] · scale[o]``, fit by
    alternating absmax normalization. Both scale applications are 1D
    broadcasts and the codebook is evaluated arithmetically from the
    stored ``code = [A, C]`` coefficients (value = s·(A + C·s²)), so
    the whole dequant chain stays in the 2D elementwise form XLA fuses
    into the GEMM — measured at int8-parity decode step time with half
    the weight HBM, versus 3x for any group-reshaped or gather-based
    dequant, which materialize. ``nf4=True`` uses the cubic NF4-grade
    codebook (Gaussian RMSE 0.0284 vs canonical NF4's 0.0269);
    ``nf4=False`` is uniform (code = [1/7]; the 1-element shape is the
    static scheme tag the kernel dispatch keys on). Quality of rank-1
    scales sits between int8 and group-64: they absorb per-row/column
    variance exactly; only isolated single-entry outliers favor
    group-64 (RMSE 0.10 vs 0.11 on structured Gaussians, 0.19 vs 0.11
    with 0.2% entry outliers). Training-parity quantization stays
    `quantize_int4`."""
    wf = w.astype(jnp.float32)
    *lead, din, dout = wf.shape
    if din % 2:
        raise ValueError(f"din={din} must be even")
    aw = jnp.abs(wf)
    r = jnp.max(aw, axis=-1, keepdims=True)
    r = jnp.maximum(r, 1e-8)
    c = None
    for _ in range(iters):
        c = jnp.maximum(jnp.max(aw / r, axis=-2, keepdims=True), 1e-8)
        r = jnp.maximum(jnp.max(aw / c, axis=-1, keepdims=True), 1e-8)
    norm = wf / (r * c)                             # ⊆ [-1, 1]
    if nf4:
        code = jnp.asarray(CUBIC_CODE, jnp.float32)
        idx = jnp.argmin(jnp.abs(norm[..., None] - code), axis=-1)
        q = (idx - 7).astype(jnp.int8)              # back to signed s
        coefs = (CUBIC_A, CUBIC_C)
    else:
        q = jnp.clip(jnp.round(norm * 7.0), -7, 7).astype(jnp.int8)
        # 1-element code STATICALLY tags the uniform scheme (shape
        # survives jit tracing where values do not) — the matmul
        # dispatch routes these to the fast kernel variant
        coefs = (1.0 / 7.0,)
    packed = _pack_split(q).astype(jnp.int8)
    code_arr = jnp.broadcast_to(
        jnp.asarray(coefs, jnp.float32), tuple(lead) + (len(coefs),))
    return {"q4": packed, "scale": c.squeeze(-2),
            "rscale": r.squeeze(-1), "code": code_arr}


def _decode_half(nib: jax.Array, scale_half: jax.Array,
                 dtype) -> jax.Array:
    """One unpacked half [..., din/2, dout] + its group scales
    [..., n/2, dout] → dequantized weights, shaped 3D-grouped
    [..., n/2, G, dout] so the scale broadcast needs no reshape of the
    nibble data (reshape of the packed load is a layout no-op; the
    multiply fuses into the consumer dot)."""
    *lead, half, dout = nib.shape
    n2 = scale_half.shape[-2]
    gsz = half // n2
    if nib.dtype == jnp.uint8:                      # NF4 indices
        vals = _nf4_poly_eval(nib.astype(jnp.float32))
    else:                                           # uniform signed
        vals = nib.astype(jnp.float32)
    vals = vals.reshape(*lead, n2, gsz, dout)
    return (vals * scale_half[..., :, None, :]).astype(dtype)


def _gemv_route_ok() -> bool:
    """Platform gate for the Pallas fused-unpack GEMV (quant_gemv.py).

    Single-chip TPU only: a pallas_call inside the decoder does not
    partition under GSPMD, so TP-mesh serving keeps the XLA dequant
    path (int4 is the one-chip capacity scheme). Split out so tests can
    monkeypatch the route on (the kernel self-selects interpret mode
    off-TPU)."""
    return (USE_GEMV_KERNEL and jax.default_backend() == "tpu"
            and jax.device_count() == 1)


def int4_matmul(x: jax.Array, qp: Dict[str, jax.Array],
                out_dtype=None, act_int8: bool = False) -> jax.Array:
    """``x @ W`` with W in packed int4/NF4 form, never materializing
    the dequantized weights: each half dequantizes elementwise (shift →
    poly/identity → group-scale broadcast) straight into a
    multi-contracting-dim dot_general, so XLA fuses the whole chain
    into the GEMM prologue and the weight HBM traffic is the packed
    bytes (half of int8, a quarter of bf16). The fast path covers 2D
    kernels — the decoder scan's per-layer slices and standalone heads;
    stacked [L, din, dout] kernels fall back to a materializing dequant
    (training prefill is compute-bound, so that path doesn't care).

    ``act_int8`` (serving-only, uniform rank-1 trees on the kernel
    route): per-row int8 activations feed the MXU's int8 path — the
    W4A8 decode mode, measured FASTER than int8 weights (7.5 vs 8.2 ms
    on the 7B MLP stack) at half their HBM/capacity. Ignored wherever
    the kernel doesn't route (the XLA forms stay weight-only)."""
    packed, scale = qp["q4"], qp["scale"]
    dtype = out_dtype or x.dtype
    if "rscale" in qp:                              # rank-1 serving scheme
        if packed.ndim == 3 and "layer" in qp:
            # the decode-scan form (models/qwen2._split_stacked_gemv):
            # stacked [L, ...] weights + a traced layer index — the
            # indexed kernel reads blocks straight from the stacked
            # buffer, skipping the per-layer slice copy a scanned
            # pallas operand otherwise pays
            layer = qp["layer"]
            m = x.size // x.shape[-1]
            if _gemv_route_ok() and qp["code"].shape[-1] == 1:
                from .quant_gemv import (gemv_viable_stacked,
                                         int4_rank1_gemv_stacked)
                if gemv_viable_stacked(qp, m):
                    return int4_rank1_gemv_stacked(x, qp, layer, dtype,
                                                   w4a8=act_int8)
            sl = {k: jnp.take(v, layer, axis=0)
                  for k, v in qp.items() if k != "layer"}
            return x @ dequantize_int4(sl, dtype)
        if packed.ndim != 2:
            return x @ dequantize_int4(qp, dtype)
        m = x.size // x.shape[-1]
        if _gemv_route_ok() and qp["code"].shape[-1] == 1:
            # UNIFORM trees only: the cubic codebook's extra VPU ops
            # put the kernel at parity with XLA (14.5 vs 15.0 ms on the
            # 7B MLP stack), so routing cubic trees buys nothing; the
            # uniform kernel measures 10.5 ms vs 15.0 (quant_gemv.py)
            from .quant_gemv import gemv_viable, int4_rank1_gemv
            if gemv_viable(qp, m):
                # decode-sized M: the Pallas fused-unpack kernel reads
                # only the packed bytes from HBM (see quant_gemv.py)
                return int4_rank1_gemv(x, qp, dtype, w4a8=act_int8)
        half, dout = packed.shape
        din = 2 * half
        r = qp["rscale"]
        uniform = qp["code"].shape[-1] == 1         # static scheme tag
        a = qp["code"][0]
        cc = None if uniform else qp["code"][1]
        lo, hi = _unpack_halves(packed)
        *bx, _ = x.shape
        x2 = x.reshape(-1, din).astype(jnp.float32)
        if act_int8 and uniform:
            # W4A8 PREFILL: the unpacked nibbles already ARE int8
            # values in [-7, 7], so quantizing the (rscale-folded)
            # activations per row puts the big GEMMs on the MXU
            # int8 double-rate path — same activation rounding as the
            # decode GEMV's w4a8 variant, serving-only. The uniform
            # slope folds into the output scale. Cubic trees skip this
            # (their codebook bends the nibble values off-integer).
            def half_mm(xs, nib):
                xq, sx = quantize_int8_act(xs)
                yi = jax.lax.dot_general(
                    xq, nib, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return yi.astype(jnp.float32) * sx
            yl = half_mm(x2[:, :half] * r[None, :half], lo)
            yh = half_mm(x2[:, half:] * r[None, half:], hi)
            y = (yl + yh) * (scale[None, :] * a)
            return y.astype(dtype).reshape(*bx, dout)

        def cubic(nib):
            s = nib.astype(jnp.float32)
            return s * a if uniform else s * (a + cc * (s * s))

        wl = (cubic(lo) * scale[None, :]).astype(dtype)
        wh = (cubic(hi) * scale[None, :]).astype(dtype)
        xl = (x2[:, :half] * r[None, :half]).astype(dtype)
        xh = (x2[:, half:] * r[None, half:]).astype(dtype)
        return (xl @ wl + xh @ wh).reshape(*bx, dout)
    half = packed.shape[-2]
    n = scale.shape[-2]
    gsz = 2 * half // n
    if packed.ndim != 2 or n % 2 or half % gsz:
        # stacked [L] kernels / halves not group-aligned (only tiny
        # test dims): materialize — training prefill is compute-bound
        return x @ dequantize_int4(qp, dtype)
    dout = packed.shape[-1]
    lo, hi = _unpack_halves(packed)
    wl = _decode_half(lo, scale[: n // 2], dtype)   # (n/2, G, dout)
    wh = _decode_half(hi, scale[n // 2:], dtype)
    n2 = n // 2
    *bx, din = x.shape
    x2 = x.reshape(-1, din)
    x3l = x2[:, : din // 2].reshape(-1, n2, gsz)
    x3h = x2[:, din // 2:].reshape(-1, n2, gsz)
    dn = (((1, 2), (0, 1)), ((), ()))               # contract (n, G)
    y = (jax.lax.dot_general(x3l, wl, dn)
         + jax.lax.dot_general(x3h, wh, dn))
    return y.reshape(*bx, dout)


def dequantize_int4(qp: Dict[str, jax.Array],
                    dtype=jnp.bfloat16) -> jax.Array:
    """Materializing unpack + rescale (tests, fallbacks, interchange).
    The packed dtype selects the scheme: uint8 = NF4 codebook indices,
    int8 = uniform two's-complement nibbles. Alignment-free: groups
    need not align with the packed halves."""
    packed, scale = qp["q4"], qp["scale"]
    *lead, half, dout = packed.shape
    din = 2 * half
    nib = _unpack_nibbles(packed)                   # [..., din, dout]
    if "rscale" in qp:                              # rank-1 scheme
        s = nib.astype(jnp.float32)
        a = qp["code"][..., 0:1, None]
        if qp["code"].shape[-1] == 1:               # uniform (static tag)
            vals = s * a
        else:
            cc = qp["code"][..., 1:2, None]
            vals = s * (a + cc * (s * s))
        w = (vals * qp["rscale"][..., :, None]
             * scale[..., None, :])
        return w.astype(dtype)
    if nib.dtype == jnp.uint8:                      # NF4 indices
        vals = _nf4_poly_eval(nib.astype(jnp.float32))
    else:                                           # uniform signed
        vals = nib.astype(jnp.float32)
    n = scale.shape[-2]
    g = vals.reshape(*lead, n, din // n, dout)
    w = g * scale[..., :, None, :]
    return w.reshape(*lead, din, dout).astype(dtype)


def quantize_int8_act(x: jax.Array):
    """Dynamic per-row symmetric int8 activation quantization (W8A8
    serving). Returns ``(q, scale)`` with ``x ≈ q * scale``; scale is
    [..., 1] f32. The whole chain is elementwise and fuses; the payoff
    is the consumer GEMM running on the MXU's int8 path (v5e: 394 TOPS
    vs 197 bf16 TFLOPS — compute-bound GEMMs halve)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    ax = jnp.maximum(ax, 1e-6)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / ax)),
                 -127, 127).astype(jnp.int8)
    return q, ax * (1.0 / 127.0)


def int8_act_matmul(xq: jax.Array, sx: jax.Array,
                    q: jax.Array, scale: jax.Array,
                    out_dtype=jnp.bfloat16) -> jax.Array:
    """``(xq·sx) @ (q·scale)`` with both operands int8: the dot runs
    int8xint8→int32 on the MXU double-rate path; the rescale is a
    rank-1 epilogue that fuses. ``sx`` [rows, 1] f32 from
    quantize_int8_act; ``scale`` [dout] f32 per output channel."""
    y = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * scale[None, :]).astype(out_dtype)


@jax.custom_vjp
def _w8a8_matmul_ste(x: jax.Array, q: jax.Array,
                     scale: jax.Array) -> jax.Array:
    """W8A8 matmul with a STRAIGHT-THROUGH activation-quant gradient.

    Primal: the int8xint8 MXU path (quantize_int8_act + int8_act_matmul
    — bit-identical to the serving W8A8 prefill). Backward: the
    activation round/clip is treated as identity (STE), so
    ``dL/dx = g @ W_deq^T`` exactly as the weight-only path computes it.
    This makes W8A8 forward GEMMs usable under LoRA training (stage-2
    ``--w8a8-forward``): base weights are frozen (no dL/dW needed) and
    activation gradients flow to the adapters below instead of being
    zeroed by the round. ``x`` must be 2D [rows, din]."""
    xq, sx = quantize_int8_act(x)
    return int8_act_matmul(xq, sx, q, scale, x.dtype)


def _w8a8_ste_fwd(x, q, scale):
    # residuals must be JAX types: a 0-sized array carries x's dtype
    return (_w8a8_matmul_ste(x, q, scale),
            (jnp.zeros((0,), x.dtype), q, scale))


def _w8a8_ste_bwd(res, g):
    import numpy as _np

    x_proto, q, scale = res
    w = (q.astype(jnp.float32) * scale[..., None, :]).astype(g.dtype)
    dx = (g @ w.T).astype(x_proto.dtype)
    # frozen int8 weights carry float0 cotangents (integer primals)
    dq = _np.zeros(q.shape, jax.dtypes.float0)
    return dx, dq, jnp.zeros_like(scale)


_w8a8_matmul_ste.defvjp(_w8a8_ste_fwd, _w8a8_ste_bwd)


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and ("q" in p or "q4" in p) and "scale" in p


def dequantize(qp: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    """Dispatch on the stored scheme."""
    if "q4" in qp:
        return dequantize_int4(qp, dtype)
    return dequantize_int8(qp, dtype)


def materialize_kernel(kern: Any, dtype) -> jax.Array:
    """A weight leaf as a dense ``dtype`` array, whether it is stored
    plain or quantized. The single dispatch point every consumer GEMM
    uses (projector, vision tower, multimodal LoRA path); under jit the
    dequant fuses into the consuming matmul's prologue."""
    if isinstance(kern, dict):
        return dequantize(kern, dtype)
    return kern.astype(dtype)


def slice_output_channels(p, ids: jax.Array):
    """Restrict a weight — plain array or any quantized dict — to a
    subset of its OUTPUT channels (the last/dout axis).

    Used by constrained decoding: when the sampler's support is a
    small static id set (the retrieval selector allows ~20 tokens),
    slicing the lm_head to those columns turns the per-step logits
    from a full-vocab read (545 MB at int8-7B, ~8% of each decode
    step's HBM traffic) into a [hidden, K] GEMV. din-indexed leaves
    (int4 packing, rank-1 ``rscale``, codebook ``code``) are
    untouched — only dout-indexed leaves slice.
    """
    if not isinstance(p, dict):
        return jnp.take(p, ids, axis=-1)
    out = dict(p)
    for k in ("q", "q4", "scale"):      # all dout on the last axis
        if k in out:
            out[k] = jnp.take(out[k], ids, axis=-1)
    return out


def quantized_matmul(x: jax.Array, qp: Dict[str, jax.Array],
                     out_dtype=None, w8a8: bool = False) -> jax.Array:
    """``x @ W`` for any quantized kernel; the int8 dequant
    (convert × column scale) and the int4 split-halves chain both fuse
    into the dot under jit.

    ``w8a8=True`` additionally quantizes the ACTIVATIONS per row
    (dynamic symmetric int8) so an int8 kernel's GEMM runs
    int8xint8→int32 on the MXU double-rate path (v5e: ~204 TOP/s vs
    ~133 TFLOP/s bf16, both measured in-program) — the serving prefill
    mode. On int4 kernels the flag reaches the Pallas GEMV route only
    (uniform rank-1, decode-sized M → the W4A8 kernel variant; the XLA
    forms stay weight-only). Under differentiation the int8 branch
    applies a STRAIGHT-THROUGH estimator (``_w8a8_matmul_ste``): the
    primal is the serving int8 path bit-for-bit, the activation
    gradient is the weight-only path's — so stage-2 LoRA training can
    run W8A8 forward GEMMs (``--w8a8-forward``; the frozen base needs
    no weight gradient).
    """
    dtype = out_dtype or x.dtype
    if "q4" in qp:
        return int4_matmul(x, qp, dtype, act_int8=w8a8)
    if w8a8:
        lead = x.shape[:-1]
        y = _w8a8_matmul_ste(
            x.reshape(-1, x.shape[-1]).astype(dtype),
            qp["q"], qp["scale"])
        return y.reshape(*lead, y.shape[-1])
    w = (qp["q"].astype(jnp.float32)
         * qp["scale"][..., None, :]).astype(dtype)
    return x @ w


def quantize_tree(params: Any, predicate=None, bits: int = 8,
                  group_size: int = 64, nf4: bool = True,
                  rank1: bool = False) -> Any:
    """Replace every dense ``kernel`` leaf with its quantized form
    (``bits`` = 8 or 4; 4 with ``nf4=True`` is the reference's QLoRA
    base scheme, 4 with ``rank1=True`` is the fused serving scheme —
    see quantize_int4_rank1).

    ``predicate(path_key)`` may veto individual kernels (e.g. keep
    norms / embeddings full precision — they are tiny anyway).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def quant(w):
        if bits == 8:
            return quantize_int8(w)
        try:
            if rank1:
                return quantize_int4_rank1(w, nf4=nf4)
            return quantize_int4(w, group_size=group_size, nf4=nf4)
        except ValueError:
            # din not divisible by the group / odd (e.g. the vision
            # conv patch-embed's 3*14*14=588): int8 for that kernel
            return quantize_int8(w)

    def walk(node, name=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "kernel" and (predicate is None or predicate(name)):
                    out[k] = quant(v)
                else:
                    out[k] = walk(v, k)
            return out
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node
    return walk(params)


def quantized_bytes(params: Any) -> int:
    """Device bytes of a (possibly partially) quantized tree."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
