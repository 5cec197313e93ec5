"""Pallas varlen (segment) flash attention for the vision tower.

TPU-native replacement for flash-attn's ``flash_attn_varlen_func``
(reference: modeling_videollama3_encoder.py:38-41,309-312, cu_seqlens
built at :439-440). The reference concatenates every frame's patches
into one flat stream and restricts attention to within-frame windows
via cumulative sequence lengths; here the same contract is expressed
with **per-token segment ids** and the kernel exploits their
*contiguity*: frames are contiguous runs, so each query block overlaps
only a small, host-computable range of KV blocks. The grid's minor
dimension walks exactly that range — blocks outside a query block's
segment span are never DMA'd, giving the block-diagonal O(sum_i L_i^2)
cost of varlen flash attention instead of O(N^2).

Kernel shape notes (see /opt/skills/guides/pallas_guide.md):
* TWO entry layouts: the general head-major [N, H, D] wrapper
  (``segment_flash_attention``, pads/transposes activations), and the
  production token-major packed form
  (``flash_attention_packed_rope_fusedqkv``) whose [N, H*128] blocks
  are tile-aligned column slices of ONE fused QKV GEMM output — the
  encoder pads the GEMM *weights* per head to 128 lanes so no
  activation transpose, pad, or slice ever materializes, and the 2D
  RoPE rotation happens inside the kernel on tiles already in VMEM;
* online softmax with running (m, l, acc) scratch carried across the
  sequential minor grid dimension;
* segment ids ride along as [1, N] int32 rows so equality masks evaluate
  on the VPU in-block;
* scalar-prefetched per-q-block (kv_start_block, kv_num_blocks) feed the
  K/V index maps — the Pallas analogue of cu_seqlens.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def kv_block_ranges(
    segment_ids: np.ndarray, block_q: int, block_k: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host-side: for each query block, the [start, count) of KV blocks
    holding any segment present in the query block.

    Relies on segment ids being a non-decreasing run sequence (frames are
    serialized contiguously by build_vision_metadata); padding id -1 at
    the tail matches nothing and contributes no KV range.
    """
    seg = np.asarray(segment_ids)
    n = seg.shape[0]
    nq = -(-n // block_q)
    starts = np.full((nq,), 0, np.int32)
    counts = np.full((nq,), 0, np.int32)
    for i in range(nq):
        blk = seg[i * block_q:(i + 1) * block_q]
        real = blk[blk >= 0]
        if real.size == 0:
            starts[i] = 0
            counts[i] = 0
            continue
        lo_seg, hi_seg = int(real.min()), int(real.max())
        # tokens of these segments span [first_tok, last_tok]; padding
        # (-1) sorts as +inf so searchsorted sees a non-decreasing array
        real_all = np.where(seg >= 0, seg, np.iinfo(np.int32).max)
        first_tok = int(np.searchsorted(real_all, lo_seg, side="left"))
        last_tok = int(np.searchsorted(real_all, hi_seg, side="right")) - 1
        b0 = first_tok // block_k
        b1 = last_tok // block_k
        starts[i] = b0
        counts[i] = b1 - b0 + 1
    kmax = int(counts.max()) if nq else 1
    return starts, counts, max(kmax, 1)


def _flash_kernel(
    # scalar prefetch
    kv_start_ref,   # [nq] int32
    kv_count_ref,   # [nq] int32
    # inputs
    q_ref,          # [1, BQ, D]
    k_ref,          # [1, BK, D]
    v_ref,          # [1, BK, D]
    qseg_ref,       # [1, BQ]
    kseg_ref,       # [1, BK]
    # outputs
    out_ref,        # [1, BQ, D]
    # scratch
    m_ref,          # [BQ, 128] f32 (col-broadcast running max)
    l_ref,          # [BQ, 128] f32
    acc_ref,        # [BQ, D] f32
    *,
    scale: float,
    kmax: int,
    aligned: bool = False,
):
    iq = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j < kv_count_ref[iq])
    def _step():
        # dots run on bf16 operands with f32 accumulation — f32
        # operands would drop the MXU to 1/4 throughput; the scale
        # applies to the f32 accumulator, so no bf16 precision is lost
        q = q_ref[0]                                      # [BQ, D]
        k = k_ref[0]                                      # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]
        if aligned:
            # whole-frame blocks (FlashRanges.aligned): every block is
            # homogeneous — one frame or all-pad (and all-pad blocks
            # never reach here: kv_count is 0) — so the per-token
            # segment compare vanishes entirely
            mask = None
        else:
            qseg = qseg_ref[0]                            # [BQ]
            kseg = kseg_ref[0]                            # [BK]
            mask = (qseg[:, None] == kseg[None, :]) \
                & (qseg[:, None] >= 0)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]                             # [BQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)         # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be exp(0)
        p = jnp.exp(s - jnp.where(m_new <= NEG_INF / 2, 0.0, m_new))
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(
            jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev - m_new))
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0]                                      # [BK, D] bf16
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == kmax - 1)
    def _finalize():
        l = l_ref[:, :1]
        out = acc_ref[...] / jnp.where(l > 0.0, l, 1.0)
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "kmax", "scale", "interpret",
                     "aligned"),
)
def _flash_call(
    q, k, v,                   # [H, Np, Dp]
    qseg, kseg,                # [1, Np] int32
    kv_start, kv_count,        # [nq] int32
    block_q: int, block_k: int, kmax: int,
    scale: float, interpret: bool, aligned: bool = False,
):
    H, Np, Dp = q.shape
    nq = Np // block_q
    nk = Np // block_k

    def q_map(h, iq, j, ks, kc):
        return (h, iq, 0)

    def kv_map(h, iq, j, ks, kc):
        blk = jnp.minimum(ks[iq] + j, nk - 1)
        return (h, blk, 0)

    def qseg_map(h, iq, j, ks, kc):
        return (0, iq)

    def kseg_map(h, iq, j, ks, kc):
        blk = jnp.minimum(ks[iq] + j, nk - 1)
        return (0, blk)

    if aligned:
        # whole-frame blocks: the kernel never reads segment ids, and a
        # non-128-multiple block_q could not legally shape a (1, BQ)
        # block anyway (Mosaic wants the LAST block dim % 128 == 0) —
        # feed a fixed dummy tile instead
        qseg = kseg = jnp.zeros((1, 128), jnp.int32)
        qseg_spec = pl.BlockSpec((1, 128), lambda h, iq, j, ks, kc: (0, 0))
        kseg_spec = qseg_spec
    else:
        qseg_spec = pl.BlockSpec((1, block_q), qseg_map)
        kseg_spec = pl.BlockSpec((1, block_k), kseg_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H, nq, kmax),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), q_map),
            pl.BlockSpec((1, block_k, Dp), kv_map),
            pl.BlockSpec((1, block_k, Dp), kv_map),
            qseg_spec,
            kseg_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), q_map),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
    )
    kernel = functools.partial(_flash_kernel, scale=scale, kmax=kmax,
                               aligned=aligned)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, Np, Dp), q.dtype),
        interpret=interpret,
    )(kv_start, kv_count, q, k, v.astype(q.dtype), qseg, kseg)


class FlashRanges:
    """Host-precomputed per-q-block KV ranges (the cu_seqlens analogue).

    Build once per shape bucket with ``FlashRanges.build`` (host numpy);
    ``kv_start``/``kv_count`` become device arrays inside jit, ``kmax``
    stays a static Python int so the grid shape is fixed.
    """

    def __init__(self, kv_start, kv_count,
                 kmax: int, block_q: int, block_k: int, n_padded: int,
                 aligned: bool = False):
        # kv_start/kv_count may be host numpy or traced device arrays
        # (the metadata is host-built; inside jit it arrives as operands)
        self.kv_start = kv_start
        self.kv_count = kv_count
        self.kmax = int(kmax)
        self.block_q = int(block_q)
        self.block_k = int(block_k)
        # True when the block exactly tiles uniform same-length frames:
        # every block is homogeneous (one frame, or all-pad with
        # kv_count 0) and the kernels skip the per-token segment mask
        self.aligned = bool(aligned)
        self.n_padded = int(n_padded)

    @staticmethod
    def build(segment_ids: np.ndarray,
              block_q: Optional[int] = None,
              block_k: Optional[int] = None) -> "FlashRanges":
        """``block_q=None`` picks the block size that minimizes the
        kernel's total grid steps (nq × kmax) over {128..1024}.

        Block granularity is the dominant cost at scale: each grid step
        is one (BQ, BK) tile program, and per-step overhead dwarfs its
        compute at 128² tiles. For uniform 1024-token frames the search
        lands on 1024 — one whole frame per block, kmax=1 — measured
        3.1x faster than 128² blocks (9.4 vs 29.3 ms/layer at 32×1024
        tokens on v5e; also beats an XLA batched-dense reference at
        12.0 ms). VMEM stays comfortable: 3×(1024×128) bf16 blocks +
        1.5 MB f32 scratch ≈ 2.3 MB of ~16 MB."""
        seg = np.asarray(segment_ids, np.int32)
        n = seg.shape[0]
        if block_q is None:
            cands = [128, 256, 512, 1024]
            # UNIFORM-FRAME candidate: when every segment has the same
            # length L (one video's frames always do) and L is a
            # sublane multiple, an L-sized block tiles the frames
            # EXACTLY — kmax=1, zero cross-frame masked work. Matters
            # whenever L is not a power-of-two multiple of 128: the
            # real streaming resize yields e.g. 24x42 = 1008-patch
            # frames (640x360 source under the 64-frame token budget),
            # where the best power-of-two block (1024) straddles
            # frames at kmax=3 — measured 3x the encode time of the
            # aligned block on v5e. 2048 caps the VMEM footprint
            # (~5 MB tiles+scratch of ~16 MB).
            seg_valid = seg[seg >= 0]
            uniform_L = 0
            if seg_valid.size:
                counts = np.bincount(seg_valid - seg_valid.min())
                counts = counts[counts > 0]
                L = int(counts[0])
                if (counts == L).all() and L % 8 == 0 and L <= 2048:
                    uniform_L = L
                    if L not in cands:
                        cands.append(L)
            best = None
            # Per-step cost model: one grid step costs a fixed overhead
            # plus the tile's MACs. The overhead calibrates to ~512x1024
            # MAC-equivalents from two v5e measurements (128² tiles:
            # 29.3 ms/layer at 256 steps; 1024² tiles: 9.4 ms at 32 —
            # the model predicts 2.8x, measured 3.1x). Raw step count
            # alone mis-ranks mixed tile sizes (a few huge straddling
            # tiles beat many exact ones on steps while doing 3x the
            # masked MACs). Ties keep the SMALLER block, whose tiles
            # carry less padding DMA.
            OVERHEAD_MACS = 512 * 1024
            for b in cands:
                n_pad = _round_up(max(n, b), b)
                seg_pad = np.full((n_pad,), -1, np.int32)
                seg_pad[:n] = seg
                ks, kc, kmax = kv_block_ranges(seg_pad, b, b)
                steps = (n_pad // b) * kmax
                score = steps * (b * b + OVERHEAD_MACS)
                if best is None or score < best[0] or \
                        (score == best[0] and b < best[1]):
                    best = (score, b, ks, kc, kmax, n_pad)
            _, b, ks, kc, kmax, n_pad = best
            return FlashRanges(ks, kc, kmax, b, b, n_pad,
                               aligned=(b == uniform_L))
        block_k = block_k or block_q
        n_pad = _round_up(max(n, block_q), max(block_q, block_k))
        seg_pad = np.full((n_pad,), -1, np.int32)
        seg_pad[:n] = seg
        ks, kc, kmax = kv_block_ranges(seg_pad, block_q, block_k)
        return FlashRanges(ks, kc, kmax, block_q, block_k, n_pad)


def _flash_kernel_packed_rope(
    # scalar prefetch
    kv_start_ref,   # [nq] int32
    kv_count_ref,   # [nq] int32
    # inputs (token-major packed, UNROTATED q/k straight from the GEMM)
    q_ref,          # [BQ, Dp]
    k_ref,          # [BK, Dp]
    v_ref,          # [BK, Dp]
    qcos_ref,       # [BQ, Dp] f32 (per-token, shared across heads)
    qsin_ref,       # [BQ, Dp] f32
    kcos_ref,       # [BK, Dp] f32
    ksin_ref,       # [BK, Dp] f32
    perm_ref,       # [Dp, Dp] bf16 rotate-half permutation (±1 entries)
    qseg_ref,       # [1, BQ]
    kseg_ref,       # [1, BK]
    # outputs
    out_ref,        # [BQ, Dp]
    # scratch
    m_ref,          # [BQ, 128] f32
    l_ref,          # [BQ, 128] f32
    acc_ref,        # [BQ, Dp] f32
    qr_ref,         # [BQ, Dp] rotated-q stash (rotate once per q block)
    *,
    scale: float,
    kmax: int,
    aligned: bool = False,
):
    """Packed flash kernel with the 2D RoPE rotation FUSED in.

    The per-layer rope passes cost ~54 ms/forward across the 27-layer
    tower at 32x1024 tokens (two f32 HBM round trips over [N, H*128]
    per layer plus an f32 permutation einsum); here the GEMM outputs
    enter the kernel unrotated and the rotation happens on tiles
    already in VMEM. Numerics are unchanged: the rotate-half
    permutation has a single ±1 term per output, so the bf16 dot with
    f32 accumulation reproduces the f32 einsum exactly, and the
    (x·cos + rot·sin) combine runs in f32 exactly like the unfused
    path before the same bf16 cast.
    """
    iq = pl.program_id(0)
    j = pl.program_id(2)

    def rot(x_ref, cos_ref, sin_ref):
        x = x_ref[...]
        rh = jax.lax.dot_general(
            x, perm_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xf = x.astype(jnp.float32)
        return (xf * cos_ref[...] + rh * sin_ref[...]).astype(x.dtype)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        qr_ref[...] = rot(q_ref, qcos_ref, qsin_ref)

    @pl.when(j < kv_count_ref[iq])
    def _step():
        q = qr_ref[...]                                   # [BQ, Dp]
        k = rot(k_ref, kcos_ref, ksin_ref)                # [BK, Dp]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]
        if aligned:
            mask = None     # homogeneous whole-frame blocks (see
            # _flash_kernel): pad blocks are kv_count-gated out
        else:
            qseg = qseg_ref[0]
            kseg = kseg_ref[0]
            mask = (qseg[:, None] == kseg[None, :]) \
                & (qseg[:, None] >= 0)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - jnp.where(m_new <= NEG_INF / 2, 0.0, m_new))
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(
            jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev - m_new))
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[...]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, Dp]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == kmax - 1)
    def _finalize():
        l = l_ref[:, :1]
        out = acc_ref[...] / jnp.where(l > 0.0, l, 1.0)
        out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dp", "block_q", "block_k", "kmax", "scale",
                     "interpret", "aligned"),
)
def flash_attention_packed_rope_fusedqkv(
    qkv,                       # [Np, 3*H*Dp]: q | k | v column groups
    cos, sin,                  # [Np, Dp] f32 per-token rope terms
    perm,                      # [Dp, Dp] rotate-half permutation
    seg,                       # [1, Np] int32 (-1 = pad)
    kv_start, kv_count,        # [nq] int32
    heads: int, dp: int,
    block_q: int, block_k: int, kmax: int,
    scale: float, interpret: bool, aligned: bool = False,
):
    """flash_attention_packed with the 2D RoPE rotation fused into the
    kernel (_flash_kernel_packed_rope), reading q/k/v straight out of
    ONE fused QKV GEMM output: the same ``qkv`` buffer is passed three
    times and the q/k/v index maps address its column blocks at head
    offsets 0 / H / 2H — no slice (and therefore no [Np, H*Dp] copy
    per operand) ever materializes between the GEMM and the kernel.
    One [hidden, 3*H*Dp] GEMM also reads the activations once instead
    of three times and collapses 3 dispatches into 1 per layer.

    The grid runs q-block MAJOR / head MINOR so the per-token cos/sin
    blocks keep the same index across the consecutive head programs —
    Pallas skips the re-DMA when a block's index map output is
    unchanged, so cos/sin stream from HBM once per q block instead of
    once per (head, q-block)."""
    Np = qkv.shape[0]
    nq = Np // block_q
    nk = Np // block_k

    def q_map(iq, h, j, ks, kc):
        return (iq, h)

    def k_map(iq, h, j, ks, kc):
        blk = jnp.minimum(ks[iq] + j, nk - 1)
        return (blk, heads + h)

    def v_map(iq, h, j, ks, kc):
        blk = jnp.minimum(ks[iq] + j, nk - 1)
        return (blk, 2 * heads + h)

    def qcs_map(iq, h, j, ks, kc):
        return (iq, 0)

    def kcs_map(iq, h, j, ks, kc):
        blk = jnp.minimum(ks[iq] + j, nk - 1)
        return (blk, 0)

    def perm_map(iq, h, j, ks, kc):
        return (0, 0)

    def qseg_map(iq, h, j, ks, kc):
        return (0, iq)

    def kseg_map(iq, h, j, ks, kc):
        blk = jnp.minimum(ks[iq] + j, nk - 1)
        return (0, blk)

    if aligned:
        # kernel never reads seg in aligned mode (homogeneous blocks);
        # a non-128-multiple block_q could not legally shape a (1, BQ)
        # block (Mosaic: last block dim % 128) — dummy fixed tile
        seg = jnp.zeros((1, 128), jnp.int32)
        qseg_spec = pl.BlockSpec((1, 128), lambda iq, h, j, ks, kc: (0, 0))
        kseg_spec = qseg_spec
    else:
        qseg_spec = pl.BlockSpec((1, block_q), qseg_map)
        kseg_spec = pl.BlockSpec((1, block_k), kseg_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq, heads, kmax),
        in_specs=[
            pl.BlockSpec((block_q, dp), q_map),
            pl.BlockSpec((block_k, dp), k_map),
            pl.BlockSpec((block_k, dp), v_map),
            pl.BlockSpec((block_q, dp), qcs_map),
            pl.BlockSpec((block_q, dp), qcs_map),
            pl.BlockSpec((block_k, dp), kcs_map),
            pl.BlockSpec((block_k, dp), kcs_map),
            pl.BlockSpec((dp, dp), perm_map),
            qseg_spec,
            kseg_spec,
        ],
        out_specs=pl.BlockSpec((block_q, dp), q_map),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((block_q, dp), qkv.dtype),
        ],
    )
    kernel = functools.partial(_flash_kernel_packed_rope, scale=scale,
                               kmax=kmax, aligned=aligned)
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, heads * dp), qkv.dtype),
        interpret=interpret,
    )(kv_start, kv_count, qkv, qkv, qkv,
      cosf, sinf, cosf, sinf, perm.astype(qkv.dtype), seg, seg)


def segment_flash_attention(
    q: jax.Array,            # [N, H, D]
    k: jax.Array,            # [N, H, D]
    v: jax.Array,            # [N, H, D]
    segment_ids,             # [N] int32; -1 = pad
    ranges: Optional[FlashRanges] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Varlen flash attention over contiguous segments.

    Drop-in for ops.attention.segment_attention. When called inside jit,
    pass precomputed ``ranges`` (FlashRanges.build on the host metadata);
    eager callers may omit them and the ranges are derived from the
    concrete ``segment_ids``.
    """
    N, H, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ranges is None:
        seg_host = np.asarray(jax.device_get(segment_ids)).astype(np.int32)
        ranges = FlashRanges.build(seg_host, block_q, block_k)

    block_q, block_k = ranges.block_q, ranges.block_k
    Np = ranges.n_padded
    Dp = _round_up(D, 128)

    def pad_qkv(x):
        x = jnp.transpose(x, (1, 0, 2))              # [H, N, D]
        return jnp.pad(x, ((0, 0), (0, Np - N), (0, Dp - D)))

    qp, kp, vp = pad_qkv(q), pad_qkv(k), pad_qkv(v)
    seg_dev = jnp.pad(jnp.asarray(segment_ids, jnp.int32), (0, Np - N),
                      constant_values=-1)[None, :]

    out = _flash_call(
        qp, kp, vp, seg_dev, seg_dev,
        jnp.asarray(ranges.kv_start), jnp.asarray(ranges.kv_count),
        block_q, block_k, ranges.kmax, float(scale), bool(interpret),
        aligned=getattr(ranges, "aligned", False))
    return jnp.transpose(out[:, :N, :D], (1, 0, 2))
