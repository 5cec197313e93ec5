"""Pallas flash/splash attention for the LM decoder (GQA, position-
tagged KV cache).

The reference requests flash-attn for the LM everywhere
(first_stage_training.py:444, second_stage_training.py:277,
answer_generate.py:177); until round 5 this repo ran the decoder on XLA
jnp attention (ops/attention.py) on the theory that decode is
weights-bound. Measurement said otherwise at depth:

* **Prefill at 16k ran at 37% of the short-prefill rate** (2,887 vs
  7,894 tok/s int8-7B, BENCH_r04). The chunked online-softmax path
  carries its f32 (m, l, acc) running stats through HBM on every
  ``lax.scan`` step — ~29 MB of carry read+written per KV chunk per
  layer at S=2048. The flash kernel here keeps them in VMEM scratch.
* **fp8-KV decode was SLOWER than bf16-KV** (73.3 vs 78.3 tok/s at 16k)
  because ``cache.astype(bfloat16)`` materializes a full bf16 copy of
  the cache every layer every step before attention reads it — tripling
  the cache traffic the format was meant to halve. The splash kernel
  DMAs the fp8 bytes and converts in VMEM.
* The decode path's ``jnp.concatenate([main, side])`` also materialized
  a combined buffer per layer per step; the kernel reads main cache,
  side buffer, and the fresh K/V as separate block streams.

Design notes (see /opt/skills/guides/pallas_guide.md):

* **Prefill** transposes K/V per layer to head-major ``[B, Hkv, T, D]``
  and folds the GQA group into the query rows (``[B, Hkv, S*G, D]``) —
  exact MACs, one dot per tile. Per-(b, q-block) KV block counts are
  computed IN-JIT from the position arrays and scalar-prefetched, so
  causal/empty tail blocks are skipped with a static grid (the index
  map clamps to the last valid block; Pallas skips the re-DMA when a
  block index repeats — same trick as ops/flash_attention.py).
  The per-layer transposes cost ~50 MB against ~2.4 ms/layer of
  attention FLOPs at 16k — ~2%.
* **Decode** follows the quant_gemv lesson: a pallas operand fed from a
  ``lax.scan`` per-layer slice gets copied first, so the main cache and
  the side buffer stay STACKED ``[L, B, T*Hkv, D]`` in HBM and a
  scalar-prefetched layer index drives the index maps — zero copies of
  either. GQA is handled by masking on a flat ``(token, kv-head)`` row
  layout: at decode the extra MACs are ~0.2 us against ~2.5 us of DMA
  per block, and the flat layout keeps every DMA contiguous.
* Both kernels express ALL validity (causality, empty slot, per-turn
  ``kv_allowed`` visibility, padding) as ONE int32 comparison:
  ``q_pos >= eff_kv_pos`` where invalid slots carry ``SENTINEL``
  (build with :func:`effective_kv_positions`). Real positions are
  non-negative and padded queries carry -1, so no second mask term is
  needed.

Numerics match ops/attention.causal_gqa_attention: bf16 dot operands
with f32 accumulation, f32 online softmax, fully-masked rows → 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
SENTINEL = jnp.int32(2 ** 30)   # eff position of an invisible KV slot

_HALF = (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def route_ok() -> bool:
    """Platform gate, mirroring ops.quant._gemv_route_ok: a pallas_call
    inside the decoder does not partition under GSPMD, so TP-mesh
    serving keeps the XLA attention path — single-chip TPU only.
    ``COGSTREAM_LM_ATTN``: ``off`` disables the kernels everywhere,
    ``interpret`` forces them (interpreter mode off-TPU) so CPU tests
    can exercise the integrated route."""
    import os

    mode = os.environ.get("COGSTREAM_LM_ATTN", "auto")
    if mode == "off":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _largest_div(n: int, cap: int, step: int = 128) -> Optional[int]:
    d = (min(cap, n) // step) * step
    while d >= step:
        if n % d == 0:
            return d
        d -= step
    return None


def _compute_dtype(q_dtype) -> jnp.dtype:
    """bf16 operands / f32 accumulation for half inputs (MXU full
    rate); full f32 for f32 inputs so CPU parity tests see identical
    numerics to ops/attention.gemm_dtype."""
    return (jnp.dtype(q_dtype) if jnp.dtype(q_dtype) in _HALF
            else jnp.dtype(jnp.float32))


def effective_kv_positions(pos: jax.Array,
                           allowed: Optional[jax.Array] = None) -> jax.Array:
    """[B, T] int32: stored position where the slot is visible,
    SENTINEL where it is empty (pos < 0) or masked by ``allowed``."""
    ok = pos >= 0
    if allowed is not None:
        ok = ok & allowed
    return jnp.where(ok, pos, SENTINEL).astype(jnp.int32)


# ---------------------------------------------------------------------------
# prefill flash kernel
# ---------------------------------------------------------------------------

def _prefill_kernel(cnt_ref, q_ref, k_ref, v_ref, qp_ref, kp_ref,
                    o_ref, m_ref, l_ref, acc_ref, *, scale: float,
                    nk: int, Hkv: int):
    # 3D grid over (batch*kv-head, q block, kv block) with 3D operands
    # and (1, rows, D) blocks — the exact shape pattern of the PROVEN
    # kernels (ops/flash_attention, ops/quant_gemv). The first cut used
    # a 4D grid with interior-singleton 4D blocks and reproducibly
    # corrupted the axon worker after ~8 interleaved program
    # executions (round-5 probe; XLA-only control clean).
    b = pl.program_id(0) // Hkv
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j < cnt_ref[b, i])
    def _step():
        q = q_ref[0]                                      # [BQR, D]
        k = k_ref[0].astype(q.dtype)                      # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQR, BK]
        mask = qp_ref[0, 0][:, None] >= kp_ref[0, 0][None, :]
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - jnp.where(m_new <= NEG_INF / 2, 0.0, m_new))
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(
            jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev - m_new))
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0].astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQR, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l > 0.0, l, 1.0)
                    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("Hkv", "block_q", "block_k", "scale", "interpret"))
def _prefill_call(qr, kT, vT, qpos, kpos, counts, *, Hkv: int,
                  block_q: int, block_k: int, scale: float,
                  interpret: bool):
    BH, Rp, D = qr.shape            # BH = B * Hkv (head-major fold)
    T = kT.shape[1]
    nR, nk = Rp // block_q, T // block_k

    def q_map(g, i, j, c):
        return (g, i, 0)

    def kv_map(g, i, j, c):
        b = g // Hkv
        return (g, jnp.minimum(j, jnp.maximum(c[b, i] - 1, 0)), 0)

    def qp_map(g, i, j, c):
        return (g // Hkv, 0, i)

    def kp_map(g, i, j, c):
        b = g // Hkv
        return (b, 0, jnp.minimum(j, jnp.maximum(c[b, i] - 1, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nR, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map),
            pl.BlockSpec((1, block_k, D), kv_map),
            pl.BlockSpec((1, block_k, D), kv_map),
            # position rows ride as [B, 1, T] so the block's last two
            # dims (1, X) EQUAL the array dims (Mosaic requires blocks
            # divisible by (8, 128) or equal to the array — a (1, X)
            # block over a [B>1, T] array fails to lower)
            pl.BlockSpec((1, 1, block_q), qp_map),
            pl.BlockSpec((1, 1, block_k), kp_map),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )
    kernel = functools.partial(_prefill_kernel, scale=scale, nk=nk,
                               Hkv=Hkv)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Rp, D), qr.dtype),
        interpret=interpret,
    )(counts, qr, kT, vT, qpos[:, None], kpos[:, None])


def prefill_viable(B: int, S: int, T: int, Hq: int, Hkv: int, D: int,
                   min_s: int = 128, min_t: int = 1024) -> bool:
    """Static dispatch decision for the prefill kernel. Small shapes
    stay on XLA dense (its fused path is fine there and each (S, T)
    bucket pair costs a kernel compile); D must be lane-sized."""
    return (D == 128 and Hq % Hkv == 0 and S >= min_s and T >= min_t
            and _largest_div(T, 1024) is not None)


def prefill_flash_attention(
    q: jax.Array,            # [B, S, Hq, D]
    k: jax.Array,            # [B, T, Hkv, D] (cache dtype; fp8 ok)
    v: jax.Array,            # [B, T, Hkv, D]
    q_positions: jax.Array,  # [B, S] int32, -1 = padding
    eff_kv_pos: jax.Array,   # [B, T] int32 (effective_kv_positions)
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Causal GQA flash attention over a position-tagged KV region.

    Drop-in for ops.attention.causal_gqa_attention with ``kv_valid``
    and ``kv_allowed`` pre-folded into ``eff_kv_pos``. Call it inside
    the decoder's layer scan on the per-layer (updated) cache slice —
    the operand copy that forces is ~2% of prefill attention time.
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_k is None:
        # big tiles amortize the per-grid-step overhead (the vision
        # kernel's lesson): 1024x2048 runs ~4x fewer steps than the
        # 512x1024 first cut at ~2.5 MB of double-buffered VMEM
        block_k = _largest_div(T, 2048)

    cd = _compute_dtype(q.dtype)
    # head-major K/V; GQA group folded into query rows (exact MACs);
    # (B, Hkv) folded into one leading axis — 3D operands with
    # (1, rows, D) blocks, the proven kernel shape pattern
    kT = k.transpose(0, 2, 1, 3).reshape(B * Hkv, T, D)
    vT = v.transpose(0, 2, 1, 3).reshape(B * Hkv, T, D)
    qr = q.astype(cd).reshape(B, S, Hkv, G, D).transpose(0, 2, 1, 3, 4) \
        .reshape(B * Hkv, S * G, D)
    R = S * G
    Rp = _round_up(R, block_q)
    qpos = jnp.repeat(q_positions, G, axis=1).astype(jnp.int32)  # [B, R]
    if Rp > R:
        qr = jnp.pad(qr, ((0, 0), (0, Rp - R), (0, 0)))
        qpos = jnp.pad(qpos, ((0, 0), (0, Rp - R)), constant_values=-1)

    # per-(b, q-block) valid KV block count, in-jit (positions are
    # traced): a KV block participates iff its smallest effective
    # position is <= the block's largest query position; the count is
    # the last participating block + 1 (interior all-masked blocks are
    # included — only the tail is skipped, which is where the causal
    # and empty-cache savings live).
    nk = T // block_k
    import os as _os

    if _os.environ.get("COGSTREAM_LM_ATTN_NOSKIP"):
        # A/B diagnostics: static full-sweep index maps (no dynamic
        # clamp, no repeated tail blocks)
        counts = jnp.full((B, Rp // block_q), nk, jnp.int32)
    else:
        blk_min = eff_kv_pos.reshape(B, nk, block_k).min(axis=2)
        qmax = qpos.reshape(B, Rp // block_q, block_q).max(axis=2)
        part = blk_min[:, None, :] <= qmax[:, :, None]   # [B, nR, nk]
        counts = jnp.max(
            jnp.where(part, jnp.arange(1, nk + 1, dtype=jnp.int32), 0),
            axis=2).astype(jnp.int32)                    # [B, nR]

    out = _prefill_call(
        qr, kT, vT, qpos, eff_kv_pos.astype(jnp.int32), counts,
        Hkv=Hkv, block_q=block_q, block_k=block_k, scale=float(scale),
        interpret=bool(interpret))
    out = out[:, :R].reshape(B, Hkv, S, G, D) \
        .transpose(0, 2, 1, 3, 4).reshape(B, S, Hq, D)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# decode splash kernel
# ---------------------------------------------------------------------------

def _decode_kernel(l_ref, rows_ref, qpos_ref,
                   q_ref,                      # [1, Rq, D]
                   mk_ref, mv_ref,             # [1, BKR, D] main
                   sk_ref, sv_ref,             # [1, THs, D] side
                   fk_ref, fv_ref,             # [1, THf, D] fresh
                   mp_ref,                     # [1, BKR] main eff pos
                   sp_ref,                     # [1, THs] side eff pos
                   fp_ref,                     # [1, 128]  fresh eff pos
                   o_ref,                      # [1, Rq, D]
                   m_ref, l2_ref, acc_ref,
                   *, scale: float, nk_main: int, S: int, G: int,
                   Gp: int, Hkv: int, THf: int):
    del l_ref, rows_ref                     # consumed by the index maps
    b = pl.program_id(0)
    j = pl.program_id(1)
    Rq = q_ref.shape[1]
    SG = S * Gp
    # row r = h*(S*Gp) + s*Gp + g: its kv head and position offset are
    # static iota arithmetic; the base position is a per-row-b scalar
    # (positions within one decode/verify dispatch are consecutive)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (Rq, 1), 0)
    row_head = r_iota // SG
    row_pos = qpos_ref[b] + (r_iota % SG) // Gp

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l2_ref[...] = jnp.zeros_like(l2_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def fold(kblk, vblk, kpos):
        q = q_ref[0]                                      # [Rq, D]
        k = kblk.astype(q.dtype)
        n = k.shape[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [Rq, n]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        k_head = jax.lax.rem(c_iota, Hkv)
        mask = (row_pos >= kpos[None, :]) & (row_head == k_head)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - jnp.where(m_new <= NEG_INF / 2, 0.0, m_new))
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(
            jnp.where(m_prev <= NEG_INF / 2, NEG_INF, m_prev - m_new))
        l_new = alpha * l2_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(k.dtype), vblk.astype(k.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l2_ref[...] = jnp.broadcast_to(l_new, l2_ref.shape)

    @pl.when(j < nk_main)
    def _main():
        fold(mk_ref[0], mv_ref[0], mp_ref[0, 0])

    @pl.when(j == nk_main)
    def _side():
        fold(sk_ref[0], sv_ref[0], sp_ref[0, 0])

    @pl.when(j == nk_main + 1)
    def _fresh():
        fold(fk_ref[0], fv_ref[0], fp_ref[0, 0][:THf])
        l = l2_ref[:, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l > 0.0, l, 1.0)
                    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("Bp", "block_kr", "scale", "interpret", "S", "G",
                     "Gp", "Hkv"))
def _decode_call(layer, rows, qpos0, qr, mk, mv, sk, sv, fk, fv,
                 mpos, spos, fpos, *, Bp: int, block_kr: int,
                 scale: float, interpret: bool, S: int, G: int,
                 Gp: int, Hkv: int):
    B, Rq, D = qr.shape
    # mk/sk arrive (layer, row)-folded: [L*Bp, THm, D] / [L*B, THs, D]
    THm, THs, THf = mk.shape[1], sk.shape[1], fk.shape[1]
    nk_main = THm // block_kr
    nj = nk_main + 2

    def q_map(b, j, lr, rr, qp):
        return (b, 0, 0)

    def mkv_map(b, j, lr, rr, qp):
        return (lr[0] * Bp + rr[b], jnp.minimum(j, nk_main - 1), 0)

    def skv_map(b, j, lr, rr, qp):
        return (lr[0] * B + b, 0, 0)

    def fkv_map(b, j, lr, rr, qp):
        return (b, 0, 0)

    def mp_map(b, j, lr, rr, qp):
        return (b, 0, jnp.minimum(j, nk_main - 1))

    def sp_map(b, j, lr, rr, qp):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec((1, Rq, D), q_map),
            pl.BlockSpec((1, block_kr, D), mkv_map),
            pl.BlockSpec((1, block_kr, D), mkv_map),
            pl.BlockSpec((1, THs, D), skv_map),
            pl.BlockSpec((1, THs, D), skv_map),
            pl.BlockSpec((1, THf, D), fkv_map),
            pl.BlockSpec((1, THf, D), fkv_map),
            # [B, 1, T]-shaped position rows (see _prefill_call note)
            pl.BlockSpec((1, 1, block_kr), mp_map),
            pl.BlockSpec((1, 1, THs), sp_map),
            pl.BlockSpec((1, 1, 128), sp_map),
        ],
        out_specs=pl.BlockSpec((1, Rq, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((Rq, 128), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
            pltpu.VMEM((Rq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, scale=scale, nk_main=nk_main, S=S, G=G, Gp=Gp,
        Hkv=Hkv, THf=THf)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Rq, D), qr.dtype),
        interpret=interpret,
    )(layer, rows, qpos0, qr, mk, mv, sk, sv, fk, fv,
      mpos[:, None], spos[:, None], fpos[:, None])


def decode_viable(B: int, S: int, T: int, Ts: int, Hq: int, Hkv: int,
                  D: int, min_t: Optional[int] = None) -> bool:
    """Static dispatch decision for the splash decode kernel. Below
    ``min_t`` cache slots the concatenate the kernel avoids is cheap
    and XLA wins on dispatch simplicity; side row count must be
    lane-aligned (generate pads the side buffer allocation).
    ``COGSTREAM_LM_ATTN_MIN_T`` overrides the depth threshold (A/B
    probing — tools/lm_attn_probe.py)."""
    import os

    # OPT-IN ONLY (COGSTREAM_LM_ATTN_DECODE=1) on this backend: the
    # splash kernel passes CPU-interpret parity and runs correct
    # single executions on the chip, but REPEATED executions of its
    # program interleaved with other large kernel programs reproducibly
    # panic the axon client ('client.rs:2008 index out of bounds: len
    # 31 index 31') / corrupt the worker — the round-5 stability matrix
    # (STATUS.md) isolated the trigger to this program class after
    # exonerating the XLA-only mix, the prefill kernel (stable after
    # the 3D-operand refactor), dynamic index maps, and sub-tile
    # blocks. Sessions re-execute the decode program every turn, so
    # default-on would corrupt production serving.
    if not os.environ.get("COGSTREAM_LM_ATTN_DECODE"):
        return False
    if min_t is None:
        min_t = int(os.environ.get("COGSTREAM_LM_ATTN_MIN_T", "2048"))
    return (D == 128 and Hq % Hkv == 0 and S <= 8 and T >= min_t
            and (Ts * Hkv) % 128 == 0 and (S * Hkv) <= 64
            and _largest_div(T * Hkv, 4096) is not None)


def decode_splash_attention(
    q: jax.Array,              # [B, S, Hq, D] fresh queries (roped)
    k_new: jax.Array,          # [B, S, Hkv, D] fresh keys (roped)
    v_new: jax.Array,          # [B, S, Hkv, D]
    main_k: jax.Array,         # [L, Bp, T, Hkv, D] STACKED main cache
    main_v: jax.Array,         # [L, Bp, T, Hkv, D] (bf16 / fp8 / f32)
    side_k: jax.Array,         # [L, B, Ts, Hkv, D] STACKED side buffer
    side_v: jax.Array,         # [L, B, Ts, Hkv, D]
    layer: jax.Array,          # [] int32 — current scan layer
    step_pos: jax.Array,       # [B, S] int32; row 0 col = base pos,
                               # consecutive within a row; -1 = done row
    eff_main_rep: jax.Array,   # [B, T*Hkv] int32 (pos repeated Hkv x,
                               # SENTINEL where invisible) — build ONCE
                               # per step outside the layer scan
    eff_side_rep: jax.Array,   # [B, Ts*Hkv] int32 (side slots BEFORE
                               # this step's write; unwritten -> SENT)
    rows: Optional[jax.Array] = None,   # [B] main-cache row per input
    scale: Optional[float] = None,
    block_kr: Optional[int] = None,     # main block rows (tokens*Hkv)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Splash-style cached decode attention: main cache ⊕ side buffer ⊕
    fresh tokens folded in one online softmax, no cache-sized copies.

    The main cache and side buffer are the FULL stacked [L, ...]
    buffers (never ``lax.scan`` slices — those would be copied, the
    quant_gemv lesson); ``layer`` selects the live layer inside the
    index maps. The fresh K/V (this step's tokens, already written to
    the side buffer by the caller for the NEXT step) enter as their own
    tiny block so the kernel needs no in-place view of the updated
    side. fp8 caches are converted tile-by-tile in VMEM — the whole
    point: HBM traffic equals the fp8 bytes.
    """
    B, S, Hq, D = q.shape
    T, Hkv = main_k.shape[2], main_k.shape[3]
    Ts = side_k.shape[2]
    G = Hq // Hkv
    Gp = _round_up(G, 8)
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_kr is None:
        block_kr = _largest_div(T * Hkv, 4096)
    if rows is None:
        rows = jnp.arange(main_k.shape[1], dtype=jnp.int32)[:B]

    cd = _compute_dtype(q.dtype)
    # query rows: [Hkv, S, Gp] flattened — row = h*(S*Gp) + s*Gp + g
    qr = q.astype(cd).reshape(B, S, Hkv, G, D).transpose(0, 2, 1, 3, 4)
    qr = jnp.pad(qr, ((0, 0), (0, 0), (0, 0), (0, Gp - G), (0, 0)))
    qr = qr.reshape(B, Hkv * S * Gp, D)
    qpos0 = jnp.where(step_pos[:, 0] >= 0, step_pos[:, 0],
                      -SENTINEL).astype(jnp.int32)

    # flat (token, kv-head) row views with (layer, row) folded into one
    # leading axis — adjacent-dim reshapes, no copy; 3D operands with
    # (1, rows, D) blocks are the proven-stable kernel shape pattern
    # (the 4D interior-singleton form corrupted the axon worker)
    L, Bp = main_k.shape[0], main_k.shape[1]
    mk = main_k.reshape(L * Bp, T * Hkv, D)
    mv = main_v.reshape(L * Bp, T * Hkv, D)
    sk = side_k.reshape(L * B, Ts * Hkv, D)
    sv = side_v.reshape(L * B, Ts * Hkv, D)
    # fresh rows pad to a FULL sublane tile for every dtype (32 covers
    # int8/fp8's (32, 128) min tile; an 8-row bf16 block is below the
    # (16, 128) tile and is a worker-corruption suspect on this
    # backend)
    THf = _round_up(S * Hkv, 32)
    fk = jnp.pad(k_new.reshape(B, S * Hkv, D),
                 ((0, 0), (0, THf - S * Hkv), (0, 0)))
    fv = jnp.pad(v_new.reshape(B, S * Hkv, D),
                 ((0, 0), (0, THf - S * Hkv), (0, 0)))
    # fresh eff positions, padded to one 128-lane row
    fpos = jnp.repeat(jnp.where(step_pos >= 0, step_pos, SENTINEL),
                      Hkv, axis=1).astype(jnp.int32)
    fpos = jnp.pad(fpos, ((0, 0), (0, 128 - S * Hkv)),
                   constant_values=SENTINEL)

    out = _decode_call(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(rows, jnp.int32), qpos0,
        qr, mk, mv, sk, sv, fk, fv,
        eff_main_rep.astype(jnp.int32), eff_side_rep.astype(jnp.int32),
        fpos,
        Bp=Bp, block_kr=int(block_kr), scale=float(scale),
        interpret=bool(interpret), S=S, G=G, Gp=Gp, Hkv=Hkv)
    out = out.reshape(B, Hkv, S, Gp, D)[:, :, :, :G] \
        .transpose(0, 2, 1, 3, 4).reshape(B, S, Hq, D)
    return out.astype(q.dtype)
