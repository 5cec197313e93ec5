"""SigLIP-style vision encoder, TPU-first.

Capability parity with the reference tower
(`/root/reference/model/modeling_videollama3_encoder.py`): 27 pre-LN
transformer layers (hidden 1152, 16 heads, gelu-tanh MLP 4304), conv
patch embedding over 14x14 patches, 2D rotary positions over variable
grids, frame-local (varlen) attention, and a final merge-window spatial
downsample.

TPU-native design deltas:

* The token stream is **flat** ``[N, hidden]`` with static N per shape
  bucket; varlen attention uses per-token **segment ids** instead of
  flash-attn's ``cu_seqlens`` (ref :439-440) — the form a Pallas kernel
  masks blockwise (ops/flash_attention.py) and the jnp reference path
  (ops/attention.py) shares.
* Patch embedding is a single ``[C*14*14, hidden]`` matmul on the
  already-patchified rows — the conv never materializes; rows arrive in
  merge-block order straight from the image processor, feeding the MXU
  one large GEMM.
* The merge_size x merge_size bilinear downsample (ref :487-501) is an
  exact mean over each merge window for integer factors (the reference
  notes the equivalence at :503-506); since tokens are already serialized
  merge-block-contiguously, it's one segment-mean — no NHWC interpolate.
* All shape-dependent metadata (positions, segment ids, merge groups) is
  computed host-side in numpy; the jitted core sees only flat arrays.

Weight layout note: linear kernels are stored ``[in, out]`` so loading
torch checkpoints transposes once at load time (models/checkpoint.py).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionEncoderConfig
from ..ops.attention import segment_attention
from ..ops.rope import (apply_vision_rope_cs, grid_position_ids,
                        rope_half_permutation, vision_rope_angles,
                        vision_rope_cos_sin)

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _linear(key, din, dout, dtype):
    wkey, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(din)
    return {
        "kernel": jax.random.uniform(wkey, (din, dout), jnp.float32,
                                     -scale, scale).astype(dtype),
        "bias": jnp.zeros((dout,), dtype),
    }


def init_vision_params(key: jax.Array, cfg: VisionEncoderConfig) -> Params:
    dtype = cfg.jnp_dtype
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    patch_dim = cfg.num_channels * cfg.patch_size ** 2
    params: Params = {
        "patch_embed": _linear(keys[0], patch_dim, cfg.hidden_size, dtype),
        "post_ln": {"scale": jnp.ones((cfg.hidden_size,), jnp.float32),
                    "bias": jnp.zeros((cfg.hidden_size,), jnp.float32)},
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        k1, k2, k3, k4, k5, k6 = jax.random.split(keys[i + 1], 6)
        layers.append({
            "ln1": {"scale": jnp.ones((cfg.hidden_size,), jnp.float32),
                    "bias": jnp.zeros((cfg.hidden_size,), jnp.float32)},
            "ln2": {"scale": jnp.ones((cfg.hidden_size,), jnp.float32),
                    "bias": jnp.zeros((cfg.hidden_size,), jnp.float32)},
            "attn": {
                "q": _linear(k1, cfg.hidden_size, cfg.hidden_size, dtype),
                "k": _linear(k2, cfg.hidden_size, cfg.hidden_size, dtype),
                "v": _linear(k3, cfg.hidden_size, cfg.hidden_size, dtype),
                "o": _linear(k4, cfg.hidden_size, cfg.hidden_size, dtype),
            },
            "mlp": {
                "fc1": _linear(k5, cfg.hidden_size, cfg.intermediate_size, dtype),
                "fc2": _linear(k6, cfg.intermediate_size, cfg.hidden_size, dtype),
            },
        })
    # vision layers stay a per-layer LIST (each leaf its own buffer):
    # the flash-attention custom call defeats XLA's scan optimizations —
    # measured on v5e: pallas-in-rolled-scan runs 16x slower (29 vs 464
    # frames/s), while the unrolled list form runs at full speed. The
    # one-time compile cost of 27 inline kernels is absorbed by the
    # persistent compilation cache (utils/cache.py). The decoder keeps
    # stacked+scan (no custom calls there).
    params["layers"] = layers
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _layernorm(x, p, eps):
    # fp32 stats/normalize like the reference (torch upcasts LN). The
    # packed encoder path uses the fused Pallas kernel instead
    # (ops/layernorm.py, ~6 ms/forward win at 32x1024 tokens); this jnp
    # form serves the eager fallback, the post-LN after the pad slice,
    # and CPU tests. An MXU ones-dot reduction variant measured
    # identical — LN is bound by elementwise streams, not the reduce.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return (x @ _materialize_kernel(p, x.dtype)) \
        + p["bias"].astype(x.dtype)


def _attn_block(x, p, rope_csp, segment_ids, cfg, attn_impl):
    N = x.shape[0]
    H, D = cfg.num_attention_heads, cfg.head_dim
    cos2, sin2, perm = rope_csp
    q = _dense(x, p["q"]).reshape(N, H, D)
    k = _dense(x, p["k"]).reshape(N, H, D)
    v = _dense(x, p["v"]).reshape(N, H, D)
    q = apply_vision_rope_cs(q, cos2, sin2, perm)
    k = apply_vision_rope_cs(k, cos2, sin2, perm)
    out = attn_impl(q, k, v, segment_ids)
    return _dense(out.reshape(N, H * D), p["o"])


def _materialize_kernel(p, dtype):
    from ..ops.quant import materialize_kernel

    return materialize_kernel(p["kernel"], dtype)


def _attn_block_packed(x, p, rope_cs128, seg_row, cfg, flash):
    """Attention block in token-major packed layout [Np, H*128].

    The QKV weights are padded per head from D to 128 LANES (zero
    columns), so the GEMM itself emits the tile-aligned layout the
    packed flash kernel reads directly — no [N,H,D]→[H,N,D] transpose
    or activation pad per layer (together ~90 ms/forward at 32x1024
    tokens). Zero lanes are exact: they contribute nothing to q·k, the
    attention output stays zero there, and the o-projection weight is
    zero-padded on its input side. Weight padding costs one small pad
    per weight per call (~0.5 ms total across the tower).

    The 2D RoPE rotation is fused INTO the flash kernel
    (flash_attention_packed_rope_fusedqkv): q/k go from the GEMM straight to
    attention with no separate rotation pass — the standalone per-layer
    rope passes cost ~54 ms/forward across the tower at 32x1024 tokens
    (two f32 round trips over [N, H*128] per layer plus the
    permutation einsum), all of it HBM traffic the fused form never
    touches. Numerically identical: the ±1 permutation dot is exact on
    bf16 inputs and the f32 combine/cast order matches the unfused
    path.
    """
    from ..ops.flash_attention import (
        flash_attention_packed_rope_fusedqkv, _round_up)
    from ..ops.quant import int8_act_matmul, quantize_int8_act

    H, D = cfg.num_attention_heads, cfg.head_dim
    Dp = _round_up(D, 128)
    cos2d, sin2d, perm128 = rope_cs128
    kv_start, kv_count, kmax, block, aligned = flash
    # The W8A8 fast path requires ALL FOUR projections in the int8
    # form: quantize_tree(bits=4) int8-fallbacks group-indivisible
    # kernels, so a mixed q4/int8 tree must materialize instead.
    w8a8 = all(_is_w8(p[k]["kernel"]) for k in ("q", "k", "v", "o"))

    def padw(pp):
        """Pad a projection per head from D to Dp output lanes. For an
        int8-quantized kernel the PACKED int8 tensor and its
        per-channel scales pad directly (zero weights / unit scales are
        exact), keeping the GEMM on the MXU int8 path."""
        if w8a8:
            kern = pp["kernel"]
            qw = kern["q"].reshape(-1, H, D)
            qw = jnp.pad(qw, ((0, 0), (0, 0),
                              (0, Dp - D))).reshape(-1, H * Dp)
            sc = jnp.pad(kern["scale"].reshape(H, D),
                         ((0, 0), (0, Dp - D)),
                         constant_values=1.0).reshape(H * Dp)
        else:
            qw = _materialize_kernel(pp, x.dtype).reshape(-1, H, D)
            qw = jnp.pad(qw, ((0, 0), (0, 0),
                              (0, Dp - D))).reshape(-1, H * Dp)
            sc = None
        b = jnp.pad(pp["bias"].astype(jnp.float32).reshape(H, D),
                    ((0, 0), (0, Dp - D))).reshape(H * Dp)
        return qw, sc, b

    # ONE fused QKV GEMM: reads x once (three separate projections read
    # it three times) and its output buffer is addressed by the kernel
    # directly at column offsets 0/H/2H — no per-operand slice copy
    wq, sq, bq_ = padw(p["q"])
    wk, sk, bk = padw(p["k"])
    wv, sv, bv = padw(p["v"])
    w_all = jnp.concatenate([wq, wk, wv], axis=1)
    b_all = jnp.concatenate([bq_, bk, bv])
    if w8a8:
        s_all = jnp.concatenate([sq, sk, sv])
        xq, sx = quantize_int8_act(x)
        qkv = (int8_act_matmul(xq, sx, w_all, s_all, jnp.float32)
               + b_all).astype(x.dtype)
    else:
        qkv = x @ w_all + b_all.astype(x.dtype)
    out = flash_attention_packed_rope_fusedqkv(
        qkv, cos2d, sin2d, perm128, seg_row, kv_start, kv_count,
        H, Dp, block, block, kmax,
        1.0 / math.sqrt(D), jax.default_backend() != "tpu",
        aligned=aligned)
    if w8a8:
        kern = p["o"]["kernel"]
        qo = jnp.pad(kern["q"].reshape(H, D, -1),
                     ((0, 0), (0, Dp - D), (0, 0))).reshape(H * Dp, -1)
        oq, so = quantize_int8_act(out)
        return (int8_act_matmul(oq, so, qo, kern["scale"], jnp.float32)
                + p["o"]["bias"].astype(jnp.float32)).astype(x.dtype)
    wo = _materialize_kernel(p["o"], x.dtype).reshape(H, D, -1)
    wo = jnp.pad(wo, ((0, 0), (0, Dp - D), (0, 0))).reshape(H * Dp, -1)
    return out @ wo + p["o"]["bias"].astype(x.dtype)


def _is_w8(kern) -> bool:
    """int8-scheme quant dict (the W8A8 serving form). int4/NF4 ``q4``
    kernels are NOT W8A8 — they fall through to the weight-only
    materializing path (stage-2 --quantize-base nf4 quantizes the whole
    tree incl. the vision tower)."""
    return isinstance(kern, dict) and "q" in kern and "scale" in kern


def _mlp_block(x, p):
    from ..ops.quant import int8_act_matmul, quantize_int8_act

    if _is_w8(p["fc1"]["kernel"]) and _is_w8(p["fc2"]["kernel"]):
        # W8A8 serving path: both GEMMs run int8xint8 on the MXU's
        # double-rate path; act quant + rescale are fused elementwise
        xq, sx = quantize_int8_act(x)
        k1 = p["fc1"]["kernel"]
        h = (int8_act_matmul(xq, sx, k1["q"], k1["scale"], jnp.float32)
             + p["fc1"]["bias"].astype(jnp.float32))
        h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
        hq, sh = quantize_int8_act(h)
        k2 = p["fc2"]["kernel"]
        return (int8_act_matmul(hq, sh, k2["q"], k2["scale"], jnp.float32)
                + p["fc2"]["bias"].astype(jnp.float32)).astype(x.dtype)
    h = _dense(x, p["fc1"])
    h = jax.nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
    return _dense(h, p["fc2"])


def vision_encoder_core(
    params: Params,
    pixel_values: jax.Array,    # [N, C*ps*ps]
    pos_ids: jax.Array,         # [N, 2] int32 (row, col)
    segment_ids: jax.Array,     # [N] int32, -1 = pad
    merge_group_ids: jax.Array, # [N] int32 output-token id per input token
    num_out_tokens: int,        # static
    cfg: VisionEncoderConfig,
    use_pallas: bool = False,
    flash_kv=None,              # (kv_start [nq], kv_count [nq]) device arrays
    flash_kmax: int = 0,        # static — minor grid extent of the kernel
    flash_block: int = 0,       # static — q/k block size (0 = default)
    flash_aligned: bool = False,  # static — whole-frame blocks, maskless
) -> jax.Array:
    """Jittable core: patch rows → merged features [num_out_tokens, hidden].

    ``num_out_tokens`` and all array shapes are static; callers bucket N.
    With ``use_pallas`` the varlen flash kernel runs; its per-q-block KV
    ranges (``flash_kv``/``flash_kmax``, from build_vision_metadata) are
    host metadata so the kernel grid stays static under jit.
    """
    packed = False
    if use_pallas:
        from ..ops.flash_attention import (
            DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, FlashRanges,
            segment_flash_attention, _round_up)

        N = pixel_values.shape[0]
        if flash_kv is None:
            ranges = None  # eager fallback: derive from concrete ids

            def attn_impl(q, k, v, seg):
                return segment_flash_attention(q, k, v, seg, ranges=ranges)
        else:
            # token-major packed path: the layer loop below runs at
            # [Np, H*128] with the kernel reading GEMM-native tiles
            bq = flash_block or DEFAULT_BLOCK_Q
            n_pad = _round_up(max(N, bq), bq)
            packed = True
            attn_impl = None
    else:
        attn_impl = segment_attention

    if pixel_values.dtype == jnp.uint8:
        # raw uint8 rows: normalize on device with the host pipeline's
        # exact op order (rescale, -mean, /std, all f32) — host->device
        # pixel traffic shrinks 4x (the streaming-ingest bottleneck)
        mean = jnp.asarray(cfg.image_mean, jnp.float32)[:, None]
        std = jnp.asarray(cfg.image_std, jnp.float32)[:, None]
        n = pixel_values.shape[0]
        xf = pixel_values.reshape(n, cfg.num_channels, -1).astype(
            jnp.float32)
        xf = (xf * jnp.float32(cfg.rescale_factor) - mean) / std
        pixel_values = xf.reshape(n, -1)
    x = _dense(pixel_values.astype(cfg.jnp_dtype), params["patch_embed"])
    angles = vision_rope_angles(pos_ids, cfg.head_dim)
    # hoisted: transcendentals once, rotate-half as a constant
    # permutation matmul (see rope_half_permutation) — the per-layer
    # slice/negate lane shuffles cost ~88 ms/forward at 32x1024
    cos2, sin2 = vision_rope_cos_sin(angles)

    # unrolled per-layer loop (see init_vision_params for why the
    # vision tower does NOT scan: the Pallas custom call degrades
    # rolled-scan runtime 16x on v5e)
    if packed:
        from ..ops.flash_attention import _round_up as _ru

        H, D = cfg.num_attention_heads, cfg.head_dim
        Dp = _ru(D, 128)
        N0 = x.shape[0]
        extra = n_pad - N0
        # pad the residual stream ONCE; padded rows are seg=-1 (masked
        # in attention) and sliced off before the merge downsample
        x = jnp.pad(x, ((0, extra), (0, 0)))
        seg_row = jnp.pad(jnp.asarray(segment_ids, jnp.int32), (0, extra),
                          constant_values=-1)[None, :]
        perm = rope_half_permutation(D)
        perm128 = jnp.zeros((Dp, Dp), jnp.float32).at[:D, :D].set(perm)
        # per-token [Np, Dp] f32 rope terms for the fused kernel (zero
        # in padded rows/lanes — rotated values there stay zero, same
        # as the unfused path)
        cs = jnp.pad(cos2[:, 0, :], ((0, extra), (0, Dp - D)))
        sn = jnp.pad(sin2[:, 0, :], ((0, extra), (0, Dp - D)))
        flash = (flash_kv[0], flash_kv[1], flash_kmax, bq,
                 flash_aligned)
        # fused single-pass LN (ops/layernorm.py): ~6 ms/forward over
        # the jnp form at 32x1024 tokens (see the kernel's docstring)
        from ..ops.layernorm import pallas_layernorm

        interp = jax.default_backend() != "tpu"

        def ln(t, p):
            return pallas_layernorm(t, p["scale"], p["bias"],
                                    cfg.layer_norm_eps,
                                    interpret=interp)

        for layer in params["layers"]:
            x = x + _attn_block_packed(
                ln(x, layer["ln1"]),
                layer["attn"], (cs, sn, perm128), seg_row, cfg, flash)
            x = x + _mlp_block(ln(x, layer["ln2"]), layer["mlp"])
        x = x[:N0]
    else:
        rope_csp = (cos2, sin2, rope_half_permutation(cfg.head_dim))
        for layer in params["layers"]:
            x = x + _attn_block(
                _layernorm(x, layer["ln1"], cfg.layer_norm_eps),
                layer["attn"], rope_csp, segment_ids, cfg, attn_impl)
            x = x + _mlp_block(
                _layernorm(x, layer["ln2"], cfg.layer_norm_eps),
                layer["mlp"])
    x = _layernorm(x, params["post_ln"], cfg.layer_norm_eps)

    # merge-window mean (exact bilinear 2x downsample, ref :487-506)
    valid = (merge_group_ids >= 0).astype(jnp.float32)[:, None]
    gid = jnp.maximum(merge_group_ids, 0)
    sums = jax.ops.segment_sum(x.astype(jnp.float32) * valid, gid,
                               num_segments=num_out_tokens)
    counts = jax.ops.segment_sum(valid, gid, num_segments=num_out_tokens)
    return (sums / jnp.maximum(counts, 1.0)).astype(cfg.jnp_dtype)


def quantize_vision_w8a8(params: Params) -> Params:
    """Serving-mode W8A8 prep: per-output-channel int8 weights for every
    tower GEMM except the patch embedding (input fidelity; it is ~1% of
    the FLOPs). The packed forward detects quantized kernels and runs
    dynamic per-token int8 activations into the MXU's int8 path
    (measured ~1.25x over bf16 in-program on v5e — the XLA int8 GEMM
    ceiling, not 2x); the eager fallback dequantizes weight-only.
    Accuracy: merged-feature cosine vs bf16 stays >0.999 at init-scale
    weights (test_vision_encoder.py::test_w8a8_packed_parity)."""
    from ..ops.quant import quantize_tree

    return quantize_tree(params, bits=8,
                         predicate=lambda name: name != "patch_embed")


class VisionMetadata(NamedTuple):
    """Host-precomputed per-batch metadata for the jitted core."""

    pos_ids: np.ndarray          # [N, 2]
    segment_ids: np.ndarray      # [N]
    merge_group_ids: np.ndarray  # [N]
    num_out_tokens: int
    kv_start: Optional[np.ndarray] = None   # [nq] flash KV range starts
    kv_count: Optional[np.ndarray] = None   # [nq] flash KV range lengths
    kmax: int = 0                            # static minor grid extent
    block_q: int = 0                         # static q/k block size
    aligned: bool = False                    # whole-frame homogeneous blocks


def build_vision_metadata(
    grid_sizes: np.ndarray,   # [B, 3] (t, gh, gw)
    merge_sizes: np.ndarray,  # [B]
    pad_to: Optional[int] = None,
) -> VisionMetadata:
    """Positions, frame-segment ids and merge groups in patchify order.

    Each *frame* is its own attention segment, matching the reference's
    ``repeat_interleave(h*w, t)`` cu_seqlens (ref :439-440).
    """
    pos_list, seg_list, grp_list = [], [], []
    seg = 0
    out_tokens = 0
    for (t, gh, gw), ms in zip(np.asarray(grid_sizes), np.asarray(merge_sizes)):
        t, gh, gw, ms = int(t), int(gh), int(gw), int(ms)
        pos_list.append(grid_position_ids(t, gh, gw, ms))
        seg_list.append(np.repeat(np.arange(seg, seg + t, dtype=np.int32), gh * gw))
        seg += t
        n_groups = t * (gh // ms) * (gw // ms)
        grp = np.repeat(np.arange(out_tokens, out_tokens + n_groups,
                                  dtype=np.int32), ms * ms)
        grp_list.append(grp)
        out_tokens += n_groups
    if pos_list:
        pos = np.concatenate(pos_list)
        segs = np.concatenate(seg_list)
        grps = np.concatenate(grp_list)
    else:
        pos = np.zeros((0, 2), np.int32)
        segs = np.zeros((0,), np.int32)
        grps = np.zeros((0,), np.int32)
    n = pos.shape[0]
    if pad_to is not None and pad_to > n:
        pad = pad_to - n
        pos = np.concatenate([pos, np.zeros((pad, 2), np.int32)])
        segs = np.concatenate([segs, np.full((pad,), -1, np.int32)])
        grps = np.concatenate([grps, np.full((pad,), -1, np.int32)])
    from ..ops.flash_attention import FlashRanges

    fr = FlashRanges.build(segs) if segs.shape[0] else None
    return VisionMetadata(
        pos, segs, grps, out_tokens,
        kv_start=None if fr is None else fr.kv_start,
        kv_count=None if fr is None else fr.kv_count,
        kmax=0 if fr is None else fr.kmax,
        block_q=0 if fr is None else fr.block_q,
        aligned=False if fr is None else fr.aligned)


def vision_encoder_forward(
    params: Params,
    pixel_values,                 # [N, C*ps*ps] numpy or jax
    grid_sizes: np.ndarray,       # [B, 3]
    merge_sizes: np.ndarray,      # [B]
    cfg: VisionEncoderConfig,
    use_pallas: bool = False,
    pad_to: Optional[int] = None,
) -> jax.Array:
    """Convenience wrapper: metadata on host, core jitted per bucket.

    Returns [sum(t*gh*gw/ms^2), hidden] merged patch features — the same
    contract as the reference model's forward (ref :479-510).
    """
    meta = build_vision_metadata(grid_sizes, merge_sizes, pad_to=pad_to)
    n = meta.pos_ids.shape[0]
    pv = jnp.asarray(pixel_values)
    if pv.shape[0] < n:  # pad pixel rows to the bucket
        pv = jnp.concatenate(
            [pv, jnp.zeros((n - pv.shape[0], pv.shape[1]), pv.dtype)])
    flash_kv = (None if meta.kv_start is None or not use_pallas else
                (jnp.asarray(meta.kv_start), jnp.asarray(meta.kv_count)))
    out = _jitted_core(params, pv, jnp.asarray(meta.pos_ids),
                       jnp.asarray(meta.segment_ids),
                       jnp.asarray(meta.merge_group_ids),
                       flash_kv,
                       meta.num_out_tokens, cfg, use_pallas, meta.kmax,
                       meta.block_q, meta.aligned)
    return out


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def _jitted_core(params, pv, pos, seg, grp, flash_kv, num_out, cfg,
                 use_pallas, kmax, block_q, aligned=False):
    return vision_encoder_core(params, pv, pos, seg, grp, num_out, cfg,
                               use_pallas=use_pallas, flash_kv=flash_kv,
                               flash_kmax=kmax, flash_block=block_q,
                               flash_aligned=aligned)
