"""CogReasoner multimodal core: Visual Stream Compression + token splice.

Capability parity with the reference orchestration
(`/root/reference/model/cogreasoner_chat.py:264-584`):

1. vision encode + project every frame (encode_images, ref :264-276);
2. cluster frames into events with temporal-semantic k-means and keep 2
   keyframes per event (ref :278-296);
3. summarize each event with an LM forward and score events against the
   current question by cosine similarity (< 0.45 → unimportant,
   ref :297-331);
4. mean-pool unimportant frames into their first patch (ref :434-447);
5. pixel-diff token mask: merged patches whose pixels barely changed
   from the previous frame are dropped; minor frames keep exactly one
   token (ref :383-432);
6. compact the token sequence, dropping masked ``<image>`` positions
   (ref :449-476), and splice visual features into the embedding stream
   (ref :567-572).

TPU-native design deltas (SURVEY.md §7):

* event summaries run as ONE padded batch forward instead of K
  sequential forwards (delta 5);
* k-means is the jitted op in ops/kmeans.py (delta 4);
* compression/compaction is budgeted gather-by-index with sentinel
  padding — output shapes stay static, the real length travels as a
  scalar (delta 3). The single host sync per turn is the tiny
  cluster-assignment vector needed to build summary prompt text.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig
from . import qwen2
from .projector import init_projector_params, projector_forward
from .vision_encoder import init_vision_params, vision_encoder_forward

SUMMARY_SYSTEM = (
    "You are a helpful assistant specializing in summarizing events from "
    "timestamped visual data."
)
SUMMARY_INSTRUCTION = (
    "Concisely list the key points of the event shown in the timestamped "
    "images, adhering strictly and honestly to the visual content. For "
    "each key point, identify relevant objects or actions, note any "
    "visible text, and specify the approximate timestamp(s). Provide an "
    "overview focusing on these key timestamped points."
)


def init_cogreasoner_params(key: jax.Array, cfg: CogReasonerConfig) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "text": qwen2.init_qwen2_params(k1, cfg.text),
        "vision": init_vision_params(k2, cfg.vision),
        "projector": init_projector_params(
            k3, cfg.vision.hidden_size, cfg.text.hidden_size,
            cfg.mm_projector_type, dtype=cfg.text.jnp_dtype),
    }


# ---------------------------------------------------------------------------
# stage 1: encode + project
# ---------------------------------------------------------------------------

def encode_images(
    params: Dict,
    pixel_values: jax.Array,
    grid_sizes: np.ndarray,
    merge_sizes: np.ndarray,
    cfg: CogReasonerConfig,
    use_pallas: bool = False,
    pad_to: Optional[int] = None,
) -> jax.Array:
    """Patch rows → projected LM-space features [N_merged, H_lm]."""
    feats = vision_encoder_forward(
        params["vision"], pixel_values, grid_sizes, merge_sizes,
        cfg.vision, use_pallas=use_pallas, pad_to=pad_to)
    return projector_forward(params["projector"],
                             feats.astype(cfg.text.jnp_dtype))


# ---------------------------------------------------------------------------
# stage 2: event clustering (device) + summary prompt construction (host)
# ---------------------------------------------------------------------------

def num_events_for(total_frames: int, cfg: CogReasonerConfig) -> int:
    """ceil(T / frames_per_event); compression only runs when this is
    >= min_events_for_compression (ref :280-282)."""
    return math.ceil(total_frames / cfg.compression.frames_per_event)


def compression_active(total_frames: int, cfg: CogReasonerConfig) -> bool:
    return (cfg.use_token_compression
            and num_events_for(total_frames, cfg)
            >= cfg.compression.min_events_for_compression)


class SummaryBatch(NamedTuple):
    """Host-built padded batch of K event-summary prompts.

    ``feat_src[k, i]`` is the frame-feature row (flat index into the
    [T*P, H] frame features) to splice at position i, or -1 for a text
    token. ``positions`` is -1 on padding.
    """

    input_ids: np.ndarray   # [K, L]
    feat_src: np.ndarray    # [K, L]
    positions: np.ndarray   # [K, L]


def build_summary_batch(
    tokenizer,
    assignments: np.ndarray,     # [T] cluster ids (host copy)
    timestamps: np.ndarray,      # [T] seconds
    patches_per_frame: int,
    num_events: int,
    image_token: str = "<image>",
    max_frames_per_event: int = 0,   # >0: uniform-subsample big events
    pad_events_to: int = 0,          # >0: pad K (stable jit shapes)
) -> SummaryBatch:
    """Tokenize the K event-summary prompts with per-frame feature slots.

    Prompt layout mirrors ``create_visual_summary_prompt``
    (cogreasoner_chat.py:93-119): system header, per-frame
    ``Time X.Xs:<image>*P`` joined by commas, instruction, assistant cue.

    ``max_frames_per_event`` bounds a skewed cluster's prompt (the
    static pad budget, CompressionConfig.summary_max_frames_per_event —
    one 500-frame event would otherwise make the [K, L] relevance
    forward a ~100k-token prefill); subsampling is uniform so the
    summary still spans the event. ``pad_events_to`` appends dummy
    prompts (one real token) so K rides a stable bucket instead of
    recompiling every 15 frames of stream growth.
    """
    img_id = tokenizer.image_token_id
    seqs: List[List[int]] = []
    srcs: List[List[int]] = []
    for k in range(num_events):
        members = np.nonzero(assignments == k)[0]
        if max_frames_per_event and len(members) > max_frames_per_event:
            sel = np.linspace(0, len(members) - 1, max_frames_per_event,
                              dtype=int)
            members = members[sel]
        parts = [
            "<|im_start|>system\n" + SUMMARY_SYSTEM + "<|im_end|>\n"
            "<|im_start|>user\n"
        ]
        for j, fi in enumerate(members):
            stamp = f"Time {float(timestamps[fi]):.1f}s:"
            parts.append(stamp + image_token * patches_per_frame
                         + ("," if j < len(members) - 1 else ""))
        parts.append("\n" + SUMMARY_INSTRUCTION + "<|im_end|>\n"
                     "<|im_start|>assistant")
        ids = tokenizer.encode("".join(parts))
        src = [-1] * len(ids)
        # map image-token occurrences to flat frame-feature rows, in order
        slot = 0
        for i, tid in enumerate(ids):
            if tid == img_id:
                frame = members[slot // patches_per_frame]
                src[i] = int(frame) * patches_per_frame + slot % patches_per_frame
                slot += 1
        assert slot == len(members) * patches_per_frame
        seqs.append(ids)
        srcs.append(src)

    L = max(len(s) for s in seqs)
    L = max(8, -(-L // 64) * 64)  # bucket to multiples of 64
    K_out = max(num_events, pad_events_to)
    ids_arr = np.zeros((K_out, L), np.int32)
    src_arr = np.full((K_out, L), -1, np.int32)
    pos_arr = np.full((K_out, L), -1, np.int32)
    # pad rows carry one real token (pos 0) so their forward stays
    # NaN-free; callers slice sims back to num_events
    pos_arr[num_events:, 0] = 0
    for k, (ids, src) in enumerate(zip(seqs, srcs)):
        ids_arr[k, :len(ids)] = ids
        src_arr[k, :len(src)] = src
        pos_arr[k, :len(ids)] = np.arange(len(ids))
    return SummaryBatch(ids_arr, src_arr, pos_arr)


def event_relevance(
    params: Dict,
    cfg: CogReasonerConfig,
    frame_features: jax.Array,      # [T*P, H] projected features
    summary: SummaryBatch,
    question_ids: np.ndarray,       # [Lq] current-question token ids
) -> jax.Array:
    """Batched event-summary forwards + question forward → cosine
    similarity per event. Returns sim [K] float32 (event unimportant
    when sim < cfg.compression.similarity_threshold).

    The reference runs K+1 sequential forwards (ref :302-323); this is
    two: one [K, L] batch, one [1, Lq].
    """
    text = params["text"]
    ids = jnp.asarray(summary.input_ids)
    src = jnp.asarray(summary.feat_src)
    pos = jnp.asarray(summary.positions)

    emb = qwen2.embed(text, ids)
    feats = frame_features.astype(emb.dtype)
    spliced = jnp.where((src >= 0)[..., None],
                        feats[jnp.maximum(src, 0)], emb)
    hidden, _ = qwen2.qwen2_forward(text, spliced, pos, cfg.text)
    valid = (pos >= 0).astype(jnp.float32)[..., None]
    pooled = (jnp.sum(hidden.astype(jnp.float32) * valid, axis=1)
              / jnp.maximum(jnp.sum(valid, axis=1), 1.0))       # [K, H]

    # question forward: truncate to 128 tokens (ref :319 max_length)
    # and pad to a 32-bucket — an exact-length prefill would recompile
    # per novel question length (CLAUDE.md bucketing invariant); the
    # masked mean ignores the pad
    qi = np.asarray(question_ids, np.int32)[:128]
    Lq = max(32, -(-len(qi) // 32) * 32)
    q_padded = np.zeros((Lq,), np.int32)
    q_padded[:len(qi)] = qi
    q_posn = np.concatenate([np.arange(len(qi), dtype=np.int32),
                             np.full((Lq - len(qi),), -1, np.int32)])
    q_ids = jnp.asarray(q_padded[None, :])
    q_pos = jnp.asarray(q_posn[None, :])
    q_hidden, _ = qwen2.qwen2_forward(text, qwen2.embed(text, q_ids),
                                      q_pos, cfg.text)
    q_valid = (q_pos >= 0).astype(jnp.float32)[..., None]
    q = (jnp.sum(q_hidden.astype(jnp.float32) * q_valid, axis=1)
         / jnp.maximum(jnp.sum(q_valid, axis=1), 1.0))          # [1, H]

    sim = jnp.sum(pooled * q, axis=-1) / (
        jnp.linalg.norm(pooled, axis=-1) * jnp.linalg.norm(q, axis=-1) + 1e-8)
    return sim


def minor_frame_mask(
    assignments: jax.Array,   # [T]
    unimportant_events: jax.Array,  # [K] bool
    keyframe_idx: jax.Array,  # [K, k] int32
    keyframe_valid: jax.Array,  # [K, k] bool
    total_frames: int,
) -> jax.Array:
    """[T] bool — frames to squash to one token: members of unimportant
    events, excluding each event's keyframes (ref :331-332)."""
    unimp = unimportant_events[assignments]                     # [T]
    key_mask = jnp.zeros((total_frames,), jnp.bool_)
    flat_idx = keyframe_idx.reshape(-1)
    flat_val = keyframe_valid.reshape(-1)
    key_mask = key_mask.at[jnp.where(flat_val, flat_idx, total_frames)].set(
        True, mode="drop")
    return unimp & ~key_mask


# ---------------------------------------------------------------------------
# stage 3: pooling + pixel-diff compression mask
# ---------------------------------------------------------------------------

def pool_minor_frames(
    mm_features: jax.Array,    # [T*P, H]
    minor: jax.Array,          # [T] bool
    patches_per_frame: int,
) -> jax.Array:
    """Mean-pool each minor frame's patches into its patch 0
    (``compress_unimportant_events``, ref :434-447)."""
    T = minor.shape[0]
    x = mm_features.reshape(T, patches_per_frame, -1)
    pooled = jnp.mean(x, axis=1)
    first = jnp.where(minor[:, None], pooled, x[:, 0])
    x = x.at[:, 0].set(first)
    return x.reshape(T * patches_per_frame, -1)


@functools.partial(jax.jit, static_argnames=("t", "merged_per_frame",
                                             "threshold", "min_tokens",
                                             "image_std",
                                             "rescale_factor"))
def pixel_diff_keep_mask(
    pixel_values: jax.Array,    # [t*gh*gw, C*ps*ps] one video item's rows
    t: int,
    merged_per_frame: int,      # (gh/ms)*(gw/ms)
    minor: jax.Array,           # [t] bool
    threshold: float = 0.1,
    min_tokens: int = 1,
    image_std: Tuple[float, ...] = (0.5, 0.5, 0.5),
    rescale_factor: float = 1.0 / 255.0,
) -> jax.Array:
    """[t, merged_per_frame] bool keep-mask from inter-frame pixel diff
    (``_get_compression_mask``, ref :383-432). Frame 0 keeps all tokens;
    frames whose diff mask is empty keep the first ``min_tokens``;
    minor frames keep exactly token 0."""
    x = pixel_values.reshape(t, merged_per_frame, -1)
    if x.dtype == jnp.uint8:
        # raw uint8 rows: per-channel rescale to the normalized span
        # (rows are channel-major [C, ps*ps]) so diffs — and therefore
        # keep masks — match the normalized-float path for ANY
        # preprocessor mean/std, not just the reference's 0.5/0.5
        C = len(image_std)
        scale = jnp.asarray(
            [rescale_factor / s for s in image_std],
            jnp.float32)[None, None, :, None]
        x = (x.reshape(t, merged_per_frame, C, -1).astype(jnp.float32)
             * scale).reshape(t, merged_per_frame, -1)
    else:
        x = x.astype(jnp.float32)
    diff = jnp.abs(x[1:] - x[:-1]).mean(axis=-1) * 255.0
    diff = jnp.concatenate(
        [jnp.full((1, merged_per_frame), threshold + 1.0), diff], axis=0)
    mask = diff > threshold
    needs_pad = jnp.sum(mask, axis=1) < min_tokens
    col = jnp.arange(merged_per_frame) < min_tokens
    mask = jnp.where(needs_pad[:, None], mask | col[None, :], mask)
    minor_row = jnp.arange(merged_per_frame) == 0
    mask = jnp.where(minor[:, None], minor_row[None, :], mask)
    return mask


def pixel_diff_keep_mask_host(
    pixel_values: np.ndarray,   # [t*gh*gw, C*ps*ps] host patch rows
    t: int,
    merged_per_frame: int,
    minor: np.ndarray,          # [t] bool
    threshold: float = 0.1,
    min_tokens: int = 1,
    image_std: Tuple[float, ...] = (0.5, 0.5, 0.5),
    rescale_factor: float = 1.0 / 255.0,
) -> np.ndarray:
    """Host-numpy mirror of ``pixel_diff_keep_mask`` (same math, f32).

    The session/pool ingest paths use this instead of the jitted
    kernel: the pixels are already host-resident and the host packing
    plan needs the mask immediately, so the device form costs a
    dispatch plus a blocking mask fetch (~60 ms per segment over the
    axon tunnel) for a few thousand comparisons numpy does in ~1 ms.
    The engine's in-jit compression keeps the device kernel."""
    x = np.asarray(pixel_values).reshape(t, merged_per_frame, -1)
    if x.dtype == np.uint8:
        C = len(image_std)
        scale = np.asarray([rescale_factor / s for s in image_std],
                           np.float32)[None, None, :, None]
        x = (x.reshape(t, merged_per_frame, C, -1).astype(np.float32)
             * scale).reshape(t, merged_per_frame, -1)
    else:
        x = x.astype(np.float32)
    diff = np.abs(x[1:] - x[:-1]).mean(axis=-1) * 255.0
    diff = np.concatenate(
        [np.full((1, merged_per_frame), threshold + 1.0, np.float32),
         diff], axis=0)
    mask = diff > threshold
    needs_pad = mask.sum(axis=1) < min_tokens
    col = np.arange(merged_per_frame) < min_tokens
    mask = np.where(needs_pad[:, None], mask | col[None, :], mask)
    minor_row = np.arange(merged_per_frame) == 0
    mask = np.where(np.asarray(minor, bool)[:, None],
                    minor_row[None, :], mask)
    return mask


# ---------------------------------------------------------------------------
# stage 4: compaction + splice
# ---------------------------------------------------------------------------

class MultimodalInputs(NamedTuple):
    embeds: jax.Array      # [S, H] compacted embeddings (padded)
    positions: jax.Array   # [S] int32; -1 on padding
    length: jax.Array      # [] int32 real length
    last_index: jax.Array  # [] int32 index of last real token


def splice_and_compact(
    params: Dict,
    cfg: CogReasonerConfig,
    input_ids: jax.Array,        # [S] int32 (image tokens pre-expanded)
    valid: jax.Array,            # [S] bool — real (non-padding) slots
    mm_features: jax.Array,      # [N, H] visual features in order
    keep_visual: jax.Array,      # [N] bool — compression keep-mask
) -> MultimodalInputs:
    """Drop masked ``<image>`` positions, embed, splice visual features.

    Static-shape rebuild of ``_compress_visual_tokens`` + the embedding
    splice (ref :449-476,567-572): a stable sort moves dropped slots to
    the tail; output stays [S] with positions -1 beyond the new length.
    """
    img_id = cfg.image_token_index
    S = input_ids.shape[0]
    is_img = (input_ids == img_id) & valid
    # visual-token index per sequence slot (0 for text slots)
    vis_idx = jnp.cumsum(is_img.astype(jnp.int32)) - 1
    keep = jnp.where(is_img, keep_visual[jnp.maximum(vis_idx, 0)], valid)

    # stable-compact kept slots to the front
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    new_ids = input_ids[order]
    new_is_img = is_img[order]
    new_len = jnp.sum(keep.astype(jnp.int32))
    slot = jnp.arange(S)
    valid = slot < new_len

    # kept visual features, compacted to the front of mm_features
    feat_order = jnp.argsort(jnp.logical_not(keep_visual), stable=True)
    kept_feats = mm_features[feat_order]
    # for each kept image slot: its rank among kept image slots
    img_rank = jnp.cumsum((new_is_img & valid).astype(jnp.int32)) - 1

    emb = qwen2.embed(params["text"], jnp.where(valid, new_ids, 0))
    spliced = jnp.where(
        (new_is_img & valid)[:, None],
        kept_feats[jnp.maximum(img_rank, 0)].astype(emb.dtype),
        emb)
    positions = jnp.where(valid, slot, -1).astype(jnp.int32)
    return MultimodalInputs(spliced, positions, new_len, new_len - 1)


# ---------------------------------------------------------------------------
# top-level per-turn pipeline (batch size 1, like the reference :560-563)
# ---------------------------------------------------------------------------

@dataclass
class VisualCompressionResult:
    keep_visual: np.ndarray          # host [N] bool (or device array)
    mm_features: jax.Array           # [N, H] (minor frames pooled)
    minor_frames: Optional[jax.Array]  # [T] bool or None
    similarities: Optional[jax.Array]  # [K] or None


def run_visual_compression(
    params: Dict,
    cfg: CogReasonerConfig,
    tokenizer,
    mm_features: jax.Array,       # [N, H] projected features (all items)
    pixel_values: jax.Array,      # patch rows (all items)
    grid_sizes: np.ndarray,       # [B, 3]
    merge_sizes: np.ndarray,      # [B]
    modals: Sequence[str],
    timestamps: np.ndarray,       # [T_total] one stamp per video frame
    question_ids: np.ndarray,     # current-question token ids
    key: jax.Array,
) -> VisualCompressionResult:
    """The full C6-C7 pipeline for one turn.

    ``mm_features`` covers all items (images keep all their tokens);
    clustering/compression applies to the video frames as one stream,
    matching the reference which flattens ``total_image_num`` frames
    (ref :278-333,513-564).
    """
    from ..ops.kmeans import kmeans_with_time, select_event_keyframes

    grid_sizes = np.asarray(grid_sizes)
    merge_sizes = np.asarray(merge_sizes)
    total_frames = int(timestamps.shape[0])
    n_tokens = int(mm_features.shape[0])
    cc = cfg.compression

    if total_frames == 0 or not cfg.use_token_compression:
        keep = jnp.ones((n_tokens,), jnp.bool_)
        return VisualCompressionResult(keep, mm_features, None, None)

    # EVENT machinery (clustering → summaries → pruning → pooling)
    # needs one uniform per-frame token count across the whole stream:
    # pure video items whose merged grids all match (the reference
    # asserts batch==1 around this path, cogreasoner_chat.py:560-563;
    # a divisibility check alone can pass by accident on mixed grids
    # and then silently mix tokens across frame boundaries). It also
    # needs K < T (kmeans) and enough events (ref :280-282). The
    # question-INDEPENDENT pixel-diff mask below runs regardless —
    # the reference applies _get_compression_mask even when event
    # selection returns [] (ref :552-555).
    merged_counts = {
        (int(gh) // int(ms)) * (int(gw) // int(ms))
        for (t, gh, gw), ms, m in zip(grid_sizes, merge_sizes, modals)
        if m == "video"}
    K = num_events_for(total_frames, cfg)
    uniform_video = (all(m == "video" for m in modals)
                     and len(merged_counts) == 1
                     and n_tokens % total_frames == 0
                     and n_tokens // total_frames in merged_counts)
    events_on = (uniform_video and K < total_frames
                 and compression_active(total_frames, cfg))

    minor = None
    sim = None
    pooled = mm_features
    if events_on:
        P = n_tokens // total_frames
        frames = mm_features.reshape(total_frames, P, -1)
        ts = jnp.asarray(timestamps, jnp.float32)
        km = kmeans_with_time(frames, ts, K, key, alpha=cc.kmeans_alpha,
                              max_iters=cc.kmeans_max_iters)
        key_idx, key_valid = select_event_keyframes(
            frames, km.centers, km.assignments, k=cc.keyframes_per_event)

        # host sync: assignments drive summary prompt text. K pads to
        # a pow-2 bucket (one compile per bucket, not per 15 frames of
        # stream growth); pad-row sims are sliced off.
        assignments_host = np.asarray(km.assignments)
        summary = build_summary_batch(
            tokenizer, assignments_host, np.asarray(timestamps), P, K,
            max_frames_per_event=cc.summary_max_frames_per_event,
            pad_events_to=1 << (K - 1).bit_length())
        sim = event_relevance(params, cfg, mm_features, summary,
                              np.asarray(question_ids, np.int32))[:K]
        unimportant = sim < cc.similarity_threshold
        minor = minor_frame_mask(km.assignments, unimportant, key_idx,
                                 key_valid, total_frames)
        pooled = pool_minor_frames(mm_features, minor, P)
    # pixel-diff with no event selection: no minor frames, mask still
    # drops static-scene tokens (the reference's always-on half)
    minor_for_mask = (minor if minor is not None
                      else jnp.zeros((total_frames,), jnp.bool_))

    # per-item keep masks over merged tokens
    keeps: List[jax.Array] = []
    row_offset = 0
    frame_offset = 0
    for (t, gh, gw), ms, modal in zip(grid_sizes, merge_sizes, modals):
        t, gh, gw, ms = int(t), int(gh), int(gw), int(ms)
        rows = t * gh * gw
        merged = (gh // ms) * (gw // ms)
        item_pv = jax.lax.dynamic_slice_in_dim(
            pixel_values, row_offset, rows, axis=0)
        if modal == "video" and t > 1:
            item_minor = jax.lax.dynamic_slice_in_dim(
                minor_for_mask, frame_offset, t, axis=0)
            mask = pixel_diff_keep_mask(
                item_pv, t, merged, item_minor,
                threshold=cc.pixel_diff_threshold,
                min_tokens=cc.min_tokens_per_frame,
                image_std=tuple(cfg.vision.image_std),
                rescale_factor=cfg.vision.rescale_factor)
            keeps.append(mask.reshape(-1))
            frame_offset += t
        else:
            keeps.append(jnp.ones((t * merged,), jnp.bool_))
            frame_offset += t
        row_offset += rows
    keep = jnp.concatenate(keeps) if keeps else jnp.ones((0,), jnp.bool_)
    return VisualCompressionResult(keep, pooled, minor, sim)
