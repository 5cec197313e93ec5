"""Streaming session: cross-turn KV reuse (SURVEY.md §7 design delta 2).

The reference re-processes the ENTIRE conversation every turn — video
re-decoded, every frame re-encoded, full prompt re-prefilled
(answer_generate.py:102-151; no KV survives a turn). This module is the
TPU-native replacement: a per-session position-tagged KV cache where

* **ingest** (``append_stream_segment``) happens once per video segment,
  off the question critical path: frames are encoded, pixel-diff
  compressed, wrapped in ``stream``-role template text and prefilled
  into the cache; per-event summaries (C7's question-independent half)
  are computed here and their pooled representations stored;
* **ask** runs only the question-dependent work: the C8 selector over
  the *text* history, cosine similarity of stored event reps vs the
  question, then ONE prefill of the question tokens and the decode loop
  — history tokens keep their cache slots.

History retrieval does not re-tokenize: dropping an unselected QA turn
is a per-turn **visibility mask** over its slot range (qwen2_forward's
``kv_allowed``), so the next turn can reselect it. Event pruning uses
**shadow pooled slots** for exact parity with the reference's
mean-pool-to-patch-0 compression (cogreasoner_chat.py:434-447): exact
pooling is impossible retroactively on cached KV, so each ingest ALSO
prefills one extra token per frame whose input embedding is the mean of
that frame's merged patch features — the very value
``pool_minor_frames`` splices in the engine path. Shadow slots are
invisible by default (to asks AND to later ingests); when an event
scores below the similarity threshold, its non-keyframe frames flip to
shadow-only visibility (pooled token + timestamp text), keyframes stay
full — token-for-token the reference's compressed layout.

Semantics deltas vs the parity engine (runtime/engine.py), by design:
kept tokens retain their original absolute RoPE positions (masked turns
leave position gaps), and cached history K/V were computed attending to
the full prefix at their time. Both follow the streaming-LLM KV-reuse
model rather than the reference's rewrite-and-reprefill.
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig
from ..models import cogreasoner, qwen2
from ..models.qwen2 import KVCache, init_kv_cache
from .generate import (decode_new_tokens, generate_tokens,
                       generate_tokens_lookahead)
from .history import parse_selection
from .retrieval import Selector

SYSTEM_PROMPT = (
    "You are a helpful assistant watching a live video stream and "
    "answering the user's questions about it.")


@functools.partial(jax.jit, donate_argnums=(0,))
def _compact_solo_device(cache, gidx, valid, n_new):
    """Solo-session compaction as ONE donated jitted program: the
    donated old cache frees buffer-by-buffer as the gathers consume
    them (the eager jnp.take form held the full old cache across three
    dispatches while allocating the full new one — ~2x cache HBM peak
    at exactly the moment eviction runs on a loaded chip, plus 3+
    tunnel round trips)."""
    k = jnp.take(cache.k, gidx, axis=2)
    v = jnp.take(cache.v, gidx, axis=2)
    pos = jnp.where(valid[None], jnp.take(cache.pos, gidx, axis=1), -1)
    return KVCache(k, v, pos.astype(jnp.int32), n_new)


@functools.partial(jax.jit, static_argnames=("row",), donate_argnums=(0,))
def _compact_row_device(cache, gidx, valid, row):
    """Pooled-session compaction: move row ``row``'s surviving slots to
    the front IN PLACE on the shared pool cache (donated — no full-pool
    copy materializes)."""
    k_row = jnp.take(cache.k[:, row], gidx, axis=1)
    v_row = jnp.take(cache.v[:, row], gidx, axis=1)
    pos_row = jnp.where(valid, jnp.take(cache.pos[row], gidx), -1)
    return KVCache(cache.k.at[:, row].set(k_row),
                   cache.v.at[:, row].set(v_row),
                   cache.pos.at[row].set(pos_row.astype(jnp.int32)),
                   cache.write_index)


@functools.partial(jax.jit, static_argnames=("cfg", "t", "merged"),
                   donate_argnums=(2,))   # cache updates in place
def _ingest_device_step(text_params, adapters, cache, mm, ids_pad,
                        img_pad, rows_pad, shadow_idx, positions,
                        kv_allowed, frame_rows_idx, cfg, t, merged,
                        write_slots=None, cache_rows=None):
    """One fused device program per segment ingest: embed the template
    ids, splice the kept visual rows (scratch-row scatter), scatter the
    per-frame pooled SHADOW embeddings (exact ``pool_minor_frames``
    values, ref :434-447), prefill the cache, and produce the per-frame
    features/rows the event machinery needs — a single dispatch instead
    of ~6 (each eager op costs a round trip on the remote-compile
    tunnel). ``kv_allowed`` hides previous segments' shadow slots from
    this prefill (pooled duplicates must never leak into full-res
    attention)."""
    emb = qwen2.embed(text_params, ids_pad)
    emb = jnp.concatenate([emb, jnp.zeros((1, emb.shape[1]), emb.dtype)])
    emb = emb.at[img_pad].set(mm[rows_pad].astype(emb.dtype))
    # pooled-in-mm-dtype, exactly what the engine path splices for a
    # minor frame's surviving token
    pooled = jnp.mean(mm[: t * merged].reshape(t, merged, -1), axis=1)
    emb = emb.at[shadow_idx].set(pooled.astype(emb.dtype))
    emb = emb[:-1]
    _, cache2 = qwen2.qwen2_forward(
        text_params, emb[None], positions[None], cfg, cache=cache,
        adapters=adapters, kv_allowed=kv_allowed,
        write_slots=write_slots, cache_rows=cache_rows)
    frame_feats = pooled.astype(jnp.float32)
    frame_rows_all = mm[frame_rows_idx.reshape(-1)].reshape(
        t, merged, -1)
    return cache2, frame_feats, frame_rows_all


@functools.partial(jax.jit, static_argnames=("cfg", "t", "merged"),
                   donate_argnums=(2,))   # cache updates in place
def _ingest_batch_device_step(text_params, adapters, cache, mm, ids_pad,
                              img_pad, rows_pad, shadow_idx, positions,
                              kv_allowed, frame_rows_idx, write_slots,
                              cache_rows, cfg, t, merged):
    """Batched variant of ``_ingest_device_step``: B pool rows ingest
    one segment each in ONE device program (runtime/pool.ingest_batch).
    ``mm`` is the shared feature table from one batched vision encode;
    row i's features occupy rows [i*t*merged, (i+1)*t*merged)."""
    B = ids_pad.shape[0]
    emb = qwen2.embed(text_params, ids_pad)                      # [B,Sp,H]
    emb = jnp.concatenate(
        [emb, jnp.zeros((B, 1, emb.shape[-1]), emb.dtype)], axis=1)
    rows = jnp.arange(B)[:, None]
    emb = emb.at[rows, img_pad].set(mm[rows_pad].astype(emb.dtype))
    pooled = jnp.mean(mm[: B * t * merged].reshape(B, t, merged, -1),
                      axis=2)
    emb = emb.at[rows, shadow_idx].set(pooled.astype(emb.dtype))
    emb = emb[:, :-1]
    _, cache2 = qwen2.qwen2_forward(
        text_params, emb, positions, cfg, cache=cache,
        adapters=adapters, kv_allowed=kv_allowed,
        write_slots=write_slots, cache_rows=cache_rows)
    frame_rows_all = mm[frame_rows_idx.reshape(-1)].reshape(
        B, t, merged, -1)
    return cache2, pooled.astype(jnp.float32), frame_rows_all


@functools.partial(jax.jit, static_argnames=("cfg",))
def _event_summary_batch_device(text_params, ids_pad, img_pad, sel_pad,
                                feats, pos, cfg):
    """Jitted batched event-summary forward: K events' prompts embed +
    splice + decode + masked-mean in ONE dispatch (the reference runs K
    sequential forwards, cogreasoner_chat.py:303-316). ``feats`` is
    [K, F, H] per-event feature rows; ``sel_pad`` indexes into each
    event's own rows; ``img_pad`` pads point at the scratch row L."""
    K = ids_pad.shape[0]
    emb = qwen2.embed(text_params, ids_pad)                  # [K, L, H]
    emb = jnp.concatenate(
        [emb, jnp.zeros((K, 1, emb.shape[-1]), emb.dtype)], axis=1)
    rows = jnp.arange(K)[:, None]
    emb = emb.at[rows, img_pad].set(
        feats[rows, sel_pad].astype(emb.dtype))
    emb = emb[:, :-1]
    hidden, _ = qwen2.qwen2_forward(text_params, emb, pos, cfg)
    valid = (pos >= 0)[..., None].astype(jnp.float32)
    return (jnp.sum(hidden.astype(jnp.float32) * valid, axis=1)
            / jnp.maximum(valid.sum(axis=1), 1.0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _question_rep_device(text_params, ids, q_pos, cfg):
    """Jitted masked-mean hidden rep of the current question (the
    cosine query of C7's event pruning). Eagerly this forward retraced
    the whole scan per ask (~0.3 s host-side at demo scale)."""
    h, _ = qwen2.qwen2_forward(
        text_params, qwen2.embed(text_params, ids)[None], q_pos, cfg)
    valid = (q_pos[0] >= 0)[:, None].astype(jnp.float32)
    return (jnp.sum(h[0].astype(jnp.float32) * valid, axis=0)
            / jnp.maximum(valid.sum(), 1.0))


def flush_event_reps(sessions) -> None:
    """Compute deferred event-summary representations for every pending
    event across ``sessions`` in ONE batched forward per feature shape
    (events from one pool tick share shapes in steady state). All
    sessions must share params/config/tokenizer (true inside a pool)."""
    work = []   # (session, event, pack)
    for sess in sessions:
        for ev, frames in sess._rep_pending:
            work.append((sess, ev, sess._event_summary_pack(frames)))
    if not work:
        return
    groups: Dict[Tuple[int, ...], List] = {}
    for item in work:
        # key on the FULL per-frame row-count tuple: an event spanning a
        # grid change has mixed per-frame shapes, and two events with
        # equal frame counts but different totals must not stack
        key = tuple(r.shape[0] for r in item[2]["rows"])
        groups.setdefault(key, []).append(item)
    for items in groups.values():
        sess0 = items[0][0]
        K_real = len(items)
        # pow-2 bucket on the batch dim: a pool flushes 1..n_rows events
        # per tick, and every distinct K would otherwise be a fresh
        # remote compile. Pad rows carry one real token (pos 0) so the
        # forward stays NaN-free; their reps are discarded.
        K = 1 << (K_real - 1).bit_length()
        L = StreamingSession._bucket(
            max(len(it[2]["ids"]) for it in items), 256)
        n_img_p = StreamingSession._bucket(
            max(max(len(it[2]["img"]) for it in items), 1), 128)
        ids_pad = np.zeros((K, L), np.int32)
        pos = np.full((K, L), -1, np.int32)
        pos[K_real:, 0] = 0
        img_pad = np.full((K, n_img_p), L, np.int64)   # scratch row
        sel_pad = np.zeros((K, n_img_p), np.int64)
        feats = []
        for i, (_, _, p) in enumerate(items):
            n = len(p["ids"])
            ids_pad[i, :n] = p["ids"]
            pos[i, :n] = np.arange(n)
            img_pad[i, :len(p["img"])] = p["img"]
            sel_pad[i, :len(p["sel"])] = p["sel"]
            feats.append(jnp.concatenate(p["rows"], axis=0))
        for _ in range(K - K_real):
            feats.append(jnp.zeros_like(feats[0]))
        reps = _event_summary_batch_device(
            sess0.params["text"], jnp.asarray(ids_pad),
            jnp.asarray(img_pad), jnp.asarray(sel_pad),
            jnp.stack(feats), jnp.asarray(pos), sess0.cfg.text)
        for i, (_, ev, _) in enumerate(items):
            ev.rep = reps[i]
    # clear pending only after every rep is assigned — a transient
    # dispatch failure (remote-compile hiccup) leaves the work queued
    # and the flush retryable instead of stranding rep=None events
    for sess in sessions:
        sess._rep_pending = []


@dataclass
class SlotRange:
    kind: str        # "system" | "stream" | "shadow" | "question" | "answer"
    start: int
    end: int                  # exclusive
    turn: int = -1            # QA turn index for question/answer ranges


@dataclass
class PendingFrame:
    """An ingested frame awaiting its event window to close."""
    frame_id: int
    timestamp: float
    feat: np.ndarray          # [H] pooled feature (event machinery)
    img_slots: np.ndarray     # cache slots of this frame's <image> tokens
    shadow_slot: int          # cache slot of the pooled shadow token
    frame_rows: np.ndarray    # [merged, H] fixed-shape feature rows
    n_kept: int               # how many of frame_rows are real


@dataclass
class EventRecord:
    frame_ids: List[int]
    rep: Optional[jax.Array] = None        # [H] pooled summary representation
    frame_slots: List[np.ndarray] = field(default_factory=list)
    shadow_slots: List[int] = field(default_factory=list)  # one per frame
    keyframe_mask: List[bool] = field(default_factory=list)  # one per frame
    # host mirror of ``rep``, filled lazily at first ask — fetching each
    # event's rep per ask costs one ~30 ms tunnel round trip apiece
    rep_host: Optional[np.ndarray] = None


class StreamingSession:
    """One dialogue stream over one growing video. Batch size 1."""

    def __init__(
        self,
        params: Dict,
        cfg: CogReasonerConfig,
        tokenizer,
        adapters: Optional[Dict[str, Dict]] = None,
        max_len: int = 16384,
        use_pallas: bool = False,
        rng_seed: int = 0,
        system_prompt: str = SYSTEM_PROMPT,
        summary_forward: bool = True,
        kv_dtype=None,
        pool=None,
        row: Optional[int] = None,
        mesh=None,
        encoder_int8: bool = False,
    ):
        # ``mesh``: tensor-parallel serving. Params are placed under the
        # Megatron-style specs (parallel/sharding.py) and the KV cache
        # under kv_cache_specs; every jitted step then runs SPMD via
        # GSPMD propagation — no session code changes, XLA inserts the
        # collectives (one psum per attn/MLP block) over ICI. This is
        # how 7B bf16 serves on v5e-8 (16 GB/chip): TP=8 holds 1/8th of
        # the weights per chip and cuts the weights-bound decode time
        # near-linearly. Use a data=1 mesh for solo sessions.
        # ``encoder_int8``: W8A8 serving mode for the vision tower
        # (models/vision_encoder.quantize_vision_w8a8) — ~1.2x ingest
        # encode on v5e, feature cosine vs bf16 >0.995. Quantize BEFORE
        # sharding so the int8 leaves land under adapted specs.
        from ..parallel.sharding import ensure_cogreasoner_sharded

        if encoder_int8 and not isinstance(
                params["vision"]["layers"][0]["attn"]["q"]["kernel"], dict):
            from ..models.vision_encoder import quantize_vision_w8a8

            params = {**params,
                      "vision": quantize_vision_w8a8(params["vision"])}
        params = ensure_cogreasoner_sharded(params, cfg, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.adapters = adapters or {}
        self.use_pallas = use_pallas
        self.max_len = max_len
        # per-event summary LM forward at ingest (True = C7-faithful
        # reps in hidden space; False = cheap feature-space centroids)
        self.summary_forward = summary_forward
        # ``pool``/``row``: single-storage pool binding — the session
        # owns NO cache tensors; every device op addresses row ``row``
        # of the pool's shared cache via cache_rows/write_slots
        # (runtime/pool.py). Solo sessions own a 1-row cache.
        self._pool, self._row = pool, row
        if pool is None:
            # kv_dtype=jnp.float8_e4m3fn halves cache HBM traffic — the
            # lever for many-session long-context serving where cache
            # reads rival weight reads; every cast already rides the
            # existing .astype plumbing in models/qwen2.py
            self._own_cache = init_kv_cache(cfg.text, 1, max_len,
                                            dtype=kv_dtype)
            if mesh is not None:
                from ..parallel.sharding import place_kv_cache
                self._own_cache = place_kv_cache(self._own_cache,
                                                 cfg.text, mesh)
        else:
            assert row is not None and max_len == pool.max_len
            # clear any previous tenant's slots on this row
            pool.cache = pool.cache._replace(
                pos=pool.cache.pos.at[row].set(-1))
        self._wi = 0
        from ..utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self._key = jax.random.PRNGKey(rng_seed)
        # device scalar from the last lookahead ask (verify forwards
        # used); fetched lazily by stats consumers, never in the turn
        self.last_lookahead_steps = None
        # opt-in ingest stage decomposition (utils/profiling analogue
        # for the session): when True, append_stream_segment force-syncs
        # between phases and records wall seconds in last_ingest_times.
        # PROFILING ONLY — the syncs serialize phases the production
        # path leaves asynchronous.
        self.profile_stages = False
        self.last_ingest_times: Dict[str, float] = {}

        self.ranges: List[SlotRange] = []
        self.events: List[EventRecord] = []
        self.hist_qs: List[str] = []
        self.hist_as: List[str] = []
        self.next_pos = 0          # absolute RoPE position counter
        self.total_frames = 0
        self._pending_frames: List[PendingFrame] = []
        self._rep_pending: List[Tuple[EventRecord, List[PendingFrame]]] = []

        lang = self.adapters.get("language_module")
        self.selector = Selector(
            params["text"], cfg.text, tokenizer,
            adapters=[(lang.get("text", lang), jnp.float32(1.0))]
            if lang else None)

        self._system_prompt = system_prompt
        ids = tokenizer.encode(
            f"<|im_start|>system\n{system_prompt}<|im_end|>\n")
        self._prefill_text(np.asarray(ids, np.int32), kind="system")

    # ------------------------------------------------------------------
    # cache plumbing
    # ------------------------------------------------------------------

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def cache(self) -> KVCache:
        """Solo: the session-owned 1-row cache. Pooled: the SHARED pool
        cache (assignments write it back — single storage, no mirrors)."""
        return self._own_cache if self._pool is None else self._pool.cache

    @cache.setter
    def cache(self, c: KVCache) -> None:
        if self._pool is None:
            self._own_cache = c
        else:
            self._pool.cache = c

    def _cache_rows(self):
        return None if self._pool is None \
            else jnp.asarray([self._row], jnp.int32)

    def _row_slots(self, start: int, n_real: int, n_total: int):
        """Pooled write_slots for a prefill at ``start``: real tokens
        pack tightly, padding slots drop (never written)."""
        if self._pool is None:
            return None
        slots = np.full((1, n_total), self.max_len, np.int64)
        slots[0, :n_real] = start + np.arange(n_real)
        return jnp.asarray(slots)

    @property
    def write_index(self) -> int:
        """Host-side mirror of the cache fill level. Every slot count is
        known analytically on the host, so reading the device scalar
        (a ~ms round trip per access on the remote-compile tunnel)
        would be pure waste."""
        return self._wi

    def _full_adapters(self):
        full = self.adapters.get("full_module")
        if full is None:
            return None
        return [(full.get("text", full), jnp.float32(1.0))]

    @staticmethod
    def _bucket(n: int, step: int = 32) -> int:
        return max(step, -(-n // step) * step)

    @staticmethod
    def kv_window_for(needed: int, max_len: int) -> Optional[int]:
        """Static decode-read window (generate_tokens kv_window): every
        decode step otherwise streams the full [max_len] K/V through
        HBM even when the cache is nearly empty. Bucketed to 1024 so
        windows hit the jit cache; at ≤16k caches only applied when it
        halves reads (unchanged behavior). Deep caches (32k sessions)
        additionally use coarser 4096-step windows past 16k depth —
        there even a non-halving window saves GBs of cache read per
        step, and the coarse step bounds the compile count as the
        stream grows."""
        step = 1024 if needed <= 16384 else 4096
        W = StreamingSession._bucket(needed, step)
        if 2 * W <= max_len:
            return W
        if max_len > 16384 and W < max_len:
            return W
        return None

    def _kv_window(self, needed: int) -> Optional[int]:
        return self.kv_window_for(needed, self.max_len)

    # No single jitted program carries a sequence longer than this: the
    # axon backend deterministically fails to compile a 32768-token
    # program (STATUS.md round 4), and the position-tagged cache makes
    # chunked prefill EXACT — chunk N+1 attends back to chunk N through
    # the cache (the 2x16k composition bench_longctx32_7b measured).
    # 32k-window sessions ride this automatically.
    max_prefill_chunk: int = 16384

    def _prefill_embeds(self, embeds: jax.Array, kind: str,
                        turn: int = -1,
                        real_len: Optional[int] = None) -> SlotRange:
        """Write S tokens into the cache. Lengths are bucketed to
        multiples of 32 so repeated ingests/asks hit the jit cache;
        padding slots carry position -1 (invisible) and are skipped by
        the recorded SlotRange. Pass ``real_len`` when ``embeds`` is
        already bucket-padded. Sequences longer than
        ``max_prefill_chunk`` split into full chunk programs plus one
        bucketed tail (full chunks are bucket multiples, so the real
        tokens stay slot-contiguous and ONE SlotRange covers them)."""
        S = real_len if real_len is not None else embeds.shape[0]
        if S > self.max_prefill_chunk:
            if real_len is not None:
                raise ValueError(
                    "pre-padded prefill exceeds max_prefill_chunk")
            start = self.write_index
            off = 0
            while off < S:
                n = min(self.max_prefill_chunk, S - off)
                self._prefill_one(embeds[off:off + n], n)
                off += n
            r = SlotRange(kind, start, start + S, turn)
            self.ranges.append(r)
            return r
        start = self.write_index
        self._prefill_one(embeds, S, real_len is not None)
        r = SlotRange(kind, start, start + S, turn)
        self.ranges.append(r)
        return r

    def _prefill_one(self, embeds: jax.Array, S: int,
                     pre_padded: bool = False) -> None:
        """One prefill program: bucket, pad, forward, advance mirrors."""
        Sp = embeds.shape[0] if pre_padded else self._bucket(
            embeds.shape[0])
        start = self.write_index
        if start + Sp > self.max_len:
            raise RuntimeError(
                f"session cache overflow: {start}+{Sp} > {self.max_len}")
        if Sp > embeds.shape[0]:
            embeds = jnp.concatenate(
                [embeds, jnp.zeros((Sp - embeds.shape[0],
                                    embeds.shape[1]), embeds.dtype)])
        positions = jnp.concatenate([
            jnp.arange(self.next_pos, self.next_pos + S, dtype=jnp.int32),
            jnp.full((Sp - S,), -1, jnp.int32)])[None]
        _, self.cache = qwen2.qwen2_forward(
            self.params["text"], embeds[None], positions, self.cfg.text,
            cache=self.cache, adapters=self._full_adapters(),
            write_slots=self._row_slots(start, S, Sp),
            cache_rows=self._cache_rows())
        self.next_pos += S
        # pooled rows pack tightly (pad slots are dropped, not written);
        # solo keeps the bucketed stride so the device write_index slice
        # path stays aligned
        self._wi = start + (S if self._pool is not None else Sp)

    def _prefill_text(self, ids: np.ndarray, kind: str,
                      turn: int = -1) -> SlotRange:
        emb = qwen2.embed(self.params["text"], jnp.asarray(ids))
        return self._prefill_embeds(emb, kind, turn)

    # ------------------------------------------------------------------
    # ingest
    # ------------------------------------------------------------------

    def _segment_plan(
        self,
        keep_host: np.ndarray,        # [t, merged] pixel-diff keep mask
        t: int,
        merged: int,
        timestamps: Sequence[float],
    ) -> Dict:
        """Host half of segment ingest: template ids + scatter/gather
        index plan (bucket-agnostic — packing happens in _pack_plan so
        a batch of segments can share one bucket)."""
        img_id = self.tok.image_token_id
        all_ids: List[np.ndarray] = []
        frame_img_offsets: List[np.ndarray] = []   # img positions per frame
        feat_rows: List[np.ndarray] = []           # flat rows into mm
        offset = 0
        for fi in range(t):
            kept = np.nonzero(keep_host[fi])[0]
            stamp = f"Time {float(timestamps[fi]):.1f}s:"
            text = (f"<|im_start|>stream\n{stamp}"
                    + "<image>" * len(kept) + "<|im_end|>\n")
            ids = np.asarray(self.tok.encode(text), np.int32)
            img_pos = np.nonzero(ids == img_id)[0]
            all_ids.append(ids)
            frame_img_offsets.append(offset + img_pos)
            feat_rows.append(fi * merged + kept)
            offset += len(ids)

        seg_ids = np.concatenate(all_ids)
        # fixed-shape per-frame feature gather ([merged, H] regardless of
        # kept count) so event summaries never see per-count shapes
        frame_rows_idx = np.zeros((t, merged), np.int64)
        kept_counts = np.zeros((t,), np.int32)
        for fi in range(t):
            k = feat_rows[fi]
            frame_rows_idx[fi, :len(k)] = k
            kept_counts[fi] = len(k)
        return dict(
            t=t, merged=merged, n=len(seg_ids), seg_ids=seg_ids,
            frame_img_offsets=frame_img_offsets,
            flat_img=(np.concatenate(frame_img_offsets)
                      if frame_img_offsets else np.zeros((0,), np.int64)),
            flat_rows=(np.concatenate(feat_rows)
                       if feat_rows else np.zeros((0,), np.int64)),
            frame_rows_idx=frame_rows_idx, kept_counts=kept_counts,
            timestamps=[float(x) for x in timestamps])

    def _pack_plan(self, plan: Dict, Sp: int, n_img_p: int,
                   row_offset: int = 0) -> Dict:
        """Pad a plan's arrays to the given buckets. Layout:
        [segment (n)][shadow pooled tokens (t)][pad] — one shadow token
        per frame, consecutive RoPE positions right after the segment.
        ``row_offset`` shifts feature-row indices into a batch-global
        mm table. Pads: ids → 0, scatter targets → scratch row Sp,
        positions → -1."""
        n, t = plan["n"], plan["t"]
        ids_pad = np.zeros((Sp,), np.int32)
        ids_pad[:n] = plan["seg_ids"]
        shadow_idx = n + np.arange(t)
        n_img = len(plan["flat_img"])
        img_pad = np.full((n_img_p,), Sp, np.int64)     # scratch row
        img_pad[:n_img] = plan["flat_img"]
        rows_pad = np.full((n_img_p,), row_offset, np.int64)
        rows_pad[:n_img] = plan["flat_rows"] + row_offset
        positions = np.concatenate([
            np.arange(self.next_pos, self.next_pos + n + t,
                      dtype=np.int32),
            np.full((Sp - n - t,), -1, np.int32)])
        return dict(ids_pad=ids_pad, img_pad=img_pad, rows_pad=rows_pad,
                    shadow_idx=shadow_idx, positions=positions,
                    frame_rows_idx=plan["frame_rows_idx"] + row_offset)

    def _commit_segment(self, plan: Dict, start: int, Sp: int,
                        frame_feats: np.ndarray,
                        frame_rows_all: np.ndarray) -> None:
        """Host bookkeeping after the device prefill: ranges, pending
        frames, event sealing."""
        n, t = plan["n"], plan["t"]
        self.next_pos += n + t
        self._wi = start + (n + t if self._pool is not None else Sp)
        r = SlotRange("stream", start, start + n)
        self.ranges.append(r)
        self.ranges.append(SlotRange("shadow", start + n, start + n + t))
        for fi in range(t):
            frame_id = self.total_frames
            self.total_frames += 1
            # only image-token slots participate in event pruning; the
            # "Time X.Xs:" text stays visible (ref drops <image> ids
            # only, cogreasoner_chat.py:449-476)
            self._pending_frames.append(PendingFrame(
                frame_id, plan["timestamps"][fi], frame_feats[fi],
                r.start + plan["frame_img_offsets"][fi],
                start + n + fi,
                frame_rows_all[fi], int(plan["kept_counts"][fi])))
            if len(self._pending_frames) >= \
                    self.cfg.compression.frames_per_event:
                self._close_event()

    def ingest_keep_mask(self, pixel_values: np.ndarray,
                         grid_size: Tuple[int, int, int],
                         merge_size: int) -> np.ndarray:
        """The segment's pixel-diff keep mask, computable AHEAD of the
        ingest on any thread (pure host numpy): serving's
        preprocess-ahead worker calls this so the mask overlaps the
        previous chunk's device work instead of sitting on the ingest
        critical path (~60-240 ms per 16-frame chunk)."""
        t, gh, gw = (int(x) for x in grid_size)
        cc = self.cfg.compression
        merged = (gh // merge_size) * (gw // merge_size)
        return cogreasoner.pixel_diff_keep_mask_host(
            pixel_values, t, merged,
            minor=np.zeros((t,), bool),
            threshold=cc.pixel_diff_threshold,
            min_tokens=cc.min_tokens_per_frame,
            image_std=tuple(self.cfg.vision.image_std),
            rescale_factor=self.cfg.vision.rescale_factor)

    def append_stream_segment(
        self,
        pixel_values: np.ndarray,     # [t*gh*gw, C*ps*ps] patch rows
        grid_size: Tuple[int, int, int],
        merge_size: int,
        timestamps: Sequence[float],
        pixel_values_device=None,     # optional pre-uploaded copy
        keep_mask: Optional[np.ndarray] = None,  # precomputed mask
    ) -> None:
        """Encode + compress + prefill one video segment (stream role).

        ONE prefill per segment (per-frame prefills cost a fresh compile
        per unique kept-token count — ~1s each over the remote-compile
        tunnel): every frame's template ids concatenate, all kept visual
        rows splice in one gather, shapes bucket, one device dispatch."""
        t, gh, gw = (int(x) for x in grid_size)
        assert t == len(timestamps)
        cc = self.cfg.compression
        merged = (gh // merge_size) * (gw // merge_size)

        prof = self.profile_stages
        if prof:
            import time as _time
            tms: Dict[str, float] = {}
            tprev = _time.perf_counter()

        rows = t * gh * gw
        pad_rows = -(-rows // 1024) * 1024   # bucket the encode shape
        # pixel_values_device: serving's preprocess-ahead worker
        # device_puts the patch rows while the PREVIOUS chunk's device
        # work runs — over the axon tunnel the upload (~10-25 MB/s,
        # ~0.5 s for a 16-frame 252-token chunk) otherwise dominates
        # the ingest critical path ("encode" time that is really wire
        # time). The HOST array still feeds the pixel-diff mask below.
        mm = cogreasoner.encode_images(
            self.params,
            pixel_values if pixel_values_device is None
            else pixel_values_device,
            np.array([[t, gh, gw]]),
            np.array([merge_size]), self.cfg, use_pallas=self.use_pallas,
            pad_to=pad_rows)
        if prof:
            np.asarray(jax.device_get(mm[:1, :1]))   # sync the encode
            now = _time.perf_counter()
            tms["encode_s"], tprev = now - tprev, now
        # pixel-diff keep mask — question-independent, applied at
        # ingest; computed on HOST (the pixels are host-resident and the
        # packing plan blocks on the mask — the device form cost a
        # dispatch + fetch round trip on the ingest critical path).
        # Serving passes it precomputed (ingest_keep_mask on the
        # preprocess-ahead thread).
        keep = (keep_mask if keep_mask is not None
                else self.ingest_keep_mask(pixel_values,
                                           (t, gh, gw), merge_size))
        plan = self._segment_plan(keep, t, merged, timestamps)
        if prof:
            now = _time.perf_counter()
            tms["mask_plan_s"], tprev = now - tprev, now

        Sp = self._bucket(plan["n"] + t)
        n_img_p = self._bucket(max(len(plan["flat_img"]), 1), 128)
        self.evict_for(Sp)          # sliding-window room for the segment
        start = self.write_index
        if start + Sp > self.max_len:
            raise RuntimeError(
                f"session cache overflow: {start}+{Sp} > {self.max_len}")

        packed = self._pack_plan(plan, Sp, n_img_p)
        if prof:
            now = _time.perf_counter()
            tms["pack_s"], tprev = now - tprev, now
        self.cache, frame_feats_dev, frame_rows_all = _ingest_device_step(
            self.params["text"], self._full_adapters(), self.cache, mm,
            jnp.asarray(packed["ids_pad"]), jnp.asarray(packed["img_pad"]),
            jnp.asarray(packed["rows_pad"]),
            jnp.asarray(packed["shadow_idx"]),
            jnp.asarray(packed["positions"]),
            jnp.asarray(self._ingest_allowed())[None],
            jnp.asarray(packed["frame_rows_idx"]), self.cfg.text, t,
            merged,
            write_slots=self._row_slots(start, plan["n"] + t, Sp),
            cache_rows=self._cache_rows())
        frame_feats = np.asarray(frame_feats_dev)   # fetch (syncs prefill)
        if prof:
            now = _time.perf_counter()
            tms["prefill_fetch_s"], tprev = now - tprev, now
        self._commit_segment(plan, start, Sp, frame_feats, frame_rows_all)
        self._flush_event_reps()
        if prof:
            tms["commit_events_s"] = _time.perf_counter() - tprev
            self.last_ingest_times = tms

    def _ingest_allowed(self) -> np.ndarray:
        """Visibility for ingest prefills: everything except shadow
        slots (the pooled duplicates must never enter full-res stream
        attention; they exist only for pruned-event turns)."""
        allowed = np.ones((self.max_len,), bool)
        for r in self.ranges:
            if r.kind == "shadow":
                allowed[r.start:r.end] = False
        return allowed

    def _close_event(self) -> None:
        """Seal a frames_per_event window: pick keyframes and compute
        the event representation via the per-event summary LM forward
        (C7's question-independent half, cogreasoner_chat.py:303-316),
        amortized at ingest — off the question critical path."""
        frames = self._pending_frames
        self._pending_frames = []
        feats = np.stack([f.feat for f in frames])      # [n, H]
        center = feats.mean(axis=0)
        d = np.linalg.norm(feats - center, axis=1)
        kf = set(np.argsort(d)[:self.cfg.compression.keyframes_per_event]
                 .tolist())

        ev = EventRecord(frame_ids=[f.frame_id for f in frames])
        ev.frame_slots = [f.img_slots for f in frames]
        ev.shadow_slots = [f.shadow_slot for f in frames]
        ev.keyframe_mask = [i in kf for i in range(len(frames))]
        if self.summary_forward:
            # rep deferred: flush_event_reps batches every event sealed
            # by this ingest (and, for pool.ingest_batch, the whole
            # tick) into ONE summary forward
            self._rep_pending.append((ev, frames))
        else:
            ev.rep = jnp.asarray(center)
        self.events.append(ev)

    def _event_summary_pack(self, frames) -> Dict:
        """Host half of one event's summary prompt: ids + splice plan
        over the event's kept visual rows (splice semantics as
        models/cogreasoner.event_relevance)."""
        from ..models.cogreasoner import (
            SUMMARY_INSTRUCTION, SUMMARY_SYSTEM)

        parts = ["<|im_start|>system\n" + SUMMARY_SYSTEM + "<|im_end|>\n"
                 "<|im_start|>user\n"]
        rows = []          # fixed-shape [merged, H] per frame
        sel_idx = []       # row index (within concat) per <image> token
        for j, f in enumerate(frames):
            parts.append(f"Time {f.timestamp:.1f}s:" + "<image>" * f.n_kept
                         + ("," if j < len(frames) - 1 else ""))
            rows.append(f.frame_rows)
            sel_idx.append(j * f.frame_rows.shape[0] + np.arange(f.n_kept))
        parts.append("\n" + SUMMARY_INSTRUCTION + "<|im_end|>\n"
                     "<|im_start|>assistant")
        ids = np.asarray(self.tok.encode("".join(parts)), np.int32)
        img_positions = np.nonzero(ids == self.tok.image_token_id)[0]
        sel = np.concatenate(sel_idx) if sel_idx else np.zeros(0, np.int64)
        return dict(ids=ids, img=img_positions, sel=sel, rows=rows)

    def _flush_event_reps(self) -> None:
        flush_event_reps([self])

    def ask_stream(self, question: str, mode: str = "FCC",
                   max_new_tokens: int = 512, chunk: int = 16,
                   temperature: float = 0.0,
                   extra_eos_ids: tuple = ()):
        """Generator variant of ``ask``: yields text deltas as decode
        chunks complete. Each chunk is one jitted prefill+decode whose
        1-token "prompt" is the previous chunk's last sampled token —
        no recompute, the cache simply continues. Ends by yielding the
        final result dict (same shape as ``ask``)."""
        turn = len(self.hist_qs)
        question_ids = np.asarray(self.tok.encode(question), np.int32)
        prefetched = None
        if mode == "FCC" and self.hist_qs:
            prefetched = self._prefetch_question_rep(question_ids)
            selection = self.selector.select(
                question, self.hist_qs, self.hist_as,
                key=self._next_key())
            if_visual, sel_idx = parse_selection(selection)
        elif mode == "NC":
            selection, if_visual, sel_idx = "[yes]", True, []
        else:
            selection, if_visual = "[yes]", True
            sel_idx = list(range(turn))

        q_text = (f"<|im_start|>user\n{question}<|im_end|>\n"
                  f"<|im_start|>assistant\n")
        q_ids = np.asarray(self.tok.encode(q_text), np.int32)
        S = len(q_ids)
        Sp = self._bucket(S)
        self.evict_for(Sp + max_new_tokens)
        allowed = jnp.asarray(self._allowed_mask(
            if_visual, sel_idx, question_ids,
            prefetched=prefetched))[None]
        start = self.write_index
        if start + Sp + max_new_tokens > self.max_len:
            raise RuntimeError("session cache overflow")

        ids_pad = np.zeros((Sp,), np.int32)
        ids_pad[:S] = q_ids
        emb = qwen2.embed(self.params["text"], jnp.asarray(ids_pad))[None]
        positions = jnp.concatenate([
            jnp.arange(self.next_pos, self.next_pos + S, dtype=jnp.int32),
            jnp.full((Sp - S,), -1, jnp.int32)])[None]
        last_index = jnp.asarray([S - 1], jnp.int32)

        all_ids: List[int] = []
        emitted = ""
        produced = 0
        done = False
        wrote_any = False
        stride = S if self._pool is not None else Sp
        wi = start + stride
        write_slots = self._row_slots(start, S, Sp)
        kv_window = self._kv_window(start + Sp + max_new_tokens)
        next_pos = self.next_pos + S
        try:
            while produced < max_new_tokens and not done:
                n_chunk = min(chunk, max_new_tokens - produced)
                result = generate_tokens(
                    self.params["text"], emb, positions, last_index,
                    self.cache, self._next_key(), self.cfg.text, n_chunk,
                    self.tok.eos_token_id, temperature=temperature,
                    adapters=self._full_adapters(), kv_allowed=allowed,
                    write_slots=write_slots,
                    cache_rows=self._cache_rows(),
                    kv_window=kv_window,
                    extra_eos_ids=tuple(extra_eos_ids) or None)
                self.cache = result.cache
                wrote_any = True
                toks = np.asarray(result.tokens)[0]
                num = int(np.asarray(result.num_tokens)[0])
                chunk_ids = toks[:num].tolist()
                done = (bool(chunk_ids)
                        and chunk_ids[-1] == self.tok.eos_token_id) \
                    or num < n_chunk
                # continuation feeds the last sampled token as next prompt
                if chunk_ids and chunk_ids[-1] == self.tok.eos_token_id:
                    chunk_ids = chunk_ids[:-1]
                all_ids.extend(chunk_ids)
                produced += num
                wi += max(0, num - 1)
                text_so_far = self.tok.decode(all_ids,
                                              skip_special_tokens=True)
                delta = text_so_far[len(emitted):]
                emitted = text_so_far
                if delta:
                    yield delta
                if not done and produced < max_new_tokens:
                    last_tok = int(toks[num - 1])
                    emb = qwen2.embed(
                        self.params["text"],
                        jnp.asarray([[last_tok]], jnp.int32))
                    positions = jnp.asarray(
                        [[next_pos + produced - 1]], jnp.int32)
                    last_index = jnp.asarray([0], jnp.int32)
                    # the continuation's 1-token prompt occupies the
                    # next slot (only counted when it actually runs)
                    write_slots = self._row_slots(wi, 1, 1)
                    wi += 1
        finally:
            # commit bookkeeping even when the consumer abandons the
            # generator mid-stream (e.g. HTTP client disconnect): the
            # device cache already holds whatever was generated, so the
            # host state must reflect it. If the very first chunk never
            # wrote (exception before any decode), nothing to commit.
            if wrote_any:
                self._wi = wi
                self.ranges.append(SlotRange("question", start,
                                             start + S, turn))
                self.ranges.append(SlotRange("answer", start + stride,
                                             self._wi, turn))
                # positions advance by FED tokens only — the final
                # sampled token (eos or cap) never re-enters the cache,
                # exactly as ask()'s n_fed = num - 1; counting it here
                # would open a 1-position RoPE gap per streamed turn
                self.next_pos = next_pos + max(0, produced - 1)
                self.hist_qs.append(question)
                self.hist_as.append(emitted)
        yield {"text": emitted, "selection": selection,
               "if_visual": if_visual, "turn": turn,
               "cache_tokens": self._wi}

    def reset(self) -> None:
        """Start a fresh dialogue stream reusing the allocated cache
        buffers (position row cleared; K/V bytes become unreachable)."""
        if self._pool is None:
            self.cache = self.cache._replace(
                pos=jnp.full_like(self.cache.pos, -1),
                write_index=jnp.zeros((), jnp.int32))
        else:
            self.cache = self.cache._replace(
                pos=self.cache.pos.at[self._row].set(-1))
        self._wi = 0
        self.ranges = []
        self.events = []
        self.hist_qs, self.hist_as = [], []
        self.next_pos = 0
        self.total_frames = 0
        self._pending_frames = []
        self._rep_pending = []
        ids = self.tok.encode(
            f"<|im_start|>system\n{self._system_prompt}<|im_end|>\n")
        self._prefill_text(np.asarray(ids, np.int32), kind="system")

    # ------------------------------------------------------------------
    # compaction — long-stream endurance
    # ------------------------------------------------------------------

    def compact(self, keep_range) -> int:
        """Physically compact the cache to the ranges ``keep_range``
        selects (whole-range granularity): one gather per K/V stack
        moves surviving slots to the front, reclaiming dropped turns,
        evicted segments AND bucket-padding waste. Absolute RoPE
        positions are preserved (only slots move), so attention
        semantics are unchanged. Returns the new live-slot count."""
        kept = [r for r in self.ranges if r.kind == "system"
                or keep_range(r)]
        perm = (np.concatenate([np.arange(r.start, r.end) for r in kept])
                if kept else np.zeros((0,), np.int64))
        n_new = len(perm)
        old2new = np.full((self.max_len,), -1, np.int64)
        old2new[perm] = np.arange(n_new)

        idx = np.zeros((self.max_len,), np.int64)
        idx[:n_new] = perm
        gidx = jnp.asarray(idx)
        valid = jnp.asarray(np.arange(self.max_len) < n_new)
        if self._pool is None:
            self.cache = _compact_solo_device(
                self.cache, gidx, valid, jnp.asarray(n_new, jnp.int32))
        else:
            self.cache = _compact_row_device(self.cache, gidx, valid,
                                             self._row)
        self._wi = n_new

        new_ranges: List[SlotRange] = []
        off = 0
        for r in kept:
            n = r.end - r.start
            new_ranges.append(SlotRange(r.kind, off, off + n, r.turn))
            off += n
        self.ranges = new_ranges

        remapped_events: List[EventRecord] = []
        for ev in self.events:
            new_fs = [old2new[np.asarray(s)] for s in ev.frame_slots]
            new_sh = [int(old2new[s]) for s in ev.shadow_slots]
            if (any((a < 0).any() for a in new_fs if a.size)
                    or any(s < 0 for s in new_sh)):
                continue   # its segment was evicted
            ev.frame_slots = new_fs
            ev.shadow_slots = new_sh
            remapped_events.append(ev)
        self.events = remapped_events

        # pending (not-yet-sealed) frames also carry absolute slot ids
        remapped_pending = []
        for f in self._pending_frames:
            new_slots = old2new[np.asarray(f.img_slots)]
            new_shadow = int(old2new[f.shadow_slot])
            if (new_slots.size and (new_slots < 0).any()) or new_shadow < 0:
                continue   # its segment was evicted
            f.img_slots = new_slots
            f.shadow_slot = new_shadow
            remapped_pending.append(f)
        self._pending_frames = remapped_pending
        return n_new

    def evict_for(self, needed: int) -> bool:
        """Make room for ``needed`` new slots by evicting the OLDEST
        stream segments and their associated QA turns (sliding-window
        policy; the system prompt always survives). Returns True when
        a compaction actually ran."""
        if self.write_index + needed <= self.max_len:
            return False
        live = [r for r in self.ranges if r.kind != "system"]
        sizes = {id(r): r.end - r.start for r in live}
        must_free = self.write_index + needed - self.max_len
        # also reclaim pad waste: live size vs write_index difference
        dropped: set = set()
        freed = self.write_index - sum(
            r.end - r.start for r in self.ranges)
        for i, r in enumerate(live):       # oldest-first (list order)
            if freed >= must_free:
                break
            if id(r) in dropped:
                continue
            dropped.add(id(r))
            freed += sizes[id(r)]
            # a stream segment and its shadow range live or die together
            if (r.kind == "stream" and i + 1 < len(live)
                    and live[i + 1].kind == "shadow"):
                nxt = live[i + 1]
                dropped.add(id(nxt))
                freed += sizes[id(nxt)]
            # a QA turn is atomic: evicting the question without its
            # answer would let a later selection surface an orphaned
            # answer with no preceding user turn (the reference drops
            # QA pairs whole)
            if r.kind == "question":
                for other in live[i + 1:]:
                    if other.kind == "answer" and other.turn == r.turn:
                        if id(other) not in dropped:
                            dropped.add(id(other))
                            freed += sizes[id(other)]
                        break
        self.compact(lambda r: id(r) not in dropped)
        return True

    # ------------------------------------------------------------------
    # ask
    # ------------------------------------------------------------------

    def _question_rep(self, question_ids: np.ndarray) -> jax.Array:
        n = len(question_ids)
        Sp = self._bucket(n)   # bucketed → one compile per length bucket
        ids = np.zeros((Sp,), np.int32)
        ids[:n] = question_ids
        q_pos = np.concatenate([
            np.arange(n, dtype=np.int32),
            np.full((Sp - n,), -1, np.int32)])[None]
        return _question_rep_device(self.params["text"], jnp.asarray(ids),
                                    jnp.asarray(q_pos), self.cfg.text)

    def _prefetch_question_rep(self, question_ids: np.ndarray):
        """Dispatch the question-rep forward and the batched
        uncached-event-rep fetch BEFORE the selector's constrained
        decode, and start their device→host copies asynchronously —
        both then ride under the selector's mandatory round trip
        instead of adding their own (~30 ms each over the axon tunnel).
        Returns (q_dev, uncached_events, rep_stack) for _allowed_mask
        to consume, or None when event pruning can't apply. Safe across
        the evict_for between dispatch and use: reps are slot-
        independent features, and rep_host writes for since-evicted
        events are harmless."""
        cc = self.cfg.compression
        if not (self.events
                and len(self.events) >= cc.min_events_for_compression):
            return None
        q_dev = self._question_rep(question_ids)
        uncached = [e for e in self.events if e.rep_host is None]
        stack = jnp.stack([e.rep for e in uncached]) if uncached else None
        for a in (q_dev, stack):
            if a is not None:
                try:
                    a.copy_to_host_async()
                except Exception:   # backend without async host copies
                    pass
        return q_dev, uncached, stack

    def _allowed_mask(self, if_visual: bool,
                      selected_turns: Sequence[int],
                      question_ids: np.ndarray,
                      prefetched=None) -> np.ndarray:
        allowed = np.zeros((self.max_len,), bool)
        allowed[self.write_index:] = True               # future slots
        sel = set(selected_turns)
        for r in self.ranges:
            if r.kind == "system":
                allowed[r.start:r.end] = True
            elif r.kind == "stream":
                allowed[r.start:r.end] = if_visual
            elif r.kind == "shadow":
                allowed[r.start:r.end] = False   # pooled duplicates
            elif r.kind in ("question", "answer") and r.turn in sel:
                allowed[r.start:r.end] = True

        cc = self.cfg.compression
        if (if_visual and self.events
                and len(self.events) >= cc.min_events_for_compression):
            # question-aware event pruning on cached slots (C7 d/e):
            # events below the similarity threshold keep keyframes at
            # full resolution; every other frame collapses to its
            # pooled SHADOW slot (+ its always-visible timestamp text)
            # — exact pool_minor_frames semantics (ref :434-447) on
            # cached KV.
            if prefetched is not None:
                q_dev, pre_unc, pre_stack = prefetched
                if pre_stack is not None:
                    fetched = np.asarray(pre_stack)
                    for e, r in zip(pre_unc, fetched):
                        e.rep_host = r
            else:
                q_dev = self._question_rep(question_ids)  # async dispatch
            uncached = [e for e in self.events if e.rep_host is None]
            if uncached:
                # ONE batched fetch for all new events, mirrored on the
                # host — per-event np.asarray(e.rep) paid a ~30 ms
                # tunnel round trip each, every ask
                fetched = np.asarray(jnp.stack([e.rep for e in uncached]))
                for e, r in zip(uncached, fetched):
                    e.rep_host = r
            q = np.asarray(q_dev)
            reps = np.stack([e.rep_host for e in self.events])
            sim = reps @ q / (np.linalg.norm(reps, axis=1)
                              * np.linalg.norm(q) + 1e-8)
            for e, s in zip(self.events, sim):
                if s < cc.similarity_threshold:
                    for is_key, slots, shadow in zip(
                            e.keyframe_mask, e.frame_slots,
                            e.shadow_slots):
                        allowed[slots] = is_key
                        allowed[shadow] = not is_key
        return allowed

    def ask(
        self,
        question: str,
        mode: str = "FCC",
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        lookahead_k: int = 0,
        extra_eos_ids: tuple = (),
    ) -> Dict:
        # prompt-lookup speculative decoding (generate_tokens_lookahead)
        # applies only to greedy solo turns: sampling params or pooled
        # storage fall back to the vanilla decoder silently, so callers
        # can leave lookahead_k on as a default.
        use_la = (lookahead_k > 0 and temperature == 0.0
                  and top_p == 1.0 and top_k == 0
                  and repetition_penalty == 1.0 and self._pool is None)
        la_pad = lookahead_k + 1 if use_la else 0
        turn = len(self.hist_qs)
        question_ids = np.asarray(self.tok.encode(question), np.int32)
        prefetched = None
        if mode == "FCC" and self.hist_qs:
            # overlap: question-rep + event-rep transfers ride under the
            # selector's decode round trip (_prefetch_question_rep)
            prefetched = self._prefetch_question_rep(question_ids)
            selection = self.selector.select(
                question, self.hist_qs, self.hist_as, key=self._next_key())
            if_visual, sel_idx = parse_selection(selection)
        elif mode == "NC":
            selection, if_visual, sel_idx = "[yes]", True, []
        else:  # AC / first turn: everything visible
            selection, if_visual = "[yes]", True
            sel_idx = list(range(turn))

        q_text = f"<|im_start|>user\n{question}<|im_end|>\n<|im_start|>assistant\n"
        q_ids = np.asarray(self.tok.encode(q_text), np.int32)
        S = len(q_ids)
        Sp = self._bucket(S)   # bucketed prefill → stable jit cache
        # evict BEFORE building the visibility mask — compaction moves
        # slots, which would invalidate a pre-built mask
        self.evict_for(Sp + max_new_tokens + la_pad)
        allowed = self._allowed_mask(if_visual, sel_idx, question_ids,
                                     prefetched=prefetched)
        start = self.write_index
        if start + Sp + max_new_tokens + la_pad > self.max_len:
            raise RuntimeError("session cache overflow")
        ids_pad = np.zeros((Sp,), np.int32)
        ids_pad[:S] = q_ids
        emb = qwen2.embed(self.params["text"], jnp.asarray(ids_pad))[None]
        positions = jnp.concatenate([
            jnp.arange(self.next_pos, self.next_pos + S, dtype=jnp.int32),
            jnp.full((Sp - S,), -1, jnp.int32)])[None]
        if use_la:
            # consume a key anyway so the session's key stream advances
            # identically whichever decoder runs (greedy ignores it)
            self._next_key()
            result = generate_tokens_lookahead(
                self.params["text"], emb, positions,
                jnp.asarray([S - 1], jnp.int32), self.cache,
                jnp.asarray(ids_pad)[None], self.cfg.text,
                max_new_tokens, self.tok.eos_token_id,
                lookahead_k=lookahead_k,
                adapters=self._full_adapters(),
                kv_allowed=jnp.asarray(allowed)[None],
                kv_window=self._kv_window(
                    start + Sp + max_new_tokens + la_pad),
                extra_eos_ids=tuple(extra_eos_ids) or None)
            # device scalar, fetched lazily by whoever wants the stat
            self.last_lookahead_steps = result.steps
        else:
            result = generate_tokens(
                self.params["text"], emb, positions,
                jnp.asarray([S - 1], jnp.int32), self.cache,
                self._next_key(),
                self.cfg.text, max_new_tokens, self.tok.eos_token_id,
                temperature=temperature, top_p=top_p, top_k=top_k,
                repetition_penalty=repetition_penalty,
                # penalty context: this turn's prompt ids (history K/V
                # lives in cache; the parity engine passes the full
                # conversation)
                penalty_ids=(jnp.asarray(
                    np.where(np.arange(Sp) < S, ids_pad, -1))[None]
                    if repetition_penalty != 1.0 else None),
                adapters=self._full_adapters(),
                kv_allowed=jnp.asarray(allowed)[None],
                write_slots=self._row_slots(start, S, Sp),
                cache_rows=self._cache_rows(),
                kv_window=self._kv_window(start + Sp + max_new_tokens),
                extra_eos_ids=tuple(extra_eos_ids) or None)
        self.cache = result.cache
        n_fed = max(0, int(np.asarray(result.num_tokens)[0]) - 1)
        text = decode_new_tokens(result.tokens, result.num_tokens, self.tok)

        # answer slots = tokens actually fed back through the cache (the
        # terminal eos never re-enters). Solo: prompt bucket + fed
        # tokens; pooled: tight packing, the answer follows the S real
        # prompt tokens directly (generate_tokens merge convention).
        ans_start = start + (S if self._pool is not None else Sp)
        self._wi = ans_start + n_fed
        ans_end = self._wi
        self.ranges.append(SlotRange("question", start, start + S, turn))
        self.ranges.append(SlotRange("answer", ans_start, ans_end, turn))
        self.next_pos += S + n_fed
        self.hist_qs.append(question)
        self.hist_as.append(text)
        return {"text": text, "selection": selection,
                "if_visual": if_visual, "turn": turn,
                "cache_tokens": self.write_index}

    # ------------------------------------------------------------------
    # persistence — serving restarts without losing live streams
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        """Snapshot this session — cache row (trimmed to the fill
        level) + all host bookkeeping — into one atomic ``.npz``. A
        restarted serving process reconstructs the stream with
        ``load_state`` instead of re-decoding and re-ingesting the
        video. Model weights are NOT included (they live in the model
        checkpoint). The reference has no serving persistence at all
        (its per-turn re-prefill IS its recovery story)."""
        from ..utils.io import atomic_write_npz, pack_array

        assert not self._rep_pending, "ingest left unflushed event reps"
        row = self._row if self._pool is not None else 0
        wi = self._wi
        meta = {
            "version": 1,
            "max_len": self.max_len,
            "wi": wi,
            "next_pos": self.next_pos,
            "total_frames": self.total_frames,
            "hist_qs": self.hist_qs,
            "hist_as": self.hist_as,
            "system_prompt": self._system_prompt,
            "ranges": [[r.kind, r.start, r.end, r.turn]
                       for r in self.ranges],
            "events": [{
                "frame_ids": ev.frame_ids,
                "frame_slots": [np.asarray(s).tolist()
                                for s in ev.frame_slots],
                "shadow_slots": list(ev.shadow_slots),
                "keyframe_mask": list(ev.keyframe_mask),
            } for ev in self.events],
            "pending": [{
                "frame_id": f.frame_id,
                "timestamp": f.timestamp,
                "img_slots": np.asarray(f.img_slots).tolist(),
                "shadow_slot": int(f.shadow_slot),
                "n_kept": int(f.n_kept),
            } for f in self._pending_frames],
        }
        arrays: Dict[str, np.ndarray] = {}
        dtypes: Dict[str, str] = {}

        def put(name, a):
            arrays[name], dtypes[name] = pack_array(a)

        put("k", self.cache.k[:, row, :wi])
        put("v", self.cache.v[:, row, :wi])
        put("pos", self.cache.pos[row, :wi])
        put("rng_key", jax.random.key_data(self._key)
            if jnp.issubdtype(self._key.dtype, jax.dtypes.prng_key)
            else self._key)
        if self.events:
            # ONE device->host transfer for all reps: per-event
            # np.asarray costs a ~30 ms tunnel round trip each while
            # the serving lock is held
            put("event_reps", np.asarray(
                jnp.stack([jnp.asarray(ev.rep) for ev in self.events]),
                np.float32))
        for i, f in enumerate(self._pending_frames):
            put(f"pend_feat_{i}", np.asarray(f.feat, np.float32))
            put(f"pend_rows_{i}", f.frame_rows)
        meta["dtypes"] = dtypes
        atomic_write_npz(path, meta=np.asarray(json.dumps(meta)),
                         **arrays)

    def load_state(self, path: str) -> None:
        """Restore a ``save`` snapshot into this session (solo or a
        pool row). Must be constructed with the same
        params/config/tokenizer; ``max_len`` must fit the snapshot."""
        from ..utils.io import unpack_array

        d = np.load(path)
        meta = json.loads(str(d["meta"]))
        wi = int(meta["wi"])
        if wi > self.max_len:
            raise ValueError(
                f"snapshot needs {wi} slots, session has {self.max_len}")
        dt = meta["dtypes"]

        def get(name):
            return unpack_array(d[name], dt[name])

        row = self._row if self._pool is not None else 0
        pos_row = np.full((self.max_len,), -1, np.int32)
        pos_row[:wi] = get("pos")
        new_wi = (self.cache.write_index if self._pool is not None
                  else jnp.asarray(wi, jnp.int32))
        self.cache = KVCache(
            self.cache.k.at[:, row, :wi].set(
                jnp.asarray(get("k")).astype(self.cache.k.dtype)),
            self.cache.v.at[:, row, :wi].set(
                jnp.asarray(get("v")).astype(self.cache.v.dtype)),
            self.cache.pos.at[row].set(jnp.asarray(pos_row)),
            new_wi)
        self._wi = wi
        self.next_pos = int(meta["next_pos"])
        self.total_frames = int(meta["total_frames"])
        self.hist_qs = list(meta["hist_qs"])
        self.hist_as = list(meta["hist_as"])
        self._system_prompt = meta["system_prompt"]
        self._key = jnp.asarray(get("rng_key"))
        self.ranges = [SlotRange(k, s, e, t)
                       for k, s, e, t in meta["ranges"]]
        reps = get("event_reps") if meta["events"] else None
        self.events = []
        for i, ev in enumerate(meta["events"]):
            self.events.append(EventRecord(
                frame_ids=list(ev["frame_ids"]),
                rep=jnp.asarray(reps[i]),
                frame_slots=[np.asarray(s, np.int64)
                             for s in ev["frame_slots"]],
                shadow_slots=list(ev["shadow_slots"]),
                keyframe_mask=list(ev["keyframe_mask"])))
        self._pending_frames = [
            PendingFrame(p["frame_id"], p["timestamp"],
                         get(f"pend_feat_{i}"),
                         np.asarray(p["img_slots"], np.int64),
                         p["shadow_slot"],
                         get(f"pend_rows_{i}"), p["n_kept"])
            for i, p in enumerate(meta["pending"])]
        self._rep_pending = []
