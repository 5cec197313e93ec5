"""Pooled multi-session serving: batched decode over shared cache rows.

The reference serves one conversation at a time (answer_generate.py's
sequential loop). Production TPU serving wants the opposite: decode is
weights-bound, so B concurrent sessions decoding together cost barely
more than one — the weight reads amortize across the batch. This pool
gives every session a ROW of one shared KV cache tensor: per-row
scatter writes (models/qwen2.py ``write_slots``) let each row sit at
its own fill level, and one ``generate_tokens`` call answers many
sessions' questions simultaneously (per-row ``kv_allowed`` retrieval
masks, per-row eos).

SINGLE STORAGE: sessions bound to the pool own no cache tensors at all
— every per-session op (ingest prefill, compaction, solo ask) addresses
its row of the shared tensor via ``cache_rows`` (models/qwen2.py), so
there is no session-side row copy and no store/load synchronization.
Cache HBM is exactly one [B, max_len] tensor.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig
from ..models import cogreasoner, qwen2
from ..models.qwen2 import init_kv_cache
from .generate import generate_tokens
from .session import StreamingSession, _ingest_batch_device_step


class SessionPool:
    def __init__(self, params: Dict, cfg: CogReasonerConfig, tokenizer,
                 n_rows: int = 4, max_len: int = 8192,
                 adapters: Optional[Dict] = None,
                 use_pallas: bool = False, summary_forward: bool = True,
                 kv_dtype=None, seed: int = 0, mesh=None,
                 encoder_int8: bool = False):
        # tensor-parallel pooled serving: params under the Megatron
        # specs, the shared cache under kv_cache_specs — with n_rows
        # divisible by the data axis the rows themselves shard across
        # it (batch-parallel decode on top of TP). See the mesh note in
        # runtime/session.py.
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
        self.n_rows = n_rows
        self.max_len = max_len
        self.adapters = adapters or {}
        self.use_pallas = use_pallas
        # pool-owned key chain (the sessions' _next_key discipline):
        # sampled batch decodes are reproducible given the seed
        self._key = jax.random.PRNGKey(seed)
        self.cache = init_kv_cache(cfg.text, n_rows, max_len,
                                   dtype=kv_dtype)
        if mesh is not None:
            from ..parallel.sharding import place_kv_cache
            self.cache = place_kv_cache(self.cache, cfg.text, mesh)
        self.sessions: Dict[int, StreamingSession] = {}
        # per-row seed: all rows sharing rng_seed=0 would make
        # temperature>0 solo asks sample IDENTICAL streams across
        # sessions; folding the row keeps runs reproducible per (seed,
        # row) yet independent across rows
        self._mk = lambda row: StreamingSession(
            params, cfg, tokenizer, adapters=adapters, max_len=max_len,
            use_pallas=use_pallas, summary_forward=summary_forward,
            pool=self, row=row, rng_seed=(seed << 16) ^ (row + 1))

    # -- row plumbing --------------------------------------------------------

    def _free_row(self) -> int:
        for b in range(self.n_rows):
            if b not in self.sessions:
                return b
        raise RuntimeError("session pool full")

    def open(self) -> int:
        """Create a session on a free row; returns the row id. The
        session binds to the row (clearing any previous tenant's
        positions) and prefills its system prompt straight into it."""
        b = self._free_row()
        self.sessions[b] = self._mk(b)
        return b

    def close(self, row: int) -> None:
        self.sessions.pop(row, None)

    def open_restored(self, path: str) -> int:
        """Open a session on a free row and restore a ``session.save``
        snapshot into it — serving restart without re-ingesting. A
        failed restore (bad/corrupt snapshot) releases the row again
        instead of leaking it."""
        b = self.open()
        try:
            self.sessions[b].load_state(path)
        except Exception:
            self.close(b)
            raise
        return b

    # -- per-session ops (write the shared rows directly) ---------------------

    def ingest(self, row: int, *args, **kwargs) -> None:
        self.sessions[row].append_stream_segment(*args, **kwargs)

    def ingest_batch(
        self,
        requests: Sequence[Tuple],   # (row, pixel_values, grid_size,
                                     #  merge_size, timestamps)
    ) -> None:
        """Ingest one segment into MANY rows with one batched vision
        encode + ONE fused LM prefill dispatch — the steady-state
        serving shape (N live streams ticking together). All segments
        must share (t, gh, gw, merge_size): one camera format. Event
        summary forwards (summary_forward=True) still run per sealed
        event afterwards."""
        if not requests:
            return
        rows_req = [int(r[0]) for r in requests]
        assert len(set(rows_req)) == len(rows_req), "duplicate rows"
        assert all(b in self.sessions for b in rows_req), "unknown row"
        t, gh, gw = (int(x) for x in requests[0][2])
        ms = int(requests[0][3])
        for r in requests:
            if tuple(int(x) for x in r[2]) != (t, gh, gw) \
                    or int(r[3]) != ms:
                raise ValueError(
                    "ingest_batch requires a uniform segment shape; "
                    "mixed shapes must go through ingest()")
            assert t == len(r[4])
        B = len(requests)
        merged = (gh // ms) * (gw // ms)
        cc = self.cfg.compression

        # preserve dtype: raw uint8 rows normalize on device and cost
        # 4x less host->device bandwidth than normalized float32.
        # Mixed dtypes must NOT silently concat: promotion would feed
        # raw 0-255 rows through the float path unnormalized.
        pix_items = [np.asarray(r[1]) for r in requests]
        if len({a.dtype for a in pix_items}) > 1:
            raise ValueError(
                "ingest_batch requires a uniform pixel dtype "
                f"(got {sorted({str(a.dtype) for a in pix_items})}); "
                "mix raw-uint8 and float callers via ingest()")
        pix = np.concatenate(pix_items, axis=0)
        pad_rows = -(-pix.shape[0] // 1024) * 1024
        mm = cogreasoner.encode_images(
            self.params, pix, np.array([[t, gh, gw]] * B),
            np.array([ms] * B), self.cfg, use_pallas=self.use_pallas,
            pad_to=pad_rows)
        # host-numpy keep masks (the packing plans below block on them;
        # a device mask costs a dispatch + fetch round trip per tick)
        keep_all = np.stack([
            cogreasoner.pixel_diff_keep_mask_host(
                p, t, merged, minor=np.zeros((t,), bool),
                threshold=cc.pixel_diff_threshold,
                min_tokens=cc.min_tokens_per_frame,
                image_std=tuple(self.cfg.vision.image_std),
                rescale_factor=self.cfg.vision.rescale_factor)
            for p in pix.reshape(B, t * gh * gw, -1)])

        plans, starts = [], []
        for i, (b, _, _, _, ts) in enumerate(requests):
            sess = self.sessions[b]
            plans.append(sess._segment_plan(keep_all[i], t, merged, ts))
        Sp = StreamingSession._bucket(max(p["n"] for p in plans) + t)
        n_img_p = StreamingSession._bucket(
            max(max(len(p["flat_img"]) for p in plans), 1), 128)

        packs = []
        for i, (b, *_) in enumerate(requests):
            sess = self.sessions[b]
            sess.evict_for(Sp)
            start = sess.write_index
            if start + Sp > self.max_len:
                raise RuntimeError(
                    f"pool row {b} overflow: {start}+{Sp}"
                    f" > {self.max_len}")
            starts.append(start)
            packs.append(sess._pack_plan(plans[i], Sp, n_img_p,
                                         row_offset=i * t * merged))

        slots = np.full((B, Sp), self.max_len, np.int64)
        for i, (p, start) in enumerate(zip(plans, starts)):
            slots[i, :p["n"] + t] = start + np.arange(p["n"] + t)
        allowed = np.stack([self.sessions[b]._ingest_allowed()
                            for b in rows_req])

        def stack(key):
            return jnp.asarray(np.stack([p[key] for p in packs]))

        self.cache, frame_feats, frame_rows_all = _ingest_batch_device_step(
            self.params["text"],
            self.sessions[rows_req[0]]._full_adapters(), self.cache, mm,
            stack("ids_pad"), stack("img_pad"), stack("rows_pad"),
            stack("shadow_idx"), stack("positions"),
            jnp.asarray(allowed), stack("frame_rows_idx"),
            jnp.asarray(slots),
            jnp.asarray(rows_req, jnp.int32), self.cfg.text, t, merged)
        frame_feats = np.asarray(frame_feats)
        for i, (b, start, plan) in enumerate(zip(rows_req, starts, plans)):
            self.sessions[b]._commit_segment(
                plan, start, Sp, frame_feats[i], frame_rows_all[i])
        # every event sealed this tick summarizes in ONE batched forward
        from .session import flush_event_reps

        flush_event_reps([self.sessions[b] for b in rows_req])

    def ask(self, row: int, question: str, **kwargs) -> Dict:
        """Solo ask (unbatched) — the session's pooled path."""
        return self.sessions[row].ask(question, **kwargs)

    # -- the batched path ------------------------------------------------------

    def ask_batch(
        self,
        requests: Sequence[Tuple[int, str]],       # (row, question)
        mode: str = "FCC",
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        extra_eos_ids: tuple = (),
    ) -> Dict[int, Dict]:
        """Answer several sessions' questions in ONE prefill+decode.

        Per-row work that stays host-side/serial: selector decode and
        visibility-mask construction (cheap); the expensive decode loop
        runs once for the whole batch.
        """
        B = self.n_rows
        reqs = dict(requests)
        if not reqs:
            return {}
        assert all(r in self.sessions for r in reqs), "unknown row"

        from .history import parse_selection

        # batched FCC selection: one constrained decode for all rows
        # that have history (Selector.select_batch)
        selections: Dict[int, str] = {}
        fcc_rows = [b for b in reqs
                    if mode == "FCC" and self.sessions[b].hist_qs]
        if fcc_rows:
            sel_out = self.sessions[fcc_rows[0]].selector.select_batch(
                [(reqs[b], self.sessions[b].hist_qs,
                  self.sessions[b].hist_as) for b in fcc_rows],
                key=self.sessions[fcc_rows[0]]._next_key())
            selections = dict(zip(fcc_rows, sel_out))

        metas: Dict[int, Dict] = {}
        Sp = 32
        for b, q in reqs.items():
            sess = self.sessions[b]
            if b in selections:
                selection = selections[b]
                if_visual, sel_idx = parse_selection(selection)
            elif mode == "NC":
                # no-context ablation: past turns invisible — the same
                # semantics as StreamingSession.ask(mode="NC")
                selection, if_visual, sel_idx = "[yes]", True, []
            else:  # AC / first turn: everything visible
                selection, if_visual = "[yes]", True
                sel_idx = list(range(len(sess.hist_qs)))
            q_text = (f"<|im_start|>user\n{q}<|im_end|>\n"
                      f"<|im_start|>assistant\n")
            q_ids = np.asarray(self.tok.encode(q_text), np.int32)
            Sp = max(Sp, StreamingSession._bucket(len(q_ids)))
            metas[b] = dict(q=q, q_ids=q_ids, selection=selection,
                            if_visual=if_visual, sel_idx=sel_idx)

        ids = np.zeros((B, Sp), np.int32)
        positions = np.full((B, Sp), -1, np.int32)
        slots = np.full((B, Sp), self.max_len, np.int64)  # drop by default
        last_index = np.zeros((B,), np.int32)
        allowed = np.zeros((B, self.max_len), bool)
        active = np.zeros((B,), bool)

        for b, m in metas.items():
            sess = self.sessions[b]
            n = len(m["q_ids"])
            sess.evict_for(Sp + max_new_tokens)   # compacts the row in place
            start = sess.write_index
            if start + Sp + max_new_tokens > self.max_len:
                raise RuntimeError(
                    f"pool row {b} overflow: {start}+{Sp}"
                    f"+{max_new_tokens} > {self.max_len}")
            ids[b, :n] = m["q_ids"]
            positions[b, :n] = np.arange(sess.next_pos, sess.next_pos + n)
            slots[b, :n] = np.arange(start, start + n)
            last_index[b] = n - 1
            allowed[b] = sess._allowed_mask(
                m["if_visual"], m["sel_idx"],
                np.asarray(self.tok.encode(m["q"]), np.int32))
            active[b] = True
            m.update(start=start, n=n)

        emb = qwen2.embed(self.params["text"], jnp.asarray(ids))
        # one adapter-unwrapping convention (session._full_adapters) —
        # any session in the pool shares the pool's adapter dict
        adapters = next(iter(self.sessions.values()))._full_adapters()
        # decode-read window: bound per-step K/V reads to the deepest
        # row's live extent (bucketed) instead of the full max_len
        needed = max(m["start"] + Sp for m in metas.values()) \
            + max_new_tokens
        self._key, batch_key = jax.random.split(self._key)
        result = generate_tokens(
            self.params["text"], emb, jnp.asarray(positions),
            jnp.asarray(last_index), self.cache, batch_key,
            self.cfg.text, max_new_tokens, self.tok.eos_token_id,
            temperature=temperature, adapters=adapters,
            kv_allowed=jnp.asarray(allowed),
            write_slots=jnp.asarray(slots),
            active=jnp.asarray(active),
            kv_window=StreamingSession.kv_window_for(needed,
                                                     self.max_len),
            extra_eos_ids=tuple(extra_eos_ids) or None)
        self.cache = result.cache     # sessions see it via their binding

        out: Dict[int, Dict] = {}
        toks = np.asarray(result.tokens)     # one transfer for the batch
        nums = np.asarray(result.num_tokens)
        for b, m in metas.items():
            sess = self.sessions[b]
            ids_out = toks[b, :int(nums[b])].tolist()
            if ids_out and ids_out[-1] == self.tok.eos_token_id:
                ids_out = ids_out[:-1]
            text = self.tok.decode(ids_out, skip_special_tokens=True)
            n_fed = max(0, int(nums[b]) - 1)   # terminal eos never cached
            from .session import SlotRange

            # pooled prompts pack tightly: pads are dropped, decode
            # continues right after the n real prompt tokens
            turn = len(sess.hist_qs)
            end = m["start"] + m["n"] + n_fed
            sess.ranges.append(SlotRange(
                "question", m["start"], m["start"] + m["n"], turn))
            sess.ranges.append(SlotRange(
                "answer", m["start"] + m["n"], end, turn))
            sess.next_pos += m["n"] + n_fed
            sess.hist_qs.append(m["q"])
            sess.hist_as.append(text)
            sess._wi = end
            out[b] = {"text": text, "selection": m["selection"],
                      "if_visual": m["if_visual"], "turn": turn,
                      "cache_tokens": end}
        return out
