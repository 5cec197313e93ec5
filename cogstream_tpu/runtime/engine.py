"""CogReasoner inference engine — the user-facing per-turn API.

Mirrors the reference entry points (`cogreasoner_chat.py`):
``qa_selection`` (modes FCC / AC / NC / gt, ref :809-865), ``generate``
(ref :753-807) and the streaming turn loop of
``evaluate/answer_generate.py:60-151`` — rebuilt around jitted bucketed
prefill/decode and the on-device compression pipeline.

The engine is stateless across turns (parity path: the full
conversation is re-processed each turn, like the reference). The
KV-reusing streaming session lives in runtime/session.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig
from ..models import cogreasoner, qwen2
from ..models.qwen2 import init_kv_cache
from ..processor.processing import CogStreamProcessor, ProcessorOutput
from .generate import (bucket_length, decode_new_tokens, generate_tokens,
                       generate_tokens_lookahead)
from .history import parse_selection, rewrite_history, selection_string
from .retrieval import Selector


@dataclass
class SelectionResult:
    input_ids: np.ndarray          # pruned prompt token ids
    selection: str                 # raw selector output (e.g. "[yes,0,2]")
    if_visual: bool


@dataclass
class TurnResult:
    text: str
    selection: str
    if_visual: bool
    num_tokens: int


class CogReasonerEngine:
    """Holds params + jitted stages; one instance per process."""

    def __init__(
        self,
        params: Dict,
        cfg: CogReasonerConfig,
        tokenizer,
        adapters: Optional[Dict[str, Dict]] = None,
        use_pallas: bool = False,
        rng_seed: int = 0,
        mesh=None,
        encoder_int8: bool = False,
    ):
        from ..utils.cache import enable_compilation_cache

        enable_compilation_cache()   # 27 unrolled pallas layers: compile once per machine
        # tensor-parallel serving: place params under the Megatron-style
        # specs; GSPMD then partitions every jitted stage (see the mesh
        # note in runtime/session.py)
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
        self.tokenizer = tokenizer
        self.adapters = adapters or {}
        self.use_pallas = use_pallas
        self.processor = CogStreamProcessor(tokenizer, cfg.processor)
        self._key = jax.random.PRNGKey(rng_seed)

        lang = self.adapters.get("language_module")
        self.selector = Selector(
            params["text"], cfg.text, tokenizer,
            adapters=[(lang["text"] if "text" in lang else lang,
                       jnp.float32(1.0))] if lang else None)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _new_cache(self, max_len: int):
        cache = init_kv_cache(self.cfg.text, 1, max_len)
        if self.mesh is not None:
            from ..parallel.sharding import place_kv_cache
            cache = place_kv_cache(cache, self.cfg.text, self.mesh)
        return cache

    # -- C8 + C9 -------------------------------------------------------------

    def qa_selection(
        self,
        out: ProcessorOutput,
        mode: str = "FCC",
        select_gt: Optional[Sequence[int]] = None,
        if_visual: Optional[bool] = None,
    ) -> SelectionResult:
        """History retrieval + prompt rewrite (ref qa_selection :809-865)."""
        if mode == "AC" or not out.hist_qs:
            # empty history short-circuits to if_visual=True in EVERY
            # mode including gt — reference parity, not an oversight:
            # cogreasoner_chat.py:853-857 sets if_visual = True on the
            # len(hist_qs)==0 branch even when the caller teacher-forces
            # if_visual=False
            return SelectionResult(out.input_ids, "", True)
        if mode == "FCC":
            selection = self.selector.select(
                out.current_question, out.hist_qs, out.hist_as,
                key=self._next_key())
        elif mode == "NC":
            selection = "[yes]"
        elif mode == "gt":
            assert select_gt is not None, "gt mode requires select_gt"
            selection = selection_string(
                True if if_visual is None else if_visual, select_gt)
        else:
            raise ValueError(f"unknown qa_selection mode: {mode}")

        visual, indices = parse_selection(selection)
        n_hist = min(len(out.hist_qs), len(out.hist_as))
        kept_qs = [out.hist_qs[i] for i in indices if i < n_hist]
        kept_as = [out.hist_as[i] for i in indices if i < n_hist]
        new_text = rewrite_history(out.original_text, visual, kept_qs,
                                   kept_as, out.current_question)
        new_ids = np.asarray(self.tokenizer.encode(new_text), np.int32)
        return SelectionResult(new_ids, selection, visual)

    # -- multimodal prefill inputs ------------------------------------------

    def prepare_multimodal(
        self,
        out: ProcessorOutput,
        input_ids: np.ndarray,
        if_visual: bool,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(embeds [1,S,H], positions [1,S], last_index [1]) for prefill."""
        S = bucket_length(len(input_ids))
        ids = np.zeros((S,), np.int32)
        ids[:len(input_ids)] = input_ids
        valid = np.zeros((S,), bool)
        valid[:len(input_ids)] = True

        if if_visual and out.images is not None and out.images.pixel_values.shape[0] > 0:
            mm = cogreasoner.encode_images(
                self.params, out.images.pixel_values, out.images.grid_sizes,
                out.images.merge_sizes, self.cfg, use_pallas=self.use_pallas)
            comp = cogreasoner.run_visual_compression(
                self.params, self.cfg, self.tokenizer, mm,
                jnp.asarray(out.images.pixel_values), out.images.grid_sizes,
                out.images.merge_sizes, out.images.modals,
                out.all_timestamps,
                np.asarray(self.tokenizer.encode(out.current_question),
                           np.int32),
                self._next_key())
            mm_features, keep = comp.mm_features, comp.keep_visual
        else:
            mm_features = jnp.zeros((1, self.cfg.text.hidden_size),
                                    self.cfg.text.jnp_dtype)
            keep = jnp.zeros((1,), jnp.bool_)

        mi = cogreasoner.splice_and_compact(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(valid),
            mm_features, keep)
        return (mi.embeds[None], mi.positions[None],
                jnp.asarray([mi.last_index], jnp.int32))

    # -- generation ----------------------------------------------------------

    def generate(
        self,
        out: ProcessorOutput,
        sel: SelectionResult,
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        lookahead_k: int = 0,
        extra_eos_ids: tuple = (),
    ) -> TurnResult:
        embeds, positions, last_index = self.prepare_multimodal(
            out, sel.input_ids, sel.if_visual)
        xeos = tuple(extra_eos_ids) or None

        full = self.adapters.get("full_module")
        adapters = None
        if full is not None:
            tree = full["text"] if "text" in full else full
            adapters = [(tree, jnp.float32(1.0))]

        # Prompt-lookup speculative decode: exact greedy output, fewer
        # forwards. Only sound for greedy + no repetition penalty (the
        # reference defaults penalty 1.05 — callers opting into
        # lookahead must decode with penalty 1.0). The match corpus is
        # the rewritten conversation's TEXT ids (media placeholder runs
        # never match real emissions), bucketed independently of the
        # spliced embeds.
        if (lookahead_k > 0 and temperature == 0.0
                and repetition_penalty == 1.0):
            # consume a key so the engine's key stream advances
            # identically whichever decoder runs (greedy ignores it)
            self._next_key()
            C = bucket_length(len(sel.input_ids))
            pids = np.full((1, C), -1, np.int32)
            pids[0, :len(sel.input_ids)] = sel.input_ids
            cache = self._new_cache(
                embeds.shape[1] + max_new_tokens + lookahead_k + 1)
            result = generate_tokens_lookahead(
                self.params["text"], embeds, positions, last_index,
                cache, jnp.asarray(pids), self.cfg.text, max_new_tokens,
                self.tokenizer.eos_token_id, lookahead_k=lookahead_k,
                adapters=adapters, extra_eos_ids=xeos,
                corpus_last=jnp.asarray([len(sel.input_ids) - 1],
                                        jnp.int32))
            text = decode_new_tokens(result.tokens, result.num_tokens,
                                     self.tokenizer)
            return TurnResult(text, sel.selection, sel.if_visual,
                              int(np.asarray(result.num_tokens)[0]))

        # repetition-penalty context = the full (rewritten) conversation
        # ids, exactly HF generate's input_ids (the reference decodes
        # with penalty 1.05 from generation_config.json)
        pen_ids = None
        if repetition_penalty != 1.0:
            pen_ids = jnp.asarray(
                np.asarray(sel.input_ids, np.int32))[None]

        cache = self._new_cache(embeds.shape[1] + max_new_tokens)
        result = generate_tokens(
            self.params["text"], embeds, positions, last_index, cache,
            self._next_key(), self.cfg.text, max_new_tokens,
            self.tokenizer.eos_token_id, temperature=temperature,
            top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty, penalty_ids=pen_ids,
            adapters=adapters, extra_eos_ids=xeos)
        text = decode_new_tokens(result.tokens, result.num_tokens,
                                 self.tokenizer)
        return TurnResult(text, sel.selection, sel.if_visual,
                          int(np.asarray(result.num_tokens)[0]))

    # -- one full turn -------------------------------------------------------

    def chat(
        self,
        conversation: List[dict],
        mode: str = "FCC",
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        lookahead_k: int = 0,
        extra_eos_ids: tuple = (),
        select_gt=None,
        if_visual=None,
    ) -> TurnResult:
        """processor → qa_selection → generate (answer_generate.py:60-76)."""
        out = self.processor(conversation, add_generation_prompt=True)
        sel = self.qa_selection(out, mode=mode, select_gt=select_gt,
                                if_visual=if_visual)
        return self.generate(out, sel, max_new_tokens=max_new_tokens,
                             temperature=temperature, top_p=top_p,
                             top_k=top_k,
                             repetition_penalty=repetition_penalty,
                             lookahead_k=lookahead_k,
                             extra_eos_ids=extra_eos_ids)
