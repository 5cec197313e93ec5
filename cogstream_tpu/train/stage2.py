"""Stage-2 training driver: video-text interleaved reasoning (C13) and
the plain baseline finetune (C14).

Rebuild of the reference's accelerate/DeepSpeed multi-turn curriculum
(second_stage_training.py:104-218 → forward_train,
cogreasoner_chat.py:604-693): per video → per segment → per QA turn,
the selector is TEACHER-FORCED with the ground-truth chain-of-inference
(selection string built from the relevance vector, ref :641-645), the
prompt is rewritten to the selected history, the visual stream is
compressed, and CE lands on the answer span only.

TPU-native split of labor:
* host: conversation assembly, GT-selection rewrite, tokenization,
  compression *mask* (discrete decisions; computed with frozen params),
  static-shape batch packing;
* device (one jitted program): vision tower → projector (+LoRA) →
  splice → remat'd decoder → masked CE → LoRA grads → optax update
  (train/multimodal.py). DeepSpeed ZeRO-2's optimizer sharding falls
  out of the GSPMD param specs; the reference's NF4 quantization of the
  frozen base (ref :266-271) is available via ``--quantize-base nf4``
  (ops/quant.py; int8/int4 variants too).

Minor-frame pooling is EXACT and differentiable: the host passes the
discrete pooling plan (``pool_group``/``pool_dst``, from the frozen-
param compression decision) and the jitted loss mean-pools the current
adapter's projected features into each minor frame's surviving patch-0
token (train/multimodal.pool_feature_table) — the same autograd
semantics as the reference's ``compress_unimportant_events``
(cogreasoner_chat.py:434-447).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig, LoRAConfig
from ..models import cogreasoner, qwen2
from ..models.lora import init_cogreasoner_lora
from ..models.vision_encoder import build_vision_metadata
from ..parallel.mesh import make_mesh
from ..parallel.sharding import (
    cogreasoner_param_specs, lora_specs_like, shard_params)
from ..runtime.history import rewrite_history, selection_string
from . import checkpoint as ckpt
from .multimodal import multimodal_loss_fn
from .trainer import (
    IGNORE_INDEX, init_train_state, make_optimizer, make_train_step)


@dataclasses.dataclass
class Stage2Config:
    num_epochs: int = 1
    learning_rate: float = 1e-4
    grad_accum: int = 4            # ref :166-181
    save_every: int = 30           # updates (ref :182-202)
    log_every: int = 10
    max_seq_len: int = 4096
    max_frames: int = 180          # ref :149
    fps: int = 1
    data_parallel: Optional[int] = None
    model_parallel: Optional[int] = None
    # >1: ring sequence parallelism — the decoder's activations shard
    # [1, S/P, H] over an "sp" mesh axis and attention rides the ICI
    # ring (ops/ring_attention.py). The fit for stage 2's B=1 long
    # turns (180 frames ≈ 16k+ tokens): batch can't shard, sequence
    # can. Weights replicate along sp (pair with --quantize-base).
    # Power of two (turn lengths bucket to powers of two ≥ 64);
    # exclusive with model_parallel.
    sequence_parallel: int = 1
    seed: int = 0
    baseline: bool = False         # C14: skip selection/compression


def build_pool_arrays(
    minor: np.ndarray,            # [T_total] bool minor-frame mask
    grid_sizes: np.ndarray,       # [B, 3]
    merge_sizes: np.ndarray,      # [B]
    num_vis_tokens: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """The discrete in-jit pooling plan: merged-feature rows of each
    minor frame share a pool-group id; the group mean lands on the
    frame's patch-0 row (its only surviving token). Returns None when
    nothing pools. ``pool_dst`` is bucketed (pad entries point past the
    table → dropped scatters)."""
    if minor is None or not np.any(minor):
        return None
    pool_group = np.full((num_vis_tokens,), -1, np.int32)
    dst: List[int] = []
    row = frame = 0
    for (t, gh, gw), ms in zip(grid_sizes, merge_sizes):
        t, gh, gw, ms = int(t), int(gh), int(gw), int(ms)
        merged = (gh // ms) * (gw // ms)
        for _ in range(t):
            if frame < len(minor) and minor[frame]:
                pool_group[row:row + merged] = len(dst)
                dst.append(row)
            frame += 1
            row += merged
    G = max(8, -(-len(dst) // 8) * 8)   # bucket → fewer jit retraces
    pool_dst = np.full((G,), num_vis_tokens, np.int32)
    pool_dst[:len(dst)] = dst
    return pool_group, pool_dst


def pack_turn_batch(
    tokenizer,
    cfg: CogReasonerConfig,
    prompt_text: str,
    answer_text: str,
    images,                       # ImageBatch or None
    keep_visual: Optional[np.ndarray],
    max_seq_len: int,
    minor_frames: Optional[np.ndarray] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """One teacher-forced turn → static-shape multimodal batch (B=1).

    ``keep_visual`` masks merged visual tokens (compression); surviving
    ``<image>`` ids map in order onto surviving feature rows.
    ``minor_frames`` adds the exact-pooling plan (build_pool_arrays).
    """
    img_id = tokenizer.image_token_id
    p_ids = tokenizer.encode(prompt_text)
    a_ids = tokenizer.encode(answer_text) + [tokenizer.eos_token_id]

    ids: List[int] = []
    feat_src: List[int] = []
    vis_i = 0
    for tid in p_ids:
        if tid == img_id:
            if keep_visual is None or keep_visual[vis_i]:
                ids.append(tid)
                feat_src.append(vis_i)
            vis_i += 1
        else:
            ids.append(tid)
            feat_src.append(-1)
    prompt_len = len(ids)
    ids.extend(a_ids)
    feat_src.extend([-1] * len(a_ids))
    if len(ids) > max_seq_len:
        return None

    S = max(64, 1 << math.ceil(math.log2(len(ids))))
    S = min(S, max_seq_len)
    if len(ids) > S:
        return None
    pad = S - len(ids)
    labels = [IGNORE_INDEX] * prompt_len + a_ids + [IGNORE_INDEX] * pad
    positions = list(range(len(ids))) + [-1] * pad
    batch = {
        "input_ids": np.asarray([ids + [0] * pad], np.int32),
        "feat_src": np.asarray([feat_src + [-1] * pad], np.int32),
        "labels": np.asarray([labels], np.int32),
        "positions": np.asarray([positions], np.int32),
    }
    if images is not None:
        meta = build_vision_metadata(images.grid_sizes, images.merge_sizes)
        batch.update({
            "pixel_values": images.pixel_values.astype(np.float32),
            "vis_pos": meta.pos_ids,
            "vis_seg": meta.segment_ids,
            "vis_grp": meta.merge_group_ids,
        })
        batch["num_vis_tokens"] = meta.num_out_tokens  # static sidecar
        if minor_frames is not None:
            pool = build_pool_arrays(minor_frames, images.grid_sizes,
                                     images.merge_sizes,
                                     meta.num_out_tokens)
            if pool is not None:
                batch["pool_group"], batch["pool_dst"] = pool
    return batch


def build_gt_selection(relevance: Sequence[int], n_hist: int,
                       if_visual: bool) -> str:
    idx = [i for i, r in enumerate(relevance[:n_hist]) if r]
    return selection_string(if_visual, idx)


class Stage2Trainer:
    """Drives the per-turn curriculum; owns the jitted step per
    (S, N_pixels) shape bucket."""

    def __init__(self, params, cfg: CogReasonerConfig, tokenizer,
                 tcfg: Stage2Config, out_dir: str,
                 total_steps: Optional[int] = None, log=print,
                 stop_flag=None):
        self.cfg = cfg
        self.tok = tokenizer
        self.tcfg = tcfg
        self.out_dir = out_dir
        self.log = log
        # optional Callable[[], bool] (trainer.PreemptionGuard): polled
        # at turn boundaries; true → save state and stop cleanly
        self.stop_flag = stop_flag

        self.lora_cfg = LoRAConfig(include_projector=not tcfg.baseline)
        lora = init_cogreasoner_lora(
            jax.random.PRNGKey(tcfg.seed), cfg, self.lora_cfg)
        self.sp = None
        if tcfg.sequence_parallel > 1:
            if tcfg.model_parallel and tcfg.model_parallel > 1:
                raise ValueError("sequence_parallel is exclusive with "
                                 "model_parallel (weights replicate "
                                 "along the sp axis)")
            n = tcfg.sequence_parallel
            if n & (n - 1):
                raise ValueError(f"sequence_parallel={n} must be a "
                                 "power of two (turn lengths bucket to "
                                 "powers of two)")
            if tcfg.max_seq_len % n:
                # buckets are powers of two UNTIL the max_seq_len cap —
                # a non-divisible cap would hit qwen2_forward_sp's
                # shape assert mid-run and skip-drop whole videos
                raise ValueError(
                    f"sequence_parallel={n} must divide "
                    f"max_seq_len={tcfg.max_seq_len}")
            if len(jax.devices()) < n:
                raise ValueError(
                    f"sequence_parallel={n} needs {n} devices, have "
                    f"{len(jax.devices())} — a silent 1-device sp "
                    "mesh would defeat the long-turn memory split")
            from jax.sharding import Mesh, PartitionSpec as P

            self.mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
            self.sp = (self.mesh, "sp")
            specs = jax.tree.map(lambda _: P(), params)
            lora_specs = jax.tree.map(lambda _: P(), lora)
        else:
            self.mesh = make_mesh(tcfg.data_parallel, tcfg.model_parallel)
            specs = cogreasoner_param_specs(cfg, self.mesh)
            lora_specs = lora_specs_like(lora, specs)
        self.params = shard_params(params, specs, self.mesh)
        lora = shard_params(lora, lora_specs, self.mesh)

        # cosine horizon = real run length (dataset turns × epochs), as
        # stage 1 derives it from its sample count — an unknown horizon
        # would leave the LR near peak forever
        if total_steps is None:
            total_steps = 10_000
            log("stage2: total_steps not given; cosine horizon defaults "
                "to 10k updates — pass the dataset turn count × epochs")
        self.tx = make_optimizer(
            tcfg.learning_rate, total_steps=total_steps,
            warmup_steps=min(100, max(1, total_steps // 10)),
            grad_accum=tcfg.grad_accum)
        self.state = init_train_state(self.tx, lora)
        restored = ckpt.restore_train_state(out_dir, self.state)
        if restored is not None:
            self.state = restored
            log(f"resumed at step {int(np.asarray(self.state.step))}")
        self._steps: Dict[int, object] = {}
        # reference recipe trains with LoRA dropout 0.1; keys derive
        # from the seed so runs are reproducible
        self._dropout_rng = (jax.random.PRNGKey(tcfg.seed ^ 0x5EED)
                             if self.lora_cfg.dropout > 0 else None)

    def _step_fn(self, num_vis_tokens: int, pool_g: int = 0):
        key = (num_vis_tokens, pool_g)
        if key not in self._steps:
            cfg = self.cfg
            scale, rate = self.lora_cfg.scale, self.lora_cfg.dropout

            sp = self.sp

            def loss(p, l, b, rng=None):
                return multimodal_loss_fn(p, l, b, cfg, scale,
                                          num_vis_tokens=num_vis_tokens,
                                          remat=True, dropout_rate=rate,
                                          dropout_rng=rng, sp=sp)
            self._steps[key] = make_train_step(
                self.tx, loss, donate=False,
                dropout_rng=self._dropout_rng)
        return self._steps[key]

    def train_turn(self, batch: Dict[str, np.ndarray]) -> float:
        n_vis = int(batch.pop("num_vis_tokens", 0))
        if n_vis == 0:
            # text-only turn: tiny dummy visual table keeps one code path
            batch["pixel_values"] = np.zeros(
                (4, 3 * self.cfg.vision.patch_size ** 2), np.float32)
            batch["vis_pos"] = np.zeros((4, 2), np.int32)
            batch["vis_seg"] = np.full((4,), -1, np.int32)
            batch["vis_grp"] = np.full((4,), -1, np.int32)
            n_vis = 1
        pool_g = batch["pool_dst"].shape[0] if "pool_dst" in batch else 0
        step = self._step_fn(n_vis, pool_g)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        with self.mesh:
            self.state, loss = step(self.params, self.state, dev_batch)
        s = int(np.asarray(self.state.step))
        # state.step counts MICRO-steps; the reference checkpoints every
        # 30 accumulated UPDATES (second_stage_training.py:182-202)
        if s % (self.tcfg.save_every * max(1, self.tcfg.grad_accum)) == 0:
            ckpt.save_train_state(self.out_dir, self.state)
        return float(loss)

    def preempted(self) -> bool:
        """True once the stop flag fires; saves the train state when
        observed so the caller can simply stop."""
        if self.stop_flag is not None and self.stop_flag():
            ckpt.save_train_state(self.out_dir, self.state)
            self.log(f"preempted at step "
                     f"{int(np.asarray(self.state.step))}: train state "
                     "saved — rerun to resume")
            return True
        return False

    def finish(self):
        ckpt.save_train_state(self.out_dir, self.state)
        ckpt.save_lora_adapter(self.out_dir, self.state.lora,
                               name="full_module")


def train_stage2_video(
    trainer: Stage2Trainer,
    processor,
    video_path: str,
    segments: Sequence[dict],
    log=print,
) -> List[float]:
    """One video's curriculum: grow the conversation segment by segment,
    teacher-forcing each QA (the loop at second_stage_training.py:104-218).

    ``segments``: [{"timestamp": [s, e], "QAs": [{"QA_pairs": [{"Q","A"}],
    "relevance": [...], "is_visual": bool}]}]
    """
    cfg, tok, tcfg = trainer.cfg, trainer.tok, trainer.tcfg
    conversation: List[dict] = []
    hist_qs: List[str] = []
    hist_as: List[str] = []
    losses: List[float] = []

    for seg in segments:
        if "segment_file" in seg:
            # published layout: each segment is its own file under the
            # per-video directory (second_stage_training.py:143-152)
            video_args = {
                "video_path": os.path.join(video_path,
                                           seg["segment_file"]),
                "fps": tcfg.fps, "max_frames": tcfg.max_frames}
        else:
            s, e = seg.get("timestamp", [None, None])[:2]
            video_args = {"video_path": video_path, "fps": tcfg.fps,
                          "max_frames": tcfg.max_frames}
            if s is not None:
                video_args["start_time"] = s
            if e is not None:
                video_args["end_time"] = e
        conversation.append({
            "role": "stream",
            "content": [{"type": "video", "video": video_args}],
        })
        for qa in seg.get("QAs", []):
            pair = qa["QA_pairs"][0] if isinstance(qa.get("QA_pairs"), list) \
                else qa.get("QA_pairs", qa)
            q, a = pair.get("Q", ""), pair.get("A", "")
            conversation.append({"role": "user", "content": q})
            out = processor(conversation, add_generation_prompt=True)

            if trainer.tcfg.baseline:
                prompt_text = out.original_text
                keep = minor = None
            else:
                gt = build_gt_selection(qa.get("relevance", []),
                                        len(hist_qs),
                                        bool(qa.get("is_visual", True)))
                from ..runtime.history import parse_selection
                vis, idx = parse_selection(gt)
                kept_q = [hist_qs[i] for i in idx if i < len(hist_qs)]
                kept_a = [hist_as[i] for i in idx if i < len(hist_qs)]
                prompt_text = rewrite_history(
                    out.original_text, vis, kept_q, kept_a, q)
                keep = minor = None
                if vis and out.images is not None and \
                        out.images.pixel_values.shape[0] > 0:
                    comp = cogreasoner.run_visual_compression(
                        trainer.params, cfg, tok,
                        cogreasoner.encode_images(
                            trainer.params, out.images.pixel_values,
                            out.images.grid_sizes, out.images.merge_sizes,
                            cfg),
                        jnp.asarray(out.images.pixel_values),
                        out.images.grid_sizes, out.images.merge_sizes,
                        out.images.modals, out.all_timestamps,
                        np.asarray(tok.encode(q), np.int32),
                        jax.random.PRNGKey(0))
                    keep = np.asarray(comp.keep_visual)
                    if comp.minor_frames is not None:
                        minor = np.asarray(comp.minor_frames)

            batch = pack_turn_batch(tok, cfg, prompt_text, a, out.images,
                                    keep, tcfg.max_seq_len,
                                    minor_frames=minor)
            if batch is not None:
                losses.append(trainer.train_turn(batch))
            conversation.append({"role": "assistant", "content": a})
            hist_qs.append(q)
            hist_as.append(a)
            if trainer.preempted():
                return losses
    return losses


def count_dataset_turns(query_dir: str) -> int:
    """Total QA turns across the query dir — one optimizer micro-step is
    taken per turn, so turns × epochs is the cosine schedule horizon.
    Reads both the internal spec and the published query-chain layout."""
    n = 0
    for fname in sorted(os.listdir(query_dir)):
        if not fname.endswith(".json"):
            continue
        try:
            with open(os.path.join(query_dir, fname)) as f:
                spec = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(spec, dict) and "segments" in spec:
            n += sum(len(seg.get("QAs", []))
                     for seg in spec.get("segments", []))
        else:                       # published chains: chain 0 trains
            if isinstance(spec, dict):
                spec = spec.get("query_chains", [])
            if isinstance(spec, list) and spec:
                chain = spec[0] if isinstance(spec[0], list) else spec
                n += sum(1 for qa in chain if isinstance(qa, dict))
    return max(n, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--query-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-epochs", type=int, default=1)
    ap.add_argument("--baseline", action="store_true",
                    help="C14 VideoLLaMA3-style finetune (no modules)")
    ap.add_argument("--quantize-base", choices=["none", "int8", "nf4",
                                                "int4"], default="none",
                    help="freeze the base in quantized form while LoRA "
                         "trains full precision (the reference's QLoRA "
                         "recipe, second_stage_training.py:266-271; "
                         "nf4 is its exact scheme)")
    ap.add_argument("--sequence-parallel", type=int, default=1,
                    help=">1: shard each turn's sequence over an sp "
                         "mesh axis with ring attention — long-turn "
                         "activation memory splits across chips "
                         "(power of two; weights replicate, pair with "
                         "--quantize-base)")
    ap.add_argument("--w8a8-forward", action="store_true",
                    help="run the frozen int8 base's forward GEMMs "
                         "W8A8 on the MXU int8 path (requires "
                         "--quantize-base int8). Activation gradients "
                         "flow straight-through (ops/quant "
                         "_w8a8_matmul_ste) — exact for the frozen "
                         "base, STE-approximate through the round")
    args = ap.parse_args()
    if args.w8a8_forward and args.quantize_base != "int8":
        ap.error("--w8a8-forward requires --quantize-base int8")

    from ..config import load_hf_config
    from ..models.checkpoint import load_cogreasoner_from_hf
    from ..processor.processing import CogStreamProcessor
    from ..processor.tokenizer import load_tokenizer

    cfg = load_hf_config(os.path.join(args.model_dir, "config.json"))
    if args.w8a8_forward:
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, text=_dc.replace(cfg.text, w8a8_prefill=True))
    params = load_cogreasoner_from_hf(args.model_dir, cfg)
    if args.quantize_base != "none":
        from ..ops.quant import quantize_tree

        params = quantize_tree(
            params,
            bits=8 if args.quantize_base == "int8" else 4,
            nf4=args.quantize_base != "int4")
    tok = load_tokenizer(args.model_dir, cfg.image_token_index,
                         cfg.text.vocab_size)
    processor = CogStreamProcessor(tok, cfg.processor)
    tcfg = Stage2Config(num_epochs=args.num_epochs, baseline=args.baseline,
                        sequence_parallel=args.sequence_parallel)
    from .trainer import PreemptionGuard

    with PreemptionGuard() as guard:    # SIGTERM → save + clean exit
        trainer = Stage2Trainer(
            params, cfg, tok, tcfg, args.out,
            total_steps=(count_dataset_turns(args.query_dir)
                         * tcfg.num_epochs),
            stop_flag=guard)

        from ..evaluate.answer_generate import load_eval_spec

        for epoch in range(tcfg.num_epochs):
            for fname in sorted(os.listdir(args.query_dir)):
                if not fname.endswith(".json"):
                    continue
                # both layouts: internal specs pass through; published
                # query chains map to per-segment files of the video dir
                spec = load_eval_spec(
                    os.path.join(args.query_dir, fname), args.video_dir)
                video = os.path.join(
                    args.video_dir, spec.get("video", fname[:-5] + ".mp4"))
                try:
                    losses = train_stage2_video(
                        trainer, processor, video, spec.get("segments", []))
                    print(f"{fname}: {len(losses)} turns, "
                          f"mean loss {np.mean(losses or [0]):.4f}")
                except Exception as e:  # per-video resilience (ref :161-164)
                    print(f"{fname}: skipped ({type(e).__name__}: {e})")
                if guard():
                    break
            if guard():
                break
        trainer.finish()


if __name__ == "__main__":
    main()
