"""Multimodal (stage-2 / baseline-finetune) training objective.

The reference's stage-2 step (second_stage_training.py:49-65 →
forward_train, cogreasoner_chat.py:604-693) teacher-forces the selector
output (GT chain-of-inference), rewrites the prompt, runs the full
vision → projector → splice → decoder pipeline and takes CE on the
answer span. Host-side prompt construction happens in train/stage2.py;
this module is the **jitted device program**: one differentiable
function from pixel rows to masked CE, LoRA-trainable end to end
(decoder + optional projector adapter, matching the reference's
``mm_projector.readout`` LoRA target, second_stage_training.py:252-255).

Batch layout (all static shapes, host-padded):
  pixel_values [N, C*ps*ps]   patch rows for ALL items in the batch
  vis_pos      [N, 2]         2D rope positions (vision metadata)
  vis_seg      [N]            frame segment ids, -1 pad
  vis_grp      [N]            merge-group ids, -1 pad
  input_ids    [B, S]
  feat_src     [B, S]         row into the merged-feature table, -1 = text
  positions    [B, S]         -1 on padding
  labels       [B, S]         IGNORE_INDEX outside the answer span
  pool_group   [N]            optional: minor-frame pool group id, -1 = none
  pool_dst     [G]            optional: destination row per group (its
                              frame's patch-0 row); padded entries >= N
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import CogReasonerConfig
from ..models import qwen2
from ..models.projector import projector_forward
from ..models.vision_encoder import vision_encoder_core
from .trainer import masked_cross_entropy


def pool_feature_table(proj: jax.Array, pool_group: jax.Array,
                       pool_dst: jax.Array) -> jax.Array:
    """Exact minor-frame pooling INSIDE the differentiable graph: rows
    sharing a ``pool_group`` id are mean-pooled and the mean overwrites
    the group's ``pool_dst`` row (the frame's patch-0 — the only token
    the compression mask keeps for a minor frame). Matches the
    reference's ``compress_unimportant_events`` (cogreasoner_chat.py:
    434-447), which pools the *trained* projector's outputs in autograd
    — a host-side pre-pool with frozen params would cut the projector
    LoRA out of the pooled tokens' gradient path."""
    G = pool_dst.shape[0]
    seg = jnp.where(pool_group >= 0, pool_group, G)
    sums = jax.ops.segment_sum(proj.astype(jnp.float32), seg,
                               num_segments=G + 1)[:G]
    counts = jax.ops.segment_sum(
        jnp.ones((proj.shape[0],), jnp.float32), seg,
        num_segments=G + 1)[:G]
    pooled = sums / jnp.maximum(counts, 1.0)[:, None]
    return proj.at[pool_dst].set(pooled.astype(proj.dtype), mode="drop")


def _adapter_in(x, rate, key):
    """Adapter-branch input with optional inverted dropout (PEFT
    lora_dropout: the frozen dense path never drops)."""
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def multimodal_loss_fn(
    params: Dict,
    lora: Dict,
    batch: Dict[str, jax.Array],
    cfg: CogReasonerConfig,
    lora_scale: float,
    num_vis_tokens: int,            # static: merged-feature table rows
    remat: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    sp: Optional[Any] = None,       # (mesh, axis): ring sequence parallel
) -> jax.Array:
    """``sp=(mesh, axis)`` runs the decoder SEQUENCE-PARALLEL
    (qwen2_forward_sp): activations shard [B, S/P, H] along the mesh
    axis and attention rides the ICI ring — the long-turn stage-2
    curriculum (180 frames ≈ 16k+ tokens, second_stage_training.py:149)
    stops being bounded by one chip's activation memory. Weights stay
    replicated along the axis (pair with the NF4 base for footprint);
    S must divide the axis size — the trainer pads turns up
    (stage2.Stage2Trainer). The vision/projector prologue is
    token-parallel-free (replicated compute) — it is a few percent of
    a long turn's FLOPs."""
    feats = vision_encoder_core(
        params["vision"], batch["pixel_values"], batch["vis_pos"],
        batch["vis_seg"], batch["vis_grp"], num_vis_tokens, cfg.vision)
    proj_params = params["projector"]
    proj = projector_forward(proj_params, feats.astype(cfg.text.jnp_dtype))
    if isinstance(lora, dict) and "projector" in lora:
        # LoRA on the readout MLP: low-rank delta on each linear, applied
        # to the same input the dense layer saw (2-layer mlp2x_gelu).
        lp = lora["projector"]["layers"]
        k0 = k1 = None
        if dropout_rng is not None and dropout_rate > 0.0:
            k0, k1 = jax.random.split(jax.random.fold_in(dropout_rng, 100))
        def kern(layer, dtype):
            from ..ops.quant import materialize_kernel

            return materialize_kernel(layer["kernel"], dtype)

        x0 = feats.astype(cfg.text.jnp_dtype)
        h0 = x0 @ kern(proj_params["layers"][0], x0.dtype) \
            + proj_params["layers"][0]["bias"].astype(x0.dtype)
        x0a = _adapter_in(x0, dropout_rate, k0)
        h0 = h0 + (x0a @ lp[0]["a"].astype(x0.dtype)) @ lp[0]["b"].astype(x0.dtype) * lora_scale
        x1 = jax.nn.gelu(h0, approximate=False)
        proj = x1 @ kern(proj_params["layers"][1], x1.dtype) \
            + proj_params["layers"][1]["bias"].astype(x1.dtype)
        x1a = _adapter_in(x1, dropout_rate, k1)
        proj = proj + (x1a @ lp[1]["a"].astype(x1.dtype)) @ lp[1]["b"].astype(x1.dtype) * lora_scale

    if "pool_group" in batch:
        proj = pool_feature_table(proj, batch["pool_group"],
                                  batch["pool_dst"])

    ids = batch["input_ids"]
    feat_src = batch["feat_src"]
    emb = qwen2.embed(params["text"], ids)
    spliced = jnp.where((feat_src >= 0)[..., None],
                        proj[jnp.maximum(feat_src, 0)].astype(emb.dtype), emb)

    text_lora = lora.get("text", lora) if isinstance(lora, dict) else lora
    adapters = [(text_lora, jnp.float32(1.0))]
    if sp is not None:
        sp_mesh, sp_axis = sp
        hidden = qwen2.qwen2_forward_sp(
            params["text"], spliced, batch["positions"], cfg.text,
            sp_mesh, axis=sp_axis, adapters=adapters,
            lora_scale=lora_scale, remat=remat,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    else:
        hidden, _ = qwen2.qwen2_forward(
            params["text"], spliced, batch["positions"], cfg.text,
            adapters=adapters, lora_scale=lora_scale, remat=remat,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    logits = qwen2.lm_logits(params["text"], hidden, adapters, lora_scale)
    loss, _ = masked_cross_entropy(logits, batch["labels"])
    return loss
