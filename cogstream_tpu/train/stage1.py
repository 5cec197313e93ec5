"""Stage-1 training driver: the historic-dialogue-retrieval selector.

Functional rebuild of the reference's torchrun + HF Trainer pipeline
(first_stage_training.py:426-510): LoRA r=8 on all attention/MLP
projections, constrained-vocab CE on the bracketed selection target,
shuffle-augmented history, cosine LR, grad accumulation, bf16, remat.
One process drives the whole mesh (SPMD) — there is no per-GPU process
topology to manage and no NCCL init (ref :422-430 has no analogue).

Usage:
    python -m cogstream_tpu.train.stage1 --qa-json data.json \
        --model-dir <hf checkpoint dir> --out checkpoints/stage1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CogReasonerConfig, LoRAConfig
from ..models import qwen2
from ..models.lora import init_qwen2_lora
from ..parallel.mesh import make_mesh
from ..parallel.sharding import (
    lora_specs_like, qwen2_param_specs, shard_params)
from ..processor.tokenizer import constrained_selector_token_ids
from ..runtime.sampling import build_vocab_mask
from . import checkpoint as ckpt
from .data import load_selector_dataset, selector_batches, selection_exact_match
from .trainer import (
    bind_text_loss, init_train_state, make_optimizer, make_train_step,
    shard_batch)


@dataclasses.dataclass
class Stage1Config:
    epochs: int = 8                  # ref :481-500
    batch_size: int = 8
    max_len: int = 1024
    learning_rate: float = 1e-4
    grad_accum: int = 4
    warmup_steps: int = 50
    shuffle_copies: int = 2
    save_every: int = 200
    log_every: int = 20
    data_parallel: Optional[int] = None
    model_parallel: Optional[int] = None
    # >1: GPipe pipeline parallelism over a (data, pipe) mesh instead
    # of TP — layers shard by stage, microbatch activations hop the
    # ring (parallel/pipeline.py). num_hidden_layers must divide it;
    # exclusive with model_parallel (a stage replicates at full width).
    pipeline_stages: int = 1
    # 0 = auto: the smallest divisor of batch_size >= 4*stages (<20%
    # bubble without shrinking microbatch GEMMs more than needed; a
    # fixed default would crash batch sizes it doesn't divide)
    pipeline_microbatches: int = 0
    # few-shot demo block in the serialized selector prompt — must
    # match the flag used at serving (Selector.select include_demo)
    include_demo: bool = True
    seed: int = 0


def train_stage1(
    params: Dict,
    cfg: CogReasonerConfig,
    tokenizer,
    samples,
    out_dir: str,
    tcfg: Stage1Config = Stage1Config(),
    resume: bool = True,
    log=print,
    stop_flag=None,
):
    """Train the selector LoRA; returns the final TrainState.

    ``stop_flag`` is an optional ``Callable[[], bool]`` polled at every
    step boundary (trainer.PreemptionGuard wires it to SIGTERM): when it
    turns true the train state is saved and the function returns early —
    a relaunch resumes from that step.
    """
    lora_cfg = LoRAConfig()
    lora = init_qwen2_lora(jax.random.PRNGKey(tcfg.seed), cfg.text,
                           lora_cfg)
    pipeline = None
    if tcfg.pipeline_stages > 1:
        if tcfg.model_parallel and tcfg.model_parallel > 1:
            raise ValueError(
                "pipeline_stages is exclusive with model_parallel (a "
                "pipeline stage replicates its layers at full width; "
                "pick TP or PP for weight distribution, SCALING.md)")
        from jax.sharding import PartitionSpec as P

        from ..parallel.pipeline import (
            PIPE_AXIS, _stage_specs, make_pipeline_mesh)

        mesh = make_pipeline_mesh(tcfg.pipeline_stages,
                                  tcfg.data_parallel or 1)
        m = tcfg.pipeline_microbatches
        if m <= 0:  # auto: smallest divisor of B >= 4*stages
            B = tcfg.batch_size
            m = next((c for c in range(min(B, 4 * tcfg.pipeline_stages),
                                       B + 1) if B % c == 0), B)
        pipeline = (mesh, m)
        n_layers = cfg.text.num_hidden_layers
        text_specs = {
            k: (_stage_specs(v, n_layers, PIPE_AXIS) if k == "layers"
                else jax.tree.map(lambda _: P(), v))
            for k, v in params["text"].items()}
        lora_specs = {"layers": _stage_specs(lora["layers"], n_layers,
                                             PIPE_AXIS)}
    else:
        mesh = make_mesh(tcfg.data_parallel, tcfg.model_parallel)
        text_specs = qwen2_param_specs(cfg.text, mesh)
        lora_specs = lora_specs_like(lora, text_specs)
    params_text = shard_params(params["text"], text_specs, mesh)
    lora = shard_params(lora, lora_specs, mesh)

    steps_per_epoch = max(1, (len(samples) * tcfg.shuffle_copies)
                          // tcfg.batch_size)
    total = steps_per_epoch * tcfg.epochs
    tx = make_optimizer(tcfg.learning_rate, total_steps=total,
                        warmup_steps=tcfg.warmup_steps,
                        grad_accum=tcfg.grad_accum)

    vm = np.zeros((cfg.text.vocab_size,), bool)
    vm[constrained_selector_token_ids(tokenizer)] = True
    loss_fn = bind_text_loss(cfg.text, lora_cfg, vocab_mask=vm, remat=True,
                             pipeline=pipeline)
    # reference recipe: LoRA dropout 0.1 during training
    # (first_stage_training.py:458-465); seeded → reproducible
    drop_rng = (jax.random.PRNGKey(tcfg.seed ^ 0x5EED)
                if lora_cfg.dropout > 0 else None)
    step_fn = make_train_step(tx, loss_fn, donate=False,
                              dropout_rng=drop_rng)

    state = init_train_state(tx, lora)
    if resume:
        restored = ckpt.restore_train_state(out_dir, state)
        if restored is not None:
            state = restored
            log(f"resumed from step {int(np.asarray(state.step))}")

    with mesh:
        t0 = time.time()
        for epoch in range(tcfg.epochs):
            for batch in selector_batches(
                    tokenizer, samples, tcfg.batch_size, tcfg.max_len,
                    seed=tcfg.seed + epoch,
                    shuffle_copies=tcfg.shuffle_copies,
                    include_demo=tcfg.include_demo):
                batch = shard_batch(batch, mesh)
                state, loss = step_fn(params_text, state, batch)
                s = int(np.asarray(state.step))
                if s % tcfg.log_every == 0:
                    log(f"epoch {epoch} step {s} loss {float(loss):.4f} "
                        f"({s / (time.time() - t0 + 1e-9):.2f} it/s)")
                if s % tcfg.save_every == 0:
                    ckpt.save_train_state(out_dir, state)
                if stop_flag is not None and stop_flag():
                    ckpt.save_train_state(out_dir, state)
                    log(f"preempted at step {s}: train state saved — "
                        "rerun to resume")
                    return state
            ckpt.save_train_state(out_dir, state)
            log(f"epoch {epoch} done")
    ckpt.save_lora_adapter(out_dir, state.lora, name="language_module")
    return state


def evaluate_selector(engine_selector, samples, limit: int = 100) -> Dict:
    """Exact-match digit metrics (compute_metrics, ref :397-420)."""
    hits = 0
    n = 0
    for s in samples[:limit]:
        pred = engine_selector.select(s.question, s.hist_qs, s.hist_as)
        hits += selection_exact_match(pred, s.target)
        n += 1
    return {"exact_match": hits / max(n, 1), "n": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qa-json", required=True,
                    help="dataset JSON, or a directory of per-video "
                         "query-chain JSONs (the published layout the "
                         "reference trains from, "
                         "first_stage_training.py:478)")
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--pipeline-stages", type=int, default=1,
                    help=">1 trains with GPipe pipeline parallelism "
                         "over a (data, pipe) mesh instead of tensor "
                         "parallelism (parallel/pipeline.py); "
                         "num_hidden_layers must divide it")
    ap.add_argument("--pipeline-microbatches", type=int, default=0,
                    help="GPipe microbatches per step; must divide "
                         "--batch-size. 0 = auto (smallest divisor "
                         ">= 4*stages)")
    ap.add_argument("--data-parallel", type=int, default=None)
    args = ap.parse_args()

    from ..config import load_hf_config
    from ..models.checkpoint import load_cogreasoner_from_hf
    from ..processor.tokenizer import load_tokenizer

    cfg = load_hf_config(f"{args.model_dir}/config.json")
    params = load_cogreasoner_from_hf(args.model_dir, cfg)
    tokenizer = load_tokenizer(args.model_dir, cfg.image_token_index,
                               cfg.text.vocab_size)
    if os.path.isdir(args.qa_json):
        from .data import load_selector_dir

        samples = load_selector_dir(args.qa_json)
    else:
        samples = load_selector_dataset(args.qa_json)
    print(f"{len(samples)} selector samples")
    from .trainer import PreemptionGuard

    with PreemptionGuard() as guard:    # SIGTERM → save + clean exit
        train_stage1(params, cfg, tokenizer, samples, args.out,
                     Stage1Config(epochs=args.epochs,
                                  batch_size=args.batch_size,
                                  learning_rate=args.lr,
                                  data_parallel=args.data_parallel,
                                  pipeline_stages=args.pipeline_stages,
                                  pipeline_microbatches=(
                                      args.pipeline_microbatches)),
                     stop_flag=guard)


if __name__ == "__main__":
    main()
