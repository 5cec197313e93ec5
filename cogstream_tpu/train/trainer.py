"""Training core: losses, optimizer, jitted sharded train step.

Replaces the reference's HF ``Trainer`` subclass + accelerate/DeepSpeed
stack (first_stage_training.py:261-330, second_stage_training.py:225-320)
with one jitted function: forward (remat'd decoder blocks) → masked CE →
grad over the LoRA tree only → optax update. Parallelism is pure GSPMD:
params carry tensor-parallel specs, the batch rides the ``data`` axis,
grads psum automatically — DDP, ZeRO-style optimizer-state sharding and
TP all fall out of the same annotations (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CogReasonerConfig, LoRAConfig, Qwen2Config
from ..models import qwen2
from ..parallel.mesh import DATA_AXIS

IGNORE_INDEX = -100


class PreemptionGuard:
    """SIGTERM-aware stop flag for preemption-safe training.

    Production TPU capacity is routinely preempted (spot reclaims and
    maintenance events deliver SIGTERM with a grace window). The
    reference's recovery story is hand-edited resume constants
    (second_stage_training.py:236-239); here the signal handler only
    sets a flag, the train loop checks it at the next step boundary,
    saves the orbax train state, and exits cleanly — the relaunch
    resumes from that exact step via ``restore_train_state``.

    Usage::

        with PreemptionGuard() as guard:
            train_stage1(..., stop_flag=guard)

    The guard is callable (returns ``triggered``) so loops can take
    any ``stop_flag: Callable[[], bool]``. Outside the main thread
    (where CPython forbids signal handlers) it degrades to a plain
    never-triggered flag.
    """

    def __init__(self, signals: Tuple[int, ...] = None):
        import signal as _signal

        self._signal = _signal
        self._signals = signals if signals is not None \
            else (_signal.SIGTERM,)
        self._prev: Dict[int, Any] = {}
        self.triggered = False

    def _handle(self, signum, frame):
        self.triggered = True

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            try:
                self._prev[s] = self._signal.signal(s, self._handle)
            except ValueError:      # not the main thread
                pass
        return self

    def __exit__(self, *exc) -> bool:
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        self._prev.clear()
        return False

    def __call__(self) -> bool:
        return self.triggered


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def masked_cross_entropy(
    logits: jax.Array,       # [B, S, V]
    labels: jax.Array,       # [B, S] int32, IGNORE_INDEX outside target span
    vocab_mask: Optional[jax.Array] = None,   # [V] bool — constrained loss
) -> Tuple[jax.Array, jax.Array]:
    """Next-token CE over the shifted sequence. Returns (loss, n_targets).

    With ``vocab_mask`` the distribution is renormalized over the allowed
    token set before CE — the stage-1 constrained objective
    (ConstrainedTrainer.compute_loss, first_stage_training.py:274-330).
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    if vocab_mask is not None:
        logits = jnp.where(vocab_mask[None, None, :], logits, -1e30)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / n, jnp.sum(valid)


def positions_from_ids(input_ids: jax.Array, pad_id: int = 0) -> jax.Array:
    """[B, S] absolute positions; padding slots get -1."""
    valid = input_ids != pad_id
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    return jnp.where(valid, pos, -1)


# ---------------------------------------------------------------------------
# train state
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    lora: Any                # trainable adapter tree
    opt_state: Any
    step: jax.Array          # [] int32


def make_lr_schedule(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int,
    grad_accum: int = 1,
    schedule: str = "cosine",
):
    """Warmup-cosine over the real run horizon. MultiSteps advances the
    inner schedule once per ACCUMULATED update, so the horizon is
    measured in optimizer updates, not micro-batches."""
    if schedule != "cosine":
        return learning_rate
    updates = max(1, total_steps // max(grad_accum, 1))
    return optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(updates, warmup_steps + 1))


def make_optimizer(
    learning_rate: float = 1e-4,
    total_steps: int = 10_000,
    warmup_steps: int = 100,
    weight_decay: float = 0.0,
    grad_accum: int = 1,
    schedule: str = "cosine",
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW + warmup-cosine (the reference's cosine LR,
    first_stage_training.py:488, second_stage_training.py:310), with
    gradient accumulation folded in via MultiSteps (accum 4 at ref
    :166-181)."""
    sched = make_lr_schedule(learning_rate, total_steps, warmup_steps,
                             grad_accum, schedule)
    tx = optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


# ---------------------------------------------------------------------------
# jitted steps
# ---------------------------------------------------------------------------

def text_loss_fn(
    params: Dict,
    lora: Dict,
    batch: Dict[str, jax.Array],
    cfg: Qwen2Config,
    lora_scale: float,
    vocab_mask: Optional[jax.Array] = None,
    remat: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    pipeline: Optional[Tuple[Any, int]] = None,  # (pp mesh, microbatches)
) -> jax.Array:
    """Stage-1 objective: text-only selector training (C12).

    ``pipeline=(mesh, M)`` runs the decoder through the GPipe
    pipeline-parallel schedule (parallel/pipeline.py) instead of the
    dense scan — same numerics, layers sharded by stage over the mesh's
    ``pipe`` axis."""
    ids = batch["input_ids"]
    positions = batch.get("positions")
    if positions is None:
        positions = positions_from_ids(ids)
    emb = qwen2.embed(params, ids)
    adapters = [(lora, jnp.float32(1.0))]
    if pipeline is not None:
        from ..parallel.pipeline import pipeline_decoder_forward

        pp_mesh, n_mb = pipeline
        hidden = pipeline_decoder_forward(
            params, emb, positions, cfg, pp_mesh,
            num_microbatches=n_mb, adapters=adapters,
            lora_scale=lora_scale, remat=remat,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    else:
        hidden, _ = qwen2.qwen2_forward(
            params, emb, positions, cfg, adapters=adapters,
            lora_scale=lora_scale, remat=remat,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    logits = qwen2.lm_logits(params, hidden, adapters, lora_scale)
    loss, _ = masked_cross_entropy(logits, batch["labels"], vocab_mask)
    return loss


def embeds_loss_fn(
    params: Dict,
    lora: Dict,
    batch: Dict[str, jax.Array],
    cfg: Qwen2Config,
    lora_scale: float,
    remat: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Stage-2 / baseline objective over pre-spliced embeddings (C13/C14):
    the multimodal pipeline (vision encode → compression → splice) runs
    upstream; this step sees ``inputs_embeds`` + shifted labels."""
    emb = batch["inputs_embeds"]
    positions = batch["positions"]
    adapters = [(lora.get("text", lora), jnp.float32(1.0))]
    hidden, _ = qwen2.qwen2_forward(
        params, emb, positions, cfg, adapters=adapters,
        lora_scale=lora_scale, remat=remat,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    logits = qwen2.lm_logits(params, hidden, adapters, lora_scale)
    loss, _ = masked_cross_entropy(logits, batch["labels"])
    return loss


def bind_text_loss(cfg: Qwen2Config, lora_cfg: Optional[LoRAConfig] = None,
                   vocab_mask: Optional[np.ndarray] = None,
                   remat: bool = True,
                   pipeline: Optional[Tuple[Any, int]] = None) -> Callable:
    lc = lora_cfg or LoRAConfig()
    vm = jnp.asarray(vocab_mask) if vocab_mask is not None else None

    def loss(params, lora, batch, rng=None):
        return text_loss_fn(params, lora, batch, cfg, lc.scale,
                            vocab_mask=vm, remat=remat,
                            dropout_rate=lc.dropout, dropout_rng=rng,
                            pipeline=pipeline)
    return loss


def bind_embeds_loss(cfg: Qwen2Config, lora_cfg: Optional[LoRAConfig] = None,
                     remat: bool = True) -> Callable:
    lc = lora_cfg or LoRAConfig()

    def loss(params, lora, batch, rng=None):
        return embeds_loss_fn(params, lora, batch, cfg, lc.scale,
                              remat=remat, dropout_rate=lc.dropout,
                              dropout_rng=rng)
    return loss


def make_train_step(
    tx: optax.GradientTransformation,
    loss_fn: Callable,       # (params, lora, batch[, rng]) -> scalar loss
    donate: bool = True,
    dropout_rng: Optional[jax.Array] = None,
):
    """Build the jitted (params frozen, LoRA trainable) train step.

    With ``dropout_rng`` the loss is called with a per-step key derived
    by folding the step counter into the base key (train-mode LoRA
    dropout is stochastic across steps yet fully reproducible); without
    it the loss runs deterministic eval-mode forwards.
    """

    def step(params, state: TrainState, batch):
        if dropout_rng is not None:
            rng = jax.random.fold_in(dropout_rng, state.step)
            fn = lambda lora: loss_fn(params, lora, batch, rng)
        else:
            fn = lambda lora: loss_fn(params, lora, batch)
        loss, grads = jax.value_and_grad(fn)(state.lora)
        updates, opt_state = tx.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return TrainState(lora, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(1,) if donate else ())


def init_train_state(tx: optax.GradientTransformation, lora: Any) -> TrainState:
    return TrainState(lora, tx.init(lora), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# sharding helpers for the distributed path
# ---------------------------------------------------------------------------

def batch_specs(batch_example: Dict[str, Any]) -> Dict[str, P]:
    """Every batch leaf shards its leading (batch) dim on ``data``."""
    return {k: P(DATA_AXIS, *([None] * (np.ndim(v) - 1)))
            for k, v in batch_example.items()}


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    out = {}
    for k, v in batch.items():
        spec = P(DATA_AXIS, *([None] * (np.ndim(v) - 1)))
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out
