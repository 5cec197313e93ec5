"""LoRA dropout (train-mode stochastic, eval-mode deterministic),
cosine-horizon schedule, and seeded pooled decode RNG — VERDICT r1
missing #5 / weak #6 / weak #7.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cogstream_tpu.config import CogReasonerConfig, LoRAConfig
from cogstream_tpu.models.lora import init_qwen2_lora
from cogstream_tpu.train.trainer import (bind_text_loss, init_train_state,
                                         make_lr_schedule, make_optimizer,
                                         make_train_step, text_loss_fn)


def _setup():
    cfg = CogReasonerConfig.tiny().text
    params_key, lora_key = jax.random.split(jax.random.PRNGKey(0))
    from cogstream_tpu.models.qwen2 import init_qwen2_params

    params = init_qwen2_params(params_key, cfg)
    lora_cfg = LoRAConfig(dropout=0.5)   # high rate → visible effect
    lora = init_qwen2_lora(lora_key, cfg, lora_cfg)
    # LoRA b starts at zero → delta (and thus dropout) would be
    # invisible; nudge it
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(3, 200, size=(2, 24)).astype(np.int32),
        "labels": rng.integers(3, 200, size=(2, 24)).astype(np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, lora_cfg, params, lora, batch


def test_dropout_train_stochastic_eval_deterministic():
    cfg, lora_cfg, params, lora, batch = _setup()

    def loss(rate, rng):
        return float(text_loss_fn(params, lora, batch, cfg,
                                  lora_cfg.scale, remat=False,
                                  dropout_rate=rate, dropout_rng=rng))

    eval1 = loss(0.0, None)
    eval2 = loss(0.5, None)          # rate without key = eval mode
    assert eval1 == eval2

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    t1a, t1b, t2 = loss(0.5, k1), loss(0.5, k1), loss(0.5, k2)
    assert t1a == t1b                # same key → reproducible
    assert t1a != t2                 # different keys → different masks
    assert t1a != eval1              # train mode ≠ eval mode


def test_train_step_threads_per_step_dropout_keys():
    cfg, lora_cfg, params, lora, batch = _setup()
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    loss_fn = bind_text_loss(cfg, lora_cfg, remat=False)
    step = make_train_step(tx, loss_fn, donate=False,
                           dropout_rng=jax.random.PRNGKey(7))
    state = init_train_state(tx, lora)
    state, l0 = step(params, state, batch)
    state, l1 = step(params, state, batch)
    # second step: new dropout mask AND updated adapter → loss moves
    assert float(l0) != float(l1)

    # same base key, fresh state → identical trajectory (reproducible)
    step2 = make_train_step(tx, loss_fn, donate=False,
                            dropout_rng=jax.random.PRNGKey(7))
    s2 = init_train_state(tx, lora)
    s2, r0 = step2(params, s2, batch)
    assert float(r0) == float(l0)


def test_cosine_schedule_endpoints():
    sched = make_lr_schedule(1e-3, total_steps=1000, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9       # peak after warmup
    assert float(sched(1000)) < 1e-5                 # decayed at horizon
    # grad accumulation shortens the update horizon
    sched4 = make_lr_schedule(1e-3, total_steps=1000, warmup_steps=10,
                              grad_accum=4)
    assert float(sched4(250)) < 1e-5


def test_stage2_counts_dataset_turns(tmp_path):
    import json

    from cogstream_tpu.train.stage2 import count_dataset_turns

    (tmp_path / "a.json").write_text(json.dumps(
        {"segments": [{"QAs": [{}, {}]}, {"QAs": [{}]}]}))
    (tmp_path / "b.json").write_text(json.dumps({"segments": [{"QAs": [{}]}]}))
    (tmp_path / "junk.txt").write_text("not json")
    assert count_dataset_turns(str(tmp_path)) == 4
    (tmp_path / "a.json").unlink()
    (tmp_path / "b.json").unlink()
    assert count_dataset_turns(str(tmp_path)) == 1   # floor of 1
