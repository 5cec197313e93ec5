"""Runnable parallel-training demo: every distribution axis on a
virtual 8-device CPU mesh, tiny model, real train steps.

1. Stage 1 with GPipe PIPELINE parallelism (data=2 x pipe=2): the
   stacked decoder layers shard by stage, microbatch activations hop
   the ring (parallel/pipeline.py).
2. Stage-2-style multimodal loss with ring SEQUENCE parallelism
   (sp=4): one long B=1 turn's activations shard along the sequence
   (ops/ring_attention.py), weights replicated.
3. The classic DP x TP GSPMD step for comparison.

All three print a finite loss — same numerics, different layouts.
Runs anywhere (forces the CPU platform; no TPU needed):

    python examples/parallel_training_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cogstream_tpu.config import CogReasonerConfig, LoRAConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.lora import init_cogreasoner_lora
    from cogstream_tpu.parallel.mesh import make_mesh
    from cogstream_tpu.parallel.pipeline import (
        make_pipeline_mesh, pipeline_decoder_forward)
    from cogstream_tpu.train.multimodal import multimodal_loss_fn
    from cogstream_tpu.train.trainer import bind_text_loss

    import __graft_entry__ as ge

    cfg = CogReasonerConfig.tiny()
    print(f"devices: {len(jax.devices())} virtual CPU")

    # -- 1. GPipe pipeline parallelism (stage-1 shape: text batches) --
    params_t = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg.text)
    lora_t = init_cogreasoner_lora(jax.random.PRNGKey(1), cfg,
                                   LoRAConfig())["text"]
    rng = np.random.default_rng(0)
    B, S = 8, 32
    ids = rng.integers(3, 200, size=(B, S)).astype(np.int32)
    batch = {"input_ids": jnp.asarray(ids),
             "labels": jnp.asarray(ids)}

    pp_mesh = make_pipeline_mesh(n_stages=2, data_parallel=4)
    loss_pp = bind_text_loss(cfg.text, LoRAConfig(dropout=0.0),
                             pipeline=(pp_mesh, 2))
    val = jax.jit(lambda l: loss_pp(params_t, l, batch))(lora_t)
    print(f"1. GPipe PP   mesh={dict(pp_mesh.shape)}  "
          f"microbatches=2  loss={float(val):.4f}")

    # -- 2. ring sequence parallelism (stage-2 shape: one long turn) --
    from jax.sharding import Mesh

    params, mm_batch, n_vis = ge._example(cfg, tiny=True)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), cfg,
                                 LoRAConfig(include_projector=True))
    sp_mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    val_sp = jax.jit(lambda l: multimodal_loss_fn(
        params, l, mm_batch, cfg, 2.0, num_vis_tokens=n_vis,
        remat=True, sp=(sp_mesh, "sp")))(lora)
    print(f"2. ring SP    mesh={dict(sp_mesh.shape)}  "
          f"loss={float(val_sp):.4f}")

    # -- 3. DP x TP GSPMD (the default layout) --
    from cogstream_tpu.parallel.sharding import (
        cogreasoner_param_specs, lora_specs_like, shard_params)

    mesh = make_mesh(data_parallel=2, model_parallel=4)
    specs = cogreasoner_param_specs(cfg, mesh)
    sp_params = shard_params(params, specs, mesh)
    sp_lora = shard_params(lora, lora_specs_like(lora, specs), mesh)
    with mesh:
        val_tp = jax.jit(lambda l: multimodal_loss_fn(
            sp_params, l, mm_batch, cfg, 2.0, num_vis_tokens=n_vis,
            remat=True))(sp_lora)
    print(f"3. DP x TP    mesh={dict(mesh.shape)}  "
          f"loss={float(val_tp):.4f}")

    assert np.isfinite([float(val), float(val_sp), float(val_tp)]).all()
    print("all three layouts green — same model, three distributions")


if __name__ == "__main__":
    main()
