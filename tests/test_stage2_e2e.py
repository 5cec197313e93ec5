"""Stage-2 curriculum end-to-end on the tiny model: real video file →
processor → GT-selection rewrite → multimodal LoRA train step (mesh)."""

import dataclasses

import numpy as np
import jax
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(1)
    for i in range(40):
        frame = rng.integers(0, 255, (48, 64, 3), np.uint8)
        w.write(frame)
    w.release()
    return path


def test_stage2_video_curriculum(tmp_path, tiny_video):
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import (
        Stage2Config, Stage2Trainer, train_stage2_video)

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)

    tcfg = Stage2Config(max_seq_len=2048, max_frames=4, grad_accum=1,
                        save_every=10_000, fps=1)
    trainer = Stage2Trainer(params, cfg, tok, tcfg, str(tmp_path / "s2"),
                            log=lambda *a: None)

    segments = [
        {"timestamp": [0.0, 2.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown?", "A": "noise."}],
             "relevance": [], "is_visual": True},
        ]},
        {"timestamp": [2.0, 4.0], "QAs": [
            {"QA_pairs": [{"Q": "and now?", "A": "more noise."}],
             "relevance": [1], "is_visual": True},
        ]},
    ]
    losses = train_stage2_video(trainer, processor, tiny_video, segments)
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)
    assert int(np.asarray(trainer.state.step)) == 2
    trainer.finish()
    import os
    assert os.path.exists(str(tmp_path / "s2" / "full_module.npz"))


def test_pool_feature_table_matches_engine_pooling():
    """In-jit exact pooling == pool_minor_frames (engine semantics)."""
    import jax.numpy as jnp

    from cogstream_tpu.models.cogreasoner import pool_minor_frames
    from cogstream_tpu.train.multimodal import pool_feature_table
    from cogstream_tpu.train.stage2 import build_pool_arrays

    rng = np.random.default_rng(0)
    T, H = 5, 8
    gh = gw = 4
    ms = 2
    P = (gh // ms) * (gw // ms)
    feats = jnp.asarray(rng.normal(size=(T * P, H)).astype(np.float32))
    minor = np.array([False, True, False, True, True])
    want = pool_minor_frames(feats, jnp.asarray(minor), P)
    pool = build_pool_arrays(minor, np.array([[T, gh, gw]]),
                             np.array([ms]), T * P)
    assert pool is not None
    got = pool_feature_table(feats, jnp.asarray(pool[0]),
                             jnp.asarray(pool[1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # nothing minor → no plan
    assert build_pool_arrays(np.zeros(T, bool), np.array([[T, gh, gw]]),
                             np.array([ms]), T * P) is None


def test_stage2_pooling_affects_loss_and_projector_grad():
    """The exact-pooling plan changes the loss (the pooled token really
    is the mean) and keeps the projector LoRA in the pooled token's
    gradient path."""
    import types

    import jax.numpy as jnp

    from cogstream_tpu.config import CogReasonerConfig, LoRAConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.models.lora import init_cogreasoner_lora
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.multimodal import multimodal_loss_fn
    from cogstream_tpu.train.stage2 import pack_turn_batch

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), cfg,
                                 LoRAConfig(rank=2, include_projector=True))
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)

    t, gh, gw, ms = 2, 4, 4, 2
    merged = (gh // ms) * (gw // ms)
    rng = np.random.default_rng(2)
    images = types.SimpleNamespace(
        pixel_values=rng.normal(size=(t * gh * gw, 3 * 14 * 14))
        .astype(np.float32),
        grid_sizes=np.array([[t, gh, gw]]),
        merge_sizes=np.array([ms]),
    )
    # frame 1 is minor: only its patch-0 survives — the pooled token
    keep = np.ones((t * merged,), bool)
    keep[merged:] = False
    keep[merged] = True
    minor = np.array([False, True])
    prompt = "<|im_start|>user\n" + "<image>" * (t * merged) + \
        "what?<|im_end|>\n<|im_start|>assistant\n"

    def loss_for(minor_frames):
        b = pack_turn_batch(tok, cfg, prompt, "an answer", images, keep,
                            2048, minor_frames=minor_frames)
        n_vis = int(b.pop("num_vis_tokens"))
        dev = {k: jnp.asarray(v) for k, v in b.items()}
        return dev, n_vis

    dev_p, n_vis = loss_for(minor)
    assert "pool_group" in dev_p
    dev_n, _ = loss_for(None)

    def f(l, dev):
        return multimodal_loss_fn(params, l, dev, cfg, 2.0,
                                  num_vis_tokens=n_vis, remat=False)

    lp = float(f(lora, dev_p))
    ln = float(f(lora, dev_n))
    assert np.isfinite(lp) and np.isfinite(ln)
    assert lp != ln   # pooled token == mean, not patch-0 passthrough

    g = jax.grad(f)(lora, dev_p)
    gb = [np.asarray(layer["b"]) for layer in g["projector"]["layers"]]
    assert any(np.abs(x).max() > 0 for x in gb)


def test_stage2_baseline_mode(tmp_path, tiny_video):
    """C14: baseline finetune skips selection/compression."""
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import (
        Stage2Config, Stage2Trainer, train_stage2_video)

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(1), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)
    tcfg = Stage2Config(max_seq_len=2048, max_frames=2, grad_accum=1,
                        baseline=True, save_every=10_000)
    trainer = Stage2Trainer(params, cfg, tok, tcfg,
                            str(tmp_path / "s2b"), log=lambda *a: None)
    segments = [{"timestamp": [0.0, 2.0], "QAs": [
        {"QA_pairs": [{"Q": "q?", "A": "a."}], "relevance": []},
    ]}]
    losses = train_stage2_video(trainer, processor, tiny_video, segments)
    assert len(losses) == 1 and np.isfinite(losses[0])


def test_stage2_curriculum_on_nf4_base(tmp_path, tiny_video):
    """The reference's QLoRA mode end-to-end: the whole frozen base
    (decoder + vision tower + projector) quantized NF4 while LoRA
    trains (second_stage_training.py:266-294)."""
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.ops.quant import is_quantized, quantize_tree
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import (
        Stage2Config, Stage2Trainer, train_stage2_video)

    cfg = CogReasonerConfig.tiny()
    params = quantize_tree(
        init_cogreasoner_params(jax.random.PRNGKey(0), cfg), bits=4)
    assert is_quantized(
        params["text"]["layers"]["attn"]["q_proj"]["kernel"])
    assert is_quantized(params["vision"]["layers"][0]["mlp"]["fc1"]["kernel"])
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)

    tcfg = Stage2Config(max_seq_len=2048, max_frames=4, grad_accum=1,
                        save_every=10_000, fps=1)
    trainer = Stage2Trainer(params, cfg, tok, tcfg,
                            str(tmp_path / "s2q"), log=lambda *a: None)
    segments = [
        {"timestamp": [0.0, 2.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown?", "A": "noise."}],
             "relevance": [], "is_visual": True},
        ]},
    ]
    losses = train_stage2_video(trainer, processor, tiny_video, segments)
    assert len(losses) == 1 and np.isfinite(losses[0])
    trainer.finish()


def test_stage2_published_querychain_layout(tmp_path, tiny_video):
    """The stage-2 trainer consumes the published dataset directly:
    query-chain JSON + per-video directory of segment files
    (second_stage_training.py:75-152)."""
    import json
    import os
    import shutil

    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.evaluate.answer_generate import load_eval_spec
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import (
        Stage2Config, Stage2Trainer, train_stage2_video)

    # published layout: videos/<vid>/segment_k.mp4 + queries/<vid>.json
    vdir = tmp_path / "videos" / "vidA"
    vdir.mkdir(parents=True)
    for k in (1, 2):
        shutil.copy(tiny_video, str(vdir / f"segment_{k}.mp4"))
    chain = [
        {"Q": ["what is shown?"], "A": ["noise."],
         "info": {"Event_Time": 1, "relevance": [], "is_visual": True}},
        {"Q": ["and now?"], "A": ["more noise."],
         "info": {"Event_Time": 7, "relevance": [1],
                  "is_visual": True}},
    ]
    qpath = tmp_path / "queries" / "vidA.json"
    qpath.parent.mkdir()
    qpath.write_text(json.dumps([chain]))

    spec = load_eval_spec(str(qpath), str(tmp_path / "videos"))
    assert [s["segment_file"] for s in spec["segments"]] \
        == ["segment_1.mp4", "segment_2.mp4"]

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)
    tcfg = Stage2Config(max_seq_len=2048, max_frames=4, grad_accum=1,
                        save_every=10_000, fps=1)
    trainer = Stage2Trainer(params, cfg, tok, tcfg,
                            str(tmp_path / "s2"), log=lambda *a: None)
    losses = train_stage2_video(
        trainer, processor,
        os.path.join(str(tmp_path / "videos"), spec["video"]),
        spec["segments"])
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)


def test_multimodal_loss_sequence_parallel_parity():
    """sp=(mesh, axis) routes the decoder through ring attention
    (qwen2_forward_sp): loss and LoRA gradients must match the dense
    forward — stage 2's long-turn scaling axis cannot change numerics."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import __graft_entry__ as ge
    from cogstream_tpu.config import CogReasonerConfig, LoRAConfig
    from cogstream_tpu.models.lora import init_cogreasoner_lora
    from cogstream_tpu.train.multimodal import multimodal_loss_fn

    cfg = CogReasonerConfig.tiny()
    params, batch, n_vis = ge._example(cfg, tiny=True)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), cfg,
                                 LoRAConfig(include_projector=True))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))

    def loss_fn(sp):
        return lambda l: multimodal_loss_fn(
            params, l, batch, cfg, 2.0, num_vis_tokens=n_vis,
            remat=True, sp=sp)

    # jit is load-bearing: shard_map with remat'd inner scans only
    # traces under jit (the trainer's make_train_step jits too)
    dense, g_dense = jax.jit(jax.value_and_grad(loss_fn(None)))(lora)
    spv, g_sp = jax.jit(jax.value_and_grad(loss_fn((mesh, "sp"))))(lora)
    np.testing.assert_allclose(float(dense), float(spv), rtol=2e-4)
    scale = max(float(jnp.max(jnp.abs(x)))
                for x in jax.tree.leaves(g_dense))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=max(scale * 2e-2, 1e-7)),
        g_dense, g_sp)


def test_stage2_sequence_parallel_trainer(tmp_path, tiny_video):
    """--sequence-parallel end-to-end: the trainer builds the sp mesh,
    replicates weights, and the curriculum trains through ring
    attention."""
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import (
        Stage2Config, Stage2Trainer, train_stage2_video)

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)
    tcfg = Stage2Config(max_seq_len=2048, max_frames=4, grad_accum=1,
                        save_every=10_000, fps=1, sequence_parallel=4)
    trainer = Stage2Trainer(params, cfg, tok, tcfg,
                            str(tmp_path / "s2sp"), log=lambda *a: None)
    segments = [
        {"timestamp": [0.0, 2.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown?", "A": "noise."}],
             "relevance": [], "is_visual": True},
        ]},
        {"timestamp": [2.0, 4.0], "QAs": [
            {"QA_pairs": [{"Q": "and now?", "A": "more noise."}],
             "relevance": [1], "is_visual": True},
        ]},
    ]
    losses = train_stage2_video(trainer, processor, tiny_video, segments)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_stage2_sequence_parallel_rejects_bad_config():
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import Stage2Config, Stage2Trainer

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    with pytest.raises(ValueError, match="power of two"):
        Stage2Trainer(params, cfg, tok,
                      Stage2Config(sequence_parallel=3), "/tmp/x",
                      log=lambda *a: None)
    with pytest.raises(ValueError, match="exclusive"):
        Stage2Trainer(params, cfg, tok,
                      Stage2Config(sequence_parallel=2, model_parallel=2),
                      "/tmp/x", log=lambda *a: None)


def test_stage2_sequence_parallel_rejects_bad_seq_len():
    """A max_seq_len cap the sp axis doesn't divide would trip shape
    asserts mid-run (videos silently skip-dropped) — reject up front."""
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import Stage2Config, Stage2Trainer

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    with pytest.raises(ValueError, match="must divide"):
        Stage2Trainer(params, cfg, tok,
                      Stage2Config(sequence_parallel=16, max_seq_len=3000),
                      "/tmp/x", log=lambda *a: None)


def test_stage2_preemption_stops_curriculum(tmp_path, tiny_video):
    """A triggered stop flag halts the curriculum at the next turn
    boundary with the train state saved (Stage2Trainer.preempted)."""
    import os

    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.train.stage2 import (
        Stage2Config, Stage2Trainer, train_stage2_video)

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(2), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)
    tcfg = Stage2Config(max_seq_len=2048, max_frames=2, grad_accum=1,
                        baseline=True, save_every=10_000)
    out = str(tmp_path / "s2pre")
    fired = {"n": 0}

    def flag():
        fired["n"] += 1
        return True                       # preempt at the FIRST boundary

    trainer = Stage2Trainer(params, cfg, tok, tcfg, out,
                            log=lambda *a: None, stop_flag=flag)
    segments = [{"timestamp": [0.0, 2.0], "QAs": [
        {"QA_pairs": [{"Q": "q1?", "A": "a1."}], "relevance": []},
        {"QA_pairs": [{"Q": "q2?", "A": "a2."}], "relevance": []},
    ]}]
    losses = train_stage2_video(trainer, processor, tiny_video, segments)
    assert len(losses) == 1               # second QA never trained
    assert fired["n"] >= 1
    # the observed preemption saved restorable state at step 1
    from cogstream_tpu.train import checkpoint as ckpt

    restored = ckpt.restore_train_state(out, trainer.state)
    assert restored is not None
    assert int(np.asarray(restored.step)) == 1
