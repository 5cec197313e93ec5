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
