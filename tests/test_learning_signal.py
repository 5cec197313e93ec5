"""Learning-signal assertions: training LEARNS, not merely runs.

test_full_workflow proves the published pipeline executes end to end;
these tests prove the two training stages move the model in the right
direction on this image's strongest available proxies (no real
checkpoints ship here):

* stage 1 — selector exact-match on HELD-OUT synthetic dialogues above
  chance (the reference's own metric, first_stage_training.py:397-420):
  the task plants a surface-separable rule (questions asking to *look*
  need vision, questions asking to *recall* don't) in the training
  questions and checks the trained LoRA generalizes it to unseen
  phrasings;
* stage 2 — teacher-forced loss strictly decreasing over repeated
  passes of the same curriculum (the optimizer descends, the remat
  multimodal graph carries real gradients).

Both run the tiny config; deterministic seeds make the assertions
stable, not statistical.
"""

import os

import jax
import numpy as np
import pytest

from cogstream_tpu.models import qwen2
from cogstream_tpu.processor.tokenizer import ByteTokenizer
from cogstream_tpu.train.data import SelectorSample, selection_exact_match

pytestmark = pytest.mark.slow

HIST_QS = ["what was on the table?"]
HIST_AS = ["a red cup."]

_VISUAL_FILLERS = [
    "right now", "at this moment", "on the screen", "in the scene",
    "currently", "in this frame", "over there", "near the door",
    "by the window", "in the corner", "on the left", "on the right",
]
_RECALL_FILLERS = [
    "from before", "mentioned earlier", "from the last answer",
    "discussed already", "from our chat", "stated previously",
    "from the history", "told to me", "answered once", "said earlier",
    "covered before", "noted previously",
]


def _sample(visual: bool, filler: str) -> SelectorSample:
    q = (f"look at what is happening {filler}?" if visual
         else f"recall what was {filler}?")
    return SelectorSample(q, list(HIST_QS), list(HIST_AS), [], visual)


def test_stage1_selector_learns_above_chance(tmp_path, tiny_config):
    from cogstream_tpu.runtime.retrieval import Selector
    from cogstream_tpu.train.stage1 import (Stage1Config,
                                            evaluate_selector,
                                            train_stage1)

    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    params = {"text": qwen2.init_qwen2_params(jax.random.PRNGKey(0),
                                              tiny_config.text)}
    train = [_sample(v, f)
             for f in _VISUAL_FILLERS[:8] + _RECALL_FILLERS[:8]
             for v in (True, False)]
    # held out: fillers the training set never saw
    held = ([_sample(True, f) for f in _VISUAL_FILLERS[8:]]
            + [_sample(False, f) for f in _RECALL_FILLERS[8:]])

    state = train_stage1(
        params, tiny_config, tok, train, str(tmp_path / "s1"),
        Stage1Config(epochs=6, batch_size=8, max_len=4096,
                     learning_rate=3e-3, grad_accum=1, warmup_steps=2,
                     save_every=10**9, log_every=10**9,
                     shuffle_copies=1),
        log=lambda *a: None)

    adapters = [(jax.tree.map(np.asarray, state.lora), 2.0)]
    sel = Selector(params["text"], tiny_config.text, tok,
                   adapters=adapters)
    res = evaluate_selector(sel, held)
    # chance on the yes/no head is 0.5 (both classes have empty index
    # sets); an untrained tiny model scores ~0 (ungrammatical babble)
    assert res["n"] == len(held)
    assert res["exact_match"] >= 0.75, res

    # the BASE model (no adapter) must NOT pass — the signal comes
    # from training, not from the task being degenerate
    base = evaluate_selector(
        Selector(params["text"], tiny_config.text, tok), held)
    assert base["exact_match"] < res["exact_match"], (base, res)


def test_stage2_loss_decreases(tmp_path, tiny_config):
    cv2 = pytest.importorskip("cv2")
    import dataclasses

    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.train.stage2 import (Stage2Config, Stage2Trainer,
                                            train_stage2_video)

    cfg = dataclasses.replace(
        tiny_config, compression=CompressionConfig(
            frames_per_event=4, keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    processor = CogStreamProcessor(tok, cfg.processor)

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (128, 96))
    rng = np.random.default_rng(3)
    for _ in range(60):
        w.write(rng.integers(0, 255, (96, 128, 3), np.uint8))
    w.release()

    segments = [
        {"timestamp": [0.0, 3.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown?", "A": "a pattern."}],
             "relevance": [], "is_visual": True}]},
        {"timestamp": [3.0, 6.0], "QAs": [
            {"QA_pairs": [{"Q": "did it change?", "A": "slightly."}],
             "relevance": [1], "is_visual": True}]},
    ]
    tcfg = Stage2Config(max_seq_len=2048, max_frames=4, grad_accum=1,
                        save_every=10**9, fps=1, learning_rate=1e-3)
    trainer = Stage2Trainer(params, cfg, tok, tcfg,
                            str(tmp_path / "s2"), total_steps=64,
                            log=lambda *a: None)
    epoch_means = []
    for _ in range(4):
        losses = train_stage2_video(trainer, processor, path, segments,
                                    log=lambda *a: None)
        assert all(np.isfinite(l) for l in losses)
        epoch_means.append(float(np.mean(losses)))
    # teacher-forced CE on a fixed curriculum must descend
    assert epoch_means[-1] < epoch_means[0], epoch_means
    assert epoch_means[-1] < epoch_means[1], epoch_means
