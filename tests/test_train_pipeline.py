"""Stage-1 data pipeline, checkpoint round-trip, stage-2 batch packing."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cogstream_tpu.processor.tokenizer import ByteTokenizer
from cogstream_tpu.train.data import (
    SelectorSample,
    encode_selector_sample,
    load_selector_dataset,
    selection_exact_match,
    selector_batches,
    shuffle_augment,
)


@pytest.fixture
def qa_json(tmp_path):
    data = {
        "vid1": {"QAs": [
            {"QA_pairs": [{"Q": "q0", "A": "a0"}], "relevance": [],
             "is_visual": True},
            {"QA_pairs": [{"Q": "q1", "A": "a1"}], "relevance": [1],
             "is_visual": False},
            {"QA_pairs": [{"Q": "q2", "A": "a2"}], "relevance": [1, 0],
             "is_visual": True},
        ]},
    }
    p = tmp_path / "qa.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_load_selector_dataset(qa_json):
    samples = load_selector_dataset(qa_json)
    # first QA has no history → skipped; q1 and q2 become samples
    assert len(samples) == 2
    assert samples[0].question == "q1"
    assert samples[0].target == "[no,0]"
    assert samples[1].target == "[yes,0]"


def test_shuffle_augment_remaps_indices():
    import random

    s = SelectorSample("q", ["h0", "h1", "h2"], ["a0", "a1", "a2"],
                       [0, 2], True)
    copies = shuffle_augment(s, random.Random(0), 4)
    assert len(copies) == 4
    for c in copies[1:]:
        # relevance must follow the permuted positions of h0 and h2
        want = sorted(c.hist_qs.index(h) for h in ("h0", "h2"))
        assert c.relevance == want


def test_selector_batches_and_labels(qa_json):
    tok = ByteTokenizer()
    samples = load_selector_dataset(qa_json)
    batches = list(selector_batches(tok, samples, batch_size=2,
                                    max_len=2048, shuffle_copies=2))
    assert batches
    b = batches[0]
    assert b["input_ids"].shape == (2, 2048)
    # labels: -100 on prompt, real ids on the target span
    tgt_mask = b["labels"][0] != -100
    assert tgt_mask.sum() > 0
    np.testing.assert_array_equal(
        b["input_ids"][0][tgt_mask], b["labels"][0][tgt_mask])


def test_selection_exact_match():
    assert selection_exact_match("[yes,2,0]", "[yes,0,2]")
    assert not selection_exact_match("[no,0]", "[yes,0]")
    assert not selection_exact_match("[yes,1]", "[yes,0]")


def test_checkpoint_roundtrip(tmp_path, tiny_config):
    from cogstream_tpu.config import LoRAConfig
    from cogstream_tpu.models.lora import init_qwen2_lora
    from cogstream_tpu.train import checkpoint as ckpt
    from cogstream_tpu.train.trainer import (
        init_train_state, make_optimizer)

    lora = init_qwen2_lora(jax.random.PRNGKey(0), tiny_config.text,
                           LoRAConfig(rank=2))
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = init_train_state(tx, lora)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    d = str(tmp_path / "ckpt")
    ckpt.save_train_state(d, state)
    template = init_train_state(tx, jax.tree.map(jnp.zeros_like, lora))
    restored = ckpt.restore_train_state(d, template)
    assert int(np.asarray(restored.step)) == 7
    a0 = lora["layers"]["attn"]["q_proj"]["a"]
    a1 = restored.lora["layers"]["attn"]["q_proj"]["a"]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1))


def test_lora_adapter_npz_roundtrip(tmp_path, tiny_config):
    from cogstream_tpu.config import LoRAConfig
    from cogstream_tpu.models.lora import init_qwen2_lora
    from cogstream_tpu.train import checkpoint as ckpt

    lora = {"text": init_qwen2_lora(jax.random.PRNGKey(1),
                                    tiny_config.text, LoRAConfig(rank=2))}
    path = ckpt.save_lora_adapter(str(tmp_path), lora, name="full_module")
    back = ckpt.load_lora_adapter(path)
    x = lora["text"]["layers"]["mlp"]["up_proj"]["a"]
    y = back["text"]["layers"]["mlp"]["up_proj"]["a"]
    np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_pack_turn_batch_compression_mapping(tiny_config):
    from cogstream_tpu.train.stage2 import pack_turn_batch

    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    img = "<image>"
    prompt = f"<|im_start|>user\n{img}{img}{img}{img}hello<|im_end|>\n"
    keep = np.array([True, False, True, False])
    batch = pack_turn_batch(tok, tiny_config, prompt, "ok", None, keep,
                            max_seq_len=256)
    ids = batch["input_ids"][0]
    fs = batch["feat_src"][0]
    img_positions = np.nonzero(ids == tok.image_token_id)[0]
    assert len(img_positions) == 2            # two dropped
    # surviving <image> ids map to ORIGINAL feature rows 0 and 2
    assert fs[img_positions].tolist() == [0, 2]
    # answer supervised, prompt masked
    labels = batch["labels"][0]
    assert (labels != -100).sum() == len(tok.encode("ok")) + 1


def test_train_stage1_smoke(tmp_path, tiny_config, qa_json):
    """Full stage-1 driver on the tiny model: mesh, constrained loss,
    orbax save, adapter export."""
    from cogstream_tpu.train.data import load_selector_dataset
    from cogstream_tpu.train.stage1 import Stage1Config, train_stage1

    params = {"text": __import__("cogstream_tpu.models.qwen2",
                                 fromlist=["init_qwen2_params"])
              .init_qwen2_params(jax.random.PRNGKey(0), tiny_config.text)}
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    samples = load_selector_dataset(qa_json)
    out = str(tmp_path / "s1")
    state = train_stage1(
        params, tiny_config, tok, samples, out,
        Stage1Config(epochs=1, batch_size=2, max_len=2048,
                     grad_accum=1, warmup_steps=1, save_every=1000,
                     log_every=1000, shuffle_copies=1),
        log=lambda *a: None)
    assert int(np.asarray(state.step)) >= 1
    assert os.path.exists(os.path.join(out, "language_module.npz"))


def test_train_stage1_pipeline_parallel(tmp_path, tiny_config, qa_json):
    """Stage 1 with --pipeline-stages: the decoder runs the GPipe
    schedule over a (data=2, pipe=2) mesh, layers sharded by stage
    (parallel/pipeline.py); loss must be finite and the adapter export
    identical in structure to the dense path's."""
    from cogstream_tpu.train.data import load_selector_dataset
    from cogstream_tpu.train.stage1 import Stage1Config, train_stage1

    params = {"text": __import__("cogstream_tpu.models.qwen2",
                                 fromlist=["init_qwen2_params"])
              .init_qwen2_params(jax.random.PRNGKey(0), tiny_config.text)}
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    samples = load_selector_dataset(qa_json)
    out = str(tmp_path / "s1pp")
    state = train_stage1(
        params, tiny_config, tok, samples, out,
        Stage1Config(epochs=1, batch_size=4, max_len=2048,
                     grad_accum=1, warmup_steps=1, save_every=1000,
                     log_every=1000, shuffle_copies=1,
                     data_parallel=2, pipeline_stages=2,
                     pipeline_microbatches=2),
        log=lambda *a: None)
    assert int(np.asarray(state.step)) >= 1
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state.lora))
    assert os.path.exists(os.path.join(out, "language_module.npz"))


def test_load_selector_dataset_published_chains(tmp_path):
    """Stage 1 trains straight off the published query-chain files:
    groups of {Q, A, info.{ID, is_visual, relevance}} dicts, relevance
    sometimes a JSON-encoded string, Q/A as 1-element lists
    (first_stage_training.py:332-376 semantics — the first QA of a
    chain has no history and is skipped)."""
    import json as _json

    from cogstream_tpu.train.data import load_selector_dir

    chain = [
        {"Q": ["what color?"], "A": ["red"],
         "info": {"ID": 0, "is_visual": True, "relevance": []}},
        {"Q": ["and the object?"], "A": ["a cup"],
         "info": {"ID": 1, "is_visual": True, "relevance": "[1]"}},
        {"Q": ["why did it fall?"], "A": ["pushed"],
         "info": {"ID": 2, "is_visual": False, "relevance": [0, 1]}},
    ]
    p = tmp_path / "vidA.json"
    p.write_text(_json.dumps([chain]))

    samples = load_selector_dataset(str(p))
    assert len(samples) == 2
    s1, s2 = samples
    assert s1.question == "and the object?"
    assert s1.hist_qs == ["what color?"] and s1.hist_as == ["red"]
    assert s1.relevance == [0] and s1.if_visual is True
    assert s1.target == "[yes,0]"
    assert s2.hist_qs == ["what color?", "and the object?"]
    assert s2.relevance == [1] and s2.if_visual is False
    assert s2.target == "[no,1]"

    # folder loader (ref load_json over the dataset directory)
    (tmp_path / "vidB.json").write_text(_json.dumps([chain]))
    assert len(load_selector_dir(str(tmp_path))) == 4


def test_count_dataset_turns_published_chains(tmp_path):
    import json as _json

    from cogstream_tpu.train.stage2 import count_dataset_turns

    chain = [{"Q": ["a?"], "A": ["b"],
              "info": {"Event_Time": 1, "relevance": []}}] * 3
    (tmp_path / "v.json").write_text(_json.dumps([chain]))
    (tmp_path / "w.json").write_text(_json.dumps(
        {"segments": [{"QAs": [1, 2]}]}))
    assert count_dataset_turns(str(tmp_path)) == 5


def test_train_stage1_pipeline_rejects_tp_combo(tmp_path, tiny_config, qa_json):
    """PP and TP are exclusive (a stage replicates at full width)."""
    from cogstream_tpu.train.data import load_selector_dataset
    from cogstream_tpu.train.stage1 import Stage1Config, train_stage1
    import pytest as _pytest

    params = {"text": __import__("cogstream_tpu.models.qwen2",
                                 fromlist=["init_qwen2_params"])
              .init_qwen2_params(jax.random.PRNGKey(0), tiny_config.text)}
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    samples = load_selector_dataset(qa_json)
    with _pytest.raises(ValueError, match="exclusive"):
        train_stage1(params, tiny_config, tok, samples,
                     str(tmp_path / "x"),
                     Stage1Config(pipeline_stages=2, model_parallel=2),
                     log=lambda *a: None)


def test_preemption_guard_flags_and_restores_handler():
    """PreemptionGuard: SIGTERM inside the context only sets the flag;
    the previous handler comes back on exit."""
    import signal

    from cogstream_tpu.train.trainer import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard()
        os.kill(os.getpid(), signal.SIGTERM)   # handled, not fatal
        assert guard()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_train_stage1_preemption_saves_and_resumes(tmp_path, tiny_config,
                                                   qa_json):
    """SIGTERM mid-run: stage 1 stops at the next step boundary with the
    train state saved; the relaunch resumes from that step (the
    production preemption story — the reference's analogue is hand-
    edited resume constants, second_stage_training.py:236-239)."""
    import signal

    from cogstream_tpu.train.data import load_selector_dataset
    from cogstream_tpu.train.stage1 import Stage1Config, train_stage1
    from cogstream_tpu.train.trainer import PreemptionGuard

    params = {"text": __import__("cogstream_tpu.models.qwen2",
                                 fromlist=["init_qwen2_params"])
              .init_qwen2_params(jax.random.PRNGKey(0), tiny_config.text)}
    tok = ByteTokenizer(image_token_id=tiny_config.image_token_index)
    samples = load_selector_dataset(qa_json)
    out = str(tmp_path / "s1pre")
    scfg = Stage1Config(epochs=2, batch_size=2, max_len=2048,
                        grad_accum=1, warmup_steps=1, save_every=1000,
                        log_every=1000, shuffle_copies=1)

    logs = []
    with PreemptionGuard() as guard:
        os.kill(os.getpid(), signal.SIGTERM)   # preempt before step 1
        state = train_stage1(params, tiny_config, tok, samples, out,
                             scfg, log=logs.append, stop_flag=guard)
    assert int(np.asarray(state.step)) == 1    # stopped early, not 2 epochs
    assert any("preempted at step 1" in str(m) for m in logs)

    logs2 = []
    state2 = train_stage1(params, tiny_config, tok, samples, out, scfg,
                          log=logs2.append)
    assert any("resumed from step 1" in str(m) for m in logs2)
    assert int(np.asarray(state2.step)) > 1    # ran to completion
