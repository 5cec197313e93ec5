"""Published test-set (query-chain) adapter + fine-grained label
taxonomy (VERDICT r1 missing #1/#2).

The CogStream test set ships per-video query-chain JSONs (QAs keyed by
``info.Event_Time``, naturally-sorted per-video segment files,
``Q``/``A`` alternatives lists, ``info.relevance`` GT vectors — ref
evaluate/answer_generate.py:78-143) and the analysis stage buckets ~15
fine-grained per-QA labels into Basic/Streaming/Global
(analysis/step1b_statistic_score.py:22-34).
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from cogstream_tpu.evaluate.aggregate import (aggregate_scores,
                                              canonical_label, format_table,
                                              label_group)
from cogstream_tpu.evaluate.answer_generate import (load_eval_spec,
                                                    natural_segment_order)


def _write_chain(tmp_path, video_name="vidA", n_segments=2):
    """Synthesize the published layout: query_dir/<vid>.json +
    video_dir/<vid>/segment_k.mp4 placeholders."""
    qdir = tmp_path / "queries"
    vdir = tmp_path / "videos"
    qdir.mkdir(exist_ok=True)
    seg_dir = vdir / video_name
    seg_dir.mkdir(parents=True, exist_ok=True)
    # deliberately unsorted creation incl. a double-digit index
    for k in (10, 1, 2)[: n_segments + 1]:
        (seg_dir / f"segment_{k}.mp4").write_bytes(b"")
    chain = [
        {"Q": ["what color?"], "A": ["red"],
         "info": {"Event_Time": 5, "relevance": [[]],
                  "label": "Basic/Attributes"}},
        {"Q": ["and the object?"], "A": ["a cup"],
         "info": {"Event_Time": 5, "relevance": [[1, 0]],
                  "label": "Basic/Items"}},
        {"Q": ["why did it fall?"], "A": ["pushed"],
         "info": {"Event_Time": 12, "relevance": [[0, 1, 0]],
                  "label": "Streaming/Causal discovery"}},
    ]
    (qdir / f"{video_name}.json").write_text(json.dumps([chain]))
    return str(qdir), str(vdir)


def test_natural_segment_order(tmp_path):
    d = tmp_path / "v"
    d.mkdir()
    for name in ("segment_10.mp4", "segment_2.mp4", "segment_1.mp4",
                 "notes.txt"):
        (d / name).write_bytes(b"")
    assert natural_segment_order(str(d)) == [
        "segment_1.mp4", "segment_2.mp4", "segment_10.mp4", "notes.txt"]


def test_load_query_chain_spec(tmp_path):
    qdir, vdir = _write_chain(tmp_path)
    spec = load_eval_spec(os.path.join(qdir, "vidA.json"), vdir)
    assert spec["video"] == "vidA"
    segs = spec["segments"]
    assert len(segs) == 2
    # time 5 → first natural segment file, time 12 → second
    assert segs[0]["segment_file"] == "segment_1.mp4"
    assert segs[1]["segment_file"] == "segment_2.mp4"
    assert [len(s["QAs"]) for s in segs] == [2, 1]
    qa0 = segs[0]["QAs"][0]
    assert qa0["QA_pairs"] == {"Q": "what color?", "A": "red"}
    assert qa0["relevance"] == []          # nested [[...]] unwrapped
    assert qa0["label"] == "Basic/Attributes"
    assert segs[0]["QAs"][1]["relevance"] == [1, 0]
    assert segs[1]["QAs"][0]["relevance"] == [0, 1, 0]


def test_load_internal_spec_passthrough(tmp_path):
    spec_in = {"video": "x.mp4", "segments": [{"timestamp": [0, 2],
                                               "QAs": []}]}
    p = tmp_path / "x.json"
    p.write_text(json.dumps(spec_in))
    assert load_eval_spec(str(p), str(tmp_path)) == spec_in


def test_label_taxonomy():
    assert label_group("Basic/Attributes") == "Basic"
    assert label_group("Global/Overall Summary") == "Global"
    # alias merge: all reasoning variants collapse into one class
    for v in ("Streaming/Analysis", "Streaming/Causal Discovery",
              "Streaming/Causal discovery", "Streaming/Intention",
              "Streaming/Prediction", "Streaming/Ingredients Analysis",
              "Streaming/Causality"):
        assert canonical_label(v) == "Streaming/Reasoning"
        assert label_group(v) == "Streaming"
    # literal group names (internal datasets) map to themselves
    assert label_group("Basic") == "Basic"
    # unknown class of a known group falls back to the prefix
    assert label_group("Streaming/Brand New Task") == "Streaming"
    assert label_group("Nonsense") is None
    assert label_group("") is None


def test_aggregate_fine_grained_labels():
    videos = [{"QAs": [
        {"label": "Basic/Attributes", "scores": {"IA": 8, "DC": 6}},
        {"label": "Streaming/Causal discovery", "scores": {"IA": 4}},
        {"label": "Streaming/Prediction", "scores": {"IA": 6}},
        {"label": "Global/Global Analysis", "scores": {"IA": 10}},
    ]}]
    rep = aggregate_scores(videos)
    assert rep["groups"]["Basic"] == 70.0
    assert rep["groups"]["Streaming"] == 50.0
    assert rep["groups"]["Global"] == 100.0
    # the two reasoning variants merged into one class column
    assert rep["classes"]["Streaming/Reasoning"] == 50.0
    assert rep["classes"]["Basic/Attributes"] == 70.0
    table = format_table({"scores": rep, "coherence": {}, "coi": {}})
    assert "Streaming/Reasoning" in table
    assert "Basic/Attributes" in table


def test_query_chain_eval_end_to_end(tmp_path):
    """answer-generate (streaming path) + summarize run green on the
    published query-chain layout with real (tiny) per-segment videos."""
    import jax

    cv2 = pytest.importorskip("cv2")
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.evaluate.aggregate import summarize
    from cogstream_tpu.evaluate.answer_generate import run_eval
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.session import StreamingSession

    qdir, vdir = _write_chain(tmp_path)
    rng = np.random.default_rng(0)
    for seg in ("segment_1.mp4", "segment_2.mp4"):
        path = os.path.join(vdir, "vidA", seg)
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (64, 48))
        for i in range(20):
            w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
        w.release()

    cfg = CogReasonerConfig.tiny()
    cfg = dataclasses.replace(
        cfg, processor=dataclasses.replace(cfg.processor, max_frames=2))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)

    def factory():
        return StreamingSession(params, cfg, tok, max_len=2048,
                                summary_forward=False)

    save = tmp_path / "preds"
    run_eval(None, None, video_dir=vdir, query_dir=qdir,
             save_dir=str(save), mode="AC", process_index=0,
             process_count=1, session_factory=factory,
             processor_cfg=cfg.processor, log=lambda *a: None)

    out = json.loads((save / "vidA.json").read_text())
    assert len(out["QAs"]) == 3
    assert out["QAs"][0]["relevance"] == []
    assert out["QAs"][2]["label"] == "Streaming/Causal discovery"
    # judge offline (scores injected) → aggregate shows group + class
    for i, qa in enumerate(out["QAs"]):
        qa["scores"] = {"IA": 5 + i, "DC": 6}
    (save / "vidA.json").write_text(json.dumps(out))
    report = summarize(str(save))
    assert report["scores"]["groups"].keys() >= {"Basic", "Streaming"}
    assert "Streaming/Reasoning" in report["scores"]["classes"]
    assert report["coi"]["support"] >= 1


def test_eval_cli_quantized_modes(tmp_path):
    """The answer-generate CLI loads the decoder quantized (the only
    way a real 7B fits one 16 GB chip) and threads the serving flags:
    --quantize-weights int4 --w4a8-decode --encoder-int8 runs the
    published query-chain layout end-to-end."""
    import jax
    import jax.numpy as jnp

    cv2 = pytest.importorskip("cv2")
    from cogstream_tpu.__main__ import main
    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.checkpoint import save_cogreasoner_to_hf
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params

    qdir, vdir = _write_chain(tmp_path)
    rng = np.random.default_rng(0)
    for seg in ("segment_1.mp4", "segment_2.mp4"):
        path = os.path.join(vdir, "vidA", seg)
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (64, 48))
        for i in range(20):
            w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
        w.release()

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    base = str(tmp_path / "base")
    save_cogreasoner_to_hf(params, cfg, base, dtype=jnp.float32)

    save = tmp_path / "preds"
    rc = main(["answer-generate", "--model-dir", base,
               "--video-dir", vdir, "--query-dir", qdir,
               "--save-dir", str(save), "--mode", "AC",
               "--streaming", "--max-new-tokens", "8",
               "--quantize-weights", "int4", "--w4a8-decode",
               "--encoder-int8"])
    assert rc in (0, None)
    out = json.loads((save / "vidA.json").read_text())
    assert len(out["QAs"]) == 3

    # flag validation mirrors the serve CLI
    with pytest.raises(SystemExit):
        main(["answer-generate", "--model-dir", base,
              "--video-dir", vdir, "--query-dir", qdir,
              "--save-dir", str(save), "--w4a8-decode"])
