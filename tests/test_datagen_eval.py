"""Dataset-generation pipeline (C19-C24) and eval harness (C16-C17)
end-to-end on the offline fake clients."""

import json
import os

import numpy as np
import pytest

from cogstream_tpu.datagen import (
    dialogue_path, formatting, generation, reformatting, scoring)
from cogstream_tpu.datagen.client import FakeMLLM
from cogstream_tpu.evaluate import aggregate, judges, nlp_metrics


@pytest.fixture
def segments_spec():
    return [
        {"index": 0, "keyframes": [], "timestamp": [0, 10]},
        {"index": 1, "keyframes": [], "timestamp": [10, 20]},
        {"index": 2, "keyframes": [], "timestamp": [20, 30]},
    ]


def test_generation_pipeline(segments_spec):
    client = FakeMLLM()
    video = generation.generate_video_qas(client, segments_spec,
                                          log=lambda *a: None)
    assert len(video["segments"]) == 3
    assert video["segments"][0]["QAs"]["L1"]
    # L3 requires a rolling summary → segments 1+
    assert "L3" in video["segments"][1]["QAs"]
    assert "L4" in video["segments"][2]["QAs"]
    assert video["summary"]


def test_remix_cap_and_paths(segments_spec, tmp_path):
    client = FakeMLLM()
    video = generation.generate_video_qas(client, segments_spec,
                                          log=lambda *a: None)
    video["video"] = "v"
    video = reformatting.remix(video, seed=0)
    video = reformatting.cap_counts(video, seed=0)
    for seg in video["segments"]:
        assert len(seg["QAs"].get("L1", [])) <= 5
        assert len(seg["QAs"].get("L3", [])) <= 4

    scored = scoring.score_video(client, video,
                                 out_path=str(tmp_path / "s.json"),
                                 log=lambda *a: None)
    assert "links" in scored
    merged = dialogue_path.merge_score_matrices([scored["links"]])
    streams = dialogue_path.build_streams(video, merged, n_streams=2)
    assert len(streams) == 2
    assert streams[0]["QAs"], "stream should select some QAs"
    labels = {qa["label"] for qa in streams[0]["QAs"]}
    assert labels <= {"Basic", "Streaming", "Global"}

    simple = formatting.stream_to_simple("v", streams[0],
                                         video["segments"])
    for i, qa in enumerate(simple["QAs"]):
        assert len(qa["relevance"]) == i


def test_scoring_resumable(segments_spec, tmp_path):
    client = FakeMLLM()
    video = generation.generate_video_qas(client, segments_spec,
                                          log=lambda *a: None)
    video["video"] = "v"
    out = str(tmp_path / "links.json")
    scoring.score_video(client, video, out_path=out, log=lambda *a: None)
    calls_first = client.calls
    scoring.score_video(client, video, out_path=out, log=lambda *a: None)
    assert client.calls == calls_first  # fully skipped on resume


def test_judges_and_aggregate(tmp_path):
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    video = {"video": "v", "QAs": [
        {"question": "what color is the car",
         "prediction": "the car is red",
         "answer": "the car is red", "label": "Basic",
         "class": "Attribute", "relevance": [], "is_visual": True,
         "pred_coi": [], "pred_visual": True},
        {"question": "what happened after",
         "prediction": "something unrelated entirely",
         "answer": "the red car drove away", "label": "Streaming",
         "class": "Sequence", "relevance": [1], "is_visual": True,
         "pred_coi": [0], "pred_visual": True},
    ]}
    with open(pred_dir / "v.json", "w") as f:
        json.dump(video, f)

    out_dir = tmp_path / "judged"
    client = judges.FakeJudge()
    for metric in judges.METRIC_RUBRICS:
        judges.judge_directory(metric, client, str(pred_dir),
                               str(out_dir) if metric == "IA"
                               else str(out_dir), coi_context=metric == "DC",
                               log=lambda *a: None)
    # only first metric wrote (idempotent skip) → re-read and check
    videos = aggregate.load_judged_dir(str(out_dir))
    assert videos and videos[0]["QAs"][0]["scores"]

    report = {
        "scores": aggregate.aggregate_scores(videos),
        "coherence": aggregate.dialogue_coherence(videos),
        "coi": aggregate.coi_metrics(
            aggregate.coi_items_from_videos(videos)),
    }
    assert report["scores"]["average"] is not None
    assert 0 <= report["scores"]["average"] <= 100
    assert report["coi"]["f1"] == 1.0   # pred == gt
    table = aggregate.format_table(report)
    assert "Avg." in table

    # exact-match prediction should outscore the unrelated one
    qa0, qa1 = videos[0]["QAs"]
    s0 = [v for v in qa0["scores"].values() if v is not None]
    s1 = [v for v in qa1["scores"].values() if v is not None]
    assert np.mean(s0) > np.mean(s1)


def test_judge_idempotent_skip(tmp_path):
    pred_dir = tmp_path / "p"
    out_dir = tmp_path / "o"
    pred_dir.mkdir()
    with open(pred_dir / "v.json", "w") as f:
        json.dump({"QAs": [{"question": "q", "prediction": "a",
                            "answer": "a"}]}, f)
    client = judges.FakeJudge()
    judges.judge_directory("IA", client, str(pred_dir), str(out_dir),
                           log=lambda *a: None)
    first = client.calls
    judges.judge_directory("IA", client, str(pred_dir), str(out_dir),
                           log=lambda *a: None)
    assert client.calls == first


def test_nlp_metrics_sanity():
    preds = ["the red car drove away quickly",
             "a cat sat on the mat"]
    refs = ["the red car drove away quickly",
            "dogs bark loudly at night"]
    m_same = nlp_metrics.compute_all(preds[:1], refs[:1])
    assert m_same["BLEU-4"] > 0.99
    assert m_same["ROUGE-L"] > 0.99
    assert m_same["METEOR"] > 0.4
    m_diff = nlp_metrics.compute_all(preds[1:], refs[1:])
    assert m_diff["BLEU-4"] < 0.1
    assert m_diff["ROUGE-L"] < 0.3
    # CIDEr idf needs a multi-document corpus: matched corpus > swapped
    m_corpus = nlp_metrics.compute_all(preds, refs)
    m_swapped = nlp_metrics.compute_all([preds[1], preds[0]], refs)
    assert m_corpus["CIDEr"] > m_swapped["CIDEr"]


def test_segmentation_cv2_fallback(tmp_path):
    """C18 split+keyframe pipeline runs without ffmpeg (cv2 fallback):
    segments cover the timestamp bounds, keyframes land under the px
    cap, the spec is resumable."""
    import numpy as np
    cv2 = pytest.importorskip("cv2")

    from cogstream_tpu.datagen import segmentation as seg

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(60):   # 6 s at 10 fps
        w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    w.release()

    dur = seg.probe_duration(path)
    assert 5.0 < dur < 7.0
    spec = seg.split_and_sample(path, str(tmp_path / "out"), [3.0],
                                log=lambda *a: None)
    assert len(spec["segments"]) == 2
    for s in spec["segments"]:
        assert os.path.exists(s["path"])
        assert seg.probe_duration(s["path"]) > 1.0
        assert s["keyframes"], "no keyframes sampled"
        img = cv2.imread(s["keyframes"][0])
        assert img is not None and max(img.shape[:2]) <= 512
    # resumable: second call reloads the spec without rework
    again = seg.split_and_sample(path, str(tmp_path / "out"), [3.0],
                                 log=lambda *a: None)
    assert again == spec


def test_cv2_segment_failure_raises(tmp_path):
    """Decoding zero frames must raise, not record an empty segment."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from cogstream_tpu.datagen.segmentation import _cv2_segment

    path = str(tmp_path / "c.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (32, 32))
    for _ in range(10):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    out = str(tmp_path / "seg.mp4")
    with pytest.raises(RuntimeError, match="0 frames"):
        _cv2_segment(path, out, 50.0, 51.0)   # beyond the content
    assert not os.path.exists(out)
