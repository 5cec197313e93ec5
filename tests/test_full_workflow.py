"""The reference's COMPLETE published workflow, end to end, through the
real CLI — one hermetic test on the tiny model:

  segment-videos   C18   (reference: split_videos.py)
  datagen          C19-C24 with the offline FakeMLLM (generation.py →
                   reformating.py → scoring.py →
                   dialogue_path_construction.py → data_formating.py)
  train-stage1     C12   selector LoRA off the generated dataset
                   (first_stage_training.py)
  train-stage2     C13   interleave LoRA off the published query-chain
                   layout + per-segment video files
                   (second_stage_training.py)
  answer-generate  C15   FCC inference with BOTH trained adapters
                   (answer_generate.py)
  judge ×5         C16   IA/DC/CA/TP/LC with the FakeJudge
  summarize        C17   aggregation incl. COI metrics
  nlp-metrics      C17   BLEU/METEOR-lite/ROUGE-L/CIDEr

The reference can only run this chain against real GPUs + live LLM
APIs; here the whole loop is a test. Every hand-off uses the on-disk
layouts the published artifacts use (query chains with
``info.Event_Time``/``info.relevance``, naturally-sorted per-segment
video files, per-video prediction JSONs)."""

import json
import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cogstream_tpu.__main__ import main


def _read(path):
    with open(path) as f:
        return json.load(f)


@pytest.mark.slow
def test_full_published_workflow(tmp_path):
    root = tmp_path

    # --- 0. a tiny raw video --------------------------------------------
    vid = str(root / "movie.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(7)
    for _ in range(60):                       # 6 s @ 10 fps
        w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    w.release()

    # --- 1. segmentation (C18) ------------------------------------------
    segroot = str(root / "segmented")
    assert main(["segment-videos", "--video", vid,
                 "--timestamps", "2.0,4.0", "--out-root", segroot]) == 0
    spec = _read(os.path.join(segroot, "movie.json"))
    assert len(spec["segments"]) == 3
    assert all(s["keyframes"] for s in spec["segments"])

    # --- 2. datagen (C19-C24, FakeMLLM) ----------------------------------
    dg = str(root / "datagen")
    assert main(["datagen", "--segments-dir", segroot, "--out-root", dg,
                 "--model", "fake"]) == 0
    dataset_dir = os.path.join(dg, "dataset")
    chains_dir = os.path.join(dataset_dir, "query_chains")
    chains = _read(os.path.join(chains_dir, "movie.json"))["query_chains"]
    assert chains and chains[0], "datagen must emit query chains"
    qa0 = chains[0][0]
    assert isinstance(qa0["Q"], list) and "Event_Time" in qa0["info"]
    # distinct event times must sort in segment order (eval loader zips
    # sorted times with naturally-sorted segment files)
    times = [q["info"]["Event_Time"] for q in chains[0]]
    assert times == sorted(times), "times regress across the chain"

    # --- 3. a tiny HF-layout base checkpoint -----------------------------
    import jax
    import jax.numpy as jnp

    from cogstream_tpu.config import CogReasonerConfig
    from cogstream_tpu.models.checkpoint import save_cogreasoner_to_hf
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    base = str(root / "base")
    save_cogreasoner_to_hf(params, cfg, base, dtype=jnp.float32)

    # --- 4. stage-1 selector LoRA off the generated dataset --------------
    s1 = str(root / "stage1")
    assert main(["train-stage1", "--qa-json", dataset_dir,
                 "--model-dir", base, "--out", s1,
                 "--epochs", "1", "--batch-size", "2"]) == 0
    lang = os.path.join(s1, "language_module.npz")
    assert os.path.exists(lang)

    # --- 5. published eval layout: per-video dir of segment files --------
    eval_videos = root / "eval_videos" / "movie"
    eval_videos.mkdir(parents=True)
    for seg in spec["segments"]:
        shutil.copy(seg["path"], str(eval_videos))

    # --- 6. stage-2 interleave LoRA off the query-chain layout -----------
    s2 = str(root / "stage2")
    assert main(["train-stage2", "--model-dir", base,
                 "--video-dir", str(root / "eval_videos"),
                 "--query-dir", chains_dir, "--out", s2,
                 "--num-epochs", "1"]) == 0
    full = os.path.join(s2, "full_module.npz")
    assert os.path.exists(full)

    # --- 7. answer generation with both adapters (FCC) -------------------
    preds = str(root / "preds")
    assert main(["answer-generate", "--model-dir", base,
                 "--lora-adapter-1", lang, "--lora-adapter-2", full,
                 "--video-dir", str(root / "eval_videos"),
                 "--query-dir", chains_dir, "--save-dir", preds,
                 "--mode", "FCC", "--max-new-tokens", "8"]) == 0
    out = _read(os.path.join(preds, "movie.json"))
    assert out["QAs"], "eval must produce per-QA predictions"
    assert all("prediction" in q and "pred_coi" in q for q in out["QAs"])
    assert len(out["QAs"]) == len(chains[0])

    # --- 8. judges, aggregation, NLP metrics -----------------------------
    judged = str(root / "judged")
    for metric in ("IA", "DC", "CA", "TP", "LC"):
        assert main(["judge", "--metric", metric, "--pred-dir", preds,
                     "--out-dir", judged, "--model", "fake"]) == 0
    scores = _read(os.path.join(judged, "movie.json"))["QAs"][0]["scores"]
    assert set(scores) == {"IA", "DC", "CA", "TP", "LC"}

    report_path = str(root / "report.json")
    assert main(["summarize", "--judged-dir", judged,
                 "--out", report_path]) == 0
    report = _read(report_path)
    assert report["scores"]["average"] is not None
    assert report["coi"]["f1"] is not None

    assert main(["nlp-metrics", "--pred-dir", preds]) == 0
