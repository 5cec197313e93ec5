"""Unified CLI (python -m cogstream_tpu) — judge + summarize commands."""

import json

import pytest

from cogstream_tpu.__main__ import main


@pytest.fixture
def pred_dir(tmp_path):
    d = tmp_path / "preds"
    d.mkdir()
    video = {"video": "v", "QAs": [
        {"question": "color?", "prediction": "red car",
         "answer": "red car", "label": "Basic", "coi": [],
         "pred_coi": [], "is_visual": True, "pred_visual": True},
    ]}
    (d / "v.json").write_text(json.dumps(video))
    return d


def test_cli_judge_and_summarize(pred_dir, tmp_path, capsys):
    out_dir = tmp_path / "judged"
    for metric in ("IA", "DC"):
        rc = main(["judge", "--metric", metric, "--pred-dir",
                   str(pred_dir), "--out-dir", str(out_dir),
                   "--model", "fake"])
        assert rc == 0
        # idempotent second run
        assert main(["judge", "--metric", metric, "--pred-dir",
                     str(pred_dir), "--out-dir", str(out_dir),
                     "--model", "fake"]) == 0

    # both metrics merged into one judged file
    judged = json.loads((out_dir / "v.json").read_text())
    assert set(judged["QAs"][0]["scores"]) == {"IA", "DC"}

    report_path = tmp_path / "report.json"
    rc = main(["summarize", "--judged-dir", str(out_dir),
               "--out", str(report_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Avg." in out
    report = json.loads(report_path.read_text())
    assert report["scores"]["average"] is not None


def test_cli_help_and_unknown(capsys):
    assert main([]) == 0
    assert "train-stage1" in capsys.readouterr().out
    assert main(["bogus"]) == 2
