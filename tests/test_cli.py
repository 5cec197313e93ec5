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


def test_cli_export_hf_with_adapter(tmp_path, capsys):
    """export-hf merges a trained adapter into the base and writes an
    HF-layout checkpoint that loads back with the merged weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cogstream_tpu.config import CogReasonerConfig, LoRAConfig
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.checkpoint import (
        load_cogreasoner_from_hf, save_cogreasoner_to_hf)
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.models.lora import init_cogreasoner_lora
    from cogstream_tpu.train.checkpoint import save_lora_adapter

    cfg = CogReasonerConfig.tiny()
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    base = str(tmp_path / "base")
    save_cogreasoner_to_hf(params, cfg, base, dtype=jnp.float32)

    lora = init_cogreasoner_lora(jax.random.PRNGKey(1), cfg,
                                 LoRAConfig(rank=2))
    lora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(
            jax.random.PRNGKey(2), x.shape, x.dtype), lora)
    adapter = save_lora_adapter(str(tmp_path), lora, name="full_module")

    from cogstream_tpu.__main__ import main
    out = str(tmp_path / "merged")
    rc = main(["export-hf", "--model-dir", base, "--out", out,
               "--adapter", adapter])
    assert rc == 0

    merged = load_cogreasoner_from_hf(out, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 200, size=(1, 8)), jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    want, _ = qwen2.qwen2_forward(
        params["text"], qwen2.embed(params["text"], ids), pos, cfg.text,
        adapters=[(lora["text"], jnp.float32(1.0))])
    got, _ = qwen2.qwen2_forward(
        merged["text"], qwen2.embed(merged["text"], ids), pos, cfg.text)
    # config.json records torch_dtype, so the f32 base round-trips at
    # f32 through export-hf — no silent bf16 truncation
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
