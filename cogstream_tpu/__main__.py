"""Unified CLI: ``python -m cogstream_tpu <command> ...``

Commands map onto the reference's script entry points (README.md:65-119
of the reference) plus the serving front-end this framework adds:

  train-stage1     selector LoRA training        (torchrun first_stage_training.py)
  train-stage2     interleave-reasoning training (accelerate second_stage_training.py)
  answer-generate  test-set inference            (torchrun answer_generate.py)
  judge            run one LLM-judge metric      (eval_{1..5}_*.py)
  summarize        aggregate judged scores       (analysis/step1*.py)
  nlp-metrics      BLEU/METEOR/ROUGE-L/CIDEr     (step2c_basic_nlp_metrics.py)
  segment-videos   split raw videos + sample keyframes (C18)
  datagen          full C19-C24 pipeline over segment specs
  serve            HTTP streaming-session server (no reference analogue)
  export-hf        merge LoRA adapters + write an HF-layout checkpoint
                   (PEFT merge_and_unload + save_pretrained parity)
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    sys.argv = [f"cogstream_tpu {cmd}"] + rest
    if cmd == "train-stage1":
        from .train.stage1 import main as run
    elif cmd == "train-stage2":
        from .train.stage2 import main as run
    elif cmd == "answer-generate":
        from .evaluate.answer_generate import main as run
    elif cmd == "serve":
        from .runtime.serve import main as run
    elif cmd == "judge":
        import argparse

        from .evaluate import judges

        ap = argparse.ArgumentParser()
        ap.add_argument("--metric", required=True,
                        choices=sorted(judges.METRIC_RUBRICS))
        ap.add_argument("--pred-dir", required=True)
        ap.add_argument("--out-dir", required=True)
        ap.add_argument("--model", default="fake",
                        help="'fake' or an OpenAI-compatible model name")
        args = ap.parse_args(rest)
        client = (judges.FakeJudge() if args.model == "fake"
                  else judges.OpenAICompatJudge(args.model))
        judges.judge_directory(args.metric, client, args.pred_dir,
                               args.out_dir,
                               coi_context=args.metric == "DC")
        return 0
    elif cmd == "summarize":
        import argparse
        import json

        from .evaluate import aggregate

        ap = argparse.ArgumentParser()
        ap.add_argument("--judged-dir", required=True)
        ap.add_argument("--out")
        args = ap.parse_args(rest)
        report = aggregate.summarize(args.judged_dir, args.out)
        print(aggregate.format_table(report))
        return 0
    elif cmd == "segment-videos":
        import argparse
        import json as _json

        from .datagen.segmentation import split_and_sample

        ap = argparse.ArgumentParser()
        ap.add_argument("--video", required=True)
        ap.add_argument("--timestamps", required=True,
                        help="comma-separated cut points in seconds")
        ap.add_argument("--out-root", required=True)
        args = ap.parse_args(rest)
        ts = [float(t) for t in args.timestamps.split(",") if t.strip()]
        spec = split_and_sample(args.video, args.out_root, ts)
        print(_json.dumps({"segments": len(spec["segments"])}))
        return 0
    elif cmd == "datagen":
        import argparse
        import json as _json
        import os

        from .datagen import (
            dialogue_path, formatting, generation, reformatting, scoring)
        from .datagen.client import FakeMLLM, MLLMClient
        from .utils.io import atomic_write_json

        ap = argparse.ArgumentParser()
        ap.add_argument("--segments-dir", required=True,
                        help="per-video segment specs (C18 output)")
        ap.add_argument("--out-root", required=True)
        ap.add_argument("--model", default="fake",
                        help="'fake' or an OpenAI-compatible model name")
        ap.add_argument("--n-streams", type=int, default=2)
        ap.add_argument("--coi-threshold", type=int, default=5)
        ap.add_argument("--seed", type=int, default=0)
        args = ap.parse_args(rest)
        client = (FakeMLLM(args.seed) if args.model == "fake"
                  else MLLMClient(args.model))

        qa_dir = os.path.join(args.out_root, "qas")
        remix_dir = os.path.join(args.out_root, "remixed")
        score_dir = os.path.join(args.out_root, "scores")
        path_dir = os.path.join(args.out_root, "streams")
        final_dir = os.path.join(args.out_root, "dataset")

        generation.run_generation(client, args.segments_dir, qa_dir,
                                  seed=args.seed)
        os.makedirs(remix_dir, exist_ok=True)
        for fname in sorted(os.listdir(qa_dir)):
            if not fname.endswith(".json"):
                continue
            out_path = os.path.join(remix_dir, fname)
            if os.path.exists(out_path):
                continue
            with open(os.path.join(qa_dir, fname)) as f:
                video = _json.load(f)
            video = reformatting.cap_counts(
                reformatting.remix(video, seed=args.seed), seed=args.seed)
            atomic_write_json(out_path, video)
        scoring.run_scoring(client, remix_dir, score_dir)
        dialogue_path.run_path_construction(
            score_dir, remix_dir, path_dir, n_streams=args.n_streams,
            threshold=args.coi_threshold, seed=args.seed)
        stats = formatting.format_dataset(path_dir, remix_dir, final_dir)
        print(_json.dumps(stats))
        return 0
    elif cmd == "export-hf":
        import argparse

        ap = argparse.ArgumentParser()
        ap.add_argument("--model-dir", required=True,
                        help="base HF checkpoint directory")
        ap.add_argument("--out", required=True)
        ap.add_argument("--adapter", action="append", default=[],
                        help="LoRA .npz to merge (repeatable)")
        ap.add_argument("--lora-scale", type=float, default=2.0)
        args = ap.parse_args(rest)

        from .config import load_hf_config
        from .models.checkpoint import (
            load_cogreasoner_from_hf, merge_lora, save_cogreasoner_to_hf)
        from .train.checkpoint import load_lora_adapter

        cfg = load_hf_config(f"{args.model_dir}/config.json")
        params = load_cogreasoner_from_hf(args.model_dir, cfg)
        for path in args.adapter:
            tree = load_lora_adapter(path)
            if "text" not in tree:      # bare decoder adapter (stage-1)
                tree = {"text": tree}
            params = merge_lora(params, tree,
                                lora_scale=args.lora_scale)
        out = save_cogreasoner_to_hf(params, cfg, args.out)
        print(f"exported {out}")
        return 0
    elif cmd == "nlp-metrics":
        import argparse
        import json

        from .evaluate import nlp_metrics
        from .evaluate.aggregate import load_judged_dir

        ap = argparse.ArgumentParser()
        ap.add_argument("--pred-dir", required=True)
        args = ap.parse_args(rest)
        preds, refs = [], []
        for video in load_judged_dir(args.pred_dir):
            for qa in video.get("QAs", []):
                preds.append(qa.get("prediction", ""))
                refs.append(qa.get("answer", ""))
        print(json.dumps(nlp_metrics.compute_all(preds, refs)))
        return 0
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        return 2
    run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
