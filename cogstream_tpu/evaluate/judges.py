"""LLM-judge clients + the five CogStream metrics (C16).

The reference evaluates with five rubric metrics — IA (informational
accuracy), DC (detail completeness), CA (context awareness), TP
(temporal precision), LC (logical consistency) — each a judge-LLM call
whose numeric scores are regex-extracted (evaluate/eval_metrics/
eval_{1..5}_*.py). Its judge clients ``utils.Deepseekv3``/``utils.GPT``
are imported but ABSENT from the repo (eval_1_IA.py:4-5); here the
client is an explicit interface with two implementations:

* ``FakeJudge`` — deterministic, offline; the test backend the
  reference never had (SURVEY.md §4 implication);
* ``OpenAICompatJudge`` — any OpenAI-compatible endpoint, with retry
  + backoff + token accounting (the C22 client behavior).

Prompts are our own wording of the same rubrics; each asks for
``Score: N`` lines so extraction is one regex.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Dict, List, Optional, Protocol, Sequence
from ..utils.io import atomic_write_json

SCORE_RE = re.compile(r"[Ss]core\s*[:=]\s*(\d+(?:\.\d+)?)")


class JudgeClient(Protocol):
    def chat(self, system: str, user: str) -> str: ...


class FakeJudge:
    """Deterministic offline judge: scores derive from a stable hash of
    the (prediction, ground truth) pair, biased upward when the strings
    share tokens — monotone enough for pipeline tests."""

    def __init__(self, seed: int = 0):
        self.seed = seed
        self.calls = 0

    def _score(self, pred: str, gt: str) -> int:
        self.calls += 1
        h = int(hashlib.sha1(
            f"{self.seed}|{pred}|{gt}".encode()).hexdigest(), 16)
        base = h % 4                      # 0..3 noise
        p, g = set(pred.lower().split()), set(gt.lower().split())
        overlap = len(p & g) / max(len(g), 1)
        return min(10, int(round(base + 7 * overlap)))

    def chat(self, system: str, user: str) -> str:
        # GT capture runs to the next item boundary (or end) — a lazy
        # stop at the first newline would score multi-line ground
        # truths against their first line only, breaking the
        # monotone overlap->score property tests rely on
        pairs = re.findall(
            r"Prediction\s*\d*\s*:\s*(.*?)\nGround truth\s*\d*\s*:\s*"
            r"(.*?)(?=\n\s*(?:Item|Prediction|Question)\b|\Z)",
            user, re.DOTALL)
        if not pairs:
            return "Score: 5"
        return "\n".join(f"Score: {self._score(p, g)}" for p, g in pairs)


class OpenAICompatJudge:
    """Judge over any OpenAI-compatible endpoint. Thin adapter around
    datagen.client.MLLMClient so the retry/backoff/fallback/usage logic
    lives in exactly one place (C22)."""

    def __init__(self, model: str, api_key: Optional[str] = None,
                 base_url: Optional[str] = None, max_retries: int = 5,
                 fallback_model: Optional[str] = None, backoff=None):
        from ..datagen.client import MLLMClient

        self._client = MLLMClient(
            model, api_key=api_key, base_url=base_url,
            max_retries=max_retries, fallback_model=fallback_model,
            temperature=0.0, backoff=backoff)

    @property
    def prompt_tokens(self):
        return self._client.prompt_tokens

    @property
    def completion_tokens(self):
        return self._client.completion_tokens

    def chat(self, system: str, user: str) -> str:
        return self._client.chat(user, system=system)


def extract_scores(text: str) -> List[float]:
    return [float(m) for m in SCORE_RE.findall(text)]


# ---------------------------------------------------------------------------
# the five metrics
# ---------------------------------------------------------------------------

_SYSTEM = ("You are a strict grader for streaming video question "
           "answering. Score each item 0-10 and reply with one "
           "'Score: N' line per item, nothing else.")

METRIC_RUBRICS = {
    "IA": ("Informational accuracy: does the prediction convey the same "
           "facts as the ground truth answer? Penalize wrong or missing "
           "facts; ignore style."),
    "DC": ("Detail completeness: how fully does the prediction cover the "
           "details present in the ground truth and the cited context "
           "turns? Penalize omissions."),
    "CA": ("Context awareness: does the prediction correctly use the "
           "dialogue history it depends on? Penalize contradictions with "
           "earlier turns."),
    "TP": ("Temporal precision: are events, orderings and timestamps "
           "consistent with the ground truth timeline? Penalize wrong "
           "times or misordered events."),
    "LC": ("Logical consistency: is the prediction internally coherent "
           "and consistent with the question's presuppositions?"),
}


def build_judge_prompt(metric: str,
                       items: Sequence[Dict],
                       context: Optional[str] = None) -> str:
    """items: [{"question", "prediction", "ground_truth"}]."""
    parts = [METRIC_RUBRICS[metric], ""]
    if context:
        parts += ["Context (earlier dialogue turns):", context, ""]
    for i, it in enumerate(items, 1):
        parts += [f"Item {i}:",
                  f"Question {i}: {it['question']}",
                  f"Prediction {i}: {it['prediction']}",
                  f"Ground truth {i}: {it['ground_truth']}", ""]
    parts.append(f"Give exactly {len(items)} 'Score: N' lines.")
    return "\n".join(parts)


# metric → QAs per judge call (IA batches 5, the rest 1 — ref eval_1..5)
METRIC_BATCH = {"IA": 5, "DC": 1, "CA": 1, "TP": 1, "LC": 1}


def judge_video(
    metric: str,
    client: JudgeClient,
    qa_items: Sequence[Dict],
    contexts: Optional[Sequence[Optional[str]]] = None,
) -> List[Optional[float]]:
    """Score one video's QA list; returns one score (or None) per item."""
    bsz = METRIC_BATCH[metric]
    scores: List[Optional[float]] = []
    for i in range(0, len(qa_items), bsz):
        chunk = qa_items[i:i + bsz]
        ctx = contexts[i] if contexts and bsz == 1 else None
        text = client.chat(_SYSTEM, build_judge_prompt(metric, chunk, ctx))
        got = extract_scores(text)
        got += [None] * (len(chunk) - len(got))
        scores.extend(got[:len(chunk)])
    return scores


def judge_directory(
    metric: str,
    client: JudgeClient,
    pred_dir: str,
    out_dir: str,
    coi_context: bool = False,
    log=print,
) -> None:
    """Batch-judge every prediction file; idempotent skip of existing
    outputs (ref eval_1_IA.py:107-109)."""
    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(pred_dir)):
        if not fname.endswith(".json"):
            continue
        out_path = os.path.join(out_dir, fname)
        if os.path.exists(out_path):
            # merge-resume: all five metrics accumulate into ONE judged
            # file; a metric already present is skipped (the reference
            # needs one directory per metric, eval_1_IA.py:107-109).
            # None (a failed extraction) does NOT count as judged — it
            # must retry, not silently drop out of every aggregate.
            with open(out_path) as f:
                video = json.load(f)
            if all((qa.get("scores") or {}).get(metric) is not None
                   for qa in video.get("QAs", [])):
                continue
        else:
            with open(os.path.join(pred_dir, fname)) as f:
                video = json.load(f)
        # judge ONLY the QAs missing this metric (a partial file must
        # not re-spend the judge endpoint on — or overwrite — scored
        # ones)
        todo = [i for i, qa in enumerate(video.get("QAs", []))
                if (qa.get("scores") or {}).get(metric) is None]
        items, contexts = [], []
        all_qas = video.get("QAs", [])
        for i in todo:
            qa = all_qas[i]
            items.append({
                "question": qa.get("question", ""),
                "prediction": qa.get("prediction", ""),
                "ground_truth": qa.get("answer", ""),
            })
            ctx = None
            if coi_context:
                from .aggregate import gt_qa_indices

                deps = gt_qa_indices(qa) or []
                lines = []
                for j in deps:
                    # bound by the CURRENT QA's index, not the list
                    # length — a malformed dep >= i would leak this (or
                    # a later) QA's ground-truth answer into the prompt
                    # judging it
                    if isinstance(j, int) and 0 <= j < i:
                        h = all_qas[j]
                        lines.append(f"Q: {h.get('question','')} "
                                     f"A: {h.get('answer','')}")
                ctx = "\n".join(lines) or None
            contexts.append(ctx)
        scores = judge_video(metric, client, items, contexts)
        for i, s in zip(todo, scores):
            all_qas[i].setdefault("scores", {})[metric] = s
        scores = [(qa.get("scores") or {}).get(metric)
                  for qa in all_qas]   # full set, for the log line
        atomic_write_json(out_path, video, indent=1)
        log(f"{metric} {fname}: "
            f"{np_mean([s for s in scores if s is not None]):.2f}")


def np_mean(xs):
    return sum(xs) / len(xs) if xs else float("nan")
