"""Dialogue-path construction (C23).

Rebuild of dataset_gen_pipeline/dialogue_path_construction.py: merge the
raters' score matrices (disagreement keeps the max), turn edges >= R
into chain-of-inference (COI) links, then sample N dialogue streams per
video: every Dynamic-Updating QA, ~40% of L1 (with a coin-flip chained
L2 follow-up), K advanced (L3/L4) QAs per segment sampled by
softmax(score + chain-length boost) with auto-take at the max score,
plus the special classes (TP/DR). Each emitted QA carries
{segment_path, label Basic/Streaming/Global, is_visual, QA_pairs, coi}.
"""

from __future__ import annotations

import copy
import json
import math
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple
from ..utils.io import atomic_write_json

LEVEL_LABEL = {
    "L1": "Basic", "L2": "Basic", "CR": "Basic",
    "L3": "Streaming", "TP": "Streaming", "DR": "Streaming",
    "DU": "Streaming",
    "L4": "Global",
}

LEVEL_CLASS = {
    "L1": "Attribute", "CR": "Co-ref.", "L3": "Reasoning",
    "TP": "Sequence", "DR": "Dialogue", "DU": "Dynamic", "L4": "Overall",
}


def merge_score_matrices(raters: Sequence[Dict]) -> Dict:
    """Merge 1-2 raters' link stores; disagreements keep the max score
    (ref :133-138)."""
    merged: Dict = {}
    for links in raters:
        for ci, seg in links.items():
            mseg = merged.setdefault(ci, {})
            for qi, prevs in seg.items():
                mq = mseg.setdefault(qi, {})
                for pi, scores in prevs.items():
                    if pi in mq:
                        mq[pi] = [max(a, b) for a, b in
                                  zip(mq[pi], scores)]
                    else:
                        mq[pi] = list(scores)
    return merged


def coi_links(merged: Dict, threshold: int = 5) -> Dict:
    """Edges >= threshold become COI links: {(ci, qi): [prev_seg,...]}"""
    out: Dict[Tuple[int, int], List[int]] = {}
    for ci, seg in merged.items():
        for qi, prevs in seg.items():
            deps = [int(pi) for pi, scores in prevs.items()
                    if scores and max(scores) >= threshold]
            out[(int(ci), int(qi))] = sorted(deps)
    return out


def _flat_qas(seg: Dict) -> List[Tuple[str, Dict]]:
    out = []
    for level in ("L3", "L4", "TP", "DR"):
        for qa in seg.get("QAs", {}).get(level, []):
            out.append((level, qa))
    return out


def _softmax_sample(rng: random.Random, items: List, weights: List[float],
                    k: int) -> List:
    chosen = []
    items = list(items)
    weights = list(weights)
    for _ in range(min(k, len(items))):
        mx = max(weights)
        exps = [math.exp(w - mx) for w in weights]
        total = sum(exps)
        r = rng.random() * total
        acc = 0.0
        for i, e in enumerate(exps):
            acc += e
            if acc >= r:
                break
        chosen.append(items.pop(i))
        weights.pop(i)
    return chosen


def build_streams(
    video: Dict,
    merged_links: Dict,
    n_streams: int = 2,
    k_advanced: int = 2,
    coi_threshold: int = 5,
    chain_boost: float = 0.1,
    auto_take_score: int = 8,
    basic_rate: float = 0.4,
    seed: int = 0,
) -> List[Dict]:
    """Sample N dialogue streams. Returns a list of streams, each a list
    of per-QA records ordered by segment."""
    links = coi_links(merged_links, coi_threshold)
    segments = video.get("segments", [])
    streams: List[Dict] = []

    for si_stream in range(n_streams):
        rng = random.Random(seed * 1000 + si_stream)
        stream: List[Dict] = []
        chain_len: Dict[Tuple[int, int], int] = {}

        for ci, seg in enumerate(segments):
            qas = seg.get("QAs", {})
            selected: List[Tuple[str, Dict, List[int]]] = []

            for qa in qas.get("DU", []):          # all Dynamic-Updating
                selected.append(("DU", qa, []))

            basics = list(qas.get("L1", []))
            rng.shuffle(basics)
            take = max(1, int(len(basics) * basic_rate)) if basics else 0
            for qa in basics[:take]:
                selected.append(("L1", qa, []))
                # chained L2/co-ref follow-up by coin flip
                crs = qas.get("CR", [])
                if crs and rng.random() < 0.5:
                    selected.append(("CR", rng.choice(crs), []))

            adv = _flat_qas(seg)
            if adv:
                weights = []
                metas = []
                for qi, (level, qa) in enumerate(adv):
                    deps = links.get((ci, qi), [])
                    score = 0
                    prevs = merged_links.get(str(ci), {}).get(str(qi), {})
                    if prevs:
                        score = max((max(v) for v in prevs.values()
                                     if v), default=0)
                    boost = chain_boost * max(
                        (chain_len.get((d, 0), 0) for d in deps),
                        default=0)
                    weights.append(score + boost)
                    metas.append((level, qa, deps, score))
                auto = [m for m, w in zip(metas, weights)
                        if m[3] >= auto_take_score]
                rest = [m for m in metas if m not in auto]
                rest_w = [w for m, w in zip(metas, weights)
                          if m not in auto]
                picked = auto + _softmax_sample(
                    rng, rest, rest_w, k_advanced - len(auto))
                for level, qa, deps, _ in picked[:max(k_advanced, len(auto))]:
                    selected.append((level, qa, deps))
                    chain_len[(ci, 0)] = max(
                        chain_len.get((ci, 0), 0),
                        1 + max((chain_len.get((d, 0), 0) for d in deps),
                                default=0))

            for level, qa, deps in selected:
                stream.append({
                    "segment_path": ci,
                    "label": LEVEL_LABEL.get(level, "Basic"),
                    "class": qa.get("type", LEVEL_CLASS.get(level)),
                    "is_visual": level not in ("DR",),
                    "QA_pairs": [{"Q": qa.get("Q", ""),
                                  "A": qa.get("A", "")}],
                    "coi": deps,
                })
        streams.append({"stream": si_stream, "QAs": stream})
    return streams


def run_path_construction(scored_dir: str, qa_dir: str, out_dir: str,
                          n_streams: int = 2, threshold: int = 5,
                          seed: int = 0, log=print) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(qa_dir)):
        if not fname.endswith(".json"):
            continue
        out_path = os.path.join(out_dir, fname)
        if os.path.exists(out_path):   # resumable
            continue
        with open(os.path.join(qa_dir, fname)) as f:
            video = json.load(f)
        raters = []
        spath = os.path.join(scored_dir, fname)
        if os.path.exists(spath):
            with open(spath) as f:
                raters.append(json.load(f).get("links", {}))
        merged = merge_score_matrices(raters)
        streams = build_streams(video, merged, n_streams=n_streams,
                                coi_threshold=threshold, seed=seed)
        atomic_write_json(out_path, {"video": video.get("video"), "streams": streams}, indent=1)
        log(f"{fname}: {n_streams} streams")
