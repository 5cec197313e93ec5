"""Reference-free NLP metrics: BLEU-4, ROUGE-L, CIDEr, METEOR-lite.

Capability parity with step2c_basic_nlp_metrics.py (which wraps
pycocoevalcap + nltk). Implemented from the standard formulas in pure
numpy so the eval harness has no optional native deps:

* BLEU-4 — corpus-level, uniform weights, brevity penalty;
* ROUGE-L — LCS F-measure (beta=1.2 as in the ROUGE paper/pycoco);
* CIDEr — tf-idf weighted n-gram cosine (n=1..4), sigma=6 length
  penalty, corpus idf;
* METEOR-lite — harmonic unigram P/R (alpha=0.9) with a fragmentation
  penalty over exact matches. (Full METEOR stemming/synonymy needs
  WordNet; this keeps the same scale and ranking behavior on exact
  matches — a documented approximation.)
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def tokenize(s: str) -> List[str]:
    return _TOKEN_RE.findall(s.lower())


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU-4
# ---------------------------------------------------------------------------

def bleu4(predictions: Sequence[str], references: Sequence[str]) -> float:
    clipped = [0] * 4
    totals = [0] * 4
    pred_len = ref_len = 0
    for pred, ref in zip(predictions, references):
        p, r = tokenize(pred), tokenize(ref)
        pred_len += len(p)
        ref_len += len(r)
        for n in range(1, 5):
            pc, rc = _ngrams(p, n), _ngrams(r, n)
            totals[n - 1] += max(sum(pc.values()), 0)
            clipped[n - 1] += sum(min(c, rc[g]) for g, c in pc.items())
    if 0 in totals or 0 in clipped:
        return 0.0
    log_p = sum(0.25 * math.log(c / t) for c, t in zip(clipped, totals))
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    return bp * math.exp(log_p)


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------

def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l(predictions: Sequence[str], references: Sequence[str],
            beta: float = 1.2) -> float:
    scores = []
    for pred, ref in zip(predictions, references):
        p, r = tokenize(pred), tokenize(ref)
        lcs = _lcs_len(p, r)
        if lcs == 0:
            scores.append(0.0)
            continue
        prec, rec = lcs / len(p), lcs / len(r)
        scores.append((1 + beta ** 2) * prec * rec
                      / (rec + beta ** 2 * prec))
    return sum(scores) / len(scores) if scores else 0.0


# ---------------------------------------------------------------------------
# CIDEr
# ---------------------------------------------------------------------------

def cider(predictions: Sequence[str], references: Sequence[str],
          sigma: float = 6.0) -> float:
    n_docs = len(references)
    if n_docs == 0:
        return 0.0
    doc_freq: List[Dict[Tuple, int]] = [defaultdict(int) for _ in range(4)]
    ref_grams = []
    pred_grams = []
    for pred, ref in zip(predictions, references):
        p, r = tokenize(pred), tokenize(ref)
        pg = [_ngrams(p, n) for n in range(1, 5)]
        rg = [_ngrams(r, n) for n in range(1, 5)]
        pred_grams.append((pg, len(p)))
        ref_grams.append((rg, len(r)))
        for n in range(4):
            for g in rg[n]:
                doc_freq[n][g] += 1

    def tfidf(counts: Counter, n: int) -> Dict[Tuple, float]:
        total = max(sum(counts.values()), 1)
        out = {}
        for g, c in counts.items():
            idf = math.log(max(n_docs, 1)) - math.log(max(doc_freq[n][g], 1))
            out[g] = (c / total) * idf
        return out

    scores = []
    for (pg, plen), (rg, rlen) in zip(pred_grams, ref_grams):
        sim = 0.0
        for n in range(4):
            pv, rv = tfidf(pg[n], n), tfidf(rg[n], n)
            num = sum(min(pv[g], rv.get(g, 0.0)) * rv.get(g, 0.0)
                      for g in pv)
            norm_p = math.sqrt(sum(v * v for v in pv.values()))
            norm_r = math.sqrt(sum(v * v for v in rv.values()))
            if norm_p > 0 and norm_r > 0:
                sim += num / (norm_p * norm_r)
        delta = plen - rlen
        sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
        scores.append(2.5 * sim)   # 10/4 scaling as in CIDEr
    return sum(scores) / len(scores) if scores else 0.0


# ---------------------------------------------------------------------------
# METEOR-lite
# ---------------------------------------------------------------------------

def meteor_lite(predictions: Sequence[str], references: Sequence[str],
                alpha: float = 0.9, beta: float = 3.0,
                gamma: float = 0.5) -> float:
    scores = []
    for pred, ref in zip(predictions, references):
        p, r = tokenize(pred), tokenize(ref)
        if not p or not r:
            scores.append(0.0)
            continue
        # greedy positional exact alignment
        used = [False] * len(r)
        matches = []
        for i, tok in enumerate(p):
            for j, rt in enumerate(r):
                if not used[j] and rt == tok:
                    used[j] = True
                    matches.append((i, j))
                    break
        m = len(matches)
        if m == 0:
            scores.append(0.0)
            continue
        prec, rec = m / len(p), m / len(r)
        f = prec * rec / (alpha * prec + (1 - alpha) * rec)
        chunks = 1
        for (i0, j0), (i1, j1) in zip(matches, matches[1:]):
            if i1 != i0 + 1 or j1 != j0 + 1:
                chunks += 1
        penalty = gamma * (chunks / m) ** beta
        scores.append(f * (1 - penalty))
    return sum(scores) / len(scores) if scores else 0.0


def compute_all(predictions: Sequence[str],
                references: Sequence[str]) -> Dict[str, float]:
    if len(predictions) != len(references):
        # the metrics zip() pairwise — a mismatch would silently drop
        # the tail AND skew CIDEr's idf (n_docs = len(references))
        raise ValueError(
            f"{len(predictions)} predictions vs {len(references)} "
            "references")
    return {
        "BLEU-4": round(bleu4(predictions, references), 4),
        "METEOR": round(meteor_lite(predictions, references), 4),
        "ROUGE-L": round(rouge_l(predictions, references), 4),
        "CIDEr": round(cider(predictions, references), 4),
    }
