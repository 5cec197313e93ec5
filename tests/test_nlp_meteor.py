"""Full METEOR (evaluate/nlp_metrics.py) vs the reference's scorer.

The reference scores METEOR via ``nltk.translate.meteor_score``
(step2c_basic_nlp_metrics.py:26-49): exact → Porter-stem → WordNet
synonym alignment with alpha=0.9 beta=3 gamma=0.5. This image ships
nltk but NOT the WordNet corpus (and has no egress), so:

* numeric parity with nltk is pinned EXACTLY on the exact+stem stages
  (nltk run with a stubbed empty WordNet — the only part of the
  algorithm whose data this image has);
* the synonym stage is exercised against the bundled common-synonym
  table (the documented WordNet stand-in).
"""

import pytest

from cogstream_tpu.evaluate import nlp_metrics
from cogstream_tpu.evaluate.nlp_metrics import (default_synonyms, meteor,
                                                meteor_single, tokenize)

nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")


class _EmptyWordnet:
    """A WordNet reader whose every synset lookup is empty — reduces
    nltk METEOR to its exact+stem stages (the WordNet corpus itself is
    not installed on this image)."""

    def synsets(self, word):
        return []


CASES = [
    ("the quick brown fox jumps over the lazy dog",
     "a quick brown dog jumps over the lazy fox"),
    ("it is a guide to action which ensures that the military always "
     "obeys the commands of the party",
     "it is a guide to action that ensures that the military will "
     "forever heed party commands"),
    ("the man is cooking dinner in the kitchen",
     "a person prepares a meal in the kitchen"),
    ("completely unrelated words here", "nothing matches at all"),
    ("exact match sentence", "exact match sentence"),
    ("running runs runner", "run running runs"),
    ("", "empty hypothesis"),
    ("empty reference", ""),
]


def test_meteor_matches_nltk_exact_and_stem():
    """Bit-for-bit numeric agreement with nltk's single_meteor_score
    when both run the exact+stem stages only (empty synonym sets)."""
    for pred, ref in CASES:
        p, r = tokenize(pred), tokenize(ref)
        if not p or not r:
            # nltk raises ZeroDivision-guarded 0.0 the same way
            assert meteor_single(p, r,
                                 synonyms=lambda w: frozenset()) == 0.0
            continue
        want = nltk_meteor.single_meteor_score(
            r, p, wordnet=_EmptyWordnet())
        got = meteor_single(p, r, synonyms=lambda w: frozenset())
        assert got == pytest.approx(want, rel=1e-12), (pred, ref)


def test_corpus_meteor_matches_nltk_mean():
    pairs = [(p, r) for p, r in CASES if tokenize(p) and tokenize(r)]
    want = sum(
        nltk_meteor.single_meteor_score(tokenize(r), tokenize(p),
                                        wordnet=_EmptyWordnet())
        for p, r in pairs) / len(pairs)
    got = meteor([p for p, _ in pairs], [r for _, r in pairs],
                 synonyms=lambda w: frozenset())
    assert got == pytest.approx(want, rel=1e-12)


def test_synonym_stage_adds_matches():
    """The bundled table must recover synonym-only matches the
    exact+stem stages miss — and never lower a score."""
    pred = "the large dog sits on the sofa"
    ref = "the big canine sits on the couch"
    no_syn = meteor([pred], [ref], synonyms=lambda w: frozenset())
    with_syn = meteor([pred], [ref])   # default: bundled table
    assert with_syn > no_syn
    # large/big, dog/canine, sofa/couch all land → full unigram overlap
    assert with_syn > 0.9


def test_default_synonyms_symmetric_sets():
    assert "big" in default_synonyms("large")
    assert "large" in default_synonyms("big")
    assert default_synonyms("zzz-not-a-word") == frozenset()


def test_compute_all_reports_real_meteor():
    out = nlp_metrics.compute_all(
        ["paris is the capital of france"],
        ["the capital of france is paris"])
    assert 0.0 < out["METEOR"] <= 1.0
    assert set(out) == {"BLEU-4", "METEOR", "ROUGE-L", "CIDEr"}


def test_expanded_synonym_table_scale_and_quality():
    """Round-4 table (synonyms_data.SYNONYM_GROUPS): ~10x round 3's
    coverage, symmetric, sane (no self-only groups, lowercase ascii,
    no phrase entries — METEOR matches single tokens)."""
    from cogstream_tpu.evaluate.synonyms_data import SYNONYM_GROUPS
    from cogstream_tpu.evaluate.nlp_metrics import _bundled_synonyms

    assert len(SYNONYM_GROUPS) >= 500
    words = {w for g in SYNONYM_GROUPS for w in g}
    assert len(words) >= 1500
    for g in SYNONYM_GROUPS:
        assert len(g) >= 2, g
        for w in g:
            assert w == w.lower() and " " not in w, w
    table = _bundled_synonyms()
    # symmetry via the shared-group closure
    for a in ("vehicle", "rapidly", "gorgeous", "inquire"):
        for b in table[a]:
            assert a in table[b], (a, b)
    # spot semantic checks across parts of speech
    assert "automobile" in table["car"]
    assert "hurl" in table["throw"]
    assert "approximately" in table["about"]
    assert "gorgeous" in table["beautiful"]
