"""C17 label-taxonomy golden parity vs the ACTUAL reference tables.

step1b_statistic_score.py runs its whole aggregation at import time, so
instead of importing it the test lifts the ``levels`` (alias merge) and
``LEVELS`` (class → group) dict literals out of its AST and checks that
our ``label_group``/``canonical_label`` route every published label to
the same group and alias-merged class the reference would
(step1b_statistic_score.py:22-44,49-62)."""

import ast
import os

import pytest

from cogstream_tpu.evaluate.aggregate import canonical_label, label_group

REF = "/root/reference/evaluate/analysis/step1b_statistic_score.py"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference tree not mounted")


def _ref_tables():
    tree = ast.parse(open(REF, encoding="utf-8").read())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name) \
                and node.targets[0].id in ("levels", "LEVELS"):
            out[node.targets[0].id] = ast.literal_eval(node.value)
    assert set(out) == {"levels", "LEVELS"}, "reference tables moved"
    return out["levels"], out["LEVELS"]


def test_every_reference_label_routes_to_the_same_group():
    aliases, groups = _ref_tables()
    for group, labels in groups.items():
        for label in labels:
            assert label_group(label) == group, (label, group)


def test_alias_merge_matches_reference():
    """The reference folds the Streaming/Reasoning family into one
    class before per-class means; canonical_label must agree for every
    alias it lists."""
    aliases, _ = _ref_tables()
    for target, members in aliases.items():
        for m in members:
            assert canonical_label(m) == target, (m, target)


def test_reference_raising_cases_degrade_gracefully():
    """Where the reference raises (unknown label), we aggregate by the
    group prefix instead — documented delta, but known groups must
    still map exactly (covered above)."""
    assert label_group("Streaming/Some Future Class") == "Streaming"
    assert label_group("NotAGroup/Thing") is None
    assert label_group("") is None
