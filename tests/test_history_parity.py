"""C9 history-rewrite golden parity vs the ACTUAL reference
``process_input_ids`` (cogreasoner_chat.py:121-177): on reference-style
serializations (visuals embedded in user turns) the rebuild
(runtime/history.rewrite_history) must be byte-identical across
selection subsets and the visual/no-visual branches. The rebuild also
handles this framework's ``stream``-role blocks, which the reference
never emits — covered by the engine/session suites."""

import importlib
import os
import sys
import types

import pytest

from cogstream_tpu.runtime.history import parse_selection, rewrite_history

REF_DIR = "/root/reference/model"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_rewrite():
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodel"] = pkg
    return importlib.import_module(
        "refmodel.cogreasoner_chat").process_input_ids


VIS1 = "Time 0.0s:<image><image>,Time 1.0s:<image>"
VIS2 = "Time 2.0s:<image>,Time 3.0s:<image><image>"

CONV = (
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    f"<|im_start|>user\n{VIS1}\nwhat color is the car?<|im_end|>\n"
    "<|im_start|>assistant\nred.<|im_end|>\n"
    f"<|im_start|>user\n{VIS2}\nand the truck?<|im_end|>\n"
    "<|im_start|>assistant\nblue.<|im_end|>\n"
    "<|im_start|>user\nwhich came first?<|im_end|>\n"
)

HIST_QS = ["what color is the car?", "and the truck?"]
HIST_AS = ["red.", "blue."]
CURRENT = "which came first?"


@pytest.mark.parametrize("if_visual,kept", [
    (True, [0, 1]),    # keep everything
    (True, [1]),       # drop turn 0's QA → its visual block orphans
    (True, []),        # drop all history, visuals stay
    (False, [0]),      # no-visual branch strips Time blocks
    (False, []),
])
def test_rewrite_matches_reference(ref_rewrite, if_visual, kept):
    qs = [HIST_QS[i] for i in kept]
    as_ = [HIST_AS[i] for i in kept]
    want = ref_rewrite(CONV, if_visual, qs, as_, CURRENT, None)
    got = rewrite_history(CONV, if_visual, qs, as_, CURRENT)
    assert got == want


def test_parse_selection_matches_reference_semantics():
    """prepare_inputs (ref :478-499) semantics: 'no' clears the visual
    flag, non-integers are skipped."""
    assert parse_selection("[yes,0,5]") == (True, [0, 5])
    assert parse_selection("[no,2]") == (False, [2])
    assert parse_selection("[yes]") == (True, [])
    assert parse_selection("[yes,x,3]") == (True, [3])


@pytest.mark.parametrize("include_demo,n_hist", [
    (True, 3), (False, 3), (True, 0),
])
def test_selector_prompt_matches_reference(include_demo, n_hist):
    """C8: build_selector_prompt is byte-identical with the reference
    format_example (qaselect_module_predict.py:5-61) — a stage-1-trained
    adapter must see the exact serialization it was trained on."""
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodel"] = pkg
    ref_fmt = importlib.import_module(
        "refmodel.qaselect_module_predict").format_example

    from cogstream_tpu.runtime.retrieval import build_selector_prompt

    qs = [f"question {i}?" for i in range(n_hist)]
    as_ = [f"answer {i}." for i in range(n_hist)]
    cur = "what happens next?"
    want = ref_fmt({"current_Q": cur, "hist_Qs": qs, "hist_As": as_},
                   include_demo=include_demo)
    got = build_selector_prompt(cur, qs, as_, include_demo=include_demo)
    assert got == want


def test_summary_prompt_matches_reference():
    """C7: the event-summary prompt our batch builder tokenizes is
    byte-identical with the reference create_visual_summary_prompt
    (cogreasoner_chat.py:93-119) — compared in token space through the
    1-token-per-char ByteTokenizer, which makes id equality text
    equality."""
    import numpy as np

    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodel"] = pkg
    ref_prompt = importlib.import_module(
        "refmodel.cogreasoner_chat").create_visual_summary_prompt

    from cogstream_tpu.models.cogreasoner import build_summary_batch
    from cogstream_tpu.processor.tokenizer import ByteTokenizer

    tok = ByteTokenizer(image_token_id=300)
    P = 4                                   # patches per frame
    ts = np.array([0.0, 1.5, 3.0], np.float64)
    batch = build_summary_batch(tok, np.zeros((3,), np.int64), ts, P, 1)

    want_text = ref_prompt(P * len(ts), [float(t) for t in ts])
    want_ids = tok.encode(want_text)
    n = int((batch.positions[0] >= 0).sum())
    assert batch.input_ids[0][:n].tolist() == want_ids
