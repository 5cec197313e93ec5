"""Processor training-label path: assistant spans, stream-role
supervision + negative sampling (ref _process_conversation_with_label,
processing_cogreasoner.py:530-608)."""

import numpy as np
import pytest

from cogstream_tpu.config import ProcessorConfig
from cogstream_tpu.processor.processing import CogStreamProcessor
from cogstream_tpu.processor.tokenizer import ByteTokenizer

IGNORE = -100


@pytest.fixture
def processor():
    tok = ByteTokenizer(image_token_id=1000)
    return CogStreamProcessor(tok, ProcessorConfig(image_token_id=1000))


def test_assistant_span_labeled(processor):
    convo = [
        {"role": "user", "content": "question here"},
        {"role": "assistant", "content": "the answer"},
    ]
    out = processor(convo, return_labels=True,
                    rng=np.random.default_rng(0))
    labels = out.labels
    assert labels is not None and labels.shape == out.input_ids.shape
    sup = labels != IGNORE
    assert sup.sum() > 0
    # supervised ids must match the input ids at those positions
    np.testing.assert_array_equal(out.input_ids[sup], labels[sup])
    # no supervision inside the user message span
    user_len = len(processor.tokenizer.encode("question here"))
    assert (labels[:user_len] == IGNORE).all()


def test_labels_without_flag_is_none(processor):
    out = processor([{"role": "user", "content": "q"}],
                    add_generation_prompt=True)
    assert out.labels is None
    assert out.input_ids.ndim == 1
