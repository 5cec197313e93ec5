"""Golden prompt-serialization parity vs the reference processor.

Loads ``/root/reference/model/processing_cogreasoner.py`` read-only
(importlib, with stubs for its GPU-island deps) and byte-compares the
serialized conversation text that a reference-trained checkpoint saw —
``_load_multimodal_data`` timestamp semantics (trim_time fractional
alignment, per-segment +1 s offsets, start/end filtering) composed with
the Jinja chat template — against this framework's
``CogStreamProcessor.load_multimodal`` + ``render_chat``. Both sides
consume the identical fake frame source so only the serialization logic
is under test (frame decoding parity is test_video_loader's job; image
grid parity is test_image_processor's).
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

from cogstream_tpu.config import ProcessorConfig
from cogstream_tpu.processor import video_loader as our_video_loader
from cogstream_tpu.processor.chat_template import render_chat
from cogstream_tpu.processor.processing import CogStreamProcessor

REF_DIR = "/root/reference/model"

# fake per-file durations (seconds) for the deterministic frame source
DURATIONS = {"segment_1.mp4": 3.4, "segment_2.mp4": 5.7, "clip.mp4": 7.3}


def fake_load_video(video_path, fps=1, max_frames=180, start_time=None,
                    end_time=None, trim_time=0.0, **kw):
    """Deterministic stand-in for both video loaders: frames on a
    trim-aligned 1/fps grid over the file's fake duration."""
    duration = DURATIONS[os.path.basename(str(video_path))]
    t0 = float(trim_time) if trim_time and trim_time > 0 else 0.0
    ts = np.arange(t0, duration, 1.0 / fps)
    s = 0.0 if start_time is None else float(start_time)
    e = duration if end_time is None else min(float(end_time), duration)
    ts = ts[(ts >= s) & (ts <= e)][: int(max_frames)]
    frames = [np.full((32, 32, 3), i % 255, np.uint8)
              for i in range(len(ts))]
    return frames, [float(t) for t in ts], duration


def _load_reference_processing():
    path = os.path.join(REF_DIR, "processing_cogreasoner.py")
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import transformers.image_utils as iu
    if not hasattr(iu, "VideoInput"):
        iu.VideoInput = object
    # GPU-island deps absent in this image; only the serialization
    # paths are exercised, never these libraries
    for name in ("ffmpeg", "decord"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "decord":
                mod.VideoReader = object
                mod.cpu = lambda *a, **k: None
            sys.modules[name] = mod
    # the module does ``from . import image_processing_videollama3`` —
    # give it a package context rooted at the reference dir
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodel"] = pkg
    import importlib

    return importlib.import_module("refmodel.processing_cogreasoner")


def _ref_instance(mod):
    """Bare reference processor instance: skip ProcessorMixin __init__
    (needs a HF tokenizer); only media/serialization methods run."""
    inst = object.__new__(mod.Videollama3Qwen2Processor)
    inst.load_video = fake_load_video
    return inst


def _jinja_render(conversation, **kw):
    jinja2 = pytest.importorskip("jinja2")
    with open(os.path.join(REF_DIR, "chat_template.json")) as f:
        template_src = json.load(f)["chat_template"]
    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True,
                             extensions=["jinja2.ext.loopcontrols"])
    return env.from_string(template_src).render(
        messages=conversation, image_token="<image>",
        add_system_prompt=kw.get("add_system_prompt", False),
        add_generation_prompt=kw.get("add_generation_prompt", False))


class _NullTokenizer:
    image_token_id = 0
    eos_token_id = 1

    def encode(self, text):
        return [0]


# the two eval serializations: reference user-role placement
# (answer_generate.py:123-134) and this framework's stream role,
# over per-segment files (published layout) and one trimmed file
CONVERSATIONS = [
    [
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user", "content": [
            {"type": "video", "video": {"video_path": "segment_1.mp4",
                                        "fps": 1, "max_frames": 180}},
            {"type": "text", "text": "what is happening?"},
        ]},
        {"role": "assistant", "content": "something."},
        {"role": "user", "content": [
            {"type": "video", "video": {"video_path": "segment_2.mp4",
                                        "fps": 1, "max_frames": 180}},
            {"type": "text", "text": "and now?"},
        ]},
        {"role": "user", "content": "one more question"},
    ],
    [
        {"role": "stream", "content": [
            {"type": "video", "video": {"video_path": "clip.mp4", "fps": 1,
                                        "max_frames": 180,
                                        "start_time": 0.0,
                                        "end_time": 3.0}}]},
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "stream", "content": [
            {"type": "video", "video": {"video_path": "clip.mp4", "fps": 1,
                                        "max_frames": 180,
                                        "start_time": 3.0,
                                        "end_time": 7.0}}]},
        {"role": "user", "content": "q2"},
    ],
]


@pytest.mark.parametrize("conv_idx", range(len(CONVERSATIONS)))
def test_serialized_text_matches_reference(conv_idx, monkeypatch):
    conversation = CONVERSATIONS[conv_idx]
    mod = _load_reference_processing()
    ref = _ref_instance(mod)
    ref_conv, ref_ts = ref._load_multimodal_data(
        [dict(m) for m in conversation])
    ref_text = _jinja_render(ref_conv, add_system_prompt=True,
                             add_generation_prompt=True)

    monkeypatch.setattr(our_video_loader, "load_video", fake_load_video)
    ours = CogStreamProcessor(_NullTokenizer(), ProcessorConfig())
    our_conv, our_ts = ours.load_multimodal(conversation)
    our_text = render_chat(our_conv, add_system_prompt=True,
                           add_generation_prompt=True)

    assert our_text == ref_text
    np.testing.assert_allclose(np.asarray(our_ts, np.float64),
                               np.asarray(ref_ts, np.float64), atol=1e-6)


def test_image_token_expansion_matches_reference():
    """Our expand_image_tokens vs the reference process_text while-loop
    (processing_cogreasoner.py:719-729) on the same grid sizes."""
    from dataclasses import dataclass

    @dataclass
    class FakeBatch:
        grid_sizes: np.ndarray
        merge_sizes: np.ndarray

    images = FakeBatch(grid_sizes=np.array([[2, 4, 6], [1, 8, 4]]),
                       merge_sizes=np.array([2, 2]))
    text = ("<|stream_start|>stream\nTime 0.0s:<image>,Time 1.0s:<image>\n"
            "<|stream_end|><|im_start|>user\n<image>\nq<|im_end|>\n")

    # reference replace-loop, per-frame counts from the downsampled grid
    counts = []
    for (t, gh, gw), ms in zip(images.grid_sizes, images.merge_sizes):
        counts.extend([int(gh // ms) * int(gw // ms)] * int(t))
    ref_text = text
    for n in counts:
        ref_text = ref_text.replace("<image>", "<placeholder>" * n, 1)
    ref_text = ref_text.replace("<placeholder>", "<image>")

    ours = CogStreamProcessor(_NullTokenizer(), ProcessorConfig())
    assert ours.expand_image_tokens(text, images) == ref_text
