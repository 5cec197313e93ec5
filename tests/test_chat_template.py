"""Chat-template renderer parity with the reference Jinja template."""

import json
import os

import pytest

from cogstream_tpu.processor.chat_template import render_chat
from cogstream_tpu.processor.tokenizer import (
    ByteTokenizer,
    constrained_selector_token_ids,
)

REF_TEMPLATE = "/root/reference/model/chat_template.json"


def _jinja_render(conversation, **kw):
    if not os.path.exists(REF_TEMPLATE):
        pytest.skip("reference not mounted")
    jinja2 = pytest.importorskip("jinja2")
    with open(REF_TEMPLATE) as f:
        template_src = json.load(f)["chat_template"]
    env = jinja2.Environment(
        trim_blocks=True, lstrip_blocks=True,
        extensions=["jinja2.ext.loopcontrols"])
    tmpl = env.from_string(template_src)
    return tmpl.render(
        messages=conversation,
        image_token="<image>",
        add_system_prompt=kw.get("add_system_prompt", False),
        add_generation_prompt=kw.get("add_generation_prompt", False),
    )


CONVOS = [
    [{"role": "user", "content": "hello"}],
    [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": [
            {"type": "video", "num_frames": 3,
             "timestamps": [0.0, 1.04, 2.5]},
            {"type": "text", "text": "What happened?"},
        ]},
        {"role": "assistant", "content": "A cat jumped."},
        {"role": "stream", "content": [
            {"type": "video", "num_frames": 2, "timestamps": [3.0, 4.0]},
        ]},
        {"role": "user", "content": [
            {"type": "image", "timestamp": 5.25},
            {"type": "text", "text": "And now?"},
        ]},
    ],
]


@pytest.mark.parametrize("convo", CONVOS)
@pytest.mark.parametrize("sys_p", [False, True])
@pytest.mark.parametrize("gen_p", [False, True])
def test_render_matches_reference_jinja(convo, sys_p, gen_p):
    ref = _jinja_render(convo, add_system_prompt=sys_p,
                        add_generation_prompt=gen_p)
    ours = render_chat(convo, add_system_prompt=sys_p,
                       add_generation_prompt=gen_p)
    assert ours == ref


def test_video_expansion_format():
    text = render_chat([{"role": "user", "content": [
        {"type": "video", "num_frames": 2, "timestamps": [1.0, 2.0]},
        {"type": "text", "text": "q"},
    ]}])
    assert "Time 1.0s:<image>,Time 2.0s:<image>\n" in text
    assert text.endswith("q<|im_end|>\n")


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "<|im_start|>user\nTime 1.0s:<image>,hi<|im_end|>\n"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert ids.count(tok.image_token_id) == 1


def test_constrained_token_ids():
    tok = ByteTokenizer()
    allowed = set(constrained_selector_token_ids(tok))
    for piece in "0123456789[],":
        assert tok.encode(piece)[0] in allowed
    assert tok.eos_token_id in allowed
    # a letter not in yes/no must not be allowed
    assert tok.encode("z")[0] not in allowed
