"""End-to-end parity path: conversation with a real video file →
processor → qa_selection → visual compression → generate
(the answer_generate.py:60-151 flow) on the tiny model."""

import dataclasses

import numpy as np
import jax
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(0)
    for i in range(40):   # 4 seconds @ 10fps
        frame = rng.integers(0, 255, (48, 64, 3), np.uint8)
        frame[:, : 16 + 2 * i % 32] = (i * 6 % 255, 50, 200)
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def engine():
    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.engine import CogReasonerEngine

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1,
                                      min_events_for_compression=2))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    return CogReasonerEngine(params, cfg, tok)


def test_single_turn_video_chat(engine, tiny_video):
    conversation = [
        {"role": "stream", "content": [{"type": "video", "video": {
            "video_path": tiny_video, "fps": 1, "max_frames": 4}}]},
        {"role": "user", "content": "what do you see?"},
    ]
    turn = engine.chat(conversation, mode="AC", max_new_tokens=8)
    assert isinstance(turn.text, str)
    assert turn.if_visual is True
    assert turn.num_tokens >= 1


def test_multi_turn_with_selection(engine, tiny_video):
    conversation = [
        {"role": "stream", "content": [{"type": "video", "video": {
            "video_path": tiny_video, "fps": 1, "max_frames": 4,
            "start_time": 0.0, "end_time": 2.0}}]},
        {"role": "user", "content": "first question?"},
        {"role": "assistant", "content": "first answer."},
        {"role": "stream", "content": [{"type": "video", "video": {
            "video_path": tiny_video, "fps": 1, "max_frames": 4,
            "start_time": 2.0, "end_time": 4.0}}]},
        {"role": "user", "content": "second question?"},
    ]
    turn = engine.chat(conversation, mode="FCC", max_new_tokens=8)
    assert turn.selection.startswith("[")
    assert isinstance(turn.text, str)


def test_gt_mode_selection(engine, tiny_video):
    conversation = [
        {"role": "stream", "content": [{"type": "video", "video": {
            "video_path": tiny_video, "fps": 1, "max_frames": 2}}]},
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ]
    turn = engine.chat(conversation, mode="gt", select_gt=[0],
                       if_visual=True, max_new_tokens=4)
    assert turn.selection == "[yes,0]"


def test_streaming_eval_path(engine, tiny_video, tmp_path):
    """run_eval with a session factory: per-video KV reuse, resumable
    output, latency + cache-token fields for aggregation."""
    import json

    from cogstream_tpu.evaluate.answer_generate import run_eval
    from cogstream_tpu.runtime.session import StreamingSession

    qdir = tmp_path / "queries"
    qdir.mkdir()
    spec = {"video": tiny_video, "segments": [
        {"timestamp": [0.0, 2.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown?", "A": "noise"}],
             "coi": [], "is_visual": True, "label": "Basic"}]},
        {"timestamp": [2.0, 4.0], "QAs": [
            {"QA_pairs": [{"Q": "and later?", "A": "more"}],
             "coi": [0], "is_visual": True, "label": "Streaming"}]},
    ]}
    (qdir / "vid.json").write_text(json.dumps(spec))
    save = tmp_path / "preds"

    cfg, params, tok = engine.cfg, engine.params, engine.tokenizer

    def factory():
        return StreamingSession(params, cfg, tok, max_len=2048,
                                summary_forward=False)

    run_eval(None, None, video_dir="/", query_dir=str(qdir),
             save_dir=str(save), mode="AC", process_index=0,
             process_count=1, session_factory=factory,
             processor_cfg=cfg.processor, log=lambda *a: None)
    out = json.loads((save / "vid.json").read_text())
    assert out.get("streaming") is True
    assert len(out["QAs"]) == 2
    assert out["QAs"][1]["n_hist"] == 1
    assert "latency_s" in out["QAs"][0]
    assert out["QAs"][1]["cache_tokens"] > out["QAs"][0]["cache_tokens"]


def test_user_role_video_eval(engine, tiny_video, tmp_path):
    """generate_for_video with video_role='user' (reference eval
    serialization: each segment's video rides its first question turn,
    ref answer_generate.py:123-134)."""
    from cogstream_tpu.evaluate.answer_generate import generate_for_video

    segments = [
        {"timestamp": [0.0, 2.0], "QAs": [
            {"QA_pairs": {"Q": "what is shown?", "A": "noise"},
             "relevance": [], "is_visual": True,
             "label": "Basic/Attributes"},
            {"QA_pairs": {"Q": "anything else?", "A": "no"},
             "relevance": [1], "is_visual": True,
             "label": "Basic/Items"}]},
        {"timestamp": [2.0, 4.0], "QAs": [
            {"QA_pairs": {"Q": "and later?", "A": "more"},
             "relevance": [0, 1], "is_visual": True,
             "label": "Streaming/Prediction"}]},
    ]
    out = generate_for_video(engine, None, tiny_video, segments,
                             mode="AC", max_new_tokens=4, fps=1,
                             max_frames=2, video_role="user")
    assert len(out["QAs"]) == 3
    assert all(isinstance(q["prediction"], str) for q in out["QAs"])
    assert out["QAs"][2]["label"] == "Streaming/Prediction"


def test_image_conversation(engine, tmp_path):
    """Single-image chat (modal='image', merge_size 1) through the
    parity path."""
    from PIL import Image

    img_path = str(tmp_path / "pic.png")
    rng = np.random.default_rng(5)
    Image.fromarray(rng.integers(0, 255, (56, 84, 3), np.uint8)).save(
        img_path)
    conversation = [
        {"role": "user", "content": [
            {"type": "image", "image": {"image_path": img_path}},
            {"type": "text", "text": "describe the image"},
        ]},
    ]
    turn = engine.chat(conversation, mode="AC", max_new_tokens=6)
    assert isinstance(turn.text, str)
    assert turn.num_tokens >= 1


def test_rewrite_preserves_stream_visuals(engine, tiny_video):
    """Regression: history rewrite must keep <|stream_start|> blocks —
    a dropped stream block silently blinds every turn after the first."""
    conversation = [
        {"role": "stream", "content": [{"type": "video", "video": {
            "video_path": tiny_video, "fps": 1, "max_frames": 2}}]},
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ]
    out = engine.processor(conversation, add_generation_prompt=True)
    img_id = engine.tokenizer.image_token_id
    n_img = int(np.sum(out.input_ids == img_id))
    assert n_img > 0
    sel = engine.qa_selection(out, mode="gt", select_gt=[0],
                              if_visual=True)
    assert int(np.sum(sel.input_ids == img_id)) == n_img
    # and with if_visual=False all visuals drop
    sel2 = engine.qa_selection(out, mode="gt", select_gt=[0],
                               if_visual=False)
    assert int(np.sum(sel2.input_ids == img_id)) == 0


def test_chat_lookahead_greedy_parity(engine, tiny_video):
    """engine.chat(lookahead_k=4) on a greedy no-penalty turn must emit
    exactly the vanilla decoder's text (the corpus here is the spliced
    multimodal prompt: text ids bucketed apart from the embeds)."""
    conversation = [
        {"role": "stream", "content": [{"type": "video", "video": {
            "video_path": tiny_video, "fps": 1, "max_frames": 4}}]},
        {"role": "user", "content": "what do you see?"},
    ]
    base = engine.chat(conversation, mode="AC", max_new_tokens=12)
    la = engine.chat(conversation, mode="AC", max_new_tokens=12,
                     lookahead_k=4)
    assert la.text == base.text
    assert la.num_tokens == base.num_tokens
    # sampling / penalty turns silently fall back to the vanilla path
    pen = engine.chat(conversation, mode="AC", max_new_tokens=12,
                      repetition_penalty=1.05, lookahead_k=4)
    assert isinstance(pen.text, str)
