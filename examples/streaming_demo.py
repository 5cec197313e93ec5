"""Runnable streaming demo: synthetic video → multi-turn session.

Creates a short mp4 with OpenCV, then drives a StreamingSession through
two segments and three questions, printing per-turn selections, cache
growth and latency. Uses random weights (answers are noise) — the point
is the runtime path: ingest → event sealing → retrieval → masked
decode with cross-turn KV reuse.

    python examples/streaming_demo.py            # real chip (axon)
    COGSTREAM_DEMO_CPU=1 python examples/streaming_demo.py
"""

import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if os.environ.get("COGSTREAM_DEMO_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.image_processor import ImageProcessor
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.processor.video_loader import load_video
    from cogstream_tpu.runtime.session import StreamingSession

    on_cpu = jax.default_backend() == "cpu"
    cfg = CogReasonerConfig.tiny() if on_cpu else None
    if cfg is None:
        from cogstream_tpu import presets

        cfg = presets.demo()
    cfg = dataclasses.replace(cfg, compression=CompressionConfig(
        frames_per_event=4, keyframes_per_event=2))

    print(f"platform={jax.default_backend()}  "
          f"decoder={cfg.text.num_hidden_layers}L/{cfg.text.hidden_size}h")
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    sess = StreamingSession(params, cfg, tok, max_len=8192,
                            use_pallas=not on_cpu)

    # synthesize an 8-second clip
    path = os.path.join(tempfile.gettempdir(), "cogstream_demo.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (128, 96))
    rng = np.random.default_rng(0)
    for i in range(80):
        frame = rng.integers(0, 255, (96, 128, 3), np.uint8)
        cv2.circle(frame, (10 + i, 48), 12, (255, 40, 40), -1)
        w.write(frame)
    w.release()

    proc = ImageProcessor(cfg.processor)
    for seg_idx, (s, e) in enumerate([(0.0, 4.0), (4.0, 8.0)]):
        frames, ts, _ = load_video(path, start_time=s, end_time=e,
                                   fps=1, max_frames=4)
        batch = proc([np.stack(frames)], modals=["video"])
        t, gh, gw = (int(x) for x in batch.grid_sizes[0])
        t0 = time.perf_counter()
        sess.append_stream_segment(batch.pixel_values, (t, gh, gw),
                                   int(batch.merge_sizes[0]), ts)
        print(f"[segment {seg_idx}] ingested {t} frames "
              f"({time.perf_counter() - t0:.2f}s)  "
              f"cache={sess.write_index} tok  events={len(sess.events)}")

        for q in (["what is moving?"] if seg_idx == 0
                  else ["where is it now?", "what did I ask first?"]):
            t0 = time.perf_counter()
            r = sess.ask(q, mode="FCC" if sess.hist_qs else "AC",
                         max_new_tokens=16)
            print(f"  Q: {q}\n  -> sel={r['selection']} "
                  f"visual={r['if_visual']} cache={r['cache_tokens']} "
                  f"({time.perf_counter() - t0:.2f}s)\n"
                  f"  A: {r['text'][:60]!r}")


if __name__ == "__main__":
    main()
