"""Runnable multi-stream serving demo: 4 live streams on one chip.

Drives a SessionPool through the steady-state serving loop the
framework is built for: every tick, all streams' new segments ingest in
ONE fused dispatch (batched vision encode + LM prefill into the shared
single-storage cache); questions from different streams answer together
in ONE pooled decode; one stream snapshots to disk and is restored as a
new tenant (serving-restart recovery). Uses random weights (answers are
noise) — the point is the runtime path and the per-tick cost profile.

    python examples/pool_serving_demo.py            # real chip (axon)
    COGSTREAM_DEMO_CPU=1 python examples/pool_serving_demo.py
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
    import jax

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.pool import SessionPool

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = CogReasonerConfig.tiny() if not on_tpu else __import__(
        "cogstream_tpu.presets", fromlist=["demo"]).demo()
    cfg = dataclasses.replace(cfg, compression=CompressionConfig(
        frames_per_event=4, keyframes_per_event=1,
        min_events_for_compression=1))
    print(f"platform={jax.devices()[0].platform} "
          f"decoder={cfg.text.num_hidden_layers}L/"
          f"{cfg.text.hidden_size}h")
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)

    N = 4
    pool = SessionPool(params, cfg, tok, n_rows=N, max_len=4096,
                       use_pallas=on_tpu, summary_forward=False)
    rows = [pool.open() for _ in range(N)]
    rng = np.random.default_rng(0)
    T, gh, gw = (8, 16, 16) if on_tpu else (4, 4, 4)
    ps = cfg.vision.patch_size

    def segment():
        # RAW uint8 rows: what the processor emits with raw_uint8=True
        return rng.integers(0, 255, (T * gh * gw, 3 * ps * ps),
                            dtype=np.uint8)

    for tick in range(3):
        t0 = time.perf_counter()
        pool.ingest_batch([
            (r, segment(), (T, gh, gw), 2,
             list(np.arange(tick * T, (tick + 1) * T, dtype=float)))
            for r in rows])
        dt = time.perf_counter() - t0
        print(f"tick {tick}: ingested {N}x{T} frames in {dt:.2f}s "
              f"({N * T / dt:.1f} fps aggregate) "
              f"fill={[pool.sessions[r].write_index for r in rows]}")

    t0 = time.perf_counter()
    out = pool.ask_batch(
        [(r, f"what is happening in stream {r}?") for r in rows],
        mode="AC", max_new_tokens=24)
    dt = time.perf_counter() - t0
    print(f"batched ask: {N} answers in {dt:.2f}s "
          f"({sum(len(o['text']) for o in out.values())} chars)")

    # snapshot stream 0, close it, restore as a new tenant
    with tempfile.TemporaryDirectory() as td:
        snap = os.path.join(td, "stream0.npz")
        pool.sessions[rows[0]].save(snap)
        pool.close(rows[0])
        restored = pool.open_restored(snap)
        r2 = pool.ask(restored, "and after the restart?", mode="AC",
                      max_new_tokens=12)
        print(f"restored row {restored}: turn={r2['turn']} "
              f"cache={r2['cache_tokens']}")
    print("OK")


if __name__ == "__main__":
    main()
