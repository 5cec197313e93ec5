"""On-chip decomposition of the 7B streaming-session ingest.

Runs the exact bench_session_7b_quant ingest shape with
``StreamingSession.profile_stages`` on and prints the median per-stage
wall seconds over steady-state segments — where does the ~0.5 s/segment
go (encode / mask+plan / pack / prefill+fetch / events)?

Usage (repo root, real chip): python tools/ingest_decompose.py [w8a8]
"""

import sys
import time

import numpy as np


def main() -> None:
    w8a8 = "w8a8" in sys.argv[1:]
    import dataclasses

    import jax

    sys.path.insert(0, ".")
    import bench
    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.projector import init_projector_params
    from cogstream_tpu.models.vision_encoder import init_vision_params
    from cogstream_tpu.runtime.session import StreamingSession
    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = dataclasses.replace(
        presets.cogreasoner_7b(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    if w8a8:
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, w8a8_prefill=True))
    params = {
        "vision": init_vision_params(jax.random.PRNGKey(0), cfg.vision),
        "projector": init_projector_params(
            jax.random.PRNGKey(1), cfg.vision.hidden_size,
            cfg.text.hidden_size, cfg.mm_projector_type,
            dtype=cfg.text.jnp_dtype),
        "text": bench._synthetic_7b_text_params(8),
    }
    tok, _ = bench._tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=4096,
                            use_pallas=True, encoder_int8=w8a8)
    sess.profile_stages = True

    rng = np.random.default_rng(0)
    T, gh, gw = 16, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)
    rows = []
    for seg in range(7):
        t0 = time.perf_counter()
        sess.append_stream_segment(
            pv, (T, gh, gw), 2,
            timestamps=list(np.arange(seg * T, (seg + 1) * T, dtype=float)))
        total = time.perf_counter() - t0
        rows.append({**sess.last_ingest_times, "total_s": total})
        print(f"seg {seg}: " + "  ".join(
            f"{k}={v * 1e3:7.1f}ms" for k, v in rows[-1].items()))
    steady = rows[3:]
    med = {k: float(np.median([r[k] for r in steady])) for k in steady[0]}
    print("\nmedian (steady):")
    for k, v in med.items():
        print(f"  {k:18s} {v * 1e3:7.1f} ms  "
              f"({100 * v / med['total_s']:4.1f}%)")
    print(f"\ningest fps: {T / med['total_s']:.1f}"
          f"  (mode={'w8a8' if w8a8 else 'int8'})")


if __name__ == "__main__":
    main()
