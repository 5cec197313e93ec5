"""Child entry for the supervised-serving recovery test.

Two modes (tests/test_serve_recovery.py drives the pair):
- supervisor (default): run_supervised() around ``--child`` with a
  near-zero cooldown — the CPU-simulated analogue of
  ``python -m cogstream_tpu.runtime.serve --supervise``.
- ``--child``: build the tiny CPU model and serve on --port with
  auto-snapshots. The fault-injection env
  (COGSTREAM_FAULT_INGEST_DISPATCH, inherited) makes the N-th chunk
  dispatch raise a synthetic backend-fatal error mid-ingest — the
  CPU stand-in for the axon TPU worker's 'kernel fault'.
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--snapdir", required=True)
    args = ap.parse_args()

    if not args.child:
        from cogstream_tpu.runtime.serve import run_supervised

        return run_supervised(
            [sys.executable, __file__, "--child", "--port",
             str(args.port), "--snapdir", args.snapdir],
            max_restarts=3, cooldown_s=0.2)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cogstream_tpu.config import CogReasonerConfig, CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer, serve

    cfg = dataclasses.replace(
        CogReasonerConfig.tiny(),
        compression=CompressionConfig(frames_per_event=2,
                                      keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    server = SessionServer(params, cfg, tok, max_len=2048,
                           use_pallas=False, ingest_chunk_frames=2,
                           auto_snapshot_dir=args.snapdir)
    print("serving", flush=True)
    serve(server, port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
