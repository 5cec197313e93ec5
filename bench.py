"""Benchmark driver — prints ONE JSON line.

Headline metric: vision-encoder streaming ingest (frames/sec/chip) at
reference scale — the 27-layer / hidden-1152 SigLIP tower over 448x448
frames (1024 patches/frame, merge 2), the hot loop of every streaming
turn (SURVEY.md §3.1 hot loop #1). BASELINE.md's quantitative target is
>=30 fps/chip; ``vs_baseline`` is value/30.

Extra fields in the same JSON object: decoder prefill and decode
throughput on the demo-size (0.5B) CogReasoner decoder, and p50
per-turn latency components. COGSTREAM_BENCH_FULL=1 runs the 7B decoder
instead (needs a >=32GB chip).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def _sync(out):
    """Force REAL completion of ``out``. On the axon runtime
    ``block_until_ready`` has been observed returning before remote
    execution finishes (measured 11.5k "tok/s" for a 7B decode that
    actually runs at 84), so fetch one scalar derived from the result —
    the device executes in order, so the 4-byte read proves everything
    before it ran. Costs one tunnel round trip (~1 ms)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return jax.device_get(jnp.ravel(leaf)[0])


def _median_time(fn, iters=3, warmup=1, burst=1):
    """Median wall time per call. ``burst`` launches several async
    dispatches before syncing once — on the tunneled chip a single
    call's timing is dominated by the host round trip, which async
    dispatch overlaps away."""
    for _ in range(warmup):
        _sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(burst):
            out = fn()
        _sync(out)
        ts.append((time.perf_counter() - t0) / burst)
    return float(np.median(ts))


REF_TOKENIZER_DIR = "/root/reference/model"


def _tokenizer_for(cfg):
    """Real Qwen2 BPE tokenizer when its vocab files are mounted and the
    config's embedding table covers its ids; ByteTokenizer otherwise.

    The byte fallback inflates text ~4x (1 token/char vs BPE), which
    both misstates production prefill lengths and pushes the selector
    prompt into a bigger padding bucket — with the real vocab the 7B
    FCC turn's selector prefill is a 512-token bucket, not 2560+."""
    from cogstream_tpu.processor.tokenizer import ByteTokenizer, HFTokenizer

    if os.path.isdir(REF_TOKENIZER_DIR):
        try:
            tok = HFTokenizer(REF_TOKENIZER_DIR)
            if (tok.vocab_size() <= cfg.text.vocab_size
                    and tok.image_token_id == cfg.image_token_index):
                return tok, "qwen2-bpe"
        except Exception:
            pass
    return ByteTokenizer(image_token_id=cfg.image_token_index), "byte"


def bench_encoder(use_pallas: bool):
    import jax
    import jax.numpy as jnp

    from cogstream_tpu.config import VisionEncoderConfig
    from cogstream_tpu.models.vision_encoder import (
        build_vision_metadata, init_vision_params, vision_encoder_forward)

    cfg = VisionEncoderConfig()  # reference scale: 27L, 1152h, 16 heads
    T = int(os.environ.get("COGSTREAM_BENCH_FRAMES", "32"))
    gh = gw = 32                 # 448x448 @ patch 14
    grid_sizes = np.array([[T, gh, gw]])
    merge_sizes = np.array([2])
    n_rows = T * gh * gw
    rng = np.random.default_rng(0)
    pv = jnp.asarray(rng.normal(size=(n_rows, 3 * cfg.patch_size ** 2)),
                     jnp.bfloat16)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)

    def run():
        return vision_encoder_forward(params, pv, grid_sizes, merge_sizes,
                                      cfg, use_pallas=use_pallas)

    dt = _median_time(run, burst=8)
    return T / dt, dt


def bench_encoder_int8(use_pallas: bool):
    """W8A8 serving-mode encoder (quantize_vision_w8a8): int8 weights +
    dynamic int8 activations drive the tower GEMMs onto the MXU int8
    path. Honest expectation ~1.2-1.3x over bf16: the in-program XLA
    int8 GEMM ceiling measures ~204 TOP/s on this v5e (not the nominal
    2x), minus act-quant overhead. Separate field — the headline stays
    the bf16 tower (full-precision features are the default; W8A8 is
    opt-in with a documented feature-cosine >0.995)."""
    import jax
    import jax.numpy as jnp

    from cogstream_tpu.config import VisionEncoderConfig
    from cogstream_tpu.models.vision_encoder import (
        init_vision_params, quantize_vision_w8a8, vision_encoder_forward)

    cfg = VisionEncoderConfig()
    T = int(os.environ.get("COGSTREAM_BENCH_FRAMES", "32"))
    gh = gw = 32
    grid_sizes = np.array([[T, gh, gw]])
    merge_sizes = np.array([2])
    rng = np.random.default_rng(0)
    pv = jnp.asarray(rng.normal(size=(T * gh * gw, 3 * cfg.patch_size ** 2)),
                     jnp.bfloat16)
    params = quantize_vision_w8a8(
        init_vision_params(jax.random.PRNGKey(0), cfg))

    def run():
        return vision_encoder_forward(params, pv, grid_sizes, merge_sizes,
                                      cfg, use_pallas=use_pallas)

    dt = _median_time(run, burst=8)
    return T / dt


def bench_decoder(full: bool):
    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = (presets.cogreasoner_7b() if full else presets.demo()).text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    S, NEW = 1024, 128
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(1, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    positions = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)

    def run(new):
        # cache sized to the LARGER run so per-step attention work is
        # identical at both points
        cache = init_kv_cache(cfg, 1, S + NEW)
        return generate_tokens(
            params, emb, positions, last, cache, jax.random.PRNGKey(0),
            cfg, new, eos_id=-1, temperature=0.0)

    # MARGINAL decode rate: two run lengths, difference the times — a
    # single NEW/dt quietly charges the prefill to "decode" and
    # understates step throughput ~15-20% at these shapes
    short = NEW // 4
    dt_s = _median_time(lambda: run(short), iters=3, warmup=1)
    dt = _median_time(lambda: run(NEW), iters=3, warmup=1)
    # eos_id=-1 is never sampled → exactly `new` tokens generated
    decode_tok_s = (NEW - short) / max(dt - dt_s, 1e-9)

    # params must be ARGUMENTS, not closure constants — the axon remote
    # compiler rejects HLO with GBs of baked-in weights (HTTP 413)
    @jax.jit
    def pf(params, emb, positions):
        cache = init_kv_cache(cfg, 1, S + NEW)
        hidden, _ = qwen2.qwen2_forward(params, emb, positions, cfg,
                                        cache=cache)
        return hidden

    dt_p = _median_time(lambda: pf(params, emb, positions),
                        iters=3, warmup=1)

    # long-context prefill: 16k tokens through the chunked
    # online-softmax attention path (no O(S^2) logits materialize)
    LS = 16384
    emb_l = qwen2.embed(params, jnp.zeros((1, LS), jnp.int32))
    pos_l = jnp.asarray(np.arange(LS, dtype=np.int32)[None])

    @jax.jit
    def pf_long(params, emb, positions):
        cache = init_kv_cache(cfg, 1, LS)
        hidden, _ = qwen2.qwen2_forward(params, emb, positions, cfg,
                                        cache=cache)
        return hidden[:, -1]

    dt_l = _median_time(lambda: pf_long(params, emb_l, pos_l),
                        iters=2, warmup=1)
    return decode_tok_s, S / dt_p, LS / dt_l


def bench_session(full: bool, use_pallas: bool):
    """p50 per-turn ask latency with cross-turn KV reuse (BASELINE.md
    north star; demo-size decoder unless COGSTREAM_BENCH_FULL=1)."""
    import dataclasses
    import time

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = presets.cogreasoner_7b() if full else presets.demo()
    cfg = dataclasses.replace(cfg, compression=CompressionConfig(
        frames_per_event=8, keyframes_per_event=2))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok, _ = _tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=8192,
                            use_pallas=use_pallas)

    rng = np.random.default_rng(0)
    # 16-frame segments: ingest cost is dispatch-dominated on the
    # tunnel, so throughput scales with the micro-batch size. RAW uint8
    # rows (the production processor path, raw_uint8=True) cost 4x less
    # host->device bandwidth than normalized float32.
    T, gh, gw = 16, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)
    # first two segments pay residual jit compiles; segments 3-5
    # measure steady state (median — single-shot timings swing 2-3x
    # with tunnel/host load)
    for seg in range(2):
        sess.append_stream_segment(
            pv, (T, gh, gw), 2,
            timestamps=list(np.arange(seg * T, (seg + 1) * T,
                                      dtype=float)))
    ing = []
    for seg in range(2, 5):
        t0 = time.perf_counter()
        sess.append_stream_segment(
            pv, (T, gh, gw), 2,
            timestamps=list(np.arange(seg * T, (seg + 1) * T,
                                      dtype=float)))
        ing.append(time.perf_counter() - t0)
    ingest_s = float(np.median(ing))

    q = "what is happening in the video right now?"
    lat = []
    for i in range(4):
        t0 = time.perf_counter()
        sess.ask(q, mode="AC", max_new_tokens=32)
        lat.append(time.perf_counter() - t0)
    # FCC turns: the full production path — constrained ~50-token
    # selector decode + history-masked answer decode (the reference's
    # per-turn qa_selection, answer_generate.py:71-73). The AC asks
    # above built real history for the selector to chew on.
    lat_fcc = []
    for i in range(4):
        t0 = time.perf_counter()
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat_fcc.append(time.perf_counter() - t0)
    return (float(np.median(lat[1:])), float(np.median(lat_fcc[1:])),
            ingest_s, T / ingest_s)


def bench_7b_quantized(bits: int = 8, uniform: bool = False,
                       w4a8: bool = False):
    """7B decode on ONE chip via quantized weights (ops/quant.py):
    int8 (~7.6 GB layer weights) or rank-1 4-bit (~4 GB) + bf16
    embeddings fit a single v5e's 16 GB HBM — the quantized-base
    serving modes (the reference needs bitsandbytes NF4 + a GPU for
    the same trick). int8 decode runs at the HBM roofline. 4-bit comes
    in two schemes: cubic codebook (quality; XLA materializes the
    nibble unpack at ~1.8x int8 step time) and uniform
    (``uniform=True``; the speed AND capacity scheme — decode routes
    through the Pallas fused-unpack GEMV with layer-indexed stacked
    weights, ops/quant_gemv.py: measured 142 tok/s, 161 with
    ``w4a8=True``, vs int8's 98).
    Weights are synthetic (values don't matter for throughput)."""
    import time

    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = presets.cogreasoner_7b().text
    if w4a8:
        # W4A8 decode (config.w4a8_decode): per-row int8 activations +
        # int8 MXU dots in the GEMV — the probe measured 7.5 ms/pass vs
        # int8-XLA's 8.2 on the 7B MLP stack, at HALF the weight HBM
        import dataclasses

        cfg = dataclasses.replace(cfg, w4a8_decode=True)
    params = _synthetic_7b_text_params(bits, uniform)
    S, NEW = 512, 32
    ids = np.zeros((1, S), np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    positions = jnp.asarray(np.arange(S, dtype=np.int32)[None])

    def run(new):
        cache = init_kv_cache(cfg, 1, S + NEW)
        return generate_tokens(params, emb, positions,
                               jnp.asarray([S - 1], jnp.int32), cache,
                               jax.random.PRNGKey(0), cfg, new,
                               eos_id=-1, temperature=0.0)

    # marginal decode rate (see bench_decoder): difference two run
    # lengths so the prefill doesn't get charged to decode
    short = NEW // 4
    dt_s = _median_time(lambda: run(short), iters=2, warmup=1)
    dt_l = _median_time(lambda: run(NEW), iters=2, warmup=1)
    decode_tok_s = (NEW - short) / max(dt_l - dt_s, 1e-9)

    def make_pf(c):
        @jax.jit
        def pf(params, emb, positions):
            cache = init_kv_cache(c, 1, S + NEW)
            hidden, _ = qwen2.qwen2_forward(params, emb, positions, c,
                                            cache=cache)
            return hidden[:, -1]
        return pf

    pf = make_pf(cfg)
    dt_p = _median_time(lambda: pf(params, emb, positions),
                        iters=2, warmup=1)
    pf_w8_tok_s = None
    if bits == 8 or uniform:
        # W8A8/W4A8 serving prefill (config.w8a8_prefill): the
        # compute-bound prefill GEMMs run int8xint8 on the MXU
        # double-rate path (int4 uniform: the unpacked nibbles ARE
        # int8 — ops/quant.int4_matmul act_int8 branch)
        import dataclasses

        pf8 = make_pf(dataclasses.replace(cfg, w8a8_prefill=True))
        dt_p8 = _median_time(lambda: pf8(params, emb, positions),
                             iters=2, warmup=1)
        pf_w8_tok_s = S / dt_p8
    return decode_tok_s, S / dt_p, pf_w8_tok_s


def _synthetic_7b_text_params(bits: int, uniform: bool = False):
    """Synthetic quantized 7B decoder weights (values irrelevant for
    throughput; layout/dtypes exactly match quantize_tree output)."""
    import jax.numpy as jnp

    from cogstream_tpu import presets

    cfg = presets.cogreasoner_7b().text
    H, D = cfg.hidden_size, cfg.head_dim
    kv_out = cfg.num_key_value_heads * D
    I, V, L = cfg.intermediate_size, cfg.vocab_size, cfg.num_hidden_layers

    def qdense(kshape, bias_dim=None):
        if bits == 4:
            # rank-1 cubic-codebook 4-bit — the fused serving scheme
            # (ops/quant.py quantize_int4_rank1): row/column scales and
            # the 3-multiply codebook all fuse into the GEMM
            from cogstream_tpu.ops.quant import CUBIC_A, CUBIC_C

            *lead, din, dout = kshape
            kern = {
                "q4": jnp.full(tuple(lead) + (din // 2, dout), 0x33,
                               jnp.int8),      # signed nibbles (3, 3)
                "scale": jnp.full(tuple(lead) + (dout,), 1e-2,
                                  jnp.float32),
                "rscale": jnp.full(tuple(lead) + (din,), 1.0,
                                   jnp.float32),
                # 1-element code = the UNIFORM scheme's static tag:
                # decode routes through the Pallas fused-unpack GEMV
                # (ops/quant_gemv.py); 2-element cubic stays on XLA
                "code": (jnp.full(tuple(lead) + (1,), 1.0 / 7.0,
                                  jnp.float32) if uniform else
                         jnp.broadcast_to(
                             jnp.asarray([CUBIC_A, CUBIC_C],
                                         jnp.float32),
                             tuple(lead) + (2,))),
            }
        else:
            kern = {
                "q": jnp.ones(kshape, jnp.int8),
                "scale": jnp.full(kshape[:-2] + kshape[-1:], 1e-3,
                                  jnp.float32),
            }
        p = {"kernel": kern}
        if bias_dim is not None:
            p["bias"] = jnp.zeros(kshape[:-2] + (bias_dim,), jnp.bfloat16)
        return p

    return {
        "embed_tokens": jnp.zeros((V, H), jnp.bfloat16),
        "final_norm": {"scale": jnp.ones((H,), jnp.float32)},
        "lm_head": qdense((H, V)),
        "layers": {
            "input_norm": {"scale": jnp.ones((L, H), jnp.float32)},
            "post_attn_norm": {"scale": jnp.ones((L, H), jnp.float32)},
            "attn": {
                "q_proj": qdense((L, H, H), H),
                "k_proj": qdense((L, H, kv_out), kv_out),
                "v_proj": qdense((L, H, kv_out), kv_out),
                "o_proj": qdense((L, H, H)),
            },
            "mlp": {
                "gate_proj": qdense((L, H, I)),
                "up_proj": qdense((L, H, I)),
                "down_proj": qdense((L, I, H)),
            },
        },
    }


def bench_lookahead_7b(bits: int = 8, K: int = 4,
                       uniform: bool = False, w4a8: bool = False):
    """Prompt-lookup speculative decode at 7B. Two honest rows:

    - ``la_verify_vs_decode_step``: time of one (K+1)-token verify
      forward over one 1-token decode step. Decode is weights-bound at
      7B, so this ratio is the REAL cost of drafting; with acceptance
      rate a, wall-clock speedup ~= (1 + a*K) / ratio.
    - ``la_7b_int8_decode_tok_s``: end-to-end lookahead generate.
      Synthetic constant weights collapse greedy output to a short
      cycle, so the bigram draft accepts nearly everything — this is
      the acceptance CEILING, not a typical-text expectation (real
      answers accept on echoed spans: names, numbers, phrases from
      the prompt/history)."""
    import time

    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens_lookahead

    cfg = presets.cogreasoner_7b().text
    if w4a8:
        import dataclasses

        cfg = dataclasses.replace(cfg, w4a8_decode=True)
    params = _synthetic_7b_text_params(bits, uniform)
    S, NEW = 512, 64
    ids = np.zeros((1, S), np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    positions = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)

    def run(new=NEW):
        cache = init_kv_cache(cfg, 1, S + NEW + K + 1)
        return generate_tokens_lookahead(
            params, emb, positions, last, cache, jnp.asarray(ids), cfg,
            new, eos_id=-1, lookahead_k=K)

    # marginal rate (see bench_decoder): prefill isn't charged to decode
    short = NEW // 4
    dt_s = _median_time(lambda: run(short), iters=2, warmup=1)
    dt_l = _median_time(run, iters=2, warmup=1)
    dt = max(dt_l - dt_s, 1e-9) / (NEW - short) * NEW  # s for NEW tokens
    steps = int(np.asarray(run().steps))

    # step-cost ratio on a warm prefilled cache
    @functools.partial(jax.jit, static_argnames=("n",))
    def step(params, cache, n):
        toks = jnp.zeros((1, n), jnp.int32)
        pos = jnp.asarray(np.arange(S, S + 1, dtype=np.int32)[None]) \
            if n == 1 else \
            jnp.asarray(np.arange(S, S + n, dtype=np.int32)[None])
        emb1 = qwen2.embed(params, toks)
        hidden, _ = qwen2.qwen2_forward(params, emb1, pos, cfg,
                                        cache=cache)
        return qwen2.lm_logits(params, hidden)[:, -1]

    cache0 = init_kv_cache(cfg, 1, S + NEW + K + 1)
    _, cache0 = qwen2.qwen2_forward(params, emb, positions, cfg,
                                    cache=cache0)
    d1 = _median_time(lambda: step(params, cache0, 1), iters=3, warmup=1)
    dk = _median_time(lambda: step(params, cache0, K + 1), iters=3,
                      warmup=1)
    return NEW / dt, steps, dk / d1


def bench_session_7b_w8a8(use_pallas: bool):
    """W8A8 serving-mode variant of the 7B session: the vision tower
    runs int8 weights + int8 activations (encoder_int8=True) AND the
    decoder's prefill GEMMs run W8A8 (config.w8a8_prefill) — the
    full int8 serving stack. Reports steady ingest fps and the
    typical-selector FCC turn; bf16-prefill numbers stay the headline
    (W8A8 is opt-in, quality unvalidated without a checkpoint)."""
    import dataclasses
    import time

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.projector import init_projector_params
    from cogstream_tpu.models.vision_encoder import init_vision_params
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = dataclasses.replace(
        presets.cogreasoner_7b(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, w8a8_prefill=True))
    params = {
        "vision": init_vision_params(jax.random.PRNGKey(0), cfg.vision),
        "projector": init_projector_params(
            jax.random.PRNGKey(1), cfg.vision.hidden_size,
            cfg.text.hidden_size, cfg.mm_projector_type,
            dtype=cfg.text.jnp_dtype),
        "text": _synthetic_7b_text_params(8),
    }
    tok, _ = _tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=4096,
                            use_pallas=use_pallas, encoder_int8=True)

    rng = np.random.default_rng(0)
    T, gh, gw = 16, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)
    ing = []
    for seg in range(5):
        t0 = time.perf_counter()
        sess.append_stream_segment(
            pv, (T, gh, gw), 2,
            timestamps=list(np.arange(seg * T, (seg + 1) * T,
                                      dtype=float)))
        ing.append(time.perf_counter() - t0)
    sess.selector.max_new_tokens = 12   # typical trained-selector shape
    q = "what is happening in the video right now?"
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat.append(time.perf_counter() - t0)
    return T / float(np.median(ing[2:])), float(np.median(lat[2:]))


def bench_session_7b_quant(use_pallas: bool, bits: int = 8,
                           uniform: bool = False, w4a8: bool = False):
    """FULL-WIDTH production turn: a StreamingSession over the real 7B
    shapes — reference-scale 27L/1152 vision tower + quantized 7B
    decoder on ONE v5e (int8 ~10 GB weights, int4 ~5 GB; bf16 would
    not fit) — evidencing BASELINE.md's '<1 s p50 per-turn for 7B'
    with the FCC selector decode included. ``uniform``/``w4a8`` select
    the int4 GEMV serving modes (ops/quant_gemv.py). Weights are
    synthetic; throughput depends only on shapes/dtypes."""
    import dataclasses
    import time

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.projector import init_projector_params
    from cogstream_tpu.models.vision_encoder import init_vision_params
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = dataclasses.replace(
        presets.cogreasoner_7b(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    if w4a8:
        # W4A8 decode only. Adding w8a8_prefill=True was MEASURED AND
        # REJECTED here: the standalone 512-token prefill gains 28%
        # (int4_7b_prefill_w4a8_tok_s) but the session LOSES (ingest
        # 35 -> 21 fps, typical turn 0.58 -> 0.64 s) — the ingest
        # buckets' GEMMs don't amortize the unpack-to-int8
        # materialization the act path adds
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, w4a8_decode=True))
    params = {
        "vision": init_vision_params(jax.random.PRNGKey(0), cfg.vision),
        "projector": init_projector_params(
            jax.random.PRNGKey(1), cfg.vision.hidden_size,
            cfg.text.hidden_size, cfg.mm_projector_type,
            dtype=cfg.text.jnp_dtype),
        "text": _synthetic_7b_text_params(bits, uniform),
    }
    tok, tok_kind = _tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=4096,
                            use_pallas=use_pallas)

    rng = np.random.default_rng(0)
    T, gh, gw = 16, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)
    ing = []
    for seg in range(6):            # early segments pay compiles
        t0 = time.perf_counter()    # (incl. event-summary buckets)
        sess.append_stream_segment(
            pv, (T, gh, gw), 2,
            timestamps=list(np.arange(seg * T, (seg + 1) * T,
                                      dtype=float)))
        ing.append(time.perf_counter() - t0)
    q = "what is happening in the video right now?"
    lat = []
    for i in range(6):              # asks 0-2 pay residual compiles
        t0 = time.perf_counter()    # (selector + per-bucket decode)
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat.append(time.perf_counter() - t0)

    # TYPICAL-selector variant: random weights never emit the
    # grammar-closing ']', so the loop above decodes the full 50-token
    # selector cap every turn — the honest worst case. A trained
    # selector emits ']' after ~4-12 tokens (reference outputs are
    # '[yes,0,5]'-shaped) and generate_tokens stops there; capping the
    # bench selector at 12 models that typical production turn.
    sess.selector.max_new_tokens = 12
    lat_typ = []
    for i in range(4):              # ask 0 compiles the 12-step decode
        t0 = time.perf_counter()
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat_typ.append(time.perf_counter() - t0)
    return (float(np.median(lat[3:])), T / float(np.median(ing[3:])),
            tok_kind, float(np.median(lat_typ[1:])))


def bench_pool(full: bool, use_pallas: bool, n_rows: int = 4):
    """Aggregate decode throughput with the session pool: one decode
    program answers n_rows sessions at once (decode is weights-bound,
    so the batch multiplies tokens/sec nearly for free)."""
    import dataclasses
    import time

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.runtime.pool import SessionPool

    cfg = presets.cogreasoner_7b() if full else presets.demo()
    cfg = dataclasses.replace(cfg, compression=CompressionConfig(
        frames_per_event=8, keyframes_per_event=2))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok, _ = _tokenizer_for(cfg)
    pool = SessionPool(params, cfg, tok, n_rows=n_rows, max_len=4096,
                       use_pallas=use_pallas, summary_forward=False)
    rows = [pool.open() for _ in range(n_rows)]

    # batched ingest: one fused vision encode + LM prefill dispatch
    # ingests every live stream's segment (steady-state serving tick)
    rng = np.random.default_rng(0)
    T, gh, gw = 8, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)

    def seg_reqs(k):
        return [(r, pv, (T, gh, gw), 2,
                 list(np.arange(k * T, (k + 1) * T, dtype=float)))
                for r in rows]

    pool.ingest_batch(seg_reqs(0))       # warm (compiles)
    ing = []
    for k in range(1, 4):                # median of 3 steady ticks
        t0 = time.perf_counter()
        pool.ingest_batch(seg_reqs(k))
        ing.append(time.perf_counter() - t0)
    ingest_agg_fps = n_rows * T / float(np.median(ing))

    NEW = 32
    reqs = [(r, "what is happening in the video right now?")
            for r in rows]
    pool.ask_batch(reqs, mode="AC", max_new_tokens=NEW)   # warm
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        pool.ask_batch(reqs, mode="AC", max_new_tokens=NEW)
        dts.append(time.perf_counter() - t0)
    return n_rows * NEW / float(np.median(dts)), ingest_agg_fps


def bench_pool_7b(use_pallas: bool, bits: int = 8,
                  n_rows_list=(4, 8), uniform: bool = False,
                  w4a8: bool = False):
    """PRODUCTION-scale pooled serving: n_rows streams share ONE
    int8-7B on one chip (single-storage pool rows). Decode is
    weights-bound, so the lockstep batched decode multiplies aggregate
    tokens/sec nearly for free — this is the number a deployment sizes
    against. Per batch size, two rows: the MARGINAL aggregate decode
    rate (two ask lengths differenced — prefill/selector not charged to
    decode) and the blended full-ask aggregate. One params build serves
    every batch size (a second synthetic 7B would OOM the 16 GB chip),
    and each pool frees before the next allocates."""
    import dataclasses
    import gc
    import time

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.projector import init_projector_params
    from cogstream_tpu.models.vision_encoder import init_vision_params
    from cogstream_tpu.runtime.pool import SessionPool

    cfg = dataclasses.replace(
        presets.cogreasoner_7b(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    if w4a8:
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, w4a8_decode=True))
    params = {
        "vision": init_vision_params(jax.random.PRNGKey(0), cfg.vision),
        "projector": init_projector_params(
            jax.random.PRNGKey(1), cfg.vision.hidden_size,
            cfg.text.hidden_size, cfg.mm_projector_type,
            dtype=cfg.text.jnp_dtype),
        "text": _synthetic_7b_text_params(bits, uniform),
    }
    tok, _ = _tokenizer_for(cfg)
    rng = np.random.default_rng(0)
    T, gh, gw = 8, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)

    results = {}
    for n_rows in n_rows_list:
        pool = SessionPool(params, cfg, tok, n_rows=n_rows, max_len=2048,
                           use_pallas=use_pallas, summary_forward=False)
        rows = [pool.open() for _ in range(n_rows)]
        # chunk the fused ingest at 8 streams/dispatch: one B=16
        # vision-encode program OOMs the 16 GB chip (decode does not —
        # its weights are shared and KV is 118 MB/row)
        for i in range(0, n_rows, 8):
            pool.ingest_batch([(r, pv, (T, gh, gw), 2,
                                list(np.arange(T, dtype=float)))
                               for r in rows[i:i + 8]])
        reqs = [(r, "what is happening in the video right now?")
                for r in rows]

        def ask(new):
            t0 = time.perf_counter()
            pool.ask_batch(reqs, mode="AC", max_new_tokens=new)
            return time.perf_counter() - t0

        SHORT, NEW = 8, 32
        ask(SHORT), ask(NEW)                   # compiles
        dts_s = [ask(SHORT) for _ in range(3)]
        dts_l = [ask(NEW) for _ in range(3)]
        d_s, d_l = float(np.median(dts_s)), float(np.median(dts_l))
        results[n_rows] = (n_rows * (NEW - SHORT) / max(d_l - d_s, 1e-9),
                           n_rows * NEW / d_l)
        del pool, rows, reqs                   # free the [B, max_len] cache
        gc.collect()
    return results


def bench_ingest_overlap(use_pallas: bool):
    """End-to-end serving ingest through the chunked decode-ahead path
    (N2 integration): a real video decodes chunk-by-chunk while the TPU
    encodes the previous chunk. Reports the decode backend, the
    decoder's lead high-water mark (buffered>0 = decode genuinely
    overlapped encode), and end-to-end frames/sec."""
    import dataclasses
    import tempfile
    import time

    import jax

    try:
        import cv2
    except ImportError:
        return "unavailable", 0, 0.0

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.serve import SessionServer

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                            (640, 360))
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (360, 640, 3), np.uint8)
        for i in range(24 * 16):     # 16 s at 24 fps source
            frame = base.copy()
            frame[:40, :40] = (i * 5) % 255
            w.write(frame)
        w.release()

        cfg = dataclasses.replace(
            presets.demo(), compression=CompressionConfig(
                frames_per_event=8, keyframes_per_event=2))
        params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
        tok = ByteTokenizer(image_token_id=cfg.image_token_index)
        server = SessionServer(params, cfg, tok, max_len=8192,
                               use_pallas=use_pallas,
                               ingest_chunk_frames=4)
        server.create("b")
        server.ingest("b", path, start=0.0, end=16.0, fps=1.0)  # warm
        server.create("b2")
        t0 = time.perf_counter()
        r = server.ingest("b2", path, start=0.0, end=16.0, fps=1.0)
        dt = time.perf_counter() - t0
        return (r["decode_backend"], int(r["decode_buffered_max"]),
                r["frames"] / dt)


def bench_preprocess():
    """BASELINE config 1: host-side preprocess (any-res resize +
    patchify + normalize) + on-device temporal-semantic k-means over a
    1-minute 1fps clip equivalent."""
    import time

    import jax
    import jax.numpy as jnp

    from cogstream_tpu.config import ProcessorConfig
    from cogstream_tpu.ops.kmeans import kmeans_with_time
    from cogstream_tpu.processor.image_processor import ImageProcessor

    rng = np.random.default_rng(0)
    T = 60
    frames = rng.integers(0, 255, (T, 3, 360, 640), np.uint8)
    proc = ImageProcessor(ProcessorConfig())

    def med(**kw):                     # host-side: no device sync needed
        proc([frames[:4]], modals=["video"], **kw)   # warm first-call
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            proc([frames], modals=["video"], **kw)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    prep_s = med()
    prep_raw_s = med(raw_uint8=True)   # production ingest path: uint8
                                       # rows, device-side normalize

    feats = jnp.asarray(rng.normal(size=(T, 256)), jnp.float32)
    ts = jnp.arange(T, dtype=jnp.float32)
    km = kmeans_with_time(feats, ts, 4, jax.random.PRNGKey(0))
    jax.block_until_ready(km.assignments)
    t0 = time.perf_counter()
    km = kmeans_with_time(feats, ts, 4, jax.random.PRNGKey(1))
    jax.block_until_ready(km.assignments)
    km_s = time.perf_counter() - t0
    return T / prep_s, km_s, T / prep_raw_s


def bench_train_stage2():
    """Stage-2 LoRA train-step throughput at demo scale: real video →
    processor → GT-COI rewrite → jitted remat multimodal step on a 1x1
    mesh. train_turn's ``float(loss)`` is the honest sync (scalar
    fetch). Reports median steps/s over warm repeats of the same shape
    buckets."""
    import dataclasses
    import tempfile
    import time

    import jax

    try:
        import cv2
    except ImportError:
        return None

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.train.stage2 import (Stage2Config, Stage2Trainer,
                                            train_stage2_video)

    cfg = dataclasses.replace(
        presets.demo(), compression=CompressionConfig(
            frames_per_event=4, keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok, _ = _tokenizer_for(cfg)
    processor = CogStreamProcessor(tok, cfg.processor)

    segments = [
        {"timestamp": [0.0, 4.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown?", "A": "a pattern."}],
             "relevance": [], "is_visual": True}]},
        {"timestamp": [4.0, 8.0], "QAs": [
            {"QA_pairs": [{"Q": "did it change?", "A": "slightly."}],
             "relevance": [1], "is_visual": True}]},
    ]
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (128, 96))
        rng = np.random.default_rng(3)
        for _ in range(80):
            w.write(rng.integers(0, 255, (96, 128, 3), np.uint8))
        w.release()

        tcfg = Stage2Config(max_seq_len=2048, max_frames=4,
                            grad_accum=1, save_every=10**9, fps=1)
        trainer = Stage2Trainer(params, cfg, tok, tcfg,
                                os.path.join(td, "s2"),
                                total_steps=100, log=lambda *a: None)
        train_stage2_video(trainer, processor, path, segments,
                           log=lambda *a: None)        # compiles
        times = []
        for _ in range(3):                             # warm repeats
            t0 = time.perf_counter()
            losses = train_stage2_video(trainer, processor, path,
                                        segments, log=lambda *a: None)
            times.append((time.perf_counter() - t0) / len(losses))
        return 1.0 / float(np.median(times))


def _sect(fn, *args, retries=2, crash_backoff=90):
    """Run a bench section with retries: the axon TPU worker
    crashes/restarts under cold-compile bursts ('UNAVAILABLE: TPU
    worker process crashed'), killing every later section of a
    single-shot bench. The compiles that preceded a crash stay in the
    persistent cache, so a patient retry usually succeeds — but the
    worker takes minutes to come back."""
    last = None
    for attempt in range(retries):
        try:
            import gc

            gc.collect()        # free the previous section's device
            # arrays before allocating this one's (two live synthetic
            # 7Bs OOM the 16 GB chip)
            return fn(*args), None
        except Exception as e:
            last = e
            if attempt + 1 < retries:
                time.sleep(crash_backoff if "UNAVAILABLE" in repr(e)
                           or "INTERNAL" in repr(e) else 20)
    return None, last


def _overlap_in_subprocess(attempts: int = 3) -> dict:
    """Run bench_ingest_overlap in FRESH python processes, retrying at
    the PROCESS level.

    Two axon facts drive this shape: (1) the section intermittently
    crashes the TPU worker ('UNAVAILABLE: worker process crashed'),
    and (2) after a worker crash the client in that process stays
    wedged — every observed recovery came from a new process after a
    cool-down, never from an in-process retry. It runs before the main
    sections touch the chip so one crash cannot contaminate the rest
    of the artifact."""
    import subprocess
    import sys

    last = {}
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--overlap-only"],
                capture_output=True, timeout=1200, text=True)
            # keep the child's stderr around for post-mortems — the
            # crash modes here (worker restarts, Mosaic faults) only
            # ever explain themselves on stderr
            with open("/tmp/cogstream_overlap_stderr.log", "a") as f:
                f.write(f"--- attempt {attempt} rc={out.returncode}\n")
                f.write(out.stderr[-8000:] + "\n")
            line = out.stdout.strip().splitlines()[-1]
            res = json.loads(line)
            if "ingest_overlap_bench_error" not in res:
                return res
            last = res
        except Exception as e:  # noqa: BLE001
            last = {"ingest_overlap_bench_error": repr(e)[:300]}
        if attempt + 1 < attempts:
            time.sleep(150)     # crashed worker takes minutes to return
    return last


def main():
    import jax

    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # The overlap subprocess needs EXCLUSIVE chip access (axon allows
    # one holder; a second blocks silently), so it must run before this
    # process initializes the backend. Read the pinned platform from
    # config — jax.devices() would claim the chip.
    platforms = (jax.config.jax_platforms or "").split(",")[0]
    overlap = _overlap_in_subprocess() if platforms != "cpu" else {}
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    full = os.environ.get("COGSTREAM_BENCH_FULL") == "1"

    profile_dir = os.environ.get("COGSTREAM_BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    r, _ = _sect(bench_encoder, on_tpu)
    if r is None:                    # pallas failure → jnp path
        r, _ = _sect(bench_encoder, False)
    fps, enc_dt = r
    if profile_dir:
        jax.profiler.stop_trace()   # encoder section only; view in xprof

    extras = {}
    if on_tpu:
        r, _ = _sect(bench_encoder_int8, True)
        if r is not None:
            extras["encoder_int8_fps"] = round(r, 2)
    r, err = _sect(bench_decoder, full)
    if r is not None:
        decode_tok_s, prefill_tok_s, long_tok_s = r
        extras.update({
            "decode_tokens_per_sec": round(decode_tok_s, 2),
            "prefill_tokens_per_sec": round(prefill_tok_s, 1),
            "prefill_16k_tokens_per_sec": round(long_tok_s, 1),
            "decoder_size": "7B" if full else "0.5B-demo",
        })
    else:
        extras["decoder_bench_error"] = repr(err)[:300]
    r, err = _sect(bench_session, full, on_tpu)
    if r is not None:
        turn_p50, turn_p50_fcc, ingest_s, ingest_fps = r
        extras.update({
            "turn_p50_s": round(turn_p50, 4),
            "turn_p50_fcc_s": round(turn_p50_fcc, 4),
            "session_ingest_fps": round(ingest_fps, 1),
        })
    else:
        extras["session_bench_error"] = repr(err)[:300]
    r, err = _sect(bench_pool, full, on_tpu)
    if r is not None:
        extras["pooled_decode_tok_s_b4"] = round(r[0], 1)
        extras["pooled_ingest_fps_b4"] = round(r[1], 1)
    else:
        extras["pool_bench_error"] = repr(err)[:300]
    if on_tpu:
        r, err = _sect(bench_7b_quantized, 8)
        if r is not None:
            extras["int8_7b_decode_tok_s"] = round(r[0], 2)
            extras["int8_7b_prefill_tok_s"] = round(r[1], 1)
            if r[2] is not None:
                extras["int8_7b_prefill_w8a8_tok_s"] = round(r[2], 1)
        else:
            extras["int8_7b_bench_error"] = repr(err)[:300]
        r, err = _sect(bench_7b_quantized, 4)
        if r is not None:
            extras["int4_7b_decode_tok_s"] = round(r[0], 2)
            extras["int4_7b_prefill_tok_s"] = round(r[1], 1)
        else:
            extras["int4_7b_bench_error"] = repr(err)[:300]
        # uniform-scheme 4-bit: decode rides the Pallas fused-unpack
        # GEMV (ops/quant_gemv.py) — the serving speed/capacity scheme
        r, err = _sect(bench_7b_quantized, 4, True)
        if r is not None:
            extras["int4u_7b_decode_tok_s"] = round(r[0], 2)
            if r[2] is not None:
                extras["int4_7b_prefill_w4a8_tok_s"] = round(r[2], 1)
        else:
            extras["int4u_7b_bench_error"] = repr(err)[:300]
        # W4A8 decode: int8-activation GEMV on uniform int4 weights —
        # faster than int8 weights at half their HBM (serving opt-in)
        r, err = _sect(bench_7b_quantized, 4, True, True)
        if r is not None:
            extras["int4_w4a8_7b_decode_tok_s"] = round(r[0], 2)
        else:
            extras["int4_w4a8_7b_bench_error"] = repr(err)[:300]
        r, err = _sect(bench_lookahead_7b, 8)
        if r is not None:
            extras["la_7b_int8_decode_tok_s"] = round(r[0], 2)
            extras["la_7b_int8_steps_for_64"] = r[1]
            extras["la_verify_vs_decode_step"] = round(r[2], 3)
        else:
            extras["lookahead_bench_error"] = repr(err)[:300]
        # int4+W4A8 lookahead: the (K+1)-token verify forward rides the
        # indexed GEMV too, so the drafting cost ratio holds at the
        # faster step time
        r, err = _sect(bench_lookahead_7b, 4, 4, True, True)
        if r is not None:
            extras["la_7b_int4_decode_tok_s"] = round(r[0], 2)
            extras["la_7b_int4_verify_vs_step"] = round(r[2], 3)
        else:
            extras["lookahead_int4_bench_error"] = repr(err)[:300]
        # full-width production turn: 7B int8 session incl. FCC
        # selector decode (BASELINE.md '<1 s p50 per-turn for 7B')
        r, err = _sect(bench_session_7b_quant, True)
        if r is not None:
            extras["turn_p50_fcc_7b_int8_s"] = round(r[0], 4)
            extras["session_ingest_fps_7b"] = round(r[1], 1)
            extras["session_7b_tokenizer"] = r[2]
            extras["turn_p50_fcc_7b_int8_typical_s"] = round(r[3], 4)
        else:
            extras["session_7b_bench_error"] = repr(err)[:300]
        # full int8 serving stack (W8A8 encoder + W8A8 decoder prefill)
        r, err = _sect(bench_session_7b_w8a8, True)
        if r is not None:
            extras["session_ingest_fps_7b_w8a8"] = round(r[0], 1)
            extras["turn_p50_fcc_7b_w8a8_typical_s"] = round(r[1], 4)
        else:
            extras["session_7b_w8a8_bench_error"] = repr(err)[:300]
        # int4 W4A8 serving session: uniform rank-1 decoder (~5 GB)
        # with W4A8 decode — both selector and answer decodes ride the
        # indexed GEMV (faster than int8 at half its HBM)
        r, err = _sect(bench_session_7b_quant, True, 4, True, True)
        if r is not None:
            extras["turn_p50_fcc_7b_int4_s"] = round(r[0], 4)
            extras["session_ingest_fps_7b_int4"] = round(r[1], 1)
            extras["turn_p50_fcc_7b_int4_typical_s"] = round(r[3], 4)
        else:
            extras["session_7b_int4_bench_error"] = repr(err)[:300]
        # B=4 and B=8 share one params build (decode is weights-bound,
        # so doubling the pooled batch should be near-free aggregate
        # throughput; KV at 8x2048 rows is ~1 GB next to the 7 GB of
        # int8 weights)
        r, err = _sect(bench_pool_7b, True)
        if r is not None:
            for n_rows, (marginal, blended) in r.items():
                extras[f"pooled_7b_int8_decode_tok_s_b{n_rows}"] = \
                    round(marginal, 1)
                extras[f"pooled_7b_int8_ask_tok_s_b{n_rows}"] = \
                    round(blended, 1)
        else:
            extras["pool_7b_bench_error"] = repr(err)[:300]
        # pooled int4+W4A8: batched decode rows share the ~5 GB
        # uniform int4 decoder; M=B stays on the indexed GEMV route
        r, err = _sect(bench_pool_7b, True, 4, (4, 8, 16), True, True)
        if r is not None:
            for n_rows, (marginal, blended) in r.items():
                extras[f"pooled_7b_int4_decode_tok_s_b{n_rows}"] = \
                    round(marginal, 1)
                extras[f"pooled_7b_int4_ask_tok_s_b{n_rows}"] = \
                    round(blended, 1)
        else:
            extras["pool_7b_int4_bench_error"] = repr(err)[:300]
    r, err = _sect(bench_preprocess)
    if r is not None:
        extras.update({"preprocess_fps": round(r[0], 1),
                       "kmeans_s": round(r[1], 4),
                       "preprocess_fps_raw": round(r[2], 1)})
    else:
        extras["preprocess_bench_error"] = repr(err)[:300]
    # training throughput (demo scale) — last: its cold remat compile
    # is the crash-prone kind, so a failure cannot poison other rows
    r, err = _sect(bench_train_stage2)
    if r is not None:
        extras["stage2_train_steps_per_sec"] = round(r, 3)
    else:
        extras["stage2_train_bench_error"] = repr(err)[:300]

    out = {
        "metric": "encoder_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "platform": platform,
        "encoder_forward_s": round(enc_dt, 4),
        **extras,
        **overlap,
    }
    print(json.dumps(out))


def overlap_only():
    """Subprocess entry: the serving-ingest overlap section alone."""
    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # single attempt: after a worker crash this process's client is
    # wedged — the parent retries by spawning a fresh process instead
    r, err = _sect(bench_ingest_overlap, True, retries=1)
    if r is not None:
        backend, buffered_max, ing_fps = r
        print(json.dumps({
            "ingest_decode_backend": backend,
            "ingest_decode_buffered_max": buffered_max,
            "ingest_e2e_fps": round(ing_fps, 1),
        }))
    else:
        print(json.dumps(
            {"ingest_overlap_bench_error": repr(err)[:300]}))


if __name__ == "__main__":
    import sys

    if "--overlap-only" in sys.argv:
        overlap_only()
    else:
        main()
