"""Benchmark driver — prints the artifact JSON line INCREMENTALLY.

Headline metric: vision-encoder streaming ingest (frames/sec/chip) at
reference scale — the 27-layer / hidden-1152 SigLIP tower over 448x448
frames (1024 patches/frame, merge 2), the hot loop of every streaming
turn (SURVEY.md §3.1 hot loop #1). BASELINE.md's quantitative target is
>=30 fps/chip; ``vs_baseline`` is value/30.

Robustness architecture (round-3 redesign — round 2's driver bench
timed out with an EMPTY artifact because the JSON printed once at the
very end):

- **Orchestrator + child.** ``main()`` never touches the JAX backend;
  it spawns a child process (``--run-sections``) that owns the chip and
  runs the section list. A TPU-worker crash kills only the child — the
  parent relaunches it (observed axon behavior: after a worker crash
  the in-process client stays wedged; only a fresh process recovers).
- **Incremental emission.** The child prints the FULL cumulative
  artifact line after EVERY section (stdout is inherited, so the
  driver's tail always ends with the latest complete artifact) and
  persists it to an artifact file that relaunches resume from —
  completed sections never re-run.
- **Wall-clock budget.** ``COGSTREAM_BENCH_BUDGET_S`` (default 1500)
  bounds the whole run; sections are ordered by importance and each
  carries a cost estimate — when the remaining budget can't cover a
  section it is skipped (recorded in ``budget_skipped``) and the run
  exits 0 with everything it has.
- **Shared 7B builds.** The synthetic 7B decoder weights build ONCE
  per quantization scheme (``Ctx``) and are shared by every section of
  that scheme; schemes swap resident (two 7Bs OOM the 16 GB chip).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

ART_PATH = os.environ.get("COGSTREAM_BENCH_ART",
                          "/tmp/cogstream_bench_art.json")
BUDGET_S = float(os.environ.get("COGSTREAM_BENCH_BUDGET_S", "1500"))


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


def _synthetic_7b_text_params(bits: int, uniform: bool = False,
                              group_nf4: bool = False):
    """Synthetic quantized 7B decoder weights (values irrelevant for
    throughput; layout/dtypes exactly match quantize_tree output).
    ``group_nf4``: the TRAINING base scheme (group-wise NF4 with uint8
    nibbles + per-group absmax, quantize_int4's nf4=True layout — the
    reference's QLoRA base) instead of the rank-1 serving scheme."""
    import jax.numpy as jnp

    from cogstream_tpu import presets

    cfg = presets.cogreasoner_7b().text
    H, D = cfg.hidden_size, cfg.head_dim
    kv_out = cfg.num_key_value_heads * D
    I, V, L = cfg.intermediate_size, cfg.vocab_size, cfg.num_hidden_layers

    def qdense(kshape, bias_dim=None):
        if bits == 4 and group_nf4:
            *lead, din, dout = kshape
            kern = {
                # uint8 dtype tags the NF4 codebook (dequantize_int4)
                "q4": jnp.full(tuple(lead) + (din // 2, dout), 0x33,
                               jnp.uint8),
                "scale": jnp.full(tuple(lead) + (din // 64, dout),
                                  1e-2, jnp.float32),
            }
            p = {"kernel": kern}
            if bias_dim is not None:
                p["bias"] = jnp.zeros(kshape[:-2] + (bias_dim,),
                                      jnp.bfloat16)
            return p
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


class Ctx:
    """Shared expensive builds across sections, ONE 7B text tree
    resident at a time (two synthetic 7Bs OOM the 16 GB chip)."""

    def __init__(self):
        self._text = {}
        self._vision = None
        self._projector = None

    def text7b(self, scheme: str):
        """scheme: 'int8' | 'int4c' | 'int4u'."""
        if scheme not in self._text:
            import gc

            self._text.clear()
            gc.collect()
            bits = 8 if scheme == "int8" else 4
            self._text[scheme] = _synthetic_7b_text_params(
                bits, uniform=(scheme == "int4u"))
        return self._text[scheme]

    def cogreasoner_7b_params(self, scheme: str, cfg):
        """Full 7B CogReasoner tree: shared real-scale vision tower +
        projector + the scheme's synthetic text weights."""
        import jax

        from cogstream_tpu.models.projector import init_projector_params
        from cogstream_tpu.models.vision_encoder import init_vision_params

        if self._vision is None:
            self._vision = init_vision_params(jax.random.PRNGKey(0),
                                              cfg.vision)
            self._projector = init_projector_params(
                jax.random.PRNGKey(1), cfg.vision.hidden_size,
                cfg.text.hidden_size, cfg.mm_projector_type,
                dtype=cfg.text.jnp_dtype)
        return {"vision": self._vision, "projector": self._projector,
                "text": self.text7b(scheme)}

    def free(self):
        import gc

        self._text.clear()
        self._vision = None
        self._projector = None
        gc.collect()


# ---------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------

def bench_encoder(ctx, use_pallas=True):
    import jax
    import jax.numpy as jnp

    from cogstream_tpu.config import VisionEncoderConfig
    from cogstream_tpu.models.vision_encoder import (
        init_vision_params, vision_encoder_forward)

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

    try:
        dt = _median_time(run, burst=8)
    except Exception:
        if not use_pallas:
            raise
        use_pallas = False
        dt = _median_time(run, burst=8)
    return {"_encoder_fps": round(T / dt, 2),
            "encoder_forward_s": round(dt, 4)}


def bench_encoder_int8(ctx):
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
                                      cfg, use_pallas=True)

    dt = _median_time(run, burst=8)
    return {"encoder_int8_fps": round(T / dt, 2)}


def bench_quant_quality(ctx):
    """END-TO-END quality deltas of the serving quantization ladder
    (VERDICT r4 missing #3): what do the headline quantized modes cost
    in output fidelity through all 28 layers? Weights are generated on
    device from one seed and re-quantized per scheme, so every row
    compares quantizations of the SAME float model
    (evaluate/quant_quality.py — rationale + caveats there). bf16
    truth exists only at demo width (a bf16 7B does not fit one v5e);
    7B rows ladder against int8, the least-lossy resident scheme.
    Metrics: teacher-forced logit MAE + KL(nats) + top-1 agreement
    over a 128-token probe, and greedy-prefix agreement for the
    decode-path modes (w4a8, fp8-KV) whose flags only engage there."""
    import dataclasses
    import gc

    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.evaluate import quant_quality as qq

    out = {}
    cfg7 = presets.cogreasoner_7b().text
    ids = qq.probe_ids(cfg7, 128)
    ctx.free()          # quality params replace the synthetic residency

    p8 = qq.build_text_params(cfg7, "int8", seed=11)
    l8 = qq.tf_logits(p8, ids, cfg7)
    lw = qq.tf_logits(p8, ids,
                      dataclasses.replace(cfg7, w8a8_prefill=True))
    out.update(qq.compare_logits(l8, lw, "qq7_w8a8_vs_int8"))
    del lw
    lc = qq.cached_logits(p8, ids, cfg7, 512)
    lf = qq.cached_logits(p8, ids, cfg7, 512,
                          kv_dtype=jnp.float8_e4m3fn)
    out.update(qq.compare_logits(lc, lf, "qq7_fp8kv_vs_bf16kv"))
    del lc, lf
    g8 = qq.greedy_continuation(p8, cfg7, ids, n=32)
    gf = qq.greedy_continuation(p8, cfg7, ids, n=32,
                                kv_dtype=jnp.float8_e4m3fn)
    out["qq7_fp8kv_greedy_prefix"] = qq.prefix_agreement(g8, gf)
    del p8
    gc.collect()

    p4 = qq.build_text_params(cfg7, "int4u", seed=11)
    l4 = qq.tf_logits(p4, ids, cfg7)
    out.update(qq.compare_logits(l8, l4, "qq7_int4u_vs_int8"))
    del l4
    g4 = qq.greedy_continuation(p4, cfg7, ids, n=32)
    g4w = qq.greedy_continuation(
        p4, dataclasses.replace(cfg7, w4a8_decode=True), ids, n=32)
    out["qq7_w4a8_greedy_prefix"] = qq.prefix_agreement(g4, g4w)
    del p4
    gc.collect()

    pn = qq.build_text_params(cfg7, "nf4", seed=11)   # training base
    ln = qq.tf_logits(pn, ids, cfg7)
    out.update(qq.compare_logits(l8, ln, "qq7_nf4_vs_int8"))
    del pn, ln, l8
    gc.collect()

    # demo width: real bf16 truth for the int8 / W8A8 ladder
    dcfg = presets.demo().text
    dids = qq.probe_ids(dcfg, 128)
    db = qq.build_text_params(dcfg, "bf16", seed=11)
    lb = qq.tf_logits(db, dids, dcfg)
    del db
    d8 = qq.build_text_params(dcfg, "int8", seed=11)
    l8d = qq.tf_logits(d8, dids, dcfg)
    out.update(qq.compare_logits(lb, l8d, "qq_demo_int8_vs_bf16"))
    lwd = qq.tf_logits(d8, dids,
                       dataclasses.replace(dcfg, w8a8_prefill=True))
    out.update(qq.compare_logits(lb, lwd, "qq_demo_w8a8_vs_bf16"))
    del d8, lb, l8d, lwd
    gc.collect()

    # encoder W8A8: feature-space fidelity at reference tower scale
    from cogstream_tpu.config import VisionEncoderConfig
    from cogstream_tpu.models.vision_encoder import (
        init_vision_params, quantize_vision_w8a8, vision_encoder_forward)

    vcfg = VisionEncoderConfig()
    T, gh, gw = 8, 32, 32
    rng = np.random.default_rng(0)
    pv = jnp.asarray(
        rng.normal(size=(T * gh * gw, 3 * vcfg.patch_size ** 2)),
        jnp.bfloat16)
    gs = np.array([[T, gh, gw]])
    msz = np.array([2])
    vp = init_vision_params(jax.random.PRNGKey(0), vcfg)
    fb = vision_encoder_forward(vp, pv, gs, msz, vcfg, use_pallas=True)
    fq = vision_encoder_forward(quantize_vision_w8a8(vp), pv, gs, msz,
                                vcfg, use_pallas=True)

    @jax.jit
    def _cos(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        c = jnp.sum(a * b, -1) / jnp.maximum(
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1),
            1e-9)
        return jnp.mean(c), jnp.min(c)

    cm, cmin = _cos(fb, fq)
    out["qq_encoder_w8a8_cos_mean"] = round(float(cm), 5)
    out["qq_encoder_w8a8_cos_min"] = round(float(cmin), 5)
    del vp, fb, fq
    gc.collect()
    return out


def bench_decoder(ctx):
    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = presets.demo().text
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
    return {"decode_tokens_per_sec": round(decode_tok_s, 2),
            "prefill_tokens_per_sec": round(S / dt_p, 1),
            "prefill_16k_tokens_per_sec": round(LS / dt_l, 1),
            "decoder_size": "0.5B-demo"}


def bench_session_demo(ctx):
    """p50 per-turn ask latency with cross-turn KV reuse (BASELINE.md
    north star; demo-size decoder — the 7B serving numbers come from
    the quantized-session sections)."""
    import dataclasses

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = dataclasses.replace(
        presets.demo(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok, _ = _tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=8192,
                            use_pallas=True)

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
    # FCC turns: the full production path — constrained selector decode
    # (history-derived cap, runtime/retrieval.selector_token_cap) +
    # history-masked answer decode (the reference's per-turn
    # qa_selection, answer_generate.py:71-73). The AC asks above built
    # real history for the selector to chew on.
    lat_fcc = []
    for i in range(4):
        t0 = time.perf_counter()
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat_fcc.append(time.perf_counter() - t0)
    return {"turn_p50_s": round(float(np.median(lat[1:])), 4),
            "turn_p50_fcc_s": round(float(np.median(lat_fcc[1:])), 4),
            "session_ingest_fps": round(T / ingest_s, 1)}


def bench_7b_quantized(ctx, scheme: str, w4a8: bool = False):
    """7B decode on ONE chip via quantized weights (ops/quant.py):
    int8 (~7.6 GB layer weights) or rank-1 4-bit (~4 GB) + bf16
    embeddings fit a single v5e's 16 GB HBM — the quantized-base
    serving modes (the reference needs bitsandbytes NF4 + a GPU for
    the same trick). int8 decode runs at the HBM roofline. 4-bit comes
    in two schemes: cubic codebook (quality; XLA materializes the
    nibble unpack at ~1.8x int8 step time) and uniform ('int4u'; the
    speed AND capacity scheme — decode routes through the Pallas
    fused-unpack GEMV with layer-indexed stacked weights,
    ops/quant_gemv.py). Weights are synthetic (values don't matter for
    throughput)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = presets.cogreasoner_7b().text
    if w4a8:
        # W4A8 decode (config.w4a8_decode): per-row int8 activations +
        # int8 MXU dots in the GEMV — measured 7.5 ms/pass vs int8-XLA's
        # 8.2 on the 7B MLP stack, at HALF the weight HBM
        cfg = dataclasses.replace(cfg, w4a8_decode=True)
    params = ctx.text7b(scheme)
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
    # lengths so the prefill doesn't get charged to decode. The
    # headline decode fields are 3-run MEDIANS with a recorded spread
    # (VERDICT r4 weak #7): tunnel noise swings single marginal
    # samples enough to fake round-over-round regressions.
    short = NEW // 4
    _sync(run(short))
    _sync(run(NEW))

    def marginal():
        dt_s = _median_time(lambda: run(short), iters=2, warmup=0)
        dt_l = _median_time(lambda: run(NEW), iters=2, warmup=0)
        return (NEW - short) / max(dt_l - dt_s, 1e-9)

    samples = sorted(marginal() for _ in range(3))
    decode_tok_s = samples[1]
    spread = round((samples[2] - samples[0]) / max(samples[1], 1e-9), 3)
    if w4a8:
        return {"int4_w4a8_7b_decode_tok_s": round(decode_tok_s, 2),
                "int4_w4a8_7b_decode_spread": spread}

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
    tag = {"int8": "int8", "int4c": "int4", "int4u": "int4u"}[scheme]
    out = {f"{tag}_7b_decode_tok_s": round(decode_tok_s, 2),
           f"{tag}_7b_decode_spread": spread,
           f"{tag}_7b_prefill_tok_s": round(S / dt_p, 1)}
    if scheme in ("int8", "int4u"):
        # W8A8/W4A8 serving prefill (config.w8a8_prefill): the
        # compute-bound prefill GEMMs run int8xint8 on the MXU
        # double-rate path (int4 uniform: the unpacked nibbles ARE
        # int8 — ops/quant.int4_matmul act_int8 branch)
        pf8 = make_pf(dataclasses.replace(cfg, w8a8_prefill=True))
        dt_p8 = _median_time(lambda: pf8(params, emb, positions),
                             iters=2, warmup=1)
        key = ("int8_7b_prefill_w8a8_tok_s" if scheme == "int8"
               else "int4_7b_prefill_w4a8_tok_s")
        out[key] = round(S / dt_p8, 1)
    if scheme == "int4u":
        out["int4u_7b_decode_tok_s"] = out.pop("int4u_7b_decode_tok_s")
        out.pop("int4u_7b_prefill_tok_s", None)   # cubic row covers it
    return out


def bench_longctx_7b(ctx):
    """7B long-context evidence (SURVEY §5 long-context axis): 16k-token
    prefill throughput (bf16-act and W8A8 serving modes) through the
    chunked online-softmax attention path, and the MARGINAL decode rate
    against a 16k-deep cache with bf16 vs fp8 KV (fp8 halves the
    per-step cache HBM read — the dominant stream at this depth after
    the int8 weights)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = presets.cogreasoner_7b().text
    params = ctx.text7b("int8")
    LS, NEW = 16384, 32
    emb = qwen2.embed(params, jnp.zeros((1, LS), jnp.int32))
    positions = jnp.asarray(np.arange(LS, dtype=np.int32)[None])
    out = {}

    def make_pf(c):
        @jax.jit
        def pf(params, emb, positions):
            cache = init_kv_cache(c, 1, LS)
            hidden, _ = qwen2.qwen2_forward(params, emb, positions, c,
                                            cache=cache)
            return hidden[:, -1]
        return pf

    # HOIST the jitted programs: re-creating the @jax.jit wrapper per
    # timing call loads a fresh executable each time, and six resident
    # 16k-prefill executables alongside the 7.6 GB weights reproducibly
    # PANICKED the axon client at the next big-program execute
    # ('client.rs:2008 index out of bounds: len 31 index 31', round-5
    # kernel probe) — one executable per config, reused, is both
    # correct timing hygiene and the workaround.
    pf = make_pf(cfg)
    dt = _median_time(lambda: pf(params, emb, positions),
                      iters=2, warmup=1)
    out["int8_7b_prefill_16k_tok_s"] = round(LS / dt, 1)
    cfg8 = dataclasses.replace(cfg, w8a8_prefill=True)
    pf8 = make_pf(cfg8)
    dt8 = _median_time(lambda: pf8(params, emb, positions),
                       iters=2, warmup=1)
    out["int8_7b_prefill_16k_w8a8_tok_s"] = round(LS / dt8, 1)

    last = jnp.asarray([LS - 1], jnp.int32)

    def run(new, kv_dtype):
        cache = init_kv_cache(cfg, 1, LS + NEW, dtype=kv_dtype)
        return generate_tokens(params, emb, positions, last, cache,
                               jax.random.PRNGKey(0), cfg, new,
                               eos_id=-1, temperature=0.0)

    for name, dt_kv in (("bf16", None), ("fp8", jnp.float8_e4m3fn)):
        # marginal rate: the 16k prefill is identical at both lengths
        # and cancels in the difference
        dt_s = _median_time(lambda: run(NEW // 4, dt_kv),
                            iters=2, warmup=1)
        dt_l = _median_time(lambda: run(NEW, dt_kv), iters=2, warmup=1)
        tok_s = (NEW - NEW // 4) / max(dt_l - dt_s, 1e-9)
        out[f"int8_7b_decode_16k_tok_s_{name}kv"] = round(tok_s, 2)
    return out


def bench_longctx32_7b(ctx):
    """32k context — the model's full configured window (config.json
    max_position_embeddings; the reference caps at 32k on one A100,
    SURVEY §5). bf16 KV at this depth is ~3.8 GB of cache; the fp8
    option halves that — 32k is where its CAPACITY value shows.

    Backend constraint (measured 2026-08-21): a SINGLE program over a
    32768-token sequence fails axon's remote compile outright
    ('tpu_compile_helper subprocess exit code 1', deterministic across
    relaunches), while every 16k program compiles fine. So the 32k
    window builds the production way: TWO 16k chunked prefill programs
    (the second attends back to the first through the position-tagged
    cache) and only the decode-width program is 32k-wide. The prefill
    rate reported is that honest 2x16k chain.

    In the driver SECTIONS list since r5 (VERDICT r4 #3) with two
    guards: a compile refusal returns a ``longctx32_skipped`` marker
    instead of burning a crash-relaunch, and the per-section stall
    watchdog (COGSTREAM_BENCH_WATCHDOG_S) covers the backend's silent
    multi-ten-minute hang mode."""
    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens

    cfg = presets.cogreasoner_7b().text
    params = ctx.text7b("int8")
    LS, HALF, NEW = 32768, 16384, 32
    emb_h = qwen2.embed(params, jnp.zeros((1, HALF), jnp.int32))
    pos_a = jnp.asarray(np.arange(HALF, dtype=np.int32)[None])
    pos_b = jnp.asarray(np.arange(HALF, LS, dtype=np.int32)[None])
    out = {}

    @jax.jit
    def pf_chunk(params, cache, emb, positions):
        _, cache = qwen2.qwen2_forward(params, emb, positions, cfg,
                                       cache=cache)
        return cache

    def build_cache(kv_dtype):
        # cache sized to a 1024-multiple (LS + 1024 covers NEW): the
        # flash prefill kernel blocks the KV axis in 128-multiples, so
        # a 32800-slot cache would silently fall back to the XLA
        # chunked path (measured 1731 vs ~5k+ tok/s kernel)
        cache = init_kv_cache(cfg, 1, LS + 1024, dtype=kv_dtype)
        cache = pf_chunk(params, cache, emb_h, pos_a)
        return pf_chunk(params, cache, emb_h, pos_b)

    def full_prefill():
        return build_cache(None).k

    try:
        dt = _median_time(lambda: full_prefill(), iters=2, warmup=1)
    except Exception as e:  # noqa: BLE001 — compile refusal, not a crash
        msg = repr(e)
        if "compile" in msg.lower() or "RESOURCE_EXHAUSTED" in msg:
            return {"longctx32_skipped": msg[:160]}
        raise
    out["int8_7b_prefill_32k_tok_s"] = round(LS / dt, 1)

    emb1 = qwen2.embed(params, jnp.zeros((1, 1), jnp.int32))
    pos1 = jnp.asarray([[LS - 1]], jnp.int32)
    last1 = jnp.asarray([0], jnp.int32)

    for name, dt_kv in (("bf16", None), ("fp8", jnp.float8_e4m3fn)):

        def run(new):
            # rebuild per call: generate_tokens DONATES its cache, and
            # keeping a reusable copy would put two 3.8 GB caches next
            # to the 8 GB weights. The rebuild (2x16k prefills) is
            # identical across run lengths, so it cancels in the
            # marginal differencing; rewind one slot so the 1-token
            # "prompt" re-feeds the last position and decode extends
            # a full-depth history.
            c0 = build_cache(dt_kv)
            c = qwen2.KVCache(c0.k, c0.v, c0.pos, c0.write_index - 1)
            return generate_tokens(params, emb1, pos1, last1, c,
                                   jax.random.PRNGKey(0), cfg, new,
                                   eos_id=-1, temperature=0.0)

        dt_s = _median_time(lambda: run(NEW // 4), iters=2, warmup=1)
        dt_l = _median_time(lambda: run(NEW), iters=2, warmup=1)
        tok_s = (NEW - NEW // 4) / max(dt_l - dt_s, 1e-9)
        out[f"int8_7b_decode_32k_tok_s_{name}kv"] = round(tok_s, 2)
    return out


def bench_lookahead_7b(ctx, scheme: str, K: int = 4, w4a8: bool = False):
    """Prompt-lookup speculative decode at 7B. Two honest rows:

    - ``la_verify_vs_decode_step``: time of one (K+1)-token verify
      forward over one 1-token decode step. Decode is weights-bound at
      7B, so this ratio is the REAL cost of drafting; with acceptance
      rate a, wall-clock speedup ~= (1 + a*K) / ratio.
    - ``la_7b_*_decode_tok_s``: end-to-end lookahead generate.
      Synthetic constant weights collapse greedy output to a short
      cycle, so the bigram draft accepts nearly everything — this is
      the acceptance CEILING, not a typical-text expectation (real
      answers accept on echoed spans: names, numbers, phrases from
      the prompt/history).
    - ``la_7b_*_fixed_decode_tok_s``: the PRIMARY reproducible row
      (VERDICT r3 weak #4: the ceiling fields swung >2x between
      driver and local runs — acceptance-pattern luck plus a too-short
      ~70 ms differencing window). A teacher-forced draft schedule
      accepts EXACTLY K/2 drafts per verify step (fixed_draft /
      fixed_accept in generate_tokens_lookahead), and the window is
      4x longer (NEW=128), so the field measures the speculative
      ENGINE (verify forwards + rewinds) at a pinned 50% acceptance
      rate — run-to-run differences are tunnel noise only.
      ``la_*_fixed_steps`` pins the schedule: it must equal
      ceil((NEW-1)/(K/2+1)) exactly or the row is void."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cogstream_tpu import presets
    from cogstream_tpu.models import qwen2
    from cogstream_tpu.models.qwen2 import init_kv_cache
    from cogstream_tpu.runtime.generate import generate_tokens_lookahead

    cfg = presets.cogreasoner_7b().text
    if w4a8:
        cfg = dataclasses.replace(cfg, w4a8_decode=True)
    params = ctx.text7b(scheme)
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

    # deterministic fixed-acceptance row (docstring): teacher = the
    # model's own greedy continuation, schedule = exactly K/2 hits/step
    from cogstream_tpu.runtime.generate import generate_tokens

    FNEW = 128
    cache_t = init_kv_cache(cfg, 1, S + FNEW + K + 1)
    teacher = generate_tokens(params, emb, positions, last, cache_t,
                              jax.random.PRNGKey(0), cfg, FNEW + K,
                              eos_id=-1, temperature=0.0)
    teacher_ids = jnp.asarray(np.asarray(teacher.tokens)[0], jnp.int32)

    def run_fixed(new):
        cache = init_kv_cache(cfg, 1, S + FNEW + K + 1)
        return generate_tokens_lookahead(
            params, emb, positions, last, cache, jnp.asarray(ids), cfg,
            new, eos_id=-1, lookahead_k=K,
            fixed_draft=teacher_ids, fixed_accept=K // 2)

    fshort = FNEW // 4
    fdt_s = _median_time(lambda: run_fixed(fshort), iters=3, warmup=1)
    fdt_l = _median_time(lambda: run_fixed(FNEW), iters=3, warmup=1)
    ftok_s = (FNEW - fshort) / max(fdt_l - fdt_s, 1e-9)
    fsteps = int(np.asarray(run_fixed(FNEW).steps))
    expect = -(-(FNEW - 1) // (K // 2 + 1))
    fixed = {"fixed_decode_tok_s": round(ftok_s, 2),
             "fixed_steps": fsteps}
    if fsteps != expect:        # schedule broke — the row is void
        fixed = {"fixed_steps": fsteps,
                 "fixed_steps_expected": expect}

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
    tag = "int8" if scheme == "int8" else "int4"
    out = {f"la_7b_{tag}_{kk}": vv for kk, vv in fixed.items()}
    out[f"la_7b_{tag}_decode_tok_s"] = round(NEW / dt, 2)
    if scheme == "int8":
        out["la_7b_int8_steps_for_64"] = steps
        out["la_verify_vs_decode_step"] = round(dk / d1, 3)
    else:
        out["la_7b_int4_verify_vs_step"] = round(dk / d1, 3)
    return out


def _session_cfg_7b(w8a8_prefill=False, w4a8_decode=False):
    import dataclasses

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig

    cfg = dataclasses.replace(
        presets.cogreasoner_7b(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    if w8a8_prefill or w4a8_decode:
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(
                cfg.text, w8a8_prefill=w8a8_prefill,
                w4a8_decode=w4a8_decode))
    return cfg


def bench_session_7b_quant(ctx, scheme: str, w4a8: bool = False):
    """FULL-WIDTH production turn: a StreamingSession over the real 7B
    shapes — reference-scale 27L/1152 vision tower + quantized 7B
    decoder on ONE v5e (int8 ~10 GB weights, int4 ~5 GB; bf16 would
    not fit) — evidencing BASELINE.md's '<1 s p50 per-turn for 7B'
    with the FCC selector decode included. The selector decodes its
    HISTORY-DERIVED cap (runtime/retrieval.selector_token_cap — random
    weights never emit ']', so every turn decodes the full cap: the
    honest worst case for this history depth). The typical row caps at
    12 (a trained selector's '[yes,0,5]'-shaped output). Weights are
    synthetic; throughput depends only on shapes/dtypes.

    W4A8 note: adding w8a8_prefill=True here was MEASURED AND REJECTED:
    the standalone 512-token prefill gains 28% but the session LOSES
    (ingest 35 -> 21 fps, typical turn 0.58 -> 0.64 s) — the ingest
    buckets' GEMMs don't amortize the unpack-to-int8 materialization
    the act path adds."""
    import jax

    from cogstream_tpu.runtime.session import StreamingSession

    cfg = _session_cfg_7b(w4a8_decode=w4a8)
    params = ctx.cogreasoner_7b_params(scheme, cfg)
    tok, tok_kind = _tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=4096,
                            use_pallas=True)

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
    # build history with AC asks first (no selector) so the FCC asks
    # below run at a STABLE history depth — the history-derived cap
    # bucket (selector_token_cap) then stays constant across the timed
    # asks instead of a mid-measurement bucket crossing paying a fresh
    # remote compile inside the median window
    for i in range(5):
        sess.ask(q, mode="AC", max_new_tokens=32)
    lat = []
    for i in range(4):              # ask 0 pays the selector compiles
        t0 = time.perf_counter()    # (H=5..8 all sit in one cap bucket)
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat.append(time.perf_counter() - t0)
    worst_cap = sess.selector._cap_for([len(sess.hist_qs)])

    # TYPICAL-selector variant: a trained selector emits ']' after
    # ~4-12 tokens and the decode stops there; capping at 12 models
    # that typical production turn (vs the worst case above, which
    # decodes the full history-derived cap).
    sess.selector.max_new_tokens = 12
    lat_typ = []
    for i in range(4):              # ask 0 compiles the 12-step decode
        t0 = time.perf_counter()
        sess.ask(q, mode="FCC", max_new_tokens=32)
        lat_typ.append(time.perf_counter() - t0)
    tag = {"int8": "int8", "int4u": "int4"}[scheme]
    out = {f"turn_p50_fcc_7b_{tag}_s":
               round(float(np.median(lat[1:])), 4),
           f"session_ingest_fps_7b{'' if tag == 'int8' else '_int4'}":
               round(T / float(np.median(ing[3:])), 1),
           f"turn_p50_fcc_7b_{tag}_typical_s":
               round(float(np.median(lat_typ[1:])), 4)}
    if tag == "int8":
        out["session_7b_tokenizer"] = tok_kind
        out["selector_cap_7b"] = worst_cap
    return out


def bench_session_7b_w8a8(ctx):
    """W8A8 serving-mode variant of the 7B session: the vision tower
    runs int8 weights + int8 activations (encoder_int8=True) AND the
    decoder's prefill GEMMs run W8A8 (config.w8a8_prefill) — the
    full int8 serving stack. Reports steady ingest fps and the
    typical-selector FCC turn; bf16-prefill numbers stay the headline
    (W8A8 is opt-in, quality unvalidated without a checkpoint)."""
    import jax

    from cogstream_tpu.runtime.session import StreamingSession

    cfg = _session_cfg_7b(w8a8_prefill=True)
    params = ctx.cogreasoner_7b_params("int8", cfg)
    tok, _ = _tokenizer_for(cfg)
    sess = StreamingSession(params, cfg, tok, max_len=4096,
                            use_pallas=True, encoder_int8=True)

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
    return {"session_ingest_fps_7b_w8a8":
                round(T / float(np.median(ing[2:])), 1),
            "turn_p50_fcc_7b_w8a8_typical_s":
                round(float(np.median(lat[2:])), 4)}


def bench_e2e_ingest_7b(ctx):
    """CAMERA-TO-CACHE streaming ingest at full 7B serving width
    (VERDICT r2 item 2): a real video file → cv2 decode-ahead thread →
    preprocess-ahead thread (resize/patchify) → W8A8 27L vision encode
    → int8-7B prefill, through SessionServer's chunked ingest. The
    north-star '≥30 fps streaming ingest' (BASELINE.md) measured with
    DECODE INCLUDED — the number round 2 only had at demo scale
    (16.9 fps, serial host stages). Runs the FULL int8 serving stack
    (W8A8 tower + W8A8 decoder prefill — bench_session_7b_w8a8's mode,
    the fastest shipped ingest path; bf16-feature sessions stay the
    quality default and their device-side rate is
    session_ingest_fps_7b). Steady-state: a warm-up pass compiles
    every bucket, then a fresh session ingests the same window timed
    end-to-end."""
    import tempfile

    import cv2
    import jax

    from cogstream_tpu.runtime.serve import SessionServer

    cfg = _session_cfg_7b(w8a8_prefill=True)
    params = ctx.cogreasoner_7b_params("int8", cfg)
    tok, _ = _tokenizer_for(cfg)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                            (640, 360))
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (360, 640, 3), np.uint8)
        # 128 s at 24 fps: the processor's max_frames default window
        # (128 @ 1 fps). Window length sets the per-frame token budget
        # (16384/128 = 128 merged tokens — reference semantics,
        # image_processing_videollama3.py:93-131); a shorter window
        # doubles per-frame tokens and with it the ~15 MB/s tunnel
        # upload per frame. Content: static base + a moving block
        # (the pixel-diff mask compresses steadily, as real streams do).
        for i in range(24 * 128):
            frame = base.copy()
            frame[:40, :40] = (i * 5) % 255
            frame[80:120, (i // 24 * 8) % 600:(i // 24 * 8) % 600 + 40] \
                = 255 - (i % 255)
            w.write(frame)
        w.release()

        # chunk 16: 32-frame chunks crashed the TPU worker twice in a
        # row ('kernel fault') — 16 is the proven-stable shape
        # the axon tunnel's host->device rate bounds camera-to-cache
        # ingest (~300 KB/frame at the 128-token budget); record it so
        # the artifact states the wire constraint this number rides on
        # (a real v5e host feeds over PCIe and would be device-bound)
        import jax.numpy as jnp
        blob = np.zeros((8 << 20,), np.uint8)
        x = jnp.asarray(blob); jax.device_get(x[:1])
        t0 = time.perf_counter()
        x = jnp.asarray(blob); jax.device_get(x[:1])
        up_mbps = 8.0 / (time.perf_counter() - t0)

        server = SessionServer(params, cfg, tok, max_len=4096,
                               use_pallas=True, encoder_int8=True,
                               ingest_chunk_frames=16)
        server.create("warm")
        server.ingest("warm", path, start=0.0, end=128.0, fps=1.0)
        server.create("run")
        t0 = time.perf_counter()
        r = server.ingest("run", path, start=0.0, end=128.0, fps=1.0)
        dt = time.perf_counter() - t0
        return {"ingest_e2e_fps_7b": round(r["frames"] / dt, 1),
                "ingest_e2e_7b_backend": r["decode_backend"],
                "ingest_e2e_7b_buffered_max":
                    int(r["decode_buffered_max"]),
                "tunnel_upload_mbps": round(up_mbps, 1)}


def bench_train_7b(ctx):
    """7B-SCALE stage-2 training step (VERDICT r3 next #4): NF4 base
    (the reference's QLoRA scheme, second_stage_training.py:266-294) +
    LoRA + remat through the REAL Stage2Trainer jitted multimodal step
    on ONE v5e — round 3's training perf evidence stopped at the 0.5B
    demo. Batches come from the genuine video→processor→GT-COI chain
    (a short synthetic clip), captured once and re-stepped warm; the
    reported step time is the jitted update on the largest captured
    turn bucket (``float(loss)`` inside train_turn is the honest
    sync). Weights are synthetic NF4 layouts; step time depends only
    on shapes/dtypes."""
    import dataclasses
    import tempfile

    import cv2
    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.processor.processing import CogStreamProcessor
    from cogstream_tpu.train.stage2 import (Stage2Config, Stage2Trainer,
                                            train_stage2_video)

    ctx.free()          # the serving 7B must not co-reside (16 GB chip)
    cfg = dataclasses.replace(
        presets.cogreasoner_7b(),
        compression=CompressionConfig(frames_per_event=4,
                                      keyframes_per_event=1))
    from cogstream_tpu.models.projector import init_projector_params
    from cogstream_tpu.models.vision_encoder import init_vision_params

    # real-scale vision tower + projector (bf16, trainable via LoRA)
    params = {
        "text": _synthetic_7b_text_params(4, group_nf4=True),
        "vision": init_vision_params(jax.random.PRNGKey(0), cfg.vision),
        "projector": init_projector_params(
            jax.random.PRNGKey(1), cfg.vision.hidden_size,
            cfg.text.hidden_size, cfg.mm_projector_type,
            dtype=cfg.text.jnp_dtype),
    }
    tok, _ = _tokenizer_for(cfg)
    processor = CogStreamProcessor(tok, cfg.processor)

    # long answers + a 24-frame second segment push the largest packed
    # turn into the 2048 bucket — the reference's stage-2 curriculum
    # length (second_stage_training.py:149) — rather than a 512-token
    # short turn
    long_a = ("the camera pans across a textured surface while a "
              "bright square block drifts steadily to the right, "
              "passing over several darker regions; near the end of "
              "the segment the block dims, pauses briefly above the "
              "center stripe, then continues moving until it leaves "
              "the visible area on the right edge of the frame.")
    segments = [
        {"timestamp": [0.0, 8.0], "QAs": [
            {"QA_pairs": [{"Q": "what is shown in the scene?",
                           "A": long_a}],
             "relevance": [], "is_visual": True}]},
        {"timestamp": [8.0, 48.0], "QAs": [
            {"QA_pairs": [{"Q": "did anything change since before, "
                                "and how did the motion evolve?",
                           "A": long_a}],
             "relevance": [1], "is_visual": True}]},
    ]
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 4,
                            (256, 192))
        rng = np.random.default_rng(3)
        base = rng.integers(0, 255, (192, 256, 3), np.uint8)
        for i in range(224):
            f = base.copy()
            f[40:80, (i * 12) % 200:(i * 12) % 200 + 40] = 255 - (i % 200)
            w.write(f)
        w.release()

        tcfg = Stage2Config(max_seq_len=4096, max_frames=48,
                            grad_accum=1, save_every=10**9, fps=1)
        trainer = Stage2Trainer(params, cfg, tok, tcfg,
                                os.path.join(td, "s2"),
                                total_steps=100, log=lambda *a: None)
        batches = []
        orig = trainer.train_turn

        def rec(batch):
            batches.append(dict(batch))     # train_turn pops in place
            return orig(batch)

        trainer.train_turn = rec
        train_stage2_video(trainer, processor, path, segments,
                           log=lambda *a: None)        # compiles
        trainer.train_turn = orig
        big = max(batches, key=lambda b: b["input_ids"].shape[-1])
        S = int(big["input_ids"].shape[-1])

        def time_step(tr, batch, n=4):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                tr.train_turn(dict(batch))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts[1:]))

        step_s = time_step(trainer, big)
        out = {"stage2_7b_train_step_s": round(step_s, 3),
               "stage2_7b_train_tok_s": round(S / step_s, 1),
               "stage2_7b_train_seq_len": S}
        # second bucket (VERDICT r4 weak #4: one bucket is not a
        # curve): the largest batch strictly below the top bucket
        lower = [b for b in batches
                 if b["input_ids"].shape[-1] < S]
        if lower:
            b2 = max(lower, key=lambda b: b["input_ids"].shape[-1])
            S2 = int(b2["input_ids"].shape[-1])
            st2 = time_step(trainer, b2)
            out["stage2_7b_train_tok_s_s%d" % S2] = round(S2 / st2, 1)

        # decomposition: forward-only loss at the same shapes — the
        # remainder (step - fwd) is backward(remat recompute incl. a
        # second NF4 dequant pass) + optax
        import jax as _jax
        import jax.numpy as _jnp

        from cogstream_tpu.train.multimodal import multimodal_loss_fn

        n_vis = int(big.get("num_vis_tokens", 1))
        dev_big = {k: _jnp.asarray(v) for k, v in big.items()
                   if k != "num_vis_tokens"}

        @_jax.jit
        def fwd_only(p, l, b):
            return multimodal_loss_fn(p, l, b, cfg,
                                      trainer.lora_cfg.scale,
                                      num_vis_tokens=n_vis, remat=True)

        def run_fwd():
            return fwd_only(trainer.params, trainer.state.lora, dev_big)

        dt_f = _median_time(run_fwd, iters=3, warmup=1)
        out["stage2_7b_fwd_s"] = round(dt_f, 3)

        # int8 base (weight-only) and int8+W8A8-forward (STE grads,
        # stage2 --w8a8-forward): isolates the NF4 codebook dequant
        # (nf4 vs int8 step) and the MXU int8 double-rate win (w8a8 vs
        # int8 step). One 7B tree resident at a time.
        del trainer, params
        import gc

        gc.collect()
        import dataclasses as _dc

        for label, w8a8 in (("int8", False), ("w8a8", True)):
            cfg_v = (_dc.replace(cfg, text=_dc.replace(
                cfg.text, w8a8_prefill=True)) if w8a8 else cfg)
            params_v = {
                "text": _synthetic_7b_text_params(8),
                "vision": init_vision_params(jax.random.PRNGKey(0),
                                             cfg.vision),
                "projector": init_projector_params(
                    jax.random.PRNGKey(1), cfg.vision.hidden_size,
                    cfg.text.hidden_size, cfg.mm_projector_type,
                    dtype=cfg.text.jnp_dtype),
            }
            tr = Stage2Trainer(params_v, cfg_v, tok, tcfg,
                               os.path.join(td, "s2" + label),
                               total_steps=100, log=lambda *a: None)
            st = time_step(tr, big)
            out[f"stage2_7b_train_step_s_{label}"] = round(st, 3)
            out[f"stage2_7b_train_tok_s_{label}"] = round(S / st, 1)
            del tr, params_v
            gc.collect()
    ctx.free()          # release the training trees before serving
    return out


def bench_pool_demo(ctx, n_rows: int = 4):
    """Aggregate decode throughput with the session pool: one decode
    program answers n_rows sessions at once (decode is weights-bound,
    so the batch multiplies tokens/sec nearly for free)."""
    import dataclasses

    import jax

    from cogstream_tpu import presets
    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.runtime.pool import SessionPool

    cfg = dataclasses.replace(
        presets.demo(), compression=CompressionConfig(
            frames_per_event=8, keyframes_per_event=2))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok, _ = _tokenizer_for(cfg)
    pool = SessionPool(params, cfg, tok, n_rows=n_rows, max_len=4096,
                       use_pallas=True, summary_forward=False)
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
    return {"pooled_decode_tok_s_b4":
                round(n_rows * NEW / float(np.median(dts)), 1),
            "pooled_ingest_fps_b4": round(ingest_agg_fps, 1)}


def bench_pool_7b(ctx, scheme: str, n_rows_list=(4, 8),
                  w4a8: bool = False):
    """PRODUCTION-scale pooled serving: n_rows streams share ONE
    quantized 7B on one chip (single-storage pool rows). Decode is
    weights-bound, so the lockstep batched decode multiplies aggregate
    tokens/sec nearly for free — this is the number a deployment sizes
    against. Per batch size, two rows: the MARGINAL aggregate decode
    rate (two ask lengths differenced — prefill/selector not charged to
    decode) and the blended full-ask aggregate. One params build serves
    every batch size (a second synthetic 7B would OOM the 16 GB chip),
    and each pool frees before the next allocates."""
    import gc

    import jax

    from cogstream_tpu.runtime.pool import SessionPool

    cfg = _session_cfg_7b(w4a8_decode=w4a8)
    params = ctx.cogreasoner_7b_params(scheme, cfg)
    tok, _ = _tokenizer_for(cfg)
    rng = np.random.default_rng(0)
    T, gh, gw = 8, 16, 16
    pv = rng.integers(0, 255, size=(T * gh * gw,
                                    3 * cfg.vision.patch_size ** 2),
                      dtype=np.uint8)

    tag = {"int8": "int8", "int4u": "int4"}[scheme]
    out = {}
    for n_rows in n_rows_list:
        pool = SessionPool(params, cfg, tok, n_rows=n_rows, max_len=2048,
                           use_pallas=True, summary_forward=False)
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
        out[f"pooled_7b_{tag}_decode_tok_s_b{n_rows}"] = round(
            n_rows * (NEW - SHORT) / max(d_l - d_s, 1e-9), 1)
        # paired-sample spread so round-over-round deltas on this
        # headline field are distinguishable from tunnel noise
        # (VERDICT r4 weak #7)
        pairs = sorted(n_rows * (NEW - SHORT) / max(l - s, 1e-9)
                       for s, l in zip(dts_s, dts_l))
        out[f"pooled_7b_{tag}_decode_spread_b{n_rows}"] = round(
            (pairs[2] - pairs[0]) / max(abs(pairs[1]), 1e-9), 3)
        out[f"pooled_7b_{tag}_ask_tok_s_b{n_rows}"] = round(
            n_rows * NEW / d_l, 1)
        del pool, rows, reqs                   # free the [B, max_len] cache
        gc.collect()
    return out


def bench_ingest_overlap(ctx):
    """End-to-end serving ingest at DEMO scale through the chunked
    decode-ahead path (N2 integration): a real video decodes
    chunk-by-chunk while the TPU encodes the previous chunk. Reports
    the decode backend, the decoder's lead high-water mark (buffered>0
    = decode genuinely overlapped encode), and end-to-end frames/sec.
    The 7B-scale equivalent is ``bench_e2e_ingest_7b``."""
    import dataclasses
    import tempfile

    import cv2
    import jax

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
        for i in range(24 * 32):     # 32 s at 24 fps source
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
                               use_pallas=True,
                               ingest_chunk_frames=16)
        server.create("b")
        server.ingest("b", path, start=0.0, end=32.0, fps=1.0)  # warm
        server.create("b2")
        t0 = time.perf_counter()
        r = server.ingest("b2", path, start=0.0, end=32.0, fps=1.0)
        dt = time.perf_counter() - t0
        return {"ingest_decode_backend": r["decode_backend"],
                "ingest_decode_buffered_max":
                    int(r["decode_buffered_max"]),
                "ingest_e2e_fps": round(r["frames"] / dt, 1)}


def bench_preprocess(ctx):
    """BASELINE config 1: host-side preprocess (any-res resize +
    patchify + normalize) + on-device temporal-semantic k-means over a
    1-minute 1fps clip equivalent."""
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
    return {"preprocess_fps": round(T / prep_s, 1),
            "kmeans_s": round(km_s, 4),
            "preprocess_fps_raw": round(T / prep_raw_s, 1)}


def bench_train_stage2(ctx):
    """Stage-2 LoRA train-step throughput at demo scale: real video →
    processor → GT-COI rewrite → jitted remat multimodal step on a 1x1
    mesh. train_turn's ``float(loss)`` is the honest sync (scalar
    fetch). Reports median steps/s over warm repeats of the same shape
    buckets."""
    import dataclasses
    import tempfile

    import cv2
    import jax

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
        return {"stage2_train_steps_per_sec":
                    round(1.0 / float(np.median(times)), 3)}


# ---------------------------------------------------------------------------
# child runner: ordered sections, artifact resume, budget, emission
# ---------------------------------------------------------------------------

# (name, est_seconds_warm_cache, fn, args...) — ordered by IMPORTANCE:
# a tight budget must still land the headline + the 7B serving fields.
SECTIONS = [
    ("encoder", 90, bench_encoder),
    ("session_7b_int8", 300, bench_session_7b_quant, "int8"),
    ("quant8", 120, bench_7b_quantized, "int8"),
    ("longctx_7b", 300, bench_longctx_7b),
    ("pool_7b_int8", 240, bench_pool_7b, "int8"),
    ("lookahead8", 150, bench_lookahead_7b, "int8"),
    ("session_7b_w8a8", 180, bench_session_7b_w8a8),
    # e2e ingest AFTER the reliable int8 sections: the chunked-ingest
    # path intermittently crashes the TPU worker ('kernel fault',
    # ~half of observed runs) and each crash-relaunch costs ~3 min of
    # budget — the orchestrator recovers, but the cheap reliable
    # fields must not queue behind it
    ("e2e_ingest_7b", 300, bench_e2e_ingest_7b),
    # 32k rows (promoted r5): same int8 residency as the sections
    # above; auto-skips with a marker field if the backend refuses the
    # compile, and the per-section stall watchdog covers its hangs
    ("longctx32_7b", 240, bench_longctx32_7b),
    ("session_7b_int4", 300, bench_session_7b_quant, "int4u", True),
    ("quant4u", 120, bench_7b_quantized, "int4u"),
    ("quant4u_w4a8", 60, bench_7b_quantized, "int4u", True),
    # quality ladder: frees the synthetic residency (its own seeded
    # builds), so it sits between the int4 serving sections and the
    # int4 pool section (which cheaply rebuilds the synthetic tree)
    ("quant_quality", 300, bench_quant_quality),
    ("pool_7b_int4", 300, bench_pool_7b, "int4u", (4, 8, 16), True),
    ("lookahead4", 150, bench_lookahead_7b, "int4u", 4, True),
    ("quant4", 120, bench_7b_quantized, "int4c"),
    ("decoder", 150, bench_decoder),
    ("session_demo", 180, bench_session_demo),
    ("pool_demo", 120, bench_pool_demo),
    ("encoder_int8", 60, bench_encoder_int8),
    ("preprocess", 60, bench_preprocess),
    ("train_stage2", 180, bench_train_stage2),
    # LAST: swaps the resident 7B for the NF4 training tree (ctx.free
    # on entry/exit) — running it earlier would force every later
    # serving section to rebuild its scheme
    ("train_7b", 600, bench_train_7b),
]
# bench_ingest_overlap (demo-scale chunked e2e ingest) is NOT in the
# section list: it crashed the TPU worker twice in a row on an idle
# host (r3 run 1, 'UNAVAILABLE: worker process crashed ... kernel
# fault') and its story is superseded by e2e_ingest_7b — the same
# camera-to-cache chain at production width, which runs clean. The
# function stays for manual invocation.

# Scheme-sibling map for post-crash sanity: a freshly relaunched TPU
# worker has measured up to 2.2x slower on its first section (r3:
# session_ingest_fps_7b_w8a8 18.7 right after a crash-relaunch vs 41.4
# clean). Keys are throughput fields (higher = better); if the first
# section completed after a relaunch lands a key under 0.6x its
# already-measured sibling, the section re-measures ONCE and keeps the
# better run; a still-low result gets a `*_post_crash` marker so the
# artifact can't silently carry a depressed number.
POST_CRASH_SIBLINGS = {
    "session_ingest_fps_7b_w8a8": "session_ingest_fps_7b",
    "session_ingest_fps_7b_int4": "session_ingest_fps_7b",
    "ingest_e2e_fps_7b": "session_ingest_fps_7b_w8a8",
    "pooled_7b_int4_decode_tok_s_b4": "pooled_7b_int8_decode_tok_s_b4",
}

# sections that only make sense on the real chip
TPU_ONLY = {"session_7b_int8", "quant8", "longctx_7b", "e2e_ingest_7b",
            "pool_7b_int8", "lookahead8", "session_7b_w8a8",
            "session_7b_int4", "quant4u", "quant4u_w4a8", "pool_7b_int4",
            "lookahead4", "quant4", "encoder_int8", "train_7b",
            "longctx32_7b", "quant_quality"}


def _load_art() -> dict:
    try:
        with open(ART_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_art(art: dict) -> None:
    tmp = ART_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(art, f)
    os.replace(tmp, ART_PATH)


def _assemble(art: dict) -> dict:
    """The printed artifact line: headline fields first, bookkeeping
    keys (underscore-prefixed) stripped."""
    fps = art.get("_encoder_fps", 0.0)
    out = {
        "metric": "encoder_frames_per_sec_per_chip",
        "value": fps,
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "platform": art.get("_platform", "unknown"),
    }
    for k, v in art.items():
        if not k.startswith("_"):
            out[k] = v
    skipped = art.get("_budget_skipped", [])
    if skipped:
        out["budget_skipped"] = ",".join(skipped)
    return out


# Priority fields for the COMPACT artifact line. The driver captures a
# 2000-char stdout TAIL: round 3's full cumulative line grew to 2057
# chars, so the line arrived front-truncated and `parsed` was null for
# the third round running. The fix: after every full line, print ONE
# compact line — headline envelope + the 7B serving/quality fields —
# hard-capped under COMPACT_BUDGET so the tail always ends with a
# parseable line no matter how many fields future rounds add.
COMPACT_FIELDS = [
    "session_ingest_fps_7b", "turn_p50_fcc_7b_int8_s",
    "turn_p50_fcc_7b_int8_typical_s",
    "int8_7b_decode_tok_s", "int8_7b_prefill_tok_s",
    "int8_7b_prefill_w8a8_tok_s", "int8_7b_prefill_16k_tok_s",
    "int8_7b_decode_16k_tok_s_bf16kv", "int8_7b_decode_16k_tok_s_fp8kv",
    "int8_7b_prefill_32k_tok_s", "int8_7b_decode_32k_tok_s_bf16kv",
    "int8_7b_decode_32k_tok_s_fp8kv",
    "ingest_e2e_fps_7b", "ingest_e2e_7b_backend", "tunnel_upload_mbps",
    "session_ingest_fps_7b_w8a8", "turn_p50_fcc_7b_w8a8_typical_s",
    "turn_p50_fcc_7b_int4_s", "turn_p50_fcc_7b_int4_typical_s",
    "session_ingest_fps_7b_int4",
    "int4u_7b_decode_tok_s", "int4_w4a8_7b_decode_tok_s",
    "int4_7b_decode_tok_s", "int4_7b_prefill_w4a8_tok_s",
    "pooled_7b_int8_decode_tok_s_b4", "pooled_7b_int8_decode_tok_s_b8",
    "pooled_7b_int4_decode_tok_s_b16",
    "la_7b_int8_decode_tok_s", "la_7b_int4_decode_tok_s",
    "la_7b_int8_fixed_decode_tok_s", "la_7b_int4_fixed_decode_tok_s",
    "stage2_7b_train_step_s", "stage2_7b_train_tok_s",
    "selector_cap_7b", "encoder_int8_fps",
    "qq7_int4u_vs_int8_top1_agree", "qq7_w8a8_vs_int8_top1_agree",
    "qq7_fp8kv_vs_bf16kv_top1_agree", "qq_demo_int8_vs_bf16_top1_agree",
    "qq_demo_w8a8_vs_bf16_top1_agree", "qq_encoder_w8a8_cos_mean",
    "budget_skipped",
]
COMPACT_BUDGET = 1900


def _assemble_compact(art: dict) -> dict:
    """Length-capped artifact line (see COMPACT_FIELDS). Fields are
    added in priority order and addition STOPS before the serialized
    line would cross COMPACT_BUDGET — growth of the field list can
    never re-break driver parsing."""
    full = _assemble(art)
    out = {k: full[k] for k in
           ("metric", "value", "unit", "vs_baseline", "platform")}
    out["compact"] = True
    n_err = sum(1 for k in art if k.endswith("_error"))
    if n_err:
        out["errors"] = n_err
    for k in COMPACT_FIELDS:
        if k not in full:
            continue
        cand = dict(out)
        cand[k] = full[k]
        if len(json.dumps(cand)) > COMPACT_BUDGET:
            break
        out = cand
    return out


def _emit(art: dict) -> None:
    """Print the FULL cumulative line (for humans / local artifacts)
    followed by the compact line — the driver's 2000-char tail must
    always END with a line that parses."""
    print(json.dumps(_assemble(art)), flush=True)
    print(json.dumps(_assemble_compact(art)), flush=True)


def run_sections() -> int:
    """Child entry: run every section not yet completed, emitting the
    cumulative artifact after each. Exits 0 when done (possibly with
    budget-skipped sections), nonzero on an unrecoverable crash (the
    orchestrator relaunches; completed sections are skipped via the
    artifact file)."""
    import threading

    import jax

    from cogstream_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    deadline = float(os.environ["COGSTREAM_BENCH_DEADLINE"])
    # STALL watchdog: besides crashing, the axon worker can silently
    # stop executing for ~10+ min (observed live: a fresh child sat
    # blocked on its first dispatch for 12 min, burning half the run
    # budget, then resumed). A section making no progress for
    # WATCHDOG_S exits 17 — the orchestrator relaunches into a fresh
    # client/worker connection and resumes from the artifact. 960 s
    # clears every observed warm section, the ~300 s cold encoder
    # compile, AND the documented ~840 s worst-case cold remote compile
    # of the rolled decoder scan (CLAUDE.md) — a fully cold persistent
    # cache must not get its legitimately long first compile killed
    # (ADVICE r4: a killed compile writes no cache entry, so two
    # attempts burn the budget and the section is abandoned).
    watchdog_s = float(os.environ.get("COGSTREAM_BENCH_WATCHDOG_S",
                                      "960"))
    progress = {"t": time.monotonic()}

    def _watchdog():
        while True:
            time.sleep(20)
            if time.monotonic() - progress["t"] > watchdog_s:
                print(f"WATCHDOG: no section progress in "
                      f"{watchdog_s:.0f}s — exiting for relaunch",
                      flush=True)
                os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()
    art = _load_art()
    platform = jax.devices()[0].platform
    art["_platform"] = platform
    on_tpu = platform != "cpu"

    profile_dir = os.environ.get("COGSTREAM_BENCH_PROFILE")
    # COGSTREAM_BENCH_ONLY=a,b,c — run just those sections (targeted
    # re-measurement during development; not used by the driver)
    only = {s for s in os.environ.get("COGSTREAM_BENCH_ONLY",
                                      "").split(",") if s}
    ctx = Ctx()
    done = set(art.get("_done", []))
    attempts = dict(art.get("_attempts", {}))
    for name, est, fn, *args in SECTIONS:
        progress["t"] = time.monotonic()
        if only and name not in only:
            continue
        if name in done:
            continue
        if not on_tpu and name in TPU_ONLY:
            continue
        if time.monotonic() + est > deadline:
            sk = art.setdefault("_budget_skipped", [])
            if name not in sk:
                sk.append(name)
            continue
        attempts[name] = attempts.get(name, 0) + 1
        art["_attempts"] = attempts
        _save_art(art)          # persist BEFORE running: a worker crash
        # mid-section must not retry forever across relaunches
        if attempts[name] > 2:
            art[f"{name}_error"] = "crashed twice, giving up"
            done.add(name)
            art["_done"] = sorted(done)
            _save_art(art)
            continue
        if profile_dir and name == "encoder":
            jax.profiler.start_trace(profile_dir)
        try:
            fields = fn(ctx, *args)
        except Exception as e:  # noqa: BLE001
            msg = repr(e)[:300]
            if "UNAVAILABLE" in msg or "INTERNAL" in msg or \
                    "DEADLINE" in msg or \
                    ("JaxRuntimeError" in msg and
                     "INVALID_ARGUMENT" in msg):
                # TPU worker crash OR wedged-worker error state: this
                # process's client is done for — exit; the orchestrator
                # relaunches after a cool-down. INVALID_ARGUMENT
                # counts: once the axon worker degrades it returns it
                # for EVERY subsequent program in the process (round-5
                # run: one bad section poisoned the remaining 13
                # in-process; a fresh client cleared it).
                art[f"{name}_error"] = msg
                art["_crash_pending"] = True
                _save_art(art)
                _emit(art)
                return 17
            art[f"{name}_error"] = msg
            fields = {}
        finally:
            if profile_dir and name == "encoder":
                jax.profiler.stop_trace()
        if fields:
            # a retry that succeeds clears the earlier attempt's error
            art.pop(f"{name}_error", None)
        if fields and art.pop("_crash_pending", None):
            # first section COMPLETED after a worker-crash relaunch —
            # see POST_CRASH_SIBLINGS
            low = [k for k, sib in POST_CRASH_SIBLINGS.items()
                   if k in fields and art.get(sib)
                   and fields[k] < 0.6 * art[sib]]
            if low and time.monotonic() + est < deadline:
                try:
                    again = fn(ctx, *args)
                except Exception:  # noqa: BLE001
                    again = {}
                for k, v in again.items():
                    # keep-the-better-run merge: HIGHER wins only for
                    # throughput-style fields; latency fields
                    # (turn_p50_*, *_s) take the LOWER run — a retry
                    # must never overwrite a good latency with the
                    # worse run's value (ADVICE r4)
                    prev = fields.get(k)
                    if not isinstance(v, (int, float)) \
                            or not isinstance(prev, (int, float)):
                        fields[k] = v
                    elif (k.endswith("_s") and not k.endswith("tok_s")) \
                            or "_p50" in k or "_p90" in k:
                        fields[k] = min(prev, v)
                    else:
                        fields[k] = max(prev, v)
                low = [k for k, sib in POST_CRASH_SIBLINGS.items()
                       if k in fields and art.get(sib)
                       and fields[k] < 0.6 * art[sib]]
            for k in low:
                fields[k + "_post_crash"] = True
        art.update(fields)
        done.add(name)
        art["_done"] = sorted(done)
        _save_art(art)
        _emit(art)
    return 0


def main() -> None:
    """Orchestrator: NEVER initializes the JAX backend (the child owns
    the chip exclusively). Relaunches the child after worker crashes,
    keeps the artifact file across launches, and always leaves a
    parseable cumulative artifact line as the last stdout line."""
    import subprocess

    t0 = time.monotonic()
    if not os.environ.get("COGSTREAM_BENCH_RESUME"):
        try:
            os.remove(ART_PATH)
        except FileNotFoundError:
            pass
    deadline_mono = t0 + BUDGET_S - 30      # reserve the final print
    env = dict(os.environ)
    # time.monotonic() is process-wide, not system-wide — hand the
    # child its deadline as a REMAINING-seconds delta instead
    for attempt in range(4):
        left = deadline_mono - time.monotonic()
        if left < 60:
            break
        env["COGSTREAM_BENCH_DEADLINE"] = str(left)
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run-sections"],
                env=env, timeout=left + 30).returncode
        except subprocess.TimeoutExpired:
            rc = 124
            break
        if rc == 0:
            break
        # worker crash (rc 17) or unexpected death: cool down, relaunch
        left = deadline_mono - time.monotonic()
        if left > 150:
            time.sleep(90)   # crashed worker takes minutes to return
        elif left > 40:
            time.sleep(20)
    _emit(_load_art())


def child_main() -> None:
    # child deadline arrives as remaining seconds; convert to this
    # process's monotonic clock
    os.environ["COGSTREAM_BENCH_DEADLINE"] = str(
        time.monotonic() + float(os.environ["COGSTREAM_BENCH_DEADLINE"]))
    sys.exit(run_sections())


if __name__ == "__main__":
    if "--run-sections" in sys.argv:
        child_main()
    else:
        main()
