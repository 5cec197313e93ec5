"""Quality-delta harness tests (evaluate/quant_quality) at tiny width.

Pins the measurement machinery the 7B bench section relies on:
deterministic rebuilds (scheme B re-quantizes the SAME float model),
zero self-divergence, and a sane scheme ladder (int8 diverges less
than 4-bit from the bf16 truth)."""

import dataclasses

import jax
import numpy as np
import pytest

from cogstream_tpu.config import Qwen2Config
from cogstream_tpu.evaluate import quant_quality as qq


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen2Config(vocab_size=256, hidden_size=256,
                      intermediate_size=384, num_hidden_layers=3,
                      num_attention_heads=4, num_key_value_heads=2,
                      dtype="bfloat16")
    ids = qq.probe_ids(cfg, n=48)
    return cfg, ids


def test_deterministic_rebuild(tiny):
    cfg, ids = tiny
    la = qq.tf_logits(qq.build_text_params(cfg, "int8", seed=3), ids, cfg)
    lb = qq.tf_logits(qq.build_text_params(cfg, "int8", seed=3), ids, cfg)
    mae, kl, agree = qq.divergence(la, lb)
    assert float(mae) == 0.0 and float(agree) == 1.0


def test_scheme_ladder(tiny):
    """bf16 self-compare is exact; int8 is closer to bf16 than 4-bit;
    every scheme still mostly agrees on top-1 at this tiny scale."""
    cfg, ids = tiny
    lbf = qq.tf_logits(qq.build_text_params(cfg, "bf16"), ids, cfg)
    out = {}
    for scheme in ("bf16", "int8", "int4u"):
        ls = qq.tf_logits(qq.build_text_params(cfg, scheme), ids, cfg)
        out[scheme] = qq.compare_logits(lbf, ls, scheme)
    assert out["bf16"]["bf16_logit_mae"] == 0.0
    assert out["bf16"]["bf16_top1_agree"] == 1.0
    assert 0.0 < out["int8"]["int8_logit_mae"] \
        < out["int4u"]["int4u_logit_mae"]
    assert out["int8"]["int8_kl"] < out["int4u"]["int4u_kl"]


def test_w8a8_and_fp8_probes(tiny):
    import jax.numpy as jnp

    cfg, ids = tiny
    p8 = qq.build_text_params(cfg, "int8")
    l_w = qq.tf_logits(p8, ids,
                       dataclasses.replace(cfg, w8a8_prefill=True))
    l_0 = qq.tf_logits(p8, ids, cfg)
    m = qq.compare_logits(l_0, l_w, "w8a8")
    assert m["w8a8_logit_mae"] > 0.0          # activation quant is lossy
    # fp8 KV: divergence appears only through the CACHED path
    lc_bf = qq.cached_logits(p8, ids, cfg, 128)
    lc_f8 = qq.cached_logits(p8, ids, cfg, 128,
                             kv_dtype=jnp.float8_e4m3fn)
    mf = qq.compare_logits(lc_bf, lc_f8, "fp8kv")
    assert mf["fp8kv_logit_mae"] > 0.0
    assert mf["fp8kv_top1_agree"] > 0.5


def test_greedy_prefix(tiny):
    cfg, ids = tiny
    a = qq.greedy_continuation(qq.build_text_params(cfg, "int8"), cfg,
                               ids, n=12, max_len=128)
    b = qq.greedy_continuation(qq.build_text_params(cfg, "int8"), cfg,
                               ids, n=12, max_len=128)
    assert qq.prefix_agreement(a, b) == 1.0
    assert qq.prefix_agreement(np.asarray([1, 2, 3, 4]),
                               np.asarray([1, 2, 9, 4])) == 0.5
