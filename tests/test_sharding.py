"""GSPMD sharding: TP-sharded decoder matches unsharded outputs, and
param placement matches the specs."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cogstream_tpu.models import qwen2
from cogstream_tpu.models.qwen2 import init_kv_cache
from cogstream_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from cogstream_tpu.parallel.sharding import (
    lora_specs_like, qwen2_param_specs, shard_params)
from cogstream_tpu.runtime.generate import generate_tokens


def test_qwen2_specs_cover_tree(tiny_config):
    cfg = tiny_config.text
    mesh = make_mesh(data_parallel=2, model_parallel=4)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    specs = qwen2_param_specs(cfg, mesh)
    # same tree structure → tree.map succeeds
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: isinstance(x, P))


def test_tp_sharded_generate_matches_unsharded(tiny_config):
    cfg = tiny_config.text
    mesh = make_mesh(data_parallel=1, model_parallel=4,
                     devices=jax.devices()[:4])
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    S, NEW = 16, 8
    ids = rng.integers(3, 200, size=(1, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    positions = jnp.asarray(np.arange(S, dtype=np.int32)[None])
    last = jnp.asarray([S - 1], jnp.int32)

    ref = generate_tokens(params, emb, positions, last,
                          init_kv_cache(cfg, 1, S + NEW),
                          jax.random.PRNGKey(0), cfg, NEW,
                          eos_id=-1, temperature=0.0)

    specs = qwen2_param_specs(cfg, mesh)
    sparams = shard_params(params, specs, mesh)
    # hidden 64 / model=4 → q_proj kernel sharded on its output dim
    qk = sparams["layers"]["attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, None, MODEL_AXIS)

    with mesh:
        out = generate_tokens(sparams, emb, positions, last,
                              init_kv_cache(cfg, 1, S + NEW),
                              jax.random.PRNGKey(0), cfg, NEW,
                              eos_id=-1, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))


def test_lora_specs_follow_kernels(tiny_config):
    from cogstream_tpu.config import LoRAConfig
    from cogstream_tpu.models.lora import init_cogreasoner_lora
    from cogstream_tpu.parallel.sharding import cogreasoner_param_specs

    cfg = tiny_config
    mesh = make_mesh(data_parallel=2, model_parallel=4)
    specs = cogreasoner_param_specs(cfg, mesh)
    lora = init_cogreasoner_lora(jax.random.PRNGKey(0), cfg,
                                 LoRAConfig(include_projector=True))
    lspecs = lora_specs_like(lora, specs)
    # decoder entries: stacked, b follows the kernel's output sharding
    b_spec = lspecs["text"]["layers"]["mlp"]["up_proj"]["b"]
    k_spec = specs["text"]["layers"]["mlp"]["up_proj"]["kernel"]
    assert b_spec == P(None, None, k_spec[-1])
    # projector entries: plain 2D specs
    pb = lspecs["projector"]["layers"][0]["b"]
    assert len(pb) == 2
    # shard_params works end-to-end on the lora tree
    sharded = shard_params(lora, lspecs, mesh)
    jax.tree.map(lambda x: None, sharded)


def test_session_on_tp_mesh_matches_unsharded(tiny_config):
    """Streaming session served from TP-sharded params produces the
    same greedy answers — serving-on-mesh correctness."""
    import dataclasses

    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.parallel.sharding import cogreasoner_param_specs
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = dataclasses.replace(
        tiny_config, compression=CompressionConfig(frames_per_event=2,
                                                   keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    rng = np.random.default_rng(0)
    pv = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)

    ref_sess = StreamingSession(params, cfg, tok, max_len=1024,
                                summary_forward=False)
    ref_sess.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    want = ref_sess.ask("what is this?", mode="AC", max_new_tokens=6)

    mesh = make_mesh(data_parallel=1, model_parallel=4,
                     devices=jax.devices()[:4])
    sparams = shard_params(params, cogreasoner_param_specs(cfg, mesh),
                           mesh)
    with mesh:
        sess = StreamingSession(sparams, cfg, tok, max_len=1024,
                                summary_forward=False)
        sess.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
        got = sess.ask("what is this?", mode="AC", max_new_tokens=6)
    assert got["text"] == want["text"]

    # first-class API: mesh= shards the params itself, places the KV
    # cache under kv_cache_specs, and needs no mesh context manager
    sess2 = StreamingSession(params, cfg, tok, max_len=1024,
                             summary_forward=False, mesh=mesh)
    qk = sess2.params["text"]["layers"]["attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, None, MODEL_AXIS)
    assert set(sess2.cache.k.sharding.device_set) \
        == set(mesh.devices.flat)
    sess2.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    got2 = sess2.ask("what is this?", mode="AC", max_new_tokens=6)
    assert got2["text"] == want["text"]
    # and the speculative decoder rides the same SPMD program
    got3 = sess2.ask("what is this?", mode="AC", max_new_tokens=6,
                     lookahead_k=4)
    assert isinstance(got3["text"], str)


def test_session_mesh_with_w8a8_encoder(tiny_config):
    """encoder_int8=True composes with mesh= serving: the quantized
    vision kernels (int8 'q'/'scale' dicts) land under adapted specs
    and an ingest+ask turn runs SPMD."""
    import dataclasses

    from cogstream_tpu.config import CompressionConfig
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.session import StreamingSession

    cfg = dataclasses.replace(
        tiny_config, compression=CompressionConfig(frames_per_event=2,
                                                   keyframes_per_event=1))
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    mesh = make_mesh(data_parallel=1, model_parallel=4,
                     devices=jax.devices()[:4])
    sess = StreamingSession(params, cfg, tok, max_len=1024,
                            summary_forward=False, mesh=mesh,
                            encoder_int8=True)
    qkern = sess.params["vision"]["layers"][0]["attn"]["q"]["kernel"]
    assert "q" in qkern and qkern["q"].dtype == jnp.int8
    assert set(qkern["q"].sharding.device_set) == set(mesh.devices.flat)
    rng = np.random.default_rng(0)
    pv = rng.normal(size=(2 * 4 * 4, 3 * 14 * 14)).astype(np.float32)
    sess.append_stream_segment(pv, (2, 4, 4), 2, [0.0, 1.0])
    got = sess.ask("what is this?", mode="AC", max_new_tokens=6)
    assert isinstance(got["text"], str)


def test_engine_on_tp_mesh_text_turn(tiny_config):
    """CogReasonerEngine(mesh=...) answers a text-only turn identically
    to the unsharded engine (greedy + lookahead paths)."""
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.processor.tokenizer import ByteTokenizer
    from cogstream_tpu.runtime.engine import CogReasonerEngine

    cfg = tiny_config
    params = init_cogreasoner_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(image_token_id=cfg.image_token_index)
    conversation = [{"role": "user", "content": "hello, what now?"}]

    ref = CogReasonerEngine(params, cfg, tok)
    want = ref.chat(conversation, mode="AC", max_new_tokens=8)

    mesh = make_mesh(data_parallel=1, model_parallel=4,
                     devices=jax.devices()[:4])
    eng = CogReasonerEngine(params, cfg, tok, mesh=mesh)
    got = eng.chat(conversation, mode="AC", max_new_tokens=8)
    assert got.text == want.text
    la = eng.chat(conversation, mode="AC", max_new_tokens=8,
                  lookahead_k=4)
    assert la.text == want.text


def test_ring_attention_matches_dense(tiny_config):
    """Ring (context-parallel) attention over an 8-device sequence
    shard reproduces dense causal GQA, including -1 padding queries."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh

    from cogstream_tpu.ops.attention import causal_gqa_attention
    from cogstream_tpu.ops.ring_attention import ring_causal_gqa_attention

    rng = np.random.default_rng(0)
    B, S, Hq, Hkv, D = 2, 64, 4, 2, 8
    q = rng.normal(size=(B, S, Hq, D)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, D)).astype(np.float32)
    pos = np.tile(np.arange(S, dtype=np.int32), (B, 1))
    pos[:, -5:] = -1        # bucket padding

    want = np.asarray(causal_gqa_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_positions=jnp.asarray(pos), kv_valid=jnp.asarray(pos >= 0),
        kv_positions=jnp.asarray(pos)))

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    fn = shard_map(
        lambda *a: ring_causal_gqa_attention(*a, axis_name="sp",
                                             axis_size=8),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                  P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"))
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(pos), jnp.asarray(pos)))
    valid = pos >= 0
    np.testing.assert_allclose(got[valid], want[valid],
                               rtol=2e-5, atol=2e-5)
    # fully-masked (padding) queries are exact zeros on the ring path
    assert np.abs(got[~valid]).max() == 0.0

    # inner fold chunking (incl. a non-divisible shard) is value-exact
    fn_c = shard_map(
        lambda *a: ring_causal_gqa_attention(*a, axis_name="sp",
                                             axis_size=8, kv_chunk=3),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                  P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"))
    got_c = np.asarray(fn_c(jnp.asarray(q), jnp.asarray(k),
                            jnp.asarray(v), jnp.asarray(pos),
                            jnp.asarray(pos)))
    np.testing.assert_allclose(got_c[valid], want[valid],
                               rtol=2e-5, atol=2e-5)


def test_qwen2_forward_sp_matches_dense(tiny_config):
    """Full sequence-parallel decoder forward == single-device forward
    at every valid position."""
    from jax.sharding import Mesh

    cfg = tiny_config.text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, S = 2, 64
    ids = rng.integers(3, 200, size=(B, S)).astype(np.int32)
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = np.tile(np.arange(S, dtype=np.int32), (B, 1))
    pos[1, -9:] = -1
    want, _ = qwen2.qwen2_forward(params, emb, jnp.asarray(pos), cfg)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    got = qwen2.qwen2_forward_sp(params, emb, jnp.asarray(pos), cfg,
                                 mesh, axis="sp")
    valid = pos >= 0
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid],
                               rtol=2e-4, atol=2e-4)


def test_ensure_cogreasoner_sharded_idempotent(tiny_config, mesh8):
    """The serving entry point shards once; a second call (session
    created from an already-sharded server tree) must short-circuit
    and return the SAME tree, not sweep it through device_put again."""
    import jax
    from cogstream_tpu.models.cogreasoner import init_cogreasoner_params
    from cogstream_tpu.parallel.sharding import ensure_cogreasoner_sharded

    params = init_cogreasoner_params(jax.random.PRNGKey(0), tiny_config)
    sharded = ensure_cogreasoner_sharded(params, tiny_config, mesh8)
    leaf = jax.tree.leaves(sharded)[0]
    assert leaf.sharding.mesh == mesh8
    again = ensure_cogreasoner_sharded(sharded, tiny_config, mesh8)
    assert again is sharded
    # mesh=None is a no-op
    assert ensure_cogreasoner_sharded(params, tiny_config, None) is params
