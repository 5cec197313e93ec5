"""Vision encoder: numerical parity with the reference torch tower
(same random weights, eager attention) + structural invariants."""

import importlib.util
import os

import jax
import numpy as np
import pytest

from cogstream_tpu.config import VisionEncoderConfig
from cogstream_tpu.models.checkpoint import vision_params_from_state_dict
from cogstream_tpu.models.vision_encoder import (
    build_vision_metadata,
    vision_encoder_forward,
)

REF_DIR = "/root/reference/model"

TINY = VisionEncoderConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, patch_size=14, dtype="float32")


def _load_reference_encoder(cfg: VisionEncoderConfig):
    path = os.path.join(REF_DIR, "modeling_videollama3_encoder.py")
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    cfg_path = os.path.join(REF_DIR, "configuration_videollama3_encoder.py")
    spec = importlib.util.spec_from_file_location(
        "configuration_videollama3_encoder", cfg_path)
    cfgmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfgmod)
    spec = importlib.util.spec_from_file_location("ref_encoder", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_cfg = cfgmod.Videollama3VisionEncoderConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        patch_size=cfg.patch_size,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = mod.Videollama3VisionEncoderModel(ref_cfg).eval()
    return model, torch


def test_parity_with_reference_encoder_single_frame():
    model, torch = _load_reference_encoder(TINY)
    params = vision_params_from_state_dict(
        model.state_dict(), TINY, prefix="", dtype=np.float32)

    rng = np.random.default_rng(0)
    for grids, merges in [
        (np.array([[1, 2, 2]], np.int32), np.array([1], np.int32)),
        (np.array([[1, 4, 4]], np.int32), np.array([2], np.int32)),
    ]:
        n = int(grids.prod(axis=1).sum())
        pv = rng.standard_normal((n, 3 * 14 * 14)).astype(np.float32)
        ours = np.asarray(
            vision_encoder_forward(params, pv, grids, merges, TINY))
        with torch.no_grad():
            theirs = model(
                pixel_values=torch.from_numpy(pv),
                grid_sizes=torch.from_numpy(grids.astype(np.int64)),
                merge_sizes=torch.from_numpy(merges.astype(np.int64)),
            ).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_parity_multi_segment_vs_per_frame_reference():
    """Multi-item/multi-frame batches must equal per-frame reference calls.

    NOTE: the reference's *eager* attention adds a boolean mask to the
    logits (+1 in-segment instead of -inf out-of-segment,
    modeling_videollama3_encoder.py:257-266), so its eager path leaks
    attention across frames — a latent bug; the production flash-attn
    varlen path isolates frames. Our encoder implements the flash
    semantics, so the golden here is the reference run one frame at a
    time (where no leak is possible).
    """
    model, torch = _load_reference_encoder(TINY)
    params = vision_params_from_state_dict(
        model.state_dict(), TINY, prefix="", dtype=np.float32)

    rng = np.random.default_rng(0)
    grids = np.array([[2, 4, 4], [1, 2, 2]], np.int32)   # video + image
    merges = np.array([2, 1], np.int32)
    n = int(grids.prod(axis=1).sum())
    pv = rng.standard_normal((n, 3 * 14 * 14)).astype(np.float32)

    ours = np.asarray(vision_encoder_forward(params, pv, grids, merges, TINY))

    chunks, offset = [], 0
    for (t, gh, gw), ms in zip(grids, merges):
        for _ in range(int(t)):
            rows = int(gh) * int(gw)
            frame_pv = pv[offset:offset + rows]
            with torch.no_grad():
                out = model(
                    pixel_values=torch.from_numpy(frame_pv),
                    grid_sizes=torch.tensor([[1, int(gh), int(gw)]]),
                    merge_sizes=torch.tensor([int(ms)]),
                ).numpy()
            chunks.append(out)
            offset += rows
    theirs = np.concatenate(chunks, axis=0)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_padding_invariance():
    key = jax.random.PRNGKey(0)
    from cogstream_tpu.models.vision_encoder import init_vision_params
    params = init_vision_params(key, TINY)
    rng = np.random.default_rng(1)
    grids = np.array([[1, 4, 4]], np.int32)
    merges = np.array([2], np.int32)
    pv = rng.standard_normal((16, 3 * 14 * 14)).astype(np.float32)
    out = np.asarray(vision_encoder_forward(params, pv, grids, merges, TINY))
    out_padded = np.asarray(vision_encoder_forward(
        params, pv, grids, merges, TINY, pad_to=64))
    np.testing.assert_allclose(out, out_padded[:out.shape[0]],
                               rtol=1e-5, atol=1e-5)


def test_metadata_segments_per_frame():
    meta = build_vision_metadata(np.array([[3, 2, 2]]), np.array([1]))
    # 3 frames x 4 patches: each frame is its own attention segment
    np.testing.assert_array_equal(
        meta.segment_ids, np.repeat([0, 1, 2], 4))
    assert meta.num_out_tokens == 12


def test_merge_group_mean_downsamples():
    meta = build_vision_metadata(np.array([[1, 2, 2]]), np.array([2]))
    assert meta.num_out_tokens == 1
    np.testing.assert_array_equal(meta.merge_group_ids, [0, 0, 0, 0])


def test_w8a8_packed_parity():
    """W8A8 serving mode (quantize_vision_w8a8): the packed Pallas path
    with int8 weights + dynamic int8 activations must stay close to the
    bf16 tower — per-token cosine of merged features, plus the eager
    fallback must agree with itself under weight-only dequant."""
    from cogstream_tpu.models.vision_encoder import (init_vision_params,
                                                     quantize_vision_w8a8)

    cfg = VisionEncoderConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=2, patch_size=14, dtype="float32")
    params = init_vision_params(jax.random.PRNGKey(5), cfg)
    qparams = quantize_vision_w8a8(params)
    # patch embed stays full precision
    assert not isinstance(qparams["patch_embed"]["kernel"], dict)
    assert isinstance(qparams["layers"][0]["attn"]["q"]["kernel"], dict)

    rng = np.random.default_rng(7)
    grids = np.array([[2, 4, 4]], np.int32)
    merges = np.array([2], np.int32)
    pv = rng.standard_normal((32, 3 * 14 * 14)).astype(np.float32)

    ref = np.asarray(vision_encoder_forward(
        params, pv, grids, merges, cfg, use_pallas=True))
    q_packed = np.asarray(vision_encoder_forward(
        qparams, pv, grids, merges, cfg, use_pallas=True))
    q_eager = np.asarray(vision_encoder_forward(
        qparams, pv, grids, merges, cfg, use_pallas=False))

    def cos(a, b):
        num = np.sum(a * b, axis=-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        return num / np.maximum(den, 1e-9)

    assert cos(ref, q_packed).min() > 0.995
    # eager fallback (weight-only dequant attention + W8A8 MLP) stays in
    # the same neighborhood of the bf16 tower
    assert cos(ref, q_eager).min() > 0.99


def test_int4_quantized_tower_runs_weight_only():
    """An int4/NF4-quantized vision tree (stage-2 --quantize-base nf4
    quantizes the WHOLE param tree) must route through the weight-only
    materializing path, not the W8A8 int8 branch (regression: q4 dicts
    also satisfy is_quantized but have no 'q' tensor)."""
    from cogstream_tpu.models.vision_encoder import init_vision_params
    from cogstream_tpu.ops.quant import quantize_tree

    cfg = VisionEncoderConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, patch_size=14, dtype="float32")
    params = init_vision_params(jax.random.PRNGKey(2), cfg)
    q4 = quantize_tree(params, bits=4, nf4=True,
                       predicate=lambda name: name != "patch_embed")
    assert "q4" in q4["layers"][0]["mlp"]["fc1"]["kernel"]

    rng = np.random.default_rng(3)
    grids = np.array([[2, 4, 4]], np.int32)
    merges = np.array([2], np.int32)
    pv = rng.standard_normal((32, 3 * 14 * 14)).astype(np.float32)
    ref = np.asarray(vision_encoder_forward(
        params, pv, grids, merges, cfg, use_pallas=True))
    out = np.asarray(vision_encoder_forward(
        q4, pv, grids, merges, cfg, use_pallas=True))
    assert out.shape == ref.shape and np.isfinite(out).all()
    # 4-bit is coarse; just require the features stay correlated
    num = np.sum(ref * out, axis=-1)
    den = (np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert (num / np.maximum(den, 1e-9)).min() > 0.9


def test_mixed_int8_q4_tower_runs_weight_only():
    """quantize_tree(bits=4) int8-fallbacks kernels whose din is not
    group-divisible, so one tree can hold BOTH forms: hidden=96 makes
    fc1 (din=96) int8 while fc2 (din=128) packs q4. The W8A8 fast path
    must not engage on fc1 alone (regression: dryrun_multichip's
    4-bit QLoRA step crashed with KeyError 'q' on fc2)."""
    from cogstream_tpu.models.vision_encoder import init_vision_params
    from cogstream_tpu.ops.quant import quantize_tree

    cfg = VisionEncoderConfig(
        hidden_size=96, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, patch_size=14, dtype="float32")
    params = init_vision_params(jax.random.PRNGKey(4), cfg)
    q = quantize_tree(params, bits=4, nf4=True,
                      predicate=lambda name: name != "patch_embed")
    mlp = q["layers"][0]["mlp"]
    assert "q" in mlp["fc1"]["kernel"] and "q4" in mlp["fc2"]["kernel"]

    rng = np.random.default_rng(6)
    grids = np.array([[2, 4, 4]], np.int32)
    merges = np.array([2], np.int32)
    pv = rng.standard_normal((32, 3 * 14 * 14)).astype(np.float32)
    ref = np.asarray(vision_encoder_forward(
        params, pv, grids, merges, cfg, use_pallas=True))
    out = np.asarray(vision_encoder_forward(
        q, pv, grids, merges, cfg, use_pallas=True))
    assert out.shape == ref.shape and np.isfinite(out).all()
    num = np.sum(ref * out, axis=-1)
    den = (np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert (num / np.maximum(den, 1e-9)).min() > 0.9


def test_uint8_pixels_device_normalize_parity():
    """RAW uint8 patch rows (4x less host->device traffic) must encode
    to the same features as host-normalized float32 rows."""
    from cogstream_tpu.models.vision_encoder import init_vision_params

    rng = np.random.default_rng(11)
    params = init_vision_params(jax.random.PRNGKey(3), TINY)
    raw = rng.integers(0, 255, (16, 3 * 14 * 14), dtype=np.uint8)
    # host normalization with the exact processor op order
    x = raw.reshape(16, 3, -1).astype(np.float32)
    x = (x * np.float32(1.0 / 255.0) - 0.5) / 0.5
    normed = x.reshape(16, -1)
    grids, merges = np.array([[4, 2, 2]]), np.array([1])
    out_u8 = np.asarray(vision_encoder_forward(
        params, raw, grids, merges, TINY))
    out_f32 = np.asarray(vision_encoder_forward(
        params, normed, grids, merges, TINY))
    np.testing.assert_allclose(out_u8, out_f32, rtol=1e-6, atol=1e-6)


def test_uint8_pixel_diff_mask_matches_float():
    import jax.numpy as jnp

    from cogstream_tpu.models.cogreasoner import pixel_diff_keep_mask

    rng = np.random.default_rng(12)
    t, merged = 4, 8
    raw = rng.integers(0, 255, (t * merged, 12), dtype=np.uint8)
    x = raw.astype(np.float32)
    normed = (x * np.float32(1.0 / 255.0) - 0.5) / 0.5
    minor = jnp.zeros((t,), jnp.bool_)
    m_u8 = np.asarray(pixel_diff_keep_mask(jnp.asarray(raw), t, merged,
                                           minor))
    m_f = np.asarray(pixel_diff_keep_mask(jnp.asarray(normed), t, merged,
                                          minor))
    np.testing.assert_array_equal(m_u8, m_f)


def test_uint8_pixel_diff_mask_nonstandard_std():
    """uint8 keep-mask parity holds for CLIP-style per-channel std, not
    just the reference's 0.5."""
    import jax.numpy as jnp

    from cogstream_tpu.models.cogreasoner import pixel_diff_keep_mask

    rng = np.random.default_rng(17)
    t, merged, ps2 = 4, 8, 12
    std = (0.26862954, 0.26130258, 0.27577711)
    raw = rng.integers(0, 255, (t * merged, 3 * ps2), dtype=np.uint8)
    x = raw.reshape(-1, 3, ps2).astype(np.float32)
    mean = np.asarray((0.48145466, 0.4578275, 0.40821073),
                      np.float32)[None, :, None]
    normed = ((x / 255.0 - mean) / np.asarray(std)[None, :, None]) \
        .reshape(raw.shape)
    minor = jnp.zeros((t,), jnp.bool_)
    m_u8 = np.asarray(pixel_diff_keep_mask(
        jnp.asarray(raw), t, merged, minor, image_std=std))
    m_f = np.asarray(pixel_diff_keep_mask(jnp.asarray(normed), t, merged,
                                          minor))
    np.testing.assert_array_equal(m_u8, m_f)


def test_host_pixel_diff_mask_matches_device():
    """The host-numpy mask (used on the session/pool ingest critical
    path) equals the jitted kernel on uint8 AND float inputs, with and
    without minor frames / min_tokens padding."""
    import jax.numpy as jnp

    from cogstream_tpu.models.cogreasoner import (
        pixel_diff_keep_mask, pixel_diff_keep_mask_host)

    rng = np.random.default_rng(23)
    t, merged, ps2 = 5, 8, 12
    raw = rng.integers(0, 255, (t * merged, 3 * ps2), dtype=np.uint8)
    # near-duplicate frames exercise the min_tokens padding branch
    raw[merged:2 * merged] = raw[:merged]
    minor = np.zeros((t,), bool)
    minor[3] = True
    for pv in (raw, ((raw / 255.0 - 0.5) / 0.5).astype(np.float32)):
        m_dev = np.asarray(pixel_diff_keep_mask(
            jnp.asarray(pv), t, merged, jnp.asarray(minor),
            min_tokens=2))
        m_host = pixel_diff_keep_mask_host(pv, t, merged, minor,
                                           min_tokens=2)
        np.testing.assert_array_equal(m_dev, m_host)
