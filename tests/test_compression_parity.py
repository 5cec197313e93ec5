"""C7 visual-stream-compression golden parity vs the ACTUAL reference
implementation loaded from /root/reference/model/cogreasoner_chat.py:
keyframe-per-event selection (select_additional_frames, ref :50-64),
the inter-frame pixel-diff token mask (_get_compression_mask, ref
:383-432), and minor-frame mean-pooling (compress_unimportant_events,
ref :434-447). Same pattern as the k-means/image-processor golden
tests: the torch reference runs on CPU, our jitted rebuild must agree
exactly (bit-level for masks/indices, fp tolerance for pooled means).
"""

import importlib
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/model"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_chat():
    """The reference module uses relative imports; a synthetic package
    whose __path__ points at the reference dir satisfies them."""
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodel"] = pkg
    return importlib.import_module("refmodel.cogreasoner_chat")


def test_keyframe_selection_matches_reference(ref_chat):
    from cogstream_tpu.ops.kmeans import select_event_keyframes

    rng = np.random.default_rng(0)
    T, P, D, K, k = 17, 4, 8, 4, 2
    feats = rng.normal(size=(T, P, D)).astype(np.float32)
    centers = rng.normal(size=(K, P * D)).astype(np.float32)
    # uneven clusters incl. one with a single member (< k)
    assign = np.array([0] * 7 + [1] * 6 + [2] * 3 + [3] * 1)

    ref = ref_chat.select_additional_frames(
        torch.from_numpy(feats), torch.from_numpy(centers),
        torch.from_numpy(assign), k)
    idx, valid = select_event_keyframes(
        jnp.asarray(feats), jnp.asarray(centers), jnp.asarray(assign),
        k=k)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for c in range(K):
        ours = sorted(idx[c][valid[c]].tolist())
        theirs = sorted(ref[c].tolist())
        assert ours == theirs, (c, ours, theirs)


@pytest.mark.parametrize("minor_idx", [[], [1, 3]])
def test_pixel_diff_mask_matches_reference(ref_chat, minor_idx):
    """Bit-identical keep masks: frame 0 all-keep, below-min_tokens
    rows padded, minor frames collapsed to token 0 (ref threshold 0.1,
    cogreasoner_chat.py:393)."""
    from cogstream_tpu.models.cogreasoner import pixel_diff_keep_mask

    rng = np.random.default_rng(1)
    t, gh, gw, ms = 5, 4, 4, 2
    merged = (gh // ms) * (gw // ms)
    dim = 3 * 14 * 14
    # small-amplitude noise around a base so some diffs fall below the
    # 0.1 threshold and some above (threshold operates on *255 scale)
    base = rng.normal(size=(1, gh * gw, dim)).astype(np.float32)
    pv = (base + rng.normal(size=(t, gh * gw, dim)) * 2e-4).astype(
        np.float32).reshape(t * gh * gw, dim)

    ref_mask = ref_chat.Videollama3Qwen2ForCausalLM._get_compression_mask(
        None,
        torch.from_numpy(pv),
        torch.tensor([t * merged]),
        torch.tensor([[t, gh, gw]]),
        torch.tensor([ms]),
        ["video"],
        threshold=0.1,
        min_tokens=1,
        minor_frame_indices=minor_idx,
    )
    minor = np.zeros((t,), bool)
    minor[minor_idx] = True
    got = pixel_diff_keep_mask(jnp.asarray(pv), t, merged,
                               jnp.asarray(minor))
    np.testing.assert_array_equal(
        np.asarray(got).reshape(-1), ref_mask.numpy())
    # sanity: the fixture actually exercises both sides of the threshold
    if not minor_idx:
        m = np.asarray(got)[1:]
        assert m.any() and not m.all()


def test_minor_frame_pooling_matches_reference(ref_chat):
    from cogstream_tpu.models.cogreasoner import pool_minor_frames

    rng = np.random.default_rng(2)
    T, P, H = 6, 4, 16
    feats = rng.normal(size=(T * P, H)).astype(np.float32)
    minor_idx = [0, 4]

    ref = ref_chat.Videollama3Qwen2ForCausalLM.compress_unimportant_events(
        None, torch.from_numpy(feats), P, minor_idx)
    minor = np.zeros((T,), bool)
    minor[minor_idx] = True
    got = pool_minor_frames(jnp.asarray(feats), jnp.asarray(minor), P)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=1e-6, atol=1e-6)
