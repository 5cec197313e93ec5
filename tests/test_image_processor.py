"""Image processor tests: invariants + golden parity vs the reference
implementation (imported read-only from /root/reference for comparison,
never shipped)."""

import importlib.util
import os

import numpy as np
import pytest

from cogstream_tpu.config import ProcessorConfig
from cogstream_tpu.processor.image_processor import (
    ImageProcessor,
    patchify,
    smart_resize_mixed_factors,
    smart_resize_single_factor,
)

REF_DIR = "/root/reference/model"


def _load_reference_image_processing():
    path = os.path.join(REF_DIR, "image_processing_videollama3.py")
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    # the reference pins transformers 4.46.3; newer versions dropped the
    # VideoInput alias — shim it so the reference module imports
    import transformers.image_utils as iu
    if not hasattr(iu, "VideoInput"):
        iu.VideoInput = object
    spec = importlib.util.spec_from_file_location("ref_imgproc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_smart_resize_respects_budget():
    frames = [np.zeros((720, 1280, 3), np.uint8)] * 8
    sizes = smart_resize_single_factor([frames], factor=28,
                                       min_tokens=16, max_tokens=16384)
    (h, w), = sizes
    assert h % 28 == 0 and w % 28 == 0
    assert 8 * (h // 28) * (w // 28) <= 16384


def test_smart_resize_min_tokens():
    img = np.zeros((20, 20, 3), np.uint8)
    sizes = smart_resize_single_factor([img], factor=28,
                                       min_tokens=16, max_tokens=16384)
    (h, w), = sizes
    assert (h // 28) * (w // 28) >= 16


def test_smart_resize_matches_reference():
    ref = _load_reference_image_processing()
    rng = np.random.default_rng(1)
    # mixed batch: one video (list of frames), one image; channels-last
    video = [rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
             for _ in range(12)]
    image = rng.integers(0, 255, (300, 500, 3), dtype=np.uint8)

    ours = smart_resize_single_factor([video, image], factor=28,
                                      min_tokens=16, max_tokens=16384)
    theirs = ref.simple_batched_resize([video, image], factor=28,
                                       min_tokens=16, max_tokens=16384,
                                       input_data_format="channels_last")
    assert [tuple(s) for s in ours] == [tuple(s) for s in theirs]

    ours_m = smart_resize_mixed_factors([video, image], factors=[28, 14],
                                        min_tokens=16, max_tokens=16384)
    theirs_m = ref.batched_resize([video, image], factors=[28, 14],
                                  min_tokens=16, max_tokens=16384,
                                  input_data_format="channels_last")
    assert [tuple(s) for s in ours_m] == [tuple(s) for s in theirs_m]


def test_patchify_layout_roundtrip():
    t, c, ps, ms = 2, 3, 14, 2
    gh = gw = 4
    frames = np.arange(t * c * gh * ps * gw * ps, dtype=np.float32).reshape(
        t, c, gh * ps, gw * ps)
    flat, grid = patchify(frames, ps, ms)
    assert grid == (t, gh, gw)
    assert flat.shape == (t * gh * gw, c * ps * ps)
    # first row must be the top-left patch of frame 0
    expect = frames[0, :, :ps, :ps].reshape(-1)
    np.testing.assert_array_equal(flat[0], expect)


def test_patchify_hwc_matches_chw():
    from cogstream_tpu.processor.image_processor import patchify_hwc

    rng = np.random.default_rng(7)
    t, c, ps, ms = 3, 3, 14, 2
    gh, gw = 4, 6
    frames_chw = rng.integers(0, 255, (t, c, gh * ps, gw * ps), np.uint8)
    flat_chw, grid_chw = patchify(frames_chw, ps, ms)
    flat_hwc, grid_hwc = patchify_hwc(
        np.ascontiguousarray(frames_chw.transpose(0, 2, 3, 1)), ps, ms)
    assert grid_hwc == grid_chw
    np.testing.assert_array_equal(flat_hwc, flat_chw)


def test_full_preprocess_bit_accurate_vs_reference():
    ref = _load_reference_image_processing()
    import torch  # noqa: F401  (reference code needs it at import time)

    rng = np.random.default_rng(7)
    video = [rng.integers(0, 255, (140, 252, 3), dtype=np.uint8)
             for _ in range(4)]
    image = rng.integers(0, 255, (210, 280, 3), dtype=np.uint8)

    ours = ImageProcessor(ProcessorConfig())([video, image],
                                             modals=["video", "image"])

    ref_proc = ref.Videollama3ImageProcessor(
        image_mean=[0.5, 0.5, 0.5], image_std=[0.5, 0.5, 0.5],
        min_tokens=16, max_tokens=16384, patch_size=14)
    theirs = ref_proc.preprocess(
        [video, image], merge_size=[2, 1], return_tensors="np",
        input_data_format="channels_last")

    np.testing.assert_array_equal(ours.grid_sizes, theirs["grid_sizes"])
    np.testing.assert_array_equal(ours.merge_sizes, theirs["merge_sizes"])
    np.testing.assert_allclose(ours.pixel_values, theirs["pixel_values"],
                               rtol=0, atol=1e-6)


def test_empty_batch():
    out = ImageProcessor()([], modals=[])
    assert out.pixel_values.shape[0] == 0
    assert out.grid_sizes.shape == (0, 3)


def test_raw_uint8_output_matches_normalized():
    """raw_uint8=True emits uint8 patch rows whose device normalization
    reproduces the float pipeline exactly."""
    import numpy as np

    from cogstream_tpu.config import ProcessorConfig
    from cogstream_tpu.processor.image_processor import ImageProcessor

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, 3, 56, 84), np.uint8)
    proc = ImageProcessor(ProcessorConfig())
    ref = proc([frames], modals=["video"])
    raw = proc([frames], modals=["video"], raw_uint8=True)
    assert raw.pixel_values.dtype == np.uint8
    np.testing.assert_array_equal(raw.grid_sizes, ref.grid_sizes)
    x = raw.pixel_values.reshape(raw.pixel_values.shape[0], 3, -1)
    x = (x.astype(np.float32) * np.float32(1.0 / 255.0) - 0.5) / 0.5
    np.testing.assert_allclose(x.reshape(ref.pixel_values.shape),
                               ref.pixel_values, rtol=1e-6, atol=1e-6)
