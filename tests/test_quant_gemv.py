"""Fused-unpack int4 GEMV kernel (ops/quant_gemv.py) — interpret-mode
parity against the materializing dequant, across schemes, M sizes, and
odd shapes. The real-chip perf claim is validated by
tools/int4_gemv_probe.py; here we pin numerics and dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.ops import quant
from cogstream_tpu.ops.quant import (dequantize_int4, int4_matmul,
                                     quantize_int4_rank1)
from cogstream_tpu.ops.quant_gemv import (gemv_viable, int4_rank1_gemv,
                                          _largest_divisor)

RNG = np.random.default_rng(7)


def _mk(din, dout, nf4=True):
    w = jnp.asarray(RNG.normal(size=(din, dout)).astype(np.float32))
    return w, quantize_int4_rank1(w, nf4=nf4)


@pytest.mark.parametrize("nf4", [True, False])
@pytest.mark.parametrize("m", [1, 3, 8, 17])
def test_cubic_kernel_matches_dequant(nf4, m):
    _, qp = _mk(512, 256, nf4=nf4)
    x = jnp.asarray(RNG.normal(size=(m, 512)).astype(np.float32))
    ref = x @ dequantize_int4(qp, jnp.float32)
    y = int4_rank1_gemv(x, qp, jnp.float32, interpret=True,
                        block_n=128, block_k=128)
    assert y.shape == ref.shape
    # bf16 dots: tolerance is bf16 rounding of the accumulated products
    err = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 2e-2


def test_uniform_static_and_w4a8():
    _, qp = _mk(512, 256, nf4=False)
    # the 1-element code shape is the static tag the kernel infers
    # uniform=... from (no flag passed here)
    assert qp["code"].shape == (1,)
    x = jnp.asarray(RNG.normal(size=(2, 512)).astype(np.float32))
    ref = x @ dequantize_int4(qp, jnp.float32)
    yu = int4_rank1_gemv(x, qp, jnp.float32,
                         interpret=True, block_n=128, block_k=128)
    assert float(jnp.max(jnp.abs(yu - ref)) / jnp.max(jnp.abs(ref))) < 2e-2
    yw = int4_rank1_gemv(x, qp, jnp.float32, w4a8=True,
                         interpret=True, block_n=128, block_k=128)
    # + per-row int8 activation rounding
    assert float(jnp.max(jnp.abs(yw - ref)) / jnp.max(jnp.abs(ref))) < 4e-2


def test_3d_batch_and_bf16_out():
    _, qp = _mk(256, 384)
    x = jnp.asarray(RNG.normal(size=(2, 5, 256)).astype(np.float32))
    y = int4_rank1_gemv(x, qp, jnp.bfloat16, interpret=True,
                        block_n=128, block_k=128)
    assert y.shape == (2, 5, 384) and y.dtype == jnp.bfloat16
    ref = (x @ dequantize_int4(qp, jnp.float32))
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))
                / jnp.max(jnp.abs(ref)))
    assert err < 3e-2


def test_viability_gate():
    _, qp = _mk(512, 256)
    assert gemv_viable(qp, 1)
    assert gemv_viable(qp, 64)
    assert not gemv_viable(qp, 65)          # prefill-sized M: XLA path
    # stacked [L] kernels never route to the kernel
    _, qps = _mk(512, 256)
    qps = {k: v[None] for k, v in qps.items()}
    assert not gemv_viable(qps, 1)
    # group-wise (no rscale) scheme is not the kernel's format
    from cogstream_tpu.ops.quant import quantize_int4
    w = jnp.asarray(RNG.normal(size=(512, 256)).astype(np.float32))
    assert not gemv_viable(quantize_int4(w), 1)
    # unblockable dout (not a multiple of 128)
    w2 = jnp.asarray(RNG.normal(size=(512, 200)).astype(np.float32))
    assert not gemv_viable(quantize_int4_rank1(w2), 1)


def test_largest_divisor():
    assert _largest_divisor(1792, 256, 128) == 256
    assert _largest_divisor(9472, 256, 128) == 256
    assert _largest_divisor(4608, 512, 128) == 512
    assert _largest_divisor(152064, 512, 128) == 512
    assert _largest_divisor(200, 512, 128) is None


def test_int4_matmul_dispatch_identical_off_tpu():
    """On CPU the dispatch must stay on the XLA path (backend gate) —
    int4_matmul output is bit-identical with the flag toggled."""
    _, qp = _mk(512, 256)
    x = jnp.asarray(RNG.normal(size=(1, 512)).astype(np.float32))
    old = quant.USE_GEMV_KERNEL
    try:
        quant.USE_GEMV_KERNEL = True
        a = int4_matmul(x, qp, jnp.float32)
        quant.USE_GEMV_KERNEL = False
        b = int4_matmul(x, qp, jnp.float32)
    finally:
        quant.USE_GEMV_KERNEL = old
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
