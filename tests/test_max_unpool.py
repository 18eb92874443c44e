"""Pallas MaxUnpool2x2 kernel (kernels/max_unpool.py): bit-exact vs the
flat-index scatter reference, including the odd-row-block and narrow-W
cases (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smelter_tpu.kernels.max_unpool import max_unpool2x2


def _pool_with_indices(xfull):
    B, C, H, W = xfull.shape
    h, w = H // 2, W // 2
    val = np.zeros((B, C, h, w), np.float32)
    idx = np.zeros((B, C, h, w), np.int64)
    for n in range(B):
        for c in range(C):
            for i in range(h):
                for j in range(w):
                    win = xfull[n, c, 2 * i:2 * i + 2, 2 * j:2 * j + 2]
                    k = int(np.argmax(win))
                    dy, dx = k // 2, k % 2
                    val[n, c, i, j] = win[dy, dx]
                    idx[n, c, i, j] = ((n * C + c) * H + 2 * i + dy) * W \
                        + 2 * j + dx
    return val, idx


@pytest.mark.parametrize("B,C,H,W", [
    (2, 4, 8, 16),
    (1, 3, 4, 256),    # odd channel count -> row blocks shrink to divide
    (2, 32, 16, 128),  # the SegNet decode geometry class
])
def test_parity_vs_scatter(rng, B, C, H, W):
    xfull = rng.standard_normal((B, C, H, W)).astype(np.float32)
    val, idx = _pool_with_indices(xfull)
    ref = np.zeros((B, C, H, W), np.float32)
    ref.reshape(-1)[idx.reshape(-1)] = val.reshape(-1)
    got = np.asarray(max_unpool2x2(jnp.asarray(val), jnp.asarray(idx),
                                   interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_bf16_dtype(rng):
    xfull = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    val, idx = _pool_with_indices(xfull)
    got = max_unpool2x2(jnp.asarray(val).astype(jnp.bfloat16),
                        jnp.asarray(idx), interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = np.zeros((1, 4, 8, 8), np.float32)
    ref.reshape(-1)[idx.reshape(-1)] = val.reshape(-1)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=1e-2, atol=1e-2)


def test_int32_overflow_gate():
    """ADVICE r3: the kernel's landing parities are int32 — outputs with
    >= 2^31 elements must keep the int64 dense path (gate in ops/nn.py),
    small ones take the kernel."""
    from smelter_tpu.ops.nn import _unpool2x2_kernel_ok

    ok = _unpool2x2_kernel_ok((2, 32, 16, 64), (2, 32, 32, 128),
                              [2, 2], [2, 2], [0, 0, 0, 0], 2)
    assert ok
    big = (8, 64, 2 ** 12, 2 ** 12)  # 2^37 output elements
    assert not _unpool2x2_kernel_ok(
        (8, 64, 2 ** 11, 2 ** 11), big, [2, 2], [2, 2], [0, 0, 0, 0], 2)
