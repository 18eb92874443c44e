"""Pixel-major direct-conv kernels (kernels/pixel_conv.py) vs the XLA
reference, interpret mode on CPU (CLAUDE.md kernel-test convention)."""

import numpy as np
import jax.numpy as jnp
import pytest

from smelter_tpu.kernels.pixel_conv import (
    pixel_conv_patch, pixel_conv_reference, pixel_conv_rowdot)


def _case(b, h, w, cin, cout, alpha, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, cin, h, w)).astype(np.float32)
    wt = (rng.standard_normal((cout, cin, 3, 3)) / (3 * np.sqrt(cin))
          ).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    ref = np.asarray(pixel_conv_reference(jnp.asarray(x), jnp.asarray(wt),
                                          jnp.asarray(bias), alpha=alpha))
    return x, wt, bias, ref


@pytest.mark.parametrize("alpha", [None, 0.2])
@pytest.mark.parametrize("cin,cout", [(16, 8), (32, 16)])
def test_rowdot(cin, cout, alpha):
    b, h, w = 2, 16, 128
    x, wt, bias, ref = _case(b, h, w, cin, cout, alpha)
    x_nhcw = jnp.asarray(x.transpose(0, 2, 1, 3))
    got = pixel_conv_rowdot(x_nhcw, jnp.asarray(wt), jnp.asarray(bias),
                            alpha=alpha, rows=8, interpret=True)
    got = np.asarray(got).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("alpha", [None, 0.2])
@pytest.mark.parametrize("cin,cout", [(16, 8), (32, 16)])
def test_patch(cin, cout, alpha):
    b, h, w = 2, 16, 128
    x, wt, bias, ref = _case(b, h, w, cin, cout, alpha)
    x_flat = jnp.asarray(x.reshape(b, cin, h * w))
    got = pixel_conv_patch(x_flat, jnp.asarray(wt), jnp.asarray(bias),
                           width=w, alpha=alpha, rows=8, interpret=True)
    got = np.asarray(got).reshape(b, cout, h, w)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_rowdot_single_block():
    # one row block == whole image (halo rows both zeroed)
    x, wt, bias, ref = _case(1, 8, 128, 16, 8, 0.2, seed=3)
    got = pixel_conv_rowdot(jnp.asarray(x.transpose(0, 2, 1, 3)),
                            jnp.asarray(wt), jnp.asarray(bias),
                            alpha=0.2, rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1, 3), ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("alpha", [None, 0.2])
@pytest.mark.parametrize("cin,cout", [(16, 8), (32, 16)])
def test_blockdot(cin, cout, alpha):
    from smelter_tpu.kernels.pixel_conv import pixel_conv_blockdot
    b, h, w = 2, 16, 128
    x, wt, bias, ref = _case(b, h, w, cin, cout, alpha, seed=7)
    got = pixel_conv_blockdot(jnp.asarray(x.transpose(0, 2, 1, 3)),
                              jnp.asarray(wt), jnp.asarray(bias),
                              alpha=alpha, rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1, 3), ref,
                               rtol=1e-5, atol=1e-5)


class TestPixelConvQ:
    def _case(self, requant, alpha):
        from smelter_tpu.kernels.pixel_conv import pixel_conv_rowdot_q
        rng = np.random.default_rng(11)
        b, h, w, cin, cout = 2, 16, 128, 16, 8
        xq = rng.integers(-127, 128, (b, h, cin, w), dtype=np.int8)
        wq = rng.integers(-127, 128, (cout, cin, 3, 3), dtype=np.int8)
        sx, sw = 0.02, rng.uniform(0.001, 0.01, cout).astype(np.float32)
        bias = rng.standard_normal(cout).astype(np.float32)
        sy = 0.05
        got = pixel_conv_rowdot_q(
            jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(sx * sw),
            jnp.asarray(bias), alpha=alpha, inv_sy=1.0 / sy,
            requant=requant, out_dtype=jnp.float32, rows=8, interpret=True)
        # reference: dequant -> f32 conv -> bias -> leaky -> (requant)
        from smelter_tpu.kernels.pixel_conv import pixel_conv_reference
        xf = xq.astype(np.float32).transpose(0, 2, 1, 3) * sx
        wf = wq.astype(np.float32) * sw.reshape(-1, 1, 1, 1)
        ref = np.asarray(pixel_conv_reference(
            jnp.asarray(xf), jnp.asarray(wf), jnp.asarray(bias),
            alpha=alpha))
        ref = ref.transpose(0, 2, 1, 3)  # -> (B, H, C_out, W)
        if requant:
            want = np.clip(np.round(ref / sy), -127, 127).astype(np.int8)
            got = np.asarray(got)
            # rounding at the .5 boundary may differ by 1 ulp
            assert (np.abs(got.astype(np.int32)
                           - want.astype(np.int32)) <= 1).all()
            assert (got == want).mean() > 0.999
        else:
            np.testing.assert_allclose(np.asarray(got), ref,
                                       rtol=1e-4, atol=1e-4)

    def test_requant_int8_out(self):
        self._case(True, 0.2)

    def test_float_out(self):
        self._case(False, None)
