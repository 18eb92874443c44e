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
