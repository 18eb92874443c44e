"""Pallas MaxUnpool kernel (non-overlapping 2x2/s2 — the SegNet case).

probe58 decomposition: SegNet's final full-resolution MaxUnpool alone
costs 4.76 ms of the model's 8.81 ms — ~16x its traffic bound — because
the XLA dense formulation materializes nearest-expanded x AND idx plus
the position iota at OUTPUT resolution. This kernel reads x and idx once
at INPUT resolution and writes the 2x-upsampled output directly: the
landing position inside each 2x2 window is just the PARITY of the flat
index ((idx // W_out) % 2, idx % 2 — valid because H_out and W_out are
even and the flat [N,C,H,W] offset terms are all even), computed
in-register. Traffic = |x| + |idx| + |out|, nothing else.

Layout: operates on (B*C*h, w) row-flattened views (free reshapes of
contiguous NCHW); input row r produces output rows 2r and 2r+1 of the
(B*C*2h, 2w) output. Interleaves ride reshape relayouts in VMEM.

Reference scope: the reference has no pooling-indices ops at all; this
chases the SegNet decoder (docs/BENCHMARKS.md roofline row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, i_ref, o_ref, *, w_out: int):
    rows, w = x_ref.shape
    x = x_ref[:].astype(jnp.float32)
    idx = i_ref[:]
    dy = jnp.remainder(jnp.floor_divide(idx, w_out), 2)
    dx = jnp.remainder(idx, 2)
    zero = jnp.zeros_like(x)

    # Mosaic supports neither lane- nor sublane-interleave reshapes
    # ((r, w, 2) -> (r, 2w) raises "unsupported shape cast"), so both
    # interleaves ride the MXU as 0/1 permutation-matrix matmuls built
    # from iota — a few hundred KFLOPs per block, always lowerable.
    ri = jax.lax.broadcasted_iota(jnp.int32, (w, 2 * w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w, 2 * w), 1)
    e_even = (ci == 2 * ri).astype(jnp.float32)       # lane 2j   <- j
    e_odd = (ci == 2 * ri + 1).astype(jnp.float32)    # lane 2j+1 <- j
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, rows), 0)
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, rows), 1)
    s_even = (ri2 == 2 * ci2).astype(jnp.float32)     # row 2r   <- r
    s_odd = (ri2 == 2 * ci2 + 1).astype(jnp.float32)  # row 2r+1 <- r

    halves = []
    for t_dy in (0, 1):
        p0 = jnp.where(jnp.logical_and(dy == t_dy, dx == 0), x, zero)
        p1 = jnp.where(jnp.logical_and(dy == t_dy, dx == 1), x, zero)
        halves.append(
            jnp.dot(p0, e_even, preferred_element_type=jnp.float32)
            + jnp.dot(p1, e_odd, preferred_element_type=jnp.float32))
    out = (jnp.dot(s_even, halves[0], preferred_element_type=jnp.float32)
           + jnp.dot(s_odd, halves[1], preferred_element_type=jnp.float32))
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def max_unpool2x2(x, idx, *, rows: int = 128, interpret: bool | None = None):
    """x, idx: (B, C, h, w) NCHW (idx = flat [N,C,2h,2w] positions, the
    _max_pool_with_indices convention). Returns (B, C, 2h, 2w)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c, h, w = x.shape
    total = b * c * h
    rows = max(1, min(rows, total))
    while total % rows:
        rows -= 1
    x2 = x.reshape(total, w)
    i2 = idx.reshape(total, w).astype(jnp.int32)
    kernel = functools.partial(_kernel, w_out=2 * w)
    out = pl.pallas_call(
        kernel,
        grid=(total // rows,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * rows, 2 * w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * total, 2 * w), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * x2.size,
            bytes_accessed=x2.size * x.dtype.itemsize + i2.size * 4
            + 4 * x2.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, i2)
    return out.reshape(b, c, 2 * h, 2 * w)
