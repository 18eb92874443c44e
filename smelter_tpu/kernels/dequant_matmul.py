"""Fused dequant + matmul Pallas kernel (int8 weights, per-channel scales).

The north-star hot op (BASELINE.json:5: "hand-written Pallas kernels for
fused dequant+matmul ... at HBM- or MXU-bound speed-of-light"). Weight-only
int8 halves-again weight HBM traffic vs bf16: the kernel streams int8
weight tiles into VMEM, upcasts in-register, runs the MXU in the
activation dtype, and applies the per-output-channel scale once in the
epilogue after K-accumulation (not per K-tile — scales are per-N, so they
commute with the K sum).

Grid: (M/TM, N/TN, K/TK), K innermost so the f32 accumulator tile stays
resident in VMEM across the K sweep (Pallas revisiting pattern).

Block defaults from the v5e sweep in experiments/tpu_probe3.py (M=8192
serving-gemm: 44 -> 62 TFLOP/s over the untuned blocks; bm=2048 measured
marginally faster but OOMs the 16MB scoped VMEM with f32 activations —
bm=512/bn=1024 is the safe near-peak point). Note: current XLA
fuses dequant+matmul at ~98 TFLOP/s on the same shape, so the engine keeps
use_pallas opt-in; the kernel wins where XLA tiles badly (plain bf16
matmul on tall-skinny M=8192 regressed to 29 TFLOP/s vs 59 here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, out_dtype,
            k_total: int, bk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    if k_total % bk != 0:
        # K remainder: out-of-bounds tile contents are undefined — zero the
        # invalid K lanes so they don't pollute the accumulation.
        rem = k_total - k * bk
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        x = jnp.where(col < rem, x, jnp.zeros_like(x))
        w = jnp.where(row < rem, w, jnp.zeros_like(w))

    acc_ref[:] += jnp.dot(
        x,
        w.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def _dequant_matmul_impl(
    x: jax.Array,  # (M, K) float
    w_q: jax.Array,  # (K, N) int8
    scales: jax.Array,  # (N,) float32 per-output-channel
    *,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and scales.shape == (N,)
    out_dtype = out_dtype or x.dtype

    # Clamp blocks to (padded) problem size; keep lane/sublane alignment.
    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, _round_up(N, 128))
    bk = min(block_k, _round_up(K, 128))
    grid = (_cdiv(M, bm), _cdiv(N, bn), _cdiv(K, bk))

    kernel = functools.partial(
        _kernel, n_k=grid[2], out_dtype=jnp.dtype(out_dtype), k_total=K, bk=bk
    )
    flops = 2 * M * N * K
    bytes_accessed = (
        x.size * x.dtype.itemsize + w_q.size + N * 4 + M * N * jnp.dtype(out_dtype).itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, w_q, scales.reshape(1, N))


def dequant_matmul_reference(x, w_q, scales):
    """jnp reference implementation (what XLA runs without the kernel)."""
    w = w_q.astype(jnp.float32) * scales[None, :].astype(jnp.float32)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


def dequant_matmul(x, w_q, scales, *, block_m: int = 512, block_n: int = 1024,
                   block_k: int = 512, out_dtype=None, interpret: bool | None = None):
    """Public entry: auto-selects interpret mode on CPU backends (Mosaic
    compiles only for TPU), so Config.use_pallas works everywhere."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dequant_matmul_impl(x, w_q, scales, block_m=block_m, block_n=block_n,
                                block_k=block_k, out_dtype=out_dtype,
                                interpret=interpret)
