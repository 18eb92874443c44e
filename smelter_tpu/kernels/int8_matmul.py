"""int8 x int8 -> int32 MXU matmul with fused dequant epilogue.

Round-2 attack on the dequant+matmul speed-of-light gate (BASELINE.md:11):
the round-1 kernel (kernels/dequant_matmul.py) upcasts int8 weights to the
activation dtype and runs the bf16 MXU (197 TFLOP/s peak on v5e); it
measured 63 TF vs XLA-fused 98 TF. The int8 MXU path doubles the envelope
(394 TOP/s on v5e) and halves both operands' VMEM footprint, so tiles can
be twice as large for the same budget.

Formulation (SURVEY.md §7 "hard parts" (b); VERDICT r1 item 1):
- activations are dynamically quantized per-row: one HBM-bound XLA pass
  computes s_row = absmax/127 and x_q = round(x/s_row) (quantize_rows);
- the kernel is then a *pure* int8 matmul: per (m,n,k) tile,
  acc_i32 += dot(x_q, w_q) on the int8 MXU — zero VPU work in the K loop
  (per-K-tile activation scales would cost an f32 epilogue per step,
  ~30% VPU overhead at bk=512; per-row scales commute with the K sum);
- epilogue after the K sweep: out = acc * s_row[:,None] * s_col[None,:]
  (weight scales are per-output-channel, reference analog of the
  per-channel fp16/int8 weight scales in quant/weight_quant.py).

Numerics: activations carry one extra rounding step vs the weight-only
kernel (bf16-exact activations); max elementwise activation error is
0.5 * s_row. Accuracy gates live in tests/test_kernels.py (exact integer
parity) and the model-level argmax checks in tests/test_quant.py.

Round-3 measurements (probes 47-51, K-differenced contention-robust
timing at M8192/K4096/N4096 — docs/BENCHMARKS.md "SOL gate: CLOSED"):
e2e composite 334 TOP/s on the XLA lowering (the int8_activations
default) / 324 on this Pallas kernel (bm512 bn512 bk2048), vs 437 for
the bare pre-quantized dot; the gap is exactly the quantize pass (93 us,
bandwidth-bound) + f32 epilogue. The two hand-fused variants below
(`_int8_matmul_fused_impl` manual-DMA panel, `_int8_matmul_fused2_impl`
quantize-on-revisit) measured 231 / 276 — Mosaic's own pipelining beats
both hand schedules; they stay as negative-result records, unwired.
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


def quantize_rows(x: jax.Array):
    """Per-row symmetric int8 quantization: returns (x_q int8, s_row f32).
    One fused HBM pass under XLA (absmax reduce + scale + round)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _kernel(x_ref, w_ref, sr_ref, sc_ref, o_ref, acc_ref, *, n_k: int,
            out_dtype, k_total: int, bk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    if k_total % bk != 0:
        # K remainder: zero the out-of-bounds lanes of BOTH operands
        rem = k_total - k * bk
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        x = jnp.where(col < rem, x, jnp.zeros_like(x))
        w = jnp.where(row < rem, w, jnp.zeros_like(w))

    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sr_ref[:].astype(jnp.float32)
                    * sc_ref[:].astype(jnp.float32)).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype",
                     "parallel_dims"),
)
def _int8_matmul_impl(
    x_q: jax.Array,       # (M, K) int8
    w_q: jax.Array,       # (K, N) int8
    row_scales: jax.Array,  # (M, 1) f32
    col_scales: jax.Array,  # (N,) f32
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 2048,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    parallel_dims: bool = False,
) -> jax.Array:
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2 and col_scales.shape == (N,) and row_scales.shape == (M, 1)

    # int8 min tile is (32, 128); clamp blocks to padded problem size.
    bm = min(block_m, _round_up(M, 32))
    bn = min(block_n, _round_up(N, 128))
    bk = min(block_k, _round_up(K, 128))
    grid = (_cdiv(M, bm), _cdiv(N, bn), _cdiv(K, bk))

    kernel = functools.partial(
        _kernel, n_k=grid[2], out_dtype=jnp.dtype(out_dtype), k_total=K, bk=bk
    )
    flops = 2 * M * N * K
    bytes_accessed = (x_q.size + w_q.size + M * 4 + N * 4
                      + M * N * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
            if parallel_dims else None),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x_q, w_q, row_scales, col_scales.reshape(1, N))


def _fused_kernel(sr_ref, x_hbm, w_ref, sc_ref, o_ref,
                  xq_panel, acc_ref, xbuf, dma_sems, *,
                  n_k: int, bm: int, bk: int, out_dtype):
    """Fused per-row-quant int8 matmul body. Grid (i, j, k), k fastest.

    j == 0 sweep: double-buffered manual DMA of the bf16 x tile
    (i, k) HBM->VMEM, quantize in-register at the prefetched per-row
    scale, store into the int8 panel (bm, K) AND dot. j > 0 sweeps dot
    straight from the panel — x crosses HBM exactly once per i-panel,
    as bf16, with no x_q materialization in HBM at all (the round-2
    composite paid a separate 3-bytes/elem quantize pass plus an
    n_j-times reload of x_q; VERDICT r2 item 2)."""
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _():
        # warm-up DMA for k == 0 (one ~bm*bk*2-byte bubble per i-panel)
        @pl.when(k == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * bm, bm), pl.ds(0, bk)],
                xbuf.at[0], dma_sems.at[0]).start()

        # prefetch k+1 while quantizing/dotting k
        @pl.when(k + 1 < n_k)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * bm, bm), pl.ds((k + 1) * bk, bk)],
                xbuf.at[(k + 1) % 2], dma_sems.at[(k + 1) % 2]).start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * bm, bm), pl.ds(k * bk, bk)],
            xbuf.at[k % 2], dma_sems.at[k % 2]).wait()
        # same formulation as quantize_rows: round(x / s), clip, cast
        xf = xbuf[k % 2].astype(jnp.float32)
        q = jnp.clip(jnp.round(xf / sr_ref[:]), -127, 127).astype(jnp.int8)
        xq_panel[:, pl.ds(k * bk, bk)] = q

    acc_ref[:] += jnp.dot(xq_panel[:, pl.ds(k * bk, bk)], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sr_ref[:].astype(jnp.float32)
                    * sc_ref[:].astype(jnp.float32)).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def _int8_matmul_fused_impl(
    x: jax.Array,           # (M, K) bf16/f32 — stays float in HBM
    w_q: jax.Array,         # (K, N) int8
    row_scales: jax.Array,  # (M, 1) f32
    col_scales: jax.Array,  # (N,) f32
    *,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and col_scales.shape == (N,) and row_scales.shape == (M, 1)
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    # manual x DMA reads raw HBM slices: require aligned M/K (serving
    # shapes are); callers fall back to the two-pass kernel otherwise
    assert M % bm == 0 and K % bk == 0, (M, K, bm, bk)
    grid = (M // bm, _cdiv(N, bn), K // bk)

    kernel = functools.partial(
        _fused_kernel, n_k=grid[2], bm=bm, bk=bk,
        out_dtype=jnp.dtype(out_dtype))
    flops = 2 * M * N * K
    bytes_accessed = (x.size * x.dtype.itemsize + w_q.size * (M // bm)
                      + M * 4 + N * 4
                      + M * N * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),           # quantized panel
            pltpu.VMEM((bm, bn), jnp.int32),         # accumulator
            pltpu.VMEM((2, bm, bk), x.dtype),        # DMA landing slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(row_scales, x, w_q, col_scales.reshape(1, N))


def _fused2_kernel(sr_ref, x_ref, w_ref, sc_ref, o_ref, xq_ref, acc_ref,
                   *, n_k: int, bn: int, out_dtype):
    """Quantize-on-revisit body. Grid (i, k, j) with j FASTEST: the x
    tile block (i, k) is constant across the j sweep, so Pallas skips the
    re-DMA on revisit — x crosses HBM once per (i, k), is quantized once
    (at j == 0) into a VMEM int8 scratch, and every j dots from that
    scratch. The accumulator holds the full (bm, N) i32 row-panel so each
    j's partial survives the k sweep."""
    _, k, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:, pl.ds(j * bn, bn)] = jnp.zeros_like(
            acc_ref[:, pl.ds(j * bn, bn)])

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        xq_ref[:] = jnp.clip(jnp.round(xf / sr_ref[:]),
                             -127, 127).astype(jnp.int8)

    acc_ref[:, pl.ds(j * bn, bn)] += jnp.dot(
        xq_ref[:], w_ref[:], preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:, pl.ds(j * bn, bn)].astype(jnp.float32)
                    * sr_ref[:].astype(jnp.float32)
                    * sc_ref[:].astype(jnp.float32)).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def _int8_matmul_fused2_impl(
    x: jax.Array,           # (M, K) bf16/f32
    w_q: jax.Array,         # (K, N) int8
    row_scales: jax.Array,  # (M, 1) f32
    col_scales: jax.Array,  # (N,) f32
    *,
    block_m: int = 256,
    block_n: int = 1024,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and col_scales.shape == (N,) and row_scales.shape == (M, 1)
    bm = min(block_m, _round_up(M, 32))
    bn = min(block_n, _round_up(N, 128))
    bk = min(block_k, _round_up(K, 128))
    grid = (_cdiv(M, bm), _cdiv(K, bk), _cdiv(N, bn))
    n_pad = _cdiv(N, bn) * bn

    kernel = functools.partial(_fused2_kernel, n_k=grid[1], bn=bn,
                               out_dtype=jnp.dtype(out_dtype))
    flops = 2 * M * N * K
    bytes_accessed = (x.size * x.dtype.itemsize + w_q.size * grid[0]
                      + M * 4 + N * 4
                      + M * N * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i, k, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, k, j: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, k, j: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, k, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, k, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bk), jnp.int8),      # quantized x tile
            pltpu.VMEM((bm, n_pad), jnp.int32),  # full-row accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(row_scales, x, w_q, col_scales.reshape(1, N))


def dequant_matmul_int8_fused2(x, w_q, scales, *, block_m: int = 256,
                               block_n: int = 1024, block_k: int = 1024,
                               out_dtype=None, interpret: bool | None = None):
    """Quantize-on-revisit composite: one cheap absmax pass for the
    per-row scales, then a single kernel where x is read once (bf16),
    quantized once per tile, and reused across all N blocks."""
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s_row = (jnp.maximum(ax, 1e-30) / 127.0).astype(jnp.float32)
    return _int8_matmul_fused2_impl(
        x, w_q, s_row, scales, block_m=block_m, block_n=block_n,
        block_k=block_k, out_dtype=out_dtype, interpret=interpret)


def dequant_matmul_int8_fused(x, w_q, scales, *, block_m: int = 512,
                              block_n: int = 1024, block_k: int = 1024,
                              out_dtype=None, interpret: bool | None = None):
    """Fused-quant composite (VERDICT r2 item 2): per-row scales from one
    cheap absmax pass (reads x, writes M floats), then ONE kernel that
    quantizes the LHS during its K-loop DMA pipeline and applies the f32
    epilogue on the output tile. HBM traffic for the activation matrix is
    1 float read total, vs the two-pass composite's read+write(int8)+
    n_j*reload. Falls back to the two-pass path on unaligned shapes."""
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    bm, bk = min(block_m, M), min(block_k, K)
    if M % bm or K % bk:
        return dequant_matmul_int8(x, w_q, scales, block_m=block_m,
                                   block_n=block_n, block_k=block_k,
                                   out_dtype=out_dtype, interpret=interpret)
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s_row = (jnp.maximum(ax, 1e-30) / 127.0).astype(jnp.float32)
    return _int8_matmul_fused_impl(
        x, w_q, s_row, scales, block_m=block_m, block_n=block_n,
        block_k=block_k, out_dtype=out_dtype, interpret=interpret)


def int8_matmul(x_q, w_q, row_scales, col_scales, *, block_m: int = 512,
                block_n: int = 512, block_k: int = 2048,
                out_dtype=jnp.bfloat16, interpret: bool | None = None):
    """Pure int8 MXU matmul: (M,K)i8 @ (K,N)i8 -> i32 acc, scaled epilogue.
    Auto-selects interpret mode off-TPU (Mosaic compiles only for TPU)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _int8_matmul_impl(x_q, w_q, row_scales, col_scales,
                             block_m=block_m, block_n=block_n, block_k=block_k,
                             out_dtype=out_dtype, interpret=interpret)


def dequant_matmul_int8(x, w_q, scales, *, block_m: int = 512,
                        block_n: int = 512, block_k: int = 2048,
                        out_dtype=None, interpret: bool | None = None):
    """Drop-in alternative to kernels.dequant_matmul: float activations,
    int8 weights with per-N scales. Quantizes activations per-row (XLA
    pass), then runs the int8 MXU kernel."""
    out_dtype = out_dtype or x.dtype
    x_q, s_row = quantize_rows(x)
    return int8_matmul(x_q, w_q, s_row, scales, block_m=block_m,
                       block_n=block_n, block_k=block_k,
                       out_dtype=out_dtype, interpret=interpret)


def dequant_matmul_int8_xla(x, w_q, scales, out_dtype=None):
    """Pure-XLA int8 formulation (no Pallas): quantize_rows + int8 MXU dot
    + scaled epilogue. On v5e XLA compiles this to 213 TOP/s at the serving
    gemm shape (tpu_probe12) — marginally above the Pallas kernel (207);
    the engine defaults to this lowering under Config.int8_activations."""
    out_dtype = out_dtype or x.dtype
    x_q, s_row = quantize_rows(x)
    acc = jnp.matmul(x_q, w_q, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s_row
            * scales[None, :].astype(jnp.float32)).astype(out_dtype)


def int8_matmul_reference(x_q, w_q, row_scales, col_scales,
                          out_dtype=jnp.bfloat16):
    """jnp reference (exact integer accumulation) for kernel tests."""
    acc = jnp.matmul(x_q.astype(jnp.int32), w_q.astype(jnp.int32),
                     preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * row_scales.astype(jnp.float32)
            * col_scales[None, :].astype(jnp.float32)).astype(out_dtype)
