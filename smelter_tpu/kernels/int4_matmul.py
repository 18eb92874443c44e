"""Packed-int4 grouped dequant+matmul Pallas kernel (decode serving).

Why this exists (probe67 + int4_check, round 4): s4 arrays are
UNIMPLEMENTED on this TPU backend (device transfer AND on-device
convert), so int4 weights must live as packed nibbles in int8 HBM —
and XLA does NOT fuse the nibble unpack into a matmul: the packed
composite runs ~10x slower than bf16 because the unpack materializes.
Meanwhile the decode GEMM (M=8, K=N=4096) is weight-HBM-bound: bf16
30.6 us, int8 20.9 us (804 GB/s — at the roofline). Halving the bytes
again requires unpacking IN the kernel, between the DMA and the MXU.

Layout: HALF-SPLIT packing — packed[r] (int8) carries w[r] in its low
nibble and w[r + K/2] in its high nibble. Unpack is two arithmetic
shifts on int8 ((p << 4) >> 4 and p >> 4 — sign extension for free, no
mask/xor), and the two unpacked tiles are DISJOINT row ranges, so no
sublane interleave (Mosaic rejects interleave reshapes, see
kernels/max_unpool.py). Adjacent-row packing would need one.

Grouped scales (opset-21 blocked DequantizeLinear, axis=0, group G):
each grid step processes exactly one packed-row group (G rows of lo +
G rows of hi = 2 groups), so the scale is one (1, bn) row per half —
applied to the f32 PARTIAL DOT, not the bf16 weights (int4 values are
exact in bf16; scaling after the dot keeps f32 precision).

Reference scope: none (the reference has no quantization at all);
this is the BASELINE.json:5 "dequant+matmul at speed-of-light" gate
applied to the 4-bit decode-serving case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4_half(w4: np.ndarray) -> np.ndarray:
    """Pack an int8 array of 4-bit values (K, N), K even, into (K/2, N)
    int8: row r carries w4[r] (lo nibble) and w4[r + K/2] (hi nibble)."""
    k = w4.shape[0]
    assert k % 2 == 0, k
    lo = w4[: k // 2] & 0xF
    hi = (w4[k // 2:] & 0xF) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4_half(pk, k: int):
    """jnp inverse of pack_int4_half: (K/2, N) int8 -> (K, N) int8.
    The XLA composite path (CPU, and the measured-losing TPU fallback)."""
    lo = (pk << 4) >> 4  # arithmetic shifts sign-extend the nibbles
    hi = pk >> 4
    return jnp.concatenate([lo, hi], axis=0)


def _kernel(x_ref, pk_ref, s_ref, o_ref, *, g: int, k_half: int,
            ngh: int):
    kb = pl.program_id(1)
    # Mosaic legalizes shifts on i32 vectors but not i8 (arith.shli on
    # vector<i8> fails) — widen first; sign extension still free.
    p = pk_ref[:].astype(jnp.int32)                 # (g, bn)
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    x_lo = x_ref[:, pl.dslice(kb * g, g)]           # (Mp, g) bf16
    x_hi = x_ref[:, pl.dslice(k_half + kb * g, g)]
    d_lo = jnp.dot(x_lo, lo, preferred_element_type=jnp.float32)
    d_hi = jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)
    s_lo = s_ref[pl.dslice(kb, 1), :]               # (1, bn) f32
    s_hi = s_ref[pl.dslice(ngh + kb, 1), :]
    acc = d_lo * s_lo + d_hi * s_hi

    @pl.when(kb == 0)
    def _init():
        o_ref[:] = acc

    @pl.when(kb > 0)
    def _acc():
        o_ref[:] += acc


def _auto_bn(n: int, group: int, ngh: int, mp: int, k: int) -> int:
    """Widest N-block whose working set fits the 16 MB scoped-VMEM limit
    with margin. A (group, bn) block of the row-major (K/2, N) weight is
    contiguous ONLY at bn == n; narrower blocks DMA `group` strided
    bn-byte chunks, which costs 2-5x of the achieved HBM bandwidth at
    bn=512 (probe68/70) — so prefer full rows and shrink only under VMEM
    pressure. Mosaic double-buffers every grid-varying block (pk, scales,
    out), so those count twice — the probe71 prefill compile OOMed at
    18.2/16 MB because the single-buffer estimate missed that."""
    budget = 10 << 20
    bn = n
    while bn > 128:
        need = (2 * (2 * group * bn)         # pk block, double-buffered
                + 2 * (2 * ngh * bn * 4)     # scales column slice, dbl
                + mp * k * 2                 # x: grid-invariant, single
                + 2 * (mp * bn * 4))         # out tile, double-buffered
        if need <= budget and n % bn == 0 and bn % 128 == 0:
            return bn
        bn -= 128
    return 128


@functools.lru_cache(maxsize=None)
def _partitioned(group: int, block_n: int | None, interpret: bool):
    """GSPMD partition rule: the SPMD partitioner cannot split an opaque
    tpu_custom_call, so a TP-sharded weight would otherwise be
    ALL-GATHERED around the kernel every step (defeating tensor
    parallelism of the decode GEMMs). Rule: pk/scales column-sharded on
    their last axis -> per-shard kernel on the local (K/2, N/tp) shard,
    x replicated, output column-sharded — the Megatron column-parallel
    contract. Falls back to the dequant composite per shard when the
    local N is not a lane multiple."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def cp(x, pk, scales):
        return _int4_matmul(x, pk, scales, group=group, block_n=block_n,
                            interpret=interpret)

    def _n_axis(arg_infos):
        sh = arg_infos[1].sharding
        spec = getattr(sh, "spec", None)
        if spec is None or len(spec) < 2:
            return None
        return spec[1]

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, P(None, _n_axis(arg_infos)))

    def partition(mesh, arg_infos, result_infos):
        n_axis = _n_axis(arg_infos)
        arg_sh = (NamedSharding(mesh, P(None, None)),
                  NamedSharding(mesh, P(None, n_axis)),
                  NamedSharding(mesh, P(None, n_axis)))
        out_sh = NamedSharding(mesh, P(None, n_axis))

        def lower(x, pk, scales):
            if pk.shape[1] % 128:  # per-shard lane gate: exact fallback
                k = 2 * pk.shape[0]
                w = unpack_int4_half(pk, k).astype(jnp.float32)
                rep = jnp.repeat(scales.astype(jnp.float32), group, axis=0)
                return jnp.dot(x.astype(jnp.float32), w * rep,
                               preferred_element_type=jnp.float32)
            return _int4_matmul(x, pk, scales, group=group,
                                block_n=block_n, interpret=interpret)

        return mesh, lower, out_sh, arg_sh

    # Shardy (the default partitioner in this jax) takes an einsum-like
    # rule instead of the GSPMD callbacks; k/h/s never appear in the
    # result, and the kernel needs the full K — declare them
    # need-replication. Both forms provided (jax picks by partitioner).
    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule="m k, h n, s n -> m n",
                     need_replication_factors=("k", "h", "s"))
    return cp


@functools.lru_cache(maxsize=None)
def _vmappable(group: int, block_n: int | None, interpret: bool):
    """custom_vmap wrapper: vmapping the kernel would otherwise add a
    batch grid dimension that re-streams the WHOLE weight per batch
    instance (ruinous for batched decode, where the weight stream is the
    bottleneck). The rule collapses the batch into M — one kernel call,
    weights read once."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def call(x, pk, scales):
        return _partitioned(group, block_n, interpret)(x, pk, scales)

    @call.def_vmap
    def _rule(axis_size, in_batched, x, pk, scales):  # noqa: ANN001
        if in_batched != [True, False, False]:
            raise NotImplementedError(
                f"int4_matmul vmap over weights is unsupported "
                f"(in_batched={in_batched})")
        b, m, k = x.shape
        out = call(x.reshape(b * m, k), pk, scales)
        return out.reshape(b, m, -1), True

    return call


@functools.partial(jax.jit,
                   static_argnames=("group", "block_n", "interpret"))
def int4_matmul(x, pk, scales, *, group: int, block_n: int | None = None,
                interpret: bool | None = None):
    """x (M, K) float; pk (K/2, N) int8 half-split-packed 4-bit; scales
    (K/group, N) f32. Returns x @ dequant(w) as f32 (M, N).

    Requires K % (2*group) == 0 and N % 128 == 0 (callers gate).
    vmap-safe: the batch axis folds into M (weights stream once)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _vmappable(group, block_n, interpret)(x, pk, scales)


def _int4_matmul(x, pk, scales, *, group: int, block_n: int | None,
                 interpret: bool):
    m, k = x.shape
    k_half, n = pk.shape
    assert k == 2 * k_half and k_half % group == 0, (k, k_half, group)
    ngh = k_half // group
    assert scales.shape == (2 * ngh, n), (scales.shape, ngh, n)
    if m > 256:
        # prefill/chunk shapes: cap the VMEM-resident x/out tiles by
        # splitting M (weights re-stream per chunk; the big-M case is
        # MXU-bound so the extra reads amortize)
        outs = [_int4_matmul(x[i:i + 256], pk, scales, group=group,
                             block_n=block_n, interpret=interpret)
                for i in range(0, m, 256)]
        return jnp.concatenate(outs, axis=0)
    mp0 = max(16, -(-m // 16) * 16)
    if block_n:
        # user knob (Config.int4_block_n): clamp to a positive lane
        # multiple so the divisor search below always terminates
        bn = max(128, min(block_n, n) // 128 * 128)
    else:
        bn = _auto_bn(n, group, ngh, mp0, k)
    while n % bn:
        bn -= 128
    assert bn > 0 and n % bn == 0, (n, block_n)
    mp = max(16, -(-m // 16) * 16)  # bf16 sublane tile
    x2 = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, 0)))
    kernel = functools.partial(_kernel, g=group, k_half=k_half, ngh=ngh)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn, ngh),
        in_specs=[
            pl.BlockSpec((mp, k), lambda ni, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, bn), lambda ni, kb: (kb, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * ngh, bn), lambda ni, kb: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda ni, kb: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=int(pk.size + scales.nbytes + x2.nbytes
                               + 4 * mp * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, pk, scales)
    return out[:m]
