"""Shared chip-timing helpers (bench.py + tools/roofline.py).

Methodology (probe34e/probe47-50): individual dispatches over the dev
tunnel pin at the RPC floor, so chip time is measured by chaining K model
invocations inside ONE jitted lax.fori_loop and DIFFERENCING two K values
— the fixed dispatch + readback cost cancels exactly. The loop carry
dependence is an integer bitcast-vs-sentinel compare: unlike float
`x + c0*0` (one fast-math pass from folding) or `optimization_barrier`
(erased by the barrier expander, body hoisted by while-loop LICM —
verified in optimized HLO), no legal or fast-math rewrite can sever it.
"""

from __future__ import annotations

import time

import numpy as np


def sync(out) -> None:
    """Force true device completion. Over the axon tunnel,
    block_until_ready returns before remote execution finishes — only a
    host readback observes completion (execution is in-order, so reading
    any element of the last output waits for all queued work). Slice a
    single element ON DEVICE first: np.asarray of the full array would
    time the tunnel transfer, not the model."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    scalar = leaf[(0,) * getattr(leaf, "ndim", 0)]
    np.asarray(scalar)


def chip_time(fn, params, x, k_lo: int = 6, k_hi: int = 26,
              reps: int = 3, min_span_s: float = 0.4) -> float:
    """Per-step chip time in seconds for `fn(params, x)`, loop-amortized
    and K-differenced.

    min_span_s: the K-difference must cover at least this much chip
    time — differences spanning less than the tunnel's RPC/pipelining
    window (~100 ms) can intermittently collapse and report past the
    hardware's physics floors (probe82b; probe74/81 retractions). If
    the first estimate implies a smaller span, k_hi is raised and the
    measurement redone. Pass min_span_s=0 to disable (CPU tests)."""
    import jax
    import jax.numpy as jnp

    out_sd = jax.eval_shape(fn, params, x)
    leaf_sd = jax.tree_util.tree_leaves(out_sd)[0]

    def chained(k):
        @jax.jit
        def run(p, xx):
            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                out = fn(p, xx + zero.astype(xx.dtype))
                return jax.tree_util.tree_leaves(out)[0]
            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(leaf_sd.shape, leaf_sd.dtype))
        return run

    def timed(run):
        sync(run(params, x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(params, x))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(chained(k_lo)), timed(chained(k_hi))
    per = max(1e-9, (t_hi - t_lo) / (k_hi - k_lo))
    if min_span_s and per * (k_hi - k_lo) < min_span_s:
        # widen until the difference dwarfs any pipelining window; cap
        # the loop length so a mis-estimate can't run away
        k_wide = k_lo + min(20000, max(k_hi - k_lo,
                                       int(min_span_s / per) + 1))
        t_wide = timed(chained(k_wide))
        per = max(1e-9, (t_wide - t_lo) / (k_wide - k_lo))
    return per
