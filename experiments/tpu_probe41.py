"""TPU campaign #41: bisect the pixel-conv block time.

probe40: every pixel-major variant lands at 250-300 us for (64->32)@128^2
b8 while the HBM floor is ~31 us and the padded-MXU floor ~50 us. Ablate
the blockdot kernel stage by stage (same grid/DMA/IO) to find the cost:
  mode=dma    DMA in, store zeros
  mode=copy   DMA + rhs build, store a rhs slice
  mode=dot    DMA + rhs build + dot, store raw t slice
  mode=full   + rolls/masks/bias/leaky epilogue
Sweep rows 16/32/64 at (cin=64, cout=32, 8x128x128).
"""

import functools
import time

import numpy as np

LOOP = 30


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def chain(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        ysh = jax.eval_shape(step, x)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(x.dtype)
            return step(x + c0 * 0)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def timeit(fn, x, iters=6, warmup=1):
    for _ in range(warmup):
        sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    B, H, CIN, COUT, W = 8, 128, 64, 32, 128
    flops = 2 * B * H * W * 9 * CIN * COUT
    x_nhcw = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, CIN, W)).astype(np.float32), bf))
    w2 = jnp.asarray(rng.standard_normal((3 * COUT, 3 * CIN))
                     .astype(np.float32), bf)
    bias = jnp.asarray(rng.standard_normal((COUT, 1)).astype(np.float32), bf)

    def make(mode, rows):
        def kern(x_hbm, w_ref, b_ref, o_ref):
            b = pl.program_id(0)
            rb = pl.program_id(1)
            r0 = rb * rows
            rw = rows * W

            def body(xs, rhs, sem):
                cp = pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(r0, rows)], xs.at[pl.ds(1, rows)],
                    sem)
                cp.start()
                cp.wait()
                if mode == "dma":
                    for r in range(rows):
                        o_ref[0, r] = xs[1 + r, :COUT, :]
                    return
                for r in range(rows):
                    rhs[:, r * W:(r + 1) * W] = (
                        xs[pl.ds(r, 3)].reshape(3 * CIN, W))
                if mode == "copy":
                    for r in range(rows):
                        o_ref[0, r] = rhs[:COUT, r * W:(r + 1) * W]
                    return
                t = jnp.dot(w_ref[:], rhs[:],
                            preferred_element_type=jnp.float32)
                if mode == "dot":
                    acc = t[COUT:2 * COUT].astype(bf)
                    for r in range(rows):
                        o_ref[0, r] = acc[:, r * W:(r + 1) * W]
                    return
                lane = jax.lax.broadcasted_iota(jnp.int32, (COUT, rw), 1)
                left = pltpu.roll(t[0:COUT], 1, 1)
                left = jnp.where(lane % W == 0, 0.0, left)
                right = pltpu.roll(t[2 * COUT:3 * COUT], rw - 1, 1)
                right = jnp.where(lane % W == W - 1, 0.0, right)
                acc = (t[COUT:2 * COUT] + left + right
                       + b_ref[:].astype(jnp.float32)).astype(bf)
                for r in range(rows):
                    o_ref[0, r] = acc[:, r * W:(r + 1) * W]

            pl.run_scoped(
                body,
                xs=pltpu.VMEM((rows + 2, CIN, W), bf),
                rhs=pltpu.VMEM((3 * CIN, rows * W), bf),
                sem=pltpu.SemaphoreType.DMA(()),
            )

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                grid=(B, H // rows),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((3 * COUT, 3 * CIN), lambda b, r: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((COUT, 1), lambda b, r: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, rows, COUT, W),
                                       lambda b, r: (b, r, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, COUT, W), bf),
                cost_estimate=pl.CostEstimate(
                    flops=flops, bytes_accessed=2 * x.size,
                    transcendentals=0),
            )(x, w2, bias)
        return f

    for rows in (16, 32, 64):
        for mode in ("dma", "copy", "dot", "full"):
            try:
                t = timeit(chain(make(mode, rows)), x_nhcw)
                print(f"[r{rows:<2d} {mode:5s}] {t*1e6:8.1f} us "
                      f"({flops/t/1e12:5.1f} TF-equiv)", flush=True)
            except Exception as e:
                print(f"[r{rows:<2d} {mode:5s}] {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
