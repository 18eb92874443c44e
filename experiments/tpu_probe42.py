"""TPU campaign #42: HBM->VMEM DMA strategies for the pixel-conv kernel.

probe41: the kernel's serial per-block DMA moves 16.8 MB in 207 us
(~92 GB/s) — 9x off the 819 GB/s roofline — and dominates the kernel.
Characterize, copy-only (in [8,128,64,128] bf16 -> out same):
  A  XLA y = x + 1 (the compiler's own pipelined HBM streams)
  B  BlockSpec-pipelined Pallas copy (automatic double buffering)
  C  manual DMA, serial (probe41 baseline)
  D  manual DMA, double-buffered (prefetch next block)
  E  manual DMA, double-buffered + split into 4 concurrent chunks
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
    B, H, C, W = 8, 128, 64, 128
    ROWS = 16
    NRB = H // ROWS
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, C, W)).astype(np.float32), bf))
    mb = x.size * 2 / 2**20

    def report(name, t):
        gbs = 2 * x.size * 2 / t / 1e9  # read + write
        print(f"[{name:18s}] {t*1e6:8.1f} us  {gbs:6.0f} GB/s", flush=True)

    # A. XLA elementwise
    report("A xla add", timeit(chain(lambda xx: xx + bf(1)), x))

    # B. BlockSpec-pipelined copy
    def copy_kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    @jax.jit
    def f_b(xx):
        return pl.pallas_call(
            copy_kern,
            grid=(B, NRB),
            in_specs=[pl.BlockSpec((1, ROWS, C, W), lambda b, r: (b, r, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ROWS, C, W), lambda b, r: (b, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, C, W), bf),
        )(xx)

    report("B blockspec copy", timeit(chain(f_b), x))

    # C/D/E. manual DMA variants
    def make_manual(mode):
        nsplit = 4 if mode == "split" else 1
        csz = C // nsplit

        def kern(x_hbm, o_ref):
            s = pl.program_id(0)
            total = B * NRB

            def scoped(xs, sems):
                def issue(slot, step):
                    b = step // NRB
                    r0 = (step % NRB) * ROWS
                    for j in range(nsplit):
                        pltpu.make_async_copy(
                            x_hbm.at[b, pl.ds(r0, ROWS),
                                     pl.ds(j * csz, csz)],
                            xs.at[slot, :, pl.ds(j * csz, csz)],
                            sems.at[slot, j]).start()

                def wait(slot, step):
                    b = step // NRB
                    r0 = (step % NRB) * ROWS
                    for j in range(nsplit):
                        pltpu.make_async_copy(
                            x_hbm.at[b, pl.ds(r0, ROWS),
                                     pl.ds(j * csz, csz)],
                            xs.at[slot, :, pl.ds(j * csz, csz)],
                            sems.at[slot, j]).wait()

                if mode == "serial":
                    issue(0, s)
                    wait(0, s)
                    o_ref[0] = xs[0]
                    return
                cur = jax.lax.rem(s, 2)
                nxt = jax.lax.rem(s + 1, 2)

                @pl.when(s == 0)
                def _():
                    issue(cur, s)

                @pl.when(s + 1 < total)
                def _():
                    issue(nxt, s + 1)

                wait(cur, s)
                o_ref[0] = xs[cur]

            pl.run_scoped(
                scoped,
                xs=pltpu.VMEM((2, ROWS, C, W), bf),
                sems=pltpu.SemaphoreType.DMA((2, nsplit)),
            )

        @jax.jit
        def f(xx):
            return pl.pallas_call(
                kern,
                grid=(B * NRB,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (1, ROWS, C, W),
                    lambda s: (s // NRB, s % NRB, 0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, C, W), bf),
            )(xx)
        return f

    for name, mode in [("C manual serial", "serial"),
                       ("D manual dbuf", "dbuf"),
                       ("E manual dbuf+4", "split")]:
        try:
            report(name, timeit(chain(make_manual(mode)), x))
        except Exception as e:
            print(f"[{name}] {type(e).__name__}: {str(e)[:300]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
