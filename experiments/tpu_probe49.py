"""TPU probe #49: final 2pass block sweep toward the 375 TOP/s ceiling.

probe48 (K-differenced): pure-int8 XLA ceiling 375 at the gate shape;
2pass pallas kernel best 327 (ds=0, bm512 bn512 bk2048); e2e composite
286. dimension_semantics HURTS (ds=1 1024^3: 287 vs ds=0: 303).
Questions: does bk=4096 (single K step, no acc revisit) close the
kernel gap; which e2e composite wins; XLA-dot-composite e2e at the best
formulation for reference.
"""

import time

import numpy as np

K_LO, K_HI, REPS = 4, 16, 3


def sync(x):
    leaf = x[0] if isinstance(x, tuple) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.int8_matmul import (
        _int8_matmul_impl, dequant_matmul_int8, quantize_rows)
    from smelter_tpu.quant import quantize_array

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def chained(step, loop):
        @jax.jit
        def run(x):
            ysh = jax.eval_shape(step, x)

            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001), 1, 0)
                return step(x + zero.astype(x.dtype))
            return jax.lax.fori_loop(0, loop, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    def timeit_diff(step, x):
        def t(loop):
            fn = chained(step, loop)
            sync(fn(x))
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                sync(fn(x))
                best = min(best, time.perf_counter() - t0)
            return best
        return max(1e-9, (t(K_HI) - t(K_LO)) / (K_HI - K_LO))

    M, K, N = 8192, 4096, 4096
    fl = 2 * M * K * N
    xf = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((K, N)).astype(np.float32)
    q, s = quantize_array(wf, axis=1)
    qd = jax.device_put(q)
    sd = jax.device_put(s.reshape(-1).astype(np.float32))
    xb = jax.device_put(xf).astype(jnp.bfloat16)
    xq_pre, sr_pre = jax.jit(quantize_rows)(xb)
    xq_pre.block_until_ready()

    def report(tag, dt):
        print(f"{tag}: {dt*1e3:.3f} ms/iter = {fl/dt/1e12:.0f} TOP/s",
              flush=True)

    rows = []
    for bm, bn, bk in [(512, 512, 4096), (256, 512, 4096), (512, 256, 4096),
                       (1024, 512, 2048), (256, 512, 2048),
                       (1024, 1024, 2048), (2048, 512, 2048)]:
        rows.append((
            f"kern bm{bm} bn{bn} bk{bk}",
            lambda x, bm=bm, bn=bn, bk=bk: _int8_matmul_impl(
                x, qd, sr_pre, sd, block_m=bm, block_n=bn, block_k=bk,
                parallel_dims=False), xq_pre))
    for bm, bn, bk in [(512, 512, 2048), (512, 512, 4096),
                       (1024, 1024, 2048)]:
        rows.append((
            f"e2e 2pass bm{bm} bn{bn} bk{bk}",
            lambda x, bm=bm, bn=bn, bk=bk: dequant_matmul_int8(
                x, qd, sd, block_m=bm, block_n=bn, block_k=bk), xb))
    # quantize pass alone (bandwidth context)
    rows.append(("quantize_rows alone (96MB)",
                 lambda x: quantize_rows(x)[0], xb))

    for tag, step, x in rows:
        try:
            dt = timeit_diff(step, x)
            if "quantize_rows" in tag:
                print(f"{tag}: {dt*1e6:.0f} us/iter", flush=True)
            else:
                report(tag, dt)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
