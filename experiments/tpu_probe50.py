"""TPU probe #50: validated + variance-bounded final int8 gate numbers.

probe49 printed impossible rows (713/1137 TOP/s > the 394 peak) for some
block configs and an e2e faster than its own kernel — differenced timing
can collapse when both loop counts land in dispatch noise. Here every
candidate is (1) VALIDATED on-chip against the XLA reference dot (max
|err| read back as a scalar), then (2) timed with two independent
differencing pairs (4->16 and 8->32); a row only counts if the two
estimates agree within 15%.
"""

import time

import numpy as np

REPS = 3


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

    @jax.jit
    def ref_out(xq):
        return (jnp.dot(xq, qd, preferred_element_type=jnp.int32)
                .astype(jnp.float32) * sr_pre * sd[None, :]
                ).astype(jnp.bfloat16)

    ref = ref_out(xq_pre)
    sync(ref)

    @jax.jit
    def max_err(a, b):
        return jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))

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

    def t_loop(step, x, loop):
        fn = chained(step, loop)
        sync(fn(x))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(tag, step, x, check=True):
        try:
            if check:
                got = jax.jit(step)(x)
                e = float(np.asarray(max_err(got, ref)))
                # int8 grids: exact match expected up to bf16 out rounding
                if not np.isfinite(e) or e > 1.0:
                    print(f"{tag}: INVALID output (max err {e})", flush=True)
                    return
            d1 = (t_loop(step, x, 16) - t_loop(step, x, 4)) / 12
            d2 = (t_loop(step, x, 32) - t_loop(step, x, 8)) / 24
            rel = abs(d1 - d2) / max(d1, d2, 1e-12)
            dt = (d1 + d2) / 2
            flag = "" if rel < 0.15 else f"  [INCONSISTENT {d1*1e3:.3f}/{d2*1e3:.3f}]"
            print(f"{tag}: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s{flag}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

    measure("xla pure int8",
            lambda x: jnp.dot(x, qd, preferred_element_type=jnp.int32),
            xq_pre, check=False)
    measure("xla int8+epilogue", ref_out, xq_pre)
    for bm, bn, bk in [(512, 512, 2048), (512, 512, 4096), (256, 512, 4096),
                       (256, 512, 2048), (512, 1024, 1024),
                       (1024, 1024, 1024)]:
        measure(f"kern bm{bm} bn{bn} bk{bk}",
                lambda x, bm=bm, bn=bn, bk=bk: _int8_matmul_impl(
                    x, qd, sr_pre, sd, block_m=bm, block_n=bn, block_k=bk,
                    parallel_dims=False), xq_pre)
    for bm, bn, bk in [(512, 512, 2048), (512, 512, 4096)]:
        measure(f"e2e 2pass bm{bm} bn{bn} bk{bk}",
                lambda x, bm=bm, bn=bn, bk=bk: dequant_matmul_int8(
                    x, qd, sd, block_m=bm, block_n=bn, block_k=bk), xb)
    measure("e2e xla",
            lambda x: (lambda t: (jnp.dot(t[0], qd,
                                          preferred_element_type=jnp.int32)
                                  .astype(jnp.float32) * t[1] * sd[None, :]
                                  ).astype(jnp.bfloat16))(quantize_rows(x)),
            xb)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
