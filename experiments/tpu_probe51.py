"""TPU probe #51: chip contention diagnostic + robust final numbers.

probe50's paired differencing disagreed by >3x — consistent with another
tenant's work interleaving on the tunnel chip. Diagnose: run the SAME
chained program 12 times and print every sample. Then produce final gate
numbers using min-of-many alternating rounds (min is robust to
contention if ANY sample runs clean).
"""

import time

import numpy as np


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

    step_epi = lambda x: (jnp.dot(x, qd, preferred_element_type=jnp.int32)
                          .astype(jnp.float32) * sr_pre * sd[None, :]
                          ).astype(jnp.bfloat16)

    # diagnostic: 12 samples of the same 16-loop program
    fn16 = chained(step_epi, 16)
    sync(fn16(xq_pre))
    samples = []
    for _ in range(12):
        t0 = time.perf_counter()
        sync(fn16(xq_pre))
        samples.append(time.perf_counter() - t0)
    print("diag 16-loop samples (ms):",
          [f"{t*1e3:.1f}" for t in samples], flush=True)
    print(f"diag spread: min {min(samples)*1e3:.1f} max {max(samples)*1e3:.1f}",
          flush=True)

    def robust(step, x, lo=4, hi=16, rounds=6):
        f_lo, f_hi = chained(step, lo), chained(step, hi)
        sync(f_lo(x)), sync(f_hi(x))
        t_lo = t_hi = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter(); sync(f_lo(x))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f_hi(x))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return max(1e-9, (t_hi - t_lo) / (hi - lo))

    for tag, step, x in [
        ("xla pure int8",
         lambda x: jnp.dot(x, qd, preferred_element_type=jnp.int32), xq_pre),
        ("xla int8+epilogue", step_epi, xq_pre),
        ("kern bm512 bn512 bk2048",
         lambda x: _int8_matmul_impl(x, qd, sr_pre, sd, block_m=512,
                                     block_n=512, block_k=2048,
                                     parallel_dims=False), xq_pre),
        ("kern bm1024 bn1024 bk1024",
         lambda x: _int8_matmul_impl(x, qd, sr_pre, sd, block_m=1024,
                                     block_n=1024, block_k=1024,
                                     parallel_dims=False), xq_pre),
        ("e2e 2pass bm512 bn512 bk2048",
         lambda x: dequant_matmul_int8(x, qd, sd, block_m=512, block_n=512,
                                       block_k=2048), xb),
        ("e2e xla composite",
         lambda x: (lambda t: (jnp.dot(t[0], qd,
                                       preferred_element_type=jnp.int32)
                               .astype(jnp.float32) * t[1] * sd[None, :]
                               ).astype(jnp.bfloat16))(quantize_rows(x)),
         xb),
    ]:
        try:
            dt = robust(step, x)
            print(f"{tag}: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
