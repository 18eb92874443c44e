"""TPU probe #47: methodology A/B — why does probe46 read ~0.5x probe12?

Same chip-side programs timed two ways:
  (a) probe12's chain (c0 * zero arg) + its timeit (3 pipelined calls,
      sync last) — the round-2 methodology that printed 213/327.
  (b) probe46's chain (bitcast-sentinel) + min-of-3 with per-rep sync.
Rows: pure int8 8192^3 (r2: 327), int8+epilogue M8192 K4096 N4096
(r2: 213). If (a) also reads ~120 today, the chip/tunnel is slower; if
(a) reproduces r2, the new carry/timing is at fault.
"""

import time

import numpy as np

LOOP = 20


def sync(x):
    leaf = x[0] if isinstance(x, tuple) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.int8_matmul import quantize_rows
    from smelter_tpu.quant import quantize_array

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def chain_old(step, x_dtype):
        @jax.jit
        def run(x, zero):
            ysh = jax.eval_shape(step, x)

            def body(i, carry):
                c0 = carry[(0,) * carry.ndim].astype(x.dtype)
                return step(x + c0 * zero.astype(x.dtype))
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    def chain_new(step):
        @jax.jit
        def run(x):
            ysh = jax.eval_shape(step, x)

            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001), 1, 0)
                return step(x + zero.astype(x.dtype))
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    def timeit_old(fn, *args, iters=3, warmup=1):
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters / LOOP

    def timeit_new(fn, *args, reps=3):
        sync(fn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / LOOP

    # pure int8 8192^3 (r2: 327 TOP/s)
    M = K = N = 8192
    xq8 = jax.device_put(
        rng.integers(-127, 128, (M, K), dtype=np.int8))
    wq8 = jax.device_put(
        rng.integers(-127, 128, (K, N), dtype=np.int8))
    z_i8 = jax.device_put(np.zeros((), np.int8))
    step_pure = lambda x: jnp.dot(x, wq8, preferred_element_type=jnp.int32)
    fl = 2 * M * K * N

    dt = timeit_old(chain_old(step_pure, jnp.int8), xq8, z_i8)
    print(f"pure 8192^3 OLD method: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s",
          flush=True)
    dt = timeit_new(chain_new(step_pure), xq8)
    print(f"pure 8192^3 NEW method: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s",
          flush=True)

    # int8 + epilogue at M8192 K4096 N4096 (r2: 213 TOP/s)
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

    step_epi = lambda x: (jnp.dot(x, qd, preferred_element_type=jnp.int32)
                          .astype(jnp.float32) * sr_pre * sd[None, :]
                          ).astype(jnp.bfloat16)
    dt = timeit_old(chain_old(step_epi, jnp.int8), xq_pre, z_i8)
    print(f"epi M8K4N4 OLD method: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s",
          flush=True)
    dt = timeit_new(chain_new(step_epi), xq_pre)
    print(f"epi M8K4N4 NEW method: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s",
          flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
