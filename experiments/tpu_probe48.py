"""TPU probe #48: dequant+matmul SOL gate, K-differenced timing.

probe47 showed probe46's numbers were deflated ~1.45 ms/iter by the
per-dispatch RPC floor (per-rep sync). Here every row uses bench.py's
K-DIFFERENCING: time chained(K_lo) and chained(K_hi) (min over reps,
sync once per call) and divide the delta — the fixed dispatch+boundary
cost cancels exactly.

Questions:
  Q1 true pure-int8 ceiling AT THE GATE SHAPE M8192 K4096 N4096 (the
     r2 "327" was 8192^3 — a different shape).
  Q2 XLA epilogue cost at the gate shape (suspected i32 materialization).
  Q3 2pass pallas kernel, ds on/off, block sweep.
  Q4 fused2 quantize-on-revisit kernel (x read once, quant amortized).
  Q5 e2e composites incl. absmax prologue.
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
        _int8_matmul_fused2_impl, _int8_matmul_fused_impl,
        _int8_matmul_impl, dequant_matmul_int8, dequant_matmul_int8_fused2,
        quantize_rows)
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

    def report(tag, dt, fl):
        print(f"{tag}: {dt*1e3:.3f} ms/iter = {fl/dt/1e12:.0f} TOP/s",
              flush=True)

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

    rows = []
    # Q1/Q2: ceilings at the gate shape
    rows.append(("Q1 xla pure int8 (gate shape)",
                 lambda x: jnp.dot(x, qd, preferred_element_type=jnp.int32),
                 xq_pre, fl))
    rows.append(("Q2 xla int8 + f32 epilogue",
                 lambda x: (jnp.dot(x, qd, preferred_element_type=jnp.int32)
                            .astype(jnp.float32) * sr_pre * sd[None, :]
                            ).astype(jnp.bfloat16), xq_pre, fl))

    # Q3: 2pass pallas (pre-quantized)
    for pd in (True, False):
        for bm, bn, bk in [(1024, 1024, 1024), (512, 1024, 1024),
                           (512, 512, 2048)]:
            rows.append((
                f"Q3 pallas 2pass ds={int(pd)} bm{bm} bn{bn} bk{bk}",
                lambda x, bm=bm, bn=bn, bk=bk, pd=pd: _int8_matmul_impl(
                    x, qd, sr_pre, sd, block_m=bm, block_n=bn, block_k=bk,
                    parallel_dims=pd), xq_pre, fl))

    # Q4: fused2 quantize-on-revisit (pre-computed s_row -> kernel only)
    for bm, bn, bk in [(256, 1024, 1024), (512, 1024, 1024),
                       (256, 512, 1024), (256, 1024, 2048),
                       (512, 512, 2048), (128, 1024, 1024)]:
        rows.append((
            f"Q4 fused2 bm{bm} bn{bn} bk{bk}",
            lambda x, bm=bm, bn=bn, bk=bk: _int8_matmul_fused2_impl(
                x, qd, sr_pre, sd, block_m=bm, block_n=bn, block_k=bk),
            xb, fl))
    # old panel-fused best, for the record
    rows.append(("Q4 fused(panel) bm512 bn1024 bk1024",
                 lambda x: _int8_matmul_fused_impl(
                     x, qd, sr_pre, sd, block_m=512, block_n=1024,
                     block_k=1024), xb, fl))

    # Q5: e2e composites
    rows.append(("Q5 e2e 2pass composite",
                 lambda x: dequant_matmul_int8(x, qd, sd, block_m=512,
                                               block_n=1024, block_k=1024),
                 xb, fl))
    rows.append(("Q5 e2e xla composite",
                 lambda x: (lambda t: (jnp.dot(t[0], qd,
                                               preferred_element_type=jnp.int32)
                                       .astype(jnp.float32) * t[1]
                                       * sd[None, :]).astype(jnp.bfloat16))
                 (quantize_rows(x)), xb, fl))
    for bm, bn, bk in [(256, 1024, 1024), (512, 1024, 1024),
                       (256, 1024, 2048)]:
        rows.append((
            f"Q5 e2e fused2 bm{bm} bn{bn} bk{bk}",
            lambda x, bm=bm, bn=bn, bk=bk: dequant_matmul_int8_fused2(
                x, qd, sd, block_m=bm, block_n=bn, block_k=bk), xb, fl))

    for tag, step, x, flops in rows:
        try:
            dt = timeit_diff(step, x)
            report(tag, dt, flops)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # context row: pure int8 at 8192^3 (reproduce r2's 327)
    M2 = 8192
    xq8 = jax.device_put(rng.integers(-127, 128, (M2, M2), dtype=np.int8))
    wq8 = jax.device_put(rng.integers(-127, 128, (M2, M2), dtype=np.int8))
    try:
        dt = timeit_diff(
            lambda x: jnp.dot(x, wq8, preferred_element_type=jnp.int32), xq8)
        report("ctx xla pure int8 8192^3 (r2: 327)", dt, 2 * M2**3)
    except Exception as e:  # noqa: BLE001
        print("ctx FAIL", e, flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
