"""TPU campaign #12: loop-amortized (single-dispatch) kernel timings.

Probe 11 showed every individual matmul dispatch pinned at the ~3.5 ms
tunnel RPC floor (M512 measured *slower* than M8192). Here every
measurement chains LOOP iterations inside ONE jitted lax.fori_loop via a
scalar carry dependency (c[0,0] * runtime-zero added to the input, so XLA
can neither DCE nor hoist the body), and divides by LOOP.

Sections:
- [A] serving-gemm M8192 K4096 N4096: XLA fused-dequant bf16 / plain bf16 /
  int8xint8->i32 vs Pallas int8_matmul (block sweep) vs r1 bf16 kernel.
- [B] e2e dynamic-quant path (quantize_rows in the loop too).
- [C] smaller M (2048 / 512 serving shapes).
- [D] conv at serving batches (b64/b128): XLA bf16 vs XLA int8 conv i32 vs
  fused dequant — decides the int8-static epilogue question with real
  numbers.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


LOOP = 20


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.dequant_matmul import dequant_matmul
    from smelter_tpu.kernels.int8_matmul import (
        dequant_matmul_int8, int8_matmul, quantize_rows)
    from smelter_tpu.quant import quantize_array

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def chain_f(step, x0_shape, x0_dtype):
        """Loop step(x)->y with scalar carry feedback; returns jitted fn
        taking (x, zero_scalar). Works for any step whose input/output
        shapes differ (the carry is only read at [0,...,0])."""
        @jax.jit
        def run(x, zero):
            def body(i, carry):
                c0 = carry[(0,) * carry.ndim].astype(x.dtype)
                y = step(x + c0 * zero.astype(x.dtype))
                return y
            ysh = jax.eval_shape(step, x)
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    M, K, N = 8192, 4096, 4096
    flops = 2 * M * K * N
    xf = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((K, N)).astype(np.float32)
    q, s = quantize_array(wf, axis=1)
    xb = jax.device_put(xf).astype(jnp.bfloat16)
    qd = jax.device_put(q)
    sd = jax.device_put(s.reshape(-1).astype(np.float32))
    wb = jax.device_put((q.astype(np.float32) * s.reshape(1, -1)).astype(np.float32)).astype(jnp.bfloat16)
    xq_pre, sr_pre = jax.jit(quantize_rows)(xb)
    xq_pre = jax.device_put(np.asarray(xq_pre))
    sr_pre = jax.device_put(np.asarray(sr_pre))
    z_bf = jax.device_put(np.zeros((), np.float32)).astype(jnp.bfloat16)
    z_i8 = jax.device_put(np.zeros((), np.int8))

    def report(tag, dt, fl=flops):
        print(f"{tag}: {dt/LOOP*1e3:.3f} ms/iter = {fl/(dt/LOOP)/1e12:.0f} TOP/s",
              flush=True)

    # [A] serving gemm
    runs = [
        ("A xla fused dequant bf16",
         chain_f(lambda x: jnp.dot(
             x, (qd.astype(jnp.float32) * sd[None, :]).astype(jnp.bfloat16),
             preferred_element_type=jnp.float32).astype(jnp.bfloat16),
             (M, K), jnp.bfloat16), (xb, z_bf)),
        ("A xla plain bf16",
         chain_f(lambda x: jnp.dot(x, wb, preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16), (M, K), jnp.bfloat16),
         (xb, z_bf)),
        ("A xla int8->i32",
         chain_f(lambda x: (jnp.dot(x, qd, preferred_element_type=jnp.int32)
                            .astype(jnp.float32) * sr_pre * sd[None, :]
                            ).astype(jnp.bfloat16), (M, K), jnp.int8),
         (xq_pre, z_i8)),
        ("A pallas r1 bf16 kernel",
         chain_f(lambda x: dequant_matmul(x, qd, sd), (M, K), jnp.bfloat16),
         (xb, z_bf)),
    ]
    for bm, bn, bk in [(1024, 1024, 1024), (512, 1024, 1024), (512, 2048, 1024),
                       (1024, 1024, 512), (512, 512, 2048), (2048, 512, 1024)]:
        runs.append((
            f"A pallas int8 bm{bm} bn{bn} bk{bk}",
            chain_f(lambda x, bm=bm, bn=bn, bk=bk: int8_matmul(
                x, qd, sr_pre, sd, block_m=bm, block_n=bn, block_k=bk),
                (M, K), jnp.int8),
            (xq_pre, z_i8)))
    runs.append((
        "B e2e dequant_matmul_int8 (quant in loop)",
        chain_f(lambda x: dequant_matmul_int8(x, qd, sd, block_m=1024,
                                              block_n=1024, block_k=1024),
                (M, K), jnp.bfloat16),
        (xb, z_bf)))
    for tag, fn, args in runs:
        try:
            dt = timeit(fn, *args)
            report(tag, dt)
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # [C] smaller M
    for m2 in (2048, 512):
        x2 = jax.device_put(xf[:m2]).astype(jnp.bfloat16)
        fl2 = 2 * m2 * K * N
        for tag, fn, args in [
            (f"C M{m2} xla fused dequant",
             chain_f(lambda x: jnp.dot(
                 x, (qd.astype(jnp.float32) * sd[None, :]).astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(jnp.bfloat16),
                 (m2, K), jnp.bfloat16), (x2, z_bf)),
            (f"C M{m2} e2e int8 kernel",
             chain_f(lambda x: dequant_matmul_int8(x, qd, sd, block_m=1024,
                                                   block_n=1024, block_k=1024),
                     (m2, K), jnp.bfloat16), (x2, z_bf)),
        ]:
            try:
                dt = timeit(fn, *args)
                report(tag, dt, fl2)
            except Exception as e:
                print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    # [D] conv at serving batches: the int8-static question
    for (b, h, cin, cout, k) in [(64, 14, 256, 256, 3), (64, 28, 128, 128, 3),
                                 (128, 14, 256, 256, 3)]:
        xc = rng.standard_normal((b, h, h, cin)).astype(np.float32)
        wfc = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
        qc, sc_ = quantize_array(wfc, axis=0)
        q_hwio = np.ascontiguousarray(qc.transpose(2, 3, 1, 0))
        xd = jax.device_put(xc).astype(jnp.bfloat16)
        xdq = jax.device_put(np.clip(np.round(xc / (np.abs(xc).max() / 127)),
                                     -127, 127).astype(np.int8))
        qcd = jax.device_put(q_hwio)
        scd = jax.device_put(sc_.reshape(-1).astype(np.float32))
        w_bf = jax.device_put((q_hwio.astype(np.float32) *
                               sc_.reshape(1, 1, 1, -1)).astype(np.float32)
                              ).astype(jnp.bfloat16)
        pads = ((k // 2, k // 2),) * 2
        cfl = 2 * b * h * h * cin * cout * k * k
        m_fold = jax.device_put((sc_.reshape(-1) * 0.01).astype(np.float32))

        def conv(x, w, pet=jnp.float32):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)

        for tag, fn, args in [
            (f"D b{b} {h}x{h} c{cin} xla bf16 conv",
             chain_f(lambda x: conv(x, w_bf).astype(jnp.bfloat16),
                     xc.shape, jnp.bfloat16), (xd, z_bf)),
            (f"D b{b} {h}x{h} c{cin} xla int8 conv+foldedreq",
             chain_f(lambda x: jnp.clip(jnp.round(
                 conv(x, qcd, jnp.int32).astype(jnp.float32) * m_fold),
                 -128, 127).astype(jnp.int8), xc.shape, jnp.int8),
             (xdq, z_i8)),
            (f"D b{b} {h}x{h} c{cin} xla fused dequant conv",
             chain_f(lambda x: conv(
                 x, (qcd.astype(jnp.float32) * scd).astype(jnp.bfloat16)
             ).astype(jnp.bfloat16), xc.shape, jnp.bfloat16), (xd, z_bf)),
        ]:
            try:
                dt = timeit(fn, *args)
                report(tag, dt, cfl)
            except Exception as e:
                print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
