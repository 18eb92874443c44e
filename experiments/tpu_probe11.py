"""TPU campaign #11 (round 2): int8-MXU dequant_matmul attack + amortized
dequant_conv measurement.

VERDICT r1 items 1 and 4:
- [A] XLA baselines at the serving-gemm shape (M8192 K4096 N4096):
  fused dequant (bf16 MXU), int8 x int8 -> i32 (does XLA use the int8
  MXU?), plain bf16.
- [B] Pallas int8_matmul block sweep (pre-quantized activations: the
  kernel-alone number against the 394 TOP/s int8 envelope).
- [C] End-to-end dequant_matmul_int8 (quantize_rows included).
- [D] Best-block check at smaller M (2048 / 512).
- [E] dequant_conv past the ~3 ms dispatch floor: chain K iterations in
  one jitted lax.fori_loop dispatch (data-dependent via a runtime eps so
  XLA cannot DCE), divide by K. Compare vs XLA bf16 conv and XLA fused
  dequant-conv at ResNet/U-Net shapes.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.int8_matmul import (
        dequant_matmul_int8, int8_matmul, quantize_rows)
    from smelter_tpu.quant import quantize_array

    print("devices:", jax.devices(), flush=True)

    M, K, N = 8192, 4096, 4096
    flops = 2 * M * K * N
    rng = np.random.default_rng(0)
    xf = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((K, N)).astype(np.float32)
    q, s = quantize_array(wf, axis=1)
    xb = jax.device_put(xf).astype(jnp.bfloat16)
    qd = jax.device_put(q)
    sd = jax.device_put(s.reshape(-1).astype(np.float32))

    # [A] XLA baselines
    @jax.jit
    def xla_fused_dequant(x, wq, sc):
        w = (wq.astype(jnp.float32) * sc[None, :]).astype(jnp.bfloat16)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def xla_plain_bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def xla_int8(xq, wq, sr, sc):
        acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sr * sc[None, :]).astype(jnp.bfloat16)

    xq_pre, sr_pre = jax.jit(quantize_rows)(xb)
    xq_pre = jax.device_put(np.asarray(xq_pre))
    sr_pre = jax.device_put(np.asarray(sr_pre))
    wb = jax.device_put((q.astype(np.float32) * s.reshape(1, -1)).astype(np.float32)).astype(jnp.bfloat16)

    for name, fn, args in [
        ("xla fused dequant bf16", xla_fused_dequant, (xb, qd, sd)),
        ("xla plain bf16", xla_plain_bf16, (xb, wb)),
        ("xla int8xint8->i32", xla_int8, (xq_pre, qd, sr_pre, sd)),
    ]:
        try:
            dt = timeit(fn, *args, iters=10)
            print(f"[A] {name}: {dt*1e3:.2f} ms = {flops/dt/1e12:.0f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"[A] {name}: FAIL {type(e).__name__}: {e}", flush=True)

    # [B] Pallas int8 kernel block sweep (kernel-alone, pre-quantized x)
    best = (None, 1e9)
    for bm, bn, bk in [(1024, 1024, 1024), (512, 1024, 1024), (1024, 512, 1024),
                       (512, 512, 2048), (1024, 1024, 512), (2048, 1024, 512),
                       (512, 2048, 1024), (1024, 2048, 512), (2048, 512, 1024),
                       (512, 1024, 2048)]:
        try:
            fn = lambda a, b, c, d: int8_matmul(a, b, c, d, block_m=bm,
                                                block_n=bn, block_k=bk)
            dt = timeit(fn, xq_pre, qd, sr_pre, sd, iters=10)
            print(f"[B] bm{bm} bn{bn} bk{bk}: {dt*1e3:.2f} ms = "
                  f"{flops/dt/1e12:.0f} TOP/s", flush=True)
            if dt < best[1]:
                best = ((bm, bn, bk), dt)
        except Exception as e:
            print(f"[B] bm{bm} bn{bn} bk{bk}: FAIL {type(e).__name__}", flush=True)
    print(f"[B] best: {best[0]} {flops/best[1]/1e12:.0f} TOP/s", flush=True)
    bb = best[0] or (1024, 1024, 1024)

    # [C] end-to-end (quantize_rows on-chip + kernel)
    try:
        fn = lambda a, b, c: dequant_matmul_int8(a, b, c, block_m=bb[0],
                                                 block_n=bb[1], block_k=bb[2])
        dt = timeit(fn, xb, qd, sd, iters=10)
        print(f"[C] e2e dequant_matmul_int8: {dt*1e3:.2f} ms = "
              f"{flops/dt/1e12:.0f} TOP/s", flush=True)
        # numerics vs fp32 exact
        got = np.asarray(fn(xb, qd, sd), np.float32)
        exact = xf @ (q.astype(np.float32) * s.reshape(1, -1))
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        print(f"[C] max rel err vs exact: {rel:.4f}", flush=True)
    except Exception as e:
        print(f"[C] FAIL {type(e).__name__}: {e}", flush=True)

    # [D] smaller M with best block
    for m2 in (2048, 512):
        x2 = jax.device_put(xf[:m2]).astype(jnp.bfloat16)
        fl2 = 2 * m2 * K * N
        try:
            fn = lambda a, b, c: dequant_matmul_int8(a, b, c, block_m=bb[0],
                                                     block_n=bb[1], block_k=bb[2])
            dt = timeit(fn, x2, qd, sd, iters=10)
            print(f"[D] M{m2}: {dt*1e3:.2f} ms = {fl2/dt/1e12:.0f} TOP/s", flush=True)
            dt = timeit(xla_fused_dequant, x2, qd, sd, iters=10)
            print(f"[D] M{m2} xla fused: {dt*1e3:.2f} ms = {fl2/dt/1e12:.0f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"[D] M{m2}: FAIL {type(e).__name__}", flush=True)

    # [E] dequant_conv amortized: LOOP iterations inside one dispatch
    from smelter_tpu.kernels.dequant_conv import dequant_conv

    LOOP = 50
    for (b, h, cin, cout, k) in [(8, 14, 256, 256, 3), (8, 28, 128, 128, 3),
                                 (4, 64, 64, 64, 3)]:
        xc = rng.standard_normal((b, h, h, cin)).astype(np.float32)
        wfc = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
        qc, sc_ = quantize_array(wfc, axis=0)
        q_hwio = np.ascontiguousarray(qc.transpose(2, 3, 1, 0))
        xd = jax.device_put(xc).astype(jnp.bfloat16)
        qcd = jax.device_put(q_hwio)
        scd = jax.device_put(sc_.reshape(-1).astype(np.float32))
        w_bf = jax.device_put(
            (q_hwio.astype(np.float32) * sc_.reshape(1, 1, 1, -1)).astype(np.float32)
        ).astype(jnp.bfloat16)
        pads = ((k // 2, k // 2),) * 2
        cflops = 2 * b * h * h * cin * cout * k * k * LOOP

        def chain(step):
            @jax.jit
            def run(x0, eps):
                def body(i, c):
                    return x0 + eps * step(c)
                return jax.lax.fori_loop(0, LOOP, body, x0)
            return run

        eps = jax.device_put(np.bfloat16(1e-8)) if hasattr(np, "bfloat16") else None
        eps = jnp.asarray(1e-8, jnp.bfloat16)

        pall = chain(lambda c: dequant_conv(c, qcd, scd, pads=pads))
        xla_c = chain(lambda c: jax.lax.conv_general_dilated(
            c, w_bf, (1, 1), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        xla_dq = chain(lambda c: jax.lax.conv_general_dilated(
            c, (qcd.astype(jnp.float32) * scd).astype(jnp.bfloat16), (1, 1),
            pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        for name, fn in [("pallas dequant_conv", pall),
                         ("xla bf16 conv", xla_c),
                         ("xla fused dequant conv", xla_dq)]:
            try:
                dt = timeit(fn, xd, eps, iters=3, warmup=1)
                print(f"[E] b{b} {h}x{h} c{cin}->{cout} k{k} {name}: "
                      f"{dt/LOOP*1e3:.3f} ms/conv = {cflops/dt/1e12:.1f} TFLOP/s",
                      flush=True)
            except Exception as e:
                print(f"[E] b{b} {h}x{h} {name}: FAIL {type(e).__name__}: {e}",
                      flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
