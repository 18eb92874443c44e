"""TPU probe #68: packed-int4 Pallas kernel vs bf16/int8 at decode GEMM.

probe67 established: decode GEMM (M=8, K=N=4096) is weight-HBM-bound
(bf16 30.6 us, int8-pc 20.9 us = 804 GB/s ~ roofline) and XLA cannot
fuse a nibble unpack (packed composite ~10x slower). This measures the
kernels/int4_matmul.py Pallas kernel (DMA packed int8 -> two arithmetic
shifts -> per-group scaled partial dots): target ~8.4 MB/step -> ~10 us
if it reaches the same HBM efficiency as XLA's int8 form.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from smelter_tpu.kernels.int4_matmul import int4_matmul, pack_int4_half
    from smelter_tpu.quant.weight_quant import quantize_array_blocked

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    M, K, N, G = 8, 4096, 4096, 128

    x_np = rng.standard_normal((M, K)).astype(np.float32)
    x = jax.device_put(x_np).astype(jnp.bfloat16)
    wf = (rng.standard_normal((K, N)) / np.sqrt(K)).astype(np.float32)
    w_bf = jax.device_put(wf).astype(jnp.bfloat16)
    s8_np = np.abs(wf).max(0) / 127.0
    q8 = jax.device_put(np.clip(np.round(wf / s8_np), -127, 127)
                        .astype(np.int8))
    s8 = jax.device_put(s8_np.astype(np.float32))
    q4g_np, s4g_np = quantize_array_blocked(wf, 0, G, 7)
    w4 = np.asarray(q4g_np).astype(ml_dtypes.int4).astype(np.int8)
    pk = jax.device_put(pack_int4_half(w4))
    s4g = jax.device_put(s4g_np)

    params = {"w_bf": w_bf, "q8": q8, "s8": s8, "pk": pk, "s4g": s4g}

    def arm_bf16(p, xx):
        return jnp.dot(xx, p["w_bf"], preferred_element_type=jnp.float32)

    def arm_int8_out(p, xx):
        y = jnp.dot(xx, p["q8"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y * p["s8"][None, :]

    def arm_int4_kernel(p, xx):
        return int4_matmul(xx, p["pk"], p["s4g"], group=G,
                           interpret=False)

    arms = [("bf16", arm_bf16), ("int8-pc/out", arm_int8_out),
            ("int4-pallas", arm_int4_kernel)]

    # numerics on-chip vs host reference
    rep = np.repeat(s4g_np, G, axis=0)
    ref4 = (x_np.astype(ml_dtypes.bfloat16).astype(np.float32)
            @ (w4.astype(np.float32) * rep))
    got4 = np.asarray(jax.jit(arm_int4_kernel)(params, x))
    rel = np.abs(got4 - ref4).max() / np.abs(ref4).max()
    print(f"  int4-pallas on-chip rel_err vs dequant ref: {rel:.4f}",
          flush=True)

    def chained(f, k):
        @jax.jit
        def run(p, xx):
            def body(_, carry):
                c0 = carry[(0, 0)].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                return f(p, xx + zero.astype(xx.dtype))[:, :K]
            return jax.lax.fori_loop(0, k, body,
                                     jnp.zeros((M, K), jnp.float32))
        return run

    def timed(run, *a):
        sync(run(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"\nM={M} K={K} N={N} G={G}; per-step chip time", flush=True)
    k_lo, k_hi = 16, 80
    runs = {name: (chained(f, k_lo), chained(f, k_hi))
            for name, f in arms}
    best = {name: float("inf") for name, _ in arms}
    for _ in range(4):
        for name, (rlo, rhi) in runs.items():
            t = (timed(rhi, params, x) - timed(rlo, params, x)) \
                / (k_hi - k_lo)
            best[name] = min(best[name], t)
    bf = best["bf16"]
    wbytes = {"bf16": 2.0, "int8-pc/out": 1.0, "int4-pallas": 0.5}
    for name, _ in arms:
        t = best[name]
        gbs = K * N * wbytes[name] / t / 1e9
        print(f"  {name:14s} {t * 1e6:8.1f} us/step   weight-read "
              f"{gbs:6.1f} GB/s   vs bf16 {bf / t:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
