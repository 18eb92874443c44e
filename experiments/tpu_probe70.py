"""TPU probe #70: int4 kernel block-policy sweep at decode shapes.

probe68 measured the int4 kernel at block_n=512 barely beating bf16
(21.7 us at M8/K4096/N4096 = 386 GB/s of packed stream): a (group, 512)
block of the row-major (K/2, N) weight DMAs as `group` strided 512-byte
chunks. This sweeps block_n (512 .. full rows) and M, chained-loop
K-differenced with a WIDE spread so the delta clears the RPC noise that
polluted probe68's 1-2 us rows.
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
    K, N, G = 4096, 4096, 128

    wf = (rng.standard_normal((K, N)) / np.sqrt(K)).astype(np.float32)
    q4g_np, s4g_np = quantize_array_blocked(wf, 0, G, 7)
    w4 = np.asarray(q4g_np).astype(ml_dtypes.int4).astype(np.int8)
    pk = jax.device_put(pack_int4_half(w4))
    s4g = jax.device_put(s4g_np)
    w_bf = jax.device_put(wf).astype(jnp.bfloat16)
    s8_np = np.abs(wf).max(0) / 127.0
    q8 = jax.device_put(np.clip(np.round(wf / s8_np), -127, 127)
                        .astype(np.int8))
    s8 = jax.device_put(s8_np.astype(np.float32))

    def chained(f, reps):
        @jax.jit
        def run(p, xx):
            def body(_, carry):
                c0 = carry[(0, 0)].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                return f(p, xx + zero.astype(xx.dtype))[:, :xx.shape[1]]
            m = xx.shape[0]
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((m, K), jnp.float32))
        return run

    def timed(run, *a):
        sync(run(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    params = {"pk": pk, "s": s4g, "w_bf": w_bf, "q8": q8, "s8": s8}

    for M in (1, 8, 16):
        x = jax.device_put(
            rng.standard_normal((M, K)).astype(np.float32)
        ).astype(jnp.bfloat16)
        arms = [
            ("bf16", lambda p, xx: jnp.dot(
                xx, p["w_bf"], preferred_element_type=jnp.float32)),
            ("int8-pc", lambda p, xx: jnp.dot(
                xx, p["q8"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * p["s8"][None, :]),
        ]
        for bn in (512, 1024, 2048, 4096):
            arms.append((f"i4-bn{bn}", lambda p, xx, bn=bn: int4_matmul(
                xx, p["pk"], p["s"], group=G, block_n=bn,
                interpret=False)))
        # wide K-spread: 64 vs 512 reps so the delta is ~10-20 ms
        k_lo, k_hi = 64, 512
        print(f"\nM={M}:", flush=True)
        wbytes = {"bf16": 2.0, "int8-pc": 1.0}
        for name, f in arms:
            rlo, rhi = chained(f, k_lo), chained(f, k_hi)
            best = float("inf")
            for _ in range(3):
                t = (timed(rhi, params, x) - timed(rlo, params, x)) \
                    / (k_hi - k_lo)
                best = min(best, t)
            wb = wbytes.get(name, 0.5)
            gbs = K * N * wb / best / 1e9
            print(f"  {name:10s} {best*1e6:8.2f} us   weight-stream "
                  f"{gbs:6.1f} GB/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
