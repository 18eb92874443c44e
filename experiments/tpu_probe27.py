"""TPU campaign #27: MatMulNBits (4-bit block-quantized weights) on chip.

The lowering (ops/contrib_ops.py::matmul_nbits) runs a lax.scan over
K-blocks so weights stay int8 in HBM. Here we measure that formulation
against (a) one full-dequant einsum (scales broadcast over blocks, then a
single (M,K)@(K,N) matmul — XLA may fold the dequant as a fused epilogue
or materialize bf16 W), and (b) the plain bf16-weights matmul floor, at
LLM decode/prefill shapes. Decides whether the scan stays or the lowering
switches formulation by M.

All timings loop-amortized (LOOP iterations inside one jitted fori_loop,
scalar-carry dependency) over the ~3.5 ms tunnel dispatch floor.
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


def chain(step, *args):
    """Run step LOOP times in one dispatch with a scalar carry dep."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*xs):
        x0 = xs[0]

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(x0.dtype)
            return step(x0 + c0 * 0, *xs[1:])

        ysh = jax.eval_shape(step, *xs)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))

    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    K, N = 4096, 4096
    BS = 32
    nb = K // BS
    w4 = rng.integers(0, 16, (N, nb, BS)).astype(np.uint8)
    scales = (rng.standard_normal((N, nb)) * 0.02 + 0.1).astype(np.float32)
    w_int = (w4.astype(np.int32) - 8).astype(np.int8)

    w_scan = jax.device_put(jnp.asarray(np.transpose(w_int, (1, 2, 0))))  # (nb,bs,N)
    s_scan = jax.device_put(jnp.asarray(np.transpose(scales, (1, 0))))    # (nb,N)
    w_flat = jax.device_put(jnp.asarray(w_int.reshape(N, K).T))           # (K,N) int8
    s_col = jax.device_put(jnp.asarray(scales))                           # (N,nb)
    w_bf16 = jax.device_put(
        jnp.asarray((w_int.astype(np.float32)
                     * scales[:, :, None]).reshape(N, K).T, jnp.bfloat16))

    def scan_form(a, w, s):
        m = a.shape[0]
        a3 = jnp.swapaxes(a.reshape(m, nb, BS), 0, 1)

        def stp(acc, xs):
            wg, sg, ag = xs
            p = jnp.matmul(ag, wg.astype(ag.dtype),
                           preferred_element_type=jnp.float32)
            return acc + p * sg, None

        y, _ = lax.scan(stp, jnp.zeros((m, N), jnp.float32), (w, s, a3))
        return y.astype(a.dtype)

    def dequant_einsum_form(a, w, s):
        # blockwise partials via one big einsum: (M,nb,BS) x (nb,BS,N)
        m = a.shape[0]
        a3 = a.reshape(m, nb, BS)
        w3 = w  # (nb, BS, N)
        p = jnp.einsum("mgb,gbn->mgn", a3, w3.astype(a.dtype),
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("mgn,gn->mn", p, s)
        return y.astype(a.dtype)

    def fold_then_matmul(a, w, s):
        # materialize dequant W in-graph ((K,N) bf16 from int8*scale) —
        # XLA may fuse or materialize; measures that choice
        wd = (w.astype(jnp.float32).reshape(K // BS, BS, N)
              * s.T.reshape(K // BS, 1, N)).reshape(K, N).astype(a.dtype)
        return jnp.matmul(a, wd, preferred_element_type=jnp.float32).astype(a.dtype)

    def bf16_floor(a, w):
        return jnp.matmul(a, w, preferred_element_type=jnp.float32).astype(a.dtype)

    for M in (8, 512, 8192):
        a = jax.device_put(jnp.asarray(
            rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16))
        flops = 2 * M * K * N * LOOP
        r = {}
        t = timeit(chain(lambda x: scan_form(x, w_scan, s_scan), a), a)
        r["scan"] = t
        t = timeit(chain(lambda x: dequant_einsum_form(
            x, jnp.asarray(np.transpose(w_int, (1, 2, 0))), s_scan), a), a)
        r["einsum"] = t
        t = timeit(chain(lambda x: fold_then_matmul(x, w_flat, s_col), a), a)
        r["fold"] = t
        t = timeit(chain(lambda x: bf16_floor(x, w_bf16), a), a)
        r["bf16"] = t
        for k, t in r.items():
            print(f"[M={M}] {k:7s}: {t*1e3:8.3f} ms  "
                  f"{flops/t/1e12:7.2f} TF/s")
    print("DONE")


if __name__ == "__main__":
    main()
