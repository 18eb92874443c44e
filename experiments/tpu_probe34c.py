"""TPU campaign #34c: what exactly costs 2.6 ms in the ResNet stem?

probe34b: the S2D rewrite moved the stem cut 2.71 -> 2.62 ms only, so the
conv's lane padding is NOT the bottleneck. Decompose with raw lax ops
(loop-amortized single dispatch per formulation):

  A  conv f32 NCHW input direct (XLA native layout choice)
  B  transpose -> NHWC f32 -> conv
  C  conv int8 NHWC input only (input pre-staged: pure conv cost)
  D  conv int8 NHWC S2D input only (k4 s1 C12)
  E  quantize+transpose f32 NCHW -> int8 NHWC (input processing only)
  F  E fused with S2D -> int8 (N,112,112,12)
  G  int8 NCHW -> transpose NHWC (post-quant transpose only)
"""

import time

import numpy as np

LOOP = 30
B, C, H, W = 128, 3, 224, 224
OC, K = 64, 7


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def chain(step, x):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xx):
        ysh = jax.eval_shape(step, xx)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
            return step(xx + c0 * jnp.zeros((), xx.dtype))
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def timeit(fn, x, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x_nchw = jax.device_put(rng.standard_normal((B, C, H, W))
                            .astype(np.float32))
    x_nhwc = jax.device_put(np.ascontiguousarray(
        np.moveaxis(np.asarray(x_nchw), 1, -1)))
    xi_nhwc = jax.device_put((np.asarray(x_nhwc) * 10).astype(np.int8))
    xi_nchw = jax.device_put((np.asarray(x_nchw) * 10).astype(np.int8))
    w = rng.standard_normal((OC, C, K, K)).astype(np.float32)
    w_hwio = jnp.asarray(np.moveaxis(w, (0, 1), (3, 2)))  # HWIO
    wi_hwio = jnp.asarray((np.moveaxis(w, (0, 1), (3, 2)) * 10)
                          .astype(np.int8))
    # S2D weight (k4 s1 C12): W'[(a2+b)C+c] = w8[c, 2p+a-1, 2q+b-1]
    w2 = np.zeros((OC, 4 * C, 4, 4), np.float32)
    for a in range(2):
        for b_ in range(2):
            for p in range(4):
                u = 2 * p + a - 1
                if not 0 <= u < K:
                    continue
                for q in range(4):
                    v = 2 * q + b_ - 1
                    if not 0 <= v < K:
                        continue
                    w2[:, (a * 2 + b_) * C:(a * 2 + b_ + 1) * C, p, q] = w[:, :, u, v]
    w2i_hwio = jnp.asarray((np.moveaxis(w2, (0, 1), (3, 2)) * 10)
                           .astype(np.int8))
    xi_s2d = np.asarray(xi_nhwc).reshape(B, 112, 2, 112, 2, C)
    xi_s2d = np.ascontiguousarray(
        xi_s2d.transpose(0, 1, 3, 2, 4, 5).reshape(B, 112, 112, 4 * C))
    xi_s2d = jax.device_put(xi_s2d)

    dn_nchw = lax.conv_dimension_numbers((B, C, H, W), (OC, C, K, K),
                                         ("NCHW", "OIHW", "NCHW"))
    dn_nhwc = lax.conv_dimension_numbers((B, H, W, C), (K, K, C, OC),
                                         ("NHWC", "HWIO", "NHWC"))

    def conv_nchw(x):
        return lax.conv_general_dilated(x, jnp.asarray(w), (2, 2),
                                        [(3, 3), (3, 3)],
                                        dimension_numbers=dn_nchw)

    def conv_via_transpose(x):
        xt = jnp.transpose(x, (0, 2, 3, 1))
        return lax.conv_general_dilated(xt, w_hwio, (2, 2),
                                        [(3, 3), (3, 3)],
                                        dimension_numbers=dn_nhwc)

    def conv_i8_nhwc(x):
        return lax.conv_general_dilated(x, wi_hwio, (2, 2),
                                        [(3, 3), (3, 3)],
                                        dimension_numbers=dn_nhwc,
                                        preferred_element_type=jnp.int32)

    def conv_i8_s2d(x):
        return lax.conv_general_dilated(x, w2i_hwio, (1, 1),
                                        [(2, 1), (2, 1)],
                                        dimension_numbers=dn_nhwc,
                                        preferred_element_type=jnp.int32)

    def quant_transpose(x):
        xt = jnp.transpose(x, (0, 2, 3, 1))
        return jnp.clip(jnp.round(xt * 10.0), -128, 127).astype(jnp.int8)

    def quant_s2d(x):
        xt = jnp.transpose(x, (0, 2, 3, 1))
        q = jnp.clip(jnp.round(xt * 10.0), -128, 127).astype(jnp.int8)
        q = q.reshape(B, 112, 2, 112, 2, C)
        return jnp.transpose(q, (0, 1, 3, 2, 4, 5)).reshape(B, 112, 112,
                                                            4 * C)

    def transpose_i8(x):
        return jnp.transpose(x, (0, 2, 3, 1))

    cases = [
        ("A conv f32 NCHW direct   ", conv_nchw, x_nchw),
        ("B transpose+conv f32 NHWC", conv_via_transpose, x_nchw),
        ("C conv int8 NHWC only    ", conv_i8_nhwc, xi_nhwc),
        ("D conv int8 S2D only     ", conv_i8_s2d, xi_s2d),
        ("E quant+transpose only   ", quant_transpose, x_nchw),
        ("F quant+transpose+S2D    ", quant_s2d, x_nchw),
        ("G transpose int8 only    ", transpose_i8, xi_nchw),
    ]
    for name, step, x in cases:
        dt = timeit(chain(step, x), x)
        print(f"[{name}] {dt*1e3:7.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
