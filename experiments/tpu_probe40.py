"""TPU campaign #40: pixel-major direct-conv kernels vs XLA (ESRGAN).

probe38 showed every channels-on-lanes form of the ESRGAN dense-block
convs tops out at 12-29 TF (C_out=32 pads to 128 lanes). kernels/
pixel_conv.py transposes the GEMM (pixels on lanes). Measure both
variants (rowdot / patch, rows sweep) against XLA direct and pack44 at
the five dense-block shapes (b8 128x128) and the two upsample-tail
shapes (64->64 at 256^2 and 512^2), bf16, loop-amortized; numerics
checked vs the XLA reference each time."""

import time

import numpy as np

LOOP = 30


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def chain(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        ysh = jax.eval_shape(step, x)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(x.dtype)
            return step(x + c0 * 0)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def timeit(fn, x, iters=6, warmup=1):
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

    from smelter_tpu.kernels.pixel_conv import (
        pixel_conv_blockdot, pixel_conv_patch, pixel_conv_rowdot)
    from smelter_tpu.passes.mxu_packing import _packed_weights

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    ALPHA = 0.2

    shapes = [(8, 128, 64, 32), (8, 128, 96, 32), (8, 128, 128, 32),
              (8, 128, 160, 32), (8, 128, 192, 64),
              (8, 256, 64, 64), (4, 512, 64, 64)]
    for b, hw, cin, cout in shapes:
        h = w = hw
        flops = 2 * b * h * w * 9 * cin * cout
        x = rng.standard_normal((b, cin, h, w)).astype(np.float32)
        wt = (rng.standard_normal((cout, cin, 3, 3)) / (3 * np.sqrt(cin))
              ).astype(np.float32)
        bias = rng.standard_normal((cout,)).astype(np.float32)
        jw, jb = jnp.asarray(wt, bf), jnp.asarray(bias, bf)
        w_hwio = jnp.asarray(wt.transpose(2, 3, 1, 0), bf)
        x_nhwc = jax.device_put(jnp.asarray(x.transpose(0, 2, 3, 1), bf))
        x_nhcw = jax.device_put(jnp.asarray(x.transpose(0, 2, 1, 3), bf))
        x_flat = jax.device_put(jnp.asarray(x.reshape(b, cin, h * w), bf))

        def f_ref(xx, wm=w_hwio):
            y = lax.conv_general_dilated(
                xx, wm, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            y = y + jb.reshape(1, 1, 1, -1)
            return jnp.where(y >= 0, y, bf(ALPHA) * y)

        ta = timeit(chain(f_ref), x_nhwc)
        ref = np.asarray(f_ref(x_nhwc), np.float32)
        print(f"[{cin:3d}->{cout:2d} @{hw}] A direct+act {ta*1e6:8.1f} us "
              f"{flops/ta/1e12:6.1f} TF", flush=True)

        if cout <= 64 and hw == 128:
            w4 = jnp.asarray(_packed_weights(wt).transpose(2, 3, 1, 0), bf)

            def f_b(xx, co=cout):
                xp = jnp.pad(xx, ((0, 0), (1, 2), (1, 2), (0, 0)))
                y = lax.conv_general_dilated(
                    xp, w4, (2, 2), "VALID", dimension_numbers=dn)
                n, hh, ww, _ = y.shape
                y = (y.reshape(n, hh, ww, 2, 2, co)
                     .transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hh,
                                                          2 * ww, co))
                y = y + jb.reshape(1, 1, 1, -1)
                return jnp.where(y >= 0, y, bf(ALPHA) * y)

            tb = timeit(chain(f_b), x_nhwc)
            print(f"            B pack44+act {tb*1e6:8.1f} us "
                  f"{flops/tb/1e12:6.1f} TF", flush=True)

        for rows in (8, 16):
            if (rows + 2) * cin * w * 2 > 6 * 2**20:
                continue
            try:
                def f_r(xx, r=rows):
                    return pixel_conv_rowdot(xx, jw, jb, alpha=ALPHA, rows=r)

                tr = timeit(chain(f_r), x_nhcw)
                got = np.asarray(f_r(x_nhcw), np.float32).transpose(
                    0, 1, 3, 2)
                dr = float(np.abs(got - ref).max())
                print(f"            rowdot r{rows:<3d} {tr*1e6:8.1f} us "
                      f"{flops/tr/1e12:6.1f} TF   dmax {dr:.3e}",
                      flush=True)
            except Exception as e:
                print(f"            rowdot r{rows}: {type(e).__name__}: "
                      f"{str(e)[:400]}", flush=True)

        for rows in (8, 16, 32):
            if ((rows + 2) * cin * w + 3 * cin * rows * w) * 2 > 8 * 2**20:
                continue
            try:
                def f_k(xx, r=rows):
                    return pixel_conv_blockdot(xx, jw, jb, alpha=ALPHA,
                                               rows=r)

                tk = timeit(chain(f_k), x_nhcw)
                got = np.asarray(f_k(x_nhcw), np.float32).transpose(
                    0, 1, 3, 2)
                dk = float(np.abs(got - ref).max())
                print(f"            blockdot r{rows:<2d} {tk*1e6:8.1f} us "
                      f"{flops/tk/1e12:6.1f} TF   dmax {dk:.3e}",
                      flush=True)
            except Exception as e:
                print(f"            blockdot r{rows}: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        for rows in (4,):
            if 9 * cin * rows * w * 2 + (rows + 2) * cin * w * 2 > 8 * 2**20:
                continue
            try:
                def f_p(xx, r=rows):
                    return pixel_conv_patch(xx, jw, jb, width=w,
                                            alpha=ALPHA, rows=r)

                tp = timeit(chain(f_p), x_flat)
                got = np.asarray(f_p(x_flat), np.float32).reshape(
                    b, cout, h, w).transpose(0, 2, 3, 1)
                dp = float(np.abs(got - ref).max())
                print(f"            patch  r{rows:<3d} {tp*1e6:8.1f} us "
                      f"{flops/tp/1e12:6.1f} TF   dmax {dp:.3e}",
                      flush=True)
            except Exception as e:
                print(f"            patch r{rows}: {type(e).__name__}: "
                      f"{str(e)[:400]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
