"""TPU campaign #38: transposed-GEMM conv for small-C_out (ESRGAN).

probe21 pinned ESRGAN at ~25 TF: MXU channel-padding-bound (C_out=32
pads to 128 lanes = 25% util). Every shipped rewrite keeps channels on
the lane dim. The untried formulation puts PIXELS on lanes and C_out on
sublanes: out[o, hw] = W2[o, 9C] x P[9C, hw] — zero lane padding for any
C_out, and ESRGAN's inner res is 128x128 so hw tiles exactly.

Per (C_in, C_out) at b8 128x128 bf16 (loop-amortized):
  A direct NHWC 3x3/s1/p1 conv        (engine lowering, no pack)
  B pack_conv_output 4x4/s2 form      (current default, 9/16 useful util)
  C NCHW patches->einsum('ok,bkp->bop')  (materializes P: 9x HBM copy)
  D NCHW sum-of-9 einsum('oc,bcp->bop')  (9 shifted slices, no big P)
  E native conv NCHW/OIHW/NCHW           (XLA's own layout choice)
All checked for exactness vs A. If C/D only tie A (copy-bound), the win
needs a Pallas kernel that builds the patch tile in VMEM (read input
once with halo): est. ~35us vs A's ~190us at (64,32).
"""

import time

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


LOOP = 30


def chain(step, *ex):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        ysh = jax.eval_shape(step, *args)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(args[0].dtype)
            return step(args[0] + c0 * 0, *args[1:])
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def timeit(fn, *args, iters=6, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from smelter_tpu.passes.mxu_packing import _packed_weights

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    B, H, W = 8, 128, 128
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    dn_nchw = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                         ("NCHW", "OIHW", "NCHW"))

    for cin, cout in [(64, 32), (96, 32), (128, 32), (160, 32), (192, 64)]:
        flops = 2 * B * H * W * 9 * cin * cout
        x_nhwc = jnp.asarray(
            rng.standard_normal((B, H, W, cin)).astype(np.float32), bf)
        w_oihw = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        w_hwio = jnp.asarray(w_oihw.transpose(2, 3, 1, 0), bf)
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        jw = jnp.asarray(w_oihw, bf)

        # A. direct NHWC
        def f_a(x, w=w_hwio):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

        ta = timeit(chain(f_a), x_nhwc)
        ref = np.asarray(f_a(x_nhwc), np.float32)
        print(f"[{cin:3d}->{cout:2d}] A direct   {ta*1e6:8.1f} us "
              f"{flops/ta/1e12:6.1f} TF", flush=True)

        # B. pack 4x4/s2 + D2S
        w4 = _packed_weights(w_oihw)  # (4O, I, 4, 4)
        w4 = jnp.asarray(w4.transpose(2, 3, 1, 0), bf)  # HWIO

        def f_b(x, w=w4, co=cout):
            xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
            y = lax.conv_general_dilated(
                xp, w, (2, 2), "VALID", dimension_numbers=dn)
            n, hh, ww, c4 = y.shape
            y = y.reshape(n, hh, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(n, 2 * hh, 2 * ww, co)

        tb = timeit(chain(f_b), x_nhwc)
        db = float(np.abs(np.asarray(f_b(x_nhwc), np.float32) - ref).max())
        print(f"          B pack44   {tb*1e6:8.1f} us "
              f"{flops/tb/1e12:6.1f} TF   dmax {db:.3e}", flush=True)

        # C. NCHW big patch matrix -> one einsum
        w2 = jnp.asarray(
            w_oihw.transpose(0, 2, 3, 1).reshape(cout, 9 * cin), bf)

        def f_c(x, w=w2):
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
            taps = [xp[:, :, dy:dy + H, dx:dx + W]
                    for dy in range(3) for dx in range(3)]
            p = jnp.concatenate(taps, axis=1).reshape(B, 9 * x.shape[1],
                                                      H * W)
            y = jnp.einsum("ok,bkp->bop", w, p)
            return y.reshape(B, w.shape[0], H, W)

        tc = timeit(chain(f_c), x_nchw)
        outc = np.asarray(f_c(x_nchw), np.float32).transpose(0, 2, 3, 1)
        dc = float(np.abs(outc - ref).max())
        print(f"          C patches  {tc*1e6:8.1f} us "
              f"{flops/tc/1e12:6.1f} TF   dmax {dc:.3e}", flush=True)

        # D. NCHW sum of 9 shifted dots
        def f_d(x, w=jw):
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    sl = xp[:, :, dy:dy + H, dx:dx + W].reshape(
                        B, x.shape[1], H * W)
                    t = jnp.einsum("oc,bcp->bop", w[:, :, dy, dx], sl)
                    acc = t if acc is None else acc + t
            return acc.reshape(B, w.shape[0], H, W)

        td = timeit(chain(f_d), x_nchw)
        outd = np.asarray(f_d(x_nchw), np.float32).transpose(0, 2, 3, 1)
        dd = float(np.abs(outd - ref).max())
        print(f"          D sum9     {td*1e6:8.1f} us "
              f"{flops/td/1e12:6.1f} TF   dmax {dd:.3e}", flush=True)

        # E. native NCHW conv (XLA's layout choice)
        def f_e(x, w=jw):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn_nchw)

        te = timeit(chain(f_e), x_nchw)
        oute = np.asarray(f_e(x_nchw), np.float32).transpose(0, 2, 3, 1)
        de = float(np.abs(oute - ref).max())
        print(f"          E nchwconv {te*1e6:8.1f} us "
              f"{flops/te/1e12:6.1f} TF   dmax {de:.3e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
