"""TPU campaign #25: S2D formulation of the output-packed conv.

probe23/24 showed pack_conv_output's Conv4x4/s2 form wins only +9% e2e
against a 2.25x padded-MAC theory — the strided conv runs at ~30% MXU
util (16.6 TF effective = 59 TF padded) vs 53% for plain 3x3/s1.

Candidate exact rewrite with ZERO channel padding: pad input by 1
(top/left/bottom/right), SpaceToDepth(2) -> [4C_in, (H+2)/2, (W+2)/2],
then Conv2x2/s1/VALID with weights W2[(e,o), (d,c), a, b] =
W4[(e,o), c, 2a+d_i, 2b+d_j] -> packed output [4C_out, H/2, W/2], then
DepthToSpace(DCR). K = 16*C_in (1024+ — tiles exactly), N = 4*C_out
(=128 at C_out=32): a perfectly-shaped stride-1 GEMM.

[A] per-shape: direct 3x3 vs pack4x4s2 vs pad+S2D+conv2x2, TF + exactness.
"""

import time

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=6, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


LOOP = 30


def chain(step, x):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xx):
        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
            return step(xx + c0 * 0)
        ysh = jax.eval_shape(step, xx)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from smelter_tpu.passes.mxu_packing import _packed_weights

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def s2d_nhwc(x):  # parity-major (di, dj, c), matching DCR interleave
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2,
                                                     4 * c)

    def d2s_out(y, co):  # packed (e-major) channels -> fine spatial
        n, hh, ww, c4 = y.shape
        y = y.reshape(n, hh, ww, 2, 2, co)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, 2 * hh, 2 * ww, co)

    for cin, cout in [(64, 32), (96, 32), (128, 32), (160, 32), (192, 64),
                      (64, 64)]:
        n, h = 8, 128
        x = jax.device_put(rng.standard_normal((n, h, h, cin)).astype(bf))
        w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * .05
        w_hwio = jax.device_put(jnp.asarray(w.transpose(2, 3, 1, 0), bf))
        w4 = _packed_weights(w)  # (4O, C, 4, 4), e-major output blocks
        w4_hwio = jax.device_put(jnp.asarray(w4.transpose(2, 3, 1, 0), bf))
        # W2[(e,o), (di,dj,c), a, b] = W4[(e,o), c, 2a+di, 2b+dj]
        w2 = np.zeros((4 * cout, 4 * cin, 2, 2), np.float32)
        for di in (0, 1):
            for dj in (0, 1):
                blk = (2 * di + dj) * cin
                for a in (0, 1):
                    for b in (0, 1):
                        w2[:, blk:blk + cin, a, b] = w4[:, :, 2 * a + di,
                                                        2 * b + dj]
        w2_hwio = jax.device_put(jnp.asarray(w2.transpose(2, 3, 1, 0), bf))

        def direct(xx, ww=w_hwio):
            return lax.conv_general_dilated(xx, ww, (1, 1), "SAME",
                                            dimension_numbers=dn)

        def pack44(xx, ww=w4_hwio, co=cout):
            y = lax.conv_general_dilated(xx, ww, (2, 2), ((1, 1), (1, 1)),
                                         dimension_numbers=dn)
            return d2s_out(y, co)

        def pack_s2d(xx, ww=w2_hwio, co=cout):
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            z = s2d_nhwc(xp)
            y = lax.conv_general_dilated(z, ww, (1, 1), "VALID",
                                         dimension_numbers=dn)
            return d2s_out(y, co)

        # packed-chain form: input already packed, output stays packed
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z_dev = jax.device_put(np.asarray(s2d_nhwc(xp)))

        def core_s2d(zz, ww=w2_hwio):
            return lax.conv_general_dilated(zz, ww, (1, 1), "VALID",
                                            dimension_numbers=dn)

        fl = 2 * n * h * h * 9 * cin * cout
        td = timeit(chain(direct, x), x)
        t4 = timeit(chain(pack44, x), x)
        ts = timeit(chain(pack_s2d, x), x)
        tc = timeit(chain(core_s2d, z_dev), z_dev)
        ref = np.asarray(direct(x).astype(jnp.float32))
        e4 = float(np.abs(np.asarray(pack44(x).astype(jnp.float32))
                          - ref).max())
        es = float(np.abs(np.asarray(pack_s2d(x).astype(jnp.float32))
                          - ref).max())
        print(f"[A] {cin}->{cout}: direct {fl/(td/LOOP)/1e12:.1f} TF | "
              f"pack44 {fl/(t4/LOOP)/1e12:.1f} TF ({td/t4:.2f}x) | "
              f"s2d {fl/(ts/LOOP)/1e12:.1f} TF ({td/ts:.2f}x) | "
              f"s2d-core {fl/(tc/LOOP)/1e12:.1f} TF ({td/tc:.2f}x) "
              f"d4={e4:.1e} ds={es:.1e}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
