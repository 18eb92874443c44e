"""TPU campaign #20: settle the U-Net/ESRGAN decoder strategy.

Probe19 showed: concat-conv splitting 2.52x (keep); subpixel decomposition
mixed (1.17x at 256ch but 0.71x at 128^2x64 — the full-res interleave
transpose eats the FLOP savings). Meanwhile resize_utils now contracts a
dense (out,in) interpolation matrix on the MXU instead of gathering.

- [A] up2-nearest + conv3x3 three ways: broadcast-up (old naive),
  matmul-up (the new resize_utils form), subpixel. Decides whether the
  subpixel pass stays, gets channel-gated, or dies.
- [B] standalone bilinear align-corners 2x: gather-lerp vs matmul form at
  U-Net decoder shapes (the remaining non-conv resize cost).
- [C] end-to-end U-Net b16 256^2 / ESRGAN b8 128^2 through the real
  pipeline at HEAD (split pass + matmul resize): naive fp32 vs
  st.compile int8w. The new multipliers for BENCHMARKS.md.
"""

import time

import numpy as np

LOOP = 30


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


def chain(step, *xs):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(args[0].dtype)
            return step(args[0] + c0 * 0, *args[1:])
        ysh = jax.eval_shape(step, *args)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import smelter_tpu as st
    from smelter_tpu.ops.resize_utils import resize_spatial

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, pad="SAME"):
        return lax.conv_general_dilated(x, w, (1, 1), pad,
                                        dimension_numbers=dn)

    def up2_bcast(x):
        n, h, w_, c = x.shape
        return jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, 2, w_, 2, c)
        ).reshape(n, 2 * h, 2 * w_, c)

    def up2_mm(x):
        # matmul path in resize_utils (nearest, asymmetric/floor)
        return resize_spatial(x, (2 * x.shape[1], 2 * x.shape[2]),
                              mode="nearest", coord_mode="asymmetric",
                              nearest_mode="floor", spatial_start=1)

    def report(tag, dt, flops=None, gbytes=None):
        per = dt / LOOP
        msg = f"[{tag}] {per*1e3:.3f} ms"
        if flops:
            msg += f" = {flops/per/1e12:.1f} TF"
        if gbytes:
            msg += f" ({gbytes/per/1e9:.0f} GB/s)"
        print(msg, flush=True)
        return per

    def sub_kernels(ww):
        ks = {}
        for di in (0, 1):
            for dj in (0, 1):
                k = jnp.zeros((2, 2) + ww.shape[2:], ww.dtype)
                for p in range(3):
                    u = (di + p - 1) // 2 - (di - 1)
                    for q in range(3):
                        v = (dj + q - 1) // 2 - (dj - 1)
                        k = k.at[u, v].add(ww[p, q])
                ks[(di, dj)] = k
        return ks

    # ---- [A] three forms of nearest-up2 + conv3x3
    for (n, h, c, cout) in [(16, 32, 256, 128), (16, 64, 128, 64),
                            (16, 128, 64, 64), (8, 64, 64, 64)]:
        x = jax.device_put(rng.standard_normal((n, h, h, c)).astype(bf))
        w = jax.device_put(
            (rng.standard_normal((3, 3, c, cout)).astype(np.float32) * .02
             ).astype(bf))
        ks = sub_kernels(w)

        def a_bcast(xx, ww=w):
            return conv(up2_bcast(xx), ww)

        def a_mm(xx, ww=w):
            return conv(up2_mm(xx), ww)

        def a_sub(xx, kk=ks):
            outs = {}
            for (di, dj), k in kk.items():
                outs[(di, dj)] = lax.conv_general_dilated(
                    xx, k, (1, 1), ((1 - di, di), (1 - dj, dj)),
                    dimension_numbers=dn)
            n_, hh, ww_, co = outs[(0, 0)].shape
            s = jnp.stack([outs[(0, 0)], outs[(0, 1)],
                           outs[(1, 0)], outs[(1, 1)]], axis=-2)
            s = s.reshape(n_, hh, ww_, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
            return s.reshape(n_, 2 * hh, 2 * ww_, co)

        fl = 2 * n * (2 * h) ** 2 * 9 * c * cout
        tb = report(f"A {n}x{h}^2 {c}->{cout} bcast ",
                    timeit(chain(a_bcast, x), x), flops=fl)
        tm_ = report(f"A {n}x{h}^2 {c}->{cout} mm-up ",
                     timeit(chain(a_mm, x), x), flops=fl)
        tsb = report(f"A {n}x{h}^2 {c}->{cout} subpix",
                     timeit(chain(a_sub, x), x), flops=fl)
        y0, y1, y2 = a_bcast(x), a_mm(x), a_sub(x)
        e1 = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
        e2 = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y2.astype(jnp.float32))))
        print(f"[A] {n}x{h}^2 {c}->{cout}: mm {tb/tm_:.2f}x sub {tb/tsb:.2f}x"
              f"  d_mm={e1:.1e} d_sub={e2:.1e}", flush=True)

    # ---- [B] standalone bilinear align-corners 2x: gather vs matmul
    import smelter_tpu.ops.resize_utils as ru
    for (n, h, c) in [(16, 32, 256), (16, 64, 128), (16, 128, 64)]:
        x = jax.device_put(rng.standard_normal((n, h, h, c)).astype(bf))

        def bl(xx, hh=h):
            return resize_spatial(xx, (2 * hh, 2 * hh), mode="linear",
                                  coord_mode="align_corners",
                                  spatial_start=1)

        saved = ru._MATMUL_MAX_IN
        gb = x.nbytes * 5
        ru._MATMUL_MAX_IN = 0  # force gather path
        tg = report(f"B bilin {n}x{h}^2x{c} gather",
                    timeit(chain(bl, x), x), gbytes=gb)
        ru._MATMUL_MAX_IN = saved
        tm_ = report(f"B bilin {n}x{h}^2x{c} matmul",
                     timeit(chain(bl, x), x), gbytes=gb)
        print(f"[B] {n}x{h}^2x{c}: matmul {tg/tm_:.2f}x", flush=True)

    # ---- [C] end-to-end at HEAD
    from smelter_tpu.models import esrgan, unet
    for name, build, batch, size in [("unet", unet.build, 16, 256),
                                     ("esrgan", esrgan.build, 8, 128)]:
        g, _tm, shape = build(batch=batch, image_size=size)
        x = jax.device_put(
            rng.standard_normal(shape).astype(np.float32))
        base = st.CompiledModel(
            st.import_model(st.export_model(g)),
            st.Config(compute_dtype="float32", fused_layernorm=False))
        dt = timeit(base._fn, base.params, x, iters=4)
        bips = batch / dt
        print(f"[C] {name} naive fp32: {bips:.1f} img/s", flush=True)
        del base
        m = st.compile(st.import_model(st.export_model(g)),
                       st.Config(compute_dtype="bfloat16"), quant="int8")
        dt = timeit(m._fn, m.params, x, iters=6)
        print(f"[C] {name} int8w: {batch/dt:.1f} img/s "
              f"({batch/dt/bips:.2f}x)", flush=True)
        del m, x

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
