"""TPU campaign #18: U-Net / ESRGAN decomposition (VERDICT r1 item 5).

The two weakest CNN configs (U-Net 1.66x, ESRGAN 1.20x). SURVEY §7 names
upsample/concat Pallas kernels; before writing them, attribute the time:

- [A] end-to-end U-Net b16 / ESRGAN b8 reconfirmation (naive fp32 vs
  int8w best path).
- [B] components at U-Net decoder shapes (NHWC, bf16, loop-amortized):
  nearest-2x upsample, channel concat, 3x3 conv, and the fused
  upsample->concat->conv chain vs sum of parts.
- [C] ESRGAN-specific: large-activation 3x3 convs at 64x64 nf=64 and the
  nearest-2x + conv upsampler tail at 128/256.
Each memory-bound op is reported as achieved GB/s vs the 819 GB/s v5e
roofline; kernels are only justified if XLA leaves >20% (VERDICT #5).
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


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import esrgan, unet

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # [A] end-to-end
    for name, build, batch, size in [("unet", unet.build, 16, 256),
                                     ("esrgan", esrgan.build, 8, 128)]:
        g, _tm, shape = build(batch=batch, image_size=size)
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        base = st.CompiledModel(st.import_model(st.export_model(g)),
                                st.Config(compute_dtype="float32",
                                          fused_layernorm=False))
        dt = timeit(base._fn, base.params, x, iters=4)
        bips = batch / dt
        print(f"[A] {name} naive fp32: {bips:.1f} img/s", flush=True)
        del base
        m = st.compile(st.import_model(st.export_model(g)),
                       st.Config(compute_dtype="bfloat16"), quant="int8")
        dt = timeit(m._fn, m.params, x, iters=6)
        print(f"[A] {name} int8w: {batch/dt:.1f} img/s ({batch/dt/bips:.2f}x)",
              flush=True)
        del m, x

    # [B] U-Net decoder components (NHWC bf16)
    def chain(step):
        @jax.jit
        def run(xx, zero):
            def body(i, carry):
                c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
                return step(xx + c0 * zero.astype(xx.dtype))
            ysh = jax.eval_shape(step, xx)
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    z = jax.device_put(np.zeros((), np.float32)).astype(bf)
    for (b, hw, c) in [(16, 32, 256), (16, 64, 128), (16, 128, 64)]:
        x = jax.device_put(rng.standard_normal((b, hw, hw, c)).astype(np.float32)).astype(bf)
        skip = jax.device_put(rng.standard_normal((b, hw * 2, hw * 2, c // 2)).astype(np.float32)).astype(bf)
        wc = jax.device_put(rng.standard_normal((3, 3, c, c // 2)).astype(np.float32) * 0.05).astype(bf)
        w2 = jax.device_put(rng.standard_normal((3, 3, c + c // 2, c // 2)).astype(np.float32) * 0.05).astype(bf)

        def up(t):
            bb, h, w, cc = t.shape
            return jnp.broadcast_to(t[:, :, None, :, None, :],
                                    (bb, h, 2, w, 2, cc)).reshape(bb, 2 * h, 2 * w, cc)

        def cat(t):
            return jnp.concatenate([up(t), skip], axis=-1)

        def conv_only(t):
            return jax.lax.conv_general_dilated(
                t, wc, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(bf)

        def chain_all(t):
            y = jnp.concatenate([up(t), skip], axis=-1)
            return jax.lax.conv_general_dilated(
                y, w2, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(bf)

        n_bytes_up = (x.size + x.size * 4) * 2  # read + 4x write (bf16)
        try:
            dt = timeit(chain(up), x, z) / LOOP
            print(f"[B] {b}x{hw}^2x{c} upsample2x: {dt*1e3:.3f} ms "
                  f"({n_bytes_up/dt/1e9:.0f} GB/s)", flush=True)
            dt = timeit(chain(cat), x, z) / LOOP
            nb = (x.size * 4 + skip.size) * 2 + (x.size * 4 + skip.size) * 2
            print(f"[B] {b}x{hw}^2x{c} up+concat: {dt*1e3:.3f} ms "
                  f"({nb/dt/1e9:.0f} GB/s)", flush=True)
            dt = timeit(chain(conv_only), x, z) / LOOP
            fl = 2 * b * hw * hw * c * (c // 2) * 9
            print(f"[B] {b}x{hw}^2x{c} conv3x3: {dt*1e3:.3f} ms "
                  f"({fl/dt/1e12:.1f} TF)", flush=True)
            dt = timeit(chain(chain_all), x, z) / LOOP
            fl = 2 * b * (hw * 2) ** 2 * (c + c // 2) * (c // 2) * 9
            print(f"[B] {b}x{hw}^2x{c} up+cat+conv: {dt*1e3:.3f} ms "
                  f"({fl/dt/1e12:.1f} TF)", flush=True)
        except Exception as e:
            print(f"[B] {b}x{hw}^2x{c}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # [C] ESRGAN hot shapes
    for (b, hw, cin, cout) in [(8, 128, 64, 64), (8, 256, 64, 64),
                               (8, 512, 64, 3)]:
        x = jax.device_put(rng.standard_normal((b, hw, hw, cin)).astype(np.float32)).astype(bf)
        wc = jax.device_put(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05).astype(bf)

        def conv_only(t, wc=wc):
            return jax.lax.conv_general_dilated(
                t, wc, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(bf)

        try:
            dt = timeit(chain(conv_only), x, z) / LOOP
            fl = 2 * b * hw * hw * cin * cout * 9
            nb = (x.size + b * hw * hw * cout) * 2 + wc.size * 2
            print(f"[C] esrgan conv {b}x{hw}^2 {cin}->{cout}: {dt*1e3:.3f} ms "
                  f"= {fl/dt/1e12:.1f} TF ({nb/dt/1e9:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"[C] esrgan conv {hw}: FAIL {type(e).__name__}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
