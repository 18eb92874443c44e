"""TPU campaign #23: validate pack_conv_output (2x2 output-pixel packing
for low-C_out convs) and settle split_concat_conv gating.

Probe22: ESRGAN bf16 full 173 img/s vs full-without-split 213 — the split
makes C_in=32/64 convs whose channel padding wastes the MXU. probe21 cost
model: ESRGAN runs at ~25 TF = 198/8 = pad(64)*pad(32) waste.

- [A] conv3x3 64->32 @8x128^2 and 192->32: direct vs packed form.
- [B] ESRGAN b8 128^2 e2e: nosplit / nosplit+pack / +int8w.
- [C] U-Net b16 256^2 e2e: full / nosplit / nosplit+pack (+int8w best).
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
    import smelter_tpu as st
    from smelter_tpu.passes.pass_manager import DEFAULT_PIPELINE, run_passes
    from smelter_tpu.passes.mxu_packing import _packed_weights
    from smelter_tpu.models import esrgan, unet

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    # ---- [A] microbench: direct vs packed
    for cin, cout in [(64, 32), (192, 32), (64, 64), (192, 64)]:
        n, h = 8, 128
        x = jax.device_put(rng.standard_normal((n, h, h, cin)).astype(bf))
        w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * .02
        w_hwio = jax.device_put(jnp.asarray(w.transpose(2, 3, 1, 0), bf))
        w4 = _packed_weights(w)
        w4_hwio = jax.device_put(jnp.asarray(w4.transpose(2, 3, 1, 0), bf))

        def direct(xx, ww=w_hwio):
            return lax.conv_general_dilated(xx, ww, (1, 1), "SAME",
                                            dimension_numbers=dn)

        def packed(xx, ww=w4_hwio, co=cout):
            y = lax.conv_general_dilated(xx, ww, (2, 2),
                                         ((1, 1), (1, 1)),
                                         dimension_numbers=dn)
            nn_, hh, www, c4 = y.shape
            y = y.reshape(nn_, hh, www, 2, 2, co)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(nn_, 2 * hh, 2 * www, co)

        fl = 2 * n * h * h * 9 * cin * cout
        td = timeit(chain(direct, x), x)
        tp = timeit(chain(packed, x), x)
        e = float(jnp.max(jnp.abs(direct(x).astype(jnp.float32)
                                  - packed(x).astype(jnp.float32))))
        print(f"[A] {cin}->{cout}: direct {fl/(td/LOOP)/1e12:.1f} TF, "
              f"packed {fl/(tp/LOOP)/1e12:.1f} TF ({td/tp:.2f}x) d={e:.1e}",
              flush=True)

    # ---- [B]/[C] end-to-end
    def pipes():
        nosplit = [p for p in DEFAULT_PIPELINE if p != "split_concat_conv"]
        i = nosplit.index("subpixel_upsample_conv") + 1
        packed = nosplit[:i] + ["pack_conv_output"] + nosplit[i:]
        return {"full": list(DEFAULT_PIPELINE), "nosplit": nosplit,
                "nosplit+pack": packed}

    for name, build, batch, size, variants in [
            ("esrgan b8 128^2", esrgan.build, 8, 128,
             ["nosplit", "nosplit+pack"]),
            ("unet b16 256^2", unet.build, 16, 256,
             ["full", "nosplit", "nosplit+pack"])]:
        g0, _tm, shape = build(batch=batch, image_size=size)
        blob = st.export_model(g0)
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        cfg = st.Config(compute_dtype="bfloat16")
        for v in variants:
            g = st.import_model(blob)
            n1 = run_passes(g, pipes()[v])
            run_passes(g, ["layout_nhwc", "dce"])
            m = st.CompiledModel(g, cfg)
            dt = timeit(m._fn, m.params, x)
            print(f"[E] {name} bf16 {v}: {batch/dt:.1f} img/s", flush=True)
            del m
        # int8w with the best structural pipeline (nosplit+pack)
        g = st.import_model(blob)
        from smelter_tpu.quant import quantize_weights
        run_passes(g, pipes()["nosplit+pack"])
        quantize_weights(g, mode="int8")
        run_passes(g, ["layout_nhwc"])
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        m = st.CompiledModel(g, cfg)
        dt = timeit(m._fn, m.params, x)
        print(f"[E] {name} int8w nosplit+pack: {batch/dt:.1f} img/s",
              flush=True)
        del m, x

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
