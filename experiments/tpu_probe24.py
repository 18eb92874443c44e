"""TPU campaign #24: decide pack_conv_output's default with the C_out<=32
gate (probe23 measured C_out=64 packing regressing 0.69-0.92x isolated and
the <=64-gated pass losing end-to-end; the 32-gated variant packs only the
ESRGAN dense-block growth convs, each 1.2-1.3x isolated).

- [E] ESRGAN b8 128^2 / U-Net b16 256^2, default pipeline (no split) vs
  default+pack, bf16 and int8w.
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


def main():
    import jax
    import smelter_tpu as st
    from smelter_tpu.passes.pass_manager import DEFAULT_PIPELINE, run_passes
    from smelter_tpu.quant import quantize_weights

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def pipes():
        base = [p for p in DEFAULT_PIPELINE if p != "split_concat_conv"]
        i = base.index("subpixel_upsample_conv") + 1
        return {"default": base,
                "pack32": base[:i] + ["pack_conv_output"] + base[i:]}

    from smelter_tpu.models import esrgan, unet

    for name, build, batch, size in [
            ("esrgan b8 128^2", esrgan.build, 8, 128),
            ("unet b16 256^2", unet.build, 16, 256)]:
        g0, _tm, shape = build(batch=batch, image_size=size)
        blob = st.export_model(g0)
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        cfg = st.Config(compute_dtype="bfloat16")
        for v, pipe in pipes().items():
            for q in ("bf16", "int8w"):
                g = st.import_model(blob)
                n = run_passes(g, pipe, verbose=(q == "bf16"))
                if q == "int8w":
                    quantize_weights(g, mode="int8")
                run_passes(g, ["layout_nhwc"])
                if q == "int8w":
                    run_passes(g, ["fuse_dequant_matmul"])
                run_passes(g, ["dce"])
                m = st.CompiledModel(g, cfg)
                dt = timeit(m._fn, m.params, x)
                print(f"[E] {name} {q} {v}: {batch/dt:.1f} img/s",
                      flush=True)
                del m
        del x

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
