"""TPU campaign #17: ViT QKV-fusion fix (contiguous last-axis slot slices)
+ fused-LN default. Variants:
- bf16 (qkv contiguous-slice lowering, fused LN auto)
- bf16 with fused_layernorm=False (isolate LN contribution)
- int8-conv
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=8, warmup=2):
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
    from smelter_tpu.models import vit

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B = 128
    gv, _tm, shape = vit.build(batch=B, image_size=224)
    xi = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    base = st.CompiledModel(st.import_model(st.export_model(gv)),
                            st.Config(compute_dtype="float32",
                                      fused_layernorm=False))
    dt = timeit(base._fn, base.params, xi, iters=6)
    base_ips = B / dt
    print(f"vit naive fp32: {base_ips:.0f} img/s", flush=True)
    del base

    for tag, cfg, quant in [
        ("bf16 qkvslice+fusedLN", st.Config(compute_dtype="bfloat16"), None),
        ("bf16 qkvslice noLN", st.Config(compute_dtype="bfloat16",
                                         fused_layernorm=False), None),
        ("int8-conv", st.Config(compute_dtype="bfloat16"), "int8-conv"),
    ]:
        try:
            m = st.compile(st.import_model(st.export_model(gv)), cfg, quant=quant)
            dt = timeit(m._fn, m.params, xi)
            print(f"vit {tag}: {dt*1e3:.2f} ms = {B/dt:.0f} img/s "
                  f"({B/dt/base_ips:.2f}x)", flush=True)
            del m
        except Exception as e:
            print(f"vit {tag}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
