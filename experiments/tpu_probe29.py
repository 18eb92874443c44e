"""TPU campaign #29: ViT-B/16 with int8 ACTIVATIONS on the MXU int8 path.

Round-2 ViT stands at 2,600 img/s b128 (bf16, gelu-auto + packed-QKV);
int8 weight-only loses (dequant multiply on ~25k-row matmuls). The int8
formulation that won for serving GEMMs (probe12/27: int8xint8->i32, 327
TOP/s envelope) needs int8 activations too — Config.int8_activations
engages per-row dynamic activation quant in FusedDequantMatMul. Measures
end-to-end ViT b128:
  [A] bf16 reference (current default config)
  [B] quant=int8 + int8_activations (XLA int8 composite)
  [C] B + use_pallas (int8_matmul kernel)
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(m, x, iters=6, warmup=2):
    for _ in range(warmup):
        sync(m._fn(m.params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = m._fn(m.params, x)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import vit

    print("devices:", jax.devices())
    B = 128
    g, _tm, shape = vit.build(B, 224, patch=16, dim=768, depth=12, heads=12,
                              num_classes=1000)
    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal(shape).astype(np.float32))

    def run(tag, quant, **cfg):
        import smelter_tpu as st

        g2, _t, _s = vit.build(B, 224, patch=16, dim=768, depth=12,
                               heads=12, num_classes=1000)
        m = st.compile(g2, st.Config(compute_dtype="bfloat16", **cfg),
                       quant=quant)
        dt = bench(m, x)
        print(f"[{tag}] {B / dt:,.0f} img/s ({dt*1e3:.1f} ms)")
        return B / dt

    a = run("bf16", None)
    b = run("int8+acts", "int8", int8_activations=True)
    c = run("int8+acts+pallas", "int8", int8_activations=True,
            use_pallas=True)
    print(f"ratios vs bf16: xla-int8 {b/a:.2f}x, pallas-int8 {c/a:.2f}x")
    print("DONE")


if __name__ == "__main__":
    main()
