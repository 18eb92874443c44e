"""TPU probe #86: ConvNeXt block — break the composition pathology.

probe84 stage B reproduced probe62's finding in RAW jnp: at stage-1
geometry (c96@56, b64) the composed dw7x7->LN->mlp chain costs 1.73 ms
while the SUM of the same pieces measured in isolation is 1.05 ms —
fusion makes XLA slower than no fusion. Two experiments, interleaved:

  1) barrier surgery: the same whole-block chain with
     lax.optimization_barrier between the pieces (dw | LN | mlp |
     residual) — if the barriered chain recovers the 1.05 ms sum, the
     pathology is XLA's fusion/layout choice across those seams and a
     graph pass can insert the barriers; also each 2-seam variant to
     find WHICH seam hurts.
  2) zoo ConvNeXt-T b64 e2e: bf16 vs int8w, interleaved wide-span —
     probe84's per-stage numbers imply bf16 should WIN ~10% e2e (the
     dequant epilogues cost more than int8 matmuls save on this
     dwconv/LN-heavy model); if confirmed, the bench/zoo guidance rows
     flip to bf16 like ViT's.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.runtime.benchtime import chip_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # -- 1) barrier surgery at the pathological geometry ----------------
    for c, hw in ((96, 56), (192, 28)):
        wdw = jnp.asarray(rng.standard_normal((7, 7, 1, c)),
                          jnp.bfloat16) * 0.05
        w1 = jnp.asarray(rng.standard_normal((c, 4 * c)),
                         jnp.bfloat16) * 0.05
        w2 = jnp.asarray(rng.standard_normal((4 * c, c)),
                         jnp.bfloat16) * 0.05
        xh = jax.device_put(
            rng.standard_normal((64, hw, hw, c)).astype(jnp.bfloat16))

        def dw(x_):
            return jax.lax.conv_general_dilated(
                x_, wdw, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def ln(x_):
            m_ = x_.astype(jnp.float32)
            mu = m_.mean(-1, keepdims=True)
            v = ((m_ - mu) ** 2).mean(-1, keepdims=True)
            return ((m_ - mu) * jax.lax.rsqrt(v + 1e-6)).astype(x_.dtype)

        def mlp(x_):
            return jax.nn.gelu(x_ @ w1) @ w2

        def chain(p, x_, b_after=()):
            h = dw(x_)
            if "dw" in b_after:
                h = jax.lax.optimization_barrier(h)
            h = ln(h)
            if "ln" in b_after:
                h = jax.lax.optimization_barrier(h)
            h = mlp(h)
            if "mlp" in b_after:
                h = jax.lax.optimization_barrier(h)
            return x_ + h

        arms = {
            "plain": lambda p, x_: chain(p, x_),
            "b-all": lambda p, x_: chain(p, x_, ("dw", "ln", "mlp")),
            "b-dw": lambda p, x_: chain(p, x_, ("dw",)),
            "b-ln": lambda p, x_: chain(p, x_, ("ln",)),
            "b-mlp": lambda p, x_: chain(p, x_, ("mlp",)),
        }
        best = {n: float("inf") for n in arms}
        for _ in range(3):
            for name, f in arms.items():
                best[name] = min(best[name], chip_time(f, None, xh))
        print(f"[cnx c{c}@{hw} barriers] "
              + " ".join(f"{n}={best[n]*1e3:.3f}ms" for n in arms),
              flush=True)

    # -- 2) zoo e2e: bf16 vs int8w, interleaved -------------------------
    g, _tm, shape = ZOO["convnext"](batch=64, image_size=224)
    m_bf = st.compile(st.import_model(st.export_model(g)),
                      st.Config(compute_dtype="bfloat16"),
                      quant=None, layout="nhwc")
    m_i8 = st.compile(st.import_model(st.export_model(g)),
                      st.Config(compute_dtype="bfloat16"),
                      quant="int8", layout="nhwc")
    x = jax.device_put(
        rng.standard_normal(shape).astype(np.float32))
    b_bf = b_i8 = float("inf")
    for _ in range(4):
        b_bf = min(b_bf, chip_time(m_bf._fn, m_bf.params, x))
        b_i8 = min(b_i8, chip_time(m_i8._fn, m_i8.params, x))
    print(f"[convnext b64 e2e] bf16 {b_bf*1e3:.3f} ms = {64/b_bf:,.0f} "
          f"img/s  vs int8w {b_i8*1e3:.3f} ms = {64/b_i8:,.0f} img/s "
          f"({b_i8/b_bf:.2f}x)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
