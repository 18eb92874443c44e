"""TPU campaign #33: fused residual+LN (the probe17 follow-up).

probe17: the standalone LN kernel won its microbench (204 vs 161 GB/s)
but LOST end-to-end (57.0 vs 49.2 ms ViT-B b128) because the pallas_call
was a fusion barrier for the surrounding residual adds. The new
fuse_residual_ln pass + residual_layer_norm kernel absorb the add into
the kernel (one HBM pass for add+LN, sum written once for the carry).

A/B (interleaved reps, the probe32b lesson):
  A. default pipeline (SkipLayerNormalization fused, composite lowering)
  B. same graph, fused_layernorm=True (Pallas residual+LN kernel)
  C. pipeline WITHOUT fuse_residual_ln (round-2 baseline shape)
on ViT-B/16 b128 bf16 and the BERT-style encoder b64.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(m, x, iters=20):
    fn, params = m._fn, m.params
    for _ in range(2):
        sync(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build(name, batch, size, variant):
    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import DEFAULT_PIPELINE, run_passes

    g, _tm, shape = ZOO[name](batch=batch, image_size=size)
    if variant == "C":
        run_passes(g, [p for p in DEFAULT_PIPELINE if p != "fuse_residual_ln"])
        g.metadata["optimized"] = "1"
        g.producer = "smelter-tpu"
    if variant == "C":
        g.metadata["quant"] = ""  # preprocessed detection: skip default
    cfg = st.Config(compute_dtype="bfloat16",
                    fused_layernorm=(variant == "B"))
    m = st.compile(g, cfg)  # C: producer tag skips re-optimize, keeps layout
    nslm = sum(1 for n in m.graph.nodes
               if n.op_type == "SkipLayerNormalization")
    return m, shape, nslm


def main():
    import jax

    print("devices:", jax.devices())
    for name, batch, size in (("vit_b16", 128, 224), ("bert_encoder", 64, 224)):
        ms = {}
        for variant in ("A", "B", "C"):
            m, shape, nslm = build(name, batch, size, variant)
            x = jax.device_put(np.random.default_rng(0)
                               .standard_normal(shape).astype(np.float32))
            ms[variant] = (m, x, nslm)
        for rep in range(3):
            for variant in ("A", "B", "C"):
                m, x, nslm = ms[variant]
                dt = bench(m, x)
                print(f"[{name} b{batch} {variant} rep{rep}] "
                      f"{batch/dt:,.0f} /s ({dt*1e3:.2f} ms/b, "
                      f"{nslm} SkipLN nodes)", flush=True)
        del ms
    print("DONE")


if __name__ == "__main__":
    main()
