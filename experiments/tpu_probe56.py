"""TPU probe #56: set fuse_mlp_block's geometry gate from data.

probe55: the MLP kernel LOSES e2e at ViT-B geometry (d768/F3072:
34.25 vs 33.47 ms — XLA's batched (B*N, D) GEMM beats 128 per-image
GEMMs) but the speech encoder (d128) jumped 7,631 -> 28,498 seq/s with
both fusions on. Attribute per-model with interleaved A/B (attention
fusion ON in both arms; only fuse_mlp_block toggles) for bert_encoder
(d256/F1024) and speech_encoder (d128), and re-check the masked BERT
attention path now that the length mask rides SMEM.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import DEFAULT_PIPELINE, run_passes

    print("devices:", jax.devices(), flush=True)

    def chained(fn, params, x, loop, leaf_sd):
        @jax.jit
        def run(p, xx):
            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                out = fn(p, xx + zero.astype(xx.dtype))
                return jax.tree_util.tree_leaves(out)[0]
            return jax.lax.fori_loop(0, loop, body,
                                     jnp.zeros(leaf_sd.shape, leaf_sd.dtype))
        return run

    for model, batch in (("bert_encoder", 64), ("speech_encoder", 64)):
        try:
            arms = {}
            shape = None
            for tag, skip in (("A attn-only", True), ("B attn+mlp", False)):
                g, _tm, shape = ZOO[model](batch=batch)
                pipe = [p for p in DEFAULT_PIPELINE
                        if not (skip and p == "fuse_mlp_block")]
                run_passes(g, pipe)
                m = st.CompiledModel(g, st.Config(compute_dtype="bfloat16"))
                x = jax.device_put(np.random.default_rng(0)
                                   .standard_normal(shape)
                                   .astype(np.float32))
                sd = jax.tree_util.tree_leaves(
                    jax.eval_shape(m._fn, m.params, x))[0]
                f4 = chained(m._fn, m.params, x, 4, sd)
                f12 = chained(m._fn, m.params, x, 12, sd)
                sync(f4(m.params, x)), sync(f12(m.params, x))
                arms[tag] = (m, x, f4, f12, [float("inf")], [float("inf")])
            for _ in range(5):
                for tag, (m, x, f4, f12, lo, hi) in arms.items():
                    t0 = time.perf_counter(); sync(f4(m.params, x))
                    lo[0] = min(lo[0], time.perf_counter() - t0)
                    t0 = time.perf_counter(); sync(f12(m.params, x))
                    hi[0] = min(hi[0], time.perf_counter() - t0)
            for tag, (m, x, f4, f12, lo, hi) in arms.items():
                dt = max(1e-9, (hi[0] - lo[0]) / 8)
                print(f"{model} b{batch} {tag}: {dt*1e3:.2f} ms "
                      f"= {batch/dt:.0f} /s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{model}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
