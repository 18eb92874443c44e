"""TPU probe #55: e2e A/B for fuse_mlp_block + fixed BERT/speech numbers.

probe54 showed the MLP kernel winning its microbench (164 vs 109 TF) but
the first e2e ViT read slightly BELOW the attention-only build (3,738 vs
3,832) — within the chip's multi-tenant spread. Decide with an
interleaved A/B in ONE process: compile ViT-B b128 with and without
fuse_mlp_block (attention fusion on in both) and alternate timing
rounds so contention hits both arms equally. Also: BERT-encoder b64 and
speech_encoder b64 with both fusions (the nested-jit closed_call crash
is fixed by dropping the kernels' inner @jax.jit).
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

    def build(model, batch, skip_mlp):
        g, _tm, shape = ZOO[model](batch=batch)
        pipe = [p for p in DEFAULT_PIPELINE
                if not (skip_mlp and p == "fuse_mlp_block")]
        run_passes(g, pipe)
        m = st.CompiledModel(g, st.Config(compute_dtype="bfloat16"))
        return m, shape

    # --- interleaved ViT A/B ---------------------------------------------
    ma, shape = build("vit_b16", 128, skip_mlp=True)
    mb, _ = build("vit_b16", 128, skip_mlp=False)
    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal(shape).astype(np.float32))
    arms = {}
    for tag, m in (("A attn-only", ma), ("B attn+mlp", mb)):
        sd = jax.tree_util.tree_leaves(jax.eval_shape(m._fn, m.params, x))[0]
        f4 = chained(m._fn, m.params, x, 4, sd)
        f12 = chained(m._fn, m.params, x, 12, sd)
        sync(f4(m.params, x)), sync(f12(m.params, x))
        arms[tag] = (m, f4, f12, [float("inf")], [float("inf")])
    for _ in range(5):
        for tag, (m, f4, f12, lo, hi) in arms.items():
            t0 = time.perf_counter(); sync(f4(m.params, x))
            lo[0] = min(lo[0], time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f12(m.params, x))
            hi[0] = min(hi[0], time.perf_counter() - t0)
    for tag, (m, f4, f12, lo, hi) in arms.items():
        dt = max(1e-9, (hi[0] - lo[0]) / 8)
        print(f"vit_b16 b128 {tag}: {dt*1e3:.2f} ms = {128/dt:.0f} img/s",
              flush=True)

    # --- BERT + speech (both fusions) ------------------------------------
    for model, batch in (("bert_encoder", 64), ("speech_encoder", 64)):
        try:
            g, _tm, shape = ZOO[model](batch=batch)
            run_passes(g)
            m = st.CompiledModel(g, st.Config(compute_dtype="bfloat16"))
            x1 = jax.device_put(np.random.default_rng(0)
                                .standard_normal(shape).astype(np.float32))
            sd = jax.tree_util.tree_leaves(
                jax.eval_shape(m._fn, m.params, x1))[0]
            f4 = chained(m._fn, m.params, x1, 4, sd)
            f12 = chained(m._fn, m.params, x1, 12, sd)
            sync(f4(m.params, x1)), sync(f12(m.params, x1))
            lo = hi = float("inf")
            for _ in range(4):
                t0 = time.perf_counter(); sync(f4(m.params, x1))
                lo = min(lo, time.perf_counter() - t0)
                t0 = time.perf_counter(); sync(f12(m.params, x1))
                hi = min(hi, time.perf_counter() - t0)
            dt = max(1e-9, (hi - lo) / 8)
            print(f"{model} b{batch}: {dt*1e3:.2f} ms = {batch/dt:.0f} /s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{model}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
