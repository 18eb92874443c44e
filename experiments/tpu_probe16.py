"""TPU campaign #16: fuse_qkv_attention end-to-end gain + LN formulations.

- [A] ViT-B b128 with the full round-2 pipeline (gelu-auto + packed-QKV
  native attention): bf16, int8-conv; and naive fp32 for the multiplier.
- [B] LayerNorm formulations at (25216, 768): XLA composite, Pallas fused
  (bm sweep), MXU ones-matmul reduction (pure XLA).
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

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # [A] full model
    import smelter_tpu as st
    from smelter_tpu.models import vit

    B = 128
    gv, _tm, shape = vit.build(batch=B, image_size=224)
    xi = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    base = st.CompiledModel(st.import_model(st.export_model(gv)),
                            st.Config(compute_dtype="float32"))
    dt = timeit(base._fn, base.params, xi, iters=6)
    base_ips = B / dt
    print(f"[A] vit naive fp32: {base_ips:.0f} img/s", flush=True)
    del base
    for tag, cfg, quant in [
        ("bf16 qkv-fused", st.Config(compute_dtype="bfloat16"), None),
        ("int8-conv", st.Config(compute_dtype="bfloat16"), "int8-conv"),
    ]:
        try:
            m = st.compile(st.import_model(st.export_model(gv)), cfg, quant=quant)
            nq = sum(1 for _ in m.graph.find_nodes("FusedQKVAttention"))
            dt = timeit(m._fn, m.params, xi, iters=8, warmup=2)
            print(f"[A] vit {tag} (fusedqkv={nq}): {dt*1e3:.2f} ms = "
                  f"{B/dt:.0f} img/s ({B/dt/base_ips:.2f}x)", flush=True)
            del m
        except Exception as e:
            print(f"[A] vit {tag}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    # [B] LN formulations
    from smelter_tpu.kernels.layer_norm import (fused_layer_norm,
                                                layer_norm_reference)

    M, D = 25216, 768
    x = jax.device_put(rng.standard_normal((M, D)).astype(np.float32)).astype(bf)
    g = jax.device_put(rng.standard_normal(D).astype(np.float32))
    b = jax.device_put(rng.standard_normal(D).astype(np.float32))
    z = jax.device_put(np.zeros((), np.float32)).astype(bf)
    ones = jax.device_put(np.ones((D, 2), np.float32) / D).astype(bf)

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

    def ln_mxu(t):
        # mean and mean-of-squares via ONE MXU matmul on [x, x^2]
        tf = t.astype(jnp.float32)
        stats = jnp.concatenate(
            [jnp.mean(tf, axis=1, keepdims=True),
             jnp.mean(tf * tf, axis=1, keepdims=True)], axis=1)
        mu = stats[:, :1]
        var = stats[:, 1:] - mu * mu
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(t.dtype)

    def ln_dot(t):
        tf = t.astype(jnp.float32)
        mu = (t @ ones[:, :1]).astype(jnp.float32)  # MXU reduce
        sq = ((t * t) @ ones[:, :1]).astype(jnp.float32)
        var = sq - mu * mu
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(t.dtype)

    cases = [("xla composite", lambda t: layer_norm_reference(t, g, b)),
             ("xla E[x],E[x2]", ln_mxu),
             ("xla dot-reduce", ln_dot)]
    for bm in (256, 512, 1024, 2048):
        cases.append((f"pallas bm{bm}",
                      lambda t, bm=bm: __import__(
                          "smelter_tpu.kernels.layer_norm",
                          fromlist=["_layer_norm_impl"])._layer_norm_impl(
                          t, g, b, block_m=bm)))
    for tag, fn in cases:
        try:
            dt = timeit(chain(fn), x, z) / LOOP
            print(f"[B] LN {tag}: {dt*1e3:.3f} ms "
                  f"({2*M*D*2/dt/1e9:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"[B] LN {tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
