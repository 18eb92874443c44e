"""TPU campaign #15: ViT fix validation (gelu-tanh auto, fused LN kernel,
short-N attention kernel) + patch-embed accounting.

- [A] fused_layer_norm vs XLA composite at (25216, 768) bf16.
- [B] short_attention vs XLA dot_product_attention at (128,12,197,64).
- [C] full ViT-B b128: bf16 default (gelu auto now tanh), +use_pallas
  (LN + short-attention kernels), +int8-conv.
- [D] patch-embed conv + head in isolation (the ~12 ms model-minus-layers
  gap from probe14).
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

    # [A] LayerNorm
    from smelter_tpu.kernels.layer_norm import (fused_layer_norm,
                                                layer_norm_reference)

    M, D = 25216, 768
    x = jax.device_put(rng.standard_normal((M, D)).astype(np.float32)).astype(bf)
    g = jax.device_put(rng.standard_normal(D).astype(np.float32))
    b = jax.device_put(rng.standard_normal(D).astype(np.float32))
    z = jax.device_put(np.zeros((), np.float32)).astype(bf)
    for tag, fn in [("xla composite", lambda t: layer_norm_reference(t, g, b)),
                    ("pallas fused", lambda t: fused_layer_norm(t, g, b))]:
        try:
            dt = timeit(chain(fn), x, z) / LOOP
            gbs = 2 * M * D * 2 / dt / 1e9
            print(f"[A] LN {tag}: {dt*1e3:.3f} ms ({gbs:.0f} GB/s eff)", flush=True)
        except Exception as e:
            print(f"[A] LN {tag}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    # numerics spot check on chip
    try:
        got = np.asarray(jax.jit(lambda t: fused_layer_norm(t, g, b))(x), np.float32)
        want = np.asarray(jax.jit(lambda t: layer_norm_reference(t, g, b))(x), np.float32)
        print(f"[A] LN max abs diff: {np.abs(got-want).max():.5f}", flush=True)
    except Exception as e:
        print(f"[A] LN parity: FAIL {type(e).__name__}", flush=True)

    # [B] short attention
    from smelter_tpu.kernels.attention_short import (
        short_attention, short_attention_reference)

    B, H, N, HD = 128, 12, 197, 64
    q = jax.device_put(rng.standard_normal((B, H, N, HD)).astype(np.float32)).astype(bf)

    def xla_dpa(t):
        qt = jnp.swapaxes(t, 1, 2)
        return jnp.swapaxes(
            jax.nn.dot_product_attention(qt, qt, qt, scale=HD ** -0.5), 1, 2)

    for gtag, grp in [("g8", 8), ("g4", 4), ("g16", 16), ("g2", 2)]:
        try:
            fn = chain(lambda t, grp=grp: short_attention(
                t, t, t, scale=HD ** -0.5, group=grp))
            dt = timeit(fn, q, z) / LOOP
            print(f"[B] short_attention {gtag}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"[B] short_attention {gtag}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    try:
        dt = timeit(chain(xla_dpa), q, z) / LOOP
        print(f"[B] xla dpa: {dt*1e3:.3f} ms", flush=True)
        got = np.asarray(jax.jit(lambda t: short_attention(
            t, t, t, scale=HD ** -0.5))(q), np.float32)
        want = np.asarray(jax.jit(xla_dpa)(q), np.float32)
        print(f"[B] attn max abs diff: {np.abs(got-want).max():.5f}", flush=True)
    except Exception as e:
        print(f"[B] xla dpa: FAIL {type(e).__name__}", flush=True)

    # [C] full model
    import smelter_tpu as st
    from smelter_tpu.models import vit

    gv, _tm, shape = vit.build(batch=B, image_size=224)
    xi = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    for tag, cfg, quant in [
        ("bf16 gelu-auto", st.Config(compute_dtype="bfloat16"), None),
        ("bf16 +pallas(LN+attn)", st.Config(compute_dtype="bfloat16",
                                            use_pallas=True), None),
        ("int8-conv +pallas", st.Config(compute_dtype="bfloat16",
                                        use_pallas=True), "int8-conv"),
    ]:
        try:
            m = st.compile(st.import_model(st.export_model(gv)), cfg, quant=quant)
            dt = timeit(m._fn, m.params, xi, iters=8, warmup=2)
            print(f"[C] vit {tag}: {dt*1e3:.2f} ms = {B/dt:.0f} img/s", flush=True)
            del m
        except Exception as e:
            print(f"[C] vit {tag}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # [D] patch embed + glue accounting
    wpe = jax.device_put(rng.standard_normal((768, 3, 16, 16)).astype(np.float32) * 0.02).astype(bf)
    xim = jax.device_put(rng.standard_normal((B, 3, 224, 224)).astype(np.float32)).astype(bf)

    def patch_embed(t):
        y = jax.lax.conv_general_dilated(
            t, wpe, (16, 16), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(bf)
        return y.reshape(B, 768, 196).transpose(0, 2, 1)

    zb = z
    try:
        dt = timeit(chain(patch_embed), xim, zb) / LOOP
        fl = 2 * B * 196 * 768 * 768
        print(f"[D] patch embed conv+reshape: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TF",
              flush=True)
    except Exception as e:
        print(f"[D] patch embed: FAIL {type(e).__name__}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
