"""TPU campaign #14: ViT-B/16 component ablation (VERDICT r1 item 2).

ViT-B b128 runs at ~2030 img/s bf16 (~36 TF, 18% MFU). This probe times
each encoder-layer component in isolation (loop-amortized, single
dispatch) to find where the other 80% goes, plus candidate fixes:

- [A] components as the engine lowers them: LayerNorm (f32 accum), QKV+proj
  matmuls, dot_product_attention (with the (B,H,N,hd) swapaxes), MLP.
- [B] variants: LN without f32 upcast, fused single-matmul QKV, gelu tanh,
  attention without transposes ((B,N,H,hd) native).
- [C] full-layer chain vs 12x + patch/head == model check.
- [D] practical int8 MXU ceiling: square 4096/8192 int8 matmul, i32 out.
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
    B, N, D, H, HD, FF = 128, 197, 768, 12, 64, 3072
    bf = jnp.bfloat16

    x = jax.device_put(rng.standard_normal((B, N, D)).astype(np.float32)).astype(bf)
    wq = [jax.device_put(rng.standard_normal((D, D)).astype(np.float32) * 0.02).astype(bf)
          for _ in range(4)]
    w1 = jax.device_put(rng.standard_normal((D, FF)).astype(np.float32) * 0.02).astype(bf)
    w2 = jax.device_put(rng.standard_normal((FF, D)).astype(np.float32) * 0.02).astype(bf)
    wqkv = jax.device_put(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.02).astype(bf)
    gamma = jax.device_put(np.ones(D, np.float32))
    beta = jax.device_put(np.zeros(D, np.float32))
    z = jax.device_put(np.zeros((), np.float32)).astype(bf)

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

    def ln_f32(t):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.var(tf, axis=-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(t.dtype)

    def ln_bf16(t):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean((t - mu) * (t - mu), axis=-1, keepdims=True)
        return ((t - mu) * jax.lax.rsqrt(var + jnp.asarray(1e-5, t.dtype))
                * gamma.astype(t.dtype) + beta.astype(t.dtype))

    def qkv_proj(t):
        q = t @ wq[0]; k = t @ wq[1]; v = t @ wq[2]
        return (q + k + v) @ wq[3]

    def qkv_fused(t):
        qkv = t @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return q + k + v

    def heads(t):  # (B,N,D) -> (B,H,N,hd) as fuse_attention emits
        return jnp.swapaxes(t.reshape(B, N, H, HD), 1, 2)

    def attn_engine(t):
        # FusedAttention lowering: inputs arrive (B,H,N,hd), swap to
        # (B,N,H,hd) for dot_product_attention, swap back
        q = heads(t)
        qt = jnp.swapaxes(q, 1, 2)
        out = jax.nn.dot_product_attention(qt, qt, qt, scale=HD ** -0.5)
        return jnp.swapaxes(out, 1, 2).reshape(B, N, D)[..., :D]

    def attn_native(t):
        q = t.reshape(B, N, H, HD)
        out = jax.nn.dot_product_attention(q, q, q, scale=HD ** -0.5)
        return out.reshape(B, N, D)

    def mlp(t):
        return jax.nn.gelu((t @ w1), approximate=False) @ w2

    def mlp_tanh(t):
        return jax.nn.gelu((t @ w1), approximate=True) @ w2

    def layer(t):
        h1 = ln_f32(t)
        q = heads(h1 @ wq[0]); k = heads(h1 @ wq[1]); v = heads(h1 @ wq[2])
        qt, kt, vt = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))
        a = jax.nn.dot_product_attention(qt, kt, vt, scale=HD ** -0.5)
        a = jnp.swapaxes(a, 1, 2).reshape(B, N, D) @ wq[3]
        t = t + a
        return t + mlp(ln_f32(t))

    gflop_mm = 2 * B * N * D * D * 4 / 1e9
    gflop_mlp = 2 * B * N * D * FF * 2 / 1e9
    cases = [
        ("LN f32 (engine)", ln_f32, None),
        ("LN bf16", ln_bf16, None),
        ("QKV+proj 4 matmuls", qkv_proj, gflop_mm),
        ("QKV fused 1 matmul (3/4 flops)", qkv_fused, gflop_mm * 3 / 4),
        ("attn dpa engine (swapaxes)", attn_engine, None),
        ("attn dpa native layout", attn_native, None),
        ("MLP gelu-erf", mlp, gflop_mlp),
        ("MLP gelu-tanh", mlp_tanh, gflop_mlp),
        ("full layer", layer, None),
    ]
    for tag, fn, gf in cases:
        try:
            dt = timeit(chain(fn), x, z) / LOOP
            extra = f" = {gf/dt/1e3:.0f} TF" if gf else ""
            print(f"[A] {tag}: {dt*1e3:.3f} ms{extra}", flush=True)
        except Exception as e:
            print(f"[A] {tag}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    # [C] model reference
    import smelter_tpu as st
    from smelter_tpu.models import vit

    g, _tm, shape = vit.build(batch=B, image_size=224)
    xi = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    m = st.compile(st.import_model(st.export_model(g)),
                   st.Config(compute_dtype="bfloat16"))
    dt = timeit(m._fn, m.params, xi, iters=8, warmup=2)
    print(f"[C] full vit model: {dt*1e3:.2f} ms = {B/dt:.0f} img/s", flush=True)

    # [D] practical int8 ceiling
    for S in (4096, 8192):
        a = jax.device_put(rng.integers(-127, 128, (S, S)).astype(np.int8))
        bq = jax.device_put(rng.integers(-127, 128, (S, S)).astype(np.int8))
        zi = jax.device_put(np.zeros((), np.int8))

        def step(aa, bq=bq):
            return jnp.dot(aa, bq, preferred_element_type=jnp.int32).astype(jnp.int8)

        try:
            dt = timeit(chain(step), a, zi) / LOOP
            fl = 2 * S ** 3
            print(f"[D] int8 {S}^3 xla: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"[D] int8 {S}^3: FAIL {type(e).__name__}", flush=True)
        # bf16 reference ceiling
        ab = a.astype(jnp.bfloat16); bb = bq.astype(jnp.bfloat16)
        zb = jax.device_put(np.zeros((), np.float32)).astype(jnp.bfloat16)

        def stepb(aa, bb=bb):
            return jnp.dot(aa, bb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        try:
            dt = timeit(chain(stepb), ab, zb) / LOOP
            fl = 2 * S ** 3
            print(f"[D] bf16 {S}^3 xla: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TF",
                  flush=True)
        except Exception as e:
            print(f"[D] bf16 {S}^3: FAIL {type(e).__name__}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
