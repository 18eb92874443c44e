"""TPU campaign #36: raw-lax ViT-B/16 vs the engine (probe34d for ViT).

Engine ViT-B b128 bf16 sits at ~2,600 img/s (~23% MFU). Establish the
XLA ceiling with a hand-rolled bf16 ViT (same shapes: 197 tokens, 768
dim, 12 blocks):
  A engine st.compile default, loop-amortized
  B raw, jax.nn.dot_product_attention
  C raw, manual einsum attention (the engine's fused form)
  D raw dpa with tokens padded 197 -> 256 (lane-friendly N; extra rows
    carry garbage but are sliced off before the head — checks whether
    XLA's padding of the odd N is the bottleneck)
"""

import time

import numpy as np

LOOP = 10
B, P, D, DEPTH, H = 128, 16, 768, 12, 12
N = (224 // P) ** 2 + 1  # 197
HD = D // H


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, params, x, iters=4, warmup=1):
    for _ in range(warmup):
        sync(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def chain(step):
    """step(params, x); params ride as jit ARGUMENTS — closing over them
    would serialize 170 MB of weights into the remote-compile payload
    (HTTP 413 on the tunnel)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, xx):
        ysh = jax.eval_shape(step, params, xx)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
            return step(params, xx + c0 * jnp.zeros((), xx.dtype))
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def raw_vit(att_mode, n_pad=None):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    npad = n_pad or N

    def mk(*shape, scale=0.02):
        return jnp.asarray((rng.standard_normal(shape) * scale)
                           .astype(np.float32), bf)

    params = {
        "embed": mk(P * P * 3, D),
        "cls": mk(1, 1, D),
        "pos": mk(1, N, D),
        "headw": mk(D, 1000),
    }
    for i in range(DEPTH):
        params[f"b{i}"] = dict(
            ln1g=mk(D, scale=1.0), ln1b=mk(D, scale=0.0),
            qkv=mk(D, 3 * D), qkvb=mk(3 * D, scale=0.0),
            proj=mk(D, D), projb=mk(D, scale=0.0),
            ln2g=mk(D, scale=1.0), ln2b=mk(D, scale=0.0),
            fc1=mk(D, 4 * D), fc1b=mk(4 * D, scale=0.0),
            fc2=mk(4 * D, D), fc2b=mk(D, scale=0.0))

    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g.astype(jnp.float32)
                + b.astype(jnp.float32)).astype(bf)

    def attention(x, p):
        qkv = x @ p["qkv"] + p["qkvb"]
        qkv = qkv.reshape(B, npad, 3, H, HD)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,n,H,hd)
        if att_mode == "dpa":
            o = jax.nn.dot_product_attention(q, k, v)
        else:
            qh = jnp.einsum("bnhd->bhnd", q)
            kh = jnp.einsum("bnhd->bhnd", k)
            vh = jnp.einsum("bnhd->bhnd", v)
            a = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * (HD ** -0.5)
            a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(bf)
            o = jnp.einsum("bhnm,bhmd->bnhd", a, vh)
        return o.reshape(B, npad, D) @ p["proj"] + p["projb"]

    def block(x, p):
        x = x + attention(ln(x, p["ln1g"], p["ln1b"]), p)
        h = ln(x, p["ln2g"], p["ln2b"])
        h = jax.nn.gelu(h @ p["fc1"] + p["fc1b"], approximate=True)
        return x + (h @ p["fc2"] + p["fc2b"])

    def full(prm, img):  # img f32 (B,3,224,224)
        x = img.reshape(B, 3, 14, P, 14, P)
        x = jnp.transpose(x, (0, 2, 4, 3, 5, 1)).reshape(B, 196, P * P * 3)
        x = x.astype(bf) @ prm["embed"]
        x = jnp.concatenate(
            [jnp.broadcast_to(prm["cls"], (B, 1, D)), x], 1)
        x = x + prm["pos"]
        if npad != N:
            x = jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))
        for i in range(DEPTH):
            x = block(x, prm[f"b{i}"])
        return (x[:, 0].astype(jnp.float32) @
                prm["headw"].astype(jnp.float32))

    return full, params


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import ZOO

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.standard_normal((B, 3, 224, 224))
                        .astype(np.float32))

    g, _tm, shape = ZOO["vit_b16"](batch=B, image_size=224)
    m = st.compile(g, st.Config(compute_dtype="bfloat16"))

    def engine_step(p, xx):
        return m._fn(p, xx)[0]

    cases = [("A engine bf16    ", engine_step, m.params)]
    for name, mode, pad in (("B raw dpa        ", "dpa", None),
                            ("C raw einsum     ", "einsum", None),
                            ("D raw dpa N=256  ", "dpa", 256)):
        fn, prm = raw_vit(mode, n_pad=pad)
        cases.append((name, fn, jax.device_put(prm)))
    for name, step, prm in cases:
        dt = timeit(chain(step), prm, x0)
        print(f"[{name}] {dt*1e3:7.2f} ms ({B/dt:,.0f} img/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
