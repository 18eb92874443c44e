"""TPU campaign #34d: raw-lax int8 ResNet-50 vs the engine's graph.

Is the 10.4 ms int8-static model at XLA parity, or does the lowering add
overhead? Hand-roll the same conv stack in raw jax (int8 NHWC convs on
the int8 MXU, folded per-channel requant epilogues, int8 residual carry)
and time it loop-amortized. If raw ~= engine, further ResNet gains need
sub-XLA work (Pallas direct conv); if raw is faster, the delta localizes
lowering overhead. Also times each stage slice of the raw stack.
"""

import time

import numpy as np

LOOP = 20
B = 128


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, x, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def mkw(kh, kw, cin, cout):
        w = rng.integers(-80, 80, (kh, kw, cin, cout)).astype(np.int8)
        m = (rng.uniform(0.5, 1.5, (cout,)) / (kh * kw * cin * 40)) \
            .astype(np.float32)
        return jnp.asarray(w), jnp.asarray(m)

    def qconv(x, w, m, stride=1, relu=True):
        acc = lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * m
        if relu:
            y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y * 16.0), -128, 127).astype(jnp.int8)

    # (blocks, width, stride) per stage — ResNet-50
    cfg = [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]

    params = {}
    params["stem"] = mkw(7, 7, 3, 64)
    cin = 64
    for si, (nb, wdt, _s) in enumerate(cfg):
        for bi in range(nb):
            params[f"s{si}b{bi}c1"] = mkw(1, 1, cin if bi == 0 else wdt * 4,
                                          wdt)
            params[f"s{si}b{bi}c2"] = mkw(3, 3, wdt, wdt)
            params[f"s{si}b{bi}c3"] = mkw(1, 1, wdt, wdt * 4)
            if bi == 0:
                params[f"s{si}b{bi}ds"] = mkw(1, 1, cin, wdt * 4)
        cin = wdt * 4
    params["fc"] = mkw(1, 1, 2048, 1000)

    def stem(x):
        # x: f32 NCHW input -> quantize+transpose -> conv -> maxpool
        xt = jnp.transpose(x, (0, 2, 3, 1))
        xq = jnp.clip(jnp.round(xt * 16.0), -128, 127).astype(jnp.int8)
        y = qconv(xq, *params["stem"], stride=2)
        return lax.reduce_window(y, jnp.int8(-128), lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "SAME")

    def stage(si):
        nb, wdt, st = cfg[si]

        def run(x):
            for bi in range(nb):
                stride = st if bi == 0 else 1
                h = qconv(x, *params[f"s{si}b{bi}c1"])
                h = qconv(h, *params[f"s{si}b{bi}c2"], stride=stride)
                h = qconv(h, *params[f"s{si}b{bi}c3"], relu=False)
                if bi == 0:
                    sc = qconv(x, *params[f"s{si}b{bi}ds"], stride=stride,
                               relu=False)
                else:
                    sc = x
                # residual join in the dequant domain, requant to int8
                y = h.astype(jnp.float32) + sc.astype(jnp.float32)
                x = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), -128,
                             127).astype(jnp.int8)
            return x
        return run

    def head(x):
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        gq = jnp.clip(jnp.round(g * 4.0), -128, 127).astype(jnp.int8)
        w, m = params["fc"]
        return qconv(gq, w, m, relu=False).reshape(B, 1000)

    def full(x):
        h = stem(x)
        for si in range(4):
            h = stage(si)(h)
        return head(h)

    def chain(step, in_dtype):
        @jax.jit
        def run(xx):
            ysh = jax.eval_shape(step, xx)

            def body(i, carry):
                c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
                return step(xx + c0 * jnp.zeros((), xx.dtype))
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    x0 = jax.device_put(rng.standard_normal((B, 3, 224, 224))
                        .astype(np.float32))
    sizes = {0: 56, 1: 56, 2: 28, 3: 14}
    feeds = {}
    cin = 64
    for si, (nb, wdt, _s) in enumerate(cfg):
        feeds[si] = jax.device_put(rng.integers(
            -100, 100, (B, sizes[si], sizes[si], cin)).astype(np.int8))
        cin = wdt * 4

    total = 0.0
    dt = timeit(chain(stem, np.float32), x0)
    total += dt
    print(f"[stem+pool ] {dt*1e3:7.3f} ms", flush=True)
    for si in range(4):
        dt = timeit(chain(stage(si), np.int8), feeds[si])
        total += dt
        print(f"[stage{si+1}    ] {dt*1e3:7.3f} ms", flush=True)
    x4 = jax.device_put(rng.integers(-100, 100, (B, 7, 7, 2048))
                        .astype(np.int8))
    dt = timeit(chain(head, np.int8), x4)
    total += dt
    print(f"[head      ] {dt*1e3:7.3f} ms", flush=True)
    print(f"[sum stages] {total*1e3:7.3f} ms", flush=True)

    dt = timeit(chain(full, np.float32), x0)
    print(f"[full raw  ] {dt*1e3:7.3f} ms ({B/dt:,.0f} img/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
