"""TPU campaign #34e: bisect the engine-vs-raw ResNet gap (probe34d).

probe34d: raw-lax int8 ResNet-50 6.45 ms vs engine int8-static 10.4 ms.
Variants:
  A engine full, loop-amortized (one dispatch)  — is 10.4 real compute?
  B engine full, pipelined dispatches (control, probe34b methodology)
  C raw int8 amortized (same-session re-run)
  D raw bf16 amortized (how much does int8 buy in the raw form?)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

LOOP = 20
B = 128


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit_amortized(fn, x, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def timeit_pipelined(fn, *args, iters=15, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build_engine():
    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_static

    g, _tm, shape = ZOO["resnet50"](batch=B, image_size=224)
    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "smelter_tpu.tools.calib_dump",
         "--model", "resnet50", "--batch", "4", "--image-size", "224",
         "-o", amax_path],
        check=True, timeout=900, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        amax = json.load(f)
    run_passes(g)
    quantize_static(g, amax)
    run_passes(g, NHWC_PIPELINE)
    run_passes(g, ["dce"])
    return st.CompiledModel(g, st.Config(compute_dtype="bfloat16")), shape


def raw_resnet(dtype):
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    int8 = dtype == "int8"

    def mkw(kh, kw, cin, cout):
        if int8:
            w = rng.integers(-80, 80, (kh, kw, cin, cout)).astype(np.int8)
        else:
            w = (rng.standard_normal((kh, kw, cin, cout)) * 0.05) \
                .astype(np.float32).astype(jnp.bfloat16)
        m = (rng.uniform(0.5, 1.5, (cout,)) / (kh * kw * cin * 40)) \
            .astype(np.float32)
        return jnp.asarray(w), jnp.asarray(m)

    def qconv(x, w, m, stride=1, relu=True):
        if int8:
            acc = lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * m
            if relu:
                y = jnp.maximum(y, 0.0)
            return jnp.clip(jnp.round(y * 16.0), -128, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = acc * m
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(jnp.bfloat16)

    cfg = [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
    params = {"stem": mkw(7, 7, 3, 64)}
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

    carry_dtype = jnp.int8 if int8 else jnp.bfloat16

    def full(x):
        xt = jnp.transpose(x, (0, 2, 3, 1))
        if int8:
            h = jnp.clip(jnp.round(xt * 16.0), -128, 127).astype(jnp.int8)
        else:
            h = xt.astype(jnp.bfloat16)
        h = qconv(h, *params["stem"], stride=2)
        init = jnp.asarray(-128 if int8 else -1e9, carry_dtype)
        h = lax.reduce_window(h, init, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
        for si, (nb, wdt, st_) in enumerate(cfg):
            for bi in range(nb):
                stride = st_ if bi == 0 else 1
                t = qconv(h, *params[f"s{si}b{bi}c1"])
                t = qconv(t, *params[f"s{si}b{bi}c2"], stride=stride)
                t = qconv(t, *params[f"s{si}b{bi}c3"], relu=False)
                if bi == 0:
                    sc = qconv(h, *params[f"s{si}b{bi}ds"], stride=stride,
                               relu=False)
                else:
                    sc = h
                y = t.astype(jnp.float32) + sc.astype(jnp.float32)
                y = jnp.maximum(y, 0.0)
                if int8:
                    h = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
                else:
                    h = y.astype(jnp.bfloat16)
        g_ = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
        if int8:
            g_ = jnp.clip(jnp.round(g_ * 4.0), -128, 127).astype(jnp.int8)
        else:
            g_ = g_.astype(jnp.bfloat16)
        w, m = params["fc"]
        return qconv(g_, w, m, relu=False).reshape(B, 1000)

    return full


def chain(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xx):
        ysh = jax.eval_shape(step, xx)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
            return step(xx + c0 * jnp.zeros((), xx.dtype))
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.standard_normal((B, 3, 224, 224))
                        .astype(np.float32))

    m, shape = build_engine()

    def engine_step(xx):
        return m._fn(m.params, xx)[0]

    dt = timeit_amortized(chain(engine_step), x0)
    print(f"[A engine amortized ] {dt*1e3:7.3f} ms ({B/dt:,.0f} img/s)",
          flush=True)
    dt = timeit_pipelined(m._fn, m.params, x0)
    print(f"[B engine pipelined ] {dt*1e3:7.3f} ms ({B/dt:,.0f} img/s)",
          flush=True)
    dt = timeit_amortized(chain(raw_resnet("int8")), x0)
    print(f"[C raw int8 amortized] {dt*1e3:7.3f} ms ({B/dt:,.0f} img/s)",
          flush=True)
    dt = timeit_amortized(chain(raw_resnet("bf16")), x0)
    print(f"[D raw bf16 amortized] {dt*1e3:7.3f} ms ({B/dt:,.0f} img/s)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
