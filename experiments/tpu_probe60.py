"""TPU probe #60: where does int8-static ResNet's 2.5x-to-bound go?

(a) Correct stage decomposition (probe58's resnet half keyed edges by
the wrong dim): truncate the post-quant NHWC graph at the LAST edge of
each spatial resolution (B,H,W,C activations only, H==W) and
difference cumulative times.

(b) Microbench: XLA int8 conv (i8 x i8 -> i32 + folded requant, exactly
the int8-static formulation) at the four ResNet body shapes vs each
shape's int8-MXU bound — is the loss uniform or concentrated?
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def robust_chip_time(fn, params, x, lo=4, hi=12, rounds=4):
    import jax
    import jax.numpy as jnp

    out_sd = jax.eval_shape(fn, params, x)
    leaf_sd = jax.tree_util.tree_leaves(out_sd)[0]

    def chained(k):
        @jax.jit
        def run(p, xx):
            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                out = fn(p, xx + zero.astype(xx.dtype))
                return jax.tree_util.tree_leaves(out)[0]
            return jax.lax.fori_loop(0, k, body,
                                     jnp.zeros(leaf_sd.shape, leaf_sd.dtype))
        return run

    f_lo, f_hi = chained(lo), chained(hi)
    sync(f_lo(params, x)), sync(f_hi(params, x))
    t_lo = t_hi = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter(); sync(f_lo(params, x))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(f_hi(params, x))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return max(1e-9, (t_hi - t_lo) / (hi - lo))


def main():
    import json
    import os
    import subprocess
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_static

    print("devices:", jax.devices(), flush=True)

    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-m", "smelter_tpu.tools.calib_dump",
                    "--model", "resnet50", "--batch", "4",
                    "--image-size", "224", "-o", amax_path],
                   check=True, timeout=900, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        amax = json.load(f)

    g, _tm, shape = ZOO["resnet50"](batch=128, image_size=224)
    run_passes(g)
    quantize_static(g, amax)
    run_passes(g, NHWC_PIPELINE)
    run_passes(g, ["dce"])
    m = st.CompiledModel(g, st.Config(compute_dtype="bfloat16"))

    from smelter_tpu.runtime.executor import Executor

    Executor(g, st.Config(compute_dtype="bfloat16")).infer_value_types()
    vt = g.value_types
    last_at = {}
    for nd in g.nodes:
        t = vt.get(nd.outputs[0])
        if t is None or len(t.shape) != 4:
            continue
        b, h, w, c = (int(d) for d in t.shape)
        if b != 128 or h != w or h not in (112, 56, 28, 14, 7):
            continue
        last_at[h] = nd.outputs[0]
    print("stage ends:", last_at, flush=True)

    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal(shape).astype(np.float32))
    t_full = robust_chip_time(m._fn, m.params, x)
    print(f"resnet int8-static full: {t_full*1e3:.2f} ms", flush=True)

    import copy

    from smelter_tpu.ir.graph import ValueInfo

    prev = 0.0
    for h in sorted(last_at, reverse=True):
        gt = copy.deepcopy(g)
        gt.outputs = [ValueInfo(last_at[h], None)]
        gt.dead_code_eliminate()
        gt.value_types = {}
        mt = st.CompiledModel(gt, st.Config(compute_dtype="bfloat16"))
        dt = robust_chip_time(mt._fn, mt.params, x)
        print(f"  through {h:3d}x{h}: cum {dt*1e3:6.2f} ms "
              f"(+{(dt-prev)*1e3:5.2f})", flush=True)
        prev = dt

    # (b) int8 conv microbench at the four body shapes
    rng = np.random.default_rng(0)
    for (hh, cin, cout) in [(56, 64, 64), (28, 128, 128), (14, 256, 256),
                            (7, 512, 512)]:
        xq = jax.device_put(rng.integers(-127, 128, (128, hh, hh, cin),
                                         dtype=np.int8))
        wq = jax.device_put(rng.integers(-127, 128, (3, 3, cin, cout),
                                         dtype=np.int8))
        mscale = jax.device_put((rng.random(cout) * 0.01).astype(np.float32))

        def conv_i8(t, wq=wq, mscale=mscale):
            y = jax.lax.conv_general_dilated(
                t, wq, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(jnp.round(y.astype(jnp.float32) * mscale),
                            -128, 127).astype(jnp.int8)

        fl = 2 * 128 * hh * hh * cin * cout * 9
        dt = robust_chip_time(lambda p, t: conv_i8(t), None, xq)
        print(f"  conv {hh}x{hh} c{cin}->{cout}: {dt*1e3:.3f} ms = "
              f"{fl/dt/1e12:.0f} TOP/s ({100*fl/dt/394e12:.0f}% of int8 peak)",
              flush=True)
    # rider: unpool kernel rows sweep on SegNet's big unpool shape
    from smelter_tpu.kernels.max_unpool import max_unpool2x2

    xq = jax.device_put(rng.standard_normal((16, 32, 128, 128))
                        .astype(np.float32)).astype(jnp.bfloat16)
    iq = jax.device_put(
        (rng.integers(0, 2, (16, 32, 128, 128)) * 257
         + np.arange(16 * 32 * 128 * 128).reshape(16, 32, 128, 128) * 0
         ).astype(np.int32))
    # valid-ish indices: parity is all the kernel reads
    for rows in (64, 128, 256, 512, 1024):
        dt = robust_chip_time(
            lambda p, t, rows=rows: max_unpool2x2(t, iq, rows=rows,
                                                  interpret=False),
            None, xq)
        gb = (xq.size * 2 + iq.size * 4 + 4 * xq.size * 2) / 1e9
        print(f"  unpool rows={rows}: {dt*1e3:.3f} ms "
              f"({gb/dt:.0f} GB/s of 819)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
