"""TPU probe #58: SegNet + int8-ResNet stage decompositions.

(a) SegNet achieves 4.8% of its MXU bound (8.9 ms for 0.43 ms of conv
work) even though the dense non-overlapping MaxUnpool is bandwidth-
formulated. Truncate the post-pass graph at successive edges and
difference: which stage eats the time (encoder convs / pools / unpool
decode stages / DepthToSpace head)?

(b) ResNet-50 int8-static runs at 39% of the int8-MXU bound. Truncate
after the stem and after each stage to get per-stage efficiency vs each
stage's own flop bound — locating where a conv kernel campaign would
pay.
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


def truncated(st, g2, edge):
    import copy

    from smelter_tpu.ir.graph import ValueInfo

    gt = copy.deepcopy(g2)
    gt.outputs = [ValueInfo(edge, None)]
    gt.dead_code_eliminate()
    gt.value_types = {}
    return st.CompiledModel(gt, st.Config(compute_dtype="bfloat16"))


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import run_passes

    print("devices:", jax.devices(), flush=True)

    # ---- (a) SegNet -------------------------------------------------------
    g, _tm, shape = ZOO["segnet"](batch=16, image_size=256)
    m = st.compile(g, st.Config(compute_dtype="bfloat16"), layout="nhwc")
    g2 = m.graph
    marks = []
    for nd in g2.nodes:
        if nd.op_type in ("MaxPool", "MaxUnpool", "DepthToSpace"):
            marks.append((nd.op_type, nd.outputs[0]))
    print("segnet marks:", marks, flush=True)
    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal(shape).astype(np.float32))
    t_full = robust_chip_time(m._fn, m.params, x)
    print(f"segnet full: {t_full*1e3:.2f} ms", flush=True)
    prev = 0.0
    for op, edge in marks:
        try:
            mt = truncated(st, g2, edge)
            dt = robust_chip_time(mt._fn, mt.params, x)
            print(f"  after {op:13s} {edge}: cum {dt*1e3:6.2f} ms "
                  f"(+{(dt-prev)*1e3:5.2f})", flush=True)
            prev = dt
        except Exception as e:  # noqa: BLE001
            print(f"  {edge}: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    # ---- (b) ResNet int8-static stages ------------------------------------
    import json
    import os
    import subprocess
    import sys
    import tempfile

    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-m", "smelter_tpu.tools.calib_dump",
                    "--model", "resnet50", "--batch", "4",
                    "--image-size", "224", "-o", amax_path],
                   check=True, timeout=900, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        amax = json.load(f)
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.quant import quantize_static

    gr, _tm, rshape = ZOO["resnet50"](batch=128, image_size=224)
    run_passes(gr)
    quantize_static(gr, amax)
    run_passes(gr, NHWC_PIPELINE)
    run_passes(gr, ["dce"])
    mr = st.CompiledModel(gr, st.Config(compute_dtype="bfloat16"))
    # stage boundaries: the stride-2 convs (stage entries) by spatial size
    from smelter_tpu.runtime.executor import Executor

    Executor(gr, st.Config(compute_dtype="bfloat16")).infer_value_types()
    vt = gr.value_types
    seen = {}
    for nd in gr.nodes:
        t = vt.get(nd.outputs[0])
        if t is None or len(t.shape) != 4:
            continue
        hw = int(t.shape[1])  # NHWC
        seen[hw] = nd.outputs[0]  # last edge at each resolution
    xr = jax.device_put(np.random.default_rng(0)
                        .standard_normal(rshape).astype(np.float32))
    t_full = robust_chip_time(mr._fn, mr.params, xr)
    print(f"resnet int8-static full: {t_full*1e3:.2f} ms", flush=True)
    prev = 0.0
    for hw in sorted(seen, reverse=True):
        try:
            mt = truncated(st, gr, seen[hw])
            dt = robust_chip_time(mt._fn, mt.params, xr)
            print(f"  through {hw}x{hw}: cum {dt*1e3:6.2f} ms "
                  f"(+{(dt-prev)*1e3:5.2f})", flush=True)
            prev = dt
        except Exception as e:  # noqa: BLE001
            print(f"  {hw}: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
