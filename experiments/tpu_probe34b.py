"""TPU campaign #34b: stem space-to-depth A/B on the headline config.

probe34 localized 3.13 ms of ResNet-50 int8-static's 10.51 ms (30%) in the
stem conv (C_in=3 lane padding). A/B the stem_space_to_depth rewrite on
the full bench build (int8-static + NHWC), interleaved reps, plus the
stem-only cut to confirm the mechanism. Also MobileNetV2 (3x3/s2 stem).
"""

import copy
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

BATCH = 128
SIZE = 224


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=15, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build(model, with_stem_pass):
    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.passes.pass_manager import DEFAULT_PIPELINE, run_passes
    from smelter_tpu.quant import quantize_static

    g, _tm, shape = ZOO[model](batch=BATCH, image_size=SIZE)
    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "smelter_tpu.tools.calib_dump",
         "--model", model, "--batch", "4",
         "--image-size", str(SIZE), "-o", amax_path],
        check=True, timeout=900, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        amax = json.load(f)
    pipeline = list(DEFAULT_PIPELINE)
    if not with_stem_pass:
        pipeline.remove("stem_space_to_depth")
    run_passes(g, pipeline)
    quantize_static(g, amax)
    run_passes(g, NHWC_PIPELINE)
    run_passes(g, ["dce"])
    return g, shape


def stem_cut(g):
    from smelter_tpu.ir.graph import ValueInfo
    from smelter_tpu.passes.pass_manager import run_passes

    conv = next(nd for nd in g.nodes if "Conv" in nd.op_type)
    g2 = copy.deepcopy(g)
    g2.outputs = [ValueInfo(conv.outputs[0])]
    run_passes(g2, ["dce"])
    return g2


def main():
    import jax

    import smelter_tpu as st

    print("devices:", jax.devices(), flush=True)
    cfg = st.Config(compute_dtype="bfloat16")
    for model in ("resnet50", "mobilenet_v2"):
        builds = {}
        for variant, with_pass in (("A_s2d", True), ("B_plain", False)):
            g, shape = build(model, with_pass)
            m = st.CompiledModel(g, cfg)
            ms = st.CompiledModel(stem_cut(g), cfg)
            x = jax.device_put(np.random.default_rng(0)
                               .standard_normal(shape).astype(np.float32))
            builds[variant] = (m, ms, x)
        for rep in range(3):
            for variant, (m, ms, x) in builds.items():
                dt = timeit(m._fn, m.params, x)
                dts = timeit(ms._fn, ms.params, x, iters=20)
                print(f"[{model} {variant} rep{rep}] full {dt*1e3:.2f} ms "
                      f"({BATCH/dt:,.0f} img/s)  stem {dts*1e3:.2f} ms",
                      flush=True)
        del builds
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
