"""TPU campaign #6: post-fix ViT variants + full-int8 (static) ResNet vs
weight-only — does the int8 MXU path pay off end-to-end?

Calibration runs in a CPU subprocess (the axon platform registers no CPU
backend in-process); scales travel via a JSON side file.
"""

import json
import subprocess
import sys
import time

import numpy as np

CALIB_SCRIPT = r"""
import json, sys
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import smelter_tpu as st
from smelter_tpu.models import resnet50
from smelter_tpu.passes.pass_manager import run_passes
from smelter_tpu.quant import calibrate

g, _tm, shape = resnet50.build(batch=8, image_size=224)
run_passes(g)
rng = np.random.default_rng(0)
calib = [(rng.standard_normal(shape).astype(np.float32),) for _ in range(2)]
amax = calibrate(g, calib, percentile=99.9)
json.dump(amax, open("/tmp/resnet_amax.json", "w"))
print("calibrated", len(amax), "edges")
"""


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import resnet50, vit
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_static, quantize_weights

    print("devices:", jax.devices(), flush=True)

    # 0. CPU calibration subprocess
    r = subprocess.run([sys.executable, "-c", CALIB_SCRIPT], capture_output=True,
                       text=True, timeout=1200)
    print("calib:", (r.stdout or r.stderr).strip()[-200:], flush=True)
    amax = json.load(open("/tmp/resnet_amax.json"))

    # 1. ViT variants (post dtype fix)
    batch = 64
    g0, _tm, shape = vit.build(batch=batch, image_size=224)
    x = jax.device_put(np.random.randn(*shape).astype(np.float32))
    for label, use_pallas in [("xla-dpa int8w", False), ("pallas-flash int8w", True)]:
        g = st.import_model(st.export_model(g0))
        m = st.compile(g, st.Config(compute_dtype="bfloat16",
                                    use_pallas=use_pallas), quant="int8",
                       layout="nchw")
        dt = timeit(m._fn, m.params, x)
        print(f"[1] vit b{batch} {label}: {dt*1e3:.1f} ms = {batch/dt:.0f} img/s",
              flush=True)
        del m

    # 2. ResNet b128: weight-only int8 vs static full-int8
    g, _tm, shape = resnet50.build(batch=128, image_size=224)
    xr = jax.device_put(np.random.randn(*shape).astype(np.float32))

    gw = st.import_model(st.export_model(g))
    m = st.compile(gw, st.Config(compute_dtype="bfloat16"), quant="int8")
    dt = timeit(m._fn, m.params, xr, iters=8)
    print(f"[2] resnet50 b128 weight-only int8: {dt*1e3:.1f} ms = {128/dt:.0f} img/s",
          flush=True)
    del m

    gs = st.import_model(st.export_model(g))
    run_passes(gs)
    n = quantize_static(gs, amax)
    m = st.CompiledModel(gs, st.Config(compute_dtype="bfloat16"))
    dt = timeit(m._fn, m.params, xr, iters=8)
    print(f"[2] resnet50 b128 static int8 ({n} q-nodes): {dt*1e3:.1f} ms = "
          f"{128/dt:.0f} img/s", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
