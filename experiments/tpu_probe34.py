"""TPU campaign #34: ResNet-50 int8-static per-stage decomposition.

The headline bench (13.1k img/s b128, 2.06x naive) is ~14% MFU on the
int8 MXU envelope — where is the remaining time? Cumulative graph cuts at
the residual-stage boundaries (truncate outputs + DCE, compile each
truncation, diff the times) localize it: stem / stage1..4 / head. Also
re-times the bf16 no-quant build for the quant-speedup split per stage.
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
    import jax  # noqa: F401

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


def build_int8_static():
    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_static

    g, _tm, shape = ZOO["resnet50"](batch=BATCH, image_size=SIZE)
    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "smelter_tpu.tools.calib_dump",
         "--model", "resnet50", "--batch", "4",
         "--image-size", str(SIZE), "-o", amax_path],
        check=True, timeout=900, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        amax = json.load(f)
    run_passes(g)
    n = quantize_static(g, amax)
    assert n, "nothing quantized"
    run_passes(g, NHWC_PIPELINE)
    run_passes(g, ["dce"])
    return g, shape


def build_bf16():
    import smelter_tpu as st
    from smelter_tpu.models import ZOO

    g, _tm, shape = ZOO["resnet50"](batch=BATCH, image_size=SIZE)
    return st.compile(g, st.Config(compute_dtype="bfloat16"),
                      layout="nhwc"), shape


def truncate(g, cut_edge):
    from smelter_tpu.ir.graph import ValueInfo
    from smelter_tpu.passes.pass_manager import run_passes

    g2 = copy.deepcopy(g)
    g2.outputs = [ValueInfo(cut_edge)]
    run_passes(g2, ["dce"])
    return g2


def main():
    import jax

    import smelter_tpu as st

    print("devices:", jax.devices(), flush=True)
    g, shape = build_int8_static()
    cfg = st.Config(compute_dtype="bfloat16")

    hist = {}
    for nd in g.nodes:
        hist[nd.op_type] = hist.get(nd.op_type, 0) + 1
    print("op histogram:", dict(sorted(hist.items(), key=lambda kv: -kv[1])),
          flush=True)
    convs = [nd for nd in g.nodes if "Conv" in nd.op_type]
    print(f"{len(convs)} conv nodes", flush=True)

    # stage boundaries for ResNet-50's 53 convs: stem=1, s1=+10, s2=+13,
    # s3=+19, s4=+10; fall back to even quartiles if fusion changed counts
    if len(convs) == 53:
        cut_idx = [(0, "stem"), (10, "stage1"), (23, "stage2"),
                   (42, "stage3"), (52, "stage4")]
    else:
        k = len(convs)
        cut_idx = [(0, "stem")] + [
            (max(0, (i * k) // 4 - 1), f"q{i}") for i in range(1, 5)]
    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal(shape).astype(np.float32))

    rows = []
    for idx, label in cut_idx:
        edge = convs[idx].outputs[0]
        gc = truncate(g, edge)
        m = st.CompiledModel(gc, cfg)
        dt = timeit(m._fn, m.params, x)
        rows.append((label, dt))
        print(f"[cut {label} conv#{idx+1} -> {edge}] {dt*1e3:.2f} ms "
              f"({len(gc.nodes)} nodes)", flush=True)

    m_full = st.CompiledModel(g, cfg)
    dt_full = timeit(m_full._fn, m_full.params, x)
    rows.append(("full", dt_full))
    print(f"[full int8-static] {dt_full*1e3:.2f} ms "
          f"({BATCH/dt_full:,.0f} img/s)", flush=True)

    prev = 0.0
    print("--- segment deltas (int8-static) ---", flush=True)
    for label, dt in rows:
        print(f"{label:8s} +{(dt-prev)*1e3:6.2f} ms (cum {dt*1e3:6.2f})",
              flush=True)
        prev = dt

    mb, _ = build_bf16()
    dtb = timeit(mb._fn, mb.params, x)
    print(f"[full bf16 no-quant] {dtb*1e3:.2f} ms ({BATCH/dtb:,.0f} img/s)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
