"""TPU probe #85: ResNet-50 stem + glue — close the 39% row (VERDICT #9).

probe61 located the headline model's remaining gap in "stem/1x1/glue":
body convs run AT the int8 roofline. Before sinking a round into a
fused stem+maxpool Pallas kernel, establish whether one CAN win:

  a) XLA stem (conv7x7s2 + relu [+ maxpool3x3s2]) isolated at b128,
     bf16 and int8-static forms, K-differenced chip time;
  b) the stem's own roofline (input read + output write + 30 GFLOP);
  c) in-situ stem cost: e2e ResNet-50 int8-static MINUS the same model
     taking pre-stem (56x56x64) inputs (the ablation includes whatever
     fusion context the stem sits in);
  d) maxpool isolated (the piece a fused kernel would absorb).

Decision rule: if (a) is within ~1.5x of (b), no kernel can buy more
than a few percent of the 6.7 ms step — record and close the row. If
(a) >> (b), the gap bounds the prize for a round-6 kernel.

All arms resident, rounds interleaved (probe74/76 discipline).
"""

import numpy as np

B = 128


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.ir.build import GraphBuilder
    from smelter_tpu.models import resnet50
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.runtime.benchtime import chip_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def exec_fn(graph):
        run_passes(graph)
        run_passes(graph, NHWC_PIPELINE)
        run_passes(graph, ["dce"])
        ex = st.Executor(graph, st.Config(compute_dtype="bfloat16"))
        return ex.build_fn(), ex.init_params()

    def stem_graph(with_pool):
        b = GraphBuilder("stem", opset=17)
        x = b.input("x", (B, 3, 224, 224))
        w = b.init(rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
                   * 0.05)
        y = b.node("Conv", [x, w], strides=[2, 2], pads=[3, 3, 3, 3])
        y = b.node("Relu", [y])
        if with_pool:
            y = b.node("MaxPool", [y], kernel_shape=[3, 3],
                       strides=[2, 2], pads=[1, 1, 1, 1])
        hw = 56 if with_pool else 112
        b.output(y, (B, 64, hw, hw))
        return b.graph

    def pool_graph():
        b = GraphBuilder("pool", opset=17)
        x = b.input("x", (B, 64, 112, 112))
        y = b.node("MaxPool", [x], kernel_shape=[3, 3], strides=[2, 2],
                   pads=[1, 1, 1, 1])
        b.output(y, (B, 64, 56, 56))
        return b.graph

    x224 = jax.device_put(
        rng.standard_normal((B, 3, 224, 224)).astype(np.float32))
    x112 = jax.device_put(
        rng.standard_normal((B, 64, 112, 112)).astype(np.float32))

    arms = {}
    for name, g, xx in [("stem+pool", stem_graph(True), x224),
                        ("stem", stem_graph(False), x224),
                        ("maxpool", pool_graph(), x112)]:
        fn, params = exec_fn(g)
        arms[name] = (fn, params, xx)

    def wide_time(f, params, x):
        """>=300 ms K-span (probe82b: short differences can collapse
        inside the tunnel's pipelining window)."""
        # chip_time itself now widens to a 0.4 s minimum span
        return chip_time(f, params, x)

    best = {n: float("inf") for n in arms}
    for _ in range(4):
        for name, (fn, params, xx) in arms.items():
            best[name] = min(best[name], wide_time(fn, params, xx))
    flops = B * 112 * 112 * 64 * 147 * 2
    io = B * (224 * 224 * 3 * 2 + 56 * 56 * 64 * 2)
    sol = max(flops / 197e12, io / 819e9)
    for name, t in best.items():
        print(f"[{name:9s}] {t*1e3:7.3f} ms", flush=True)
    print(f"[stem+pool SOL] {sol*1e3:7.3f} ms "
          f"(mxu {flops/197e12*1e3:.3f} / hbm {io/819e9*1e3:.3f}) -> "
          f"XLA at {100*sol/best['stem+pool']:.0f}% of bound", flush=True)

    # -- in-situ ablation: e2e int8-static vs body-only -------------------
    import subprocess
    import sys
    import tempfile
    import json as _json
    import os

    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "smelter_tpu.tools.calib_dump",
         "--model", "resnet50", "--batch", "4", "--image-size", "224",
         "-o", amax_path], check=True, timeout=900, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        amax = _json.load(f)
    from smelter_tpu.quant import quantize_static

    def best_model(g):
        gq = st.import_model(st.export_model(g))
        run_passes(gq)
        quantize_static(gq, amax)
        run_passes(gq, NHWC_PIPELINE)
        run_passes(gq, ["dce"])
        return st.CompiledModel(gq, st.Config(compute_dtype="bfloat16"))

    g_full, _tm, shape = resnet50.build(batch=B, image_size=224)
    m_full = best_model(g_full)

    # body-only: drop nodes up to (incl.) the stem maxpool, retype input
    g_body, _tm2, _ = resnet50.build(batch=B, image_size=224)
    mp = next(n for n in g_body.nodes if n.op_type == "MaxPool")
    cut_edge = mp.outputs[0]
    keep = []
    seen_cut = False
    for n in g_body.nodes:
        if not seen_cut:
            if n is mp:
                seen_cut = True
            continue
        keep.append(n)
    g_body.nodes = keep
    from smelter_tpu.ir.graph import TensorType, ValueInfo

    g_body.inputs = [ValueInfo(cut_edge,
                               TensorType(1, (B, 64, 56, 56)))]
    g_body.toposort()
    m_body = best_model(g_body)

    x56 = jax.device_put(
        rng.standard_normal((B, 64, 56, 56)).astype(np.float32))
    bf = bb = float("inf")
    for _ in range(4):
        bf = min(bf, wide_time(m_full._fn, m_full.params, x224))
        bb = min(bb, wide_time(m_body._fn, m_body.params, x56))
    print(f"[e2e int8-static] {bf*1e3:7.3f} ms = {B/bf:6,.0f} img/s",
          flush=True)
    print(f"[body-only      ] {bb*1e3:7.3f} ms -> in-situ stem+pool "
          f"cost {1e3*(bf-bb):+.3f} ms "
          f"({100*(bf-bb)/bf:.1f}% of the step)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
