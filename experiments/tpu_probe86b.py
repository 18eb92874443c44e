"""TPU probe #86b: dwconv_ln_barrier pass e2e A/B on zoo ConvNeXt-T.

probe86's barrier surgery won 1.18x/1.08x at block level (the dw->LN
fusion seam); this measures the PASS end-to-end, interleaved: ConvNeXt
b64 bf16 and int8w, each with and without dwconv_ln_barrier. If the
barriered arm wins e2e, the pass goes default-on.
"""

import numpy as np


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.runtime.benchtime import chip_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    g, _tm, shape = ZOO["convnext"](batch=64, image_size=224)
    x = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    arms = {}
    for quant in (None, "int8"):
        for bar in (False, True):
            gq = st.import_model(st.export_model(g))
            m = st.compile(gq, st.Config(compute_dtype="bfloat16"),
                           quant=quant, layout="nhwc")
            if bar:
                n = run_passes(m.graph, ["dwconv_ln_barrier"])
                nbar = sum(1 for nn in m.graph.nodes
                           if nn.op_type == "OptimizationBarrier")
                assert nbar == 18, nbar
                m = st.CompiledModel(m.graph,
                                     st.Config(compute_dtype="bfloat16"))
            arms[f"{quant or 'bf16'}{'-bar' if bar else ''}"] = m

    best = {n: float("inf") for n in arms}
    for _ in range(4):
        for name, m in arms.items():
            best[name] = min(best[name], chip_time(m._fn, m.params, x))
    for name, t in best.items():
        print(f"[convnext b64 {name:10s}] {t*1e3:7.3f} ms = "
              f"{64/t:6,.0f} img/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
