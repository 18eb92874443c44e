"""TPU probe #53: (a) true-AOT artifact verified ON CHIP (VERDICT r2 #9);
(b) U-Net encoder/decoder stage decomposition (VERDICT r2 #7 evidence).

(a) saves an artifact (compiling on the TPU and timing that compile),
then a FRESH subprocess loads it and times the first inference — if the
platform supports executable serialization, load_kind == 'aot' and the
cold first call costs dispatch, not compile. Whatever happens is the
honest record for BENCHMARKS.

(b) truncates the post-pass engine graph at the bottleneck (smallest
H*W edge) and times encoder-only vs full — attributing U-Net's
47%-of-bound gap to a stage instead of guessing.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


LOADER = r"""
import time, sys, numpy as np
t_import0 = time.perf_counter()
from smelter_tpu.runtime.artifact import load_artifact
t0 = time.perf_counter()
m = load_artifact(sys.argv[1])
t_load = time.perf_counter() - t0
x = np.zeros([int(v) for v in sys.argv[2].split(",")], np.float32)
t0 = time.perf_counter()
out = m(x)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
out2 = m(x)
t_second = time.perf_counter() - t0
print("LOADER", m.load_kind, f"{t_load:.2f}", f"{t_first:.2f}",
      f"{t_second:.2f}", float(np.asarray(out[0]).ravel()[0]), flush=True)
"""


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.runtime.artifact import save_artifact
    from smelter_tpu.runtime.benchtime import chip_time

    print("devices:", jax.devices(), flush=True)

    # ---- (a) AOT on chip -------------------------------------------------
    g, _tm, shape = ZOO["mobilenet_v2"](batch=8, image_size=96)
    run_passes(g)
    art = "/tmp/aot_art_tpu"
    t0 = time.perf_counter()
    save_artifact(art, g, st.Config(), compile_now=True, aot=True)
    t_save = time.perf_counter() - t0
    meta = json.load(open(art + "/meta.json"))
    aot_stored = any(e.get("aot") for e in meta["executables"].values())
    print(f"save_artifact on TPU: {t_save:.1f}s (includes remote compile); "
          f"aot executable stored: {aot_stored}", flush=True)

    proc = subprocess.run(
        [sys.executable, "-c", LOADER, art, ",".join(map(str, shape))],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ))
    for line in proc.stdout.splitlines():
        if line.startswith("LOADER"):
            print("cold-load subprocess:", line, flush=True)
    if proc.returncode != 0:
        print("loader stderr:", proc.stderr[-500:], flush=True)

    # ---- (b) U-Net stage decomposition ----------------------------------
    gu, _tm2, _sh = ZOO["unet"](batch=16, image_size=256)
    m = st.compile(gu, st.Config(compute_dtype="bfloat16"), quant=None,
                   layout="nhwc")
    g2 = m.graph
    from smelter_tpu.runtime.executor import Executor

    exg = Executor(g2, st.Config(compute_dtype="bfloat16"))
    exg.infer_value_types()
    vt = g2.value_types
    # bottleneck edge: smallest spatial area among 4-D conv outputs
    best = None
    for nd in g2.nodes:
        t = vt.get(nd.outputs[0])
        if t is None or len(t.shape) != 4:
            continue
        hh, ww = int(t.shape[1]), int(t.shape[3])  # NHWC or NCHW — area ok
        area = int(np.prod([int(d) for d in t.shape])) // int(t.shape[0])
        if best is None or area < best[1]:
            best = (nd.outputs[0], area)
    print("bottleneck edge:", best, flush=True)

    import copy

    from smelter_tpu.ir.graph import ValueInfo

    g_enc = copy.deepcopy(g2)
    g_enc.outputs = [ValueInfo(best[0], None)]
    g_enc.dead_code_eliminate()
    g_enc.value_types = {}
    m_enc = st.CompiledModel(g_enc, st.Config(compute_dtype="bfloat16"))

    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal((16, 3, 256, 256)).astype(np.float32))
    dt_full = chip_time(m._fn, m.params, x, k_lo=4, k_hi=12)
    dt_enc = chip_time(m_enc._fn, m_enc.params, x, k_lo=4, k_hi=12)
    print(f"unet b16: full {dt_full*1e3:.2f} ms, encoder-only "
          f"{dt_enc*1e3:.2f} ms, decoder = {(dt_full-dt_enc)*1e3:.2f} ms "
          f"({100*(dt_full-dt_enc)/dt_full:.0f}%)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
