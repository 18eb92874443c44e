"""TPU campaign: roofline column for every BENCHMARKS zoo row
(VERDICT r2 item 5) + ESRGAN int8-pixel end-to-end (item 3).

One patient process; each row compiles the engine-best model, measures
K-differenced chip time (min over alternating rounds — robust to tunnel
contention, probe51), and prints achieved vs the static bound from
tools/roofline.model_roofline. Results land in /tmp/roofline_zoo.jsonl.
"""

import json
import sys
import time

import numpy as np

ROWS = [
    # round-3 refresh: rows whose default paths changed
    ("vit_b16", 128, 224, "none", "nhwc"),
    ("sd_unet", 8, 256, "int8-conv", "nhwc"),
    ("segnet", 16, 256, "none", "nhwc"),
    ("speech_encoder", 64, 224, "none", "nhwc"),
]


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


def _cpu_amax(model: str, image_size: int) -> dict:
    """Calibration amax via a CPU subprocess (in-process calibration would
    read every activation back through the tunnel — see calib_dump)."""
    import os
    import subprocess
    import tempfile

    amax_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "smelter_tpu.tools.calib_dump",
         "--model", model, "--batch", "4",
         "--image-size", str(image_size), "-o", amax_path],
        check=True, timeout=900, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(amax_path) as f:
        return json.load(f)


def compile_best(st, model, batch, img, quant, layout):
    """Engine-best compile matching bench.py's quant handling, with
    calibrated paths fed from the CPU subprocess."""
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import run_passes

    g, _tm, shape = ZOO[model](batch=batch, image_size=img)
    cfg = st.Config(compute_dtype="bfloat16")
    if quant in ("int8-static", "int8-pixel"):
        amax = _cpu_amax(model, img)
        run_passes(g)
        if quant == "int8-static":
            from smelter_tpu.quant import quantize_static

            n = quantize_static(g, amax)
        else:
            from smelter_tpu.quant import quantize_pixel_regions

            n = quantize_pixel_regions(g, amax)
        if n == 0:
            raise RuntimeError(f"{quant}: nothing quantized")
        if layout == "nhwc":
            from smelter_tpu.passes.layout import NHWC_PIPELINE

            run_passes(g, NHWC_PIPELINE)
        run_passes(g, ["dce"])
        return st.CompiledModel(g, cfg), shape, cfg
    q = None if quant == "none" else quant
    return st.compile(g, cfg, quant=q, layout=layout), shape, cfg


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.tools.roofline import model_roofline

    print("devices:", jax.devices(), flush=True)
    out_f = open("/tmp/roofline_zoo.jsonl", "a")
    for model, batch, img, quant, layout in ROWS:
        try:
            m, shape, cfg = compile_best(st, model, batch, img, quant,
                                         layout)
            rl = model_roofline(m.graph, cfg)
            x = jax.device_put(np.random.default_rng(0)
                               .standard_normal(shape).astype(np.float32))
            dt = robust_chip_time(m._fn, m.params, x)
            rec = {
                "model": model, "batch": batch, "image_size": img,
                "quant": quant, "bound": rl["bound"],
                "sol_ms": round(rl["sol_s"] * 1e3, 3),
                "measured_ms": round(dt * 1e3, 3),
                "img_s": round(batch / dt, 1),
                "sol_img_s": round(batch / rl["sol_s"], 1),
                "achieved_pct": round(100 * rl["sol_s"] / dt, 1),
                "mxu_int8_frac": round(rl["mxu_int8_frac"], 3),
            }
            print(json.dumps(rec), flush=True)
            out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
        except Exception as e:  # noqa: BLE001
            print(f"{model} b{batch} {quant}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    out_f.close()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
