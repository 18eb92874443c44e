"""Dump calibration amax for a zoo model to JSON — run on CPU.

Helper for bench.py's int8-static path: calibration executes the fp32
graph with return-all-edges and reads EVERY activation back to the host,
which over the axon tunnel would time the link, not the chip — so the
bench spawns this as a CPU subprocess instead (amax values are
batch-size-independent; edge names are deterministic across batch sizes
because the builders and passes are deterministic).

    JAX_PLATFORMS=cpu python -m smelter_tpu.tools.calib_dump \
        --model resnet50 --batch 4 --samples 2 -o /tmp/amax.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="calib_dump", description=__doc__)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--samples", type=int, default=2)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    else:
        jax.config.update("jax_platforms", "cpu")

    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import calibrate

    if args.model not in ZOO:
        print(f"calib_dump: unknown model {args.model!r}", file=sys.stderr)
        return 2
    g, _tm, shape = ZOO[args.model](batch=args.batch,
                                    image_size=args.image_size)
    run_passes(g)
    rng = np.random.default_rng(0)
    data = [tuple([rng.standard_normal(shape).astype(np.float32)])
            for _ in range(args.samples)]
    amax = calibrate(g, data)
    with open(args.output, "w") as f:
        json.dump(amax, f)
    print(f"calib_dump: {len(amax)} edges -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
