"""Offline model preprocessor CLI — the analog of the reference's ONNX2MPS
tool (reference: ONNX2MPS.py:112-137: --input/--output/--half; validate,
fuse BN into Conv, cast, swizzle weights, re-emit with a producer tag the
runtime detects). Here: import -> optimizer passes -> weight quantization
-> re-emit tagged ONNX the engine loads directly.

Usage:
    python -m smelter_tpu.tools.onnx2tpu model.onnx -o model.tpu.onnx \
        [--quant int8|fp16] [--no-fuse] [--dim N=1] [-v]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="onnx2tpu", description=__doc__)
    p.add_argument("input", help="input .onnx path")
    p.add_argument("-o", "--output", required=True, help="output artifact path")
    p.add_argument("--quant",
                   metavar="none|fp16|int8|int4|int8-static|int4-g<N>",
                   default="none",
                   help="quantization: fp16/int8/int4 weight-only (ONNX2MPS "
                        "--half analog), int8-static (full int8, needs "
                        "--calib), or grouped weight-only int4-g<N>/int8-g<N> "
                        "(blocked scales along K, e.g. int4-g128)")
    p.add_argument("--calib", default=None, metavar="NPZ",
                   help="calibration batches for int8-static: .npz whose "
                        "arrays are sample inputs (one per graph input, "
                        "grouped by suffix _0, _1, ...)")
    p.add_argument("--no-fuse", action="store_true",
                   help="skip BN-into-Conv fusion and folding passes")
    p.add_argument("--dim", action="append", default=[], metavar="NAME=VAL",
                   help="pin a symbolic input dim, e.g. --dim batch=8")
    p.add_argument("--verify", type=int, default=0, metavar="N",
                   help="after quantizing, gate the artifact: top-1 delta "
                        "vs the fp32 graph over N synthetic samples must be "
                        "<= --verify-gate percent (tools/accuracy.py)")
    p.add_argument("--verify-gate", type=float, default=0.1, metavar="PCT")
    p.add_argument("--artifact", action="store_true",
                   help="treat OUTPUT as an artifact DIRECTORY (graph + "
                        "meta + AOT-compiled executable, runtime/artifact.py) "
                        "instead of a single re-emitted .onnx")
    p.add_argument("--batch", type=int, default=None,
                   help="with --artifact: pin the batch size the executable "
                        "is compiled for")
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)

    # Offline host tool: run on CPU regardless of accelerator plugins
    # (constant folding / calibration must not claim the serving chip).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from ..ir.importer import PREPROCESSED_PRODUCER, load_model, save_model
    from ..passes.pass_manager import run_passes

    try:
        g = load_model(args.input)
    except FileNotFoundError:
        print(f"onnx2tpu: input file not found: {args.input}", file=sys.stderr)
        return 2
    if args.verbose:
        print("loaded:", g.summary())

    for spec in args.dim:
        name, _, val = spec.partition("=")
        for vi in g.inputs:
            if vi.type is None:
                continue
            shape = tuple(int(val) if d == name else d for d in vi.type.shape)
            vi.type = type(vi.type)(vi.type.dtype, shape)

    if not args.no_fuse:
        run_passes(g, verbose=args.verbose)
    if args.quant == "int8-static":
        if not args.calib:
            print("onnx2tpu: --quant int8-static requires --calib", file=sys.stderr)
            return 2
        import numpy as np

        from ..quant import calibrate, quantize_static

        data = np.load(args.calib)
        n_inputs = len(g.inputs)
        keys = sorted(data.files)
        batches = [tuple(data[k] for k in keys[i:i + n_inputs])
                   for i in range(0, len(keys), n_inputs)]
        amax = calibrate(g, batches)
        n = quantize_static(g, amax)
        if args.verbose:
            print(f"static-quantized {n} nodes from {len(batches)} batches")
    elif args.quant != "none":
        from ..quant import quantize_weights

        try:
            quantize_weights(g, mode=args.quant)
        except ValueError as e:
            print(f"onnx2tpu: {e}", file=sys.stderr)
            return 2

    if args.verify and args.quant != "none":
        import numpy as np

        from .accuracy import compare_top1

        t = g.inputs[0].type
        shape = tuple(int(d) for d in t.shape)
        batch = min(shape[0], 32)
        n = max(args.verify // batch, 1) * batch
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n,) + shape[1:]).astype(np.float32)
        # synthetic labels: the fp32 graph's own argmax (quant flip rate)
        import smelter_tpu as st

        ref_g = load_model(args.input)
        if not args.no_fuse:
            run_passes(ref_g)
        ref = st.compile(st.import_model(st.export_model(ref_g)),
                         st.Config(batch_size=batch))
        ys = []
        for i in range(0, n, batch):
            logits = np.asarray(ref(x[i:i + batch])[0])
            ys.append(logits.reshape(logits.shape[0], -1).argmax(-1))
        y = np.concatenate(ys)
        r = compare_top1(ref_g, x, y, quant=args.quant,
                         gate_pct=args.verify_gate, batch=batch,
                         config=st.Config(batch_size=batch),
                         calibration_data=([(x[:batch],)]
                                           if args.quant == "int8-static"
                                           else None))
        print(f"verify: top1 delta {r['delta_pct']:.3f}% "
              f"(gate {args.verify_gate}%) -> "
              f"{'PASS' if r['passed'] else 'FAIL'}")
        if not r["passed"]:
            print("onnx2tpu: accuracy gate failed; artifact not written",
                  file=sys.stderr)
            return 1

    g.metadata["optimized"] = "1" if not args.no_fuse else "0"
    if args.artifact:
        from ..runtime.artifact import save_artifact
        from ..runtime.config import Config

        # dims={0: N} overrides axis 0 whether the graph's batch dim is
        # symbolic or fixed (Config.resolve_dim); batch_size alone only
        # pins symbolic dims.
        cfg = (Config(batch_size=args.batch, dims={0: args.batch})
               if args.batch else Config())
        save_artifact(args.output, g, cfg, compile_now=True)
        if args.verbose:
            print("wrote artifact dir:", args.output)
        return 0
    save_model(g, args.output, producer=PREPROCESSED_PRODUCER)
    if args.verbose:
        print("wrote:", args.output)
        print(g.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
