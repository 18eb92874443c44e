"""Accuracy harness: literal top-1 / PSNR gates for quantized models.

Implements the BASELINE accuracy gate (BASELINE.md:9: top-1 delta <= 0.1%
vs FP32 for int8 weight-only) as an executable check instead of the
round-1 argmax-agreement proxy (tests/test_quant.py). The reference has no
accuracy tooling at all (SURVEY.md §4: no tests); the gate comes from the
driver's BASELINE.json.

Two modes:
- top1: labeled eval set -> fp32 top-1 vs quantized top-1, delta gate.
  With --synthetic N (no real weights/data in this environment) the labels
  are the fp32 model's own argmax, so the delta measures exactly the
  quantization-induced prediction-flip rate — the quantity the gate
  bounds once real weights drop in.
- psnr: super-resolution graphs (ESRGAN config, BASELINE.md:19): PSNR of
  the quantized output against the fp32 output, gated in dB.

Library API: `evaluate_top1`, `compare_top1`, `compare_psnr`.
CLI:
    python -m smelter_tpu.tools.accuracy model.onnx --quant int8 \
        [--eval data.npz | --synthetic 256] [--gate 0.1] [--mode top1|psnr]
exit code 0 = gate passed, 1 = failed, 2 = usage error.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def evaluate_top1(model, batches) -> float:
    """Top-1 accuracy of `model` (callable returning logits as output 0)
    over (x_batch, labels) pairs."""
    correct = total = 0
    for x, y in batches:
        logits = np.asarray(model(x)[0])
        if logits.ndim > 2:  # (N, C, 1, 1) heads
            logits = logits.reshape(logits.shape[0], -1)
        correct += int((logits.argmax(-1) == np.asarray(y)).sum())
        total += len(y)
    return correct / max(total, 1)


def _batched(x, y, batch):
    for i in range(0, len(x), batch):
        yield x[i:i + batch], y[i:i + batch]


def compare_top1(graph, eval_x, eval_y, *, quant: str = "int8",
                 gate_pct: float = 0.1, batch: int = 32, config=None,
                 calibration_data=None) -> dict:
    """Compile fp32 + quantized variants of `graph`, evaluate both, return
    {"fp32": acc, "quant": acc, "delta_pct": d, "passed": bool}."""
    import smelter_tpu as st

    g_ref = st.import_model(st.export_model(graph))
    g_q = st.import_model(st.export_model(graph))
    ref = st.compile(g_ref, config)
    qm = st.compile(g_q, config, quant=quant,
                    calibration_data=calibration_data)
    acc_ref = evaluate_top1(ref, _batched(eval_x, eval_y, batch))
    acc_q = evaluate_top1(qm, _batched(eval_x, eval_y, batch))
    delta = (acc_ref - acc_q) * 100.0
    return {"fp32": acc_ref, "quant": acc_q, "delta_pct": delta,
            "gate_pct": gate_pct, "passed": delta <= gate_pct}


def psnr(ref: np.ndarray, test: np.ndarray, peak: float | None = None) -> float:
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    mse = float(np.mean((ref - test) ** 2))
    if mse == 0:
        return float("inf")
    if peak is None:
        peak = float(ref.max() - ref.min()) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def compare_psnr(graph, eval_x, *, quant: str = "int8", gate_db: float = 40.0,
                 batch: int = 4, config=None, calibration_data=None) -> dict:
    """PSNR of the quantized model's output against the fp32 model's, for
    regression-style graphs (super-resolution etc.)."""
    import smelter_tpu as st

    ref = st.compile(st.import_model(st.export_model(graph)), config)
    qm = st.compile(st.import_model(st.export_model(graph)), config,
                    quant=quant, calibration_data=calibration_data)
    engaged = qm.graph.metadata.get("quant") == quant
    vals = []
    for i in range(0, len(eval_x), batch):
        xb = eval_x[i:i + batch]
        vals.append(psnr(ref(xb)[0], qm(xb)[0]))
    worst = float(min(vals))
    return {"psnr_db_worst": worst,
            "psnr_db_mean": float(np.mean(vals)),
            "gate_db": gate_db,
            # a gate that compares a model against itself proves nothing:
            # report whether the requested quantization actually rewrote
            # the graph, and fail the gate if it did not
            "quant_engaged": engaged,
            "passed": worst >= gate_db and engaged}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="accuracy", description=__doc__)
    p.add_argument("model", help="model path (.onnx) or zoo name (zoo:resnet50)")
    p.add_argument("--quant", default="int8",
                   choices=["fp16", "int8", "int8-conv", "int8-static",
                            "int8-pixel"])
    p.add_argument("--mode", default="top1", choices=["top1", "psnr"])
    p.add_argument("--eval", default=None, metavar="NPZ",
                   help="eval set: arrays 'x' (N,...) and 'y' (N,) labels "
                        "(x only for --mode psnr)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="no labeled data: N random inputs, labels = fp32 "
                        "model argmax (delta == quant flip rate)")
    p.add_argument("--gate", type=float, default=0.1,
                   help="top-1 delta gate in percent (default 0.1) or "
                        "minimum PSNR in dB for --mode psnr (default 40)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image-size", type=int, default=None,
                   help="zoo models: input resolution (int8-pixel regions "
                        "need lane-aligned widths, e.g. 128)")
    p.add_argument("--calib", default=None, metavar="NPZ",
                   help="calibration npz for --quant int8-static "
                        "(defaults to the eval inputs)")
    p.add_argument("--weights", default=None, metavar="CKPT",
                   help="zoo models: load a torchvision-style checkpoint "
                        "(.npz of state-dict arrays, or torch .pt/.pth) "
                        "into the model before export — the path real "
                        "pretrained weights take through the gate")
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import smelter_tpu as st

    if args.model.startswith("zoo:"):
        from .. import models as zoo_mod

        name = args.model[4:]
        if name not in zoo_mod.ZOO:
            print(f"accuracy: unknown zoo model {name!r}", file=sys.stderr)
            return 2
        kw = {"image_size": args.image_size} if args.image_size else {}
        if args.weights:
            from ..frontend.weights import reexport_with_weights

            g, _tm, shape = reexport_with_weights(
                zoo_mod.ZOO[name], args.weights, batch=args.batch, **kw)
        else:
            g, _tm, shape = zoo_mod.ZOO[name](batch=args.batch, **kw)
    else:
        if args.weights:
            print("accuracy: --weights needs a zoo: model", file=sys.stderr)
            return 2
        g = st.load_model(args.model)
        shape = None

    rng = np.random.default_rng(0)
    if args.eval:
        data = np.load(args.eval)
        x = data["x"]
        y = data["y"] if "y" in data.files else None
    elif args.synthetic:
        if shape is None:
            t = g.inputs[0].type
            shape = tuple(int(d) for d in t.shape)
        x = rng.standard_normal((args.synthetic,) + tuple(shape[1:])).astype(np.float32)
        y = None
    else:
        print("accuracy: need --eval NPZ or --synthetic N", file=sys.stderr)
        return 2

    # pin batch (zoo graphs fix it; file graphs may be symbolic) and trim
    # the eval set to a batch multiple so every compiled bucket is exact
    config = st.Config(batch_size=args.batch)
    n_keep = (len(x) // args.batch) * args.batch
    if n_keep == 0:
        print("accuracy: eval set smaller than --batch", file=sys.stderr)
        return 2
    x = x[:n_keep]
    if y is not None:
        y = y[:n_keep]

    calib = None
    if args.quant in ("int8-static", "int8-pixel"):
        if args.calib:
            cd = np.load(args.calib)
            calib = [(cd[k],) for k in sorted(cd.files)]
        else:
            calib = [(x[i:i + args.batch],)
                     for i in range(0, min(len(x), 2 * args.batch), args.batch)]

    if args.mode == "psnr":
        gate = args.gate if args.gate != 0.1 else 40.0
        r = compare_psnr(g, x, quant=args.quant, gate_db=gate,
                         batch=args.batch, config=config,
                         calibration_data=calib)
        eng = "" if r["quant_engaged"] else " [quant DID NOT ENGAGE]"
        print(f"psnr worst={r['psnr_db_worst']:.2f} dB "
              f"mean={r['psnr_db_mean']:.2f} dB gate={r['gate_db']} dB "
              f"-> {'PASS' if r['passed'] else 'FAIL'}{eng}")
        return 0 if r["passed"] else 1

    if y is None:
        # synthetic labels: fp32 model's own predictions
        ref = st.compile(st.import_model(st.export_model(g)), config)
        ys = []
        for i in range(0, len(x), args.batch):
            logits = np.asarray(ref(x[i:i + args.batch])[0])
            ys.append(logits.reshape(logits.shape[0], -1).argmax(-1))
        y = np.concatenate(ys)
    r = compare_top1(g, x, y, quant=args.quant, gate_pct=args.gate,
                     batch=args.batch, config=config,
                     calibration_data=calib)
    print(f"top1 fp32={r['fp32']*100:.2f}% quant={r['quant']*100:.2f}% "
          f"delta={r['delta_pct']:.3f}% gate={r['gate_pct']}% "
          f"-> {'PASS' if r['passed'] else 'FAIL'}")
    return 0 if r["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
