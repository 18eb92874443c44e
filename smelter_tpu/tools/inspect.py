"""Model inspection CLI: summary, per-op cost table, roofline estimate.

    python -m smelter_tpu.tools.inspect model.onnx [--top 15] [--dot out.dot]

The operator-facing analog of the reference's outputShapes debugging aid
(reference: ONNXGraph.swift:69-91) plus the cost model the reference never
had (SURVEY.md §5.1).
"""

from __future__ import annotations

import argparse
import sys


def graph_to_dot(graph) -> str:
    """Graphviz dot of the node DAG (edges by producer->consumer)."""
    lines = ["digraph G {", "  rankdir=TB;", '  node [shape=box, fontsize=10];']
    producers = graph.producers()
    for i, n in enumerate(graph.nodes):
        label = n.op_type
        lines.append(f'  n{i} [label="{label}"];')
    index = {id(n): i for i, n in enumerate(graph.nodes)}
    for i, n in enumerate(graph.nodes):
        for inp in n.inputs:
            p = producers.get(inp)
            if p is not None:
                lines.append(f"  n{index[id(p)]} -> n{i};")
    lines.append("}")
    return "\n".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="inspect", description=__doc__)
    p.add_argument("model")
    p.add_argument("--top", type=int, default=15, help="top-N ops by FLOPs")
    p.add_argument("--dot", default=None, help="write a graphviz .dot file")
    p.add_argument("--dim", action="append", default=[], metavar="NAME=VAL")
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from ..ir.importer import load_model
    from ..runtime.config import Config
    from ..runtime.executor import Executor
    from ..runtime.profiler import TPU_V5E, model_cost, op_cost_table, roofline

    try:
        g = load_model(args.model)
    except FileNotFoundError:
        print(f"inspect: file not found: {args.model}", file=sys.stderr)
        return 2
    dims = {}
    for spec in args.dim:
        name, _, val = spec.partition("=")
        dims[name] = int(val)
    print(g.summary())

    try:
        Executor(g, Config(dims=dims)).infer_value_types()
    except Exception as e:  # noqa: BLE001
        print(f"(shape inference unavailable: {e})")
        if args.dot:
            open(args.dot, "w").write(graph_to_dot(g))
        return 0

    table = sorted(op_cost_table(g), key=lambda c: -c.flops)
    total = model_cost(g)
    print(f"\ntotal: {total['flops']/1e9:.2f} GFLOP, "
          f"{total['bytes']/1e6:.1f} MB touched")
    rf = roofline(total["flops"], total["bytes"], TPU_V5E)
    print(f"v5e roofline: {rf['bound']}-bound, "
          f"speed-of-light {rf['speed_of_light_s']*1e3:.3f} ms/step\n")
    print(f"{'op':<22}{'name':<28}{'GFLOP':>9}{'MB':>8}{'AI':>8}")
    for c in table[: args.top]:
        print(f"{c.op_type:<22}{c.name[:27]:<28}{c.flops/1e9:>9.3f}"
              f"{c.bytes/1e6:>8.2f}{c.arithmetic_intensity:>8.1f}")

    if args.dot:
        open(args.dot, "w").write(graph_to_dot(g))
        print(f"\nwrote {args.dot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
