"""Pipeline parallelism: split a graph into stages, execute across devices.

For models whose weights exceed one chip's HBM (docs/ROADMAP.md item 9) and
for serving topologies that dedicate chips to stages. Design:

- `split_graph(graph, k)`: topo-prefix cuts balanced by the static FLOPs
  cost model (runtime/profiler.op_cost_table). A prefix cut is always a
  valid partition of a topologically-sorted node list; crossing edges
  become stage outputs/inputs, initializers are partitioned by use.
- `PipelinedModel`: one Executor per stage, params resident on that
  stage's device; calls chain stage executables with device-to-device
  transfers. jax's async dispatch overlaps stage i of microbatch j with
  stage i+1 of microbatch j-1 — `stream()` feeds microbatches and returns
  results in order (software pipelining without explicit double
  buffering).

CI runs this on the virtual CPU mesh; on hardware the same code places
stages on real chips.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ir.graph import Graph, Node, ValueInfo


def split_graph(graph: Graph, num_stages: int) -> list[Graph]:
    """Partition into `num_stages` subgraphs by balanced topo-prefix cuts."""
    from ..runtime.profiler import op_cost_table

    if not graph.value_types:
        from ..runtime.executor import Executor

        Executor(graph).infer_value_types()
    costs = {c.name: c.flops for c in op_cost_table(graph)}
    node_cost = [max(costs.get(n.name, 1.0), 1.0) for n in graph.nodes]
    total = sum(node_cost)

    # cut indices: node index where each stage ends (exclusive)
    cuts = []
    acc = 0.0
    target = total / num_stages
    for i, c in enumerate(node_cost):
        acc += c
        if acc >= target * (len(cuts) + 1) and len(cuts) < num_stages - 1:
            cuts.append(i + 1)
    cuts.append(len(graph.nodes))

    stages: list[Graph] = []
    start = 0
    for si, end in enumerate(cuts):
        nodes = graph.nodes[start:end]
        produced_here = {o for n in nodes for o in n.outputs if o}
        consumed_here = {i for n in nodes for i in n.inputs if i}
        consumed_later = {
            i for n in graph.nodes[end:] for i in n.inputs if i
        } | set(graph.output_names)

        g = Graph(name=f"{graph.name}_stage{si}", opset=graph.opset)
        g.nodes = [Node(n.op_type, list(n.inputs), list(n.outputs),
                        dict(n.attrs), n.name, n.domain) for n in nodes]
        # inputs: crossing edges produced earlier (activations only)
        for name in sorted(consumed_here - produced_here):
            if name in graph.initializers:
                g.initializers[name] = graph.initializers[name]
            else:
                t = graph.value_types.get(name)
                g.inputs.append(ValueInfo(name, t))
        # outputs: locally produced edges needed later
        for name in sorted(produced_here & consumed_later):
            g.outputs.append(ValueInfo(name, graph.value_types.get(name)))
        g.value_types = {k: v for k, v in graph.value_types.items()}
        stages.append(g)
        start = end
    return stages


class PipelinedModel:
    """Stage executables chained across devices (one device per stage)."""

    def __init__(self, graph: Graph, num_stages: int, devices=None, config=None):
        import jax

        from ..runtime.config import Config
        from ..runtime.executor import Executor

        self.config = config or Config()
        self.stages = split_graph(graph, num_stages)
        if devices is None:
            devices = jax.devices()[:num_stages]
        if len(devices) < num_stages:
            raise ValueError(f"need {num_stages} devices, have {len(devices)}")
        self.devices = devices[:num_stages]
        self.final_outputs = graph.output_names
        self._execs = []
        self._fns = []
        self._params = []
        for g, dev in zip(self.stages, self.devices):
            ex = Executor(g, self.config)
            self._execs.append(ex)
            self._fns.append(jax.jit(ex.build_fn()))
            self._params.append(ex.init_params(device=dev))

    def _run_stages(self, inputs: tuple):
        import jax

        env = {}
        for vi, x in zip(self.stages[0].inputs, inputs):
            env[vi.name] = jax.device_put(x, self.devices[0])
        for si, (g, fn, params, dev) in enumerate(
                zip(self.stages, self._fns, self._params, self.devices)):
            args = [jax.device_put(env[vi.name], dev) for vi in g.inputs]
            outs = fn(params, *args)
            for vi, o in zip(g.outputs, outs):
                env[vi.name] = o
        return [env[n] for n in self.final_outputs]

    def __call__(self, *inputs) -> list[np.ndarray]:
        return [np.asarray(o) for o in self._run_stages(inputs)]

    def stream(self, microbatches, max_in_flight: int | None = None):
        """Feed a sequence of input tuples; async dispatch overlaps stages
        across consecutive microbatches. Returns results in order.

        In-flight work is bounded: at most `max_in_flight` microbatches
        (default 2x the stage count — enough to keep every stage busy plus
        one transferring) are dispatched before the oldest is resolved, so
        host memory does not scale with the stream length."""
        from collections import deque

        if max_in_flight is None:
            max_in_flight = 2 * len(self.stages)
        results: list[list[np.ndarray]] = []
        window: deque = deque()
        for mb in microbatches:
            window.append(self._run_stages(mb if isinstance(mb, tuple) else (mb,)))
            if len(window) >= max_in_flight:
                results.append([np.asarray(o) for o in window.popleft()])
        while window:
            results.append([np.asarray(o) for o in window.popleft()])
        return results
