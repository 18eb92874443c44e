"""Control-flow op lowerings: If, Loop (static trip count), plus the RNN
family (LSTM/GRU/RNN) lowered onto jax.lax.scan.

Absent from the reference (CNN-only engine, SURVEY.md §2) but part of the
general ONNX envelope. XLA constraints shape the design:

- If: when the condition is a trace-time constant (common after constant
  folding) the taken branch is inlined with zero cost; a traced condition
  lowers to lax.cond, which requires both branches to produce identical
  shapes/dtypes.
- Loop: supported for static trip counts (M constant, cond never false) —
  the body must be shape-invariant, and it lowers to lax.fori_loop /
  unrolled trace. Dynamic `break` conditions are rejected.
- LSTM/GRU/RNN: single direction or bidirectional, lax.scan over time —
  the idiomatic TPU mapping (compiler-friendly static control flow).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ir.errors import NotSupportedError
from ..ir.graph import Graph, Node
from .registry import Ctx, register


def _run_subgraph(parent: Ctx, sub: Graph, inputs: list):
    """Execute a subgraph with `inputs` bound to its declared inputs.
    Outer-scope names resolve through the parent env (ONNX closure rule)."""
    from .registry import lower_node

    sub.opset = sub.opset or parent.opset
    env = dict(parent.env)  # closure over outer scope
    for vi, val in zip(sub.inputs, inputs):
        env[vi.name] = val
    child = Ctx(sub, env, parent.config)
    child.static_env.update(parent.static_env)
    # subgraph initializers resolve via child.graph; outer initializers via env
    for name, arr in parent.graph.initializers.items():
        sub.initializers.setdefault(name, arr)
    # Initializers referenced only inside this body are not runtime params
    # of the parent (split_params does not descend into subgraphs):
    # materialize them as trace-time constants.
    for name, arr in sub.initializers.items():
        if name not in env:
            env[name] = jnp.asarray(arr)
    for node in sub.nodes:
        lower_node(child, node)
    return [env[o] for o in sub.output_names]


@register("If")
def if_op(ctx: Ctx, node: Node):
    then_g = node.attr("then_branch")
    else_g = node.attr("else_branch")
    if not isinstance(then_g, Graph) or not isinstance(else_g, Graph):
        raise NotSupportedError("If without subgraph branches")
    cond_static = ctx.static(node.inputs[0], required=False)
    if cond_static is not None:
        branch = then_g if bool(np.asarray(cond_static).reshape(-1)[0]) else else_g
        outs = _run_subgraph(ctx, branch, [])
        for name, val in zip(node.outputs, outs):
            ctx.set(name, val)
        return
    cond = ctx.get(node.inputs[0]).reshape(())

    def make(branch):
        def f(_):
            return tuple(_run_subgraph(ctx, branch, []))

        return f

    outs = jax.lax.cond(cond, make(then_g), make(else_g), operand=None)
    for name, val in zip(node.outputs, outs):
        ctx.set(name, val)


@register("Loop")
def loop_op(ctx: Ctx, node: Node):
    """ONNX Loop with a STATIC trip count: inputs (M, cond, v_initial...).
    Body signature: (iter_num, cond_in, v...) -> (cond_out, v..., scan_outs...).
    Requires M constant and the body's cond_out to be the constant True
    pattern (early-break loops are data-dependent shapes — rejected)."""
    body: Graph = node.attr("body")
    if not isinstance(body, Graph):
        raise NotSupportedError("Loop without body graph")
    m_static = ctx.static(node.inputs[0], required=False) if node.inputs[0] else None
    if m_static is None:
        # Dynamic/absent trip count: run as lax.while_loop on the body's own
        # condition. Requires a shape-invariant body and no scan outputs
        # (those would be dynamically sized).
        carried_in = [ctx.get(n) for n in node.inputs[2:]]
        n_carried = len(carried_in)
        if len(node.outputs) != n_carried:
            raise NotSupportedError("dynamic Loop with scan outputs")
        max_iter = jnp.iinfo(jnp.int32).max
        if node.inputs[0]:
            max_iter = ctx.get(node.inputs[0]).reshape(()).astype(jnp.int32)
        cond0 = (ctx.get(node.inputs[1]).reshape(())
                 if node.inputs[1] else jnp.asarray(True))

        def cond_fn(state):
            i, c, *_ = state
            return jnp.logical_and(c, i < max_iter)

        def body_fn(state):
            i, _, *carried = state
            outs = _run_subgraph(
                ctx, body,
                [i.astype(jnp.int32), jnp.asarray(True)] + list(carried))
            return (i + 1, outs[0].reshape(()), *outs[1:1 + n_carried])

        final = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.asarray(0, jnp.int32), cond0, *carried_in))
        for name, val in zip(node.outputs, final[2:]):
            ctx.set(name, val)
        return
    trip = int(np.asarray(m_static).reshape(-1)[0])
    carried_in = [ctx.get(n) for n in node.inputs[2:]]
    n_carried = len(carried_in)
    n_scan = len(node.outputs) - n_carried

    def body_fn(i, carried):
        outs = _run_subgraph(
            ctx, body,
            [jnp.asarray(i, jnp.int32), jnp.asarray(True)] + list(carried),
        )
        return outs[1:1 + n_carried], outs[1 + n_carried:]

    carried = carried_in
    scans: list[list] = [[] for _ in range(n_scan)]
    # static unroll (trip counts in exported models are small); a fori_loop
    # variant would need identical pytree shapes which unrolling sidesteps
    for i in range(trip):
        carried, scan_outs = body_fn(i, carried)
        for j, so in enumerate(scan_outs):
            scans[j].append(so)
    for name, val in zip(node.outputs[:n_carried], carried):
        ctx.set(name, val)
    for name, vals in zip(node.outputs[n_carried:], scans):
        ctx.set(name, jnp.stack(vals) if vals else jnp.zeros((0,)))


# -- RNN family -----------------------------------------------------------


def _direction(node: Node) -> str:
    d = node.attr("direction", "forward")
    return d.decode() if isinstance(d, bytes) else d


def _rnn_common(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])          # (T, B, I)
    w = ctx.get(node.inputs[1])          # (D, gates*H, I)
    r = ctx.get(node.inputs[2])          # (D, gates*H, H)
    b = ctx.get(node.inputs[3]) if len(node.inputs) > 3 and node.inputs[3] else None
    seq_lens = (ctx.get(node.inputs[4])
                if len(node.inputs) > 4 and node.inputs[4] else None)
    return x, w, r, b, seq_lens


_RNN_ACTS = {
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Relu": jax.nn.relu,
    "Softsign": jax.nn.soft_sign,
    "Softplus": jax.nn.softplus,
}


def _rnn_activations(node: Node, directions: int, defaults: list[str]):
    """Resolve the per-direction activation function list, rejecting
    activations outside the supported (unparameterized) set."""
    acts = node.attr("activations") or []
    acts = [a.decode() if isinstance(a, bytes) else a for a in acts]
    if not acts:
        acts = defaults * directions
    if len(acts) == len(defaults) and directions == 2:
        acts = acts * 2
    if len(acts) != len(defaults) * directions:
        raise NotSupportedError(
            f"{node.op_type}: expected {len(defaults) * directions} activations, "
            f"got {acts}")
    fns = []
    for a in acts:
        if a not in _RNN_ACTS:
            raise NotSupportedError(
                f"{node.op_type} activation {a!r} not supported "
                f"(supported: {sorted(_RNN_ACTS)})")
        fns.append(_RNN_ACTS[a])
    k = len(defaults)
    return [fns[d * k:(d + 1) * k] for d in range(directions)]


def _clip_fn(node: Node):
    c = node.attr("clip")
    if c is None:
        return lambda v: v
    c = float(c)
    return lambda v: jnp.clip(v, -c, c)


def _seq_reverse(x, seq_lens):
    """Reverse each batch sequence within its own valid length, leaving
    padding frames in place (an involution, so it also un-reverses)."""
    T = x.shape[0]
    t_idx = jnp.arange(T)[:, None]                     # (T, 1)
    lens = seq_lens[None, :].astype(jnp.int32)         # (1, B)
    idx = jnp.where(t_idx < lens, lens - 1 - t_idx, t_idx)  # (T, B)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)),
                               axis=0)


def _scan_rnn(step, x, init_carry, reverse=False, seq_lens=None):
    """lax.scan over time. With seq_lens (B,), frames at/past each sequence's
    end neither update the carry nor emit output (ONNX zero-pads Y there);
    reverse order reverses each sequence within its own valid length."""
    if seq_lens is None:
        xs = jnp.flip(x, 0) if reverse else x
        carry, ys = jax.lax.scan(step, init_carry, xs)
        if reverse:
            ys = jnp.flip(ys, 0)
        return carry, ys
    T = x.shape[0]
    xs = _seq_reverse(x, seq_lens) if reverse else x
    mask_t = jnp.arange(T)[:, None] < seq_lens[None, :]  # (T, B)

    def masked_step(carry, xt_m):
        xt, m = xt_m
        new_carry, y = step(carry, xt)
        mm = m[:, None]
        new_carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(mm, n, o), new_carry, carry)
        return new_carry, jnp.where(mm, y, jnp.zeros((), y.dtype))

    carry, ys = jax.lax.scan(masked_step, init_carry, (xs, mask_t))
    if reverse:
        ys = _seq_reverse(ys, seq_lens)
    return carry, ys


@register("LSTM", since=7)
def lstm(ctx: Ctx, node: Node):
    x, w, r, b, seq_lens = _rnn_common(ctx, node)
    hidden = int(node.attr("hidden_size"))
    T, B, _ = x.shape
    directions = w.shape[0]
    direction = _direction(node)
    h0_all = ctx.get(node.inputs[5]) if len(node.inputs) > 5 and node.inputs[5] else None
    c0_all = ctx.get(node.inputs[6]) if len(node.inputs) > 6 and node.inputs[6] else None
    p_all = ctx.get(node.inputs[7]) if len(node.inputs) > 7 and node.inputs[7] else None
    acts = _rnn_activations(node, directions, ["Sigmoid", "Tanh", "Tanh"])
    clip = _clip_fn(node)

    def one_direction(d, reverse):
        wi = w[d]
        ri = r[d]
        f_act, g_act, h_act = acts[d]
        if b is not None:
            bi = b[d][: 4 * hidden] + b[d][4 * hidden:]
        else:
            bi = jnp.zeros((4 * hidden,), x.dtype)
        h0 = h0_all[d] if h0_all is not None else jnp.zeros((B, hidden), x.dtype)
        c0 = c0_all[d] if c0_all is not None else jnp.zeros((B, hidden), x.dtype)
        if p_all is not None:
            pi, po, pf = jnp.split(p_all[d], 3)  # ONNX peephole order iof
        else:
            pi = po = pf = None

        def step(carry, xt):
            h, c = carry
            gates = xt @ wi.T + h @ ri.T + bi
            i_g, o_g, f_g, c_g = jnp.split(gates, 4, axis=-1)  # ONNX order iofc
            if pi is not None:
                i_g = i_g + pi * c
                f_g = f_g + pf * c
            i_g = f_act(clip(i_g))
            f_g = f_act(clip(f_g))
            c_g = g_act(clip(c_g))
            c_new = f_g * c + i_g * c_g
            if po is not None:
                o_g = o_g + po * c_new
            o_g = f_act(clip(o_g))
            h_new = o_g * h_act(c_new)
            return (h_new, c_new), h_new

        (h_f, c_f), ys = _scan_rnn(step, x, (h0, c0), reverse, seq_lens)
        return ys, h_f, c_f

    if direction == "bidirectional":
        ys_f, h_f, c_f = one_direction(0, False)
        ys_b, h_b, c_b = one_direction(1, True)
        y = jnp.stack([ys_f, ys_b], axis=1)      # (T, D, B, H)
        h_n = jnp.stack([h_f, h_b])
        c_n = jnp.stack([c_f, c_b])
    else:
        ys, h_f, c_f = one_direction(0, direction == "reverse")
        y = ys[:, None]                           # (T, 1, B, H)
        h_n = h_f[None]
        c_n = c_f[None]
    if node.outputs and node.outputs[0]:
        ctx.set(node.outputs[0], y)
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], h_n)
    if len(node.outputs) > 2 and node.outputs[2]:
        ctx.set(node.outputs[2], c_n)


@register("GRU", since=7)
def gru(ctx: Ctx, node: Node):
    x, w, r, b, seq_lens = _rnn_common(ctx, node)
    hidden = int(node.attr("hidden_size"))
    T, B, _ = x.shape
    directions = w.shape[0]
    direction = _direction(node)
    linear_before_reset = int(node.attr("linear_before_reset", 0))
    h0_all = ctx.get(node.inputs[5]) if len(node.inputs) > 5 and node.inputs[5] else None
    acts = _rnn_activations(node, directions, ["Sigmoid", "Tanh"])
    clip = _clip_fn(node)

    def one_direction(d, reverse):
        wi, ri = w[d], r[d]
        f_act, g_act = acts[d]
        wb = b[d][: 3 * hidden] if b is not None else jnp.zeros((3 * hidden,), x.dtype)
        rb = b[d][3 * hidden:] if b is not None else jnp.zeros((3 * hidden,), x.dtype)
        h0 = h0_all[d] if h0_all is not None else jnp.zeros((B, hidden), x.dtype)

        def step(h, xt):
            gi = xt @ wi.T + wb   # (B, 3H) order zrh
            gh = h @ ri.T + rb
            z = f_act(clip(gi[:, :hidden] + gh[:, :hidden]))
            rt = f_act(clip(gi[:, hidden:2 * hidden] + gh[:, hidden:2 * hidden]))
            if linear_before_reset:
                n = g_act(clip(gi[:, 2 * hidden:] + rt * gh[:, 2 * hidden:]))
            else:
                n = g_act(clip(gi[:, 2 * hidden:] + (rt * h) @ ri[2 * hidden:].T
                               + rb[2 * hidden:]))
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        h_f, ys = _scan_rnn(step, x, h0, reverse, seq_lens)
        return ys, h_f

    if direction == "bidirectional":
        ys_f, h_f = one_direction(0, False)
        ys_b, h_b = one_direction(1, True)
        y = jnp.stack([ys_f, ys_b], axis=1)
        h_n = jnp.stack([h_f, h_b])
    else:
        ys, h_f = one_direction(0, direction == "reverse")
        y = ys[:, None]
        h_n = h_f[None]
    if node.outputs and node.outputs[0]:
        ctx.set(node.outputs[0], y)
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], h_n)


@register("RNN", since=7)
def rnn(ctx: Ctx, node: Node):
    x, w, r, b, seq_lens = _rnn_common(ctx, node)
    hidden = int(node.attr("hidden_size"))
    T, B, _ = x.shape
    directions = w.shape[0]
    direction = _direction(node)
    h0_all = ctx.get(node.inputs[5]) if len(node.inputs) > 5 and node.inputs[5] else None
    acts = _rnn_activations(node, directions, ["Tanh"])
    clip = _clip_fn(node)

    def one_direction(d, reverse):
        wi, ri = w[d], r[d]
        bi = (b[d][:hidden] + b[d][hidden:]) if b is not None else jnp.zeros((hidden,), x.dtype)
        h0 = h0_all[d] if h0_all is not None else jnp.zeros((B, hidden), x.dtype)
        act = acts[d][0]

        def step(h, xt):
            h_new = act(clip(xt @ wi.T + h @ ri.T + bi))
            return h_new, h_new

        h_f, ys = _scan_rnn(step, x, h0, reverse, seq_lens)
        return ys, h_f

    if direction == "bidirectional":
        ys_f, h_f = one_direction(0, False)
        ys_b, h_b = one_direction(1, True)
        y = jnp.stack([ys_f, ys_b], axis=1)
        h_n = jnp.stack([h_f, h_b])
    else:
        ys, h_f = one_direction(0, direction == "reverse")
        y = ys[:, None]
        h_n = h_f[None]
    if node.outputs and node.outputs[0]:
        ctx.set(node.outputs[0], y)
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], h_n)


@register("Scan", since=9)
def scan_op(ctx: Ctx, node: Node):
    """ONNX Scan: body applied per slice of the scan inputs (axis 0 by
    default), threading state variables. Unrolled at trace time (scan
    lengths are static), sharing the Loop subgraph machinery."""
    body: Graph = node.attr("body")
    if not isinstance(body, Graph):
        raise NotSupportedError("Scan without body graph")
    n_state = int(node.attr("num_scan_inputs", 0))
    # ONNX: inputs = [state_0..state_{M-1}, scan_0..scan_{N-1}]
    n_scan = int(node.attr("num_scan_inputs"))
    n_state = len(node.inputs) - n_scan
    if node.attr("scan_input_axes") or node.attr("scan_output_axes") or \
            node.attr("scan_input_directions") or node.attr("scan_output_directions"):
        raise NotSupportedError("Scan with non-default axes/directions")
    states = [ctx.get(n) for n in node.inputs[:n_state]]
    scans = [ctx.get(n) for n in node.inputs[n_state:]]
    trip = scans[0].shape[0]
    n_body_out = len(body.outputs)
    n_scan_out = n_body_out - n_state
    collected: list[list] = [[] for _ in range(n_scan_out)]
    for t in range(trip):
        slices = [s[t] for s in scans]
        outs = _run_subgraph(ctx, body, list(states) + slices)
        states = outs[:n_state]
        for j in range(n_scan_out):
            collected[j].append(outs[n_state + j])
    for name, val in zip(node.outputs[:n_state], states):
        ctx.set(name, val)
    for name, vals in zip(node.outputs[n_state:], collected):
        ctx.set(name, jnp.stack(vals))
