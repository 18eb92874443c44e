"""Per-layer quantization error budgets (SURVEY.md §4e; VERDICT r4 #7).

The headline accuracy gate (top-1 Δ ≤ 0.1% vs FP32, BASELINE.md) cannot
run on real pretrained weights in this environment, so these tests pin
the machine-checkable proxy: symmetric round-to-nearest quantization has
an ANALYTIC per-element error bound of scale/2 (0.5 ulp of the quant
step) — per channel for int8/int4-pc, per (group × channel) block for
the grouped modes — and zero clipping error (amax maps to ±qmax
exactly). The end-to-end half asserts logit drift on zoo models stays
within a bound PREDICTED from the per-layer scales, so a quantizer
regression (wrong axis, wrong qmax, asymmetric drift) fails loudly even
though the weights are random.

Reference scope: the reference has no quantization at all (ONNX2MPS.py
--half is a pure fp16 cast); the int8/int4 budget discipline is the
BASELINE.json:5 accuracy-gate mandate.
"""

import numpy as np
import pytest

from smelter_tpu.quant.weight_quant import (
    dequantize_array,
    quantize_array,
    quantize_array_blocked,
    quantize_weights,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


# -- per-layer analytic bounds --------------------------------------------

class TestPerChannelBudget:
    @pytest.mark.parametrize("shape,axis", [
        ((64, 128), 1), ((128, 64), 0), ((32, 16, 3, 3), 0),
    ])
    def test_int8_error_at_most_half_scale(self, shape, axis):
        w = (_rng(1).standard_normal(shape) * 0.2).astype(np.float32)
        q, s = quantize_array(w, axis)
        err = np.abs(w - dequantize_array(q, s))
        # |w - s*round(w/s)| <= s/2 elementwise, channel's own scale
        assert np.all(err <= s * 0.5 + 1e-9)

    def test_int8_no_clipping_at_amax(self):
        # the channel max must be representable exactly: amax/scale = 127
        w = np.array([[1.0, -0.5], [0.25, 3.0]], np.float32)
        q, s = quantize_array(w, 0)
        back = dequantize_array(q, s)
        np.testing.assert_allclose(back[0, 0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(back[1, 1], 3.0, rtol=1e-6)
        assert np.abs(q).max() == 127

    def test_int8_scale_is_per_channel_amax(self):
        w = (_rng(2).standard_normal((16, 64)) *
             np.linspace(0.01, 2.0, 16)[:, None]).astype(np.float32)
        q, s = quantize_array(w, 0)
        amax = np.abs(w).max(axis=1, keepdims=True)
        np.testing.assert_allclose(s, amax / 127.0, rtol=1e-6)
        # relative error per channel <= 1/(2*127) of that channel's amax
        err = np.abs(w - dequantize_array(q, s)).max(axis=1)
        assert np.all(err <= amax[:, 0] / 254.0 + 1e-9)

    def test_zero_channel_safe(self):
        w = np.zeros((4, 8), np.float32)
        w[0] = 0.3
        q, s = quantize_array(w, 0)
        assert np.isfinite(s).all()
        np.testing.assert_array_equal(dequantize_array(q, s)[1:], 0.0)


class TestBlockedBudget:
    @pytest.mark.parametrize("qmax", [7, 127])  # int4 / int8 grouped
    @pytest.mark.parametrize("k_axis", [0, 1])
    def test_grouped_error_at_most_half_scale(self, qmax, k_axis):
        K, N, group = 96, 32, 16
        shape = (K, N) if k_axis == 0 else (N, K)
        w = (_rng(3).standard_normal(shape) * 0.5).astype(np.float32)
        q, s = quantize_array_blocked(w, k_axis, group, qmax)
        # expand the block scales back over the K axis
        rep = np.repeat(s, group, axis=k_axis)
        back = np.asarray(q, np.float32) * rep
        err = np.abs(w - back)
        assert np.all(err <= rep * 0.5 + 1e-9)
        # block scale = block amax / qmax (no clipping anywhere)
        assert np.abs(np.asarray(q, np.float32)).max() <= qmax

    def test_group_vs_channel_budget_ordering(self):
        """At the same bit width, grouped scales are no coarser than the
        whole-column scale: per-block amax <= column amax, so the
        grouped error BUDGET is tighter — the reason int4-g128 holds
        accuracy where int4-pc would not."""
        K, N, group = 128, 16, 32
        w = (_rng(4).standard_normal((K, N)) *
             np.geomspace(0.01, 1.0, K)[:, None]).astype(np.float32)
        qg, sg = quantize_array_blocked(w, 0, group, 127)
        qc, sc = quantize_array(w, axis=1)  # per-output-channel
        # every block budget <= its column budget (broadcast compare)
        assert np.all(sg <= sc.reshape(1, N) + 1e-12)
        # and the realized grouped error respects the tighter budget
        rep = np.repeat(sg, group, axis=0)
        err_g = np.abs(w - np.asarray(qg, np.float32) * rep)
        assert np.all(err_g <= rep * 0.5 + 1e-9)

    def test_ragged_tail_group(self):
        # K not divisible by group: tail block budget still holds
        K, N, group = 40, 8, 16
        w = (_rng(5).standard_normal((K, N))).astype(np.float32)
        q, s = quantize_array_blocked(w, 0, group, 7)
        rep = np.repeat(s, group, axis=0)[:K]
        err = np.abs(w - np.asarray(q, np.float32) * rep)
        assert np.all(err <= rep * 0.5 + 1e-9)


class TestFp16Budget:
    def test_fp16_relative_error_bound(self):
        # RNE fp16 cast: relative error <= 2^-11 for normal values
        w = (_rng(6).standard_normal((64, 64)) * 10).astype(np.float32)
        h = w.astype(np.float16).astype(np.float32)
        rel = np.abs(w - h) / np.maximum(np.abs(w), 1e-6)
        assert rel.max() <= 2.0 ** -11 + 1e-7


# -- graph-level budgets: every DequantizeLinear the rewriter emits ------

def _layer_budgets(graph):
    """For each DequantizeLinear in the graph, reconstruct (orig approx,
    error bound) and assert the stored q/scale pair meets it."""
    checked = 0
    for node in graph.nodes:
        if node.op_type != "DequantizeLinear":
            continue
        q = graph.initializers.get(node.inputs[0])
        s = graph.initializers.get(node.inputs[1])
        if q is None or s is None:
            continue
        qf = np.asarray(q, np.float32)
        group = node.attr("block_size", 0)
        axis = node.attr("axis", 0)
        if group:
            rep = np.repeat(np.asarray(s, np.float32), group, axis=axis)
            rep = rep[tuple(slice(0, d) for d in qf.shape)]
        else:
            shape = [1] * qf.ndim
            shape[axis] = -1
            rep = np.asarray(s, np.float32).reshape(shape)
        # the dequantized weight's distance from ANY fp32 tensor that
        # quantizes to q is <= rep/2; assert the quant grid is sane
        assert np.isfinite(rep).all() and (rep > 0).all()
        qmax = np.abs(qf).max()
        assert qmax <= 127, qmax
        checked += 1
    return checked


@pytest.mark.parametrize("mode", ["int8", "int4", "int8-g32", "int4-g32"])
def test_rewriter_emits_budgeted_layers(mode):
    from smelter_tpu.ir.build import GraphBuilder

    rng = _rng(7)
    b = GraphBuilder("qb", opset=21)
    x = b.input("x", (2, 64))
    w1 = rng.standard_normal((64, 96)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((96, 32)).astype(np.float32) * 0.1
    h = b.node("MatMul", [x, b.init(w1)])
    h = b.node("Relu", [h])
    y = b.node("MatMul", [h, b.init(w2)])
    b.output(y, (2, 32))
    g = b.graph
    origs = {k: v.copy() for k, v in g.initializers.items()}
    quantize_weights(g, mode, min_elements=1)
    assert _layer_budgets(g) == 2
    # per-layer reconstruction error vs the ORIGINAL weights
    for node in g.nodes:
        if node.op_type != "DequantizeLinear":
            continue
        w_name = node.inputs[0]
        orig = origs[w_name]
        qf = np.asarray(g.initializers[w_name], np.float32)
        s = np.asarray(g.initializers[node.inputs[1]], np.float32)
        group = node.attr("block_size", 0)
        axis = node.attr("axis", 0)
        if group:
            rep = np.repeat(s, group, axis=axis)
            rep = rep[tuple(slice(0, d) for d in qf.shape)]
        else:
            shape = [1] * qf.ndim
            shape[axis] = -1
            rep = s.reshape(shape)
        err = np.abs(orig - qf * rep)
        assert np.all(err <= rep * 0.5 + 1e-9), mode


# -- end-to-end logit drift: measured vs PREDICTED from the scales -------

def _halfscale(graph, node):
    """Elementwise error bound rep/2 for one DequantizeLinear node."""
    qf = np.asarray(graph.initializers[node.inputs[0]], np.float32)
    s = np.asarray(graph.initializers[node.inputs[1]], np.float32)
    group = node.attr("block_size", 0)
    axis = node.attr("axis", 0)
    if group:
        rep = np.repeat(s, group, axis=axis)
        rep = rep[tuple(slice(0, d) for d in qf.shape)]
    else:
        shape = [1] * qf.ndim
        shape[axis] = -1
        rep = np.broadcast_to(s.reshape(shape), qf.shape)
    return rep * 0.5


@pytest.mark.parametrize("mode", ["int8", "int4-g32"])
def test_e2e_logit_drift_within_predicted_budget(mode):
    import smelter_tpu as st
    from smelter_tpu.ir.build import GraphBuilder
    from smelter_tpu.runtime.generate import _shallow_clone

    rng = _rng(8)
    K, H, C = 64, 96, 16
    b = GraphBuilder("e2e", opset=21)
    x = b.input("x", (4, K))
    w1 = (rng.standard_normal((K, H)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((H, C)) * 0.1).astype(np.float32)
    h = b.node("MatMul", [x, b.init(w1)])
    h = b.node("Relu", [h])
    y = b.node("MatMul", [h, b.init(w2)])
    b.output(y, (4, C))
    g = b.graph

    xs = rng.uniform(-1, 1, (4, K)).astype(np.float32)
    ex = st.Executor(g)
    ref = np.asarray(ex.build_fn()(ex.init_params(), xs)[0])

    gq = _shallow_clone(g)
    quantize_weights(gq, mode, min_elements=1)
    exq = st.Executor(gq)
    got = np.asarray(exq.build_fn()(exq.init_params(), xs)[0])

    drift = np.abs(ref - got).max()
    # Analytic bound for y = relu(x W1) W2 with |x|_inf <= 1:
    #   |Δh|_j <= Σ_i |x_i| e1_ij <= colsum_j(e1)       (e = rep/2)
    #   |Δy|_c <= Σ_j |Δh_j| |W̃2_jc| + Σ_j |h_j| e2_jc
    # elementwise, with W̃2 the dequantized layer-2 weight.
    deqs = [n for n in gq.nodes if n.op_type == "DequantizeLinear"]
    e1, e2 = (_halfscale(gq, n) for n in deqs)
    w2_tilde = np.abs(w2) + e2  # |W̃2| <= |W2| + e2 elementwise
    h_ref = np.maximum(xs @ w1, 0)
    dh = e1.sum(axis=0)                       # (H,) per-unit bound
    predicted = (dh @ w2_tilde + np.abs(h_ref).max(axis=0) @ e2).max()
    assert drift <= predicted + 1e-6, (drift, predicted)
    rng_span = ref.max() - ref.min()
    frac = drift / rng_span
    cap = 0.02 if mode == "int8" else 0.08
    assert frac < cap, (mode, frac)
    # argmax parity per row (the top-1 proxy on random weights)
    flips = (ref.argmax(1) != got.argmax(1)).sum()
    assert flips == 0, f"{mode}: {flips}/4 argmax flips"


@pytest.mark.parametrize("mode", ["int8", "int4-g64"])
def test_zoo_mobilenet_argmax_parity_and_drift(mode):
    """The zoo gate the accuracy harness runs, as a pinned budget test:
    tiny-MobileNetV2, random weights, 32 random inputs — argmax parity
    >= 31/32 and relative logit drift under 5%/12% (int8/int4)."""
    import smelter_tpu as st
    from smelter_tpu.models import mobilenet_v2
    from smelter_tpu.runtime.generate import _shallow_clone

    g, _tm, shape = mobilenet_v2.build(8, 64, width_mult=0.35,
                                       num_classes=10)
    rng = _rng(9)
    xs = rng.standard_normal((4,) + tuple(shape[1:])).astype(np.float32)
    ex = st.Executor(g)
    ref = np.asarray(ex.build_fn()(ex.init_params(), xs)[0])

    gq = _shallow_clone(g)
    quantize_weights(gq, mode, min_elements=256)
    nq = sum(n.op_type == "DequantizeLinear" for n in gq.nodes)
    assert nq >= 10, f"only {nq} layers quantized"
    exq = st.Executor(gq)
    got = np.asarray(exq.build_fn()(exq.init_params(), xs)[0])

    flips = (ref.argmax(1) != got.argmax(1)).sum()
    assert flips == 0, f"{mode}: {flips}/4 argmax flips"
    drift = np.abs(ref - got).max() / (ref.max() - ref.min())
    cap = 0.05 if mode == "int8" else 0.12
    assert drift < cap, (mode, drift)
