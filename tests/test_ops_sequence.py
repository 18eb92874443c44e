"""Sequence ops (smelter_tpu/ops/sequence_ops.py): tuple-valued edges with
trace-time-static structure, plus the Optional trio. Sequences never cross
the graph boundary in these tests — they are constructed, manipulated, and
collapsed back to tensors in-graph, which is how real exporters use them
(e.g. torch unbind/list-append patterns)."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.ir.errors import NotSupportedError


def compiled(b, outs, *x):
    single = isinstance(outs, str)
    g = b.finish([outs] if single else list(outs))
    g = st.import_model(st.export_model(g))
    res = st.CompiledModel(g)(*x)
    return res[0] if single else res


def test_construct_at_length():
    rng = np.random.default_rng(0)
    a, c = (rng.standard_normal((2, 3)).astype(np.float32) for _ in range(2))
    b = GraphBuilder("t", opset=13)
    ai, ci = b.input("a", a.shape), b.input("c", c.shape)
    seq = b.node("SequenceConstruct", [ai, ci])
    at = b.node("SequenceAt", [seq, b.init(np.array(-1, np.int64))])
    ln = b.node("SequenceLength", [seq])
    out_at, out_len = compiled(b, [at, ln], a, c)
    np.testing.assert_array_equal(out_at, c)
    assert int(out_len) == 2


def test_split_concat_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 4)).astype(np.float32)
    b = GraphBuilder("t", opset=13)
    xi = b.input("x", x.shape)
    seq = b.node("SplitToSequence", [xi, b.init(np.array([1, 2, 3], np.int64))],
                 axis=0)
    out = b.node("ConcatFromSequence", [seq], axis=0)
    got = compiled(b, out, x)
    np.testing.assert_array_equal(got, x)


def test_split_default_keepdims0_then_stack():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    b = GraphBuilder("t", opset=13)
    xi = b.input("x", x.shape)
    seq = b.node("SplitToSequence", [xi], axis=0, keepdims=0)  # 3 x (4,)
    out = b.node("ConcatFromSequence", [seq], axis=0, new_axis=1)  # stack back
    got = compiled(b, out, x)
    np.testing.assert_array_equal(got, x)


def test_insert_erase():
    rng = np.random.default_rng(3)
    a, c, d = (rng.standard_normal((2,)).astype(np.float32) for _ in range(3))
    b = GraphBuilder("t", opset=13)
    ai, ci, di = (b.input(n, (2,)) for n in "acd")
    seq = b.node("SequenceConstruct", [ai, ci])
    seq = b.node("SequenceInsert", [seq, di, b.init(np.array(1, np.int64))])
    seq = b.node("SequenceErase", [seq, b.init(np.array(0, np.int64))])
    out = b.node("ConcatFromSequence", [seq], axis=0)  # [d, c]
    got = compiled(b, out, a, c, d)
    np.testing.assert_array_equal(got, np.concatenate([d, c]))


def test_empty_sequence_insert():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((3,)).astype(np.float32)
    b = GraphBuilder("t", opset=13)
    ai = b.input("a", a.shape)
    seq = b.node("SequenceEmpty", [])
    seq = b.node("SequenceInsert", [seq, ai])  # append, no position
    out = b.node("ConcatFromSequence", [seq], axis=0)
    np.testing.assert_array_equal(compiled(b, out, a), a)


def test_dynamic_position_rejected():
    """A runtime-computed position must raise, not mis-lower."""
    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 2)).astype(np.float32)
    b = GraphBuilder("t", opset=13)
    ai = b.input("a", a.shape)
    pi = b.input("pos", (), 7)  # int64 graph input: NOT static
    seq = b.node("SequenceConstruct", [ai, ai])
    at = b.node("SequenceAt", [seq, pi])
    g = b.finish([at])
    with pytest.raises((NotSupportedError, Exception)):
        st.CompiledModel(g)(a, np.array(0, np.int64))


def test_optional_roundtrip():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 2)).astype(np.float32)
    b = GraphBuilder("t", opset=15)
    xi = b.input("x", x.shape)
    opt = b.node("Optional", [xi])
    has = b.node("OptionalHasElement", [opt])
    val = b.node("OptionalGetElement", [opt])
    out_has, out_val = compiled(b, [has, val], x)
    assert bool(out_has)
    np.testing.assert_array_equal(out_val, x)


def test_sequence_through_layout_pass():
    """Sequence-op graphs must survive the full default pipeline + NHWC
    layout (sequence edges have no TensorType; barriers must not choke)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    w = rng.standard_normal((4, 4, 3, 3)).astype(np.float32)
    b = GraphBuilder("t", opset=13)
    xi = b.input("x", x.shape)
    h = b.conv(xi, w, pads=(1, 1, 1, 1))
    seq = b.node("SplitToSequence", [h, b.init(np.array([2, 2], np.int64))],
                 axis=1)
    out = b.node("ConcatFromSequence", [seq], axis=1)
    g = b.finish([out])
    want = st.CompiledModel(g)(x)[0]
    got = st.compile(g)(x)[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
