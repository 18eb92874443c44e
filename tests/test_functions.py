"""Model-local ONNX function (FunctionProto) inlining tests.

Covers ir/functions.py: attribute binding (call attrs, declared defaults,
ref_attr_name in nested subgraphs), call-site prefix uniqueness, nested
function calls, native-lowering precedence, and the recursion guard."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.ir.errors import ImportError_
from smelter_tpu.ir.importer import import_model
from smelter_tpu.ir.tensor_codec import numpy_to_tensor
from smelter_tpu.proto import onnx_pb2 as onnx

AttrT = onnx.AttributeProto.AttributeType


def _node(op, inputs, outputs, domain="", **attrs):
    n = onnx.NodeProto()
    n.op_type = op
    n.domain = domain
    n.input.extend(inputs)
    n.output.extend(outputs)
    for k, v in attrs.items():
        a = n.attribute.add()
        a.name = k
        if isinstance(v, tuple) and v[0] == "ref":
            a.ref_attr_name = v[1]
            a.type = v[2]
        elif isinstance(v, float):
            a.type, a.f = AttrT.FLOAT, v
        elif isinstance(v, int):
            a.type, a.i = AttrT.INT, v
        elif isinstance(v, np.ndarray):
            a.type = AttrT.TENSOR
            a.t.CopyFrom(numpy_to_tensor(v, k))
        elif isinstance(v, onnx.GraphProto):
            a.type = AttrT.GRAPH
            a.g.CopyFrom(v)
        else:
            raise AssertionError(type(v))
    return n


def _model(nodes, functions, in_shape=(2, 3), n_outputs=1):
    mp = onnx.ModelProto()
    mp.ir_version = 10
    osi = mp.opset_import.add()
    osi.domain = ""
    osi.version = 17
    osi = mp.opset_import.add()
    osi.domain = "local"
    osi.version = 1
    gp = mp.graph
    gp.name = "main"
    vi = gp.input.add()
    vi.name = "x"
    vi.type.tensor_type.elem_type = 1
    for d in in_shape:
        vi.type.tensor_type.shape.dim.add().dim_value = d
    for i in range(n_outputs):
        gp.output.add().name = f"y{i}" if n_outputs > 1 else "y"
    gp.node.extend(nodes)
    mp.functions.extend(functions)
    return mp.SerializeToString()


def _func(name, inputs, outputs, nodes, attrs=(), attr_defaults=(),
          domain="local"):
    f = onnx.FunctionProto()
    f.name = name
    f.domain = domain
    f.input.extend(inputs)
    f.output.extend(outputs)
    f.attribute.extend(attrs)
    for k, v in attr_defaults:
        a = f.attribute_proto.add()
        a.name = k
        a.type, a.f = AttrT.FLOAT, v
    f.node.extend(nodes)
    osi = f.opset_import.add()
    osi.domain = ""
    osi.version = 17
    return f


def _leaky(v, alpha):
    return np.where(v > 0, v, alpha * v).astype(np.float32)


class TestFunctionInlining:
    def test_attr_binding_and_two_call_sites(self, rng):
        """Two calls with different alpha; beta comes from the declared
        default on one call and the call site on the other."""
        f = _func(
            "ScaledLeaky", ["X"], ["Y"],
            [_node("LeakyRelu", ["X"], ["t"],
                   alpha=("ref", "alpha", AttrT.FLOAT)),
             _node("LeakyRelu", ["t"], ["Y"],
                   alpha=("ref", "beta", AttrT.FLOAT))],
            attrs=["alpha"], attr_defaults=[("beta", 0.5)])
        nodes = [
            _node("ScaledLeaky", ["x"], ["a"], domain="local", alpha=0.1),
            _node("ScaledLeaky", ["x"], ["b"], domain="local",
                  alpha=0.2, beta=0.25),
            _node("Add", ["a", "b"], ["y"]),
        ]
        g = import_model(_model(nodes, [f]))
        assert all(n.op_type != "ScaledLeaky" for n in g.nodes)
        x = rng.standard_normal((2, 3)).astype(np.float32)
        want = (_leaky(_leaky(x, 0.1), 0.5)
                + _leaky(_leaky(x, 0.2), 0.25))
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0], want,
                                   rtol=1e-6, atol=1e-6)

    def test_nested_function_call(self, rng):
        sq = _func("Square", ["X"], ["Y"],
                   [_node("Mul", ["X", "X"], ["Y"])])
        f = _func("SquarePlus", ["X"], ["Y"],
                  [_node("Square", ["X"], ["s"], domain="local"),
                   _node("Add", ["s", "X"], ["Y"])])
        g = import_model(_model(
            [_node("SquarePlus", ["x"], ["y"], domain="local")], [f, sq]))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0], x * x + x,
                                   rtol=1e-6, atol=1e-6)

    def test_native_lowering_wins_over_function_body(self, rng):
        """A model shipping a function body for a natively-registered
        standard op (here Relu, body=Neg) gets the native lowering."""
        f = _func("Relu", ["X"], ["Y"], [_node("Neg", ["X"], ["Y"])],
                  domain="")
        g = import_model(_model([_node("Relu", ["x"], ["y"])], [f]))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0],
                                   np.maximum(x, 0))

    def test_unregistered_op_uses_function_body(self, rng):
        """Function bodies extend coverage: an op we have no lowering for
        imports and runs via its function definition."""
        f = _func("FancyOp", ["X"], ["Y"],
                  [_node("Sigmoid", ["X"], ["Y"])], domain="")
        g = import_model(_model([_node("FancyOp", ["x"], ["y"])], [f]))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0],
                                   1 / (1 + np.exp(-x)), rtol=1e-5,
                                   atol=1e-6)

    def test_subgraph_in_body_captures_formals_and_refs(self, rng):
        """If branches inside a function body reference the function's
        formal input (outer-scope capture) and resolve ref_attr_name."""
        then_g = onnx.GraphProto()
        then_g.name = "then"
        then_g.node.append(_node("LeakyRelu", ["X"], ["o"],
                                 alpha=("ref", "alpha", AttrT.FLOAT)))
        then_g.output.add().name = "o"
        else_g = onnx.GraphProto()
        else_g.name = "else"
        else_g.node.append(_node("Neg", ["X"], ["o"]))
        else_g.output.add().name = "o"
        f = _func(
            "CondLeaky", ["X"], ["Y"],
            [_node("Constant", [], ["cond"],
                   value=("ref", "flag", AttrT.TENSOR)),
             _node("If", ["cond"], ["Y"], then_branch=then_g,
                   else_branch=else_g)],
            attrs=["alpha", "flag"])
        x = rng.standard_normal((2, 3)).astype(np.float32)
        for flag, want in ((True, _leaky(x, 0.3)), (False, -x)):
            g = import_model(_model(
                [_node("CondLeaky", ["x"], ["y"], domain="local",
                       alpha=0.3, flag=np.asarray(flag))], [f]))
            np.testing.assert_allclose(st.CompiledModel(g)(x)[0], want,
                                       rtol=1e-6, atol=1e-6)

    def test_recursive_function_raises(self):
        f = _func("Rec", ["X"], ["Y"],
                  [_node("Rec", ["X"], ["Y"], domain="local")])
        with pytest.raises(ImportError_, match="depth"):
            import_model(_model(
                [_node("Rec", ["x"], ["y"], domain="local")], [f]))

    def test_optional_unbound_attr_dropped(self, rng):
        """A body attr whose ref has no call binding and no default is
        dropped -> the op's own default applies (LeakyRelu alpha=0.01)."""
        f = _func("L", ["X"], ["Y"],
                  [_node("LeakyRelu", ["X"], ["Y"],
                         alpha=("ref", "alpha", AttrT.FLOAT))],
                  attrs=["alpha"])
        g = import_model(_model(
            [_node("L", ["x"], ["y"], domain="local")], [f]))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0],
                                   _leaky(x, 0.01), rtol=1e-6, atol=1e-6)
