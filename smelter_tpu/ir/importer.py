"""ONNX protobuf -> typed IR importer (and IR -> protobuf exporter).

Capability parity with the reference's model-load path (reference:
Sources/Smelter/ONNXGraph.swift:95-108 — protobuf decode, producer-name
format detection, initializer caching) but producing the typed IR in
graph.py instead of walking raw protos. The exporter is the write side the
reference's offline tool needed (reference: ONNX2MPS.py:80-100 re-emits the
model with a new producer name so the runtime can detect the preprocessed
flavor; we keep that convention via Graph.producer / metadata).
"""

from __future__ import annotations

import os
from typing import Any

from ..proto import onnx_pb2 as onnx
from .errors import ImportError_
from .graph import Graph, Node, TensorType, ValueInfo
from .tensor_codec import numpy_to_tensor, tensor_to_numpy

# Producer tag written by our offline preprocessor; the runtime detects it
# the way the reference detects producerName == "ONNX2MPS"
# (reference: ONNXGraph.swift:99-100, ONNX2MPS.py:98).
PREPROCESSED_PRODUCER = "smelter-tpu"

AttrT = onnx.AttributeProto.AttributeType


def _decode_attr(a: onnx.AttributeProto) -> Any:
    t = a.type
    if t == AttrT.FLOAT:
        return float(a.f)
    if t == AttrT.INT:
        return int(a.i)
    if t == AttrT.STRING:
        try:
            return a.s.decode("utf-8")
        except UnicodeDecodeError:
            return bytes(a.s)
    if t == AttrT.TENSOR:
        return tensor_to_numpy(a.t)
    if t == AttrT.GRAPH:
        return _graph_from_proto(a.g, opset=0)
    if t == AttrT.FLOATS:
        return [float(x) for x in a.floats]
    if t == AttrT.INTS:
        return [int(x) for x in a.ints]
    if t == AttrT.STRINGS:
        return [s.decode("utf-8", "replace") for s in a.strings]
    if t == AttrT.TENSORS:
        return [tensor_to_numpy(x) for x in a.tensors]
    raise ImportError_(f"attribute {a.name!r}: unsupported attr type {t}")


def _encode_attr(name: str, v: Any) -> onnx.AttributeProto:
    import numpy as np

    a = onnx.AttributeProto()
    a.name = name
    if isinstance(v, bool):
        a.type, a.i = AttrT.INT, int(v)
    elif isinstance(v, int):
        a.type, a.i = AttrT.INT, v
    elif isinstance(v, float):
        a.type, a.f = AttrT.FLOAT, v
    elif isinstance(v, str):
        a.type, a.s = AttrT.STRING, v.encode("utf-8")
    elif isinstance(v, bytes):
        a.type, a.s = AttrT.STRING, v
    elif isinstance(v, np.ndarray):
        a.type = AttrT.TENSOR
        a.t.CopyFrom(numpy_to_tensor(v))
    elif isinstance(v, Graph):
        a.type = AttrT.GRAPH
        a.g.CopyFrom(_graph_to_proto(v))
    elif isinstance(v, (list, tuple)):
        if all(isinstance(x, (int, bool)) for x in v):
            a.type = AttrT.INTS
            a.ints.extend(int(x) for x in v)
        elif all(isinstance(x, (int, float)) for x in v):
            a.type = AttrT.FLOATS
            a.floats.extend(float(x) for x in v)
        elif all(isinstance(x, str) for x in v):
            a.type = AttrT.STRINGS
            a.strings.extend(x.encode("utf-8") for x in v)
        else:
            raise ImportError_(f"attribute {name!r}: mixed list {v!r}")
    else:
        raise ImportError_(f"attribute {name!r}: cannot encode {type(v)}")
    return a


def _type_from_proto(t: onnx.TypeProto) -> TensorType | None:
    if not t.HasField("tensor_type"):
        return None
    tt = t.tensor_type
    dims: list[int | str | None] = []
    for d in tt.shape.dim:
        which = d.WhichOneof("value")
        if which == "dim_value":
            dims.append(int(d.dim_value))
        elif which == "dim_param":
            dims.append(d.dim_param)
        else:
            dims.append(None)
    return TensorType(dtype=tt.elem_type, shape=tuple(dims))


def _type_to_proto(t: TensorType) -> onnx.TypeProto:
    tp = onnx.TypeProto()
    tp.tensor_type.elem_type = t.dtype
    for d in t.shape:
        dim = tp.tensor_type.shape.dim.add()
        if isinstance(d, int):
            dim.dim_value = d
        elif isinstance(d, str):
            dim.dim_param = d
    return tp


def _graph_from_proto(gp: onnx.GraphProto, opset: int,
                      base_dir: str | None = None) -> Graph:
    g = Graph(name=gp.name or "graph", opset=opset)
    for tp in gp.initializer:
        g.initializers[tp.name] = tensor_to_numpy(tp, base_dir)
    for vi in gp.input:
        if vi.name in g.initializers:
            continue  # older exporters list initializers as inputs too
        g.inputs.append(ValueInfo(vi.name, _type_from_proto(vi.type)))
    for vi in gp.output:
        g.outputs.append(ValueInfo(vi.name, _type_from_proto(vi.type)))
    for vi in gp.value_info:
        t = _type_from_proto(vi.type)
        if t is not None:
            g.value_types[vi.name] = t
    for np_ in gp.node:
        g.nodes.append(
            Node(
                op_type=np_.op_type,
                inputs=list(np_.input),
                outputs=list(np_.output),
                attrs={a.name: _decode_attr(a) for a in np_.attribute},
                name=np_.name,
                domain=np_.domain,
            )
        )
    return g


def _graph_to_proto(g: Graph) -> onnx.GraphProto:
    gp = onnx.GraphProto()
    gp.name = g.name
    for name, arr in g.initializers.items():
        gp.initializer.append(numpy_to_tensor(arr, name))
    for vi in g.inputs:
        p = gp.input.add()
        p.name = vi.name
        if vi.type is not None:
            p.type.CopyFrom(_type_to_proto(vi.type))
    for vi in g.outputs:
        p = gp.output.add()
        p.name = vi.name
        if vi.type is not None:
            p.type.CopyFrom(_type_to_proto(vi.type))
    for name, t in g.value_types.items():
        p = gp.value_info.add()
        p.name = name
        p.type.CopyFrom(_type_to_proto(t))
    for n in g.nodes:
        np_ = gp.node.add()
        np_.op_type = n.op_type
        np_.input.extend(n.inputs)
        np_.output.extend(n.outputs)
        np_.name = n.name
        np_.domain = n.domain
        for k, v in n.attrs.items():
            np_.attribute.append(_encode_attr(k, v))
    return gp


def import_model(data: bytes, base_dir: str | None = None) -> Graph:
    """Parse serialized ONNX ModelProto bytes into the typed IR. base_dir
    resolves external-data weight files (defaults to the model's dir when
    loading via load_model)."""
    mp = onnx.ModelProto()
    try:
        mp.ParseFromString(data)
    except Exception as e:  # protobuf DecodeError
        raise ImportError_(f"could not parse ONNX model: {e}") from e
    if not mp.HasField("graph"):
        raise ImportError_("model has no graph")
    opset = 17
    for osi in mp.opset_import:
        if osi.domain in ("", "ai.onnx"):
            opset = int(osi.version)
    if mp.functions:
        from .functions import inline_functions

        inline_functions(mp)
    g = _graph_from_proto(mp.graph, opset=opset, base_dir=base_dir)
    g.producer = mp.producer_name
    g.metadata = {p.key: p.value for p in mp.metadata_props}
    g.toposort()
    return g


def load_model(path: str | os.PathLike) -> Graph:
    with open(path, "rb") as f:
        return import_model(f.read(), base_dir=os.path.dirname(os.fspath(path)) or ".")


def export_model(g: Graph, producer: str | None = None) -> bytes:
    """Serialize the IR back to ONNX ModelProto bytes."""
    mp = onnx.ModelProto()
    mp.ir_version = 8
    osi = mp.opset_import.add()
    osi.domain = ""
    osi.version = g.opset
    mp.producer_name = producer if producer is not None else (g.producer or "smelter-tpu")
    mp.graph.CopyFrom(_graph_to_proto(g))
    for k, v in g.metadata.items():
        p = mp.metadata_props.add()
        p.key, p.value = k, v
    return mp.SerializeToString()


def save_model(g: Graph, path: str | os.PathLike, producer: str | None = None) -> None:
    with open(path, "wb") as f:
        f.write(export_model(g, producer))
