"""TensorProto <-> numpy codec.

The reference decodes TensorProto payloads (typed repeated fields *or*
raw_data, any int/float/fp16/double dtype) into host arrays (reference:
Sources/Smelter/Onnx_TensorProto+Extensions.swift:2-66 and
Sources/Smelter/Extensions/Foundation/Data+Extensions.swift:4-24).
This module is the same capability over numpy: zero-copy reinterpret of
raw_data when possible, typed-field fallback, fp16/bf16 aware.

int4/uint4: the ONNX wire format packs two elements per byte (low nibble
first, ceil(n/2) bytes); this codec WRITES packed per spec and READS both
packed and the one-byte-per-element form older engine artifacts used.
"""

from __future__ import annotations

import numpy as np

from ..proto import onnx_pb2 as onnx
from ..utils import dtypes as dt
from .errors import ImportError_

# ONNX stores some narrow dtypes widened inside int32_data.
_INT32_CARRIED = {dt.UINT8, dt.INT8, dt.UINT16, dt.INT16, dt.INT32, dt.BOOL, dt.FLOAT16, dt.BFLOAT16}


def _unpack_nibbles(raw: bytes, count: int, signed: bool) -> np.ndarray:
    """ONNX 4-bit packing: element 2i in the low nibble of byte i.
    native.unpack_int4 holds the single implementation (multithreaded C++
    with a numpy fallback inside)."""
    from ..native import unpack_int4

    b = np.frombuffer(raw, dtype=np.uint8, count=(count + 1) // 2)
    return unpack_int4(b, count, signed=signed)


def _decode_int4_raw(raw: bytes, count: int, data_type: int,
                     np_dtype: np.dtype, name: str) -> np.ndarray:
    """Accept both the spec's packed form and the unpacked legacy form."""
    if len(raw) >= count:  # one byte per element (legacy engine artifacts)
        return np.frombuffer(raw, dtype=np_dtype, count=count)
    if len(raw) >= (count + 1) // 2:
        return _unpack_nibbles(raw, count, data_type == dt.INT4).astype(np_dtype)
    raise ImportError_(
        f"tensor {name!r}: int4 payload has {len(raw)} bytes, need "
        f"{(count + 1) // 2} packed or {count} unpacked")


def _read_external(tp: onnx.TensorProto, base_dir: str) -> bytes:
    """ONNX external-data convention: key/value pairs location (relative
    path), offset, length."""
    import os

    info = {p.key: p.value for p in tp.external_data}
    loc = info.get("location")
    if not loc:
        raise ImportError_(f"tensor {tp.name!r}: external data without location")
    path = os.path.join(base_dir, loc)
    if not os.path.exists(path):
        raise ImportError_(
            f"tensor {tp.name!r}: external data file {loc!r} not found next "
            f"to the model")
    offset = int(info.get("offset", 0))
    with open(path, "rb") as f:
        f.seek(offset)
        length = info.get("length")
        return f.read(int(length)) if length is not None else f.read()


def tensor_to_numpy(tp: onnx.TensorProto, base_dir: str | None = None) -> np.ndarray:
    """Decode a TensorProto into a numpy array of the tensor's dtype/shape.
    base_dir resolves ONNX external-data files (weights in side files)."""
    if tp.data_type == dt.STRING:
        raise ImportError_(f"string tensors not supported (tensor {tp.name!r})")
    if tp.data_location == 1:  # EXTERNAL
        if base_dir is None:
            raise ImportError_(
                f"tensor {tp.name!r} uses external data files; load via a "
                f"file path (load_model) so they can be resolved")
        raw = _read_external(tp, base_dir)
        np_dtype = dt.onnx_to_numpy_dtype(tp.data_type)
        shape = tuple(tp.dims)
        count = int(np.prod(shape)) if shape else 1
        if tp.data_type in (dt.INT4, dt.UINT4):
            return _decode_int4_raw(raw, count, tp.data_type, np_dtype,
                                    tp.name).reshape(shape)
        if len(raw) < count * np_dtype.itemsize:
            raise ImportError_(
                f"tensor {tp.name!r}: external payload too short")
        return np.frombuffer(raw, dtype=np_dtype, count=count).reshape(shape)
    np_dtype = dt.onnx_to_numpy_dtype(tp.data_type)
    shape = tuple(tp.dims)
    count = int(np.prod(shape)) if shape else 1

    if tp.raw_data:
        if tp.data_type in (dt.INT4, dt.UINT4):
            return _decode_int4_raw(tp.raw_data, count, tp.data_type,
                                    np_dtype, tp.name).reshape(shape)
        if len(tp.raw_data) < count * np_dtype.itemsize:
            raise ImportError_(
                f"tensor {tp.name!r}: raw_data has {len(tp.raw_data)} bytes, "
                f"shape {shape} ({dt.dtype_name(tp.data_type)}) needs "
                f"{count * np_dtype.itemsize}"
            )
        arr = np.frombuffer(tp.raw_data, dtype=np_dtype, count=count)
    elif tp.data_type == dt.FLOAT:
        arr = np.asarray(tp.float_data, dtype=np.float32)
    elif tp.data_type == dt.DOUBLE:
        arr = np.asarray(tp.double_data, dtype=np.float64)
    elif tp.data_type == dt.INT64:
        arr = np.asarray(tp.int64_data, dtype=np.int64)
    elif tp.data_type in (dt.UINT64, dt.UINT32):
        arr = np.asarray(tp.uint64_data, dtype=np.uint64).astype(np_dtype)
    elif tp.data_type in _INT32_CARRIED:
        raw32 = np.asarray(tp.int32_data, dtype=np.int32)
        if tp.data_type in (dt.FLOAT16, dt.BFLOAT16):
            # fp16/bf16 are stored as their bit patterns in the low 16 bits.
            arr = raw32.astype(np.uint16).view(np_dtype)
        else:
            arr = raw32.astype(np_dtype)
    else:
        raise ImportError_(
            f"tensor {tp.name!r}: no payload for dtype {dt.dtype_name(tp.data_type)}"
        )

    if arr.size != count:
        raise ImportError_(
            f"tensor {tp.name!r}: payload has {arr.size} elements, shape {shape} "
            f"needs {count}"
        )
    return arr.reshape(shape)


def numpy_to_tensor(arr: np.ndarray, name: str = "") -> onnx.TensorProto:
    """Encode a numpy array as a TensorProto using raw_data (compact, fast)."""
    arr = np.asarray(arr, order="C")  # not ascontiguousarray: that promotes 0-d to 1-d
    tp = onnx.TensorProto()
    tp.name = name
    tp.data_type = dt.numpy_to_onnx_dtype(arr.dtype)
    tp.dims.extend(arr.shape)
    if tp.data_type in (dt.INT4, dt.UINT4):
        # pack two-per-byte per the ONNX spec (low nibble = element 2i)
        flat = arr.reshape(-1).view(np.uint8) & 0xF
        if flat.size % 2:
            flat = np.concatenate([flat, np.zeros(1, np.uint8)])
        pair = flat.reshape(-1, 2)
        tp.raw_data = (pair[:, 0] | (pair[:, 1] << 4)).astype(np.uint8).tobytes()
    else:
        tp.raw_data = arr.tobytes()
    return tp
