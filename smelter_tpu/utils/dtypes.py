"""Dtype registry: ONNX TensorProto.DataType codes <-> numpy/jax dtypes.

Plays the role of the reference's dtype plumbing (reference:
Sources/Smelter/Onnx_TensorProto+Extensions.swift:2-66 decodes int/float/
fp16/double payloads; Sources/Smelter/Float16.swift:17-77 converts fp16).
On TPU we additionally care about bfloat16 (native MXU dtype) and int8
(weight-only quantization), so those are first-class here.
"""

from __future__ import annotations

import ml_dtypes
import numpy as np

# ONNX TensorProto.DataType codes (public ONNX spec).
UNDEFINED = 0
FLOAT = 1
UINT8 = 2
INT8 = 3
UINT16 = 4
INT16 = 5
INT32 = 6
INT64 = 7
STRING = 8
BOOL = 9
FLOAT16 = 10
DOUBLE = 11
UINT32 = 12
UINT64 = 13
COMPLEX64 = 14
COMPLEX128 = 15
BFLOAT16 = 16
FLOAT8E4M3FN = 17
FLOAT8E4M3FNUZ = 18
FLOAT8E5M2 = 19
FLOAT8E5M2FNUZ = 20
UINT4 = 21
INT4 = 22

_ONNX_TO_NUMPY = {
    FLOAT: np.dtype(np.float32),
    UINT8: np.dtype(np.uint8),
    INT8: np.dtype(np.int8),
    UINT16: np.dtype(np.uint16),
    INT16: np.dtype(np.int16),
    INT32: np.dtype(np.int32),
    INT64: np.dtype(np.int64),
    BOOL: np.dtype(np.bool_),
    FLOAT16: np.dtype(np.float16),
    DOUBLE: np.dtype(np.float64),
    UINT32: np.dtype(np.uint32),
    UINT64: np.dtype(np.uint64),
    COMPLEX64: np.dtype(np.complex64),
    COMPLEX128: np.dtype(np.complex128),
    BFLOAT16: np.dtype(ml_dtypes.bfloat16),
    FLOAT8E4M3FN: np.dtype(ml_dtypes.float8_e4m3fn),
    FLOAT8E4M3FNUZ: np.dtype(ml_dtypes.float8_e4m3fnuz),
    FLOAT8E5M2: np.dtype(ml_dtypes.float8_e5m2),
    FLOAT8E5M2FNUZ: np.dtype(ml_dtypes.float8_e5m2fnuz),
    UINT4: np.dtype(ml_dtypes.uint4),
    INT4: np.dtype(ml_dtypes.int4),
}

_NUMPY_TO_ONNX = {v: k for k, v in _ONNX_TO_NUMPY.items()}

_NAMES = {
    UNDEFINED: "undefined",
    FLOAT: "float32",
    UINT8: "uint8",
    INT8: "int8",
    UINT16: "uint16",
    INT16: "int16",
    INT32: "int32",
    INT64: "int64",
    STRING: "string",
    BOOL: "bool",
    FLOAT16: "float16",
    DOUBLE: "float64",
    UINT32: "uint32",
    UINT64: "uint64",
    COMPLEX64: "complex64",
    COMPLEX128: "complex128",
    BFLOAT16: "bfloat16",
    FLOAT8E4M3FN: "float8_e4m3fn",
    FLOAT8E4M3FNUZ: "float8_e4m3fnuz",
    FLOAT8E5M2: "float8_e5m2",
    FLOAT8E5M2FNUZ: "float8_e5m2fnuz",
    UINT4: "uint4",
    INT4: "int4",
}


def onnx_to_numpy_dtype(code: int) -> np.dtype:
    try:
        return _ONNX_TO_NUMPY[code]
    except KeyError:
        raise ValueError(f"unsupported ONNX dtype code {code} ({_NAMES.get(code, '?')})")


def numpy_to_onnx_dtype(dtype) -> int:
    dtype = np.dtype(dtype)
    try:
        return _NUMPY_TO_ONNX[dtype]
    except KeyError:
        raise ValueError(f"numpy dtype {dtype} has no ONNX code")


def dtype_name(code: int) -> str:
    return _NAMES.get(code, f"dtype<{code}>")


def is_float(code: int) -> bool:
    return code in (FLOAT, FLOAT16, DOUBLE, BFLOAT16, FLOAT8E4M3FN,
                    FLOAT8E4M3FNUZ, FLOAT8E5M2, FLOAT8E5M2FNUZ)


def itemsize(code: int) -> int:
    return onnx_to_numpy_dtype(code).itemsize
