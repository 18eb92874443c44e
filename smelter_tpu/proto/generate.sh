#!/bin/sh
# Regenerate onnx_pb2.py from onnx.proto. Committed output is used at runtime.
cd "$(dirname "$0")" && protoc --python_out=. onnx.proto
