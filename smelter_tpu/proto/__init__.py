import os as _os
import sys as _sys

# protoc emits `import onnx_pb2` style absolute imports for siblings; make the
# generated module importable both as package member and bare name.
_sys.path.insert(0, _os.path.dirname(__file__))
from . import onnx_pb2  # noqa: F401,E402
_sys.path.pop(0)
