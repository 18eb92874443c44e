"""End-to-end serving example: load an ONNX classifier, quantize, serve
over HTTP with continuous batching.

    python examples/serve_classifier.py model.onnx --port 8500
    curl -X POST --data-binary @image.npy -H 'Content-Type: application/npy' \
        http://127.0.0.1:8500/v1/infer
"""

import sys

from smelter_tpu.tools.serve_http import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] + ["--quant", "int8", "--dtype", "bfloat16"]))
