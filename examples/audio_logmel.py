"""Build and run a whisper-style log-mel frontend entirely on-device:
raw 16 kHz PCM in, (frames, 80) log-mel out, one jitted program.

    python examples/audio_logmel.py            # random 1 s clip
    python examples/audio_logmel.py clip.npy   # your own (16000,) f32 array

The STFT lowers to a frame-gather + DFT-basis matmul (MXU-friendly), and
the Hann window + mel filterbank constant-fold into initializers — see
smelter_tpu/ops/signal_ops.py.
"""

import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS"):  # axon plugin overrides the env var
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import smelter_tpu as st
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.utils import dtypes as dt


def build_logmel(samples=16000, n_fft=400, hop=160, n_mel=80, sr=16000):
    b = GraphBuilder("logmel", opset=17)
    sig = b.input("audio", (1, samples, 1), dt.FLOAT)
    win = b.node("HannWindow", [b.init(np.array(n_fft, np.int64))])
    spec = b.node("STFT", [sig, b.init(np.array(hop, np.int64)), win])
    power = b.node("ReduceSum", [b.node("Mul", [spec, spec]),
                                 b.init(np.array([-1], np.int64))], keepdims=0)
    mel = b.node("MelWeightMatrix", [
        b.init(np.array(n_mel, np.int64)), b.init(np.array(n_fft, np.int64)),
        b.init(np.array(sr, np.int64)), b.init(np.array(0.0, np.float32)),
        b.init(np.array(sr / 2, np.float32))])
    out = b.node("Log", [b.node("Max", [b.node("MatMul", [power, mel]),
                                        b.init(np.array(1e-10, np.float32))])])
    return b.finish([out])


def main(argv):
    if argv:
        wav = np.load(argv[0]).astype(np.float32).reshape(-1)
    else:
        wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    g = build_logmel(samples=wav.shape[0])
    model = st.compile(g)  # folds window + mel matrix, jits the rest
    logmel = model(wav.reshape(1, -1, 1))[0][0]
    print(f"log-mel: {logmel.shape} (frames x mel), "
          f"range [{logmel.min():.2f}, {logmel.max():.2f}]")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
