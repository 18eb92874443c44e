"""Whisper-style ASR pipeline end to end: raw PCM -> on-device log-mel ->
speech encoder -> one-dispatch fused decode of the transcript.

    python examples/asr_transcribe.py          # random 1 s clip
    python examples/asr_transcribe.py clip.npy # your (16000,) f32 array

Three engine programs, all static-shape: the log-mel frontend
(ops/signal_ops.py, DFT-as-matmul), the encoder (models/speech_encoder.py),
and the decoder step whose whole greedy loop runs in ONE dispatch with the
encoder memory as a loop-invariant context (runtime/generate.py) —
sampling optionally on-chip (temperature/top_k).
"""

import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS"):  # axon plugin overrides the env var
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import smelter_tpu as st  # noqa: E402
from smelter_tpu.models import speech_decoder, speech_encoder  # noqa: E402
from smelter_tpu.runtime.generate import FusedGenerator  # noqa: E402
from audio_logmel import build_logmel  # noqa: E402  (sibling example)


def main():
    pcm = (np.load(sys.argv[1]) if len(sys.argv) > 1
           else np.random.default_rng(0).standard_normal(16000)).astype(np.float32)

    # 1. on-graph log-mel frontend (STFT as a DFT-basis matmul)
    mel_g = build_logmel(samples=len(pcm))
    mel = st.CompiledModel(mel_g)(pcm.reshape(1, -1, 1))[0]  # (1, frames, 80)
    frames = mel.shape[1]
    print(f"log-mel: {mel.shape}")

    # 2. encoder
    dim = 64
    enc_g, _m, _shape = speech_encoder.build(batch=1, frames=frames,
                                             n_mel=80, dim=dim, heads=4,
                                             depth=2)
    memory = st.CompiledModel(enc_g)(mel)[0][0]  # (frames//2, dim)
    print(f"encoder memory: {memory.shape}")

    # 3. fused decode conditioned on the memory
    step_g, _w = speech_decoder.build_decode_step(
        vocab=64, dim=dim, heads=4, layers=2, max_len=32,
        t_enc=memory.shape[0])
    gen = FusedGenerator(step_g)
    tokens = gen.generate([1], 16, context={"memory": memory})
    print("greedy transcript:", tokens)
    tokens = gen.generate([1], 16, context={"memory": memory},
                          temperature=0.8, top_k=8, seed=7)
    print("sampled transcript:", tokens)


if __name__ == "__main__":
    main()
