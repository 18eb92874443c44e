"""Whisper-style encoder-decoder (models/speech_decoder.py): decode-vs-full
parity, FusedGenerator with context input, and the end-to-end ASR chain
through the speech encoder."""

import numpy as np

import smelter_tpu as st
from smelter_tpu.models import speech_decoder

CFG = dict(vocab=50, dim=32, heads=4, layers=2)


def test_decode_step_matches_full():
    max_len, t_enc = 10, 7
    w = speech_decoder.make_weights(max_len=max_len, **CFG)
    step_g, _ = speech_decoder.build_decode_step(w, max_len=max_len,
                                                 t_enc=t_enc, **CFG)
    full_g = speech_decoder.build_full(w, seq_len=5, t_enc=t_enc, **CFG)
    step = st.CompiledModel(step_g)
    full = st.CompiledModel(full_g)
    rng = np.random.default_rng(0)
    mem = rng.standard_normal((t_enc, CFG["dim"])).astype(np.float32)
    toks = np.array([3, 17, 41, 8, 2], np.int64)
    want = full(toks, mem)[0]
    caches = [np.zeros((max_len, CFG["dim"]), np.float32)
              for _ in range(2 * CFG["layers"])]
    for p in range(5):
        outs = step(np.array([toks[p]]), np.array([p], np.int64), mem, *caches)
        logits, caches = outs[0], list(outs[1:])
        np.testing.assert_allclose(logits[0], want[p], rtol=2e-4, atol=2e-4,
                                   err_msg=f"position {p}")


def test_fused_generator_with_context():
    from smelter_tpu.runtime.generate import FusedGenerator

    max_len, t_enc = 12, 6
    step_g, w = speech_decoder.build_decode_step(max_len=max_len,
                                                 t_enc=t_enc, **CFG)
    gen = FusedGenerator(step_g)
    assert gen.context_names == ["memory"]
    rng = np.random.default_rng(1)
    mem = rng.standard_normal((t_enc, CFG["dim"])).astype(np.float32)
    out = gen.generate([1, 4], 6, context={"memory": mem})
    assert len(out) == 8
    # greedy chain must match the full graph's argmax rollout
    full_g = speech_decoder.build_full(w, seq_len=8, t_enc=t_enc, **CFG)
    full = st.CompiledModel(full_g)
    logits = full(np.asarray(out, np.int64), mem)[0]
    for p in range(1, 7):
        assert int(np.argmax(logits[p])) == out[p + 1], f"position {p}"
    # a different memory must change the transcript (conditioning is live)
    mem2 = rng.standard_normal((t_enc, CFG["dim"])).astype(np.float32)
    out2 = gen.generate([1, 4], 6, context={"memory": mem2})
    assert out != out2


def test_batched_fused_generator_with_context():
    from smelter_tpu.runtime.generate import (FusedBatchedGenerator,
                                              FusedGenerator)

    max_len, t_enc = 12, 6
    step_g, _ = speech_decoder.build_decode_step(max_len=max_len,
                                                 t_enc=t_enc, **CFG)
    rng = np.random.default_rng(2)
    mems = rng.standard_normal((2, t_enc, CFG["dim"])).astype(np.float32)
    bgen = FusedBatchedGenerator(step_g, batch=2)
    outs = bgen.generate([[1, 4], [9, 3]], 5, context={"memory": mems})
    single = FusedGenerator(step_g)
    assert outs[0] == single.generate([1, 4], 5, context={"memory": mems[0]})
    assert outs[1] == single.generate([9, 3], 5, context={"memory": mems[1]})


def test_end_to_end_asr_chain():
    """log-mel frames -> speech encoder -> decoder transcript, all through
    the engine."""
    from smelter_tpu.models import speech_encoder
    from smelter_tpu.runtime.generate import FusedGenerator

    frames, n_mel, dim = 24, 80, 32
    enc_g, _enc_m, enc_shape = speech_encoder.build(
        batch=1, frames=frames, n_mel=n_mel, dim=dim, heads=4, depth=1)
    enc = st.CompiledModel(enc_g)
    t_enc = (frames + 1) // 2
    step_g, _ = speech_decoder.build_decode_step(
        max_len=12, t_enc=t_enc, **CFG)
    gen = FusedGenerator(step_g)
    mel = np.random.default_rng(3).standard_normal(enc_shape).astype(np.float32)
    memory = enc(mel)[0][0]  # (t_enc, dim)
    assert memory.shape == (t_enc, dim)
    out = gen.generate([1], 8, context={"memory": memory})
    assert len(out) == 9 and all(0 <= t < CFG["vocab"] for t in out)
