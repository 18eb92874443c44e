"""ORT-vocabulary BERT encoder (models/bert_encoder.py) vs torch."""

import numpy as np

import smelter_tpu as st
from smelter_tpu.models import bert_encoder

CFG = dict(vocab=60, dim=32, heads=2, layers=2, ffn=64)


def test_parity_with_padding_mask(rng):
    g, w = bert_encoder.build(batch=3, seq_len=10, **CFG)
    g = st.import_model(st.export_model(g))
    m = st.compile(g)
    ids = rng.integers(0, CFG["vocab"], (3, 10)).astype(np.int32)
    lens = np.array([4, 10, 7])
    mask = (np.arange(10)[None, :] < lens[:, None]).astype(np.int32)
    got = m(ids, mask)[0]
    want = bert_encoder.torch_reference(w, ids, mask, CFG["heads"])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mask_actually_masks(rng):
    g, w = bert_encoder.build(batch=1, seq_len=8, **CFG)
    m = st.compile(g)
    ids = rng.integers(0, CFG["vocab"], (1, 8)).astype(np.int32)
    mask4 = (np.arange(8) < 4).astype(np.int32)[None]
    full = np.ones((1, 8), np.int32)
    y_m = m(ids, mask4)[0]
    y_f = m(ids, full)[0]
    assert np.abs(y_m - y_f).max() > 1e-4
    # padded tokens must not influence the masked output
    ids2 = ids.copy()
    ids2[0, 5:] = (ids2[0, 5:] + 7) % CFG["vocab"]
    np.testing.assert_allclose(m(ids2, mask4)[0], y_m, rtol=1e-5, atol=1e-5)
