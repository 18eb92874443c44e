"""SegNet family (models/segnet.py): fx export of MaxPool-with-indices +
MaxUnpool, full-pipeline parity vs torch, quantized path."""

import numpy as np
import torch
import torch.nn as nn

import smelter_tpu as st
from smelter_tpu.models import segnet


def test_full_pipeline_parity():
    g, tm, shape = segnet.build(batch=2, image_size=32, base=8, depth=2)
    ops = {n.op_type for n in g.nodes}
    assert "MaxUnpool" in ops
    assert any(n.op_type == "MaxPool" and len(n.outputs) == 2
               for n in g.nodes)
    x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = st.compile(st.import_model(st.export_model(g)))(x)[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_int8_weights_argmax_preserved():
    g, tm, shape = segnet.build(batch=2, image_size=32, base=8, depth=2)
    x = np.random.default_rng(1).standard_normal(shape).astype(np.float32)
    ref = st.compile(g)(x)[0]
    g2, _, _ = segnet.build(batch=2, image_size=32, base=8, depth=2)
    got = st.compile(g2, quant="int8")(x)[0]
    # per-pixel class decision is the product; require near-total agreement
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.99, agree


def test_module_form_unpool():
    """nn.MaxPool2d(return_indices=True) + nn.MaxUnpool2d module path."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.pool = nn.MaxPool2d(2, 2, return_indices=True)
            self.unpool = nn.MaxUnpool2d(2, 2)

        def forward(self, x):
            y, idx = self.pool(x)
            return self.unpool(y, idx)

    from smelter_tpu.frontend.torch_export import export_torch

    torch.manual_seed(0)
    m = M().eval()
    x = torch.randn(1, 3, 8, 8)
    g = export_torch(m, x, name="unpool_mod", opset=17)
    got = st.CompiledModel(g)(x.numpy())[0]
    with torch.no_grad():
        want = m(x).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
