"""TPU probe #84: SegNet 8.4%-of-SOL decomposition (+ ConvNeXt block).

VERDICT r4 #6. The r5 honest bound (pool/unpool/D2S I/O is required
HBM traffic, tools/roofline.py) moved SegNet's row from 5.8% to 8.4% —
this probe finds where the remaining 11x goes by timing every piece of
the model AT ITS MODEL SHAPES (b16@256, bf16, engine lowerings, NHWC), all
pieces resident in one session, chip_time K-differenced:

  encoder convs 3->32@256, 32->64@128, 64->128@64
  decoder convs 128->64@64, 64->32@128, 32->32@256, head 32->2@256
  pool+indices at (256,32) (128,64) (64,128)
  unpool at (32->64,128) (64->128,64) (128->256,32)
  whole model e2e

sum(pieces) vs e2e = composition/fusion overhead; each piece's
bytes/time = its achieved HBM pattern bandwidth vs the 819 nominal
(probe42: effective bw is 180-550 GB/s pattern-dependent — if the
pool/unpool pieces sit at their pattern floor, the row's gap is the
hardware's, documented; if a piece is far under, that piece is the
work item).

Stage B: ConvNeXt-T block pieces at stage geometries (96@56, 192@28,
384@14, 768@7): dw7x7 / LN / 1x1 expand / GELU / 1x1 project vs the
fused ConvNeXtBlock engine op — locates probe62's ~0.7 ms/block
composition overhead.
"""

import time

import numpy as np

B = 16


def _exec_fn(graph, cfg=None):
    import smelter_tpu as st
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.passes.layout import NHWC_PIPELINE

    run_passes(graph)
    run_passes(graph, NHWC_PIPELINE)
    run_passes(graph, ["dce"])
    ex = st.Executor(graph, cfg or st.Config(compute_dtype="bfloat16"))
    return ex.build_fn(), ex.init_params()


def _conv_graph(cin, cout, hw, k=3):
    from smelter_tpu.ir.build import GraphBuilder

    rng = np.random.default_rng(0)
    b = GraphBuilder(f"conv{cin}_{cout}_{hw}", opset=17)
    x = b.input("x", (B, cin, hw, hw))
    w = b.init(rng.standard_normal((cout, cin, k, k)).astype(np.float32)
               * 0.05)
    y = b.node("Conv", [x, w], pads=[k // 2] * 4)
    y = b.node("Relu", [y])
    b.output(y, (B, cout, hw, hw))
    return b.graph


def _pool_graph(c, hw):
    from smelter_tpu.ir.build import GraphBuilder

    b = GraphBuilder(f"pool{c}_{hw}", opset=17)
    x = b.input("x", (B, c, hw, hw))
    y, idx = b.node("MaxPool", [x], outputs=2, kernel_shape=[2, 2],
                    strides=[2, 2])
    b.output(y, (B, c, hw // 2, hw // 2))
    b.output(idx, (B, c, hw // 2, hw // 2), dtype=7)
    return b.graph


def _unpool_graph(c, hw):
    from smelter_tpu.ir.build import GraphBuilder

    b = GraphBuilder(f"unpool{c}_{hw}", opset=17)
    x = b.input("x", (B, c, hw, hw))
    idx = b.input("idx", (B, c, hw, hw), dtype=7)
    y = b.node("MaxUnpool", [x, idx], kernel_shape=[2, 2], strides=[2, 2])
    b.output(y, (B, c, hw * 2, hw * 2))
    return b.graph


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.runtime.benchtime import chip_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # -- stage A: SegNet pieces -----------------------------------------
    pieces = {}
    for name, g_, xin in [
        ("enc_conv0", _conv_graph(3, 32, 256), (B, 3, 256, 256)),
        ("enc_conv1", _conv_graph(32, 64, 128), (B, 32, 128, 128)),
        ("enc_conv2", _conv_graph(64, 128, 64), (B, 64, 64, 64)),
        ("dec_conv2", _conv_graph(128, 64, 64), (B, 128, 64, 64)),
        ("dec_conv1", _conv_graph(64, 32, 128), (B, 64, 128, 128)),
        ("dec_conv0", _conv_graph(32, 32, 256), (B, 32, 256, 256)),
        ("head", _conv_graph(32, 2, 256, k=1), (B, 32, 256, 256)),
        ("pool0", _pool_graph(32, 256), (B, 32, 256, 256)),
        ("pool1", _pool_graph(64, 128), (B, 64, 128, 128)),
        ("pool2", _pool_graph(128, 64), (B, 128, 64, 64)),
    ]:
        fn, params = _exec_fn(g_)
        x = jax.device_put(rng.standard_normal(xin).astype(np.float32))
        pieces[name] = (fn, params, x, None)
    for name, c, hw in [("unpool2", 128, 32), ("unpool1", 64, 64),
                        ("unpool0", 32, 128)]:
        fn, params = _exec_fn(_unpool_graph(c, hw))
        x = jax.device_put(
            rng.standard_normal((B, c, hw, hw)).astype(np.float32))
        # indices as a plausible unpool input: each window's 0th element
        base = np.arange(B * c * hw * hw, dtype=np.int64)
        idx = jax.device_put((base.reshape(B, c, hw, hw) * 0
                              + np.arange(hw * hw).reshape(hw, hw)
                              .repeat(1, 0)) * 4)
        pieces[name] = (fn, params, x, idx)

    def wide_time(f, params, x):
        """chip_time with a span that dwarfs the tunnel's pipelining
        window (probe82b: <~100 ms differences can collapse): rough
        estimate first, then a >=300 ms-span re-measure."""
        # chip_time itself now widens to a 0.4 s minimum span
        return chip_time(f, params, x)

    total = 0.0
    for name, (fn, params, x, idx) in pieces.items():
        f = (fn if idx is None
             else (lambda p, xx, _f=fn, _i=idx: _f(p, xx, _i)))
        t = wide_time(f, params, x)
        bts = 0
        for a in ([x] if idx is None else [x, idx]):
            bts += a.size * 2 if a.dtype.kind == "f" else a.size * 4
        out_sd = jax.eval_shape(f, params, x)
        for o in jax.tree_util.tree_leaves(out_sd):
            bts += int(np.prod(o.shape)) * 2
        total += t
        print(f"[piece {name:9s}] {t*1e3:7.3f} ms  "
              f"{bts/t/1e9:6.0f} GB/s apparent", flush=True)
    print(f"[sum of pieces] {total*1e3:7.3f} ms", flush=True)

    g, _tm, shape = ZOO["segnet"](batch=B, image_size=256)
    m = st.compile(g, st.Config(compute_dtype="bfloat16"), quant=None,
                   layout="nhwc")
    x = jax.device_put(
        rng.standard_normal(shape).astype(np.float32))
    t_e2e = wide_time(m._fn, m.params, x)
    print(f"[segnet e2e] {t_e2e*1e3:7.3f} ms = {B/t_e2e:6,.0f} img/s "
          f"(composition overhead {1e3*(t_e2e-total):+.3f} ms)",
          flush=True)

    # -- stage B: ConvNeXt block pieces ---------------------------------
    import torch

    from smelter_tpu.frontend.torch_export import export_torch

    class Block(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.dw = torch.nn.Conv2d(c, c, 7, padding=3, groups=c)
            self.ln = torch.nn.LayerNorm(c)
            self.fc1 = torch.nn.Linear(c, 4 * c)
            self.fc2 = torch.nn.Linear(4 * c, c)

        def forward(self, x):
            h = self.dw(x).permute(0, 2, 3, 1)
            h = self.fc2(torch.nn.functional.gelu(self.fc1(self.ln(h))))
            return x + h.permute(0, 3, 1, 2)

    for c, hw in ((96, 56), (192, 28), (384, 14), (768, 7)):
        bm = Block(c).eval()
        xt = torch.randn(64, c, hw, hw)
        g_ = export_torch(bm, (xt,))
        # NOTE: neither the zoo convnext (int8w) nor this block hits the
        # ConvNeXtBlock whole-block fusion — the engine path IS the
        # XLA-compiled chain (probe62's subject); measure bf16 and the
        # roofline row's int8w form
        eng = st.compile(st.import_model(st.export_model(g_)),
                         st.Config(compute_dtype="bfloat16"),
                         quant=None, layout="nhwc")
        eng8 = st.compile(st.import_model(st.export_model(g_)),
                          st.Config(compute_dtype="bfloat16"),
                          quant="int8", layout="nhwc")
        xj = jax.device_put(xt.numpy())
        t_f = wide_time(eng._fn, eng.params, xj)
        t_f8 = wide_time(eng8._fn, eng8.params, xj)

        # unfused pieces in raw jax at the same shapes (NHWC)
        wdw = jnp.asarray(rng.standard_normal((7, 7, 1, c)),
                          jnp.bfloat16) * 0.05
        w1 = jnp.asarray(rng.standard_normal((c, 4 * c)),
                         jnp.bfloat16) * 0.05
        w2 = jnp.asarray(rng.standard_normal((4 * c, c)),
                         jnp.bfloat16) * 0.05
        xh = jax.device_put(
            rng.standard_normal((64, hw, hw, c)).astype(jnp.bfloat16))

        def dw(p, x_):
            return jax.lax.conv_general_dilated(
                x_, wdw, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def ln(p, x_):
            m_ = x_.astype(jnp.float32)
            mu = m_.mean(-1, keepdims=True)
            v = ((m_ - mu) ** 2).mean(-1, keepdims=True)
            return ((m_ - mu) * jax.lax.rsqrt(v + 1e-6)).astype(x_.dtype)

        def mlp(p, x_):
            h = jax.nn.gelu(x_ @ w1)
            return h @ w2

        def whole(p, x_):
            return x_ + mlp(None, ln(None, dw(None, x_)))

        parts = {"dw7x7": dw, "ln": ln, "mlp(x2 gemm+gelu)": mlp,
                 "whole-jnp": whole}
        msg = [f"[cnx c{c}@{hw} engine bf16={t_f*1e3:.3f} "
               f"int8w={t_f8*1e3:.3f} ms]"]
        psum = 0.0
        for nm, f in parts.items():
            t = wide_time(f, None, xh)
            if nm != "whole-jnp":
                psum += t
            msg.append(f"{nm}={t*1e3:.3f}ms")
        msg.append(f"sum-parts={psum*1e3:.3f}ms")
        print(" ".join(msg), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
