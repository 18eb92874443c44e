"""TPU campaign #13: end-to-end model wins from the round-2 changes.

- [A] ResNet-50 b128: naive fp32 / int8w / int8-static (folded requant
  epilogues; calibration amax precomputed on CPU -> /tmp/amax_resnet50.json)
  — decides VERDICT r1 item 3 (int8-static must beat int8w).
- [B] ViT-B/16 b128: bf16 plain / int8+int8_activations (XLA int8 MXU) /
  +use_pallas — the r1 "int8 is -25% on transformers" reversal attempt.
- [C] int8_matmul block push: bigger K/N tiles vs the 213 TOP/s XLA mark.
"""

import json
import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import resnet50, vit
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_static

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # [A] ResNet-50 b128
    batch = 128
    g, _tm, shape = resnet50.build(batch=batch, image_size=224)
    x = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    base = st.CompiledModel(st.import_model(st.export_model(g)),
                            st.Config(compute_dtype="float32"))
    dt = timeit(base._fn, base.params, x, iters=6)
    base_ips = batch / dt
    print(f"[A] resnet50 naive fp32: {base_ips:.0f} img/s", flush=True)
    del base

    m = st.compile(st.import_model(st.export_model(g)),
                   st.Config(compute_dtype="bfloat16"), quant="int8")
    dt = timeit(m._fn, m.params, x, iters=10)
    print(f"[A] resnet50 int8w: {batch/dt:.0f} img/s ({batch/dt/base_ips:.2f}x)",
          flush=True)
    del m

    amax = json.load(open("/tmp/amax_resnet50.json"))
    gs = st.import_model(st.export_model(g))
    run_passes(gs)
    n = quantize_static(gs, amax)
    print(f"[A] quantize_static: {n} nodes", flush=True)
    run_passes(gs, ["layout_nhwc", "dce"])
    ms = st.CompiledModel(gs, st.Config(compute_dtype="bfloat16"))
    dt = timeit(ms._fn, ms.params, x, iters=10)
    print(f"[A] resnet50 int8-static(folded): {batch/dt:.0f} img/s "
          f"({batch/dt/base_ips:.2f}x)", flush=True)
    del ms, gs

    # [B] ViT-B/16 b128
    gv, _tm, vshape = vit.build(batch=batch, image_size=224)
    xv = jax.device_put(rng.standard_normal(vshape).astype(np.float32))
    basev = st.CompiledModel(st.import_model(st.export_model(gv)),
                             st.Config(compute_dtype="float32"))
    dt = timeit(basev._fn, basev.params, xv, iters=6)
    vbase_ips = batch / dt
    print(f"[B] vit naive fp32: {vbase_ips:.0f} img/s", flush=True)
    del basev

    mv = st.compile(st.import_model(st.export_model(gv)),
                    st.Config(compute_dtype="bfloat16"), quant=None)
    dt = timeit(mv._fn, mv.params, xv, iters=10)
    print(f"[B] vit bf16 plain: {batch/dt:.0f} img/s ({batch/dt/vbase_ips:.2f}x)",
          flush=True)
    del mv

    for tag, cfg in [
        ("int8+dynact(xla)", st.Config(compute_dtype="bfloat16",
                                       int8_activations=True)),
        ("int8+dynact(pallas)", st.Config(compute_dtype="bfloat16",
                                          int8_activations=True,
                                          use_pallas=True)),
    ]:
        try:
            mv = st.compile(st.import_model(st.export_model(gv)), cfg,
                            quant="int8")
            dt = timeit(mv._fn, mv.params, xv, iters=10)
            print(f"[B] vit {tag}: {batch/dt:.0f} img/s "
                  f"({batch/dt/vbase_ips:.2f}x)", flush=True)
            del mv
        except Exception as e:
            print(f"[B] vit {tag}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # [C] kernel block push (loop-amortized)
    from smelter_tpu.kernels.int8_matmul import int8_matmul, quantize_rows
    from smelter_tpu.quant import quantize_array

    LOOP = 20
    M, K, N = 8192, 4096, 4096
    flops = 2 * M * K * N
    xf = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((K, N)).astype(np.float32)
    q, s = quantize_array(wf, axis=1)
    xb = jax.device_put(xf).astype(jnp.bfloat16)
    qd = jax.device_put(q)
    sd = jax.device_put(s.reshape(-1).astype(np.float32))
    xq_pre, sr_pre = jax.jit(quantize_rows)(xb)
    xq_pre = jax.device_put(np.asarray(xq_pre))
    sr_pre = jax.device_put(np.asarray(sr_pre))
    z_i8 = jax.device_put(np.zeros((), np.int8))

    def chain(step):
        @jax.jit
        def run(xx, zero):
            def body(i, carry):
                c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
                return step(xx + c0 * zero.astype(xx.dtype))
            ysh = jax.eval_shape(step, xx)
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    for bm, bn, bk in [(1024, 1024, 2048), (512, 1024, 4096), (256, 1024, 4096),
                       (512, 2048, 2048), (1024, 4096, 512), (512, 4096, 1024),
                       (2048, 2048, 512), (256, 2048, 4096)]:
        try:
            fn = chain(lambda xx, bm=bm, bn=bn, bk=bk: int8_matmul(
                xx, qd, sr_pre, sd, block_m=bm, block_n=bn, block_k=bk))
            dt = timeit(fn, xq_pre, z_i8, iters=3, warmup=1)
            print(f"[C] bm{bm} bn{bn} bk{bk}: {dt/LOOP*1e3:.3f} ms = "
                  f"{flops/(dt/LOOP)/1e12:.0f} TOP/s", flush=True)
        except Exception as e:
            print(f"[C] bm{bm} bn{bn} bk{bk}: FAIL {type(e).__name__}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
