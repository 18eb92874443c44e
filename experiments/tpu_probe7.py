"""TPU campaign #7: fused dequant+conv Pallas kernel vs XLA dequant-conv on
ResNet-stage shapes (NHWC, stride 1, SAME)."""

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

    from smelter_tpu.kernels.dequant_conv import dequant_conv, dequant_conv_reference
    from smelter_tpu.quant import quantize_array

    print("devices:", jax.devices(), flush=True)

    # (batch, H, W, Cin, Cout, k) — ResNet-50 stage shapes (stride-1 3x3s)
    cases = [
        (32, 56, 56, 64, 64, 3),
        (32, 28, 28, 128, 128, 3),
        (32, 14, 14, 256, 256, 3),
        (32, 7, 7, 512, 512, 3),
        (8, 128, 128, 64, 64, 3),   # ESRGAN-ish big-activation conv
    ]
    ref = jax.jit(dequant_conv_reference, static_argnames=("pads",))
    for (b, h, w, cin, cout, k) in cases:
        x = jax.device_put(np.random.randn(b, h, w, cin).astype(np.float32)).astype(jnp.bfloat16)
        wf = np.random.randn(cout, cin, k, k).astype(np.float32) * 0.1
        q, s = quantize_array(wf, axis=0)
        qd = jax.device_put(np.ascontiguousarray(q.transpose(2, 3, 1, 0)))
        sd = jax.device_put(s.reshape(-1).astype(np.float32))
        pads = ((1, 1), (1, 1))
        flops = 2 * b * h * w * cin * cout * k * k
        try:
            t_pal = timeit(lambda a, b_, c: dequant_conv(a, b_, c, pads=pads),
                           x, qd, sd)
            pal = f"{t_pal*1e3:.2f}ms ({flops/t_pal/1e12:.0f}TF)"
        except Exception as e:
            pal = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        t_ref = timeit(lambda a, b_, c: ref(a, b_, c, pads=pads), x, qd, sd)
        print(f"[1] b{b} {h}x{w} c{cin}->{cout} k{k}: pallas {pal} | "
              f"xla {t_ref*1e3:.2f}ms ({flops/t_ref/1e12:.0f}TF)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
