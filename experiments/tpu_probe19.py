"""TPU campaign #19: algebraic rewrites for the U-Net/ESRGAN hot chains.

Probe18 measured XLA's upsample/concat chains at 93-270 GB/s of the
819 GB/s v5e roofline (VERDICT r1 item 5). Before writing interleave-heavy
Pallas kernels, measure the algebraic alternatives that remove the slow ops
entirely:

- [A] conv(concat(xs)) vs sum_i conv_i(x_i)  — weight-split eliminates the
  materialized concat (ESRGAN RRDB dense blocks, U-Net decoder).
- [B] conv3x3(nearest_up2(x)) vs interleave of four 2x2-kernel convs on x
  (subpixel decomposition: exact, 2.25x fewer FLOPs, no 4x intermediate).
- [C] the full U-Net decoder step conv(concat(up2(x), skip)) vs
  subpixel(x) + split-conv(skip).
- [D] standalone nearest_up2: XLA repeat vs the (H,2,W,2C)-view formulation
  that keeps lanes/sublanes untouched (candidate Pallas design check).

All NHWC bf16, loop-amortized inside one dispatch (LOOP iterations).
"""

import time

import numpy as np

LOOP = 30


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def chain(step, *xs):
    """Run `step` LOOP times inside one dispatch with a serializing
    data dependency on the previous iteration's output."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(args[0].dtype)
            return step(args[0] + c0 * 0, *args[1:])
        ysh = jax.eval_shape(step, *args)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, pad="SAME"):
        return lax.conv_general_dilated(x, w, (1, 1), pad,
                                        dimension_numbers=dn)

    def up2(x):
        n, h, w_, c = x.shape
        return jnp.broadcast_to(x[:, :, None, :, None, :],
                                (n, h, 2, w_, 2, c)).reshape(n, 2 * h, 2 * w_, c)

    def report(tag, dt, bytes_moved=None, flops=None):
        per = dt / LOOP
        msg = f"[{tag}] {per*1e3:.3f} ms"
        if flops:
            msg += f" = {flops/per/1e12:.1f} TF"
        if bytes_moved:
            msg += f" ({bytes_moved/per/1e9:.0f} GB/s)"
        print(msg, flush=True)
        return per

    # ---- [A] ESRGAN dense-block conv: concat(5x64ch) -> 3x3 conv, 128^2 b8
    N, H, C = 8, 128, 64
    xs = [jax.device_put(rng.standard_normal((N, H, H, C)).astype(bf))
          for _ in range(5)]
    wfull = jax.device_put(
        (rng.standard_normal((3, 3, 5 * C, C)).astype(np.float32) * .02
         ).astype(bf))
    wsplit = [wfull[:, :, i * C:(i + 1) * C, :] for i in range(5)]

    def a_concat(x0, *rest):
        cat = jnp.concatenate((x0,) + rest, axis=-1)
        return conv(cat, wfull)

    def a_split(x0, *rest):
        out = conv(x0, wsplit[0])
        for i, r in enumerate(rest):
            out = out + conv(r, wsplit[i + 1])
        return out

    flops = 2 * N * H * H * 9 * 5 * C * C
    ca = chain(a_concat, *xs)
    cs = chain(a_split, *xs)
    ta = report("A concat-conv 5x64->64", timeit(ca, *xs), flops=flops)
    ts = report("A split-conv  5x64->64", timeit(cs, *xs), flops=flops)
    y1, y2 = a_concat(*xs), a_split(*xs)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
    print(f"[A] split speedup {ta/ts:.2f}x  max|d|={err:.3e}", flush=True)

    # ---- [B] up2 -> conv3x3 vs subpixel decomposition, U-Net decoder shapes
    for (n, h, c, cout) in [(16, 32, 256, 128), (16, 64, 128, 64),
                            (16, 128, 64, 64), (8, 64, 64, 64)]:
        x = jax.device_put(rng.standard_normal((n, h, h, c)).astype(bf))
        w = jax.device_put(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * .02).astype(bf)

        def b_naive(xx, ww=w):
            return conv(up2(xx), ww)

        # subpixel: out[2i+di, 2j+dj] = sum_{p,q} K[p,q] up[2i+di+p-1, ...]
        #   = sum K[p,q] x[(2i+di+p-1)//2, (2j+dj+q-1)//2].
        # For parity d the x-row support is {i-1, i} (d=0) or {i, i+1}
        # (d=1): a 2-tap kernel k_d[u] = sum_p K[p] over
        # u = (d+p-1)//2 - (d-1), convolved with per-parity padding
        # (1-d, d). Exact; built from w once (constant-folded at trace).
        def sub_kernels(ww):
            ks = {}
            for di in (0, 1):
                for dj in (0, 1):
                    k = jnp.zeros((2, 2) + ww.shape[2:], ww.dtype)
                    for p in range(3):
                        u = (di + p - 1) // 2 - (di - 1)
                        for q in range(3):
                            v = (dj + q - 1) // 2 - (dj - 1)
                            k = k.at[u, v].add(ww[p, q])
                    ks[(di, dj)] = k
            return ks

        ks = sub_kernels(w)

        def b_sub(xx, ks=ks):
            outs = {}
            for (di, dj), k in ks.items():
                o = lax.conv_general_dilated(
                    xx, k, (1, 1), ((1 - di, di), (1 - dj, dj)),
                    dimension_numbers=dn)
                outs[(di, dj)] = o
            n_, hh, ww_, co = outs[(0, 0)].shape
            stacked = jnp.stack([outs[(0, 0)], outs[(0, 1)],
                                 outs[(1, 0)], outs[(1, 1)]], axis=-2)
            # (n, h, w, 4, co) -> (n, h, 2, w, 2, co) -> (n, 2h, 2w, co)
            stacked = stacked.reshape(n_, hh, ww_, 2, 2, co)
            stacked = stacked.transpose(0, 1, 3, 2, 4, 5)
            return stacked.reshape(n_, 2 * hh, 2 * ww_, co)

        y1 = b_naive(x)
        y2 = b_sub(x)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
        flops_naive = 2 * n * (2 * h) ** 2 * 9 * c * cout
        flops_sub = 2 * n * h * h * 4 * 4 * c * cout
        tn = report(f"B up2+conv {n}x{h}^2 {c}->{cout} naive",
                    timeit(chain(b_naive, x), x), flops=flops_naive)
        tsb = report(f"B up2+conv {n}x{h}^2 {c}->{cout} subpix",
                     timeit(chain(b_sub, x), x), flops=flops_sub)
        print(f"[B] {n}x{h}^2 {c}->{cout}: subpix {tn/tsb:.2f}x  "
              f"max|d|={err:.3e}", flush=True)

    # ---- [C] full U-Net decoder step: conv(concat(up2(x), skip))
    n, h, c = 16, 64, 128  # x: (16,64,64,128), skip: (16,128,128,64)
    c2, cout = 64, 64
    x = jax.device_put(rng.standard_normal((n, h, h, c)).astype(bf))
    skip = jax.device_put(
        rng.standard_normal((n, 2 * h, 2 * h, c2)).astype(bf))
    w = jax.device_put(
        rng.standard_normal((3, 3, c + c2, cout)).astype(np.float32) * .02).astype(bf)
    wx, wskip = w[:, :, :c, :], w[:, :, c:, :]

    def c_naive(xx, sk):
        return conv(jnp.concatenate([up2(xx), sk], axis=-1), w)

    ksx = sub_kernels(wx)

    def c_fused(xx, sk):
        # subpixel for the up2(x) branch + plain conv for skip
        outs = {}
        for (di, dj), k in ksx.items():
            outs[(di, dj)] = lax.conv_general_dilated(
                xx, k, (1, 1), ((1 - di, di), (1 - dj, dj)),
                dimension_numbers=dn)
        n_, hh, ww_, co = outs[(0, 0)].shape
        stacked = jnp.stack([outs[(0, 0)], outs[(0, 1)],
                             outs[(1, 0)], outs[(1, 1)]], axis=-2)
        stacked = stacked.reshape(n_, hh, ww_, 2, 2, co)
        up_branch = stacked.transpose(0, 1, 3, 2, 4, 5).reshape(
            n_, 2 * hh, 2 * ww_, co)
        return up_branch + conv(sk, wskip)

    y1, y2 = c_naive(x, skip), c_fused(x, skip)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
    flops_n = 2 * n * (2 * h) ** 2 * 9 * (c + c2) * cout
    tn = report("C decoder naive", timeit(chain(c_naive, x, skip), x, skip),
                flops=flops_n)
    tf_ = report("C decoder fused", timeit(chain(c_fused, x, skip), x, skip),
                 flops=flops_n)
    print(f"[C] decoder: fused {tn/tf_:.2f}x  max|d|={err:.3e}", flush=True)

    # ---- [D] standalone nearest-up2 formulations
    for (n, h, c) in [(16, 32, 256), (16, 128, 64), (8, 256, 64)]:
        x = jax.device_put(rng.standard_normal((n, h, h, c)).astype(bf))

        def d_repeat(xx):
            return jnp.repeat(jnp.repeat(xx, 2, axis=1), 2, axis=2)

        def d_view(xx):
            n_, hh, ww_, cc = xx.shape
            dup = jnp.concatenate([xx, xx], axis=-1)  # (n,h,w,2c)
            out = jnp.broadcast_to(dup[:, :, None, :, :],
                                   (n_, hh, 2, ww_, 2 * cc))
            return out.reshape(n_, 2 * hh, 2 * ww_, cc)

        y1, y2 = up2(x), d_view(x)
        ok = bool(jnp.all(y1 == y2))
        nbytes = x.nbytes * 5  # read 1, write 4
        report(f"D up2 {n}x{h}^2x{c} bcast ", timeit(chain(up2, x), x),
               bytes_moved=nbytes)
        report(f"D up2 {n}x{h}^2x{c} repeat", timeit(chain(d_repeat, x), x),
               bytes_moved=nbytes)
        report(f"D up2 {n}x{h}^2x{c} 2Cview", timeit(chain(d_view, x), x),
               bytes_moved=nbytes)
        print(f"[D] {n}x{h}^2x{c} view==bcast: {ok}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
