"""TPU campaign #45: int8 pixel-conv trunk vs the bf16 kernel chain.

probe43/44 left the ESRGAN trunk at the chip's effective HBM floor
(~300 GB/s) with bf16 activations. pixel_conv_rowdot_q moves int8
activations (half the bytes) and runs the dots on the int8 MXU with the
dequant->bias->leaky->requant epilogue in-register. Measure (b8 128^2):
  A single conv (64->32): bf16 kernel vs int8 kernel
  B one RRDB (15 convs, concats, residuals): bf16 chain (probe43 C) vs
    int8 chain (per-edge static scales, residuals carried in f32->int8)
plus max int8-vs-f32 drift of the int8 RRDB output."""

import time

import numpy as np

LOOP = 20


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def chain_loop(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        ysh = jax.eval_shape(step, x)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
            return step(x + (c0 * 0).astype(x.dtype))
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def timeit(fn, x, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.pixel_conv import (
        pixel_conv_rowdot, pixel_conv_rowdot_q)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    B, HW, NF, GC = 8, 128, 64, 32
    A = 0.2

    # -- A: single conv
    x0 = rng.standard_normal((B, HW, 64, HW)).astype(np.float32)
    w0 = (rng.standard_normal((32, 64, 3, 3)) / 24).astype(np.float32)
    b0 = rng.standard_normal(32).astype(np.float32)
    xb = jax.device_put(jnp.asarray(x0, bf))
    ta = timeit(chain_loop(
        lambda xx: pixel_conv_rowdot(xx, jnp.asarray(w0, bf),
                                     jnp.asarray(b0, bf), alpha=A,
                                     rows=16)), xb)
    sx = float(np.abs(x0).max() / 127)
    sw = np.abs(w0).max(axis=(1, 2, 3)) / 127
    xq = jax.device_put(jnp.asarray(np.clip(np.round(x0 / sx), -127, 127),
                                    jnp.int8))
    wq = jnp.asarray(np.clip(np.round(w0 / sw[:, None, None, None]),
                             -127, 127), jnp.int8)
    tq = timeit(chain_loop(
        lambda xx: pixel_conv_rowdot_q(xx, wq, jnp.asarray(sx * sw),
                                       jnp.asarray(b0), alpha=A,
                                       inv_sy=1 / 0.05, rows=16)), xq)
    print(f"[A conv 64->32] bf16 {ta*1e6:7.1f} us   int8 {tq*1e6:7.1f} us "
          f"({ta/tq:.2f}x)", flush=True)

    # -- B: RRDB chain
    ws = []
    for _ in range(3):
        blk = []
        for j in range(5):
            cin = NF + j * GC
            cout = GC if j < 4 else NF
            blk.append((
                (rng.standard_normal((cout, cin, 3, 3)) /
                 (3 * np.sqrt(cin))).astype(np.float32),
                rng.standard_normal(cout).astype(np.float32) * 0.1))
        ws.append(blk)
    xt = rng.standard_normal((B, HW, NF, HW)).astype(np.float32)

    w_k = [[(jnp.asarray(w, bf), jnp.asarray(b, bf)) for w, b in blk]
           for blk in ws]

    def dense_block_bf(x, blk):
        feats = x
        outs = []
        for j in range(5):
            w, b = blk[j]
            y = pixel_conv_rowdot(feats, w, b,
                                  alpha=A if j < 4 else None, rows=16)
            if j < 4:
                outs.append(y)
                feats = jnp.concatenate([x] + outs, axis=2)
        return x + y * bf(0.2)

    def rrdb_bf(x):
        h = x
        for blk in w_k:
            h = dense_block_bf(h, blk)
        return x + h * bf(0.2)

    xbf = jax.device_put(jnp.asarray(xt, bf))
    tb = timeit(chain_loop(rrdb_bf), xbf)
    ref = np.asarray(rrdb_bf(xbf), np.float32)
    print(f"[B rrdb bf16  ] {tb*1e3:8.3f} ms", flush=True)

    # int8 chain: per-edge scale = amax/127 measured from the f32 run on
    # this input (what calibration would supply); residual adds in f32 of
    # dequantized carries, then requantized for the next conv.
    SE = 4.0 / 127  # trunk edges sit in roughly [-4, 4] for unit gaussians

    def q(v, s=SE):
        return jnp.clip(jnp.round(v.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)

    wq_k = []
    for blk in ws:
        qblk = []
        for w, b in blk:
            sww = np.abs(w).max(axis=(1, 2, 3)) / 127
            qblk.append((jnp.asarray(
                np.clip(np.round(w / sww[:, None, None, None]), -127, 127),
                jnp.int8), jnp.asarray(SE * sww), jnp.asarray(b)))
        wq_k.append(qblk)

    def dense_block_q(xi, qblk):
        # xi int8; concats stay int8 (same scale); conv5 returns f32
        feats = xi
        outs = []
        for j in range(5):
            wqq, sc, b = qblk[j]
            if j < 4:
                y = pixel_conv_rowdot_q(feats, wqq, sc, b, alpha=A,
                                        inv_sy=1 / SE, rows=16)
                outs.append(y)
                feats = jnp.concatenate([xi] + outs, axis=2)
            else:
                y = pixel_conv_rowdot_q(feats, wqq, sc, b, alpha=None,
                                        requant=False,
                                        out_dtype=jnp.float32, rows=16)
        return y  # f32 residual delta

    def rrdb_q(xi):
        # carry the residual in f32, requantize per block entry
        xf = xi.astype(jnp.float32) * SE
        h = xi
        hf = xf
        for qblk in wq_k:
            d = dense_block_q(h, qblk)
            hf = hf + d * 0.2
            h = q(hf)
        return xf + hf * 0.2

    xqt = jax.device_put(q(jnp.asarray(xt)))
    tc = timeit(chain_loop(rrdb_q), xqt)
    got = np.asarray(rrdb_q(xqt), np.float32)
    drift = float(np.abs(got - ref).max())
    rel = drift / float(np.abs(ref).max())
    print(f"[B rrdb int8  ] {tc*1e3:8.3f} ms  ({tb/tc:.2f}x)  "
          f"dmax {drift:.4f} rel {rel:.4f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
