"""TPU campaign #43: chained RRDB trunk in NHCW via pixel_conv_rowdot.

probe40: the kernel wins 1.3-1.5x per conv at 128^2 and 2.7x at 512^2.
This validates the END-TO-END hypothesis before building the graph pass:
one full RRDB (3 dense blocks = 15 convs, concats on the C axis,
residual scales) chained b8 @128^2, plus the 512^2 tail pair:
  A  NHWC XLA direct convs + LeakyReLU      (engine default w/o pack)
  B  NHWC pack44 convs (C_out<=32 packed)    (current engine default)
  C  NHCW pixel_conv_rowdot chain            (kernel, fused leaky)
C includes the one-time NHWC->NHCW entry/exit transposes so the number
is what a layout-region pass would deliver. Numerics checked A vs C.
"""

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
            c0 = carry[(0,) * carry.ndim].astype(x.dtype)
            return step(x + c0 * 0)
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
    from jax import lax

    from smelter_tpu.kernels.pixel_conv import pixel_conv_rowdot
    from smelter_tpu.passes.mxu_packing import _packed_weights

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    B, HW, NF, GC = 8, 128, 64, 32
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    A = 0.2

    # one RRDB: 3 dense blocks, each 5 convs (cin 64/96/128/160/192)
    ws, bs = [], []
    for _ in range(3):
        blk = []
        for j in range(5):
            cin = NF + j * GC
            cout = GC if j < 4 else NF
            blk.append((
                (rng.standard_normal((cout, cin, 3, 3)) /
                 (3 * np.sqrt(cin))).astype(np.float32),
                rng.standard_normal((cout,)).astype(np.float32) * 0.1))
        ws.append(blk)

    x0 = rng.standard_normal((B, NF, HW, HW)).astype(np.float32)
    x_nhwc = jax.device_put(jnp.asarray(x0.transpose(0, 2, 3, 1), bf))

    def lrelu(v):
        return jnp.where(v >= 0, v, bf(A) * v)

    # -- A: NHWC direct
    w_hwio = [[(jnp.asarray(w.transpose(2, 3, 1, 0), bf), jnp.asarray(b, bf))
               for w, b in blk] for blk in ws]

    def dense_block_nhwc(x, blk, conv):
        feats = x
        outs = []
        for j in range(5):
            y = conv(feats, j, blk)
            if j < 4:
                y = lrelu(y)
                outs.append(y)
                feats = jnp.concatenate([x] + outs, axis=-1)
        return x + y * bf(0.2)

    def conv_direct(feats, j, blk):
        w, b = blk[j]
        y = lax.conv_general_dilated(feats, w, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
        return y + b.reshape(1, 1, 1, -1)

    def rrdb_nhwc(x):
        h = x
        for blk in w_hwio:
            h = dense_block_nhwc(h, blk, conv_direct)
        return x + h * bf(0.2)

    ta = timeit(chain_loop(rrdb_nhwc), x_nhwc)
    ref = np.asarray(rrdb_nhwc(x_nhwc), np.float32)
    print(f"[A nhwc direct ] {ta*1e3:8.3f} ms", flush=True)

    # -- B: NHWC pack44 for C_out==32 convs
    w_pack = [[(jnp.asarray(_packed_weights(w).transpose(2, 3, 1, 0), bf)
                if w.shape[0] <= 32 else
                jnp.asarray(w.transpose(2, 3, 1, 0), bf),
                jnp.asarray(b, bf), w.shape[0]) for w, b in blk]
              for blk in ws]

    def conv_pack(feats, j, blk):
        w, b, co = blk[j]
        if co > 32:
            y = lax.conv_general_dilated(feats, w, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
            return y + b.reshape(1, 1, 1, -1)
        xp = jnp.pad(feats, ((0, 0), (1, 2), (1, 2), (0, 0)))
        y = lax.conv_general_dilated(xp, w, (2, 2), "VALID",
                                     dimension_numbers=dn)
        n, hh, ww, _ = y.shape
        y = (y.reshape(n, hh, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
             .reshape(n, 2 * hh, 2 * ww, co))
        return y + b.reshape(1, 1, 1, -1)

    def rrdb_pack(x):
        h = x
        for blk in w_pack:
            h = dense_block_nhwc(h, blk, conv_pack)
        return x + h * bf(0.2)

    tb = timeit(chain_loop(rrdb_pack), x_nhwc)
    db = float(np.abs(np.asarray(rrdb_pack(x_nhwc), np.float32) - ref).max())
    print(f"[B nhwc pack44 ] {tb*1e3:8.3f} ms   dmax {db:.3e}", flush=True)

    # -- C: NHCW kernel chain (entry/exit transposes included)
    w_k = [[(jnp.asarray(w, bf), jnp.asarray(b, bf)) for w, b in blk]
           for blk in ws]

    def dense_block_nhcw(x, blk):
        feats = x
        outs = []
        for j in range(5):
            w, b = blk[j]
            y = pixel_conv_rowdot(feats, w, b, alpha=A if j < 4 else None,
                                  rows=16)
            if j < 4:
                outs.append(y)
                feats = jnp.concatenate([x] + outs, axis=2)
        return x + y * bf(0.2)

    def rrdb_nhcw(x):
        h = jnp.transpose(x, (0, 1, 3, 2))  # NHWC -> NHCW
        x_in = h
        for blk in w_k:
            h = dense_block_nhcw(h, blk)
        h = x_in + h * bf(0.2)
        return jnp.transpose(h, (0, 1, 3, 2))

    tc = timeit(chain_loop(rrdb_nhcw), x_nhwc)
    dc = float(np.abs(np.asarray(rrdb_nhcw(x_nhwc), np.float32) - ref).max())
    print(f"[C nhcw kernel ] {tc*1e3:8.3f} ms   dmax {dc:.3e}", flush=True)

    # -- 512^2 tail pair: conv(64->64) + lrelu, twice
    xt = rng.standard_normal((2, NF, 512, 512)).astype(np.float32)
    xt_nhwc = jax.device_put(jnp.asarray(xt.transpose(0, 2, 3, 1), bf))
    tw = [(rng.standard_normal((NF, NF, 3, 3)) / 24).astype(np.float32)
          for _ in range(2)]
    tb_ = [rng.standard_normal((NF,)).astype(np.float32) * 0.1
           for _ in range(2)]
    tw_h = [jnp.asarray(w.transpose(2, 3, 1, 0), bf) for w in tw]
    tw_k = [jnp.asarray(w, bf) for w in tw]
    tb_j = [jnp.asarray(b, bf) for b in tb_]

    def tail_nhwc(x):
        h = x
        for w, b in zip(tw_h, tb_j):
            h = lax.conv_general_dilated(h, w, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
            h = lrelu(h + b.reshape(1, 1, 1, -1))
        return h

    tt = timeit(chain_loop(tail_nhwc), xt_nhwc, iters=3)
    reft = np.asarray(tail_nhwc(xt_nhwc), np.float32)
    print(f"[T nhwc tail512] {tt*1e3:8.3f} ms", flush=True)

    def tail_nhcw(x):
        h = jnp.transpose(x, (0, 1, 3, 2))
        for w, b in zip(tw_k, tb_j):
            h = pixel_conv_rowdot(h, w, b, alpha=A, rows=16)
        return jnp.transpose(h, (0, 1, 3, 2))

    tk = timeit(chain_loop(tail_nhcw), xt_nhwc, iters=3)
    dk = float(np.abs(np.asarray(tail_nhcw(xt_nhwc), np.float32)
                      - reft).max())
    print(f"[K nhcw tail512] {tk*1e3:8.3f} ms   dmax {dk:.3e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
