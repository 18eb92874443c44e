"""TPU campaign #26: whole-RDB packed-space chain.

probe25: the phase-shifted-S2D conv core beats direct 1.33-2.01x on the
ESRGAN growth convs but per-conv S2D/D2S glue inverts the win. Here the
whole residual-dense-block chain stays in standard-packed space
(Y[(e,c)] at coarse (i,j) = y[c, 2i+e_i, 2j+e_j], parity-major
channels); each conv consumes a cheap relayout (4 pad/shift blocks,
64^2 -> 65^2) of its packed operands and emits packed output directly.

Forms measured per RDB (nf=64, gc=32, b8 @128^2 fine):
  direct   — fine-space 3x3 SAME convs + concat + LReLU + residual
  pack44   — current default: Conv4x4/s2+D2S for C_out<=32 convs
  packed   — whole chain packed; one S2D at entry, one D2S at exit
"""

import time

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=6, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


LOOP = 20


def chain_loop(step, x):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xx):
        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
            return step(xx + c0 * 0)
        ysh = jax.eval_shape(step, xx)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


NF, GC = 64, 32


def build_weights(rng):
    ws = []
    cin = NF
    for k in range(4):
        ws.append((rng.standard_normal((GC, cin, 3, 3)).astype(np.float32)
                   * .05, rng.standard_normal(GC).astype(np.float32) * .01))
        cin += GC
    ws.append((rng.standard_normal((NF, cin, 3, 3)).astype(np.float32)
               * .05, rng.standard_normal(NF).astype(np.float32) * .01))
    return ws


def w2_blocked(w, op_chans):
    """OIHW 3x3 -> packed-space HWIO 2x2 kernel with operand-blocked
    input channels: input layout = concat over operands of
    ((d_i,d_j)-major, c-minor) blocks; output layout (e-major, o-minor)."""
    O = w.shape[0]
    total = 4 * sum(op_chans)
    w2 = np.zeros((4 * O, total, 2, 2), w.dtype)
    for ei in (0, 1):
        for ej in (0, 1):
            erow = (2 * ei + ej) * O
            off_fine = 0
            off2 = 0
            for C in op_chans:
                wsl = w[:, off_fine:off_fine + C]
                for p in range(3):
                    di, a = (ei + p) % 2, (ei + p) // 2
                    for q in range(3):
                        dj, b = (ej + q) % 2, (ej + q) // 2
                        col = off2 + (2 * di + dj) * C
                        w2[erow:erow + O, col:col + C, a, b] += \
                            wsl[:, :, p, q]
                off_fine += C
                off2 += 4 * C
    return w2.transpose(2, 3, 1, 0)  # HWIO


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    ws = build_weights(rng)

    def lrelu(x):
        return jnp.where(x > 0, x, 0.2 * x)

    # ---------- direct fine-space RDB ----------
    w_fine = [(jax.device_put(jnp.asarray(w.transpose(2, 3, 1, 0), bf)),
               jax.device_put(jnp.asarray(b, bf))) for w, b in ws]

    def rdb_direct(x):
        feats = [x]
        for k, (wk, bk) in enumerate(w_fine):
            inp = feats[0] if len(feats) == 1 else jnp.concatenate(
                feats, axis=-1)
            y = lax.conv_general_dilated(inp, wk, (1, 1), "SAME",
                                         dimension_numbers=dn) + bk
            if k < 4:
                feats.append(lrelu(y))
            else:
                return x + 0.2 * y

    # ---------- pack44 (current default) ----------
    from smelter_tpu.passes.mxu_packing import _packed_weights

    w_p44 = []
    for k, (w, b) in enumerate(ws):
        if w.shape[0] <= 32:
            w4 = _packed_weights(w)
            w_p44.append((jax.device_put(
                jnp.asarray(w4.transpose(2, 3, 1, 0), bf)),
                jax.device_put(jnp.asarray(np.tile(b, 4), bf)), True))
        else:
            w_p44.append((jax.device_put(
                jnp.asarray(w.transpose(2, 3, 1, 0), bf)),
                jax.device_put(jnp.asarray(b, bf)), False))

    def d2s_out(y, co):
        n, hh, ww, _ = y.shape
        y = y.reshape(n, hh, ww, 2, 2, co)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hh, 2 * ww, co)

    def rdb_pack44(x):
        feats = [x]
        for k, (wk, bk, packed) in enumerate(w_p44):
            inp = feats[0] if len(feats) == 1 else jnp.concatenate(
                feats, axis=-1)
            if packed:
                co = wk.shape[-1] // 4
                y = lax.conv_general_dilated(inp, wk, (2, 2),
                                             ((1, 1), (1, 1)),
                                             dimension_numbers=dn) + bk
                y = d2s_out(y, co)
            else:
                y = lax.conv_general_dilated(inp, wk, (1, 1), "SAME",
                                             dimension_numbers=dn) + bk
            if k < 4:
                feats.append(lrelu(y))
            else:
                return x + 0.2 * y

    # ---------- fully packed chain ----------
    chans = [[NF], [NF, GC], [NF, GC, GC], [NF, GC, GC, GC],
             [NF, GC, GC, GC, GC]]
    w_pk = [(jax.device_put(jnp.asarray(w2_blocked(w, cs), bf)),
             jax.device_put(jnp.asarray(np.tile(b, 4), bf)))
            for (w, b), cs in zip(ws, chans)]

    def s2d_std(x):  # fine -> standard-packed (parity-major, c minor)
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h // 2, w // 2, 4 * c)

    def d2s_std(y, co):
        return d2s_out(y, co)

    def relayout(Y, C):
        """standard-packed (4C ch, m x m) -> shifted form (4C, m+1 x m+1):
        Z[(d_i,d_j)] at (i,j) = fine[2i+d_i-1, 2j+d_j-1]."""
        n, m, _, _ = Y.shape
        blocks = {}
        for ei in (0, 1):
            for ej in (0, 1):
                blocks[(ei, ej)] = Y[..., (2 * ei + ej) * C:
                                     (2 * ei + ej) * C + C]
        out = []
        for di in (0, 1):
            pt, pb = (1, 0) if di == 0 else (0, 1)
            for dj in (0, 1):
                pl, pr = (1, 0) if dj == 0 else (0, 1)
                out.append(jnp.pad(blocks[(1 - di, 1 - dj)],
                                   ((0, 0), (pt, pb), (pl, pr), (0, 0))))
        return jnp.concatenate(out, axis=-1)

    def rdb_packed(Y0):
        feats = [(Y0, NF)]
        for k, (wk, bk) in enumerate(w_pk):
            zs = [relayout(f, c) for f, c in feats]
            z = zs[0] if len(zs) == 1 else jnp.concatenate(zs, axis=-1)
            y = lax.conv_general_dilated(z, wk, (1, 1), "VALID",
                                         dimension_numbers=dn) + bk
            if k < 4:
                feats.append((lrelu(y), GC))
            else:
                return Y0 + 0.2 * y

    def rdb_packed_full(x):  # incl. entry/exit packing (once per chain)
        return d2s_std(rdb_packed(s2d_std(x)), NF)

    # exactness
    x = jax.device_put(rng.standard_normal((8, 128, 128, NF)).astype(bf))
    ref = np.asarray(rdb_direct(x).astype(jnp.float32))
    for nm, fn in [("pack44", rdb_pack44), ("packed", rdb_packed_full)]:
        d = float(np.abs(np.asarray(fn(x).astype(jnp.float32)) - ref).max())
        print(f"[exact] {nm}: max|d|={d:.1e}", flush=True)

    # 3-RDB trunk (residual chaining), timed
    def trunk(step):
        def f(x):
            for _ in range(3):
                x = step(x)
            return x
        return f

    def trunk_packed(x):
        Y = s2d_std(x)
        for _ in range(3):
            Y = rdb_packed(Y)
        return d2s_std(Y, NF)

    for nm, fn in [("direct", trunk(rdb_direct)),
                   ("pack44", trunk(rdb_pack44)),
                   ("packed", trunk_packed)]:
        t = timeit(chain_loop(fn, x), x)
        print(f"[B] 3-RDB trunk {nm}: {t / LOOP * 1e3:.3f} ms", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
