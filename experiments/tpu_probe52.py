"""TPU probe #52: whole-block ViT attention kernel vs XLA (VERDICT r2 #4).

ViT-B/16 geometry: B=128, N=197, D=768, H=12. Rows (robust min-of-rounds
K-differenced, probe51 methodology):
  (a) XLA block: LN -> packed QKV -> dot_product_attention -> proj
      (+residual) — what the engine's FusedQKVAttention path runs today.
  (b) the whole-block Pallas kernel.
  (c) 12 chained blocks of each — the full encoder attention stack, so
      weight-reload effects across blocks are included.
Decision per BENCHMARKS: if (b) < (a), wire behind use_pallas as the
ViT default; else record the loss + per-op decomposition.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.vit_block import (
        _vit_block_impl, pack_qkv_weights)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, N, D, H = 128, 197, 768, 12
    hd = D // H
    L = 12

    x = jax.device_put(rng.standard_normal((B, N, D)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    g = jax.device_put((rng.standard_normal(D) * .1 + 1).astype(np.float32))
    b = jax.device_put((rng.standard_normal(D) * .1).astype(np.float32))
    wqkv = jax.device_put((rng.standard_normal((D, 3 * D)) / np.sqrt(D))
                          .astype(np.float32)).astype(jnp.bfloat16)
    bqkv = jax.device_put((rng.standard_normal(3 * D) * .02)
                          .astype(np.float32))
    wp = jax.device_put((rng.standard_normal((D, D)) / np.sqrt(D))
                        .astype(np.float32)).astype(jnp.bfloat16)
    bp = jax.device_put((rng.standard_normal(D) * .02).astype(np.float32))
    wpk, bpk = pack_qkv_weights(np.asarray(wqkv, np.float32),
                                np.asarray(bqkv), H)
    wpk = jax.device_put(wpk.astype(np.float32)).astype(jnp.bfloat16)
    bpk = jax.device_put(bpk.astype(np.float32))

    def xla_block(t):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, -1, keepdims=True)
        xc = tf - mu
        var = jnp.mean(xc * xc, -1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + 1e-5) * g + b).astype(t.dtype)
        qkv = xn @ wqkv + bqkv.astype(t.dtype)
        q = qkv[..., :D].reshape(B, N, H, hd)
        k = qkv[..., D:2 * D].reshape(B, N, H, hd)
        v = qkv[..., 2 * D:].reshape(B, N, H, hd)
        a = jax.nn.dot_product_attention(q, k, v, scale=1.0 / hd ** 0.5)
        a = a.reshape(B, N, D)
        return t + (a @ wp + bp.astype(t.dtype)).astype(t.dtype)

    def pallas_block(t):
        return _vit_block_impl(t, g, b, wpk, bpk, wp, bp, heads=H,
                               interpret=False)

    def chained(step, loop):
        @jax.jit
        def run(t):
            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                return step(t + zero.astype(t.dtype))
            return jax.lax.fori_loop(0, loop, body, jnp.zeros_like(t))
        return run

    def robust(step, lo=4, hi=12, rounds=4):
        f_lo, f_hi = chained(step, lo), chained(step, hi)
        sync(f_lo(x)), sync(f_hi(x))
        t_lo = t_hi = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter(); sync(f_lo(x))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f_hi(x))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return max(1e-9, (t_hi - t_lo) / (hi - lo))

    # numerics sanity on-chip first
    got = jax.jit(pallas_block)(x)
    want = jax.jit(xla_block)(x)

    @jax.jit
    def relerr(a, c):
        d = jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
        return d / (jnp.max(jnp.abs(c.astype(jnp.float32))) + 1e-9)

    print("on-chip rel err:", float(np.asarray(relerr(got, want))),
          flush=True)

    fl_block = B * (3 * 2 * N * D * D + 4 * N * N * D + 2 * N * D * D)
    for tag, step in [("xla block", xla_block),
                      ("pallas whole-block", pallas_block)]:
        dt = robust(step)
        print(f"{tag}: {dt*1e3:.3f} ms = {fl_block/dt/1e12:.1f} TF "
              f"({B/dt/12:.0f} img/s-equiv for 12 blocks of this)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
