"""TPU probe #66: attention-block kernel images_per_step sweep at ViT-B.

Per-image grids forfeit cross-batch overlap (three e2e inversions say
so); the attention kernel WON anyway — can taller per-step projection
GEMMs (ips images folded into one GEMM) push it further? Isolated block
sweep at B=128, N=197, D=768, H=12, then the winning ips end-to-end.
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

    from smelter_tpu.kernels.vit_block import (_vit_block_impl,
                                               pack_qkv_weights)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, N, D, H = 128, 197, 768, 12
    x = jax.device_put(rng.standard_normal((B, N, D)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    g = jax.device_put((rng.standard_normal(D) * .1 + 1).astype(np.float32))
    b = jax.device_put((rng.standard_normal(D) * .1).astype(np.float32))
    wqkv = (rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32)
    bqkv = (rng.standard_normal(3 * D) * .02).astype(np.float32)
    wp = jax.device_put((rng.standard_normal((D, D)) / np.sqrt(D))
                        .astype(np.float32)).astype(jnp.bfloat16)
    bp = jax.device_put((rng.standard_normal(D) * .02).astype(np.float32))
    wpk, bpk = pack_qkv_weights(wqkv, bqkv, H)
    wpk = jax.device_put(wpk.astype(np.float32)).astype(jnp.bfloat16)
    bpk = jax.device_put(bpk.astype(np.float32))

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

    arms = {}
    for ips in (1, 2, 4):
        def step(t, ips=ips):
            return _vit_block_impl(t, g, b, wpk, bpk, wp, bp, heads=H,
                                   interpret=False, images_per_step=ips)
        f4, f12 = chained(step, 4), chained(step, 12)
        sync(f4(x)), sync(f12(x))
        arms[ips] = (f4, f12, [float("inf")], [float("inf")])
        print(f"ips={ips}: compiled", flush=True)
    for _ in range(5):
        for ips, (f4, f12, lo, hi) in arms.items():
            t0 = time.perf_counter(); sync(f4(x))
            lo[0] = min(lo[0], time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f12(x))
            hi[0] = min(hi[0], time.perf_counter() - t0)
    for ips, (f4, f12, lo, hi) in arms.items():
        dt = max(1e-9, (hi[0] - lo[0]) / 8)
        print(f"vit block ips={ips}: {dt*1e3:.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
