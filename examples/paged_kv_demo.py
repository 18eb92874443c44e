"""Paged-KV serving substrate demo: mixed-length slot workload through
PagePool admission/growth/release + paged writes + the page-table-
indirect attention kernel, checked against the dense ragged reference
at every step (kernels/paged_decode_attention.py, serving/kv_pool.py).

Run: JAX_PLATFORMS=cpu python examples/paged_kv_demo.py"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from smelter_tpu.serving import PagePool, PoolExhausted
from smelter_tpu.kernels.paged_decode_attention import (
    paged_decode_attention, paged_cache_update)
from smelter_tpu.kernels.ragged_decode_attention import (
    ragged_decode_attention_reference)

rng = np.random.default_rng(7)
kvh, g, hd, ps = 2, 2, 8, 8
kvd = kvh * hd
slots, n_pages, npg = 3, 10, 4
pool = PagePool(n_pages, ps, slots)
kp = jnp.zeros((n_pages, ps, kvd), jnp.float32)
vp = jnp.zeros((n_pages, ps, kvd), jnp.float32)
dense_k = np.zeros((slots, npg * ps, kvd), np.float32)
dense_v = np.zeros((slots, npg * ps, kvd), np.float32)

lengths = [5, 22, 30]   # mixed-length "requests"
pos = [0, 0, 0]
table_np = pool.table(npg)
steps = 0
for t in range(30):
    live = [b for b in range(slots) if pos[b] < lengths[b]]
    if not live:
        break
    for b in live:
        pool.ensure(b, pos[b] + 1)
    table_np = pool.table(npg, out=table_np)
    table = jnp.asarray(table_np)
    p = jnp.asarray([pos[b] if b in live else 0 for b in range(slots)],
                    jnp.int32)
    krow = rng.standard_normal((slots, 1, kvd)).astype(np.float32)
    vrow = rng.standard_normal((slots, 1, kvd)).astype(np.float32)
    act = jnp.asarray([b in live for b in range(slots)])
    kp = paged_cache_update(kp, table, p, jnp.asarray(krow), act)
    vp = paged_cache_update(vp, table, p, jnp.asarray(vrow), act)
    q = jnp.asarray(rng.standard_normal((slots, kvh, g, hd)), np.float32)
    out = paged_decode_attention(q, kp, vp, table, p, c=1, kv_heads=kvh,
                                 scale=0.3)
    for b in live:
        dense_k[b, pos[b]] = krow[b, 0]
        dense_v[b, pos[b]] = vrow[b, 0]
        want = ragged_decode_attention_reference(
            q[b], jnp.asarray(dense_k[b]), jnp.asarray(dense_v[b]),
            pos[b], c=1, kv_heads=kvh, scale=0.3)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(want),
                                   atol=2e-6, rtol=1e-5,
                                   err_msg=f"t={t} slot={b}")
        pos[b] += 1
        steps += 1
    # finished sequences free their pages mid-flight
    for b in range(slots):
        if pos[b] == lengths[b] and pool.pages_of(b):
            pool.release(b)
            print(f"t={t}: slot {b} done, freed; free={pool.free_pages}")

print(f"parity at every one of {steps} steps; peak cache pages used: "
      f"{n_pages - pool.free_pages} live at end")

# backpressure probe: a request the pool can't hold must raise cleanly
pool2 = PagePool(2, 8, slots=1)
try:
    pool2.ensure(0, 100)
    raise SystemExit("expected PoolExhausted")
except PoolExhausted as e:
    print("backpressure OK:", e)

# bad page table (slot holding more pages than table width) must raise
pool3 = PagePool(8, 4, slots=1)
pool3.ensure(0, 32)
try:
    pool3.table(npg=2)
    raise SystemExit("expected ValueError")
except ValueError:
    print("table-overflow guard OK")
print("DRIVE PASSED")
