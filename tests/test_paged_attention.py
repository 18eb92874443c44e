"""Paged KV-cache pool: kernel parity vs the ragged dense reference on
scattered pages, write-path round trip, allocator invariants, and the TP
sharding rule (kernels/paged_decode_attention.py, serving/kv_pool.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smelter_tpu.kernels.paged_decode_attention import (
    paged_cache_update,
    paged_decode_attention,
    paged_gather_reference,
)
from smelter_tpu.kernels.ragged_decode_attention import (
    ragged_decode_attention_reference,
)
from smelter_tpu.serving.kv_pool import PagePool, PoolExhausted


def _scatter_pool(rng, n_pages, ps, kvd, table, logical, dtype=np.float32):
    """Build a pool whose pages table[b, :] spell out `logical[b]`
    (B, L, kvd); unreferenced pages get noise (they must never matter)."""
    pool = rng.standard_normal((n_pages, ps, kvd)).astype(dtype)
    B, L, _ = logical.shape
    for b in range(B):
        for j in range(L // ps):
            pool[table[b, j]] = logical[b, j * ps:(j + 1) * ps]
    return pool


# -- kernel vs dense reference (interpret mode) ---------------------------

@pytest.mark.parametrize("c", [1, 3])
def test_paged_matches_reference(rng, c):
    kvh, g, hd, ps, npg, B = 2, 2, 16, 8, 4, 3
    L = npg * ps
    kvd = kvh * hd
    n_pages = 16
    q = jnp.asarray(rng.standard_normal((B, kvh, g * c, hd)), jnp.float32)
    k_log = rng.standard_normal((B, L, kvd)).astype(np.float32)
    v_log = rng.standard_normal((B, L, kvd)).astype(np.float32)
    # deliberately non-contiguous, interleaved page assignment
    table = np.array([[7, 2, 11, 5], [0, 9, 3, 14], [12, 1, 8, 4]],
                     np.int32)
    kp = jnp.asarray(_scatter_pool(rng, n_pages, ps, kvd, table, k_log))
    vp = jnp.asarray(_scatter_pool(rng, n_pages, ps, kvd, table, v_log))
    pos = jnp.asarray([0, 13, L - c], jnp.int32)
    got = paged_decode_attention(q, kp, vp, jnp.asarray(table), pos,
                                 c=c, kv_heads=kvh, scale=0.25)
    for b in range(B):
        want = ragged_decode_attention_reference(
            q[b], jnp.asarray(k_log[b]), jnp.asarray(v_log[b]),
            int(pos[b]), c=c, kv_heads=kvh, scale=0.25)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   atol=2e-6, rtol=1e-5,
                                   err_msg=f"slot {b}")


def test_paged_int8_pools(rng):
    kvh, g, c, hd, ps, npg, B = 2, 1, 2, 16, 8, 2, 2
    L = npg * ps
    kvd = kvh * hd
    q = jnp.asarray(rng.standard_normal((B, kvh, g * c, hd)), jnp.float32)
    k_log = rng.integers(-127, 127, (B, L, kvd)).astype(np.int8)
    v_log = rng.integers(-127, 127, (B, L, kvd)).astype(np.int8)
    ks_log = (rng.random((B, L, 1)) * 0.1 + 1e-3).astype(np.float32)
    vs_log = (rng.random((B, L, 1)) * 0.1 + 1e-3).astype(np.float32)
    table = np.array([[3, 0], [5, 2]], np.int32)
    kp = jnp.asarray(_scatter_pool(rng, 8, ps, kvd, table,
                                   k_log.astype(np.float32)).astype(np.int8))
    vp = jnp.asarray(_scatter_pool(rng, 8, ps, kvd, table,
                                   v_log.astype(np.float32)).astype(np.int8))
    ksp = jnp.asarray(_scatter_pool(rng, 8, ps, 1, table, ks_log))
    vsp = jnp.asarray(_scatter_pool(rng, 8, ps, 1, table, vs_log))
    pos = jnp.asarray([5, 11], jnp.int32)
    got = paged_decode_attention(q, kp, vp, jnp.asarray(table), pos,
                                 ksp, vsp, c=c, kv_heads=kvh, scale=0.25)
    for b in range(B):
        want = ragged_decode_attention_reference(
            q[b], jnp.asarray(k_log[b]), jnp.asarray(v_log[b]),
            int(pos[b]), jnp.asarray(ks_log[b]), jnp.asarray(vs_log[b]),
            c=c, kv_heads=kvh, scale=0.25)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"slot {b}")


def test_paged_ignores_foreign_pages(rng):
    """Pages not in a slot's live prefix — another slot's pages, free
    pages, and the slot's OWN stale table entries — must not affect its
    output, even when they hold inf."""
    kvh, g, hd, ps, B = 2, 1, 16, 8, 2
    kvd = kvh * hd
    q = jnp.asarray(rng.standard_normal((B, kvh, g, hd)), jnp.float32)
    pool = rng.standard_normal((8, ps, kvd)).astype(np.float32)
    table = np.array([[1, 6], [4, 3]], np.int32)
    pos = jnp.asarray([ps - 1, 3], jnp.int32)  # slot0 1 page, slot1 1 page
    a = paged_decode_attention(q, jnp.asarray(pool), jnp.asarray(pool),
                               jnp.asarray(table), pos, c=1,
                               kv_heads=kvh, scale=0.25)
    poisoned = pool.copy()
    for pg in (0, 2, 5, 7, 6, 3):  # free pages + both stale 2nd entries
        poisoned[pg] = np.inf
    # rows past pos inside the live page too (slot1 uses rows 0..3)
    poisoned2 = poisoned.copy()
    poisoned2[4, 4:] = np.inf
    b = paged_decode_attention(q, jnp.asarray(poisoned2),
                               jnp.asarray(poisoned2),
                               jnp.asarray(table), pos, c=1,
                               kv_heads=kvh, scale=0.25)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert np.isfinite(np.asarray(b)).all()


# -- write path -----------------------------------------------------------

def test_paged_cache_update_roundtrip(rng):
    ps, kvd, B, c = 8, 12, 2, 3
    pool = jnp.zeros((6, ps, kvd), jnp.float32)
    table = jnp.asarray([[5, 1, 3], [0, 4, 2]], jnp.int32)
    pos = jnp.asarray([6, 14], jnp.int32)  # slot0 crosses a page boundary
    rows = jnp.asarray(rng.standard_normal((B, c, kvd)), jnp.float32)
    new = paged_cache_update(pool, table, pos, rows)
    got = paged_gather_reference(new, table, 3 * ps)
    for b in range(B):
        for i in range(c):
            np.testing.assert_array_equal(
                np.asarray(got[b, int(pos[b]) + i]),
                np.asarray(rows[b, i]))
    # everything else untouched (still zero)
    mask = np.ones((B, 3 * ps), bool)
    for b in range(B):
        mask[b, int(pos[b]):int(pos[b]) + c] = False
    assert np.all(np.asarray(got)[mask] == 0)


def test_inactive_slot_write_is_dropped(rng):
    """A finished slot's stale page table may point at pages the
    allocator has re-assigned to another sequence: with active=False its
    scatter must be DROPPED, leaving the new owner's rows intact (the
    release-and-reuse hazard the /tmp drive caught)."""
    ps, kvd = 8, 6
    pool = jnp.asarray(rng.standard_normal((3, ps, kvd)), jnp.float32)
    # slot0 (dead) stale table points at page 1 — now owned by slot1
    table = jnp.asarray([[1], [1]], jnp.int32)
    pos = jnp.asarray([0, 4], jnp.int32)
    rows = jnp.asarray(rng.standard_normal((2, 1, kvd)), jnp.float32)
    new = paged_cache_update(pool, table, pos, rows,
                             active=jnp.asarray([False, True]))
    np.testing.assert_array_equal(np.asarray(new[1, 0]),
                                  np.asarray(pool[1, 0]))  # not clobbered
    np.testing.assert_array_equal(np.asarray(new[1, 4]),
                                  np.asarray(rows[1, 0]))


def test_write_then_attend_e2e(rng):
    """Decode-loop shape: append one token per step through the paged
    write, attend through the paged kernel; parity vs a dense cache."""
    kvh, g, hd, ps = 2, 2, 8, 8
    kvd = kvh * hd
    pool_k = jnp.zeros((4, ps, kvd), jnp.float32)
    pool_v = jnp.zeros((4, ps, kvd), jnp.float32)
    table = jnp.asarray([[2, 0]], jnp.int32)
    dense_k = np.zeros((2 * ps, kvd), np.float32)
    dense_v = np.zeros((2 * ps, kvd), np.float32)
    for t in range(12):
        krow = rng.standard_normal((1, 1, kvd)).astype(np.float32)
        vrow = rng.standard_normal((1, 1, kvd)).astype(np.float32)
        pos = jnp.asarray([t], jnp.int32)
        pool_k = paged_cache_update(pool_k, table, pos, jnp.asarray(krow))
        pool_v = paged_cache_update(pool_v, table, pos, jnp.asarray(vrow))
        dense_k[t], dense_v[t] = krow[0, 0], vrow[0, 0]
        q = jnp.asarray(rng.standard_normal((1, kvh, g, hd)), jnp.float32)
        got = paged_decode_attention(q, pool_k, pool_v, table, pos,
                                     c=1, kv_heads=kvh, scale=0.3)
        want = ragged_decode_attention_reference(
            q[0], jnp.asarray(dense_k), jnp.asarray(dense_v), t,
            c=1, kv_heads=kvh, scale=0.3)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                                   atol=2e-6, rtol=1e-5, err_msg=f"t={t}")


# -- allocator ------------------------------------------------------------

class TestPagePool:
    def test_ensure_grows_and_is_idempotent(self):
        p = PagePool(n_pages=8, page_size=16, slots=2)
        new = p.ensure(0, 20)  # 2 pages
        assert len(new) == 2 and p.capacity(0) == 32
        assert p.ensure(0, 30) == []  # already covered
        assert p.free_pages == 6
        p.ensure(1, 16)
        assert p.free_pages == 5
        assert set(p.pages_of(0)).isdisjoint(p.pages_of(1))

    def test_release_recycles_lifo(self):
        p = PagePool(4, 8, slots=2)
        first = p.ensure(0, 24)
        p.release(0)
        assert p.free_pages == 4
        second = p.ensure(1, 24)
        assert second == first  # LIFO keeps the working set dense

    def test_exhaustion_is_all_or_nothing(self):
        p = PagePool(3, 8, slots=2)
        p.ensure(0, 16)
        with pytest.raises(PoolExhausted):
            p.ensure(1, 24)  # needs 3, only 1 free
        assert p.pages_of(1) == [] and p.free_pages == 1
        assert not p.can_admit(24)
        assert p.can_admit(8)

    def test_table_renders_and_updates_in_place(self):
        p = PagePool(6, 4, slots=3)
        p.ensure(0, 9)   # 3 pages
        p.ensure(2, 4)   # 1 page
        t = p.table(npg=4)
        assert t.shape == (3, 4) and t.dtype == np.int32
        assert list(t[0, :3]) == p.pages_of(0)
        assert t[2, 0] == p.pages_of(2)[0]
        assert (t < 6).all() and (t >= 0).all()
        p.release(0)
        p.ensure(1, 8)
        t2 = p.table(npg=4, out=t)
        assert list(t2[1, :2]) == p.pages_of(1)
        # stale slot-0 entries remain valid indices (never dereferenced)
        assert (t2 < 6).all()

    def test_table_overflow_raises(self):
        p = PagePool(8, 4, slots=1)
        p.ensure(0, 20)  # 5 pages
        with pytest.raises(ValueError):
            p.table(npg=4)


# -- TP sharding rule -----------------------------------------------------

def test_tp_sharded_paged_no_allgather(rng, eight_devices):
    """kv-head-sharded q + head-block-sharded POOLS run per shard:
    parity vs unsharded and zero all-gathers in the compiled HLO (the
    pool is the big buffer — gathering it would defeat paging)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smelter_tpu.parallel.mesh import MeshPlan

    kvh, g, c, hd, ps, npg, B = 8, 2, 1, 16, 8, 2, 2
    kvd = kvh * hd
    q = jnp.asarray(rng.standard_normal((B, kvh, g * c, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((6, ps, kvd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((6, ps, kvd)), jnp.float32)
    table = jnp.asarray([[4, 1], [0, 3]], jnp.int32)
    pos = jnp.asarray([11, 5], jnp.int32)
    want = np.asarray(paged_decode_attention(
        q, kp, vp, table, pos, c=c, kv_heads=kvh, scale=0.25))
    plan = MeshPlan.for_devices(8, tp=2)
    with plan.mesh:
        qs = NamedSharding(plan.mesh, P(None, "tp", None, None))
        cs = NamedSharding(plan.mesh, P(None, None, "tp"))
        rs = NamedSharding(plan.mesh, P(None, None))
        ns = NamedSharding(plan.mesh, P(None))
        jf = jax.jit(
            lambda a, b_, d, t, p: paged_decode_attention(
                a, b_, d, t, p, c=c, kv_heads=kvh, scale=0.25),
            in_shardings=(qs, cs, cs, rs, ns))
        got = np.asarray(jf(q, kp, vp, table, pos))
        hlo = jf.lower(q, kp, vp, table, pos).compile().as_text()
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
    assert "all-gather" not in hlo


# -- graph-level fused op -------------------------------------------------

def _paged_graph(ps, npg, n_pages, heads, kvh, hd, c, quant=False):
    from smelter_tpu import GraphBuilder
    from smelter_tpu.utils import dtypes as dt

    dim = heads * hd
    kvd = kvh * hd
    b = GraphBuilder("paged_step")
    ins = [b.input("q", (c, dim))]
    if quant:
        ins += [b.input("k_pool", (n_pages, ps, kvd), dt.INT8),
                b.input("k_scale", (n_pages, ps, 1)),
                b.input("v_pool", (n_pages, ps, kvd), dt.INT8),
                b.input("v_scale", (n_pages, ps, 1))]
    else:
        ins += [b.input("k_pool", (n_pages, ps, kvd)),
                b.input("v_pool", (n_pages, ps, kvd))]
    ins += [b.input("table", (npg,), dt.INT32),
            b.input("pos", (1,), dt.INT32)]
    out = b.node("PagedDecodeAttention", ins, ["attn"],
                 num_heads=heads, kv_heads=kvh, chunk=c,
                 scale=1.0 / np.sqrt(hd))
    return b.finish([out])


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("force_kernel", [False, True])
def test_graph_op_matches_dense(rng, quant, force_kernel):
    """The PagedDecodeAttention graph op (both CPU-reference and forced-
    kernel paths) matches the dense ragged reference on the gathered
    logical cache."""
    import smelter_tpu.ops.fused_ops as fo
    from smelter_tpu.runtime.executor import Executor

    heads, kvh, hd, c = 4, 2, 16, 2
    ps, npg, n_pages = 8, 3, 6
    dim, kvd = heads * hd, kvh * hd
    L = npg * ps
    g = _paged_graph(ps, npg, n_pages, heads, kvh, hd, c, quant)
    ex = Executor(g)
    params = ex.init_params()
    fn = ex.build_fn()
    q = jnp.asarray(rng.standard_normal((c, dim)), jnp.float32)
    table = np.array([4, 0, 2], np.int32)
    k_log = rng.standard_normal((1, L, kvd)).astype(np.float32)
    v_log = rng.standard_normal((1, L, kvd)).astype(np.float32)
    pos = 13
    if quant:
        k_log = k_log.round().clip(-5, 5)
        v_log = v_log.round().clip(-5, 5)
        kp = _scatter_pool(rng, n_pages, ps, kvd, table[None], k_log,
                           np.float32).astype(np.int8)
        vp = _scatter_pool(rng, n_pages, ps, kvd, table[None], v_log,
                           np.float32).astype(np.int8)
        ks = np.full((n_pages, ps, 1), 0.5, np.float32)
        vs = np.full((n_pages, ps, 1), 0.25, np.float32)
        args = (q, jnp.asarray(kp), jnp.asarray(ks), jnp.asarray(vp),
                jnp.asarray(vs))
        ksl = np.full((L, 1), 0.5, np.float32)
        vsl = np.full((L, 1), 0.25, np.float32)
    else:
        kp = _scatter_pool(rng, n_pages, ps, kvd, table[None], k_log)
        vp = _scatter_pool(rng, n_pages, ps, kvd, table[None], v_log)
        args = (q, jnp.asarray(kp), jnp.asarray(vp))
        ksl = vsl = None
    args = args + (jnp.asarray(table), jnp.asarray([pos], jnp.int32))
    fo._FORCE_RAGGED_KERNEL = force_kernel
    try:
        (got,) = fn(params, *args)
    finally:
        fo._FORCE_RAGGED_KERNEL = False
    qh = np.asarray(q).reshape(c, kvh, heads // kvh, hd).transpose(
        1, 2, 0, 3).reshape(kvh, (heads // kvh) * c, hd)
    want = ragged_decode_attention_reference(
        jnp.asarray(qh),
        jnp.asarray(k_log[0].astype(np.int8) if quant else k_log[0]),
        jnp.asarray(v_log[0].astype(np.int8) if quant else v_log[0]),
        pos,
        None if ksl is None else jnp.asarray(ksl),
        None if vsl is None else jnp.asarray(vsl),
        c=c, kv_heads=kvh, scale=1.0 / np.sqrt(hd))
    want = np.asarray(want).reshape(kvh, heads // kvh, c, hd).transpose(
        2, 0, 1, 3).reshape(c, dim)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-6,
                               rtol=1e-5)
