"""Paged decode-attention Pallas kernel (block-paged KV-cache pool).

The bucket ladder (serving/decode_server.py::BucketedDecodeServer)
bounds KV HBM by cache LENGTH class; fragmentation remains when a
bucket's slots hold mostly-short sequences. This kernel removes the
per-slot contiguous-cache requirement entirely: K/V live in ONE shared
pool of fixed-size pages, `(n_pages, page_size, kvd)`, and each slot
owns a PAGE TABLE row — exactly the vLLM PagedAttention memory model,
built the TPU way. No gather materializes the logical cache: the page
table rides as a scalar-prefetch operand and the BlockSpec index map
resolves `logical block j of slot b -> pool page table[b, j]`, so the
pipeline DMAs each live page straight from its pool position. Blocks
past the slot's position clamp to the last live page (Pallas elides the
repeated DMA — the revisiting rule) and `pl.when` skips their compute:
per-step HBM traffic is ceil((pos+1)/ps) pages per slot, like the
ragged kernel, while HBM CAPACITY is pages-in-use, not slots x max_len.

Everything else matches kernels/ragged_decode_attention.py: flash
streaming softmax over the prefix, GQA q (B, kvh, g*c, hd), full-row
page reads ((ps, kvd) contiguous DMA, per-head slices in VMEM), int8
pools with per-row f32 scales, frontier rows zeroed on BOTH operands
before the p@v dot (0 * stale = NaN guard).

The logical position of pool page `table[b, j]` row r is `j*ps + r`;
writes go through `paged_cache_update` (a c-row scatter — tiny, XLA
handles it; the kernel owns the read side where the bytes are).

Reference scope: none (the reference is a CNN engine, SURVEY.md §5.7);
this closes docs/ROADMAP.md's "paged KV pool behind the ragged kernel"
item — the BASELINE.json:5 serving-memory mandate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pt_ref, pos_ref, *refs, c: int, g: int, hd: int, ps: int,
            kvh: int, npg: int, scale: float, quant: bool, out_dtype):
    if quant:
        q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref \
            = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        ks_ref = vs_ref = None
    b_i = pl.program_id(0)
    j = pl.program_id(1)
    pos = pos_ref[b_i]
    jmax = jnp.minimum((pos + c - 1) // ps, npg - 1)
    gc = g * c

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j <= jmax)
    def _block():
        # logical cache position of each score column / each v row: page
        # slot j covers logical rows [j*ps, (j+1)*ps) regardless of WHERE
        # in the pool the page lives — the index map did the indirection
        col = jax.lax.broadcasted_iota(jnp.int32, (gc, ps), 1) + j * ps
        rowc = jax.lax.broadcasted_iota(jnp.int32, (gc, ps), 0) % c
        limit = pos + rowc
        vrow = jax.lax.broadcasted_iota(jnp.int32, (ps, hd), 0) + j * ps
        for h in range(kvh):
            sl = slice(h * hd, (h + 1) * hd)
            kh = k_ref[0, :, sl].astype(jnp.float32)        # (ps, hd)
            if quant:
                kh = kh * ks_ref[0].astype(jnp.float32)     # (ps, 1)
            qh = q_ref[0, h].astype(jnp.float32)            # (gc, hd)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (gc, ps)
            s = jnp.where(col <= limit, s, -jnp.inf)
            m_prev = m_ref[h]                                # (gc, 1)
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            vh = v_ref[0, :, sl].astype(jnp.float32)         # (ps, hd)
            if quant:
                vh = vh * vs_ref[0].astype(jnp.float32)
            # zero rows past the frontier: a freed-and-reused page holds
            # another sequence's values — finite, but 0 * inf would NaN
            vh = jnp.where(vrow <= pos + (c - 1), vh,
                           jnp.zeros_like(vh))
            l_ref[h] = (alpha * l_ref[h]
                        + jnp.sum(p, axis=1, keepdims=True))
            acc_ref[h] = acc_ref[h] * alpha + jnp.dot(
                p, vh, preferred_element_type=jnp.float32)
            m_ref[h] = m_new

    @pl.when(j == jmax)
    def _out():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_dtype)


def _paged_call(q, k, v, ks, vs, table, pos, *, c: int, kv_heads: int,
                scale: float, interpret: bool):
    """q (B, kvh, g*c, hd); k/v pool (P, ps, kvh*hd); ks/vs (P, ps, 1)
    f32 or None; table (B, npg) int32; pos (B,) int32."""
    bsz, kvh, gc, hd = q.shape
    npages, ps, kvd = k.shape
    assert kvd == kvh * hd, (q.shape, k.shape)
    assert gc % c == 0, (gc, c)
    g = gc // c
    npg = table.shape[1]
    quant = ks is not None

    def page(b, j, pt, p):
        jc = jnp.minimum(j, jnp.minimum((p[b] + c - 1) // ps, npg - 1))
        return pt[b, jc]

    kv_spec = pl.BlockSpec((1, ps, kvd),
                           lambda b, j, pt, p: (page(b, j, pt, p), 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, ps, 1),
                           lambda b, j, pt, p: (page(b, j, pt, p), 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, kvh, gc, hd),
                          lambda b, j, pt, p: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = ([q_spec, kv_spec, sc_spec, kv_spec, sc_spec] if quant
                else [q_spec, kv_spec, kv_spec])
    args = (q, k, ks, v, vs) if quant else (q, k, v)
    kernel = functools.partial(
        _kernel, c=c, g=g, hd=hd, ps=ps, kvh=kvh, npg=npg, scale=scale,
        quant=quant, out_dtype=q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, npg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kvh, gc, hd),
                               lambda b, j, pt, p: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kvh, gc, 1), jnp.float32),   # running max
            pltpu.VMEM((kvh, gc, 1), jnp.float32),   # running sum
            pltpu.VMEM((kvh, gc, hd), jnp.float32),  # accumulator
        ],
    )
    # static cost estimate: charge the per-slot logical worst case
    row_bytes = kvd * k.dtype.itemsize + (4 if quant else 0)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * kvh * gc * hd * npg * ps,
            bytes_accessed=(2 * bsz * npg * ps * row_bytes
                            + 2 * q.size * q.dtype.itemsize),
            transcendentals=bsz * kvh * gc * npg * ps,
        ),
        interpret=interpret,
    )(table.astype(jnp.int32), pos.astype(jnp.int32), *args)


@functools.lru_cache(maxsize=None)
def _partitioned(c: int, kv_heads: int, scale: float, quant: bool,
                 interpret: bool):
    """GSPMD/Shardy rule: TP shards by kv head — q on its head axis, the
    POOLS on their compound (head, hd) last axis; page table / positions
    replicate (they are tiny int32 metadata). Same shape of rule as
    ragged_decode_attention._partitioned; need_replication_factors in
    factor-appearance order (the Shardy sorted-indices requirement)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    kw = dict(c=c, kv_heads=kv_heads, scale=scale, interpret=interpret)

    if quant:
        @custom_partitioning
        def cp(q, k, ks, v, vs, table, pos):
            return _paged_call(q, k, v, ks, vs, table, pos, **kw)
        # factors: b=0 h=1 m=2 d=3 p=4 s=5 u=6 n=7
        rule = ("b h m d, p s (h d), p s u, p s (h d), p s u, b n, b "
                "-> b h m d")
        nrf = ("m", "d", "p", "s", "u", "n")
    else:
        @custom_partitioning
        def cp(q, k, v, table, pos):
            return _paged_call(q, k, v, None, None, table, pos, **kw)
        rule = "b h m d, p s (h d), p s (h d), b n, b -> b h m d"
        nrf = ("m", "d", "p", "s", "n")

    def _axes(arg_infos):
        spec = getattr(arg_infos[0].sharding, "spec", None)  # q
        b_ax = h_ax = None
        if spec is not None and len(spec) >= 2:
            b_ax, h_ax = spec[0], spec[1]
        if h_ax is None:
            # q replicated while the pools carry the TP sharding: the k
            # pool's (p, s, (h d)) last axis is the head axis
            kspec = getattr(arg_infos[1].sharding, "spec", None)
            if kspec is not None and len(kspec) >= 3:
                h_ax = kspec[2]
        return b_ax, h_ax

    def infer(mesh, arg_infos, result_infos):
        b_ax, h_ax = _axes(arg_infos)
        return NamedSharding(mesh, P(b_ax, h_ax, None, None))

    def partition(mesh, arg_infos, result_infos):
        b_ax, h_ax = _axes(arg_infos)
        qs = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        cs = NamedSharding(mesh, P(None, None, h_ax))
        ss = NamedSharding(mesh, P(None, None, None))
        ts = NamedSharding(mesh, P(b_ax, None))
        ps_ = NamedSharding(mesh, P(b_ax))
        arg_sh = ((qs, cs, ss, cs, ss, ts, ps_) if quant
                  else (qs, cs, cs, ts, ps_))

        def lower(*args):
            if quant:
                q, k, ks, v, vs, table, pos = args
            else:
                (q, k, v, table, pos), ks, vs = args, None, None
            return _paged_call(q, k, v, ks, vs, table, pos, **kw)

        return mesh, lower, qs, arg_sh

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule, need_replication_factors=nrf)
    return cp


def paged_decode_attention(q, k_pool, v_pool, page_table, pos,
                           k_scale=None, v_scale=None, *, c: int,
                           kv_heads: int, scale: float,
                           interpret: bool | None = None):
    """Slot-batched paged attention. q (B, kvh, g*c, hd); pools
    (P, page_size, kvh*hd) float — or int8 with per-row f32 scale pools
    (P, page_size, 1); page_table (B, npg) int32 pool-page ids (entries
    past the live prefix may be stale — they are never dereferenced);
    pos (B,) int32. Returns (B, kvh, g*c, hd) in q's dtype having read
    only the ceil((pos+c)/page_size) live pages per slot. On TPU,
    page_size should be a multiple of the sublane tile (8 at f32/int8,
    16 at bf16) — 128 or 256 are the measured-sane choices (probe82's
    block sweep applies unchanged: pages ARE the kernel's blocks)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pos = jnp.asarray(pos).reshape(-1).astype(jnp.int32)
    quant = k_scale is not None
    fn = _partitioned(int(c), int(kv_heads), float(scale), quant,
                      bool(interpret))
    if quant:
        return fn(q, k_pool, k_scale, v_pool, v_scale, page_table, pos)
    return fn(q, k_pool, v_pool, page_table, pos)


def paged_cache_update(pool, page_table, pos, rows, active=None):
    """Write `rows` (B, c, kvd) at logical positions pos..pos+c-1 of each
    slot into the paged pool (P, ps, kvd); returns the updated pool.
    The scatter is c rows per slot — bytes ~ B*c*kvd, negligible next to
    the kernel's read side — so plain XLA scatter is the right tool (the
    probe-backed "kernels only where the bytes are" rule).

    `active` (B,) bool masks DEAD slots out of the scatter entirely
    (their index is pushed out of bounds and mode='drop' discards it).
    This is load-bearing, not cosmetic: a finished slot's stale page
    table may point at pages the allocator has already handed to
    ANOTHER sequence — an unmasked write would corrupt the new owner's
    cache (caught by the release-and-reuse drive workload; the kernel's
    READ side needs no mask because it clamps to each slot's pos)."""
    P_, ps, kvd = pool.shape
    bsz, c, _ = rows.shape
    l = pos.reshape(-1, 1).astype(jnp.int32) + jnp.arange(c)[None]  # (B,c)
    pg = jnp.take_along_axis(page_table.astype(jnp.int32),
                             jnp.clip(l // ps, 0,
                                      page_table.shape[1] - 1), axis=1)
    idx = pg * ps + l % ps
    if active is not None:
        idx = jnp.where(jnp.asarray(active).reshape(-1, 1), idx, P_ * ps)
    flat = pool.reshape(P_ * ps, kvd)
    flat = flat.at[idx.reshape(-1)].set(
        rows.reshape(-1, kvd).astype(pool.dtype), mode="drop")
    return flat.reshape(P_, ps, kvd)


def paged_gather_reference(pool, page_table, n_rows: int):
    """Materialize slot caches (B, n_rows, kvd) from the pool — test/
    debug only (the kernel never does this)."""
    P_, ps, kvd = pool.shape
    l = jnp.arange(n_rows)
    pg = page_table[:, l // ps]                              # (B, n)
    idx = pg * ps + (l % ps)[None]
    return pool.reshape(P_ * ps, kvd)[idx]
