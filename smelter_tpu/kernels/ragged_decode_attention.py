"""Ragged decode-attention Pallas kernel (length-aware KV-cache reads).

Why this exists: the decode step attends over a STATIC (max_len, kvd)
cache with a position mask, so XLA reads every cache row every token —
at 7B/4k that is 537 MB/step of bf16 K/V (probe78) even when the live
sequence is 10 tokens, and in the slot-batched servers the waste scales
with batch while the weight stream does not. This kernel streams only
the cache blocks at or below the current position: the grid covers all
max_len/bs blocks (static), but the BlockSpec index map clamps past-the-
position blocks to the last valid one — Pallas elides the repeated DMA
(revisiting rule) and `pl.when` skips the compute, so HBM traffic is
ceil((pos+1)/bs) blocks instead of max_len rows. Flash-style streaming
softmax (running max / sum / accumulator in VMEM scratch, exactly
kernels/flash_attention.py's formulation) makes one pass over the
prefix.

Shapes (one stream): q (kvh, g*c, hd) — g = query heads per kv head
(GQA), c = tokens decoded this call (1 for plain decode, gamma+1 for
the speculative verify chunk; query row r = g_idx*c + c_idx attends
cache positions <= pos + c_idx); k/v (max_len, kvh*hd) row-major —
blocks read FULL rows ((bs, kvd) contiguous DMA; per-head column
slices happen in VMEM, the probe74 strided-chunk lesson). int8 KV
caches (runtime kv_quant) pass per-row scales (max_len, 1) and the
dequant multiply rides the VPU between the DMA and the dot.

Batched form (the DecodeServer/SpecDecodeServer slot loop): leading B
on q/k/v/pos, grid (B, nblocks), per-slot clamp — each slot reads only
ITS prefix. custom_vmap folds the servers' vmap onto that grid
(a naive vmap would lift B into an outer grid dim but keep full-length
reads per slot; the rule keeps the per-slot clamp).

Reference scope: none (the reference is a CNN engine with no attention
op, SURVEY.md §5.7); this is the BASELINE.json:5 speed-of-light mandate
applied to the decode-serving KV stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, *refs, c: int, g: int, hd: int, bs: int, kvh: int,
            nb: int, scale: float, quant: bool, out_dtype):
    if quant:
        q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref \
            = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        ks_ref = vs_ref = None
    b_i = pl.program_id(0)
    j = pl.program_id(1)
    pos = pos_ref[b_i]
    jmax = jnp.minimum((pos + c - 1) // bs, nb - 1)
    gc = g * c

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j <= jmax)
    def _block():
        # global cache position of each score column / each v row
        col = jax.lax.broadcasted_iota(jnp.int32, (gc, bs), 1) + j * bs
        # query row r = g_idx*c + c_idx attends positions <= pos + c_idx
        rowc = jax.lax.broadcasted_iota(jnp.int32, (gc, bs), 0) % c
        limit = pos + rowc
        vrow = jax.lax.broadcasted_iota(jnp.int32, (bs, hd), 0) + j * bs
        for h in range(kvh):
            sl = slice(h * hd, (h + 1) * hd)
            kh = k_ref[0, :, sl].astype(jnp.float32)        # (bs, hd)
            if quant:
                kh = kh * ks_ref[0].astype(jnp.float32)     # (bs, 1)
            qh = q_ref[0, h].astype(jnp.float32)            # (gc, hd)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (gc, bs)
            s = jnp.where(col <= limit, s, -jnp.inf)
            m_prev = m_ref[h]                                # (gc, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            vh = v_ref[0, :, sl].astype(jnp.float32)         # (bs, hd)
            if quant:
                vh = vh * vs_ref[0].astype(jnp.float32)
            # zero rows past the frontier: a reused slot's cache holds the
            # previous occupant's values — finite, but 0 * inf would NaN
            vh = jnp.where(vrow <= pos + (c - 1), vh, jnp.zeros_like(vh))
            l_ref[h] = alpha * l_ref[h] + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jnp.dot(
                p, vh, preferred_element_type=jnp.float32)
            m_ref[h] = m_new

    @pl.when(j == jmax)
    def _out():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_dtype)


def _pick_block(max_len: int, kvd: int, itemsize: int, block: int) -> int:
    """Largest row-block that divides max_len and keeps the k+v blocks
    (double-buffered by the pipeline) within a conservative VMEM slice.
    Bigger blocks amortize the per-grid-step latency (the per-head MXU
    dots are tiny at decode shapes) at the cost of reading one larger
    first block at short positions — probe82 sweeps the tradeoff."""
    budget = 8 << 20
    bs = min(block, max_len)
    while max_len % bs:
        bs -= 1
    # shrink within the divisors of max_len: a bs that does not divide
    # max_len would silently drop the tail cache rows in _batched
    while bs > 8 and 2 * 2 * bs * kvd * itemsize > budget:
        nxt = bs - 1
        while nxt > 8 and max_len % nxt:
            nxt -= 1
        if nxt == bs or max_len % nxt:
            break
        bs = nxt
    assert max_len % bs == 0, (max_len, bs)
    return bs


def _batched(q, k, v, ks, vs, pos, *, c: int, kv_heads: int, scale: float,
             block: int, interpret: bool):
    """q (B, kvh, g*c, hd); k/v (B, L, kvh*hd); ks/vs (B, L, 1) f32 or
    None; pos (B,) int32. Returns (B, kvh, g*c, hd) in q.dtype.
    kv_heads is the GLOBAL head count (documentation + cache key); the
    kernel derives the local count from q so the TP partition rule can
    run it per-shard on a head slice."""
    bsz, kvh, gc, hd = q.shape
    _, max_len, kvd = k.shape
    assert kvd == kvh * hd, (q.shape, k.shape)
    assert gc % c == 0, (gc, c)
    g = gc // c
    quant = ks is not None
    bs = _pick_block(max_len, kvd, k.dtype.itemsize, block)
    nb = max_len // bs

    def clamp(b, j, p):
        return jnp.minimum(j, jnp.minimum((p[b] + c - 1) // bs, nb - 1))

    kv_spec = pl.BlockSpec((1, bs, kvd),
                           lambda b, j, p: (b, clamp(b, j, p), 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, bs, 1),
                           lambda b, j, p: (b, clamp(b, j, p), 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, kvh, gc, hd), lambda b, j, p: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = ([q_spec, kv_spec, sc_spec, kv_spec, sc_spec] if quant
                else [q_spec, kv_spec, kv_spec])
    args = (q, k, ks, v, vs) if quant else (q, k, v)
    kernel = functools.partial(
        _kernel, c=c, g=g, hd=hd, bs=bs, kvh=kvh, nb=nb, scale=scale,
        quant=quant, out_dtype=q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kvh, gc, hd),
                               lambda b, j, p: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kvh, gc, 1), jnp.float32),   # running max
            pltpu.VMEM((kvh, gc, 1), jnp.float32),   # running sum
            pltpu.VMEM((kvh, gc, hd), jnp.float32),  # accumulator
        ],
    )
    # cost model: the point of the kernel is that bytes ~ prefix, but the
    # estimate must be static — charge the worst case (full cache)
    kv_bytes = 2 * (k.size * k.dtype.itemsize
                    + (ks.size * 4 if quant else 0))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * kvh * gc * hd * max_len,
            bytes_accessed=kv_bytes + 2 * q.size * q.dtype.itemsize,
            transcendentals=bsz * kvh * gc * max_len,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), *args)


@functools.lru_cache(maxsize=None)
def _partitioned(c: int, kv_heads: int, scale: float, block: int,
                 quant: bool, interpret: bool):
    """GSPMD/Shardy partition rule over the BATCHED core: TP shards the
    decode attention by kv head — q on its head axis, caches on their
    compound (head, hd) last axis — and the SPMD partitioner cannot split
    an opaque tpu_custom_call, so sharded caches would otherwise be
    ALL-GATHERED around the kernel every step (the int4_matmul lesson:
    a kernel in a serving loop needs vmap AND partitioning rules). Rule:
    per-shard kernel on the local head slice; positions/slot axis ride
    along (slots may shard over dp)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    kw = dict(c=c, kv_heads=kv_heads, scale=scale, block=block,
              interpret=interpret)

    if quant:
        @custom_partitioning
        def cp(q, k, ks, v, vs, pos):
            return _batched(q, k, v, ks, vs, pos, **kw)
        # need_replication_factors must follow factor-appearance order in
        # the rule (b=0, h=1, m=2, d=3, l=4, u=5) — Shardy's verifier
        # rejects unsorted special-factor indices.
        rule = "b h m d, b l (h d), b l u, b l (h d), b l u, b -> b h m d"
        nrf = ("m", "d", "l", "u")
    else:
        @custom_partitioning
        def cp(q, k, v, pos):
            return _batched(q, k, v, None, None, pos, **kw)
        rule = "b h m d, b l (h d), b l (h d), b -> b h m d"
        nrf = ("m", "d", "l")

    def _axes(arg_infos):
        spec = getattr(arg_infos[0].sharding, "spec", None)  # q
        b_ax = h_ax = None
        if spec is not None and len(spec) >= 2:
            b_ax, h_ax = spec[0], spec[1]
        if h_ax is None or b_ax is None:
            # q may arrive replicated while the caches carry the TP
            # sharding (e.g. q produced by a replicated projection):
            # read the k cache's (b, l, (h d)) spec — its last axis is
            # the head axis, its first the slot axis.
            kspec = getattr(arg_infos[1].sharding, "spec", None)
            if kspec is not None and len(kspec) >= 3:
                b_ax = b_ax if b_ax is not None else kspec[0]
                h_ax = h_ax if h_ax is not None else kspec[2]
        return b_ax, h_ax

    def infer(mesh, arg_infos, result_infos):
        b_ax, h_ax = _axes(arg_infos)
        return NamedSharding(mesh, P(b_ax, h_ax, None, None))

    def partition(mesh, arg_infos, result_infos):
        b_ax, h_ax = _axes(arg_infos)
        qs = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        cs = NamedSharding(mesh, P(b_ax, None, h_ax))
        ss = NamedSharding(mesh, P(b_ax, None, None))
        ps = NamedSharding(mesh, P(b_ax))
        arg_sh = ((qs, cs, ss, cs, ss, ps) if quant else (qs, cs, cs, ps))

        def lower(*args):
            if quant:
                q, k, ks, v, vs, pos = args
            else:
                (q, k, v, pos), ks, vs = args, None, None
            return _batched(q, k, v, ks, vs, pos, **kw)

        return mesh, lower, qs, arg_sh

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule, need_replication_factors=nrf)
    return cp


@functools.lru_cache(maxsize=None)
def _vmappable(c: int, kv_heads: int, scale: float, block: int,
               quant: bool, interpret: bool):
    """custom_vmap wrapper: the slot servers jit(vmap(step)) over slots —
    the rule routes that onto the batched grid so each slot still reads
    only ITS valid prefix (a default vmap would re-derive a lifted kernel
    without the per-slot clamp)."""
    import jax.custom_batching

    cp = _partitioned(c, kv_heads, scale, block, quant, interpret)

    if quant:
        @jax.custom_batching.custom_vmap
        def call(q, k, ks, v, vs, pos):
            return cp(q[None], k[None], ks[None], v[None], vs[None],
                      pos[None])[0]
    else:
        @jax.custom_batching.custom_vmap
        def call(q, k, v, pos):
            return cp(q[None], k[None], v[None], pos[None])[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        full = [bcast(a, b) for a, b in zip(args, in_batched)]
        if quant:
            q, k, ks, v, vs, pos = full
            return cp(q, k, ks, v, vs, pos), True
        q, k, v, pos = full
        return cp(q, k, v, pos), True

    return call


def ragged_decode_attention(q, k, v, pos, k_scale=None, v_scale=None, *,
                            c: int, kv_heads: int, scale: float,
                            block: int = 1024,
                            interpret: bool | None = None):
    """One stream: q (kvh, g*c, hd); k/v (max_len, kvh*hd) float — or int8
    with per-row f32 scales k_scale/v_scale (max_len, 1); pos () or (1,)
    int. Returns (kvh, g*c, hd) attention output in q's dtype, having
    read only cache rows <= pos + c - 1. vmap-safe (slot-batched grid)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pos = jnp.asarray(pos).reshape(()).astype(jnp.int32)
    quant = k_scale is not None
    fn = _vmappable(int(c), int(kv_heads), float(scale), int(block),
                    quant, bool(interpret))
    if quant:
        return fn(q, k, k_scale, v, v_scale, pos)
    return fn(q, k, v, pos)


def ragged_decode_attention_reference(q, k, v, pos, k_scale=None,
                                      v_scale=None, *, c: int,
                                      kv_heads: int, scale: float):
    """Dense masked reference (the exact computation the fusion pass
    replaces, modulo streaming-softmax summation order)."""
    kvh, gc, hd = q.shape
    max_len = k.shape[0]
    g = gc // c
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale.astype(jnp.float32)
        vf = vf * v_scale.astype(jnp.float32)
    k3 = kf.reshape(max_len, kvh, hd)
    v3 = vf.reshape(max_len, kvh, hd)
    q4 = q.astype(jnp.float32).reshape(kvh, g, c, hd)
    s = jnp.einsum("hgcd,lhd->hgcl", q4, k3) * scale
    ar = jnp.arange(max_len)
    limit = jnp.asarray(pos).reshape(()) + jnp.arange(c)  # (c,)
    mask = ar[None, :] <= limit[:, None]                  # (c, L)
    s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("hgcl,lhd->hgcd", p, v3)
    return out.reshape(kvh, gc, hd).astype(q.dtype)
