"""Internal fused ops emitted by optimizer passes (the hot-op fusion the
north star names: fused dequant+matmul / attention, BASELINE.json:5).

FusedDequantMatMul(x, w_q:int8 (K,N), scales:(N,)) — lowers to the Pallas
fused dequant+matmul kernel when Config.use_pallas, else to the jnp
composite XLA fuses on its own. Handles batched x by flattening leading
dims (static shapes make this free)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ir.graph import Node
from .registry import Ctx, register


@register("FusedAttention")
def fused_attention(ctx: Ctx, node: Node):
    """Scaled dot-product attention over (..., H, N, hd) Q/K/V (batched
    leading dims). Lowered via jax.nn.dot_product_attention, which XLA
    compiles to a fused, numerically-stable attention on TPU."""
    import jax

    q = ctx.get(node.inputs[0])
    k = ctx.get(node.inputs[1])
    v = ctx.get(node.inputs[2])
    scale = node.attr("scale", 1.0)
    bias = None
    if len(node.inputs) > 3 and node.inputs[3]:
        bias = ctx.get(node.inputs[3])
    # Native-layout operands ((B,N,H,hd), marked by the fusion pass when it
    # folded the surrounding transposes): feed dot_product_attention
    # directly — zero layout copies (probe16).
    if node.attr("q_native", 0) or node.attr("k_native", 0) \
            or node.attr("v_native", 0):
        qt = q if node.attr("q_native", 0) else jnp.swapaxes(q, 1, 2)
        kt = k if node.attr("k_native", 0) else jnp.swapaxes(k, 1, 2)
        vt = v if node.attr("v_native", 0) else jnp.swapaxes(v, 1, 2)
        # Baked batch-1 K/V constants (folded context projections) against
        # a batched query: the original MatMul broadcast; dpa requires
        # equal batch, so broadcast explicitly (free — they're constants).
        b = qt.shape[0]
        if kt.shape[0] == 1 and b != 1:
            kt = jnp.broadcast_to(kt, (b,) + kt.shape[1:])
        if vt.shape[0] == 1 and b != 1:
            vt = jnp.broadcast_to(vt, (b,) + vt.shape[1:])
        out = jax.nn.dot_product_attention(qt, kt, vt, bias=bias, scale=scale)
        out_shape = node.attr("out_shape")
        if out_shape is not None:
            out = out.reshape([int(s) for s in out_shape])
        else:
            out = jnp.swapaxes(out, 1, 2)  # back to (B,H,N,hd)
        ctx.set(node.outputs[0], out.astype(q.dtype))
        return
    use_pallas = bool(ctx.config is not None and getattr(ctx.config, "use_pallas", False))
    # Flash kernel pays off only for long sequences AND real head dims: at
    # ViT-sized N (~200) its small tiles lose to XLA's fused attention
    # (1154 vs 1569 img/s, probe6); at hd=16 (SD latent attention) every
    # formulation is MXU-lane-bound and flash loses even at N=4096
    # (probe30: 4.2 vs 5.7 TF/s). From n>=2048 with hd>=64 it wins
    # outright — 1.6x at 4096 and 19.5x at 8192, where XLA materializes
    # the O(N^2) scores (probe9) — so there it engages regardless of
    # use_pallas.
    auto_flash = (q.ndim == 4 and bias is None and q.shape[2] >= 2048
                  and q.shape[-1] >= 64)
    if (auto_flash or (use_pallas and q.ndim == 4 and bias is None
                       and q.shape[2] >= 512)):
        from ..kernels.flash_attention import flash_attention

        ctx.set(node.outputs[0], flash_attention(q, k, v, scale=scale).astype(q.dtype))
        return
    if (use_pallas and q.ndim == 4 and bias is None and q.shape[2] < 512
            and q.shape == k.shape == v.shape):
        # short-N fused kernel: whole score matrix in VMEM (probe14 — XLA
        # dpa spills (B,H,N,N) to HBM at these shapes)
        from ..kernels.attention_short import short_attention

        ctx.set(node.outputs[0],
                short_attention(q, k, v, scale=scale).astype(q.dtype))
        return
    # dot_product_attention wants (B, N, H, hd); our pattern is (B, H, N, hd).
    rank = q.ndim
    if rank == 4:
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        out = jax.nn.dot_product_attention(qt, kt, vt, bias=bias, scale=scale)
        out = jnp.swapaxes(out, 1, 2)
    elif rank == 3:
        # (B, N, hd): single-head
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
            bias=bias, scale=scale)[:, :, 0, :]
    else:
        from ..ir.errors import NotSupportedError

        raise NotSupportedError(f"FusedAttention rank {rank}")
    ctx.set(node.outputs[0], out.astype(q.dtype))


@register("FusedQKVAttention")
def fused_qkv_attention(ctx: Ctx, node: Node):
    """Attention over a packed (B, N, 3D) QKV tensor in native (B, N, H, hd)
    layout — zero transposes: the strided slot reads fuse into the
    attention's input loads (passes/fuse_attention.py::fuse_qkv_attention)."""
    import jax

    x = ctx.get(node.inputs[0])
    h = int(node.attr("num_heads"))
    scale = node.attr("scale", 1.0)
    b, n, three_d = x.shape
    d = three_d // 3
    hd = d // h
    # The packed layout is (..., 3, H, hd) flattened, so the three slots
    # are contiguous last-axis slices — cheap for XLA to fuse into the
    # attention input loads (slot-indexing a reshaped 5-D view instead
    # measured 28% SLOWER end-to-end: strided operand reads, probe16).
    q = x[..., :d].reshape(b, n, h, hd)
    k = x[..., d:2 * d].reshape(b, n, h, hd)
    v = x[..., 2 * d:].reshape(b, n, h, hd)
    out = jax.nn.dot_product_attention(q, k, v, scale=scale)
    ctx.set(node.outputs[0], out.reshape(b, n, d).astype(x.dtype))


@register("VitAttnBlock")
def vit_attn_block(ctx: Ctx, node: Node):
    """Whole pre-LN attention block in ONE VMEM-resident Pallas kernel:
    LN -> per-head-pair QKV projections -> softmax(QK^T)V -> output
    projection (+bias). Created by passes/vit_block.py; measured 2.5x
    XLA's fused block at the ViT-B/16 geometry (probe52). Residual stays
    outside (the downstream Add/SkipLayerNormalization fuses it)."""
    import jax

    from ..kernels.vit_block import _vit_block_impl

    x = ctx.get(node.inputs[0])
    g = ctx.get(node.inputs[1]).reshape(-1).astype("float32")
    b = ctx.get(node.inputs[2]).reshape(-1).astype("float32")
    wpk = ctx.get(node.inputs[3]).astype(x.dtype)
    bpk = ctx.get(node.inputs[4]).astype("float32")
    wp = ctx.get(node.inputs[5]).astype(x.dtype)
    bp = ctx.get(node.inputs[6]).reshape(-1).astype("float32")
    mask = (ctx.get(node.inputs[7])
            if len(node.inputs) > 7 and node.inputs[7] else None)
    interpret = jax.default_backend() != "tpu"
    out = _vit_block_impl(
        x, g, b, wpk, bpk, wp, bp, mask,
        heads=int(node.attr("num_heads")),
        # 0.0 = "kernel default 1/sqrt(hd)" (post-LN contrib path);
        # pre-LN graphs carry the explicit scale fuse_attention captured
        scale=float(node.attr("scale", 1.0)),
        eps=float(node.attr("epsilon", 1e-5)),
        residual=False, pre_ln=bool(node.attr("pre_ln", 1)),
        mask_filter=float(node.attr("mask_filter", -10000.0)),
        interpret=interpret)
    ctx.set(node.outputs[0], out)


@register("MlpBlock")
def mlp_block_op(ctx: Ctx, node: Node):
    """Whole transformer MLP in one VMEM-resident Pallas kernel:
    [LN ->] FC1 -> gelu -> FC2 [+ residual]. Created by
    passes/vit_block.py::fuse_mlp_block; 164 TF vs XLA's 109 at ViT-B
    geometry (probe54)."""
    import jax

    from ..kernels.mlp_block import mlp_block

    x = ctx.get(node.inputs[0])
    g = ctx.get(node.inputs[1]).reshape(-1).astype("float32")
    b = ctx.get(node.inputs[2]).reshape(-1).astype("float32")
    w1 = ctx.get(node.inputs[3]).astype(x.dtype)
    b1 = ctx.get(node.inputs[4]).reshape(-1).astype("float32")
    w2 = ctx.get(node.inputs[5]).astype(x.dtype)
    b2 = ctx.get(node.inputs[6]).reshape(-1).astype("float32")
    out = mlp_block(
        x, g, b, w1, b1, w2, b2,
        eps=float(node.attr("epsilon", 1e-5)),
        approximate=bool(node.attr("approximate", 0)),
        residual=bool(node.attr("residual", 1)),
        pre_ln=bool(node.attr("pre_ln", 1)),
        interpret=jax.default_backend() != "tpu")
    ctx.set(node.outputs[0], out)


@register("CrossAttnBlock")
def cross_attn_block_op(ctx: Ctx, node: Node):
    """Constant-context cross-attention block in one VMEM-resident Pallas
    kernel (q projection + per-head attention against folded k/v + output
    projection). Created by passes/vit_block.py for the SD zoo pattern."""
    import jax

    from ..kernels.vit_block import cross_attn_block

    x = ctx.get(node.inputs[0])
    wq = ctx.get(node.inputs[1]).astype(x.dtype)
    k = ctx.get(node.inputs[2]).astype(x.dtype)
    v = ctx.get(node.inputs[3]).astype(x.dtype)
    wp = ctx.get(node.inputs[4]).astype(x.dtype)
    bp = ctx.get(node.inputs[5]).reshape(-1).astype("float32")
    out = cross_attn_block(
        x, wq, k, v, wp, bp,
        heads=int(node.attr("num_heads")),
        scale=float(node.attr("scale", 0.0)) or None,
        interpret=jax.default_backend() != "tpu")
    ctx.set(node.outputs[0], out)


@register("ConvNeXtBlock")
def convnext_block_op(ctx: Ctx, node: Node):
    """Whole ConvNeXt block (dw7x7 -> LN -> FC1 -> gelu -> FC2 -> layer
    scale -> residual) in one VMEM-resident Pallas kernel
    (kernels/convnext_block.py; probe64)."""
    import jax

    from ..kernels.convnext_block import convnext_block

    x = ctx.get(node.inputs[0])
    args = [ctx.get(e) for e in node.inputs[1:]]
    dw, db, g, b, w1, b1, w2, b2, gm = args
    out = convnext_block(
        x, dw.astype(x.dtype), db.reshape(-1).astype("float32"),
        g.reshape(-1).astype("float32"), b.reshape(-1).astype("float32"),
        w1.astype(x.dtype), b1.reshape(-1).astype("float32"),
        w2.astype(x.dtype), b2.reshape(-1).astype("float32"),
        gm.reshape(-1).astype("float32"),
        eps=float(node.attr("epsilon", 1e-6)),
        interpret=jax.default_backend() != "tpu")
    ctx.set(node.outputs[0], out)


@register("FusedDequantMatMul")
def fused_dequant_matmul(ctx: Ctx, node: Node):
    from ..kernels.dequant_matmul import dequant_matmul, dequant_matmul_reference
    from ..kernels.int8_matmul import dequant_matmul_int8, dequant_matmul_int8_xla

    x = ctx.get(node.inputs[0])
    q = ctx.get(node.inputs[1])
    s = ctx.get(node.inputs[2])
    cfg = ctx.config
    use_pallas = bool(cfg is not None and getattr(cfg, "use_pallas", False))
    int8_acts = bool(cfg is not None and getattr(cfg, "int8_activations", False))
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape((m, x.shape[-1]))
    if int8_acts:
        # int8 MXU formulation (dynamic per-row activation quant): 1.48x
        # the bf16 fused path at serving shapes (tpu_probe12).
        fn = dequant_matmul_int8 if use_pallas else dequant_matmul_int8_xla
        y = fn(x2, q, s.reshape(-1))
    elif use_pallas:
        y = dequant_matmul(x2, q, s.reshape(-1))
    else:
        y = dequant_matmul_reference(x2, q, s.reshape(-1))
    ctx.set(node.outputs[0], y.reshape(lead + (q.shape[-1],)))


@register("FusedDequantMatMulI4")
def fused_dequant_matmul_i4(ctx: Ctx, node: Node):
    """x @ dequant(half-split-packed int4 weight, grouped scales).

    Inputs: x (..., K); packed (K/2, N) int8 (kernels/int4_matmul.py
    layout); scales (K/group, N) f32. On TPU the Pallas kernel is the
    only viable form — s4 arrays are backend-UNIMPLEMENTED and the XLA
    nibble-unpack composite materializes (~10x slower than bf16,
    probe67); off-TPU the composite is the reference path."""
    import jax

    from ..kernels.int4_matmul import int4_matmul, unpack_int4_half

    x = ctx.get(node.inputs[0])
    pk = ctx.get(node.inputs[1])
    s = ctx.get(node.inputs[2])
    g = int(node.attr("group"))
    k = 2 * pk.shape[0]
    n = pk.shape[1]
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape((m, k))
    if jax.default_backend() == "tpu":
        bn = getattr(ctx.config, "int4_block_n", None) if ctx.config else None
        y = int4_matmul(x2, pk, s, group=g, block_n=bn)
    else:
        w = unpack_int4_half(pk, k).astype(jnp.float32)
        rep = jnp.repeat(s.astype(jnp.float32), g, axis=0)
        y = jnp.dot(x2.astype(jnp.float32), w * rep,
                    preferred_element_type=jnp.float32)
    ctx.set(node.outputs[0], y.astype(x.dtype).reshape(lead + (n,)))


# test hook: force the Pallas ragged kernel (interpret off-TPU) so CPU
# e2e tests can exercise the kernel path the TPU lowering takes
_FORCE_RAGGED_KERNEL = False


def _ragged_kernel_ok(max_len: int, kvd: int, hd: int, dtype) -> bool:
    """Mosaic-envelope gate for the ragged decode-attention kernel: the
    per-head VMEM column slice needs lane-aligned heads, and the row
    block must be a legal sublane multiple for the cache dtype."""
    import numpy as np

    from ..kernels.ragged_decode_attention import _pick_block

    if hd % 128 or kvd % 128:
        return False
    bs = _pick_block(max_len, kvd, np.dtype(dtype).itemsize, 1024)
    sub = {1: 32, 2: 16}.get(np.dtype(dtype).itemsize, 8)
    return bs % sub == 0


@register("RaggedDecodeAttention")
def ragged_decode_attention_op(ctx: Ctx, node: Node):
    """Decode-step attention over a static KV cache, reading only rows
    <= pos + chunk - 1 (passes/ragged_attention.py emits it; the dense
    chain it replaced reads all max_len rows every step — probe78: 537
    MB/step at 7B/4k). Inputs: (q (c, dim), k (L, kvd), v (L, kvd),
    pos (1,)) or the int8-KV form (q, kq int8, ks (L,1), vq, vs, pos)."""
    import jax

    from ..kernels.ragged_decode_attention import (
        ragged_decode_attention, ragged_decode_attention_reference)

    q = ctx.get(node.inputs[0])
    quant = len(node.inputs) == 6
    if quant:
        k = ctx.get(node.inputs[1])
        ks = ctx.get(node.inputs[2])
        v = ctx.get(node.inputs[3])
        vs = ctx.get(node.inputs[4])
        pos = ctx.get(node.inputs[5])
    else:
        k = ctx.get(node.inputs[1])
        v = ctx.get(node.inputs[2])
        pos = ctx.get(node.inputs[3])
        ks = vs = None
    heads = int(node.attr("num_heads"))
    kvh = int(node.attr("kv_heads"))
    c = int(node.attr("chunk", 1))
    scale = float(node.attr("scale"))
    dim = q.shape[-1]
    hd = dim // heads
    g = heads // kvh
    max_len, kvd = k.shape
    # (c, dim) -> (kvh, g*c, hd); row r = g_idx*c + c_idx (c minor)
    qh = q.reshape(c, kvh, g, hd).transpose(1, 2, 0, 3).reshape(
        kvh, g * c, hd)
    use_kernel = _FORCE_RAGGED_KERNEL or (
        jax.default_backend() == "tpu"
        and _ragged_kernel_ok(max_len, kvd, hd, k.dtype))
    if use_kernel:
        blk = (getattr(ctx.config, "ragged_block", None)
               if ctx.config else None)
        out = ragged_decode_attention(
            qh, k, v, pos.reshape(()), ks, vs, c=c, kv_heads=kvh,
            scale=scale, **({"block": int(blk)} if blk else {}))
    else:
        out = ragged_decode_attention_reference(
            qh, k, v, pos.reshape(()), ks, vs,
            c=c, kv_heads=kvh, scale=scale)
    out = out.reshape(kvh, g, c, hd).transpose(2, 0, 1, 3).reshape(c, dim)
    ctx.set(node.outputs[0], out.astype(q.dtype))


@register("PagedDecodeAttention")
def paged_decode_attention_op(ctx: Ctx, node: Node):
    """Decode-step attention over a block-paged KV pool
    (kernels/paged_decode_attention.py): the RaggedDecodeAttention
    memory model with the per-slot contiguous cache replaced by
    page-table indirection, so serving HBM is pages-in-use instead of
    slots x max_len. Inputs: (q (c, dim), k_pool (P, ps, kvd), v_pool,
    table (npg,), pos (1,)) or the int8-pool form (q, kq, ks (P, ps, 1),
    vq, vs, table, pos). Attributes match RaggedDecodeAttention
    (num_heads, kv_heads, chunk, scale). The batched (slot-server) form
    takes q (B, c, dim), table (B, npg), pos (B,) and returns
    (B, c, dim) — the pool is inherently shared, so the paged servers
    build BATCHED step graphs instead of vmapping a per-slot one."""
    import jax

    from ..kernels.paged_decode_attention import (
        paged_decode_attention, paged_gather_reference)
    from ..kernels.ragged_decode_attention import (
        ragged_decode_attention_reference)

    q = ctx.get(node.inputs[0])
    quant = len(node.inputs) == 7
    if quant:
        k, ks, v, vs, table, pos = (ctx.get(n) for n in node.inputs[1:])
    else:
        k, v, table, pos = (ctx.get(n) for n in node.inputs[1:])
        ks = vs = None
    heads = int(node.attr("num_heads"))
    kvh = int(node.attr("kv_heads"))
    c = int(node.attr("chunk", 1))
    scale = float(node.attr("scale"))
    batched = q.ndim == 3
    bsz = q.shape[0] if batched else 1
    dim = q.shape[-1]
    hd = dim // heads
    g = heads // kvh
    _, ps, kvd = k.shape
    npg = table.shape[-1]
    qh = q.reshape(bsz, c, kvh, g, hd).transpose(0, 2, 3, 1, 4).reshape(
        bsz, kvh, g * c, hd)
    table2 = table.reshape(bsz, npg)
    pos2 = pos.reshape(bsz)
    # pages ARE the kernel's row blocks: the sublane/lane gate applies
    # to the page size directly (no block search — paging fixed it)
    import numpy as _np
    sub = {1: 32, 2: 16}.get(_np.dtype(k.dtype).itemsize, 8)
    use_kernel = _FORCE_RAGGED_KERNEL or (
        jax.default_backend() == "tpu"
        and hd % 128 == 0 and kvd % 128 == 0 and ps % sub == 0)
    if use_kernel:
        out = paged_decode_attention(
            qh, k, v, table2, pos2, ks, vs,
            c=c, kv_heads=kvh, scale=scale)
    else:
        L = npg * ps
        kd = paged_gather_reference(k, table2, L)
        vd = paged_gather_reference(v, table2, L)
        ksd = paged_gather_reference(ks, table2, L) if quant else None
        vsd = paged_gather_reference(vs, table2, L) if quant else None
        out = jnp.stack([
            ragged_decode_attention_reference(
                qh[b], kd[b], vd[b], pos2[b],
                None if ksd is None else ksd[b],
                None if vsd is None else vsd[b],
                c=c, kv_heads=kvh, scale=scale)
            for b in range(bsz)])
    out = out.reshape(bsz, kvh, g, c, hd).transpose(0, 3, 1, 2, 4)
    out = out.reshape((bsz, c, dim) if batched else (c, dim))
    ctx.set(node.outputs[0], out.astype(q.dtype))


@register("PagedCacheUpdate")
def paged_cache_update_op(ctx: Ctx, node: Node):
    """Scatter this step's K or V rows into the paged pool:
    (pool (P, ps, kvd), table (B, npg), pos (B,), rows (B, c, kvd)) ->
    updated pool. Dead slots are handled by the SCRATCH-PAGE discipline
    (serving/kv_pool.py PagePool(scratch=True)): their table rows point
    at the reserved page, so their writes land there instead of
    corrupting re-assigned pages — no in-graph mask needed."""
    from ..kernels.paged_decode_attention import paged_cache_update

    pool, table, pos, rows = (ctx.get(n) for n in node.inputs)
    bsz = rows.shape[0]
    ctx.set(node.outputs[0], paged_cache_update(
        pool, table.reshape(bsz, -1), pos.reshape(bsz), rows))
