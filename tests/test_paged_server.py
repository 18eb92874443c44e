"""Paged decode serving: batched paged step graph parity vs the dense
per-slot step, PagedDecodeServer greedy parity vs DecodeServer, page
growth/release accounting, and pool backpressure incl. the all-stalled
eviction path (serving/paged_server.py, models/llama_style.py::
build_decode_step_paged)."""

import concurrent.futures

import jax.numpy as jnp
import numpy as np
import pytest

from smelter_tpu.models import llama_style
from smelter_tpu.runtime.executor import Executor
from smelter_tpu.serving.kv_pool import PoolExhausted
from smelter_tpu.serving.paged_server import PagedDecodeServer

CFG = dict(vocab=64, dim=32, heads=4, kv_heads=2, ffn=64, layers=2)
PS, NPG, NPAGES = 8, 3, 10  # max per-slot len 24, pool 10 pages


def _weights():
    return llama_style.make_weights(
        **{k: CFG[k] for k in
           ("vocab", "dim", "heads", "kv_heads", "ffn", "layers")},
        max_len=NPAGES * PS)


def _paged(w, slots):
    g, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=slots, page_size=PS, n_pages=NPAGES,
        npg=NPG)
    return g


def _dense(w):
    g, _ = llama_style.build_decode_step(weights=w, **CFG,
                                         max_len=NPG * PS)
    return g


def test_batched_paged_step_matches_dense(rng):
    """Two slots at different positions/pages through the batched paged
    graph == the dense per-slot step graph, step by step."""
    w = _weights()
    gp = _paged(w, slots=2)
    gd = _dense(w)
    exp, exd = Executor(gp), Executor(gd)
    pp, pd = exp.init_params(), exd.init_params()
    fp, fd = exp.build_fn(), exd.build_fn()
    kvd = CFG["kv_heads"] * (CFG["dim"] // CFG["heads"])

    pools = {v.name: jnp.zeros(tuple(v.type.shape), jnp.float32)
             for v in gp.inputs if v.name.startswith(("k_pool", "v_pool"))}
    table = jnp.asarray([[2, 5, 1], [7, 3, 0]], jnp.int32)
    dense_caches = [
        {v.name: jnp.zeros(tuple(v.type.shape), jnp.float32)
         for v in gd.inputs if v.name.startswith(("k_cache", "v_cache"))}
        for _ in range(2)]
    toks = [[3, 9, 14, 2, 7], [5, 1]]
    seqs = [list(t) for t in toks]
    for t in range(10):
        tok = np.array([[seqs[0][t] if t < len(seqs[0]) else 1],
                        [seqs[1][t] if t < len(seqs[1]) else 1]],
                       np.int64)
        for b in range(2):
            if t >= len(seqs[b]):
                seqs[b].append(int(tok[b, 0]))
        pos = np.array([t, t], np.int64)
        by = {"token": jnp.asarray(tok), "pos": jnp.asarray(pos),
              "page_table": table, **pools}
        outs = fp(pp, *[by[v.name] for v in gp.inputs])
        logits_p = np.asarray(outs[0])
        new_pools = list(outs[1:])
        pools = dict(zip([v.name for v in gp.inputs
                          if v.name.startswith(("k_pool", "v_pool"))],
                         new_pools))
        for b in range(2):
            byd = {"token": jnp.asarray(tok[b]),
                   "pos": jnp.asarray([t], np.int64),
                   **dense_caches[b]}
            outs_d = fd(pd, *[byd[v.name] for v in gd.inputs])
            np.testing.assert_allclose(
                logits_p[b], np.asarray(outs_d[0]), atol=2e-5,
                rtol=1e-4, err_msg=f"t={t} slot={b}")
            names = [v.name for v in gd.inputs
                     if v.name.startswith(("k_cache", "v_cache"))]
            # dense graph outputs: logits + caches in k_out/v_out order
            for nm, arr in zip(names, outs_d[1:]):
                dense_caches[b][nm] = arr


def _greedy_reference(w, prompt, n_new):
    """Greedy continuation via DecodeServer on the dense step graph."""
    from smelter_tpu.serving.decode_server import DecodeServer

    srv = DecodeServer(_dense(w), slots=2)
    try:
        return srv.submit(prompt, n_new).result(timeout=300)
    finally:
        srv.shutdown()


def test_server_greedy_parity_mixed_lengths(rng):
    """Mixed-length concurrent requests through PagedDecodeServer give
    token-identical greedy outputs to DecodeServer, and all pages return
    to the pool afterwards."""
    w = _weights()
    srv = PagedDecodeServer(_paged(w, slots=3))
    try:
        prompts = [[3, 9, 14], [5], [7, 2, 11, 4, 1, 8]]
        n_news = [6, 10, 4]
        futs = [srv.submit(p, n) for p, n in zip(prompts, n_news)]
        got = [f.result(timeout=300) for f in futs]
    finally:
        srv.shutdown()
    for p, n, g in zip(prompts, n_news, got):
        want = _greedy_reference(w, p, n)
        assert g == want, (p, g, want)
    assert srv.pool.free_pages == NPAGES - 1  # all released (1 scratch)


def test_server_stop_tokens_and_overlong(rng):
    w = _weights()
    srv = PagedDecodeServer(_paged(w, slots=2), stop_tokens=(0,))
    try:
        with pytest.raises(ValueError):
            srv.submit(list(range(NPG * PS)), 4).result(timeout=60)
        r = srv.submit([4, 4], 0).result(timeout=60)
        assert r == [4, 4]
        out = srv.submit([3, 1], 8).result(timeout=300)
        assert len(out) <= 2 + 8
    finally:
        srv.shutdown()


def test_backpressure_stall_and_resume(rng):
    """A pool too small for all requests at once must stall (not fail)
    the excess and finish every request correctly once pages free."""
    w = _weights()
    g, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=3, page_size=PS, n_pages=4, npg=NPG)
    srv = PagedDecodeServer(g)  # 3 usable pages (1 scratch) for 3 slots
    try:
        prompts = [[3, 9], [5, 1], [7, 2]]
        # each needs 2 pages to reach len 2+8=10 > 8: all three cannot
        # hold 2 pages simultaneously (3 free) — somebody must stall
        futs = [srv.submit(p, 8) for p in prompts]
        got = []
        for f in futs:
            try:
                got.append(f.result(timeout=300))
            except PoolExhausted:
                got.append(None)
        stats = srv.stats()
    finally:
        srv.shutdown()
    finished = [g_ for g_ in got if g_ is not None]
    assert len(finished) >= 2  # eviction may fail at most the one loser
    for p, g_ in zip(prompts, got):
        if g_ is not None:
            assert g_ == _greedy_reference(w, p, 8), (p, g_)
    assert stats["stall_ticks"] > 0 or None not in got
    assert srv.pool.free_pages == 3


def test_deadlock_eviction_fails_minimal_work(rng):
    """Two slots that stall on the same tick with zero free pages: the
    least-progressed one is evicted with PoolExhausted and the other
    completes correctly."""
    w = _weights()
    g, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=3, npg=NPG)
    srv = PagedDecodeServer(g)  # 2 usable pages, both slots need 2
    try:
        fa = srv.submit([3, 9, 14, 2], 8)   # crosses page 1 boundary
        fb = srv.submit([5, 1], 10)         # also crosses
        res, errs = [], []
        for f in (fa, fb):
            try:
                res.append(f.result(timeout=300))
            except PoolExhausted as e:
                res.append(None)
                errs.append(e)
    finally:
        srv.shutdown()
    assert len(errs) == 1  # exactly one evicted
    winner = [r for r in res if r is not None]
    assert len(winner) == 1
    if res[0] is not None:
        assert res[0] == _greedy_reference(w, [3, 9, 14, 2], 8)
    else:
        assert res[1] == _greedy_reference(w, [5, 1], 10)
    assert srv.pool.free_pages == 2


def test_sequential_requests_reuse_pages(rng):
    """Back-to-back requests through one server recycle pages (LIFO) and
    stay correct — slot/page reuse never leaks a previous occupant."""
    w = _weights()
    srv = PagedDecodeServer(_paged(w, slots=2))
    try:
        for prompt in ([3, 9], [14, 2, 7], [1]):
            got = srv.submit(prompt, 5).result(timeout=300)
            assert got == _greedy_reference(w, prompt, 5), prompt
            assert srv.pool.free_pages == NPAGES - 1
    finally:
        srv.shutdown()


def test_int8_kv_paged_server(rng):
    """kv_quant=True pools (int8 + per-row scale pools) through the
    server: outputs match the dense int8-KV DecodeServer (the same
    row-quant recipe, so token-identical greedy chains)."""
    from smelter_tpu.serving.decode_server import DecodeServer

    w = _weights()
    gp, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=NPAGES,
        npg=NPG, kv_quant=True)
    assert any(v.name.startswith("k_scale_pool_") for v in gp.inputs)
    srv = PagedDecodeServer(gp)
    gd, _ = llama_style.build_decode_step(weights=w, **CFG,
                                          max_len=NPG * PS,
                                          kv_quant=True)
    ref = DecodeServer(gd, slots=2)
    try:
        prompts = [[3, 9, 14], [5, 1, 7, 2]]
        futs = [srv.submit(p, 6) for p in prompts]
        rfuts = [ref.submit(p, 6) for p in prompts]
        got = [f.result(timeout=300) for f in futs]
        want = [f.result(timeout=300) for f in rfuts]
    finally:
        srv.shutdown()
        ref.shutdown()
    assert got == want
    assert srv.pool.free_pages == NPAGES - 1


def test_paged_graph_tp_sharded_lowers(rng, eight_devices):
    """The batched paged step graph under a TP mesh: head-block-sharded
    pools through PagedDecodeAttention's partition rule (forced kernel,
    interpret mode) must lower, run, and match the unsharded graph."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import smelter_tpu.ops.fused_ops as fo
    from smelter_tpu.parallel.mesh import MeshPlan

    cfg = dict(vocab=64, dim=512, heads=4, kv_heads=2, ffn=128,
               layers=1)
    w = llama_style.make_weights(max_len=32, **cfg)
    g, _ = llama_style.build_decode_step_paged(
        weights=w, **cfg, slots=2, page_size=8, n_pages=6, npg=2)
    ex = Executor(g)
    params = ex.init_params()
    fn = ex.build_fn()
    kvd = cfg["kv_heads"] * (cfg["dim"] // cfg["heads"])
    by = {"token": jnp.asarray([[3], [7]], jnp.int32),
          "pos": jnp.asarray([4, 9], jnp.int32),
          "page_table": jnp.asarray([[2, 5], [1, 3]], jnp.int32)}
    for v in g.inputs:
        if v.name.startswith(("k_pool", "v_pool")):
            by[v.name] = jnp.asarray(
                rng.standard_normal((6, 8, kvd)) * 0.1, jnp.float32)
    args = [by[v.name] for v in g.inputs]
    fo._FORCE_RAGGED_KERNEL = True
    try:
        want = [np.asarray(o) for o in fn(params, *args)]
        plan = MeshPlan.for_devices(8, tp=2)
        pool_sh = NamedSharding(plan.mesh, P(None, None, "tp"))
        shardings = [
            pool_sh if v.name.startswith(("k_pool", "v_pool"))
            else NamedSharding(plan.mesh, P(*([None] * len(v.type.shape))))
            for v in g.inputs]
        with plan.mesh:
            jf = jax.jit(fn, in_shardings=(None, *shardings))
            got = [np.asarray(o) for o in jf(params, *args)]
    finally:
        fo._FORCE_RAGGED_KERNEL = False
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(a, b_, atol=2e-5, rtol=1e-4)


def test_paged_chunk_graph_matches_dense(rng):
    """chunk>1 (the speculative VERIFY shape) through the paged graph:
    c tokens per slot in one forward, cache writes crossing page
    boundaries, row i attending <= pos+i — parity vs the dense chunk
    graph. This is the building block for speculative paged serving."""
    c = 3
    w = _weights()
    gp, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=NPAGES,
        npg=NPG, chunk=c)
    gd, _ = llama_style.build_decode_step(weights=w, **CFG,
                                          max_len=NPG * PS, chunk=c)
    exp, exd = Executor(gp), Executor(gd)
    fp, fd = exp.build_fn(), exd.build_fn()
    pp, pd = exp.init_params(), exd.init_params()
    pools = {v.name: jnp.zeros(tuple(v.type.shape), jnp.float32)
             for v in gp.inputs if v.name.startswith(("k_pool", "v_pool"))}
    table = jnp.asarray([[4, 1, 6], [2, 7, 3]], jnp.int32)
    dense = [{v.name: jnp.zeros(tuple(v.type.shape), jnp.float32)
              for v in gd.inputs
              if v.name.startswith(("k_cache", "v_cache"))}
             for _ in range(2)]
    # pos 6: the c=3 window crosses the page-0/page-1 boundary
    for t0 in (0, 6, 12):
        tok = rng.integers(1, CFG["vocab"] - 1, (2, c))
        by = {"token": jnp.asarray(tok), "pos": jnp.asarray([t0, t0]),
              "page_table": table, **pools}
        outs = fp(pp, *[by[v.name] for v in gp.inputs])
        pools = dict(zip(
            [v.name for v in gp.inputs
             if v.name.startswith(("k_pool", "v_pool"))], outs[1:]))
        for b in range(2):
            byd = {"token": jnp.asarray(tok[b]),
                   "pos": jnp.asarray([t0]), **dense[b]}
            outs_d = fd(pd, *[byd[v.name] for v in gd.inputs])
            np.testing.assert_allclose(
                np.asarray(outs[0])[b], np.asarray(outs_d[0]),
                atol=2e-5, rtol=1e-4, err_msg=f"t0={t0} slot={b}")
            names = [v.name for v in gd.inputs
                     if v.name.startswith(("k_cache", "v_cache"))]
            for nm, arr in zip(names, outs_d[1:]):
                dense[b][nm] = arr


def test_spec_paged_server_greedy_parity(rng):
    """SpecPagedDecodeServer (gamma draft steps + one batched paged
    verify per tick): greedy outputs token-identical to the plain
    DecodeServer chain; pages release on finish; acceptance is measured
    (self-draft => 1.0 on CPU f32)."""
    from smelter_tpu.serving.paged_server import SpecPagedDecodeServer

    gamma = 3
    w = _weights()
    chunk, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=NPAGES,
        npg=NPG, chunk=gamma + 1)
    draft, _ = llama_style.build_decode_step(weights=w, **CFG,
                                             max_len=NPG * PS)
    srv = SpecPagedDecodeServer(chunk, draft)
    try:
        prompts = [[3, 9, 14], [5, 1, 7, 2, 11]]
        futs = [srv.submit(p, 8) for p in prompts]
        got = [f.result(timeout=300) for f in futs]
        stats = srv.stats()
    finally:
        srv.shutdown()
    for p, g_ in zip(prompts, got):
        assert g_ == _greedy_reference(w, p, 8), (p, g_)
    assert srv.pool.free_pages == NPAGES - 1
    assert stats["ticks"] >= 1
    if stats["accept_rate"] is not None:
        assert stats["accept_rate"] == pytest.approx(1.0)


def test_spec_paged_backpressure(rng):
    """Spec rounds need pos+gamma+1 rows of headroom: a tight pool must
    stall-and-resume or evict exactly like the plain paged server."""
    from smelter_tpu.serving.paged_server import SpecPagedDecodeServer

    gamma = 2
    w = _weights()
    chunk, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=4, npg=NPG,
        chunk=gamma + 1)
    draft, _ = llama_style.build_decode_step(weights=w, **CFG,
                                             max_len=NPG * PS)
    srv = SpecPagedDecodeServer(chunk, draft)  # 3 usable pages
    try:
        futs = [srv.submit([3, 9], 10), srv.submit([5, 1], 10)]
        got, errs = [], 0
        for f in futs:
            try:
                got.append(f.result(timeout=300))
            except PoolExhausted:
                got.append(None)
                errs += 1
    finally:
        srv.shutdown()
    assert errs <= 1
    for p, g_ in zip(([3, 9], [5, 1]), got):
        if g_ is not None:
            assert g_ == _greedy_reference(w, p, 10), (p, g_)
    assert srv.pool.free_pages == 3


def test_paged_prefill_admission(rng):
    """Prefill ladder on the paged server: dense prefill forward + pool
    scatter in one dispatch; outputs identical to per-tick feeding, for
    whole-prompt buckets, pad-up, and partial (prompt > largest bucket)
    prefills."""
    w = _weights()
    pfs = [llama_style.build_prefill(w, prompt_len=p,
                                     max_len=NPG * PS, **CFG)
           for p in (4, 8)]
    srv = PagedDecodeServer(_paged(w, slots=2), prefill_graphs=pfs)
    try:
        for prompt in ([3, 9, 14, 2], [5, 1, 7],
                       [7, 2, 11, 4, 1, 8, 3, 9, 14, 2]):  # > bucket 8
            got = srv.submit(prompt, 5).result(timeout=300)
            assert got == _greedy_reference(w, prompt, 5), prompt
            assert srv.pool.free_pages == NPAGES - 1
    finally:
        srv.shutdown()


def test_paged_prefill_pool_exhausted_falls_back(rng):
    """When the pool cannot hold the prompt at admission, prefill falls
    back to per-tick feeding (which stalls/evicts per the tick rules)
    instead of failing the request."""
    w = _weights()
    pfs = [llama_style.build_prefill(w, prompt_len=8,
                                     max_len=NPG * PS, **CFG)]
    g, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=3, npg=NPG)
    srv = PagedDecodeServer(g, prefill_graphs=pfs)  # 2 usable pages
    try:
        # first request takes both pages mid-generation; second's
        # prefill (needs 1 page for 6 rows, then growth) competes
        fa = srv.submit([3, 9, 14, 2, 7, 1], 9)   # needs 2 pages
        fb = srv.submit([5, 1, 7, 2, 11, 4], 9)
        res = []
        for f in (fa, fb):
            try:
                res.append(f.result(timeout=300))
            except PoolExhausted:
                res.append(None)
    finally:
        srv.shutdown()
    done = [r for r in res if r is not None]
    assert done  # at least one finished
    for p, r in zip(([3, 9, 14, 2, 7, 1], [5, 1, 7, 2, 11, 4]), res):
        if r is not None:
            assert r == _greedy_reference(w, p, 9), (p, r)


@pytest.mark.parametrize("T", [3, 8])
def test_paged_tick_steps(rng, T):
    """tick_steps=T (T chained steps per dispatch) on the paged server:
    token-identical to the single-step chain across prompts that end
    mid-window, page-boundary crossings, and n_new cutoffs."""
    w = _weights()
    srv = PagedDecodeServer(_paged(w, slots=2), tick_steps=T)
    try:
        for prompt, n in (([3, 9, 14], 7), ([5], 10), ([7, 2, 11, 4], 3)):
            got = srv.submit(prompt, n).result(timeout=300)
            assert got == _greedy_reference(w, prompt, n), (T, prompt)
            assert srv.pool.free_pages == NPAGES - 1
    finally:
        srv.shutdown()


def test_paged_tick_steps_with_prefill(rng):
    """tick_steps and prefill admission compose."""
    w = _weights()
    pfs = [llama_style.build_prefill(w, prompt_len=4,
                                     max_len=NPG * PS, **CFG)]
    srv = PagedDecodeServer(_paged(w, slots=2), tick_steps=4,
                            prefill_graphs=pfs)
    try:
        for prompt in ([3, 9, 14, 2], [5, 1]):
            got = srv.submit(prompt, 6).result(timeout=300)
            assert got == _greedy_reference(w, prompt, 6), prompt
    finally:
        srv.shutdown()


def test_spec_paged_prefill(rng):
    """Target (paged) + draft (flat) prefill ladders on the spec paged
    server: token parity with the plain chain and pages still release;
    acceptance stays measured-high with the draft prefilled."""
    from smelter_tpu.serving.paged_server import SpecPagedDecodeServer

    gamma = 2
    w = _weights()
    chunk, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=NPAGES,
        npg=NPG, chunk=gamma + 1)
    draft, _ = llama_style.build_decode_step(weights=w, **CFG,
                                             max_len=NPG * PS)
    pfs = [llama_style.build_prefill(w, prompt_len=4,
                                     max_len=NPG * PS, **CFG)]
    srv = SpecPagedDecodeServer(chunk, draft, prefill_graphs=pfs,
                                draft_prefill_graphs=pfs)
    try:
        for prompt in ([3, 9, 14, 2], [5, 1, 7],
                       [7, 2, 11, 4, 1, 8]):  # > bucket: partial
            got = srv.submit(prompt, 6).result(timeout=300)
            assert got == _greedy_reference(w, prompt, 6), prompt
            assert srv.pool.free_pages == NPAGES - 1
        stats = srv.stats()
        if stats["accept_rate"] is not None:
            assert stats["accept_rate"] == pytest.approx(1.0)
    finally:
        srv.shutdown()


def test_spec_paged_rounds_per_tick(rng):
    """rounds_per_tick=R on the spec paged server: R draft-and-verify
    rounds chained on device, engaged only past the prompts with page
    headroom; token parity with the plain chain."""
    from smelter_tpu.serving.paged_server import SpecPagedDecodeServer

    gamma = 2
    w = _weights()
    chunk, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=NPAGES,
        npg=NPG, chunk=gamma + 1)
    draft, _ = llama_style.build_decode_step(weights=w, **CFG,
                                             max_len=NPG * PS)
    srv = SpecPagedDecodeServer(chunk, draft, rounds_per_tick=3)
    try:
        for prompt, n in (([3, 9, 14], 9), ([5], 12), ([7, 2], 4)):
            got = srv.submit(prompt, n).result(timeout=300)
            assert got == _greedy_reference(w, prompt, n), prompt
            assert srv.pool.free_pages == NPAGES - 1
        stats = srv.stats()
        if stats["accept_rate"] is not None:
            assert stats["accept_rate"] == pytest.approx(1.0)
    finally:
        srv.shutdown()


def test_int8_kv_paged_prefill(rng):
    """kv_quant pools + prefill admission: the quantized prefill rows
    (int8 + scales, padded) pool-scatter in pool-input order and match
    the dense int8-KV DecodeServer with the same prefill ladder."""
    from smelter_tpu.serving.decode_server import DecodeServer

    w = _weights()
    gp, _ = llama_style.build_decode_step_paged(
        weights=w, **CFG, slots=2, page_size=PS, n_pages=NPAGES,
        npg=NPG, kv_quant=True)
    pfs = [llama_style.build_prefill(w, prompt_len=4, max_len=NPG * PS,
                                     kv_quant=True, **CFG)]
    srv = PagedDecodeServer(gp, prefill_graphs=pfs)
    gd, _ = llama_style.build_decode_step(weights=w, **CFG,
                                          max_len=NPG * PS,
                                          kv_quant=True)
    ref = DecodeServer(gd, slots=2, prefill_graphs=pfs)
    try:
        for prompt in ([3, 9, 14, 2], [5, 1, 7]):
            got = srv.submit(prompt, 6).result(timeout=300)
            want = ref.submit(prompt, 6).result(timeout=300)
            assert got == want, (prompt, got, want)
        assert srv.pool.free_pages == NPAGES - 1
    finally:
        srv.shutdown()
        ref.shutdown()
