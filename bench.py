"""Headline benchmark: ResNet-50 images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares the engine's configured-best path against the plain
fp32 XLA lowering measured in the same run (the reference publishes no
numbers of its own — SURVEY.md §6).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _sync(out) -> None:
    from smelter_tpu.runtime.benchtime import sync

    sync(out)


def _time_fn(fn, args, iters: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _chip_time(m, x, k_lo: int = 6, k_hi: int = 26, reps: int = 3) -> float:
    """Per-step chip time in seconds, loop-amortized + K-differenced
    (methodology + carry-dependence rationale in runtime/benchtime.py)."""
    from smelter_tpu.runtime.benchtime import chip_time

    return chip_time(m._fn, m.params, x, k_lo=k_lo, k_hi=k_hi, reps=reps)


def _compile_best(args, st, g):
    """The engine's configured-best model. int8-static calibrates in a CPU
    subprocess (in-process calibration would read every activation back
    through the tunnel) and falls back to int8 weight-only on failure."""
    quant = None if args.quant == "none" else args.quant
    cfg = st.Config(compute_dtype=args.dtype)
    if quant in ("int8-static", "int8-pixel"):
        try:
            import json
            import subprocess
            import tempfile

            amax_path = tempfile.mktemp(suffix=".json")
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            subprocess.run(
                [sys.executable, "-m", "smelter_tpu.tools.calib_dump",
                 "--model", args.model, "--batch", "4",
                 "--image-size", str(args.image_size), "-o", amax_path],
                check=True, timeout=900, env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            with open(amax_path) as f:
                amax = json.load(f)
            from smelter_tpu.passes.pass_manager import run_passes
            from smelter_tpu.quant import quantize_pixel_regions, quantize_static

            gq = st.import_model(st.export_model(g))
            run_passes(gq)
            n = (quantize_pixel_regions(gq, amax) if quant == "int8-pixel"
                 else quantize_static(gq, amax))
            if n == 0:
                raise RuntimeError(f"no nodes quantized by {quant}")
            if args.layout == "nhwc":
                from smelter_tpu.passes.layout import NHWC_PIPELINE

                run_passes(gq, NHWC_PIPELINE)
            run_passes(gq, ["dce"])
            return st.CompiledModel(gq, cfg)
        except Exception as e:  # noqa: BLE001 — the bench must still report
            print(f"int8-static path failed ({type(e).__name__}: {e}); "
                  f"falling back to int8 weight-only", file=sys.stderr)
            quant = "int8"
    gq = st.import_model(st.export_model(g))
    return st.compile(gq, cfg, quant=quant, layout=args.layout)


def _bench_latency(args, st, g, shape) -> int:
    """p50/p95 single-dispatch latency with a device-resident input — the
    chip-side component of end-to-end latency (host transfer excluded; on
    the dev tunnel that would measure the link, docs/DESIGN.md)."""
    import jax

    q = "int8" if args.quant == "int8-static" else args.quant
    m = st.compile(
        g,
        st.Config(compute_dtype=args.dtype),
        quant=None if q == "none" else q,
        layout=args.layout,
    )
    x = jax.device_put(
        np.random.default_rng(0).standard_normal(shape).astype(np.float32))
    for _ in range(3):
        _sync(m._fn(m.params, x))
    lats = []
    for _ in range(max(10, args.iters)):
        t0 = time.perf_counter()
        _sync(m._fn(m.params, x))
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    p50 = lats[len(lats) // 2]
    p95 = lats[min(len(lats) - 1, int(0.95 * len(lats)))]

    # Chip-side latency: on the dev tunnel a single dispatch is dominated
    # by the ~29 ms RPC floor; use the shared loop-amortized helper.
    k_lo, k_hi = 8, 64
    chip_ms = _chip_time(m, x, k_lo=k_lo, k_hi=k_hi) * 1e3

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": f"{args.model} chip-side batch-{args.batch} latency "
                  f"({args.dtype}, quant={args.quant}, loop-amortized "
                  f"K={k_lo}->{k_hi}; dispatch p50={p50:.1f}ms "
                  f"p95={p95:.1f}ms incl. link RPC, {dev.platform})",
        "value": round(chip_ms, 3),
        "unit": "ms",
        "vs_baseline": 1.0,
    }))
    return 0


def _bench_serving(args, st, g, shape) -> int:
    """Continuous-batching serving benchmark: N client threads firing
    requests; reports throughput + p50/p95 end-to-end latency."""
    import concurrent.futures as cf
    import jax

    q = "int8" if args.quant == "int8-static" else args.quant
    srv = st.serve(
        g,
        st.Config(compute_dtype=args.dtype),
        quant=None if q == "none" else q,
        layout=args.layout,
        max_batch=args.batch,
        max_wait_ms=2.0,
        buckets=(args.batch,),
        eager_compile=True,
    )
    x = np.random.default_rng(0).standard_normal(shape[1:]).astype(np.float32)
    # warm the pipeline
    srv.infer(x)
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=args.clients) as pool:
        futures = [pool.submit(srv.infer, x) for _ in range(args.requests)]
        for f in futures:
            f.result(timeout=600)
    wall = time.perf_counter() - t0
    stats = srv.stats()
    srv.shutdown()
    dev = jax.devices()[0]
    result = {
        "metric": f"{args.model} serving images/sec/chip "
                  f"(bucket={args.batch}, {args.dtype}, quant={args.quant}, "
                  f"p50={stats['latency_ms_p50']:.0f}ms, "
                  f"p95={stats['latency_ms_p95']:.0f}ms, "
                  f"occupancy={stats['occupancy']:.2f}, {dev.platform})",
        "value": round(args.requests / wall, 2),
        "unit": "images/sec",
        "vs_baseline": 1.0,
    }
    print(json.dumps(result))
    return 0


DECODE_CFGS = {
    "llama_tiny": dict(vocab=512, dim=256, heads=8, kv_heads=4, ffn=1024,
                       layers=4),
    "llama_1b": dict(vocab=32000, dim=2048, heads=16, kv_heads=8,
                     ffn=5632, layers=24),
    "llama_7b": dict(vocab=32000, dim=4096, heads=32, kv_heads=8,
                     ffn=11008, layers=32),
}


def _bench_decode(args, st) -> int:
    """Single-stream decode tok/s (FusedGenerator, K-differenced n_new so
    dispatch+readback cancel — probe69 methodology). vs_baseline is the
    same harness on per-channel int8 weights (the XLA fused path; bf16
    does not fit HBM at the 7B geometry)."""
    import gc

    import jax

    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    cfg = DECODE_CFGS[args.model]
    max_len = 512 if cfg["dim"] > 512 else 64
    quant = args.quant
    if quant == "int8-static":  # the image-mode default: remap for decode
        quant = "int4-g128"
    elif quant == "none":  # explicit: honest unquantized bf16 arm
        quant = None
    w = llama_style.make_weights(max_len=max_len, **cfg)
    prompt = list(range(1, 9))
    # WIDE span (probe82b): an n-difference spanning only ~50 ms of chip
    # time can collapse inside the tunnel's RPC/pipelining window and
    # report tok/s above the weight-stream physics floor; 256 extra
    # steps put >= 0.2 s (1.3B) of mandatory weight streaming between
    # the two arms, which no overlap can hide. Respect max_len so the
    # generator's n_new clamp cannot silently shrink the span.
    n_lo, reps = 16, 3
    n_hi = min(272, max_len - len(prompt) - 1)

    floors = {}

    def tok_s(mode):
        g, _ = llama_style.build_decode_step(weights=w, max_len=max_len,
                                             **cfg)
        if mode:
            quantize_weights(g, mode, min_elements=1 << 16)
            run_passes(g, ["fuse_dequant_matmul", "dce"])
        # physics floor: every decode step streams the weights once
        floors[mode] = sum(a.nbytes for a in g.initializers.values()) \
            / 819e9
        gen = FusedGenerator(g, st.Config(compute_dtype="bfloat16"))

        def timed(n):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                gen.generate(prompt, n)
                best = min(best, time.perf_counter() - t0)
            return best

        timed(n_lo)  # compile + warm
        per = (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)
        del gen
        gc.collect()
        jax.clear_caches()
        return 1.0 / per

    best = tok_s(quant)
    base = tok_s("int8")
    dev = jax.devices()[0]
    floor = 1.0 / floors[quant] if floors.get(quant) else float("inf")
    print(json.dumps({
        "metric": f"{args.model} decode tokens/sec single-stream "
                  f"(quant={quant or 'bf16'}, max_len={max_len}, "
                  f"bf16 activations, "
                  f"K-differenced n={n_lo}->{n_hi}, vs int8-pc XLA path, "
                  f"weight-stream ceiling {floor:,.0f} tok/s, "
                  f"{dev.platform})",
        "value": round(best, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(best / base, 3),
    }))
    return 0


def _bench_serve_decode(args, st) -> int:
    """Continuous-batching DECODE serving: aggregate generated tok/s
    through the slot loop. Default drives SpecDecodeServer (vmapped
    draft-and-verify ticks) with a 4L/256d draft and reports the
    MEASURED voluntary acceptance; --spec-draft self uses the target as
    its own draft (acceptance 1.0 — the upper bound); --spec-draft none
    benches plain DecodeServer. vs_baseline = aggregate tok/s vs plain
    DecodeServer on the same workload (so the line captures what
    speculation buys end-to-end through the slot loop, dispatch
    round-trips included)."""
    import gc

    import jax

    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.serving.decode_server import (DecodeServer,
                                                   SpecDecodeServer)

    cfg = DECODE_CFGS[args.model]
    max_len = 512 if cfg["dim"] > 512 else 64
    quant = args.quant
    if quant == "int8-static":
        quant = "int4-g128"
    elif quant == "none":
        quant = None
    gamma = args.gamma
    slots = args.batch if args.batch <= 64 else 8
    kvq = bool(args.kv_quant)  # graph-level: the builders emit int8 caches
    scfg = st.Config(compute_dtype=args.dtype,
                     ragged_attention=bool(args.ragged))

    def q(g):
        if quant:
            quantize_weights(g, quant, min_elements=1 << 16)
            run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    w = llama_style.make_weights(max_len=max_len, **cfg)
    step = q(llama_style.build_decode_step(w, max_len=max_len,
                                           kv_quant=kvq, **cfg)[0])
    pf_lens = [64] if max_len <= 64 else [64, 256]
    pfs = [q(llama_style.build_prefill(w, prompt_len=p, max_len=max_len,
                                       kv_quant=kvq, **cfg))
           for p in pf_lens]

    rng = np.random.default_rng(0)
    prompts = [[int(t) for t in rng.integers(1, cfg["vocab"] - 1, n)]
               for n in rng.integers(8, min(48, max_len // 4),
                                     args.requests)]
    n_new = args.new_tokens

    def run(srv):
        futs = [srv.submit(pr, n_new) for pr in prompts[:2]]
        for f in futs:
            f.result(timeout=1800)  # warm (compile) outside the clock
        t0 = time.perf_counter()
        futs = [srv.submit(pr, n_new) for pr in prompts]
        tot = 0
        for pr, f in zip(prompts, futs):
            tot += len(f.result(timeout=3600)) - len(pr)
        wall = time.perf_counter() - t0
        stats = srv.stats()
        srv.shutdown()
        del srv
        gc.collect()
        return tot / wall, stats

    plain_tps, _ = run(DecodeServer(step, slots=slots, config=scfg,
                                    prefill_graphs=pfs,
                                    tick_steps=args.tick_steps))

    draft_kind = args.spec_draft
    if draft_kind == "none":
        dev = jax.devices()[0]
        print(json.dumps({
            "metric": f"{args.model} decode serving aggregate tok/s "
                      f"(DecodeServer, slots={slots}, "
                      f"quant={quant or 'bf16'}, kv_quant={kvq}, "
                      f"ragged={bool(args.ragged)}, n_new={n_new}, "
                      f"{dev.platform})",
            "value": round(plain_tps, 1),
            "unit": "tokens/sec",
            "vs_baseline": 1.0,
        }))
        return 0

    chunk = q(llama_style.build_decode_step(w, max_len=max_len,
                                            chunk=gamma + 1, kv_quant=kvq,
                                            **cfg)[0])
    if draft_kind == "self":
        draft = q(llama_style.build_decode_step(w, max_len=max_len,
                                                kv_quant=kvq, **cfg)[0])
        dpfs = pfs
    elif draft_kind == "early":
        # early-exit self-draft (Draft&Verify pattern): the first half of
        # the target's OWN layers + its final norm/head — no separate
        # draft model, weights shared on device by name+content
        ecfg = dict(cfg, layers=max(1, cfg["layers"] // 2))
        draft = q(llama_style.build_decode_step(w, max_len=max_len,
                                                **ecfg)[0])
        dpfs = [q(llama_style.build_prefill(w, prompt_len=p_,
                                            max_len=max_len, **ecfg))
                for p_ in pf_lens]
    else:  # tiny independent 4L/256d draft (probe75/79 geometry)
        dcfg = dict(vocab=cfg["vocab"], dim=256, heads=8, kv_heads=4,
                    ffn=1024, layers=4)
        dw = llama_style.make_weights(max_len=max_len, seed=7, **dcfg)
        draft = llama_style.build_decode_step(dw, max_len=max_len,
                                              **dcfg)[0]
        dpfs = [llama_style.build_prefill(dw, prompt_len=p,
                                          max_len=max_len, **dcfg)
                for p in pf_lens]
    spec_tps, stats = run(SpecDecodeServer(
        step, chunk, draft, slots=slots, config=scfg,
        prefill_graphs=pfs, draft_prefill_graphs=dpfs,
        rounds_per_tick=args.spec_rounds))
    acc = stats.get("accept_rate")
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": f"{args.model} speculative decode serving aggregate "
                  f"tok/s (SpecDecodeServer, slots={slots}, "
                  f"gamma={gamma}, rounds={args.spec_rounds}, "
                  f"draft={draft_kind}, measured "
                  f"acceptance={acc if acc is None else round(acc, 3)}, "
                  f"quant={quant or 'bf16'}, kv_quant={kvq}, "
                  f"ragged={bool(args.ragged)}, n_new={n_new}, vs plain "
                  f"DecodeServer {plain_tps:.1f} tok/s, {dev.platform})",
        "value": round(spec_tps, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(spec_tps / plain_tps, 3),
    }))
    return 0


def _bench_serve_paged(args, st) -> int:
    """Paged-pool decode serving: aggregate generated tok/s through
    PagedDecodeServer (shared page pool, batched step graph) on the
    same workload as a plain DecodeServer baseline with flat
    slots x max_len caches. vs_baseline = paged/plain aggregate tok/s;
    the metric line also records both cache footprints — the pool's
    value is CAPACITY (pages-in-use vs flat reservation), the ratio
    shows what the page indirection costs or saves in throughput."""
    import gc

    import jax

    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.serving.decode_server import DecodeServer
    from smelter_tpu.serving.paged_server import PagedDecodeServer

    cfg = DECODE_CFGS[args.model]
    max_len = 512 if cfg["dim"] > 512 else 64
    ps = min(args.page_size, max_len)
    npg = max_len // ps
    slots = args.batch if args.batch <= 64 else 8
    n_pages = args.pool_pages or (1 + slots * npg)
    quant = args.quant
    if quant in ("int8-static", "none"):
        quant = None if quant == "none" else "int4-g128"
    scfg = st.Config(compute_dtype=args.dtype)

    def q(g):
        if quant:
            quantize_weights(g, quant, min_elements=1 << 16)
            run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    kvq = bool(args.kv_quant)
    w = llama_style.make_weights(max_len=max_len, **cfg)
    step = q(llama_style.build_decode_step(w, max_len=max_len,
                                           kv_quant=kvq, **cfg)[0])
    paged = q(llama_style.build_decode_step_paged(
        w, **cfg, slots=slots, page_size=ps, n_pages=n_pages,
        npg=npg, kv_quant=kvq)[0])

    rng = np.random.default_rng(0)
    prompts = [[int(t) for t in rng.integers(1, cfg["vocab"] - 1, n)]
               for n in rng.integers(8, min(48, max_len // 4),
                                     args.requests)]
    n_new = args.new_tokens

    def run(srv):
        futs = [srv.submit(pr, n_new) for pr in prompts[:2]]
        for f in futs:
            f.result(timeout=1800)  # warm (compile) outside the clock
        t0 = time.perf_counter()
        futs = [srv.submit(pr, n_new) for pr in prompts]
        tot = 0
        for pr, f in zip(prompts, futs):
            tot += len(f.result(timeout=3600)) - len(pr)
        wall = time.perf_counter() - t0
        stats = srv.stats()
        cb = srv.cache_bytes()
        srv.shutdown()
        del srv
        gc.collect()
        return tot / wall, stats, cb

    plain_tps, _, plain_cb = run(DecodeServer(
        step, slots=slots, config=scfg, tick_steps=args.tick_steps))
    if args.paged_spec and args.spec_draft != "none":
        # speculative paged: gamma drafts + one batched paged verify
        from smelter_tpu.serving.paged_server import SpecPagedDecodeServer

        gamma = args.gamma
        chunkp = q(llama_style.build_decode_step_paged(
            w, **cfg, slots=slots, page_size=ps, n_pages=n_pages,
            npg=npg, kv_quant=kvq, chunk=gamma + 1)[0])
        if args.spec_draft == "self":
            draft = q(llama_style.build_decode_step(
                w, max_len=max_len, **cfg)[0])
        elif args.spec_draft == "early":
            ecfg = dict(cfg, layers=max(1, cfg["layers"] // 2))
            draft = q(llama_style.build_decode_step(
                w, max_len=max_len, **ecfg)[0])
        else:
            dcfg = dict(vocab=cfg["vocab"], dim=256, heads=8,
                        kv_heads=4, ffn=1024, layers=4)
            dw = llama_style.make_weights(max_len=max_len, seed=7,
                                          **dcfg)
            draft = llama_style.build_decode_step(dw, max_len=max_len,
                                                  **dcfg)[0]
        spec_tps, sstats, spec_cb = run(
            SpecPagedDecodeServer(chunkp, draft, config=scfg,
                                  rounds_per_tick=args.spec_rounds))
        acc = sstats.get("accept_rate")
        dev = jax.devices()[0]
        print(json.dumps({
            "metric": f"{args.model} speculative paged serving "
                      f"aggregate tok/s (SpecPagedDecodeServer, "
                      f"slots={slots}, gamma={gamma}, "
                      f"rounds={args.spec_rounds}, "
                      f"draft={args.spec_draft}, measured acceptance="
                      f"{acc if acc is None else round(acc, 3)}, "
                      f"page_size={ps}, pool={n_pages}p, "
                      f"quant={quant or 'bf16'}, kv_quant={kvq}, "
                      f"n_new={n_new}, vs plain DecodeServer "
                      f"{plain_tps:.1f} tok/s, {dev.platform})",
            "value": round(spec_tps, 1),
            "unit": "tokens/sec",
            "vs_baseline": round(spec_tps / plain_tps, 3),
        }))
        return 0
    paged_tps, stats, paged_cb = run(PagedDecodeServer(
        paged, config=scfg, tick_steps=args.tick_steps))
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": f"{args.model} paged decode serving aggregate tok/s "
                  f"(PagedDecodeServer, slots={slots}, "
                  f"tick_steps={args.tick_steps}, page_size={ps}, "
                  f"pool={n_pages}p={paged_cb / 1e6:.0f}MB vs flat "
                  f"{plain_cb / 1e6:.0f}MB, quant={quant or 'bf16'}, "
                  f"kv_quant={kvq}, "
                  f"n_new={n_new}, stall_ticks={stats['stall_ticks']}, "
                  f"vs plain DecodeServer {plain_tps:.1f} tok/s, "
                  f"{dev.platform})",
        "value": round(paged_tps, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(paged_tps / plain_tps, 3),
    }))
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="resnet50")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--quant", default="int8-static",
                   choices=["none", "fp16", "int8", "int8-conv", "int8-static",
                            "int8-pixel", "int4-g128", "int8-g128"],
                   help="int8-static (default; folded requant epilogues beat "
                        "weight-only: 11592 vs 10500 img/s ResNet b128, "
                        "probe13) calibrates via a CPU subprocess and falls "
                        "back to int8 weight-only on any failure")
    p.add_argument("--layout", default="nhwc", choices=["nchw", "nhwc"])
    p.add_argument("--latency", action="store_true",
                   help="measure single-batch p50/p95 latency (chip-side, "
                        "device-resident input) instead of throughput")
    p.add_argument("--serve", action="store_true",
                   help="measure continuous-batching serving (throughput + "
                        "p50 latency) instead of raw step time")
    p.add_argument("--decode", action="store_true",
                   help="LLM decode mode: single-stream tok/s on a "
                        "llama-geometry model (--model llama_tiny/"
                        "llama_1b/llama_7b; default quant int4-g128). "
                        "llama_tiny is dispatch-noise-dominated over the "
                        "dev tunnel — use llama_1b+ for real numbers")
    p.add_argument("--serve-decode", action="store_true",
                   help="continuous-batching decode serving: aggregate "
                        "tok/s through the DecodeServer/SpecDecodeServer "
                        "slot loop (--model llama_tiny/llama_1b/llama_7b; "
                        "--spec-draft tiny|self|none)")
    p.add_argument("--spec-draft", default="tiny",
                   choices=["tiny", "self", "early", "none"],
                   help="serve-decode draft: tiny = independent 4L/256d "
                        "(measured acceptance), self = target drafts "
                        "itself (acceptance 1.0 upper bound), early = "
                        "early-exit self-draft (first half of the "
                        "target's own layers, weights shared), none = "
                        "plain DecodeServer only")
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--tick-steps", type=int, default=1,
                   help="serve-decode: DecodeServer steps per dispatch")
    p.add_argument("--spec-rounds", type=int, default=1,
                   help="serve-decode: SpecDecodeServer draft-and-verify "
                        "rounds per dispatch")
    p.add_argument("--new-tokens", type=int, default=64)
    p.add_argument("--kv-quant", action="store_true",
                   help="serve-decode: int8 KV caches")
    p.add_argument("--ragged", action="store_true",
                   help="serve-decode: ragged decode attention")
    p.add_argument("--serve-paged", action="store_true",
                   help="paged-pool decode serving: PagedDecodeServer "
                        "aggregate tok/s vs a flat-cache DecodeServer "
                        "baseline (--page-size, --pool-pages)")
    p.add_argument("--page-size", type=int, default=128,
                   help="serve-paged: KV pool page size (rows)")
    p.add_argument("--pool-pages", type=int, default=0,
                   help="serve-paged: total pool pages (0 = scratch + "
                        "slots*npg, the stall-free allocation)")
    p.add_argument("--paged-spec", action="store_true",
                   help="serve-paged: speculative paged serving "
                        "(SpecPagedDecodeServer; --spec-draft/--gamma "
                        "select the draft)")
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--clients", type=int, default=32)
    args = p.parse_args()

    import jax

    # The axon plugin overrides JAX_PLATFORMS at registration; re-assert the
    # env var so `JAX_PLATFORMS=cpu python bench.py` really runs on CPU.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import smelter_tpu as st

    if args.decode or args.serve_decode or args.serve_paged:
        if args.model == "resnet50":
            args.model = "llama_1b"
        if args.model not in DECODE_CFGS:
            p.error(f"unknown decode model {args.model!r}; available: "
                    f"{', '.join(sorted(DECODE_CFGS))}")
        if args.serve_paged:
            return _bench_serve_paged(args, st)
        if args.serve_decode:
            return _bench_serve_decode(args, st)
        return _bench_decode(args, st)

    from smelter_tpu.models import ZOO

    if args.model not in ZOO:
        p.error(f"unknown model {args.model!r}; available: {', '.join(sorted(ZOO))}")
    g, _tm, shape = ZOO[args.model](batch=args.batch, image_size=args.image_size)

    if args.serve:
        return _bench_serving(args, st, g, shape)
    if args.latency:
        return _bench_latency(args, st, g, shape)

    # Device-put the input once: serving keeps inputs on device; re-uploading
    # per call would measure host->device transfer, not the model.
    x = jax.device_put(
        np.random.default_rng(0).standard_normal(shape).astype(np.float32))

    # Baseline path: plain fp32 XLA lowering of the raw imported graph
    # (no passes, NCHW) — what a naive port would run. Both paths use the
    # loop-amortized chip-time methodology (see _chip_time).
    base = st.CompiledModel(g, st.Config(compute_dtype="float32"))
    base_s = _chip_time(base, x, reps=max(2, args.iters // 10))
    base_ips = args.batch / base_s

    # Engine-best path: full pipeline (BN fusion, folding, NHWC layout,
    # quantization, fused dequant) + compute dtype.
    best = _compile_best(args, st, g)
    best_s = _chip_time(best, x, reps=max(3, args.iters // 8))
    best_ips = args.batch / best_s

    dev = jax.devices()[0]
    result = {
        "metric": f"{args.model} images/sec/chip "
                  f"(batch={args.batch}, {args.dtype}, quant={args.quant}, "
                  f"{args.layout}, loop-amortized, {dev.platform})",
        "value": round(best_ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(best_ips / base_ips, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
