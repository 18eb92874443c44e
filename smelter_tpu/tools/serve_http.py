"""HTTP serving front-end over the continuous-batching engine.

Stdlib-only (http.server, threading): POST tensors, get predictions; each
HTTP connection's request joins the shared batcher, so concurrent clients
are batched together on the TPU.

Endpoints:
  GET  /healthz            -> {"ok": true}        (host health probe,
                              SURVEY.md §5.3 failure-detection hook)
  GET  /v1/models          -> {"models": [names]}
  GET  /v1/stats           -> metrics snapshot (default model)
  GET  /v1/models/N/stats  -> metrics snapshot for model N
  POST /v1/infer           -> infer on the default model
  POST /v1/models/N/infer  -> infer on model N
  Bodies: .npy tensor (single input, no batch dim) or JSON
  {"inputs": [nested lists]}; response JSON {"outputs": [...]} or .npy
  when Accept: application/npy. Multiple --model name=path pairs serve
  several models from one process/chip.

Usage:
  python -m smelter_tpu.tools.serve_http model.onnx --port 8500 \
      [--quant int8] [--max-batch 16] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(server_state):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            if server_state.get("verbose"):
                sys.stderr.write("%s - %s\n" % (self.address_string(), fmt % args))

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _resolve(self, path):
            """-> (srv, subpath) for /v1/models/<name>/... or default."""
            servers = server_state["servers"]
            if path.startswith("/v1/models/"):
                rest = path[len("/v1/models/"):]
                name, _, sub = rest.partition("/")
                return servers.get(name), sub
            return servers.get(server_state["default"]), path.lstrip("/")

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b'{"ok": true}')
                return
            if self.path == "/v1/models":
                self._send(200, json.dumps(
                    {"models": sorted(server_state["servers"])}).encode())
                return
            if self.path == "/metrics":
                # Prometheus text exposition over every model
                lines = []
                for name, srv in server_state["servers"].items():
                    for k, v in srv.stats().items():
                        lines.append(
                            f'smelter_{k}{{model="{name}"}} {v}')
                self._send(200, ("\n".join(lines) + "\n").encode(),
                           "text/plain; version=0.0.4")
                return
            srv, sub = self._resolve(self.path)
            if srv is not None and sub in ("v1/stats", "stats"):
                self._send(200, json.dumps(srv.stats()).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path == "/v1/generate" or self.path.endswith("/generate"):
                self._generate()
                return
            srv, sub = self._resolve(self.path)
            if srv is None or sub not in ("v1/infer", "infer"):
                self._send(404, b'{"error": "not found"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            try:
                if "npy" in ctype or body[:6] == b"\x93NUMPY":
                    x = np.load(io.BytesIO(body), allow_pickle=False)
                    if (x.dtype == np.uint8 and x.ndim == 3
                            and x.shape[-1] in (1, 3, 4)
                            and x.shape[0] not in (1, 3, 4)):
                        # unambiguously HWC uint8 image: u8 -> f32/255 +
                        # HWC->CHW via the native ingest (18x the numpy
                        # path). CHW uint8 bodies keep the pre-existing
                        # on-device /255 path (executor entry cast);
                        # per-channel mean/std stays on-device
                        # (Config.normalize) either way.
                        from ..native import preprocess_images

                        x = preprocess_images(x[None], 0.0, 1.0, "NCHW")[0]
                else:
                    payload = json.loads(body)
                    x = np.asarray(payload["inputs"], np.float32)
                outs = srv.infer(x)
            except Exception as e:  # noqa: BLE001
                self._send(400, json.dumps({"error": str(e)[:500]}).encode())
                return
            if "application/npy" in self.headers.get("Accept", ""):
                buf = io.BytesIO()
                np.save(buf, outs[0])
                self._send(200, buf.getvalue(), "application/npy")
            else:
                self._send(200, json.dumps(
                    {"outputs": [o.tolist() for o in outs]}).encode())

        def _generate(self):
            """POST /v1/generate {"prompt": [ints], "n_new": N,
            "temperature": t?, "top_k": k?, "seed": s?} -> tokens.

            Served by a FusedGenerator — or a SpeculativeGenerator when
            the server was started with --decode-draft/--decode-chunk —
            one dispatch per request; sampling params are optional
            (greedy without them)."""
            gen = server_state.get("generator")
            if gen is None and server_state.get("decode_server") is None:
                self._send(404, b'{"error": "no decode model loaded"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length))
                prompt = [int(t) for t in payload["prompt"]]
                n_new = int(payload.get("n_new", 16))
                temperature = payload.get("temperature")
                top_k = int(payload.get("top_k", 0))
                seed = int(payload.get("seed", 0))
                sampled = temperature is not None or top_k
                if temperature is not None:
                    temperature = float(temperature)
                if not prompt:
                    raise ValueError("prompt must be non-empty")
                # cross-attention decoders (e.g. models/speech_decoder.py)
                # take context arrays, e.g. {"context": {"memory": [[...]]}}
                ctx = None
                if gen is not None and gen.context_names:
                    import numpy as _np

                    raw = payload.get("context") or {}
                    missing = [n for n in gen.context_names if n not in raw]
                    if missing:
                        raise ValueError(
                            f"decode model needs context arrays {missing}")
                    ctx = {n: _np.asarray(raw[n],
                                          gen.context_types.get(n, _np.float32))
                           for n in gen.context_names}
                dsrv = server_state.get("decode_server")
                spec = server_state.get("spec_generator")
                if dsrv is not None and not sampled:
                    # continuous batching (plain or speculative slots):
                    # concurrent requests share the tick loop instead of
                    # serializing whole decodes (greedy-only; sampled
                    # requests take a one-dispatch path below)
                    toks = dsrv.submit(prompt, n_new,
                                       context=ctx).result(timeout=600)
                elif spec is not None and ctx is None:
                    # speculative decoding (draft+verify, one dispatch);
                    # greedy is token-identical to the plain generator
                    toks = spec.generate(
                        prompt, n_new, temperature=temperature,
                        top_k=top_k, seed=seed)
                elif gen is not None:
                    toks = gen.generate(prompt, n_new, context=ctx,
                                        temperature=temperature,
                                        top_k=top_k, seed=seed)
                else:
                    # paged-only server (no single-stream generator)
                    raise ValueError(
                        "this server is paged-serving only: greedy, "
                        "no sampling parameters")
            except Exception as e:  # noqa: BLE001
                self._send(400, json.dumps({"error": str(e)[:500]}).encode())
                return
            self._send(200, json.dumps({"tokens": toks}).encode())

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="serve_http", description=__doc__)
    p.add_argument("model", nargs="+",
                   help="model path, or name=path pairs for multi-model")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--quant", choices=["none", "fp16", "int8"], default="none")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=3.0)
    p.add_argument("--batch-size-hint", type=int, default=None)
    p.add_argument("--normalize", default=None, metavar="MEANS:STDS",
                   help="per-channel on-device normalization, e.g. "
                        "0.485,0.456,0.406:0.229,0.224,0.225 (uint8 bodies "
                        "are scaled /255 first)")
    p.add_argument("--decode-slots", type=int, default=0, metavar="N",
                   help="serve /v1/generate through the continuous-batching "
                        "DecodeServer with N KV-cache slots (concurrent "
                        "ragged requests) instead of one fused decode per "
                        "request")
    p.add_argument("--decode-step", default=None, metavar="ONNX",
                   help="decode-step graph (token, pos, *caches) to serve "
                        "on POST /v1/generate via the one-dispatch fused "
                        "decoder")
    p.add_argument("--decode-prefill", nargs="*", default=(),
                   metavar="ONNX",
                   help="prefill-graph bucket ladder (full-sequence twins "
                        "of the decode step, e.g. llama_style."
                        "build_prefill at several prompt lengths): new "
                        "requests fill their KV cache rows in one forward "
                        "instead of one prompt token per step/tick")
    p.add_argument("--decode-draft", default=None, metavar="ONNX",
                   help="draft decode-step graph: serve /v1/generate via "
                        "SPECULATIVE decoding (requires --decode-chunk)")
    p.add_argument("--decode-chunk", default=None, metavar="ONNX",
                   help="verify chunk-step graph (build_decode_step with "
                        "chunk=gamma+1, same weights as --decode-step)")
    p.add_argument("--decode-bucket", action="append", default=[],
                   metavar="ONNX:SLOTS",
                   help="add a KV-cache bucket: a decode-step graph built "
                        "from the SAME weights at a shorter max_len, with "
                        "its own slot count — requests route to the "
                        "smallest bucket that fits (BucketedDecodeServer; "
                        "cache HBM = sum of bucket sizes instead of "
                        "slots x max). Repeatable. Requires "
                        "--decode-slots; prefill graphs apply to the "
                        "main (largest) bucket only")
    p.add_argument("--decode-paged", action="store_true",
                   help="treat --decode-step as a BATCHED paged step "
                        "graph (build_decode_step_paged form: token "
                        "(B, c), page_table, k_pool_*/v_pool_*) and "
                        "serve it with PagedDecodeServer (shared KV "
                        "page pool, grow/stall/evict lifecycle); "
                        "greedy-only, mutually exclusive with the other "
                        "decode modes")
    p.add_argument("--decode-spec-rounds", type=int, default=1,
                   metavar="R",
                   help="SpecDecodeServer: chain R draft-and-verify "
                        "rounds per dispatch (engages when all slots "
                        "are past their prompts)")
    p.add_argument("--decode-tick-steps", type=int, default=1,
                   metavar="T",
                   help="DecodeServer: chain T decode steps per dispatch "
                        "(host round trip paid once per T tokens); "
                        "greedy outputs identical to T=1")
    p.add_argument("--ragged-attention", action="store_true",
                   help="fuse decode-step attention into the ragged "
                        "cache-prefix kernel (reads only rows <= pos per "
                        "step; kernels/ragged_decode_attention.py)")
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)

    # The axon plugin overrides JAX_PLATFORMS at registration; re-assert it
    # so `JAX_PLATFORMS=cpu serve_http ...` really serves on CPU.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import smelter_tpu as st

    normalize = None
    if args.normalize:
        means, _, stds = args.normalize.partition(":")
        normalize = (tuple(float(v) for v in means.split(",")),
                     tuple(float(v) for v in stds.split(",")))
    servers = {}
    default = None
    for spec in args.model:
        name, sep, path = spec.partition("=")
        if not sep:
            name, path = "default", spec
        servers[name] = st.serve(
            path,
            st.Config(compute_dtype=args.dtype, normalize=normalize),
            quant=None if args.quant == "none" else args.quant,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
        )
        default = default or name
    state = {"servers": servers, "default": default, "verbose": args.verbose}
    dec_cfg = st.Config(compute_dtype=args.dtype,
                        ragged_attention=args.ragged_attention)
    if args.decode_step and args.decode_paged:
        if args.decode_slots or args.decode_chunk or args.decode_bucket:
            p.error("--decode-paged takes --decode-step (the batched "
                    "paged graph already fixes the slot count), "
                    "optionally --decode-prefill (dense prefill "
                    "ladder, pool-scattered at admission) and "
                    "--decode-draft (speculative: --decode-step is "
                    "then the paged CHUNK graph)")
        if args.decode_draft:
            from ..serving.paged_server import SpecPagedDecodeServer

            pfs = [st.load_model(f) for f in args.decode_prefill]
            state["decode_server"] = SpecPagedDecodeServer(
                st.load_model(args.decode_step),
                st.load_model(args.decode_draft), config=dec_cfg,
                prefill_graphs=pfs,
                rounds_per_tick=args.decode_spec_rounds)
        else:
            from ..serving.paged_server import PagedDecodeServer

            state["decode_server"] = PagedDecodeServer(
                st.load_model(args.decode_step), config=dec_cfg,
                prefill_graphs=[st.load_model(f)
                                for f in args.decode_prefill],
                tick_steps=args.decode_tick_steps)
    elif args.decode_step:
        from ..runtime.generate import FusedGenerator

        step_graph = st.load_model(args.decode_step)
        prefills = [st.load_model(f) for f in args.decode_prefill]
        state["generator"] = FusedGenerator(
            step_graph, dec_cfg, prefill_graph=prefills or None)
        if args.decode_draft or args.decode_chunk:
            if not (args.decode_draft and args.decode_chunk):
                p.error("--decode-draft and --decode-chunk go together")
        if args.decode_bucket and not args.decode_slots:
            p.error("--decode-bucket requires --decode-slots")
        if args.decode_draft and not args.decode_slots:
            from ..runtime.speculative import SpeculativeGenerator

            state["spec_generator"] = SpeculativeGenerator(
                step_graph, st.load_model(args.decode_chunk),
                st.load_model(args.decode_draft), config=dec_cfg,
                prefill_graph=prefills[0] if len(prefills) == 1 else None)
        if args.decode_slots and args.decode_draft:
            # speculative continuous batching: the slot tick is a
            # vmapped draft-and-verify round
            from ..serving.decode_server import SpecDecodeServer

            if args.decode_bucket:
                # main bucket speculative, extra buckets plain ticks at
                # their own cache lengths — one shared weight upload
                from ..serving.decode_server import BucketedDecodeServer

                buckets = [{"step": step_graph,
                            "chunk": st.load_model(args.decode_chunk),
                            "draft": st.load_model(args.decode_draft),
                            "slots": args.decode_slots,
                            "prefills": prefills,
                            "rounds_per_tick":
                                args.decode_spec_rounds}]
                for spec in args.decode_bucket:
                    path, _, n = spec.rpartition(":")
                    if not path or not n.isdigit():
                        p.error(f"--decode-bucket {spec!r}: want "
                                f"ONNX:SLOTS")
                    buckets.append({"step": st.load_model(path),
                                    "slots": int(n),
                                    "tick_steps":
                                        args.decode_tick_steps})
                state["decode_server"] = BucketedDecodeServer(
                    buckets, config=dec_cfg)
            else:
                state["decode_server"] = SpecDecodeServer(
                    step_graph, st.load_model(args.decode_chunk),
                    st.load_model(args.decode_draft),
                    slots=args.decode_slots, config=dec_cfg,
                    prefill_graphs=prefills,
                    rounds_per_tick=args.decode_spec_rounds)
        elif args.decode_slots and args.decode_bucket:
            from ..serving.decode_server import BucketedDecodeServer

            buckets = [{"step": step_graph, "slots": args.decode_slots,
                        "prefills": prefills,
                        "tick_steps": args.decode_tick_steps}]
            for spec in args.decode_bucket:
                path, _, n = spec.rpartition(":")
                if not path or not n.isdigit():
                    p.error(f"--decode-bucket {spec!r}: want ONNX:SLOTS")
                buckets.append({"step": st.load_model(path),
                                "slots": int(n),
                                "tick_steps": args.decode_tick_steps})
            state["decode_server"] = BucketedDecodeServer(
                buckets, config=dec_cfg)
        elif args.decode_slots:
            from ..serving.decode_server import DecodeServer

            state["decode_server"] = DecodeServer(
                step_graph, slots=args.decode_slots, config=dec_cfg,
                prefill_graphs=prefills,
                tick_steps=args.decode_tick_steps)
    elif args.decode_slots:
        p.error("--decode-slots requires --decode-step")
    elif args.decode_paged:
        p.error("--decode-paged requires --decode-step")
    elif args.decode_prefill:
        p.error("--decode-prefill requires --decode-step")
    elif args.decode_draft or args.decode_chunk:
        p.error("--decode-draft/--decode-chunk require --decode-step")
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        for srv in servers.values():
            srv.shutdown()
        if state.get("decode_server") is not None:
            state["decode_server"].shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
