"""TPU campaign #10: decode dispatch amortization — per-token host loop
(Generator) vs one-dispatch lax.scan (FusedGenerator) through the tunnel.
Expectation: host loop is pinned at the ~3 ms dispatch floor per token;
the fused loop pays one dispatch for the whole sequence."""

import time

import numpy as np


def main():
    import jax

    from smelter_tpu.models import tiny_gpt
    from smelter_tpu.runtime.generate import FusedGenerator, Generator

    print("devices:", jax.devices(), flush=True)
    step_g, _ = tiny_gpt.build_decode_step(vocab=512, dim=256, heads=8,
                                           layers=4, max_len=256)
    prompt, n_new = [3, 7, 11, 13], 200

    fused = FusedGenerator(step_g)
    t0 = time.perf_counter()
    out_f = fused.generate(prompt, n_new)     # compile
    print(f"fused compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out_f = fused.generate(prompt, n_new)
    dt_f = time.perf_counter() - t0
    print(f"fused: {n_new/dt_f:.0f} tok/s ({dt_f*1e3:.0f} ms for {n_new})", flush=True)

    host = Generator(step_g)
    t0 = time.perf_counter()
    out_h = host.generate(prompt, n_new)      # compile
    print(f"host compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out_h = host.generate(prompt, n_new)
    dt_h = time.perf_counter() - t0
    print(f"host-loop: {n_new/dt_h:.0f} tok/s ({dt_h*1e3:.0f} ms)", flush=True)
    print("tokens match:", out_f == out_h, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
