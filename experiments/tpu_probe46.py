"""TPU campaign #46 (round 3): close the dequant+matmul SOL gate.

VERDICT r2 item 2: composite (per-row dynamic quant + int8 matmul +
f32 epilogue) measured 213 (XLA) / 207 (Pallas) vs a 327 TOP/s pure
int8 ceiling at M8192 K4096 N4096. Hypotheses to test:
  H1  the round-2 Pallas kernel never set dimension_semantics — Mosaic
      may not have pipelined its grid.
  H2  XLA's composite materializes the i32 accumulator (128 MB) before
      the f32 scaling pass.
  H3  a fused-quant kernel (x bf16 manual DMA at j==0, quantize
      in-register into a VMEM int8 panel reused across j) removes the
      separate 96 MB quantize pass AND the n_j-times x_q reload.
  H4  allow_input_fusion can fuse the quantize into the kernel's input
      copy for free.

Loop-amortized timing (probe12 methodology, bitcast-sentinel carry per
round-3 bench hardening).
"""

import time

import numpy as np

LOOP = 20
REPS = 3


def sync(x):
    leaf = x[0] if isinstance(x, tuple) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.int8_matmul import (
        _int8_matmul_fused_impl, _int8_matmul_impl, dequant_matmul_int8,
        dequant_matmul_int8_fused, quantize_rows)
    from smelter_tpu.quant import quantize_array

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    M, K, N = 8192, 4096, 4096
    flops = 2 * M * K * N

    def chain(step, in_dtype):
        @jax.jit
        def run(x):
            ysh = jax.eval_shape(step, x)

            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                # zero is a RUNTIME 0 (sentinel compare): the add cannot be
                # folded for float OR int inputs
                zero = jnp.where(bits == jnp.int32(0x7DEAD001), 1, 0)
                return step(x + zero.astype(x.dtype))
            return jax.lax.fori_loop(0, LOOP, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    def timeit(fn, *args):
        sync(fn(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / LOOP

    def report(tag, dt, fl=flops):
        print(f"{tag}: {dt*1e3:.3f} ms/iter = {fl/dt/1e12:.0f} TOP/s",
              flush=True)

    xf = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((K, N)).astype(np.float32)
    q, s = quantize_array(wf, axis=1)
    xb = jax.device_put(xf).astype(jnp.bfloat16)
    qd = jax.device_put(q)
    sd = jax.device_put(s.reshape(-1).astype(np.float32))
    xq_pre, sr_pre = jax.jit(quantize_rows)(xb)
    xq_pre.block_until_ready()

    runs = []

    # ceilings (pre-quantized input, H2 check)
    runs.append(("ceil: xla int8 no-epilogue",
                 chain(lambda x: jnp.dot(x, qd,
                                         preferred_element_type=jnp.int32),
                       jnp.int8), (xq_pre,)))
    runs.append(("ceil: xla int8 + f32 epilogue (r2: 213)",
                 chain(lambda x: (jnp.dot(x, qd,
                                          preferred_element_type=jnp.int32)
                                  .astype(jnp.float32) * sr_pre * sd[None, :]
                                  ).astype(jnp.bfloat16), jnp.int8),
                 (xq_pre,)))
    runs.append(("ceil: xla int8 + bf16 epilogue",
                 chain(lambda x: (jnp.dot(x, qd,
                                          preferred_element_type=jnp.int32)
                                  .astype(jnp.bfloat16)
                                  * sr_pre.astype(jnp.bfloat16)
                                  * sd[None, :].astype(jnp.bfloat16)),
                       jnp.int8), (xq_pre,)))

    # H1: pallas two-pass kernel, with/without dimension_semantics
    for pd in (False, True):
        for bm, bn, bk in [(1024, 1024, 1024), (512, 1024, 1024)]:
            runs.append((
                f"pallas 2pass ds={int(pd)} bm{bm} bn{bn} bk{bk}",
                chain(lambda x, bm=bm, bn=bn, bk=bk, pd=pd:
                      _int8_matmul_impl(x, qd, sr_pre, sd, block_m=bm,
                                        block_n=bn, block_k=bk,
                                        parallel_dims=pd), jnp.int8),
                (xq_pre,)))

    # H3: fused kernel (pre-computed s_row; isolates kernel time)
    for bm, bn, bk in [(512, 1024, 1024), (512, 512, 1024),
                       (256, 1024, 1024), (512, 1024, 2048),
                       (1024, 1024, 512), (512, 2048, 1024)]:
        runs.append((
            f"pallas fused bm{bm} bn{bn} bk{bk}",
            chain(lambda x, bm=bm, bn=bn, bk=bk:
                  _int8_matmul_fused_impl(x, qd, sr_pre, sd, block_m=bm,
                                          block_n=bn, block_k=bk),
                  jnp.bfloat16),
            (xb,)))

    # e2e composites (quantize inside the loop)
    runs.append(("e2e: 2pass composite (r2: 207)",
                 chain(lambda x: dequant_matmul_int8(x, qd, sd, block_m=1024,
                                                     block_n=1024,
                                                     block_k=1024),
                       jnp.bfloat16), (xb,)))
    runs.append(("e2e: xla composite",
                 chain(lambda x: (lambda xq_s:
                                  (jnp.dot(xq_s[0], qd,
                                           preferred_element_type=jnp.int32)
                                   .astype(jnp.float32) * xq_s[1]
                                   * sd[None, :]).astype(jnp.bfloat16))
                       (quantize_rows(x)), jnp.bfloat16), (xb,)))
    for bm, bn, bk in [(512, 1024, 1024), (512, 512, 1024),
                       (512, 1024, 2048), (1024, 1024, 512)]:
        runs.append((
            f"e2e: fused composite bm{bm} bn{bn} bk{bk}",
            chain(lambda x, bm=bm, bn=bn, bk=bk:
                  dequant_matmul_int8_fused(x, qd, sd, block_m=bm,
                                            block_n=bn, block_k=bk),
                  jnp.bfloat16), (xb,)))

    # H4: allow_input_fusion — quantize expression feeding the kernel
    try:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from smelter_tpu.kernels.int8_matmul import _kernel as _k2

        def aif_call(x):
            ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                         keepdims=True)
            sr = jnp.maximum(ax, 1e-30) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sr),
                          -127, 127).astype(jnp.int8)
            bm, bn, bk = 1024, 1024, 1024
            grid = (M // bm, N // bn, K // bk)
            kern = functools.partial(_k2, n_k=grid[2],
                                     out_dtype=jnp.dtype(jnp.bfloat16),
                                     k_total=K, bk=bk)
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                    allow_input_fusion=[True, False, True, False],
                ),
            )(xq, qd, sr.astype(jnp.float32), sd.reshape(1, N))

        runs.append(("e2e: allow_input_fusion composite",
                     chain(aif_call, jnp.bfloat16), (xb,)))
    except Exception as e:  # noqa: BLE001
        print("aif setup failed:", e, flush=True)

    for tag, fn, args in runs:
        try:
            dt = timeit(fn, *args)
            report(tag, dt)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
