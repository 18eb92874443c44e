"""Collective matmul: hand-scheduled all-gather-GEMM / reduce-scatter-GEMM.

The §5.8 overlap instance for the TP *linear* path (SURVEY.md:63,
BASELINE.json:5 "all-gather / reduce-scatter overlapped with compute"):
where parallel/ tensor-parallel layers let the SPMD partitioner insert a
blocking all-gather before the device-local matmul, these kernels own the
schedule — the ring rotation of activation shards rides
`pltpu.make_async_remote_copy` WHILE the MXU consumes the shard already
on hand, so ICI transfer hides under compute (the collective-matmul
recipe; same machinery as kernels/ring_attention_rdma.py).

Two duals, matching Megatron-style TP inference:

- `collective_matmul_ag` — column-parallel layer with sequence/M-sharded
  activations: x (M/P, K) per device, w (K, N/P) per device; every device
  needs ALL of x. Ring: at step s each device dots the x shard that
  originated at device (my - s) mod P into the matching M rows of its
  (M, N/P) output while the shard rotates rightward.
- `collective_matmul_rs` — row-parallel layer: x (M, K/P), w (K/P, N);
  the full (M, N) partial sum must be reduce-scattered over M. Ring: the
  accumulator for M-chunk c starts at device (c+1) mod P and travels
  rightward; each device adds its local partial for the chunk in hand,
  so device d finishes holding exactly chunk d fully reduced.

Both validated in interpret mode on the virtual CPU mesh (bit-parity vs
the partitioner's program, tests/test_collective_matmul.py); on hardware
the same kernels drive real ICI rings. Reference scope: none — the
reference is single-GPU (ONNXGraph.swift:185-189); this is the driver's
multi-chip mandate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neighbor_barrier(tok, tok_sems, left, right):
    """Token-RDMA barrier with both ring neighbors (remote
    semaphore_signal does not lower in interpret mode; token DMAs work
    everywhere — see ring_attention_rdma.py)."""
    bl = pltpu.make_async_remote_copy(
        src_ref=tok.at[0], dst_ref=tok.at[1],
        send_sem=tok_sems.at[0], recv_sem=tok_sems.at[1],
        device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)
    br = pltpu.make_async_remote_copy(
        src_ref=tok.at[0], dst_ref=tok.at[2],
        send_sem=tok_sems.at[2], recv_sem=tok_sems.at[3],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    bl.start()
    br.start()
    bl.wait()
    br.wait()


def _ag_kernel(n_dev: int, axis_name: str, acc_dtype):
    def kernel(x_ref, w_ref, o_ref, comm_x, send_sems, recv_sems,
               tok, tok_sems):
        my = lax.axis_index(axis_name)
        right = lax.rem(my + 1, n_dev)
        left = lax.rem(my + n_dev - 1, n_dev)
        ml = x_ref.shape[0]

        comm_x[0] = x_ref[...]
        for step in range(n_dev):
            cur, nxt = step % 2, (step + 1) % 2
            last = step == n_dev - 1
            if not last:
                # rotate the shard in hand to the right neighbor while the
                # MXU consumes it (both only READ cur)
                rx = pltpu.make_async_remote_copy(
                    src_ref=comm_x.at[cur], dst_ref=comm_x.at[nxt],
                    send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                rx.start()

            # shard in hand originated at (my - step): its global M rows
            src = lax.rem(my - step + n_dev, n_dev)
            o_ref[pl.ds(src * ml, ml), :] = jnp.dot(
                comm_x[cur], w_ref[...],
                preferred_element_type=acc_dtype).astype(o_ref.dtype)

            if not last:
                rx.wait()
                _neighbor_barrier(tok, tok_sems, left, right)

    return kernel


def _rs_kernel(n_dev: int, axis_name: str, acc_dtype):
    def kernel(x_ref, w_ref, o_ref, comm, send_sems, recv_sems,
               tok, tok_sems):
        my = lax.axis_index(axis_name)
        right = lax.rem(my + 1, n_dev)
        left = lax.rem(my + n_dev - 1, n_dev)
        mc = o_ref.shape[0]  # M / n_dev rows per chunk

        pending = None
        for step in range(n_dev):
            cur = step % 2
            last = step == n_dev - 1
            # chunk in hand at this step: device d finishes with chunk d.
            # Its LOCAL partial depends only on x_ref/w_ref, so the dot
            # overlaps the in-flight ring transfer started last step.
            c = lax.rem(my - step - 1 + 2 * n_dev, n_dev)
            part = jnp.dot(
                lax.dynamic_slice_in_dim(x_ref[...], c * mc, mc, 0),
                w_ref[...], preferred_element_type=acc_dtype)
            if pending is None:
                comm[cur] = part
            else:
                pending.wait()  # comm[cur] now holds the traveling sum
                # barrier before touching slots again: our own send (the
                # same `pending`) read slot 1-cur; neighbors may not
                # overwrite it until everyone is past the wait
                _neighbor_barrier(tok, tok_sems, left, right)
                comm[cur] = comm[cur] + part
            if not last:
                pending = pltpu.make_async_remote_copy(
                    src_ref=comm.at[cur], dst_ref=comm.at[(step + 1) % 2],
                    send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                pending.start()
            else:
                o_ref[...] = comm[cur].astype(o_ref.dtype)

    return kernel


def collective_matmul_ag(x_local, w_local, *, axis_name: str, n_dev: int,
                         collective_id: int = 8,
                         interpret: bool | None = None):
    """Per-shard entry (call inside shard_map over `axis_name`).
    x_local (M/P, K) M-sharded, w_local (K, N/P) N-sharded ->
    out (M, N/P): each device's full-M rows of its output columns."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ml, k = x_local.shape
    _, nl = w_local.shape
    acc = jnp.float32 if x_local.dtype != jnp.int8 else jnp.int32
    return pl.pallas_call(
        _ag_kernel(n_dev, axis_name, acc),
        out_shape=jax.ShapeDtypeStruct((n_dev * ml, nl), x_local.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ml, k), x_local.dtype),  # rotating x shards
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((3, 8, 128), jnp.float32),   # barrier tokens
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id,
                                             has_side_effects=True),
        interpret=interpret,
    )(x_local, w_local)


def collective_matmul_rs(x_local, w_local, *, axis_name: str, n_dev: int,
                         collective_id: int = 9,
                         interpret: bool | None = None):
    """Per-shard entry. x_local (M, K/P) K-sharded, w_local (K/P, N) ->
    out (M/P, N): this device's M chunk of the fully-reduced product."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, _ = x_local.shape
    _, n = w_local.shape
    assert m % n_dev == 0, (m, n_dev)
    mc = m // n_dev
    return pl.pallas_call(
        _rs_kernel(n_dev, axis_name, jnp.float32),
        out_shape=jax.ShapeDtypeStruct((mc, n), x_local.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, mc, n), jnp.float32),    # traveling partials
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((3, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id,
                                             has_side_effects=True),
        interpret=interpret,
    )(x_local, w_local)


def tp_allgather_matmul(x, w, mesh, *, axis: str = "tp"):
    """Full-array wrapper: x (M, K) sharded over M on `axis`, w (K, N)
    sharded over N. Returns (M, N) sharded over N — the column-parallel
    TP linear with the all-gather hand-overlapped against the MXU."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    fn = jax.shard_map(
        functools.partial(collective_matmul_ag, axis_name=axis,
                          n_dev=n_dev),
        mesh=mesh, in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(None, axis), check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, axis)))
    return jax.jit(fn)(xs, ws)


def tp_reducescatter_matmul(x, w, mesh, *, axis: str = "tp"):
    """Full-array wrapper: x (M, K) sharded over K, w (K, N) sharded over
    K. Returns (M, N) sharded over M — the row-parallel TP linear with
    the reduce-scatter hand-overlapped against the MXU."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    fn = jax.shard_map(
        functools.partial(collective_matmul_rs, axis_name=axis,
                          n_dev=n_dev),
        mesh=mesh, in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None), check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    ws = jax.device_put(w, NamedSharding(mesh, P(axis, None)))
    return jax.jit(fn)(xs, ws)
