"""Ring attention as a Pallas kernel with explicit inter-chip RDMA.

The hand-scheduled counterpart of parallel/ring_attention.py (which lets
the SPMD partitioner emit the collectives): here each device's kernel owns
the schedule — double-buffered K/V rings rotate via
`pltpu.make_async_remote_copy` while the local flash-style merge runs, so
communication overlaps compute explicitly (pallas_guide.md §10/§18
patterns). Validated in interpret mode on the virtual CPU mesh; the same
kernel drives real ICI rings on hardware.

Layout per device (inside shard_map over the sequence axis):
  q, k, v: (BH, Nl, D) local shards.
  comm[2] double buffer per K and V; slot `cur` is being consumed while
  `nxt` receives the neighbor's shard; a neighbor barrier per step keeps
  slot reuse safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_dev: int, axis_name: str, scale: float):
    def kernel(q_ref, k_ref, v_ref, o_ref, comm_k, comm_v, send_sems,
               recv_sems, tok, tok_sems, m_ref, l_ref, acc_ref):
        my = lax.axis_index(axis_name)
        right = lax.rem(my + 1, n_dev)
        left = lax.rem(my + n_dev - 1, n_dev)

        comm_k[0] = k_ref[...]
        comm_v[0] = v_ref[...]
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        q = q_ref[...].astype(jnp.float32)

        for step in range(n_dev):
            cur, nxt = step % 2, (step + 1) % 2
            last = step == n_dev - 1
            if not last:
                # Launch the rotation before computing on `cur` (both only
                # READ cur; `nxt` was fully consumed two steps ago and the
                # barrier below guarantees the neighbor is done with it).
                rk = pltpu.make_async_remote_copy(
                    src_ref=comm_k.at[cur], dst_ref=comm_k.at[nxt],
                    send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                rv = pltpu.make_async_remote_copy(
                    src_ref=comm_v.at[cur], dst_ref=comm_v.at[nxt],
                    send_sem=send_sems.at[1], recv_sem=recv_sems.at[1],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                rk.start()
                rv.start()

            k_cur = comm_k[cur].astype(jnp.float32)
            v_cur = comm_v[cur].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k_cur, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (BH, Nq, Nk)
            m_prev = m_ref[...]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
                p, v_cur, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m_ref[...] = m_new

            if not last:
                rk.wait()
                rv.wait()
                # Neighbor barrier: neighbors may not overwrite our `cur`
                # slot (their step+1 destination) until we finish reading
                # it. Implemented as tiny token RDMAs in both directions —
                # waiting for both incoming tokens proves both neighbors
                # reached this point. (Remote semaphore_signal and
                # get_barrier_semaphore do not lower in interpret mode;
                # token DMAs work everywhere.)
                bl = pltpu.make_async_remote_copy(
                    src_ref=tok.at[0], dst_ref=tok.at[1],
                    send_sem=tok_sems.at[0], recv_sem=tok_sems.at[1],
                    device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                br = pltpu.make_async_remote_copy(
                    src_ref=tok.at[0], dst_ref=tok.at[2],
                    send_sem=tok_sems.at[2], recv_sem=tok_sems.at[3],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                bl.start()
                br.start()
                bl.wait()
                br.wait()

        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)

    return kernel


def ring_attention_rdma(q, k, v, *, axis_name: str, n_dev: int,
                        scale: float = 1.0, collective_id: int = 7,
                        interpret: bool | None = None):
    """Per-shard entry (call inside shard_map). q/k/v: (B, H, Nl, D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, nl, d = q.shape
    q3 = q.reshape(b * h, nl, d)
    k3 = k.reshape(b * h, nl, d)
    v3 = v.reshape(b * h, nl, d)
    bh = b * h
    kernel = _make_kernel(n_dev, axis_name, scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, nl, d), q.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bh, nl, d), k3.dtype),   # K ring buffer
            pltpu.VMEM((2, bh, nl, d), v3.dtype),   # V ring buffer
            pltpu.SemaphoreType.DMA((2,)),           # send sems (k, v)
            pltpu.SemaphoreType.DMA((2,)),           # recv sems (k, v)
            pltpu.VMEM((3, 8, 128), jnp.float32),    # barrier tokens
            pltpu.SemaphoreType.DMA((4,)),           # token sems
            pltpu.VMEM((bh, nl, 1), jnp.float32),    # running max
            pltpu.VMEM((bh, nl, 1), jnp.float32),    # running sum
            pltpu.VMEM((bh, nl, d), jnp.float32),    # accumulator
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id,
                                             has_side_effects=True),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, nl, d)


def sequence_sharded_attention_rdma(q, k, v, mesh, *, axis: str = "sp",
                                    scale: float = 1.0):
    """Full-array wrapper mirroring parallel.sequence_sharded_attention but
    on the RDMA kernel."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(ring_attention_rdma, axis_name=axis, n_dev=n_dev,
                          scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    qs = jax.device_put(q, NamedSharding(mesh, spec))
    ks = jax.device_put(k, NamedSharding(mesh, spec))
    vs = jax.device_put(v, NamedSharding(mesh, spec))
    return jax.jit(fn)(qs, ks, vs)
