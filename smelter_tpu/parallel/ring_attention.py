"""Ring attention: sequence-parallel attention over a mesh axis.

For sequences too long for one chip (long-context transformer serving,
docs/ROADMAP.md item 8). Each device holds a sequence shard of Q/K/V; K/V
shards rotate around the ring (lax.ppermute over ICI) while every device
folds each visiting shard into its local queries' streaming-softmax state
(the same max/sum/rescale algebra as kernels/flash_attention.py). Memory
is O(N/devices), the ring fully utilizes bisection bandwidth, and XLA
overlaps the permute with the local attention step.

This is the JAX-collective formulation (SPMD partitioner handles the
transfers); a Pallas RDMA variant (make_async_remote_copy, guide §10) is
the documented next step if hand-scheduled overlap proves necessary.

Usage (inside shard_map over a mesh with a sequence axis):

    out = ring_attention(q, k, v, axis_name="sp", scale=d**-0.5)

q/k/v: per-shard (B, H, N_local, D), non-causal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _merge(m, l, acc, s, v):
    """Fold one block of logits s (B,H,Nq,Nk) and values v into the
    streaming-softmax state (m: running max, l: running sum, acc: output)."""
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return m_new, l_new, acc_new


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   axis_name: str, scale: float = 1.0) -> jax.Array:
    """Non-causal ring attention over mesh axis `axis_name` (see module
    docstring). Returns the attention output for the local query shard."""
    n_dev = lax.psum(1, axis_name)
    qf = q.astype(jnp.float32)
    b, h, nq, d = qf.shape

    # Derive carries from qf so they inherit its varying-over-axis type
    # (shard_map's vma tracking rejects unvarying init + varying output).
    m0 = jnp.full_like(qf[..., :1], -jnp.inf)
    l0 = jnp.zeros_like(qf[..., :1])
    acc0 = jnp.zeros_like(qf)

    def body(i, carry):
        m, l, acc, k_cur, v_cur = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)) * scale
        m, l, acc = _merge(m, l, acc, s, v_cur.astype(jnp.float32))
        # rotate K/V to the next device in the ring
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return m, l, acc, k_nxt, v_nxt

    m, l, acc, _, _ = lax.fori_loop(0, n_dev, body, (m0, l0, acc0, k, v))
    return (acc / l).astype(q.dtype)


def sequence_sharded_attention(q, k, v, mesh, *, axis: str = "sp",
                               scale: float = 1.0):
    """Convenience wrapper: full (B, H, N, D) arrays in, ring attention over
    `axis` of `mesh` via shard_map, full output back (sharded along N)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    qs = jax.device_put(q, NamedSharding(mesh, spec))
    ks = jax.device_put(k, NamedSharding(mesh, spec))
    vs = jax.device_put(v, NamedSharding(mesh, spec))
    return jax.jit(fn)(qs, ks, vs)
