"""Expert parallelism: capacity-based MoE dispatch with experts sharded
over a mesh axis.

No BASELINE model family uses MoE, but expert parallelism is part of the
serving-parallelism envelope (dp/tp/pp/sp/ep); this module provides the
TPU-native formulation for when MoE ONNX models arrive: Switch-style top-1
routing with a fixed expert capacity (static shapes — the XLA requirement),
dense one-hot dispatch/combine einsums (MXU-friendly; no scatter), expert
weights sharded over the `ep` axis so each device computes only its
experts, with the all-to-alls emitted by the SPMD partitioner from the
shardings.

    moe = MoELayer(d_model=64, d_ff=256, n_experts=8, capacity=16, key=key)
    y = moe.apply_sharded(x, mesh, axis="ep")   # x: (tokens, d_model)

Dropped tokens (over capacity) pass through as zeros, standard Switch
behavior.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MoELayer:
    d_model: int
    d_ff: int
    n_experts: int
    capacity: int
    w_router: jax.Array  # (d_model, E)
    w_in: jax.Array      # (E, d_model, d_ff)
    w_out: jax.Array     # (E, d_ff, d_model)

    @classmethod
    def init(cls, d_model: int, d_ff: int, n_experts: int, capacity: int,
             seed: int = 0) -> "MoELayer":
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(d_model)
        return cls(
            d_model, d_ff, n_experts, capacity,
            w_router=jnp.asarray(rng.standard_normal((d_model, n_experts)) * s,
                                 jnp.float32),
            w_in=jnp.asarray(rng.standard_normal((n_experts, d_model, d_ff)) * s,
                             jnp.float32),
            w_out=jnp.asarray(
                rng.standard_normal((n_experts, d_ff, d_model)) / np.sqrt(d_ff),
                jnp.float32),
        )

    # -- routing ---------------------------------------------------------

    def _dispatch_combine(self, x):
        """Build dense dispatch/combine tensors. x: (T, D).
        dispatch: (T, E, C) one-hot; combine: (T, E, C) gate-weighted."""
        logits = x @ self.w_router                    # (T, E)
        gates = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(gates, axis=-1)           # (T,)
        gate = jnp.take_along_axis(gates, expert[:, None], axis=1)[:, 0]
        # position of each token within its expert's capacity buffer
        onehot = jax.nn.one_hot(expert, self.n_experts, dtype=jnp.int32)
        pos = jnp.cumsum(onehot, axis=0) * onehot     # 1-based slot per token
        slot = jnp.sum(pos, axis=1) - 1               # (T,), -1 never (>=0)
        keep = slot < self.capacity
        dispatch = (
            jax.nn.one_hot(expert, self.n_experts)[:, :, None]
            * jax.nn.one_hot(jnp.where(keep, slot, 0), self.capacity)[:, None, :]
            * keep[:, None, None]
        )                                             # (T, E, C)
        combine = dispatch * gate[:, None, None]
        return dispatch, combine

    # -- execution -------------------------------------------------------

    def _experts(self, buf):
        """Apply each expert's MLP. buf: (E, C, D) -> (E, C, D)."""
        h = jnp.einsum("ecd,edf->ecf", buf, self.w_in)
        h = jax.nn.gelu(h)
        return jnp.einsum("ecf,efd->ecd", h, self.w_out)

    def apply_dense(self, x):
        """Single-device reference. x: (T, D)."""
        dispatch, combine = self._dispatch_combine(x)
        buf = jnp.einsum("tec,td->ecd", dispatch, x)  # (E, C, D)
        out = self._experts(buf)
        return jnp.einsum("tec,ecd->td", combine, out)

    def apply_sharded(self, x, mesh, axis: str = "ep"):
        """Experts sharded over `axis`; routing/dispatch replicated, expert
        MLPs computed only on the owning device (SPMD inserts all-to-alls)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        ew = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        w_in = jax.device_put(self.w_in, ew)
        w_out = jax.device_put(self.w_out, ew)
        xr = jax.device_put(x, rep)

        def fn(x, w_in, w_out):
            dispatch, combine = self._dispatch_combine(x)
            buf = jnp.einsum("tec,td->ecd", dispatch, x)
            h = jnp.einsum("ecd,edf->ecf", buf, w_in)
            h = jax.nn.gelu(h)
            out = jnp.einsum("ecf,efd->ecd", h, w_out)
            return jnp.einsum("tec,ecd->td", combine, out)

        with mesh:
            return jax.jit(fn)(xr, w_in, w_out)
