"""Mixture-of-experts FFN with expert parallelism.

The TPU-native MoE formulation (GShard-style dense dispatch): routing
produces capacity-limited one-hot dispatch/combine tensors, expert FFNs
run as one batched einsum over the expert dimension, and the expert
dimension shards over the mesh — expert parallelism expressed to GSPMD,
no ragged all-to-all written by hand (XLA inserts it from the shardings).

Used by the encoder when ``EncoderConfig.moe_experts > 0``: every other
block's MLP becomes an ``MoEFFN``.  The reference has no training stack at
all; this exists so the framework's training step exercises dp × tp × sp ×
ep and scales the encoder's capacity for corpus-embedding quality work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def top2_dispatch(router_logits: jax.Array, capacity: int):
    """Top-2 gating with per-expert capacity.

    Args:
        router_logits: [T, E] (T = flattened tokens).
        capacity: max tokens an expert accepts (static).

    Returns:
        dispatch [T, E, C] one-hot, combine [T, E, C] gate-weighted,
        aux_loss (load-balancing, Switch-style).
    """
    T, E = router_logits.shape
    probs = jax.nn.softmax(router_logits, axis=-1)

    g1, e1 = jax.lax.top_k(probs, 1)
    masked = probs * (1.0 - jax.nn.one_hot(e1[:, 0], E))
    g2, e2 = jax.lax.top_k(masked, 1)

    def one_expert(eidx, gate, prio_offset):
        onehot = jax.nn.one_hot(eidx, E)                       # [T, E]
        # position of each token within its expert's queue; second-choice
        # tokens queue after all first choices (prio_offset)
        pos = jnp.cumsum(onehot, axis=0) - 1 + prio_offset      # [T, E]
        keep = (onehot > 0) & (pos < capacity)
        pos_c = jax.nn.one_hot(jnp.sum(pos * onehot, axis=1).astype(jnp.int32), capacity)
        disp = keep[:, :, None] * onehot[:, :, None] * pos_c[:, None, :]
        return disp, disp * gate[:, None, None]

    first_count = jnp.cumsum(jax.nn.one_hot(e1[:, 0], E), axis=0)[-1]  # [E]
    d1, c1 = one_expert(e1[:, 0], g1[:, 0], 0.0)
    d2, c2 = one_expert(e2[:, 0], g2[:, 0], first_count[None, :])
    dispatch = d1 + d2
    combine = c1 + c2

    # load-balance aux loss: E * Σ_e fraction_tokens_e * mean_prob_e
    frac = jnp.mean(jax.nn.one_hot(e1[:, 0], E), axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = E * jnp.sum(frac * mean_prob)
    return dispatch, combine, aux


class MoEFFN(nn.Module):
    """Capacity-routed top-2 MoE feed-forward.

    Expert weights are [E, ...]; ``mesh`` shards E over the ``model`` axis
    (ep). The dispatch/combine einsums become XLA all-to-alls under that
    sharding.
    """

    n_experts: int
    d_model: int
    d_ff: int
    capacity_factor: float = 1.25
    dtype = jnp.bfloat16
    mesh: Optional[Mesh] = None

    def _ep(self, x, spec):
        if self.mesh is not None and "model" in self.mesh.shape:
            x = jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))
        return x

    @nn.compact
    def __call__(self, x: jax.Array):
        B, L, D = x.shape
        T = B * L
        E = self.n_experts
        capacity = max(1, int(self.capacity_factor * T / E))

        xt = x.reshape(T, D)
        router = nn.Dense(E, dtype=jnp.float32, name="router")(
            xt.astype(jnp.float32)
        )
        dispatch, combine, aux = top2_dispatch(router, capacity)
        self.sow("losses", "moe_aux", aux)

        w_in = self.param(
            "w_in", nn.initializers.lecun_normal(), (E, D, self.d_ff), jnp.float32
        )
        w_out = self.param(
            "w_out", nn.initializers.lecun_normal(), (E, self.d_ff, D), jnp.float32
        )
        # expert-parallel: expert dim sharded over 'model'
        w_in = self._ep(w_in, P("model", None, None))
        w_out = self._ep(w_out, P("model", None, None))

        expert_in = jnp.einsum(
            "tec,td->ecd", dispatch.astype(self.dtype), xt.astype(self.dtype)
        )
        expert_in = self._ep(expert_in, P("model", None, None))
        h = jnp.einsum("ecd,edf->ecf", expert_in, w_in.astype(self.dtype))
        h = nn.gelu(h)
        expert_out = jnp.einsum("ecf,efd->ecd", h, w_out.astype(self.dtype))
        expert_out = self._ep(expert_out, P("model", None, None))
        out = jnp.einsum(
            "tec,ecd->td", combine.astype(self.dtype), expert_out
        )
        return out.reshape(B, L, D)
