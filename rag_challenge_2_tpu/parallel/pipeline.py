"""Pipeline parallelism: GPipe scheduling over a mesh axis.

Stages are homogeneous (stacked params with a leading stage dim, sharded
over the ``pipe`` axis); microbatches flow through the classic
(S + M − 1)-step schedule, activations rotating stage→stage with
``ppermute`` over ICI.  Written with ``shard_map`` so the schedule and the
collective are explicit — the part of the parallelism inventory GSPMD
can't derive from shardings alone.

The reference has no model execution at all (SURVEY.md §2.3); this exists
for scaling the encoder beyond one chip's HBM in later rounds.  Round-1
integration point: `pipeline_forward` runs any per-stage function; the
encoder's homogeneous Block stack fits it directly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pipeline_forward(
    stage_fn: Callable,
    stage_params,
    x_microbatches: jax.Array,
    mesh: Mesh,
    axis: str = "pipe",
) -> jax.Array:
    """Run M microbatches through S pipelined stages.

    Args:
        stage_fn: ``(params_one_stage, x) -> y`` with ``y.shape == x.shape``
            (homogeneous stages — the transformer-block case).
        stage_params: pytree whose leaves have leading dim S; sharded over
            ``axis`` so each device holds exactly its stage's weights.
        x_microbatches: ``[M, mb, ...]`` replicated input microbatches.
        mesh: mesh containing ``axis`` of size S.

    Returns:
        ``[M, mb, ...]`` outputs (replicated).
    """
    S = mesh.shape[axis]
    M = x_microbatches.shape[0]

    def spmd(params_local, xs):
        sid = jax.lax.axis_index(axis)
        params_l = jax.tree_util.tree_map(lambda p: p[0], params_local)
        buf = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)

        def step(t, carry):
            buf, outs = carry
            mb = t - sid
            active = (mb >= 0) & (mb < M)
            mb_c = jnp.clip(mb, 0, M - 1)
            # stage 0 ingests fresh microbatches; later stages consume the
            # activation rotated in from the previous stage last step
            inp = jnp.where(sid == 0, xs[mb_c], buf)
            y = stage_fn(params_l, inp)
            y = jnp.where(active, y, buf)
            outs = jnp.where(
                active & (sid == S - 1), outs.at[mb_c].set(y), outs
            )
            buf = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return buf, outs

        _, outs = jax.lax.fori_loop(0, S + M - 1, step, (buf, outs))
        # only the last stage holds real outputs; psum replicates them
        # (all other stages contribute zeros)
        return jax.lax.psum(jnp.where(sid == S - 1, outs, 0.0), axis)

    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(stage_params, x_microbatches)
