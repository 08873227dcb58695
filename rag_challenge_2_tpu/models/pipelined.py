"""Pipeline-parallel encoder forward (GPipe over the Block stack).

The encoder's transformer blocks are homogeneous, so the stack maps
directly onto parallel/pipeline.py's GPipe schedule: block ``i`` lives on
pipe-stage ``i``, microbatches stream through with activations rotating
over ICI (``ppermute``), and the embedding / pooling / projection ends run
replicated outside the pipelined region.

The reference has no model execution at all (SURVEY.md §2.3); this is the
scaling path for encoders whose weights exceed one chip's HBM
(BASELINE.md config 4 at larger model sizes).  dp×pp composes: the
microbatch batch dim shards over the ``data`` axis inside the same
shard_map (see ``pipeline_forward(batch_axis=...)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from ..parallel.pipeline import pipeline_forward
from .encoder import Block, EncoderConfig


def stack_block_params(params, n_layers: int):
    """``block0..blockN`` param subtrees → one stacked pytree [S, ...]."""
    blocks = [params["params"][f"block{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def encode_pipelined(
    cfg: EncoderConfig,
    params,
    token_ids: jax.Array,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pipe",
    batch_axis: str | None = "data",
) -> jax.Array:
    """Pipelined equivalent of ``Encoder.__call__`` (same params tree).

    Requires ``mesh.shape[axis] == cfg.n_layers`` (one block per stage),
    a dense FFN stack (no MoE — stages must be homogeneous), and a batch
    divisible by ``n_micro``.
    """
    assert cfg.moe_experts == 0, "pipelined encoder requires homogeneous blocks"
    S = mesh.shape[axis]
    assert S == cfg.n_layers, (
        f"pipe axis ({S}) must equal n_layers ({cfg.n_layers}) — one stage per block"
    )
    B, L = token_ids.shape
    assert B % n_micro == 0, f"batch {B} not divisible by {n_micro} microbatches"
    p = params["params"]

    pad = token_ids >= 0
    ids = jnp.maximum(token_ids, 0)
    x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype).apply(
        {"params": p["tok_embed"]}, ids
    )
    pos = nn.Embed(cfg.max_len, cfg.d_model, dtype=cfg.dtype).apply(
        {"params": p["pos_embed"]}, jnp.arange(L)[None, :]
    )
    x = x + pos
    attn_mask = nn.make_attention_mask(pad, pad, dtype=cfg.dtype)

    mb = B // n_micro
    xs = x.reshape(n_micro, mb, L, cfg.d_model)
    masks = attn_mask.reshape(n_micro, mb, *attn_mask.shape[1:])

    stacked = stack_block_params(params, cfg.n_layers)
    block = Block(cfg)

    def stage_fn(pb, x_mb, m_mb):
        return block.apply({"params": pb}, x_mb, m_mb)

    y = pipeline_forward(
        stage_fn, stacked, xs, mesh, axis=axis, extras=masks,
        batch_axis=batch_axis if batch_axis in mesh.shape else None,
    )
    x = y.reshape(B, L, cfg.d_model)

    x = nn.LayerNorm(dtype=cfg.dtype).apply({"params": p["ln_f"]}, x)
    denom = jnp.maximum(jnp.sum(pad, axis=1, keepdims=True), 1)
    pooled = jnp.sum(x * pad[..., None], axis=1) / denom
    out = nn.Dense(cfg.out_dim, dtype=jnp.float32).apply(
        {"params": p["proj"]}, pooled.astype(jnp.float32)
    )
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)
