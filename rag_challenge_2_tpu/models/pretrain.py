"""Self-supervised encoder pretraining on a chunked corpus.

The reference rents its embedding quality from an API
(Qwen text-embedding-v4).  To make on-device corpus embedding
(BASELINE.md config 4) self-contained, the encoder trains on the corpus
itself with no labels and no external service — the same chunked-report
JSONs that feed the index feed training, with global-batch InfoNCE
(models/train.py) supplying the negatives.

Two pair constructions, mixed per example:

* **independent cropping** (``crop_prob`` of examples): query and passage
  are two random overlapping crops of the same chunk.  Crops share tokens
  (company names, years, metric terms), so the model learns that
  lexically/semantically overlapping texts embed together — the property
  question-style retrieval actually needs.
* **Inverse Cloze Task** (the remainder): a sampled span is the query and
  the chunk is the passage; with probability ``keep_span_prob`` the span
  stays inside the passage, otherwise it is removed.  Pure span-removal
  ICT teaches *complementary*-content matching only; measured on the
  config-4 quality eval it collapses question-style retrieval to ~0 hit@10
  (eval/encoder_quality.py), which is why removal-only is not the default.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_mesh
from .encoder import EmbeddingModel, EncoderConfig, tokenize_batch
from .train import TrainConfig, init_training


@dataclasses.dataclass
class PretrainConfig:
    steps: int = 200
    batch_size: int = 64
    max_len: int = 64
    min_span: int = 4
    seed: int = 0
    # pair-construction mix (see module docstring); crop_prob=0,
    # keep_span_prob=0 reproduces the original removal-only ICT.
    # Defaults = best of the measured ablation on the config-4 quality
    # eval (docs/ENCODER_QUALITY.json): crop75/keep50 0.285 hit@10 vs
    # 0.255 pure-crop, 0.24 crop50/keep20, 0.01 removal-only.
    crop_prob: float = 0.75
    keep_span_prob: float = 0.5


def ict_pairs(
    chunk_texts: List[str],
    n: int,
    rng: np.random.Generator,
    min_span: int = 4,
) -> Tuple[List[str], List[str]]:
    """Sample (query span, remaining passage) pairs from chunks
    (removal-only ICT; kept for comparison experiments)."""
    return contrastive_pairs(
        chunk_texts, n, rng, min_span=min_span, crop_prob=0.0, keep_span_prob=0.0
    )


def contrastive_pairs(
    chunk_texts: List[str],
    n: int,
    rng: np.random.Generator,
    min_span: int = 4,
    crop_prob: float = 0.75,
    keep_span_prob: float = 0.5,
) -> Tuple[List[str], List[str]]:
    """Sample self-supervised (query, passage) pairs from chunks.

    Per example: with ``crop_prob`` an independent-crop pair (two random
    crops of the same chunk, each ≥ half the chunk so they overlap);
    otherwise an ICT pair whose span survives in the passage with
    ``keep_span_prob``."""
    texts = [t for t in chunk_texts if len(t) >= 2 * min_span]
    if not texts:
        raise ValueError("corpus has no chunks long enough for pretraining")
    queries, passages = [], []
    for _ in range(n):
        t = texts[rng.integers(0, len(texts))]
        if rng.random() < crop_prob:
            def crop():
                span = int(rng.integers(max(min_span, len(t) // 2), len(t) + 1))
                start = int(rng.integers(0, len(t) - span + 1))
                return t[start : start + span]
            queries.append(crop())
            passages.append(crop())
        else:
            span_len = int(rng.integers(min_span, max(min_span + 1, len(t) // 2)))
            start = int(rng.integers(0, len(t) - span_len + 1))
            queries.append(t[start : start + span_len])
            if rng.random() < keep_span_prob:
                passages.append(t)
            else:
                passages.append(t[:start] + t[start + span_len :])
    return queries, passages


def pretrain_encoder(
    chunk_texts: List[str],
    enc_cfg: Optional[EncoderConfig] = None,
    pre_cfg: PretrainConfig = PretrainConfig(),
    train_cfg: TrainConfig = TrainConfig(lr=3e-4),
    mesh=None,
    log_every: int = 50,
) -> Tuple[EmbeddingModel, Dict]:
    """Train from scratch on the corpus; returns the ready EmbeddingModel."""
    enc_cfg = enc_cfg or EncoderConfig()
    if mesh is None:
        n = len(jax.devices())
        mesh = make_mesh({"data": n, "model": 1})
    module, params, opt_state, step = init_training(enc_cfg, train_cfg, mesh, seed=pre_cfg.seed)
    rng = np.random.default_rng(pre_cfg.seed)
    history = []
    # token sequences must stay inside the encoder's position table
    max_len = min(pre_cfg.max_len, enc_cfg.max_len)
    for i in range(pre_cfg.steps):
        q_texts, p_texts = contrastive_pairs(
            chunk_texts, pre_cfg.batch_size, rng,
            min_span=pre_cfg.min_span,
            crop_prob=pre_cfg.crop_prob,
            keep_span_prob=pre_cfg.keep_span_prob,
        )
        q = jnp.asarray(tokenize_batch(q_texts, max_len, enc_cfg.vocab_bits))
        p = jnp.asarray(tokenize_batch(p_texts, max_len, enc_cfg.vocab_bits))
        params, opt_state, metrics = step(params, opt_state, q, p)
        if i % log_every == 0 or i == pre_cfg.steps - 1:
            history.append({
                "step": i,
                "loss": float(metrics["loss"]),
                "accuracy": float(metrics["accuracy"]),
            })
    model = EmbeddingModel(enc_cfg, params=jax.device_get(params))
    return model, {"history": history, "final": history[-1] if history else {}}


# ------------------------------------------------------------ persistence

def save_params(model: EmbeddingModel, path: Path) -> None:
    """Flatten the param tree into an npz keyed by tree paths."""
    flat = jax.tree_util.tree_flatten_with_path(model.params)[0]
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in flat
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_params(model: EmbeddingModel, path: Path) -> EmbeddingModel:
    """Restore params saved by save_params into a fresh model."""
    z = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(model.params)
    restored = []
    for p, v in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        arr = z[key]
        assert arr.shape == v.shape, f"shape mismatch at {key}"
        restored.append(jnp.asarray(arr, v.dtype))
    params = jax.tree_util.tree_unflatten(treedef, restored)
    return EmbeddingModel(model.cfg, params=params)
