"""Test harness configuration.

Forces an 8-device virtual CPU mesh BEFORE jax import so every test —
including sharded/distributed ones — runs without TPU hardware
(SURVEY.md §4: multi-device tests via device-count override).  Pallas
kernels run in interpret mode on CPU (handled inside the ops layer).
"""

import os
import sys
from pathlib import Path

_platform = os.environ.get("RAGTPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
import re as _re
flags = os.environ.get("XLA_FLAGS", "")
# strip any pre-existing device-count flag (a shell exporting =1 would
# silently defeat the 8-device virtual mesh the suite depends on)
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if _platform == "cpu":
    # Some environments pre-register an accelerator plugin that overrides
    # JAX_PLATFORMS from sitecustomize; the config knob wins over both.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: a session-scoped mutable generator makes every
    # test's synthetic data depend on which tests ran before it (a test
    # could pass alone and fail in the suite); each test now draws the
    # same deterministic stream regardless of ordering
    return np.random.default_rng(0)


def make_reports(rng, n_docs=3, companies=("金盘科技", "金盘科技", "宁德时代"),
                 years=(2023, 2024, 2023), pages_per_doc=4, chunks_per_page=3, dim=64):
    """Synthetic chunked-report JSONs matching the reference contract
    (reference src/text_splitter.py:33-60) + unit-norm embeddings."""
    reports, embs = [], []
    for d in range(n_docs):
        pages = [{"page": p + 1, "text": f"doc{d} page{p+1} 全文"} for p in range(pages_per_doc)]
        chunks = []
        cid = 0
        for p in range(pages_per_doc):
            for c in range(chunks_per_page):
                chunks.append({
                    "page": p + 1,
                    "text": f"doc{d} 页面{p+1} 金盘科技 营业收入 chunk{cid}",
                    "id": cid,
                    "type": "content",
                })
                cid += 1
        reports.append({
            "metainfo": {
                "sha1_name": f"J{years[d]}_doc{d}",
                "company_name": companies[d],
                "year": years[d],
            },
            "content": {"pages": pages, "chunks": chunks},
        })
        e = rng.normal(size=(len(chunks), dim)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        embs.append(e)
    return reports, embs


@pytest.fixture
def tiny_corpus(rng):
    from rag_challenge_2_tpu.index import build_corpus_index

    reports, embs = make_reports(rng)
    idx, meta = build_corpus_index(reports, embs, vocab_bits=16)
    return idx, meta, reports, embs
