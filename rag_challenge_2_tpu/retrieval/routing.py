"""Company/year routing.

Behavioural port of ``extract_years_from_question`` and
``route_reports_by_time`` (reference src/retrieval.py:24-165), re-targeted
at the corpus-mask model: instead of filtering a list of per-document
database files, routing produces a boolean row mask over the corpus index
that the scoring kernels fuse into search (SURVEY.md §5: "year-routing maps
to shard masking rather than loading separate per-year index files").
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..index.schema import CorpusIndex

_YEAR_RE = re.compile(r"(20\d{2})年")


def extract_years_from_question(question: str, expand_window: bool = True) -> List[int]:
    """Years mentioned as ``20XX年``; optionally expanded to [min-1, max+1].

    Same contract as reference src/retrieval.py:24-64: "2024年…" with
    expansion → [2023, 2024, 2025]; range questions expand the whole span;
    no year → [].
    """
    years = [int(y) for y in _YEAR_RE.findall(question)]
    if not years:
        return []
    if expand_window:
        return list(range(min(years) - 1, max(years) + 2))
    return sorted(set(years))


def route_core(
    xp,
    valid,
    company_col,
    year_col,
    company_id: Optional[int] = None,
    years: Optional[Sequence[int]] = None,
    fallback: str = "all",
):
    """The routing semantics, generic over the array module (``numpy`` for
    the engine's host-side ``routed_docs``, ``jax.numpy`` for the fused
    device mask) — ONE implementation, two execution sites."""
    base = valid
    if company_id is not None:
        # company_id = -1 means "unknown company" (CorpusMeta.company_id miss):
        # an empty mask, mirroring the reference's hard error for companies
        # with no reports (reference src/retrieval.py:843-845).  None means
        # "no company filter" (retrieve_all).
        base = base & (company_col == company_id)

    if years:
        ymask = base & xp.isin(year_col, xp.asarray(list(years)))
        # fall back to all company docs when the year filter is empty
        return xp.where(xp.any(ymask), ymask, base)

    if fallback == "latest":
        latest = xp.max(xp.where(base, year_col, -1))
        lmask = base & (year_col == latest)
        return xp.where(latest >= 0, lmask, base)
    return base


def route_mask(
    index: CorpusIndex,
    company_id: Optional[int] = None,
    years: Optional[Sequence[int]] = None,
    fallback: str = "all",
) -> jnp.ndarray:
    """Boolean row mask for (company, years) routing.

    Semantics follow reference src/retrieval.py:67-165:
      * filter by company first;
      * if ``years`` given, keep matching docs — but if nothing matches,
        fall back to the whole company (reference :125-128);
      * without years: ``fallback="all"`` keeps every company doc,
        ``"latest"`` keeps only the newest year present (reference :131-155).
    Rows with unknown year (-1) participate only in the no-year fallback.
    """
    return route_core(
        jnp, index.valid, index.company_id, index.year,
        company_id, years, fallback,
    )
