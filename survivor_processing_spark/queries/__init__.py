"""Assembled query registry (SURVEY.md §2 coverage).

Importing this package populates ``REGISTRY`` with every named query
and its DuckDB oracle.  ``__spark_entry__`` at the repo root exposes
it to the driver.
"""

from __future__ import annotations

from ._registry import REGISTRY, Query, register

# Each module registers its queries on import.
from . import flagship  # noqa: F401  (D1, E1-E4, F1)
from . import relational  # noqa: F401  (C, D, E, F, G, H, K families)
from . import strings  # noqa: F401  (I, J families)
from . import temporal  # noqa: F401  (D5/D6/D9, E6, C7, M1 custom operators)
from . import nested  # noqa: F401  (L family, E10)
from . import llm_dedup  # noqa: F401  (exact/LSH/SimHash/SemDeDup/ExactSubstr dedup)
from . import llm_ann  # noqa: F401  (cosine top-k, IVF, Lloyd k-means)
from . import llm_text  # noqa: F401  (quality scores, lang-id, fingerprints)
from . import llm_multimodal  # noqa: F401  (stdlib-codec media decode plumbing)
from . import llm_curation  # noqa: F401  (gates, splits, PII, packing, BPE)
from . import incremental  # noqa: F401  (B1 merge, N1-N3 incremental/streaming)
from . import sources_q  # noqa: F401  (A3/A5/A7/A9/A10 ingestion connectors)
from . import analytics  # noqa: F401  (windows, pivot, grouping sets, range join, SCD2, sketches)
from . import corpus  # noqa: F401  (keep-best cluster dedup, domain rebalancing)
from . import etl  # noqa: F401  (bucketed joins, CDC, incremental agg, DQ audit)
from . import mining  # noqa: F401  (funnel, fuzzy match, histogram, k-means)
from . import timeseries  # noqa: F401  (gap fill, transitions, deciles, z-order)
from . import graph  # noqa: F401  (integer-lane PageRank, multi-source BFS)

__all__ = ["REGISTRY", "Query", "register"]
