"""Query registry: every operator from SURVEY.md §2 lands here as a
named (spark_fn, oracle_sql) pair consumed by ``__spark_entry__``.

The oracle is ANSI SQL runnable by DuckDB over the same parquet
tables; column aliases MUST match the Spark output exactly (the
driver sorts columns by name before value-hashing).  Queries whose
semantics are not SQL-expressible (MinHash-LSH, streaming state)
register with ``oracle=None`` → the driver records a rows-only check.

Float discipline: any double that went through an aggregation is
rounded to a fixed number of decimals on BOTH sides, so engine-level
summation-order differences below the rounding grain cannot flip the
value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    # True for oracles that pin row count + group keys + schema but
    # whose value columns are engine-specific by construction (e.g.
    # HLL++/GK sketches): the driver's hash flag is EXPECTED false,
    # and tools/check_correctness.py grades rows+schema+keys only.
    partial: bool = False


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", partial: bool = False
):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), partial=partial
        )
        return fn

    return deco
