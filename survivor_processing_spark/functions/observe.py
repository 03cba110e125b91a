"""Pipeline observability via ``DataFrame.observe``.

Production pipelines at 100 TB need run metrics (row counts, null
rates, domain violations) WITHOUT extra actions: a separate
``df.count()`` / ``df.filter(bad).count()`` pair re-executes the
plan.  ``observe`` attaches accumulator-backed aggregates to the one
real pass — zero extra scans, exact values, collected on the driver
after the action completes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observed_quality(
    df: DataFrame, *, null_cols: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``'s
    next action.  Returns (df, observation); read
    ``observation.get`` AFTER an action has run the plan."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        for c in null_cols
    ]
    return df.observe(obs, *metrics), obs
