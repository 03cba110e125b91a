"""Ordered-step funnel conversion over an event stream — the
product-analytics shape (view → click → purchase within a user's
timeline) the reference's episode/event tables invite but its pandas
notebooks compute ad hoc.  A training-data pipeline uses the same
operator for acquisition funnels over crawl → fetch → extract →
accept stages keyed by URL or host.

Semantics: a user reaches step i at the EARLIEST event satisfying
step i's predicate at-or-after the timestamp at which they reached
step i−1 (``>=`` — two steps may share a timestamp; tie order never
matters because only MIN(ts) per user per step is kept, which is
tie-invariant).  Returns one row per step: ``step_idx, step_name,
n_users`` (monotonically non-increasing down the funnel).

Portability: the operator is k chained (filter → groupBy(user) MIN →
join) stages — plain relational algebra, no floats, no engine
randomness; :func:`funnel_oracle` mechanically generates the same
chain as DuckDB CTEs from the same (name, predicate) list, so the
SQL cannot drift from the loop.

Scale shape: each stage is ONE shuffle on the user key over a table
that SHRINKS monotonically (stage i joins the event table against
the user-sized reach-set of stage i−1; the reach-set is
aggregate-sized, broadcastable under AQE once the funnel narrows).
Repartitioning events once by user makes every stage's join
co-partitioned; funnel depth k is a small constant, so the k-shuffle
cost is bounded and NOT data-dependent.  No Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, str]],
) -> DataFrame:
    """Funnel conversion counts over ``events``; ``steps`` is an
    ordered list of ``(step_name, sql_predicate)`` evaluated against
    the event columns.  Returns ``step_idx, step_name, n_users``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), "*"
    )
    reach = None  # DataFrame[_u, _t]: earliest reach-ts of prior step
    counts = []
    for idx, (name, pred) in enumerate(steps, start=1):
        hits = ev.filter(F.expr(pred))
        if reach is not None:
            hits = hits.join(
                reach.select("_u", F.col("_t").alias("_prev")), "_u"
            ).filter(F.col("_ts") >= F.col("_prev"))
        reach = hits.groupBy("_u").agg(F.min("_ts").alias("_t"))
        counts.append(
            reach.agg(
                F.lit(idx).alias("step_idx"),
                F.lit(name).alias("step_name"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def funnel_oracle(
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, str]],
    source_sql: str,
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`funnel_steps` over ``source_sql`` — one reach-set CTE per
    step from the same (name, predicate) list."""
    parts = [f"WITH src AS ({source_sql})"]
    for i, (_, pred) in enumerate(steps, start=1):
        if i == 1:
            parts.append(
                f", s1 AS (SELECT {user_col} AS u, MIN({ts_col}) AS t"
                f" FROM src WHERE {pred} GROUP BY {user_col})"
            )
        else:
            parts.append(
                f", s{i} AS (SELECT e.{user_col} AS u, MIN(e.{ts_col}) AS t"
                f" FROM src e JOIN s{i - 1} p ON e.{user_col} = p.u"
                f" AND e.{ts_col} >= p.t"
                f" WHERE {pred} GROUP BY e.{user_col})"
            )
    selects = [
        f"SELECT {i} AS step_idx, '{name.replace(chr(39), chr(39) * 2)}'"
        f" AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i}"
        for i, (name, _) in enumerate(steps, start=1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
