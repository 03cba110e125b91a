"""Crawl politeness scheduler — turn a frontier of URLs into
numbered fetch waves such that no host appears more than
``per_slot`` times in any wave.  The reference fetches a handful of
wiki pages serially (its notebooks sleep between requests); at
100 TB-crawl scale the same courtesy is a PLAN, not a sleep: the
fetch fleet executes wave 0 everywhere, then wave 1, and per-host
concurrency is bounded by construction.  Pairs with the A9/A4
fetchers (sources/rest.py, sources/html.py), which handle the
in-flight half (retry/backoff, Retry-After).

Determinism: within a host, URLs order by ``(priority, url)`` —
priority ascending (0 = fetch first), ties broken by the URL text,
so the same frontier always yields the same schedule (canonicalize
URLs first — operators/urlnorm.py — or duplicate urls get distinct
slots and waste fetches).  ``slot = (rank − 1) DIV per_slot`` in
integer arithmetic; everything is engine-portable relational
algebra and the oracle replays it verbatim.

Scale shape: ONE shuffle (the per-host ranking window).  A mega-host
(half the frontier on one domain) makes one hot task, but that cost
is intrinsic — politeness serializes that host's fetches anyway, and
the hot task only RANKS (no fetching); the wave execution downstream
is fully parallel across hosts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def crawl_schedule_slots(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    per_slot: int = 4,
    priority_col: str | None = None,
) -> DataFrame:
    """Schedule ``frontier`` into fetch waves: adds ``slot`` (0-based
    wave number) with at most ``per_slot`` URLs per host per wave."""
    if per_slot < 1:
        raise ValueError(f"per_slot must be >= 1: {per_slot}")
    order = (
        [F.col(priority_col).asc(), F.col(url_col).asc()]
        if priority_col
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        frontier.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "slot", F.expr(f"cast((_rn - 1) div {int(per_slot)} as bigint)")
        )
        .drop("_rn")
    )


def crawl_schedule_summary(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    per_slot: int = 4,
    priority_col: str | None = None,
) -> DataFrame:
    """Wave-level rollup of :func:`crawl_schedule_slots`: one row per
    slot — ``slot, n_urls, n_hosts`` — the shape a fleet dashboard
    reads (and a gate query hashes)."""
    sched = crawl_schedule_slots(
        frontier, host_col, url_col, per_slot, priority_col
    )
    return (
        sched.groupBy("slot")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(host_col).alias("n_hosts"),
        )
    )


def crawl_schedule_oracle(
    source_sql: str,
    host_col: str = "host",
    url_col: str = "url",
    per_slot: int = 4,
    priority_col: str | None = None,
) -> str:
    """DuckDB SQL replaying :func:`crawl_schedule_summary` over
    ``source_sql``."""
    order = (
        f"{priority_col}, {url_col}" if priority_col else f"{url_col}"
    )
    return f"""WITH src AS ({source_sql}), sched AS (
    SELECT {host_col} AS h,
           (ROW_NUMBER() OVER (PARTITION BY {host_col} ORDER BY {order})
            - 1) // {int(per_slot)} AS slot
    FROM src
)
SELECT CAST(slot AS BIGINT) AS slot,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hosts
FROM sched
GROUP BY slot"""
