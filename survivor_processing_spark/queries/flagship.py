"""Flagship query — the reference's widest analytical plan.

Re-expression of ``pull_agg_contestant_stats`` (reference:
helpers/db_funcs.py:4-45): a ranked CTE (ROW_NUMBER per group,
reference F1), a 5-way LEFT join (D1), two aggregate subqueries with
conditional aggregation (E2) and a filtered grouped SUM (E4), and a
final grouped SUM/MAX with a COALESCE default (E1/E3) — all in ONE
Catalyst plan: scan → broadcast dim joins → shuffle agg → window →
project.

Star-schema casting (FIXTURES.md §B): customer≈contestant_season,
nation/region≈season dims, orders≈episode participation, lineitem≈
per-episode stat facts, ``l_returnflag = 'R'``≈"voted against",
``l_linestatus = 'F'``≈"final/win" rows.

Scale notes: nation and region are broadcast (no shuffle);
lineitem⋈orders is a key-partitioned shuffle join that AQE may
convert per-partition; the single lineitem aggregate reduces to
~|customer| rows *before* the wide join, so the join fans over
dimensions, not facts.

Plan-level rewrites vs the oracle's literal CTE shape (results
identical, checked by hash):

* votes_q and wins_q fuse into ONE pass over lineitem⋈orders —
  Catalyst does not dedupe DataFrame-built common subplans, so the
  two-subquery form scanned and joined lineitem TWICE; the filtered
  revenue sum becomes a conditional aggregate (sum over no 'F' rows
  is NULL either way).
* The final GROUP BY c_custkey is eliminated: every join is 1:1 on
  unique keys (dims unique, aggregates keyed by custkey), so the
  grouped MAX/SUMs are identity — a pure projection replaces a full
  shuffle + hash agg over wide rows.
* Money math is integer cents (see relational.grouped_sum_all_measures):
  exact for 2-decimal inputs, codegen'd long sums instead of the
  BigDecimal path, and the placement window orders by the exact cent
  sum on BOTH engines, so ranking cannot be flipped by fp summation
  noise.  Revenue (price × (1-discount)) is a ×10^4-scaled long —
  per-customer sums are orders of magnitude inside bigint range.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ._registry import register

_FLAGSHIP_ORACLE = """
WITH ord_agg AS (
    SELECT o_custkey,
           COUNT(*)                                      AS n_orders,
           SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spent_cents,
           MAX(o_orderdate)                              AS last_order
    FROM orders
    GROUP BY o_custkey
), placement AS (
    SELECT c.c_custkey,
           ROW_NUMBER() OVER (
               PARTITION BY c.c_nationkey
               ORDER BY oa.spent_cents DESC NULLS LAST, c.c_custkey
           ) AS placement
    FROM customer c
    LEFT JOIN ord_agg oa ON oa.o_custkey = c.c_custkey
), li_agg AS (
    -- integer-cents math: exact and summation-order-independent, so
    -- the value hash cannot be flipped by engine-level fp noise
    SELECT o.o_custkey,
           COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) > 0 AS INTEGER)
               AS ever_returned,
           SUM(CASE WHEN l.l_linestatus = 'F'
                    THEN CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
               END) AS fin4
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_custkey
)
SELECT c.c_custkey,
       c.c_name,
       n.n_name                                    AS nation_name,
       r.r_name                                    AS region_name,
       CAST(p.placement AS INTEGER)                AS placement,
       COALESCE(oa.n_orders, 0)                    AS n_orders,
       COALESCE(oa.spent_cents, 0) / 100.0         AS total_spent,
       strftime(oa.last_order, '%Y-%m-%d')         AS last_order_date,
       COALESCE(v.n_items, 0)                      AS n_items,
       COALESCE(v.ever_returned, 0)                AS ever_returned,
       COALESCE(floor(v.fin4 / 100.0 + 0.5) / 100.0,
                CAST(-1 AS DOUBLE))                   AS fin_revenue
FROM customer c
JOIN nation n          ON n.n_nationkey = c.c_nationkey
JOIN region r          ON r.r_regionkey = n.n_regionkey
LEFT JOIN ord_agg oa   ON oa.o_custkey = c.c_custkey
LEFT JOIN li_agg v     ON v.o_custkey = c.c_custkey
LEFT JOIN placement p  ON p.c_custkey = c.c_custkey
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window + 5-way left join + grouped conditional aggs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # floor(x*100+0.5): round-half-up for positive money via pure IEEE
    # ops — F.round(double) routes through BigDecimal.valueOf per value
    # (measured ~2x on this plan); floor stays in codegen arithmetic.
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731

    ord_agg = orders.groupBy(F.col("o_custkey").alias("oa_custkey")).agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("spent_cents"),
        F.max("o_orderdate").alias("last_order"),
    )

    li_agg = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("v_custkey"))
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)) > 0)
            .cast("int")
            .alias("ever_returned"),
            F.sum(
                F.when(
                    F.col("l_linestatus") == "F",
                    cents("l_extendedprice")
                    * (F.lit(100) - cents("l_discount")),
                )
            ).alias("fin4"),
        )
    )

    # All per-custkey joins are 1:1 (aggregates are keyed by custkey,
    # dims are unique), so the placement ROW_NUMBER runs on the joined
    # frame itself — no separate customer⋈ord_agg subplan — and the
    # reference's final GROUP BY reduces to a projection.
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(ord_agg, customer.c_custkey == ord_agg.oa_custkey, "left")
        .withColumn(
            "placement",
            F.row_number().over(
                Window.partitionBy("c_nationkey").orderBy(
                    F.desc_nulls_last("spent_cents"), F.asc("c_custkey")
                )
            ),
        )
        .join(li_agg, customer.c_custkey == li_agg.v_custkey, "left")
    )

    return joined.select(
        "c_custkey",
        "c_name",
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
        F.col("placement"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        (F.coalesce("spent_cents", F.lit(0)) / F.lit(100.0)).alias("total_spent"),
        F.date_format("last_order", "yyyy-MM-dd").alias("last_order_date"),
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.coalesce("ever_returned", F.lit(0)).alias("ever_returned"),
        # 2-decimal consumer contract: the exact 4-decimal cent-product
        # sum (fin4, long) rounds half-up to cents via pure IEEE ops —
        # floor(x+0.5) stays in codegen (F.round routes through
        # BigDecimal per value); identical expression in the oracle, so
        # the double is bit-equal cross-engine.
        F.coalesce(
            F.floor(F.col("fin4") / F.lit(100.0) + F.lit(0.5)) / F.lit(100.0),
            F.lit(-1.0),
        ).alias("fin_revenue"),
    )


register(
    "flagship_contestant_stats",
    oracle=_FLAGSHIP_ORACLE,
    doc="reference db_funcs.py:4-45 — ranked CTE + 5-way left join + grouped aggs",
)(flagship)
