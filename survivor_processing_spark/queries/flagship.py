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
convert per-partition; both aggregate subqueries reduce lineitem
*before* joining to the per-customer rollup, so the wide join fans
over ~|customer| rows, not ~|lineitem|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ._registry import register

_FLAGSHIP_ORACLE = """
WITH ord_agg AS (
    SELECT o_custkey,
           COUNT(*)           AS n_orders,
           SUM(o_totalprice)  AS total_spent_raw,
           MAX(o_orderdate)   AS last_order
    FROM orders
    GROUP BY o_custkey
), placement AS (
    SELECT c.c_custkey,
           ROW_NUMBER() OVER (
               PARTITION BY c.c_nationkey
               ORDER BY oa.total_spent_raw DESC NULLS LAST, c.c_custkey
           ) AS placement
    FROM customer c
    LEFT JOIN ord_agg oa ON oa.o_custkey = c.c_custkey
), li_cust AS (
    SELECT o.o_custkey, l.l_returnflag, l.l_linestatus,
           l.l_extendedprice, l.l_discount
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
), votes_q AS (
    SELECT o_custkey,
           COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0 AS INTEGER)
               AS ever_returned
    FROM li_cust
    GROUP BY o_custkey
), wins_q AS (
    -- decimal arithmetic: exact, summation-order-independent, so the
    -- value hash cannot be flipped by engine-level fp noise
    SELECT o_custkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS fin_revenue_raw
    FROM li_cust
    WHERE l_linestatus = 'F'
    GROUP BY o_custkey
)
SELECT c.c_custkey,
       MAX(c.c_name)                               AS c_name,
       MAX(n.n_name)                               AS nation_name,
       MAX(r.r_name)                               AS region_name,
       CAST(MAX(p.placement) AS INTEGER)           AS placement,
       COALESCE(MAX(oa.n_orders), 0)               AS n_orders,
       ROUND(COALESCE(SUM(oa.total_spent_raw), 0), 2) AS total_spent,
       strftime(MAX(oa.last_order), '%Y-%m-%d')    AS last_order_date,
       COALESCE(MAX(v.n_items), 0)                 AS n_items,
       COALESCE(MAX(v.ever_returned), 0)           AS ever_returned,
       COALESCE(CAST(ROUND(SUM(w.fin_revenue_raw), 2) AS DOUBLE),
                CAST(-1 AS DOUBLE))                AS fin_revenue
FROM customer c
JOIN nation n          ON n.n_nationkey = c.c_nationkey
JOIN region r          ON r.r_regionkey = n.n_regionkey
LEFT JOIN ord_agg oa   ON oa.o_custkey = c.c_custkey
LEFT JOIN votes_q v    ON v.o_custkey = c.c_custkey
LEFT JOIN wins_q w     ON w.o_custkey = c.c_custkey
LEFT JOIN placement p  ON p.c_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window + 5-way left join + grouped conditional aggs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    ord_agg = orders.groupBy(F.col("o_custkey").alias("oa_custkey")).agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").alias("total_spent_raw"),
        F.max("o_orderdate").alias("last_order"),
    )

    li_cust = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    )

    votes_q = li_cust.groupBy(F.col("o_custkey").alias("v_custkey")).agg(
        F.count("*").alias("n_items"),
        (F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)) > 0)
        .cast("int")
        .alias("ever_returned"),
    )

    wins_q = (
        li_cust.filter(F.col("l_linestatus") == "F")
        .groupBy(F.col("o_custkey").alias("w_custkey"))
        .agg(
            # decimal arithmetic: exact and summation-order-independent
            # (bit-identical across engines; see oracle)
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("fin_revenue_raw")
        )
    )

    # All per-custkey joins are 1:1 (aggregates are keyed by custkey,
    # dims are unique), so the placement ROW_NUMBER can run on the
    # joined frame itself instead of a separate customer⋈ord_agg
    # subplan — Catalyst does not dedupe DataFrame-built common
    # subplans, so the subquery form scanned+aggregated orders TWICE
    # and paid one extra customer-wide join.
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(ord_agg, customer.c_custkey == ord_agg.oa_custkey, "left")
        .withColumn(
            "placement",
            F.row_number().over(
                Window.partitionBy("c_nationkey").orderBy(
                    F.desc_nulls_last("total_spent_raw"), F.asc("c_custkey")
                )
            ),
        )
        .join(votes_q, customer.c_custkey == votes_q.v_custkey, "left")
        .join(wins_q, customer.c_custkey == wins_q.w_custkey, "left")
    )

    return joined.groupBy("c_custkey").agg(
        F.max("c_name").alias("c_name"),
        F.max("n_name").alias("nation_name"),
        F.max("r_name").alias("region_name"),
        F.max("placement").alias("placement"),
        F.coalesce(F.max("n_orders"), F.lit(0)).alias("n_orders"),
        F.round(F.coalesce(F.sum("total_spent_raw"), F.lit(0)), 2).alias("total_spent"),
        F.date_format(F.max("last_order"), "yyyy-MM-dd").alias("last_order_date"),
        F.coalesce(F.max("n_items"), F.lit(0)).alias("n_items"),
        F.coalesce(F.max("ever_returned"), F.lit(0)).alias("ever_returned"),
        F.coalesce(
            F.round(F.sum("fin_revenue_raw"), 2).cast("double"), F.lit(-1.0)
        ).alias("fin_revenue"),
    )


register(
    "flagship_contestant_stats",
    oracle=_FLAGSHIP_ORACLE,
    doc="reference db_funcs.py:4-45 — ranked CTE + 5-way left join + grouped aggs",
)(flagship)
