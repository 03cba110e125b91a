"""String / regex / date-time scalar-function queries (SURVEY.md §2.I/J).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; no Python UDFs in this module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ._registry import register

# --- I1: regex extract → columns -------------------------------------------


@register(
    "regex_extract_columns",
    doc="reference transform_helpers.py:63-70 + episodes_transform.py:7-17 — "
    "regexp groups to typed columns",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 1) AS size_word,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) AS kind_word,
       CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num
FROM part
""",
)
def regex_extract_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 1).alias("size_word"),
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 2).alias("kind_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
    )


# --- I2: multi-pattern first-match -----------------------------------------


@register(
    "multi_pattern_first_match",
    doc="reference contestant_extract.py:33-49 regex_dict — try alternative "
    "patterns in order, first match wins, via COALESCE of NULLIF'd extracts",
    oracle="""
SELECT o_orderkey,
       COALESCE(
           NULLIF(regexp_extract(o_orderpriority, '^1-(\\w+)', 1), ''),
           NULLIF(regexp_extract(o_orderpriority, '^2-(\\w+)', 1), ''),
           NULLIF(regexp_extract(o_orderpriority, '^(\\d)-', 1), ''),
           'none'
       ) AS priority_token
FROM orders
""",
)
def multi_pattern_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pats = [r"^1-(\w+)", r"^2-(\w+)", r"^(\d)-"]
    return o.select(
        "o_orderkey",
        F.coalesce(
            *[
                F.nullif(F.regexp_extract("o_orderpriority", p, 1), F.lit(""))
                for p in pats
            ],
            F.lit("none"),
        ).alias("priority_token"),
    )


# --- I4: concat / lower / pad / split / trim --------------------------------


@register(
    "string_funcs_merge_key",
    doc="reference contestant_extract.py:341-345 merge-key building "
    "(CONCAT + LOWER) and confessional_extract.py:84-85 zfill",
    oracle="""
SELECT c_custkey,
       lower(concat(c_name, '_', CAST(c_nationkey AS VARCHAR))) AS merge_key,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
       split_part(c_name, '#', 1) AS name_prefix,
       trim(c_mktsegment) AS segment
FROM customer
""",
)
def string_funcs_merge_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower(
            F.concat_ws("_", F.col("c_name"), F.col("c_nationkey").cast("string"))
        ).alias("merge_key"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
        F.trim(F.col("c_mktsegment")).alias("segment"),
    )


# --- I5/I6: value→NULL normalization + unit-scaling parse -------------------


@register(
    "null_normalize_unit_scale",
    doc="reference episodes_transform.py:27-30 ({'N/A': None} normalize) + "
    "transform_helpers.py:63-70 (viewership string → float × 1e8)",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') THEN NULL
            ELSE o_orderpriority END AS priority_clean,
       CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS DOUBLE) * 1e8
           AS priority_scaled
FROM orders
""",
)
def null_normalize_unit_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"), None
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("priority_clean"),
        (
            F.regexp_extract("o_orderpriority", r"^(\d+)", 1).cast("double") * 1e8
        ).alias("priority_scaled"),
    )


# --- J1-J3: timestamp parsing and epoch conversions -------------------------


@register(
    "date_parse_epoch",
    doc="reference reddit_transform.py:8-9 (epoch→ts), reddit_extract.py:10-12 "
    "(ts→epoch), episodes_transform.py:20-21 (string→ts)",
    oracle="""
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS ts_day,
       CAST(year(ts) AS INTEGER) AS ts_year,
       CAST(month(ts) AS INTEGER) AS ts_month,
       strftime(epoch_ms(CAST(floor(epoch(ts)) AS BIGINT) * 1000),
                '%Y-%m-%d %H:%M:%S') AS ts_roundtrip
FROM events
""",
)
def date_parse_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("ts_day"),
        F.year("ts").cast("int").alias("ts_year"),
        F.month("ts").cast("int").alias("ts_month"),
        F.date_format(
            F.timestamp_seconds(F.unix_timestamp("ts")), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_roundtrip"),
    )


# --- C3/J5: date-window predicate ------------------------------------------


@register(
    "date_window_predicate",
    doc="reference extract_helpers.py:47-51 currently-running-season test — "
    "started notnull AND (ended isnull OR ended > cutoff)",
    oracle="""
SELECT o_orderkey, o_orderstatus, strftime(o_orderdate, '%Y-%m-%d') AS order_day
FROM orders
WHERE o_orderdate IS NOT NULL
  AND (o_orderstatus = 'O' OR o_orderdate > TIMESTAMP '2000-06-01')
""",
)
def date_window_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").isNotNull()
        & (
            (F.col("o_orderstatus") == "O")
            | (F.col("o_orderdate") > F.lit("2000-06-01").cast("timestamp"))
        )
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )
