"""Flagship query: end-to-end plan shape + oracle parity at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from survivor_processing_spark.catalog import TABLES
from survivor_processing_spark.queries import REGISTRY


def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_flagship_matches_oracle(spark, sf_dir):
    q = REGISTRY["flagship_contestant_stats"]
    got = canon(q.fn(spark, sf_dir).toPandas())
    want = canon(oracle_con(sf_dir).execute(q.oracle).df())
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        gv, wv = got[c], want[c]
        if gv.dtype.kind == "f":
            assert (gv.fillna(-1e18) - wv.fillna(-1e18)).abs().max() < 1e-9, c
        else:
            assert gv.where(gv.notna(), None).tolist() == wv.where(wv.notna(), None).tolist(), c


def test_flagship_plan_broadcasts_dims(spark, sf_dir):
    """nation/region lookups must be broadcast joins, not shuffles
    (replaces the reference's per-row SQL round-trips, db_funcs.py:137-228)."""
    df = REGISTRY["flagship_contestant_stats"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
