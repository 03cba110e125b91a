"""mojibake_stats (queued r13, operators/mojibake.py): exact
encoding-damage counts (U+FFFD, C1 controls, UTF-8-as-cp1252
digraphs), integer damage lane, suspect flag.  Spark == the generated
DuckDB oracle == a pure-Python replay on fixed, randomized, and
sf0.001 corpora."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from survivor_processing_spark.operators.mojibake import (
    LANE_DEN,
    LANE_THRESHOLD,
    UTF8_DIGRAPHS,
    mojibake_oracle,
    mojibake_stats,
)

SF = "/root/testdata/sf0.001"
REPL = chr(0xFFFD)
C1 = chr(0x85)  # NEL — a classic stray C1 control


def _py_model(texts: dict) -> dict:
    out = {}
    for i, t in texts.items():
        t = t or ""
        n_repl = t.count(REPL)
        n_c1 = sum(1 for ch in t if 0x80 <= ord(ch) <= 0x9F)
        # non-overlapping left-to-right scan over the digraph table
        n_dig = 0
        j = 0
        while j < len(t) - 1:
            if t[j : j + 2] in UTF8_DIGRAPHS:
                n_dig += 1
                j += 2
            else:
                j += 1
        lane = (
            0 if not t else (n_repl + n_c1 + n_dig) * LANE_DEN // len(t)
        )
        out[i] = (
            len(t), n_repl, n_c1, n_dig, lane,
            n_repl > 0 or lane >= LANE_THRESHOLD,
        )
    return out


def _spark_rows(spark, texts: dict) -> dict:
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    return {
        r["doc_id"]: (
            r["n_chars"], r["n_replacement"], r["n_c1_controls"],
            r["n_utf8_digraphs"], r["damage_lane"], r["suspect"],
        )
        for r in mojibake_stats(df).collect()
    }


def _duck_rows(texts: dict) -> dict:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}),
    )
    return {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]), int(r[5]),
                    bool(r[6]))
        for r in con.execute(mojibake_oracle()).fetchall()
    }


FIX = {
    1: "perfectly clean ascii text here",
    2: "damaged caf" + "Ã©" + " and tÃªte text",     # 2 digraphs
    3: "lost " + REPL + REPL + " chars",             # replacement chars
    4: "stray" + C1 + "control" + C1 + "bytes",      # C1 controls
    5: "donâ€™t â€œquoteâ€ me",                      # curly-quote family
    6: None,
    7: "",
    8: "Ã©" * 50,                                    # pure damage
}


def test_fixed_cross_engine_and_model(spark):
    got = _spark_rows(spark, FIX)
    assert got == _duck_rows(FIX)
    assert got == _py_model(FIX)
    assert got[1][-1] is False
    assert got[2][3] == 2
    assert got[3][1] == 2 and got[3][-1] is True   # any U+FFFD = suspect
    assert got[4][2] == 2
    assert got[5][3] == 3                          # â€ fires thrice
    assert got[6] == got[7] == (0, 0, 0, 0, 0, False)
    assert got[8][-1] is True and got[8][4] == LANE_DEN // 2


def test_lane_threshold_boundary(spark):
    # one digraph in exactly LANE_DEN/LANE_THRESHOLD chars sits AT the
    # 0.5% lane threshold; one char more drops below
    n = LANE_DEN // LANE_THRESHOLD  # 200
    at = {1: "Ã©" + "a" * (n - 2), 2: "Ã©" + "a" * (n - 1)}
    got = _spark_rows(spark, at)
    assert got == _duck_rows(at) == _py_model(at)
    assert got[1][-1] is True and got[1][4] == LANE_THRESHOLD
    assert got[2][-1] is False


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_cross_engine(spark, seed):
    rng = random.Random(seed)
    frags = [
        "clean text ", "Ã©", "Ã¼", "â€", REPL, C1, "Â°", "a", "é", "Ã",
        "Â", "â", "€", " ",
    ]
    texts = {
        d: None
        if rng.random() < 0.1
        else "".join(
            rng.choice(frags) for _ in range(rng.randint(0, 40))
        )
        for d in range(40)
    }
    got = _spark_rows(spark, texts)
    assert got == _duck_rows(texts)
    assert got == _py_model(texts)


def test_sf0001_cross_engine(spark):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # plant deterministic damage on a slice (the pii_redaction trick)
    sfx_sql = (
        "CASE CAST(doc_id % 4 AS INTEGER)"
        " WHEN 0 THEN '' WHEN 1 THEN ' cafÃ© visit'"
        f" WHEN 2 THEN ' lost {REPL} char'"
        " ELSE ' donâ€™t' END"
    )
    d = docs.select(
        "doc_id", F.expr(f"concat(text, {sfx_sql})").alias("text")
    )
    got = {r[0]: tuple(r)[1:] for r in mojibake_stats(d).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW raw_docs AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = {
        int(r[0]): tuple(r)[1:]
        for r in con.execute(
            mojibake_oracle(
                f"SELECT doc_id, text || {sfx_sql} AS text FROM raw_docs"
            )
        ).fetchall()
    }
    assert got == want and len(got) > 0
    assert any(v[-1] for v in got.values())      # some docs suspect
    assert any(not v[-1] for v in got.values())  # most stay clean
