"""script_mix_stats (queued r13, operators/scripts.py): exact Unicode
script-composition counts, dominant-script argmax with fixed-order
tie-break, integer-threshold mixed-script flag.  Spark == the
generated DuckDB oracle == a pure-Python range model on fixed,
randomized, and sf0.001 corpora."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from survivor_processing_spark.operators.scripts import (
    _EXTRA_CLASSES,
    LETTER_SCRIPTS,
    MIN_LETTERS,
    MIX_DEN,
    SCRIPT_RANGES,
    script_mix_oracle,
    script_mix_stats,
)

SF = "/root/testdata/sf0.001"
ALL_CLASSES = (*SCRIPT_RANGES, *_EXTRA_CLASSES)


def _py_model(texts: dict) -> dict:
    """Pure-Python replay from the same range table."""
    out = {}
    for i, t in texts.items():
        t = t or ""
        counts = {}
        for name, ranges in ALL_CLASSES:
            counts[f"n_{name}"] = sum(
                1 for ch in t if any(lo <= ord(ch) <= hi for lo, hi in ranges)
            )
        letters = sum(counts[f"n_{n}"] for n in LETTER_SCRIPTS)
        dom = "none"
        best = 0
        for n in LETTER_SCRIPTS:  # first max wins ties
            if counts[f"n_{n}"] > best:
                best, dom = counts[f"n_{n}"], n
        mixed = letters >= MIN_LETTERS and (letters - best) * MIX_DEN >= letters
        out[i] = (
            len(t),
            *(counts[f"n_{name}"] for name, _ in ALL_CLASSES),
            letters,
            dom,
            mixed,
        )
    return out


def _spark_rows(spark, texts: dict) -> dict:
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    cols = ["n_chars", *(f"n_{n}" for n, _ in ALL_CLASSES), "n_letter",
            "dominant_script", "mixed_script"]
    return {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in script_mix_stats(df).collect()
    }


def _duck_rows(texts: dict) -> dict:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}),
    )
    return {
        int(row[0]): (*map(lambda v: int(v) if isinstance(v, (int,)) else v,
                           row[1:-2]), row[-2], bool(row[-1]))
        for row in con.execute(script_mix_oracle()).fetchall()
    }


FIX = {
    1: "Hello world, plain ASCII text with words",      # latin only
    2: "Привет мир — Russian Cyrillic текст здесь да",  # cyrillic
    3: "汉字漢字中文文本测试内容在这里持续出现",          # han
    4: "mixed Привет text здесь много russian слов ok",  # latin+cyrillic mix
    5: "12345 67890 +-*/",                               # no letters
    6: None,                                             # NULL -> zeros
    7: "",                                               # empty
    8: "abcφφφ",   # tie-break: latin 3, greek 3 -> latin (table order)
    9: "日本語のテキストです。カタカナもある",             # han+kana
}


def test_fixed_cross_engine_and_model(spark):
    got = _spark_rows(spark, FIX)
    assert got == _duck_rows(FIX)
    assert got == _py_model(FIX)
    assert got[1][-2] == "latin" and got[1][-1] is False
    assert got[2][-2] == "cyrillic"
    assert got[3][-2] == "han"
    # a genuinely mixed doc: dominant exists, flag fires
    assert got[4][-2] in ("latin", "cyrillic") and got[4][-1] is True
    assert got[5][-2] == "none" and got[5][-1] is False
    assert got[6] == got[7]  # NULL == empty: all zeros
    assert got[6][-2] == "none"
    assert got[8][-2] == "latin"  # fixed-order tie-break


def test_mixed_flag_integer_thresholds(spark):
    # exactly at the floor: 18 latin + 2 cyrillic = 20 letters,
    # (20-18)*10 >= 20 -> mixed; one letter fewer -> not mixed
    at = {1: "a" * 18 + "жж", 2: "a" * 18 + "ж"}
    got = _spark_rows(spark, at)
    assert got == _duck_rows(at) == _py_model(at)
    assert got[1][-1] is True
    assert got[2][-1] is False  # 19 letters < MIN_LETTERS


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_cross_engine(spark, seed):
    rng = random.Random(seed)
    pools = [
        "abcdefgh ",                     # latin
        "абвгдежз ",                     # cyrillic
        "αβγδεζηθ ",                     # greek
        "汉字文本 ",                      # han
        "アイウエオ ",                    # kana
        "0123456789 ",                   # digits
        "héllo wörld ",                  # latin-1 letters
        "×÷ ",                           # NOT letters (excluded signs)
    ]
    texts = {
        d: "".join(
            rng.choice(rng.choice(pools)) for _ in range(rng.randint(0, 60))
        )
        if rng.random() > 0.1
        else None
        for d in range(40)
    }
    got = _spark_rows(spark, texts)
    assert got == _duck_rows(texts)
    assert got == _py_model(texts)


def test_excluded_multiplication_division_signs(spark):
    # U+00D7/U+00F7 sit inside the Latin-1 block but are NOT letters
    t = {1: "×÷×÷"}
    got = _spark_rows(spark, t)
    assert got == _duck_rows(t) == _py_model(t)
    assert got[1][1] == 0  # n_latin
    assert got[1][-2] == "none"


def test_sf0001_cross_engine(spark):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # plant deterministic multi-script suffixes (the pii_redaction
    # trick) so every class fires on the real corpus shape
    suffixes = ["", " Привет мир", " 汉字文本", " αβγ δεζ", " カタカナ"]
    sfx_sql = (
        "CASE CAST(doc_id % 5 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(suffixes))
        + " END"
    )
    d = docs.select(
        "doc_id", F.expr(f"concat(text, {sfx_sql})").alias("text")
    )
    # bool/int need no coercion: Python's False == 0 and the VALUES
    # are what the driver hashes; compare keyed tuples directly
    got = {r[0]: tuple(r)[1:] for r in script_mix_stats(d).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW raw_docs AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = {
        int(row[0]): tuple(row)[1:]
        for row in con.execute(
            script_mix_oracle(
                f"SELECT doc_id, text || {sfx_sql} AS text FROM raw_docs"
            )
        ).fetchall()
    }
    assert got == want and len(got) > 0
    # the planted suffixes really exercise the non-Latin classes
    # (row layout: n_chars, then one count per ALL_CLASSES entry)
    names = [n for n, _ in ALL_CLASSES]
    for script in ("cyrillic", "greek", "han", "kana"):
        i = 1 + names.index(script)
        assert any(v[i] > 0 for v in got.values()), script
