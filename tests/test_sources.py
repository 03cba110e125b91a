"""Source-connector tests: xlsx/docx/html parsers, binaryFile +
mapInPandas plumbing, REST keyset pagination, YAML overlay."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from survivor_processing_spark.sources import (
    correction_overlay,
    docx_paragraphs,
    extract_data_sources,
    extract_links,
    find_marker,
    paged_fetch,
    parse_binary_files,
    parse_confessional_docx,
    read_binary_files,
    read_xlsx_grid,
    scan_region,
    write_minimal_docx,
    write_minimal_xlsx,
    yaml_lookup_df,
)
from survivor_processing_spark.sources.docx import CONFESSIONAL_SCHEMA
from survivor_processing_spark.sources.rest import _synthetic_fetcher


def test_xlsx_roundtrip_and_region_scan(tmp_path):
    sheets = {
        "e1": [
            ["Tribal Council voting", None, None],
            ["contestant", "v1", "v2"],
            ["Alice", 1.0, None],
            ["Bob", None, 2.0],
            [None, None, None],
            ["other table", 9.0, None],
        ]
    }
    grid = read_xlsx_grid(write_minimal_xlsx(sheets))["e1"]
    assert grid[(1, 1)] == "Tribal Council voting"
    assert grid[(3, 2)] == 1.0

    marker = find_marker(grid, "Tribal Council")
    assert marker == (1, 1)
    region = scan_region(grid, marker[0] + 1, marker[1])
    assert region[0] == ["contestant", "v1", "v2"]
    assert region[1] == ["Alice", 1.0, None]
    assert len(region) == 3  # stops at the blank row


def test_docx_confessional_parse():
    doc = write_minimal_docx(
        [
            "Day 7",
            "Alice (1/4): I trust Bob.",
            "Bob (2/4): Alice is next.",
            "Day 8",
            "Alice (3/4): New plan.",
            "not a confessional line",
        ]
    )
    assert len(docx_paragraphs(doc)) == 6
    rows = parse_confessional_docx("/data/3x05_ Week.docx", doc)
    assert rows[0][:3] == (3, 5, "Alice")
    assert rows[0][6] == 7  # day carried forward
    assert rows[2][6] == 8
    assert [r[7] for r in rows] == [1, 2, 4]  # ingestion order kept


def test_html_datasource_and_links():
    html = (
        "<div data-source='season'>  Season <b>41</b> </div>"
        "<ul><li><a href='/wiki/Alice'>Alice A</a></li>"
        "<li><a href='/wiki/Bob'>Bob</a></li>"
        "<li><a href='/other/x'>skip</a></li></ul>"
    )
    assert extract_data_sources(html) == {"season": "Season 41"}
    links = extract_links(html, href_prefix="/wiki/")
    assert links == [("/wiki/Alice", "Alice A"), ("/wiki/Bob", "Bob")]


def test_binary_file_scan_parallel_parse(spark, tmp_path):
    for season, ep in [(1, 2), (3, 4)]:
        doc = write_minimal_docx([f"Cara ({season}/9): s{season}e{ep}."])
        (tmp_path / f"{season}x{ep:02d}_ Title.docx").write_bytes(doc)
    files = read_binary_files(spark, str(tmp_path), glob="*.docx")
    assert files.count() == 2
    out = parse_binary_files(
        files, parse_confessional_docx, CONFESSIONAL_SCHEMA
    ).orderBy("season")
    rows = out.collect()
    assert [(r.season, r.episode) for r in rows] == [(1, 2), (3, 4)]
    assert rows[0].content == "s1e2."


def test_paged_fetch_cursor_and_stop():
    recs = list(
        paged_fetch(_synthetic_fetcher, "submission", start=0, stop=1_600_000_300, limit=3)
    )
    assert [r["created_utc"] for r in recs] == [
        1_600_000_000,
        1_600_000_060,
        1_600_000_120,
        1_600_000_180,
        1_600_000_240,
        1_600_000_300,
    ]
    # watermark start: strictly-after cursor semantics
    recs2 = list(
        paged_fetch(
            _synthetic_fetcher, "submission", start=1_600_000_120, stop=1_600_000_300
        )
    )
    assert recs2[0]["created_utc"] == 1_600_000_180


def test_rest_datasource_roundtrip(spark):
    from survivor_processing_spark.sources import register_rest_source

    register_rest_source(spark)
    df = (
        spark.read.format("rest_keyset")
        .option("fetcher", "synthetic")
        .option("types", "submission,comment")
        .option("start", "1600000000")
        .option("stop", "1600000600")
        .load()
    )
    rows = df.groupBy("entity_type").count().collect()
    assert {r.entity_type: r["count"] for r in rows} == {
        "submission": 10,
        "comment": 10,
    }


def test_yaml_overlay(spark, tmp_path):
    p = tmp_path / "map.yaml"
    p.write_text("alice: 101\nbob: 102\n")
    corrections = yaml_lookup_df(spark, str(p), "name", "fixed_id")
    base = spark.createDataFrame(
        [("alice", 1), ("carol", 3)], "name string, person_id long"
    )
    out = correction_overlay(
        base, corrections, on="name", target="person_id", corrected="fixed_id"
    )
    assert {r.name: r.person_id for r in out.collect()} == {"alice": 101, "carol": 3}
