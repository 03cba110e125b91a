"""Source-connector queries (SURVEY.md §2.A): each builds a small
deterministic fixture (workbook / documents / pages / API window) at
query time, runs the REAL Spark ingestion path (binaryFile +
mapInPandas parser, Python DataSource), and returns a table the
DuckDB oracle reproduces as literal VALUES — so the connectors go
through the same hash-checked gate as the relational operators.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import (
    parse_binary_files,
    read_binary_files,
    write_minimal_docx,
    write_minimal_xlsx,
    yaml_lookup_df,
    correction_overlay,
)
from ..sources.docx import CONFESSIONAL_SCHEMA, parse_confessional_docx
from ..sources.html import extract_data_sources
from ..sources.xlsx import find_marker, read_xlsx_grid, scan_region
from ._registry import register


def _fixture_dir(kind: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"sps_fixture_{kind}")
    os.makedirs(d, exist_ok=True)
    return d


# --- A5/A6: xlsx region scan -------------------------------------------------


def _parse_challenge_xlsx(path: str, content: bytes) -> list[tuple]:
    """Marker-anchored region scan per sheet (reference
    episode_stats_extract.py:304-347: find header text, grow the
    sub-table, emit normalized rows)."""
    rows = []
    for sheet, grid in read_xlsx_grid(content).items():
        m = find_marker(grid, "Challenge")
        if m is None:
            continue
        region = scan_region(grid, m[0] + 1, m[1])
        header, data = region[0], region[1:]
        for i, r in enumerate(data):
            for ci in range(1, len(header)):
                if r[ci] is not None:
                    rows.append((sheet, str(r[0]), str(header[ci]), float(r[ci]), i + 1))
    return rows


@register(
    "xlsx_region_scan",
    doc="A5: xlsx workbook -> binaryFile + mapInPandas marker-anchored "
    "region scan (zipfile+ElementTree reader, no openpyxl), unpivoted to "
    "long rows; file-per-task parallelism",
    oracle="""
SELECT * FROM (VALUES
  ('e1', 'Alice', 'win',   1.0, 1), ('e1', 'Alice', 'sitout', 0.0, 1),
  ('e1', 'Bob',   'win',   0.0, 2), ('e1', 'Bob',   'sitout', 1.0, 2),
  ('e2', 'Alice', 'win',   0.0, 1),
  ('e2', 'Bob',   'win',   1.0, 2)
) AS t(sheet, contestant, measure, value, data_row)
""",
)
def xlsx_region_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixture_dir("xlsx")
    path = os.path.join(d, "s01.xlsx")
    if not os.path.exists(path):
        wb = write_minimal_xlsx(
            {
                "e1": [
                    ["Challenge results", None, None],
                    ["contestant", "win", "sitout"],
                    ["Alice", 1.0, 0.0],
                    ["Bob", 0.0, 1.0],
                ],
                "e2": [
                    ["Challenge results", None],
                    ["contestant", "win"],
                    ["Alice", 0.0],
                    ["Bob", 1.0],
                ],
            }
        )
        with open(path, "wb") as f:
            f.write(wb)
    files = read_binary_files(spark, d, glob="*.xlsx")
    return parse_binary_files(
        files,
        _parse_challenge_xlsx,
        "sheet string, contestant string, measure string, value double, data_row int",
    )


# --- A7: docx confessional scan ---------------------------------------------


@register(
    "docx_confessional_scan",
    doc="A7: .docx transcripts -> binaryFile + mapInPandas paragraph regex "
    "parse (zipfile+ElementTree, no python-docx); filename-derived "
    "season/episode; explicit paragraph-order column (F3 semantics)",
    oracle="""
SELECT * FROM (VALUES
  (1, 2, 'Alice', 1, 3, 'I trust Bob.',   7, 1),
  (1, 2, 'Bob',   2, 3, 'Alice is next.', 7, 2),
  (1, 2, 'Alice', 3, 3, 'New plan.',      8, 4),
  (4, 9, 'Cara',  1, 1, 'Merge chaos.',   19, 1)
) AS t(season, episode, contestant, n_in_episode, total_in_episode,
       content, day, para_order)
""",
)
def docx_confessional_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixture_dir("docx")
    fixtures = {
        "1x02_ Trust.docx": [
            "Day 7",
            "Alice (1/3): I trust Bob.",
            "Bob (2/3): Alice is next.",
            "Day 8",
            "Alice (3/3): New plan.",
        ],
        "4x09_ Merge.docx": ["Day 19", "Cara (1/1): Merge chaos."],
    }
    for fname, paras in fixtures.items():
        path = os.path.join(d, fname)
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(write_minimal_docx(paras))
    files = read_binary_files(spark, d, glob="*.docx")
    return parse_binary_files(files, parse_confessional_docx, CONFESSIONAL_SCHEMA)


# --- A3: html infobox extraction --------------------------------------------


def _parse_infobox_html(path: str, content: bytes) -> list[tuple]:
    page = os.path.basename(path).replace(".html", "")
    vals = extract_data_sources(content.decode("utf-8"))
    return [(page, vals.get("season", ""), vals.get("location", ""))]


@register(
    "html_infobox_extract",
    doc="A3: wiki-style pages -> data-source infobox extraction with the "
    "stdlib html.parser state machine, one record per page, "
    "partition-parallel over files",
    oracle="""
SELECT * FROM (VALUES
  ('s41', 'Season 41', 'Fiji'),
  ('s42', 'Season 42', 'Fiji Islands')
) AS t(page, season, location)
""",
)
def html_infobox_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixture_dir("html")
    pages = {
        "s41.html": "<div data-source='season'>Season <b>41</b></div>"
        "<p data-source='location'> Fiji </p>",
        "s42.html": "<div data-source='season'>Season 42</div>"
        "<p data-source='location'>Fiji  Islands</p>",
    }
    for fname, html in pages.items():
        path = os.path.join(d, fname)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(html)
    files = read_binary_files(spark, d, glob="*.html")
    return parse_binary_files(
        files, _parse_infobox_html, "page string, season string, location string"
    )


def _parse_links_html(path: str, content: bytes) -> list[tuple]:
    from ..sources.html import extract_links

    page = os.path.basename(path).split(".")[0]
    return [
        (page, href, text)
        for href, text in extract_links(
            content.decode("utf-8"), href_prefix="/wiki/"
        )
    ]


@register(
    "html_link_extract",
    doc="A4: the link-list crawl's FIRST half as an oracle-gated "
    "query — seed pages parse to (page, href, anchor_text) rows via "
    "the stdlib anchor state machine (prefix-filtered, nested-markup "
    "anchor text collapsed), partition-parallel over files; the "
    "second half (executor-side child fetch, fetch_pages) is "
    "network-bound and gated by the http.server integration test",
    oracle="""
SELECT * FROM (VALUES
  ('index1', '/wiki/alpha', 'Alpha One'),
  ('index1', '/wiki/beta', 'Beta'),
  ('index2', '/wiki/gamma', 'Gamma 3')
) AS t(page, href, anchor_text)
""",
)
def html_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixture_dir("html_links")
    pages = {
        "index1.html": '<ul><li><a href="/wiki/alpha"><b>Alpha</b> One</a>'
        '</li><li><a href="/wiki/beta">Beta</a></li>'
        '<li><a href="/other/x">skip</a></li></ul>',
        "index2.html": '<p>see <a href="/wiki/gamma">Gamma  3</a> and '
        '<a href="http://elsewhere">ext</a></p>',
    }
    for fname, html in pages.items():
        path = os.path.join(d, fname)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(html)
    files = read_binary_files(spark, d, glob="*.html")
    return parse_binary_files(
        files, _parse_links_html, "page string, href string, anchor_text string"
    )


# --- A9/N1: REST keyset pagination ------------------------------------------


@register(
    "rest_keyset_scan",
    doc="A9: keyset-paginated REST scan as a Spark 4 Python DataSource "
    "(one partition per cursor; watermark start, stop bound, retry loop); "
    "deterministic in-process backend stands in for the network",
    oracle="""
SELECT * FROM (VALUES
  ('comment',    CAST(10 AS BIGINT), CAST(1600000060 AS BIGINT), CAST(1600000600 AS BIGINT)),
  ('submission', CAST(10 AS BIGINT), CAST(1600000060 AS BIGINT), CAST(1600000600 AS BIGINT))
) AS t(entity_type, n, min_cu, max_cu)
""",
)
def rest_keyset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_rest_source

    register_rest_source(spark)
    df = (
        spark.read.format("rest_keyset")
        .option("fetcher", "synthetic")
        .option("types", "submission,comment")
        .option("start", "1600000000")
        .option("stop", "1600000600")
        .load()
    )
    return df.groupBy("entity_type").agg(
        F.count("*").alias("n"),
        F.min("created_utc").alias("min_cu"),
        F.max("created_utc").alias("max_cu"),
    )


# --- A10: YAML correction overlay -------------------------------------------


@register(
    "yaml_correction_map",
    doc="A10: hand-maintained YAML name->id map over the derived ids "
    "(broadcast join + coalesce precedence) on the customer dimension",
    oracle="""
SELECT c.c_name, COALESCE(m.fixed_id, c.c_custkey) AS resolved_id
FROM customer c
LEFT JOIN (VALUES
    ('Customer#000000001', CAST(900001 AS BIGINT)),
    ('Customer#000000007', CAST(900007 AS BIGINT))
) AS m(name, fixed_id) ON m.name = c.c_name
""",
)
def yaml_correction_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    d = _fixture_dir("yaml")
    path = os.path.join(d, "namemap.yaml")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write("'Customer#000000001': 900001\n'Customer#000000007': 900007\n")
    corrections = yaml_lookup_df(spark, path, "c_name", "fixed_id")
    c = load_table(spark, sf_dir, "customer").select(
        "c_name", F.col("c_custkey").alias("resolved_id")
    )
    return correction_overlay(
        c, corrections, on="c_name", target="resolved_id", corrected="fixed_id"
    )


# --- A8/N5: incremental file sync (modified-since pickup) -------------------


@register(
    "filesync_modified_since",
    doc="A8/N5: two-phase incremental file pickup via the checkpointed "
    "file-stream (streaming/filesync.py — the reference's Drive "
    "modified-since sync, confessional_extract.py:133-193): sync 3 "
    "files, land 2 more, re-sync — the second pass must process ONLY "
    "the new arrivals (checkpoint file-index, no mtime bookkeeping).  "
    "SCALE-TRUE shape: each micro-batch APPENDS to a parquet sink on "
    "the executors and the query returns the sink read back — no "
    "rows ever cross to the driver inside foreachBatch (the r5 "
    "version collect()ed each batch; VERDICT r05 next-round #5)",
    oracle="""
SELECT * FROM (VALUES
  (1, 'a', 10), (1, 'b', 20), (1, 'c', 30),
  (2, 'd', 40), (2, 'e', 50)
) AS t(sync_phase, doc, val)
""",
)
def filesync_modified_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import shutil
    import uuid

    from ..streaming.filesync import incremental_file_sync

    base = os.path.join(
        tempfile.gettempdir(), f"sps_filesync_{uuid.uuid4().hex[:8]}"
    )
    src, ckpt, sink = (
        os.path.join(base, "src"),
        os.path.join(base, "ckpt"),
        os.path.join(base, "sink"),
    )
    os.makedirs(src)

    def land(name: str, val: int) -> None:
        with open(os.path.join(src, f"{name}.json"), "w") as f:
            json.dump({"doc": name, "val": val}, f)

    phase = [1]

    def record(batch_df: DataFrame, _batch_id: int) -> None:
        # distributed batch -> sink append; nothing reaches the driver
        batch_df.select(
            F.lit(phase[0]).alias("sync_phase"), "doc", "val"
        ).write.mode("append").parquet(sink)

    try:
        for name, val in (("a", 10), ("b", 20), ("c", 30)):
            land(name, val)
        incremental_file_sync(spark, src, ckpt, "doc string, val int", record)
        phase[0] = 2
        for name, val in (("d", 40), ("e", 50)):
            land(name, val)
        incremental_file_sync(spark, src, ckpt, "doc string, val int", record)
        # pin the result off the temp files so the fixture can be
        # removed before the caller consumes the DataFrame
        return spark.read.parquet(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- A: native splittable text formats (CSV / JSONL) ------------------------


@register(
    "csv_scan_typed",
    doc="native CSV scan with an EXPLICIT schema, quoted/escaped "
    "fields and a malformed-row DROPMALFORMED policy — schema "
    "inference would read the whole dataset twice at 100 TB, so it is "
    "off; CSV splits by byte range, one task per split",
    oracle="""
SELECT * FROM (VALUES
  (1, 'Alice, Jr.',  CAST(10.50 AS DOUBLE), '2001-05-17'),
  (2, 'Bob "B" Ng',  CAST(-3.25 AS DOUBLE), '1999-12-31'),
  (4, 'Dana',        CAST(NULL AS DOUBLE),  '2020-02-29')
) AS t(id, name, score, joined)
""",
)
def csv_scan_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixture_dir("csv")
    path = os.path.join(d, "people.csv")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                'id,name,score,joined\n'
                '1,"Alice, Jr.",10.50,2001-05-17\n'
                '2,"Bob ""B"" Ng",-3.25,1999-12-31\n'
                'not-an-int,Mallory,zzz,bad-row\n'
                '4,Dana,,2020-02-29\n'
            )
    return (
        spark.read.schema("id int, name string, score double, joined string")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        # RFC-4180 doubled-quote escaping: Spark's default escape is
        # backslash, so '""' inside a quoted field needs escape='"'
        .option("escape", '"')
        .csv(d)
    )


@register(
    "jsonl_scan",
    doc="native JSON-lines scan with an explicit schema including a "
    "nested struct and an array — nested fields project straight out "
    "of the scan (no UDF re-parse); inference off as with CSV",
    oracle="""
SELECT * FROM (VALUES
  (101, 'es', CAST(2 AS BIGINT),  'w1',  CAST(7   AS BIGINT)),
  (102, 'en', CAST(0 AS BIGINT),  NULL,  CAST(NULL AS BIGINT)),
  (103, NULL, CAST(1 AS BIGINT),  'solo', CAST(-4 AS BIGINT))
) AS t(rec_id, lang, n_tags, first_tag, depth)
""",
)
def jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixture_dir("jsonl")
    path = os.path.join(d, "records.jsonl")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                '{"rec_id": 101, "meta": {"lang": "es", "depth": 7}, "tags": ["w1", "w2"]}\n'
                '{"rec_id": 102, "meta": {"lang": "en"}, "tags": []}\n'
                '{"rec_id": 103, "meta": {"depth": -4}, "tags": ["solo"]}\n'
            )
    df = (
        spark.read.schema(
            "rec_id bigint, meta struct<lang: string, depth: bigint>, "
            "tags array<string>"
        )
        .json(d)
    )
    return df.select(
        F.col("rec_id").cast("int").alias("rec_id"),
        F.col("meta.lang").alias("lang"),
        F.size("tags").cast("bigint").alias("n_tags"),
        F.try_element_at("tags", F.lit(1)).alias("first_tag"),
        F.col("meta.depth").alias("depth"),
    )
