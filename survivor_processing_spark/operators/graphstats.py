"""Exact per-node triangle counting — the graph-quality companion of
PageRank centrality (operators/pagerank.py) and BFS seed distance
(operators/bfs.py): local clustering (how interlinked a host's
neighborhood is) separates organic link communities from spam farms
and link rings in the public web-curation recipes, and triangle
support is the standard edge-strength signal for community-preserving
graph sparsification.

Algorithm: the degree-ordered node-iterator (Schank & Wagner 2005;
the standard MapReduce formulation in Suri & Vassilvitskii WWW'11):
orient every undirected edge from the endpoint with the SMALLER
(degree, id) rank to the larger; emit wedges only from each edge
pair sharing their lower-rank endpoint; a wedge (v, w) closes into a
triangle iff the oriented edge (v, w) exists.  Every triangle is
counted EXACTLY once (by its lowest-rank vertex), and the oriented
out-degree is bounded by O(√m), so wedge volume is O(m^{3/2}) —
the provably optimal bound for exact counting — instead of the
Θ(Σ deg²) a naive neighbor-pair emission pays on skewed degree
distributions (one celebrity host would otherwise emit deg² wedges).

Everything is BIGINT relational algebra (canonicalize, two grouped
counts, two self-equi-joins), bit-portable by construction;
:func:`triangle_counts_oracle` mechanically replays the same chain.

Scale shape: canonicalize (one distinct — one shuffle), degrees (one
grouped count), orientation (two broadcast-or-shuffle joins of the
node-sized degree table onto edges), wedge join (self-equi-join on
the lower endpoint — the O(m^{3/2}) step, shuffle on node key), and
the closing join (equi-join wedge (v,w) against the oriented edge
set on a composite key).  No driver traffic, no Python, no window
over unbounded neighborhoods.  Per-node attribution explodes each
triangle to its 3 corners — output volume 3·T, grouped immediately
with map-side combine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node exact triangle participation over the UNDIRECTED
    simple graph induced by ``edges`` (direction, parallel edges,
    and self-loops are normalized away).  Returns ``node bigint,
    degree bigint, n_triangles bigint, n_wedges bigint`` — n_wedges
    = deg·(deg−1)/2 so the local clustering coefficient is the
    caller's exact rational n_triangles / n_wedges."""
    # the canonical edge set and the degree table are each consumed
    # by several downstream joins — left lazy, Catalyst re-derives
    # the whole scan+distinct subtree PER CONSUMER (measured 59
    # parquet scans of the edge source in the un-pinned plan).  Pin
    # both once: localCheckpoint here (persist(MEMORY_AND_DISK) on a
    # cluster), the same idiom the PQ/Lloyd operators use.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("a"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    # rank-orient: u -> v iff (deg_u, u) < (deg_v, v); the degree
    # table is node-sized — AQE broadcasts it when it fits
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_degb"))
    # the oriented edge set feeds the wedge join TWICE plus the
    # closing join — pin it too (edge-sized, the O(m) working set)
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("_dega") < F.col("_degb"))
                | ((F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            .alias("_e")
        )
        .select("_e.u", "_e.v")
        .localCheckpoint(eager=True)
    )
    # rank of v for wedge ordering rides along as (deg_v, v)
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("_degv"))
    ov = o.join(dv, "v").select("u", "v", "_degv")
    e1 = ov.select(
        F.col("u"), F.col("v").alias("x"), F.col("_degv").alias("_degx")
    )
    e2 = ov.select(
        F.col("u"), F.col("v").alias("y"), F.col("_degv").alias("_degy")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("_degx") < F.col("_degy"))
        | ((F.col("_degx") == F.col("_degy")) & (F.col("x") < F.col("y")))
    )
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    # ONE pass over the triangle stream: a 3-branch unionAll of
    # `tris` re-derived the whole wedge+closing join chain per
    # branch (tris is lazy and only its INPUTS are checkpointed —
    # the r13 plan showed the SortMergeJoin subtree three times);
    # exploding the corner array emits the same three rows per
    # triangle from a single execution
    corners = (
        tris.select(
            F.explode(F.array("u", "x", "y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(corners, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        F.expr("degree * (degree - 1) DIV 2").alias("n_wedges"),
    )


def triangle_counts_oracle(
    source_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB SQL replaying :func:`triangle_counts` over
    ``source_sql`` — same canonicalization, rank orientation, wedge
    ordering, and per-corner attribution."""
    return f"""WITH raw AS ({source_sql}), e AS (
    SELECT DISTINCT LEAST({src}, {dst}) AS a, GREATEST({src}, {dst}) AS b
    FROM raw WHERE {src} <> {dst}
), deg AS (
    SELECT node, COUNT(*) AS degree FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
    ) GROUP BY node
), o AS (
    SELECT CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                THEN e.a ELSE e.b END AS u,
           CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                THEN e.b ELSE e.a END AS v
    FROM e
    JOIN deg da ON da.node = e.a
    JOIN deg db ON db.node = e.b
), ov AS (
    SELECT o.u, o.v, d.degree AS degv FROM o JOIN deg d ON d.node = o.v
), tri AS (
    SELECT e1.u, e1.v AS x, e2.v AS y
    FROM ov e1
    JOIN ov e2 ON e1.u = e2.u
              AND (e1.degv, e1.v) < (e2.degv, e2.v)
    JOIN o c ON c.u = e1.v AND c.v = e2.v
), corners AS (
    SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT u AS node FROM tri
        UNION ALL SELECT x FROM tri
        UNION ALL SELECT y FROM tri
    ) GROUP BY node
)
SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(d.degree * (d.degree - 1) // 2 AS BIGINT) AS n_wedges
FROM deg d LEFT JOIN corners c ON c.node = d.node"""
