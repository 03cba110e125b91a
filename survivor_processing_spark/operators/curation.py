"""Training-data curation operators: rule-based quality filtering,
deterministic stratified sampling, token-budget sequence packing, and
PII redaction.

These are the corpus-curation steps a 100 TB pretraining pipeline
runs between ingestion and tokenization (the public C4 / Gopher
cleaning recipes describe the rule families).  Everything is pure SQL
expressions — whole-stage codegen, no Python, no shuffle except where
the semantics demand one (packing's per-stratum cumulative sum).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.textstats import quality_score_exprs, token_count_expr


def quality_rules(text_col: Column) -> dict[str, Column]:
    """Named boolean pass/fail rules over one document (C4/Gopher-style
    heuristics re-expressed as codegen-able SQL).  True = keep."""
    ex = quality_score_exprs(text_col)
    return {
        # Gopher: docs outside [min, max] token bounds are boilerplate
        # or truncation artifacts
        "len_ok": (ex["n_tokens"] >= 10) & (ex["n_tokens"] <= 100000),
        # C4: pages with low alphabetic content are nav/markup debris
        "alpha_ok": ex["alpha_ratio"] >= 0.6,
        # Gopher: mean word length outside [3, 10] indicates non-prose
        "word_len_ok": (ex["avg_token_len"] >= 3.0)
        & (ex["avg_token_len"] <= 12.0),
        # Gopher: prose carries function words; their absence flags
        # tables/code/gibberish
        "stopword_ok": ex["stopword_ratio"] > 0.0,
    }


def quality_filter(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Apply the rule chain; emit per-rule flags, the overall verdict,
    and the FIRST failing rule name (deterministic rule order) so
    rejects are auditable.  One projection — no shuffle; at 100 TB
    this is a map-only pass fused into the scan."""
    rules = quality_rules(F.col(text_col))
    keep = None
    reason = F.lit(None).cast("string")
    for name, ok in reversed(list(rules.items())):
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    for ok in rules.values():
        keep = ok if keep is None else (keep & ok)
    return df.select(
        F.col(id_col),
        *[ok.alias(name) for name, ok in rules.items()],
        keep.alias("keep"),
        reason.alias("reject_reason"),
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    hash_expr: Column | None = None,
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling for training-mix
    construction: keep a row iff ``hash(id) mod resolution <
    rate[stratum] * resolution``.

    Hash-based (not ``rand()``) so the sample is REPRODUCIBLE across
    runs, retries, and engines, and a document's fate is independent
    of partitioning — the properties a dataset card needs.  Map-only:
    the decision is a projection, no shuffle, and Catalyst can push
    the stratum filter to the scan.  ``hash_expr`` defaults to
    ``xxhash64(id)`` (the scale path); pass a portable expression
    (e.g. a multiplicative integer hash) when the sample must be
    reproducible outside Spark."""
    h = hash_expr if hash_expr is not None else F.xxhash64(F.col(id_col))
    bucket = F.pmod(h, F.lit(resolution))
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(
            rate
        )
    return df.withColumn("_bucket", bucket).filter(
        F.col("_bucket") < rate * resolution
    ).drop("_bucket")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    by: list[str] | None = None,
    order_by: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs:
    deterministic contiguous packing — order documents (within the
    ``by`` strata) and cut a new pack whenever the cumulative token
    count crosses the budget.  A document goes to the pack where its
    FIRST token lands, so packs may overrun by < max-doc-tokens
    (standard concat-then-chunk pretraining semantics; no document
    reordering, no bin-packing nondeterminism).

    Emits (id, n_tokens, pack_id, pack_offset).  One shuffle on the
    strata keys.  Packing REQUIRES a total order within each stratum,
    so like the as-of union strategy an empty ``by`` would be one
    global-sort task: strata (source/domain/shard — packs rarely mix
    sources anyway) are mandatory; for a truly global pack, pre-shard
    the corpus into synthetic strata and pack per shard."""
    by = by or []
    if not by:
        raise ValueError(
            "pack_sequences requires `by` strata: un-keyed packing is one "
            "global-sort task at scale — shard first (e.g. by source or a "
            "hash-derived shard column), then pack per shard"
        )
    order = order_by or id_col
    ntok = token_count_expr(F.col(text_col))
    w = (
        Window.partitionBy(*by)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.select(
        *[F.col(c) for c in by],
        F.col(id_col),
        ntok.cast("bigint").alias("n_tokens"),
        F.sum(ntok.cast("bigint")).over(w).alias("_cum"),
    )
    start = F.col("_cum") - F.col("n_tokens")
    return out.select(
        *by,
        id_col,
        "n_tokens",
        F.floor(start / budget).cast("bigint").alias("pack_id"),
        (start - F.floor(start / budget) * budget).cast("bigint").alias(
            "pack_offset"
        ),
    )


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    ``n``-grams of the normalized text:

    * ``top_ngram_char_frac`` — characters covered by the single most
      frequent n-gram (count x gram length) / normalized doc chars;
    * ``dup_ngram_char_frac`` — characters covered by ALL n-grams
      occurring more than once, overlap-ignoring (the standard
      published approximation — adjacent duplicate grams double-count
      shared words, so the value may exceed 1).

    Docs with fewer than ``n`` words emit 0.0 for both (strict n-gram
    semantics).  Fractions are a single integer-ratio double division
    so both engines produce bit-identical values.

    Scale shape: two aggregates on doc-local keys — (doc, gram) then
    doc — both map-side combinable; no joins, no windows, no Python.
    The gram key inherits the document's distribution, so there is no
    global hot key even on boilerplate-heavy corpora."""
    from .dedup import ngrams_from_words, normalize_text, spread

    # spread: normalize+split must not single-task on a single-row-
    # group input (no-op at scale — see dedup.spread)
    norm = spread(df).select(
        F.col(id_col).alias("_id"),
        F.length(normalize_text(F.col(text_col))).cast("bigint").alias("n_chars"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    grams = norm.select(
        "_id",
        "n_chars",
        F.explode_outer(ngrams_from_words("_w", n)).alias("_g"),
    )
    counts = grams.groupBy("_id", "n_chars", "_g").agg(
        F.count("*").alias("_cnt")
    )
    covered = F.col("_cnt") * F.length("_g")
    return (
        counts.groupBy("_id", "n_chars")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("_g").isNotNull(), covered)), F.lit(0)
            ).alias("_top"),
            F.coalesce(
                F.sum(F.when(F.col("_cnt") >= 2, covered)), F.lit(0)
            ).alias("_dup"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_chars",
            (F.col("_top") * 1.0 / F.col("n_chars")).alias(
                "top_ngram_char_frac"
            ),
            (F.col("_dup") * 1.0 / F.col("n_chars")).alias(
                "dup_ngram_char_frac"
            ),
        )
    )


# Portable, engine-agnostic PII patterns (common RE2/Java/PCRE subset;
# at 100 TB these run inside codegen'd regexp_replace over the scan).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{4,10}"


def redact_pii(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Scrub emails and international-format phone numbers with typed
    placeholder tokens (the pretraining convention: redact, don't
    drop, so surrounding context stays trainable).  Map-only
    projection; order matters (emails first, so a phone-like digit
    run inside a local-part is not half-replaced)."""
    out = out_col or text_col
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.withColumn(out, redacted)


def weighted_sample_k(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    resolution: int = 1_000_000,
    key_decimals: int = 12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per key group — the
    Efraimidis–Spirakis A-ES scheme: draw u ~ U(0,1) per row, rank by
    ``-ln(u)/weight`` ascending and keep the k smallest (equivalent
    to keeping the k largest u^(1/w)).  Heavier rows win
    proportionally more often, each row at most once.

    u comes from a portable multiplicative integer hash of the id
    (reproducible across runs/engines — same contract as
    ``stratified_hash_sample``), offset by +0.5 so u is never 0.
    The raw key is a transcendental double (Java Math.log vs libm log
    can differ by ulps), so it is rounded to ``key_decimals`` places
    and ranked as a DECIMAL — the repo's integer-keyed/order-safe
    ranking convention — with the id as tiebreak; an engine pair that
    disagrees at the 1e-12 level can no longer flip a rank-k boundary.
    Ranking rides the skew-proof two-stage salted top-k, so one huge
    stratum cannot pin a task.  The decision column is a plain
    projection — the only shuffles are the top-k's two bounded
    window stages."""
    from .skew import top_k_per_group

    u = (
        F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(resolution))
        + F.lit(0.5)
    ) / F.lit(float(resolution))
    key = F.round(-F.log(u) / F.col(weight_col), key_decimals).cast(
        "decimal(24,12)"
    )
    ranked = df.withColumn("_aes_key", key)
    out = top_k_per_group(
        ranked,
        keys=keys,
        order_cols=[F.col("_aes_key").asc(), F.col(id_col).asc()],
        k=k,
        salt_on=[id_col],
    )
    return out.drop("_aes_key")


def stratified_exact_split(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    weights: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """EXACT-proportion train/val/test assignment per stratum — the
    controlled sibling of the hash split (q:dataset_split_hash): a
    hash split's per-stratum proportions drift by O(1/sqrt(n)) and a
    10-doc language can land 0 validation docs, while a dataset card
    promising "80/10/10 per language" needs the counts exact.

    Rows are ranked inside each stratum by (md5(id), id) — a
    deterministic, engine-portable shuffle — and split at exact
    integer cut points: rank r goes to the FIRST split j with
    ``r * W_total <= n * cum_W_j`` (all bigint arithmetic, no
    floats), so split sizes are floor(n * w/W) with the leftover
    fractional rows flowing to the later splits in ``weights``
    order, and the union is always the whole stratum.  Adds a
    ``split`` column; ``weights`` defaults to
    [(train, 8), (val, 1), (test, 1)].

    One window shuffle on the strata. A pretraining-scale stratum
    (one language = billions of rows) makes per-stratum ROW_NUMBER a
    hot single task — exactness fundamentally needs a per-stratum
    total order, so at 100 TB either (a) sub-stratify by a
    hash-prefix byte (256 sub-strata per language, each exactly
    split — proportions exact per sub-stratum, hence per stratum)
    or (b) fall back to the map-only hash split where O(1/sqrt(n))
    drift is acceptable.  Small/medium strata (domains, sources,
    label classes) run as-is."""
    if weights is None:
        weights = [("train", 8), ("val", 1), ("test", 1)]
    if not weights or any(w <= 0 or int(w) != w for _, w in weights):
        raise ValueError(f"weights must be positive ints: {weights}")
    total = sum(w for _, w in weights)
    w_strata = Window.partitionBy(*strata_cols)
    rank = F.row_number().over(
        w_strata.orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    n = F.count(F.lit(1)).over(w_strata)
    expr = None
    cum = 0
    for name, w in weights[:-1]:
        cum += w
        cond = rank.cast("bigint") * total <= n.cast("bigint") * cum
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    last = weights[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def stratified_exact_split_oracle(
    strata_cols: list[str],
    id_col: str = "doc_id",
    weights: list[tuple[str, int]] | None = None,
    table: str = "documents",
    agg: str = "COUNT(*) AS n_docs",
) -> str:
    """Mechanically generate the DuckDB replay of
    :func:`stratified_exact_split`, aggregated per (strata, split)
    with ``agg`` (exact counts are the property the gate checks)."""
    if weights is None:
        weights = [("train", 8), ("val", 1), ("test", 1)]
    total = sum(w for _, w in weights)
    strata = ", ".join(strata_cols)
    cases, cum = [], 0
    for name, w in weights[:-1]:
        cum += w
        cases.append(
            f"WHEN r * {total} <= n * {cum} THEN '{name}'"
        )
    case = (
        "CASE " + " ".join(cases) + f" ELSE '{weights[-1][0]}' END"
        if cases
        else f"'{weights[-1][0]}'"
    )
    return f"""
WITH ranked AS (
    SELECT {strata}, {id_col},
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {strata}
               ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
           ) AS BIGINT) AS r,
           CAST(COUNT(*) OVER (PARTITION BY {strata}) AS BIGINT) AS n
    FROM {table}
)
SELECT {strata}, {case} AS split, {agg}
FROM ranked
GROUP BY {strata}, split
"""


def ngram_coverage_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_ref_count: int = 2,
) -> DataFrame:
    """Corpus-distribution quality signal: what fraction of a
    document's word ``n``-grams occur at least ``min_ref_count``
    times corpus-wide?  The model-free form of the CCNet/KenLM
    perplexity filter — a document whose bigrams the corpus has
    never seen twice is gibberish, OCR noise, or severely
    out-of-distribution, and no rule-based score
    (q:text_quality_scores) or intra-document repetition metric
    (q:repetition_stats) detects that.  Exact integer outputs
    (``n_grams``, ``n_covered``) so the score is engine-portable;
    divide downstream for the ratio.

    Plan shape (r13: ONE tokenize pass — the join-back form
    re-tokenized the corpus once per branch, the same redundant-scan
    class commit 19ac5c4 removed from the other text statistics):
    one explode pass builds per-(doc, gram) multiplicities
    (map-side-combined ``groupBy``, so repeated grams collapse
    before the exchange); the corpus-wide reference count is a
    window ``sum`` over the gram partitioning of that combined
    stream; the per-document rollup is one more combined aggregate.
    No join carries the raw gram stream.  Documents shorter than
    ``n`` words emit zeros (strict n-grams,
    dedup.ngrams_from_words semantics)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_ref_count < 1:
        raise ValueError(
            f"min_ref_count must be >= 1, got {min_ref_count}"
        )
    from .dedup import ngrams_from_words, spread, tokens_expr

    # spread: one-row-group inputs would single-task the tokenize
    # (no-op at scale — see dedup.spread)
    grams = (
        spread(df).select(
            F.col(id_col).alias("doc_id"),
            tokens_expr(text_col).alias("words"),
        )
        .select(
            "doc_id",
            F.explode(ngrams_from_words("words", n)).alias("gram"),
        )
    )
    per_pair = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # corpus-wide occurrence count of the gram (multiplicity
    # included, exactly the old groupBy(gram) count) as a window sum
    # so the combined stream is consumed once instead of feeding two
    # recomputed join branches
    rc = F.sum("_cnt").over(Window.partitionBy("gram"))
    per_doc = (
        per_pair.withColumn("_rc", rc)
        .groupBy("doc_id")
        .agg(
            F.sum("_cnt").alias("n_grams"),
            F.sum(
                F.when(F.col("_rc") >= min_ref_count, F.col("_cnt"))
            ).alias("n_covered"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_covered", F.lit(0))
            .cast("bigint")
            .alias("n_covered"),
        )
    )


def ngram_coverage_oracle(
    n: int = 2,
    min_ref_count: int = 2,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mechanically generate the DuckDB replay of
    :func:`ngram_coverage_score` from the same parameters."""
    return f"""
WITH w AS (
    SELECT {id_col} AS doc_id,
           string_split(regexp_replace(lower(trim({text_col})),
                                       '\\s+', ' ', 'g'), ' ') AS words
    FROM {table}
), g AS (
    SELECT doc_id, array_to_string(words[i:i+{n - 1}], ' ') AS gram
    FROM w, LATERAL (
        SELECT unnest(generate_series(1, len(words) - {n - 1})) AS i
    )
    WHERE len(words) >= {n}
), known AS (
    SELECT gram FROM g GROUP BY gram
    HAVING COUNT(*) >= {int(min_ref_count)}
), per_doc AS (
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(k.gram) AS BIGINT) AS n_covered
    FROM g LEFT JOIN known k ON k.gram = g.gram
    GROUP BY g.doc_id
)
SELECT d.{id_col} AS doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_covered, 0) AS n_covered
FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.{id_col}
"""


def winsorize_group_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo: tuple[int, int] = (5, 100),
    p_hi: tuple[int, int] = (95, 100),
) -> DataFrame:
    """Winsorized robust statistics per group — the outlier-clipping
    quality signal (a handful of 10 MB documents or pathological
    token counts should not own a domain's mean in a mixture
    planner).  NULL values are excluded before ranking.

    Exactness: percentiles are rational (num, den) pairs evaluated
    with the nearest-rank definition in pure BIGINT arithmetic —
    idx = max(1, ceil(p·n)) = (p_num·n + p_den − 1) DIV p_den — on
    integer-lane values (quantize floats upstream with one
    deterministic cast), so bounds, clip counts, and the winsorized
    sum are exact and engine-portable; tie order between equal
    values cannot change any output (the idx-th smallest VALUE of a
    multiset is tie-invariant).

    Scale shape: ONE shuffle on ``group_cols`` — the ranking window,
    the full-frame bound extraction, and the final aggregate all
    share the same partitioning, and each group is independent.  A
    pretraining-scale group (billions of rows) makes the per-group
    total order a hot task — same fundamental bound as
    :func:`stratified_exact_split`, same escape hatches (hash-prefix
    sub-grouping with per-sub-group clipping, or an approximate
    sketch bound via q:sketch_distinct_quantiles' family when
    exactness is negotiable).

    Returns ``group_cols, n, lo_q, hi_q, n_clipped_lo,
    n_clipped_hi, wsum`` (all BIGINT).
    """
    for name, (pn, pd_) in (("p_lo", p_lo), ("p_hi", p_hi)):
        if pd_ <= 0 or pn < 0 or pn > pd_:
            raise ValueError(f"{name} must satisfy 0 <= num/den <= 1: {pn}/{pd_}")
    if p_lo[0] * p_hi[1] > p_hi[0] * p_lo[1]:
        raise ValueError(f"p_lo must be <= p_hi: {p_lo} > {p_hi}")
    v = F.col(value_col)
    rows = df.filter(v.isNotNull())
    w_order = Window.partitionBy(*group_cols).orderBy(value_col)
    w_full = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rn = F.row_number().over(w_order)
    n = F.count(F.lit(1)).over(w_full)
    # `div` is true integer division (Spark's `/` is double and
    # would break exactness on large groups)
    idx = lambda pn, pd_: F.greatest(  # noqa: E731
        F.lit(1).cast("bigint"),
        F.expr(f"(cast({pn} as bigint) * _n + {pd_ - 1}) div {pd_}"),
    )
    flagged = rows.select(
        *group_cols,
        v.alias("_v"),
        rn.alias("_rn"),
        n.alias("_n"),
    ).select(
        *group_cols,
        "_v",
        "_rn",
        "_n",
        idx(*p_lo).alias("_ilo"),
        idx(*p_hi).alias("_ihi"),
    )
    bounded = flagged.select(
        *group_cols,
        "_v",
        "_n",
        F.max(F.when(F.col("_rn") == F.col("_ilo"), F.col("_v"))).over(
            Window.partitionBy(*group_cols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_lo"),
        F.max(F.when(F.col("_rn") == F.col("_ihi"), F.col("_v"))).over(
            Window.partitionBy(*group_cols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_hi"),
    )
    clipped = F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("_v")))
    return bounded.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_lo").alias("lo_q"),
        F.min("_hi").alias("hi_q"),
        F.sum((F.col("_v") < F.col("_lo")).cast("bigint")).alias(
            "n_clipped_lo"
        ),
        F.sum((F.col("_v") > F.col("_hi")).cast("bigint")).alias(
            "n_clipped_hi"
        ),
        F.sum(clipped).alias("wsum"),
    )


def winsorize_oracle(
    group_cols: list[str],
    value_col: str,
    source_sql: str,
    p_lo: tuple[int, int] = (5, 100),
    p_hi: tuple[int, int] = (95, 100),
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`winsorize_group_stats` over ``source_sql`` (a subquery
    producing ``group_cols + [value_col]``)."""
    g = ", ".join(group_cols)
    pln, pld = p_lo
    phn, phd = p_hi
    return f"""WITH src AS ({source_sql}), ranked AS (
    SELECT {g}, {value_col} AS v,
           ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {value_col}) AS rn,
           COUNT(*) OVER (PARTITION BY {g}) AS n
    FROM src WHERE {value_col} IS NOT NULL
), flagged AS (
    SELECT {g}, v, n,
           GREATEST(1, ({pln} * n + {pld - 1}) // {pld}) AS ilo,
           GREATEST(1, ({phn} * n + {phd - 1}) // {phd}) AS ihi,
           rn
    FROM ranked
), bounded AS (
    SELECT {g}, v, n,
           MAX(CASE WHEN rn = ilo THEN v END) OVER (PARTITION BY {g}) AS lo,
           MAX(CASE WHEN rn = ihi THEN v END) OVER (PARTITION BY {g}) AS hi
    FROM flagged
)
SELECT {g},
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(lo) AS BIGINT) AS lo_q,
       CAST(MIN(hi) AS BIGINT) AS hi_q,
       CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       CAST(SUM(GREATEST(lo, LEAST(hi, v))) AS BIGINT) AS wsum
FROM bounded
GROUP BY {g}"""


def mad_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    c: tuple[int, int] = (3, 1),
) -> DataFrame:
    """Median-absolute-deviation outlier statistics per group — the
    robust sibling of :func:`winsorize_group_stats` for heavy-tailed
    quality signals (token counts, fetch latencies, per-domain doc
    lengths), where mean±k·stddev is itself dragged by the outliers
    it should catch.  NULL values are excluded before ranking.

    Exactness: the median is the nearest-rank LOWER median — the
    idx-th smallest value with ``idx = (n+1) DIV 2`` — and the MAD
    is the same rank statistic over ``|v − med|``; the outlier test
    is the cross-multiplied ``d·c_den > c_num·mad`` (strict), so the
    whole computation is BIGINT adds/compares, engine-portable, and
    tie-invariant (the idx-th smallest VALUE of a multiset does not
    depend on tie order).  ``mad = 0`` (over half the group at one
    value) degenerates to flagging every ``d > 0`` — the standard
    convention.

    Scale shape: ONE shuffle on ``group_cols`` — both ranking
    windows and the final aggregate share the hash partitioning
    (Catalyst reuses the exchange; the second window adds a sort,
    not a shuffle).  Same hot-group bound and escape hatches as
    :func:`winsorize_group_stats`.

    Returns ``group_cols, n, med, mad, n_outliers, isum`` — ``isum``
    the sum of inlier values (0 when every row is an outlier).
    """
    cn, cd = c
    if cd <= 0 or cn < 0:
        raise ValueError(f"c must satisfy num >= 0, den > 0: {c}")
    v = F.col(value_col)
    rows = df.filter(v.isNotNull())
    w_v = Window.partitionBy(*group_cols).orderBy(value_col)
    w_full = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rows.select(
        *group_cols,
        v.alias("_v"),
        F.row_number().over(w_v).alias("_rn"),
        F.count(F.lit(1)).over(w_full).alias("_n"),
    ).select(
        *group_cols,
        "_v",
        "_rn",
        "_n",
        F.expr("(_n + 1) div 2").alias("_imed"),
    )
    with_med = ranked.select(
        *group_cols,
        "_v",
        "_n",
        F.max(F.when(F.col("_rn") == F.col("_imed"), F.col("_v")))
        .over(w_full)
        .alias("_med"),
    ).select(
        *group_cols,
        "_v",
        "_n",
        "_med",
        F.abs(F.col("_v") - F.col("_med")).alias("_d"),
    )
    w_d = Window.partitionBy(*group_cols).orderBy("_d")
    with_mad = with_med.select(
        *group_cols,
        "_v",
        "_med",
        "_d",
        F.max(
            F.when(
                F.row_number().over(w_d) == F.expr("(_n + 1) div 2"),
                F.col("_d"),
            )
        )
        .over(w_full)
        .alias("_mad"),
    )
    is_out = F.expr(f"_d * {int(cd)} > {int(cn)} * _mad")
    return with_mad.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_med").alias("med"),
        F.min("_mad").alias("mad"),
        F.sum(is_out.cast("bigint")).alias("n_outliers"),
        F.coalesce(
            F.sum(F.when(~is_out, F.col("_v"))), F.lit(0).cast("bigint")
        ).alias("isum"),
    )


def mad_outlier_oracle(
    group_cols: list[str],
    value_col: str,
    source_sql: str,
    c: tuple[int, int] = (3, 1),
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`mad_outlier_stats` over ``source_sql`` (a subquery
    producing ``group_cols + [value_col]``)."""
    g = ", ".join(group_cols)
    cn, cd = c
    return f"""WITH src AS ({source_sql}), ranked AS (
    SELECT {g}, {value_col} AS v,
           ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {value_col}) AS rn,
           COUNT(*) OVER (PARTITION BY {g}) AS n
    FROM src WHERE {value_col} IS NOT NULL
), with_med AS (
    SELECT {g}, v, n,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN v END)
               OVER (PARTITION BY {g}) AS med
    FROM ranked
), devs AS (
    SELECT {g}, v, n, med, ABS(v - med) AS d,
           ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY ABS(v - med)) AS rnd
    FROM with_med
), with_mad AS (
    SELECT {g}, v, med, d,
           MAX(CASE WHEN rnd = (n + 1) // 2 THEN d END)
               OVER (PARTITION BY {g}) AS mad
    FROM devs
)
SELECT {g},
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(med) AS BIGINT) AS med,
       CAST(MIN(mad) AS BIGINT) AS mad,
       CAST(SUM(CASE WHEN d * {int(cd)} > {int(cn)} * mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COALESCE(SUM(CASE WHEN NOT (d * {int(cd)} > {int(cn)} * mad)
                     THEN v END), 0) AS BIGINT) AS isum
FROM with_mad
GROUP BY {g}"""


def k_anonymity_suppress(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Row-level k-anonymity suppression: keep only rows whose
    quasi-identifier combination (``quasi_cols``) appears in at
    least ``k`` rows — the release-gate a training-data pipeline
    applies before publishing user-derived tables (a unique
    (zip, age, source) combination re-identifies; a k-sized crowd
    does not).  Complements the pattern-based PII redaction family
    (q:pii_redact): redaction hides VALUES, suppression hides
    MEMBERSHIP.

    Scale shape: ONE shuffle on the quasi-identifier key (a window
    COUNT over it), filter, done — no second pass, no driver
    traffic; suppression is exact, not sampled.  Skewed
    quasi-groups are harmless (the window only counts).

    Returns the input rows (original schema) that survive.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("_qn", F.count(F.lit(1)).over(w))
        .filter(F.col("_qn") >= k)
        .drop("_qn")
    )


def k_anonymity_stats(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Release-audit summary for :func:`k_anonymity_suppress`: ONE
    row — ``n_groups, n_groups_suppressed, n_rows_kept,
    n_rows_suppressed`` (all BIGINT).  Same single shuffle, then an
    aggregate over the group-sized table."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    kept = F.col("_n") >= k
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((~kept).cast("bigint")).alias("n_groups_suppressed"),
        F.sum(F.when(kept, F.col("_n")).otherwise(F.lit(0))).alias(
            "n_rows_kept"
        ),
        F.sum(F.when(~kept, F.col("_n")).otherwise(F.lit(0))).alias(
            "n_rows_suppressed"
        ),
    )


def k_anonymity_oracle(
    quasi_cols: list[str], k: int, source_sql: str
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`k_anonymity_stats` over ``source_sql``."""
    g = ", ".join(quasi_cols)
    return f"""WITH src AS ({source_sql}), groups AS (
    SELECT {g}, COUNT(*) AS n FROM src GROUP BY {g}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < {int(k)} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_suppressed,
       CAST(SUM(CASE WHEN n >= {int(k)} THEN n ELSE 0 END) AS BIGINT)
           AS n_rows_kept,
       CAST(SUM(CASE WHEN n < {int(k)} THEN n ELSE 0 END) AS BIGINT)
           AS n_rows_suppressed
FROM groups"""
