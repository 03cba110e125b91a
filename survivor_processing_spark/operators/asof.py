"""As-of (nearest-preceding) and containment joins.

The reference enriches an event stream with the most recent season /
episode air time via ``pd.merge_asof`` (reference:
reddit_transform.py:12-25 ``process_nearest_event``) and NULLs the
match outside the season window (reddit_transform.py:28-34
``process_within_season``).  Spark has no DataFrame as-of join, so the
engine provides two physical strategies:

* ``strategy='broadcast'`` (default; right side is a dimension):
  rewrite the right side into half-open intervals ``[ts, next_ts)``
  with a lead() window, then *band* the intervals — explode each into
  the fixed-width time buckets it overlaps — so the join has an
  equi-key (band id) and runs as a BroadcastHashJoin, not a
  BroadcastNestedLoopJoin.  Each fact row probes only the intervals
  sharing its bucket (~O(1)) instead of scanning the whole dimension.
  The open last interval per group joins separately (one row per
  group).  NO shuffle and no scan of the left (fact) side: at 100 TB
  this is a map-side operation; the only action at plan-build time is
  a min/max/count over the (small, broadcastable) dimension to size
  the bands.
* ``strategy='union'`` (both sides large, keyed): tag and union both
  sides, then ``last(right_col, ignorenulls=True)`` over a window
  ordered by (ts, tag) partitioned by the join keys — one shuffle on
  the keys, no cartesian anywhere.  Right rows sort before left rows
  at equal timestamps, so exact ties match (merge_asof
  ``allow_exact_matches=True`` semantics).

Both strategies return every left row exactly once (left-outer
semantics; unmatched → NULL right columns), matching
``pd.merge_asof(direction='backward')`` and DuckDB ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str] | None = None,
    strategy: str = "broadcast",
    direction: str = "backward",
    allow_unkeyed_union: bool = False,
) -> DataFrame:
    """As-of join: for each left row, attach the nearest right row —
    ``direction='backward'`` (default): greatest ``right_on`` <=
    ``left_on``; ``direction='forward'``: smallest ``right_on`` >=
    ``left_on`` (both within ``by`` keys if given, exact matches
    included, matching ``pd.merge_asof`` / DuckDB ASOF).  Right
    columns keep their names; ``right_on`` is kept so callers can
    compute staleness.  Both strategies implement both directions;
    un-keyed calls always take the banded-broadcast path (an un-keyed
    union would be one global-sort task)."""
    by = by or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        if strategy != "broadcast":
            raise ValueError(
                "direction='nearest' is implemented for the broadcast "
                "strategy (midpoint-interval banding); the union strategy "
                "has no single-direction window rewrite for it"
            )
        return _asof_broadcast_nearest(left, right, left_on, right_on, by)
    if strategy == "union" and not by and not allow_unkeyed_union:
        # Un-keyed union degenerates to ONE global Window.orderBy —
        # a single task over left+right, the exact foot-gun SCALE.md
        # forbids.  The banded-broadcast strategy handles the un-keyed
        # case map-side (both directions), so reroute instead of
        # silently single-partitioning.  Pass allow_unkeyed_union=True
        # only when both sides are known-tiny.
        import warnings

        warnings.warn(
            "asof_join(strategy='union') without `by` keys would run as a "
            "single global-sort partition; rerouting to the banded-broadcast "
            "strategy (right side must be dimension-sized). Pass "
            "allow_unkeyed_union=True to force the union path.",
            stacklevel=2,
        )
        strategy = "broadcast"
    if strategy == "broadcast":
        return _asof_broadcast(left, right, left_on, right_on, by, direction)
    if strategy == "union":
        return _asof_union(left, right, left_on, right_on, by, direction)
    raise ValueError(f"unknown strategy {strategy!r}")


def _ordinal(col, dtype):
    """Monotone bigint image of a time-like column, for banding."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, DateType):
        return F.unix_date(col)
    return F.floor(col).cast("bigint")


def _asof_broadcast(left, right, left_on, right_on, by, direction="backward"):
    """Banded-broadcast as-of, both directions.

    backward: right row r owns the half-open interval [r.ts, next.ts)
    plus an open *last* interval [max_ts, +inf) per group.  forward:
    r owns (prev.ts, r.ts] plus an open *first* interval (-inf,
    min_ts].  Either way the intervals tile the line per group, each
    is exploded into the fixed-width ordinal bands it overlaps, and
    the fact side probes by band equality — BroadcastHashJoin, zero
    fact-side shuffle."""
    fwd = direction == "forward"
    rt = right.schema[right_on].dataType
    lt = left.schema[left_on].dataType
    r_ord = _ordinal(F.col(right_on), rt)
    l_ord = _ordinal(F.col(left_on), lt)

    # Band width from dim stats (avg gap) — one tiny job on the small
    # side only; the fact side is never touched at plan-build time.
    lo, hi, n = right.agg(
        F.min(r_ord), F.max(r_ord), F.count(right_on)
    ).first()
    if n == 0:  # empty dim: left rows with NULL payload
        null_right = [
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right.columns
            if c not in by
        ]
        return left.select("*", *null_right)
    width = max(1, (hi - lo) // n)

    # Closed intervals exploded into every band they overlap: per-band
    # probe cost is O(intervals in that band) ~ O(1) with width ~ avg
    # gap (expansion factor ~2 bands/interval).  backward: bound col is
    # the NEXT ts, interval [ts, next); forward: bound is the PREV ts,
    # interval (prev, ts].
    w = Window.partitionBy(*by).orderBy(right_on) if by else Window.orderBy(right_on)
    bound = F.lag(right_on).over(w) if fwd else F.lead(right_on).over(w)
    iv = right.withColumn("_bound_ts", bound)
    if fwd:
        iv = iv.withColumn("_s", _ordinal(F.col("_bound_ts"), rt)).withColumn(
            "_e", r_ord
        )
        # inclusive upper band: t <= ts ⇒ l_ord <= _e
        band_hi = (F.col("_e") / width).cast("bigint")
    else:
        iv = iv.withColumn("_s", r_ord).withColumn(
            "_e", _ordinal(F.col("_bound_ts"), rt)
        )
        # t < next_ts ⇒ l_ord <= _e - 1
        band_hi = ((F.col("_e") - 1) / width).cast("bigint")
    closed = (
        iv.filter(F.col("_s") < F.col("_e"))
        .withColumn(
            "_band",
            F.explode(F.sequence((F.col("_s") / width).cast("bigint"), band_hi)),
        )
        .drop("_e")
    )
    # Open interval per group: exactly one row — last ts (backward:
    # t >= max_ts) or first ts (forward: t <= min_ts).
    rn = F.row_number().over(
        Window.partitionBy(*by).orderBy(
            right_on if fwd else F.desc(right_on)
        )
        if by
        else Window.orderBy(right_on if fwd else F.desc(right_on))
    )
    last = iv.filter(F.col("_bound_ts").isNull()).withColumn("_rn", rn).filter(
        F.col("_rn") == 1
    )

    right_cols = [c for c in right.columns if c not in by]
    # String-qualified aliases: both inputs may derive from the SAME
    # scan (self-as-of), where expr-id qualification is ambiguous.
    lhs = left.withColumn("_lband", (l_ord / width).cast("bigint")).alias("L")
    closed = closed.alias("C")
    last = last.alias("A")

    if fwd:
        c_cond = (
            (F.col("L._lband") == F.col("C._band"))
            & (F.col(f"L.{left_on}") <= F.col(f"C.{right_on}"))
            & (F.col(f"L.{left_on}") > F.col("C._bound_ts"))
        )
    else:
        c_cond = (
            (F.col("L._lband") == F.col("C._band"))
            & (F.col(f"L.{left_on}") >= F.col(f"C.{right_on}"))
            & (F.col(f"L.{left_on}") < F.col("C._bound_ts"))
        )
    for k in by:
        c_cond = c_cond & (F.col(f"L.{k}") == F.col(f"C.{k}"))
    j1 = (
        lhs.join(F.broadcast(closed), c_cond, "left")
        .select(
            *[F.col(f"L.{c}") for c in left.columns],
            *[F.col(f"C.{c}").alias(f"_c_{c}") for c in right_cols],
        )
        .alias("J")
    )

    l_cond = (
        F.col(f"J.{left_on}") <= F.col(f"A.{right_on}")
        if fwd
        else F.col(f"J.{left_on}") >= F.col(f"A.{right_on}")
    )
    for k in by:
        l_cond = l_cond & (F.col(f"J.{k}") == F.col(f"A.{k}"))
    j2 = j1.join(F.broadcast(last), l_cond, "left")
    return j2.select(
        *[F.col(f"J.{c}") for c in left.columns],
        *[
            F.coalesce(F.col(f"J._c_{c}"), F.col(f"A.{c}")).alias(c)
            for c in right_cols
        ],
    )


def _asof_broadcast_nearest(left, right, left_on, right_on, by):
    """Nearest-direction as-of (``pd.merge_asof(direction='nearest')``
    semantics, ties broken backward/earlier): banded-broadcast via
    MIDPOINT interval ownership.

    On the integer ordinal axis (exact for timestamps=µs, dates=days,
    integers; floats floor), right row r_i owns
    ``(m_{i-1}, m_i]`` where ``m_i = (ord_i + ord_{i+1}) div 2`` —
    a left row at exactly m_i is equidistant and the floor division
    hands it to the EARLIER row, so the tie rule is integral to the
    interval algebra, not a post-filter.  First/last rows per group
    own open-ended intervals.  The ownership intervals tile the line
    disjointly, so the plan is the same two-phase shape as the other
    directions: finite intervals explode into bands →
    BroadcastHashJoin; the ≤2 open-ended rows per group join like the
    open-interval row of backward/forward.  Fact side: zero shuffle.
    """
    rt = right.schema[right_on].dataType
    lt = left.schema[left_on].dataType
    r_ord = _ordinal(F.col(right_on), rt)
    l_ord = _ordinal(F.col(left_on), lt)

    # Pre-collapse duplicate (by, right_on) rows to ONE deterministic
    # winner (lexicographically-least payload struct).  Without this a
    # duplicated pair does NOT collapse in the interval algebra: the
    # second copy gets _lo = ord+1 with a non-empty _hi (or an open
    # tail when the duplicates are last in the group), so facts past
    # the duplicated ts would receive the LATER copy's payload —
    # copy-inconsistent when payload columns differ between copies.
    pay_cols = [c for c in right.columns if c not in by and c != right_on]
    if pay_cols:
        right = (
            right.groupBy(*by, right_on)
            .agg(F.min(F.struct(*pay_cols)).alias("_pay"))
            .select(*[
                F.col(f"_pay.{c}").alias(c) if c in pay_cols else F.col(c)
                for c in right.columns
            ])
        )
    else:
        right = right.dropDuplicates([*by, right_on])

    lo, hi, n = right.agg(F.min(r_ord), F.max(r_ord), F.count(right_on)).first()
    if n == 0:
        null_right = [
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right.columns
            if c not in by
        ]
        return left.select("*", *null_right)
    width = max(1, (hi - lo) // n)

    w = Window.partitionBy(*by).orderBy(right_on) if by else Window.orderBy(right_on)
    iv = (
        right.withColumn("_ord", r_ord)
        .withColumn("_prev", F.lag("_ord").over(w))
        .withColumn("_next", F.lead("_ord").over(w))
        .withColumn(
            "_lo",  # (m_{i-1}, ...]  ⇒ lower closed bound m_{i-1}+1
            F.expr("(_prev + _ord) div 2 + 1"),
        )
        .withColumn("_hi", F.expr("(_ord + _next) div 2"))
    )
    # right_on is unique per group after the pre-collapse above, so
    # every finite interval is non-empty; the _lo <= _hi guard stays
    # as a cheap invariant check
    closed = (
        iv.filter(F.col("_lo").isNotNull() & F.col("_hi").isNotNull())
        .filter(F.col("_lo") <= F.col("_hi"))
        .withColumn(
            "_band",
            F.explode(
                F.sequence(
                    (F.col("_lo") / width).cast("bigint"),
                    (F.col("_hi") / width).cast("bigint"),
                )
            ),
        )
    )
    # open-ended rows: first (_prev null → (-inf, _hi]) and last
    # (_next null → [_lo, +inf)); a single-row group is both (matches
    # its whole group).  Empty-ownership duplicates of the first/last
    # ts are excluded the same way as in `closed`.
    open_rows = iv.filter(
        (F.col("_prev").isNull() | F.col("_next").isNull())
        & ~F.coalesce(F.col("_lo") > F.col("_hi"), F.lit(False))
    )

    right_cols = [c for c in right.columns if c not in by]
    lhs = left.withColumn("_lord", l_ord).withColumn(
        "_lband", (l_ord / width).cast("bigint")
    ).alias("L")
    closed = closed.alias("C")
    opens = open_rows.alias("A")

    c_cond = (
        (F.col("L._lband") == F.col("C._band"))
        & (F.col("L._lord") >= F.col("C._lo"))
        & (F.col("L._lord") <= F.col("C._hi"))
    )
    for k in by:
        c_cond = c_cond & (F.col(f"L.{k}") == F.col(f"C.{k}"))
    j1 = (
        lhs.join(F.broadcast(closed), c_cond, "left")
        .select(
            *[F.col(f"L.{c}") for c in left.columns],
            F.col("L._lord").alias("_lord"),
            *[F.col(f"C.{c}").alias(f"_c_{c}") for c in right_cols],
        )
        .alias("J")
    )
    o_cond = (F.col("A._lo").isNull() | (F.col("J._lord") >= F.col("A._lo"))) & (
        F.col("A._hi").isNull() | (F.col("J._lord") <= F.col("A._hi"))
    )
    for k in by:
        o_cond = o_cond & (F.col(f"J.{k}") == F.col(f"A.{k}"))
    j2 = j1.join(F.broadcast(opens), o_cond, "left")
    return j2.select(
        *[F.col(f"J.{c}") for c in left.columns],
        *[
            F.coalesce(F.col(f"J._c_{c}"), F.col(f"A.{c}")).alias(c)
            for c in right_cols
        ],
    )


def _asof_union(left, right, left_on, right_on, by, direction="backward"):
    from pyspark.sql.types import StructType

    right_cols = [c for c in right.columns if c not in by]
    left_cols = left.columns
    # Tag assignment places the right row on the LOOKED-AT side of a
    # left row with the same ts, so exact ties match in both
    # directions.  backward: right rows (tag 0) sort before left rows
    # in the ascending (_ts, _tag) order and last() looks back.
    # forward: right rows (tag 1) sort after left rows ascending — and
    # the fill runs over the REVERSED (_ts desc, _tag desc) order (see
    # the window note below), where they sort BEFORE the left row and
    # last() again looks back.  Either way: ONE shuffle on the
    # by-keys, no cartesian.
    #
    # The right payload travels as ONE struct, filled with a single
    # first/last(ignorenulls): filling each column independently would
    # let a legitimately-NULL payload column backfill from a DIFFERENT
    # (older/newer) right row, emitting a mixed row that never existed.
    # A right row's struct is never NULL (even if every field is), so
    # ignorenulls skips exactly the left rows.
    fwd = direction == "forward"
    l_tag, r_tag = (0, 1) if fwd else (1, 0)
    pay_type = StructType([right.schema[c] for c in right_cols])
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_on).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        F.lit(None).cast(pay_type).alias("_rpay"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
        *[F.col(c) for c in by],
        F.col(right_on).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        F.struct(*right_cols).alias("_rpay"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # BOTH directions run as RUNNING frames (UNBOUNDED PRECEDING →
    # CURRENT ROW): Spark's WindowExec computes a running frame in
    # O(n) per partition, but a (CURRENT ROW → UNBOUNDED FOLLOWING)
    # frame by rescanning to the partition end for every row — O(n²),
    # quadratic ruin on a hot key's timeline at scale (the same
    # landmine operators/timeseries.py interpolate_linear hit).  The
    # forward fill is the backward fill over the REVERSED (_ts, _tag)
    # order: rows after the current one in ascending order are
    # exactly the rows at-or-before it in descending order, and
    # last(ignorenulls) picks the nearest — tie semantics unchanged
    # (at equal ts the right row still sits on the looked-at side of
    # the left row, per the tag assignment above).
    if fwd:
        order = [F.col("_ts").desc(), F.col("_tag").desc()]
    else:
        order = [F.col("_ts").asc(), F.col("_tag").asc()]
    w = (
        Window.partitionBy(*by).orderBy(*order)
        if by
        else Window.orderBy(*order)
    ).rowsBetween(Window.unboundedPreceding, 0)
    filled_pay = F.last("_rpay", ignorenulls=True).over(w)
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("_tag"),
        filled_pay.alias("_rpay"),
    )
    return filled.filter(F.col("_tag") == l_tag).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_rpay.{c}").alias(c) for c in right_cols],
    )


def containment_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    point: str,
    start: str,
    end: str,
    null_out_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join on ``keys`` then NULL the right-side payload where
    ``point`` falls outside ``[start, end]`` — the reference's
    'within season' semantics (reddit_transform.py:28-34): the join
    row is kept, only the payload is blanked (K4 masked update)."""
    joined = left.join(right, keys, "left")
    outside = (F.col(point) < F.col(start)) | (F.col(point) > F.col(end))
    out = joined
    for c in null_out_cols or []:
        out = out.withColumn(c, F.when(outside, F.lit(None)).otherwise(F.col(c)))
    return out
