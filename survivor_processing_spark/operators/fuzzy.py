"""Scalable fuzzy (edit-distance) matching via symmetric-delete
blocking — the set-similarity-join shape of the reference's name
reconciliation.

The reference fixes misspelled contestant names through a hand-built
1,272-entry YAML map plus a fallback fuzzy-match cascade
(reference: data/interim/truedorks_contestant_namemap.yaml;
helpers/matching via get_close_matches).  ``difflib`` over all pairs
is O(n²) per lookup; at corpus scale the standard trick is
symmetric-delete blocking (SymSpell / FastSS family): two strings
within edit distance *d* necessarily share a member of each other's
depth-*d* deletion neighborhoods (self ∪ deletions of up to d
chars), so an equi-join on deletion variants yields a complete
candidate set, then an exact ``levenshtein`` verifies.

Scale shape: explode factor is O(len) for d=1 and O(len²/2) for d=2
(bounded by string length — names/titles, not documents); the join is
a plain hash equi-join on the variant string (shuffle carries
variants once, not pairs), verification is JVM ``levenshtein`` on
candidates only.  Recall is 100% by construction for the supported
depths (the guarantee is depth-specific — a single deletion round is
complete ONLY for distance ≤ 1, which is why ``max_dist`` is
validated rather than trusted).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _one_char_deletions(s: Column) -> Column:
    """Array of every one-char-deletion of ``s`` (JVM-side sequence +
    transform — no Python, no UDF)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )


def deletion_variants(col: str | Column, max_dist: int = 1) -> Column:
    """Array column: the string itself plus every deletion of up to
    ``max_dist`` chars (depth-``max_dist`` deletion neighborhood).

    max_dist=1 → O(len) variants; max_dist=2 → O(len²/2) variants
    (the second round maps :func:`_one_char_deletions` over the first
    round's array and flattens — still pure JVM higher-order
    functions).  Depths beyond 2 explode combinatorially and are not
    supported.
    """
    if max_dist not in (1, 2):
        raise ValueError(
            f"deletion_variants supports max_dist in (1, 2), got {max_dist}"
        )
    c = F.col(col) if isinstance(col, str) else col
    d1 = F.array_union(F.array(c), _one_char_deletions(c))
    if max_dist == 1:
        return d1
    return F.array_distinct(
        F.flatten(
            F.transform(
                d1, lambda s: F.array_union(F.array(s), _one_char_deletions(s))
            )
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein`` ≤ ``max_dist``
    (``max_dist`` ∈ {1, 2}; blocking recall is guaranteed-complete at
    the matching deletion depth).

    Both sides explode to depth-``max_dist`` deletion variants,
    candidates come from ONE hash equi-join on the variant, duplicates
    collapse with a pair-level ``dropDuplicates`` after the verify
    filter.
    """
    if max_dist not in (1, 2):
        # single-round blocking silently under-returns for dist 2
        # (pairs may share no single-deletion variant), so reject
        # instead of returning an incomplete answer
        raise ValueError(f"fuzzy_join supports max_dist in (1, 2), got {max_dist}")
    # spread() first: a single-row-group parquet side would otherwise
    # run its whole variant explode on one core (see dedup.spread).
    from .dedup import spread

    lv = spread(left).withColumn(
        "_var", F.explode(deletion_variants(left_col, max_dist))
    )
    rv = spread(right).withColumn(
        "_var", F.explode(deletion_variants(right_col, max_dist))
    )
    cand = lv.join(rv, "_var").drop("_var")
    # verify BEFORE deduplicating: levenshtein on a candidate is a
    # cheap codegen'd kernel, and filtering first shrinks the distinct
    # shuffle to true matches (candidates carry multi-variant dupes).
    # The threshold arg switches Spark to the banded O(len·d) kernel
    # with early exit (returns -1 past the threshold) — candidates on
    # adversarial corpora (shared-prefix names) are verify-bound, and
    # the band cut the dist-2 query ~2x at sf0.1.
    return (
        cand.withColumn(
            "dist",
            F.levenshtein(F.col(left_col), F.col(right_col), max_dist),
        )
        .filter(F.col("dist") >= 0)
        .dropDuplicates(left.columns + right.columns)
    )


def fuzzy_join_dist1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Distance-1 entry point (kept for callers); rejects
    ``max_dist > 1`` — use :func:`fuzzy_join` for distance 2."""
    if max_dist > 1:
        raise ValueError(
            "fuzzy_join_dist1 is complete only for max_dist <= 1; "
            "call fuzzy_join(..., max_dist=2) for the two-round variant"
        )
    return fuzzy_join(left, right, left_col, right_col, max_dist)
