"""Scalable fuzzy (edit-distance) matching via symmetric-delete
blocking — the set-similarity-join shape of the reference's name
reconciliation.

The reference fixes misspelled contestant names through a hand-built
1,272-entry YAML map plus a fallback fuzzy-match cascade
(reference: data/interim/truedorks_contestant_namemap.yaml;
helpers/matching via get_close_matches).  ``difflib`` over all pairs
is O(n²) per lookup; at corpus scale the standard trick is
symmetric-delete blocking (SymSpell / FastSS family): two strings
within edit distance 1 necessarily share a member of each other's
{self} ∪ {one-char-deletions} set, so an equi-join on deletion
variants yields a complete candidate set whose size is
O(n · avg_len), then an exact ``levenshtein`` verifies.

Scale shape: explode factor = string length (bounded), the join is a
plain hash equi-join on the variant string (shuffle carries variants
once, not pairs), verification is JVM ``levenshtein`` on candidates
only.  100% recall for distance ≤ 1 by construction; distance ≤ 2
uses two-round deletions (apply ``deletion_variants`` twice).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def deletion_variants(col: str):
    """Array column: the string itself plus every one-char-deletion,
    built JVM-side (sequence + transform — no Python, no UDF)."""
    c = F.col(col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substring(c, F.lit(1), i - 1),
            c.substr(i + 1, F.length(c)),
        ),
    )
    return F.array_union(F.array(c), deletions)


def fuzzy_join_dist1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein`` ≤ ``max_dist``
    (≤ 1 guaranteed-complete; the blocking is exact for one edit).

    Both sides explode to deletion variants, candidates come from
    ONE hash equi-join on the variant, duplicates collapse with a
    pair-level ``dropDuplicates`` before the verify filter.
    """
    lv = left.withColumn("_var", F.explode(deletion_variants(left_col)))
    rv = right.withColumn("_var", F.explode(deletion_variants(right_col)))
    cand = lv.join(rv, "_var").drop("_var")
    # verify BEFORE deduplicating: levenshtein on a candidate is a
    # cheap codegen'd kernel, and filtering first shrinks the distinct
    # shuffle to true matches (candidates carry multi-variant dupes)
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col(left_col), F.col(right_col))
        )
        .filter(F.col("dist") <= max_dist)
        .dropDuplicates(left.columns + right.columns)
    )
