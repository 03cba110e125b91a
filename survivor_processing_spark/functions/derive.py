"""Declarative multi-column derivation API (SURVEY.md §2 M1).

The reference's core public API is ``add_to_df(df, {(out_cols…):
fn, …}, **ctx)`` — an ordered mapping whose functions each produce
one or more named output columns, later entries seeing earlier
outputs (reference helpers/transform_helpers.py:42-54; OrderedDict
call sites e.g. reddit_transform.py:63-74).

Engine form: the same dict-driven surface over Column expressions.
Each function receives the *current* DataFrame and returns a Column
(single output) or an ordered sequence of Columns (tuple output).
Everything lands in one lazy plan — Catalyst sees a single tree, so
chained derivations cost no extra passes.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame


def add_to_df(
    df: DataFrame,
    derivations: Mapping[str | tuple[str, ...], Callable[..., Column | Sequence[Column]]],
    **ctx,
) -> DataFrame:
    """Apply ordered column derivations.

    ``derivations`` maps an output column name (or tuple of names)
    to ``fn(df, **ctx) -> Column | [Column, ...]``.  Insertion order
    is evaluation order; a later fn sees every earlier output as a
    real column of ``df``."""
    out = df
    for names, fn in derivations.items():
        result = fn(out, **ctx)
        if isinstance(names, str):
            names, result = (names,), [result]
        if len(result) != len(names):
            raise ValueError(
                f"derivation for {names} returned {len(result)} columns"
            )
        for name, col in zip(names, result):
            out = out.withColumn(name, col)
    return out


def iterative_replace_null(
    df: DataFrame, target: str, candidates: Sequence
) -> DataFrame:
    """K1: fill ``target`` from candidate columns / literals in
    order (reference episode_stats_transform.py:32-37) — a COALESCE
    cascade where string candidates are column names and other
    values are literal defaults."""
    import pyspark.sql.functions as F

    cols = [
        F.col(c) if isinstance(c, str) and c in df.columns else F.lit(c)
        for c in candidates
    ]
    return df.withColumn(target, F.coalesce(F.col(target), *cols))
