"""Scalar / column-level function library (SURVEY.md §2.I/J + text
analysis extensions)."""

from .textstats import (
    token_count_expr,
    quality_score_exprs,
    lang_id_expr,
    fingerprint_expr,
)

__all__ = [
    "token_count_expr",
    "quality_score_exprs",
    "lang_id_expr",
    "fingerprint_expr",
]
