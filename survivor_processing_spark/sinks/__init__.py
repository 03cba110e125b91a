"""Idempotent keyed sinks (SURVEY.md §2.B)."""

from .merge import merge_upsert, MergeTable

__all__ = ["merge_upsert", "MergeTable"]
