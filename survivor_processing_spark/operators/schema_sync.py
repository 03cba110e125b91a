"""Schema alignment against a target table schema.

The reference's ``sync_with_remote`` (transform_helpers.py:5-39)
reconciles an in-flight frame against the warehouse catalog: add
missing columns as NULL, cast to catalog types, drop extras with a
warning.  Engine form: one ``select`` against a target
``StructType`` — pure projection, zero shuffle."""

from __future__ import annotations

import logging

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

log = logging.getLogger(__name__)


def sync_with_target(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` to exactly ``target``'s columns and types."""
    have = set(df.columns)
    extras = have - {f.name for f in target.fields}
    if extras:
        log.warning("sync_with_target dropping extra columns: %s", sorted(extras))
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
