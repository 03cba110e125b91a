"""Season pipeline transform (reference season_transform.py:49-80).

Input: one row per scraped season with English date-range text,
winner/runnerup array cells, and raw count strings.  Output: the
``season`` dimension — date range split to start/end timestamps
(J1), winner/runnerup arrays to numbered columns (L2), numeric casts
(K7), NULL season_ids minted (E6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.ids import mint_ids_sequential

# 'March 1, 2020 – May 15, 2020' | 'March 1 – May 15, 2020'
_RANGE = r"^\s*(.*?)\s*[–-]\s*(.*?)\s*$"


def _parse_date(col):
    """Lenient multi-format English date parse (reference
    season_transform.py:31-46): try full 'Month d, yyyy' first, then
    month-day with the year borrowed from the range end."""
    return F.coalesce(
        F.to_timestamp(col, "MMMM d, yyyy"),
        F.to_timestamp(col, "MMM d, yyyy"),
    )


def transform_season(raw: DataFrame) -> dict[str, DataFrame]:
    start_txt = F.regexp_extract("air_dates", _RANGE, 1)
    end_txt = F.regexp_extract("air_dates", _RANGE, 2)
    # year lives on the end date when the start omits it
    year = F.regexp_extract(end_txt, r"(\d{4})", 1)
    start_full = F.when(
        start_txt.rlike(r"\d{4}"), start_txt
    ).otherwise(F.concat(start_txt, F.lit(", "), year))

    out = raw.select(
        F.col("season_id").cast("long").alias("season_id"),
        F.col("name"),
        _parse_date(start_full).alias("showing_started"),
        _parse_date(end_txt).alias("showing_ended"),
        F.col("season").cast("long").alias("season"),
        F.col("days").cast("double").alias("days"),
        F.col("episodes").cast("double").alias("episodes"),
        # winner/runnerup list cells -> numbered columns (L2; ties
        # give two runners-up, reference season_transform.py:10-20)
        F.try_element_at("winner", F.lit(1)).alias("winner_0"),
        F.try_element_at("runnerup", F.lit(1)).alias("runnerup_0"),
        F.try_element_at("runnerup", F.lit(2)).alias("runnerup_1"),
    )
    return {"season": mint_ids_sequential(out, "season_id", ["season"])}
