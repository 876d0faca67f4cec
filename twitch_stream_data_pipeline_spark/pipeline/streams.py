"""Streams fact pipeline: process + curate (SURVEY.md §3.1).

Reference: ``scripts/process_raw_data/process_raw_streams_data.py`` and
``scripts/curate_data/curate_streams_data.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cleaning import valid_integer_ids
from ..operators.dedup import dedup_keep_first

PROCESSED_COLUMNS = [
    "id",
    "user_id",
    "user_login",
    "user_name",
    "game_id",
    "game_name",
    "title",
    "viewer_count",
    "started_at",
    "language",
    "thumbnail_url",
    "is_mature",
]


def process_raw_streams(records: DataFrame) -> DataFrame:
    """Raw envelope records -> processed streams.

    Semantics (process_raw_streams_data.py:47-120): keep rows whose
    ``id`` and ``user_id`` parse as integers ("test stream" rejection,
    :48-53,68-74), default empty ``language`` to ``"notavailable"``
    (:57-61), project the 12 tabular columns (arrays dropped, :66-84),
    dedup by stream ``id`` keeping the first across shard files
    (:120) — "first" made explicit here as (source_file, record_pos)
    order, the file-listing order pandas depends on implicitly.
    """
    cleaned = (
        valid_integer_ids(records, "id", "user_id")
        .withColumn(
            "language",
            F.when(F.col("language") == "", F.lit("notavailable")).otherwise(
                F.col("language")
            ),
        )
    )
    order = [F.col("source_file"), F.col("record_pos")]
    if "source_file" not in records.columns:
        order = [F.col("id")]
    return dedup_keep_first(cleaned, ["id"], order).select(*PROCESSED_COLUMNS)


def curate_streams(
    processed: DataFrame, day_date_id: str, time_of_day_id: str
) -> DataFrame:
    """Processed streams -> curated fact rows (curate_streams_data.py:29-48).

    Project 5 columns, rename to the star-schema names, inject the
    batch grid-cell ids, derive ``hours_watched = viewer_count * 0.25``
    (15 minutes = quarter hour per observation), dedup on the fact
    grain.
    """
    curated = processed.select(
        F.col("id").alias("stream_id"),
        F.lit(day_date_id).alias("day_date_id"),
        F.lit(time_of_day_id).alias("time_of_day_id"),
        "user_id",
        F.col("game_id").alias("category_id"),
        F.col("language").alias("language_id"),
        "viewer_count",
        (F.col("viewer_count") * 0.25).alias("hours_watched"),
    )
    return curated.dropDuplicates(["stream_id", "day_date_id", "time_of_day_id"])
