"""Aggregation operators (SURVEY.md §2.5 A1/A5).

Spark gives partial (map-side) aggregation automatically — the
group-by count below is a two-phase hash aggregate, so at 100 TB the
shuffle carries one partial row per (task, category), not one row per
stream observation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def category_popularity(streams: DataFrame, key: str = "category_id") -> DataFrame:
    """Streams per category, most popular first (A1 + O1).

    Reference: ``groupby(category_id).agg(num_of_streamers=count)`` +
    sort desc (``scripts/other/get_category_popularity.py:23-26``).
    """
    return (
        streams.groupBy(key)
        .agg(F.count("stream_id").alias("num_of_streamers"))
        .orderBy(F.desc("num_of_streamers"), key)
    )


def min_by_group(
    df: DataFrame, keys: list[str], value: Column | str, payload: Column | str
) -> DataFrame:
    """Argmin aggregate: payload at minimal value per group (A5).

    Reference: running minimum scan over the 96-slot grid
    (``scripts/get_raw_data/get_raw_categories_data.py:61-69``).
    """
    return df.groupBy(*keys).agg(
        F.min_by(payload, value).alias("argmin"), F.min(value).alias("min_value")
    )


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    buckets: int = 32,
    alias: str = "n_distinct",
) -> DataFrame:
    """Skew-proof exact COUNT(DISTINCT value) per key group.

    A plain distinct-count shuffles every (key, value) pair to the
    key's single reducer — a hot key (one category with 10^9 viewers,
    one language with most of the corpus) serializes on one task and
    can exceed its memory. Salting by a *hash of the value* splits each
    key's distinct-set cleanly across ``buckets`` reducers: distinct
    values partition disjointly by their own hash, so

        sum over salts of count(distinct value | key, salt)
        == count(distinct value | key)

    exactly. Two bounded shuffles replace one unbounded one; each
    reducer holds at most ~|distinct|/buckets values of the hottest
    key. This is the groupBy twin of AQE's skew-join splitting (which
    cannot split aggregation state).
    """
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(buckets)).alias("_salt")
    per_salt = (
        df.select(*keys, F.col(value), salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(F.col(value)).alias("_partial"))
    )
    return per_salt.groupBy(*keys).agg(F.sum("_partial").alias(alias))
