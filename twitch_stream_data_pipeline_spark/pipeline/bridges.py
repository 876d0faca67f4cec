"""Genre / game-mode bridge pipeline: explode + resolve + curate
(SURVEY.md §3.2 step 4).

Reference: ``scripts/process_raw_data/process_raw_genre_bridge_data.py``
(game-mode twin ``process_raw_game_mode_bridge_data.py``) and
``scripts/curate_data/curate_genre_bridge_data.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def process_raw_bridge(
    records: DataFrame,
    curated_categories: DataFrame,
    array_col: str = "genres",
    out_col: str = "genre_id",
) -> DataFrame:
    """Raw IGDB bridge records -> processed (igdb_id, category_id,
    game_name, genre_id) rows.

    Semantics (process_raw_genre_bridge_data.py:46-50,85-92): skip games
    without the array field, explode one row per array element, resolve
    ``igdb_id -> category_id`` against the curated category dim deduped
    by ``igdb_id`` keep-first. The reference's per-row boolean-mask
    probe (an O(n*m) loop) becomes a broadcast hash join; its implicit
    keep-first needs the dim's file order — callers pass a
    ``__row_order`` column when byte-parity with a CSV matters,
    otherwise ``category_id`` order is the deterministic default.
    """
    order = (
        F.col("__row_order") if "__row_order" in curated_categories.columns
        else F.col("category_id")
    )
    w = Window.partitionBy("igdb_id").orderBy(order)
    dim = (
        curated_categories.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("igdb_id").cast("string").alias("igdb_id"), "category_id")
    )
    exploded = (
        records.filter(F.col(array_col).isNotNull())
        .select(
            F.col("id").alias("igdb_id"),
            F.col("name").alias("game_name"),
            F.explode(array_col).alias(out_col),
        )
    )
    return (
        exploded.join(
            F.broadcast(dim),
            exploded.igdb_id.cast("string") == dim.igdb_id,
            "inner",
        )
        .select(exploded.igdb_id, "category_id", "game_name", out_col)
    )


def curate_bridge(processed: DataFrame, out_col: str = "genre_id") -> DataFrame:
    """Processed bridge -> curated (category_id, pair-id) rows, deduped
    (curate_genre_bridge_data.py:58-60).
    """
    return processed.select("category_id", out_col).dropDuplicates(
        ["category_id", out_col]
    )
