"""Category dimension pipeline: process + incremental curate
(SURVEY.md §3.2).

Reference: ``scripts/process_raw_data/process_raw_categories_data.py``
and ``scripts/curate_data/curate_categories_data.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cleaning import empty_to_sentinel
from ..operators.upsert import UpsertResult, upsert_state

STATE_COLUMNS = ["category_id", "category_name", "igdb_id"]


def process_raw_categories(records: DataFrame) -> DataFrame:
    """Raw category records -> processed categories.

    Semantics (process_raw_categories_data.py:61-66): full-row dedup,
    rename id/name, empty-string ``igdb_id``/``box_art_url`` -> "NA".
    """
    return empty_to_sentinel(
        records.select("id", "name", "box_art_url", "igdb_id")
        .distinct()
        .withColumnsRenamed({"id": "category_id", "name": "category_name"}),
        {"igdb_id": "NA", "box_art_url": "NA"},
    ).select("category_id", "category_name", "box_art_url", "igdb_id")


def curate_categories(processed: DataFrame, current: DataFrame) -> UpsertResult:
    """Incremental dim upsert (curate_categories_data.py:70-77).

    ``delta`` = categories never seen before (emitted downstream to the
    warehouse); ``new_state`` = updated ``current_categories`` state.
    The reference's concat + drop_duplicates(keep='first') keeps the
    state's attributes for known keys; ``upsert_state`` preserves that.
    """
    return upsert_state(
        processed.select(*STATE_COLUMNS), current.select(*STATE_COLUMNS), ["category_id"]
    )
