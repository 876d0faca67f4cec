"""Users dimension pipeline: process + incremental curate
(SURVEY.md §3.3).

Reference: ``scripts/process_raw_data/process_raw_users_data.py`` and
``scripts/curate_data/curate_users_data.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cleaning import empty_to_sentinel
from ..operators.upsert import UpsertResult, upsert_state

STATE_COLUMNS = ["user_id", "user_name", "login_name", "broadcaster_type"]


def process_raw_users(records: DataFrame) -> DataFrame:
    """Raw user records -> processed users.

    Semantics (process_raw_users_data.py:62-67): full-row dedup, drop
    the deprecated ``view_count``, empty ``type``/``broadcaster_type``
    -> "normal".
    """
    return empty_to_sentinel(
        records.select(
            "id",
            "login",
            "display_name",
            "type",
            "broadcaster_type",
            "description",
            "profile_image_url",
            "offline_image_url",
            "created_at",
        ).distinct(),
        {"type": "normal", "broadcaster_type": "normal"},
    )


def curate_users(processed: DataFrame, current: DataFrame) -> UpsertResult:
    """Incremental user-dim upsert (curate_users_data.py:79-86,100-104).

    Renames to star-schema names (id -> user_id, display_name ->
    user_name, login -> login_name), keeps the 4 warehouse columns, and
    computes the only-new-rows delta plus the refreshed state.
    """
    batch = processed.withColumnsRenamed(
        {"id": "user_id", "display_name": "user_name", "login": "login_name"}
    ).select(*STATE_COLUMNS)
    return upsert_state(batch, current.select(*STATE_COLUMNS), ["user_id"])
