"""Incremental dimension maintenance (SURVEY.md J4/K5, §3.2-3.3).

The reference's upsert cycle per batch: union new rows into the state
CSV, dedup by key, compute the delta (only-new rows) for the
warehouse, overwrite the state file (``scripts/curate_data/
curate_categories_data.py:70-109``; ``src/curate_data/
curate_users_data.py:54-108``). Expressed relationally: the delta is a
keyed left-anti join (robust to type drift, unlike full-row
``exceptAll`` — SURVEY.md §7 risk (c)), and the new state is
state ∪ delta.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class UpsertResult:
    """Delta rows (to append downstream) and the full new state."""

    delta: DataFrame
    new_state: DataFrame


def upsert_state(
    batch: DataFrame, state: DataFrame, keys: Sequence[str]
) -> UpsertResult:
    """One micro-batch of dim maintenance.

    ``delta`` = batch rows whose key is unknown to ``state`` (the rows
    the reference emits to Postgres); ``new_state`` = state plus delta.
    Keys already in state keep their existing attributes — same
    semantics as the reference's union-then-dedup-keep-first where
    state rows precede batch rows.
    """
    fresh = batch.dropDuplicates(list(keys))
    delta = fresh.join(state.select(*keys), on=list(keys), how="left_anti")
    new_state = state.unionByName(delta)
    return UpsertResult(delta=delta, new_state=new_state)
