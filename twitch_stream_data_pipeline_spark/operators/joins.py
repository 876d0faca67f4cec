"""Join operators (SURVEY.md §2.4 J1-J6).

Every join in the reference is an equi join with one small side, so the
engine's default physical strategy is a broadcast hash join — zero
shuffle of the fact side. The positional join J6 (order-dependent
pandas concat) is re-expressed relationally with row numbers; the
nearest-slot "as-of join" J5 is pure arithmetic (no join at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Lookup join against a small dimension (J1).

    Replaces the reference's per-row boolean-mask probe
    (``scripts/process_raw_data/process_raw_genre_bridge_data.py:46-50``,
    O(n*m)) with a broadcast hash join: the dim ships to every task,
    the fact side never shuffles.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def left_join_default(
    fact: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    defaults: dict[str, float | int | str],
) -> DataFrame:
    """Left outer join + fill defaults for misses (J2 + P9).

    Reference: ``pd.merge(curr, popularity, how='left')`` + fillna(1)
    (``scripts/other/create_category_group_messages.py:107-108``).
    """
    return fact.join(F.broadcast(other), on=on, how="left").fillna(defaults)


def missing_keys(new: DataFrame, known: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Left anti join: keys needing work = new − known (J3).

    Reference: ``set(stream_ids).difference(set(current_ids))``
    (``scripts/get_raw_data/get_raw_users_data.py:126-134``).
    """
    return new.join(known, on=on, how="left_anti")


def delta_new_rows(new_state: DataFrame, old_state: DataFrame) -> DataFrame:
    """Full-row delta: rows in new_state not in old_state (J4/U2).

    Reference computes a symmetric difference via concat +
    ``drop_duplicates(keep=False)`` (``scripts/curate_data/
    curate_categories_data.py:70-77``), which is only correct because
    new_state ⊇ old_state; ``exceptAll`` states the real intent.
    """
    return new_state.exceptAll(old_state)


def nearest_slot_id(ts: Column) -> Column:
    """Map a timestamp to the nearest 15-minute slot id "HHMM" (J5).

    Replaces the reference's 96-row linear scan for min |diff|
    (``scripts/get_raw_data/get_raw_categories_data.py:52-71``,
    duplicated ~14x) with round-to-nearest arithmetic. The 23:52+
    day-rollover special case (``:42-47``) falls out of rounding: such
    times round to the next day's slot 0000.
    """
    rounded = F.timestamp_seconds(
        F.round(F.unix_timestamp(ts) / 900).cast("long") * 900
    )
    return F.date_format(rounded, "HHmm")


def nearest_slot_day_id(ts: Column) -> Column:
    """Companion day_date_id "yyyyMMdd" after nearest-slot rounding."""
    rounded = F.timestamp_seconds(
        F.round(F.unix_timestamp(ts) / 900).cast("long") * 900
    )
    return F.date_format(rounded, "yyyyMMdd")


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[Column | str],
    right_order: Sequence[Column | str],
) -> DataFrame:
    """Index-aligned concat re-expressed relationally (J6).

    The reference's ``pd.concat([...], axis=1)`` aligns by row
    position (``scripts/other/create_category_group_messages.py:111-114``);
    order must be made explicit to mean anything distributed, so both
    sides get ``row_number`` over their stated ordering and equi-join
    on position. Rows without a partner keep NULLs (full outer), same
    as pandas' alignment.

    **Size contract: small inputs only** (dimension/control-plane
    scale, like the reference's ≤25-row weights table). The global
    ``row_number`` windows necessarily sort each side in ONE task —
    positional semantics are order-dependent, so there is no
    partitionable form that preserves them exactly. For large data,
    redesign the alignment as a keyed join (the engine's own
    popularity feedback does exactly that); a zipWithIndex-based
    variant would distribute but silently changes the guarantee from
    "user-stated ordering" to "partition-file ordering".
    """
    lw = Window.orderBy(*left_order)
    rw = Window.orderBy(*right_order)
    lnum = left.withColumn("__pos", F.row_number().over(lw))
    rnum = right.withColumn("__pos", F.row_number().over(rw))
    return lnum.join(rnum, on="__pos", how="full_outer").drop("__pos")
