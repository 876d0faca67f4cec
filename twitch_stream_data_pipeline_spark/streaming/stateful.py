"""Custom stateful streaming operator: cross-batch category popularity.

The reference carries popularity state *between* 15-minute batches via
overwrite-in-place files — ``category_popularity_data`` steering the
next batch's fan-out (``src/other/get_category_popularity.py:42-52``,
``src/other/create_category_group_messages.py:128-157``) and the
``current_data`` state CSVs (SURVEY.md §2.7 "feedback loop across
batches"). The Spark-native form of that read-modify-write is an
``applyInPandasWithState`` operator: per-key state lives in the
checkpointed state store (exactly-once, partitioned by key across
executors) instead of a mutable file, and each micro-batch emits the
updated running popularity for downstream consumers.

State per category: number of batches seen, cumulative stream
observations, cumulative viewers, and an exponential moving average of
the per-batch mean viewer count (the "popularity" signal — an EMA so a
briefly-raided category decays instead of dominating forever).

At 100 TB the state store scales horizontally (state is hash-partitioned
by ``category_id`` over the shuffle), is bounded by the key universe
(categories, not facts), and supports TTL via GroupStateTimeout if
dead categories should age out.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: EMA smoothing: weight of the newest batch's mean viewer count.
EMA_ALPHA = 0.5

OUTPUT_SCHEMA = (
    "category_id string, batches bigint, n_streams bigint, "
    "total_viewers bigint, ema_viewers double"
)
STATE_SCHEMA = (
    "batches bigint, n_streams bigint, total_viewers bigint, ema_viewers double"
)


def _update_popularity(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one micro-batch of (category_id, viewer_count) into state."""
    n = 0
    viewers = 0
    for pdf in pdfs:
        n += len(pdf)
        viewers += int(pdf["viewer_count"].sum())
    if state.exists:
        batches, n_streams, total_viewers, ema = state.get
    else:
        batches, n_streams, total_viewers, ema = 0, 0, 0, None
    batch_mean = (viewers / n) if n else 0.0
    ema = batch_mean if ema is None else EMA_ALPHA * batch_mean + (1 - EMA_ALPHA) * ema
    batches += 1
    n_streams += n
    total_viewers += viewers
    state.update((batches, n_streams, total_viewers, float(ema)))
    yield pd.DataFrame(
        [
            {
                "category_id": key[0],
                "batches": batches,
                "n_streams": n_streams,
                "total_viewers": total_viewers,
                "ema_viewers": float(ema),
            }
        ]
    )


def stateful_popularity(curated: DataFrame) -> DataFrame:
    """Running per-category popularity over a curated fact *stream*.

    Input needs ``category_id`` and ``viewer_count`` columns; emits one
    updated row per category per micro-batch (update semantics). The
    single shuffle is the groupBy key — identical key partitioning to
    the batch popularity aggregate (A1), so the stateful and stateless
    forms co-partition.
    """
    return curated.select("category_id", "viewer_count").groupBy(
        "category_id"
    ).applyInPandasWithState(
        _update_popularity,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithState form of the same operator
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = (
    "category_id string, n_streams bigint, total_viewers bigint"
)


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningCategoryTotals(StatefulProcessor):
    """``transformWithStateInPandas`` stateful processor: cumulative
    per-category stream and viewer totals across micro-batches — the
    Spark-4-native successor to :func:`stateful_popularity`'s
    ``applyInPandasWithState``.

    Differences that matter at scale: typed composite state
    (``getValueState`` with a schema, stored in the RocksDB state
    store, not a pickled tuple), explicit timer surface for TTL, and
    initial-state bootstrap — the API Spark is converging on for
    arbitrary stateful pipelines. State remains hash-partitioned by
    key and bounded by the category universe.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_streams long, total_viewers long"
        )

    def handleInputRows(self, key, rows, timer_values):
        n, viewers = 0, 0
        if self._totals.exists():
            prev = self._totals.get()
            n, viewers = int(prev[0]), int(prev[1])
        for pdf in rows:
            n += len(pdf)
            viewers += int(pdf["viewer_count"].sum())
        self._totals.update((n, viewers))
        yield pd.DataFrame(
            {
                "category_id": [key[0]],
                "n_streams": [n],
                "total_viewers": [viewers],
            }
        )

    def close(self) -> None:
        pass


def running_category_totals(curated: DataFrame) -> DataFrame:
    """Apply :class:`RunningCategoryTotals` — requires the RocksDB
    state-store provider (``spark.sql.streaming.stateStore.
    providerClass``), which transformWithState mandates."""
    return curated.groupBy("category_id").transformWithStateInPandas(
        statefulProcessor=RunningCategoryTotals(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
