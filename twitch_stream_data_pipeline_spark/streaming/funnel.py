"""Streaming funnel: the ordered-conversion automaton as a stateful
operator (the complex-event-processing member of the streaming tier —
"did this user signup, then click, then purchase?" answered
incrementally as events arrive, instead of re-scanning history every
batch).

The batch operator (:func:`..operators.event_analytics.funnel_stages`)
computes the greedy-earliest chain with per-stage joins; the streaming
twin keeps ONE tiny state row per user — ``(stage_reached, t_prev)`` —
and advances it with each micro-batch. The greedy chain is exactly a
deterministic finite automaton over the user's time-ordered event
sequence: at stage ``k`` consume the first ``steps[k]`` event strictly
after ``t_prev``. Processing events in nondecreasing event-time order
therefore reproduces the batch semantics — pinned by the parity test
(`tests/test_streaming.py::test_streaming_funnel_parity_with_batch`).

Ordering contract: the automaton is incremental only under in-order
delivery (within a batch the processor sorts; across batches the
replayed source must be time-ordered — the reference's 15-minute
cadence guarantees this, and a watermark + sorted foreachBatch
staging restores it for out-of-order sources). A late event cannot
retroactively enable an EARLIER chain once the automaton advanced
past its timestamp — the standard CEP in-order requirement.

Scale shape: one shuffle keyed by user (hash-partitioned state store,
exactly-once under checkpointing); state is 2 integers per user —
bounded by the user universe, not the event volume; each micro-batch
touches only the users present in it. TTL via GroupStateTimeout ages
out abandoned funnels if required.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = "user_id bigint, stage_reached bigint, t_prev bigint"
FUNNEL_STATE_SCHEMA = "stage_reached bigint, t_prev bigint"


def make_funnel_updater(steps: Sequence[str]):
    """Build the per-user state-update function for ``steps``."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stage, t_prev = state.get
        else:
            stage, t_prev = 0, -1
        events = []
        for pdf in pdfs:
            events.extend(
                zip(pdf["event_type"].tolist(), pdf["secs"].tolist())
            )
        # within-batch time ordering; order among equal-timestamp
        # events is immaterial: only the awaited step type can advance
        # the automaton, and the strictly-after rule (secs > t_prev)
        # blocks same-timestamp chains in every interleaving
        events.sort(key=lambda e: e[1])
        for etype, secs in events:
            if stage < len(steps) and etype == steps[stage] and secs > t_prev:
                stage += 1
                t_prev = int(secs)
        state.update((int(stage), int(t_prev)))
        yield pd.DataFrame(
            [
                {
                    "user_id": int(key[0]),
                    "stage_reached": int(stage),
                    "t_prev": int(t_prev),
                }
            ]
        )

    return update


def streaming_funnel(
    events: DataFrame, steps: Sequence[str]
) -> DataFrame:
    """Per-user funnel automaton over an event *stream*.

    Input needs ``user_id``, ``event_type``, ``secs``; emits the
    updated ``(user_id, stage_reached, t_prev)`` row for every user
    present in each micro-batch (update semantics). ``stage_reached``
    is the number of completed steps; aggregate downstream for the
    per-stage population counts the batch operator emits.
    """
    return (
        events.select("user_id", "event_type", "secs")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_updater(steps),
            FUNNEL_OUTPUT_SCHEMA,
            FUNNEL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
