"""Structured Streaming restatement of the reference's hand-built
15-minute micro-batch system (SURVEY.md §2.7, §3.1)."""

from .pipeline import (
    batch_event_time,
    curated_streams_stream,
    interval_join_streams,
    run_streams_replay,
    stream_raw_streams,
    windowed_popularity_stream,
)
from .dim_maintenance import AggMaintainer, DimUpserter
from .funnel import make_funnel_updater, streaming_funnel
from .stateful import stateful_popularity
from .feedback import FanoutPlanner

__all__ = [
    "make_funnel_updater",
    "stateful_popularity",
    "streaming_funnel",
    "FanoutPlanner",
    "batch_event_time",
    "curated_streams_stream",
    "interval_join_streams",
    "run_streams_replay",
    "stream_raw_streams",
    "windowed_popularity_stream",
    "DimUpserter",
    "AggMaintainer",
]
