"""Greedy weighted bin-packing (SURVEY.md A4) — driver-side.

The reference packs categories into <=25 groups of roughly equal
streamer weight to balance its Lambda fan-out
(``scripts/other/create_category_group_messages.py:57-80``; group cap
7000 at :72, 25 = concurrency at ``src`` :62). In Spark the *query*
analog of this balancing is AQE skew handling / task scheduling, so the
packer survives only as a small driver-side utility over an
already-aggregated (tiny) DataFrame — the input is one row per
category, i.e. thousands of rows, never fact-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_into_groups(
    weights: DataFrame | list[tuple],
    key: str = "category_id",
    weight: str = "num_of_streamers",
    max_groups: int = 25,
    cap: int = 7000,
) -> list[list[str]]:
    """Greedy first-fit-decreasing pack of keys into weight-bounded groups.

    Mirrors the reference algorithm: iterate keys by descending weight,
    open a new group while under ``max_groups`` if the current item
    would breach ``cap``, else overflow into the least-loaded group.
    Returns the groups as lists of keys (the SQS work-unit analog, K4).

    ``weights`` is either a (tiny, pre-aggregated) DataFrame or an
    already-collected list of ``(key, weight)`` tuples — callers that
    need the weights driver-side anyway pass the list so the aggregate
    job runs exactly once.
    """
    if isinstance(weights, DataFrame):
        collected = weights.select(key, weight).orderBy(F.desc(weight), key).collect()
        items = [(r[key], r[weight]) for r in collected]
    else:
        items = sorted(weights, key=lambda t: (-(t[1] or 0), t[0]))
    groups: list[list[str]] = []
    loads: list[int] = []
    for k, w in items:
        w = w or 0
        placed = False
        for i, load in enumerate(loads):
            if load + w <= cap:
                groups[i].append(k)
                loads[i] += w
                placed = True
                break
        if not placed:
            if len(groups) < max_groups:
                groups.append([k])
                loads.append(w)
            else:
                i = min(range(len(loads)), key=loads.__getitem__)
                groups[i].append(k)
                loads[i] += w
    return groups
