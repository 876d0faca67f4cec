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


def pack_oracle_sql(
    items_sql: str,
    max_groups: int = 25,
    cap_sql: str = "GREATEST(1, CAST((SUM(w) + 19) // 20 AS BIGINT))",
) -> str:
    """ANSI-SQL statement of :func:`pack_into_groups` as a DuckDB
    RECURSIVE CTE — the third iterative operator stated relationally
    (after the pagerank/BPE fixed-round unrolls; this one is
    data-dependent in LENGTH, which plain recursion handles: one
    linear-recursive row per item, state = the group-load list carried
    as a ``BIGINT[]`` column).

    Each step reproduces first-fit-decreasing exactly: items arrive in
    the trainer's (weight DESC, key) order; ``fit`` is the FIRST group
    whose load + w stays under cap (``list_position`` over a
    ``list_transform`` predicate); else a new group while under
    ``max_groups``; else the FIRST least-loaded group
    (``list_position(loads, list_min(loads))`` — Python's
    ``min(range, key=...)`` argmin tie-break). ``cap_sql`` defaults to
    the catalog entry's ceil(total/20) integer form.

    ``items_sql``: a SELECT producing ``k`` (key) and ``w`` (BIGINT
    weight). Output: ``(group_id, n_keys, total_weight)`` in group-
    creation order, the ``pack_groups`` catalog shape.

    Registered-catalog status: PROMOTED — the ``pack_groups``
    registration carries this oracle since round 12's single
    graded-window swap (staged rounds 10-11 in
    ``PACKING_STAGED_ORACLES``, differentially pinned in
    tests/test_operators.py and sweep-resolved throughout)."""
    return f"""
    WITH RECURSIVE items AS MATERIALIZED (
      SELECT k, w, row_number() OVER (ORDER BY w DESC, k) AS rnk
      FROM ({items_sql})
    ),
    params AS MATERIALIZED (
      SELECT {cap_sql} AS cap, COUNT(*) AS n FROM items
    ),
    step AS (
      SELECT 0::BIGINT AS i, CAST([] AS BIGINT[]) AS loads,
             0::INT AS g, 0::BIGINT AS w
      UNION ALL
      SELECT it.rnk,
             CASE WHEN chosen <= len(s.loads)
                  THEN list_transform(s.loads,
                         (l, idx) -> CASE WHEN idx = chosen
                                          THEN l + it.w ELSE l END)
                  ELSE list_append(s.loads, it.w) END,
             chosen::INT,
             it.w
      FROM step s
      JOIN items it ON it.rnk = s.i + 1
      CROSS JOIN params p
      CROSS JOIN LATERAL (
        SELECT CASE
          WHEN fit > 0 THEN fit
          WHEN len(s.loads) < {max_groups} THEN len(s.loads) + 1
          ELSE list_position(s.loads, list_min(s.loads)) END AS chosen
        FROM (SELECT coalesce(list_position(
                list_transform(s.loads, l -> l + it.w <= p.cap),
                true), 0) AS fit)
      ) c
    )
    SELECT (g - 1)::INT AS group_id,
           COUNT(*)::INT AS n_keys,
           CAST(SUM(w) AS BIGINT) AS total_weight
    FROM step WHERE i > 0
    GROUP BY 1 ORDER BY 1"""
