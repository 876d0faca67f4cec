"""Physical-plan audits: the scale properties the engine promises must
be visible in `.explain` output — broadcast joins for dims, filter
pushdown into the parquet scan, column pruning, partition pruning on
the partitioned curated layer. These are the checks SURVEY.md §4 maps
from the reference's manual techniques to Catalyst built-ins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.plans import CATALOG
from twitch_stream_data_pipeline_spark.sinks import write_partitioned

from .conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_star_join_broadcasts_all_dims(spark):
    df = CATALOG["star_revenue_by_region"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") == 3, plan


def test_pricing_summary_pushes_filter_into_scan(spark):
    df = CATALOG["pricing_summary"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side partial aggregation: shuffle carries partial sums, not rows
    assert "partial_sum" in plan, plan
    # AQE prints the final (codegen-annotated) plan only after executing
    # this exact plan instance (count() would build a different one)
    df.collect()
    # codegen stages print as "*(n) Op" in the compact plan string
    assert "*(2) HashAggregate" in plan_of(df) or "*(1) HashAggregate" in plan_of(df)


def test_column_pruning_reaches_scan(spark):
    df = CATALOG["popularity_by_type"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in scan_line and "value" not in scan_line, scan_line


def test_anti_join_is_broadcast(spark):
    df = CATALOG["anti_join_customers"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_partition_pruning_on_curated_layer(spark, tmp_path):
    curated = CATALOG["curate_events"].fn(spark, SF_SMOKE)
    out = str(tmp_path / "curated")
    write_partitioned(curated, out, ["day_date_id"], mode="overwrite")
    one_day = spark.read.parquet(out).filter(F.col("day_date_id") == "20240102")
    plan = plan_of(one_day)
    # the day filter must become a partition filter, not a row filter
    assert "PartitionFilters: [isnotnull(day_date_id" in plan, plan
    assert one_day.count() > 0


def test_dedup_uses_partial_aggregation(spark):
    """exact dedup must partial-aggregate map-side: two HashAggregate
    phases around the exchange, so the shuffle carries one row per
    (hash, partial) not one per input row."""
    df = CATALOG["exact_dedup"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange hashpartitioning(text_hash" in plan, plan
