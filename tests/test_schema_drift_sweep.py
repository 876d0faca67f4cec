"""Schema-drift sweep (round 10) — the lake-evolution axis of the
poison family.

At 100 TB, tables EVOLVE: an upstream producer adds a column, a rewrite
reorders the physical column layout. Neither may change any query's
result — every plan must address columns by NAME (never position) and
must not leak an unrequested column into its output schema. This module
manufactures exactly that drift from the sf0.001 testdata:

* every table gains a ``_drift_col`` (int, non-null) — placed FIRST, so
  any positional read shifts by one;
* every table's remaining columns are written in REVERSED order, so
  positional assumptions break loudly rather than by luck.

Both the engine and the DuckDB oracle views read the SAME drifted
parquet, so a correct name-addressed query matches its oracle exactly
as it does on the pristine layout; a ``SELECT *``-shaped flow that
carries ``_drift_col`` into its output fails the column-set comparison,
and a positional read fails the value hash. Every oracle-bearing
catalog query must (a) not raise and (b) still match; no-oracle queries
must not raise. Failures are collected and reported together.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.plans import CATALOG

from .conftest import (
    SF_SMOKE,
    TABLES,
    graded_oracle,
    make_duck_views,
    normalize_rows,
)


@pytest.fixture(scope="module")
def drift_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("drift_sf")
    for t in TABLES:
        src = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        drifted = src.select(
            F.lit(7).alias("_drift_col"), *reversed(src.columns)
        )
        drifted.write.parquet(f"{out}/{t}.parquet")
    return str(out)


def test_schema_drift_whole_catalog(spark, drift_dir):
    con = make_duck_views(duckdb.connect(), drift_dir, glob_parts=True)
    failures = []
    for name, q in sorted(CATALOG.items()):
        try:
            sdf = q.fn(spark, drift_dir)
            s_cols = [c.lower() for c in sdf.columns]
            if "_drift_col" in s_cols:
                failures.append(
                    f"{name}: LEAKS the drifted column into its output"
                )
                continue
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001 - sweep reports wholesale
            failures.append(f"{name}: ENGINE RAISED {e!r}"[:300])
            continue
        # staged oracles included: a queued promotion must be
        # drift-proven BEFORE the round that grades it
        oracle = graded_oracle(name)
        if oracle is None:
            continue
        try:
            res = con.execute(oracle)
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: ORACLE RAISED {e!r}"[:300])
            continue
        if "_drift_col" in d_cols:
            failures.append(f"{name}: ORACLE leaks the drifted column")
            continue
        if normalize_rows(s_rows, s_cols) != normalize_rows(d_rows, d_cols):
            failures.append(
                f"{name}: MISMATCH engine {len(s_rows)} rows vs oracle "
                f"{len(d_rows)} rows"
            )
    assert not failures, "\n".join(sorted(failures))
