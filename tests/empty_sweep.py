#!/usr/bin/env python
"""One-off robustness sweep: run EVERY catalog query against
schema-only (zero-row) copies of the testdata tables and report any
exception — the degenerate-partition contract (at 100 TB, empty
partitions, empty date ranges, and empty filter results are routine;
an operator that crashes on them fails mid-job).

Usage: python tests/empty_sweep.py [--sf DIR]
(`tests/test_event_analytics.py::test_catalog_runs_on_empty_tables`
pins a representative subset in CI; this tool covers all queries.)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitch_stream_data_pipeline_spark.plans import CATALOG
from twitch_stream_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def make_empty_copy(spark, sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    return out


def main() -> int:
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("empty_sweep", cpus=8, shuffle_partitions=8)
    out = make_empty_copy(spark, sf)
    # round 10: empty input is not only a no-raise contract — global
    # aggregates legitimately EMIT rows on it (a (0, 0) count row, a
    # NULL-sum row), and the engine and oracle must agree on which.
    # Compare against the graded oracle (staged ones included) via the
    # single-sourced sweep body.
    import duckdb

    from tests.conftest import make_duck_views, sweep_differential

    con = make_duck_views(duckdb.connect(), out, glob_parts=True)
    bad = []
    for name, q in CATALOG.items():
        failure = sweep_differential(spark, con, name, q, out)
        if failure:
            bad.append((name, failure))
            print(f"  FAIL {failure}"[:220])
    print(f"\n{len(CATALOG) - len(bad)}/{len(CATALOG)} queries clean on empty input")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
