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
    # Compare against the graded oracle (staged ones included).
    import duckdb

    from tests.conftest import graded_oracle, make_duck_views, normalize_rows

    con = make_duck_views(duckdb.connect(), out, glob_parts=True)
    bad = []
    for name, q in CATALOG.items():
        try:
            sdf = q.fn(spark, out)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001 - reporting tool
            bad.append((name, repr(e)[:200]))
            print(f"  FAIL {name}: {e!r}"[:220])
            continue
        oracle = graded_oracle(name)
        if oracle is None:
            continue
        try:
            res = con.execute(oracle)
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ORACLE RAISED {e!r}"[:200]))
            print(f"  FAIL {name}: ORACLE RAISED {e!r}"[:220])
            continue
        s_cols = [c.lower() for c in sdf.columns]
        if normalize_rows(s_rows, s_cols) != normalize_rows(d_rows, d_cols):
            bad.append((name, "empty-input oracle mismatch"))
            print(
                f"  FAIL {name}: MISMATCH engine {len(s_rows)} rows vs "
                f"oracle {len(d_rows)} rows"
            )
    print(f"\n{len(CATALOG) - len(bad)}/{len(CATALOG)} queries clean on empty input")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
