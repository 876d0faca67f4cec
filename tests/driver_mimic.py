#!/usr/bin/env python
"""One-off driver mimic: run the first-50 harness window (or all
oracle-bearing queries with --all) at sf0.01 and compare vs DuckDB
exactly the way the round driver does (rows + column set + normalized
value comparison).

Usage: python tests/driver_mimic.py [--all] [--sf DIR]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from twitch_stream_data_pipeline_spark.plans import CATALOG
from twitch_stream_data_pipeline_spark.plans.catalog import EXPOSURE_ORDER
from twitch_stream_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v!r}"
        return repr(v)

    return sorted(tuple(norm_cell(row[i]) for i in order) for row in rows)


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    names = list(EXPOSURE_ORDER[:50])
    if "--all" in sys.argv:
        names = [n for n in EXPOSURE_ORDER if CATALOG[n].oracle is not None]
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    spark = get_spark("driver-mimic")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name in names:
        q = CATALOG[name]
        t0 = time.perf_counter()
        try:
            sdf = q.fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = [c.lower() for c in sdf.columns]
            if q.oracle is None:
                print(f"  {name}: rows-only {len(spark_rows)} "
                      f"({time.perf_counter()-t0:.2f}s)")
                continue
            res = duck.execute(q.oracle)
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
            ok_rows = len(spark_rows) == len(duck_rows)
            ok_cols = sorted(spark_cols) == sorted(duck_cols)
            ok_hash = (
                ok_rows
                and ok_cols
                and _normalize(spark_rows, spark_cols)
                == _normalize(duck_rows, duck_cols)
            )
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            print(
                f"  {name}: {status} spark={len(spark_rows)} "
                f"duck={len(duck_rows)} cols={ok_cols} hash={ok_hash} "
                f"({time.perf_counter()-t0:.2f}s)"
            )
            if status == "FAIL":
                failures.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"  {name}: ERR {type(exc).__name__}: {exc}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
