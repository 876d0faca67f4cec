#!/usr/bin/env python
"""Quick per-query DuckDB-oracle differential (the driver_mimic
comparison — rows + column set + normalized values — for a named
subset of queries, at one or more SFs).

Usage: python tests/oracle_check.py [--sf DIR ...] name [name ...]
Default SFs: sf0.001 and sf0.01.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from twitch_stream_data_pipeline_spark.plans import CATALOG
from twitch_stream_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def nc(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v!r}"
        return repr(v)

    return sorted(tuple(nc(r[i]) for i in order) for r in rows)


def main() -> None:
    args = sys.argv[1:]
    sfs = []
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sfs.append(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("oracle_check")
    bad = 0
    for sf_dir in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            q = CATALOG[name]
            if q.oracle is None:
                print(f"{sf_dir} {name} NO-ORACLE (rows-only)")
                continue
            df = q.fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
            ores = con.execute(q.oracle)
            ocols = [c[0] for c in ores.description]
            orows = ores.fetchall()
            ok = set(scols) == set(ocols) and normalize(
                srows, scols
            ) == normalize(orows, ocols)
            bad += 0 if ok else 1
            print(
                f"{sf_dir} {name} {'MATCH' if ok else 'MISMATCH'} "
                f"{len(srows)} rows"
            )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
