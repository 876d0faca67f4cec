#!/usr/bin/env python
"""Row-order-independence sweep (round 10).

At 100 TB, parquet row and file order is an accident of task
scheduling, ingestion batching, and compaction — two physically
different layouts of the same logical relation are the SAME table, and
every catalog query must return the same result on both. The
determinism sweep varies the shuffle layout and the fuzz sweep varies
the content; this sweep varies the INPUT ROW ORDER while holding
content fixed: each driver table is rewritten with its rows in a
seeded random permutation, the whole catalog runs against original and
permuted directories in the same session, and the sorted results are
diffed. Any difference is an implicit order dependence — a keep-first
without an explicit tiebreak, a ``first()``/``limit`` without a total
order, a window missing a deterministic ORDER BY — exactly the class
of bug that stays invisible on a single-file local read and fires on a
real cluster.

Tables are written back as single parquet files (the driver layout),
so streaming sources and the path-keyed helpers behave identically on
both directories.

Usage: python tests/order_sweep.py [--sf DIR] [--seed N]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def make_permuted_dir(src_sf: str, out_dir: str, seed: int) -> str:
    """Write a row-permuted single-file copy of every driver table."""
    rng = random.Random(seed)
    for t in TABLES:
        tbl = pq.read_table(f"{src_sf}/{t}.parquet")
        idx = list(range(tbl.num_rows))
        rng.shuffle(idx)
        pq.write_table(tbl.take(idx), f"{out_dir}/{t}.parquet")
    return out_dir


def run_all(spark, sf: str) -> dict:
    from tests.conftest import collect_catalog_snapshot

    return collect_catalog_snapshot(spark, sf)


def main() -> int:
    from twitch_stream_data_pipeline_spark.session import get_spark

    sf = "/root/testdata/sf0.001"
    seed = 77
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])

    spark = get_spark("order-sweep", cpus=8, shuffle_partitions=8)
    base = run_all(spark, sf)
    with tempfile.TemporaryDirectory(prefix="order_sf_") as d:
        make_permuted_dir(sf, d, seed)
        perm = run_all(spark, d)
    diff = [n for n in base if base[n] != perm[n]]
    for n in diff:
        b, p = base[n], perm[n]
        detail = ""
        if b[0] == "ERR" or p[0] == "ERR":
            detail = (
                f" base={b[1] if b[0] == 'ERR' else 'ok'}"
                f" permuted={p[1] if p[0] == 'ERR' else 'ok'}"
            )
        print(f"  DIFF[order] {n}{detail}")
    print(
        f"{len(base) - len(diff)}/{len(base)} queries identical under a "
        f"seed-{seed} row permutation of every input table"
    )
    return 1 if diff else 0


if __name__ == "__main__":
    raise SystemExit(main())
