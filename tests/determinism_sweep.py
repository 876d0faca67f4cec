#!/usr/bin/env python
"""One-off determinism sweep: run EVERY catalog query twice — under
different ``spark.sql.shuffle.partitions`` (7 vs 32) in separate
sessions — and diff the sorted results. Partition-independence is the
repo's core determinism claim (decimal-routed sums, md5 keys,
explicit tiebreaks); this sweep checks the claim wholesale rather
than per-operator. Round-5 close: 130/130 identical.

Usage: python tests/determinism_sweep.py [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitch_stream_data_pipeline_spark.plans import CATALOG
from twitch_stream_data_pipeline_spark.session import get_spark


def run_all(sf: str, parts: int) -> dict:
    spark = get_spark(f"det{parts}", cpus=8, shuffle_partitions=parts)
    out = {}
    for name, q in CATALOG.items():
        try:
            df = q.fn(spark, sf)
            rows = [tuple(map(repr, r)) for r in df.collect()]
            out[name] = (tuple(sorted(df.columns)), tuple(sorted(rows)))
        except Exception as e:  # noqa: BLE001 - reporting tool
            out[name] = ("ERR", repr(e)[:200])
    spark.stop()
    return out


def main() -> int:
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    a = run_all(sf, 7)
    b = run_all(sf, 32)
    diff = [n for n in a if a[n] != b[n]]
    for n in diff:
        print(f"  DIFF {n}")
    print(f"\n{len(a) - len(diff)}/{len(a)} queries partition-independent")
    return 1 if diff else 0


if __name__ == "__main__":
    raise SystemExit(main())
