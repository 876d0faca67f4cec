"""Scaling-curve measurement for the heaviest catalog queries
(VERDICT r8 next-round #7): run the top-cost queries at sf0.1 and at a
scale_testdata.py-manufactured >=5x sibling, and report the time ratio
against the 5x volume ratio — a query whose ratio is near-linear (or
sublinear, for probe-style fixed-output queries) has no superlinear
surprise hiding behind the plan-shape arguments.

Not a pytest module — run it directly (after scale_testdata.py):

    python tests/scale_bench.py [sf_small] [sf_big]

Methodology mirrors bench.py: sf0.001 warmup for codegen/JIT, then
first-pass + 2 steady reps per SF with a System.gc() between timed
windows; MIN is the reported steady estimator (noise-robust floor).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitch_stream_data_pipeline_spark.plans import CATALOG
from twitch_stream_data_pipeline_spark.session import get_spark

#: the top-10 r8 full-query costs plus the iterative-clustering tier,
#: plus (round 9, late) the two streaming-replay entries — their ratio
#: measures how an availableNow replay's end-to-end cost (listing,
#: micro-batch execution, state store, complete-mode materialization)
#: grows with volume — plus (round 11) the dashboard star trio, graded
#: since dash_hours_by_category's window swap: constant-size output by
#: construction, so the ratio isolates the fact-scan + broadcast-join
#: cost (measured 0.80x/1.34x/1.39x at the first 5x point, BENCHNOTES).
HEAVIES = (
    "embedding_ingest",
    "dedup_ingest",
    "lsh_index_probe",
    "ivf_index_knn",
    "ivfpq_index_knn",
    "rfm_segments",
    "bigram_logprob",
    "pretrain_pipeline",
    "winnow_near_dup",
    "dedup_clusters",
    "kmeans_clusters",
    "stream_window_counts",
    "stream_session_windows",
    "dash_hours_by_category",
    "dash_streamers_by_day",
    "dash_viewers_by_hour",
)


def time_queries(spark, sf_dir: str, names=HEAVIES, reps: int = 3):
    out = {}
    for name in names:
        fn = CATALOG[name].fn
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n_rows = len(fn(spark, sf_dir).collect())
            times.append(time.perf_counter() - t0)
            spark._jvm.System.gc()
        out[name] = (times[0], min(times), n_rows)
    return out


def main() -> None:
    sf_small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_big = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale_bench/sf0.5"
    )
    spark = get_spark("scale-bench")
    spark.range(1).count()
    for name in HEAVIES:  # codegen/JIT/worker-pool warmup
        CATALOG[name].fn(spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    time.sleep(1.0)

    small = time_queries(spark, sf_small)
    big = time_queries(spark, sf_big)
    print(
        f"| query | {sf_small.rsplit('/', 1)[-1]} min (s) | "
        f"{sf_big.rsplit('/', 1)[-1]} min (s) | ratio | rows s->b |"
    )
    print("|---|---|---|---|---|")
    for name in HEAVIES:
        _, s_min, s_rows = small[name]
        _, b_min, b_rows = big[name]
        print(
            f"| {name} | {s_min:.2f} | {b_min:.2f} | "
            f"{b_min / s_min:.2f}x | {s_rows} -> {b_rows} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
