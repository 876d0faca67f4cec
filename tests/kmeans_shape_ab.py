#!/usr/bin/env python
"""One-off A/B for the k-means Lloyd-update plan shape (BENCHNOTES):

A (the engine's shape, extensions/clustering.py): the Arrow pass emits
  PER-BATCH partial sums — O(arrow_batches x k) rows cross the Python
  boundary, each carrying one d-array — then posexplode + map-side-
  combined (cluster, pos) aggregation.
B (the naive shape): the Arrow pass emits one (cluster, qv) row PER
  INPUT ROW — N rows cross the boundary — and the same posexplode +
  aggregation runs over N x d exploded rows.

Both produce identical exact int64 sums (asserted); the difference is
the Python->JVM Arrow transfer and the pre-combine explode volume:
batches x k x d vs N x d. The gap therefore scales linearly with
N / (batches x k) — at 100 TB shape B ships the whole corpus through
the Python boundary per iteration, shape A ships a model-state-sized
relation per Arrow batch.

Usage: python tests/kmeans_shape_ab.py [N] [d] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.extensions.clustering import (
    _centroid_pass,
    _quantize_centroids,
)
from twitch_stream_data_pipeline_spark.extensions.similarity import _unit_rows
from twitch_stream_data_pipeline_spark.session import get_spark


def naive_pass(qdf, cent_q):
    """Shape B: one emitted row per input row."""
    import pandas as pd

    c_norm2 = (cent_q * cent_q).sum(axis=1).astype(np.float64)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["qv"].tolist(), dtype=np.int64)
            dots = (X @ cent_q.T).astype(np.float64)
            q_norm2 = (X * X).sum(axis=1).astype(np.float64)
            denom = np.sqrt(
                np.where(q_norm2 == 0, 1.0, q_norm2)[:, None]
                * np.where(c_norm2 == 0, 1.0, c_norm2)[None, :]
            )
            assign = (dots / denom).argmax(axis=1)
            yield pd.DataFrame({"cluster": assign, "sums": pdf["qv"]})

    return qdf.mapInPandas(run, "cluster int, sums array<long>")


def agg_sums(df, n_col_expr):
    return (
        df.select("cluster", n_col_expr, F.posexplode("sums").alias("pos", "s"))
        .groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )


def main() -> int:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("kmeans_ab", cpus=32, shuffle_partitions=32)

    rng = np.random.default_rng(7)
    cent = _unit_rows(rng.normal(size=(k, d)))
    cent_q = _quantize_centroids(cent)
    # deterministic synthetic int rows, JVM-side (no driver transfer)
    qdf = (
        spark.range(N)
        .repartition(32)
        .select(
            F.col("id").alias("rid"),
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda j: (F.xxhash64(F.col("id"), j) % 2001) - 1000,
            ).alias("qv"),
        )
        .localCheckpoint()  # materialize once so both shapes scan equal input
    )

    def timeit(fn):
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    ta, ra = timeit(
        lambda: agg_sums(
            _centroid_pass(qdf, cent_q, partials_only=True), F.col("n")
        )
    )
    tb, rb = timeit(
        lambda: agg_sums(naive_pass(qdf, cent_q), F.lit(1).alias("n"))
    )
    key = lambda rows: sorted((r["cluster"], r["pos"], r["s"], r["n"]) for r in rows)
    assert key(ra) == key(rb), "shapes disagree on exact sums"
    print(
        f"N={N} d={d} k={k}: partial-sum shape {ta:.2f}s, "
        f"per-row shape {tb:.2f}s ({tb / ta:.1f}x)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
