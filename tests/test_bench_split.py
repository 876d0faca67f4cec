"""Drift guard for bench.py's build/probe split: the split's probe
plans hand-mirror the catalog entries' parameters, so a catalog
re-parameterization (n_probe, thresholds, id ranges) that isn't
propagated would silently make the probe timings measure a different
query. Pin result equality per index query at smoke scale."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _index_splits  # noqa: E402

from twitch_stream_data_pipeline_spark.plans import CATALOG  # noqa: E402

from .conftest import SF_SMOKE


def _key(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize(
    "name", ["ivf_index_knn", "lsh_index_probe", "dedup_ingest",
             "embedding_ingest", "ivfpq_index_knn"]
)
def test_bench_probe_equals_catalog_query(spark, name):
    build, probe = _index_splits(SF_SMOKE)[name]
    ctx = build(spark)
    got = _key(probe(spark, ctx).collect())
    want = _key(CATALOG[name].fn(spark, SF_SMOKE).collect())
    assert got == want, f"{name}: bench probe drifted from catalog entry"
