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


def test_idle_host_gate_waits_then_passes(monkeypatch):
    """The bench refuses to measure on a busy host: it retries until
    loadavg drops under the threshold, recording the attempts."""
    import bench

    loads = iter([(7.7, 5.0, 3.0), (4.2, 4.0, 3.0), (1.1, 2.0, 2.5)])
    slept = []
    monkeypatch.setenv("SPARK_GRAFT_LOAD_SLEEP", "30")
    start, gate, waits, load_max = bench.wait_for_idle_host(
        getloadavg=lambda: next(loads), sleep=slept.append
    )
    assert gate == "idle" and waits == 2 and start[0] == 1.1
    assert slept == [30.0, 30.0] and load_max == 2.0


def test_idle_host_gate_exhausts_and_says_so(monkeypatch):
    """Budget exhausted -> the record is still produced but marked
    non-comparable (load_gate='exhausted'), never silently normal."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_LOAD_TRIES", "3")
    start, gate, waits, _ = bench.wait_for_idle_host(
        getloadavg=lambda: (9.9, 9.9, 9.9), sleep=lambda s: None
    )
    assert gate == "exhausted" and waits == 3 and start[0] == 9.9


def test_idle_host_gate_quiet_host_never_sleeps():
    import bench

    start, gate, waits, _ = bench.wait_for_idle_host(
        getloadavg=lambda: (0.5, 0.5, 0.5),
        sleep=lambda s: (_ for _ in ()).throw(AssertionError("slept")),
    )
    assert gate == "idle" and waits == 0
