"""Invariants on the catalog's harness-exposure order.

The external correctness harness grades only the first 50 entries of
``queries()``. ``EXPOSURE_ORDER`` exists so every oracle-bearing query
rotates through that window; these tests keep the list honest as the
catalog grows.
"""

from __future__ import annotations

from twitch_stream_data_pipeline_spark.plans.catalog import (
    CATALOG,
    EXPOSURE_ORDER,
    oracle_sql,
    queries,
)

HARNESS_WINDOW = 50


def test_exposure_order_is_permutation_of_catalog():
    assert sorted(EXPOSURE_ORDER) == sorted(CATALOG), (
        set(EXPOSURE_ORDER) ^ set(CATALOG)
    )
    assert len(set(EXPOSURE_ORDER)) == len(EXPOSURE_ORDER)


def test_first_window_is_all_oracle_bearing():
    window = EXPOSURE_ORDER[:HARNESS_WINDOW]
    missing = [n for n in window if CATALOG[n].oracle is None]
    assert not missing, f"no_oracle queries waste gradable slots: {missing}"


def test_no_oracle_queries_registered_last():
    tail = EXPOSURE_ORDER[HARNESS_WINDOW:]
    no_oracle = [n for n, q in CATALOG.items() if q.oracle is None]
    assert set(no_oracle) <= set(tail)


def test_never_verified_r2_queries_inside_window():
    """Round-2 VERDICT task #1: every oracle-bearing query that had no
    CORRECTNESS row after two rounds must now be graded."""
    never_verified = {
        "salted_distinct_users",
        "csv_roundtrip",
        "simhash_near_dup",
        "tfidf_top_terms",
        "corpus_curation",
        "frame_sample",
        "dedup_clusters",
        "train_test_split",
        "pack_sequences",
        "mixture_sample",
        "decontaminate",
        "zscore_by_type",
        "repetition_stats",
        "pii_scrub",
        "chunk_documents",
        "above_avg_orders",
        # intersect_users and scalar_subquery_filter left this set in
        # round 5: graded green in r03 AND r04, they rotated out to
        # free slots for the two new round-5 operators (see the
        # rotation map in test_window_is_round4_order_with_...).
    }
    window = set(EXPOSURE_ORDER[:HARNESS_WINDOW])
    assert never_verified <= window, never_verified - window


def test_queries_and_oracles_follow_exposure_order():
    assert list(queries()) == list(EXPOSURE_ORDER)
    oracles = oracle_sql()
    assert list(oracles) == [n for n in EXPOSURE_ORDER if CATALOG[n].oracle]
    assert all(sql for sql in oracles.values())


def test_cli_list_and_lookup():
    """The CLI runner's non-Spark paths: full list, tag filter, oracle
    print, and the unknown-name hint."""
    import io

    import pytest as _pytest

    from twitch_stream_data_pipeline_spark.__main__ import main
    from twitch_stream_data_pipeline_spark.plans.catalog import EXPOSURE_ORDER

    buf = io.StringIO()
    assert main(["list"], out=buf) == 0
    assert len(buf.getvalue().strip().splitlines()) == len(EXPOSURE_ORDER)

    buf = io.StringIO()
    assert main(["list", "--tag", "variant"], out=buf) == 0
    assert "variant_topk_props" in buf.getvalue()

    buf = io.StringIO()
    assert main(["oracle", "pricing_summary"], out=buf) == 0
    assert "GROUP BY l_returnflag" in buf.getvalue()

    with _pytest.raises(SystemExit, match="did you mean.*pricing_summary"):
        main(["run", "pricing"])
    with _pytest.raises(SystemExit, match="no SQL oracle"):
        main(["oracle", "lsh_knn"])


def test_window_is_round4_order_with_documented_r5_rotation():
    """VERDICT r4 #2: the round-5 window is the round-4 graded order
    with EXACTLY six documented substitutions, each at the position of
    the query it replaces — the never-driver-graded oracle-bearing
    queries plus the two new round-5 operators rotate in, six
    triple-green trivial queries rotate out, and every other position
    is byte-identical to what the r4 harness graded."""
    import json

    from pathlib import Path

    r4_path = Path(__file__).resolve().parents[1] / "CORRECTNESS_r04.json"
    r4_graded = list(json.load(open(r4_path)).keys())
    rotation = {
        "pricing_summary": "variant_topk_props",
        "rollup_lineitem": "stratified_sample",
        "value_percentiles": "multimodal_decode",
        "embedding_centroid": "ivf_knn_exact",
        "intersect_users": "winnow_near_dup",
        "scalar_subquery_filter": "bpe_token_stats",
    }
    expected = [rotation.get(n, n) for n in r4_graded]
    assert list(EXPOSURE_ORDER[:HARNESS_WINDOW]) == expected
    # the rotated-out queries stay registered and oracle-bearing, right
    # after the window (rotated-green evidence remains reproducible)
    tail = list(EXPOSURE_ORDER[HARNESS_WINDOW:])
    for name in rotation:
        assert name in tail and CATALOG[name].oracle, name


def test_cli_verify_rejects_rows_only():
    import pytest as _pytest

    from twitch_stream_data_pipeline_spark.__main__ import main

    with _pytest.raises(SystemExit, match="no SQL oracle"):
        main(["verify", "lsh_knn"])


def test_cli_verify_max_rows_cap(spark):
    """VERDICT r4 #7: the differential refuses to collect results past
    --max-rows instead of OOMing the driver; under the cap it still
    reports MATCH."""
    import io

    import pytest as _pytest

    from twitch_stream_data_pipeline_spark.__main__ import main

    with _pytest.raises(SystemExit, match="max-rows"):
        main(
            [
                "verify",
                "pricing_summary",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--max-rows",
                "2",
            ]
        )

    buf = io.StringIO()
    assert (
        main(
            ["verify", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"],
            out=buf,
        )
        == 0
    )
    assert buf.getvalue().startswith("MATCH")
