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
        "intersect_users",
        "above_avg_orders",
        "scalar_subquery_filter",
    }
    window = set(EXPOSURE_ORDER[:HARNESS_WINDOW])
    assert never_verified <= window, never_verified - window


def test_queries_and_oracles_follow_exposure_order():
    assert list(queries()) == list(EXPOSURE_ORDER)
    oracles = oracle_sql()
    assert list(oracles) == [n for n in EXPOSURE_ORDER if CATALOG[n].oracle]
    assert all(sql for sql in oracles.values())
