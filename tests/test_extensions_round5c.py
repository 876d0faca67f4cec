"""Tests for the round-5c operators: scalable global row indexing,
salted skew joins, cross-document repeated-span detection, and the
bigram corpus-LM score.

(The registered catalog queries over these are additionally
differentially verified against DuckDB by test_oracle_parity.py; the
tests here pin the semantics against independent pure-Python
references and the bucketing/salting invariance contracts.)
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.extensions.dedup_text import (
    duplicate_span_stats,
)
from twitch_stream_data_pipeline_spark.extensions.sampling import (
    global_row_index,
)
from twitch_stream_data_pipeline_spark.extensions.text_analysis import (
    bigram_logprob,
)
from twitch_stream_data_pipeline_spark.operators.joins import salted_join


# ---------------------------------------------------------------------------
# global_row_index
# ---------------------------------------------------------------------------


def _keys_df(spark, keys):
    return spark.createDataFrame([(k, f"p{k}") for k in keys], "k long, v string")


@pytest.mark.parametrize("buckets", [1, 3, 8])
def test_global_row_index_is_global_rank(spark, buckets):
    keys = [983, 1, 55, 7, 230, 42, 999, 3, 500, 77, 12, 8]
    out = global_row_index(
        _keys_df(spark, keys), key_col="k", buckets=buckets
    ).collect()
    got = {r["k"]: r["row_index"] for r in out}
    expected = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expected
    # payload columns survive untouched
    assert all(r["v"] == f"p{r['k']}" for r in out)


def test_global_row_index_bucket_count_invariance(spark):
    """The index is independent of the bucket layout — any
    order-respecting bucketing yields the same global rank."""
    keys = list(range(0, 400, 7))
    df = _keys_df(spark, keys)
    a = {r["k"]: r["row_index"] for r in global_row_index(df, "k", buckets=2).collect()}
    b = {r["k"]: r["row_index"] for r in global_row_index(df, "k", buckets=13).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, len(keys) + 1))


def test_global_row_index_no_global_data_window(spark):
    """The data-bearing window must be partitioned: the only
    unpartitioned window in the plan runs over the buckets-sized count
    relation, never over the input rows."""
    df = _keys_df(spark, list(range(100)))
    plan = (
        global_row_index(df, "k", buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the row-ranking window carries the bucket partition spec
    assert "row_number()" in plan
    assert "partitionby" in plan.lower().replace(" ", "") or "__b" in plan


# ---------------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    # heavily skewed fact: 90% of rows hit one key
    fact_rows = [(i, 1 if i % 10 else 2, float(i)) for i in range(1, 501)]
    fact = spark.createDataFrame(fact_rows, "rid long, key long, x double")
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unused")], "key long, name string"
    )
    salted = salted_join(fact, dim, on="key", row_key=["rid"], buckets=8)
    plain = fact.join(dim, "key")
    a = sorted(map(tuple, salted.select("rid", "key", "x", "name").collect()))
    b = sorted(map(tuple, plain.select("rid", "key", "x", "name").collect()))
    assert a == b and len(a) == 500


def test_salted_join_spreads_hot_key(spark):
    """Every salt bucket receives a share of the hot key's rows — the
    whole point of salting."""
    fact = spark.createDataFrame(
        [(i, 1) for i in range(1, 401)], "rid long, key long"
    )
    dim = spark.createDataFrame([(1, "hot")], "key long, name string")
    n_buckets = 8
    salts = (
        fact.select(
            F.pmod(F.xxhash64("rid"), F.lit(n_buckets)).alias("__salt")
        )
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(salts) == n_buckets  # all buckets populated
    assert max(r["count"] for r in salts) < 400  # no bucket holds everything
    joined = salted_join(fact, dim, on="key", row_key=["rid"], buckets=n_buckets)
    assert joined.count() == 400


# ---------------------------------------------------------------------------
# duplicate_span_stats
# ---------------------------------------------------------------------------


SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens


def _span_docs(spark):
    rows = [
        # doc 1 and 2 share the 8-token span verbatim (plus unique tails)
        (1, SPAN + " one unique tail here"),
        (2, "prefix words first " + SPAN),
        # doc 3: entirely unique text, long enough to carry k-grams
        (3, "nine distinct words nobody else ever wrote down anywhere at all"),
        # doc 4: shorter than k tokens -> zero positions
        (4, "too short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_span_stats_reference(spark):
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_span_docs(spark), k=8, min_docs=2).collect()
    }
    # independent python reference
    docs = {r[0]: r[1].lower().split() for r in _span_docs(spark).collect()}
    grams = {
        d: [tuple(t[i : i + 8]) for i in range(len(t) - 7)] for d, t in docs.items()
    }
    docs_per_gram = Counter()
    for d, gs in grams.items():
        for g in set(gs):
            docs_per_gram[g] += 1
    for d, gs in grams.items():
        n_dup = sum(1 for g in gs if docs_per_gram[g] >= 2)
        assert out[d]["n_positions"] == len(gs)
        assert out[d]["n_dup_positions"] == n_dup
        want = n_dup / len(gs) if gs else 0.0
        assert abs(out[d]["dup_frac"] - want) < 1e-12
    # the shared-span docs actually flag, the unique doc does not
    assert out[1]["n_dup_positions"] == 1 and out[2]["n_dup_positions"] == 1
    assert out[3]["n_dup_positions"] == 0
    assert out[4]["n_positions"] == 0 and out[4]["dup_frac"] == 0.0


def test_duplicate_span_stats_within_doc_repeat_not_counted(spark):
    """min_docs=2 counts CROSS-document sharing only: a doc repeating
    its own phrase is repetition_stats territory, not span sharing."""
    text = (SPAN + " ") * 3  # 24 tokens, every 8-gram repeats within the doc
    df = spark.createDataFrame([(1, text.strip())], "doc_id long, text string")
    row = duplicate_span_stats(df, k=8, min_docs=2).collect()[0]
    assert row["n_positions"] == 17
    assert row["n_dup_positions"] == 0


# ---------------------------------------------------------------------------
# bigram_logprob
# ---------------------------------------------------------------------------


def test_bigram_logprob_reference(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "a dog sat"),
        (4, "single"),  # 1 token -> no bigrams -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # python reference
    toks = {r[0]: r[1].lower().split() for r in rows}
    c2 = Counter()
    for t in toks.values():
        for i in range(len(t) - 1):
            c2[(t[i], t[i + 1])] += 1
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    for d, t in toks.items():
        pairs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        if not pairs:
            assert d not in out
            continue
        lp = sum(math.log(c2[p] / c1[p[0]]) for p in pairs) / len(pairs)
        assert out[d]["n_bigrams"] == len(pairs)
        assert abs(out[d]["bigram_logprob"] - lp) < 1e-6
    # every per-position term is <= 0 by construction
    assert all(r["bigram_logprob"] <= 0.0 for r in out.values())


def test_bigram_orders_scrambled_below_natural(spark):
    """Word order signal: a corpus of one repeated natural sentence
    plus one scrambled copy — the scrambled doc's bigrams are rare
    (cross the grain of the corpus), so it scores strictly lower."""
    natural = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy jumps fox brown the"
    rows = [(i, natural) for i in range(1, 9)] + [(9, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bigram_logprob"] for r in bigram_logprob(df).collect()}
    assert out[9] < out[1]


def test_global_row_index_string_keys(spark):
    """Non-numeric keys route through the sampled-boundary path and
    still produce the exact sorted-order permutation."""
    keys = [f"doc-{c}{i:03d}" for i, c in enumerate("zyxwvutsrqponml")]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["row_index"]
        for r in global_row_index(df, "k", buckets=4).collect()
    }
    assert got == {k: i + 1 for i, k in enumerate(sorted(keys))}
