"""Whole-catalog physical-plan lint: the scale-discipline gate.

Every catalog query's physical plan is checked for the two node types
that silently become 100 TB scale-killers when they appear by ACCIDENT
(a missed join key, a non-broadcastable theta join):

- ``CartesianProduct`` — never acceptable; the catalog contains none.
- ``BroadcastNestedLoopJoin`` — acceptable ONLY where the broadcast
  side is bounded by construction: a single-row aggregate crossJoin
  (corpus totals, chi-square margins) or a deliberately non-equi
  broadcast join whose build side is contract-bounded (the IVF probe's
  ``array_contains`` over Q << N queries, the range join's bucket
  bounds). Those sites are whitelisted BY NAME with the justification;
  the whitelist is exact, so an accidental BNLJ in any other query —
  or a whitelisted query losing its BNLJ without the list being
  updated — fails the lint.

Plans are built (not executed) at sf0.001; index-backed queries build
their scratch layouts during plan construction, which is why this
test shares the module-scoped Spark session.
"""

from __future__ import annotations

import pytest

from twitch_stream_data_pipeline_spark.plans import CATALOG

SF = "/root/testdata/sf0.001"

#: query -> why a BroadcastNestedLoopJoin is legitimate there
BNLJ_WHITELIST = {
    "embedding_near_dup": "non-equi broadcast of the quantized centroid relation (label-bounded)",
    "ivf_index_knn": "array_contains(probe_cells) broadcast of the Q<<N query relation",
    "embedding_ingest": "IVF probe join + batch x batch in-batch pair join (both ingest-batch-bounded broadcasts)",
    "range_join_quantity_buckets": "non-equi residual over broadcast bucket bounds (bucket-bounded)",
    "tfidf_top_terms": "single-row corpus-size aggregate crossJoin",
    "bm25_topk": "single-row corpus stats (N, avgdl) crossJoin",
    "unigram_logprob": "single-row corpus token total crossJoin",
    "nb_lang_classifier": "single-row training totals crossJoin",
    "temperature_mixture": "single-row c_min aggregate crossJoin",
    "pretrain_pipeline": "temperature stage's single-row c_min crossJoin",
    "triangle_count": "crossJoin of two single-row counts (n_edges x n_triangles)",
    "skew_report_lang": "single-row total-rows aggregate crossJoin",
    "chi_square_lang_source": "single-row grand-total crossJoin for expected counts",
    "embedding_covariance": "single-row vector-count aggregate crossJoin",
    "pareto_abc": "single-row revenue-total crossJoin",
    "basket_affinity": "single-row order-count crossJoin for lift",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, q in CATALOG.items():
        out[name] = (
            q.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_bnlj_only_where_bounded_by_contract(plans):
    have = {n for n, p in plans.items() if "BroadcastNestedLoopJoin" in p}
    unexpected = have - set(BNLJ_WHITELIST)
    assert not unexpected, f"unwhitelisted BroadcastNestedLoopJoin: {unexpected}"
    stale = set(BNLJ_WHITELIST) - have
    assert not stale, f"whitelist entries without a BNLJ (update the list): {stale}"
