"""Distributed spherical k-means + cluster-balanced sampling
(`extensions.clustering`): reference-equality against an independent
pure-numpy Lloyd implementation of the same spec, byte-identical
partition independence, degenerate inputs, and the sampling contract.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.extensions.clustering import (
    assign_with_model,
    build_kmeans_model,
    cluster_balanced_sample,
    kmeans_embeddings,
)

SF = "/root/testdata/sf0.001"


def numpy_kmeans_reference(ids, qvecs, k, iters):
    """Independent driver-only implementation of the SAME spec the
    distributed operator claims: centroids quantized round(c*1e6) to
    int64 before every scoring pass, scores = exact int dot / sqrt of
    exact int norms (guarded), init = unit rows of the first k vectors
    by id, spherical Lloyd with EXACT integer coordinate sums, empty
    clusters keep their centroid, ties to the lowest cluster. No code
    shared with the operator beyond numpy itself.

    ``qvecs`` are the ALREADY-QUANTIZED int64 rows: the row
    quantization convention (Spark's ``round(float32(x) * 1000)``,
    HALF_UP on the float32-precision product) belongs to
    `quantized_embedding` and is oracle-pinned elsewhere — callers
    collect it from the engine expression (or supply exact-grid ints)
    so this reference cannot silently diverge on .5 boundaries or
    float32-vs-float64 product rounding."""
    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids)[order]
    Q = np.asarray(qvecs, dtype=np.int64)[order]

    def unit(X):
        n = np.linalg.norm(X, axis=1, keepdims=True)
        return X / np.where(n == 0, 1.0, n)

    def score(cent):
        cq = np.round(cent * 1_000_000).astype(np.int64)
        dots = (Q @ cq.T).astype(np.float64)
        qn = (Q * Q).sum(axis=1).astype(np.float64)
        cn = (cq * cq).sum(axis=1).astype(np.float64)
        return dots / np.sqrt(
            np.where(qn == 0, 1.0, qn)[:, None]
            * np.where(cn == 0, 1.0, cn)[None, :]
        )

    cent = unit(Q[: min(k, len(Q))].astype(np.float64))
    for _ in range(iters):
        assign = score(cent).argmax(axis=1)
        for c in range(len(cent)):
            members = Q[assign == c]
            if len(members):
                # exact int64 sum, then float64 once — the operator's
                # collect side does the same conversion
                s = members.sum(axis=0).astype(np.float64)
                cent[c] = unit(s[None, :])[0]
    sims = score(cent)
    assign = sims.argmax(axis=1)
    return {
        int(i): (int(a), float(s))
        for i, a, s in zip(ids, assign, sims[np.arange(len(assign)), assign])
    }


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_matches_independent_reference(spark, emb):
    from twitch_stream_data_pipeline_spark.extensions.similarity import (
        quantized_embedding,
    )

    got = {
        r["vec_id"]: (r["cluster"], r["cosine"])
        for r in kmeans_embeddings(emb, k=8, iters=5).collect()
    }
    # quantize through the ENGINE expression so the reference shares
    # the exact row ints (float32-product HALF_UP is Spark's semantics)
    rows = emb.select(
        "vec_id", quantized_embedding(F.col("embedding")).alias("qv")
    ).collect()
    expect = numpy_kmeans_reference(
        [r["vec_id"] for r in rows],
        [r["qv"] for r in rows],
        k=8,
        iters=5,
    )
    assert set(got) == set(expect)
    # exact float equality: every score is integer arithmetic plus a
    # fixed IEEE op sequence, so the distributed result and the
    # driver-only reference must agree to the last bit
    for i in got:
        assert got[i] == expect[i], i
    # sanity: the fixture actually spreads over several clusters
    assert len({c for c, _ in got.values()}) >= 4


def test_kmeans_partition_independent(spark, emb):
    a = kmeans_embeddings(emb.repartition(1), k=6, iters=4).collect()
    b = kmeans_embeddings(emb.repartition(13), k=6, iters=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_degenerate_inputs(spark, emb):
    # empty input -> empty typed result
    assert kmeans_embeddings(emb.limit(0), k=4, iters=3).count() == 0
    # k > n: every row still assigned, clusters a subset of 0..n-1
    few = emb.orderBy("vec_id").limit(3)
    out = kmeans_embeddings(few, k=10, iters=3).collect()
    assert len(out) == 3
    assert {r["cluster"] for r in out} <= {0, 1, 2}
    # an all-zero embedding follows the zero-norm contract: cluster 0,
    # cosine 0, no NaN
    dim = len(few.first()["embedding"])
    with_zero = few.unionByName(
        spark.createDataFrame(
            [(999999, [0.0] * dim, 0)], "vec_id long, embedding array<float>, label int"
        )
    )
    z = {
        r["vec_id"]: r
        for r in kmeans_embeddings(with_zero, k=2, iters=3).collect()
    }[999999]
    assert z["cluster"] == 0 and z["cosine"] == 0.0


def test_cluster_balanced_sample_contract(spark, emb):
    assigned = kmeans_embeddings(emb, k=8, iters=5)
    sampled = cluster_balanced_sample(assigned, per_cluster=5)
    per = {
        r["cluster"]: r["n"]
        for r in sampled.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    for c, n in per.items():
        assert n == min(5, full[c]), c
    # deterministic: same rows under a different partitioning
    again = cluster_balanced_sample(assigned.repartition(7), per_cluster=5)
    assert sorted(map(tuple, sampled.collect())) == sorted(
        map(tuple, again.collect())
    )
    # the sample is a subset of the input
    assert sampled.join(assigned, ["vec_id", "cluster"], "left_anti").count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st

# vectors on the k/8 grid: x*1000 = 125k is an exact float64 integer,
# so quantization is unambiguous in BOTH engines and the property
# targets the Lloyd/assignment/partial-sum logic itself (the repo's
# half-away-from-zero rounding convention is oracle-pinned elsewhere).
_vec = st.lists(
    st.integers(min_value=-16, max_value=16).map(lambda k: k / 8.0),
    min_size=3,
    max_size=3,
)
_rows = st.lists(_vec, min_size=1, max_size=12)


@settings(max_examples=10, deadline=None)
@given(_rows, st.integers(1, 5), st.integers(0, 4), st.integers(1, 5))
def test_kmeans_property_matches_reference(spark, rows, k, iters, parts):
    """Random small corpora — duplicates, zero vectors, k > n, iters=0
    all arise — must match the independent numpy reference EXACTLY,
    under an arbitrary input partitioning."""
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(rows)],
        "vec_id long, embedding array<double>, label int",
    ).repartition(parts)
    got = {
        r["vec_id"]: (r["cluster"], r["cosine"])
        for r in kmeans_embeddings(df, k=k, iters=iters).collect()
    }
    # on the k/8 grid x*1000 is an exact integer, so Python round ==
    # the engine quantization
    qvecs = [[round(x * 1000) for x in v] for v in rows]
    expect = numpy_kmeans_reference(list(range(len(rows))), qvecs, k, iters)
    assert got == expect


def test_persisted_model_assignment_equals_in_memory(spark, emb, tmp_path):
    """The operational form: build once, assign every batch with the
    persisted model. The persisted quantized ints ARE the scoring
    inputs, so disk must be EXACTLY the in-memory result — last bit."""
    path = str(tmp_path / "kmodel")
    build_kmeans_model(emb, path, k=8, iters=5)
    via_model = sorted(
        map(tuple, assign_with_model(spark, path, emb).collect())
    )
    in_memory = sorted(
        map(tuple, kmeans_embeddings(emb, k=8, iters=5).collect())
    )
    assert via_model == in_memory
    # an unseen ingest batch assigns without touching the corpus: the
    # only scan in the plan is the batch itself (plus the model read,
    # which is a driver-side pyarrow read, not a Spark scan)
    batch = emb.orderBy("vec_id").limit(7).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    out = assign_with_model(spark, path, batch)
    assert out.count() == 7
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
    # assignment is pure routing: the shifted copies land exactly where
    # their originals did
    orig = {
        r["vec_id"]: r["cluster"]
        for r in assign_with_model(spark, path, emb.orderBy("vec_id").limit(7)).collect()
    }
    got = {r["vec_id"] - 100000: r["cluster"] for r in out.collect()}
    assert got == orig


def test_persisted_model_guards(spark, emb, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        build_kmeans_model(emb.limit(0), str(tmp_path / "nope"), k=4)
    with _pytest.raises(Exception):
        assign_with_model(spark, str(tmp_path / "missing"), emb)


def test_cluster_balanced_sample_plans_partitioned_window(spark, emb):
    """The window must partition on the cluster column — a global
    window here would single-partition the corpus (the plan-lint
    class)."""
    assigned = kmeans_embeddings(emb, k=4, iters=2)
    plan = cluster_balanced_sample(assigned, 3)._jdf.queryExecution().executedPlan().toString()
    window_lines = [l for l in plan.splitlines() if "Window" in l]
    assert window_lines and all("cluster" in l for l in window_lines)


# ---------------------------------------------------------------------------
# assign_to_centroids — the factored-out assignment kernel (round 8):
# fixed caller-supplied centroids, scored RAW (no unit normalization),
# the exact-mode entry the kmeans_assign_exact oracle grades.
# ---------------------------------------------------------------------------

from twitch_stream_data_pipeline_spark.extensions.clustering import (  # noqa: E402
    assign_to_centroids,
)


def _qrows(df):
    from twitch_stream_data_pipeline_spark.extensions.similarity import (
        quantized_embedding,
    )

    rows = (
        df.select("vec_id", quantized_embedding(F.col("embedding")).alias("qv"))
        .orderBy("vec_id")
        .collect()
    )
    return [r["vec_id"] for r in rows], np.array(
        [r["qv"] for r in rows], dtype=np.int64
    )


def test_assign_to_centroids_matches_independent_reference(spark, emb):
    """EXACT float equality (last bit) vs an independent numpy
    restatement of the spec: raw int64-quantized centroids, score =
    exact int dot / sqrt(exact int norms, guarded), first-max
    tie-break."""
    k = 8
    ids, Q = _qrows(emb)
    C = Q[:k]
    dots = (Q @ C.T).astype(np.float64)
    qn = (Q * Q).sum(axis=1).astype(np.float64)
    cn = (C * C).sum(axis=1).astype(np.float64)
    sims = dots / np.sqrt(
        np.where(qn == 0, 1.0, qn)[:, None]
        * np.where(cn == 0, 1.0, cn)[None, :]
    )
    want = {
        int(i): (int(a), float(s))
        for i, a, s in zip(
            ids, sims.argmax(axis=1), sims[np.arange(len(ids)), sims.argmax(axis=1)]
        )
    }
    got = {
        r["vec_id"]: (r["cluster"], r["cosine"])
        for r in assign_to_centroids(emb, emb.orderBy("vec_id").limit(k)).collect()
    }
    assert got == want  # exact, not approx — the determinism contract


def test_assign_to_centroids_partition_independent(spark, emb):
    base = {
        tuple(r)
        for r in assign_to_centroids(
            emb.repartition(1), emb.orderBy("vec_id").limit(5)
        ).collect()
    }
    other = {
        tuple(r)
        for r in assign_to_centroids(
            emb.repartition(7), emb.orderBy("vec_id").limit(5)
        ).collect()
    }
    assert base == other


def test_assign_to_centroids_scale_invariant_and_tiebreak(spark):
    """cosine divides by the centroid norm, so doubling a centroid
    changes nothing (and x2 is fp-exact: byte-identical cosines);
    duplicated centroids tie on every score and the LOWEST cluster id
    wins."""
    rows = [(i, [float(x) / 1000.0 for x in v]) for i, v in
            [(0, [1000, 0]), (1, [0, 1000]), (2, [700, 700]), (3, [0, 0])]]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    c2 = spark.createDataFrame(
        [(0, [2.0, 0.0]), (1, [0.0, 2.0])], "vec_id long, embedding array<float>"
    )
    a1 = sorted(tuple(r) for r in assign_to_centroids(df, c1).collect())
    a2 = sorted(tuple(r) for r in assign_to_centroids(df, c2).collect())
    assert a1 == a2
    # the diagonal row ties between both centroids -> cluster 0;
    # the zero row scores 0 everywhere -> cluster 0 (module contract)
    by_id = {r[0]: r[1] for r in a1}
    assert by_id[2] == 0 and by_id[3] == 0
    dup = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert {r["cluster"] for r in assign_to_centroids(df, dup).collect()} == {0}


def test_assign_to_centroids_empty_inputs(spark, emb):
    empty = emb.filter(F.lit(False))
    out = assign_to_centroids(emb, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cluster", "cosine"]
    out2 = assign_to_centroids(empty, emb.orderBy("vec_id").limit(3))
    assert out2.count() == 0
    assert [f.name for f in out2.schema.fields] == ["vec_id", "cluster", "cosine"]
