"""Graph operators for dedup clustering (SURVEY.md §2.9).

Near-dup pair generation (MinHash-LSH / SimHash / Jaccard tiers) emits
*edges*; what a dedup pipeline consumes is *clusters* — pick one
survivor per connected component. Hash-min label propagation is the
standard distributed formulation (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14): every vertex repeatedly adopts the
minimum label among itself and its neighbors until fixpoint. Rounds
needed equal the graph diameter; near-dup graphs are shallow (clusters
are cliques-ish), so convergence is fast in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label connected components: ``doc_id, cluster_id`` where
    ``cluster_id`` is the minimum vertex id reachable from ``doc_id``
    (its own id for singletons).

    Each round is one join (labels onto the symmetrized edge list) and
    one min-aggregation — both shuffle on vertex id, so a round is two
    hash shuffles of the edge relation, never materializing anything
    quadratic. The driver loop only reads a scalar changed-count per
    round (control plane); labels are ``localCheckpoint``-ed so lineage
    stays O(1) instead of growing by two joins per round. Raises if the
    fixpoint is not reached within ``max_iter`` rounds (diameter bound
    exceeded — for near-dup graphs that means the edge set is wrong).
    """
    # materialize the symmetrized edge list ONCE: it is re-joined every
    # round, and without this every round would recompute the upstream
    # edge-generation pipeline (e.g. the full MinHash-LSH derivation)
    # from the source — measured as the dominant cost, not the rounds.
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # lazy checkpoint: the changed-count action below materializes
        # it, so each round costs ONE job (count) instead of two
        # (eager-checkpoint job + count job) while lineage still
        # truncates at the checkpointed RDD.
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            return labels.select(
                F.col("id").alias(id_col), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def count_triangles(
    edges: DataFrame,
    src_col: str = "ea",
    dst_col: str = "eb",
) -> DataFrame:
    """Distributed triangle count over an undirected simple edge list
    (each edge once, ``src < dst``); returns a 1-row ``n_triangles``.

    Degree-ordered orientation (Cohen, "Graph Twiddling in a MapReduce
    World", CiSE'09; the standard skew answer): each edge points from
    its lower-(degree, id) endpoint to the higher, wedges join on the
    LOW vertex, and a wedge closes iff its outer pair is itself a
    directed edge. Out-degree under this orientation is bounded by
    O(sqrt(m)) for every vertex — a celebrity hub with degree d holds
    d wedge-candidates in the naive middle-vertex join but only
    O(sqrt(m)) here, so per-task fan-out survives power-law skew.
    Three shuffles (degree agg joined twice, wedge equi-join, closing
    equi-join); each triangle counted exactly once at its minimum-
    order vertex.
    """
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    # orient: lower (degree, id) -> higher (degree, id)
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    arcs = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("hi_d"),
    )
    # wedges at the minimum-order vertex: out-neighbors q1 < q2 in the
    # same (degree, id) order the orientation used
    a1 = arcs.select(
        F.col("lo").alias("p"), F.col("hi").alias("q1"),
        F.col("hi_d").alias("q1_d"),
    )
    a2 = arcs.select(
        F.col("lo").alias("p"), F.col("hi").alias("q2"),
        F.col("hi_d").alias("q2_d"),
    )
    wedges = a1.join(a2, "p").filter(
        (F.col("q1_d") < F.col("q2_d"))
        | ((F.col("q1_d") == F.col("q2_d")) & (F.col("q1") < F.col("q2")))
    )
    closing = arcs.select(F.col("lo").alias("q1"), F.col("hi").alias("q2"))
    return (
        wedges.select("q1", "q2")
        .join(closing, ["q1", "q2"])
        .agg(F.count("*").alias("n_triangles"))
    )
