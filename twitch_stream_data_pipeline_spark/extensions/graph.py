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
