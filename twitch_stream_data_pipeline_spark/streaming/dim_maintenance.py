"""Streaming dimension maintenance via foreachBatch (SURVEY.md §2.7
"stateful dim maintenance", §3.2/3.3 restatement).

The reference's per-batch read-modify-write of ``current_users`` /
``current_categories`` CSVs (union + key-dedup + delta + overwrite,
``src/curate_data/curate_users_data.py:54-108``) becomes a
``foreachBatch`` upsert into a parquet-backed dimension table: each
micro-batch left-anti-joins the dim, appends only new keys, and emits
the delta downstream — exactly-once per sink via checkpointing instead
of the reference's manual SQS ack discipline.

At warehouse scale the overwrite step would be a MERGE into a
Delta/Iceberg table; with plain parquet we append new-key rows only,
which is equivalent because existing keys are never modified
(state-attrs-win semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import upsert_state


class DimUpserter:
    """foreachBatch sink maintaining an insert-only dimension table."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        keys: list[str],
        schema_ddl: str,
        delta_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.state_path = state_path
        self.keys = keys
        self.schema_ddl = schema_ddl
        self.delta_dir = delta_path or state_path.rstrip("/") + "_deltas"

    def current_state(self) -> DataFrame:
        if os.path.exists(self.state_path):
            return self.spark.read.schema(self.schema_ddl).parquet(self.state_path)
        return self.spark.createDataFrame([], self.schema_ddl)

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        """Process one micro-batch: record the delta, append unseen keys.

        The delta is materialized to the delta sink *first* and the
        state append reads it back from there: the delta's plan reads
        ``state_path``, and appending to a path invalidates any cached
        plan over it — writing the un-materialized delta after touching
        the state would silently re-evaluate it against the new state
        (to an empty set). Materialize-then-append also makes the delta
        sink the durable record a downstream warehouse load consumes
        (the reference's curated-layer CSV, K3).
        """
        state = self.current_state()
        result = upsert_state(batch, state, self.keys)
        if result.delta.isEmpty():
            # reference parity: empty delta -> no writes at all
            # (curate_categories_data.py:82-87 early exit)
            return
        epoch_dir = os.path.join(self.delta_dir, f"epoch={epoch_id}")
        result.delta.write.mode("overwrite").parquet(epoch_dir)
        materialized = self.spark.read.schema(self.schema_ddl).parquet(epoch_dir)
        materialized.write.mode("append").parquet(self.state_path)
