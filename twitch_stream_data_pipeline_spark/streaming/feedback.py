"""The popularity -> fan-out feedback loop (SURVEY.md §3.1 steps 6 -> 1).

In the reference, the category popularity of batch *t* steers the
ingest fan-out of batch *t+1*: ``get_category_popularity`` writes a
popularity CSV (``src/other/get_category_popularity.py:42-52``) that
``create_category_group_messages`` consumes — joining it onto the
current category set with default weight 1 for unseen categories,
greedy-packing into <=25 weight-capped groups, and emitting one SQS
work-unit message per group (``src/other/
create_category_group_messages.py:128-157``; the popularity file is
deleted after use, :152).

Spark restatement: a ``foreachBatch`` consumer on the curated stream.
Per micro-batch it computes the popularity aggregate (A1), packs the
groups (A4, driver-side over the tiny aggregated frame), and
*overwrites* a work-list table — the queue analog (K4) realized as a
table the next ingest cycle reads, with overwrite giving the same
consume-once semantics as the reference's delete-after-use. State
never accumulates: each epoch's plan fully replaces the last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import pack_into_groups


class FanoutPlanner:
    """``foreachBatch`` consumer emitting the next cycle's work list.

    Parameters mirror the reference's constants: ``max_groups=25``
    (Lambda concurrency), ``cap=7000`` (streamer weight per group).
    """

    def __init__(
        self,
        spark: SparkSession,
        work_list_path: str,
        max_groups: int = 25,
        cap: int = 7000,
    ) -> None:
        self.spark = spark
        self.work_list_path = work_list_path
        self.max_groups = max_groups
        self.cap = cap

    def popularity(self, curated: DataFrame) -> DataFrame:
        """A1: streams per category for this batch."""
        return curated.groupBy("category_id").agg(
            F.count("stream_id").alias("num_of_streamers")
        )

    def __call__(self, curated_batch: DataFrame, epoch_id: int) -> None:
        pop = self.popularity(curated_batch)
        groups = pack_into_groups(
            pop,
            key="category_id",
            weight="num_of_streamers",
            max_groups=self.max_groups,
            cap=self.cap,
        )
        rows = [
            (int(gid), str(cid)) for gid, g in enumerate(groups) for cid in g
        ]
        if not rows:  # empty batch: leave the previous plan in place
            return
        (
            self.spark.createDataFrame(rows, "group_id INT, category_id STRING")
            .coalesce(1)  # tiny control-plane table: one file
            .write.mode("overwrite")
            .parquet(self.work_list_path)
        )

    def current_work_list(self) -> DataFrame:
        return self.spark.read.parquet(self.work_list_path)
