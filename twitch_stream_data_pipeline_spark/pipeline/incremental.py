"""Incremental partition processing — the batch restatement of the
reference's event-driven orchestration.

In the reference, every stage runs because a NEW object landed: S3
ObjectCreated → SNS/SQS → the next Lambda processes exactly that object
(`src/get_raw_data/get_raw_streams_data.py:41-48` consumes the queue;
the curate stages fire per uploaded key). A batch engine gets the same
"process only what's new" economics by diffing *partition directories*
between a source layer and its downstream layer: partitions present
upstream but absent downstream are the work list. Listing is pure
filesystem metadata (one `listStatus` per layer — no footers, no data
pages), the catch-up read is partition-pruned to the work list, and the
write is dynamic partition overwrite, so a crashed run simply reruns:
the half-written partition is replaced atomically and everything else
is untouched. At 100 TB this is the difference between a 15-minute
catch-up and a full-table rebuild.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import read_partitioned_verbatim, write_partitioned


def list_partition_values(
    spark: SparkSession, path: str, partition_col: str = "day_date_id"
) -> set[str]:
    """Partition values present under ``path`` (``{col}={value}``
    directories), via the Hadoop FileSystem API so the same code lists
    local paths in tests and object stores on a cluster. Metadata only:
    one directory listing, no file reads."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return set()
    prefix = f"{partition_col}="
    vals = set()
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            vals.add(name[len(prefix) :])
    return vals


def unprocessed_partitions(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_col: str = "day_date_id",
) -> list[str]:
    """Sorted partition values present in ``src_path`` but not yet in
    ``dst_path`` — the incremental work list."""
    src = list_partition_values(spark, src_path, partition_col)
    dst = list_partition_values(spark, dst_path, partition_col)
    return sorted(src - dst)


def run_incremental(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    transform: Callable[[DataFrame], DataFrame],
    partition_col: str = "day_date_id",
    partitions: Sequence[str] | None = None,
) -> list[str]:
    """Process only the source partitions missing downstream.

    ``transform`` maps the partition-pruned source frame to the output
    frame; it must preserve ``partition_col`` (the output is written
    partitioned by it). ``partitions`` overrides discovery for targeted
    reprocessing (a late-data backfill of named days). Returns the list
    of partition values processed — empty means the layers were already
    in sync and NOTHING was read or written.

    The write uses dynamic partition overwrite (a per-write option,
    never session state): only the processed partitions' directories
    are replaced, so reruns after failure are idempotent and
    concurrent readers of other partitions never see a partial table.

    The source is read via :func:`~..sinks.read_partitioned_verbatim`
    so partition directory values round-trip exactly: with type
    inference, ``slot=0015`` would be read as int 15 and re-written to
    a NEW ``slot=15`` directory downstream — the work list would then
    never drain (``0015`` stays "unprocessed" forever) and the two
    layers' directory names would desync. The diffing itself compares
    raw directory names, so the whole loop is inference-proof.
    """
    todo = (
        sorted(str(p) for p in partitions)
        if partitions is not None
        else unprocessed_partitions(spark, src_path, dst_path, partition_col)
    )
    if not todo:
        return []
    src = read_partitioned_verbatim(spark, src_path).filter(
        F.col(partition_col).isin(todo)
    )
    out = transform(src)
    if partition_col not in out.columns:
        raise ValueError(
            f"transform dropped {partition_col!r}; incremental output must "
            "keep the partition column so the write can route it"
        )
    write_partitioned(
        out,
        dst_path,
        [partition_col],
        mode="overwrite",
        partition_overwrite_mode="dynamic",
    )
    return todo
