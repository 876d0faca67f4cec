"""Training-data sampling and packing operators (SURVEY.md §2.9).

The last mile of an LLM data pipeline: deterministic train/test
splitting, reshuffle keys, and sequence packing. Everything is
md5-keyed (engine-portable, reproducible across runs and engines — the
same rule as the dedup tier) and shaped as plain column expressions or
shard-partitioned windows so nothing funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup_text import md5_int


def split_assign(key: Column, train_pct: int = 80, salt: str = "split") -> Column:
    """'train' / 'test' label from a deterministic hash of ``key``.

    ``md5(salt || key) % 100 < train_pct`` — stable under reruns,
    engine-portable, and independent of row order or partitioning (the
    properties a random() split lacks). Salting decorrelates multiple
    splits of the same corpus.
    """
    h = md5_int(F.concat(F.lit(salt + ":"), key.cast("string")))
    return F.when(h % 100 < train_pct, F.lit("train")).otherwise(F.lit("test"))


def shuffle_key(key: Column, epoch: int = 0) -> Column:
    """Deterministic pseudo-random 60-bit sort key for corpus shuffling.

    Ordering by this key is a reproducible global shuffle; different
    ``epoch`` values give independent orders. At scale ``orderBy`` on
    it is a range-partitioned distributed sort — never a single task.
    """
    return md5_int(F.concat(F.lit(f"epoch{epoch}:"), key.cast("string")))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
    shards: int = 32,
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign each document to the
    context-window pack where its first token lands.

    The GPT-pretraining packing semantic: documents are concatenated in
    a fixed order and the token stream is chunked into ``budget``-sized
    windows; a document belongs to the pack containing its start
    offset, i.e. ``pack = floor(prev_cumsum / budget)``. Emits one row
    per document: ``shard, pack_id, doc_id, offset_in_pack``.

    Scale shape: a global cumsum would be one task, so the corpus is
    first split into ``shards`` deterministic md5 shards and packed
    *within* each shard — the window partitions by shard, so all
    shards pack in parallel and pack ids are (shard, pack_id) pairs.
    This matches how distributed tokenizer-packers actually run (one
    sequential pass per worker over its shard).
    """
    sharded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).alias("n_tokens"),
        (md5_int(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))) % shards)
        .cast("int")
        .alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_cumsum = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # integer `div`, not float division: exact at any cumsum magnitude
    return sharded.withColumn("prev", prev_cumsum).select(
        "shard",
        F.expr(f"prev div {budget}").alias("pack_id"),
        "doc_id",
        (F.col("prev") % budget).alias("offset_in_pack"),
    )
