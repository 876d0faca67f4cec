"""Training-data sampling and packing operators (SURVEY.md §2.9).

The last mile of an LLM data pipeline: deterministic train/test
splitting, reshuffle keys, and sequence packing. Everything is
md5-keyed (engine-portable, reproducible across runs and engines — the
same rule as the dedup tier) and shaped as plain column expressions or
shard-partitioned windows so nothing funnels through one task.
"""

from __future__ import annotations

from collections.abc import Sequence

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


def mixture_sample(
    df: DataFrame,
    rates: dict[str, int],
    default_pct: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Per-source down-sampling to a target data mixture.

    ``rates`` maps source name -> keep percentage; unlisted sources keep
    ``default_pct``. Selection is md5-hash arithmetic on the document id
    (same contract as :func:`split_assign`): the sampled subset is
    reproducible, independent of partitioning, and *stable under corpus
    growth* — a document's keep/drop never flips when other documents
    arrive, which per-partition or reservoir sampling cannot promise.
    One narrow filter, no shuffle.
    """
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 100
    pct: Column = F.lit(default_pct)
    for src, p in sorted(rates.items()):
        pct = F.when(F.col(source_col) == src, F.lit(p)).otherwise(pct)
    return df.filter(h < pct)


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-count stratified sampling: the ``n_per_stratum`` documents
    with the smallest salted md5 hash per stratum — "exactly 100k docs
    per language/domain", the fixed-quota twin of the rate-based
    :func:`mixture_sample`.

    Hash-ordered selection keeps the sample deterministic across
    engines, partitionings, and reruns, and *almost* stable under
    corpus growth: a new document displaces at most the current largest
    hash in its stratum (bounded churn), where random sampling would
    reshuffle everything. The per-stratum quota runs as a ranking
    window whose ``rank <= n`` filter Spark compiles to
    WindowGroupLimit — each map task pre-prunes to its local top-n
    BEFORE the stratum shuffle, so the exchange carries n rows per
    stratum per task, never the corpus.
    """
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col))
    return (
        df.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= n_per_stratum)
        .drop("smp_rank")
    )


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Square-root temperature rebalancing of a multi-source corpus:
    downsample source ``s`` at rate ``sqrt(c_min / c_s)``, so kept
    counts land proportional to ``c_s^0.5`` — the ``alpha = 0.5``
    temperature-sampled mixture of multilingual/multi-domain
    pretraining (mBERT's exponent-smoothed language sampling, T5's
    temperature-scaled mixing; arXiv:1910.10683 §3.4.3 uses the same
    power-law flattening): head sources shrink toward the tail instead
    of drowning it, the smallest source keeps 100%.

    Two-phase but one data pass: the per-source census is a map-side-
    combined aggregate collapsing to ``|sources|`` rows, the rate
    relation broadcasts back, and the keep rule is the house md5
    thinning (reproducible, partition-independent, stable per document
    under reruns). The rate is ``sqrt`` of a correctly-rounded IEEE
    division — both bit-exact operations in every engine, unlike
    ``pow(x, alpha)`` (libm-dependent last-ulp), which is why the
    exponent is fixed at the sqrt point of the temperature family.
    Keep decisions compare against an integer parts-per-million
    threshold: ``md5 % 1e6 < floor(rate * 1e6)``.

    NULL-source rows are excluded up front: the census and the keep
    decision see the same population (a NULL group may not set
    ``c_min`` and then vanish from the equi-join output anyway).
    """
    df = df.filter(F.col(source_col).isNotNull())
    cnts = df.groupBy(source_col).agg(F.count("*").alias("c"))
    cmin = cnts.agg(F.min("c").alias("c_min"))
    rates = cnts.crossJoin(F.broadcast(cmin)).select(
        source_col,
        F.floor(
            F.sqrt(F.col("c_min").cast("double") / F.col("c").cast("double"))
            * F.lit(1_000_000.0)
        ).alias("keep_ppm"),
    )
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(h % 1_000_000 < F.col("keep_ppm"))
        .select(*df.columns)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window token chunking: split each document into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens -
    overlap`` (RAG / context-window preprocessing). Emits ``doc_id,
    chunk_idx, n_chunk_tokens, chunk_text``; the final partial window
    is kept (it holds the document tail).

    Pure column expressions: one token-array projection per row, chunk
    starts from ``sequence`` arithmetic, ``slice`` + ``array_join`` per
    chunk — whole-stage codegen, fan-out bounded by tokens/stride.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    from .text_analysis import tokenize

    base = df.select(
        "doc_id", tokenize(F.col(text_col)).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.col("n_tokens"), F.lit(1)), F.lit(stride))
    chunks = base.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_idx", "start"),
    ).filter(F.col("start") <= F.col("n_tokens"))
    piece = F.slice(F.col("toks"), F.col("start"), F.lit(chunk_tokens))
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
) -> DataFrame:
    """Token-budget corpus selection: keep the highest-quality documents
    (quality = token count here; substitute any integer score) whose
    cumulative token total fits ``budget_tokens`` — the "take the best
    N tokens" step that sizes a pretraining mix.

    Semantics: documents ordered by ``(n_tokens DESC, doc_id ASC)``; a
    document is kept iff its inclusive running token total is within
    budget. Emits the kept ``doc_id, n_tokens``.

    Scale shape — the naive formulation is a GLOBAL ordered cumsum
    (one task sorts the corpus). Instead:

    1. Histogram by score: ``groupBy(n_tokens)`` -> per-bucket doc and
       token totals (map-side combined; the relation is
       |distinct scores|-sized, bounded).
    2. Cumulative totals over that tiny bucket relation (a window over
       a bounded histogram, not over documents).
    3. Buckets wholly under budget broadcast-join back: their docs are
       kept with no ordering work at all. Exactly ONE boundary bucket
       straddles the budget; only ITS documents (one score group) pay
       a per-group row_number to keep the ``k = (budget - prefix) /
       score`` lowest doc_ids.

    The only sort over real data is within the single boundary score
    group; everything else is hash aggregation + broadcast joins.
    """
    from .text_analysis import token_count

    scored = df.select("doc_id", token_count(F.col(text_col)).alias("n_tokens"))
    buckets = scored.groupBy("n_tokens").agg(
        F.sum(F.col("n_tokens").cast("bigint")).alias("bucket_tokens")
    )
    # bounded histogram: the un-partitioned window is over |distinct
    # scores| rows, never over documents
    wb = Window.orderBy(F.desc("n_tokens")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    bcum = buckets.withColumn("cum", F.sum("bucket_tokens").over(wb)).withColumn(
        "prev", F.col("cum") - F.col("bucket_tokens")
    )
    full = bcum.filter(F.col("cum") <= budget_tokens).select("n_tokens")
    boundary = bcum.filter(
        (F.col("prev") < budget_tokens) & (F.col("cum") > budget_tokens)
    ).select(
        "n_tokens",
        F.floor(
            (F.lit(budget_tokens) - F.col("prev")) / F.col("n_tokens")
        ).alias("k_max"),
    )
    kept_full = scored.join(F.broadcast(full), "n_tokens").select(
        "doc_id", "n_tokens"
    )
    wq = Window.partitionBy("n_tokens").orderBy("doc_id")
    kept_boundary = (
        scored.join(F.broadcast(boundary), "n_tokens")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= F.col("k_max"))
        .select("doc_id", "n_tokens")
    )
    return kept_full.unionByName(kept_boundary)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis order-sampling scheme with md5-derived
    uniforms, so every engine (and every rerun, at any partitioning)
    draws the SAME sample — quality-weighted corpus subsampling that is
    reproducible and oracle-checkable, unlike ``rand()``-based
    sampling.

    Each row gets priority ``ln(u) / w`` with ``u = md5(salt||id)``
    mapped into (0,1); the top-``k`` priorities are the sample
    (equivalent to ES keys ``u^(1/w)`` by monotonicity, without the
    engine-variant ``pow``). Inclusion probability is proportional to
    weight for the classic scheme.

    Scale shape: one projection + a global top-k, which Spark executes
    as TakeOrdered (per-partition heap of k, then a k-sized merge on
    one reducer) — no global sort materialization. ``k`` must be
    driver-friendly (the merge holds k rows), the same contract as any
    LIMIT.
    """
    u = (md5_int(F.concat(F.lit(salt), F.col(id_col).cast("string"))) + 1).cast(
        "double"
    ) / F.lit(float(1 << 60))
    # ES inclusion probability is proportional to weight, so a
    # weight-0 row can never be drawn — drop it BEFORE the priority
    # projection: under Spark's default ANSI mode ln(u)/0 THROWS
    # (round-9 poison-sweep find; an empty document is a legal row
    # with token-weight 0).
    # round to 9 decimals: JVM StrictMath.log and libm log disagree by
    # 1 ULP on rare inputs; the sampling decision must not hang on that
    priority = F.round(F.log(u) / F.col("weight"), 9)
    return (
        df.select(F.col(id_col), weight.alias("weight"))
        .filter(F.col("weight") > 0)
        .select(F.col(id_col), F.col("weight"), priority.alias("priority"))
        .orderBy(F.desc("priority"), id_col)
        .limit(k)
    )


def global_row_index(
    df: DataFrame,
    key_col: str = "doc_id",
    buckets: int | None = None,
    index_name: str = "row_index",
) -> DataFrame:
    """Contiguous 1-based global row numbering in ``key_col`` order —
    the sample-index / shard-offset assignment step of a training-data
    pipeline (epoch shuffling, resumable data ordering, and Megatron-
    style sample index files all want "the i-th example in a canonical
    order") — WITHOUT the single-partition global sort that a naive
    ``row_number() OVER (ORDER BY key)`` plans (Spark's WindowExec
    warns "No Partition Defined ... all data to a single partition";
    at 100 TB that task simply never finishes).

    Two-phase rank selection instead:

    1. a bounded driver-side boundary probe — ``approxQuantile`` on the
       key column only (column-pruned scan, ``buckets - 1`` numeric
       values on the driver; the same bounded-model-state contract as
       the IVF coarse quantizer);
    2. each row gets a range-bucket from the broadcast boundaries (a
       monotone sum of ``key > boundary`` indicators — pure JVM
       expressions), a *partitioned* window ranks within buckets, a
       buckets-sized count relation turns into exclusive prefix
       offsets (the only unpartitioned window runs over ``buckets``
       rows — bounded by cluster width, not data), and a broadcast
       join adds ``offset + local_rank``.

    One data shuffle total (the bucket window), everything else is
    metadata-sized. Output is deterministic and independent of the
    probe's sampling error: boundaries only balance work, every
    assignment of rows to order-respecting buckets yields the same
    global index. ``key_col`` must be UNIQUE (ties across a bucket
    boundary always co-locate, but ties within a bucket would make
    ``row_number`` order-dependent — the same uniqueness contract as
    any reproducible data ordering). Numeric keys probe boundaries
    via ``approxQuantile``; any other orderable type (strings, dates)
    uses a bounded md5-thinned sample (the rate derives from a
    ``count()`` — parquet-footer metadata, no data scan) sorted on
    the driver.
    """
    spark = df.sparkSession
    n = buckets or spark.sparkContext.defaultParallelism
    key = F.col(key_col)
    dtype = df.schema[key_col].dataType.typeName()
    if n <= 1:
        bounds = []
    elif dtype in ("byte", "short", "integer", "long", "float", "double"):
        qs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.stat.approxQuantile(key_col, qs, 0.001)))
    else:
        # non-numeric keys: bounded deterministic sample (md5 thinning,
        # ~50 candidates per bucket), sorted, every 50th value as a
        # boundary. Any boundary set is CORRECT — bucket id is the
        # count of exceeded boundaries, monotone in the engine's own
        # ordering regardless of the sample — boundaries only balance
        # work, exactly like the numeric probe's sampling error.
        cap = n * 50
        sample = (
            df.select(key.alias("k"))
            .filter(
                md5_int(F.concat(F.lit("gri:"), key.cast("string"))) % 1000
                < max(1, min(1000, (cap * 1000) // max(df.count(), 1)))
            )
            .limit(cap)
            .collect()
        )
        vals = sorted({r["k"] for r in sample if r["k"] is not None})
        step = max(1, len(vals) // n)
        bounds = vals[step::step][: n - 1]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(key > F.lit(b), 1).otherwise(0)
    wl = Window.partitionBy("__b").orderBy(key_col)
    local = df.withColumn("__b", bucket).withColumn(
        "__r", F.row_number().over(wl)
    )
    counts = local.groupBy("__b").agg(F.count("*").alias("__c"))
    # buckets-sized relation: the global window is bounded by design
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__c").over(wo), F.lit(0)).alias("__off")
    )
    return local.join(F.broadcast(offsets), "__b").select(
        *df.columns, (F.col("__off") + F.col("__r")).alias(index_name)
    )


def ntile_scalable(
    df: DataFrame,
    k: int,
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "ntile",
    buckets: int | None = None,
    bounds: Sequence[float] | None = None,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_col, *tiebreak_cols)``
    WITHOUT the single-partition global sort the window form plans
    (WindowExec's "No Partition Defined" path — at 100 TB that one
    task never finishes). The quantile-scoring primitive behind RFM
    segmentation and any global decile/percentile bucketing.

    Same two-phase rank as :func:`global_row_index`, generalized to a
    composite ordering: range-bucket on ``order_col`` alone (ties
    co-locate by construction, so any boundary set is CORRECT and the
    probe's approximation only balances work), rank within buckets by
    the full ordering, convert bucket counts to exclusive prefix
    offsets (the only unpartitioned window runs over the buckets-sized
    count relation), then map the exact global row number through the
    SQL ntile formula — with ``n`` rows, the first ``n % k`` tiles
    hold ``n // k + 1`` rows — reproducing ``F.ntile`` / DuckDB
    ``ntile`` bit-for-bit. The composite ordering must be unique
    (same contract as any deterministic ranking).

    The boundary probe casts to double; a monotone (order-preserving)
    coarsening can only merge neighbors into one bucket, never invert
    them, so correctness is unaffected for decimal/long keys.

    ``bounds`` skips the probe: callers scoring SEVERAL columns of the
    same relation (the RFM pattern) should fetch every column's
    boundaries in ONE ``approxQuantile([cols...])`` action and pass
    them in — otherwise each call re-executes the input lineage for
    its own probe (measured 5.1s -> ~1s on rfm_segments at sf0.1).
    ANY numeric boundary list is correct (ties still co-locate; bounds
    only balance work), so staleness or approximation cannot change
    the output.
    """
    spark = df.sparkSession
    nb = buckets or spark.sparkContext.defaultParallelism
    reserved = {"__b", "__r", "__off", "__n"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"ntile_scalable: reserved column(s) {sorted(reserved)} present"
        )
    key = F.col(order_col).cast("double")
    if bounds is not None:
        bounds = sorted(set(bounds))
    elif nb <= 1:
        bounds = []
    else:
        qs = [i / nb for i in range(1, nb)]
        bounds = sorted(
            set(
                df.select(key.alias("__k")).stat.approxQuantile(
                    "__k", qs, 0.001
                )
            )
        )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(key > F.lit(b), 1).otherwise(0)
    wl = Window.partitionBy("__b").orderBy(order_col, *tiebreak_cols)
    local = df.withColumn("__b", bucket).withColumn(
        "__r", F.row_number().over(wl)
    )
    counts = local.groupBy("__b").agg(F.count("*").alias("__c"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__c").over(wo), F.lit(0)).alias("__off"),
        F.sum("__c").over(wn).alias("__n"),
    )
    rn = F.col("__off") + F.col("__r")
    q = F.floor(F.col("__n") / F.lit(k)).cast("long")
    r = (F.col("__n") % F.lit(k)).cast("long")
    thr = (q + F.lit(1)) * r  # rows in the (q+1)-sized leading tiles
    tile = (
        F.when(rn <= thr, F.floor((rn - F.lit(1)) / (q + F.lit(1))) + 1)
        .otherwise(r + F.floor((rn - thr - F.lit(1)) / q) + 1)
        .cast("long")
    )
    return local.join(F.broadcast(offsets), "__b").select(
        *df.columns, tile.alias(out_col)
    )
