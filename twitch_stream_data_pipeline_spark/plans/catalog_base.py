"""Shared machinery for the query catalog: the registry (``Query`` /
``CATALOG`` / ``_register``), the scan helpers (``_t`` / ``_docs`` /
``_emb`` / ``_events`` and the events timestamp-decode branch), the
data contracts (embedding dim, events epoch plausibility), and the
cross-engine determinism helpers (``dsum`` / ``_osum`` / ``_OSECS`` /
``_hhmm`` / ``_ohhmm``).

The catalog-wide determinism RULES every registration must follow are
documented once, in ``plans/catalog.py``'s module docstring; the part
modules (``catalog_core`` ... ``catalog_streaming``) hold the
registrations and import this module for the machinery.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


CATALOG: dict[str, Query] = {}


def _register(name: str, oracle: str | None, tags: tuple[str, ...], doc: str = ""):
    def deco(fn):
        CATALOG[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


#: Per-session memo of RESOLVED SCAN PLANS (DataFrames — lazy plans,
#: never results or data) for the driver's static input tables, keyed
#: by the live SparkSession (weakly — entries die with the session)
#: then by path. Why (r12 optimization, guide §1.2 driver-side work):
#: every `spark.read.parquet(path)` pays ~85-120ms of driver work
#: (footer schema inference + file-index construction) and `_spread`'s
#: partition probe another ~40ms — per CALL, uncached by Spark — so a
#: bench pass over the catalog spent seconds re-resolving the same ten
#: immutable files. Memoizing the resolved plan is exactly what a
#: notebook user does by holding `df` in a variable; it caches METADATA
#: (schema + listing), not computation — every action on the returned
#: plan still reads the parquet from disk. Safe because the memo
#: covers only the read-only driver testdata layout: the catalog never
#: writes into an sf_dir, and every sweep/fixture builds a FRESH temp
#: dir before querying it (same lifecycle argument as the
#: _EMB_CONTRACT_OK / _EVENTS_CONTRACT_OK per-path memos below).
#: Mutable relations (index layouts, sinks) are NEVER memoized here.
from weakref import WeakKeyDictionary

_SCAN_MEMO: "WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    WeakKeyDictionary()
)


def _scan_memo(spark: SparkSession, key: str, build):
    per = _SCAN_MEMO.get(spark)
    if per is None:
        per = {}
        _SCAN_MEMO[spark] = per
    df = per.get(key)
    if df is None:
        df = build()
        per[key] = df
    return df


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    path = f"{sf_dir}/{table}.parquet"
    return _scan_memo(spark, path, lambda: spark.read.parquet(path))


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Rebalance a scan for CPU-heavy per-row operators — but ONLY when
    the scan is narrower than the cluster.

    The testdata ships one parquet file per table, and a single parquet
    row group cannot be split — so a plain scan is one task no matter
    how many cores exist; hash-repartitioning lets shingling/hashing
    use every core and evens out document-length skew. At 100 TB the
    scan already arrives in thousands of splits and an unconditional
    repartition would be a full shuffle of the corpus for nothing —
    hence the partition-count gate (planning-time metadata, no job)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism, key)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents table, spread across cores when the scan is narrow."""
    return _scan_memo(
        spark,
        f"docs-spread:{sf_dir}",
        lambda: _spread(_t(spark, sf_dir, "documents"), "doc_id"),
    )


_EMB_CONTRACT_OK: set[str] = set()


def _check_embedding_dim_contract(path: str, emb: DataFrame) -> None:
    """Bounded probe (min/max of size(embedding) over the first 1024
    rows, memoized per path) that the corpus is fixed-dimension.

    The whole similarity tier — quantized dot/norm expressions, Arrow
    matrix batches, PQ codes, covariance partials — assumes one
    dimension per corpus; a ragged row otherwise surfaces as an opaque
    numpy 'inhomogeneous shape' error deep inside a worker (or worse,
    a silently wrong padded product). The events table's epoch probe
    is the same move for the same reason: validate the physical
    contract ONCE per path, loudly, at the reader everyone shares.
    A probe that proves nothing (empty table) is not memoized. Cost at
    100 TB: one task reading one row group, once per process. Per-row
    defects beyond the first 1024 rows are the boundary gate's job
    (``embedding_dim_check``), not the hot reader's."""
    if path in _EMB_CONTRACT_OK:
        return
    row = (
        emb.select(F.size("embedding").alias("d"))
        .limit(1024)
        .agg(
            F.min("d").alias("lo"),
            F.max("d").alias("hi"),
            F.sum(F.col("d").isNull().cast("int")).alias("n_null"),
        )
        .first()
    )
    lo = row["lo"] if row else None
    hi = row["hi"] if row else None
    n_null = (row["n_null"] or 0) if row else 0
    if n_null:
        # size(NULL) is NULL, which min/max skip — an explicit count,
        # or a corpus of ONLY null vectors would pass the range check
        # and still crash the Arrow batches (review r9)
        raise ValueError(
            f"embedding dimension contract violated for {path}: "
            f"{n_null} NULL embedding row(s) in the probe sample; the "
            "similarity tier requires non-null fixed-dimension vectors. "
            "Run the embedding_dim_check boundary gate to locate them "
            "(NULL rows report dim -1)."
        )
    if lo is None or hi is None:
        return  # nothing provable (empty table) — re-probe next read
    if lo != hi:
        raise ValueError(
            f"embedding dimension contract violated for {path}: "
            f"size(embedding) ranges [{lo}, {hi}] in the probe sample; "
            "the similarity tier requires one fixed dimension per "
            "corpus. Run the embedding_dim_check boundary gate to "
            "locate the offending rows, and filter or re-embed them "
            "before indexing."
        )
    _EMB_CONTRACT_OK.add(path)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings table, spread across cores when the scan is narrow."""
    path = f"{sf_dir}/embeddings.parquet"
    emb = _t(spark, sf_dir, "embeddings")
    _check_embedding_dim_contract(path, emb)  # per-path memo inside
    return _scan_memo(
        spark, f"emb-spread:{sf_dir}", lambda: _spread(emb, "vec_id")
    )


# Plausible-epoch bounds for the events data contract: decoded
# ``secs`` must land in [2000-01-01, 2100-01-01). Anything outside
# means the decode branch below mis-guessed the physical encoding
# (e.g. a future re-encoding to millis-as-int64), and silently-wrong
# grid cells / windows / session gaps would follow — so fail loudly
# at read time instead.
_EPOCH_LO = 946_684_800
_EPOCH_HI = 4_102_444_800
_EVENTS_CONTRACT_OK: set[str] = set()


def _check_events_epoch_contract(path: str, ev: DataFrame, ts_type) -> None:
    """Bounded probe (min/max over the first 1024 rows, memoized per
    path) that the decoded epoch seconds are plausible. min AND max
    must both be in-range, so a *partially* re-encoded or mixed file
    fails even when its first row happens to decode plausibly; a probe
    that proves nothing (empty table, all-NULL sample) is NOT memoized,
    so the next read re-probes instead of trusting a vacuous pass.
    Cost at 100 TB: one task reading one row group of one file, once
    per process."""
    if path in _EVENTS_CONTRACT_OK:
        return
    row = (
        ev.select("secs")
        .limit(1024)
        .agg(F.min("secs").alias("lo"), F.max("secs").alias("hi"))
        .first()
    )
    lo = row["lo"] if row else None
    hi = row["hi"] if row else None
    if lo is None or hi is None:
        return  # nothing provable — skip memoization, re-probe next read
    for secs in (lo, hi):
        if not (_EPOCH_LO <= secs <= _EPOCH_HI):
            raise ValueError(
                f"events timestamp contract violated for {path}: ts has "
                f"Spark type {ts_type.simpleString()} and the decode branch "
                f"produced epoch secs={secs} "
                f"({'1970-era' if secs < _EPOCH_LO else 'far-future'}), "
                "outside [2000-01-01, 2100-01-01). The parquet physical "
                "encoding of ts does not match what the type-branch in "
                "_events assumed — inspect the file footer (pyarrow "
                "ParquetFile(...).schema) and extend the branch."
            )
    _EVENTS_CONTRACT_OK.add(path)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with timestamp normalized to integer columns.

    The physical encoding of ``ts`` is the *driver's* choice, not ours,
    and it has changed between testdata generations (TIMESTAMP(NANOS)
    in rounds 1-2, TIMESTAMP(MICROS) since round 3) — so never guess
    the unit: branch on the type Spark infers from the parquet footer
    (metadata-only, no data scan):

    - ``LongType`` — TIMESTAMP(NANOS) surfaced as raw int64 epoch-nanos
      under ``spark.sql.legacy.parquet.nanosAsLong`` (session.py), or a
      plain BIGINT epoch-nanos column.
    - ``TimestampNTZType`` — the driver's no-tz TIMESTAMP(MICROS)
      layout carries a WALL time; decode with ``timestampdiff`` from
      the NTZ epoch — pure wall-clock arithmetic with no session
      timezone anywhere in the expression. Do NOT cast NTZ ->
      TIMESTAMP first: that cast reads the wall time in the SESSION
      zone and shifts every grid cell anywhere but UTC (the
      round-10 Kathmandu config-sweep bug).
    - ``TimestampType`` — an instant-typed column;
      ``unix_seconds``/``unix_micros`` read its internal UTC micros
      directly, already session-timezone-free.

    A caller-provided SparkSession built without the ``nanosAsLong``
    conf cannot even *infer* a NANOS schema (``Illegal Parquet type:
    INT64 (TIMESTAMP(NANOS,...))`` at read) — that case falls back to
    requesting ``ts`` as ``bigint`` via an explicit read schema, which
    reads the raw INT64 epoch-nanos with no session conf at all, so
    every catalog query works on any session regardless of encoding.

    Either way we derive ``secs`` (epoch seconds) and ``ts_us`` (epoch
    microseconds — DuckDB's native timestamp precision, used for order
    parity), keep everything timezone-free, and assert the decoded
    epoch range is plausible (:func:`_check_events_epoch_contract`) so
    a future re-encoding fails one loud read instead of corrupting
    every downstream grid cell. The DuckDB oracle side needs no
    branching: it reads the logical type natively via ``epoch(ts)``.
    """
    path = f"{sf_dir}/events.parquet"
    raw = _read_events_raw(spark, path)
    ev, ts_type = _decode_event_ts(raw, path)
    _check_events_epoch_contract(path, ev, ts_type)
    return ev


_EVENTS_FALLBACK_DDL = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def _read_events_raw(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Raw events scan, batch or streaming, with the NANOS fallback.

    The streaming file source requires an explicit schema; it comes
    from a metadata-only batch read of the same footer, so both paths
    see the identical raw types and the :func:`_decode_event_ts`
    branching below applies unchanged.
    """
    try:
        batch = spark.read.parquet(path)
        schema = batch.schema
    except Exception as e:  # AnalysisException on NANOS without the conf
        if "NANOS" not in str(e):
            raise
        if not streaming:
            return spark.read.schema(_EVENTS_FALLBACK_DDL).parquet(path)
        batch, schema = None, _EVENTS_FALLBACK_DDL
    if not streaming:
        return batch  # one footer resolution, reused (review r9 finding)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_as_stream_dir(path))


def _as_stream_dir(path: str) -> str:
    """A directory Spark's file stream source can own for ``path``.

    ``FileStreamSource.getBatch`` passes the source path as
    ``basePath``, which must be a DIRECTORY — a real deployment streams
    a lake directory, but the driver testdata ships each table as ONE
    parquet file. For that layout, build (once per target, memoized by
    content-path) a temp directory holding a symlink to the file and
    stream from it; directories pass through untouched. The symlink is
    re-pointed if a previous run left it aimed elsewhere (temp dirs can
    collide across runs on path-hash)."""
    import hashlib
    import os
    import tempfile
    from pathlib import Path

    p = Path(path)
    if p.is_dir():
        return str(p)
    target = p.resolve()
    # per-euid hash + mode-0700 dir: the path is otherwise predictable
    # in a world-writable /tmp, and concurrent sessions (bench + tests
    # on one host) legitimately share it (review r9 findings)
    key = hashlib.md5(f"{os.geteuid()}:{target}".encode()).hexdigest()[:16]
    d = Path(tempfile.gettempdir()) / f"spark_stream_src_{key}"
    d.mkdir(exist_ok=True, mode=0o700)
    # exist_ok=True accepts a PRE-EXISTING directory of any owner/mode
    # at this predictable world-writable-/tmp path — an attacker-owned
    # holder would let the symlink below be swapped to stream arbitrary
    # files. Verify what mkdir handed back gives the tempfile.mkdtemp
    # guarantee: ours, and no group/other access (ADVICE r9).
    st = os.stat(d, follow_symlinks=False)
    import stat as _stat

    if not _stat.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"stream source holder {d} is not a directory; refusing to "
            "stream through it"
        )
    if st.st_uid != os.geteuid() or (st.st_mode & 0o077):
        raise RuntimeError(
            f"stream source holder {d} is owned by uid {st.st_uid} with "
            f"mode {_stat.S_IMODE(st.st_mode):#o}; expected own uid "
            f"{os.geteuid()} and no group/other bits — a pre-created "
            "directory at this predictable /tmp path cannot be trusted. "
            "Remove it (or fix owner/mode) and retry."
        )
    link = d / p.name
    if link.is_symlink() and link.resolve() == target:
        return str(d)
    # anything else in the slot — a stale symlink, a regular file, a
    # directory — must not be silently streamed; replace it atomically
    # (symlink to a unique temp name, then rename over) so two racing
    # sessions both end with a correct link and neither crashes
    tmp_name = d / f".{p.name}.{os.getpid()}.tmp"
    try:
        tmp_name.unlink()
    except FileNotFoundError:
        pass
    if link.is_dir() and not link.is_symlink():
        import shutil

        shutil.rmtree(link)
    os.symlink(target, tmp_name)
    os.replace(tmp_name, link)
    return str(d)


def _decode_event_ts(raw: DataFrame, path: str):
    """The ts-decode branch shared by batch and streaming event scans
    (see :func:`_events` for why the branch exists). Returns
    ``(decoded_df, ts_type)``; pure column expressions, so it applies
    to a streaming DataFrame unchanged."""
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        ev = raw.withColumns(
            {
                "secs": F.expr("ts div 1000000000"),
                "ts_us": F.expr("ts div 1000"),
            }
        )
    elif isinstance(ts_type, T.TimestampNTZType):
        # TIMESTAMP_NTZ (the driver's pyarrow `timestamp[us]`-no-tz
        # layout since round 3) carries a WALL time; the oracle's
        # `epoch(ts)` reads that wall time as UTC. Casting NTZ ->
        # TIMESTAMP would interpret the wall time in the SESSION zone
        # instead — correct only while the session runs UTC, and a
        # silent +offset shift of every grid cell anywhere else (the
        # round-10 config sweep caught 13 queries moving under
        # Asia/Kathmandu). timestampdiff between NTZ values is pure
        # wall-clock arithmetic — no session conf anywhere in the
        # expression, same JVM codegen path.
        us = (
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts)"
        )
        ev = raw.withColumns(
            {
                # integral `div`, like the epoch-nanos branch; the
                # epoch plausibility contract below guarantees the
                # positive range where div == floor
                "secs": F.expr(f"({us}) div 1000000"),
                "ts_us": F.expr(us),
            }
        )
    elif isinstance(ts_type, T.TimestampType):
        # An instant-typed column (isAdjustedToUTC parquet metadata):
        # unix_* read the internal UTC micros directly — already
        # session-timezone-free, no cast needed.
        ev = raw.withColumns(
            {
                "secs": F.unix_seconds(F.col("ts")),
                "ts_us": F.unix_micros(F.col("ts")),
            }
        )
    else:
        raise TypeError(
            f"events.ts has unsupported Spark type {ts_type.simpleString()} "
            f"in {path}; expected int64 epoch-nanos or a parquet TIMESTAMP "
            "logical type"
        )
    return ev, ts_type


def _events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """STREAMING scan of the driver events table — the same decoded
    relation as :func:`_events`, as an unbounded source.

    The epoch contract is enforced by running the batch probe first
    (memoized per path; a streaming plan cannot ``.first()``), so a
    mis-encoded file fails loudly here exactly as it does in batch.
    ``max_files_per_trigger`` bounds each micro-batch for backfills —
    at 100 TB an availableNow replay over a month of files must arrive
    as many bounded batches, not one.
    """
    path = f"{sf_dir}/events.parquet"
    _events(spark, sf_dir)  # schema probe + epoch contract, memoized
    raw = _read_events_raw(
        spark, path, streaming=True, max_files_per_trigger=max_files_per_trigger
    )
    ev, _ = _decode_event_ts(raw, path)
    return ev


def dsum(c: Column | str) -> Column:
    """Exact, order-independent sum of a double column (see module doc).

    FINITENESS CONTRACT (round 10): the decimal route assumes FINITE
    inputs. Spark's double->decimal cast turns NaN/±Inf into NULL even
    under ANSI (probed on 4.1.2), so a non-finite value would be
    SILENTLY SKIPPED by this sum — masking upstream corruption — while
    DuckDB's identical cast RAISES, so the oracles cannot even state
    that skip without guarding every sum. Instead of enshrining the
    masking, non-finite doubles are declared OUT OF CONTRACT for fact
    columns (like the events epoch contract and the embedding dim
    contract): ``value_finite_check`` is the full-scan locator a lake
    runs at the promote boundary, and
    ``tests/test_boundary_probes.py`` pins both the locator and the
    masking behavior this docstring documents.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast("decimal(25,6)")).cast("double")


def _osum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` (same finiteness contract)."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)"


# epoch arithmetic helpers (timezone-free on both engines)


_OSECS = "CAST(floor(epoch({ts})) AS BIGINT)"


def _hhmm(slot_secs: Column) -> Column:
    day_secs = slot_secs % 86400
    hh = F.floor(day_secs / 3600).cast("int")
    mm = F.floor((day_secs % 3600) / 60).cast("int")
    return F.concat(
        F.lpad(hh.cast("string"), 2, "0"), F.lpad(mm.cast("string"), 2, "0")
    )


def _ohhmm(slot: str) -> str:
    return (
        f"lpad(CAST(({slot} % 86400) // 3600 AS VARCHAR), 2, '0') || "
        f"lpad(CAST((({slot} % 86400) % 3600) // 60 AS VARCHAR), 2, '0')"
    )


