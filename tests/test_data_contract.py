"""Events timestamp data contract (VERDICT r3 #1/#2/#7).

Round 3's only defect class: the driver regenerated ``/root/testdata``
with ``events.ts`` re-encoded from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS), and the engine's fixed nanos-as-int64 read silently
compressed the 2024 timeline onto 1970-01-20. These tests pin the
contract so an encoding change fails one named test instead of
corrupting six query results:

- the decode branch in ``_events`` must match the parquet footer's
  actual logical type (checked with pyarrow, independent of Spark);
- nanos-encoded and micros-encoded copies of the same data must decode
  to identical ``secs``/``ts_us`` and identical dedup keep decisions;
- an implausible decode (e.g. a future millis-as-int64 re-encoding)
  must raise loudly at read time, not return 1970-era rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twitch_stream_data_pipeline_spark.operators.dedup import dedup_keep_first
from twitch_stream_data_pipeline_spark.plans.catalog import (
    _EPOCH_HI,
    _EPOCH_LO,
    _events,
)

from .conftest import SF_SMOKE

# same data, three physical encodings (epoch micros in 2024)
_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_ROWS = [
    # (event_id, us_offset, user_id, event_type, value, props)
    (1, 0, 10, "view", 1.0, "{}"),
    (2, 30_500_000, 10, "view", 2.0, "{}"),  # same keys, later ts
    (3, 30_500_000, 10, "click", 3.0, "{}"),
    (4, 61_000_123, 11, "view", 4.0, "{}"),
    (5, 61_000_123, 11, "view", 5.0, "{}"),  # ts tie -> event_id tiebreak
]


def _write_events(
    path: str, unit: str, epochs_us: list[int] | None = None
) -> str:
    """Write an events fixture with ts encoded at the given unit.

    Shared by this suite and the hypothesis property suite
    (``tests/test_properties.py``) so both always test the same events
    schema shape. ``epochs_us`` overrides the default rows' instants
    (event_ids become 0..n-1 with placeholder attributes).
    """
    if epochs_us is None:
        epochs_us = [_BASE_US + off for (_, off, *_rest) in _ROWS]
        ids = [r[0] for r in _ROWS]
        users = [r[2] for r in _ROWS]
        types = [r[3] for r in _ROWS]
        values = [r[4] for r in _ROWS]
        props = [r[5] for r in _ROWS]
    else:
        n = len(epochs_us)
        ids = list(range(n))
        users = [1] * n
        types = ["e"] * n
        values = [0.0] * n
        props = ["{}"] * n
    if unit == "ns":
        ts_arr = pa.array([u * 1000 for u in epochs_us], pa.timestamp("ns"))
    elif unit == "us":
        ts_arr = pa.array(epochs_us, pa.timestamp("us"))
    elif unit == "ms_int64":
        ts_arr = pa.array([u // 1000 for u in epochs_us], pa.int64())
    else:  # pragma: no cover
        raise ValueError(unit)
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    pq.write_table(tbl, f"{path}/events.parquet")
    return path


def test_decode_branch_matches_parquet_footer(spark):
    """The pyarrow footer is the ground truth; the Spark-inferred type
    (and therefore the decode branch) must agree with it."""
    f = pq.ParquetFile(f"{SF_SMOKE}/events.parquet")
    arrow_type = f.schema_arrow.field("ts").type
    spark_type = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema[
        "ts"
    ].dataType

    if pa.types.is_timestamp(arrow_type) and arrow_type.unit == "ns":
        # nanosAsLong surfaces NANOS as raw int64
        assert isinstance(spark_type, T.LongType), spark_type
    elif pa.types.is_timestamp(arrow_type):
        assert isinstance(
            spark_type, (T.TimestampType, T.TimestampNTZType)
        ), spark_type
    elif pa.types.is_int64(arrow_type):
        assert isinstance(spark_type, T.LongType), spark_type
    else:  # pragma: no cover - driver changed encoding beyond the contract
        pytest.fail(f"unrecognized ts encoding {arrow_type}")

    # and the actual decode must land in the plausible-epoch window
    row = _events(spark, SF_SMOKE).select("secs").first()
    assert _EPOCH_LO <= row[0] <= _EPOCH_HI


def test_ntz_decode_reads_wall_time_as_utc(spark):
    """The NTZ branch's wall-as-UTC contract, pinned at the expression
    level (the opt-in config sweep proves the whole catalog under a
    shifted session zone; this always-on pin catches a regression of
    the decode itself): a TIMESTAMP_NTZ wall time must map to the
    epoch seconds of that wall time READ AS UTC — never through the
    session timezone. The expected constants are hand-computed, so
    this test is correct in any session zone."""
    from twitch_stream_data_pipeline_spark.plans.catalog import (
        _decode_event_ts,
    )

    raw = spark.sql(
        "SELECT 1 AS event_id, TIMESTAMP_NTZ'2024-01-01 06:00:00' AS ts"
    )
    ev, _ = _decode_event_ts(raw, "<inline>")
    row = ev.select("secs", "ts_us").first()
    # 2024-01-01 06:00:00 UTC == 1704088800 epoch seconds
    assert row["secs"] == 1_704_088_800
    assert row["ts_us"] == 1_704_088_800 * 1_000_000


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_encodings_decode_identically(spark, tmp_path, unit):
    """Both historical encodings of the same instants produce the same
    integer timeline."""
    sf_dir = _write_events(str(tmp_path), unit)
    got = {
        r["event_id"]: (r["secs"], r["ts_us"])
        for r in _events(spark, sf_dir).select(
            "event_id", "secs", "ts_us"
        ).collect()
    }
    want = {
        eid: ((_BASE_US + off) // 1_000_000, _BASE_US + off)
        for (eid, off, *_r) in _ROWS
    }
    assert got == want


def test_dedup_tiebreak_identical_across_encodings(spark, tmp_path):
    """VERDICT r3 #7: keep-first decisions over ts-derived ordering must
    not depend on the physical encoding (they survived the unit bug
    only because scaling preserves order — pin it)."""
    keeps = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        ev = _events(spark, _write_events(str(d), unit))
        kept = dedup_keep_first(
            ev, ["user_id", "event_type"], [F.col("ts_us"), F.col("event_id")]
        )
        keeps[unit] = sorted(r["event_id"] for r in kept.select("event_id").collect())
    assert keeps["ns"] == keeps["us"] == [1, 3, 4]


def test_implausible_epoch_raises(spark, tmp_path):
    """A future re-encoding the type branch can't distinguish (plain
    int64 epoch-millis reads as LongType, same as nanos) must fail the
    loud contract check, not silently emit 1970-era rows."""
    sf_dir = _write_events(str(tmp_path), "ms_int64")
    with pytest.raises(ValueError, match="timestamp contract violated"):
        _events(spark, sf_dir)


def test_nanos_readable_without_legacy_conf(spark, tmp_path):
    """A caller-provided session without nanosAsLong cannot infer a
    NANOS schema (PARQUET_TYPE_ILLEGAL) — _events must fall back to an
    explicit bigint read, which needs no session conf, so every
    catalog query works on ANY session regardless of encoding."""
    sf_dir = _write_events(str(tmp_path), "ns")
    conf = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.set(conf, "false")
    try:
        with pytest.raises(Exception, match="NANOS"):
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        got = {
            r["event_id"]: r["ts_us"]
            for r in _events(spark, sf_dir).select("event_id", "ts_us").collect()
        }
        assert got == {eid: _BASE_US + off for (eid, off, *_r) in _ROWS}
    finally:
        spark.conf.set(conf, "true")


def test_get_spark_reuse_never_clobbers_runtime_conf(spark):
    """Session-factory contract (round 8): Spark's builder applies
    every builder config to an EXISTING session as runtime SQL conf,
    so a library-internal get_spark() — the CLI's verify/run paths,
    any helper — used to silently reset the caller's session tuning to
    this module's defaults (observed: the CLI verify inside a test run
    reset shuffle partitions 8 -> 32 for the rest of the process,
    flipping later AQE broadcast decisions). On reuse, get_spark must
    apply ONLY explicit overrides and leave everything else alone."""
    from twitch_stream_data_pipeline_spark.session import get_spark

    conf = "spark.sql.shuffle.partitions"
    before = spark.conf.get(conf)
    try:
        # no overrides: identical session, conf untouched
        again = get_spark("reuse-check")
        assert again is spark
        assert again.conf.get(conf) == before
        # explicit override: applied to the reused session
        get_spark("reuse-check-2", shuffle_partitions=int(before) + 5)
        assert spark.conf.get(conf) == str(int(before) + 5)
        # the CLI path end-to-end: runs a real verify (which calls
        # get_spark with no overrides) and must not move the conf back
        # to the 32-partition default
        import io

        from twitch_stream_data_pipeline_spark.__main__ import main

        spark.conf.set(conf, before)
        buf = io.StringIO()
        assert (
            main(
                ["verify", "pricing_summary", "--sf-dir",
                 "/root/testdata/sf0.001"],
                out=buf,
            )
            == 0
        )
        assert spark.conf.get(conf) == before
    finally:
        spark.conf.set(conf, before)


def test_get_spark_reuse_restores_semantic_confs(spark):
    """ADVICE r8: "don't clobber tuning on reuse" must not skip the
    CORRECTNESS confs. A pre-existing session with a non-UTC session
    timezone (or nanosAsLong unset) would silently break DuckDB-oracle
    parity and the NANOS-parquet events decode — on reuse get_spark
    re-applies exactly those two, and warns when compat.WORKER_ENV
    exists but cannot reach the live session's workers."""
    import warnings

    from twitch_stream_data_pipeline_spark import compat
    from twitch_stream_data_pipeline_spark.session import get_spark

    tz = "spark.sql.session.timeZone"
    nanos = "spark.sql.legacy.parquet.nanosAsLong"
    before_tz = spark.conf.get(tz)
    before_nanos = spark.conf.get(nanos)
    try:
        spark.conf.set(tz, "America/New_York")
        spark.conf.set(nanos, "false")
        again = get_spark("semantic-conf-check")
        assert again is spark
        assert spark.conf.get(tz) == "UTC"
        assert spark.conf.get(nanos) == "true"
        # but tuning confs stay untouched (the r8 contract): shuffle
        # partitions were not reset by the reuse above (covered in
        # detail by test_get_spark_reuse_never_clobbers_runtime_conf)

        # WORKER_ENV present but the session predates it: loud warning
        saved = dict(compat.WORKER_ENV)
        compat.WORKER_ENV.clear()
        compat.WORKER_ENV["TSWDP_FAKE_WORKER_FLAG"] = "1"
        try:
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                get_spark("worker-env-check")
            assert any(
                "executorEnv" in str(x.message) for x in w
            ), [str(x.message) for x in w]
        finally:
            compat.WORKER_ENV.clear()
            compat.WORKER_ENV.update(saved)
    finally:
        spark.conf.set(tz, before_tz)
        spark.conf.set(nanos, before_nanos)


# ---------------------------------------------------------------------------
# Round 11 (ADVICE r10): orders.o_orderdate has the same re-encoding
# exposure as events.ts — q_rfm_segments' recency arithmetic branches
# on the column's actual Spark type, so an instant-typed TIMESTAMP goes
# through unix_seconds (session-tz-free) instead of a CAST to
# TIMESTAMP_NTZ that would silently read the session zone.
# ---------------------------------------------------------------------------

_ORDER_DAYS = [19723, 19724, 19800]  # epoch days; max = "now"
_ORDER_CUSTS = [1, 1, 2]
_ORDER_PRICES = [10.0, 20.0, 30.0]


def _write_orders(path: str, kind: str) -> str:
    arrs = {
        "date": lambda: pa.array(_ORDER_DAYS, pa.date32()),
        "ntz": lambda: pa.array(
            [d * 86_400_000_000 for d in _ORDER_DAYS], pa.timestamp("us")
        ),
        "instant": lambda: pa.array(
            [d * 86_400_000_000 for d in _ORDER_DAYS],
            pa.timestamp("us", tz="UTC"),
        ),
        "string": lambda: pa.array(["2024-01-01"] * len(_ORDER_DAYS)),
    }
    t = pa.table(
        {
            "o_custkey": pa.array(_ORDER_CUSTS, pa.int64()),
            "o_orderdate": arrs[kind](),
            "o_totalprice": pa.array(_ORDER_PRICES, pa.float64()),
        }
    )
    pq.write_table(t, f"{path}/orders.parquet")
    return path


@pytest.mark.parametrize("kind", ["date", "ntz", "instant"])
def test_rfm_recency_identical_across_orderdate_encodings(
    spark, tmp_path, kind
):
    """All three plausible physical encodings of the same order dates
    must yield the same recency_days — in particular the instant-typed
    branch must route through unix_seconds, never a session-zone
    NTZ cast."""
    from twitch_stream_data_pipeline_spark.plans.catalog import CATALOG

    d = tmp_path / kind
    d.mkdir()
    out = CATALOG["rfm_segments"].fn(spark, _write_orders(str(d), kind))
    got = {
        r["o_custkey"]: r["recency_days"]
        for r in out.select("o_custkey", "recency_days").collect()
    }
    # now = day 19800; cust 1 last ordered day 19724 (76 days back),
    # cust 2 on day 19800 itself
    assert got == {1: 76, 2: 0}


def test_rfm_unsupported_orderdate_type_raises(spark, tmp_path):
    """A re-encoding the branch can't classify must fail one loud read,
    not silently mis-date every segment."""
    from twitch_stream_data_pipeline_spark.plans.catalog import CATALOG

    with pytest.raises(TypeError, match="o_orderdate"):
        CATALOG["rfm_segments"].fn(
            spark, _write_orders(str(tmp_path), "string")
        )
