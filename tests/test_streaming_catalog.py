"""The streaming tier as a harness-gradable artifact (round 9, beyond
the brief).

``stream_window_counts`` is the first catalog entry whose callable runs
a REAL Structured Streaming job (availableNow trigger, stream-static
broadcast join, complete-mode windowed aggregate, memory sink) and
returns the materialized final state for the driver to hash. These
tests are the staging evidence — the same differential the driver runs
(``stream_window_counts``'s oracle was promoted into its registration
as round 10's window swap; ``stream_session_windows`` remains staged in
``STREAMING_STAGED_ORACLES``), plus the two properties that make the
result gradable at all:

* **micro-batch-split independence** — replaying the same rows one file
  per micro-batch (``maxFilesPerTrigger=1`` over a 4-file copy) yields
  byte-identical final state to the single-batch replay, because
  complete mode emits the final aggregate state, not per-batch deltas;
* **empty-input totality** — the degenerate-partition contract every
  catalog query honors (the wholesale check lives in the opt-in
  full-catalog sweep; this is the fast always-on pin for the one query
  whose execution path — a streaming runtime — is unlike all others).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.plans.catalog import (
    CATALOG,
    STREAMING_STAGED_ORACLES,
    _stream_session_windows,
    _stream_window_counts,
)

from .conftest import SF_SMOKE
from .test_oracle_parity import _normalize

EXPECTED_COLS = {
    "stream_window_counts": [
        "window_start_s",
        "event_type",
        "hour",
        "part_of_day",
        "n",
        "sum_value",
    ],
    "stream_session_windows": ["user_id", "n_sessions", "n_events"],
}

_IMPLS = {
    "stream_window_counts": _stream_window_counts,
    "stream_session_windows": _stream_session_windows,
}


def _stream_oracle(name: str) -> str:
    """The differential SQL for a streaming entry: the registration's
    oracle once promoted into the graded window (stream_window_counts,
    round 10), else the staged one."""
    return CATALOG[name].oracle or STREAMING_STAGED_ORACLES[name]


@pytest.mark.parametrize("name", sorted(_IMPLS))
def test_stream_query_matches_staged_oracle(spark, duck, name):
    """The driver differential, staged: the streaming replay's final
    state equals the DuckDB batch SQL over the same parquet."""
    sdf = CATALOG[name].fn(spark, SF_SMOKE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(_stream_oracle(name))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert [c.lower() for c in sdf.columns] == EXPECTED_COLS[name]
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in duck_cols
    )
    assert len(spark_rows) == len(duck_rows) > 0
    assert _normalize(spark_rows, [c.lower() for c in sdf.columns]) == (
        _normalize(duck_rows, [c.lower() for c in duck_cols])
    )


def test_stream_session_oracle_is_the_batch_twin():
    """The staged streaming-session oracle must stay byte-identical to
    the driver-green batch twin's registered oracle (modulo the final
    ORDER BY the streaming entry adds) — that identity is the claim
    'streaming equals the graded batch operator'."""
    batch = CATALOG["session_window_native"].oracle
    staged = STREAMING_STAGED_ORACLES["stream_session_windows"]
    assert staged == batch + " ORDER BY 1", (staged, batch)


@pytest.mark.parametrize("name", sorted(_IMPLS))
def test_stream_result_is_micro_batch_split_independent(
    spark, tmp_path, name
):
    """availableNow + maxFilesPerTrigger=1 over a 4-file copy of the
    events table processes four micro-batches (one file each — the
    Spark file-source contract); the complete-mode final state must be
    byte-identical to the one-batch replay of the same rows. For the
    session query this is the deep state-store property: sessions of a
    user whose events arrive in DIFFERENT micro-batches must merge."""
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    # events.parquet as a DIRECTORY of 4 files, like a real lake layout
    src.repartition(4).write.parquet(str(tmp_path / "events.parquet"))
    n_files = len(
        [p for p in (tmp_path / "events.parquet").glob("*.parquet")]
    )
    assert n_files == 4

    fn = _IMPLS[name]
    split = fn(spark, str(tmp_path), max_files_per_trigger=1)
    whole = fn(spark, str(tmp_path))
    split_rows = sorted(tuple(r) for r in split.collect())
    whole_rows = sorted(tuple(r) for r in whole.collect())
    assert split.columns == whole.columns
    assert len(split_rows) > 0
    assert split_rows == whole_rows


@pytest.mark.parametrize("name", sorted(_IMPLS))
def test_stream_query_on_empty_events(spark, tmp_path, name):
    """Zero-row input: the replay terminates, the memory table exists,
    and the schema is the contracted one."""
    empty = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(0)
    empty.write.parquet(str(tmp_path / "events.parquet"))
    out = CATALOG[name].fn(spark, str(tmp_path))
    assert [c.lower() for c in out.columns] == EXPECTED_COLS[name]
    assert out.count() == 0


def test_stream_session_gap_boundary_triple_agreement(spark, tmp_path):
    """The session boundary on a hand-built fixture, agreed three ways:
    the ENGINE's merge rule (measured here, batch AND streaming) is
    next-event <= previous + gap, so an event EXACTLY 1800 s after the
    previous one still MERGES and only 1801 s splits. Streaming replay,
    the batch twin, and the DuckDB oracle must all emit the same rows —
    this fixture is what caught the original >= oracle as wrong about
    the engine (latent: no driver testdata generation has contained an
    exact-gap pair), and it keeps the three from ever drifting again."""
    import duckdb

    t0 = 1_704_067_200  # 2024-01-01 00:00:00 UTC, inside the epoch contract
    rows = []
    eid = 0

    def ev(user, offs):
        nonlocal eid
        for o in offs:
            eid += 1
            rows.append((eid, (t0 + o) * 1_000_000, user, "click", 1.0, "{}"))

    ev(10, [0, 1800])          # exactly gap apart -> still ONE session
    ev(11, [0, 1799])          # inside gap        -> 1 session
    ev(12, [0, 900, 2699])     # chain of merges   -> 1 session
    ev(13, [0, 1801, 3700])    # strictly past gap, twice -> 3 sessions
    ev(14, [0, 1800, 3601])    # merge at the boundary, then split -> 2
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts_us bigint, user_id bigint, "
        "event_type string, value double, props string",
    ).select(
        "event_id",
        (F.col("ts_us") / 1_000_000).cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    expected = [(10, 1, 2), (11, 1, 2), (12, 1, 3), (13, 3, 3), (14, 2, 3)]
    streamed = [
        tuple(r)
        for r in CATALOG["stream_session_windows"].fn(spark, str(tmp_path)).collect()
    ]
    assert streamed == expected
    batch = sorted(
        tuple(r)
        for r in CATALOG["session_window_native"].fn(spark, str(tmp_path)).collect()
    )
    assert batch == expected
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    oracle = con.execute(
        STREAMING_STAGED_ORACLES["stream_session_windows"]
    ).fetchall()
    assert [tuple(r) for r in oracle] == expected


def test_as_stream_dir_passthrough_and_stale_link_repair(tmp_path):
    """_as_stream_dir hands directories through untouched; for a single
    file it builds a symlink dir, and REPOINTS the link when a previous
    run left it aimed at a different target (temp dirs collide across
    runs on path-hash, and a broken/stale link would make the file
    stream source list nothing — or worse, old data)."""
    import os

    from twitch_stream_data_pipeline_spark.plans.catalog import (
        _as_stream_dir,
    )

    d = tmp_path / "events.parquet"
    d.mkdir()
    assert _as_stream_dir(str(d)) == str(d)

    f = tmp_path / "single" / "events.parquet"
    f.parent.mkdir()
    f.write_bytes(b"x")
    out = _as_stream_dir(str(f))
    link = os.path.join(out, "events.parquet")
    assert os.path.islink(link)
    assert os.path.realpath(link) == str(f.resolve())
    # simulate a stale link from a colliding earlier run
    stale = tmp_path / "other.bin"
    stale.write_bytes(b"y")
    os.unlink(link)
    os.symlink(stale, link)
    out2 = _as_stream_dir(str(f))
    assert out2 == out
    assert os.path.realpath(os.path.join(out2, "events.parquet")) == str(
        f.resolve()
    )
    # a REGULAR file squatting in the slot (leftover copy / planted in
    # the predictable tmp path) must be replaced, never silently served
    os.unlink(link)
    with open(link, "wb") as fh:
        fh.write(b"not the data")
    out3 = _as_stream_dir(str(f))
    assert os.path.islink(os.path.join(out3, "events.parquet"))
    assert os.path.realpath(os.path.join(out3, "events.parquet")) == str(
        f.resolve()
    )


def test_as_stream_dir_refuses_untrusted_holder(tmp_path):
    """ADVICE r9: the symlink-holder directory lives at a PREDICTABLE
    path under world-writable /tmp, and ``mkdir(exist_ok=True)``
    silently accepts a pre-existing directory of any owner/mode — a
    pre-created open-mode (or attacker-owned) holder would let the
    symlink be swapped to stream arbitrary files. The function must
    stat what mkdir handed back and refuse anything that isn't ours
    with zero group/other access (the tempfile.mkdtemp guarantee),
    and refuse a symlink squatting where the holder should be."""
    import hashlib
    import os
    import shutil
    import tempfile

    from twitch_stream_data_pipeline_spark.plans.catalog import (
        _as_stream_dir,
    )

    f = tmp_path / "events.parquet"
    f.write_bytes(b"x")
    key = hashlib.md5(
        f"{os.geteuid()}:{f.resolve()}".encode()
    ).hexdigest()[:16]
    holder = os.path.join(tempfile.gettempdir(), f"spark_stream_src_{key}")

    # pre-created with group/other access (the planted-directory shape
    # a same-uid test CAN produce; a foreign uid fails the same check)
    shutil.rmtree(holder, ignore_errors=True)
    os.mkdir(holder, mode=0o755)
    os.chmod(holder, 0o755)  # mkdir mode is umask-filtered; force it
    with pytest.raises(RuntimeError, match="no group/other bits"):
        _as_stream_dir(str(f))

    # a symlink squatting at the holder path (points somewhere ours and
    # private, but the holder itself must be a real directory)
    shutil.rmtree(holder, ignore_errors=True)
    decoy = tmp_path / "decoy"
    decoy.mkdir(mode=0o700)
    os.symlink(decoy, holder)
    with pytest.raises(RuntimeError, match="not a directory"):
        _as_stream_dir(str(f))
    os.unlink(holder)

    # and the happy path still works after cleanup
    out = _as_stream_dir(str(f))
    assert os.path.islink(os.path.join(out, "events.parquet"))
    st = os.lstat(out)
    assert st.st_uid == os.geteuid()
    assert (st.st_mode & 0o077) == 0


def test_stream_replay_drops_previous_memory_view(spark):
    """Replay view GC: a long session (bench reps, sweeps) must hold at
    most ONE materialized memory-sink table per streaming entry — each
    replay drops its predecessor's temp view."""
    from twitch_stream_data_pipeline_spark.plans.catalog import (
        _STREAM_REPLAY_VIEWS,
    )

    CATALOG["stream_window_counts"].fn(spark, SF_SMOKE).collect()
    first = _STREAM_REPLAY_VIEWS["stream_window_counts"]
    CATALOG["stream_window_counts"].fn(spark, SF_SMOKE).collect()
    second = _STREAM_REPLAY_VIEWS["stream_window_counts"]
    assert first != second
    live = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert second in live
    assert first not in live


def test_stale_replay_handle_contract(spark, tmp_path):
    """VERDICT r9 #7: what happens to the DataFrame a previous replay
    invocation returned, after a re-invoke drops its temp view? The
    contract (documented at _STREAM_REPLAY_VIEWS): nothing opaque — the
    old handle's ANALYZED plan references its own epoch's memory sink
    directly, so it keeps returning ITS OWN replay's rows. It is never
    silently rebound to the newer replay's data and never becomes an
    unexplained analysis error. Proven on two DIFFERENT inputs so
    'still serves its own rows' is distinguishable from 'serves the
    latest rows'."""
    from pyspark.sql import functions as F

    from twitch_stream_data_pipeline_spark.plans.catalog import (
        _STREAM_REPLAY_VIEWS,
    )

    # second input: a 1/10th subset written to a private dir, so the
    # two replays produce visibly different row counts
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    src.filter(F.col("event_id") % 10 == 0).write.parquet(
        str(tmp_path / "events.parquet")
    )

    first = CATALOG["stream_window_counts"].fn(spark, SF_SMOKE)
    first_rows = sorted(tuple(r) for r in first.collect())
    first_view = _STREAM_REPLAY_VIEWS["stream_window_counts"]

    second = CATALOG["stream_window_counts"].fn(spark, str(tmp_path))
    second_rows = sorted(tuple(r) for r in second.collect())
    assert second_rows != first_rows  # different inputs, different state

    # the stale handle still collects, and returns its OWN epoch's rows
    assert sorted(tuple(r) for r in first.collect()) == first_rows
    # while the catalog name backing it is genuinely gone
    live = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert first_view not in live


def test_stream_source_join_broadcasts_the_dim(spark):
    """100 TB plan pin on the STREAMING side: the stream-static join to
    the 96-row S9 dim must carry the broadcast strategy (a shuffle join
    of the fact stream against a 96-row dim would be the classic
    small-dim mistake, per micro-batch this time). Pinned on the
    PRODUCTION pre-sink plan (_stream_window_counts_plan — the exact
    DataFrame the replay sinks), so dropping the hint in the catalog
    code fails here."""
    from twitch_stream_data_pipeline_spark.plans.catalog import (
        _stream_window_counts_plan,
    )

    agg = _stream_window_counts_plan(spark, SF_SMOKE)
    # a streaming DataFrame cannot be batch-analyzed (optimizedPlan
    # raises); the broadcast strategy hint is already pinned in the
    # resolved LOGICAL plan, which needs no execution
    plan = agg._jdf.queryExecution().logical().toString()
    assert "broadcast" in plan.lower(), plan
