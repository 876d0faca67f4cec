"""S5/S6: the paged-cursor API source as a Spark 4 Python Data Source.

Fixture layout mirrors a recorded Helix session
(``scripts/get_raw_data/get_raw_streams_data.py:78-101``): each batch
directory holds cursor-linked page files; ``pagination.cursor`` names
the next page, an empty ``pagination`` ends the chain.
"""

from __future__ import annotations

import io
import json
import os

import pytest

from twitch_stream_data_pipeline_spark.sources.paged_api import (
    END_CURSOR,
    FilePager,
    HttpPager,
    PagedEnvelopeDataSource,
    PagedEnvelopeStreamReader,
    _walk,
)


def _write_page(root, batch, cursor, records, next_cursor=None):
    os.makedirs(os.path.join(root, batch), exist_ok=True)
    envelope = {"data": records}
    envelope["pagination"] = {"cursor": next_cursor} if next_cursor else {}
    with open(os.path.join(root, batch, f"{cursor}.json"), "w") as fh:
        json.dump(envelope, fh, indent=4)  # reference writes indented


@pytest.fixture()
def session_dir(tmp_path):
    """Two batches: b1 has a 3-page chain, b2 a single page."""
    root = str(tmp_path / "recorded")
    _write_page(root, "b1", "start",
                [{"id": "1", "game_id": "10"}, {"id": "2", "game_id": "10"}],
                next_cursor="c1")
    _write_page(root, "b1", "c1", [{"id": "3", "game_id": "10"}],
                next_cursor="c2")
    _write_page(root, "b1", "c2", [{"id": "4", "game_id": "10"}])
    _write_page(root, "b2", "start", [{"id": "9", "game_id": "20"}])
    return root


def test_batch_read_follows_cursor_chain(spark, session_dir):
    spark.dataSource.register(PagedEnvelopeDataSource)
    df = (
        spark.read.format("paged_envelope")
        .option("path", session_dir)
        .load()
    )
    rows = sorted(
        (r["batch_id"], r["page"], r["record_pos"],
         json.loads(r["value"])["id"])
        for r in df.collect()
    )
    assert rows == [
        ("b1", 0, 0, "1"), ("b1", 0, 1, "2"),
        ("b1", 1, 0, "3"), ("b1", 2, 0, "4"),
        ("b2", 0, 0, "9"),
    ]
    # one input partition per batch — the reference's id-batch fan-out
    assert (
        df.selectExpr("spark_partition_id() pid", "batch_id")
        .distinct().count() == 2
    )


def test_batch_read_explicit_batches_option(spark, session_dir):
    spark.dataSource.register(PagedEnvelopeDataSource)
    df = (
        spark.read.format("paged_envelope")
        .option("path", session_dir)
        .option("batches", "b2")
        .load()
    )
    assert [r["batch_id"] for r in df.collect()] == ["b2"]


def test_walk_raises_on_cursor_cycle(tmp_path):
    root = str(tmp_path)
    _write_page(root, "b", "start", [{"id": "1"}], next_cursor="loop")
    _write_page(root, "b", "loop", [{"id": "2"}], next_cursor="loop")
    with pytest.raises(RuntimeError, match="cursor cycle"):
        list(_walk(FilePager(root), "b", "start", 100))


def test_walk_raises_on_page_limit(tmp_path):
    root = str(tmp_path)
    _write_page(root, "b", "start", [{"id": "1"}], next_cursor="c1")
    _write_page(root, "b", "c1", [{"id": "2"}], next_cursor="c2")
    _write_page(root, "b", "c2", [{"id": "3"}])
    with pytest.raises(RuntimeError, match="page_limit"):
        list(_walk(FilePager(root), "b", "start", 2))


def test_stream_reader_rate_limit_and_offsets(session_dir):
    """Driver-side protocol test: one page per trigger per batch, the
    offset is the (cursor, pages_done) chain position, the emitted
    ``page`` column is CHAIN-GLOBAL (identical to what the batch
    reader emits for the same directory), and the chain parks at
    'end'."""
    reader = PagedEnvelopeStreamReader(
        {"path": session_dir, "max_pages_per_trigger": "1"}
    )
    off0 = reader.initialOffset()
    assert off0 == {
        "cursors": {"b1": "start", "b2": "start"},
        "pages": {"b1": 0, "b2": 0},
        "stalls": {"b1": 0, "b2": 0},
    }

    rows1, off1 = reader.read(off0)
    rows1 = list(rows1)
    ids1 = sorted(json.loads(v)["id"] for _, _, _, v in rows1)
    assert ids1 == ["1", "2", "9"]  # page 0 of both batches
    assert {(b, p) for b, p, _, _ in rows1} == {("b1", 0), ("b2", 0)}
    assert off1 == {
        "cursors": {"b1": "c1", "b2": END_CURSOR},
        "pages": {"b1": 1, "b2": 1},
        "stalls": {"b1": 0, "b2": 0},
    }

    rows2, off2 = reader.read(off1)
    rows2 = list(rows2)
    assert sorted(json.loads(v)["id"] for _, _, _, v in rows2) == ["3"]
    # chain-global numbering: this is page 1 of b1, not "page 0 of the
    # second micro-batch" (streaming/batch parity for derived keys)
    assert [(b, p) for b, p, _, _ in rows2] == [("b1", 1)]
    assert off2["cursors"]["b1"] == "c2" and off2["pages"]["b1"] == 2

    rows3, off3 = reader.read(off2)
    rows3 = list(rows3)
    assert [(b, p) for b, p, _, _ in rows3] == [("b1", 2)]
    assert off3["cursors"] == {"b1": END_CURSOR, "b2": END_CURSOR}

    rows4, off4 = reader.read(off3)
    assert list(rows4) == [] and off4 == off3  # exhausted, stable

    # recovery path: deterministic replay of the committed range,
    # with the same chain-global page numbers
    replay = list(reader.readBetweenOffsets(off0, off1))
    assert sorted(json.loads(v)["id"] for _, _, _, v in replay) == ids1
    replay2 = list(reader.readBetweenOffsets(off1, off2))
    assert [(b, p) for b, p, _, _ in replay2] == [("b1", 1)]


def test_stream_reader_parks_on_unrecorded_page(tmp_path):
    """A recorder mid-write (pagination.cursor committed before the
    next page file exists) must PARK the batch — emit nothing, keep the
    cursor — and resume when the page appears, never kill the query."""
    root = str(tmp_path / "live")
    _write_page(root, "b", "start", [{"id": "1"}], next_cursor="pending")
    reader = PagedEnvelopeStreamReader(
        {"path": root, "max_pages_per_trigger": "5"}
    )
    rows1, off1 = reader.read(reader.initialOffset())
    assert [json.loads(v)["id"] for _, _, _, v in rows1] == ["1"]
    assert off1["cursors"]["b"] == "pending"  # parked, not crashed

    rows2, off2 = reader.read(off1)
    assert list(rows2) == []  # still parked
    assert off2["cursors"] == off1["cursors"]
    assert off2["pages"] == off1["pages"]
    assert off2["stalls"]["b"] == 1  # the no-progress trigger is counted

    _write_page(root, "b", "pending", [{"id": "2"}])  # recorder catches up
    rows3, off3 = reader.read(off2)
    assert [(b, p, json.loads(v)["id"]) for b, p, _, v in rows3] == [
        ("b", 1, "2")
    ]
    assert off3["cursors"]["b"] == END_CURSOR


def test_streaming_end_to_end_with_checkpoint(spark, session_dir, tmp_path):
    """The real readStream surface: micro-batches respect the page
    budget and a restart resumes from the checkpointed cursor offset
    without re-emitting committed pages (exactly-once per page)."""
    spark.dataSource.register(PagedEnvelopeDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("paged_envelope")
            .option("path", session_dir)
            .option("max_pages_per_trigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Python micro-batch sources run a single batch per availableNow
    # start (Spark logs the fallback), so each run_once processes
    # exactly one rate-limited micro-batch and checkpoints its cursor
    # map — three restarts walk the whole 3-page chain with no page
    # ever re-emitted.
    run_once()
    first = sorted(
        json.loads(r["value"])["id"] for r in spark.read.parquet(out).collect()
    )
    assert first == ["1", "2", "9"]  # page 0 of each batch, nothing more
    run_once()
    run_once()
    run_once()  # chain exhausted: must be a no-op, not a replay
    got = sorted(
        json.loads(r["value"])["id"] for r in spark.read.parquet(out).collect()
    )
    assert got == ["1", "2", "3", "4", "9"]


def test_http_pager_speaks_helix_protocol():
    """The live transport sends first/after/batch params and follows
    the returned cursor — verified against an injected fake opener, no
    network."""
    pages = {
        ("10", None): {"data": [{"id": "1"}],
                       "pagination": {"cursor": "abc"}},
        ("10", "abc"): {"data": [{"id": "2"}], "pagination": {}},
    }
    seen_urls = []

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req):
        from urllib.parse import parse_qs, urlparse

        seen_urls.append(req.full_url)
        q = parse_qs(urlparse(req.full_url).query)
        key = (q["game_id"][0], q.get("after", [None])[0])
        assert q["first"] == ["100"]
        assert req.headers.get("Client-id") == "cid"
        return FakeResponse(json.dumps(pages[key]).encode())

    pager = HttpPager(
        "https://api.example.test/streams",
        batch_param="game_id",
        page_size=100,
        headers={"Client-Id": "cid"},
    )
    pager._urlopen = fake_urlopen
    chain = list(_walk(pager, "10", "start", 10))
    assert [e["data"][0]["id"] for e, _, _ in chain] == ["1", "2"]
    assert [nxt for _, _, nxt in chain] == ["abc", END_CURSOR]
    assert len(seen_urls) == 2


def test_option_validation(tmp_path):
    from twitch_stream_data_pipeline_spark.sources.paged_api import (
        _batches,
        _make_pager,
    )

    with pytest.raises(ValueError, match="'path' is required"):
        _make_pager({})
    with pytest.raises(ValueError, match="'url' is required"):
        _make_pager({"transport": "http"})
    with pytest.raises(ValueError, match="unknown transport"):
        _make_pager({"transport": "carrier-pigeon"})
    with pytest.raises(ValueError, match="no batches"):
        _batches({"path": str(tmp_path)}, FilePager(str(tmp_path)))


def test_paged_ingest_composes_with_golden_pipeline(spark, tmp_path):
    """End-to-end S5 parity: the reference's 3,915-record raw shard,
    re-recorded as a cursor-paginated API session (100 records/page,
    the Helix `first: 100` page size), ingested through the
    paged_envelope source, parsed with the S1 record schema, and run
    through process_raw_streams + curate_streams — must match the
    reference's own processed/curated goldens exactly. This is the
    ingest path a reference user would actually migrate: API loop ->
    engine source, not a side-channel feeder."""
    import pyspark.sql.functions as F

    from twitch_stream_data_pipeline_spark import schemas
    from twitch_stream_data_pipeline_spark.pipeline.streams import (
        curate_streams,
        process_raw_streams,
    )

    from .test_golden_replay import PROCESSED, RAW, assert_matches_golden

    shard = json.load(
        open(
            f"{RAW}/raw_streams_data/20260111_1715/"
            "raw_streams_data_X370699X_20260111_1715.json"
        )
    )
    records = shard["data"]
    root = str(tmp_path / "session")
    page_size = 100
    pages = [
        records[i : i + page_size] for i in range(0, len(records), page_size)
    ]
    cursors = ["start"] + [f"c{i}" for i in range(1, len(pages))]
    for i, (cur, page) in enumerate(zip(cursors, pages)):
        nxt = cursors[i + 1] if i + 1 < len(pages) else None
        _write_page(root, "slot_20260111_1715", cur, page, next_cursor=nxt)

    spark.dataSource.register(PagedEnvelopeDataSource)
    paged = (
        spark.read.format("paged_envelope")
        .option("path", root)
        .option("page_limit", "100")
        .load()
    )
    parsed = paged.select(
        F.lit(shard["day_date_id"]).alias("day_date_id"),
        F.lit(shard["time_of_day_id"]).alias("time_of_day_id"),
        F.col("batch_id").alias("source_file"),
        (F.col("page") * page_size + F.col("record_pos")).alias("record_pos"),
        F.from_json("value", schemas.RAW_STREAM_RECORD).alias("record"),
    ).select(
        "day_date_id",
        "time_of_day_id",
        "source_file",
        "record_pos",
        *[f"record.{f.name}" for f in schemas.RAW_STREAM_RECORD.fields],
    )
    processed = process_raw_streams(parsed)
    assert_matches_golden(
        processed,
        f"{PROCESSED}/processed_streams_data/20260111/"
        "processed_streams_data_20260111_1715.csv",
    )
    curated = curate_streams(processed, "20260111", "1715")
    assert curated.count() == processed.count()


def test_stream_reader_self_loop_and_stall_alarm(tmp_path):
    """Guard rails: a page naming itself as next raises immediately
    even at one page per trigger; the opt-in max_consecutive_stalls
    alarm converts a permanently-missing page from an invisible
    forever-park into a loud error, with the stall count carried in
    the offset."""
    root = str(tmp_path / "bad")
    _write_page(root, "loopy", "start", [{"id": "1"}], next_cursor="start")
    reader = PagedEnvelopeStreamReader(
        {"path": root, "max_pages_per_trigger": "1"}
    )
    with pytest.raises(RuntimeError, match="self-loop"):
        reader.read(reader.initialOffset())

    root2 = str(tmp_path / "stalled")
    _write_page(root2, "b", "start", [{"id": "1"}], next_cursor="never")
    reader2 = PagedEnvelopeStreamReader(
        {"path": root2, "max_pages_per_trigger": "1",
         "max_consecutive_stalls": "2"}
    )
    rows, off = reader2.read(reader2.initialOffset())
    assert len(list(rows)) == 1 and off["stalls"]["b"] == 0
    rows, off = reader2.read(off)  # stall 1: parked, counted, tolerated
    assert list(rows) == [] and off["stalls"]["b"] == 1
    with pytest.raises(RuntimeError, match="consecutive triggers"):
        reader2.read(off)  # stall 2 hits the alarm
