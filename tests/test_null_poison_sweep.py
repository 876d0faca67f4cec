"""NULL-content sweep (round 10) — the missing axis of the round-9
poison matrix.

``test_poison_sweep`` proves the catalog survives degenerate VALUES
(empty text, zero vectors, malformed JSON, unicode); this module proves
it survives — and stays oracle-correct on — NULLs in the value columns,
which a real 100 TB corpus certainly contains and the driver generator
never produces:

* events: NULL ``user_id`` (an anonymous event), NULL ``event_type``,
  NULL ``value``, NULL ``props`` — each alone and one row with all
  four NULL — plus NULL ``ts`` rows that INTERACT with the temporal
  operators (a null-ts event for a user who also has real events, a
  null-ts click for a user who purchases, a same-user null-ts pair):
  an event without event time belongs to NO window / week / session /
  as-of chain — Spark's native ``window()``/``session_window()`` drop
  such rows, and every hand-rolled temporal operator and oracle must
  state the same exclusion, because the engines' fallback defaults
  genuinely differ (Spark sorts NULL orderings FIRST ascending, DuckDB
  LAST — a null-ts row would land at opposite ends of every lag/last
  chain);
* documents: NULL ``text``, NULL ``lang``, NULL ``source``, NULL
  ``n_chars`` — plus enough normal rows that text/dedup queries still
  produce non-trivial output;
* embeddings: left VALID on purpose — the similarity tier's dimension
  contract REJECTS null vectors loudly by design
  (``_check_embedding_dim_contract``), and that refusal is pinned in
  ``test_boundary_probes``; feeding it nulls here would just re-test
  the refusal.

Why this is its own divergence class and not "more poison": the
engines' NULL DEFAULTS genuinely differ where ordering is involved —
Spark sorts NULLS FIRST ascending where DuckDB sorts NULLS LAST, in
both ORDER BY and window frames — and Python UDF tiers (pandas batches,
UDTFs) receive ``None`` where the JVM tiers see a typed null, so any
``len(text)``-shaped code raises. Every oracle-bearing catalog query
must (a) not raise and (b) still match its DuckDB oracle on this data;
no-oracle queries must not raise. Failures are collected and reported
together so one bad operator doesn't hide the rest.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from twitch_stream_data_pipeline_spark.plans import CATALOG

from .conftest import (
    SF_SMOKE,
    TABLES,
    make_duck_views,
    sweep_differential,
    tail_sampled_out,
)

T0 = 1_704_067_200  # 2024-01-01 00:00:00 UTC


def _null_events(spark):
    rows = []
    eid = 0

    def ev(secs, user, typ, value, props="{}"):
        nonlocal eid
        eid += 1
        rows.append(
            (
                eid,
                secs * 1_000_000 if secs is not None else None,
                user,
                typ,
                value,
                props,
            )
        )

    # a normal backbone: funnel chains + a few per-type groups so the
    # analytics queries still emit rows
    for u in (1, 2):
        ev(T0 + u, u, "signup", 1.5, '{"k": 1}')
        ev(T0 + 600 + u, u, "click", 2.5, '{"k": 2}')
        ev(T0 + 1200 + u, u, "purchase", 3.5, '{"k": 3}')
    for i in range(8):
        ev(T0 + 30 * i, 3 + (i % 3), "view", 0.5 + i, '{"k": 4}')
    # the NULL matrix: each value column alone, then all at once
    ev(T0 + 5000, None, "click", 1.0, '{"k": 5}')        # anonymous
    ev(T0 + 5060, 4, None, 2.0, '{"k": 6}')              # untyped
    ev(T0 + 5120, 5, "click", None, '{"k": 7}')          # valueless
    ev(T0 + 5180, 6, "view", 3.0, None)                  # propless
    ev(T0 + 5240, None, None, None, None)                # all four
    # NULL value inside an otherwise-normal group (aggregation skip
    # semantics), and a NULL-type pair sharing a second (dedup keys)
    ev(T0 + 6000, 7, "view", None, '{"k": 8}')
    ev(T0 + 6060, 7, None, 1.0, '{"k": 9}')
    ev(T0 + 6060, 7, None, 1.0, '{"k": 9}')
    # NULL ts rows that INTERACT with temporal operators (see module
    # doc): for a user with real events (sessionize/lag chains), as a
    # click for a user who purchases (as-of attribution), alone for a
    # fresh user, and a same-user same-type pair (dedup/window keys)
    ev(None, 1, "click", 4.0, '{"k": 10}')
    ev(None, 3, "view", 0.25, '{"k": 11}')
    ev(None, 20, "click", 1.0, '{"k": 12}')
    # a purchase whose ONLY click is null-ts: the as-of chain must not
    # attribute it (an undated click precedes nothing)
    ev(None, 21, "click", 1.0, '{"k": 14}')
    ev(T0 + 7000, 21, "purchase", 5.0, '{"k": 15}')
    ev(None, 2, "view", 2.0, '{"k": 13}')
    ev(None, 2, "view", 2.0, '{"k": 13}')
    ev(None, None, None, None, None)
    return spark.createDataFrame(
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


def _null_documents(spark):
    para = (
        "the quick brown fox jumps over the lazy dog and then "
        "runs far away into the quiet green forest before dawn"
    )
    docs = [
        # normal backbone (variety so dedup/quality tiers emit rows)
        (0, para, "en", "src0"),
        (1, para + " indeed", "en", "src1"),
        (2, "zwei kurze worte hier", "de", "src2"),
        (3, "une phrase assez longue pour compter", "fr", "src3"),
        (4, "short text sample", "en", "src4"),
        (5, para.upper(), "es", "src5"),
        # the NULL matrix
        (6, None, "en", "src6"),        # NULL text
        (7, para, None, "src7"),        # NULL lang
        (8, para, "en", None),          # NULL source
        (9, None, None, None),          # all three
    ]
    rows = [
        (d, t, la, s, len(t) if t is not None else None)
        for d, t, la, s in docs
    ]
    # doc 10: NULL n_chars under non-NULL text (a broken upstream stat)
    rows.append((10, "metadata went missing here", "en", "src8", None))
    return spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )


@pytest.fixture(scope="module")
def null_poison_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_poison_sf")
    for t in TABLES:
        src = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        if t == "events":
            df = _null_events(spark)
        elif t == "documents":
            df = _null_documents(spark)
        else:
            # embeddings stay valid (dim contract — see module doc);
            # star tables are TPC-H-shaped NOT NULL columns
            df = src.limit(50)
        df.write.parquet(f"{out}/{t}.parquet")
    return str(out)


def test_null_poison_whole_catalog(spark, null_poison_dir):
    # round-salted >=5-green rotated-tail sampling (VERDICT r11 #9;
    # rationale on tail_sampled_out in conftest); dropped names are
    # printed, never silent, and SPARK_GRAFT_FULL_TAIL=1 restores full
    sampled = tail_sampled_out()
    if sampled:
        print(f"tail-sampled out this round ({len(sampled)}): {sorted(sampled)}")
    con = make_duck_views(duckdb.connect(), null_poison_dir, glob_parts=True)
    failures = [
        f
        for name, q in sorted(CATALOG.items())
        if name not in sampled
        and (f := sweep_differential(spark, con, name, q, null_poison_dir))
    ]
    assert not failures, "\n".join(sorted(failures))
