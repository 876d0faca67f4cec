#!/usr/bin/env python
"""One-off engine-config-independence sweep: run EVERY catalog query
under the tuned default session AND under hostile-but-legal engine
configurations, then diff the sorted results. Thirteen axes:

``interpreted``
    ``spark.sql.codegen.wholeStage=false`` +
    ``spark.sql.codegen.factoryMode=NO_CODEGEN`` +
    ``spark.sql.adaptive.enabled=false`` — every expression runs on the
    interpreted path and every plan keeps its static shuffle layout.
    Whole-stage codegen and the interpreted evaluator are separate
    implementations of the same expression semantics; historically they
    have diverged (overflow handling, null short-circuits, UDF batch
    boundaries). A catalog whose results depend on WHICH evaluator ran
    is silently broken on any cluster that flips these knobs (codegen
    falls back on its own when generated code exceeds JVM limits, so
    the interpreted path IS reachable in production without anyone
    setting a conf).

``tz``
    ``spark.sql.session.timeZone=Asia/Kathmandu`` (UTC+05:45 — an
    oddball offset that shifts every hour/day boundary). The catalog's
    stated contract (plans/catalog.py header) is timezone-free epoch
    arithmetic emitted as strings or bigints; a query whose output
    moves with the session timezone would silently break DuckDB-oracle
    parity (DuckDB runs in UTC) the day the engine is deployed in a
    non-UTC environment.

``tz-dst``
    ``spark.sql.session.timeZone=America/New_York`` — a DST zone, the
    failure class a fixed offset cannot catch: two dates of the same
    column can sit on different offsets, so same-column epoch
    differences stop cancelling (caught rfm_segments' recency
    arithmetic after Kathmandu passed it).

``tz-dst-half``
    ``spark.sql.session.timeZone=Australia/Lord_Howe`` — a 30-minute
    DST shift on a :30 base offset, the only transition class that can
    alias with the engine's 15-minute grid arithmetic (Kathmandu never
    transitions; New York transitions by whole hours).

``row-reader``
    ``spark.sql.parquet.enableVectorizedReader=false`` — every scan
    decodes through the row-based parquet reader, a separate
    implementation production falls back to on its own for schemas
    the vectorized reader can't handle.

``sort-strategies``
    ``spark.sql.execution.useObjectHashAggregateExec=false`` +
    ``spark.sql.join.preferSortMergeJoin=true`` — SortAggregate and
    sort-merge joins accumulate in different row orders than the
    default hash operators, so any float aggregation not routed
    through the DECIMAL order-independence rule diverges here.

``tiny-splits``
    ``spark.sql.files.maxPartitionBytes=64K`` — every table scan
    arrives as MANY input splits, the layout a 1000-executor cluster
    produces and a single-file local read never does.

``small-batches``
    ``spark.sql.execution.arrow.maxRecordsPerBatch=16`` — every
    pandas/arrow UDF sees reshaped batches; results must not depend
    on how rows happen to be batched.

``legacy-nonansi``
    ``spark.sql.ansi.enabled=false`` — the Spark 3.x evaluation regime
    (silent overflow wrap, NULL on bad cast, NULL on x/0) production
    clusters still run for compatibility. No catalog result may depend
    on which regime evaluated it.

``no-pushdown``
    ``spark.sql.parquet.filterPushdown=false`` (+ aggregatePushdown) —
    every predicate evaluates post-scan instead of inside the parquet
    reader; both paths are reachable in production and must agree.

``kryo``
    ``spark.serializer=KryoSerializer`` — the near-universal
    production tuning knob; broadcasts, cached blocks, and closure
    state cross a different encoder. Results must not depend on which
    serializer carried them.

``no-broadcast``
    ``spark.sql.autoBroadcastJoinThreshold=-1`` — auto-broadcast OFF,
    the standard ops mitigation for driver OOM on mis-estimated join
    sides. Every join Catalyst would have broadcast on its own becomes
    a shuffle join (explicit ``F.broadcast`` hints still broadcast),
    feeding downstream aggregates in different row orders — a
    join-physicalization class ``sort-strategies`` cannot reach
    (that axis only re-picks AMONG shuffle joins).

``cores``
    ``spark.master=local[3]`` — a different executor-core count
    changes ``sc.defaultParallelism``, the partition count of every
    ``createDataFrame``/``parallelize``/``range`` without explicit
    slices (the generator dims, every driver-built broadcast
    relation). The determinism sweep varies SHUFFLE partitions;
    this varies the INPUT parallelism of driver-originated data —
    on a real cluster it is never the local default.

Like the determinism sweep, each pass runs in its OWN SparkSession
(stopped between passes) because these confs are session-creation
semantics here; comparisons are on sorted reprs, same as the other
sweeps.

Usage: python tests/config_sweep.py [--sf DIR] [--variant NAME]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitch_stream_data_pipeline_spark.session import get_spark

VARIANTS: dict[str, dict[str, str]] = {
    "interpreted": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        "spark.sql.adaptive.enabled": "false",
    },
    "tz": {
        "spark.sql.session.timeZone": "Asia/Kathmandu",
    },
    # A DST zone is a DIFFERENT failure class from Kathmandu's fixed
    # +05:45: a constant offset cancels in any same-column epoch
    # difference, while a DST zone puts two dates of the same column
    # on different offsets (the 1992-1998 order/ship dates straddle
    # dozens of transitions) — this axis caught rfm_segments' NTZ
    # cast+unix_timestamp recency arithmetic after Kathmandu passed
    # it (round-10 review find).
    "tz-dst": {
        "spark.sql.session.timeZone": "America/New_York",
    },
    # A SUB-HOUR DST shift is yet another class (VERDICT r10 #7):
    # Lord Howe Island moves by 30 minutes at DST (+10:30 <-> +11:00)
    # and sits on a :30 base offset — the only transition shape that
    # can alias with the engine's 15-minute grid arithmetic. Kathmandu
    # (fixed :45) never transitions and New York transitions by whole
    # hours, so neither can catch a grid cell that survives whole-hour
    # shifts but moves under a half-hour one.
    "tz-dst-half": {
        "spark.sql.session.timeZone": "Australia/Lord_Howe",
    },
    # Scan-split independence: 64 KB splits turn every single-file
    # local read into the many-partition layout a 1000-executor
    # cluster sees (the local[8] default reads each driver table as
    # ONE split, so split-boundary behavior is otherwise never
    # exercised). openCostInBytes=0 keeps tiny files from being
    # glued back together.
    "tiny-splits": {
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.files.openCostInBytes": "0",
    },
    # Arrow-batch-shape independence: 16-row batches reshape every
    # pandas/arrow UDF invocation (mapInPandas, grouped-map, UDTF) —
    # any op whose float order or logic depends on how rows happen to
    # be batched diverges here (the order sweep caught pca_project's
    # batch-shaped BLAS matmul; this axis pins the whole UDF surface
    # against the same class).
    "small-batches": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "16",
    },
    # Parquet-decoder independence: the row-based (non-vectorized)
    # parquet reader is a SEPARATE decode implementation from the
    # default columnar one (different null/dictionary/decimal paths),
    # and production flips to it on its own for schemas the vectorized
    # reader can't handle (nested types beyond its support, wide
    # decimals). Every scan in the engine must read identical values
    # through both.
    "row-reader": {
        "spark.sql.parquet.enableVectorizedReader": "false",
    },
    # Physical-strategy independence: force SortAggregate where
    # ObjectHashAggregate would run (collect_list/sketch-typed
    # aggregates) and prefer sort-merge over shuffled-hash joins —
    # different physical operators accumulate in DIFFERENT row orders,
    # so this axis has real teeth against float aggregation: any sum
    # not routed through the catalog's order-independent DECIMAL rule
    # diverges here. Catalyst picks these operators on its own from
    # data statistics at scale; results must never depend on which
    # one ran.
    "sort-strategies": {
        "spark.sql.execution.useObjectHashAggregateExec": "false",
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    # ANSI-mode independence (round 12): Spark 4 defaults
    # spark.sql.ansi.enabled=true, but production clusters routinely
    # run ansi=false for 3.x compatibility — a SEPARATE evaluation
    # regime where overflow wraps silently, bad casts return NULL
    # instead of raising, and x/0 is NULL. The catalog's contract is
    # that no query depends on ANSI error behavior (TRY_CAST and
    # explicit guards everywhere a malformed value is in-domain), so
    # results must be bit-identical under both regimes; any divergence
    # means an expression silently relies on ANSI raising (or on
    # legacy wrapping) somewhere in its domain.
    "legacy-nonansi": {
        "spark.sql.ansi.enabled": "false",
    },
    # Scan-pushdown independence (round 12): with filterPushdown off,
    # every predicate evaluates post-scan in the JVM instead of inside
    # the parquet reader (row-group statistics, dictionary and bloom
    # pruning). Pushdown is a separate predicate-evaluation
    # implementation with its own storied bug class (NULL handling on
    # nested fields, timestamp/decimal comparisons at row-group
    # boundaries), and Spark disables it by itself for predicates it
    # can't translate — both paths are reachable in production, so
    # every graded result must be identical through either.
    "no-pushdown": {
        "spark.sql.parquet.filterPushdown": "false",
        "spark.sql.parquet.aggregatePushdown": "false",
    },
    # Serializer independence (round 12): KryoSerializer instead of
    # the default JavaSerializer — a near-universal production tuning
    # knob that changes how broadcast variables, cached blocks, and
    # shuffled non-Tungsten objects are encoded. SQL row data rides
    # Tungsten either way, but driver-built broadcasts (the dims,
    # persisted model params) and any accidentally-serialized closure
    # state cross Kryo here; results must not depend on which
    # serializer carried them.
    "kryo": {
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    },
    # Join-physicalization independence (round 12): auto-broadcast
    # disabled — the standard production mitigation when size
    # estimates lie (a "small" side that isn't OOMs the driver).
    # Joins that the baseline session auto-broadcasts (64 MB
    # threshold) become shuffle joins, so their downstream aggregates
    # consume rows in different orders; explicit F.broadcast hints
    # (the dashboard/star dims) still broadcast, which is exactly the
    # production contract — hinted plans are pinned, unhinted plans
    # are Catalyst's to re-physicalize, and results must survive
    # either choice. Distinct from sort-strategies, which only
    # re-picks among SHUFFLE join implementations.
    "no-broadcast": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
    # Input-parallelism independence (round 12): a different core
    # count changes sc.defaultParallelism and with it the slicing of
    # every createDataFrame/parallelize/range without explicit
    # numSlices — the generator dims, driver-built model relations,
    # test fixtures. The determinism sweep varies shuffle partitions
    # (7 vs 32); this varies how driver-originated data is SPLIT
    # before the first shuffle, which on a real cluster is set by the
    # cluster manager, never by the local default. spark.master is a
    # builder option like any other conf, applied after the factory's
    # .master() call, so the variant mechanism carries it; the
    # took-effect check reads it back from spark.conf.
    "cores": {
        "spark.master": "local[3]",
    },
}


def run_all(sf: str, label: str, extra_conf: dict[str, str] | None) -> dict:
    from tests.conftest import collect_catalog_snapshot

    spark = get_spark(f"cfg-{label}", cpus=8, extra_conf=extra_conf)
    # get_spark reuses a live session if one exists — that would make
    # every variant run under the baseline confs and the sweep would
    # compare the baseline with itself. Creation must be real.
    for k, v in (extra_conf or {}).items():
        got = spark.conf.get(k, None)
        if got != v:
            spark.stop()
            raise RuntimeError(
                f"variant conf {k}={v!r} did not take (got {got!r}); "
                "a pre-existing SparkSession leaked into the sweep"
            )
    out = collect_catalog_snapshot(spark, sf)
    spark.stop()
    return out


def main() -> int:
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    only = None
    if "--variant" in sys.argv:
        only = sys.argv[sys.argv.index("--variant") + 1]
    base = run_all(sf, "base", None)
    bad = 0
    for label, conf in VARIANTS.items():
        if only and label != only:
            continue
        var = run_all(sf, label, conf)
        diff = [n for n in base if base[n] != var[n]]
        for n in diff:
            b, v = base[n], var[n]
            detail = ""
            if b[0] == "ERR" or v[0] == "ERR":
                detail = f" base={b[1] if b[0] == 'ERR' else 'ok'}" \
                         f" {label}={v[1] if v[0] == 'ERR' else 'ok'}"
            print(f"  DIFF[{label}] {n}{detail}")
        bad += len(diff)
        print(
            f"{len(base) - len(diff)}/{len(base)} queries identical "
            f"under {label} ({conf})"
        )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
