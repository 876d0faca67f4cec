from __future__ import annotations

import pytest

from twitch_stream_data_pipeline_spark.compat import ensure_protobuf
from twitch_stream_data_pipeline_spark.session import get_spark

# Must run before any SparkSession exists: Python workers inherit
# PYTHONPATH at session start, and transformWithStateInPandas workers
# need google.protobuf (wired from the system's vendored copy when no
# protobuf distribution is installed — see compat.ensure_protobuf).
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize_rows(rows, columns):
    """THE graded comparison normalization (sort columns by name, rows
    by repr, NaN canonicalized) — every differential in the suite must
    use this one helper so the sweeps can never diverge from the
    oracle-parity semantics. ``test_oracle_parity._normalize`` is an
    alias of this function."""
    import math

    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v!r}"
        return repr(v)

    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def collect_catalog_snapshot(spark, sf_dir: str) -> dict:
    """THE engine-vs-engine sweep collector (config / order sweeps):
    run every catalog query and return ``{name: (sorted_columns,
    sorted_row_reprs)}``, with ``("ERR", message)`` for a raise.
    Single-sourced here — like :func:`normalize_rows` — so a
    comparison-semantics fix can never be applied to one sweep and
    missed in another."""
    from twitch_stream_data_pipeline_spark.plans import CATALOG

    out = {}
    for name, q in sorted(CATALOG.items()):
        try:
            df = q.fn(spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            cols = [c.lower() for c in df.columns]
            out[name] = (tuple(sorted(cols)), tuple(normalize_rows(rows, cols)))
        except Exception as e:  # noqa: BLE001 - sweeps report wholesale
            out[name] = ("ERR", repr(e)[:300])
    return out


def make_duck_views(con, sf_dir: str, glob_parts: bool = False):
    """Register the ten testdata tables as DuckDB views over
    ``sf_dir`` — single-file driver layout by default, or Spark-written
    directories-of-parts with ``glob_parts=True``."""
    suffix = "/*.parquet" if glob_parts else ""
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet{suffix}'"
        )
    return con


def graded_oracle(name: str) -> str | None:
    """THE oracle the harness would grade ``name`` with: the
    registration's when present, else the STAGED one queued for a
    future window swap (dashboard / streaming / contract tiers).
    Sweeps must use this resolver so a query's oracle is poison-tested
    BEFORE the round that promotes it into the graded window, not
    after. Returns None only for genuinely oracle-less queries
    (iterative algorithms, rows-only driver history)."""
    from twitch_stream_data_pipeline_spark.plans.catalog import (
        BPE_STAGED_ORACLES,
        CATALOG,
        CONTRACT_STAGED_ORACLES,
        DASHBOARD_STAGED_ORACLES,
        PACKING_STAGED_ORACLES,
        STREAMING_STAGED_ORACLES,
    )

    return (
        CATALOG[name].oracle
        or DASHBOARD_STAGED_ORACLES.get(name)
        or STREAMING_STAGED_ORACLES.get(name)
        or CONTRACT_STAGED_ORACLES.get(name)
        or PACKING_STAGED_ORACLES.get(name)
        or BPE_STAGED_ORACLES.get(name)
    )


def sweep_differential(
    spark, con, name: str, q, sf_dir: str, forbid_cols: set[str] = frozenset()
) -> str | None:
    """THE whole-catalog sweep body (poison / null / drift / empty):
    run the engine query, resolve the graded oracle (staged included),
    compare with :func:`normalize_rows`, and return a failure string —
    or None when clean. Single-sourced here so a comparison-semantics
    fix can never be applied to one sweep and missed in another.
    ``forbid_cols``: column names that must not leak into either
    side's output schema (the drift sweep's ``_drift_col``)."""
    try:
        sdf = q.fn(spark, sf_dir)
        s_cols = [c.lower() for c in sdf.columns]
        leaked = forbid_cols & set(s_cols)
        if leaked:
            return f"{name}: LEAKS {sorted(leaked)} into its output"
        s_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001 - sweeps report wholesale
        return f"{name}: ENGINE RAISED {e!r}"[:300]
    oracle = graded_oracle(name)
    if oracle is None:
        return None
    try:
        res = con.execute(oracle)
        d_cols = [c[0].lower() for c in res.description]
        d_rows = res.fetchall()
    except Exception as e:  # noqa: BLE001
        return f"{name}: ORACLE RAISED {e!r}"[:300]
    leaked = forbid_cols & set(d_cols)
    if leaked:
        return f"{name}: ORACLE leaks {sorted(leaked)}"
    if normalize_rows(s_rows, s_cols) != normalize_rows(d_rows, d_cols):
        return (
            f"{name}: MISMATCH engine {len(s_rows)} rows vs oracle "
            f"{len(d_rows)} rows"
        )
    return None


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    yield make_duck_views(duckdb.connect(), SF_SMOKE)
