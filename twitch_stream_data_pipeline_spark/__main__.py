"""Command-line runner — the user-facing surface of the engine.

::

    python -m twitch_stream_data_pipeline_spark list [--tag dedup]
    python -m twitch_stream_data_pipeline_spark run pricing_summary \\
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain] [--json]
    python -m twitch_stream_data_pipeline_spark oracle pricing_summary

``run`` builds the named catalog query on a tuned session
(:func:`~.session.get_spark`) and prints rows (ASCII table, or one JSON
object per line with ``--json`` for piping); ``--explain`` prints the
formatted physical plan instead of executing — the judge-it-yourself
switch for the plan-shape claims in the query docstrings. ``oracle``
prints the DuckDB-dialect SQL twin, runnable against the same parquet
via any DuckDB shell.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="twitch_stream_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("--tag", help="only queries carrying this tag")

    run = sub.add_parser("run", help="execute a query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument(
        "--explain", action="store_true", help="print the plan, don't execute"
    )
    run.add_argument(
        "--json", action="store_true", help="one JSON object per row"
    )

    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("name")

    ver = sub.add_parser(
        "verify", help="run a query on Spark AND DuckDB, compare results"
    )
    ver.add_argument("name")
    ver.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ver.add_argument(
        "--max-rows",
        type=int,
        default=1_000_000,
        help="refuse to compare results larger than this (driver-OOM guard; "
        "the differential is a test-SF tool, not a production diff)",
    )
    return p


def _lookup(name: str):
    from .plans.catalog import CATALOG

    q = CATALOG.get(name)
    if q is None:
        close = [n for n in CATALOG if name.lower() in n]
        hint = f" (did you mean: {', '.join(sorted(close)[:5])}?)" if close else ""
        raise SystemExit(f"unknown query {name!r}{hint}")
    return q


def main(argv: list[str] | None = None, out=None) -> int:
    out = out if out is not None else sys.stdout  # late-bound default
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        from .plans.catalog import CATALOG, EXPOSURE_ORDER

        for i, name in enumerate(EXPOSURE_ORDER, 1):
            q = CATALOG[name]
            if args.tag and args.tag not in q.tags:
                continue
            oracle = "sql" if q.oracle else "rows-only"
            print(f"{i:3d}  {name:32s} {oracle:9s} {','.join(q.tags)}", file=out)
        return 0

    if args.cmd == "oracle":
        q = _lookup(args.name)
        if q.oracle is None:
            raise SystemExit(f"{args.name!r} has no SQL oracle (rows-only)")
        print(q.oracle.strip(), file=out)
        return 0

    if args.cmd == "verify":
        q = _lookup(args.name)
        if q.oracle is None:
            raise SystemExit(f"{args.name!r} has no SQL oracle (rows-only)")
        import duckdb

        from .session import get_spark

        spark = get_spark(f"cli-verify:{args.name}")
        sdf = q.fn(spark, args.sf_dir)
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
            )

        def norm(rows, cols):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            return sorted(tuple(repr(r[i]) for i in order) for r in rows)

        # Driver-OOM guard: pull at most cap+1 rows — enough to detect
        # overflow without materializing an unbounded result on the driver.
        cap = args.max_rows
        spark_rows = sdf.limit(cap + 1).collect()
        if len(spark_rows) > cap:
            raise SystemExit(
                f"{args.name!r} returned more than --max-rows={cap} rows; "
                "refusing to collect the full result to the driver. "
                "Raise --max-rows only if the driver has headroom."
            )
        s = norm(
            [tuple(r) for r in spark_rows], [c.lower() for c in sdf.columns]
        )
        res = con.execute(q.oracle)
        # the guard must be symmetric: a Spark plan bug can UNDER-produce
        # while the correct oracle explodes, so cap the DuckDB side too
        oracle_rows = res.fetchmany(cap + 1)
        if len(oracle_rows) > cap:
            raise SystemExit(
                f"{args.name!r} oracle returned more than --max-rows={cap} "
                "rows; refusing to materialize the full result."
            )
        d = norm(oracle_rows, [c[0].lower() for c in res.description])
        if s == d:
            print(f"MATCH: {args.name} ({len(s)} rows, spark == duckdb)", file=out)
            return 0
        print(
            f"MISMATCH: {args.name} spark={len(s)} rows duckdb={len(d)} rows",
            file=out,
        )
        for tag, mine, theirs in (("spark-only", s, d), ("duckdb-only", d, s)):
            extra = [r for r in mine if r not in theirs][:5]
            for r in extra:
                print(f"  {tag}: {r}", file=out)
        return 1

    # run
    q = _lookup(args.name)
    from .session import get_spark

    spark = get_spark(f"cli:{args.name}")
    df = q.fn(spark, args.sf_dir)
    if args.explain:
        # the JVM-side explainString takes an ExplainMode object; the
        # string-accepting entry point PySpark itself uses is
        # PythonSQLUtils.explainString
        print(
            spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ),
            file=out,
        )
        return 0
    if args.json:
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str), file=out)
        return 0
    # _show_string(numRows, truncate, vertical) renders the ASCII table
    print(df._jdf.showString(args.limit, 20, False), file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
