#!/usr/bin/env python
"""Round-12 optimization measurement tools (guide §1: measure first).

Subcommands:

  explain  [names...]   — write .explain("formatted") for each query to
                          plans/r12/<name>_<tag>.txt (default tag via
                          --tag; default names = bench.HEADLINE).
  profile  [names...]   — per-query phase split: plan-build wall (fn()
                          returning the DataFrame — driver/py4j work,
                          including any eager actions a builder runs)
                          vs execution wall (.collect()), min over
                          --reps. Prints one JSON line per query.
  noop     [names...]   — time the computation alone through the noop
                          sink (guide §1.4) after one warm pass; min
                          over --reps.

All subcommands read $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
and run on the same get_spark session the bench uses, with job
descriptions labelled per query (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitch_stream_data_pipeline_spark.plans import CATALOG  # noqa: E402
from twitch_stream_data_pipeline_spark.session import get_spark  # noqa: E402


def _names(args) -> list[str]:
    if args.names:
        return args.names
    import bench

    return list(bench.HEADLINE)


def cmd_explain(args) -> None:
    spark = get_spark("perf_explain")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in _names(args):
        try:
            df = CATALOG[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # streaming plans, builders that act eagerly
            plan = f"(explain failed: {e})"
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


def cmd_profile(args) -> None:
    spark = get_spark("perf_profile")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1).count()
    names = _names(args)
    if args.warm:
        for name in names:
            CATALOG[name].fn(spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        builds, execs = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = CATALOG[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark._jvm.System.gc()
        out[name] = {
            "build_min": round(min(builds), 4),
            "exec_min": round(min(execs), 4),
            "build_all": [round(x, 3) for x in builds],
            "exec_all": [round(x, 3) for x in execs],
        }
        print(json.dumps({name: out[name]}))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


def cmd_noop(args) -> None:
    spark = get_spark("perf_noop")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1).count()
    for name in _names(args):
        spark.sparkContext.setJobDescription(f"noop: {name}")
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.perf_counter() - t0)
            spark._jvm.System.gc()
        print(json.dumps({name: {"noop_min": round(min(reps), 4),
                                 "noop_all": [round(x, 3) for x in reps]}}))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


def cmd_jobs(args) -> None:
    """Deterministic structural metric: number of Spark JOBS a full
    query invocation launches (driver actions + the final collect),
    counted via a per-query job group. Load-independent, unlike wall
    time on this host (BENCHNOTES: multi-x swings on a minutes
    timescale)."""
    spark = get_spark("perf_jobs")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sc = spark.sparkContext
    sc.range(1).count()
    out = {}
    for name in _names(args):
        grp = f"jobs_{name}"
        sc.setJobGroup(grp, name)
        CATALOG[name].fn(spark, sf_dir).collect()
        sc.setJobGroup(None, None)
        st = spark.sparkContext.statusTracker()
        jids = st.getJobIdsForGroup(grp)
        stages = set()
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is not None:
                stages.update(ji.stageIds)
        tasks = 0
        for s in stages:
            si = st.getStageInfo(s)
            if si is not None:
                tasks += si.numTasks
        out[name] = len(jids)
        print(
            json.dumps(
                {name: {"jobs": len(jids), "stages": len(stages),
                        "tasks": tasks}}
            )
        )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("explain")
    p.add_argument("names", nargs="*")
    p.add_argument("--tag", default="before")
    p.set_defaults(fn=cmd_explain)
    p = sub.add_parser("profile")
    p.add_argument("names", nargs="*")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--warm", action="store_true")
    p.set_defaults(fn=cmd_profile)
    p = sub.add_parser("noop")
    p.add_argument("names", nargs="*")
    p.add_argument("--reps", type=int, default=3)
    p.set_defaults(fn=cmd_noop)
    p = sub.add_parser("jobs")
    p.add_argument("names", nargs="*")
    p.set_defaults(fn=cmd_jobs)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
