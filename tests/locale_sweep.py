#!/usr/bin/env python
"""JVM-locale-independence sweep (round 11, beyond the brief).

The config sweep covers everything expressible as a SparkSession conf,
but the JVM *default locale* is process-creation state py4j pins at
first launch — ``spark.stop()`` + a new session keeps the old JVM, so
no in-process sweep can vary it. Yet it is real deployment variance:
a cluster whose JVMs run under ``-Duser.language=tr`` applies Turkish
casing rules to any locale-sensitive ``toUpperCase``/``toLowerCase``
(the classic dotted/dotless-i trap: ``"I".toLowerCase()`` is ``"ı"``
under tr) and Turkish digit grouping to any locale-sensitive number
formatting. The engine's contract is that results NEVER move with the
JVM locale — Spark's ``upper``/``lower``/casts are Locale.ROOT by
design, and the catalog uses no locale-sensitive formatting — but the
contract deserves the same whole-catalog proof the timezone axes have.

Mechanism: each pass runs in a FRESH interpreter (subprocess), the
variant one launching its JVM under ``JAVA_TOOL_OPTIONS=
-Duser.language=tr -Duser.country=TR``; each child writes the
``collect_catalog_snapshot`` result to a pickle and the parent diffs
them — identical machinery to the config sweep, different isolation
boundary because the knob lives below SparkSession.

Usage: python tests/locale_sweep.py [--sf DIR]
       (child mode: --child OUT_PICKLE SF_DIR)
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT_ENV = {"JAVA_TOOL_OPTIONS": "-Duser.language=tr -Duser.country=TR"}


def child(out_path: str, sf: str) -> None:
    from tests.conftest import collect_catalog_snapshot
    from twitch_stream_data_pipeline_spark.session import get_spark

    spark = get_spark("locale-sweep", cpus=8, shuffle_partitions=8)
    # prove the knob took: the JVM's default locale is what the
    # variant says, not whatever the parent ran under
    jvm_locale = (
        spark._jvm.java.util.Locale.getDefault().toString()  # noqa: SLF001
    )
    snap = collect_catalog_snapshot(spark, sf)
    with open(out_path, "wb") as f:
        pickle.dump({"jvm_locale": jvm_locale, "snap": snap}, f)
    spark.stop()


def main() -> int:
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    results = {}
    with tempfile.TemporaryDirectory(prefix="locale_sweep_") as d:
        for label, extra_env in (("base", {}), ("tr-jvm", VARIANT_ENV)):
            out = os.path.join(d, f"{label}.pkl")
            env = {**os.environ, **extra_env}
            # the base pass must NOT inherit a tr JAVA_TOOL_OPTIONS from
            # the caller's environment
            if not extra_env:
                env.pop("JAVA_TOOL_OPTIONS", None)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", out, sf],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                print(f"child {label} failed:\n{proc.stderr[-2000:]}")
                return 1
            with open(out, "rb") as f:
                results[label] = pickle.load(f)

    base_loc = results["base"]["jvm_locale"]
    tr_loc = results["tr-jvm"]["jvm_locale"]
    if not tr_loc.startswith("tr"):
        print(
            f"variant JVM locale did not take (got {tr_loc!r}); "
            "JAVA_TOOL_OPTIONS was ignored"
        )
        return 1
    base = results["base"]["snap"]
    var = results["tr-jvm"]["snap"]
    diff = [n for n in base if base[n] != var[n]]
    for n in diff:
        b, v = base[n], var[n]
        detail = ""
        if b[0] == "ERR" or v[0] == "ERR":
            detail = (
                f" base={b[1] if b[0] == 'ERR' else 'ok'}"
                f" tr-jvm={v[1] if v[0] == 'ERR' else 'ok'}"
            )
        print(f"  DIFF[tr-jvm] {n}{detail}")
    print(
        f"{len(base) - len(diff)}/{len(base)} queries identical under "
        f"tr-jvm (JVM locale {base_loc!r} vs {tr_loc!r})"
    )
    return 1 if diff else 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2])
    else:
        raise SystemExit(main())
