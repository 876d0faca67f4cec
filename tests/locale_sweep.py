#!/usr/bin/env python
"""Process-default independence sweep (round 11, beyond the brief;
round 12 adds the default-charset axis — VERDICT r11 next-round #7 —
and the Python hash-seed axis).

The config sweep covers everything expressible as a SparkSession conf,
but some *process-creation* state is pinned before any conf applies —
two JVM knobs fixed by py4j at first launch (``spark.stop()`` + a new
session keeps the old JVM, so no in-process sweep can vary them) and
one CPython knob fixed at interpreter start:

- **default locale**: a cluster whose JVMs run under
  ``-Duser.language=tr`` applies Turkish casing rules to any
  locale-sensitive ``toUpperCase``/``toLowerCase`` (the classic
  dotted/dotless-i trap: ``"I".toLowerCase()`` is ``"ı"`` under tr)
  and Turkish digit grouping to locale-sensitive number formatting.
- **default charset** (``-Dfile.encoding=ISO-8859-1``): any
  ``String.getBytes()`` / ``new String(bytes)`` / stream bridge that
  forgot an explicit charset silently changes behavior on a
  non-UTF-8 platform default — the charset twin of the tr_TR trap.
  Text fingerprints, byte-length arithmetic, and CSV/JSON edges must
  not move with it.
- **Python hash seed** (``PYTHONHASHSEED``): CPython salts ``str``
  hashing per process, so SET iteration order differs run-to-run —
  and on a real cluster every executor's Python workers draw a
  DIFFERENT seed unless the deployment pins one, so any pandas-UDF or
  driver-side helper whose output order or float accumulation rides a
  ``set``/frozenset iteration is partition-placement-dependent in
  production. The axis pins the whole process tree (driver + JVM +
  forked Python workers) to seed 0 and requires results identical to
  the base pass's randomly-salted tree.

The engine's contract is that results NEVER move with any such knob —
Spark's ``upper``/``lower``/casts are Locale.ROOT by design,
UTF8String is encoding-independent, and the catalog uses no
locale-sensitive formatting — but the contract deserves the same
whole-catalog proof the timezone axes have.

Mechanism: each pass runs in a FRESH interpreter (subprocess), the
variant ones launching their JVM under the axis's
``JAVA_TOOL_OPTIONS``; each child writes the
``collect_catalog_snapshot`` result plus took-effect probes (JVM
default locale and charset) to a pickle and the parent diffs each
variant against base — identical machinery to the config sweep,
different isolation boundary because the knobs live below
SparkSession.

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

def _variants(base_probes: dict) -> list[tuple[str, str, dict, object]]:
    """(label, JAVA_TOOL_OPTIONS, extra env, took-effect check) per
    axis. The check runs in the PARENT so a silently-ignored knob
    fails the sweep instead of greenwashing it.

    The charset axis ("latin1-jvm" — the label means "non-UTF-8
    default charset", kept stable for the sweep wrapper) branches on
    the BASE child's JVM feature version: JDK <=17 honors
    ``-Dfile.encoding=ISO-8859-1`` directly, while JDK 18+ (JEP 400)
    only honors UTF-8/COMPAT — there the COMPAT mode adopts
    native.encoding, which ``LC_ALL=C`` pins to US-ASCII. Either way
    the child must report a non-UTF-8 default charset or the sweep
    fails as "knob ignored"."""
    if base_probes["jvm_major"] >= 18:
        charset = (
            "latin1-jvm",
            "-Dfile.encoding=COMPAT",
            {"LC_ALL": "C", "LANG": "C"},
            lambda p: p["jvm_charset"] != "UTF-8",
        )
    else:
        charset = (
            "latin1-jvm",
            "-Dfile.encoding=ISO-8859-1",
            {},
            lambda p: p["jvm_charset"] == "ISO-8859-1",
        )
    return [
        (
            "tr-jvm",
            "-Duser.language=tr -Duser.country=TR",
            {},
            lambda p: p["jvm_locale"].startswith("tr"),
        ),
        charset,
        (
            # no JAVA_TOOL_OPTIONS: this axis varies CPython, not the
            # JVM. Seed 0 disables hash randomization entirely
            # (sys.flags.hash_randomization == 0 — the one seed whose
            # taking-effect is flag-observable), giving a tree whose
            # set-iteration orders deterministically DIFFER from the
            # base child's random salt.
            "pyhashseed",
            None,
            {"PYTHONHASHSEED": "0"},
            lambda p: p.get("py_hash_flag") == 0,
        ),
    ]


def child(out_path: str, sf: str) -> None:
    from tests.conftest import collect_catalog_snapshot
    from twitch_stream_data_pipeline_spark.session import get_spark

    spark = get_spark("locale-sweep", cpus=8, shuffle_partitions=8)
    # prove the knob took: the JVM's process defaults are what the
    # variant says, not whatever the parent ran under
    jvm = spark._jvm  # noqa: SLF001
    probes = {
        "jvm_locale": jvm.java.util.Locale.getDefault().toString(),
        "jvm_charset": jvm.java.nio.charset.Charset.defaultCharset().name(),
        "jvm_major": jvm.java.lang.Runtime.version().feature(),
        "py_hash_flag": sys.flags.hash_randomization,
    }
    snap = collect_catalog_snapshot(spark, sf)
    with open(out_path, "wb") as f:
        pickle.dump({**probes, "snap": snap}, f)
    spark.stop()


def main() -> int:
    sf = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    results = {}
    with tempfile.TemporaryDirectory(prefix="locale_sweep_") as d:

        def run_pass(label: str, tool_opts: str | None, extra_env: dict):
            out = os.path.join(d, f"{label}.pkl")
            env = dict(os.environ)
            # the base pass must NOT inherit the swept knobs from the
            # caller's environment; variants fully replace them
            env.pop("JAVA_TOOL_OPTIONS", None)
            env.pop("PYTHONHASHSEED", None)
            env.update(extra_env)
            if tool_opts:
                env["JAVA_TOOL_OPTIONS"] = tool_opts
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", out, sf],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                print(f"child {label} failed:\n{proc.stderr[-2000:]}")
                return None
            with open(out, "rb") as f:
                return pickle.load(f)

        results["base"] = run_pass("base", None, {})
        if results["base"] is None:
            return 1
        # the charset mechanism depends on the base child's JDK
        # feature version (JEP 400), so variants are chosen AFTER the
        # base probe
        variants = _variants(results["base"])
        for label, tool_opts, extra_env, _took in variants:
            results[label] = run_pass(label, tool_opts, extra_env)
            if results[label] is None:
                return 1

    base = results["base"]["snap"]
    rc = 0
    for label, _opts, _env, took in variants:
        res = results[label]
        if not took(res):
            print(
                f"variant {label} did not take "
                f"(locale={res['jvm_locale']!r} charset={res['jvm_charset']!r} "
                f"jdk={res['jvm_major']}); JAVA_TOOL_OPTIONS was ignored"
            )
            return 1
        var = res["snap"]
        diff = [n for n in base if base[n] != var[n]]
        for n in diff:
            b, v = base[n], var[n]
            detail = ""
            if b[0] == "ERR" or v[0] == "ERR":
                detail = (
                    f" base={b[1] if b[0] == 'ERR' else 'ok'}"
                    f" {label}={v[1] if v[0] == 'ERR' else 'ok'}"
                )
            print(f"  DIFF[{label}] {n}{detail}")
        print(
            f"{len(base) - len(diff)}/{len(base)} queries identical under "
            f"{label} (locale {res['jvm_locale']!r}, "
            f"charset {res['jvm_charset']!r})"
        )
        rc = rc or (1 if diff else 0)
    return rc


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2])
    else:
        raise SystemExit(main())
