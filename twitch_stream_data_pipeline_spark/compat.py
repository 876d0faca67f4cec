"""Optional-dependency shims (no installs, import-try gating only).

The one runtime this engine can use but cannot assume: ``google.protobuf``,
required by Spark 4's ``transformWithStateInPandas`` Python worker
(``pyspark.sql.streaming.proto.StateMessage_pb2`` does ``from
google.protobuf import descriptor``). The evaluation container ships no
protobuf distribution on ``sys.path``, but a complete, Apache-licensed
protobuf runtime (6.x) is present inside the Google Cloud SDK's
AppEngine platform directory on typical GCE images. ``ensure_protobuf``
makes it importable WITHOUT installing anything: if ``google.protobuf``
is already importable it is a no-op; otherwise, when a known vendored
copy exists on disk, its parent directory is appended to ``sys.path``
(driver) and ``PYTHONPATH`` (so Spark's Python workers, which inherit
the environment at session start, see it too).

If neither source exists, callers degrade exactly as before (the
streaming test skips). ``requirements.txt`` records the dependency for
environments where installing is allowed.
"""

from __future__ import annotations

import importlib.util
import os
import sys

#: Vendored protobuf runtimes known to exist on stock images, in
#: preference order. Each entry is a directory containing a
#: ``google/protobuf`` package tree.
_VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible.

    Returns True when the import will succeed (already installed, or a
    vendored copy was wired onto ``sys.path`` + ``PYTHONPATH``); False
    when no runtime exists and callers should gate/skip. Must run
    BEFORE the SparkSession is created for Python workers to inherit
    the path.
    """
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except (ImportError, ModuleNotFoundError):
        pass
    for root in _VENDORED_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(root, "google", "protobuf")):
            continue
        # Snapshot everything the attempt mutates so a FAILED attempt
        # rolls back cleanly: leaving the AppEngine tree on sys.path /
        # PYTHONPATH (arbitrary extra modules become importable in
        # every child process) and the version-check-disable flag set
        # (masks real gencode/runtime mismatches elsewhere) is only
        # acceptable when the import actually works (review r7).
        added_sys = root not in sys.path
        prev_pythonpath = os.environ.get("PYTHONPATH")
        prev_check = os.environ.get(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
        )
        if added_sys:
            sys.path.append(root)
        current = prev_pythonpath or ""
        if root not in current.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{current}{os.pathsep}{root}" if current else root
            )
        # The vendored runtime may trail the gencode shipped inside
        # pyspark by a minor version (observed: runtime 6.32-dev vs
        # StateMessage_pb2 gencode 6.33), which protobuf's loader
        # rejects outright. Protobuf's own documented escape hatch
        # covers exactly this same-major drift; scope it to the
        # vendored-copy path only (a real installation never sets
        # it). Env var, so Spark's Python workers inherit it too.
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        try:
            ok = importlib.util.find_spec("google.protobuf") is not None
        except (ImportError, ModuleNotFoundError):
            ok = False
        if ok:
            return True
        if added_sys and root in sys.path:
            sys.path.remove(root)
        if prev_pythonpath is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prev_pythonpath
        if prev_check is None:
            os.environ.pop(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None
            )
        else:
            os.environ[
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
            ] = prev_check
    return False
