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
copy exists on disk, a SCOPED shim directory exposing ONLY
``google/protobuf`` (one namespace-package symlink, nothing else from
the vendored tree — ADVICE r7) is appended to ``sys.path`` (driver) and
``PYTHONPATH`` (so Spark's Python workers, which inherit the
environment at session start, see it too).

The vendored runtime may trail the gencode shipped inside pyspark by a
minor version (observed: runtime 6.32-dev vs StateMessage_pb2 gencode
6.33), which protobuf's loader rejects outright; protobuf's documented
escape hatch (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) covers
exactly this same-major drift. Scoping that hatch is the other ADVICE
r7 point: leaving it in the process env would disable gencode/runtime
validation for EVERY protobuf consumer in the process. Instead the
driver sets it only around ONE eager validation import of the pyspark
gencode (which then sits in ``sys.modules`` for the process lifetime)
and restores it; Spark's Python workers — which run their own import —
receive the flag through ``spark.executorEnv`` (:data:`WORKER_ENV`,
applied by ``session.get_spark``), never through the driver's
environment.

If no runtime exists, callers degrade exactly as before (the streaming
test skips). ``requirements.txt`` records the dependency for
environments where installing is allowed.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import tempfile

#: Vendored protobuf runtimes known to exist on stock images, in
#: preference order. Each entry is a directory containing a
#: ``google/protobuf`` package tree.
_VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

#: Env vars the Spark session must forward to its Python workers
#: (``session.get_spark`` turns each into ``spark.executorEnv.*``;
#: pyspark copies those into every worker's environment, local mode
#: included). Populated by :func:`ensure_protobuf` on the
#: vendored-copy path only — a real protobuf installation never needs
#: any of this.
WORKER_ENV: dict[str, str] = {}


def _scoped_shim(root: str) -> str | None:
    """Build (idempotently) a path entry exposing ONLY
    ``google/protobuf`` from the vendored tree at ``root``: a shim
    directory holding a bare ``google/`` namespace dir (no
    ``__init__.py``) with a single symlink ``protobuf`` into the
    vendored copy. Putting the SHIM on ``sys.path`` instead of the
    whole AppEngine platform dir keeps its dozens of unrelated
    vendored packages un-importable (ADVICE r7). Returns None when
    the shim cannot be built (symlink-less filesystem); the caller
    falls back to the unscoped root rather than losing streaming.

    The shim path is unique PER VENDORED ROOT: with a shared path, an
    attempt against root B would re-point the symlink a previously
    wired root A's PYTHONPATH entry still names — and if B's attempt
    then fails and B disappears, every FUTURE child process (Spark's
    Python workers, the transformWithState driver worker) inherits a
    PYTHONPATH whose ``google/protobuf`` dangles, turning
    ``google.protobuf`` into an empty namespace package and failing
    imports with "(unknown location)" while the driver itself keeps
    working from ``sys.modules``. Found as an order-dependent
    full-suite failure: a rollback test probing a fake vendored dir
    corrupted the real shim for every later streaming test."""
    target = os.path.join(root, "google", "protobuf")
    digest = hashlib.sha256(root.encode()).hexdigest()[:12]
    shim = os.path.join(
        tempfile.gettempdir(),
        f"tswdp_protobuf_shim_{os.getuid()}_{digest}",
    )
    link = os.path.join(shim, "google", "protobuf")
    try:
        os.makedirs(os.path.join(shim, "google"), exist_ok=True)
        if os.path.islink(link) and os.readlink(link) == target:
            return shim
        # replace-over-rename so concurrent builders can't race into a
        # half-created entry
        tmp = f"{link}.tmp.{os.getpid()}"
        os.symlink(target, tmp)
        os.replace(tmp, link)
        return shim
    except OSError:
        return None


def _validate_gencode() -> str:
    """Eagerly import the one gencode consumer this engine needs
    (pyspark's StateMessage_pb2) with the version-check escape hatch
    enabled, then RESTORE the flag. ``"ok"`` leaves the module in
    ``sys.modules`` — later driver-side imports reuse it without
    re-validating — while the process env goes back to validating
    every OTHER protobuf consumer normally.

    Three outcomes, not two (ADVICE r8): a ``ModuleNotFoundError``
    naming a *pyspark* module means the GENCODE CONSUMER is absent
    from this pyspark build — the vendored runtime itself is fine and
    must stay wired for every non-streaming protobuf consumer
    (``"gencode_absent"``). Any other failure — including a missing
    ``google.protobuf`` surfacing from inside the gencode's own
    imports — means the runtime cannot serve the gencode even with
    the hatch, so the caller must roll back (``"failed"``)."""
    prev = os.environ.get(_FLAG)
    os.environ[_FLAG] = "true"
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return "ok"
    except ModuleNotFoundError as exc:
        missing = exc.name or ""
        if missing == "pyspark" or missing.startswith("pyspark."):
            return "gencode_absent"
        return "failed"
    except Exception:  # noqa: BLE001 — any other load failure = unusable
        return "failed"
    finally:
        if prev is None:
            os.environ.pop(_FLAG, None)
        else:
            os.environ[_FLAG] = prev


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible.

    Returns True when the import will succeed (already installed, or a
    vendored copy was wired onto ``sys.path`` + ``PYTHONPATH`` through
    the scoped shim and its gencode compatibility was PROVEN by an
    eager import); False when no usable runtime exists and callers
    should gate/skip. Must run BEFORE the SparkSession is created for
    Python workers to inherit the path, and sessions must be built via
    ``session.get_spark`` so :data:`WORKER_ENV` reaches the workers.
    """
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except (ImportError, ModuleNotFoundError):
        pass
    for root in _VENDORED_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(root, "google", "protobuf")):
            continue
        entry = _scoped_shim(root) or root
        # Snapshot everything the attempt mutates so a FAILED attempt
        # rolls back cleanly (review r7): leaving the path entry wired
        # when the runtime cannot actually serve the gencode would
        # make every child process resolve a half-working protobuf.
        # The sys.modules snapshot scopes the rollback purge (ADVICE
        # r8): only google* modules that APPEARED during this attempt
        # may be evicted on the no-location heuristic.
        pre_modules = {
            n for n in sys.modules if n == "google" or n.startswith("google.")
        }
        added_sys = entry not in sys.path
        prev_pythonpath = os.environ.get("PYTHONPATH")
        if added_sys:
            sys.path.append(entry)
        current = prev_pythonpath or ""
        if entry not in current.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{current}{os.pathsep}{entry}" if current else entry
            )
        try:
            resolvable = importlib.util.find_spec("google.protobuf") is not None
        except (ImportError, ModuleNotFoundError):
            resolvable = False
        verdict = _validate_gencode() if resolvable else "failed"
        if verdict == "ok":
            # workers re-import the gencode in their own processes and
            # need the same-major escape hatch there; forward it via
            # executorEnv only (never the driver's environment)
            WORKER_ENV[_FLAG] = "true"
            return True
        if verdict == "gencode_absent":
            # this pyspark build ships no streaming gencode, so there
            # is nothing to version-validate and no worker will ever
            # import it — keep the runtime wired for every other
            # protobuf consumer, and leave WORKER_ENV empty (the
            # escape hatch protects only the absent gencode)
            return True
        if added_sys and entry in sys.path:
            sys.path.remove(entry)
        if prev_pythonpath is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prev_pythonpath
        _purge_vendored_google(entry, root, pre_modules)
    return False


def _purge_vendored_google(
    entry: str, root: str, pre_modules: frozenset[str] | set[str] = frozenset()
) -> None:
    """Drop from ``sys.modules`` every ``google``/``google.*`` module
    the failed attempt loaded from the vendored tree (review r8): the
    validation import caches ``google.protobuf`` and its runtime
    submodules BEFORE the gencode raises, and ``find_spec`` resolves
    from ``sys.modules`` first — so without this purge a second
    ``ensure_protobuf()`` call would spuriously return True at the
    top-of-function check with no PYTHONPATH wiring and no
    :data:`WORKER_ENV` flag, and Spark workers would then fail where
    the caller was told streaming is available. The bare ``google``
    namespace module goes too when its cached ``__path__`` references
    the rolled-back entry; modules from a genuinely installed
    distribution (different ``__file__`` root) are left alone. A
    module with NO location at all (neither ``__file__`` nor
    ``__path__``) is evicted only when it appeared DURING the attempt
    (absent from ``pre_modules``) — a pre-existing location-less
    stub, e.g. one a test or mock injected, is not ours to purge
    (ADVICE r8)."""
    prefixes = (entry, root)
    for name, mod in list(sys.modules.items()):
        if name != "google" and not name.startswith("google."):
            continue
        f = getattr(mod, "__file__", None) or ""
        try:
            paths = [str(p) for p in (getattr(mod, "__path__", None) or [])]
        except Exception:
            # a namespace __path__ whose parent entry is already gone
            # from sys.modules raises on recalculation — such an
            # orphan cannot be imported from again; evict it
            del sys.modules[name]
            continue
        locations = [f, *paths] if f or paths else []
        if (not locations and name not in pre_modules) or any(
            loc.startswith(pref) for loc in locations for pref in prefixes
        ):
            del sys.modules[name]
