"""Driver-side reads of MODEL-STATE-SIZED persisted artifacts.

The index layouts persist tiny model relations beside the data
(`_quantizer`, `_codebooks`, `_params`, n_cells x dim / m x n_codes x
d/m / one row). Every probe reloads them — by contract, so a probe can
never quantize differently than the layout — and a
``spark.read.parquet(...).collect()`` pays a full Spark job launch
(~100-150ms in local mode) to move a few kilobytes the driver consumes
anyway. For local filesystem paths the read goes through pyarrow
directly (sub-millisecond); any other scheme (hdfs://, s3a://...)
falls back to the Spark reader, which speaks every configured
filesystem. Data-sized relations (postings, codes, `_ids`) are never
read this way — they stay distributed scans.
"""

from __future__ import annotations

import glob
import os


def _local_dir(path: str) -> str | None:
    """The local directory for a schemeless or file: path, else None."""
    if path.startswith("file:"):
        p = path[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        return p if os.path.isdir(p) else None
    if "://" not in path:
        return path if os.path.isdir(path) else None
    return None


def read_small_parquet(spark, path: str) -> list[dict]:
    """All rows of a tiny parquet relation as a list of dicts.

    pyarrow for local paths (no job launch), Spark collect otherwise.
    Callers own the contract that the relation is model-state-sized.
    """
    local = _local_dir(path)
    if local is not None:
        try:
            import pyarrow.parquet as pq

            files = sorted(glob.glob(os.path.join(local, "*.parquet")))
            if not files:  # e.g. only _SUCCESS markers — fall back
                raise FileNotFoundError(local)
            tables = [pq.read_table(f) for f in files]
            rows: list[dict] = []
            for t in tables:
                rows.extend(t.to_pylist())
            return rows
        except Exception:
            pass  # malformed local layout: let Spark produce the error
    return [r.asDict() for r in spark.read.parquet(path).collect()]
