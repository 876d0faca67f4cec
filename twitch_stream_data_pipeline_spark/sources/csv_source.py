"""CSV scan with the reference's read semantics (SURVEY.md S4).

The reference reads every tabular layer with
``pd.read_csv(path, dtype=..., keep_default_na=False)``
(``scripts/get_raw_data/get_raw_streams_data.py:35``,
``scripts/curate_data/curate_categories_data.py:49,59``,
``scripts/process_raw_data/process_raw_genre_bridge_data.py:65-70``):

- explicit dtype overrides instead of inference (zero-padded ids like
  ``time_of_day_id="0015"`` must stay strings);
- ``keep_default_na=False`` — the literal string ``"NA"`` is *data*
  (the sentinel for a missing ``igdb_id``), never null, and an empty
  field stays the empty string.

Spark's CSV reader differs on both counts by default (schema inference
off is fine — everything reads as string — but an empty field becomes
NULL via ``nullValue=""``). :func:`read_csv_reference` pins the
reference semantics: no value is ever silently nulled, so the sentinel
policy in :mod:`..operators.cleaning` stays the single place where
sentinel/NULL conversion happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: A value that cannot appear in the reference's CSV data — routing
#: Spark's nullValue here disables empty-field -> NULL conversion,
#: which is exactly pandas' keep_default_na=False behavior.
_NEVER_NULL = "\u0000__never_null__\u0000"


def read_csv_reference(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    keep_default_na: bool = False,
    multi_line: bool = True,
    streaming: bool = False,
) -> DataFrame:
    """Read a CSV layer the way the reference's ``pd.read_csv`` does.

    With ``schema=None`` every column is read as string (the analog of
    ``dtype=str``); pass a DDL string or ``StructType`` for typed
    columns (the analog of the reference's per-column ``dtype``
    patches). ``keep_default_na=False`` (the reference's setting for
    every sentinel-bearing layer) keeps ``"NA"`` and empty fields as
    literal strings; ``True`` restores Spark's empty-field -> NULL.

    Scale note: this is the plain Spark file source — multi-file
    globs, partition-dir pruning, and column pruning all apply; a
    schema (explicit or all-string) avoids the inference pre-scan.
    """
    reader = spark.readStream if streaming else spark.read
    # escape = quote char: RFC-4180 doubled-quote escaping, which is
    # what pandas' to_csv (the reference's writer) emits — Spark's
    # backslash default would leave `""` pairs in the data.
    reader = reader.option("header", "true").option("escape", '"')
    # LOUD TRADE-OFF — multiLine=true (the default) makes each FILE one
    # unsplittable task: a 10 GB export pins one core for its whole
    # scan, so for large newline-free data you MUST pass
    # multi_line=False to keep the scan splittable (the engine's own
    # CSV writer never emits in-field line breaks, so its outputs
    # always qualify — see the csv_roundtrip catalog query). The
    # default stays True because this function's contract is pandas
    # parity and the reference data NEEDS it: quoted description
    # fields embed lone CR characters, which pandas keeps as cell data
    # but a non-multiLine Spark scan mis-parses into extra garbage
    # rows — a silent correctness failure, worse than the perf trap
    # (pinned by test_golden_replay.py's embedded-CR test).
    if multi_line:
        reader = reader.option("multiLine", "true")
    if not keep_default_na:
        reader = reader.option("nullValue", _NEVER_NULL).option("emptyValue", "")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # header-only pre-read to build an all-string schema: cheap
        # (reads one line) and keeps the main scan inference-free.
        header = spark.read.option("header", "true").csv(path).columns
        reader = reader.schema(
            T.StructType([T.StructField(c, T.StringType()) for c in header])
        )
    df = reader.csv(path)
    if not keep_default_na:
        # univocity parses an *unquoted* empty field to null no matter
        # what nullValue is set to; pandas' keep_default_na=False mode
        # has no nulls at all (every cell is a string), so restore ""
        # for string columns. A cheap coalesce projection, fused into
        # the scan stage by codegen.
        string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
        if string_cols:
            df = df.na.fill("", string_cols)
    return df
