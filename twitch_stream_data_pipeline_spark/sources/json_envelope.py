"""Raw-layer JSON envelope scan (SURVEY.md S1/S2/S3).

The reference reads each raw file with ``json.load`` and loops over
shards of a 15-minute slot (``scripts/process_raw_data/
process_raw_streams_data.py:110-117``; S3 listing variant
``src/process_raw_data/process_raw_streams_data.py:74-82``). Spark's
file source is natively multi-file and partition-pruning, so the whole
S1+S2+S3 surface is one ``spark.read.schema(...).json(glob)`` followed
by ``explode`` of the record array.

``multiLine=True`` because the reference writes indented JSON
(``json.dump(..., indent=4)``, ``scripts/get_raw_data/
get_raw_streams_data.py:130-139``) — one envelope document per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_envelope_records(
    spark: SparkSession,
    path: str,
    envelope_schema: T.StructType,
    *,
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Read raw envelope files and flatten to one row per record.

    Returns columns: ``day_date_id``, ``time_of_day_id``,
    ``source_file`` (shard lineage — the deterministic tiebreak the
    pandas ``keep="first"`` dedup implicitly relies on), plus every
    record field. ``max_files_per_trigger`` (streaming only) bounds the
    files per micro-batch so backfills don't arrive as one giant batch.
    """
    reader = spark.readStream if streaming else spark.read
    reader = reader.schema(envelope_schema).option("multiLine", "true")
    if streaming and max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(path)
    record_fields = [
        f.name for f in envelope_schema["data"].dataType.elementType.fields
    ]
    return (
        raw.withColumn("source_file", F.input_file_name())
        .select(
            "day_date_id",
            "time_of_day_id",
            "source_file",
            F.posexplode("data").alias("record_pos", "record"),
        )
        .select(
            "day_date_id",
            "time_of_day_id",
            "source_file",
            "record_pos",
            *[F.col(f"record.{name}").alias(name) for name in record_fields],
        )
    )
