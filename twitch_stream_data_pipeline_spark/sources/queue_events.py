"""Queue (SQS) batch-event source (SURVEY.md S7).

The reference's ingest Lambdas receive SQS events whose ``Records[*]
.body`` is a stringified list of category ids with batch metadata in
``messageAttributes`` (``src/get_raw_data/get_raw_streams_data.py:
32-38,90-91``; fixtures ``data/sample_data/SQS_batch_event_input/``).
It parses bodies with ``ast.literal_eval`` — here that becomes
``from_json`` (the bodies are JSON-compatible int lists), exploded to
one work-unit row per category id. The queue itself stays outside the
engine (SURVEY.md §2.1 note); this operator is the *parse* surface a
Structured Streaming micro-batch would apply to each incoming event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SQS_EVENT_SCHEMA = T.StructType(
    [
        T.StructField(
            "Records",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("messageId", T.StringType()),
                        T.StructField("receiptHandle", T.StringType()),
                        T.StructField("body", T.StringType()),
                        T.StructField(
                            "messageAttributes",
                            T.MapType(
                                T.StringType(),
                                T.StructType(
                                    [T.StructField("stringValue", T.StringType())]
                                ),
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def read_sqs_batch_events(spark: SparkSession, path: str) -> DataFrame:
    """SQS event JSON file(s) -> one row per message."""
    return (
        spark.read.schema(SQS_EVENT_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .select(F.explode("Records").alias("r"))
        .select(
            F.col("r.messageId").alias("message_id"),
            F.col("r.body").alias("body"),
            F.col("r.messageAttributes").alias("attrs"),
        )
    )


def parse_work_units(messages: DataFrame) -> DataFrame:
    """Messages -> one row per (message_id, category_id) work unit.

    ``from_json`` replaces the reference's ``ast.literal_eval``; batch
    identity comes from message attributes when present.
    """
    return messages.select(
        "message_id",
        F.col("attrs")["day_date_id"]["stringValue"].alias("day_date_id"),
        F.col("attrs")["time_of_day_id"]["stringValue"].alias("time_of_day_id"),
        F.explode(F.from_json("body", T.ArrayType(T.LongType()))).alias("category_id"),
    )
