"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Twitch stream data pipeline
(Nermeso/twitch_stream_data_pipeline), re-expressed Spark-first.

Layout
------
- ``session``     — tuned ``SparkSession`` factory (AQE, Arrow, UTC).
- ``schemas``     — fixed ``StructType`` registry for every dataset
                    (the reference infers dtypes ad hoc; we do not).
- ``sources``     — scans & generator sources (S1–S9 in SURVEY.md §2.1).
- ``operators``   — relational operator library (P/J/A/W/O/U/E rows of
                    SURVEY.md §2.3–2.6).
- ``pipeline``    — the Twitch medallion pipeline (raw → processed →
                    curated) as pure DataFrame transforms.
- ``plans``       — the analytical query catalog (star-schema
                    aggregates, the driver-facing queries).
- ``sinks``       — partitioned/bucketed/Z-ordered/sharded writers,
                    JDBC warehouse load, compaction, schema-evolution
                    reads (K1–K9 in SURVEY.md §2.2).
- ``extensions``  — large-scale training-data operators: dedup,
                    similarity search, text analysis, multimodal.
- ``streaming``   — Structured Streaming restatement of the 15-minute
                    micro-batch pipeline.
"""

__version__ = "0.1.0"
