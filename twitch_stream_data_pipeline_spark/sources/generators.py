"""Generator sources: calendar & time-of-day dimensions (SURVEY.md S8/S9).

The reference builds these with nested Python loops
(``scripts/get_raw_data/get_raw_day_dates_data.py:13-50`` — 3 years of
dates with 10 derived attributes; ``scripts/get_raw_data/
get_raw_time_of_day_data.py:16-94`` — 96 rows of 15-minute grid with 7
attributes). Here they are declarative: ``sequence()`` / ``range()``
plus column expressions, so generation is distributed and Catalyst can
constant-fold or prune. Output formats are byte-identical to the
reference's CSVs (verified by golden tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def day_dates_dim(
    spark: SparkSession, start: str = "2025-01-01", end: str = "2027-12-31"
) -> DataFrame:
    """Calendar dimension, one row per date.

    Columns & formats mirror get_raw_day_dates_data.py:33-48:
    ``day_date_id`` = YYYYMMDD, ``date_MMDDYYYY`` = MM/dd/yyyy,
    ``day_of_week`` full weekday name, zero-padded month/day, full +
    upper-abbreviated month names, two-digit year.
    """
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"),
                    F.lit(end).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("the_date")
        )
        .select(
            F.date_format("the_date", "yyyyMMdd").alias("day_date_id"),
            F.col("the_date"),
            F.date_format("the_date", "MM/dd/yyyy").alias("date_MMDDYYYY"),
            F.date_format("the_date", "EEEE").alias("day_of_week"),
            F.date_format("the_date", "MM").alias("month"),
            F.date_format("the_date", "dd").alias("day"),
            F.date_format("the_date", "yyyy").alias("year"),
            F.date_format("the_date", "MMMM").alias("month_name"),
            F.upper(F.date_format("the_date", "MMM")).alias("month_abbrev"),
            F.date_format("the_date", "yy").alias("year_YY"),
        )
    )


def time_of_day_dim(spark: SparkSession) -> DataFrame:
    """96-slot time-of-day dimension (24h x 15-minute grid).

    Slot boundaries for ``part_of_day`` follow the reference's literal
    run-length list (get_raw_time_of_day_data.py:78-81): slots 0-19
    night, 20-47 morning, 48-67 afternoon, 68-83 evening, 84-95 night.
    """
    slot = F.col("id")
    hour = (slot / 4).cast("int")
    minute = ((slot % 4) * 15).cast("int")
    hour12 = F.when(hour % 12 == 0, 12).otherwise(hour % 12)
    return spark.range(96).select(
        F.concat(F.lpad(hour.cast("string"), 2, "0"), F.lpad(minute.cast("string"), 2, "0")).alias(
            "time_of_day_id"
        ),
        F.concat_ws(
            ":", F.lpad(hour.cast("string"), 2, "0"), F.lpad(minute.cast("string"), 2, "0")
        ).alias("time_24h"),
        F.concat(
            F.lpad(hour12.cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(minute.cast("string"), 2, "0"),
            F.when(hour < 12, F.lit(" AM")).otherwise(F.lit(" PM")),
        ).alias("time_12h"),
        hour.alias("hour"),
        minute.alias("minute"),
        F.when(hour < 12, "AM").otherwise("PM").alias("AM_PM"),
        F.when(slot < 20, "night")
        .when(slot < 48, "morning")
        .when(slot < 68, "afternoon")
        .when(slot < 84, "evening")
        .otherwise("night")
        .alias("part_of_day"),
    )
