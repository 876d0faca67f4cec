"""Core relational operators (SURVEY.md §2.3-2.6) over the star schema.

Mechanically split out of the monolithic ``plans/catalog.py`` in
round 11 (VERDICT r10 #8). Registrations and helpers are verbatim;
the registry (``CATALOG``), shared scan helpers and determinism
machinery live in ``catalog_base``, and ``catalog.py`` assembles
the parts in the original order and re-exports the public surface
(``EXPOSURE_ORDER`` pins what the harness grades, so module
boundaries change nothing observable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import dedup_keep_first
from ..operators.joins import positional_join
from ..sources.generators import day_dates_dim, time_of_day_dim
from .catalog_base import (
    _register,
    _t,
    _docs,
    _events,
    dsum,
    _osum,
    _OSECS,
    _hhmm,
    _ohhmm,
)

# ===========================================================================
# Core relational operators (SURVEY.md §2.3-2.6) over the star schema
# ===========================================================================


@_register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity')} AS sum_qty,
           {_osum('l_extendedprice')} AS sum_base_price,
           {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_osum('l_quantity')} / COUNT(*) AS avg_qty,
           {_osum('l_extendedprice')} / COUNT(*) AS avg_price,
           {_osum('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    ("aggregate", "A1", "flagship"),
    "TPC-H Q1 pricing summary — the flagship scan+agg (SURVEY.md §7 step 1).",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "popularity_by_type",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    ("aggregate", "A1", "O1"),
    "Category-popularity analog (scripts/other/get_category_popularity.py:23-26): "
    "group-by count over the event stream.",
)
def q_popularity_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@_register(
    "curate_events",
    f"""
    WITH base AS (
      SELECT event_id, user_id, event_type, value,
             {_OSECS.format(ts='ts')} AS secs
      FROM events
    )
    SELECT event_id AS stream_id,
           strftime(DATE '1970-01-01' + CAST(secs // 86400 AS INT), '%Y%m%d') AS day_date_id,
           {_ohhmm('(secs // 900) * 900')} AS time_of_day_id,
           user_id,
           event_type AS category_id,
           value AS viewer_count,
           value * 0.25 AS hours_watched
    FROM base
    """,
    ("projection", "P1", "P2", "P4", "P5"),
    "The curate-streams transform (scripts/curate_data/curate_streams_data.py:29-48): "
    "project, rename, inject batch grid-cell ids, derive hours_watched.",
)
def q_curate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    secs = F.col("secs")
    day = F.date_add(
        F.lit("1970-01-01").cast("date"), F.floor(secs / 86400).cast("int")
    )
    return ev.select(
        F.col("event_id").alias("stream_id"),
        F.date_format(day, "yyyyMMdd").alias("day_date_id"),
        _hhmm(F.floor(secs / 900).cast("long") * 900).alias("time_of_day_id"),
        "user_id",
        F.col("event_type").alias("category_id"),
        F.col("value").alias("viewer_count"),
        (F.col("value") * 0.25).alias("hours_watched"),
    )


@_register(
    "validity_filter",
    r"""
    WITH x AS (
      SELECT event_id, user_id,
             CASE WHEN json_valid(props) AND regexp_matches(
                    COALESCE(json_extract_string(props, '$.k'), ''),
                    '^[\x00-\x20]*[-+]?[0-9]+[\x00-\x20]*$')
                  THEN TRY_CAST(regexp_extract(
                         json_extract_string(props, '$.k'),
                         '[-+]?[0-9]+', 0) AS BIGINT)
             END AS k
      FROM events
    )
    SELECT event_id, user_id, k
    FROM x WHERE k IS NOT NULL AND k % 2 = 0
    """,
    ("filter", "P6", "S7"),
    "Validity filter (process_raw_streams_data.py:48-53): cast-null-"
    "check on a JSON-extracted field instead of per-row try/except. "
    "get_json_object + try_cast is NULL-tolerant on malformed JSON and "
    "non-integer k; the oracle states the same totality (json_valid + "
    "integer-regex gate — DuckDB's json_extract_string RAISES on "
    "malformed input and bare TRY_CAST rounds '7.9' to the even 8, "
    "both pinned by the round-9 poison matrix). ADVICE r9: the gate is "
    "exactly Spark's string-to-long cast — Spark trims every char "
    "<= 0x20 (not just \\s) and accepts a leading +, so the regex "
    "admits [\\x00-\\x20]-padded signed integers, and the cast is "
    "TRY_CAST of the extracted digits so a uint64-range literal "
    "(regex-clean, int64-overflowing) NULLs like Spark's try_cast "
    "instead of raising — all pinned by the round-10 poison payloads.",
)
def q_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # try_cast: filter-not-fail semantics under ANSI mode (a malformed
    # props.k must drop the row, exactly like the oracle's TRY_CAST).
    k = F.get_json_object("props", "$.k").try_cast("long")
    return ev.select("event_id", "user_id", k.alias("k")).filter(
        F.col("k").isNotNull() & (F.col("k") % 2 == 0)
    )


@_register(
    "sentinel_defaults",
    """
    SELECT doc_id,
           CASE WHEN lang IS NULL OR lang = '' THEN 'notavailable' ELSE lang END AS language_id,
           CASE WHEN source IS NULL OR source = '' THEN 'NA' ELSE source END AS source_id
    FROM documents
    """,
    ("projection", "P8"),
    "Sentinel defaulting (process_raw_streams_data.py:57-61): empty string -> "
    "per-column sentinel.",
)
def q_sentinel_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    def dflt(c, s):
        return F.when(F.col(c).isNull() | (F.col(c) == ""), F.lit(s)).otherwise(F.col(c))
    return docs.select(
        "doc_id",
        dflt("lang", "notavailable").alias("language_id"),
        dflt("source", "NA").alias("source_id"),
    )


@_register(
    "language_dim_sentinel",
    """
    SELECT DISTINCT lang AS language_id FROM documents
    UNION ALL SELECT 'NA' AS language_id
    """,
    ("union", "P10", "A3", "U1"),
    "Sentinel dimension member (curate_genres_data.py:21): distinct dim values "
    "plus the 'NA' member.",
)
def q_language_dim_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sentinel = spark.createDataFrame([("NA",)], "language_id string")
    return docs.select(F.col("lang").alias("language_id")).distinct().unionByName(
        sentinel
    )


@_register(
    "dedup_keep_first",
    """
    SELECT user_id, event_type, event_id AS first_event_id, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts NULLS LAST, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    ("dedup", "A2", "W1"),
    "Deterministic keep-first dedup (drop_duplicates keep='first', "
    "process_raw_streams_data.py:120) with explicit (ts, event_id) "
    "tiebreak. NULLS LAST explicitly on BOTH sides (round-10 NULL "
    "poison sweep): an undated event must never beat a dated one as "
    "'first' — and the engines' ascending defaults disagree (Spark "
    "NULLS FIRST, DuckDB NULLS LAST), so without the qualifier the "
    "survivor of any key whose group contains a null ts differs per "
    "engine. A group of ONLY undated events still keeps its lowest "
    "event_id.",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return dedup_keep_first(
        ev,
        ["user_id", "event_type"],
        [F.col("ts_us").asc_nulls_last(), F.col("event_id")],
    ).select(
        "user_id", "event_type", F.col("event_id").alias("first_event_id"), "value"
    )


@_register(
    "distinct_pairs",
    "SELECT DISTINCT user_id, event_type FROM events",
    ("dedup", "A3"),
    "Full-row dedup (drop_duplicates(), process_raw_categories_data.py:61).",
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select("user_id", "event_type").distinct()


@_register(
    "anti_join_customers",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    ("join", "J3"),
    "Left anti join (set difference on keys, get_raw_users_data.py:126-134): "
    "customers with no orders. The driver's generator gives (almost) "
    "every customer an order, so on the stock testdata this compare "
    "is near-empty (0/0/1 rows at sf0.001/0.01/0.1) — the NON-vacuous "
    "differential evidence comes from the fuzz sweep, whose random "
    "orders subsets orphan 10-40% of customers every seed.",
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


@_register(
    "delta_except_all",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    EXCEPT ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'F'
    """,
    ("join", "J4", "U2"),
    "Full-row delta via exceptAll (curate_categories_data.py:70-77 symmetric "
    "difference restated).",
)
def q_delta_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return orders.exceptAll(orders.filter(F.col("o_orderstatus") == "F"))


@_register(
    "upsert_delta",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM customer old
      WHERE old.c_custkey % 3 = 0 AND old.c_custkey = c.c_custkey)
    """,
    ("upsert", "J4", "K5"),
    "Keyed upsert delta (curate_users_data.py:79-86): batch rows whose key is "
    "absent from the state (state = every third customer here).",
)
def q_upsert_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import upsert_state

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    state = cust.filter(F.col("c_custkey") % 3 == 0)
    return upsert_state(cust, state, ["c_custkey"]).delta


@_register(
    "star_revenue_by_region",
    f"""
    SELECT r.r_name,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           {_osum('o.o_totalprice')} AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    ("join", "J1", "aggregate", "star"),
    "Star join with broadcast dims (J1; the QuickSight dashboard query shape, "
    "SURVEY.md §2.5): revenue by region.",
)
def q_star_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


@_register(
    "left_join_defaults",
    f"""
    SELECT c.c_custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders, {_osum('o_totalprice')} AS total_spent
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    ("join", "J2", "P9"),
    "Left outer join + default fill (create_category_group_messages.py:107-108): "
    "customers with no orders get 0.",
)
def q_left_join_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spent")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", "n_orders", "total_spent")
        .fillna({"n_orders": 0, "total_spent": 0.0})
    )


@_register(
    "nearest_slot",
    f"""
    WITH base AS (SELECT {_OSECS.format(ts='ts')} AS secs FROM events),
    slotted AS (
      SELECT CASE WHEN secs % 86400 >= 85980 THEN '0000'
                  ELSE {_ohhmm('(least((secs % 86400 + 449) // 900, 95) * 900)')}
             END AS time_of_day_id
      FROM base
    )
    SELECT time_of_day_id, COUNT(*) AS n_events
    FROM slotted GROUP BY 1
    """,
    ("join", "J5", "A5"),
    "As-of/nearest join against the 96-slot grid, bit-exact to the "
    "reference scan (get_raw_categories_data.py:52-71): half-slot ties "
    "go to the EARLIER slot (the scan's strict < keeps the first "
    "minimum), 23:52:31-23:52:59 clamp to same-day 2345 (the scan "
    "never sees next-day 0000), and only minute>52 — 23:53:00 on — "
    "rolls to 0000. Pure integer arithmetic, no 96-row join.",
)
def q_nearest_slot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import nearest_slot_id

    ev = _events(spark, sf_dir)
    ts = F.timestamp_seconds(F.col("secs"))
    return (
        ev.select(nearest_slot_id(ts).alias("time_of_day_id"))
        .groupBy("time_of_day_id")
        .agg(F.count("*").alias("n_events"))
    )


@_register(
    "day_dates_dim",
    """
    SELECT strftime(d, '%Y%m%d') AS day_date_id,
           CAST(d AS DATE) AS the_date,
           strftime(d, '%m/%d/%Y') AS date_MMDDYYYY,
           dayname(d) AS day_of_week,
           strftime(d, '%m') AS month,
           strftime(d, '%d') AS day,
           strftime(d, '%Y') AS year,
           monthname(d) AS month_name,
           upper(strftime(d, '%b')) AS month_abbrev,
           strftime(d, '%y') AS year_YY
    FROM generate_series(DATE '2025-01-01', DATE '2027-12-31', INTERVAL 1 DAY) t(d)
    """,
    ("source", "S8"),
    "Generated calendar dimension (get_raw_day_dates_data.py:13-50), declarative.",
)
def q_day_dates_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return day_dates_dim(spark)


@_register(
    "time_of_day_dim",
    """
    SELECT lpad(CAST(i // 4 AS VARCHAR), 2, '0') || lpad(CAST((i % 4) * 15 AS VARCHAR), 2, '0') AS time_of_day_id,
           lpad(CAST(i // 4 AS VARCHAR), 2, '0') || ':' || lpad(CAST((i % 4) * 15 AS VARCHAR), 2, '0') AS time_24h,
           lpad(CAST(CASE WHEN (i // 4) % 12 = 0 THEN 12 ELSE (i // 4) % 12 END AS VARCHAR), 2, '0')
             || ':' || lpad(CAST((i % 4) * 15 AS VARCHAR), 2, '0')
             || CASE WHEN i // 4 < 12 THEN ' AM' ELSE ' PM' END AS time_12h,
           CAST(i // 4 AS INT) AS hour,
           CAST((i % 4) * 15 AS INT) AS minute,
           CASE WHEN i // 4 < 12 THEN 'AM' ELSE 'PM' END AS AM_PM,
           CASE WHEN i < 20 THEN 'night' WHEN i < 48 THEN 'morning'
                WHEN i < 68 THEN 'afternoon' WHEN i < 84 THEN 'evening'
                ELSE 'night' END AS part_of_day
    FROM range(96) t(i)
    """,
    ("source", "S9"),
    "Generated 96-slot time-of-day dimension (get_raw_time_of_day_data.py:16-94).",
)
def q_time_of_day_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_of_day_dim(spark)


@_register(
    "explode_words",
    """
    SELECT w AS word, COUNT(*) AS n
    FROM part, unnest(string_split(p_type, ' ')) t(w)
    GROUP BY w
    """,
    ("explode", "E1"),
    "Explode/UNNEST (process_raw_genre_bridge_data.py:85-92): array -> rows.",
)
def q_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@_register(
    "argmin_per_type",
    """
    SELECT event_type, event_id AS argmin_event, value AS min_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY value NULLS LAST, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    ("aggregate", "A5"),
    "Argmin scalar aggregate (get_raw_categories_data.py:61-69) with "
    "deterministic (value, event_id) tiebreak. NULLS LAST explicitly on "
    "BOTH sides (round-10 NULL poison sweep): the engines' ascending "
    "defaults DISAGREE — Spark sorts NULLS FIRST, DuckDB NULLS LAST — "
    "so an unqualified ORDER BY value makes the argmin of any group "
    "containing a NULL value pick different rows per engine; NULLS "
    "LAST is also the argmin a user means (a missing measurement never "
    "beats a real one; an all-NULL group still emits its lowest-id row).",
)
def q_argmin_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("argmin_event"),
            F.col("value").alias("min_value"),
        )
    )


@_register(
    "topk_customers",
    f"""
    SELECT c_custkey, total_spent FROM (
      SELECT o_custkey AS c_custkey, {_osum('o_totalprice')} AS total_spent
      FROM orders GROUP BY o_custkey
    ) ORDER BY total_spent DESC, c_custkey LIMIT 10
    """,
    ("sort", "O1", "O2"),
    "Sort + limit (get_category_popularity.py:26, API page caps): top-10 "
    "customers by spend with key tiebreak.",
)
def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(dsum("o_totalprice").alias("total_spent"))
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


@_register(
    "rollup_lineitem",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {_osum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    """,
    ("aggregate", "rollup"),
    "Hierarchical rollup — the dashboard drill-up shape implied by the star "
    "schema (SURVEY.md §2.5 note). On EMPTY input Spark's grouping-sets expansion emits ZERO rows where the SQL standard (and DuckDB) emit the grand-total row with count 0; HAVING COUNT(*) > 0 states Spark's semantics in the oracle and is a no-op on any non-empty input (every materialized cell has count >= 1) — round-10 oracle-compared empty sweep.",
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@_register(
    "window_15min",
    f"""
    WITH base AS (SELECT {_OSECS.format(ts='ts')} AS secs, event_type, value
                  FROM events WHERE ts IS NOT NULL)
    SELECT (secs // 900) * 900 AS window_start_unix,
           event_type,
           COUNT(*) AS n_events,
           {_osum('value')} AS sum_value
    FROM base GROUP BY 1, 2
    """,
    ("streaming", "window", "A1"),
    "15-minute tumbling window aggregate — the batch statement of the "
    "reference's micro-batch cadence (SURVEY.md §2.7). The oracle "
    "excludes null-ts rows because the ENGINE does: Spark's native "
    "window() drops rows whose event time is NULL (an event without "
    "event time belongs to no window — the round-10 temporal-null "
    "family rule), where the oracle's integer grid would otherwise "
    "keep a NULL window group.",
)
def q_window_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window(F.timestamp_seconds("secs"), "15 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_unix"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@_register(
    "positional_join",
    """
    WITH lhs AS (
      SELECT event_type, n,
             row_number() OVER (ORDER BY n DESC, event_type NULLS LAST)
               AS pos
      FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type)
    ),
    rhs AS (SELECT CAST(i + 1 AS BIGINT) AS pos, CAST(100 - 10 * i AS BIGINT) AS weight
            FROM range(5) t(i))
    SELECT lhs.event_type, lhs.n, rhs.weight
    FROM lhs FULL OUTER JOIN rhs USING (pos)
    """,
    ("join", "J6"),
    "Positional (index-aligned) join (create_category_group_messages.py:111-114) "
    "re-expressed with explicit row_number ordering. The event_type "
    "tiebreak carries NULLS LAST explicitly on BOTH sides (round-10 "
    "NULL poison sweep): positional alignment is defined BY the order, "
    "and the engines' ascending defaults disagree (Spark NULLS FIRST, "
    "DuckDB NULLS LAST) — a NULL-typed group tying a named one on n "
    "would land at a different position, silently receiving a "
    "different weight.",
)
def q_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    weights = spark.range(5).select(
        (F.col("id") + 1).alias("rpos"), (100 - 10 * F.col("id")).alias("weight")
    )
    joined = positional_join(
        counts,
        weights.orderBy("rpos"),
        [F.desc("n"), F.col("event_type").asc_nulls_last()],
        [F.col("rpos")],
    )
    return joined.select("event_type", "n", "weight")


