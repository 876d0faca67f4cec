"""Event-sequence analytics operators: funnels, retention cohorts,
and time-grid gap filling.

The product-analytics tier over the events stream — the questions the
reference's dashboard layer asks of curated events (stream popularity
over time, viewer conversion; ``SURVEY.md`` §2.7's windowed
aggregates are the degenerate single-step case). All three are
expressed as ordinary aggregations, windows, and bounded grid joins:

- funnels shuffle per-user MIN timestamps (one row per user per
  stage), never raw events past the first aggregation;
- cohort retention shuffles distinct ``(user, week)`` pairs — partial
  aggregation collapses each task's duplicates map-side;
- gap filling joins observed slot aggregates onto an exploded
  time-grid whose size is ``|groups| x |slots|`` — calendar-bounded
  metadata, independent of event volume — and forward-fills with an
  IGNORE NULLS running ``last`` (partitioned window; order within a
  group is the time grid, so no skew beyond group cardinality).

Determinism: all timestamps enter as integer epoch seconds (the
``_events`` contract), all sums are decimal-routed, week/slot
arithmetic is integer division — bit-identical on any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_SECS = 7 * 86_400
SLOT_SECS = 15 * 60

__all__ = [
    "anomaly_scores",
    "funnel_stages",
    "gapfill_forward",
    "interval_overlap_pairs",
    "motif_discovery",
    "retention_cohorts",
    "ts_pattern_search",
]


def funnel_stages(
    ev: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "secs",
    within_secs: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts: how many users performed
    ``steps[0]``, then ``steps[1]`` STRICTLY AFTER it, then
    ``steps[2]`` after that, ... Emits one row per stage:
    ``(stage, step, n_users)``.

    Semantics: a user converts through stage k at the EARLIEST
    possible chain — ``t_k = min(ts of steps[k] with ts > t_{k-1})``.
    Greedy-earliest is the standard funnel definition and is complete:
    if any increasing chain of timestamps exists, the greedy one does
    (each greedy prefix ends no later than any other chain's prefix).

    ``within_secs`` adds the conversion-window constraint of product
    funnels ("purchased within 24h of clicking"): stage k accepts only
    ``t_prev < ts <= t_prev + within_secs``. Under a window the metric
    is DEFINED by the greedy-earliest (first-touch) chain — the
    product-analytics convention — because completeness no longer
    holds in general (an earlier stage-k choice can close a later
    stage's window that a later choice would have kept open); the
    oracle states the same greedy recursion.

    Plan shape: stage k is one filter on the event type + an equi-join
    against the (user, t_{k-1}) relation + a per-user MIN — the join
    key is the user id, both sides are user-cardinality or one event
    type's slice, and each stage's output shrinks monotonically. The
    final counts are single-row aggregates unioned together; no
    window, no self-join of the full event stream.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = ev.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("s"),
    )
    reached = (
        base.filter(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("s").alias("ts_prev"))
    )
    out = [
        reached.agg(
            F.lit(1).alias("stage"),
            F.lit(steps[0]).alias("step"),
            F.count("*").alias("n_users"),
        )
    ]
    for k, step in enumerate(steps[1:], start=2):
        cond = F.col("s") > F.col("ts_prev")
        if within_secs is not None:
            cond = cond & (F.col("s") <= F.col("ts_prev") + within_secs)
        reached = (
            base.filter(F.col("t") == step)
            .join(reached, "u")
            .filter(cond)
            .groupBy("u")
            .agg(F.min("s").alias("ts_prev"))
        )
        out.append(
            reached.agg(
                F.lit(k).alias("stage"),
                F.lit(step).alias("step"),
                F.count("*").alias("n_users"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def retention_cohorts(
    ev: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "secs",
    period_secs: int = WEEK_SECS,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-activity
    period (epoch-week by default), counted in every later period they
    return. Emits ``(cohort_week, week_offset, n_users)`` — offset 0 is
    the cohort size itself, offset k the k-period retention.

    Two aggregations: per-user first period (user-keyed shuffle,
    map-side combined), then distinct ``(user, period)`` activity
    joined back (user-keyed again — the join reuses the same key) and
    counted per (cohort, offset). Period arithmetic is integer
    division of epoch seconds — no calendar, no timezone, portable.
    """
    # floor-divide (not cast-of-division: CAST(double) truncates in
    # Spark but ROUNDS in DuckDB — floor first is portable)
    p = F.floor(F.col(ts_col) / F.lit(period_secs)).cast("long").alias("w")
    activity = ev.select(F.col(user_col).alias("u"), p).distinct()
    cohort = activity.groupBy("u").agg(F.min("w").alias("cohort_week"))
    return (
        activity.join(cohort, "u")
        .groupBy(
            "cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count("*").alias("n_users"))
    )


def gapfill_forward(
    ev: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "secs",
    value_col: str = "value",
    slot_secs: int = SLOT_SECS,
) -> DataFrame:
    """Regular time-grid resampling with forward fill: aggregate
    ``value`` into ``slot_secs`` buckets per group, then emit EVERY
    slot between the group's first and last activity, carrying the
    most recent observed aggregate across empty slots. Emits
    ``(group, slot, sum_value, is_observed)`` — the gap-free series a
    dashboard or a downstream window expects (the timeseries
    ``date_dim`` trick of SURVEY §2.2, generalized to dense numeric
    grids with fill).

    Plan shape: observed slots are one decimal-routed aggregation;
    the grid is ``sequence(min_slot, max_slot)`` exploded per group —
    calendar-bounded (a year of 15-min slots is 35k rows per group),
    never event-volume-bounded; the fill is ``last(value, ignorenulls)``
    over a window partitioned by group and ordered by the grid.

    NULL CONTRACT (round 10): the first slot of every group is
    observed by construction, but an observed slot's SUM is itself
    NULL when every contributing ``value`` is NULL — so a series can
    carry a NULL HEAD (nothing earlier to fill from) that downstream
    consumers must handle explicitly. SQL consumers inherit the right
    behavior from NULL propagation (a window sum over a NULL element
    is NULL); numpy consumers must mask — casting the NaN to int64 is
    garbage, the exact bug the round-10 fuzz sweep caught in
    motif_discovery.
    """
    slot = F.floor(F.col(ts_col) / F.lit(slot_secs)).cast("long")
    observed = (
        ev.select(F.col(group_col).alias("g"), slot.alias("slot"), F.col(value_col))
        .groupBy("g", "slot")
        .agg(
            F.sum(F.col(value_col).cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value")
        )
    )
    grid = (
        observed.groupBy("g")
        .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
        .select("g", F.explode(F.sequence("lo", "hi")).alias("slot"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, ["g", "slot"], "left")
        .select(
            F.col("g").alias(group_col),
            "slot",
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value"),
            F.col("sum_value").isNotNull().cast("int").alias("is_observed"),
        )
    )


def anomaly_scores(
    slots: DataFrame,
    group_col: str = "event_type",
    slot_col: str = "slot",
    value_col: str = "sum_value",
    trailing: int = 8,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection over a regular slot
    series: each slot is scored against the mean/std of its previous
    ``trailing`` observed slots (the frame excludes the judged point),
    and rows with ``|z| > z_threshold`` are emitted — after a full
    warm-up (``n == trailing``) and a zero-variance guard.

    Takes the ALREADY-AGGREGATED ``(group, slot, value)`` relation, so
    the same expression serves both execution modes: the batch catalog
    query feeds it the grouped 15-min sums, and the streaming pipeline
    feeds it the foreachBatch-maintained windowed aggregate (the
    detector is a pure function of the slot series, indifferent to how
    the series was produced — pinned by the batch/stream parity test).
    In-frame sums stay decimal-routed so the zscore is bit-portable.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(slot_col)
        .rowsBetween(-trailing, -1)
    )
    v = F.col(value_col)
    wsum = F.sum(v.cast("decimal(25,6)")).over(w).cast("double")
    wsumsq = F.sum((v * v).cast("decimal(25,6)")).over(w).cast("double")
    n = F.count("*").over(w)
    mean = wsum / n
    var = wsumsq / n - mean * mean
    z = (v - mean) / F.sqrt(var)
    return (
        slots.select(
            group_col,
            slot_col,
            value_col,
            n.alias("__n"),
            var.alias("__var"),
            z.alias("zscore"),
        )
        .filter(
            (F.col("__n") >= trailing)
            & (F.col("__var") > 0)
            & (F.abs(F.col("zscore")) > z_threshold)
        )
        .select(group_col, slot_col, value_col, "zscore")
    )


def ts_pattern_search(
    slots: DataFrame,
    pattern: Sequence[float],
    group_col: str = "event_type",
    slot_col: str = "slot",
    value_col: str = "sum_value",
    k: int = 10,
    quant_scale: int = 1000,
) -> DataFrame:
    """Distributed time-series similarity search (the EDBT'19
    streaming-subsequence-search problem shape): slide a length-``L``
    window over each group's dense slot series and rank windows by
    z-normalized similarity to a query ``pattern`` — i.e. Pearson
    correlation, so a spike is found whatever its absolute scale or
    baseline. Emits the global top-``k``:
    ``(group, slot, similarity)`` with ``slot`` the window start.

    Exact-arithmetic trick (the quantized-cosine rule): quantize
    values to bigints, mean-center WITHOUT division —
    ``c_i = L * q_i - sum(q)`` — and score
    ``corr = dot(c, p_c) / (||c|| * ||p_c||)`` where ``p_c`` is the
    pattern centered the same way at plan-build time. Everything
    until the final double divide is int64 (products stay far under
    2^62 for slot sums up to ~1e15/L at scale 1000), so the score is
    bit-identical in any engine.

    Plan shape: windows materialize as ``L`` ``lead()`` columns over a
    window PARTITIONED by group and ordered by the dense grid (feed
    :func:`gapfill_forward` output; tail rows with incomplete windows
    drop via the last lead's NULL). Zero-variance windows are
    filtered (flat series match nothing). The global top-k is
    ``orderBy().limit(k)`` — TakeOrdered, per-partition heaps + a
    k-row merge, never a full sort.
    """
    L = len(pattern)
    if L < 2:
        raise ValueError("pattern needs at least 2 points")
    pq = [round(p * quant_scale) for p in pattern]
    ps = sum(pq)
    pc = [L * x - ps for x in pq]
    p_norm2 = sum(x * x for x in pc)
    if p_norm2 == 0:
        raise ValueError("pattern is constant — correlation undefined")
    q = F.round(F.col(value_col) * quant_scale).cast("long")
    w = Window.partitionBy(group_col).orderBy(slot_col)
    leads = [F.lead(q, i).over(w).alias(f"__l{i}") for i in range(L)]
    arr = slots.select(group_col, slot_col, *leads).filter(
        F.col(f"__l{L - 1}").isNotNull()
    )
    s = sum(F.col(f"__l{i}") for i in range(L))  # window sum, int64
    cent = [
        (F.lit(L) * F.col(f"__l{i}") - s).alias(f"__c{i}") for i in range(L)
    ]
    c = arr.select(group_col, slot_col, *cent)
    dot = sum(F.col(f"__c{i}") * F.lit(pc[i]) for i in range(L))
    n2 = sum(F.col(f"__c{i}") * F.col(f"__c{i}") for i in range(L))
    return (
        c.select(
            group_col,
            slot_col,
            n2.alias("__n2"),
            (
                dot.cast("double")
                / F.sqrt(n2.cast("double") * F.lit(float(p_norm2)))
            ).alias("similarity"),
        )
        .filter(F.col("__n2") > 0)
        .orderBy(F.desc("similarity"), group_col, slot_col)
        .limit(k)
        .select(group_col, slot_col, "similarity")
    )


def motif_discovery(
    slots: DataFrame,
    window_len: int = 8,
    group_col: str = "event_type",
    slot_col: str = "slot",
    value_col: str = "sum_value",
    quant_scale: int = 1000,
) -> DataFrame:
    """Motif discovery, matrix-profile-lite: for each group's dense
    slot series, find the best NON-OVERLAPPING pair of length-``L``
    windows by z-normalized correlation — "which shape does this
    series keep repeating?", the unsupervised twin of
    :func:`ts_pattern_search`'s known-template search. Emits one row
    per group: ``(group, slot_a, slot_b, similarity)``.

    Same exact-arithmetic contract as the pattern search: quantize to
    int64, mean-center as ``c_i = L*q_i - sum(q)``, all pair dot
    products exact int64, one double divide at the end — so the SQL
    oracle reproduces the choice bit-for-bit. Ties (exactly equal
    correlation) break on the smallest ``(slot_a, slot_b)``.

    Plan shape: one grouped Arrow pass (``applyInPandas``) holding one
    group's window matrix — ``n x L`` ints with ``n`` calendar-bounded
    (slots per group), the Gram matrix one numpy matmul; compare the
    true matrix profile's O(n^2) with FFT refinements the same way
    FAISS refines brute-force ANN. Feed :func:`gapfill_forward`
    output; zero-variance (flat) windows are excluded from pairing.
    """
    import numpy as np
    import pandas as pd

    L = window_len

    def find_motif(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(slot_col)
        slots_arr = pdf[slot_col].to_numpy(dtype=np.int64)
        # Half-away-from-zero rounding (matches Spark F.round / DuckDB
        # round), NOT np.round's banker's rounding: 12.5 -> 13, -12.5 -> -13.
        v = pdf[value_col].to_numpy(dtype=np.float64) * quant_scale
        # SQL-NULL parity (round-10 fuzz find): a gap-filled series
        # whose FIRST observed slots sum to NULL keeps NULLs at the
        # head (IGNORE NULLS has nothing to fill from); in the SQL
        # twin a NULL q nulls the window sum, then n2, so every
        # window overlapping it drops via n2 > 0. numpy instead casts
        # the NaN to garbage int64 — mask those slots and exclude any
        # window overlapping one, which is exactly the SQL outcome.
        nanmask = np.isnan(v)
        q = np.where(
            nanmask, 0, np.sign(v) * np.floor(np.abs(v) + 0.5)
        ).astype(np.int64)
        n = len(q) - L + 1
        if n < L + 1:  # no room for two non-overlapping windows
            return pd.DataFrame(
                columns=["g", "slot_a", "slot_b", "similarity"]
            ).astype(
                {"g": object, "slot_a": "int64", "slot_b": "int64",
                 "similarity": "float64"}
            )
        W = np.lib.stride_tricks.sliding_window_view(q, L)  # n x L
        S = W.sum(axis=1)
        C = L * W - S[:, None]  # centered, int64
        G = C @ C.T  # exact int64 Gram
        n2 = np.diag(G).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = G.astype(np.float64) / np.sqrt(n2[:, None] * n2[None, :])
        badw = np.lib.stride_tricks.sliding_window_view(nanmask, L).any(
            axis=1
        )
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        valid = (
            (jj >= ii + L)
            & (n2[ii] > 0)
            & (n2[jj] > 0)
            & ~badw[ii]
            & ~badw[jj]
        )
        if not valid.any():
            return pd.DataFrame(
                columns=["g", "slot_a", "slot_b", "similarity"]
            ).astype(
                {"g": object, "slot_a": "int64", "slot_b": "int64",
                 "similarity": "float64"}
            )
        cv = np.where(valid, corr, -np.inf)
        best = cv.max()
        cand = np.argwhere(cv == best)  # ties: exact double equality
        i, j = min(map(tuple, cand))
        return pd.DataFrame(
            [
                {
                    "g": pdf[group_col].iloc[0],
                    "slot_a": int(slots_arr[i]),
                    "slot_b": int(slots_arr[j]),
                    "similarity": float(best),
                }
            ]
        )

    out_schema = (
        f"g {slots.schema[group_col].dataType.simpleString()}, "
        "slot_a long, slot_b long, similarity double"
    )
    return (
        slots.select(group_col, slot_col, value_col)
        .groupBy(group_col)
        .applyInPandas(find_motif, out_schema)
        .select(
            F.col("g").alias(group_col), "slot_a", "slot_b", "similarity"
        )
    )


def interval_overlap_pairs(
    iv: DataFrame,
    id_col: str = "user_id",
    day_col: str = "day",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_secs: int = SLOT_SECS,
) -> DataFrame:
    """All id pairs whose ``[lo, hi]`` intervals (same ``day``) overlap
    strictly, as ``(day, user_a, user_b, overlap_secs)`` with
    ``user_a < user_b`` — the co-presence pair build.

    Scale shape (the 100 TB interval-join reduction, VERDICT r5 #2):
    NOT a same-day all-pairs join — a day's cohort is O(active users)
    and day-bucket candidates are O(cohort^2) even when almost no
    intervals truly overlap. Instead the classic replicate-covers /
    probe-by-start point-in-interval join on a fine grid:

    * ``cov``: each interval replicated into every ``bucket_secs`` slot
      it covers (``explode(sequence(...))`` — fan-out bounded by
      slots-per-day, 96 at the 15-min default);
    * ``st``: each interval keyed ONCE by its start slot;
    * equi-join on the slot. Two intervals overlap (``>= 0``) iff the
      later start falls inside the earlier interval, and the later
      starter's start slot is then covered by the earlier interval —
      so every qualifying pair is found at EXACTLY one (slot, roles)
      combination once the join demands the ``st`` side start strictly
      later (ties broken by id). No ``distinct`` needed; candidate
      volume is proportional to genuinely-overlapping pairs (plus
      same-slot near-misses), not to day-cohort^2.

    All arithmetic integer; output order-normalized to id order, which
    is independent of the cover/starter role split.
    """
    # A NULL id cannot form a well-defined pair: the role-split
    # tiebreak (c_id < s_id) is UNKNOWN on it, and Spark's
    # least/greatest IGNORE nulls — so a NULL-id interval paired with
    # user 5 would emit the self-pair (5, 5), an artifact no oracle
    # states (round-10 NULL poison sweep: an anonymous event's
    # user_id is NULL on a real corpus). Drop NULL-id intervals
    # before replication; SQL comparison semantics (a < b) drop them
    # on the oracle side for free.
    iv = iv.filter(F.col(id_col).isNotNull())
    slot = lambda c: F.floor(c / F.lit(bucket_secs)).cast("long")  # noqa: E731
    cov = iv.select(
        F.col(id_col).alias("c_id"),
        F.col(day_col).alias("day"),
        F.col(lo_col).alias("c_lo"),
        F.col(hi_col).alias("c_hi"),
        F.explode(
            F.sequence(slot(F.col(lo_col)), slot(F.col(hi_col)))
        ).alias("slot"),
    )
    st = iv.select(
        F.col(id_col).alias("s_id"),
        F.col(day_col).alias("day"),
        F.col(lo_col).alias("s_lo"),
        F.col(hi_col).alias("s_hi"),
        slot(F.col(lo_col)).alias("slot"),
    )
    later_starter = (F.col("c_lo") < F.col("s_lo")) | (
        (F.col("c_lo") == F.col("s_lo")) & (F.col("c_id") < F.col("s_id"))
    )
    return (
        # day rides the join key explicitly: callers whose lo/hi are
        # within-day OFFSETS (not absolute seconds) would otherwise
        # pair rows from different days that share a slot number
        cov.join(
            st,
            ["slot", "day"],
        )
        .filter(later_starter & (F.col("s_lo") <= F.col("c_hi")))
        .select(
            F.col("day").alias(day_col),
            F.least("c_id", "s_id").alias("user_a"),
            F.greatest("c_id", "s_id").alias("user_b"),
            (
                F.least("c_hi", "s_hi") - F.greatest("c_lo", "s_lo")
            ).alias("overlap_secs"),
        )
        .filter(F.col("overlap_secs") > 0)
    )
