"""Event sessionization — the standard web-log pipeline operator (gap-based
session split), included with the training-data operator set: session
boundaries feed dedup-by-session, behavior features, and time-windowed
corpus slices.

Plan: ONE shuffle (window partitioned by user), then a hash aggregate on
(user, session). At 100 TB the window key is the user id — high cardinality,
no skew concentration (a pathological single user would bound at that
user's event count; guard upstream if a bot user dominates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user_id, session_seq, session_start, session_end, n_events): a new
    session starts when the gap to the user's previous event exceeds
    ``gap_seconds``. Ordering ties break on ``order_tiebreak`` so the
    result is deterministic. Timestamps are returned as epoch seconds
    (engine-portable)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # microsecond epoch for the gap test (full precision; NTZ treated as
    # UTC, matching DuckDB's epoch()); floor to seconds only at the output
    ep_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_col).over(w)
    brk = F.when(
        prev.isNull()
        | ((ep_us - F.unix_micros(prev.cast("timestamp"))) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.withColumn("_brk", brk).withColumn(
        "session_seq", F.sum("_brk").over(run).cast("long")
    )
    return tagged.groupBy(F.col(user_col).alias("user_id"), "session_seq").agg(
        F.floor(F.min(ep_us) / F.lit(1_000_000.0)).cast("long").alias("session_start"),
        F.floor(F.max(ep_us) / F.lit(1_000_000.0)).cast("long").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def date_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    unit: str = "day",
    key_col: str | None = None,
) -> DataFrame:
    """ES date_histogram aggregation analogue (``aggs: {date_histogram:
    {calendar_interval: day}}``): bucket rows by the calendar unit of
    their timestamp — (bucket, [key,] doc_count), bucket-ordered, empty
    buckets omitted (min_doc_count=1). ``key_col`` adds a terms
    sub-bucketing (the ES date_histogram + terms composite shape).

    Calendar truncation (date_trunc) differs from ev2's fixed-width
    epoch windows exactly the way ES distinguishes calendar_interval
    from fixed_interval. One hash aggregation to #buckets·#keys rows —
    partial map-side combine, no skew risk (time is naturally spread)."""
    b = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    keys = [b] + ([F.col(key_col)] if key_col else [])
    return (
        events.groupBy(*keys)
        .agg(F.count("*").alias("doc_count"))
        .orderBy(*(["bucket"] + ([key_col] if key_col else [])))
    )
