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


AUTO_DH_LADDER: list[tuple[str, float]] = [
    ("minute", 60.0),
    ("hour", 3600.0),
    ("day", 86400.0),
    ("month", 2629800.0),   # 30.4375 d — estimation only, truncation is calendar
    ("year", 31557600.0),   # 365.25 d
]


def auto_date_histogram(
    events: DataFrame,
    target_buckets: int,
    ts_col: str = "ts",
) -> DataFrame:
    """ES auto_date_histogram: the engine PICKS the calendar interval —
    the smallest unit in the minute→year ladder whose estimated bucket
    count fits ``target_buckets`` (est = floor(span_sec / unit_sec) + 1;
    month/year estimate with their mean lengths, truncation itself stays
    calendar). Output (bucket, doc_count) bucket-ordered plus the chosen
    ``interval`` as a constant column, the way the ES response reports
    which interval it settled on. The fixed-width estimator (not a
    calendar walk) is stated so a SQL oracle can replay the choice with
    the same CASE ladder.

    Plan: one scalar min/max aggregate (a driver collect of exactly one
    row at ANY corpus size) chooses the unit, then the same one-shuffle
    hash aggregation as date_histogram. Two jobs total."""
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    lo, hi = events.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    if lo is None:
        return events.sparkSession.createDataFrame(
            [], "bucket timestamp, doc_count long, interval string"
        )
    span = (hi - lo).total_seconds()
    unit = AUTO_DH_LADDER[-1][0]
    for u, sec in AUTO_DH_LADDER:
        if int(span // sec) + 1 <= int(target_buckets):
            unit = u
            break
    return (
        events.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .withColumn("interval", F.lit(unit))
        .orderBy("bucket")
    )


def date_range_agg(
    events: DataFrame,
    boundaries: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """ES date_range-aggregation analogue: ``boundaries`` (ISO
    timestamps, ascending) cut the time axis into len+1 buckets —
    ``from`` inclusive, ``to`` exclusive, open ends rendered ``*`` (the
    ES range-key convention the numeric agg_ranges shares). Every
    requested range appears even at doc_count 0.

    Plan: one conditional-sum aggregate row unpivoted with ``stack`` —
    the bucket count is tiny and fixed, so this is a single map-side
    combine over the scan, no join and no second shuffle."""
    bs = list(boundaries)
    edges: list[tuple[str | None, str | None]] = []
    for i in range(len(bs) + 1):
        lo = bs[i - 1] if i > 0 else None
        hi = bs[i] if i < len(bs) else None
        edges.append((lo, hi))
    aggs = []
    names = []
    for i, (lo, hi) in enumerate(edges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(ts_col) >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (F.col(ts_col) < F.lit(hi).cast("timestamp"))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_b{i}")
        )
        names.append(f"{lo or '*'}-{hi or '*'}")
    stack = ", ".join(f"'{n}', _b{i}" for i, n in enumerate(names))
    return (
        events.agg(*aggs)
        .selectExpr(f"stack({len(names)}, {stack}) AS (range_key, doc_count)")
        .orderBy("range_key")
    )


def sibling_bucket_stats(
    buckets: DataFrame,
    metric_col: str = "doc_count",
    round_to: int = 4,
) -> DataFrame:
    """ES sibling pipeline aggregations in one pass — avg_bucket,
    min_bucket, max_bucket, sum_bucket, stats_bucket's count — computed
    OVER a parent aggregation's buckets (one row out). Sibling pipelines
    are reduce-phase aggregates of the bucket relation, never a second
    event scan: #buckets input rows, one scalar aggregate row.

    min/max_bucket in ES also report which bucket keys attained the
    extremum; callers who need the keys join back on the value (ties =
    all attaining buckets, the ES 'keys' array)."""
    m = F.col(metric_col).cast("double")
    return buckets.agg(
        F.round(F.avg(m), round_to).alias("avg_bucket"),
        F.min(m).alias("min_bucket"),
        F.max(m).alias("max_bucket"),
        F.round(F.sum(m), round_to).alias("sum_bucket"),
        F.count(m).cast("long").alias("bucket_count"),
    )


def serial_diff(
    buckets: DataFrame,
    lag: int = 1,
    order_col: str = "bucket",
    metric_col: str = "doc_count",
) -> DataFrame:
    """ES serial_diff pipeline aggregation: value minus the value ``lag``
    buckets earlier (null for the first ``lag`` buckets, like ES's
    derivative) — the seasonal-differencing primitive (lag=7 on a daily
    histogram removes the weekly cycle). A window lag over the #buckets
    relation, reduce-phase placement like every pipeline agg here."""
    if lag < 1:
        raise ValueError("serial_diff lag must be >= 1")
    w = Window.orderBy(order_col)
    return buckets.withColumn(
        "serial_diff",
        F.col(metric_col) - F.lag(metric_col, int(lag)).over(w),
    ).orderBy(order_col)


def bucket_selector(buckets: DataFrame, predicate: str) -> DataFrame:
    """ES bucket_selector pipeline aggregation: drop parent-agg buckets
    where the script predicate is false. The painless subset that covers
    real usage (comparisons/arithmetic over ``buckets_path`` values) IS a
    SQL boolean expression over the bucket row, so the predicate is one.
    Runs in the reduce phase over #buckets rows — never over raw events —
    exactly ES's pipeline placement."""
    return buckets.filter(predicate)


def bucket_sort(
    buckets: DataFrame,
    sort: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
) -> DataFrame:
    """ES bucket_sort pipeline aggregation: reorder the parent agg's
    buckets by ``sort`` ([(column, 'asc'|'desc'), ...], applied in order)
    and paginate with ``from``/``size``. Deterministic output needs a
    deterministic sort — include a unique tiebreak column in ``sort``,
    as in ES. #buckets rows; with a size the sort rides TakeOrdered."""
    cols = [
        F.col(c).desc() if d.lower().startswith("d") else F.col(c).asc()
        for c, d in sort
    ]
    out = buckets.orderBy(*cols)
    if from_:
        out = out.offset(int(from_))
    if size is not None:
        out = out.limit(int(size))
    return out


def histogram_pipeline(
    events: DataFrame,
    ts_col: str = "ts",
    unit: str = "day",
    moving_window: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """ES pipeline-aggregation family over a date_histogram: per calendar
    bucket — doc_count, ``cumulative_sum``, ``derivative`` (difference
    vs the previous bucket; null for the first, as ES emits no
    derivative there), and ``moving_fn`` unweighted average over the
    trailing ``moving_window`` buckets (current included).

    Pipeline aggs are WINDOW functions over the already-tiny histogram
    relation (#buckets rows), not a second pass over the events: the
    parent histogram is one partial aggregation, and the pipeline stage
    runs on its output — exactly ES's reduce-phase placement. The single
    unpartitioned window is safe because its input is #buckets rows, not
    corpus rows (never put an unpartitioned window over raw events)."""
    hist = (
        events.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
    )
    w = Window.orderBy("bucket")
    mw = w.rowsBetween(-(int(moving_window) - 1), 0)
    return (
        hist.withColumn(
            "cumulative_sum",
            F.sum("doc_count").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "derivative", F.col("doc_count") - F.lag("doc_count").over(w)
        )
        .withColumn(
            "moving_avg",
            F.round(
                F.sum("doc_count").over(mw)
                / F.count(F.lit(1)).over(mw).cast("double"),
                round_to,
            ),
        )
        .orderBy("bucket")
    )
