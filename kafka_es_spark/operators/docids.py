"""X3 — dense, deterministic, parallelism-invariant doc-ID assignment.

``monotonically_increasing_id`` is neither dense nor stable across
parallelism, and a global sort would bottleneck at 10^12 docs. Instead
(SURVEY.md §7 "what's hard" #1):

  bucket  = pmod(xxhash64(url), n_buckets)            # pure function of url
  offset  = cumulative count of docs in buckets < bucket
  doc_id  = offset[bucket] + rank(url within bucket)

Both passes are bucket-hash shuffles (uniform by construction — xxhash64 on
unique urls), never a global sort; the per-bucket window sort is bounded at
N/n_buckets rows. The result is identical at any parallelism level and any
input partitioning, which the rank-identity contract requires.

At 10^12 docs: n_buckets ≈ 2^17 keeps the collected offsets table tiny
(n_buckets longs on the driver) while each bucket holds ~10^7 docs — raise
n_buckets with scale; the collect stays O(n_buckets).

Reference parity: generalizes the sink's hash router
(ElasticsearchSinkTask.kt:209-212, Actors.kt:55-75) from "route record to
writer" to "assign stable dense ids".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(pages: DataFrame, url_col: str = "url", n_buckets: int = 1024) -> DataFrame:
    """Add a dense ``doc_id`` long column, 0..N-1, keyed by (hash-bucket, url)."""
    b = pages.withColumn("_bkt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)))
    counts = {r["_bkt"]: r["c"] for r in b.groupBy("_bkt").agg(F.count("*").alias("c")).collect()}
    offsets = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off_df = b.sparkSession.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()], "_bkt: long, _off: long"
    )
    w = Window.partitionBy("_bkt").orderBy(url_col)
    return (
        b.join(F.broadcast(off_df), "_bkt")
        .withColumn("doc_id", (F.col("_off") + F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_bkt", "_off")
    )
