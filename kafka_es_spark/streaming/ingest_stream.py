"""Structured Streaming ingestion — the reference's continuous operating mode.

The reference is a Kafka Connect sink: records stream in, get batched by
size/delay, routed, delivered, and offsets commit only after a durable
flush (SURVEY.md §3.1). The Spark-first translation:

| reference                         | here                                      |
|-----------------------------------|-------------------------------------------|
| Connect runtime polling Kafka     | ``spark.readStream`` (kafka/file source)  |
| bulk.size / bulk.delay.ms (A1)    | trigger(processingTime=...) + maxOffsets  |
| RoutingActor hash partition (P1)  | same Column ops as batch (ingest.route)   |
| overflow/pause backpressure (A2)  | built-in source throttling                |
| flush-then-commit offsets (C1)    | checkpointLocation WAL + idempotent       |
|                                   | epoch-keyed foreachBatch commits          |
| per-item retry (K4)               | task retries + epoch replay (exactly-once |
|                                   | via manifest idempotence)                 |

``stream_pages_to_index`` appends each micro-batch to an index dataset as
its own shard (``epoch-<n>``): doc-id ranges are reserved per epoch through
the manifest, segments are written, and the manifest entry commits last —
if an epoch replays after a crash, the committed entry makes the rewrite a
no-op (the at-least-once → exactly-once upgrade the reference gets from
preCommit gating).

Query-side: segments of all epochs read together (same layout as batch
shards). Stats are INCREMENTAL: each epoch writes its own term-stats
partial (summed per term at read) and global counts derive from committed
manifest counters + the epoch's own docmap — O(epoch) per micro-batch, not
O(index); ``compact_stats`` collapses partials on demand.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_es_spark.functions.tokenize import tokens
from kafka_es_spark.operators import spimi
from kafka_es_spark.plans.build_index import extracted_pages
from kafka_es_spark.plans.manifest import Manifest


def _read_stats(index_dir: str) -> dict:
    p = os.path.join(index_dir, "stats.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"format": 2, "n_docs": 0, "avgdl": 0.0, "total_tokens": 0,
            "codec": "varint", "seg_bits": spimi.SEG_BITS}


def append_epoch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    epoch: int,
    seg_bits: int = spimi.SEG_BITS,
    n_term_buckets: int = 8,
    codec: str = "varint",
    with_positions: bool = False,
    store_fields: tuple[str, ...] = (),
) -> dict | None:
    """Append one micro-batch of pages to the index as shard ``epoch-<n>``.
    Idempotent: a committed epoch is skipped entirely (exactly-once under
    foreachBatch replay). Returns the committed counters (None if skipped).
    ``with_positions=True`` also writes the epoch's positional unit (phrase
    queries then cover streamed docs; see operators.positions).
    ``store_fields`` must MATCH the index's recorded stored-field set
    (stats.json): a mismatched epoch would fork the docmap schema and
    Spark's partition discovery would silently drop columns from one side
    — so it raises instead."""
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(index_dir)
    name = f"epoch-{epoch:08d}"
    dm_entry = man.read("docmap")
    folded = set((dm_entry or {}).get("folded_epochs", []))
    if man.is_complete(name) or name in folded:
        # committed directly, or absorbed into the base by a compaction
        # whose entry file cleanup already ran — either way a replay is a
        # no-op (exactly-once under foreachBatch replay)
        return None
    t0 = time.time()
    stats = _read_stats(index_dir)
    store_fields = tuple(store_fields)
    recorded = tuple(stats.get("store_fields") or ())
    if os.path.exists(os.path.join(index_dir, "stats.json")):
        if recorded != store_fields:
            raise ValueError(
                f"append_epoch(store_fields={list(store_fields)}) does not "
                f"match the index's recorded stored fields {list(recorded)} "
                "— a mixed docmap schema loses columns silently under "
                "partition discovery. Pass the same store_fields the index "
                "was built with (or compact+rebuild to change them)."
            )
    # The doc-id base and running token total come from COMMITTED manifest
    # entries, not stats.json: a crash after the stats write but before the
    # manifest commit would otherwise inflate the base on replay, punching a
    # hole in the dense id space (format 2's range-dl contiguity contract).
    # Committed entries only ⇒ a replayed epoch re-derives the exact same
    # base and overwrites its own files — true idempotence. Epochs already
    # folded into the base by compaction are excluded (the base entry's
    # docs_allocated carries their ids — dead slots included, so a new
    # epoch can never collide with a compacted-away id).
    committed = [
        e for e in man.entries()
        if e["name"] == "docmap"
        or (e["name"].startswith("epoch-") and e["name"] not in folded)
    ]
    base = sum(int(e.get("docs_allocated", e.get("docs", 0))) for e in committed)
    prev_docs_live = sum(int(e.get("docs", 0)) for e in committed)
    prev_tokens = sum(int(e.get("tokens", 0)) for e in committed)

    slim = extracted_pages(batch, store_fields=store_fields).persist()
    # dense ids continuing from the current corpus size; within-epoch order
    # by url (the epoch is one deterministic unit, same as a batch shard)
    from kafka_es_spark.operators.docids import assign_doc_ids

    docs = assign_doc_ids(slim).withColumn("doc_id", F.col("doc_id") + F.lit(base))
    t = tokens(F.col("text"))
    docs = docs.select(
        "doc_id", "url", F.size(t).cast("long").alias("dl"),
        t.alias("terms"), *store_fields
    )

    dm_out = os.path.join(index_dir, "docmap", f"epoch={epoch}")
    from pyspark.sql import Observation

    dm_obs = Observation()
    (
        docs.select("doc_id", "url", "dl", *store_fields)
        .observe(dm_obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .write.mode("overwrite")
        .parquet(dm_out)
    )

    # per-epoch range dl rows: epoch doc-id ranges are contiguous (dense ids
    # from the manifest base), so query-side concatenation per seg stays
    # position-indexed (format 2)
    rd_out = os.path.join(index_dir, "range_dls", f"epoch={epoch}")
    spimi.build_range_dls(
        spark.read.parquet(dm_out).select("doc_id", "dl"), seg_bits=seg_bits
    ).write.mode("overwrite").parquet(rd_out)

    if with_positions:
        from kafka_es_spark.operators.positions import append_epoch_positions

        append_epoch_positions(docs, index_dir, name, seg_bits, n_term_buckets)

    segs = spimi.build_segments_spimi(docs, seg_bits=seg_bits, codec=codec)
    from kafka_es_spark.operators.dedup import hash32

    segs = segs.withColumn("bucket", F.pmod(hash32(F.col("term")), F.lit(n_term_buckets)))
    out = os.path.join(index_dir, "postings", f"shard={name}")
    (
        segs.repartition(n_term_buckets, "bucket")
        .sortWithinPartitions("term", "seg")
        .write.mode("overwrite")
        .parquet(out)
    )

    # incremental stats — O(epoch), never O(index) (VERDICT r2 §wrong 3):
    # this epoch's segment rows aggregate into a term-stats PARTIAL under
    # term_stats/unit=<epoch>; the query side sums partials per term (doc
    # sets are disjoint, so df/cf add). Global doc/token counts come from
    # committed manifest counters + this epoch's docmap — no full docmap
    # scan, no full postings scan, constant work per micro-batch over the
    # stream's lifetime. ``compact_stats`` collapses partials on demand.
    seg_obs = Observation()
    (
        spark.read.parquet(out)
        .observe(
            seg_obs,
            F.count(F.lit(1)).alias("segments"),
            F.sum("df_seg").alias("postings"),
        )
        .groupBy("term")
        .agg(F.sum("df_seg").alias("df"), F.sum("cf_seg").alias("cf"))
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "term_stats", f"unit={name}"))
    )
    ep = dm_obs.get  # observed on the docmap write — no read-back job
    ep_docs, ep_tokens = int(ep["n"]), int(ep["s"] or 0)
    n_docs_total = prev_docs_live + ep_docs  # live docs (stats), not allocated
    tokens_total = prev_tokens + ep_tokens
    st = {
        "n": n_docs_total,
        "a": (tokens_total / n_docs_total) if n_docs_total else 0.0,
        "s": tokens_total,
    }
    # bucket pruning stays valid only if every epoch used the same bucket
    # count AND the same hash scheme. A legacy stats.json that predates the
    # scheme tag (or the key) gives NO default — its epochs may have been
    # bucketed under a different hash, and pruning against them would
    # silently drop query terms (ADVICE r2). Fresh index (base == 0)
    # establishes the scheme.
    from kafka_es_spark.plans.build_index import BUCKET_SCHEME

    if base == 0:
        consistent = True
    else:
        consistent = (
            stats.get("n_term_buckets") == n_term_buckets
            and stats.get("bucket_scheme") == BUCKET_SCHEME
        )
    new_stats = {
        "format": 2,
        "n_docs": int(st["n"]),
        "avgdl": float(st["a"] or 0.0),
        "total_tokens": int(st["s"] or 0),
        "codec": codec,
        "seg_bits": seg_bits,
        "n_term_buckets": n_term_buckets if consistent else None,
        "bucket_scheme": BUCKET_SCHEME if consistent else None,
        "store_fields": list(store_fields),
    }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(new_stats, f)

    c = seg_obs.get  # observed under the term-stats partial write
    counters = {
        "docs": ep_docs,
        "tokens": ep_tokens,
        "segments": int(c["segments"] or 0),
        "postings": int(c["postings"] or 0),
        "elapsed_sec": time.time() - t0,
    }
    slim.unpersist()
    man.commit(name, counters)  # commit LAST — the C1 contract
    return counters


def compact_stats(spark: SparkSession, index_dir: str) -> None:
    """Collapse per-epoch term-stats partials into one base partial — the
    explicit compaction that replaces the per-epoch full recompute the old
    design paid. O(index) by definition; run it when epoch-partial count
    (not correctness — partial sums are exact) makes query-side metadata
    reads slow.

    The swap is TWO renames, not one — concurrent readers must be quiesced
    for the window (same contract as compaction.compact_index, whose
    ``recover_swap_dirs`` repairs a crash inside it: term_stats restored
    from .old, dangling .new dropped). Full-index compaction including
    postings/tombstones lives in ``operators.compaction``."""
    import shutil as _shutil

    ts_dir = os.path.join(index_dir, "term_stats")
    agg = (
        spark.read.parquet(ts_dir)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    tmp = ts_dir + ".new"
    _shutil.rmtree(tmp, ignore_errors=True)
    agg.write.mode("overwrite").parquet(os.path.join(tmp, "unit=base"))
    old = ts_dir + ".old"
    _shutil.rmtree(old, ignore_errors=True)
    os.rename(ts_dir, old)
    os.rename(tmp, ts_dir)
    _shutil.rmtree(old, ignore_errors=True)


def stream_pages_to_index(
    pages_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = 10,
    n_term_buckets: int = 8,
    once: bool = False,
    with_positions: bool = False,
    compact_every: int | None = None,
    store_fields: tuple[str, ...] = (),
):
    """Wire a streaming pages DataFrame into the index via foreachBatch.
    trigger ≈ the reference's bulk.delay.ms; source rate limits ≈ bulk.size.

    ``compact_every=N`` enables the in-stream merge policy (the ES
    background-merge analogue): after an epoch commits, if the index has
    accreted ≥ N epoch units (or tombstones past the policy bound) the
    sink runs ``compact_index`` before the next micro-batch. The sink is
    the index's only writer and foreachBatch serializes epochs, so the
    swap window never races another writer; serving Searchers must
    re-init after a compaction (same quiesce contract as a manual
    force-merge — a crash mid-swap is repaired by recover_swap_dirs at
    the next Searcher init). Compaction cost is O(index), so N trades
    per-query unit overhead against periodic merge stalls — exactly the
    Lucene segment-count/merge-cost dial."""
    spark = pages_stream.sparkSession

    def sink(batch: DataFrame, epoch: int) -> None:
        append_epoch(
            spark, batch, index_dir, epoch, n_term_buckets=n_term_buckets,
            with_positions=with_positions, store_fields=store_fields,
        )
        if compact_every is not None:
            from kafka_es_spark.operators.compaction import (
                compact_index, should_compact,
            )

            if should_compact(spark, index_dir, max_units=int(compact_every)):
                compact_index(spark, index_dir, n_term_buckets=n_term_buckets)

    w = pages_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if once:
        w = w.trigger(availableNow=True)
    elif trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


KAFKA_PAGES_VALUE_SCHEMA = (
    "url string, warc_ts timestamp, html_b64 string, text string, lang string"
)


def pages_from_kafka(raw: DataFrame) -> DataFrame:
    """S1 — project a Kafka source frame (binary key/value + topic,
    partition, offset, timestamp) into the pages shape. The value is a
    JSON document {url, warc_ts, html_b64, text, lang} with the html
    payload base64-encoded (JsonConverter.kt:42-76 analogue; Kafka values
    are bytes, so binary html must ride inside JSON as base64).

    Pure Column ops over any DataFrame with a binary ``value`` column —
    unit-testable without a broker, identical plan in batch or streaming."""
    js = F.from_json(F.col("value").cast("string"), KAFKA_PAGES_VALUE_SCHEMA)
    return raw.select(
        js["url"].alias("url"),
        js["warc_ts"].alias("warc_ts"),
        F.unbase64(js["html_b64"]).alias("html"),
        js["text"].alias("text"),
        js["lang"].alias("lang"),
    )


def kafka_pages_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1 — the Kafka streaming source, option plumbing included
    (ElasticsearchSinkTask.kt:256-280's consumption loop as a Spark
    source). maxOffsetsPerTrigger is the bulk.size analogue. Requires the
    spark-sql-kafka package on the cluster; this sandbox does not bundle
    it, so a missing data source surfaces as NotImplementedError (same
    gating pattern as the protobuf converter)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        raw = r.load()
    except Exception as e:  # missing spark-sql-kafka jar
        if "kafka" in str(e).lower():
            from kafka_es_spark.operators.ingest import _spark_pkg

            raise NotImplementedError(
                "spark-sql-kafka is not bundled in this runtime; on a real "
                f"cluster add {_spark_pkg('spark-sql-kafka-0-10')} via "
                "--packages or spark.jars.packages (reference: "
                "ElasticsearchSinkTask.kt consumption loop)"
            ) from e
        raise
    return pages_from_kafka(raw)


def windowed_action_counts(
    actions_stream: DataFrame,
    window_seconds: int = 10,
    watermark_seconds: int = 30,
    ts_col: str = "ts",
) -> DataFrame:
    """A1's size/time batching surface as a streaming aggregation: per-window
    per-op action counts with late-data watermarking (the reference's
    bulkDelayMs timer generalized to event time)."""
    return (
        actions_stream.withWatermark(ts_col, f"{watermark_seconds} seconds")
        .groupBy(F.window(F.col(ts_col), f"{window_seconds} seconds"), F.col("op"))
        .agg(F.count("*").alias("n_actions"))
    )
