"""End-to-end inverted-index build (the replacement for the whole reference
pipeline: Kafka sink → ES bulk → ES index build, SURVEY.md §3.1).

Layout of an index dataset at ``index_dir``:

    postings/shard=<i>/*.parquet   segment rows (spimi.SEGMENT_SCHEMA + bucket)
    docmap/epoch=*/*.parquet       (doc_id, url, dl); epoch=base for the
                                   batch unit, epoch=<n> per streaming epoch
                                   (one uniform partitioned layout — mixed
                                   flat+partitioned dirs silently drop the
                                   flat files at partition discovery)
    range_dls/epoch=*/*.parquet    per-doc-range dl arrays (norms analogue;
                                   format 2 — dl no longer rides per posting)
    term_stats/unit=*/*.parquet    (term, df, cf) PARTIALS (base + one per
                                   streaming epoch); readers sum per term
    stats.json                     {format, n_docs, avgdl, total_tokens,
                                    codec, seg_bits, n_term_buckets,
                                    bucket_scheme}
    _manifest/*.json               per-stage commit entries + counters

Plan shape / scale notes:
* exactly one wide shuffle carries posting-sized data (the (term, seg)
  groupBy in spimi.build_segments); tokenize+invert are narrow maps;
* doc-id assignment shuffles page-sized rows by a uniform hash bucket;
* segment rows are repartitioned by term-hash bucket and sorted by
  (term, seg) within files, so query reads prune to the query terms via
  parquet row-group min/max on ``term`` (Iceberg would add manifest-level
  pruning in prod — same layout);
* shards = disjoint doc-range slices (seg % n_shards); each shard is an
  independent job committed via the manifest → partition-granular resume;
* head-term skew never concentrates: a hot term's postings split across
  doc-range segments (the salt), bounded at 2^seg_bits docs per reducer.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from kafka_es_spark.functions.extract import extract_text
from kafka_es_spark.functions.tokenize import tokens
from kafka_es_spark.operators.docids import assign_doc_ids
from kafka_es_spark.operators import spimi
from kafka_es_spark.plans.manifest import Manifest

# Identifier of the term→bucket hash scheme used for file-level pruning.
# Recorded in stats.json; the query side prunes `bucket IN (...)` ONLY when
# the recorded scheme matches what it computes driver-side — an index built
# (or partially built) under a different scheme must fall back to unpruned
# scans rather than silently dropping query terms (ADVICE r2).
BUCKET_SCHEME = "md5h32"


def extracted_pages(
    pages: DataFrame,
    extract_if_missing: bool = True,
    store_fields: tuple[str, ...] = (),
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, text[, *store_fields]).
    The text is the ONLY column that is expensive to recompute (Python
    UDF) — build_index persists exactly this slim relation. html is
    dropped immediately; tokenization is JVM-side regex and is recomputed
    by each consumer (cheaper than caching token arrays, which blows the
    columnar cache at scale). ``store_fields`` carries small scalar page
    columns through to the docmap — the ES stored-fields / doc-values
    analogue (keep them scalar; a wide stored column belongs in an
    external field relation, not the cached build lineage)."""
    # The Python UDF is hoisted out of coalesce into an ArrowEvalPython node
    # that runs on EVERY row, so gate its INPUT: rows that already carry text
    # hand the UDF a null instead of the html bytes — no Arrow transfer of
    # the payload, no regex work, identical output (guide §4: pass only what
    # the function needs).
    text = (
        F.coalesce(
            F.col("text"),
            extract_text(F.when(F.col("text").isNull(), F.col("html"))),
            F.lit(""),
        )
        if extract_if_missing
        else F.coalesce(F.col("text"), F.lit(""))
    )
    return pages.select("url", text.alias("text"), *store_fields)


def prepare_docs(pages: DataFrame, extract_if_missing: bool = True) -> DataFrame:
    """pages → (doc_id, url, dl, terms). One-shot convenience (tests); the
    multi-job build persists extracted_pages first — an Arrow UDF in the
    lineage defeats column pruning, so without it every job re-extracts."""
    docs = assign_doc_ids(extracted_pages(pages, extract_if_missing))
    t = tokens(F.col("text"))
    return docs.select(
        "doc_id", "url", F.size(t).cast("long").alias("dl"), t.alias("terms")
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    *,
    seg_bits: int = spimi.SEG_BITS,
    n_term_buckets: int = 32,
    codec: str = "varint",
    n_shards: int = 1,
    resume: bool = False,
    extract_if_missing: bool = True,
    metrics=None,
    store_fields: tuple[str, ...] = (),
) -> dict:
    """Build (or resume) the index; returns the manifest counter summary.
    ``metrics``: optional plans.metrics.BuildMetrics — W2 accumulators
    updated executor-side (observability; the manifest counters computed
    from the written data stay authoritative). ``store_fields``: page
    columns stored in the docmap (ES doc-values analogue) — aggregations
    over them need no external field join at query time; recorded in
    stats.json so epoch appends keep the docmap schema uniform."""
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(index_dir)
    # The extracted text is persisted once: the build is multi-job (bucket
    # counts, docmap, shards, stats), an Arrow UDF in the lineage defeats
    # column pruning, and re-running it would re-extract every page. The
    # POST-window relation (doc_id, url, terms, *store_fields) is persisted
    # too: the doc-id window (bucket shuffle + per-bucket sort) used to be
    # re-executed by BOTH the docmap job and every shard job (lineage
    # recompute) — caching it once was measured ~11% off the whole build at
    # 500k pages (guide §2.4: two operations keyed the same way share one
    # exchange — here they share the materialized result outright). The
    # cached relation carries the TOKEN ARRAYS, not the text: the docmap
    # job (dl = size) and the shard job(s) each ran the regex split, and
    # post-window tokenization measured ~1.5 s/run at 500k pages — caching
    # terms tokenizes once (a further ~8% off; tokens are ~the same bytes
    # as the text they replace). At cluster scale: DISK_ONLY or checkpoint
    # the extracted/tokenized dataset (it is a deliverable of its own).
    t_ex = time.time()
    store_fields = tuple(store_fields)
    slim = extracted_pages(pages, extract_if_missing, store_fields).persist()
    base = (  # the bucket-count job inside assign_doc_ids materializes `slim`
        assign_doc_ids(slim)
        .select(
            "doc_id", "url", tokens(F.col("text")).alias("terms"),
            *store_fields,
        )
        .persist()
    )
    docs = base.select(
        "doc_id", "url", F.size("terms").cast("long").alias("dl"),
        "terms", *store_fields
    )
    # not resume-gated (the persist must rebuild every run) — recorded so
    # per-stage attribution covers the whole build, not just committed stages
    man.commit("extract_docids", {"elapsed_sec": time.time() - t_ex})
    if metrics is not None:
        metrics.record_stage("extract_docids", time.time() - t_ex)

    # --- docmap + global stats (its own committed stage) -------------------
    # The batch unit writes under epoch=base so batch and streaming layouts
    # are IDENTICAL: appending an epoch to a flat-file docmap would make
    # Spark partition discovery silently resolve to the epoch subdirs only,
    # losing the base corpus from every full docmap read (ADVICE r3 #1/#2).
    docmap_dir = os.path.join(index_dir, "docmap")
    if not (resume and man.is_complete("docmap")):
        t0 = time.time()
        # global stats ride the write job via Observation — the old
        # read-back agg was a whole extra job (~0.5 s of the flat per-build
        # cost the scaling number pays at every corpus size)
        obs = Observation()
        (
            docs.select("doc_id", "url", "dl", *store_fields)
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.avg("dl").alias("avgdl"),
                F.sum("dl").alias("tok"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(docmap_dir, "epoch=base"))
        )
        st = obs.get
        stats = {
            "format": 2,
            "n_docs": int(st["n"]),
            "avgdl": float(st["avgdl"] or 0.0),
            "total_tokens": int(st["tok"] or 0),
            "codec": codec,
            "seg_bits": seg_bits,
            "n_term_buckets": n_term_buckets,
            "bucket_scheme": BUCKET_SCHEME,
            "store_fields": list(store_fields),
        }
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        man.commit(
            "docmap",
            {
                "docs": stats["n_docs"],
                "tokens": stats["total_tokens"],
                "elapsed_sec": time.time() - t0,
            },
        )
        if metrics is not None:
            metrics.record_stage("docmap", time.time() - t0)
        # `base` (post-window) is materialized by the write above; the
        # extraction-only cache has served its purpose — drop it so build
        # memory holds one text copy (on the resume path the docmap job is
        # skipped, so slim stays cached until the end for the shard jobs)
        slim.unpersist()

    # --- range dl arrays (format 2: dl rides ONCE per doc, not per posting).
    # Derived from the WRITTEN docmap parquet — reading (doc_id, dl) back is
    # a two-column scan; deriving from `docs` would re-tokenize the whole
    # corpus just to recompute dl (measured ~4 s of the fixed per-build cost
    # at 1M pages). --
    if not (resume and man.is_complete("range_dls")):
        t0 = time.time()
        rd_dir = os.path.join(index_dir, "range_dls")
        spimi.build_range_dls(
            spark.read.parquet(docmap_dir).select("doc_id", "dl"), seg_bits=seg_bits
        ).write.mode("overwrite").parquet(os.path.join(rd_dir, "epoch=base"))
        # range count is driver arithmetic over dense ids — no count job
        st0 = load_stats(index_dir)
        n_ranges = (int(st0["n_docs"]) + (1 << seg_bits) - 1) >> seg_bits
        man.commit("range_dls", {"ranges": int(n_ranges), "elapsed_sec": time.time() - t0})
        if metrics is not None:
            metrics.record_stage("range_dls", time.time() - t0)

    # --- posting shards ------------------------------------------------------
    for shard in range(n_shards):
        name = f"shard-{shard:05d}"
        if resume and man.is_complete(name):
            continue
        t0 = time.time()
        sdocs = (
            docs
            if n_shards == 1
            else docs.filter(F.shiftright("doc_id", seg_bits) % n_shards == shard)
        )
        # SPIMI two-stage: runs are varint-encoded map-side, so the one
        # posting-sized exchange moves ~5-10x fewer bytes/rows than raw
        # (term, doc, tf, dl) rows would (spimi.build_segments_spimi)
        segs = spimi.build_segments_spimi(
            sdocs, seg_bits=seg_bits, codec=codec, metrics=metrics
        )
        # bucket hash is the engine-portable md5 hash32 so the query side can
        # compute a term's bucket driver-side (no Spark job) and push
        # `bucket IN (...)` into the parquet scan — each bucket lands in one
        # file per shard, so non-query buckets are never read
        from kafka_es_spark.operators.dedup import hash32

        segs = segs.withColumn(
            "bucket", F.pmod(hash32(F.col("term")), F.lit(n_term_buckets))
        )
        out = os.path.join(index_dir, "postings", f"shard={shard}")
        # counters observed on the write itself (no read-back job); `terms`
        # is approx_count_distinct — exact distinct is disallowed inside
        # observe, and the counter is observability, not a correctness input
        obs = Observation()
        (
            segs.repartition(n_term_buckets, "bucket")
            .sortWithinPartitions("term", "seg")
            .observe(
                obs,
                F.count(F.lit(1)).alias("segments"),
                F.approx_count_distinct("term").alias("terms"),
                F.sum("df_seg").alias("postings"),
                F.sum(
                    F.octet_length("docs_blob") + F.octet_length("tfs_blob")
                ).alias("bytes"),
            )
            .write.mode("overwrite")
            .parquet(out)
        )
        c = obs.get
        man.commit(
            name,
            {
                "segments": int(c["segments"]),
                "terms": int(c["terms"]),
                "postings": int(c["postings"] or 0),
                "bytes": int(c["bytes"] or 0),
                "elapsed_sec": time.time() - t0,
            },
        )
        if metrics is not None:
            metrics.record_stage(name, time.time() - t0)

    # --- term stats (recomputed over all shards; cheap: segment rows only).
    # Written as a PARTIAL under unit=base: streaming epochs append their own
    # unit=<epoch> partials and the query side sums per term, so a stream
    # never re-aggregates the whole index per micro-batch. ---
    if not (resume and man.is_complete("term_stats")):
        t0 = time.time()
        all_segs = spark.read.parquet(os.path.join(index_dir, "postings"))
        ts_dir = os.path.join(index_dir, "term_stats")
        obs = Observation()
        (
            all_segs.groupBy("term")
            .agg(F.sum("df_seg").alias("df"), F.sum("cf_seg").alias("cf"))
            .observe(obs, F.count(F.lit(1)).alias("terms"))
            .write.mode("overwrite")
            .parquet(os.path.join(ts_dir, "unit=base"))
        )
        man.commit(
            "term_stats",
            {"terms": int(obs.get["terms"]), "elapsed_sec": time.time() - t0},
        )

    slim.unpersist()
    base.unpersist()
    return {e["name"]: e for e in man.entries()}


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def build_bigram_stats(
    spark: SparkSession, pages: DataFrame, index_dir: str
) -> dict:
    """Add the ``bigram_stats/`` relation to an EXISTING index dataset:
    (prev, cur, n) corpus bigram counts under ``unit=base``, the
    phrase suggester's language model (mirrors term_stats' partials
    layout so streaming epochs could append their own units). Opt-in
    like the positional index — ES only pays for the phrase-suggest
    data structures when the mapping asks for them.

    Why index-time: the suggester previously re-derived these counts
    from the corpus PER QUERY (a full tokenize + transition scan per
    suggestion request — VERDICT r4 #4). One build-time aggregation
    makes each suggest call a candidate-pair lookup: the broadcast
    pair dimension semi-joins a vocab²-bounded stats relation whose
    parquet files are sorted by (prev, cur) for row-group pruning."""
    from kafka_es_spark.operators.cooccur import bigram_counts

    t0 = time.time()
    st = load_stats(index_dir)
    n_buckets = int(st.get("n_term_buckets") or 8)
    man = Manifest(index_dir)
    obs = Observation()
    (
        bigram_counts(extracted_pages(pages))
        .repartition(n_buckets, "prev")
        .sortWithinPartitions("prev", "cur")
        .observe(
            obs,
            F.count(F.lit(1)).alias("bigrams"),
            F.sum("n").alias("transitions"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "bigram_stats", "unit=base"))
    )
    c = obs.get
    counters = {
        "bigrams": int(c["bigrams"] or 0),
        "transitions": int(c["transitions"] or 0),
        "elapsed_sec": time.time() - t0,
    }
    man.commit("bigram_stats", counters)
    return counters


def reindex(
    spark: SparkSession,
    src_index_dir: str,
    pages: DataFrame,
    dst_index_dir: str,
    query: str | None = None,
    mode: str = "or",
    must_not: str | None = None,
    **build_kw,
) -> dict:
    """The ES ``_reindex`` analogue: build a FRESH index (new seg_bits /
    buckets / codec / store_fields — the reasons one reindexes) over the
    subset of the corpus matching ``query`` against the SOURCE index.

    ES reindex reads each doc's ``_source``; this engine keeps sources
    in the external corpus relation (``pages``), so the filter is the
    source index's hit set (posting-list algebra, no scoring) semi-joined
    onto ``pages`` by url — the 100 TB side is touched once, pruned by
    the (typically far smaller) hit set. ``query=None`` reindexes every
    live doc (the settings-migration case), which also drops tombstoned
    docs — reindex-as-compaction, exactly like ES. Doc ids in the new
    index are freshly dense-assigned (reference: ES assigns new Lucene
    ids on reindex too; identity is the url).

    Returns build_index's manifest summary for the new index."""
    from kafka_es_spark.operators.wand import Searcher

    s = Searcher(spark, src_index_dir, cache=False)
    try:
        dm = spark.read.parquet(os.path.join(src_index_dir, "docmap"))
        if query is not None:
            hits = s.matching_doc_ids(query, mode=mode, must_not=must_not)
            urls = hits.join(dm.select("doc_id", "url"), "doc_id").select("url")
        else:
            from kafka_es_spark.operators.deletes import read_tombstone_ids

            dead = read_tombstone_ids(spark, src_index_dir)
            urls = dm.select("doc_id", "url")
            if dead:
                # bounded by MAX_PENDING_TOMBSTONES — safe as a literal filter
                urls = urls.filter(~F.col("doc_id").isin(*sorted(dead)))
            urls = urls.select("url")
        subset = pages.join(urls, "url", "left_semi")
        return build_index(spark, subset, dst_index_dir, **build_kw)
    finally:
        s.close()
