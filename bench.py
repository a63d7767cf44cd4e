"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = steady-state index-build seconds for the synthetic pages corpus
(the north-star metric's denominator; docs/sec is reported alongside).

Methodology (same as tools/scaling_bench.py, per BENCH/BASELINE.md):
- input is a parquet table on disk (like production; a cached DataFrame
  would occupy executor heap and skew GC);
- one full-size warmup build is discarded (JVM C2 + python-worker warmup
  dominates the first minutes of a session — a cold single run measures
  JVM startup, not the engine);
- best of FOUR measured builds is reported: this host has multi-minute
  co-tenant performance waves of up to 5-7x (BENCH/BASELINE.md), so
  best-of-2 still landed inside a wave in round 2 (VERDICT r2 §wrong 2).
- default corpus is 500k pages: big enough that the fixed per-build cost
  (F ≈ 10 s of job barriers) stops dominating, small enough that warmup +
  four measured builds fit the driver budget even through a host slow-wave.
Corpus generation is excluded from all timed regions and cached across
rounds at /tmp/kes_corpus_{N}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_PAGES = int(os.environ.get("BENCH_PAGES", "500000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.operators import bm25 as bm
    from kafka_es_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from kafka_es_spark.operators.similarity import cosine_topk
    from kafka_es_spark.plans.build_index import build_index
    from kafka_es_spark.sources.pages import gen_pages_distributed
    from kafka_es_spark.functions.textstats import quality_features

    spark = get_spark("kafka-es-bench", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        queries[name] = round(time.time() - t0, 3)
        return out

    # --- corpus: parquet on disk, generation outside all timed regions -----
    src = f"/tmp/kes_corpus_{N_PAGES}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        gen_pages_distributed(spark, N_PAGES, seed=42, slices=64).write.mode(
            "overwrite"
        ).parquet(src)
    pages = spark.read.parquet(src)

    tmp_dirs: list[str] = []

    def one_build() -> str:
        d = tempfile.mkdtemp(prefix="kes_bench_idx_")
        tmp_dirs.append(d)
        # lang stored in the docmap (ES doc-values analogue) — the build
        # pays the stored column like production would; facet_lang_stored
        # below serves the terms agg from it with no external join
        build_index(
            spark, pages, d, n_term_buckets=int(cpus), store_fields=("lang",)
        )
        return d

    try:
        # --- index build (north-star metric): warmup discarded, best of 4 --
        t0 = time.time()
        one_build()
        queries["index_build_warmup"] = round(time.time() - t0, 3)
        build_times = []
        idx = None
        for _ in range(4):
            t0 = time.time()
            idx = one_build()
            build_times.append(time.time() - t0)
        build_sec = round(min(build_times), 3)
        queries["index_build"] = build_sec

        # --- BM25 query latency over the built index (WAND) ----------------
        from kafka_es_spark.operators.wand import Searcher

        qs = ["data index search", "the crawl text", "kafka sink retry flush",
              "der daten index", "score rank merge block"]
        searcher = Searcher(spark, idx)
        searcher.topk(qs[0], k=10).collect()  # warm the cached index readers
        lat = []
        for q in qs:
            t0 = time.time()
            searcher.topk(q, k=10).collect()
            lat.append(time.time() - t0)
        lat.sort()
        queries["wand_query_p50"] = round(lat[len(lat) // 2], 3)
        queries["wand_query_max"] = round(lat[-1], 3)
        # conjunctive (bool.must) serving: intersection scorer, same index
        t0 = time.time()
        searcher.topk(qs[0], k=10, mode="and").collect()
        queries["wand_and_query"] = round(time.time() - t0, 3)
        # batch serving: one job for the whole query set — amortized per-query
        t0 = time.time()
        searcher.topk_many(qs, k=10).collect()
        queries["wand_batch_per_query"] = round((time.time() - t0) / len(qs), 3)
        # filter-context serving (ES _count / terms agg): posting-set
        # algebra with no scoring and no range_dls read
        t0 = time.time()
        searcher.match_count(qs[0], mode="and").collect()
        queries["match_count_and"] = round(time.time() - t0, 3)
        t0 = time.time()
        searcher.facet_terms(qs[0], pages.select("url", "lang"), "lang").collect()
        queries["facet_lang"] = round(time.time() - t0, 3)
        # same terms agg from the docmap's stored fields (doc-values path):
        # one dense-id join, no external field relation
        t0 = time.time()
        searcher.facet_terms(qs[0], None, "lang").collect()
        queries["facet_lang_stored"] = round(time.time() - t0, 3)
        # --- ES _search DSL interpreter (round-5 user surface) -------------
        # parse+compile+serve a representative body: scoring bool with a
        # filter-context range, sorted by score, first page
        from kafka_es_spark.operators.searchapi import search as dsl_search

        dsl_body = {
            "query": {"bool": {
                "must": [{"match": {"text": qs[0]}}],
                "filter": [{"range": {"dl": {"gte": 5}}}],
            }},
            "size": 10,
        }
        dsl_search(searcher, dsl_body).collect()  # warm the compile path
        t0 = time.time()
        dsl_search(searcher, dsl_body).collect()
        queries["search_dsl"] = round(time.time() - t0, 3)
        # --- phrase suggester served from index-time bigram stats ----------
        from kafka_es_spark.plans.build_index import build_bigram_stats

        t0 = time.time()
        build_bigram_stats(spark, pages, idx)
        queries["bigram_stats_build"] = round(time.time() - t0, 3)
        t0 = time.time()
        searcher.phrase_suggest("dita indek", size=5).collect()
        queries["phrase_suggest"] = round(time.time() - t0, 3)
        searcher.close()

        # positional relation: one-time build cost + phrase serving latency
        from kafka_es_spark.operators.positions import (
            build_position_index, phrase_topk,
        )

        t0 = time.time()
        build_position_index(spark, pages, idx)
        queries["positions_build"] = round(time.time() - t0, 3)
        t0 = time.time()
        phrase_topk(spark, idx, "data index", k=10).collect()
        queries["phrase_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        phrase_topk(spark, idx, "data index", k=10, slop=2).collect()
        queries["sloppy_phrase_query"] = round(time.time() - t0, 3)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
        n_docs = docs.count()
        timed("bm25_exhaustive", lambda: bm.bm25_topk(docs, ["spark", "query", "join"], k=10).collect())
        timed(
            "minhash_lsh_dedup",
            lambda: lsh_candidate_pairs(minhash_signatures(docs, n_perm=8, w=3), bands=4).count(),
        )
        timed("quality_features", lambda: quality_features(docs).count())

        # --- ES|QL compile + execute (round-5 user surface): a realistic
        # filter → eval → grouped-stats → sort pipeline over documents
        from kafka_es_spark.esql import esql_query

        esql_text = (
            "FROM documents | WHERE n_chars > 200 "
            "| EVAL kchars = n_chars / 1000.0 "
            "| STATS n = count(*), avg_k = avg(kchars) BY lang, source "
            "| SORT n DESC, lang ASC | LIMIT 20"
        )
        esql_query(spark, esql_text, {"documents": docs}).collect()  # warm
        timed(
            "esql_pipeline",
            lambda: esql_query(spark, esql_text, {"documents": docs}).collect(),
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        qv = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        timed("cosine_topk", lambda: cosine_topk(emb, qv, k=10).collect())

        print(
            json.dumps(
                {
                    "metric": (
                        f"steady-state index-build wall sec for {N_PAGES} parquet-backed "
                        f"pages on local[{cpus}], warmup discarded, best of 4 "
                        f"(docs_per_sec={round(N_PAGES / build_sec, 1)}); per-query sec alongside"
                    ),
                    "value": build_sec,
                    "unit": "sec",
                    "queries": queries,
                    "sf": float(sf),
                    "docs_per_sec": round(N_PAGES / build_sec, 1),
                    "bench_pages": N_PAGES,
                    "corpus_docs": n_docs,
                }
            )
        )
    finally:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
