"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = end-to-end index-build seconds for the synthetic pages corpus
(the north-star metric's denominator; docs/sec is reported alongside).
Per-query seconds cover the full operator surface. Generation of synthetic
inputs is excluded from timed regions.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_PAGES = int(os.environ.get("BENCH_PAGES", "20000"))


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
    from kafka_es_spark.operators.wand import wand_topk  # noqa: F401
    from kafka_es_spark.plans.build_index import build_index
    from kafka_es_spark.sources.pages import gen_pages
    from kafka_es_spark.functions.textstats import quality_features

    spark = get_spark("kafka-es-bench", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        queries[name] = round(time.time() - t0, 3)
        return out

    # --- index build (north-star metric) over input_hint-shaped pages ------
    pages = gen_pages(spark, N_PAGES, seed=42, partitions=int(cpus)).cache()
    pages.count()  # materialize generation outside the timed region
    idx = tempfile.mkdtemp(prefix="kes_bench_idx_")
    try:
        timed("index_build", lambda: build_index(spark, pages, idx, n_term_buckets=int(cpus)))
        build_sec = queries["index_build"]

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
        searcher.close()

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
        n_docs = docs.count()
        timed("bm25_exhaustive", lambda: bm.bm25_topk(docs, ["spark", "query", "join"], k=10).collect())
        timed(
            "minhash_lsh_dedup",
            lambda: lsh_candidate_pairs(minhash_signatures(docs, n_perm=8, w=3), bands=4).count(),
        )
        timed("quality_features", lambda: quality_features(docs).count())

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        qv = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        timed("cosine_topk", lambda: cosine_topk(emb, qv, k=10).collect())

        print(
            json.dumps(
                {
                    "metric": (
                        f"index-build wall sec for {N_PAGES} pages on local[{cpus}] "
                        f"(docs_per_sec={round(N_PAGES / build_sec, 1)}); per-query sec alongside"
                    ),
                    "value": build_sec,
                    "unit": "sec",
                    "queries": queries,
                    "sf": float(sf),
                    "docs_per_sec": round(N_PAGES / build_sec, 1),
                    "corpus_docs": n_docs,
                }
            )
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
