"""Round-6 optimization harness (guide §1): per-stage attribution for the
frozen bench.py surface. NOT the driver metric — bench.py stays the
measured contract; this file exists so OPTIMIZATION_r06.md can cite
stage-level numbers (manifest elapsed_sec per build stage, per-query
isolation) without touching the frozen harness.

Usage:
    python bench_extra.py [stages|queries|all]

Writes nothing outside /tmp; prints one JSON line per section.
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
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.plans.build_index import build_index, build_bigram_stats
    from kafka_es_spark.sources.pages import gen_pages_distributed

    spark = get_spark("kes-bench-extra", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    src = f"/tmp/kes_corpus_{N_PAGES}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        gen_pages_distributed(spark, N_PAGES, seed=42, slices=64).write.mode(
            "overwrite"
        ).parquet(src)
    pages = spark.read.parquet(src)

    tmp_dirs: list[str] = []

    def one_build() -> tuple[str, dict, float]:
        d = tempfile.mkdtemp(prefix="kes_bx_idx_")
        tmp_dirs.append(d)
        t0 = time.time()
        man = build_index(
            spark, pages, d, n_term_buckets=int(cpus), store_fields=("lang",)
        )
        return d, man, time.time() - t0

    try:
        # warmup (discarded)
        sc.setJobDescription("warmup build")
        idx, _, warm = one_build()
        out: dict = {"warmup_sec": round(warm, 3)}

        if what in ("stages", "all"):
            sc.setJobDescription("measured build")
            idx, man, total = one_build()
            out["build_sec"] = round(total, 3)
            out["stages"] = {
                k: round(v.get("elapsed_sec", 0.0), 3) for k, v in man.items()
            }
            from kafka_es_spark.operators.positions import build_position_index

            sc.setJobDescription("positions build")
            t0 = time.time()
            build_position_index(spark, pages, idx)
            out["positions_build"] = round(time.time() - t0, 3)
            sc.setJobDescription("bigram stats build")
            t0 = time.time()
            build_bigram_stats(spark, pages, idx)
            out["bigram_stats_build"] = round(time.time() - t0, 3)
            print("STAGES " + json.dumps(out))

        if what in ("queries", "all"):
            from kafka_es_spark.operators.positions import (
                build_position_index, phrase_topk,
            )
            from kafka_es_spark.operators.wand import Searcher
            from kafka_es_spark.operators.searchapi import search as dsl_search
            from kafka_es_spark.operators import bm25 as bm
            from kafka_es_spark.operators.dedup import (
                lsh_candidate_pairs, minhash_signatures,
            )
            from kafka_es_spark.operators.similarity import cosine_topk
            from kafka_es_spark.functions.textstats import quality_features

            if "positions_build" not in out:
                build_position_index(spark, pages, idx)
                build_bigram_stats(spark, pages, idx)
            q: dict[str, float] = {}

            def timed(name, fn, n=3):
                sc.setJobDescription(name)
                best = None
                for _ in range(n):
                    t0 = time.time()
                    fn()
                    dt = time.time() - t0
                    best = dt if best is None or dt < best else best
                q[name] = round(best, 3)

            qs = ["data index search", "the crawl text", "kafka sink retry flush",
                  "der daten index", "score rank merge block"]
            searcher = Searcher(spark, idx)
            searcher.topk(qs[0], k=10).collect()  # warm readers
            timed("wand_query", lambda: searcher.topk(qs[0], k=10).collect())
            timed("wand_and_query",
                  lambda: searcher.topk(qs[0], k=10, mode="and").collect())
            timed("match_count_and",
                  lambda: searcher.match_count(qs[0], mode="and").collect())
            timed("facet_lang",
                  lambda: searcher.facet_terms(
                      qs[0], pages.select("url", "lang"), "lang").collect())
            timed("facet_lang_stored",
                  lambda: searcher.facet_terms(qs[0], None, "lang").collect())
            dsl_body = {
                "query": {"bool": {
                    "must": [{"match": {"text": qs[0]}}],
                    "filter": [{"range": {"dl": {"gte": 5}}}],
                }},
                "size": 10,
            }
            dsl_search(searcher, dsl_body).collect()
            timed("search_dsl", lambda: dsl_search(searcher, dsl_body).collect())
            timed("phrase_suggest",
                  lambda: searcher.phrase_suggest("dita indek", size=5).collect())
            timed("phrase_query",
                  lambda: phrase_topk(spark, idx, "data index", k=10).collect())
            timed("sloppy_phrase_query",
                  lambda: phrase_topk(spark, idx, "data index", k=10, slop=2).collect())
            searcher.close()

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
            docs.count()
            timed("bm25_exhaustive",
                  lambda: bm.bm25_topk(docs, ["spark", "query", "join"], k=10).collect())
            timed("minhash_lsh_dedup",
                  lambda: lsh_candidate_pairs(
                      minhash_signatures(docs, n_perm=8, w=3), bands=4).count())
            timed("quality_features", lambda: quality_features(docs).count())

            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
            emb.count()
            qv = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"),
            )
            timed("cosine_topk", lambda: cosine_topk(emb, qv, k=10).collect())
            print("QUERIES " + json.dumps(q))
    finally:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
