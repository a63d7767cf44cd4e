"""spark-submit entry point: BM25 top-k queries against an index dataset.

    spark-submit --py-files dist/kafka_es_spark.zip jobs/query_index.py \
        --index /data/index -k 10 "web crawl text" ["second query" ...]
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--no-url", action="store_true")
    p.add_argument("--batch", action="store_true",
                   help="score all queries in ONE Spark job (amortized latency)")
    p.add_argument("--mode", choices=["or", "and"], default="or",
                   help="and = conjunctive (ES bool.must)")
    p.add_argument("--min-should-match", type=int, default=None,
                   help="require >= m matching terms (ES minimum_should_match)")
    p.add_argument("--phrase", action="store_true",
                   help="exact-adjacency phrase query (needs positions/)")
    p.add_argument("--prefix", action="store_true",
                   help="prefix query: expand each arg against the term dict")
    p.add_argument("queries", nargs="+")
    args = p.parse_args(argv)

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.operators.wand import Searcher

    spark = get_spark("kes-query-index")
    try:
        if args.phrase:
            from kafka_es_spark.operators.positions import phrase_topk

            for q in args.queries:
                rows = phrase_topk(
                    spark, args.index, q, k=args.k, with_url=not args.no_url
                ).collect()
                print(json.dumps({"phrase": q, "hits": [r.asDict() for r in rows]}))
            return
        s = Searcher(spark, args.index)
        if args.prefix:
            for q in args.queries:
                rows = s.prefix_topk(q, k=args.k, with_url=not args.no_url).collect()
                print(json.dumps({"prefix": q, "hits": [r.asDict() for r in rows]}))
            s.close()
            return
        if args.batch:
            by_q: dict[int, list] = {}
            for r in s.topk_many(args.queries, k=args.k, mode=args.mode).collect():
                by_q.setdefault(r["query_id"], []).append(
                    {"doc_id": r["doc_id"], "score": r["score"]}
                )
            for i, q in enumerate(args.queries):
                print(json.dumps({"query": q, "hits": by_q.get(i, [])}))
        else:
            for q in args.queries:
                rows = s.topk(
                    q, k=args.k, with_url=not args.no_url, mode=args.mode,
                    min_should_match=args.min_should_match,
                ).collect()
                print(json.dumps({"query": q, "hits": [r.asDict() for r in rows]}))
        s.close()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
