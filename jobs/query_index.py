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
    p.add_argument("queries", nargs="+")
    args = p.parse_args(argv)

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.operators.wand import Searcher

    spark = get_spark("kes-query-index")
    try:
        s = Searcher(spark, args.index)
        for q in args.queries:
            rows = s.topk(q, k=args.k, with_url=not args.no_url).collect()
            print(json.dumps({"query": q, "hits": [r.asDict() for r in rows]}))
        s.close()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
