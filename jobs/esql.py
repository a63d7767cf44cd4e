"""spark-submit entry point: run an ES|QL pipeline over parquet tables.

    spark-submit --py-files dist/kafka_es_spark.zip jobs/esql.py \
        --tables /root/testdata/sf0.01 \
        'FROM documents | WHERE lang == "en" | STATS c = count(*) BY source \
         | SORT c DESC | LIMIT 10'

Every table referenced by FROM / LOOKUP JOIN resolves to
``<tables>/<name>.parquet``. ``--explain`` prints the optimized physical
plan instead of rows (to audit pushdown/broadcast), ``--json`` emits one
JSON object per row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Allow `python jobs/esql.py` without spark-submit --py-files.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", help="ES|QL pipeline text")
    p.add_argument("--tables", required=True,
                   help="directory holding <name>.parquet relations")
    p.add_argument("--limit", type=int, default=100,
                   help="max rows to show (safety net when the pipeline "
                        "has no LIMIT)")
    p.add_argument("--json", action="store_true", help="one JSON row per line")
    p.add_argument("--explain", action="store_true",
                   help="print the optimized plan, don't execute")
    args = p.parse_args(argv)

    from kafka_es_spark.esql import esql_query
    from kafka_es_spark.session import get_spark

    spark = get_spark("esql")
    df = esql_query(
        spark, args.query,
        lambda name: spark.read.parquet(f"{args.tables}/{name}.parquet"),
    )
    if args.explain:
        df.explain("formatted")
        return
    rows = df.limit(args.limit).collect()
    if args.json:
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
    else:
        for r in rows:
            print("\t".join(str(v) for v in r))


if __name__ == "__main__":
    main()
