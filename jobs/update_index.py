"""spark-submit entry point: ES-style _delete_by_query / _update_by_query
against an index dataset (X9 ops surface).

    spark-submit --py-files dist/kafka_es_spark.zip jobs/update_index.py \
        --index /data/index delete "stale term"                 # tombstones
    spark-submit ... jobs/update_index.py \
        --index /data/index update "hash" --set lang=xx         # literal
    spark-submit ... jobs/update_index.py \
        --index /data/index update "hash" \
        --script "ctx._source.lang = 'xx-' + ctx._source.lang"  # painless

Deletes persist as tombstones (every Searcher excludes them until
compaction folds them in — jobs/compact_index.py); updates rewrite the
docmap's stored fields through the crash-recoverable swap. Scripts are
the compiled painless-lite subset (operators/painless.py).
"""

from __future__ import annotations

import os
import sys

# Allow `python jobs/<job>.py` without spark-submit --py-files.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("action", choices=["delete", "update"])
    p.add_argument("query", help="match query resolved in filter context")
    p.add_argument("--mode", choices=["or", "and"], default="or")
    p.add_argument("--min-should-match", type=int, default=None)
    p.add_argument("--must-not", default=None)
    p.add_argument("--set", action="append", default=[], metavar="FIELD=VALUE",
                   help="literal stored-field assignment (repeatable)")
    p.add_argument("--script", default=None,
                   help="painless-lite script body (ctx._source subset)")
    p.add_argument("--param", action="append", default=[],
                   metavar="NAME=JSON_VALUE",
                   help="script param (repeatable; value parsed as JSON, "
                        "falling back to string)")
    args = p.parse_args(argv)

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.operators.deletes import (
        delete_by_query, update_by_query,
    )

    spark = get_spark("kes-update-index")
    try:
        common = dict(
            mode=args.mode, min_should_match=args.min_should_match,
            must_not=args.must_not,
        )
        if args.action == "delete":
            n = delete_by_query(spark, args.index, args.query, **common)
            print(json.dumps({"deleted": n}))
            return
        if bool(args.set) == bool(args.script):
            p.error("update takes exactly one of --set / --script")
        if args.script:
            params = {}
            for kv in args.param:
                k, v = kv.split("=", 1)
                try:
                    params[k] = json.loads(v)
                except json.JSONDecodeError:
                    params[k] = v
            n = update_by_query(
                spark, args.index, args.query,
                script=args.script, script_params=params, **common,
            )
        else:
            sets = {}
            for kv in args.set:
                k, v = kv.split("=", 1)
                sets[k] = v
            n = update_by_query(spark, args.index, args.query, sets, **common)
        print(json.dumps({"updated": n}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
