"""spark-submit entry point: compact an index dataset (force-merge analogue).

Folds all build/epoch units into one base unit, applies pending delete
tombstones physically, and updates stats to the live corpus. Quiesce any
Searchers on this index for the swap window (see operators/compaction.py).

    spark-submit --py-files dist/kafka_es_spark.zip jobs/compact_index.py \
        --index /data/index [--term-buckets 32]

Optionally register deletes first:

    spark-submit ... jobs/compact_index.py --index /data/index \
        --delete-doc-ids 17,42,99 [--compact/--no-compact]
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
    p.add_argument("--term-buckets", type=int, default=None,
                   help="bucket count for the compacted layout "
                        "(default: keep the index's recorded scheme)")
    p.add_argument("--delete-doc-ids", default=None,
                   help="comma-separated doc ids to tombstone before compacting")
    p.add_argument("--no-compact", dest="compact", action="store_false",
                   help="only register tombstones, skip the merge")
    args = p.parse_args(argv)

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.operators.compaction import compact_index
    from kafka_es_spark.operators.deletes import add_tombstones

    spark = get_spark("kes-compact-index")
    try:
        if args.delete_doc_ids:
            ids = [int(x) for x in args.delete_doc_ids.split(",") if x.strip()]
            n = add_tombstones(spark, args.index, doc_ids=ids)
            print(json.dumps({"tombstones_added": n}))
        if args.compact:
            counters = compact_index(
                spark, args.index, n_term_buckets=args.term_buckets
            )
            print(json.dumps({"compacted": counters}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
