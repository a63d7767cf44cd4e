"""spark-submit entry point: continuously ingest a pages stream into an index.

    spark-submit --py-files dist/kafka_es_spark.zip jobs/ingest_stream.py \
        --source /data/incoming_pages --index /data/index \
        --checkpoint /data/ckpt [--trigger 10] [--once]

Source is a parquet file-stream dir by default; swap --format kafka +
--kafka-* options on a real cluster (same downstream plan).
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--trigger", type=int, default=10)
    p.add_argument("--max-files-per-trigger", type=int, default=10)
    p.add_argument("--term-buckets", type=int, default=32)
    p.add_argument("--once", action="store_true", help="drain available input, then stop")
    args = p.parse_args(argv)

    from kafka_es_spark.session import get_spark
    from kafka_es_spark.sources.pages import PAGES_SCHEMA
    from kafka_es_spark.streaming.ingest_stream import stream_pages_to_index

    spark = get_spark("kes-ingest-stream")
    try:
        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", args.max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .parquet(args.source)
        )
        q = stream_pages_to_index(
            stream,
            args.index,
            args.checkpoint,
            trigger_seconds=args.trigger,
            n_term_buckets=args.term_buckets,
            once=args.once,
        )
        q.awaitTermination()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
