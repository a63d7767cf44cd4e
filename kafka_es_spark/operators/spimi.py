"""X4/X5 — SPIMI posting-segment build with doc-range salting.

Two stages, exactly one wide shuffle:

1. **Narrow invert** (``doc_term_freqs``): per Arrow batch, explode token
   arrays and compute per-document tf with a vectorized pandas groupby —
   no Spark shuffle. This replaces the naive ``explode → groupBy(term,
   doc_id)`` whose shuffle would carry one row per token occurrence
   (~10^14 rows at 100 TB); after local tf-compression the shuffled
   relation is one row per *distinct* (term, doc) pair.

2. **Segment build** (``build_segments``): group by ``(term, seg)`` where
   ``seg = doc_id >> seg_bits``. The doc-range component is the salt
   (SURVEY.md §2.3 P1 generalized): a Zipf head term with 10^11 postings
   splits into bounded segments of ≤ 2^seg_bits docs each, so no reducer
   ever materializes a whole hot posting list — and because every term is
   cut on the *same* doc-range boundaries, query-time WAND can score each
   doc range independently and take a union of per-range top-k (exact,
   since ranges partition the doc space). No second merge pass is needed;
   segments ARE the index format.

Segment row schema: term, seg, df_seg, cf_seg, first_docid, last_docid,
docs_blob (delta-gap + codec), tfs_blob, dls_blob, blk_last/blk_maxtf/
blk_mindl (per-128-doc block-max metadata for WAND upper bounds — dl is
stored per posting so scoring needs no docmap join at query time).

Reference parity: the per-partition batch builder replaces the sink's
BufferingActor/BulkSinkActor pipeline (Actors.kt:107-259); blobs replace
NDJSON bulks (BulkAction.kt:104-111).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_es_spark.functions import codecs

SEG_BITS = 17  # 131072-doc ranges

POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("seg", T.LongType(), False),
        T.StructField("df_seg", T.LongType(), False),
        T.StructField("cf_seg", T.LongType(), False),
        T.StructField("first_docid", T.LongType(), False),
        T.StructField("last_docid", T.LongType(), False),
        T.StructField("docs_blob", T.BinaryType(), False),
        T.StructField("tfs_blob", T.BinaryType(), False),
        T.StructField("dls_blob", T.BinaryType(), False),
        T.StructField("blk_last", T.ArrayType(T.LongType()), False),
        T.StructField("blk_maxtf", T.ArrayType(T.LongType()), False),
        T.StructField("blk_mindl", T.ArrayType(T.LongType()), False),
    ]
)


def doc_term_freqs(docs: DataFrame, terms_col: str = "terms") -> DataFrame:
    """(term, doc_id, tf, dl) computed narrowly (no shuffle) from token arrays.

    Input needs columns: doc_id:long, <terms_col>:array<string>.
    """

    def invert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf[terms_col]
            lens = toks.map(len).to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                continue
            flat = pd.DataFrame(
                {
                    "term": np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)]),
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens),
                    "dl": np.repeat(lens, lens),
                }
            )
            out = (
                flat.groupby(["doc_id", "term"], sort=False)
                .agg(tf=("term", "size"), dl=("dl", "first"))
                .reset_index()
            )
            yield out[["term", "doc_id", "tf", "dl"]]

    return docs.select("doc_id", terms_col).mapInPandas(invert, POSTING_SCHEMA)


def build_segments(
    postings: DataFrame,
    seg_bits: int = SEG_BITS,
    codec: str = "varint",
) -> DataFrame:
    """One shuffle: group (term, doc_id >> seg_bits) → encoded segment rows."""
    enc = codecs.varint_encode if codec == "varint" else codecs.bp128_encode

    def encode_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, seg = key
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(dtype=np.uint64)
        tfs = pdf["tf"].to_numpy(dtype=np.uint64)
        dls = pdf["dl"].to_numpy(dtype=np.uint64)
        gaps = codecs.delta_encode(ids)
        last, maxtf, mindl = codecs.block_meta(
            ids.astype(np.int64), tfs.astype(np.int64), dls.astype(np.int64)
        )
        return pd.DataFrame(
            [
                {
                    "term": term,
                    "seg": int(seg),
                    "df_seg": int(ids.size),
                    "cf_seg": int(tfs.sum()),
                    "first_docid": int(ids[0]),
                    "last_docid": int(ids[-1]),
                    "docs_blob": enc(gaps),
                    "tfs_blob": enc(tfs),
                    "dls_blob": enc(dls),
                    "blk_last": last.tolist(),
                    "blk_maxtf": maxtf.tolist(),
                    "blk_mindl": mindl.tolist(),
                }
            ]
        )

    seg = postings.withColumn("seg", F.shiftright(F.col("doc_id"), seg_bits))
    return seg.groupBy("term", "seg").applyInPandas(encode_group, SEGMENT_SCHEMA)


def decode_segment(row, codec: str = "varint"):
    """Segment row → (doc_ids, tfs, dls) numpy arrays. Used by scorers/tests."""
    dec = codecs.varint_decode if codec == "varint" else codecs.bp128_decode
    n = int(row["df_seg"])
    if codec == "varint":
        gaps = codecs.varint_decode(bytes(row["docs_blob"]), n)
        tfs = codecs.varint_decode(bytes(row["tfs_blob"]), n)
        dls = codecs.varint_decode(bytes(row["dls_blob"]), n)
    else:
        gaps = dec(bytes(row["docs_blob"]), n)
        tfs = dec(bytes(row["tfs_blob"]), n)
        dls = dec(bytes(row["dls_blob"]), n)
    return codecs.delta_decode(gaps).astype(np.int64), tfs.astype(np.int64), dls.astype(np.int64)
