"""Index compaction — the ES force-merge analogue (segment merge behind the
reference's BulkAction.kt delete/index ops, which the sink delegates to ES).

A long-running stream accretes one ``postings/shard=epoch-<n>`` per
micro-batch plus per-epoch docmap/range_dls/term_stats partials; queries
stay EXACT over any number of units, but after 10⁴ epochs the index serves
from 10⁴ small files and pending delete tombstones pile up in ``_deletes/``
with stats frozen at build time. ``compact_index`` folds everything back to
one base unit:

* postings: one segment-row shuffle by (term, seg) → streaming merge in
  ``mapInPandas`` (decode each unit's blob, concatenate, drop tombstoned
  ids, re-encode ONE row per (term, seg)). Memory stays bounded: a
  (term, seg) group is ≤ 2^seg_bits postings by construction, same as the
  build. Bucket hashes are recomputed under the current scheme, so a
  mixed-scheme index (stats.n_term_buckets == None) comes out prunable
  again.
* docmap: union of epoch partitions minus tombstones → ``epoch=base``.
* range_dls: per-seg concatenation of unit rows → one row per seg. Dead
  ids KEEP their dl slots — the format-2 contiguity contract indexes dl
  arrays by dense id, and dead slots cost ~1 byte each until a full
  rebuild re-assigns ids.
* term_stats: recomputed from the merged segment rows → ``unit=base``.
* stats.json: n_docs/avgdl/total_tokens now reflect the LIVE corpus (the
  point where ES updates stats too: at merge, not at delete).
* manifest: the ``docmap`` entry is rewritten with live docs/tokens plus
  ``docs_allocated`` (= every id ever assigned, dead included) and the
  folded ``epoch-*`` entries are dropped — future ``append_epoch`` calls
  derive their doc-id base from ALLOCATED ids, so compaction can never
  cause an id collision with a dead slot.
* ``_deletes/`` is cleared (the tombstones are now physical).

Swap protocol: every relation is fully written to ``<name>.new`` first;
the swap itself is two renames per relation (``X``→``X.old``,
``X.new``→``X``). That window is NOT atomic for concurrent readers —
compaction requires quiescing Searchers, like a Lucene force-merge
requires a commit point. ``recover_swap_dirs`` (called by every Searcher
init) repairs a crash inside the window: a missing ``X`` with ``X.old``
present is restored, dangling ``*.new`` garbage is removed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_es_spark.functions import codecs
from kafka_es_spark.operators import spimi
from kafka_es_spark.operators.deletes import clear_tombstones, read_tombstone_ids
from kafka_es_spark.plans.manifest import Manifest

_SWAP_DIRS = ("postings", "docmap", "range_dls", "term_stats", "positions")

COMPACT_SEGMENT_SCHEMA = T.StructType(
    list(spimi.SEGMENT_SCHEMA.fields)
    + [T.StructField("bucket", T.LongType(), False)]
)


def recover_swap_dirs(index_dir: str) -> list[str]:
    """Repair a crash inside a compaction swap window: restore any relation
    whose canonical dir vanished mid-swap (``X.old`` still present) and
    drop half-written ``X.new`` leftovers. Idempotent; returns the actions
    taken (for logs/tests)."""
    actions = []
    for name in _SWAP_DIRS:
        cur = os.path.join(index_dir, name)
        old = cur + ".old"
        new = cur + ".new"
        if not os.path.exists(cur) and os.path.exists(old):
            os.rename(old, cur)
            actions.append(f"restored {name} from .old")
        if os.path.exists(new):
            shutil.rmtree(new, ignore_errors=True)
            actions.append(f"dropped incomplete {name}.new")
    return actions


def _swap_in(index_dir: str, name: str) -> None:
    cur = os.path.join(index_dir, name)
    if not os.path.exists(cur + ".new"):
        return  # optional relation not part of this compaction
    old = cur + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(cur):
        os.rename(cur, old)
    os.rename(cur + ".new", cur)
    shutil.rmtree(old, ignore_errors=True)


def compact_index(
    spark: SparkSession,
    index_dir: str,
    n_term_buckets: int | None = None,
) -> dict:
    """Merge all build/epoch units into one base unit, applying pending
    tombstones (see module docstring). Returns counters. Quiesce readers
    first; a crash mid-swap is repaired by ``recover_swap_dirs``."""
    from kafka_es_spark.operators.dedup import hash32_py
    from kafka_es_spark.plans.build_index import BUCKET_SCHEME, load_stats

    t0 = time.time()
    recover_swap_dirs(index_dir)
    stats = load_stats(index_dir)
    codec = stats.get("codec", "varint")
    seg_bits = int(stats.get("seg_bits", spimi.SEG_BITS))
    if n_term_buckets is None:
        n_term_buckets = int(stats.get("n_term_buckets") or 8)
    dead = read_tombstone_ids(spark, index_dir)
    dead_arr = (
        np.fromiter(dead, dtype=np.int64, count=len(dead))
        if dead
        else np.empty(0, dtype=np.int64)
    )

    # --- postings: one segment-row shuffle + streaming per-(term,seg) merge
    seg_cols = [f.name for f in spimi.SEGMENT_SCHEMA.fields]
    out_cols = [f.name for f in COMPACT_SEGMENT_SCHEMA.fields]
    enc = codecs.varint_encode if codec == "varint" else codecs.bp128_encode

    def merge_block(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy(dtype=object)
        segs_ = pdf["seg"].to_numpy(dtype=np.int64)
        change = np.flatnonzero((terms[1:] != terms[:-1]) | (segs_[1:] != segs_[:-1])) + 1
        gstarts = np.concatenate([[0], change])
        gends = np.concatenate([change, [len(pdf)]])
        recs = pdf.to_dict("records")
        rows = []
        for s, e in zip(gstarts, gends):
            ids_l, tfs_l = [], []
            for r in recs[s:e]:
                i, t = spimi.decode_segment(r, codec)
                ids_l.append(i)
                tfs_l.append(t)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l)
            order = np.argsort(ids, kind="stable")
            ids, tfs = ids[order], tfs[order]
            if dead_arr.size:
                keep = ~np.isin(ids, dead_arr)
                ids, tfs = ids[keep], tfs[keep]
            if ids.size == 0:
                continue  # the whole posting list was deleted
            term = terms[s]
            rows.append(
                (
                    term,
                    int(segs_[s]),
                    int(ids.size),
                    int(tfs.sum()),
                    int(ids[0]),
                    int(ids[-1]),
                    enc(codecs.delta_encode(ids.astype(np.uint64))),
                    enc(tfs.astype(np.uint64)),
                    int(hash32_py(term) % n_term_buckets),
                )
            )
        return pd.DataFrame(rows, columns=out_cols)

    def merge_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hold: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if hold is not None:
                pdf = pd.concat([hold, pdf], ignore_index=True)
                hold = None
            lt = pdf["term"].iat[len(pdf) - 1]
            ls = pdf["seg"].iat[len(pdf) - 1]
            tail = (pdf["term"].to_numpy(dtype=object) == lt) & (
                pdf["seg"].to_numpy(dtype=np.int64) == ls
            )
            cut = int(len(pdf) - np.flip(tail).argmin()) if not tail.all() else 0
            if cut == 0:
                hold = pdf
                continue
            hold = pdf.iloc[cut:].copy()
            out = merge_block(pdf.iloc[:cut])
            if len(out):
                yield out
        if hold is not None and len(hold):
            out = merge_block(hold)
            if len(out):
                yield out

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    segs = spark.read.parquet(os.path.join(index_dir, "postings")).select(*seg_cols)
    merged = (
        segs.repartition(n_part, "term", "seg")
        .sortWithinPartitions("term", "seg", "first_docid")
        .mapInPandas(merge_stream, COMPACT_SEGMENT_SCHEMA)
    )
    post_new = os.path.join(index_dir, "postings.new", "shard=base")
    (
        merged.repartition(n_term_buckets, "bucket")
        .sortWithinPartitions("term", "seg")
        .write.mode("overwrite")
        .parquet(post_new)
    )

    # --- positions (if the index has the optional positional relation):
    # same fold — per-(term, seg) decode, drop tombstoned docs WITH their
    # position slices, re-encode one row. Keeps phrase queries consistent
    # with the post-compaction postings (deletes are physical everywhere).
    pos_dir = os.path.join(index_dir, "positions")
    has_positions = os.path.isdir(pos_dir)
    if has_positions:
        from kafka_es_spark.operators import positions as posmod

        pos_cols = [f.name for f in posmod.POS_SEGMENT_SCHEMA.fields]

        def pos_merge_block(pdf: pd.DataFrame) -> pd.DataFrame:
            terms = pdf["term"].to_numpy(dtype=object)
            segs_ = pdf["seg"].to_numpy(dtype=np.int64)
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (segs_[1:] != segs_[:-1])
            ) + 1
            gstarts = np.concatenate([[0], change])
            gends = np.concatenate([change, [len(pdf)]])
            recs = pdf.to_dict("records")
            rows = []
            for s, e in zip(gstarts, gends):
                ids_l, tfs_l, pos_l = [], [], []
                for r in recs[s:e]:
                    i, t, p = posmod.decode_position_segment(r)
                    ids_l.append(i)
                    tfs_l.append(t)
                    pos_l.append(p)
                ids = np.concatenate(ids_l)
                tfs = np.concatenate(tfs_l)
                pos = np.concatenate(pos_l)
                starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
                order = np.argsort(ids, kind="stable")
                if dead_arr.size:
                    order = order[~np.isin(ids[order], dead_arr)]
                if order.size == 0:
                    continue
                ids_o = ids[order]
                tfs_o = tfs[order]
                pos_o = posmod._gather_slices(pos, starts, tfs, order)
                od = np.concatenate([[0], np.cumsum(tfs_o)[:-1]]).astype(np.int64)
                pd_out = pos_o.astype(np.uint64).copy()
                if pos_o.size > 1:
                    pd_out[1:] = (pos_o[1:] - pos_o[:-1]).astype(np.uint64)
                pd_out[od] = pos_o[od].astype(np.uint64)
                term = terms[s]
                rows.append(
                    (
                        term,
                        int(segs_[s]),
                        int(ids_o.size),
                        int(ids_o[0]),
                        int(ids_o[-1]),
                        codecs.varint_encode(codecs.delta_encode(ids_o.astype(np.uint64))),
                        codecs.varint_encode(tfs_o.astype(np.uint64)),
                        codecs.varint_encode(pd_out),
                        int(hash32_py(term) % n_term_buckets),
                    )
                )
            return pd.DataFrame(rows, columns=pos_cols)

        def pos_merge_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            hold: pd.DataFrame | None = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if hold is not None:
                    pdf = pd.concat([hold, pdf], ignore_index=True)
                    hold = None
                lt = pdf["term"].iat[len(pdf) - 1]
                ls = pdf["seg"].iat[len(pdf) - 1]
                tail = (pdf["term"].to_numpy(dtype=object) == lt) & (
                    pdf["seg"].to_numpy(dtype=np.int64) == ls
                )
                cut = int(len(pdf) - np.flip(tail).argmin()) if not tail.all() else 0
                if cut == 0:
                    hold = pdf
                    continue
                hold = pdf.iloc[cut:].copy()
                out = pos_merge_block(pdf.iloc[:cut])
                if len(out):
                    yield out
            if hold is not None and len(hold):
                out = pos_merge_block(hold)
                if len(out):
                    yield out

        pos_segs = spark.read.parquet(pos_dir).select(*pos_cols)
        (
            pos_segs
            .repartition(n_part, "term", "seg")
            .sortWithinPartitions("term", "seg", "first_docid")
            .mapInPandas(pos_merge_stream, posmod.POS_SEGMENT_SCHEMA)
            .repartition(n_term_buckets, "bucket")
            .sortWithinPartitions("term", "seg")
            .write.mode("overwrite")
            .parquet(os.path.join(index_dir, "positions.new", "shard=base"))
        )

    # --- docmap: drop tombstoned rows, fold epochs into epoch=base --------
    # stored fields (ES doc-values analogue) ride along — the recorded
    # store_fields list is the docmap schema contract
    dm = spark.read.parquet(os.path.join(index_dir, "docmap")).select(
        "doc_id", "url", "dl", *tuple(stats.get("store_fields") or ())
    )
    if dead:
        tdf = spark.createDataFrame(
            [(int(x),) for x in sorted(dead)], "doc_id long"
        )
        dm = dm.join(F.broadcast(tdf), "doc_id", "left_anti")
    dm.write.mode("overwrite").parquet(
        os.path.join(index_dir, "docmap.new", "epoch=base")
    )

    # --- range_dls: concatenate unit rows per seg (dead slots retained —
    # dense-id contiguity contract) ----------------------------------------
    rd = spark.read.parquet(os.path.join(index_dir, "range_dls")).select(
        "seg", "first_docid", "n", "dls_blob"
    )

    def fold_seg(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        base, arr = spimi.decode_range_dls(pdf.to_dict("records"))
        return pd.DataFrame(
            {
                "seg": [int(key[0])],
                "first_docid": [base],
                "n": [int(arr.size)],
                "dls_blob": [codecs.varint_encode(arr.astype(np.uint64))],
            }
        )

    rd.groupBy("seg").applyInPandas(fold_seg, spimi.RANGE_DLS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "range_dls.new", "epoch=base"))

    # --- term_stats from the merged segment rows --------------------------
    new_segs = spark.read.parquet(os.path.join(index_dir, "postings.new"))
    (
        new_segs.groupBy("term")
        .agg(F.sum("df_seg").alias("df"), F.sum("cf_seg").alias("cf"))
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "term_stats.new", "unit=base"))
    )

    # --- live-corpus stats + counters (from the .new data, pre-swap) ------
    live = spark.read.parquet(os.path.join(index_dir, "docmap.new")).agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    live_docs, live_tokens = int(live["n"]), int(live["s"] or 0)
    c = new_segs.agg(
        F.count("*").alias("segments"), F.sum("df_seg").alias("postings")
    ).collect()[0]

    man = Manifest(index_dir)
    units = [
        e for e in man.entries()
        if e["name"] == "docmap" or e["name"].startswith("epoch-")
    ]
    allocated = sum(
        int(e.get("docs_allocated", e.get("docs", 0))) for e in units
    )

    # --- swap (quiesced window; recover_swap_dirs repairs a crash here) ---
    for name in _SWAP_DIRS:
        _swap_in(index_dir, name)

    new_stats = dict(stats)
    new_stats.update(
        {
            "n_docs": live_docs,
            "avgdl": (live_tokens / live_docs) if live_docs else 0.0,
            "total_tokens": live_tokens,
            "n_term_buckets": n_term_buckets,
            "bucket_scheme": BUCKET_SCHEME,
        }
    )
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(new_stats, f)

    # manifest: ONE atomic commit absorbs the folded epochs into the base
    # entry — docs/tokens are the LIVE corpus (stats), docs_allocated is
    # every id ever assigned (dead included: the next epoch's id base), and
    # folded_epochs names the absorbed units so (a) a crash before the
    # cleanup below can never double-count them into the base and (b) a
    # replay of a folded epoch stays a no-op even after its entry file is
    # gone (append_epoch consults this list).
    folded = sorted(
        e["name"] for e in units if e["name"].startswith("epoch-")
    ) + [f for e in units for f in e.get("folded_epochs", [])]
    counters = {
        "docs": live_docs,
        "tokens": live_tokens,
        "docs_allocated": allocated,
        "segments": int(c["segments"] or 0),
        "postings": int(c["postings"] or 0),
        "tombstones_applied": len(dead),
        "elapsed_sec": time.time() - t0,
    }
    man.commit("docmap", {**counters, "folded_epochs": sorted(set(folded))})
    for e in units:  # cosmetic cleanup; folded_epochs already excludes them
        if e["name"].startswith("epoch-"):
            os.remove(os.path.join(index_dir, "_manifest", f'{e["name"]}.json'))
    man.commit(f"compact-{int(t0)}", {"elapsed_sec": time.time() - t0})
    clear_tombstones(index_dir)
    return counters


def should_compact(
    spark: SparkSession,
    index_dir: str,
    max_units: int = 64,
    max_tombstones: int = 1_000_000,
) -> bool:
    """The merge-policy trigger — the decision ES's TieredMergePolicy makes
    continuously, exposed as one cheap predicate: compact when the index
    serves from ≥ ``max_units`` epoch units (per-query metadata and
    cursor-init concatenation cost grow with unit count) or carries ≥
    ``max_tombstones`` pending deletes (excluded-id set size; stats drift
    from the live corpus). Reads only the manifest entry list and the tiny
    ``_deletes/`` relation — safe to call once per micro-batch."""
    man = Manifest(index_dir)
    units = sum(
        1 for e in man.entries() if e["name"].startswith("epoch-")
    )
    if units >= int(max_units):
        return True
    return len(read_tombstone_ids(spark, index_dir)) >= int(max_tombstones)
