"""Positional index + phrase queries (ES match_phrase analogue).

The reference delegates phrase search to ES, whose postings carry term
positions (Lucene index_options=positions). Here positions live in a
SEPARATE optional relation ``positions/`` beside ``postings/`` — phrase
queries are rarer than term queries, and keeping positions out of the main
segment format keeps the hot posting shuffle at format-2 size; the
positional build is its own job over the same extracted/doc-id'd corpus
(ids are deterministic, so the relations agree).

Row format (one row per (term, doc-range), same doc-range salt as X4/X5):

    term, seg, df_seg, first_docid, last_docid,
    docs_blob  — delta-gap varint doc ids (as postings)
    tfs_blob   — varint per-doc occurrence counts
    pos_blob   — varint per-doc DELTA-encoded token positions,
                 concatenated in doc order (sum(tf) values)
    bucket     — term-hash bucket (same md5 scheme as postings pruning)

Build is the SPIMI two-stage shape: narrow map-side packing of runs
(one vectorized pass per flush: sort occurrences by (term, doc), cut on
(term, doc-range), delta-encode ids and positions, segmented varint
encode), then ONE shuffle by (term, seg) and a streaming merge. The
position payload makes this exchange carry ~one value per token
occurrence — inherently ~(tokens/postings)× the format-2 posting shuffle,
which is exactly why it is opt-in (Lucene pays the same ratio for
index_options=positions).

Phrase scoring follows Lucene's PhraseQuery shape: weight = Σ slot
idf(term) (member-term document frequencies — no global phrase-df pass
needed), tf = number of EXACT phrase occurrences in the doc (slop=0),
folded through the standard BM25 tf saturation against the doc length.
Per doc range the scorer chains position-set intersections: occurrences
become int64 keys ``doc_id·2^POS_BITS + pos`` (sorted by construction),
and the phrase positions are ``K₁ ∩ (K₀+1)`` chained across slots — one
vectorized np.intersect1d per slot, cost ~ the rarest slot's postings.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_es_spark.functions import codecs
from kafka_es_spark.operators import spimi
from kafka_es_spark.operators.bm25 import B, K1

POS_BITS = 21  # doc length < 2^21 tokens — validated at encode time

POS_RUN_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("seg", T.LongType(), False),
        T.StructField("first_docid", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("ids_blob", T.BinaryType(), False),
        T.StructField("tfs_blob", T.BinaryType(), False),
        T.StructField("pos_blob", T.BinaryType(), False),
    ]
)

POS_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("seg", T.LongType(), False),
        T.StructField("df_seg", T.LongType(), False),
        T.StructField("first_docid", T.LongType(), False),
        T.StructField("last_docid", T.LongType(), False),
        T.StructField("docs_blob", T.BinaryType(), False),
        T.StructField("tfs_blob", T.BinaryType(), False),
        T.StructField("pos_blob", T.BinaryType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def _rebase_cumsum(deltas: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Absolute values from per-run deltas whose first element is absolute:
    cumsum with rebasing at each run start (the spimi merge trick)."""
    gcum = np.cumsum(deltas)
    base = gcum[starts] - deltas[starts]
    return gcum - np.repeat(base, lengths)


def _gather_slices(
    values: np.ndarray, starts: np.ndarray, lengths: np.ndarray, perm: np.ndarray
) -> np.ndarray:
    """Concatenate values[starts[p] : starts[p]+lengths[p]] for p in perm,
    fully vectorized (no per-slice Python)."""
    lp = lengths[perm]
    total = int(lp.sum())
    if total == 0:
        return values[:0]
    out_starts = np.concatenate([[0], np.cumsum(lp)[:-1]])
    idx = np.repeat(starts[perm] - out_starts, lp) + np.arange(total, dtype=np.int64)
    return values[idx]


def build_position_runs(
    docs: DataFrame,
    seg_bits: int = spimi.SEG_BITS,
    pack_docs: int = 50_000,
    terms_col: str = "terms",
) -> DataFrame:
    """Narrow stage: per-flush packed position runs (see module doc)."""

    def pack_flush(frames: list[pd.DataFrame]) -> pd.DataFrame | None:
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        toks = pdf[terms_col]
        lens = toks.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return None
        if int(lens.max()) >= (1 << POS_BITS):
            raise ValueError(
                f"document of {int(lens.max())} tokens exceeds the "
                f"2^{POS_BITS} position key space"
            )
        term_flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)]
        )
        id_flat = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
        pos_flat = np.concatenate(
            [np.arange(n, dtype=np.int64) for n in lens if n]
        )
        # factorize + stable int lexsort replaces the string-keyed
        # sort_values (r6, same rewrite as spimi.pack_flush — ~3× faster);
        # lexsort is stable, so positions stay ascending within each doc
        codes, uniq = pd.factorize(pd.Series(term_flat), sort=True)
        order = np.lexsort((id_flat, codes))
        tcode = codes[order]
        ids = id_flat[order]
        pos = pos_flat[order]
        terms = np.asarray(uniq, dtype=object)[tcode]

        docchg = np.flatnonzero((tcode[1:] != tcode[:-1]) | (ids[1:] != ids[:-1])) + 1
        dstarts = np.concatenate([[0], docchg])  # occurrence index of each doc start
        tf = np.diff(np.concatenate([dstarts, [ids.size]]))

        # positions: delta within doc, absolute at each doc start
        posd = pos.astype(np.uint64).copy()
        posd[1:] = (pos[1:] - pos[:-1]).astype(np.uint64)
        posd[dstarts] = pos[dstarts].astype(np.uint64)

        dterm = terms[dstarts]
        dids = ids[dstarts]
        dseg = dids >> seg_bits
        runchg = np.flatnonzero((dterm[1:] != dterm[:-1]) | (dseg[1:] != dseg[:-1])) + 1
        rstarts = np.concatenate([[0], runchg])  # in doc-index space
        run_docs = np.diff(np.concatenate([rstarts, [dids.size]]))
        occ_starts = dstarts[rstarts]
        run_occ = np.diff(np.concatenate([occ_starts, [ids.size]]))

        gaps = dids.astype(np.uint64).copy()
        gaps[1:] -= dids[:-1].astype(np.uint64)
        gaps[rstarts] = dids[rstarts]  # absolute first id per run
        return pd.DataFrame(
            {
                "term": dterm[rstarts],
                "seg": dseg[rstarts],
                "first_docid": dids[rstarts],
                "n": run_docs,
                "ids_blob": codecs.varint_encode_segmented(gaps, run_docs),
                "tfs_blob": codecs.varint_encode_segmented(
                    tf.astype(np.uint64), run_docs
                ),
                "pos_blob": codecs.varint_encode_segmented(posd, run_occ),
            }
        )[[f.name for f in POS_RUN_SCHEMA.fields]]

    def pack(batches):
        buf: list[pd.DataFrame] = []
        ndocs = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            buf.append(pdf)
            ndocs += len(pdf)
            if ndocs >= pack_docs:
                out = pack_flush(buf)
                buf, ndocs = [], 0
                if out is not None and len(out):
                    yield out
        if buf:
            out = pack_flush(buf)
            if out is not None and len(out):
                yield out

    return docs.select("doc_id", terms_col).mapInPandas(pack, POS_RUN_SCHEMA)


def merge_position_runs(runs: DataFrame, n_term_buckets: int = 8) -> DataFrame:
    """The one position-sized shuffle + streaming per-(term, seg) merge."""
    from kafka_es_spark.operators.dedup import hash32_py

    out_cols = [f.name for f in POS_SEGMENT_SCHEMA.fields]

    def merge_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n_per = pdf["n"].to_numpy(dtype=np.int64)
        total_docs = int(n_per.sum())
        gaps = codecs.varint_decode(b"".join(pdf["ids_blob"]), total_docs)
        tfs_all = codecs.varint_decode(b"".join(pdf["tfs_blob"]), total_docs).astype(np.int64)
        total_occ = int(tfs_all.sum())
        posd = codecs.varint_decode(b"".join(pdf["pos_blob"]), total_occ)
        rs = np.concatenate([[0], np.cumsum(n_per)])  # doc-index run bounds
        ids_all = _rebase_cumsum(
            gaps, rs[:-1].astype(np.int64), n_per
        ).astype(np.int64)
        # absolute positions: rebase the delta stream at every DOC start
        occ_doc_starts = np.concatenate([[0], np.cumsum(tfs_all)[:-1]]).astype(np.int64)
        pos_abs = _rebase_cumsum(posd, occ_doc_starts, tfs_all).astype(np.int64)

        terms = pdf["term"].to_numpy(dtype=object)
        segs_ = pdf["seg"].to_numpy(dtype=np.int64)
        gchange = np.flatnonzero((terms[1:] != terms[:-1]) | (segs_[1:] != segs_[:-1])) + 1
        gstarts = np.concatenate([[0], gchange])
        # vectorized across ALL (term, seg) groups (r6, same rewrite as
        # spimi.merge_block): label every doc entry with its group, ONE
        # lexsort by (group, doc_id), one global position gather, per-doc
        # re-delta and segmented varint encodes — no per-group Python
        # loop. Byte-identical output (LEB128 is per-value).
        n_runs = len(pdf)
        glabel_run = np.zeros(n_runs, dtype=np.int64)
        glabel_run[gchange] = 1
        glabel_run = np.cumsum(glabel_run)
        lab = np.repeat(glabel_run, n_per)  # per doc entry
        order = np.lexsort((ids_all, lab))
        ids_o = ids_all[order]
        tfs_o = tfs_all[order]
        # one global gather of every doc's position slice in sorted order
        pos_o = _gather_slices(pos_abs, occ_doc_starts, tfs_all, order)
        # per-doc re-delta (absolute at every doc start — global list of
        # doc starts equals the within-group lists concatenated)
        od_starts = np.concatenate([[0], np.cumsum(tfs_o)[:-1]]).astype(np.int64)
        pd_out = pos_o.astype(np.uint64).copy()
        if pos_o.size > 1:
            pd_out[1:] = (pos_o[1:] - pos_o[:-1]).astype(np.uint64)
        pd_out[od_starts] = pos_o[od_starts].astype(np.uint64)
        gs = rs[:-1][gstarts]  # doc-entry-space group starts
        glens = np.diff(np.concatenate([gs, [ids_o.size]]))
        gocc = np.add.reduceat(tfs_o, gs)  # occurrences per group
        gaps_out = ids_o.astype(np.uint64).copy()
        gaps_out[1:] -= ids_o[:-1].astype(np.uint64)
        gaps_out[gs] = ids_o[gs].astype(np.uint64)
        gterms = terms[gstarts]
        bcache: dict = {}
        buckets = np.fromiter(
            (
                bcache.setdefault(t, hash32_py(t) % n_term_buckets)
                for t in gterms
            ),
            dtype=np.int64, count=gterms.size,
        )
        return pd.DataFrame(
            {
                "term": gterms,
                "seg": segs_[gstarts],
                "df_seg": glens,
                "first_docid": ids_o[gs],
                "last_docid": ids_o[np.concatenate([gs[1:], [ids_o.size]]) - 1],
                "docs_blob": codecs.varint_encode_segmented(gaps_out, glens),
                "tfs_blob": codecs.varint_encode_segmented(
                    tfs_o.astype(np.uint64), glens
                ),
                "pos_blob": codecs.varint_encode_segmented(pd_out, gocc),
                "bucket": buckets,
            }
        )[out_cols]

    def merge_stream(batches):
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
            yield merge_block(hold)

    n_part = int(runs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    part = runs.repartition(n_part, "term", "seg").sortWithinPartitions(
        "term", "seg", "first_docid"
    )
    return part.mapInPandas(merge_stream, POS_SEGMENT_SCHEMA)


def build_position_index(spark: SparkSession, pages: DataFrame, index_dir: str) -> dict:
    """Add the ``positions/`` relation to an EXISTING index dataset: same
    deterministic doc ids (extract + assign over the same corpus), same
    seg/bucket scheme as stats.json records. Manifest-committed
    (``positions`` stage) — rebuild-safe and resumable like every other
    stage. Streaming epochs append their own positional unit via
    ``append_epoch(..., with_positions=True)`` (``append_epoch_positions``
    below); an index mixing positioned and position-less units serves
    phrase queries over the positioned units only."""
    import time

    from kafka_es_spark.plans.build_index import load_stats, prepare_docs
    from kafka_es_spark.plans.manifest import Manifest

    st = load_stats(index_dir)
    seg_bits = int(st.get("seg_bits", spimi.SEG_BITS))
    n_term_buckets = int(st.get("n_term_buckets") or 8)
    man = Manifest(index_dir)
    t0 = time.time()
    docs = prepare_docs(pages)
    runs = build_position_runs(docs, seg_bits=seg_bits)
    segs = merge_position_runs(runs, n_term_buckets=n_term_buckets)
    from pyspark.sql import Observation

    obs = Observation()
    (
        segs.repartition(n_term_buckets, "bucket")
        .sortWithinPartitions("term", "seg")
        .observe(
            obs,
            F.count(F.lit(1)).alias("segments"),
            F.sum("df_seg").alias("postings"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "positions", "shard=base"))
    )
    c = obs.get
    counters = {
        "segments": int(c["segments"] or 0),
        "postings": int(c["postings"] or 0),
        "elapsed_sec": time.time() - t0,
    }
    man.commit("positions", counters)
    return counters


def append_epoch_positions(
    docs: DataFrame,
    index_dir: str,
    epoch_name: str,
    seg_bits: int,
    n_term_buckets: int,
) -> None:
    """Write one streaming epoch's positional unit under
    ``positions/shard=<epoch>`` (docs: the epoch's (doc_id, terms) with
    FINAL dense ids — called by append_epoch before its manifest commit,
    so the C1 contract covers positions too: a replayed epoch overwrites
    its own positional files)."""
    runs = build_position_runs(docs, seg_bits=seg_bits)
    segs = merge_position_runs(runs, n_term_buckets=n_term_buckets)
    (
        segs.repartition(n_term_buckets, "bucket")
        .sortWithinPartitions("term", "seg")
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "positions", f"shard={epoch_name}"))
    )


def decode_position_segment(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row → (doc_ids, tfs, absolute positions concatenated per doc)."""
    n = int(row["df_seg"])
    ids = codecs.delta_decode(
        codecs.varint_decode(bytes(row["docs_blob"]), n)
    ).astype(np.int64)
    tfs = codecs.varint_decode(bytes(row["tfs_blob"]), n).astype(np.int64)
    total = int(tfs.sum())
    posd = codecs.varint_decode(bytes(row["pos_blob"]), total)
    starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    pos = _rebase_cumsum(posd, starts, tfs).astype(np.int64)
    return ids, tfs, pos


def _slot_keys(rows: list[dict]) -> np.ndarray:
    """One phrase slot's occurrences within a doc range as sorted int64
    keys doc_id·2^POS_BITS + pos (rows = the slot term's position-segment
    rows, possibly several units, concatenated in doc order)."""
    rows = sorted(rows, key=lambda r: r["first_docid"])
    parts = []
    for r in rows:
        ids, tfs, pos = decode_position_segment(r)
        parts.append((np.repeat(ids, tfs) << POS_BITS) + pos)
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def _chain_slots(
    slot_keys: list[np.ndarray], slop: int
) -> np.ndarray:
    """Ordered sloppy-phrase chain (ES span_near with in_order=true):
    slot i+1 must follow slot i at gap 0..slop, with the gap budget shared
    CUMULATIVELY across the whole chain. Returns the distinct end-position
    keys of qualifying matches.

    DP over remaining budget: state[g] = end keys of prefix matches that
    have spent exactly g of the budget. Each extension shifts by
    (1 + extra) and intersects with the next slot's keys — O(slop²)
    vectorized intersections, fine for the small slops queries use (ES
    slop defaults to 0; >4 is rare). A shifted key that crosses a doc
    boundary (pos near 2^POS_BITS) is masked out before intersecting, so
    wraparound can never fabricate a match in the next doc."""
    state: dict[int, np.ndarray] = {0: slot_keys[0]}
    for ks in slot_keys[1:]:
        nxt: dict[int, np.ndarray] = {}
        for g_new in range(slop + 1):
            parts = []
            for g_old, keys in state.items():
                extra = g_new - g_old
                if extra < 0 or keys.size == 0:
                    continue
                shifted = keys + (1 + extra)
                ok = (shifted >> POS_BITS) == (keys >> POS_BITS)
                hit = np.intersect1d(shifted[ok], ks, assume_unique=True)
                if hit.size:
                    parts.append(hit)
            if parts:
                nxt[g_new] = (
                    parts[0] if len(parts) == 1
                    else np.unique(np.concatenate(parts))
                )
        state = nxt
        if not state:
            return np.empty(0, dtype=np.int64)
    allk = np.concatenate(list(state.values()))
    return np.unique(allk)


def _phrase_topk_slots(
    spark: SparkSession,
    index_dir: str,
    slot_terms: list[list[str]],
    k: int,
    slop: int,
    round_to: int | None,
    with_url: bool,
    fetch_k: int | None,
) -> DataFrame:
    """Shared phrase engine: each slot is a list of admissible terms (one
    for plain phrases; the expansion set for the match_phrase_prefix last
    slot — Lucene MultiPhraseQuery). Weight = Σ idf over every slot term
    (MultiPhraseQuery's Σ-idf), tf = distinct qualifying end positions,
    BM25 saturation vs doc length. Distributed like wand: per-doc-range
    scoring (cogrouped with range dls), global TakeOrdered is exact."""
    from kafka_es_spark.operators.compaction import recover_swap_dirs
    from kafka_es_spark.operators.deletes import read_tombstone_ids
    from kafka_es_spark.operators.wand import TOPK_SCHEMA, idf
    from kafka_es_spark.plans.build_index import BUCKET_SCHEME, load_stats

    k = max(k, fetch_k or 0)
    recover_swap_dirs(index_dir)
    # pending delete tombstones apply to phrase results exactly as to
    # term queries (the format-enforced X9 contract)
    excluded = read_tombstone_ids(spark, index_dir) or None
    st = load_stats(index_dir)
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    if not slot_terms or any(not s for s in slot_terms) or n_docs == 0 or avgdl == 0:
        return spark.createDataFrame([], TOPK_SCHEMA)
    uniq = sorted({t for s in slot_terms for t in s})
    ts = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    dfs = {r["term"]: int(r["df"]) for r in ts}
    # a single-term slot whose term is absent anywhere ⇒ no match is
    # possible; a multi-term slot only needs one alternative present
    slot_terms = [[t for t in s if t in dfs] for s in slot_terms]
    if any(not s for s in slot_terms):
        return spark.createDataFrame([], TOPK_SCHEMA)
    w_total = float(sum(idf(n_docs, dfs[t]) for s in slot_terms for t in s))

    pos_dir = os.path.join(index_dir, "positions")
    if not os.path.isdir(pos_dir):
        raise ValueError(
            f"index at {index_dir} has no positions/ relation — phrase "
            "queries need the positional index; run "
            "positions.build_position_index (batch) or append epochs with "
            "with_positions=True (streaming)"
        )
    live = sorted({t for s in slot_terms for t in s})
    rel = spark.read.parquet(pos_dir)
    rel = rel.filter(F.col("term").isin(live))
    if st.get("bucket_scheme") == BUCKET_SCHEME and st.get("n_term_buckets"):
        from kafka_es_spark.operators.dedup import hash32_py

        bs = sorted({hash32_py(t) % int(st["n_term_buckets"]) for t in live})
        rel = rel.filter(F.col("bucket").isin(bs))
    dls_rel = spark.read.parquet(os.path.join(index_dir, "range_dls"))
    k1, b = K1, B

    def score_range(key: tuple, pdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64)}
        )
        if len(pdf) == 0:
            return empty
        if len(dpdf) == 0:
            raise ValueError(f"seg {key} has positions but no range-dl rows")
        by_term: dict[str, list[dict]] = {}
        for r in pdf.to_dict("records"):
            by_term.setdefault(r["term"], []).append(r)
        if any(all(t not in by_term for t in s) for s in slot_terms):
            return empty  # some slot has no occurrences in this range
        keys = {t: _slot_keys(by_term[t]) for t in set(by_term) & set(live)}

        def slot_union(s: list[str]) -> np.ndarray:
            parts = [keys[t] for t in s if t in keys]
            if len(parts) == 1:
                return parts[0]
            # a position holds exactly one term, so the union is dup-free
            # but needs a sort for the intersections downstream
            return np.sort(np.concatenate(parts))

        cur = _chain_slots([slot_union(s) for s in slot_terms], slop)
        if cur.size == 0:
            return empty
        docs = cur >> POS_BITS
        uids, tfp = np.unique(docs, return_counts=True)
        if excluded is not None:
            dead = np.fromiter(excluded, dtype=np.int64, count=len(excluded))
            keep = ~np.isin(uids, dead)
            uids, tfp = uids[keep], tfp[keep]
            if uids.size == 0:
                return empty
        dl_base, dl_arr = spimi.decode_range_dls(dpdf.to_dict("records"))
        dls = dl_arr[uids - dl_base].astype(np.float64)
        tf = tfp.astype(np.float64)
        score = w_total * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls / avgdl))
        sel = np.lexsort((uids, -score))[:k]
        return pd.DataFrame({"doc_id": uids[sel], "score": score[sel]})

    ranged = (
        rel.groupBy("seg")
        .cogroup(dls_rel.groupBy("seg"))
        .applyInPandas(score_range, TOPK_SCHEMA)
    )
    out = ranged.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    if with_url:
        dm = spark.read.parquet(os.path.join(index_dir, "docmap")).select(
            "doc_id", "url"
        )
        out = out.join(dm, "doc_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
    return out


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    slop: int = 0,
    round_to: int | None = 4,
    with_url: bool = False,
    fetch_k: int | None = None,
) -> DataFrame:
    """Phrase top-k over the positional relation. slop=0 is the exact-
    adjacency ES match_phrase; slop>0 is the ordered sloppy phrase (ES
    span_near with in_order=true): slots must appear in order with at most
    ``slop`` extra token gaps shared across the chain, tf = distinct
    qualifying end positions. Weight = Σ slot idf (Lucene PhraseQuery
    shape — slop-independent, as in Lucene)."""
    from kafka_es_spark.functions.tokenize import tokenize_py

    slots = tokenize_py(phrase)
    return _phrase_topk_slots(
        spark, index_dir, [[t] for t in slots], k, int(slop), round_to,
        with_url, fetch_k,
    )


def phrase_match_ids(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    slop: int = 0,
) -> DataFrame:
    """Distinct doc ids whose text contains ``phrase`` (ordered slots, at
    most ``slop`` shared gaps) — the filter-context phrase primitive that
    query_string's quoted clauses compose on (must = left-semi join,
    ``-"..."`` = left-anti join). Same slot-chain kernel as phrase_topk
    minus scoring: positions relation only, pruned to the phrase terms'
    buckets, per-doc-range chain, no range_dls read. Doc ranges are
    disjoint, so per-range unique ids are globally unique — no distinct
    shuffle needed. Pending tombstones excluded (X9 contract)."""
    from kafka_es_spark.functions.tokenize import tokenize_py
    from kafka_es_spark.operators.compaction import recover_swap_dirs
    from kafka_es_spark.operators.deletes import read_tombstone_ids
    from kafka_es_spark.plans.build_index import BUCKET_SCHEME, load_stats

    slots = tokenize_py(phrase)
    if not slots:
        return spark.createDataFrame([], "doc_id long")
    recover_swap_dirs(index_dir)
    excluded = read_tombstone_ids(spark, index_dir) or None
    st = load_stats(index_dir)
    pos_dir = os.path.join(index_dir, "positions")
    if not os.path.isdir(pos_dir):
        raise ValueError(
            f"index at {index_dir} has no positions/ relation — phrase "
            "clauses need the positional index; run "
            "positions.build_position_index (batch) or append epochs with "
            "with_positions=True (streaming)"
        )
    uniq = list(dict.fromkeys(slots))
    rel = spark.read.parquet(pos_dir).filter(F.col("term").isin(uniq))
    if st.get("bucket_scheme") == BUCKET_SCHEME and st.get("n_term_buckets"):
        from kafka_es_spark.operators.dedup import hash32_py

        bs = sorted({hash32_py(t) % int(st["n_term_buckets"]) for t in uniq})
        rel = rel.filter(F.col("bucket").isin(bs))
    slop_i = int(slop)

    def match_range(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
        if len(pdf) == 0:
            return empty
        by_term: dict[str, list[dict]] = {}
        for r in pdf.to_dict("records"):
            by_term.setdefault(r["term"], []).append(r)
        if any(t not in by_term for t in uniq):
            return empty
        keys = {t: _slot_keys(by_term[t]) for t in uniq}
        cur = _chain_slots([keys[t] for t in slots], slop_i)
        if cur.size == 0:
            return empty
        uids = np.unique(cur >> POS_BITS)
        if excluded is not None:
            dead = np.fromiter(excluded, dtype=np.int64, count=len(excluded))
            uids = uids[~np.isin(uids, dead)]
        return pd.DataFrame({"doc_id": uids})

    return rel.groupBy("seg").applyInPandas(
        lambda _key, pdf: match_range(pdf), "doc_id long"
    )


def phrase_prefix_topk(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    max_expansions: int = 50,
    round_to: int | None = 4,
    with_url: bool = False,
    fetch_k: int | None = None,
) -> DataFrame:
    """ES match_phrase_prefix analogue: the LAST token of ``phrase`` is a
    prefix, expanded against the term dictionary to the first
    ``max_expansions`` terms in alphabetic order (the ES expansion rule),
    and the phrase must match with any expansion term in the last slot
    (Lucene MultiPhraseQuery). Weight = Σ idf over the fixed slots plus
    every expansion term (MultiPhraseQuery's Σ-idf), so scoring stays
    deterministic and oracle-checkable."""
    from kafka_es_spark.functions.tokenize import tokenize_py

    slots = tokenize_py(phrase)
    if not slots:
        from kafka_es_spark.operators.wand import TOPK_SCHEMA

        return spark.createDataFrame([], TOPK_SCHEMA)
    prefix = slots[-1]
    rows = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("term").startswith(prefix))
        .select("term")
        .distinct()
        .orderBy("term")
        .limit(int(max_expansions))
        .collect()
    )
    expansion = [r["term"] for r in rows]
    if not expansion:
        from kafka_es_spark.operators.wand import TOPK_SCHEMA

        return spark.createDataFrame([], TOPK_SCHEMA)
    slot_terms = [[t] for t in slots[:-1]] + [expansion]
    return _phrase_topk_slots(
        spark, index_dir, slot_terms, k, 0, round_to, with_url, fetch_k,
    )


def _window_anchor_topk(
    spark: SparkSession,
    index_dir: str,
    anchor: str,
    probe: str,
    offsets: list[int],
    require: bool,
    idf_terms: list[str],
    k: int,
    round_to: int | None,
    with_url: bool,
    op_name: str,
) -> DataFrame:
    """Shared engine for window-conditioned single-term matching: keep an
    ``anchor``-term occurrence at position p iff a ``probe``-term
    occurrence exists (``require=True``, intervals) / does not exist
    (``require=False``, span_not) at any p+d for d in ``offsets``. tf =
    surviving anchor occurrences; weight = Σ idf over ``idf_terms``
    (index-level dfs — Lucene SpanWeight/IntervalQuery scoring); BM25
    saturation vs doc length.

    Plan: position segments of exactly two terms (term + bucket pruned
    scan), grouped per doc range; inside a range the window test is
    |offsets| vectorized sorted-array memberships over
    (doc<<POS_BITS)+pos keys — shifted keys that cross a doc boundary
    are masked, so a probe hit at the end of one doc can never affect
    the start of the next. One TakeOrdered; tombstones drop as
    everywhere."""
    import math

    from kafka_es_spark.operators.compaction import recover_swap_dirs
    from kafka_es_spark.operators.deletes import read_tombstone_ids
    from kafka_es_spark.plans.build_index import BUCKET_SCHEME, load_stats

    t, x = anchor, probe
    recover_swap_dirs(index_dir)
    excluded = read_tombstone_ids(spark, index_dir) or None
    st = load_stats(index_dir)
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    empty = (
        "doc_id long, url string, score double" if with_url
        else "doc_id long, score double"
    )
    dfs = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("term").isin(sorted(set(idf_terms) | {t})))
        .groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    if t not in dfs or n_docs == 0 or avgdl == 0 or (
        require and x not in dfs
    ):
        return spark.createDataFrame([], empty)
    w = sum(
        math.log(1 + (n_docs - dfs[q] + 0.5) / (dfs[q] + 0.5))
        for q in idf_terms if q in dfs
    )
    pos_dir = os.path.join(index_dir, "positions")
    if not os.path.isdir(pos_dir):
        raise ValueError(
            f"index at {index_dir} has no positions/ relation — "
            f"{op_name} needs the positional index"
        )
    rel = spark.read.parquet(pos_dir).filter(F.col("term").isin([t, x]))
    if st.get("bucket_scheme") == BUCKET_SCHEME and st.get("n_term_buckets"):
        from kafka_es_spark.operators.dedup import hash32_py

        nb = int(st["n_term_buckets"])
        rel = rel.filter(
            F.col("bucket").isin(
                sorted({hash32_py(t) % nb, hash32_py(x) % nb})
            )
        )
    offs = list(offsets)

    def count_surviving(pdf: pd.DataFrame) -> pd.DataFrame:
        empty_p = pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "tf": pd.Series(dtype=np.int64)}
        )
        recs = pdf.to_dict("records")
        anc = _slot_keys([r for r in recs if r["term"] == t])
        if anc.size == 0:
            return empty_p
        prb = _slot_keys([r for r in recs if r["term"] == x])
        hit = np.zeros(anc.size, dtype=bool)
        if prb.size:
            # probe∈{p+d : d ∈ offsets} — one membership test per offset,
            # doc-boundary-masked
            for d in offs:
                shifted = anc + d
                same_doc = (shifted >> POS_BITS) == (anc >> POS_BITS)
                hit |= same_doc & np.isin(shifted, prb, assume_unique=True)
        keep = hit if require else ~hit
        if not keep.any():
            return empty_p
        uids, cnt = np.unique(anc[keep] >> POS_BITS, return_counts=True)
        return pd.DataFrame(
            {"doc_id": uids, "tf": cnt.astype(np.int64)}
        )

    tf_rel = rel.groupBy("seg").applyInPandas(
        lambda _k, pdf: count_surviving(pdf), "doc_id long, tf long"
    )
    dm = spark.read.parquet(os.path.join(index_dir, "docmap"))
    out = tf_rel.join(dm.select("doc_id", "url", "dl"), "doc_id")
    if excluded is not None:
        out = out.filter(~F.col("doc_id").isin(sorted(excluded)))
    score = (
        F.lit(w) * F.col("tf") * F.lit(K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
        )
    )
    if round_to is not None:
        score = F.round(score, round_to)
    cols = ["doc_id", "url"] if with_url else ["doc_id"]
    return (
        out.select(*cols, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )


def span_not_topk(
    spark: SparkSession,
    index_dir: str,
    include: str,
    exclude: str,
    pre: int = 0,
    post: int = 0,
    k: int = 10,
    round_to: int | None = 4,
    with_url: bool = False,
) -> DataFrame:
    """ES span_not query: occurrences of ``include`` that are NOT within
    ``pre`` tokens after / ``post`` tokens before an occurrence of
    ``exclude`` — i.e. an include match at position p is removed when an
    exclude match sits anywhere in [p - pre, p + post] (pre=post=0 kills
    only exact overlap, impossible for distinct single terms, so callers
    use a window; Lucene SpanNotQuery(pre, post)). Scored as the include
    term's BM25 with tf = surviving occurrences and the term's INDEX-level
    df for idf (Lucene SpanWeight semantics, like span_first above).
    Window engine + plan: ``_window_anchor_topk``."""
    from kafka_es_spark.functions.tokenize import tokenize_py

    ti, tx = tokenize_py(include), tokenize_py(exclude)
    if len(ti) != 1 or len(tx) != 1 or ti == tx:
        raise ValueError(
            "span_not takes two distinct single analyzed terms "
            f"(got include={ti}, exclude={tx})"
        )
    pre_i, post_i = int(pre), int(post)
    if pre_i < 0 or post_i < 0:
        raise ValueError("span_not pre/post must be >= 0")
    return _window_anchor_topk(
        spark, index_dir, ti[0], tx[0],
        offsets=list(range(-pre_i, post_i + 1)), require=False,
        idf_terms=[ti[0]], k=k, round_to=round_to, with_url=with_url,
        op_name="span_not",
    )


def intervals_unordered_topk(
    spark: SparkSession,
    index_dir: str,
    anchor: str,
    other: str,
    max_gaps: int = 0,
    k: int = 10,
    round_to: int | None = 4,
    with_url: bool = False,
) -> DataFrame:
    """ES intervals query, ``all_of {ordered: false, max_gaps}`` over two
    terms: a match is an ``anchor`` occurrence with an ``other``
    occurrence within ``max_gaps`` intervening tokens on EITHER side
    (|p_a − p_o| − 1 <= max_gaps). The unordered half of the proximity
    family — ordered span_near/sloppy-phrase is ``phrase_topk(slop=…)``.

    Counting anchors (not pairs) mirrors Lucene's minimal-interval
    semantics closely enough to state exactly: tf = anchor occurrences
    with a qualifying partner — each minimal interval contains at least
    one, and the anchored form is what a SQL oracle can replay (an
    all-pairs count would double-count overlapping intervals). Weight =
    Σ idf of BOTH terms (IntervalQuery scores like a conjunction).
    Window engine + plan: ``_window_anchor_topk``."""
    from kafka_es_spark.functions.tokenize import tokenize_py

    ta, to = tokenize_py(anchor), tokenize_py(other)
    if len(ta) != 1 or len(to) != 1 or ta == to:
        raise ValueError(
            "intervals takes two distinct single analyzed terms "
            f"(got anchor={ta}, other={to})"
        )
    g = int(max_gaps)
    if g < 0:
        raise ValueError("max_gaps must be >= 0")
    offs = [d for d in range(-(g + 1), g + 2) if d != 0]
    return _window_anchor_topk(
        spark, index_dir, ta[0], to[0], offsets=offs, require=True,
        idf_terms=[ta[0], to[0]], k=k, round_to=round_to,
        with_url=with_url, op_name="intervals",
    )


def span_first_topk(
    spark: SparkSession,
    index_dir: str,
    term: str,
    end: int,
    k: int = 10,
    round_to: int | None = 4,
    with_url: bool = False,
) -> DataFrame:
    """ES span_first query (a span_term bounded to the first ``end``
    token positions, 0-based): only occurrences at position < ``end``
    match; scored as the term's BM25 with tf = qualifying occurrences
    (Lucene's sloppy-freq over matching spans — gap-free for a single
    span_term). The representative of the span family beyond span_near
    (which ``phrase_topk(slop=...)`` already serves).

    Plan: the term's position segments only (bucket-pruned scan), one
    vectorized position filter per doc range, dl joined from the docmap
    (the format-2 per-doc source of record), one TakeOrdered. The term's
    df for idf comes from term_stats — index-level stats, unchanged by
    the position window (exactly Lucene: SpanWeight uses the term's
    docFreq)."""
    import math

    from kafka_es_spark.functions.tokenize import tokenize_py
    from kafka_es_spark.operators.compaction import recover_swap_dirs
    from kafka_es_spark.operators.deletes import read_tombstone_ids
    from kafka_es_spark.plans.build_index import BUCKET_SCHEME, load_stats

    toks = tokenize_py(term)
    if len(toks) != 1:
        raise ValueError("span_first takes exactly one analyzed term")
    t = toks[0]
    recover_swap_dirs(index_dir)
    excluded = read_tombstone_ids(spark, index_dir) or None
    st = load_stats(index_dir)
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    empty = (
        "doc_id long, url string, score double" if with_url
        else "doc_id long, score double"
    )
    dfrow = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("term") == t)
        .agg(F.sum("df").alias("df"))
        .collect()[0]
    )
    if dfrow["df"] is None or n_docs == 0 or avgdl == 0:
        return spark.createDataFrame([], empty)
    w = math.log(1 + (n_docs - int(dfrow["df"]) + 0.5) / (int(dfrow["df"]) + 0.5))
    pos_dir = os.path.join(index_dir, "positions")
    if not os.path.isdir(pos_dir):
        raise ValueError(
            f"index at {index_dir} has no positions/ relation — span "
            "queries need the positional index"
        )
    rel = spark.read.parquet(pos_dir).filter(F.col("term") == t)
    if st.get("bucket_scheme") == BUCKET_SCHEME and st.get("n_term_buckets"):
        from kafka_es_spark.operators.dedup import hash32_py

        rel = rel.filter(
            F.col("bucket") == hash32_py(t) % int(st["n_term_buckets"])
        )
    end_i = int(end)

    def count_window(pdf: pd.DataFrame) -> pd.DataFrame:
        empty_p = pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "tf": pd.Series(dtype=np.int64)}
        )
        if len(pdf) == 0:
            return empty_p
        parts_id, parts_tf = [], []
        for r in pdf.to_dict("records"):
            ids, tfs, pos = decode_position_segment(r)
            keep = pos < end_i
            if not keep.any():
                continue
            did = np.repeat(ids, tfs)[keep]
            uids, cnt = np.unique(did, return_counts=True)
            parts_id.append(uids)
            parts_tf.append(cnt)
        if not parts_id:
            return empty_p
        # a doc's positions may span several unit rows (epochs) within
        # the range — fold to one (doc, tf) row
        allid = np.concatenate(parts_id)
        alltf = np.concatenate(parts_tf)
        uids, inv = np.unique(allid, return_inverse=True)
        sums = np.bincount(inv, weights=alltf).astype(np.int64)
        return pd.DataFrame({"doc_id": uids, "tf": sums})

    tf_rel = rel.groupBy("seg").applyInPandas(
        lambda _k, pdf: count_window(pdf), "doc_id long, tf long"
    )
    dm = spark.read.parquet(os.path.join(index_dir, "docmap"))
    out = tf_rel.join(dm.select("doc_id", "url", "dl"), "doc_id")
    if excluded is not None:
        out = out.filter(~F.col("doc_id").isin(sorted(excluded)))
    score = (
        F.lit(w) * F.col("tf") * F.lit(K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
        )
    )
    if round_to is not None:
        score = F.round(score, round_to)
    cols = ["doc_id", "url"] if with_url else ["doc_id"]
    return (
        out.select(*cols, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )
