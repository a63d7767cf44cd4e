"""Co-occurrence mining — ES ``frequent_item_sets`` agg, PMI term-pair
association, and BPE merge-pair counting (tokenizer-training step 1).

All three are the same relational shape: a bounded per-group explode into
pairs, then one pair-keyed hash aggregation with map-side combine. None
needs a UDF, and none produces a corpus-squared join — the pair space is
bounded per transaction/document/word, which is what makes the shape hold
at 100 TB (the classic market-basket / word-cooccurrence plan).

Reference parity: the reference delegates aggregations to ES;
frequent_item_sets is the ES 8.4+ agg of that name (support-thresholded
item sets over a per-document array field — public ES docs). PMI over
term pairs is the significant-terms family's mutual-information heuristic
stated exactly (Manning & Schütze ch. 5). BPE pair counting is step 1 of
Sennrich et al. 2016 — the corpus statistic a tokenizer trainer computes
each merge round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_es_spark.functions.tokenize import tokens


def frequent_item_sets(
    events: DataFrame,
    txn_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """ES ``frequent_item_sets`` for the canonical size-2 sets: item pairs
    that co-occur in ≥ ``min_support`` transactions. Output (item_a,
    item_b, support, support_ratio) with item_a < item_b, ordered
    (support desc, item_a, item_b); ratio = support / n_transactions,
    rounded.

    Plan: distinct (txn, item) — one hash agg — then a txn-keyed
    self-join emitting only a<b pairs: per-transaction cost is
    C(items_in_txn, 2), bounded by basket size, never corpus². The pair
    count is a second hash agg with map-side combine; n_transactions is
    a scalar broadcast."""
    ti = events.select(
        F.col(txn_col).alias("txn"), F.col(item_col).alias("item")
    ).distinct()
    n_txn = ti.select("txn").distinct().count()
    pairs = (
        ti.alias("a")
        .join(ti.alias("b"), "txn")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= int(min_support))
    )
    return pairs.select(
        "item_a",
        "item_b",
        "support",
        F.round(F.col("support") / F.lit(float(max(n_txn, 1))), round_to).alias(
            "support_ratio"
        ),
    ).orderBy(F.col("support").desc(), "item_a", "item_b")


def pmi_pairs(
    docs: DataFrame,
    min_df: int = 5,
    top_k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Pointwise mutual information over within-document term pairs:
    pmi(a,b) = ln(df(a,b)·N / (df(a)·df(b))) with document frequencies —
    the association score behind significant-terms-style keyphrase mining.
    Terms below ``min_df`` are dropped BEFORE pairing (rare terms both
    blow up the pair space and produce degenerate pmi). Output (term_a,
    term_b, n_ab, pmi) top-k by (pmi desc, term_a, term_b), pmi rounded
    at the boundary and the order taken on the rounded value so any
    engine ranks identically.

    Plan: distinct (doc, term) → df filter via a term-keyed join (AQE
    broadcasts the surviving vocabulary when small) → doc-keyed
    self-join a<b (per-doc cost C(kept_terms, 2)) → pair hash agg →
    pmi from broadcast N and the df relation. TakeOrdered cuts top-k."""
    dt = (
        docs.select(F.col(id_col).alias("d"), F.explode(tokens(text_col)).alias("t"))
        .distinct()
    )
    n_docs = docs.count()
    dfreq = dt.groupBy("t").agg(F.count("*").alias("df")).filter(
        F.col("df") >= int(min_df)
    )
    kept = dt.join(dfreq, "t").select("d", "t", "df")
    pair_df = (
        kept.alias("a")
        .join(kept.alias("b"), "d")
        .filter(F.col("a.t") < F.col("b.t"))
        .groupBy(
            F.col("a.t").alias("term_a"),
            F.col("b.t").alias("term_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    pmi = F.round(
        F.log(
            F.col("n_ab").cast("double")
            * F.lit(float(n_docs))
            / (F.col("df_a") * F.col("df_b")).cast("double")
        ),
        round_to,
    )
    return (
        pair_df.select("term_a", "term_b", "n_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "term_a", "term_b")
        .limit(int(top_k))
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Step 1 of BPE tokenizer training (Sennrich et al. 2016): corpus
    counts of ADJACENT character pairs inside words, weighted by word
    occurrence — the statistic whose argmax becomes the first merge.
    Output (pair, n) top-k by (n desc, pair asc).

    Plan: tokenize (codegen) → explode words → per word explode its
    len−1 adjacent 2-grams via sequence+substring (still JVM, no UDF) →
    ONE pair hash agg with map-side combine. Pair cardinality is
    alphabet², tiny; the explode is corpus-token-sized — the same volume
    the posting build already moves, and it needs no shuffle until the
    final small agg."""
    words = docs.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.length("w") >= 2
    )
    grams = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        grams.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(int(top_k))
    )
