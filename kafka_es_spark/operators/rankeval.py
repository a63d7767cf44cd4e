"""ES ``_rank_eval`` API: offline ranking-quality metrics over a run.

The reference delegates search quality to Elasticsearch, whose _rank_eval
endpoint scores a batch of requests against graded relevance judgments
(precision@k, recall@k, MRR, DCG/nDCG — Järvelin & Kekäläinen 2002 for the
DCG family). Here the "run" is any (query_id, doc_id, rank) relation a
serving operator produced (wand_topk ranks, cosine_topk ranks, a fused
list), and the ratings are a (query_id, doc_id, rating) relation; the
output is one metric row per query.

Scale: a run is #queries·k rows and ratings are judgment-sized — both tiny
relative to the corpus — so evaluation is reduce-phase work: two hash
joins + two aggregations, no corpus access at all. That also makes it the
cheap regression gate to run after every index build/compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    run: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_threshold: int = 1,
    round_to: int = 4,
) -> DataFrame:
    """Per-query ranking metrics, ES `_rank_eval` semantics:

    - ``precision_at_k``: relevant retrieved / retrieved (≤ k rows — ES
      divides by the docs actually returned up to k, not by k).
    - ``recall_at_k``: relevant retrieved / all relevant for the query
      (0 when the query has no relevant docs, like ES).
    - ``mrr``: 1/rank of the first retrieved doc with rating ≥ threshold
      (0 if none in the top k).
    - ``dcg``: Σ (2^rating − 1)/log₂(rank + 1) over the top k (ES
      default gain/discount).
    - ``ndcg``: dcg / ideal-dcg, where the ideal ranking is the query's
      OWN ratings sorted rating desc (doc_id asc on ties) cut at k —
      exactly ES's normalize=true; 0 when idcg is 0.

    Unjudged retrieved docs count rating 0 (ES's default treatment).
    ``run`` must carry 1-based ``rank`` — the serving operators here all
    emit it; ties were already broken at serving time."""
    if k < 1:
        raise ValueError("rank_eval k must be >= 1")
    thr = int(relevant_threshold)
    rt = ratings.select(
        "query_id", "doc_id", F.col("rating").cast("int").alias("rating")
    )
    top = (
        run.select("query_id", "doc_id", "rank")
        .filter(F.col("rank") <= int(k))
        .join(rt, ["query_id", "doc_id"], "left")
        .withColumn("rating", F.coalesce(F.col("rating"), F.lit(0)))
    )
    rel = F.col("rating") >= thr
    per = top.groupBy("query_id").agg(
        (
            F.sum(rel.cast("int")) / F.count(F.lit(1)).cast("double")
        ).alias("_prec"),
        F.sum(rel.cast("int")).alias("_rel_ret"),
        F.max(F.when(rel, F.lit(1.0) / F.col("rank"))).alias("_mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rating")) - F.lit(1.0))
            / F.log2(F.col("rank") + F.lit(1.0))
        ).alias("_dcg"),
    )
    # ideal DCG from the ratings alone (rating desc, doc_id asc, cut at k)
    iw = Window.partitionBy("query_id").orderBy(
        F.col("rating").desc(), F.col("doc_id").asc()
    )
    ideal = (
        rt.filter(F.col("rating") > 0)
        .withColumn("_ir", F.row_number().over(iw))
        .filter(F.col("_ir") <= int(k))
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rating")) - F.lit(1.0))
                / F.log2(F.col("_ir") + F.lit(1.0))
            ).alias("_idcg")
        )
    )
    totals = (
        rt.filter(rel)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_rel_tot"))
    )
    out = (
        per.join(ideal, "query_id", "left")
        .join(totals, "query_id", "left")
    )
    return out.select(
        "query_id",
        F.round("_prec", round_to).alias("precision_at_k"),
        F.round(
            F.when(
                F.col("_rel_tot").isNotNull(),
                F.col("_rel_ret") / F.col("_rel_tot").cast("double"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("recall_at_k"),
        F.round(F.coalesce(F.col("_mrr"), F.lit(0.0)), round_to).alias("mrr"),
        F.round("_dcg", round_to).alias("dcg"),
        F.round(
            F.when(
                F.col("_idcg").isNotNull() & (F.col("_idcg") > 0),
                F.col("_dcg") / F.col("_idcg"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("ndcg"),
    ).orderBy("query_id")
