"""Percolator — ES's reverse search (`_percolate` / percolator fields):
queries are REGISTERED, documents are the probe. Every arriving doc is
matched against the stored query set — the alerting/saved-search/routing
primitive (reference parity: ES percolator queries behind the same bulk
API the kafka-es sink feeds; the reference's tag filter,
`BaseConverter.kt:52-61`, is the degenerate one-predicate form of
routing records by stored criteria).

Scale shape at 10^12 docs: the registered query set is small by
definition (humans curate alerts; ES holds them in one index), so its
exploded (query_id, term) dimension BROADCASTS; the corpus tokenizes
once into distinct (doc, term) rows and the match is one broadcast join
+ one (doc, query) count aggregate — no corpus-sized shuffle beyond the
doc-keyed agg, no per-query scans. Adding a query costs zero extra
passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_es_spark.functions.tokenize import tokens


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match every doc against every registered query.

    ``queries``: (query_id, terms: array<string>) — duplicate terms are
    deduped. ``mode="and"`` (ES percolator's match semantics for a
    ``bool.must`` of term queries): the doc must contain EVERY query
    term. ``mode="or"``: any term matches. If ``queries`` carries an
    integer ``msm`` column, it overrides per query (minimum_should_match:
    AND ⇔ msm=n_terms, OR ⇔ msm=1).

    Output: (doc_id, query_id, n_matched, n_terms) — one row per
    matching (doc, query) pair."""
    if mode not in ("and", "or"):
        raise ValueError(f"unknown percolate mode: {mode!r}")
    has_msm = "msm" in queries.columns
    qd = queries.select(
        "query_id",
        F.array_distinct("terms").alias("_t"),
        *(["msm"] if has_msm else []),
    ).select(
        "query_id",
        F.size("_t").cast("long").alias("n_terms"),
        *(["msm"] if has_msm else []),
        F.explode("_t").alias("term"),
    )
    dt = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    ).distinct()
    j = (
        dt.join(F.broadcast(qd), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.first("n_terms").alias("n_terms"),
            *([F.first("msm").alias("_msm")] if has_msm else []),
        )
    )
    if has_msm:
        need = F.coalesce(
            F.col("_msm").cast("long"),
            F.col("n_terms") if mode == "and" else F.lit(1).cast("long"),
        )
    else:
        need = F.col("n_terms") if mode == "and" else F.lit(1).cast("long")
    return (
        j.filter(F.col("n_matched") >= need)
        .select("doc_id", "query_id", "n_matched", "n_terms")
    )
