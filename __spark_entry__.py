"""Driver contract for the spark-graft builder (PySpark target).

Maps SURVEY.md §2 operators to (PySpark DataFrame, DuckDB oracle SQL)
pairs over the driver's pre-registered parquet views. Column names are
aliased identically on both sides (driver hash-compares by sorted column
name). Implementation lives in ``kafka_es_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_es_spark.functions.tokenize import duckdb_tokens_sql, tokens
from kafka_es_spark.operators import bm25 as _bm25

# Flagship query terms (present in the driver's synthetic `documents` corpus).
QUERY_TERMS = ["spark", "query", "join"]
TOPK = 10

_DOCS = "{sf}/documents.parquet"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(_DOCS.format(sf=sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exhaustive BM25 top-k over sf0.001 documents."""
    return _bm25.bm25_topk(_docs(spark, "/root/testdata/sf0.001"), QUERY_TERMS, k=TOPK)


# --------------------------------------------------------------------------
# queries(): name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _q_tokenize(spark, sf_dir):
    """X2 tokenize+explode: (doc_id, term) one row per token occurrence."""
    return _bm25.doc_tokens(_docs(spark, sf_dir))


def _q_term_freqs(spark, sf_dir):
    """Posting relation (doc_id, term, tf) — groupBy with map-side combine."""
    return _bm25.term_freqs(_docs(spark, sf_dir))


def _q_doc_freqs(spark, sf_dir):
    """X6 per-term stats (term, df, cf)."""
    return _bm25.doc_freqs(_docs(spark, sf_dir))


def _q_corpus_stats(spark, sf_dir):
    """X6 global stats (n_docs, avgdl); avgdl counts empty docs."""
    return _bm25.corpus_stats(_docs(spark, sf_dir))


def _q_doc_lengths(spark, sf_dir):
    """(doc_id, dl) via size(tokens) — narrow map, no shuffle."""
    return _bm25.doc_lengths(_docs(spark, sf_dir))


def _q_bm25_topk(spark, sf_dir):
    """X7 exhaustive BM25 (k1=1.2 b=0.75, ES idf) top-10, deterministic ties."""
    return _bm25.bm25_topk(_docs(spark, sf_dir), QUERY_TERMS, k=TOPK)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "x2_tokenize_explode": _q_tokenize,
        "x6_term_freqs": _q_term_freqs,
        "x6_doc_freqs": _q_doc_freqs,
        "x6_corpus_stats": _q_corpus_stats,
        "x3_doc_lengths": _q_doc_lengths,
        "x7_bm25_topk": _q_bm25_topk,
    }


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB-runnable ANSI SQL over the pre-registered views
# --------------------------------------------------------------------------

_TOKS = duckdb_tokens_sql("text")
_QT = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM documents),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
qt AS (SELECT unnest([{_QT}]) AS term),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks JOIN qt USING (term) GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks JOIN qt USING (term) GROUP BY 1),
s AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, round(score, 4) AS score FROM s
ORDER BY round(score, 4) DESC, doc_id LIMIT {TOPK}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "x2_tokenize_explode": (
            f"SELECT doc_id, unnest({_TOKS}) AS term FROM documents"
        ),
        "x6_term_freqs": (
            f"WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents) "
            "SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term"
        ),
        "x6_doc_freqs": (
            f"WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2) "
            "SELECT term, count(*) AS df, cast(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term"
        ),
        "x6_corpus_stats": (
            f"WITH dl AS (SELECT len({_TOKS}) AS dl FROM documents) "
            "SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl"
        ),
        "x3_doc_lengths": (
            f"SELECT doc_id, len({_TOKS}) AS dl FROM documents"
        ),
        "x7_bm25_topk": _BM25_SQL,
    }
