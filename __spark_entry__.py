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


def _q_wand_topk(spark, sf_dir):
    """X4/X5/X8 — full index path: SPIMI build (varint+block-max segments,
    doc-range salted) then distributed block-max WAND top-k. Must be
    rank-identical to the exhaustive x7 oracle."""
    import hashlib
    import os

    from kafka_es_spark.operators.wand import wand_topk
    from kafka_es_spark.plans.build_index import build_index
    from kafka_es_spark.sources.pages import docs_as_pages

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = f"/tmp/kafka_es_index_{tag}"
    if not os.path.exists(os.path.join(idx, "_manifest", "term_stats.json")):
        build_index(spark, docs_as_pages(spark, sf_dir), idx, seg_bits=8, n_term_buckets=8)
    out = wand_topk(spark, idx, " ".join(QUERY_TERMS), k=TOPK, with_url=True)
    # map internal dense doc ids back to the corpus doc_id carried in the url
    return out.select(
        F.regexp_extract("url", r"doc://(\d+)", 1).cast("long").alias("doc_id"),
        F.col("score"),
    )


def _q_json_convert(spark, sf_dir):
    """S2 — JSON deserialize at the ingestion edge (JsonConverter.kt:42-76):
    extract typed fields from the JSON value column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.col("event_type").alias("topic"),
    )


def _q_route_resolve(spark, sf_dir):
    """F4 index resolution + P1 hash routing (engine-portable Knuth hash here;
    Java-hashCode parity is pytest-golden-tested in tests/test_ingest.py)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    idx = (
        F.when(F.col("event_type") == "click", "clicks-v1")
        .when(F.col("event_type") == "view", "views-v1")
        .otherwise("events-default")
    )
    grp = F.pmod(F.pmod(F.col("user_id") * F.lit(2654435761), F.lit(2**32)), F.lit(8))
    return ev.select(
        F.col("event_id"),
        idx.alias("index_name"),
        grp.cast("long").alias("route_group"),
    )


def _q_delete_tombstones(spark, sf_dir):
    """X9 — tombstone anti-join before scoring (ES bulk Delete semantics)."""
    from kafka_es_spark.operators.deletes import apply_tombstones

    docs = _docs(spark, sf_dir)
    tombstones = docs.filter(F.col("doc_id") % 7 == 0)
    return _bm25.bm25_topk(apply_tombstones(docs, tombstones), QUERY_TERMS, k=TOPK)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "x2_tokenize_explode": _q_tokenize,
        "x6_term_freqs": _q_term_freqs,
        "x6_doc_freqs": _q_doc_freqs,
        "x6_corpus_stats": _q_corpus_stats,
        "x3_doc_lengths": _q_doc_lengths,
        "x7_bm25_topk": _q_bm25_topk,
        "x8_wand_topk": _q_wand_topk,
        "x9_delete_tombstones": _q_delete_tombstones,
        "s2_json_convert": _q_json_convert,
        "p1_route_resolve": _q_route_resolve,
    }


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB-runnable ANSI SQL over the pre-registered views
# --------------------------------------------------------------------------

_TOKS = duckdb_tokens_sql("text")
_QT = ", ".join(f"'{t}'" for t in QUERY_TERMS)

def _bm25_sql(docs_rel: str = "documents") -> str:
    return f"""
WITH corpus AS (SELECT * FROM {docs_rel}),
toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM corpus
),
dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM corpus),
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


_BM25_SQL = _bm25_sql("documents")


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
        # WAND over the compressed index must reproduce the exhaustive SQL
        "x8_wand_topk": _BM25_SQL,
        "x9_delete_tombstones": _bm25_sql("(SELECT * FROM documents WHERE doc_id % 7 <> 0)"),
        "s2_json_convert": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, "
            "event_type AS topic FROM events"
        ),
        "p1_route_resolve": (
            "SELECT event_id, "
            "CASE event_type WHEN 'click' THEN 'clicks-v1' WHEN 'view' THEN 'views-v1' "
            "ELSE 'events-default' END AS index_name, "
            "CAST((user_id * 2654435761) % 4294967296 % 8 AS BIGINT) AS route_group "
            "FROM events"
        ),
    }
