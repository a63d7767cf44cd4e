"""Step-1 slice: tokenizer, extraction byte-identity, BM25 vs DuckDB oracle."""

import duckdb
import pytest

from pyspark.sql import functions as F

from kafka_es_spark.functions.extract import extract_text, extract_text_py
from kafka_es_spark.functions.tokenize import duckdb_tokens_sql, tokens
from kafka_es_spark.operators.bm25 import bm25_topk, corpus_stats, doc_freqs, term_freqs


def test_tokens_basic(spark):
    df = spark.createDataFrame(
        [("Hello,  World! 42x  ", ), ("ÜBER-straße  détail", ), ("", ), ("!!!", )], ["t"]
    )
    out = [r[0] for r in df.select(tokens("t").alias("tk")).collect()]
    assert out[0] == ["hello", "world", "42x"]
    assert out[1] == ["über", "straße", "détail"]
    assert out[2] == [] and out[3] == []


def test_tokens_match_duckdb(spark, sf_dir):
    sdf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark_toks = {
        r["doc_id"]: r["tk"]
        for r in sdf.select("doc_id", tokens("text").alias("tk")).collect()
    }
    con = duckdb.connect()
    duck = con.sql(
        f"select doc_id, {duckdb_tokens_sql('text')} as tk "
        f"from '{sf_dir}/documents.parquet'"
    ).fetchall()
    for doc_id, tk in duck:
        assert spark_toks[doc_id] == tk, f"doc {doc_id}"


def test_extract_byte_identity(spark, pages):
    """Per-row invariant from BASELINE.json input_hint: extract(html) == text per url."""
    bad = (
        pages.withColumn("ex", extract_text(F.col("html")))
        .filter(~(F.col("ex").eqNullSafe(F.col("text"))))
        .count()
    )
    assert bad == 0


def test_extract_edge_cases():
    assert extract_text_py(None) == ""
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"  \n ") == ""
    assert extract_text_py(b"<p>a&amp;b</p>") == "a&b"
    assert extract_text_py(b"<script>x<b>\n</script>hi<!-- c --><style>s</style>") == "hi"
    assert extract_text_py(b"a&lt;p&gt;b") == "a<p>b"  # entity decode after strip
    assert extract_text_py("caf\xe9".encode("utf-8")) == "café"


QUERY_TERMS = ["spark", "query", "join"]


def _duck_bm25(sf_dir, terms, k=10):
    tlist = ", ".join(f"'{t}'" for t in terms)
    toks = duckdb_tokens_sql("text")
    sql = f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM '{sf_dir}/documents.parquet'
),
dl AS (
  SELECT d.doc_id, len({toks}) AS dl FROM '{sf_dir}/documents.parquet' d
),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
qt AS (SELECT unnest([{tlist}]) AS term),
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
ORDER BY round(score, 4) DESC, doc_id LIMIT {k}
"""
    return duckdb.sql(sql).fetchall()


def test_bm25_matches_duckdb_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(docs, QUERY_TERMS, k=10).collect()]
    want = _duck_bm25(sf_dir, QUERY_TERMS, k=10)
    assert len(got) == len(want) > 0
    assert got == [(d, pytest.approx(s, abs=1e-4)) for d, s in want]


def test_stats_and_freqs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = corpus_stats(docs).collect()[0]
    n = docs.count()
    assert st["n_docs"] == n and st["avgdl"] > 0
    tf = term_freqs(docs)
    dfq = doc_freqs(docs)
    assert dfq.filter(F.col("df") > n).count() == 0
    # cf = total tokens
    total_tokens = tf.agg(F.sum("tf")).collect()[0][0]
    assert dfq.agg(F.sum("cf")).collect()[0][0] == total_tokens
