"""Round-5 fixes (ADVICE r4): filter-context should clauses in bool,
phrase-only simple_query_string, one total order across paginated
_search pages, INLINESTATS alias-shadows-BY-key, and mv_slice negative
indices.

Each test pins the ES semantics the advisor flagged as divergent:
a should-only bool of pure filter clauses is a valid hit set (ES never
rejects it), a doc matching only a filter-context should clause stays
in a scoring bool's hit set (0 score contribution), quoted phrases
carry a simple_query_string when no positive terms exist, `from`
pagination ranks every page by the same raw-score total order, an
INLINESTATS agg alias equal to its BY key groups on the original
column and shadows after the join, and mv_slice resolves negative
indices from the end of the array like ES|QL.
"""

import pytest

from pyspark.sql import functions as F

from kafka_es_spark.esql import ESQLError, esql_query
from kafka_es_spark.operators.searchapi import search
from kafka_es_spark.operators.wand import Searcher
from kafka_es_spark.plans.build_index import build_index

SEG_BITS = 6


@pytest.fixture(scope="module")
def idx(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx5"))
    build_index(
        spark, pages, d, seg_bits=SEG_BITS, n_term_buckets=8,
        store_fields=("lang",),
    )
    return d


@pytest.fixture(scope="module")
def searcher(spark, idx):
    s = Searcher(spark, idx)
    yield s
    s.close()


@pytest.fixture(scope="module")
def docmap(spark, idx):
    return spark.read.parquet(idx + "/docmap")


# --- bool should with filter-context clauses ------------------------------


def test_dsl_should_only_filter_clause_scores_zero(searcher, docmap):
    """{bool:{should:[{range:...}]}} in scoring context: ES returns the
    range matches (it never raises); this engine scores them 0."""
    body = {
        "query": {"bool": {"should": [
            {"range": {"dl": {"gte": 20, "lt": 40}}},
        ]}},
        "size": 500,
    }
    got = {r.doc_id: r.score for r in search(searcher, body).collect()}
    want = {r.doc_id for r in docmap.filter("dl >= 20 and dl < 40").collect()}
    assert set(got) == want and want
    assert all(s == 0.0 for s in got.values())


def test_dsl_filter_context_should_only_bool(searcher, docmap):
    """constant_score over a should-only pure-filter bool: the gate is
    the union of the should clauses (minimum_should_match default 1)."""
    body = {
        "query": {"constant_score": {
            "filter": {"bool": {"should": [
                {"range": {"dl": {"lt": 15}}},
                {"range": {"dl": {"gte": 60}}},
            ]}},
            "boost": 3.0,
        }},
        "size": 500,
    }
    got = {r.doc_id: r.score for r in search(searcher, body).collect()}
    want = {r.doc_id for r in docmap.filter("dl < 15 or dl >= 60").collect()}
    assert set(got) == want and want
    assert all(s == 3.0 for s in got.values())


def test_dsl_scoring_bool_keeps_filter_should_docs(searcher, docmap):
    """A doc matching ONLY the filter-context should clause stays in the
    hit set (score 0); docs matching the scoring clause keep its score
    unchanged (the should range adds nothing)."""
    body = {
        "query": {"bool": {"should": [
            {"match": {"text": "data"}},
            {"range": {"dl": {"gte": 30}}},
        ]}},
        "size": 500,
    }
    got = {r.doc_id: r.score for r in search(searcher, body).collect()}
    data_scores = {
        r.doc_id: r.score for r in searcher.topk("data", k=500).collect()
    }
    in_range = {r.doc_id for r in docmap.filter("dl >= 30").collect()}
    assert set(got) == set(data_scores) | in_range
    only_range = in_range - set(data_scores)
    assert only_range, "fixture must contain range-only matches"
    for d in only_range:
        assert got[d] == 0.0
    for d, s in data_scores.items():
        assert got[d] == s


# --- simple_query_string: phrase-only query --------------------------------


def test_sqs_phrase_only_returns_phrase_matches(spark, pages, tmp_path_factory):
    from kafka_es_spark.operators.positions import (
        build_position_index, phrase_match_ids,
    )

    d = str(tmp_path_factory.mktemp("idx5p"))
    build_index(spark, pages, d, seg_bits=SEG_BITS, n_term_buckets=8)
    build_position_index(spark, pages, d)
    s = Searcher(spark, d, cache=False)

    got = {
        r.doc_id: r.score
        for r in s.simple_query_string_topk('"index search"', k=400).collect()
    }
    pm = {r.doc_id for r in phrase_match_ids(spark, d, "index search").collect()}
    assert set(got) == pm and pm
    assert all(v == 0.0 for v in got.values())

    # negation still applies on top of the phrase hit set
    neg = {
        r.doc_id
        for r in s.simple_query_string_topk(
            '"index search" -data', k=400
        ).collect()
    }
    dd = {r.doc_id for r in s.matching_doc_ids("data").collect()}
    assert neg == pm - dd


# --- pagination: one total order across pages ------------------------------


def test_dsl_from_pages_partition_page0_order(searcher):
    full = [
        (r.doc_id, r.score)
        for r in search(searcher, {"query": {"match": {"text": "data"}},
                                   "size": 20}).collect()
    ]
    p0 = [
        (r.doc_id, r.score)
        for r in search(searcher, {"query": {"match": {"text": "data"}},
                                   "from": 0, "size": 10}).collect()
    ]
    p1 = [
        (r.doc_id, r.score)
        for r in search(searcher, {"query": {"match": {"text": "data"}},
                                   "from": 10, "size": 10}).collect()
    ]
    assert p0 + p1 == full


# --- ES|QL: INLINESTATS alias == BY key; mv_slice negatives ---------------


def test_inlinestats_alias_equals_by_key(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "v long, n string"
    )
    rows = esql_query(
        spark, "FROM t | INLINESTATS n = count(*) BY n | SORT v", {"t": df}
    ).collect()
    # groups on the ORIGINAL n ('a': 2 rows, 'b': 1), then the agg value
    # shadows the key column
    assert [(r.v, r.n) for r in rows] == [(1, 2), (2, 2), (3, 1)]


# --- index-time bigram stats for phrase_suggest ----------------------------


def test_bigram_counts_equals_window_transitions(spark):
    from kafka_es_spark.operators.cooccur import bigram_counts

    df = spark.createDataFrame(
        [("a", "x y x y z"), ("b", "x"), ("c", ""), ("d", "y z")],
        "url string, text string",
    )
    got = {(r.prev, r.cur): r.n for r in bigram_counts(df).collect()}
    assert got == {
        ("x", "y"): 2, ("y", "x"): 1, ("y", "z"): 2,
    }


def test_phrase_suggest_bigram_stats_identical_and_no_corpus_scan(
    spark, pages, tmp_path_factory
):
    from kafka_es_spark.plans.build_index import build_bigram_stats

    d = str(tmp_path_factory.mktemp("idx5b"))
    build_index(spark, pages, d, seg_bits=SEG_BITS, n_term_buckets=8)
    docs = pages.select("url", "text")
    s = Searcher(spark, d, cache=False)
    corpus_path = [
        (r.suggestion, r.score, r.n_changed)
        for r in s.phrase_suggest("dita indev", docs, max_errors=2,
                                  size=10).collect()
    ]
    stats = build_bigram_stats(spark, pages, d)
    assert stats["transitions"] > 0
    indexed_path = [
        (r.suggestion, r.score, r.n_changed)
        for r in s.phrase_suggest("dita indev", max_errors=2,
                                  size=10).collect()
    ]
    assert indexed_path == corpus_path and indexed_path
    # with no bigram_stats and no docs_text the call must fail loudly
    d2 = str(tmp_path_factory.mktemp("idx5c"))
    build_index(spark, pages, d2, seg_bits=SEG_BITS, n_term_buckets=8)
    s2 = Searcher(spark, d2, cache=False)
    with pytest.raises(ValueError, match="bigram_stats"):
        s2.phrase_suggest("dita indev")


def test_mv_slice_negative_indices(spark):
    df = spark.createDataFrame([([10, 20, 30, 40],)], "xs array<int>")
    rows = esql_query(
        spark,
        "FROM t | EVAL last2 = mv_slice(xs, -2, -1), "
        "head = mv_slice(xs, 0, 1), "
        "tailneg = mv_slice(xs, 2, -1), "
        "past = mv_slice(xs, -9, 0)",
        {"t": df},
    ).collect()
    r = rows[0]
    assert r.last2 == [30, 40]
    assert r.head == [10, 20]
    assert r.tailneg == [30, 40]
    assert r.past == [10]  # start clamps to the array head


# --- painless-lite script updates (X9 remainder) ---------------------------


def test_painless_counter_increment_golden(spark):
    """The reference's golden script (BulkActionTests.kt:193-201):
    ctx._source.counter += params.param1."""
    from kafka_es_spark.operators.painless import script_update

    df = spark.createDataFrame(
        [("a", 10), ("b", 0)], "id string, counter long"
    )
    got = {
        r.id: r.counter
        for r in script_update(
            df, "ctx._source.counter += params.param1", {"param1": 1}
        ).collect()
    }
    assert got == {"a": 11, "b": 1}


def test_painless_sequential_ternary_concat_remove(spark):
    from kafka_es_spark.operators.painless import script_update

    df = spark.createDataFrame(
        [(1, 4, "en", "x"), (2, 60, "de", "y")],
        "id long, n long, lang string, junk string",
    )
    src = (
        "ctx._source.n = ctx._source.n * 2;"
        "ctx._source.lang = ctx._source.n > 100 ? 'big-' + ctx._source.lang"
        " : ctx._source.lang;"
        "ctx._source.remove('junk')"
    )
    rows = {r.id: r for r in script_update(df, src).collect()}
    # second statement sees the doubled n (sequential semantics)
    assert (rows[1].n, rows[1].lang, rows[1].junk) == (8, "en", None)
    assert (rows[2].n, rows[2].lang, rows[2].junk) == (120, "big-de", None)


def test_painless_ctx_op_delete_and_none(spark):
    from kafka_es_spark.operators.painless import script_update

    df = spark.createDataFrame(
        [(1, 5), (2, 50), (3, 500)], "id long, n long"
    )
    src = (
        "ctx._source.n = ctx._source.n + 1;"
        "ctx.op = ctx._source.n > 400 ? 'delete'"
        " : (ctx._source.n > 40 ? 'none' : 'index')"
    )
    rows = {r.id: r.n for r in script_update(df, src).collect()}
    assert rows == {1: 6, 2: 50}  # 2 kept ORIGINAL (none); 3 deleted


def test_painless_where_scopes_and_math(spark):
    from pyspark.sql import functions as SF

    from kafka_es_spark.operators.painless import script_update

    df = spark.createDataFrame([(1, -7.5), (2, 3.0)], "id long, v double")
    out = {
        r.id: r.v
        for r in script_update(
            df, "ctx._source.v = Math.min(Math.abs(ctx._source.v), 5.0)",
            where=SF.col("id") == 1,
        ).collect()
    }
    assert out == {1: 5.0, 2: 3.0}


def test_painless_rejects_out_of_subset(spark):
    from kafka_es_spark.operators.painless import (
        PainlessError, ScriptPlan, script_update,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(PainlessError):
        ScriptPlan("for (int i = 0; i < 3; i++) { }")
    with pytest.raises(PainlessError):
        ScriptPlan("ctx._source.x = params.nope")
    with pytest.raises(PainlessError, match="not a column"):
        script_update(df, "ctx._source.ghost = 1").collect()


def test_update_by_query_script(spark, pages, tmp_path):
    """ES _update_by_query with a painless script body: stored-field
    rewrite via the compiled plan; non-stored assignment and ctx.op
    both refuse."""
    from kafka_es_spark.operators.deletes import update_by_query
    from kafka_es_spark.operators.painless import PainlessError
    from kafka_es_spark.operators.wand import Searcher

    d = str(tmp_path / "idx_ubq")
    build_index(
        spark, pages, d, seg_bits=SEG_BITS, n_term_buckets=4,
        store_fields=("lang",),
    )
    n = update_by_query(
        spark, d, "data",
        script="ctx._source.lang = 'xx-' + ctx._source.lang",
    )
    assert n > 0
    s = Searcher(spark, d, cache=False)
    hit = {r.doc_id for r in s.matching_doc_ids("data").collect()}
    dm = {r.doc_id: r.lang for r in
          spark.read.parquet(d + "/docmap").collect()}
    for doc, lang in dm.items():
        assert lang.startswith("xx-") == (doc in hit)
    with pytest.raises(ValueError, match="stored fields"):
        update_by_query(spark, d, "data", script="ctx._source.title = 'x'")
    with pytest.raises(PainlessError, match="ctx.op"):
        update_by_query(spark, d, "data", script="ctx.op = 'delete'")
    with pytest.raises(ValueError, match="exactly one"):
        update_by_query(spark, d, "data")
