"""_search body sections added in round 5: ``search_after`` deep
pagination, ``track_total_hits``, ``_source`` stored-field fetch, and
``highlight`` snippets — the request-body features an ES client uses to
page and render results (reference delegates all of this to ES over
HTTP; here each section compiles onto the hit-set plan).

Semantics pinned:
- search_after keys on the ROUNDED serving (score, doc_id) cursor
  exactly like Searcher.search_after_topk — walking pages reproduces
  the rounded total order with no dups/omissions; combining with
  ``from`` raises (ES contract).
- track_total_hits counts the FULL matching-doc set (pre-paging) and
  every returned hit row carries it.
- _source: false strips to (doc_id, score); a field list joins those
  stored docmap columns; an unstored name fails loudly.
- highlight returns a fragment_size-bounded snippet containing a query
  term, over the page rows only.
"""

import pytest

from kafka_es_spark.operators.searchapi import DSLError, search
from kafka_es_spark.operators.wand import Searcher
from kafka_es_spark.plans.build_index import build_index

SEG_BITS = 6


@pytest.fixture(scope="module")
def idx(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx5b"))
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


BODY = {"query": {"match": {"text": "data index"}}}


def _full_rounded_order(searcher, n=100):
    rows = search(searcher, {**BODY, "size": n}).collect()
    return sorted(rows, key=lambda r: (-r.score, r.doc_id))


def test_body_search_after_walk_reproduces_total_order(searcher):
    want = _full_rounded_order(searcher, 12)[:12]
    page1 = search(searcher, {**BODY, "size": 4}).collect()
    assert len(page1) == 4
    got = sorted(page1, key=lambda r: (-r.score, r.doc_id))
    while len(got) < 12:
        cur = got[-1]
        page = search(
            searcher,
            {**BODY, "size": 4, "search_after": [cur.score, cur.doc_id]},
        ).collect()
        assert page
        got.extend(page)
    assert [(r.doc_id, r.score) for r in got[:12]] == [
        (r.doc_id, r.score) for r in want
    ]
    assert len({r.doc_id for r in got}) == len(got)


def test_body_search_after_rejects_from(searcher):
    with pytest.raises(DSLError, match="mutually exclusive"):
        search(
            searcher,
            {**BODY, "from": 4, "search_after": [1.0, 0], "size": 4},
        )


def test_body_track_total_hits(searcher):
    full = search(searcher, {**BODY, "size": 10_000}).count()
    rows = search(
        searcher, {**BODY, "size": 3, "track_total_hits": True}
    ).collect()
    assert len(rows) == 3
    assert all(r.total_hits == full for r in rows)
    assert full > 3


def test_body_source_false_strips_to_identity(searcher):
    df = search(searcher, {**BODY, "size": 5, "_source": False})
    assert df.columns == ["doc_id", "score"]
    assert df.count() == 5


def test_body_source_field_list_joins_docmap(spark, searcher, idx):
    rows = search(
        searcher, {**BODY, "size": 5, "_source": ["lang", "dl"]}
    ).collect()
    dm = {
        r.doc_id: (r.lang, r.dl)
        for r in spark.read.parquet(idx + "/docmap")
        .select("doc_id", "lang", "dl").collect()
    }
    assert len(rows) == 5
    for r in rows:
        assert (r.lang, r.dl) == dm[r.doc_id]


def test_body_source_unstored_field_raises(searcher):
    with pytest.raises(DSLError, match="not stored"):
        search(searcher, {**BODY, "_source": ["nope"]})


def test_body_highlight_snippet(searcher, pages):
    body = {
        **BODY,
        "size": 5,
        "highlight": {"fields": {"text": {"fragment_size": 60}}},
    }
    rows = search(
        searcher, body, docs_text=pages.select("url", "text")
    ).collect()
    plain = search(searcher, {**BODY, "size": 5}).collect()
    assert [r.doc_id for r in rows] == [r.doc_id for r in plain]
    for r in rows:
        assert len(r.snippet) <= 60
        assert ("data" in r.snippet.lower()) or ("index" in r.snippet.lower())


def test_body_highlight_needs_docs_text(searcher):
    with pytest.raises(DSLError, match="docs_text"):
        search(
            searcher,
            {**BODY, "highlight": {"fields": {"text": {}}}},
        )


def test_body_highlight_composes_with_source_false(searcher, pages):
    body = {
        **BODY,
        "size": 4,
        "_source": False,
        "highlight": {"fields": {"text": {"fragment_size": 50}}},
    }
    df = search(searcher, body, docs_text=pages.select("url", "text"))
    assert df.columns == ["doc_id", "score", "snippet"]
    assert df.count() == 4


def test_body_sort_rejects_render_sections(searcher):
    with pytest.raises(DSLError, match="sort-by-field combines with none"):
        search(
            searcher,
            {**BODY, "sort": [{"dl": "desc"}], "track_total_hits": True},
        )


def test_body_terms_subagg_one_pass(spark, searcher, idx):
    body = {
        **BODY,
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 10},
            "aggs": {
                "avg_dl": {"avg": {"field": "dl"}},
                "n_dl": {"value_count": {"field": "dl"}},
            },
        }},
    }
    rows = {r.value: r for r in search(searcher, body).collect()}
    # recompute from the docmap joined with the full hit set
    hit_ids = {
        r.doc_id for r in search(searcher, {**BODY, "size": 10_000}).collect()
    }
    dm = [
        r for r in spark.read.parquet(idx + "/docmap")
        .select("doc_id", "lang", "dl").collect() if r.doc_id in hit_ids
    ]
    langs = {r.lang for r in dm}
    assert set(rows) == langs
    for lang in langs:
        grp = [r.dl for r in dm if r.lang == lang]
        assert rows[lang].doc_count == len(grp)
        assert rows[lang].n_dl == len(grp)
        assert rows[lang].avg_dl == pytest.approx(
            round(sum(grp) / len(grp), 4)
        )


def test_body_subagg_unstored_field_raises(searcher):
    with pytest.raises(DSLError, match="not stored"):
        search(searcher, {**BODY, "aggs": {"a": {
            "terms": {"field": "lang"},
            "aggs": {"m": {"avg": {"field": "nope"}}},
        }}})


def test_body_subagg_under_stats_raises(searcher):
    with pytest.raises(DSLError, match="nest under terms/histogram"):
        search(searcher, {**BODY, "aggs": {"a": {
            "stats": {"field": "dl"},
            "aggs": {"m": {"avg": {"field": "dl"}}},
        }}})


def test_body_sibling_metric_aggs_one_row(spark, searcher, idx):
    body = {
        **BODY,
        "aggs": {
            "avg_dl": {"avg": {"field": "dl"}},
            "max_dl": {"max": {"field": "dl"}},
            "n_dl": {"value_count": {"field": "dl"}},
        },
    }
    rows = search(searcher, body).collect()
    assert len(rows) == 1
    hit_ids = {
        r.doc_id for r in search(searcher, {**BODY, "size": 10_000}).collect()
    }
    dls = [
        r.dl for r in spark.read.parquet(idx + "/docmap")
        .select("doc_id", "dl").collect() if r.doc_id in hit_ids
    ]
    r = rows[0]
    assert r.n_dl == len(dls)
    assert r.max_dl == max(dls)
    assert r.avg_dl == pytest.approx(round(sum(dls) / len(dls), 4))


def test_body_mixed_bucket_aggs_raise(searcher):
    with pytest.raises(DSLError, match="one per request"):
        search(searcher, {**BODY, "aggs": {
            "a": {"terms": {"field": "lang"}},
            "b": {"terms": {"field": "lang"}},
        }})


def test_body_knn_filter_prefilters_candidates(spark, searcher, idx):
    import re

    dm = (
        spark.read.parquet(idx + "/docmap")
        .select("doc_id", "url", "dl")
        .orderBy("doc_id")
        .limit(8)
        .collect()
    )
    # embeddings carry the index url as the join key (the general path;
    # the doc://<id> corpus-id fallback is oracle-checked in the driver
    # entry) — descending cosine with vec_id
    emb = spark.createDataFrame(
        [(i, [1.0 - 0.01 * i, 0.01 * i], r.url) for i, r in enumerate(dm)],
        "vec_id long, embedding array<double>, url string",
    )
    cut = sorted(r.dl for r in dm)[4]
    body = {"knn": {
        "query_vector": [1.0, 0.0], "k": 3,
        "filter": {"range": {"dl": {"gte": cut}}},
    }}
    got = search(searcher, body, embeddings=emb).collect()
    allowed = {i for i, r in enumerate(dm) if r.dl >= cut}
    assert got and all(r.vec_id in allowed for r in got)
    # pre-filter, not post-filter: the best ALLOWED ids win, in cosine
    # order among the allowed set
    want = sorted(allowed)[:3]
    assert [r.vec_id for r in got] == want


def test_body_min_score_cutoff(searcher):
    full = search(searcher, {**BODY, "size": 10_000}).collect()
    # the engine filters the RAW score, the test sees the ROUNDED
    # serving score — pick a cutoff at the midpoint of two distinct
    # rounded levels so raw-vs-rounded residue (<5e-5) cannot flip a doc
    lv = sorted({r.score for r in full}, reverse=True)
    assert len(lv) >= 4
    cut = (lv[2] + lv[3]) / 2
    rows = search(
        searcher, {**BODY, "size": 10_000, "min_score": cut}
    ).collect()
    assert rows and all(r.score >= cut for r in rows)
    assert len(rows) == sum(1 for r in full if r.score >= cut)


def test_body_post_filter_narrows_hits_not_aggs(spark, searcher, idx):
    dls = sorted(
        r.dl for r in spark.read.parquet(idx + "/docmap").collect()
    )
    cut = dls[len(dls) // 2]
    pf = {"range": {"dl": {"gte": cut}}}
    hits = search(
        searcher, {**BODY, "size": 10_000, "post_filter": pf}
    ).collect()
    plain = {
        r.doc_id: r.score
        for r in search(searcher, {**BODY, "size": 10_000}).collect()
    }
    dm = {
        r.doc_id: r.dl
        for r in spark.read.parquet(idx + "/docmap")
        .select("doc_id", "dl").collect()
    }
    assert hits and all(dm[r.doc_id] >= cut for r in hits)
    # scores untouched (filter context), set = plain hits ∩ gate
    assert {r.doc_id: r.score for r in hits} == {
        d: s for d, s in plain.items() if dm[d] >= cut
    }
    # aggs phase ignores post_filter: agg over the same body equals the
    # agg without it
    a1 = search(
        searcher,
        {**BODY, "post_filter": pf,
         "aggs": {"n": {"value_count": {"field": "dl"}}}},
    ).collect()
    a2 = search(
        searcher,
        {**BODY, "aggs": {"n": {"value_count": {"field": "dl"}}}},
    ).collect()
    assert a1 == a2


def test_body_terms_order_by_subagg(searcher):
    body = {
        **BODY,
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 10,
                      "order": {"avg_dl": "desc"}},
            "aggs": {"avg_dl": {"avg": {"field": "dl"}}},
        }},
    }
    rows = search(searcher, body).collect()
    assert rows
    assert [r.avg_dl for r in rows] == sorted(
        (r.avg_dl for r in rows), reverse=True
    )
    # _key asc ordering
    body["aggs"]["by_lang"]["terms"]["order"] = {"_key": "asc"}
    rows2 = search(searcher, body).collect()
    assert [r.value for r in rows2] == sorted(r.value for r in rows2)
    assert {r.value for r in rows2} == {r.value for r in rows}


def test_body_terms_order_unknown_key_raises(searcher):
    with pytest.raises(DSLError, match="neither _key/_count"):
        search(searcher, {**BODY, "aggs": {"a": {
            "terms": {"field": "lang", "order": {"nope": "desc"}},
        }}})


def test_body_highlight_keeps_hits_missing_from_docs_text(searcher, pages):
    """ES never drops a hit because the highlighter had nothing to read:
    a hit whose url is absent from the docs_text relation keeps its rank
    with a null snippet (an inner join here silently empties the page
    when the relation doesn't cover the index — the failure mode is a
    url-universe mismatch, not a query miss)."""
    body = {
        **BODY,
        "size": 5,
        "highlight": {"fields": {"text": {"fragment_size": 60}}},
    }
    plain = search(searcher, {**BODY, "size": 5}, with_url=True).collect()
    assert len(plain) == 5
    # docs_text covering NONE of the hits: same ranking, null snippets
    import pyspark.sql.functions as F

    empty_cover = pages.select(
        F.concat(F.lit("missing://"), F.col("url")).alias("url"), "text"
    )
    rows = search(searcher, body, docs_text=empty_cover, with_url=True).collect()
    assert [r.doc_id for r in rows] == [r.doc_id for r in plain]
    assert all(r.snippet is None for r in rows)
    # partial cover: covered hits get snippets, uncovered keep rank
    covered = {plain[0].url, plain[2].url}
    part = pages.select("url", "text").where(F.col("url").isin(covered))
    rows = search(searcher, body, docs_text=part, with_url=True).collect()
    assert [r.doc_id for r in rows] == [r.doc_id for r in plain]
    by_url = {r.url: r.snippet for r in rows}
    assert all(by_url[u] is not None for u in covered)
    assert all(s is None for u, s in by_url.items() if u not in covered)


def test_min_should_match_grammar():
    """The Lucene minimum_should_match grammar: fixed count, negative
    count (total - n), percentage (floor), negative percentage (that
    many may be MISSING), clamped to >= 1."""
    from kafka_es_spark.operators.searchapi import _min_should_match as m

    assert m(2, 4) == 2
    assert m("2", 4) == 2
    assert m(-1, 4) == 3
    assert m("-1", 4) == 3
    assert m("75%", 4) == 3
    assert m("50%", 3) == 1        # floor(1.5)
    assert m("-25%", 4) == 3       # 1 may be missing
    assert m("-30%", 3) == 3       # floor(0.9) = 0 may be missing
    assert m("10%", 4) == 1        # floor(0.4) clamps up to 1
    assert m(0, 4) == 1            # BooleanQuery still needs one hit
    assert m(9, 4) == 9            # above total: matches nothing, like ES
    with pytest.raises(DSLError, match="conditional"):
        m("3<90%", 5)


def test_bool_should_msm_percentage(searcher):
    """A should-only scoring bool with minimum_should_match="67%" over 3
    clauses requires >= 2 matched clauses — same hit set as the integer
    form."""
    clauses = [
        {"match": {"text": "data"}},
        {"match": {"text": "index"}},
        {"match": {"text": "crawl"}},
    ]
    pct = search(searcher, {
        "query": {"bool": {"should": clauses, "minimum_should_match": "67%"}},
        "size": 50,
    }).collect()
    lit = search(searcher, {
        "query": {"bool": {"should": clauses, "minimum_should_match": 2}},
        "size": 50,
    }).collect()
    assert [(r.doc_id, r.score) for r in pct] == [
        (r.doc_id, r.score) for r in lit
    ]
    assert len(pct) > 0


def test_fuzziness_grammar_and_auto_body(searcher):
    from kafka_es_spark.operators.searchapi import _fuzziness as fz

    assert fz(1, 10) == 1
    assert fz("2", 10) == 2
    assert fz("AUTO", 2) == 0
    assert fz("AUTO", 4) == 1
    assert fz("AUTO", 9) == 2
    assert fz("AUTO:4,8", 5) == 1
    assert fz("AUTO:4,8", 8) == 2
    with pytest.raises(DSLError, match="AUTO"):
        fz("AUTO:x", 5)
    # body: AUTO on a 4-char term resolves to 1 edit (default 3,6 bands)
    # — same hits as the integer form
    auto = search(searcher, {"query": {"fuzzy": {
        "text": {"value": "indx", "fuzziness": "AUTO"}}}, "size": 20,
    }).collect()
    lit = search(searcher, {"query": {"fuzzy": {
        "text": {"value": "indx", "fuzziness": 1}}}, "size": 20,
    }).collect()
    assert [(r.doc_id, r.score) for r in auto] == [
        (r.doc_id, r.score) for r in lit
    ]
    assert len(auto) > 0


def test_match_clause_boost_scales_scores(searcher):
    """ES match supports a per-clause boost multiplying its score
    contribution; same ranking, 2x scores (within serving round_to)."""
    plain = search(searcher, {**BODY, "size": 5}).collect()
    boosted = search(searcher, {"query": {"match": {"text": {
        "query": "data index", "boost": 2.0}}}, "size": 5}).collect()
    assert [r.doc_id for r in boosted] == [r.doc_id for r in plain]
    for b, p in zip(boosted, plain):
        assert b.score == pytest.approx(2 * p.score, abs=2e-4)


def test_top_level_match_phrase_delegates_to_phrase_engine(spark, searcher, idx, pages):
    """A top-level {"query": {"match_phrase": ...}} is the canonical ES
    phrase request; it must return phrase_topk's phrase-weighted BM25
    ranking (not raise), honoring slop and size. Render sections fail
    loudly (they don't compose with the delegated top-k)."""
    from kafka_es_spark.operators.positions import build_position_index, phrase_topk

    build_position_index(spark, pages, idx)
    try:
        want = [
            (r.doc_id, r.score)
            for r in phrase_topk(spark, idx, "data index", k=5).collect()
        ]
        got = search(searcher, {
            "query": {"match_phrase": {"text": "data index"}}, "size": 5,
        }).collect()
        assert [(r.doc_id, r.score) for r in got] == want
        assert len(got) > 0
        sloppy = search(searcher, {
            "query": {"match_phrase": {"text": {"query": "data index",
                                                "slop": 2}}}, "size": 5,
        }).collect()
        want_sloppy = [
            (r.doc_id, r.score)
            for r in phrase_topk(spark, idx, "data index", k=5, slop=2).collect()
        ]
        assert [(r.doc_id, r.score) for r in sloppy] == want_sloppy
        with pytest.raises(DSLError, match="only 'size'"):
            search(searcher, {
                "query": {"match_phrase": {"text": "data index"}},
                "aggs": {"a": {"avg": {"field": "dl"}}},
            })
    finally:
        import shutil, os
        shutil.rmtree(os.path.join(idx, "positions"), ignore_errors=True)


def test_top_level_query_string_forms_delegate(searcher):
    """Top-level query_string / simple_query_string bodies serve via the
    mini-language engines (they previously raised 'unsupported')."""
    qs = search(searcher, {"query": {"query_string": {
        "query": "data AND index"}}, "size": 5}).collect()
    want = [(r.doc_id, r.score)
            for r in searcher.query_string_topk("data AND index", k=5).collect()]
    assert [(r.doc_id, r.score) for r in qs] == want
    assert len(qs) > 0

    sqs = search(searcher, {"query": {"simple_query_string": {
        "query": "data +index", "default_operator": "or"}}, "size": 5}).collect()
    want = [(r.doc_id, r.score) for r in searcher.simple_query_string_topk(
        "data +index", default_operator="or", k=5).collect()]
    assert [(r.doc_id, r.score) for r in sqs] == want

    with pytest.raises(DSLError, match="'text' field only"):
        search(searcher, {"query": {"query_string": {
            "query": "x", "fields": ["title"]}}})
    with pytest.raises(DSLError, match="only 'size'"):
        search(searcher, {"query": {"simple_query_string": {"query": "x"}},
                          "from": 5})


def test_top_level_match_phrase_prefix_delegates(spark, searcher, idx, pages):
    from kafka_es_spark.operators.positions import (
        build_position_index, phrase_prefix_topk,
    )

    build_position_index(spark, pages, idx)
    try:
        got = search(searcher, {"query": {"match_phrase_prefix": {
            "text": "data ind"}}, "size": 5}).collect()
        want = [(r.doc_id, r.score) for r in phrase_prefix_topk(
            spark, idx, "data ind", k=5).collect()]
        assert [(r.doc_id, r.score) for r in got] == want
        assert len(got) > 0
    finally:
        import shutil, os
        shutil.rmtree(os.path.join(idx, "positions"), ignore_errors=True)


def test_score_sort_is_default_order(searcher):
    """ES clients spell out the default order as sort: ["_score"] or
    [{"_score": "desc"}] — both must equal the unsorted ranking."""
    plain = [(r.doc_id, r.score)
             for r in search(searcher, {**BODY, "size": 5}).collect()]
    for sort in (["_score"], [{"_score": "desc"}], [{"_score": {"order": "desc"}}]):
        got = [(r.doc_id, r.score)
               for r in search(searcher, {**BODY, "size": 5, "sort": sort}).collect()]
        assert got == plain, sort
    with pytest.raises(DSLError, match="ascending"):
        search(searcher, {**BODY, "sort": [{"_score": "asc"}]})
    with pytest.raises(DSLError, match="no other sort keys"):
        search(searcher, {**BODY, "sort": [{"_score": "desc"}, {"dl": "asc"}]})


def test_must_not_only_bool_and_match_none(spark, searcher, idx):
    """ES: a must_not-only bool = match_all minus the negations (filter
    context, score 0); an empty bool = match_all; match_none = nothing."""
    n_docs = spark.read.parquet(idx + "/docmap").count()
    neg = search(searcher, {"query": {"bool": {"must_not": [
        {"match": {"text": "data"}}]}}, "size": 100_000}).collect()
    with_term = search(searcher, {"query": {"match": {"text": {
        "query": "data", "operator": "or"}}}, "size": 100_000}).count()
    assert len(neg) == n_docs - with_term
    assert all(r.score == 0.0 for r in neg)

    empty_bool = search(searcher, {"query": {"bool": {}}, "size": 100_000})
    assert empty_bool.count() == n_docs

    assert search(searcher, {"query": {"match_none": {}}}).count() == 0


def test_filter_and_global_bucket_aggs(spark, searcher, idx):
    """Single-bucket aggs in the body: filter narrows the hit set by a
    filter-context clause; global ignores the query (all live docs);
    a query-less body defaults to match_all (the {"size": 0, "aggs"}
    aggregation-only request)."""
    dm = {r.doc_id: r.dl for r in spark.read.parquet(idx + "/docmap")
          .select("doc_id", "dl").collect()}
    hit_ids = {r.doc_id for r in search(
        searcher, {**BODY, "size": 100_000}).collect()}
    grp = [dm[i] for i in hit_ids if dm[i] >= 50]

    row = search(searcher, {**BODY, "aggs": {"f": {
        "filter": {"range": {"dl": {"gte": 50}}},
        "aggs": {"m": {"avg": {"field": "dl"}}},
    }}}).collect()[0]
    assert row.doc_count == len(grp)
    assert row.m == pytest.approx(round(sum(grp) / len(grp), 4))

    g = search(searcher, {**BODY, "aggs": {"g": {
        "global": {}, "aggs": {"m": {"max": {"field": "dl"}}},
    }}}).collect()[0]
    assert g.doc_count == len(dm)
    assert g.m == max(dm.values())

    a = search(searcher, {"size": 0, "aggs": {
        "n": {"value_count": {"field": "dl"}}}}).collect()[0]
    assert a.n == len(dm)


def test_bool_boost_scales_summed_score(searcher):
    plain = search(searcher, {"query": {"bool": {"must": [
        {"match": {"text": "data index"}}]}}, "size": 5}).collect()
    boosted = search(searcher, {"query": {"bool": {"must": [
        {"match": {"text": "data index"}}], "boost": 2.0}}, "size": 5}).collect()
    assert [r.doc_id for r in boosted] == [r.doc_id for r in plain]
    for b, p in zip(boosted, plain):
        assert b.score == pytest.approx(2 * p.score, abs=2e-4)
