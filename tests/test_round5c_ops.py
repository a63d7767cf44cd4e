"""Round-5c _search body widening: the query clauses and aggregation
types an ES client uses that previously lived only as standalone
Searcher methods — now dispatchable from the request body so they
compose inside ``bool`` / ``post_filter`` / function filters.

Query clauses pinned here: ``dis_max`` (max + tie_breaker * others),
``wrapper`` (base64 JSON), ``rank_feature`` / ``distance_feature``
(bounded feature terms over stored docmap columns),
``match_bool_prefix`` (type-ahead prefix rewrite), ``terms_set``
(per-document minimum_should_match), ``pinned`` (curated-first).

Agg types pinned: ``filters``, ``composite`` (with after-cursor
pagination), ``range``, ``extended_stats``, ``cardinality``,
``value_count``, ``percentiles``, ``missing``, ``date_histogram`` —
each one hash aggregation over the hit set joined to stored docmap
columns, never a second corpus pass.

Reference parity: the reference delegates every _search body to ES over
HTTP (`SURVEY.md §3.3`); these sections reproduce the ES semantics on
the engine's own relational primitives.
"""

import base64
import json

import pytest
from pyspark.sql import functions as F

from kafka_es_spark.operators.searchapi import DSLError, search
from kafka_es_spark.operators.wand import Searcher
from kafka_es_spark.plans.build_index import build_index

SEG_BITS = 6


@pytest.fixture(scope="module")
def idx(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx5c"))
    # req: a tiny per-doc minimum_should_match threshold (1 or 2),
    # derived deterministically so terms_set has a per-doc m field;
    # warc_ts gives date_histogram a stored timestamp column; opt is
    # nullable so the terms agg `missing` param has docs to bucket
    p = pages.withColumn(
        "req", (F.length("url") % F.lit(2) + F.lit(1)).cast("int")
    ).withColumn(
        "opt",
        F.when(F.length("url") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("g"), (F.length("url") % 2).cast("string"))),
    )
    build_index(
        spark, p, d, seg_bits=SEG_BITS, n_term_buckets=8,
        store_fields=("lang", "warc_ts", "req", "opt"),
    )
    return d


@pytest.fixture(scope="module")
def searcher(spark, idx):
    s = Searcher(spark, idx)
    yield s
    s.close()


def _scores(searcher, body, n=2000):
    rows = search(searcher, {**body, "size": n}, round_to=None).collect()
    return {r.doc_id: r.score for r in rows}


# --------------------------------------------------------------- dis_max


def test_dis_max_tie_breaker_zero_is_best_field(searcher):
    a = _scores(searcher, {"query": {"match": {"text": "data"}}})
    b = _scores(searcher, {"query": {"match": {"text": "index"}}})
    dm = _scores(searcher, {"query": {"dis_max": {"queries": [
        {"match": {"text": "data"}}, {"match": {"text": "index"}},
    ]}}})
    assert set(dm) == set(a) | set(b)
    for d, s in dm.items():
        want = max(a.get(d, 0.0), b.get(d, 0.0))
        assert s == pytest.approx(want, rel=1e-9)


def test_dis_max_tie_breaker_one_is_sum(searcher):
    a = _scores(searcher, {"query": {"match": {"text": "data"}}})
    b = _scores(searcher, {"query": {"match": {"text": "index"}}})
    dm = _scores(searcher, {"query": {"dis_max": {
        "queries": [
            {"match": {"text": "data"}}, {"match": {"text": "index"}},
        ],
        "tie_breaker": 1.0,
    }}})
    for d, s in dm.items():
        assert s == pytest.approx(a.get(d, 0.0) + b.get(d, 0.0), rel=1e-9)


def test_dis_max_filter_context_gate_is_union(searcher):
    out = search(searcher, {
        "query": {"constant_score": {"filter": {"dis_max": {"queries": [
            {"term": {"text": "data"}}, {"term": {"text": "index"}},
        ]}}}},
        "size": 5000,
    }).collect()
    a = searcher.matching_doc_ids("data").collect()
    b = searcher.matching_doc_ids("index").collect()
    assert {r.doc_id for r in out} == (
        {r.doc_id for r in a} | {r.doc_id for r in b}
    )


# --------------------------------------------------------------- wrapper


def test_wrapper_decodes_to_inner_query(searcher):
    inner = {"match": {"text": "data index"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    direct = search(searcher, {"query": inner, "size": 10}).collect()
    wrapped = search(
        searcher, {"query": {"wrapper": {"query": b64}}, "size": 10}
    ).collect()
    assert [(r.doc_id, r.score) for r in direct] == [
        (r.doc_id, r.score) for r in wrapped
    ]


def test_wrapper_bad_payload_raises(searcher):
    with pytest.raises(DSLError, match="base64"):
        search(searcher, {"query": {"wrapper": {"query": "!!!"}}})


# ------------------------------------------- rank/distance feature


def test_rank_feature_saturation_in_bool_should(spark, searcher, idx):
    pivot, boost = 30.0, 2.0
    base = _scores(searcher, {"query": {"match": {"text": "data"}}})
    got = _scores(searcher, {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"rank_feature": {
            "field": "dl", "boost": boost, "saturation": {"pivot": pivot},
        }}],
    }}})
    dl = {
        r.doc_id: r.dl
        for r in spark.read.parquet(f"{idx}/docmap").collect()
    }
    assert set(got) == set(base)
    for d, s in got.items():
        want = base[d] + boost * dl[d] / (dl[d] + pivot)
        assert s == pytest.approx(want, rel=1e-9)


def test_rank_feature_log_and_linear(searcher):
    lin = _scores(searcher, {"query": {"rank_feature": {
        "field": "dl", "linear": {},
    }}})
    lg = _scores(searcher, {"query": {"rank_feature": {
        "field": "dl", "log": {"scaling_factor": 1.0},
    }}})
    import math

    for d, s in lg.items():
        assert s == pytest.approx(math.log(1.0 + lin[d]), rel=1e-9)


def test_rank_feature_needs_explicit_shape(searcher):
    with pytest.raises(DSLError, match="saturation.pivot"):
        search(searcher, {"query": {"rank_feature": {"field": "dl"}}})


def test_distance_feature_formula(spark, searcher, idx):
    pivot, origin, boost = 20.0, 50.0, 3.0
    got = _scores(searcher, {"query": {"distance_feature": {
        "field": "dl", "pivot": pivot, "origin": origin, "boost": boost,
    }}})
    dl = {
        r.doc_id: r.dl
        for r in spark.read.parquet(f"{idx}/docmap").collect()
    }
    for d, s in got.items():
        want = boost * pivot / (pivot + abs(dl[d] - origin))
        assert s == pytest.approx(want, rel=1e-9)


# ------------------------------------------------- match_bool_prefix


def test_match_bool_prefix_equals_searcher_method(searcher):
    body = {"query": {"match_bool_prefix": {"text": "data ind"}}, "size": 10}
    got = search(searcher, body).collect()
    want = searcher.bool_prefix_topk("data ind", k=10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]


# ------------------------------------------------------------ terms_set


def test_terms_set_literal_msm_matches_gate(searcher):
    out = search(searcher, {
        "query": {"terms_set": {"text": {
            "terms": ["data", "index", "query"],
            "minimum_should_match": 2,
        }}},
        "size": 5000,
    }).collect()
    want = searcher.matching_doc_ids(
        "data index query", min_should_match=2
    ).collect()
    assert {r.doc_id for r in out} == {r.doc_id for r in want}


def test_terms_set_per_doc_field_equals_topk(searcher, spark, idx):
    body = {"query": {"terms_set": {"text": {
        "terms": ["data", "index", "query"],
        "minimum_should_match_field": "req",
    }}}, "size": 10}
    got = search(searcher, body).collect()
    fv = spark.read.parquet(f"{idx}/docmap").select("url", "req")
    want = searcher.terms_set_topk(
        "data index query", fv, "req", k=10
    ).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]


def test_terms_set_needs_m(searcher):
    with pytest.raises(DSLError, match="minimum_should_match"):
        search(searcher, {"query": {"terms_set": {"text": {
            "terms": ["data"],
        }}}})


# --------------------------------------------------------------- pinned


def test_pinned_ranks_pins_first_then_organic(spark, searcher, idx):
    dm = spark.read.parquet(f"{idx}/docmap").select("doc_id", "url")
    organic = search(
        searcher, {"query": {"match": {"text": "data index"}}, "size": 5},
        with_url=True,
    ).collect()
    # pin the organic #3 and one doc outside the page, in that order
    urls = {r.doc_id: r.url for r in dm.collect()}
    pin1 = organic[2].url
    pin2 = next(
        u for d, u in sorted(urls.items()) if u not in {r.url for r in organic}
    )
    got = search(searcher, {"query": {"pinned": {
        "ids": [pin1, pin2],
        "organic": {"match": {"text": "data index"}},
    }}, "size": 5}, with_url=True).collect()
    assert [r.url for r in got[:2]] == [pin1, pin2]
    # organic tail keeps its order, pinned doc never repeats
    tail = [r.url for r in got[2:]]
    want_tail = [r.url for r in organic if r.url not in (pin1, pin2)][:3]
    assert tail == want_tail


# ------------------------------------------------------------- new aggs


def _hits_dm(spark, searcher, idx, q="data index"):
    hits = searcher.matching_doc_ids(q)
    return hits.join(spark.read.parquet(f"{idx}/docmap"), "doc_id")


def test_agg_filters_counts_named_buckets(spark, searcher, idx):
    out = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"by": {"filters": {"filters": {
            "en": {"term": {"lang": "en"}},
            "short": {"range": {"dl": {"lt": 40}}},
        }}}},
    }).collect()
    j = _hits_dm(spark, searcher, idx)
    want_en = j.filter(F.col("lang") == "en").count()
    want_short = j.filter(F.col("dl") < 40).count()
    got = {r.bucket: r.doc_count for r in out}
    assert got == {"en": want_en, "short": want_short}


def test_agg_composite_pagination_covers_all_buckets(spark, searcher, idx):
    body = {
        "query": {"match": {"text": "data index"}},
        "aggs": {"c": {"composite": {
            "size": 2,
            "sources": [{"l": {"terms": {"field": "lang"}}},
                        {"r": {"terms": {"field": "req"}}}],
        }}},
    }
    pages_, after = [], None
    for _ in range(20):
        b = json.loads(json.dumps(body))
        if after is not None:
            b["aggs"]["c"]["composite"]["after"] = after
        rows = search(searcher, b).collect()
        if not rows:
            break
        pages_.extend(rows)
        after = {"l": rows[-1].l, "r": rows[-1].r}
    j = _hits_dm(spark, searcher, idx)
    want = {
        (r.lang, r.req): r.cnt
        for r in j.groupBy("lang", "req")
        .agg(F.count("*").alias("cnt")).collect()
    }
    got = {(r.l, r.r): r.doc_count for r in pages_}
    assert got == want
    # pagination returned each bucket exactly once
    assert len(pages_) == len(want)


def test_agg_range_half_open_buckets(spark, searcher, idx):
    out = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"r": {"range": {"field": "dl", "ranges": [
            {"to": 40}, {"from": 40, "to": 80}, {"from": 80},
        ]}}},
    }).collect()
    j = _hits_dm(spark, searcher, idx)
    got = {r.bucket: r.doc_count for r in out}
    assert got == {
        "*-40": j.filter(F.col("dl") < 40).count(),
        "40-80": j.filter((F.col("dl") >= 40) & (F.col("dl") < 80)).count(),
        "80-*": j.filter(F.col("dl") >= 80).count(),
    }


def test_agg_extended_stats_variance(spark, searcher, idx):
    row = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"s": {"extended_stats": {"field": "dl"}}},
    }).collect()[0]
    j = _hits_dm(spark, searcher, idx)
    want = j.agg(
        F.round(F.var_pop("dl"), 4).alias("v"),
        F.round(F.stddev_pop("dl"), 4).alias("sd"),
        F.round(
            F.sum(F.col("dl") * F.col("dl")).cast("double"), 4
        ).alias("ss"),
    ).collect()[0]
    assert (row.variance, row.std_dev, row.sum_sq) == (
        want.v, want.sd, want.ss,
    )


def test_agg_cardinality_exact_and_value_count(spark, searcher, idx):
    j = _hits_dm(spark, searcher, idx)
    card = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"c": {"cardinality": {"field": "lang", "exact": True}}},
    }).collect()[0]
    assert card.value_count == j.select("lang").distinct().count()
    # value_count rides the sibling-metric fast path: the response
    # column is the AGG NAME (ES keys the response by agg name)
    vc = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"c": {"value_count": {"field": "lang"}}},
    }).collect()[0]
    assert vc.c == j.filter(F.col("lang").isNotNull()).count()


def test_agg_percentiles_exact(spark, searcher, idx):
    out = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"p": {"percentiles": {
            "field": "dl", "percents": [50.0, 90.0],
        }}},
    }).collect()
    j = _hits_dm(spark, searcher, idx)
    want = j.agg(
        F.percentile("dl", F.array(F.lit(0.5), F.lit(0.9))).alias("v")
    ).collect()[0].v
    assert [r.pct for r in out] == [50.0, 90.0]
    assert [r.value for r in out] == [round(v, 4) for v in want]


def test_agg_missing_counts_nulls(searcher):
    out = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"m": {"missing": {"field": "lang"}}},
    }).collect()[0]
    assert out.doc_count == 0  # every test page carries a lang


def test_agg_date_histogram_day_buckets(spark, searcher, idx):
    out = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"d": {"date_histogram": {
            "field": "warc_ts", "calendar_interval": "day",
        }}},
    }).collect()
    j = _hits_dm(spark, searcher, idx)
    want = {
        r.k: r.c
        for r in j.groupBy(F.date_trunc("day", "warc_ts").alias("k"))
        .agg(F.count("*").alias("c")).collect()
    }
    assert {r.bucket_key: r.doc_count for r in out} == want
    assert [r.bucket_key for r in out] == sorted(want)


def test_agg_date_histogram_unknown_interval_raises(searcher):
    with pytest.raises(DSLError, match="interval"):
        search(searcher, {
            "query": {"match": {"text": "data"}},
            "aggs": {"d": {"date_histogram": {
                "field": "warc_ts", "calendar_interval": "fortnight",
            }}},
        })


# ------------------------------------------------------ more_like_this


def test_mlt_text_selects_all_terms_under_cap(searcher):
    got = search(searcher, {
        "query": {"more_like_this": {"like": "data data index"}},
        "size": 10,
    }).collect()
    want = search(searcher, {
        "query": {"match": {"text": "data index"}}, "size": 10,
    }).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]


def test_mlt_max_query_terms_picks_by_tfidf(searcher):
    import math

    stats = {
        r.term: r.df
        for r in searcher.term_stats.filter(
            F.col("term").isin(["data", "index"])
        ).collect()
    }
    n = searcher.n_docs

    def _idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    # like text: data has tf 2, index tf 1
    best = max(
        ["data", "index"], key=lambda t: (2 if t == "data" else 1) * _idf(stats[t])
    )
    got = search(searcher, {
        "query": {"more_like_this": {
            "like": "data data index", "max_query_terms": 1,
        }},
        "size": 5,
    }).collect()
    want = search(searcher, {
        "query": {"match": {"text": best}}, "size": 5,
    }).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]


def test_mlt_doc_reference_raises_to_searcher_seam(searcher):
    with pytest.raises(DSLError, match="doc-reference"):
        search(searcher, {
            "query": {"more_like_this": {"like": {"_id": "u1"}}},
        })


# ------------------------------------------------- significant_text agg


def test_significant_text_matches_searcher_method(searcher, pages):
    docs_text = pages.select("url", "text")
    got = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"sig": {"significant_text": {
            "field": "text", "size": 5, "min_doc_count": 3,
        }}},
    }, docs_text=docs_text).collect()
    want = searcher.significant_terms(
        "data index", docs_text, size=5, min_doc_count=3
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_significant_text_needs_docs_text(searcher):
    with pytest.raises(DSLError, match="docs_text"):
        search(searcher, {
            "query": {"match": {"text": "data"}},
            "aggs": {"sig": {"significant_text": {"field": "text"}}},
        })


# -------------------------------------------------- terms agg widening


def test_terms_top_hits_matches_searcher_method(spark, searcher, idx):
    got = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"by": {
            "terms": {"field": "lang", "size": 3},
            "aggs": {"h": {"top_hits": {"size": 2}}},
        }},
    }).collect()
    fv = spark.read.parquet(f"{idx}/docmap").select("url", "lang")
    want = searcher.top_hits(
        "data index", fv, "lang", buckets=3, per_bucket=2
    ).collect()
    assert [(r.value, r.doc_count, r.rnk, r.url, r.score) for r in got] == [
        (r.lang, r.doc_count, r.rnk, r.url, r.score) for r in want
    ]


def test_terms_missing_buckets_nulls(spark, searcher, idx):
    out = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"o": {"terms": {
            "field": "opt", "size": 10, "missing": "unk",
        }}},
    }).collect()
    j = _hits_dm(spark, searcher, idx)
    want = {
        r.k: r.c
        for r in j.groupBy(
            F.coalesce(F.col("opt"), F.lit("unk")).alias("k")
        ).agg(F.count("*").alias("c")).collect()
    }
    assert {r.value: r.doc_count for r in out} == want
    assert "unk" in want  # the fixture really has null opt docs


def test_terms_min_doc_count_prunes(spark, searcher, idx):
    full = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"o": {"terms": {"field": "lang", "size": 10}}},
    }).collect()
    floor = max(r.doc_count for r in full)  # keep only the top bucket
    pruned = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"o": {"terms": {
            "field": "lang", "size": 10, "min_doc_count": floor,
        }}},
    }).collect()
    assert [r.value for r in pruned] == [
        r.value for r in full if r.doc_count >= floor
    ]


def test_top_hits_mixed_with_metric_subagg_raises(searcher):
    with pytest.raises(DSLError, match="alone"):
        search(searcher, {
            "query": {"match": {"text": "data"}},
            "aggs": {"by": {
                "terms": {"field": "lang"},
                "aggs": {
                    "h": {"top_hits": {"size": 2}},
                    "a": {"avg": {"field": "dl"}},
                },
            }},
        })


# ----------------------------------------------------- knn query clause


@pytest.fixture(scope="module")
def emb(spark, idx):
    # deterministic 2-d embeddings keyed by internal doc id, with a url
    # column so vec->doc mapping uses the url path
    dm = spark.read.parquet(f"{idx}/docmap")
    # (dl, doc_id*37 % 101 + 1): direction-distinct vectors, so cosine
    # ties (which make the k-cut order-dependent) are rare
    return dm.select(
        F.col("doc_id").alias("vec_id"),
        "url",
        F.array(
            (F.col("dl") + 1).cast("double"),
            ((F.col("doc_id") * 37) % 101 + 1).cast("double"),
        ).alias("embedding"),
    ).cache()


QV = [1.0, 0.5]


def test_knn_clause_matches_cosine_topk(spark, searcher, idx, emb):
    from kafka_es_spark.operators.similarity import cosine_topk

    got = search(searcher, {
        "query": {"knn": {
            "field": "embedding", "query_vector": QV, "num_candidates": 7,
        }},
        "size": 7,
    }, embeddings=emb).collect()
    qdf = spark.createDataFrame(
        [(-1, QV)], "query_id long, qvec array<double>"
    )
    # the clause cuts candidates at RAW precision and rounds only at
    # serving (exactly _finish_topk's discipline) — mirror that
    want = cosine_topk(emb, qdf, k=7, round_to=None).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.vec_id, round(r.cos, 4)) for r in want
    ]


def test_knn_clause_composes_in_bool(searcher, emb):
    lex = _scores(searcher, {"query": {"match": {"text": "data"}}})
    got = search(searcher, {
        "query": {"bool": {
            "must": [{"match": {"text": "data"}}],
            "should": [{"knn": {
                "field": "embedding", "query_vector": QV,
                "num_candidates": 100000, "boost": 2.0,
            }}],
        }},
        "size": 400,
    }, embeddings=emb, round_to=None).collect()
    knn_only = search(searcher, {
        "query": {"knn": {
            "field": "embedding", "query_vector": QV,
            "num_candidates": 100000,
        }},
        "size": 100000,
    }, embeddings=emb, round_to=None).collect()
    cos = {r.doc_id: r.score for r in knn_only}
    # hit set = must's docs; score = bm25 + 2*cos for each
    assert {r.doc_id for r in got} == set(lex)
    for r in got:
        assert r.score == pytest.approx(
            lex[r.doc_id] + 2.0 * cos[r.doc_id], rel=1e-9
        )


def test_knn_clause_filter_pregates(spark, searcher, idx, emb):
    got = search(searcher, {
        "query": {"knn": {
            "field": "embedding", "query_vector": QV,
            "num_candidates": 5,
            "filter": {"term": {"lang": "de"}},
        }},
        "size": 5,
    }, embeddings=emb, with_url=False).collect()
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{idx}/docmap").collect()
    }
    assert got and all(langs[r.doc_id] == "de" for r in got)


def test_knn_clause_needs_embeddings(searcher):
    with pytest.raises(DSLError, match="embeddings"):
        search(searcher, {"query": {"knn": {
            "field": "embedding", "query_vector": QV,
        }}})


def test_agg_mad_exact(spark, searcher, idx):
    row = search(searcher, {
        "query": {"match": {"text": "data index"}},
        "aggs": {"m": {"median_absolute_deviation": {"field": "dl"}}},
    }).collect()[0]
    import numpy as np

    j = _hits_dm(spark, searcher, idx)
    dls = np.array([r.dl for r in j.select("dl").collect()], dtype=float)
    want = float(np.percentile(np.abs(dls - np.percentile(dls, 50)), 50))
    assert row.mad == pytest.approx(round(want, 4))
