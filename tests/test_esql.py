"""ES|QL compiler: lexer/parser/compiler semantics.

Each test pins a grammar or semantics edge: pipe chaining, EVAL
left-to-right visibility, STATS BY with computed keys and default
(expression-text) names, ES|QL's nulls-last SORT default, KEEP wildcard
expansion and reordering, MV_EXPAND null preservation, LOOKUP JOIN
left-join semantics, LIKE wildcard translation (* ? vs literal % _),
operator precedence, and clean parse errors for unsupported commands.
The plan-shape test pins the scale contract: a WHERE behind two pipes
still reaches the parquet scan as a pushed filter, and LOOKUP JOIN
plans as a broadcast join.
"""

import pytest

from pyspark.sql import functions as F

from kafka_es_spark.esql import ESQLError, esql_query


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "alpha beta", "en", "web", 10),
            (1, "gamma delta", "en", "book", 25),
            (2, "epsilon", "de", "web", 7),
            (3, "zeta eta theta", "fr", "web", 40),
            (4, "iota", "de", "book", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture(scope="module")
def langs(spark):
    return spark.createDataFrame(
        [("en", "English"), ("de", "German")],
        "lang string, lang_name string",
    )


def _run(spark, q, **tables):
    return esql_query(spark, q, tables)


def test_where_keep_sort_limit(spark, docs):
    rows = _run(
        spark,
        'FROM docs | WHERE lang == "en" OR n_chars > 30 '
        "| KEEP doc_id, n_chars | SORT n_chars DESC | LIMIT 2",
        docs=docs,
    ).collect()
    assert [(r.doc_id, r.n_chars) for r in rows] == [(3, 40), (1, 25)]


def test_eval_left_to_right_and_arithmetic(spark, docs):
    rows = _run(
        spark,
        "FROM docs | EVAL half = n_chars / 2, quarter = half / 2 "
        "| WHERE quarter >= 5 | KEEP doc_id, quarter | SORT doc_id ASC",
        docs=docs,
    ).collect()
    assert [(r.doc_id, r.quarter) for r in rows] == [(1, 6.25), (3, 10.0)]


def test_stats_by_computed_key_and_default_names(spark, docs):
    df = _run(
        spark,
        'FROM docs | STATS cnt = count(*), avg(n_chars) BY src = to_upper(source) '
        "| SORT src ASC",
        docs=docs,
    )
    assert df.columns == ["src", "cnt", "avg(n_chars)"]
    rows = df.collect()
    assert [(r.src, r.cnt) for r in rows] == [("BOOK", 2), ("WEB", 3)]
    assert rows[0]["avg(n_chars)"] == pytest.approx(14.5)


def test_stats_scalar_over_aggregates(spark, docs):
    """ES|QL allows scalar wrappers and arithmetic over agg calls."""
    rows = _run(
        spark,
        "FROM docs | STATS r = round(avg(n_chars), 1), "
        "ratio = sum(n_chars) / count(*) BY lang | SORT lang ASC",
        docs=docs,
    ).collect()
    assert [(r.lang, r.r, r.ratio) for r in rows] == [
        ("de", 5.5, 5.5), ("en", 17.5, 17.5), ("fr", 40.0, 40.0),
    ]


def test_stats_global_no_by(spark, docs):
    row = _run(
        spark,
        "FROM docs | STATS n = count(*), total = sum(n_chars), "
        "nl = count_distinct(lang)",
        docs=docs,
    ).collect()[0]
    assert (row.n, row.total, row.nl) == (5, 86, 3)


def test_sort_nulls_last_default(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 1)], "id long, v int"
    )
    rows = esql_query(spark, "FROM t | SORT v ASC | KEEP id", {"t": df}).collect()
    # ES|QL sorts nulls LAST by default (Spark's default would be first).
    assert [r.id for r in rows] == [3, 1, 2]
    rows = esql_query(
        spark, "FROM t | SORT v ASC NULLS FIRST | KEEP id", {"t": df}
    ).collect()
    assert [r.id for r in rows] == [2, 3, 1]


def test_keep_wildcard_expansion_and_reorder(spark, docs):
    df = _run(spark, "FROM docs | KEEP n_chars, doc_*", docs=docs)
    assert df.columns == ["n_chars", "doc_id"]
    df = _run(spark, "FROM docs | DROP t*", docs=docs)
    assert df.columns == ["doc_id", "lang", "source", "n_chars"]


def test_rename_and_row_source(spark):
    row = esql_query(
        spark,
        'ROW a = 1, b = "x" | RENAME a AS left_val | EVAL c = left_val + 1',
        {},
    ).collect()[0]
    assert (row.left_val, row.b, row.c) == (1, "x", 2)


def test_mv_expand_preserves_nulls(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, None)], "id long, tags array<string>"
    )
    rows = esql_query(
        spark, "FROM t | MV_EXPAND tags | SORT id ASC, tags ASC NULLS FIRST", {"t": df}
    ).collect()
    assert [(r.id, r.tags) for r in rows] == [(1, "a"), (1, "b"), (2, None)]


def test_lookup_join_is_left_and_broadcast(spark, docs, langs):
    df = _run(
        spark,
        "FROM docs | LOOKUP JOIN langs ON lang "
        "| KEEP doc_id, lang_name | SORT doc_id ASC",
        docs=docs,
        langs=langs,
    )
    rows = df.collect()
    assert rows[3].lang_name is None  # fr has no lookup row → left join
    assert rows[0].lang_name == "English"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_like_wildcards_and_literal_underscore(spark):
    df = spark.createDataFrame(
        [(1, "foo_bar"), (2, "fooXbar"), (3, "foo_baz")], "id long, s string"
    )
    # ES|QL ? = exactly one char; _ in the pattern is LITERAL.
    rows = esql_query(
        spark, 'FROM t | WHERE s LIKE "foo_ba?" | SORT id ASC', {"t": df}
    ).collect()
    assert [r.id for r in rows] == [1, 3]
    rows = esql_query(spark, 'FROM t | WHERE s LIKE "foo*"', {"t": df}).collect()
    assert len(rows) == 3
    rows = esql_query(
        spark, 'FROM t | WHERE s NOT LIKE "foo_*" | SORT id ASC', {"t": df}
    ).collect()
    assert [r.id for r in rows] == [2]


def test_precedence_and_not_in_case(spark, docs):
    rows = _run(
        spark,
        'FROM docs | WHERE n_chars > 5 AND NOT lang IN ("de", "fr") '
        "OR doc_id == 4 "
        '| EVAL tier = case(n_chars >= 25, "big", n_chars >= 10, "mid", "small") '
        "| KEEP doc_id, tier | SORT doc_id ASC",
        docs=docs,
    ).collect()
    # OR binds looser than AND: (en docs with n_chars>5) OR doc_id==4
    assert [(r.doc_id, r.tier) for r in rows] == [
        (0, "mid"), (1, "big"), (4, "small"),
    ]


def test_scalar_functions(spark):
    row = esql_query(
        spark,
        'ROW s = "  Hello World  " '
        "| EVAL t = trim(s), lo = to_lower(t), n = length(t), "
        '  sub = substring(t, 7, 5), st = starts_with(t, "Hello"), '
        '  rep = replace(t, "o", "0"), r = round(3.14159, 2), '
        "  c = concat(lo, \"!\")",
        {},
    ).collect()[0]
    assert row.t == "Hello World"
    assert row.lo == "hello world"
    assert row.n == 11
    assert row.sub == "World"
    assert row.st is True
    assert row.rep == "Hell0 W0rld"
    assert row.r == 3.14
    assert row.c == "hello world!"


def test_is_null_and_coalesce(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, v string")
    rows = esql_query(
        spark,
        'FROM t | WHERE v IS NULL | EVAL w = coalesce(v, "missing") | KEEP id, w',
        {"t": df},
    ).collect()
    assert [(r.id, r.w) for r in rows] == [(1, "missing")]
    rows = esql_query(spark, "FROM t | WHERE v IS NOT NULL | KEEP id", {"t": df}).collect()
    assert [r.id for r in rows] == [2]


def test_dissect(spark):
    df = spark.createDataFrame(
        [(1, "GET /index.html 200"), (2, "POST /api/x 503"), (3, "garbage")],
        "id long, line string",
    )
    rows = esql_query(
        spark,
        'FROM t | DISSECT line "%{verb} %{path} %{status}" '
        "| KEEP id, verb, status | SORT id ASC",
        {"t": df},
    ).collect()
    assert [(r.id, r.verb, r.status) for r in rows] == [
        (1, "GET", "200"), (2, "POST", "503"), (3, None, None),
    ]


def test_dissect_skip_key_and_trailing_rest(spark):
    df = spark.createDataFrame([(1, "a - b - c d e")], "id long, s string")
    row = esql_query(
        spark, 'FROM t | DISSECT s "%{} - %{x} - %{rest}"', {"t": df}
    ).collect()[0]
    assert (row.x, row.rest) == ("b", "c d e")


def test_grok_with_casts(spark):
    df = spark.createDataFrame(
        [
            (1, "click user=42 v=3.5"),
            (2, "error user=7 v=0.25"),
            (3, "no match here!"),
        ],
        "id long, line string",
    )
    rows = esql_query(
        spark,
        'FROM t | GROK line "%{WORD:etype} user=%{INT:uid:int} v=%{NUMBER:val:float}" '
        "| KEEP id, etype, uid, val | SORT id ASC",
        {"t": df},
    ).collect()
    assert [(r.id, r.etype, r.uid, r.val) for r in rows] == [
        (1, "click", 42, 3.5), (2, "error", 7, 0.25), (3, None, None, None),
    ]
    # anonymous pattern groups don't shift field numbering
    row = esql_query(
        spark,
        'FROM t | GROK line "%{WORD} user=%{INT} v=%{NUMBER:val}" | SORT id ASC',
        {"t": df},
    ).collect()[0]
    assert row.val == "3.5"


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("long").alias("n_chars"),
        F.lit("en").alias("lang"),
    ).write.parquet(p)
    df = esql_query(
        spark,
        'FROM docs | WHERE n_chars == 2 AND lang == "en" '
        "| STATS c = count(*) BY n_chars | LIMIT 5",
        {"docs": spark.read.parquet(p)},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "IsNotNull(n_chars)" in plan or "EqualTo(n_chars,2)" in plan
    assert df.collect()[0].c == 33


def test_parse_errors(spark, docs):
    with pytest.raises(ESQLError, match="unknown index"):
        _run(spark, "FROM docs | ENRICH no_such_policy", docs=docs)
    with pytest.raises(ESQLError, match="unknown grok pattern"):
        _run(spark, 'FROM docs | GROK text "%{NOPE:x}"', docs=docs)
    with pytest.raises(ESQLError, match="expected a command|unknown command"):
        _run(spark, "FROM docs | FROBNICATE x", docs=docs)
    with pytest.raises(ESQLError, match="must start with"):
        _run(spark, "WHERE x == 1", docs=docs)
    with pytest.raises(ESQLError, match="unknown function"):
        _run(spark, "FROM docs | EVAL x = no_such_fn(1)", docs=docs)
    with pytest.raises(ESQLError, match="unknown index"):
        _run(spark, "FROM nope | LIMIT 1", docs=docs)
    with pytest.raises(ESQLError, match="STATS expects aggregate"):
        _run(spark, "FROM docs | STATS x = round(n_chars, 2)", docs=docs)


def test_sample_deterministic_and_partition_invariant(spark, docs):
    """SAMPLE is content-hash Bernoulli: identical keep-set on reruns and at
    any partitioning (the property ES|QL's RNG sampling lacks)."""
    q = "FROM docs | SAMPLE 0.5 3 | KEEP doc_id | SORT doc_id ASC"
    a = [r.doc_id for r in _run(spark, q, docs=docs).collect()]
    b = [r.doc_id for r in _run(spark, q, docs=docs.repartition(7)).collect()]
    assert a == b
    # subset of the input, and the keep decision actually filters
    assert set(a) <= {0, 1, 2, 3, 4}
    full = [r.doc_id for r in _run(
        spark, "FROM docs | SAMPLE 1.0 | KEEP doc_id", docs=docs).collect()]
    assert sorted(full) == [0, 1, 2, 3, 4]  # p=1.0 keeps everything


def test_sample_seed_changes_keep_set(spark, docs):
    got = {
        seed: tuple(sorted(
            r.doc_id for r in _run(
                spark, f"FROM docs | SAMPLE 0.5 {seed} | KEEP doc_id",
                docs=docs).collect()))
        for seed in (0, 1, 2, 3, 4, 5)
    }
    assert len(set(got.values())) > 1  # seeds decorrelate


def test_sample_parse_errors(spark, docs):
    with pytest.raises(ESQLError, match="probability"):
        _run(spark, "FROM docs | SAMPLE", docs=docs)
    with pytest.raises(ESQLError, match="in \\(0, 1\\]"):
        _run(spark, "FROM docs | SAMPLE 1.5", docs=docs)


def test_enrich_default_and_with(spark, docs, langs):
    # default: match on the policy's first column, add every other column
    rows = _run(
        spark,
        "FROM docs | ENRICH langs | KEEP doc_id, lang, lang_name "
        "| SORT doc_id ASC",
        docs=docs, langs=langs,
    ).collect()
    assert [(r.doc_id, r.lang_name) for r in rows] == [
        (0, "English"), (1, "English"), (2, "German"), (3, None),
        (4, "German"),
    ]
    # WITH rename + explicit ON
    rows = _run(
        spark,
        "FROM docs | ENRICH langs ON lang WITH nice = lang_name "
        "| KEEP doc_id, nice | SORT doc_id ASC | LIMIT 1",
        docs=docs, langs=langs,
    ).collect()
    assert rows[0].nice == "English"


def test_enrich_overwrites_existing_column(spark, docs, langs):
    rows = _run(
        spark,
        # overwrite 'source' with the enriched value (EVAL-style shadowing)
        "FROM docs | ENRICH langs WITH source = lang_name "
        "| KEEP doc_id, source | SORT doc_id ASC",
        docs=docs, langs=langs,
    ).collect()
    assert rows[0].source == "English" and rows[3].source is None


def test_enrich_errors(spark, docs, langs):
    with pytest.raises(ESQLError, match="match field"):
        _run(spark, "FROM docs | ENRICH langs ON nope", docs=docs, langs=langs)
    with pytest.raises(ESQLError, match="ENRICH field"):
        _run(spark, "FROM docs | ENRICH langs WITH x = nope",
             docs=docs, langs=langs)


def test_bucket_numeric_and_duration(spark, docs):
    rows = _run(
        spark,
        "FROM docs | STATS c = count(*) BY b = bucket(n_chars, 10) "
        "| SORT b ASC",
        docs=docs,
    ).collect()
    assert [(r.b, r.c) for r in rows] == [(0.0, 2), (10.0, 1), (20.0, 1), (40.0, 1)]


def test_bucket_time_spans(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 14),), (dt.datetime(2024, 1, 1, 10, 44),),
         (dt.datetime(2024, 1, 1, 11, 5),)],
        "ts timestamp",
    )
    rows = _run(
        spark,
        'FROM ev | STATS c = count(*) BY b = bucket(ts, "30 minutes") '
        "| SORT b ASC",
        ev=ev,
    ).collect()
    assert [(r.b.hour, r.b.minute, r.c) for r in rows] == [
        (10, 0, 1), (10, 30, 1), (11, 0, 1)]
    rows = _run(
        spark,
        'FROM ev | STATS c = count(*) BY b = bucket(ts, "1 week")', ev=ev,
    ).collect()
    assert len(rows) == 1 and rows[0].c == 3
    with pytest.raises(ESQLError, match="supports only"):
        _run(spark, 'FROM ev | STATS c = count(*) BY bucket(ts, "2 months")',
             ev=ev)


def test_inlinestats_by_keys_joins_back(spark, docs):
    rows = _run(
        spark,
        "FROM docs | INLINESTATS lang_avg = avg(n_chars) BY lang "
        "| KEEP doc_id, lang, n_chars, lang_avg | SORT doc_id ASC",
        docs=docs,
    ).collect()
    # every row kept; per-lang means: en (10+25)/2, de (7+4)/2, fr 40
    assert len(rows) == 5
    by_id = {r.doc_id: r.lang_avg for r in rows}
    assert by_id[0] == 17.5 and by_id[1] == 17.5
    assert by_id[2] == 5.5 and by_id[4] == 5.5
    assert by_id[3] == 40.0


def test_inlinestats_global_and_shadowing(spark, docs):
    rows = _run(
        spark,
        "FROM docs | EVAL n_max = 0 | INLINESTATS n_max = max(n_chars) "
        "| WHERE n_chars == n_max",
        docs=docs,
    ).collect()
    # no BY: one global aggregate on every row; the EVAL column is
    # shadowed (EVAL-style), so the filter keeps only the max row
    assert [(r.doc_id, r.n_max) for r in rows] == [(3, 40)]


def test_inlinestats_by_requires_bare_columns(spark, docs):
    with pytest.raises(ESQLError, match="bare column"):
        _run(
            spark,
            "FROM docs | INLINESTATS m = max(n_chars) BY b = n_chars + 1",
            docs=docs,
        )


def test_change_point_finds_planted_step_cmd(spark):
    series = spark.createDataFrame(
        [(i, 10 if i < 6 else 50) for i in range(12)],
        "t long, v long",
    )
    rows = _run(
        spark,
        "FROM series | CHANGE_POINT v ON t | SORT t ASC", series=series,
    ).collect()
    assert len(rows) == 12
    flagged = [r for r in rows if r.type is not None]
    assert len(flagged) == 1 and flagged[0].t == 6
    assert flagged[0].type == "step_change" and flagged[0].pvalue > 0
    assert all(r.pvalue is None for r in rows if r.t != 6)


def test_change_point_as_names_and_unknown_col(spark):
    series = spark.createDataFrame(
        [(i, 1 if i < 3 else 9) for i in range(6)], "t long, v long"
    )
    rows = _run(
        spark,
        "FROM series | CHANGE_POINT v ON t AS cp_kind, cp_stat "
        "| WHERE cp_kind IS NOT NULL",
        series=series,
    ).collect()
    assert len(rows) == 1 and rows[0].t == 3 and rows[0].cp_kind == "step_change"
    with pytest.raises(ESQLError, match="unknown column"):
        _run(spark, "FROM series | CHANGE_POINT nope ON t", series=series)


def test_mv_functions(spark):
    rows = _run(
        spark,
        "ROW a = 1 "
        "| EVAL xs = split(\"3,1,2,3\", \",\") "
        "| EVAL n = mv_count(xs), mn = mv_min(xs), mx = mv_max(xs), "
        "s = mv_sum(xs), av = mv_avg(xs), d = mv_dedupe(xs), "
        "st = mv_sort(xs), f = mv_first(xs), l = mv_last(xs), "
        "sl = mv_slice(xs, 1, 2), j = mv_concat(xs, \"-\")",
    ).collect()
    r = rows[0]
    assert r.n == 4 and r.mn == "1" and r.mx == "3"
    assert r.s == 9.0 and r.av == 2.25
    assert sorted(r.d) == ["1", "2", "3"] and r.st == ["1", "2", "3", "3"]
    assert r.f == "3" and r.l == "3"
    assert r.sl == ["1", "2"] and r.j == "3-1-2-3"


def test_mv_sum_null_on_empty(spark):
    rows = _run(
        spark,
        'ROW t = "1,2" | EVAL xs = split(t, ",") '
        "| EVAL e = mv_slice(xs, 1, 0), s = mv_sum(e), av = mv_avg(e)",
    ).collect()
    # an empty multivalue sums/averages to null (ES), never 0 or NaN
    assert rows[0].e == [] and rows[0].s is None and rows[0].av is None


def test_date_diff_truncates_toward_zero(spark):
    rows = _run(
        spark,
        "ROW s = \"2024-01-01 00:00:00\", e = \"2024-01-03 13:00:00\" "
        "| EVAL sd = to_datetime(s), ed = to_datetime(e), "
        "d_days = date_diff(\"days\", sd, ed), "
        "d_hours = date_diff(\"hours\", sd, ed), "
        "neg = date_diff(\"days\", ed, sd)",
    ).collect()
    r = rows[0]
    assert r.d_days == 2 and r.d_hours == 61
    assert r.neg == -2  # toward zero, not floor (-3)


def test_date_diff_bad_unit_raises(spark):
    with pytest.raises(ESQLError, match="date_diff supports"):
        _run(
            spark,
            "ROW s = \"2024-01-01\" | EVAL d = date_diff(\"months\", "
            "to_datetime(s), to_datetime(s))",
        )


# --- FORK -------------------------------------------------------------------


def test_fork_two_branches_union_by_name(spark, docs):
    """FORK runs each parenthesised branch over the same input; outputs
    union by name (missing columns null) with _fork discriminators."""
    out = esql_query(
        spark,
        "FROM docs "
        "| FORK ( WHERE n_chars > 8 | STATS n = count(*) BY lang ) "
        "       ( STATS n = count(*), chars = sum(n_chars) BY source )",
        {"docs": docs},
    )
    rows = {
        (r["_fork"], r["lang"], r["source"]): (r["n"], r["chars"])
        for r in out.collect()
    }
    # branch 1: n_chars > 8 → docs 0 (en), 1 (en), 3 (fr)
    assert rows[("fork1", "en", None)] == (2, None)
    assert rows[("fork1", "fr", None)] == (1, None)
    # branch 2: all docs by source
    assert rows[("fork2", None, "web")] == (3, 57)
    assert rows[("fork2", None, "book")] == (2, 29)
    assert len(rows) == 4


def test_fork_single_branch_rejected(spark, docs):
    with pytest.raises(ESQLError, match="two"):
        esql_query(
            spark, "FROM docs | FORK ( WHERE n_chars > 8 )", {"docs": docs}
        )


def test_fork_branch_pipelines_compose(spark, docs):
    """Commands after FORK apply to the fused relation (e.g. a WHERE on
    _fork keeps one branch)."""
    out = esql_query(
        spark,
        "FROM docs "
        '| FORK ( WHERE lang == "en" | STATS n = count(*) ) '
        "       ( WHERE n_chars < 8 | STATS n = count(*) ) "
        '| WHERE _fork == "fork2"',
        {"docs": docs},
    )
    assert [(r["n"], r["_fork"]) for r in out.collect()] == [(2, "fork2")]


def test_mv_zip_unpaired_tail_values_stand_alone(spark):
    """mv_zip with unequal lengths: the unpaired tail appears alone, no
    dangling delimiter (ES|QL semantics)."""
    out = esql_query(
        spark,
        'ROW a = 1 | EVAL z = mv_zip(["x", "y", "q"], ["1"], "-") | KEEP z',
        {},
    )
    assert out.collect()[0]["z"] == ["x-1", "y", "q"]


# ---------------------------------------------------------- round-5 aggs


def test_stats_median_and_percentile(spark, docs):
    rows = _run(
        spark,
        "FROM docs | STATS med = median(n_chars), "
        "p90 = percentile(n_chars, 90) BY lang | SORT lang ASC",
        docs=docs,
    ).collect()
    # exact percentile, linear interpolation (quantile_cont contract)
    import numpy as np

    by_lang = {"de": [7, 4], "en": [10, 25], "fr": [40]}
    for r in rows:
        assert r.med == pytest.approx(
            float(np.percentile(by_lang[r.lang], 50))
        )
        assert r.p90 == pytest.approx(
            float(np.percentile(by_lang[r.lang], 90))
        )


def test_stats_std_dev_population(spark, docs):
    row = _run(
        spark, "FROM docs | STATS sd = std_dev(n_chars)", docs=docs
    ).collect()[0]
    import numpy as np

    assert row.sd == pytest.approx(float(np.std([10, 25, 7, 40, 4])))


def test_stats_top_desc_and_asc(spark, docs):
    row = _run(
        spark,
        'FROM docs | STATS hi = top(n_chars, 3, "desc"), '
        'lo = top(n_chars, 2, "asc")',
        docs=docs,
    ).collect()[0]
    assert row.hi == [40, 25, 10]
    assert row.lo == [4, 7]


def test_stats_top_needs_literal_args(spark, docs):
    with pytest.raises(ESQLError, match="literal"):
        _run(
            spark,
            "FROM docs | STATS t = top(n_chars, n_chars, \"desc\")",
            docs=docs,
        )


def test_stats_mad_global_and_by_key(spark, docs):
    # MAD = median(|x - median(x)|); global: med=10, devs [0,15,3,30,6] -> 6
    row = _run(
        spark,
        "FROM docs | STATS m = median_absolute_deviation(n_chars)",
        docs=docs,
    ).collect()[0]
    assert row.m == pytest.approx(6.0)
    rows = _run(
        spark,
        "FROM docs | STATS m = median_absolute_deviation(n_chars) BY lang "
        "| SORT lang ASC",
        docs=docs,
    ).collect()
    # de: med 5.5, devs [1.5, 1.5] -> 1.5; en: med 17.5 -> 7.5; fr: -> 0
    assert [(r.lang, r.m) for r in rows] == [
        ("de", 1.5), ("en", 7.5), ("fr", 0.0),
    ]


def test_stats_mad_inside_scalar_wrapper(spark, docs):
    row = _run(
        spark,
        "FROM docs | STATS m = round(median_absolute_deviation(n_chars) * 2, 1)",
        docs=docs,
    ).collect()[0]
    assert row.m == pytest.approx(12.0)


def test_mad_outside_stats_raises(spark, docs):
    with pytest.raises(ESQLError, match="STATS only|per-group median"):
        _run(
            spark,
            "FROM docs | INLINESTATS m = median_absolute_deviation(n_chars)",
            docs=docs,
        ).collect()


def test_scalar_trig_conversions(spark, docs):
    row = _run(
        spark,
        "FROM docs | EVAL d = round(to_degrees(pi()), 4), "
        "r = round(to_radians(180.0), 6), h = hypot(3.0, 4.0) "
        "| KEEP d, r, h | LIMIT 1",
        docs=docs,
    ).collect()[0]
    assert (row.d, row.h) == (180.0, 5.0)
    assert row.r == pytest.approx(3.141593)


def test_date_extract_and_parse(spark, docs):
    rows = _run(
        spark,
        'FROM docs | EVAL ts = date_parse("yyyy-MM-dd HH:mm:ss", '
        '"2026-03-07 14:09:01"), y = date_extract("year", ts), '
        'h = date_extract("hour_of_day", ts), '
        'dom = date_extract("day_of_month", ts) '
        "| KEEP y, h, dom | LIMIT 1",
        docs=docs,
    ).collect()
    assert (rows[0].y, rows[0].h, rows[0].dom) == (2026, 14, 7)


def test_date_extract_unknown_part_raises(spark, docs):
    with pytest.raises(ESQLError, match="date_extract supports"):
        _run(
            spark,
            'FROM docs | EVAL x = date_extract("fortnight", to_datetime(text))',
            docs=docs,
        )


def test_cidr_match_v4(spark):
    ips = spark.createDataFrame(
        [("10.0.0.7",), ("10.0.1.9",), ("192.168.5.1",), ("8.8.8.8",)],
        "ip string",
    )
    rows = _run(
        spark,
        'FROM ips | WHERE cidr_match(ip, "10.0.0.0/24", "192.168.0.0/16") '
        "| SORT ip ASC",
        ips=ips,
    ).collect()
    assert [r.ip for r in rows] == ["10.0.0.7", "192.168.5.1"]


def test_cidr_match_needs_literal_blocks(spark):
    ips = spark.createDataFrame([("10.0.0.7",)], "ip string")
    with pytest.raises(ESQLError, match="literal"):
        _run(spark, "FROM ips | WHERE cidr_match(ip, ip)", ips=ips)


def test_match_or_and_qstr(spark, docs):
    rows = _run(
        spark,
        'FROM docs | WHERE match(text, "alpha epsilon") | SORT doc_id ASC',
        docs=docs,
    ).collect()
    assert [r.doc_id for r in rows] == [0, 2]
    # qstr is the field-less shorthand over `text`
    rows2 = _run(
        spark,
        'FROM docs | WHERE qstr("alpha epsilon") | SORT doc_id ASC',
        docs=docs,
    ).collect()
    assert [r.doc_id for r in rows2] == [0, 2]


def test_match_and_operator(spark, docs):
    rows = _run(
        spark,
        'FROM docs | WHERE match(text, "zeta theta", "and")',
        docs=docs,
    ).collect()
    assert [r.doc_id for r in rows] == [3]
    none = _run(
        spark,
        'FROM docs | WHERE match(text, "zeta alpha", "and")',
        docs=docs,
    ).collect()
    assert none == []


def test_match_needs_literal_query(spark, docs):
    with pytest.raises(ESQLError, match="literal"):
        _run(spark, "FROM docs | WHERE match(text, text)", docs=docs)


def test_mv_percentile_interpolates(spark, docs):
    rows = _run(
        spark,
        "FROM docs | EVAL a = [10, 20, 30, 40], "
        "p50 = mv_percentile(a, 50), p25 = mv_percentile(a, 25), "
        "p100 = mv_percentile(a, 100), p0 = mv_percentile(a, 0) "
        "| KEEP p50, p25, p100, p0 | LIMIT 1",
        docs=docs,
    ).collect()
    r = rows[0]
    assert (r.p50, r.p25, r.p100, r.p0) == (25.0, 17.5, 40.0, 10.0)


def test_ip_prefix_v4(spark):
    ips = spark.createDataFrame(
        [("10.1.2.3",), ("192.168.77.200",), ("8.8.8.8",)], "ip string"
    )
    rows = _run(
        spark,
        "FROM ips | EVAL p24 = ip_prefix(ip, 24, 128), "
        "p16 = ip_prefix(ip, 16, 128), p32 = ip_prefix(ip, 32, 128) "
        "| SORT ip ASC",
        ips=ips,
    ).collect()
    got = {r.ip: (r.p24, r.p16, r.p32) for r in rows}
    assert got == {
        "10.1.2.3": ("10.1.2.0", "10.1.0.0", "10.1.2.3"),
        "192.168.77.200": ("192.168.77.0", "192.168.0.0", "192.168.77.200"),
        "8.8.8.8": ("8.8.8.0", "8.8.0.0", "8.8.8.8"),
    }


def test_rlike_matches_entire_string(spark):
    """ES|QL RLIKE is a FULL-string match (Lucene RegexpQuery): a bare
    substring pattern matches nothing unless it covers the whole value,
    and . crosses newlines (DOTALL)."""
    from kafka_es_spark.esql import esql_query

    df = spark.createDataFrame(
        [("en",), ("den",), ("e\nn",)], "lang string"
    )
    t = {"langs": df}
    got = esql_query(spark, 'FROM langs | WHERE lang RLIKE "e"', t).collect()
    assert got == []  # partial match must NOT hit "en"/"den"
    got = esql_query(spark, 'FROM langs | WHERE lang RLIKE "en"', t).collect()
    assert [r.lang for r in got] == ["en"]
    got = esql_query(spark, 'FROM langs | WHERE lang RLIKE ".*n"', t).collect()
    assert sorted(r.lang for r in got) == ["den", "e\nn", "en"]


def test_timespan_literals(spark):
    """ES|QL timespan literals (``1 month``, ``30 minutes``) parse as
    span literals usable by date_trunc and bucket — drop-in for real
    ES|QL text, not just the string-duration substitution."""
    from kafka_es_spark.esql import esql_query, ESQLError
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 17, 10, 47, 3),),
         (datetime.datetime(2024, 3, 2, 1, 2, 3),)],
        "ts timestamp",
    )
    t = {"e": df}
    got = esql_query(
        spark, 'FROM e | EVAL m = date_trunc(1 month, ts) | KEEP m', t
    ).collect()
    assert {r.m for r in got} == {datetime.datetime(2024, 3, 1)}
    got = esql_query(
        spark,
        'FROM e | STATS n = count(*) BY b = bucket(ts, 30 minutes) | SORT b',
        t,
    ).collect()
    assert [r.n for r in got] == [1, 1]
    assert got[0].b.minute in (0, 30) and got[0].b.second == 0
    got = esql_query(
        spark, 'FROM e | EVAL h = date_trunc(6 hours, ts) | KEEP h', t
    ).collect()
    assert {r.h.hour for r in got} == {6, 0}
    import pytest as _pt
    with _pt.raises(ESQLError, match="count 1 only"):
        esql_query(spark, 'FROM e | EVAL q = date_trunc(2 months, ts)', t)


def test_hash_functions(spark):
    from kafka_es_spark.esql import esql_query, ESQLError
    import hashlib

    t = {"e": spark.createDataFrame([("abc",)], "s string")}
    r = esql_query(
        spark,
        'FROM e | EVAL m = md5(s), h = hash("sha256", s), s1 = sha1(s)',
        t,
    ).collect()[0]
    assert r.m == hashlib.md5(b"abc").hexdigest()
    assert r.h == hashlib.sha256(b"abc").hexdigest()
    assert r.s1 == hashlib.sha1(b"abc").hexdigest()
    import pytest as _pt
    with _pt.raises(ESQLError, match="algorithm"):
        esql_query(spark, 'FROM e | EVAL x = hash("crc32", s)', t)


def test_log_base_and_negative_round_digits(spark):
    from kafka_es_spark.esql import esql_query

    t = {"e": spark.createDataFrame([(1,)], "x int")}
    r = esql_query(
        spark,
        'FROM e | EVAL lg = log(2.0, 8.0), ln = log(e()), '
        'rn = round(1234567.891, -3), r2 = round(1234567.891, 2)',
        t,
    ).collect()[0]
    assert r.lg == pytest.approx(3.0)
    assert r.ln == pytest.approx(1.0)
    assert r.rn == pytest.approx(1235000.0)
    assert r.r2 == pytest.approx(1234567.89)
