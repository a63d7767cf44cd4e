"""Round-4 batch-D surface: exists/missing field semantics, match_all /
global agg scope, ids-filtered scoring, and simple_query_string.

Each test pins the semantic edge the operator exists for — absent-row ≡
null (exists over an external relation), filters never touch scoring
stats (exists_filter_topk score identity), the global-scope denominator
(agg_global vs agg_stats), unknown-id tolerance (ids_topk), and the
lenient operator grammar (simple_query_string vs the bool-equivalent
topk calls).
"""

import pytest

from pyspark.sql import functions as F

from kafka_es_spark.operators.wand import Searcher
from kafka_es_spark.plans.build_index import build_index

SEG_BITS = 6


@pytest.fixture(scope="module")
def idx(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx4d"))
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
def sparse_field(spark, pages):
    """External (url, rating) relation: ~1/3 null, ~1/3 ABSENT (no row),
    rest valued — exercises the absent-row ≡ null contract."""
    return (
        pages.select("url", F.xxhash64("url").alias("h"))
        .filter(F.pmod("h", F.lit(3)) != 0)  # 1/3 of urls have no row
        .select(
            "url",
            F.when(F.pmod("h", F.lit(3)) == 1, F.pmod("h", F.lit(100)))
            .cast("double").alias("rating"),  # mod 3 == 2 -> null
        )
    )


def test_match_all_ids_is_live_corpus(spark, pages, searcher):
    assert searcher.match_all_ids().count() == pages.count()


def test_exists_ids_external_absent_is_null(spark, pages, searcher, sparse_field):
    got = {r.doc_id for r in searcher.exists_ids("rating", sparse_field).collect()}
    dm = spark.read.parquet(searcher.index_dir + "/docmap").select("doc_id", "url")
    want = {
        r.doc_id
        for r in dm.join(
            sparse_field.filter(F.col("rating").isNotNull()), "url"
        ).collect()
    }
    assert got == want and 0 < len(got) < pages.count()


def test_exists_ids_stored_field(searcher, pages):
    # lang is stored and never null in the generator -> exists == corpus
    assert searcher.exists_ids("lang").count() == pages.count()


def test_exists_filter_topk_scores_unchanged(spark, searcher, sparse_field):
    """Filter context: surviving docs keep their UNFILTERED BM25 score
    (index-level idf/avgdl)."""
    q = "data index search"
    full = {r.doc_id: r.score for r in searcher.topk(q, k=400).collect()}
    keep = {r.doc_id for r in searcher.exists_ids("rating", sparse_field).collect()}
    got = searcher.exists_filter_topk(q, "rating", sparse_field, k=10).collect()
    assert len(got) == 10
    want = sorted(
        ((d, s) for d, s in full.items() if d in keep),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r.doc_id, r.score) for r in got] == want


def test_agg_missing_counts_null_and_absent(spark, searcher, sparse_field):
    q = "data index search"
    hits = {r.doc_id for r in searcher.matching_doc_ids(q).collect()}
    have = {r.doc_id for r in searcher.exists_ids("rating", sparse_field).collect()}
    want = len(hits - have)
    got = searcher.agg_missing(q, "rating", sparse_field).collect()[0].doc_count
    assert got == want and want > 0


def test_agg_global_ignores_query(spark, pages, searcher, sparse_field):
    row = searcher.agg_global("rating", sparse_field).collect()[0]
    vals = [
        r.rating
        for r in sparse_field.filter(F.col("rating").isNotNull()).collect()
    ]
    assert row.n_docs_agg == len(vals)
    assert row.min_v == min(vals) and row.max_v == max(vals)
    assert row.sum_v == int(sum(vals))


def test_ids_topk_restricts_and_tolerates_unknown(spark, pages, searcher):
    q = "data index search"
    full = {r.doc_id: r.score for r in searcher.topk(q, k=400).collect()}
    dm = spark.read.parquet(searcher.index_dir + "/docmap").select("doc_id", "url")
    urls = [r.url for r in dm.filter(F.col("doc_id") < 40).collect()]
    got = searcher.ids_topk(q, urls + ["doc://nope"], k=5).collect()
    want = sorted(
        ((d, s) for d, s in full.items() if d < 40),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r.doc_id, r.score) for r in got] == want


# --- simple_query_string ------------------------------------------------


def test_sqs_bare_or_equals_topk(searcher):
    q = "data index search"
    a = [(r.doc_id, r.score) for r in
         searcher.simple_query_string_topk(q, k=10).collect()]
    b = [(r.doc_id, r.score) for r in searcher.topk(q, k=10).collect()]
    assert a == b


def test_sqs_default_and_equals_mode_and(searcher):
    q = "data index"
    a = [(r.doc_id, r.score) for r in
         searcher.simple_query_string_topk(
             q, default_operator="and", k=10).collect()]
    b = [(r.doc_id, r.score) for r in
         searcher.topk(q, k=10, mode="and").collect()]
    assert a == b


def test_sqs_negation_equals_must_not(searcher):
    a = [(r.doc_id, r.score) for r in
         searcher.simple_query_string_topk("data index -search", k=10).collect()]
    b = [(r.doc_id, r.score) for r in
         searcher.topk("data index", k=10, must_not="search").collect()]
    assert a == b


def test_sqs_or_group_under_and(searcher):
    """'data (search|query)' with AND: every hit has data AND >= 1 of
    search/query; scores include every matched positive term."""
    got = searcher.simple_query_string_topk(
        "data search|query", default_operator="and", k=400
    )
    ids = {r.doc_id for r in got.collect()}
    need_data = {r.doc_id for r in searcher.matching_doc_ids("data").collect()}
    need_sq = {r.doc_id for r in searcher.matching_doc_ids("search query").collect()}
    assert ids == (need_data & need_sq) and ids


def test_sqs_phrase_gates_under_and(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx4dp"))
    build_index(spark, pages, d, seg_bits=SEG_BITS, n_term_buckets=8)
    from kafka_es_spark.operators.positions import (
        build_position_index, phrase_match_ids,
    )

    build_position_index(spark, pages, d)
    s = Searcher(spark, d, cache=False)

    got = {
        r.doc_id
        for r in s.simple_query_string_topk(
            'data "index search"', default_operator="and", k=400
        ).collect()
    }
    pm = {r.doc_id for r in phrase_match_ids(spark, d, "index search").collect()}
    dd = {r.doc_id for r in s.matching_doc_ids("data").collect()}
    assert got == (pm & dd)


def test_sqs_prefix_expansion(searcher):
    """'sear*' expands alphabetically against the dictionary and scores
    as OR — at minimum it retrieves everything 'search' retrieves."""
    got = {r.doc_id for r in
           searcher.simple_query_string_topk("sear*", k=400).collect()}
    want = {r.doc_id for r in searcher.matching_doc_ids("search").collect()}
    assert want <= got


# --- Bloom filter / Count-Min sketch -------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from kafka_es_spark.functions.sketches import (
        bloom_bits, bloom_maybe_contains,
    )

    members = spark.range(0, 300).select(
        F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    bits = bloom_bits(members, "v", m_bits=4096, k=4)
    assert bits.count() <= 4096
    # every member reports maybe=True (one-sided error)
    got = bloom_maybe_contains(members, "v", bits, 4096, 4).collect()
    assert all(r.maybe for r in got) and len(got) == 300
    # non-members: false-positive rate well under 50% at this sizing
    # ((1 - e^(-4*300/4096))^4 ~ 0.4%)
    probes = spark.range(1000, 1400).select(
        F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    fp = sum(
        1 for r in bloom_maybe_contains(probes, "v", bits, 4096, 4).collect()
        if r.maybe
    )
    assert fp <= 20


def test_bloom_merge_is_union_distinct(spark):
    from kafka_es_spark.functions.sketches import (
        bloom_bits, bloom_maybe_contains,
    )

    a = spark.range(0, 50).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(0, 50).select(F.concat(F.lit("b"), F.col("id")).alias("v"))
    merged = bloom_bits(a, "v", 2048, 3).union(
        bloom_bits(b, "v", 2048, 3)
    ).distinct()
    direct = bloom_bits(a.union(b), "v", 2048, 3)
    assert {r.bit for r in merged.collect()} == {r.bit for r in direct.collect()}


def test_cms_overestimates_never_under(spark):
    from kafka_es_spark.functions.sketches import (
        cms_counters, cms_point_estimates,
    )

    # planted skew: value 'hot' x 500, 200 singletons
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(7)
    counters = cms_counters(df, "v", w=256, d=4)
    probes = spark.createDataFrame(
        [("hot",), ("cold7",), ("absent",)], "v string"
    )
    est = {r.value: r.estimate for r in
           cms_point_estimates(probes, "v", counters, w=256, d=4).collect()}
    assert est["hot"] >= 500         # never underestimates
    assert est["cold7"] >= 1
    assert est["absent"] >= 0        # may false-positive but never negative


def test_cms_merge_and_heavy_hitters(spark):
    from kafka_es_spark.functions.sketches import (
        cms_counters, cms_heavy_hitters, cms_point_estimates,
    )

    rows = [("hot",)] * 300 + [(f"c{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "v string")
    half1, half2 = df.randomSplit([0.5, 0.5], seed=7)
    merged = (
        cms_counters(half1, "v", w=512, d=3)
        .union(cms_counters(half2, "v", w=512, d=3))
        .groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_counters(df, "v", w=512, d=3)
    probe = spark.createDataFrame([("hot",)], "v string")
    em = cms_point_estimates(probe, "v", merged, w=512, d=3).collect()[0].estimate
    ed = cms_point_estimates(probe, "v", direct, w=512, d=3).collect()[0].estimate
    assert em == ed
    hh = {r.value for r in
          cms_heavy_hitters(df, "v", w=512, d=3, threshold=200).collect()}
    assert "hot" in hh
    # superset property: every true >= 200 value is present (only 'hot' is)


# --- analyzer filter chain (stopwords / s-stemmer / asciifolding) ---------


def test_analyze_tokens_filter_chain(spark):
    from kafka_es_spark.functions.tokenize import (
        LUCENE_EN_STOPWORDS, analyze_tokens, analyze_py,
    )

    df = spark.createDataFrame(
        [("The Flies and the CLASSES of Zürich's buses, cats & misses",)],
        "text string",
    )
    got = df.select(
        analyze_tokens(
            "text", stopwords=LUCENE_EN_STOPWORDS, stem=True, ascii_fold=True
        ).alias("t")
    ).collect()[0].t
    # the(stop) flies->fly and(stop) the(stop) classes->classe of(stop)
    # zürich->zurich s buses->buse cats->cat misses->misse
    assert got == ["fly", "classe", "zurich", "s", "buse", "cat", "misse"]
    # python mirror is identical (query-time analysis contract)
    assert got == analyze_py(
        "The Flies and the CLASSES of Zürich's buses, cats & misses",
        stopwords=LUCENE_EN_STOPWORDS, stem=True, ascii_fold=True,
    )


def test_analyze_stemmer_guards(spark):
    from kafka_es_spark.functions.tokenize import analyze_py

    # rule guards: eies/aies keep ies via rule1 but fall to rule2;
    # aes/ees/oes blocked in rule2 fall to rule3; us/ss never stem
    assert analyze_py("bus miss grass", stem=True) == ["bus", "miss", "grass"]
    assert analyze_py("goes sees", stem=True) == ["goe", "see"]
    # goes: rule2 blocked (oes) -> rule3 drops s; sees: blocked (ees) -> rule3
    assert analyze_py("flies babies", stem=True) == ["fly", "baby"]


def test_analyze_duckdb_parity(spark):
    import duckdb

    from kafka_es_spark.functions.tokenize import (
        LUCENE_EN_STOPWORDS, analyze_tokens, duckdb_analyze_sql,
    )

    texts = [
        "The Flies and the CLASSES of Zürich's buses, cats & misses",
        "Ålesund crêpes — naïve reactions; gases pass the press",
        "这 是 测试 tokens123 and numbers 42s",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r.t
        for r in df.select(
            analyze_tokens(
                "text", stopwords=LUCENE_EN_STOPWORDS, stem=True,
                ascii_fold=True,
            ).alias("t")
        ).collect()
    ]
    con = duckdb.connect()
    sql = duckdb_analyze_sql(
        "t", stopwords=LUCENE_EN_STOPWORDS, stem=True, ascii_fold=True
    )
    want = [
        con.sql(f"SELECT {sql} AS a FROM (SELECT ? AS t)", params=[t]).fetchone()[0]
        for t in texts
    ]
    assert got == want


# --- rollover --------------------------------------------------------------


def test_rollover_conditions_and_generation(spark, pages, idx, tmp_path):
    """ES _rollover parity: condition probe (dry run), generation naming,
    alias repoint on met conditions via the caller's build, no-op when
    conditions miss."""
    import os

    from kafka_es_spark.plans.aliases import (
        next_generation, resolve_alias, rollover, set_alias,
    )
    from kafka_es_spark.plans.build_index import build_index as _bi

    assert next_generation("/x/idx-000001") == "/x/idx-000002"
    assert next_generation("/x/idx-000009") == "/x/idx-000010"
    assert next_generation("/x/myidx") == "/x/myidx-000002"

    repo = str(tmp_path / "rollrepo")
    gen1 = str(tmp_path / "gen-000001")
    os.symlink(idx, gen1)  # reuse the built module index as generation 1
    set_alias(repo, "writes", gen1)

    # conditions not met -> report only
    out = rollover(repo, "writes", max_docs=10_000_000)
    assert out["conditions_met"] == [] and not out["rolled_over"]
    assert resolve_alias(repo, "writes") == os.path.abspath(gen1)

    # dry run with met conditions -> still no action
    out = rollover(repo, "writes", max_docs=1, dry_run=True,
                   build_new=lambda d: (_ for _ in ()).throw(AssertionError))
    assert out["conditions_met"] == ["max_docs"] and out["dry_run"]
    assert not out["rolled_over"]

    # met + build_new -> new generation built and alias repointed
    built = []

    def build_gen(d):
        built.append(d)
        _bi(spark, pages.limit(50), d, seg_bits=SEG_BITS, n_term_buckets=8)

    out = rollover(repo, "writes", build_gen, max_docs=1, max_age_s=0.0)
    assert out["rolled_over"] and set(out["conditions_met"]) == {
        "max_docs", "max_age"}
    assert built == [out["new_index"]]
    assert out["new_index"].endswith("gen-000002")
    assert resolve_alias(repo, "writes") == os.path.abspath(out["new_index"])


# --- planted-neighbor recall tripwire for the non-portable LSH ANN path ---


def test_lsh_ann_planted_neighbor_recall(spark):
    """A near-duplicate (cos ~ 0.998) of each query is planted in an
    otherwise-random corpus; the default (non-portable) LSH path must
    recover >= 90% of the planted neighbors at k=1 — a meaningfully
    sensitive bar (the isotropic-corpus test can't exceed ~0.4 by
    construction, this one fails loudly if bucketing breaks)."""
    import numpy as np

    from kafka_es_spark.operators.similarity import lsh_ann_topk

    rng = np.random.default_rng(11)
    dim, n_q, n_noise = 16, 20, 400
    rows = []
    for q in range(n_q):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        dup = v + rng.normal(scale=0.03, size=dim)  # cos ~ 0.998
        rows.append((q, [float(x) for x in v]))
        rows.append((1000 + q, [float(x) for x in dup]))
    for i in range(n_noise):
        v = rng.normal(size=dim)
        rows.append((2000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {}
    out = lsh_ann_topk(emb, queries, k=2, n_planes=8, n_tables=6)
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    # top-2 because the query vector itself is in the corpus at rank 1
    hits = sum(1 for q in range(n_q) if (1000 + q) in got.get(q, set()))
    assert hits / n_q >= 0.9, (hits, n_q)


# --- knn similarity cutoff / random_sampler / fingerprint analyzer --------


def test_cosine_topk_similarity_cutoff(spark):
    from kafka_es_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    # without cutoff: 3 neighbors; with 0.5 cutoff only vec 1 survives
    assert cosine_topk(emb, q, k=5).count() == 3
    got = cosine_topk(emb, q, k=5, similarity=0.5).collect()
    assert [(r.vec_id, r.rank) for r in got] == [(1, 1)]


def test_agg_random_sampler_scaling_and_determinism(spark, searcher, pages):
    fv = pages.select("url", F.length("text").alias("n_chars"))
    a = searcher.agg_random_sampler(
        "data", "n_chars", fv, probability=0.5, seed=3
    ).collect()[0]
    b = searcher.agg_random_sampler(
        "data", "n_chars", fv, probability=0.5, seed=3
    ).collect()[0]
    assert a == b  # deterministic: same seed, same sample
    full = searcher.match_count("data").collect()[0].n_hits
    # Horvitz-Thompson scaling: estimate within 35% of truth at p=0.5
    assert a.doc_count_est == a.sampled_docs * 2
    assert abs(a.doc_count_est - full) / full < 0.35
    # p=1 degenerates to the exact hit count
    c = searcher.agg_random_sampler(
        "data", "n_chars", fv, probability=1.0, seed=3
    ).collect()[0]
    assert c.sampled_docs == full == c.doc_count_est
    with pytest.raises(ValueError, match="probability"):
        searcher.agg_random_sampler("data", "n_chars", fv, probability=0.0)


def test_fingerprint_analyzer_normalizes(spark):
    from kafka_es_spark.functions.tokenize import fingerprint_analyzer

    df = spark.createDataFrame(
        [("The  quick, THE QUICK brown-fox",), ("brown fox quick the",)],
        "text string",
    )
    got = [r.f for r in df.select(
        fingerprint_analyzer("text").alias("f")).collect()]
    # both rows normalize to the same clustering key
    assert got[0] == got[1] == "brown fox quick the"


# --- ip_range agg / field_caps / validate_query ---------------------------


def test_ipv4_to_long_parity(spark):
    from kafka_es_spark.functions.textstats import (
        duckdb_ipv4_sql, ipv4_to_long, ipv4_to_long_py,
    )
    import duckdb

    ips = ["0.0.0.0", "10.128.3.7", "255.255.255.255", "192.168.1.1"]
    df = spark.createDataFrame([(i,) for i in ips], "ip string")
    got = [r.v for r in df.select(ipv4_to_long("ip").alias("v")).collect()]
    want = [ipv4_to_long_py(i) for i in ips]
    assert got == want
    con = duckdb.connect()
    dd = [
        con.sql(
            f"SELECT {duckdb_ipv4_sql('ip')} AS v FROM (SELECT ? AS ip)",
            params=[i],
        ).fetchone()[0]
        for i in ips
    ]
    assert dd == want
    import ipaddress
    assert want == [int(ipaddress.IPv4Address(i)) for i in ips]


def test_agg_ip_range_buckets(spark, searcher, pages):
    fv = pages.select(
        "url",
        F.concat_ws(
            ".", F.lit("10"),
            (F.pmod(F.xxhash64("url"), F.lit(128)) + 128).cast("string"),  # 128..255
            F.lit("0"), F.lit("1"),
        ).alias("ip"),
    )
    out = {r.range_key: r.doc_count for r in searcher.agg_ip_range(
        "data", fv, "ip",
        ["10.0.0.0/9", ("10.128.0.0", None), ("10.0.0.0", "10.128.0.0")],
    ).collect()}
    n = searcher.match_count("data").collect()[0].n_hits
    # all synthesized ips are >= 10.128.0.0: CIDR /9 covers 10.0-10.127
    assert out["10.0.0.0/9"] == 0
    assert out["10.128.0.0-*"] == n
    assert out["10.0.0.0-10.128.0.0"] == 0


def test_field_caps_and_validate_query(searcher):
    caps = {r.field: r for r in searcher.field_caps().collect()}
    assert caps["text"].searchable and not caps["text"].aggregatable
    assert caps["url"].stored and caps["dl"].aggregatable
    assert caps["lang"].aggregatable  # stored at build in this fixture

    v = searcher.validate_query("Data AND Search", mode="and")
    assert v["valid"] and "data" in v["terms"] and "and" in v["terms"]
    assert set(v["indexed_terms"]) <= set(v["terms"])
    assert v["explanation"].startswith("text:")
    bad = searcher.validate_query("!!! ...")
    assert not bad["valid"] and "no terms" in bad["error"]


# --- BPE tokenizer training ------------------------------------------------


def _py_bpe_reference(word_counts, n_merges, min_count=2):
    """Straight-line Sennrich reference for parity (no Spark)."""
    vocab = {}
    for w, n in word_counts.items():
        if n >= min_count:
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + n
    merges = []
    for _ in range(n_merges):
        counts = {}
        for seq, n in vocab.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        a, b = pair
        nv = {}
        for seq, n in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(seq[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


def test_train_bpe_matches_reference_and_is_deterministic(spark):
    from collections import Counter

    from kafka_es_spark.operators.cooccur import train_bpe

    texts = [
        "low lower lowest low low",
        "newer newest new news low",
        "wider wide widest newer lower",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wc = Counter(w for t in texts for w in t.split())
    want = _py_bpe_reference(wc, n_merges=12)
    got = train_bpe(docs, n_merges=12)
    assert got == want and len(got) == 12
    # parallelism invariance (the corpus pass is one hash agg)
    got13 = train_bpe(docs.repartition(13), n_merges=12)
    assert got13 == got


def test_train_bpe_vocab_cap_raises(spark):
    from kafka_es_spark.operators.cooccur import train_bpe

    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b") for i in range(30)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_bpe(docs, n_merges=2, min_count=1, max_vocab_rows=10)


def test_bpe_encode_applies_merge_ranks(spark):
    from kafka_es_spark.operators.cooccur import bpe_encode, train_bpe

    texts = ["aaab aaab aaab", "ab ab aaab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=3, min_count=1)
    out = {r.doc_id: r.pieces for r in bpe_encode(docs, merges).collect()}
    # encoding is greedy by merge RANK; pieces re-concatenate to the text
    for i, t in enumerate(texts):
        assert "".join(out[i]) == t.replace(" ", "")
    # the most frequent pair merged first => 'aaab' compresses
    assert len(out[0]) < 4 * 3
    # no merges -> raw characters
    raw = {r.doc_id: r.pieces for r in bpe_encode(docs, []).collect()}
    assert raw[1] == list("ab") + list("ab") + list("aaab")


# --- geo_line ---------------------------------------------------------------


def test_geo_line_orders_caps_and_flags(spark):
    import datetime as dt

    from kafka_es_spark.operators.sessions import geo_line

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, m), float(m), float(-m))
        for m in range(5)
    ] + [(2, dt.datetime(2024, 1, 1, 9, 0), 7.0, 8.0)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, lon double, lat double"
    ).repartition(5)
    out = {r.key: r for r in geo_line(
        ev, key_col="user_id", size=3).collect()}
    # user 1: ts-ordered, capped at 3 of 5, truncated
    assert out[1].line == [[0.0, -0.0], [1.0, -1.0], [2.0, -2.0]]
    assert out[1].n_points == 3 and out[1].truncated
    # user 2: single point, not truncated
    assert out[2].line == [[7.0, 8.0]] and not out[2].truncated


# --- the _search request body (JSON Query DSL) -----------------------------


def _dsl(searcher, body, **kw):
    from kafka_es_spark.operators.searchapi import search

    return search(searcher, body, **kw)


def test_dsl_match_or_equals_topk(searcher):
    got = [(r.doc_id, r.score) for r in _dsl(
        searcher, {"query": {"match": {"text": "data index"}}, "size": 10}
    ).collect()]
    want = [(r.doc_id, r.score) for r in searcher.topk("data index", k=10).collect()]
    assert got == want


def test_dsl_match_operator_and(searcher):
    got = [(r.doc_id, r.score) for r in _dsl(
        searcher,
        {"query": {"match": {"text": {"query": "data index",
                                      "operator": "and"}}}, "size": 10},
    ).collect()]
    want = [(r.doc_id, r.score) for r in
            searcher.topk("data index", k=10, mode="and").collect()]
    assert got == want


def test_dsl_bool_must_filter_not(spark, searcher):
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": "data index"}}],
            "filter": [{"range": {"dl": {"gte": 20, "lt": 60}}}],
            "must_not": [{"term": {"text": "search"}}],
        }},
        "size": 400,
    }
    got = {r.doc_id: r.score for r in _dsl(searcher, body).collect()}
    full = {r.doc_id: r.score for r in
            searcher.topk("data index", k=400, must_not="search").collect()}
    dm = spark.read.parquet(searcher.index_dir + "/docmap").select("doc_id", "dl")
    dl_ok = {r.doc_id for r in dm.filter("dl >= 20 and dl < 60").collect()}
    want = {d: s for d, s in full.items() if d in dl_ok}
    assert got == want and got


def test_dsl_bool_should_sums_clauses(searcher):
    body = {
        "query": {"bool": {"should": [
            {"match": {"text": "data"}},
            {"match": {"text": "index"}},
        ]}},
        "size": 10,
    }
    got = [(r.doc_id, r.score) for r in _dsl(searcher, body).collect()]
    want = [(r.doc_id, r.score) for r in searcher.topk("data index", k=10).collect()]
    assert got == want


def test_dsl_should_msm_two_of_three(searcher):
    body = {
        "query": {"bool": {
            "should": [
                {"match": {"text": "data"}},
                {"match": {"text": "index"}},
                {"match": {"text": "search"}},
            ],
            "minimum_should_match": 2,
        }},
        "size": 400,
    }
    ids = {r.doc_id for r in _dsl(searcher, body).collect()}
    want = {r.doc_id for r in searcher.matching_doc_ids(
        "data index search", min_should_match=2).collect()}
    assert ids == want and ids


def test_dsl_gated_should_no_partial_leak(searcher):
    """A should clause with operator=and contributes NOTHING to docs
    matching only one of its terms."""
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": "data"}}],
            "should": [{"match": {"text": {"query": "index search",
                                           "operator": "and"}}}],
        }},
        "size": 400,
    }
    got = {r.doc_id: r.score for r in _dsl(searcher, body).collect()}
    only_data = {r.doc_id: r.score for r in
                 searcher.topk("data", k=400).collect()}
    both = {r.doc_id for r in searcher.matching_doc_ids(
        "index search", mode="and").collect()}
    has_one = {r.doc_id for r in searcher.matching_doc_ids(
        "index search").collect()}
    partial = (has_one - both) & set(only_data)
    assert partial, "fixture must contain partial matches"
    for d in partial:
        assert got[d] == only_data[d]  # no leaked contribution
    full3 = {r.doc_id: r.score for r in
             searcher.topk("data index search", k=400).collect()}
    for d in (both & set(only_data)):
        assert got[d] == full3[d]  # fully-matched should adds both terms


def test_dsl_constant_score_exists_ids_match_all(spark, searcher, pages, sparse_field):
    # constant_score over exists
    body = {"query": {"constant_score": {
        "filter": {"exists": {"field": "lang"}}, "boost": 2.5}},
        "size": 500}
    got = _dsl(searcher, body).collect()
    assert len(got) == pages.count() and all(r.score == 2.5 for r in got)
    # ids in filter context
    dm = spark.read.parquet(searcher.index_dir + "/docmap")
    urls = [r.url for r in dm.limit(3).collect()]
    body = {"query": {"bool": {
        "must": [{"match_all": {}}],
        "filter": [{"ids": {"values": urls}}],
    }}}
    assert _dsl(searcher, body).count() == 3


def test_dsl_phrase_filter_and_toplevel_delegation(spark, pages, tmp_path_factory):
    from kafka_es_spark.operators.positions import (
        build_position_index, phrase_match_ids, phrase_topk,
    )

    d = str(tmp_path_factory.mktemp("idxdsl"))
    build_index(spark, pages, d, seg_bits=SEG_BITS, n_term_buckets=8)
    build_position_index(spark, pages, d)
    s = Searcher(spark, d, cache=False)
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "filter": [{"match_phrase": {"text": "index search"}}],
    }}, "size": 400}
    ids = {r.doc_id for r in _dsl(s, body).collect()}
    pm = {r.doc_id for r in phrase_match_ids(spark, d, "index search").collect()}
    dd = {r.doc_id for r in s.matching_doc_ids("data").collect()}
    assert ids == (pm & dd)
    # top-level match_phrase delegates to phrase-weighted BM25 (ES serves
    # it as a scoring query): rank/score identity vs positions.phrase_topk
    got = [(r.doc_id, r.score) for r in _dsl(
        s, {"query": {"match_phrase": {"text": "index search"}}, "size": 10}
    ).collect()]
    want = [(r.doc_id, r.score) for r in
            phrase_topk(spark, d, "index search", k=10).collect()]
    assert got == want and len(got) > 0


def test_dsl_unsupported_clause_raises(searcher):
    from kafka_es_spark.operators.searchapi import DSLError

    with pytest.raises(DSLError, match="unsupported"):
        _dsl(searcher, {"query": {"fancy_new_clause": {}}})
    # a query-less body defaults to match_all (ES behavior)
    got = [(r.doc_id, r.score) for r in _dsl(searcher, {"size": 3}).collect()]
    want = [(r.doc_id, r.score) for r in _dsl(
        searcher, {"query": {"match_all": {}}, "size": 3}
    ).collect()]
    assert got == want and len(got) == 3


def test_dsl_knn_and_hybrid_guard(spark, searcher):
    from kafka_es_spark.operators.searchapi import DSLError

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = _dsl(
        searcher,
        {"knn": {"query_vector": [1.0, 0.0], "k": 2}},
        embeddings=emb,
    ).collect()
    assert [r.vec_id for r in got] == [0, 1] and got[0].cos == 1.0
    with pytest.raises(DSLError, match="rrf_fuse"):
        _dsl(
            searcher,
            {"query": {"match": {"text": "data"}},
             "knn": {"query_vector": [1.0, 0.0]}},
            embeddings=emb,
        )
    with pytest.raises(DSLError, match="embeddings"):
        _dsl(searcher, {"knn": {"query_vector": [1.0, 0.0]}})


def test_dsl_aggs_over_full_hit_set(spark, searcher):
    body = {
        "query": {"match": {"text": "data index"}},
        "size": 2,  # aggs must ignore the page size
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 5}}},
    }
    got = {r.value: r.doc_count for r in _dsl(searcher, body).collect()}
    want = {
        r.lang: r.doc_count
        for r in searcher.facet_terms(
            "data index", None, "lang", size=5
        ).collect()
    }
    assert got == want and sum(got.values()) > 2
    stats = _dsl(
        searcher,
        {"query": {"match": {"text": "data"}},
         "aggs": {"s": {"stats": {"field": "dl"}}}},
    ).collect()[0]
    assert stats.n_docs_agg == searcher.match_count("data").collect()[0].n_hits


def test_dsl_wildcard_fuzzy_regexp_and_sort_from(spark, searcher):
    # wildcard == wildcard_topk expansion semantics
    got = {r.doc_id: r.score for r in _dsl(
        searcher, {"query": {"wildcard": {"text": "sea*"}}, "size": 400}
    ).collect()}
    want_ids = {r.doc_id for r in searcher.matching_doc_ids("search").collect()}
    assert want_ids <= set(got)
    # fuzzy: 1-edit neighbors of 'dat' include 'data'
    f = {r.doc_id for r in _dsl(
        searcher,
        {"query": {"fuzzy": {"text": {"value": "dat", "fuzziness": 1}}},
         "size": 400},
    ).collect()}
    assert {r.doc_id for r in searcher.matching_doc_ids("data").collect()} <= f
    # regexp anchored
    rx = {r.doc_id for r in _dsl(
        searcher, {"query": {"regexp": {"text": "se.rch"}}, "size": 400}
    ).collect()}
    assert rx == {r.doc_id for r in searcher.matching_doc_ids("search").collect()}
    # sort by stored dl desc + from pagination: page2 continues page1
    body = {"query": {"match": {"text": "data"}},
            "sort": [{"dl": {"order": "desc"}}], "size": 5}
    p1 = _dsl(searcher, body).collect()
    p2 = _dsl(searcher, {**body, "from": 5}).collect()
    allr = _dsl(searcher, {**body, "size": 10}).collect()
    assert [(r.doc_id, r.dl) for r in p1 + p2] == [
        (r.doc_id, r.dl) for r in allr]
    assert all(p1[i].dl >= p1[i + 1].dl for i in range(len(p1) - 1))
    # from without sort pages the score ranking
    s1 = _dsl(searcher, {"query": {"match": {"text": "data"}}, "size": 3})
    s2 = _dsl(searcher, {"query": {"match": {"text": "data"}},
                         "from": 3, "size": 3})
    both = [(r.doc_id, r.score) for r in s1.collect() + s2.collect()]
    top6 = [(r.doc_id, r.score) for r in searcher.topk("data", k=6).collect()]
    assert both == top6
