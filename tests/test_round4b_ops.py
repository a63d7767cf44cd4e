"""Round-4 batch-B query surface: span_not, nested query, geo_distance,
geotile_grid, HLL cardinality sketch, completion suggester.

Each test pins the semantic edge its operator exists for — the window veto
and its doc-boundary mask (span_not), per-element vs flattened matching
(nested), the radius cut + nearest-first order (geo_distance), Mercator
clamp (geotile), both HLL estimator branches + sketch mergeability, and
fuzzy-prefix/dedup rules (completion).
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from kafka_es_spark.plans.build_index import build_index, prepare_docs


def _mk_pages(spark, texts):
    rows = [
        (f"u{i:03d}", "2025-01-01 00:00:00", None, t, "en")
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, lang string"
    ).select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"), "html", "text", "lang"
    )


# --- span_not ---------------------------------------------------------------


def test_span_not_window_semantics(spark, pages, tmp_path):
    """Rank-identity vs a brute-force veto scorer on the generated corpus:
    an include occurrence dies iff the exclude term sits in [p-pre, p+post]."""
    from kafka_es_spark.operators.positions import (
        build_position_index, span_not_topk,
    )
    from kafka_es_spark.operators.wand import round_half_up

    d = str(tmp_path / "idxsn")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=4)
    build_position_index(spark, pages, d)
    toks = {
        r["doc_id"]: list(r["terms"])
        for r in prepare_docs(pages).select("doc_id", "terms").collect()
    }
    inc, exc, pre, post = "data", "the", 1, 1
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = sum(1 for t in toks.values() if inc in t)
    w = math.log(1 + (n - df + 0.5) / (df + 0.5))
    want = {}
    vetoed_any = False
    for doc, ts in toks.items():
        exc_pos = {p for p, t in enumerate(ts) if t == exc}
        tf = 0
        for p, t in enumerate(ts):
            if t != inc:
                continue
            if any(q in exc_pos for q in range(p - pre, p + post + 1)):
                vetoed_any = True
                continue
            tf += 1
        if tf:
            sc = w * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
            want[doc] = float(round_half_up(np.array([sc]), 4)[0])
    top = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in span_not_topk(
            spark, d, inc, exc, pre=pre, post=post, k=10
        ).collect()
    ]
    assert got == top
    assert vetoed_any, "premise: the window vetoes at least one occurrence"


def test_span_not_doc_boundary_mask(spark, tmp_path):
    """An exclude term at the START of the next doc must not veto an
    include occurrence at the END of the previous one (key-shift wrap)."""
    from kafka_es_spark.operators.positions import (
        build_position_index, span_not_topk,
    )

    # doc0 ends with 'data'; doc1 begins with 'query' — dense doc ids are
    # url-ordered, so the keys are position-adjacent across the boundary
    pages = _mk_pages(spark, ["alpha beta data", "query gamma delta"])
    d = str(tmp_path / "idxb")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    build_position_index(spark, pages, d)
    got = span_not_topk(spark, d, "data", "query", pre=2, post=2, k=5).collect()
    assert len(got) == 1, "the boundary-crossing exclude must not veto"
    # and a genuine same-doc veto does kill it
    pages2 = _mk_pages(spark, ["alpha data query", "gamma delta epsilon"])
    d2 = str(tmp_path / "idxb2")
    build_index(spark, pages2, d2, seg_bits=6, n_term_buckets=2)
    build_position_index(spark, pages2, d2)
    assert span_not_topk(
        spark, d2, "data", "query", pre=2, post=2, k=5
    ).collect() == []


# --- nested query -----------------------------------------------------------


def test_nested_is_per_element_not_flattened(spark, tmp_path):
    """The defining nested-type semantics: a doc with kind='a' in one
    element and size>=70 in ANOTHER must NOT match."""
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, ["common one", "common two", "common three"])
    d = str(tmp_path / "idxn")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [
            ("u000", [("a", 80), ("b", 5)]),     # one element satisfies both
            ("u001", [("a", 10), ("b", 90)]),    # flattened-match trap
            ("u002", [("a", 70), ("a", 99)]),    # two matching elements
        ],
        "url string, items array<struct<kind string, size long>>",
    )
    out = {
        r["url"]: r["score"]
        for r in Searcher(spark, d, cache=False).nested_topk(
            "common", fv, "items", "x.kind = 'a' AND x.size >= 70", k=10
        ).collect()
    }
    assert out == {"u000": 1, "u002": 2}


# --- geo_distance -----------------------------------------------------------


def test_geo_distance_radius_and_order(spark, tmp_path):
    """Haversine distances match the closed form; outside-radius docs drop;
    nearest-first ordering holds."""
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, ["common a", "common b", "common c", "common d"])
    d = str(tmp_path / "idxg")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    pts = [("u000", 48.8566, 2.3522),   # Paris
           ("u001", 51.5074, -0.1278),  # London (~344 km from Paris)
           ("u002", 40.7128, -74.0060),  # New York (out of radius)
           ("u003", 48.8566, 2.3522)]   # co-located with origin
    fv = spark.createDataFrame(pts, "url string, lat double, lon double")
    out = Searcher(spark, d, cache=False).geo_distance(
        "common", fv, "lat", "lon", 48.8566, 2.3522, 1000.0, k=10
    ).collect()
    urls = [r["url"] for r in out]
    assert set(urls) == {"u000", "u001", "u003"}
    # co-located points first (0 km), London last
    assert urls[-1] == "u001"
    rad = 3.141592653589793 / 180.0

    def hav(la1, lo1, la2, lo2):
        la1, lo1, la2, lo2 = la1 * rad, lo1 * rad, la2 * rad, lo2 * rad
        h = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
        return 2 * 6371.0 * math.asin(math.sqrt(h))

    want_london = round(hav(48.8566, 2.3522, 51.5074, -0.1278), 4)
    got_london = [r["distance_km"] for r in out if r["url"] == "u001"][0]
    assert got_london == pytest.approx(want_london, abs=1e-4)
    assert all(r["distance_km"] == 0.0 for r in out if r["url"] != "u001")


# --- geotile_grid -----------------------------------------------------------


def test_geotile_grid_keys_and_clamp(spark, tmp_path):
    """Known points land in their Web-Mercator tiles; polar latitudes
    clamp into the edge rows instead of diverging."""
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, ["common a", "common b", "common c"])
    d = str(tmp_path / "idxt")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [("u000", 0.0, 0.0), ("u001", 89.9, 10.0), ("u002", -89.9, -10.0)],
        "url string, lat double, lon double",
    )
    out = {
        r["key"]: r["doc_count"]
        for r in Searcher(spark, d, cache=False).geotile_grid(
            "common", fv, "lat", "lon", zoom=2, size=10
        ).collect()
    }
    # zoom 2: (0,0) → tile 2/2/2 (x = floor(180/360·4)=2; equator is the
    # 2-row boundary, round-then-floor keeps it in row 2); poles clamp to
    # rows 0 and 3
    assert out == {"2/2/2": 1, "2/2/0": 1, "2/1/3": 1}


# --- HLL cardinality --------------------------------------------------------


def test_hll_raw_branch_accuracy(spark):
    """5000 distinct values at p=10 must estimate within the ~3·(1.04/√m)
    band (≈ 10%) — and duplicates must not move the estimate."""
    from kafka_es_spark.functions.sketches import hll_cardinality

    vals = spark.range(5000).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v")
    )
    est = hll_cardinality(vals, "v", p=10).collect()[0]["estimate"]
    assert abs(est - 5000) / 5000 < 0.10, est
    dup = vals.unionAll(vals).unionAll(vals)
    est_dup = hll_cardinality(dup, "v", p=10).collect()[0]["estimate"]
    assert est_dup == est


def test_hll_small_range_branch_is_linear_counting(spark):
    """n ≪ m uses the m·ln(m/V) correction: tight (≤ ~2% at n=30) and
    exactly the closed form for the occupied-register count."""
    from kafka_es_spark.functions.sketches import (
        hll_cardinality, hll_registers,
    )

    vals = spark.range(30).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v")
    )
    occupied = hll_registers(vals, "v", p=10).count()
    est = hll_cardinality(vals, "v", p=10).collect()[0]["estimate"]
    m = 1024
    assert est == pytest.approx(round(m * math.log(m / (m - occupied)), 4))
    assert abs(est - 30) <= 2


def test_hll_registers_merge(spark):
    """The register relation is the sketch: union → max == sketch of the
    unioned corpus (per-epoch sketches can serve global cardinality)."""
    from kafka_es_spark.functions.sketches import hll_registers

    a = spark.range(0, 800).select(F.col("id").cast("string").alias("v"))
    b = spark.range(500, 1300).select(F.col("id").cast("string").alias("v"))
    merged = (
        hll_registers(a, "v", 10).unionAll(hll_registers(b, "v", 10))
        .groupBy("idx").agg(F.max("mr").alias("mr"))
    )
    direct = hll_registers(a.unionAll(b), "v", 10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_rejects_silly_precision(spark):
    from kafka_es_spark.functions.sketches import hll_registers

    with pytest.raises(ValueError, match="sane HLL range"):
        hll_registers(spark.range(1).selectExpr("'a' AS v"), "v", p=25)


# --- auto_date_histogram ----------------------------------------------------


def test_auto_date_histogram_interval_choice(spark):
    """The engine picks the smallest fitting calendar unit: a 3-hour
    stream at target 200 → minute; same data at target 5 → hour; and
    buckets are true calendar truncations."""
    from kafka_es_spark.operators.sessions import auto_date_histogram

    ev = spark.createDataFrame(
        [(i, f"2025-03-01 00:{i % 60:02d}:{(7 * i) % 60:02d}") for i in range(180)],
        "event_id long, s string",
    ).select("event_id", F.to_timestamp("s").alias("ts"))
    fine = auto_date_histogram(ev, 200)
    assert fine.select("interval").first()["interval"] == "minute"
    coarse = auto_date_histogram(ev, 5)
    assert coarse.select("interval").first()["interval"] == "hour"
    rows = coarse.collect()
    assert sum(r["doc_count"] for r in rows) == 180
    assert len(rows) == 1  # all events inside one hour
    with pytest.raises(ValueError, match="target_buckets"):
        auto_date_histogram(ev, 0)


def test_auto_date_histogram_empty(spark):
    from kafka_es_spark.operators.sessions import auto_date_histogram

    ev = spark.createDataFrame([], "event_id long, ts timestamp")
    assert auto_date_histogram(ev, 10).collect() == []


# --- scripted_metric / random_score / percentile_ranks / runtime field -------


def test_scripted_metric_partition_invariant(spark, tmp_path):
    """The decimal-cast reduce makes the sum exact: identical at 1 and 13
    partitions (a float64 sum would drift with combine order)."""
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(
        spark, [f"common word{i} filler" for i in range(40)]
    )
    d = str(tmp_path / "idxm")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [(f"u{i:03d}", 0.1 + i * 0.37) for i in range(40)],
        "url string, x double",
    )
    s = Searcher(spark, d, cache=False)
    a = s.scripted_metric("common", fv, "x", "x * x", reduce="sum").collect()
    b = s.scripted_metric(
        "common", fv.repartition(13), "x", "x * x", reduce="sum"
    ).collect()
    assert a == b
    want = round(sum(round(0.1 + i * 0.37, 10) ** 2 for i in range(40)), 2)
    assert a[0]["value"] == pytest.approx(want, abs=0.01)
    with pytest.raises(ValueError, match="reduce"):
        s.scripted_metric("common", fv, "x", "x", reduce="median")


def test_random_score_deterministic_and_uniformish(spark, tmp_path):
    """Same (doc, seed) → same score on any run; different seeds decouple;
    scores live in [0, 1)."""
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, [f"common t{i}" for i in range(50)])
    d = str(tmp_path / "idxr")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    s = Searcher(spark, d, cache=False)
    a = [(r["url"], r["score"]) for r in s.random_score_topk("common", 7, k=50).collect()]
    b = [(r["url"], r["score"]) for r in s.random_score_topk("common", 7, k=50).collect()]
    assert a == b
    c = [(r["url"], r["score"]) for r in s.random_score_topk("common", 8, k=50).collect()]
    assert [u for u, _ in a] != [u for u, _ in c], "seed must reshuffle"
    assert all(0.0 <= v < 1.0 for _, v in a)


def test_percentile_ranks_exact_cdf(spark, tmp_path):
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, [f"common t{i}" for i in range(10)])
    d = str(tmp_path / "idxp")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [(f"u{i:03d}", float(10 * (i + 1))) for i in range(10)],
        "url string, x double",
    )
    out = {
        r["value"]: r["pct"]
        for r in Searcher(spark, d, cache=False).agg_percentile_ranks(
            "common", fv, "x", [5.0, 50.0, 100.0]
        ).collect()
    }
    assert out == {5.0: 0.0, 50.0: 50.0, 100.0: 100.0}


def test_runtime_field_filter_sort_and_stored_guard(spark, tmp_path):
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(
        spark, ["common one two", "common one", "common one two three four"]
    )
    d = str(tmp_path / "idxrf")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [("u000", 30), ("u001", 10), ("u002", 100)], "url string, n long"
    )
    s = Searcher(spark, d, cache=False)
    out = [(r["url"], r["rf"]) for r in s.runtime_field_topk(
        "common", fv, "n / dl", where="rf >= 6.0", k=10
    ).collect()]
    # dl: 3, 2, 5 → rf: 10.0, 5.0, 20.0; the 5.0 row is filtered out
    assert out == [("u002", 20.0), ("u000", 10.0)]
    with pytest.raises(ValueError, match="not stored|stored"):
        s.runtime_field_topk(
            "common", None, "n / dl", stored_cols=("n",), k=10
        )


# --- intervals (unordered, max_gaps) ----------------------------------------


def test_intervals_unordered_gap_semantics(spark, tmp_path):
    """max_gaps counts INTERVENING tokens, either order qualifies, and a
    too-far partner does not match."""
    from kafka_es_spark.operators.positions import (
        build_position_index, intervals_unordered_topk,
    )

    pages = _mk_pages(spark, [
        "zeta beta gamma delta",         # u000: no anchor occurrence
        "beta alpha x y gamma z",        # u001: gap 2 (x y) — matches g>=2
        "gamma alpha",                   # u002: other BEFORE anchor, gap 0
        "alpha q w e r t gamma",         # u003: gap 5 — out at g=2
    ])
    d = str(tmp_path / "idxiv")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    build_position_index(spark, pages, d)
    got = {
        r["url"]
        for r in intervals_unordered_topk(
            spark, d, "alpha", "gamma", max_gaps=2, k=10, with_url=True
        ).collect()
    }
    assert got == {"u001", "u002"}
    # ordered-agnostic: u002 matched with the partner on the left
    none = intervals_unordered_topk(
        spark, d, "alpha", "gamma", max_gaps=0, k=10, with_url=True
    ).collect()
    assert {r["url"] for r in none} == {"u002"}  # only the adjacent pair


# --- sibling pipeline aggs / serial_diff -------------------------------------


def test_sibling_bucket_stats_and_serial_diff(spark):
    from kafka_es_spark.operators.sessions import (
        serial_diff, sibling_bucket_stats,
    )

    h = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 60)], "bucket long, doc_count long"
    )
    s = sibling_bucket_stats(h).collect()[0]
    assert (s["avg_bucket"], s["min_bucket"], s["max_bucket"],
            s["sum_bucket"], s["bucket_count"]) == (30.0, 10.0, 60.0, 120.0, 4)
    d = {r["bucket"]: r["serial_diff"] for r in serial_diff(h, lag=2).collect()}
    assert d == {1: None, 2: None, 3: 10, 4: 30}
    with pytest.raises(ValueError, match="lag"):
        serial_diff(h, lag=0)


# --- training shard export ----------------------------------------------


def test_shard_export_deterministic_balanced_and_written(spark, tmp_path):
    """Shard assignment is a pure function of (id, salt): parallelism-
    invariant, near-balanced, salt-reshuffled; the written layout is one
    file set per shard with the in-shard hash order."""
    from kafka_es_spark.operators.traindata import (
        shard_assignments, shard_plan, write_training_shards,
    )

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("n_chars"),
    )
    a = sorted(
        map(tuple, shard_assignments(docs, 16).select("doc_id", "shard").collect())
    )
    b = sorted(
        map(tuple,
            shard_assignments(docs.repartition(13), 16)
            .select("doc_id", "shard").collect())
    )
    assert a == b
    plan = shard_plan(docs, 16, token_col="n_chars").collect()
    counts = [r["n_docs"] for r in plan]
    assert len(plan) == 16 and sum(counts) == 2000
    assert max(counts) < 2 * min(counts), f"unbalanced: {counts}"
    resh = sorted(
        map(tuple,
            shard_assignments(docs, 16, salt="epoch2")
            .select("doc_id", "shard").collect())
    )
    assert a != resh, "salt must reshuffle"
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4)
    got = spark.read.parquet(out)
    assert got.count() == 2000
    assert sorted(
        r["shard"] for r in got.select("shard").distinct().collect()
    ) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="n_shards"):
        shard_plan(docs, 0)


# --- int8 embedding quantization ---------------------------------------------


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    """q ∈ [-127,127], extremes hit ±127, dequantization error is bounded
    by scale/254 per component, and the all-zero vector is handled."""
    from kafka_es_spark.operators.similarity import quantize_embeddings_int8

    emb = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25, 1.0]), (1, [0.0, 0.0, 0.0, 0.0]),
         (2, [-2.0, 1.0, 0.1, -0.3])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(emb).collect()}
    assert rows[0]["scale"] == 1.0
    assert rows[0]["qvec"] == [64, -127, 32, 127]
    assert rows[1]["scale"] == 0.0 and rows[1]["qvec"] == [0, 0, 0, 0]
    v = [-2.0, 1.0, 0.1, -0.3]
    q, sc = rows[2]["qvec"], rows[2]["scale"]
    assert all(abs(qi * sc / 127.0 - vi) <= sc / 254.0 + 1e-12
               for qi, vi in zip(q, v))
    assert max(abs(x) for x in q) == 127


# --- completion suggester ---------------------------------------------------


def test_completion_prefix_fuzzy_and_dedup(spark):
    from kafka_es_spark.operators.wand import completion_suggest

    sug = spark.createDataFrame(
        [("data lake", 10), ("data lake", 40), ("database", 25),
         ("dada art", 30), ("delta table", 7), ("zebra", 99)],
        "suggestion string, weight long",
    )
    exact = completion_suggest(sug, "data", size=5).collect()
    assert [(r["suggestion"], r["weight"]) for r in exact] == [
        ("data lake", 40), ("database", 25),
    ]
    # fuzziness 1: 'dada' (head 'dada' vs 'data' = 1 edit) joins; 'delta'
    # (2 edits) and 'zebra' (anchor fails) stay out
    fuzzy = completion_suggest(sug, "data", size=5, fuzziness=1).collect()
    assert [r["suggestion"] for r in fuzzy] == [
        "data lake", "dada art", "database",
    ]
    with pytest.raises(ValueError, match="non-empty prefix"):
        completion_suggest(sug, "", size=5)
