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


# --- batch C: geohash / geo_bounds / bool_prefix / metric+pipeline aggs ------


def _ref_geohash(lat, lon, precision):
    """Classic bisection geohash (public algorithm) as the test oracle."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, "", True
    ch = 0
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out += alpha[ch]
            bits, ch = 0, 0
    return out


def test_geohash_grid_matches_reference_encoder(spark, tmp_path):
    """The interleave/base-32 Column arithmetic reproduces the classic
    bisection geohash for every point, and buckets count correctly."""
    from kafka_es_spark.operators.wand import Searcher

    pts = [(40.69, -74.04), (40.71, -74.01), (51.50, -0.12), (-33.86, 151.20)]
    pages = _mk_pages(spark, ["alpha beta"] * len(pts))
    d = str(tmp_path / "idxgh")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [(f"u{i:03d}", la, lo) for i, (la, lo) in enumerate(pts)],
        "url string, lat double, lon double",
    )
    got = {
        r["key"]: r["doc_count"]
        for r in Searcher(spark, d, cache=False).geohash_grid(
            "alpha", fv, "lat", "lon", precision=4, size=10
        ).collect()
    }
    from collections import Counter
    want = Counter(_ref_geohash(la, lo, 4) for la, lo in pts)
    assert got == dict(want)
    # the two nearby NYC points share a cell at precision 4
    assert got[_ref_geohash(40.69, -74.04, 4)] == 2
    with pytest.raises(ValueError, match="precision"):
        Searcher(spark, d, cache=False).geohash_grid(
            "alpha", fv, "lat", "lon", precision=0
        )


def test_geo_bounds_envelope(spark, tmp_path):
    from kafka_es_spark.operators.wand import Searcher

    pts = [(10.0, -20.0), (-5.0, 170.0), (42.5, 3.25)]
    pages = _mk_pages(spark, ["alpha"] * len(pts))
    d = str(tmp_path / "idxgb")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [(f"u{i:03d}", la, lo) for i, (la, lo) in enumerate(pts)],
        "url string, lat double, lon double",
    )
    r = Searcher(spark, d, cache=False).geo_bounds(
        "alpha", fv, "lat", "lon"
    ).collect()[0]
    assert (r["doc_count"], r["top"], r["left"], r["bottom"], r["right"]) == (
        3, 42.5, -20.0, -5.0, 170.0
    )


def test_bool_prefix_expansion_and_dedup(spark, tmp_path):
    """match_bool_prefix: the last term matches as a prefix, fixed terms
    as terms; an expansion equal to a fixed term scores ONCE (dedup)."""
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, [
        "alpha particle decay",        # u000: fixed + expansion 'particle'
        "alpha paradox",               # u001: fixed + expansion 'paradox'
        "particle physics",            # u002: prefix match only
        "gamma rays",                  # u003: no match
        "alpha alpha energy",          # u004: fixed term only
    ])
    d = str(tmp_path / "idxbp")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    s = Searcher(spark, d, cache=False)
    got = {r["url"]: r["score"] for r in s.bool_prefix_topk(
        "alpha par", k=10, with_url=True
    ).collect()}
    assert set(got) == {"u000", "u001", "u002", "u004"}
    # dedup: 'alpha al' — the expansion of 'al' re-finds the fixed term
    # 'alpha'; u004 (tf=2, no other term) must score exactly the plain
    # single-term BM25, not doubled
    dd = {r["url"]: r["score"] for r in s.bool_prefix_topk(
        "alpha al", k=10, with_url=True
    ).collect()}
    single = {r["url"]: r["score"] for r in s.topk(
        "alpha", k=10, with_url=True
    ).collect()}
    assert dd == single


def test_mad_boxplot_ttest_closed_forms(spark):
    from kafka_es_spark.operators.sessions import (
        boxplot_agg, median_absolute_deviation, t_test_agg,
    )

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)],
        "event_type string, value double",
    )
    # median = 3, |x-3| = [2,1,0,7,11] -> median 2
    assert median_absolute_deviation(ev).collect()[0]["mad"] == 2.0
    b = boxplot_agg(ev).collect()[0]
    assert (b["min"], b["q2"], b["max"]) == (1.0, 3.0, 14.0)
    assert b["q1"] == 2.0 and b["q3"] == 10.0  # linear interpolation
    t = t_test_agg(ev, "event_type = 'b'").collect()[0]
    # Welch: (12-2)/sqrt(8/2 + 1/3)
    assert (t["n_a"], t["n_b"]) == (2, 3)
    assert t["t_stat"] == round(10.0 / math.sqrt(8.0 / 2 + 1.0 / 3), 4)


def test_normalize_and_cumulative_cardinality(spark):
    from kafka_es_spark.operators.sessions import (
        cumulative_cardinality, normalize_buckets,
    )

    h = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 60)], "bucket long, doc_count long"
    )
    n = {r["bucket"]: r["normalized"]
         for r in normalize_buckets(h).collect()}
    assert n == {1: 0.1, 2: 0.3, 3: 0.6}
    rng = {r["bucket"]: r["normalized"]
           for r in normalize_buckets(h, method="range").collect()}
    assert rng == {1: 0.0, 2: 0.4, 3: 1.0}
    with pytest.raises(ValueError, match="normalize"):
        normalize_buckets(h, method="zscore")
    ev = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00"), (1, "2024-01-02 05:00:00"),
         (2, "2024-01-02 06:00:00"), (1, "2024-01-03 07:00:00"),
         (3, "2024-01-03 08:00:00")],
        "user_id long, ts string",
    ).select("user_id", F.to_timestamp("ts").alias("ts"))
    cc = [r["cumulative_cardinality"]
          for r in cumulative_cardinality(ev).collect()]
    assert cc == [1, 2, 3]  # day 2 adds user 2; day 3 adds user 3 only


def test_string_stats_entropy_and_lengths(spark):
    from kafka_es_spark.functions.textstats import string_stats

    d = spark.createDataFrame(
        [("aa",), ("ab",), ("",)], "text string"
    )
    r = string_stats(d).collect()[0]
    assert (r["count"], r["min_length"], r["max_length"]) == (3, 0, 2)
    assert r["avg_length"] == round(4 / 3, 4)
    # chars pooled: a=3, b=1 -> H = 2 - 3*log2(3)/4 = 0.8113
    assert r["entropy"] == round(2 - 3 * math.log2(3) / 4, 4)


# --- batch D: int8 rerank / linear fuse / rank_eval --------------------------


def test_int8_rerank_recall_and_shape(spark):
    """Coarse int8 candidates re-ranked by float cosine recover the exact
    top-k on a planted-structure corpus; self is excluded; approx is the
    rescaled integer dot."""
    from kafka_es_spark.operators.similarity import (
        cosine_topk, int8_rerank_topk,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16))
    # plant: vectors 1..4 are slightly perturbed copies of vector 0
    for i in range(1, 5):
        base[i] = base[0] + 0.01 * rng.standard_normal(16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = int8_rerank_topk(emb, q, k=4, coarse=12).collect()
    assert [r["vec_id"] for r in got] != []
    assert all(r["vec_id"] != 0 for r in got)  # self excluded
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=4).collect()}
    assert {r["vec_id"] for r in got} == exact == {1, 2, 3, 4}
    # re-ranked order is exact-cosine order
    ranks = [r["rank"] for r in got]
    assert ranks == sorted(ranks) == [1, 2, 3, 4]


def test_linear_fuse_minmax_weighted(spark):
    from kafka_es_spark.operators.similarity import linear_fuse

    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.4)], "doc_id long, score double"
    )
    got = {r["doc_id"]: r["linear_score"]
           for r in linear_fuse([(a, 0.7), (b, 0.3)], k=10).collect()}
    # a-normed: 1->1.0, 2->0.5, 3->0.0 ; b-normed: 2->1.0, 4->0.0
    assert got == {1: 0.7, 2: 0.65, 3: 0.0, 4: 0.0}
    # degenerate list (max == min): membership still attests 1.0
    c = spark.createDataFrame([(9, 3.0)], "doc_id long, score double")
    one = {r["doc_id"]: r["linear_score"]
           for r in linear_fuse([(c, 0.5)], k=5).collect()}
    assert one == {9: 0.5}


def test_rank_eval_closed_form(spark):
    """Hand-checked metrics: a 3-doc run against graded judgments."""
    from kafka_es_spark.operators.rankeval import rank_eval

    run = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3),
         (1, 20, 1), (1, 21, 2)],
        "query_id long, doc_id long, rank int",
    )
    ratings = spark.createDataFrame(
        [(0, 11, 2), (0, 12, 1), (0, 99, 3),
         (2, 5, 1)],  # query 1 has NO judgments; query 2 not in run
        "query_id long, doc_id long, rating int",
    )
    out = {r["query_id"]: r for r in rank_eval(run, ratings, k=3).collect()}
    q0 = out[0]
    assert q0["precision_at_k"] == round(2 / 3, 4)
    assert q0["recall_at_k"] == round(2 / 3, 4)  # 2 of 3 relevant retrieved
    assert q0["mrr"] == 0.5  # first relevant at rank 2
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert q0["dcg"] == round(dcg, 4)
    assert q0["ndcg"] == round(round(dcg, 10) / idcg, 4) or \
        q0["ndcg"] == round(dcg / idcg, 4)
    q1 = out[1]
    assert (q1["precision_at_k"], q1["recall_at_k"], q1["mrr"],
            q1["dcg"], q1["ndcg"]) == (0.0, 0.0, 0.0, 0.0, 0.0)
    with pytest.raises(ValueError, match="k"):
        rank_eval(run, ratings, k=0)


# --- batch E: ingest pipeline / remaining pipeline aggs ----------------------


def test_ingest_pipeline_processors(spark):
    """Each processor's semantics on a hand row, plus the conditional
    drop and fail-fast on unknown processors."""
    from kafka_es_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "Foo", '{"k": 7}', "a-b"), (2, "Bar", "{}", "c-d")],
        "id long, name string, props string, pair string",
    )
    out = apply_pipeline(df, [
        {"set": {"field": "tagline", "value": "{{name}}#{{id}}"}},
        {"lowercase": {"field": "name"}},
        {"gsub": {"field": "tagline", "pattern": "[aeiou]",
                  "replacement": "."}},
        {"dissect": {"field": "pair", "pattern": "%{left}-%{right}"}},
        {"json": {"field": "props", "path": "$.k", "target_field": "kk"}},
        {"convert": {"field": "kk", "type": "long"}},
        {"rename": {"field": "pair", "target_field": "pair2"}},
        {"remove": {"field": ["props"]}},
        {"drop": {"if": "kk IS NULL"}},
    ])
    rows = out.collect()
    assert len(rows) == 1  # row 2 dropped (no $.k)
    r = rows[0]
    assert (r["name"], r["tagline"], r["left"], r["right"], r["kk"]) == (
        "foo", "F..#1", "a", "b", 7
    )
    assert "props" not in out.columns and "pair2" in out.columns
    with pytest.raises(ValueError, match="unsupported ingest processor"):
        apply_pipeline(df, [{"nope": {}}])
    with pytest.raises(ValueError, match="dissect"):
        apply_pipeline(df, [{"dissect": {"field": "pair", "pattern": "x"}}])


def test_remaining_pipeline_aggs(spark):
    from kafka_es_spark.operators.sessions import (
        bucket_script, extended_stats_bucket, percentiles_bucket,
    )

    h = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "bucket long, doc_count long"
    )
    s = extended_stats_bucket(h).collect()[0]
    assert (s["count"], s["min"], s["max"], s["avg"], s["sum"]) == (
        4, 10.0, 40.0, 25.0, 100.0
    )
    assert s["sum_of_squares"] == 3000.0
    assert s["variance"] == 125.0  # population: 3000/4 - 625
    assert s["std_deviation"] == round(math.sqrt(125.0), 4)
    p = {r["percent"]: r["value"]
         for r in percentiles_bucket(h, percents=[50.0, 100.0]).collect()}
    assert p == {50.0: 25.0, 100.0: 40.0}
    b = bucket_script(
        h.withColumn("errors", F.col("doc_count") / 10),
        "errors / doc_count", out_col="rate",
    ).collect()
    assert all(r["rate"] == 0.1 for r in b)


# --- batch F: classifier inference / geo_polygon / search_as_you_type --------


def test_classifier_score_closed_form(spark):
    """Hand-replayed inference: hashed features -> integer weight sum ->
    sigmoid; empty docs drop."""
    from kafka_es_spark.functions.textstats import classifier_score
    from kafka_es_spark.operators.dedup import hash32_py

    dim = 64
    docs = spark.createDataFrame(
        [(1, "good solid text"), (2, "")], "doc_id long, text string"
    )
    w = spark.createDataFrame(
        [(i, (i * 7) % 21 - 10) for i in range(dim)],
        "feature_id long, w_int long",
    )
    out = {r["doc_id"]: r for r in classifier_score(docs, w, dim).collect()}
    assert set(out) == {1}  # empty doc dropped
    grams = ["good", "solid", "text", "good solid", "solid text"]
    sw = sum((hash32_py(f"qcls:{g}") % dim * 7) % 21 - 10 for g in grams)
    want = 1.0 / (1.0 + math.exp(-(sw / (1000.0 * len(grams)))))
    assert out[1]["n_feats"] == 5
    assert out[1]["score"] == round(want, 4)


def test_geo_polygon_ray_cast(spark, tmp_path):
    """Points inside/outside a concave polygon classify correctly."""
    from kafka_es_spark.operators.wand import Searcher

    # concave "arrow": (0,0) (4,4) (0,8) (2,4) closes the notch
    poly = [(0.0, 0.0), (4.0, 4.0), (0.0, 8.0), (2.0, 4.0)]
    pts = {
        "u000": (2.5, 4.0),   # inside the arrow head
        "u001": (1.0, 4.0),   # inside the notch -> OUTSIDE the polygon
        "u002": (5.0, 4.0),   # above apex -> outside
        "u003": (3.0, 3.5),   # inside left wing
    }
    pages = _mk_pages(spark, ["alpha"] * len(pts))
    d = str(tmp_path / "idxpoly")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    fv = spark.createDataFrame(
        [(u, la, lo) for u, (la, lo) in sorted(pts.items())],
        "url string, lat double, lon double",
    )
    got = {r["url"] for r in Searcher(spark, d, cache=False).geo_polygon(
        "alpha", fv, "lat", "lon", poly, k=10
    ).collect()}
    assert got == {"u000", "u003"}
    with pytest.raises(ValueError, match="vertices"):
        Searcher(spark, d, cache=False).geo_polygon(
            "alpha", fv, "lat", "lon", poly[:2]
        )


def test_sayt_equality_expansion_matches_prefix(spark, tmp_path):
    """The materialized edge-ngram lookup reproduces bool_prefix's
    expansion exactly, and the past-max_gram fallback works."""
    from kafka_es_spark.operators.wand import Searcher, build_edge_ngrams

    pages = _mk_pages(spark, [
        "alpha particle decay", "alpha paradox", "particle physics",
        "gamma rays", "alpha alpha energy",
    ])
    d = str(tmp_path / "idxsayt")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    s = Searcher(spark, d, cache=False)
    with pytest.raises(ValueError, match="edge_ngrams"):
        s.sayt_topk("alpha par", k=10)
    build_edge_ngrams(spark, d, min_gram=1, max_gram=4)
    got = {(r["url"], r["score"]) for r in s.sayt_topk(
        "alpha par", k=10, with_url=True
    ).collect()}
    want = {(r["url"], r["score"]) for r in s.bool_prefix_topk(
        "alpha par", k=10, with_url=True
    ).collect()}
    assert got == want and got
    # gram longer than max_gram (4) -> dictionary prefix fallback
    fb = {(r["url"], r["score"]) for r in s.sayt_topk(
        "alpha parti", k=10, with_url=True
    ).collect()}
    wfb = {(r["url"], r["score"]) for r in s.bool_prefix_topk(
        "alpha parti", k=10, with_url=True
    ).collect()}
    assert fb == wfb and fb


# --- batch G: empty-bucket histogram / chunking / distance rings -------------


def test_date_histogram_empty_fills_gaps(spark):
    from kafka_es_spark.operators.sessions import date_histogram_empty

    ev = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 11:00:00",),
         ("2024-01-04 09:00:00",)],
        "ts string",
    ).select(F.to_timestamp("ts").alias("ts"))
    got = [(str(r["bucket"])[:10], r["doc_count"])
           for r in date_histogram_empty(ev).collect()]
    assert got == [("2024-01-01", 2), ("2024-01-02", 0),
                   ("2024-01-03", 0), ("2024-01-04", 1)]


def test_chunk_documents_windows_and_tail(spark):
    from kafka_es_spark.operators.traindata import chunk_documents

    # 10 tokens, window 4, stride 3 -> starts 0,3,6,9; tail lengths 4,4,4,1
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(docs, window=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["doc_id"] for r in rows] == [1, 1, 1, 1]  # empty doc dropped
    assert [(r["start"], r["n_tokens"]) for r in rows] == [
        (0, 4), (3, 4), (6, 4), (9, 1)
    ]
    assert rows[1]["chunk"] == "t3 t4 t5 t6"
    assert rows[3]["chunk"] == "t9"
    # overlap: consecutive chunks share window - stride = 1 token
    assert rows[0]["chunk"].split()[-1] == rows[1]["chunk"].split()[0]
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, window=4, stride=5)


def test_geo_distance_rings_buckets(spark, tmp_path):
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, ["common a", "common b", "common c"])
    d = str(tmp_path / "idxrings")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    # Paris origin: co-located (0 km), London (~344 km), New York (~5837 km)
    fv = spark.createDataFrame(
        [("u000", 48.8566, 2.3522), ("u001", 51.5074, -0.1278),
         ("u002", 40.7128, -74.0060)],
        "url string, lat double, lon double",
    )
    out = {r["ring"]: r["doc_count"]
           for r in Searcher(spark, d, cache=False).geo_distance_rings(
               "common", fv, "lat", "lon", 48.8566, 2.3522,
               [(None, 100.0), (100.0, 1000.0), (1000.0, None)],
           ).collect()}
    assert out == {"*-100": 1, "100-1000": 1, "1000-*": 1}


# --- batch H: MaxSim late interaction / terms lookup -------------------------


def test_maxsim_hand_case_and_self_rank(spark):
    """Score = Σ_i max_j (q_i · d_j) on a hand bag; a query's own bag
    ranks first (self-similarity invariant)."""
    from kafka_es_spark.operators.similarity import maxsim_topk

    # doc 1: vectors (1,0) and (0,1); doc 2: (0.5,0.5) and (-1,0)
    dv = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0]),
         (2, 0, [0.5, 0.5]), (2, 1, [-1.0, 0.0])],
        "doc_id long, seq int, vec array<double>",
    )
    qv = spark.createDataFrame(
        [(9, 0, [1.0, 0.0]), (9, 1, [0.0, 2.0])],
        "query_id long, seq int, vec array<double>",
    )
    got = {r["doc_id"]: r["maxsim"] for r in maxsim_topk(dv, qv, k=5).collect()}
    # q0·best: doc1 max(1,0)=1, doc2 max(0.5,-1)=0.5
    # q1·best: doc1 max(0,2)=2,  doc2 max(1,0)=1
    assert got == {1: 3.0, 2: 1.5}
    qself = dv.filter(F.col("doc_id") == 1).select(
        F.lit(1).cast("long").alias("query_id"), "seq", "vec"
    )
    top = maxsim_topk(dv, qself, k=1).collect()[0]
    assert top["doc_id"] == 1 and top["rank"] == 1


def test_terms_lookup_constant_score_and_cap(spark, tmp_path):
    from kafka_es_spark.operators.wand import Searcher

    pages = _mk_pages(spark, [
        "alpha beta", "beta gamma", "delta epsilon", "zeta alpha",
    ])
    d = str(tmp_path / "idxtl")
    build_index(spark, pages, d, seg_bits=6, n_term_buckets=2)
    lk = spark.createDataFrame(
        [(7, ["alpha", "gamma"]), (8, [])],
        "id long, terms array<string>",
    )
    s = Searcher(spark, d, cache=False)
    got = {(r["url"], r["score"]) for r in s.terms_lookup(lk, 7, k=10).collect()}
    assert got == {("u000", 1.0), ("u001", 1.0), ("u003", 1.0)}
    assert s.terms_lookup(lk, 8, k=10).collect() == []   # empty term list
    assert s.terms_lookup(lk, 99, k=10).collect() == []  # missing lookup doc
    with pytest.raises(ValueError, match="max_terms"):
        s.terms_lookup(lk, 7, k=10, max_terms=1)
