"""Round-4 batch-C surface: learned-sparse retrieval (ES sparse_vector /
text_expansion), rate agg, EQL two-step sequence, transform pivot, and the
deterministic variable_width_histogram.

Each test pins the semantic edge the operator exists for — top-m cut and
idf monotonicity (rank_features), dot-product scoring restricted to query
tokens (sparse_vector), the bucket-width rescale rule (rate), the
earliest-tail / maxspan / same-key rules (EQL), absent-combination zeros
(pivot), and the largest-gap boundary rule (vwh).
"""

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    return spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value",
    )


# --- learned-sparse (ELSER-slot) ---------------------------------------------


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "apple banana apple cherry"),
            (1, "banana cherry date"),
            (2, "apple apple apple banana"),
            (3, "elderberry"),
        ],
        "doc_id long, text string",
    )


def test_rank_features_top_m_and_idf(spark, tiny_docs):
    from kafka_es_spark.operators.sparse import build_rank_features

    feats = build_rank_features(tiny_docs, top_m=2).collect()
    per_doc = {}
    for r in feats:
        per_doc.setdefault(r.doc_id, []).append(r)
    # top-m bound holds
    assert all(len(v) <= 2 for v in per_doc.values())
    # doc 3's only term survives; its weight is tf=1 · idf(df=1)
    d3 = {r.feature: r.weight for r in per_doc[3]}
    idf1 = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    assert d3 == {"elderberry": round(idf1, 4)}
    # doc 2: apple tf=3 beats banana tf=1 (same-idf tie impossible here);
    # both present, apple weight strictly larger
    d2 = {r.feature: r.weight for r in per_doc[2]}
    assert set(d2) == {"apple", "banana"} and d2["apple"] > d2["banana"]


def test_sparse_vector_topk_scores_only_query_tokens(spark, tiny_docs):
    from kafka_es_spark.operators.sparse import (
        build_rank_features, sparse_vector_topk,
    )

    feats = build_rank_features(tiny_docs, top_m=8)
    got = sparse_vector_topk(feats, {"cherry": 2.0}, k=10).collect()
    fmap = {(r.doc_id, r.feature): r.weight for r in feats.collect()}
    # only docs carrying 'cherry' score; scores are 2·weight
    want = sorted(
        (
            (d, round(2.0 * w, 4))
            for (d, f), w in fmap.items()
            if f == "cherry"
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r.doc_id, r.score) for r in got] == want
    with pytest.raises(ValueError):
        sparse_vector_topk(feats, {})


# --- rate agg -----------------------------------------------------------------


def test_rate_agg_rescales_bucket_totals(spark):
    from kafka_es_spark.operators.sessions import rate_agg

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "click", 1.0),
            (2, "2024-01-01 23:59:59", 1, "click", 1.0),
            (3, "2024-01-02 05:00:00", 1, "click", 1.0),
        ],
    )
    got = {r.bucket.day: r.rate for r in rate_agg(ev, "day", "hour").collect()}
    # 2 events/day → 2/24 per hour; 1 event/day → 1/24
    assert got == {1: round(2 / 24, 4), 2: round(1 / 24, 4)}
    # value-field form: sum rescaled, not count
    got_v = {
        r.bucket.day: r.rate
        for r in rate_agg(ev, "day", "day", value_col="value").collect()
    }
    assert got_v == {1: 2.0, 2: 1.0}
    with pytest.raises(ValueError):
        rate_agg(ev, unit="month")


# --- EQL sequence ---------------------------------------------------------------


def test_eql_sequence_earliest_tail_within_span(spark):
    from kafka_es_spark.operators.sessions import eql_sequence

    ev = _events(
        spark,
        [
            # user 1: error → two clicks; earliest wins
            (10, "2024-01-01 00:00:00", 1, "error", 0.0),
            (11, "2024-01-01 00:01:00", 1, "click", 0.0),
            (12, "2024-01-01 00:02:00", 1, "click", 0.0),
            # user 2: click only outside maxspan
            (20, "2024-01-01 00:00:00", 2, "error", 0.0),
            (21, "2024-01-01 00:20:00", 2, "click", 0.0),
            # user 3: click BEFORE the error only → no match
            (30, "2024-01-01 00:05:00", 3, "click", 0.0),
            (31, "2024-01-01 00:06:00", 3, "error", 0.0),
            # user 4: cross-user click must not match user 2's error
            (40, "2024-01-01 00:01:00", 4, "click", 0.0),
            # noise event types are ignored entirely
            (13, "2024-01-01 00:00:30", 1, "view", 0.0),
        ],
    )
    got = eql_sequence(ev, "error", "click", within_s=600).collect()
    assert [(r.user_id, r.a_id, r.b_id, r.gap_s) for r in got] == [
        (1, 10, 11, 60.0)
    ]


def test_eql_sequence_two_heads_share_no_tail_state(spark):
    """Each head independently takes its earliest following tail — two
    errors may match the same click (EQL emits per-head sequences)."""
    from kafka_es_spark.operators.sessions import eql_sequence

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "error", 0.0),
            (2, "2024-01-01 00:00:10", 1, "error", 0.0),
            (3, "2024-01-01 00:00:20", 1, "click", 0.0),
        ],
    )
    got = eql_sequence(ev, "error", "click", within_s=600).collect()
    assert [(r.a_id, r.b_id) for r in got] == [(1, 3), (2, 3)]
    assert [r.gap_s for r in got] == [20.0, 10.0]


# --- transform pivot ------------------------------------------------------------


def test_pivot_transform_zeros_absent_combinations(spark):
    from kafka_es_spark.operators.sessions import pivot_transform

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "click", 2.5),
            (2, "2024-01-01 00:00:01", 1, "click", 1.5),
            (3, "2024-01-01 00:00:02", 2, "view", 7.0),
        ],
    )
    got = pivot_transform(
        ev, pivot_values=["click", "view"]
    ).collect()
    rows = {r.user_id: r.asDict() for r in got}
    assert rows[1]["click_cnt"] == 2 and rows[1]["click_sum"] == 4.0
    assert rows[1]["view_cnt"] == 0 and rows[1]["view_sum"] == 0.0
    assert rows[2]["view_cnt"] == 1 and rows[2]["view_sum"] == 7.0
    # pinned schema: exactly group + 2 cols per pivot value, in order
    assert list(rows[1]) == [
        "user_id", "click_cnt", "click_sum", "view_cnt", "view_sum",
    ]


# --- variable_width_histogram ----------------------------------------------------


def test_vwh_splits_at_largest_gaps(spark):
    from kafka_es_spark.operators.sessions import variable_width_histogram

    # clusters {1,2}, {10,11}, {100} → the 2 largest gaps are 8 and 89
    vals = [1.0, 2.0, 10.0, 11.0, 100.0, 1.0]
    ev = _events(
        spark,
        [
            (i, "2024-01-01 00:00:00", 1, "click", v)
            for i, v in enumerate(vals)
        ],
    )
    got = variable_width_histogram(ev, "value", n_buckets=3).collect()
    assert [
        (r.bucket, r["min"], r["max"], r.avg, r.doc_count) for r in got
    ] == [
        (0, 1.0, 2.0, round(4 / 3, 4), 3),
        (1, 10.0, 11.0, 10.5, 2),
        (2, 100.0, 100.0, 100.0, 1),
    ]


def test_vwh_distinct_cap_raises(spark):
    from kafka_es_spark.operators.sessions import variable_width_histogram

    ev = _events(
        spark,
        [(i, "2024-01-01 00:00:00", 1, "click", float(i)) for i in range(20)],
    )
    with pytest.raises(ValueError, match="max_distinct"):
        variable_width_histogram(ev, "value", n_buckets=3, max_distinct=10)


# --- categorize_text -------------------------------------------------------------


def test_categorize_text_masks_numerals(spark):
    from kafka_es_spark.functions.textstats import categorize_text

    docs = spark.createDataFrame(
        [
            (0, "error 404 on node 7"),
            (1, "error 500 on node 12"),
            (2, "disk full on node 3"),
        ],
        "doc_id long, text string",
    )
    got = {r.category: r.doc_count for r in categorize_text(docs).collect()}
    # both error lines collapse to one template; numerals masked
    assert got == {
        "error <num> on node <num>": 2,
        "disk full on node <num>": 1,
    }


def test_categorize_text_window_is_prefix(spark):
    from kafka_es_spark.functions.textstats import categorize_text

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e")], "doc_id long, text string"
    )
    got = {r.category: r.doc_count for r in categorize_text(docs, max_tokens=3).collect()}
    assert got == {"a b c": 2}


# --- frequent_item_sets ------------------------------------------------------------


def test_frequent_item_sets_support_threshold(spark):
    from kafka_es_spark.operators.cooccur import frequent_item_sets

    ev = _events(
        spark,
        [
            # users 1,2 both do click+view; user 3 does click+purchase
            (1, "2024-01-01 00:00:00", 1, "click", 0.0),
            (2, "2024-01-01 00:00:01", 1, "view", 0.0),
            (3, "2024-01-01 00:00:02", 1, "view", 0.0),  # dup item, 1 txn
            (4, "2024-01-01 00:00:03", 2, "click", 0.0),
            (5, "2024-01-01 00:00:04", 2, "view", 0.0),
            (6, "2024-01-01 00:00:05", 3, "click", 0.0),
            (7, "2024-01-01 00:00:06", 3, "purchase", 0.0),
        ],
    )
    got = frequent_item_sets(ev, min_support=2).collect()
    assert [(r.item_a, r.item_b, r.support, r.support_ratio) for r in got] == [
        ("click", "view", 2, round(2 / 3, 4))
    ]
    # lowering the threshold admits the singleton pair
    got1 = frequent_item_sets(ev, min_support=1).collect()
    assert {(r.item_a, r.item_b): r.support for r in got1} == {
        ("click", "view"): 2,
        ("click", "purchase"): 1,
    }


# --- PMI ---------------------------------------------------------------------------


def test_pmi_pairs_prefers_perfect_cooccurrence(spark):
    import math

    from kafka_es_spark.operators.cooccur import pmi_pairs

    # x,y always together (2 docs); x,z once each but z appears in 2 docs
    docs = spark.createDataFrame(
        [
            (0, "x y"),
            (1, "x y"),
            (2, "x z"),
            (3, "z w"),
        ],
        "doc_id long, text string",
    )
    got = pmi_pairs(docs, min_df=2, top_k=10).collect()
    rows = {(r.term_a, r.term_b): (r.n_ab, r.pmi) for r in got}
    # w (df=1) filtered out entirely
    assert all("w" not in k for k in rows)
    # pmi(x,y) = ln(2·4/(3·2)); pmi(x,z) = ln(1·4/(3·2))
    assert rows[("x", "y")] == (2, round(math.log(8 / 6), 4))
    assert rows[("x", "z")] == (1, round(math.log(4 / 6), 4))
    assert got[0].term_a == "x" and got[0].term_b == "y"  # top pair first


# --- BPE pair counts ------------------------------------------------------------------


def test_bpe_pair_counts_adjacent_within_words(spark):
    from kafka_es_spark.operators.cooccur import bpe_pair_counts

    docs = spark.createDataFrame(
        [(0, "abab ab"), (1, "ba a")], "doc_id long, text string"
    )
    got = {r.pair: r.n for r in bpe_pair_counts(docs).collect()}
    # "abab": ab,ba,ab · "ab": ab · "ba": ba ; single-char "a" contributes none
    assert got == {"ab": 3, "ba": 2}


# --- video frame features ----------------------------------------------------------


def test_video_frame_features_closed_form(spark):
    import numpy as np

    from kafka_es_spark.operators.multimodal import (
        arith_video_bytes, decode_frame_features, sample_frames, synth_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    media = synth_media(ids, "video")
    frames = sample_frames(media, every_k=2)
    got = decode_frame_features(frames).collect()
    for r in got:
        mid = r.media_id
        w, h, nf = 5 + 2 * (mid % 4), 3 + 2 * (mid % 3), 2 + (mid % 4)
        assert r.ok and (r.width, r.height) == (w, h)
        assert r.frame_idx in range(0, nf, 2)
        j = np.arange(r.frame_idx * w * h, (r.frame_idx + 1) * w * h)
        want = np.round(((mid * 29 + 11 * j) % 256).mean(), 4)
        assert r.mean_luma == want
    # every video contributes ceil(nf/2) sampled frames
    per = {}
    for r in got:
        per[r.media_id] = per.get(r.media_id, 0) + 1
    assert per == {i: -(-(2 + i % 4) // 2) for i in range(8)}
    # payload round-trip sanity: the packed header really is KESVID01
    assert arith_video_bytes(3)[:8] == b"KESVID01"


def test_decode_frame_features_flags_corrupt_payload(spark):
    from kafka_es_spark.operators.multimodal import decode_frame_features

    frames = spark.createDataFrame(
        [(1, 0, bytearray(b"NOTAFRAME"))],
        "media_id long, frame_idx int, payload binary",
    )
    r = decode_frame_features(frames).collect()[0]
    assert not r.ok and r.mean_luma is None


# ---------------------------------------------------------------- downsample


def test_downsample_closed_form(spark):
    from kafka_es_spark.operators.sessions import downsample

    ev = spark.createDataFrame(
        [
            # bucket 10:00, type a: values 1, 3 (latest ts wins last_value)
            (1, dt.datetime(2024, 1, 1, 10, 5), 7, "a", 1.0, ""),
            (2, dt.datetime(2024, 1, 1, 10, 40), 7, "a", 3.0, ""),
            # bucket 10:00, type b: single row
            (3, dt.datetime(2024, 1, 1, 10, 10), 8, "b", 10.0, ""),
            # bucket 11:00, type a: tie on ts -> higher event_id wins
            (4, dt.datetime(2024, 1, 1, 11, 0), 7, "a", 5.0, ""),
            (5, dt.datetime(2024, 1, 1, 11, 0), 7, "a", 6.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = downsample(ev, unit="hour", dims=("event_type",)).collect()
    by = {(r.bucket.hour, r.event_type): r for r in rows}
    a10 = by[(10, "a")]
    assert (a10.doc_count, a10.v_min, a10.v_max, a10.v_sum, a10.v_avg,
            a10.last_value) == (2, 1.0, 3.0, 4.0, 2.0, 3.0)
    b10 = by[(10, "b")]
    assert (b10.doc_count, b10.last_value) == (1, 10.0)
    a11 = by[(11, "a")]
    assert a11.last_value == 6.0  # ts tie broken by event_id


def test_downsample_partition_invariant(spark):
    from kafka_es_spark.operators.sessions import downsample

    ev = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 10 + (i % 3), i % 60), i % 5,
             "t" + str(i % 2), float(i) * 0.1, "")
            for i in range(200)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    a = sorted(map(tuple, downsample(ev).collect()))
    b = sorted(map(tuple, downsample(ev.repartition(13)).collect()))
    assert a == b


# ------------------------------------------------------- moving_fn


def test_moving_fn_frames_and_nulls(spark):
    from kafka_es_spark.operators.sessions import moving_fn

    b = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([2, 4, 6, 8, 10])],
        "bucket int, doc_count double",
    )
    rows = moving_fn(b, window=2, fn="avg").collect()
    # shift=0: frame is the 2 buckets BEFORE current (ES placement)
    assert rows[0].moving_avg is None          # empty frame
    assert rows[1].moving_avg == 2.0           # only one prior row
    assert rows[2].moving_avg == 3.0           # (2+4)/2
    assert rows[4].moving_avg == 7.0           # (6+8)/2
    # shift=1 includes the current bucket
    rows = moving_fn(b, window=2, fn="sum", shift=1).collect()
    assert rows[0].moving_sum == 2.0 and rows[1].moving_sum == 6.0
    with pytest.raises(ValueError, match="unsupported fn"):
        moving_fn(b, window=2, fn="median")


# ------------------------------------------------------- change_point


def test_change_point_finds_planted_step(spark):
    from kafka_es_spark.operators.sessions import change_point

    # 10 buckets at level 5, then 10 at level 50: split belongs at k=10
    b = spark.createDataFrame(
        [(i, 5 if i < 10 else 50) for i in range(20)],
        "bucket int, doc_count long",
    )
    r = change_point(b).collect()
    assert len(r) == 1
    assert r[0].change_at == 10 and r[0].type == "step_change"
    assert r[0].stat == pytest.approx(45.0 * (10 * 10 / 20) ** 0.5, abs=1e-3)


def test_change_point_partition_invariant(spark):
    from kafka_es_spark.operators.sessions import change_point

    b = spark.createDataFrame(
        [(i, (i * 7) % 13 + (100 if i >= 37 else 0)) for i in range(60)],
        "bucket int, doc_count long",
    )
    a = change_point(b).collect()[0]
    c = change_point(b.repartition(11)).collect()[0]
    assert (a.change_at, a.stat) == (c.change_at, c.stat) == (37, a.stat)


# ------------------------------------------------------- semdedup


def _planted_embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant near-duplicates of vectors 0..4 as ids 100..104 (tiny jitter)
    for i in range(5):
        rows.append((100 + i, [float(x * 1.001 + 1e-4) for x in base[i]]))
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def test_semdedup_removes_planted_near_dups(spark):
    from kafka_es_spark.operators.similarity import semdedup

    emb = _planted_embeddings(spark)
    kept = semdedup(emb, n_clusters=4, eps=0.99).collect()
    kept_ids = {r.vec_id for r in kept}
    # keep-first: the lower id of each planted pair survives, the clone dies
    for i in range(5):
        assert i in kept_ids and (100 + i) not in kept_ids
    # non-duplicated vectors all survive
    assert all(i in kept_ids for i in range(5, 30))


def test_semdedup_partition_invariant_and_guard(spark):
    from kafka_es_spark.operators.similarity import semdedup

    emb = _planted_embeddings(spark)
    a = [r.vec_id for r in semdedup(emb, n_clusters=4, eps=0.99).collect()]
    b = [
        r.vec_id
        for r in semdedup(emb.repartition(9), n_clusters=4, eps=0.99).collect()
    ]
    assert a == b
    with pytest.raises(ValueError, match="max_cluster_rows"):
        semdedup(emb, n_clusters=1, eps=0.99, max_cluster_rows=10)


# ------------------------------------------------- URL canonicalization


def test_canonicalize_url_cases(spark):
    from kafka_es_spark.operators.traindata import canonicalize_url

    cases = [
        # scheme+host lowering, www strip, default port drop, param
        # filter + sort, fragment drop, trailing slash strip
        ("HTTPS://WWW.Example.COM:443/a/b/?b=2&utm_source=x&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("http://news.site.org:8080/x", "http://news.site.org:8080/x"),
        ("example.com/path/", "http://example.com/path"),  # schemeless
        ("https://u:p@host.com/q", "https://host.com/q"),  # userinfo strip
        ("http://a.com:80/", "http://a.com"),
        ("http://a.com/?gclid=1&fbclid=2", "http://a.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.cu for r in df.select(canonicalize_url("url").alias("cu")).collect()]
    assert got == [want for _, want in cases]


def test_filter_blocked_hosts_equality_and_subdomain(spark):
    from kafka_es_spark.operators.traindata import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "https://blocked.com/a"), (2, "https://ads.blocked.com/b"),
         (3, "https://notblocked.com/c"), (4, "http://fine.org/d"),
         (5, "https://blocked.com.evil.org/e")],  # NOT a subdomain match
        "doc_id long, url string",
    )
    kept = sorted(r.doc_id for r in filter_blocked_hosts(df, ["blocked.com"]).collect())
    assert kept == [3, 4, 5]
    # plan shape: corpus never shuffles — both joins broadcast
    plan = filter_blocked_hosts(df, ["blocked.com"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
