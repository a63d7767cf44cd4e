"""Text analysis for training-data pipelines — language-ID, quality scoring,
token counting, document fingerprinting. All pure Column expressions
(whole-stage codegen, engine-portable for the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_es_spark.functions.tokenize import tokens
from kafka_es_spark.operators.dedup import hash32

# Small embedded stopword lists drive the n-gram-free language heuristic.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "nicht", "mit", "auf"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"],
    "uk": ["і", "в", "на", "не", "що", "з", "до", "це", "як", "за"],
}


def _hit_ratio(toks: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(text_col: Column | str) -> Column:
    """Heuristic language id: argmax stopword hit-ratio; 'und' if no hits.
    Deterministic tie-break by language code order."""
    toks = tokens(text_col)
    best_lang = F.lit("und")
    best_r = F.lit(0.0)
    for lang in sorted(STOPWORDS):  # fixed order → deterministic ties (first wins)
        r = _hit_ratio(toks, STOPWORDS[lang])
        is_better = r > best_r
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_r = F.when(is_better, r).otherwise(best_r)
    return best_lang


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: token count, mean token length, punctuation
    ratio, digit ratio, stopword ratio, uppercase ratio — plus a composite
    [0,1] quality score (Gopher/C4-style cheap filters)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    n_toks = F.size(toks).cast("long")
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?'\"]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    # total token chars / n_tokens — array_join is portable (DuckDB: array_to_string)
    mean_tok_len = F.when(
        n_toks > 0, F.length(F.array_join(toks, "")).cast("long") / n_toks
    ).otherwise(F.lit(0.0))
    stop_ratio = _hit_ratio(toks, STOPWORDS["en"])
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_toks.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(digits / n_chars, 4).alias("digit_ratio"),
        F.round(upper / n_chars, 4).alias("upper_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
    )
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.25).otherwise(0.0)
        + F.when((F.col("mean_token_len") >= 2) & (F.col("mean_token_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("digit_ratio") <= 0.2, 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.01, 0.25).otherwise(0.0)
    )
    return out.withColumn("quality_score", F.round(score, 4))


# BPE-ish pretokenizer (GPT-2-style, simplified: no contractions table);
# same pattern compiles under Java regex and RE2.
BPE_REGEX = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, chars): whitespace + BPE-ish counts."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))).cast("long")
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_REGEX), 0)).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length(t).cast("long").alias("chars"),
    )


def repetition_features(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
    duplicate-text heuristics a web-scale training pipeline filters on):

    - distinct_token_ratio: |distinct tokens| / |tokens| (low ⇒ loops)
    - top_bigram_frac: occurrences of the most frequent 2-gram / all
      2-gram occurrences ("fraction in most common n-gram")
    - dup_trigram_frac: fraction of 3-gram occurrences whose 3-gram
      appears more than once ("fraction of duplicate n-grams")

    Plan: n-grams are built as array columns (zip_with over slices — no
    Python), then ONE explode + two-level hash aggregation per n-gram
    order; per-doc groups are bounded by doc length, and the aggregate
    output is one row per doc — scales like any tokenize-shaped op.
    Docs with fewer tokens than the n-gram order get 0.0 (no n-grams)."""
    toks = tokens(text_col)
    base = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    t = F.col("toks")
    n = F.col("n")
    join2 = lambda a, b: F.concat(a, F.lit(" "), b)  # noqa: E731
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        join2,
    )
    tri12 = F.zip_with(
        F.slice(t, 1, F.greatest(n - 2, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 2, F.lit(0))),
        join2,
    )
    trigrams = F.zip_with(
        tri12, F.slice(t, 3, F.greatest(n - 2, F.lit(0))), join2
    )

    def gram_frac(col, agg_expr, name):
        g = base.select("doc_id", F.explode(col).alias("g"))
        per = g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        return per.groupBy("doc_id").agg(agg_expr.alias(name))

    top2 = gram_frac(bigrams, F.max("c") / F.sum("c"), "top2")
    dup3 = gram_frac(
        trigrams,
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"),
        "dup3",
    )
    head = base.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct("toks")) / F.greatest(n, F.lit(1)), 4
        ).alias("distinct_token_ratio"),
    )
    return (
        head.join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            "distinct_token_ratio",
            F.round(F.coalesce(F.col("top2"), F.lit(0.0)), 4).alias(
                "top_bigram_frac"
            ),
            F.round(F.coalesce(F.col("dup3"), F.lit(0.0)), 4).alias(
                "dup_trigram_frac"
            ),
        )
    )


FP_BASE = 1000003
FP_MOD = 2**31 - 1


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling polynomial hash over the
    token stream, h = (h*B + hash32(term)) mod (2^31-1). Engine-portable
    (DuckDB: list_reduce over the same token list with the same md5-based
    term hash). Content-identical docs ⇔ identical fingerprints."""
    toks = tokens(text_col)
    h = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, term: (acc * F.lit(FP_BASE) + hash32(term)) % F.lit(FP_MOD),
    )
    return docs.select(F.col(id_col).alias("doc_id"), h.alias("fingerprint"))


def c4_line_filter(
    docs: DataFrame,
    min_words: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation (. ! ? or closing quote),
    carry at least ``min_words`` words, and contain neither a curly
    brace, the phrase "lorem ipsum", nor "javascript" (case-insensitive
    for both). Output: (doc_id, clean_text, n_lines, n_kept) with kept
    lines re-joined by newlines.

    Pure Column ops end-to-end — split, one filter lambda over the line
    array, array stats — whole-stage codegen'd, no shuffle at all (a
    per-row map), so it composes for free in front of any build."""
    lines = F.split(F.col(text_col), r"\n")

    def _keep(l):  # noqa: E741
        low = F.lower(l)
        return (
            l.rlike(r'[.!?"”]\s*$')
            & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
            & ~low.contains("{")
            & ~low.contains("lorem ipsum")
            & ~low.contains("javascript")
        )

    kept = F.filter(lines, _keep)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws("\n", kept).alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


PII_PATTERNS = {
    # deliberately conservative, engine-portable regexes (no lookaround)
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "PHONE": r"\+?\d[\d\s().-]{7,}\d",
}


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII redaction for training corpora (the C4/CCNet-pipeline hygiene
    step): emails, IPv4 addresses, and phone-shaped digit runs replaced
    by [EMAIL] / [IP] / [PHONE] sentinels, applied in that order (the
    email pattern would otherwise leave its digits to the phone rule).
    Output: (doc_id, clean_text, n_email, n_ip, n_phone).

    Counts come from regexp_extract_all BEFORE each replacement; all
    pure Column regex — per-row map, no shuffle, composes in front of
    any build. The pattern set is deliberately high-precision (a
    production run tunes recall per jurisdiction — GDPR vs CCPA scope
    is policy, not engineering)."""
    c = F.col(text_col)
    counts = {
        k: F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0))).cast("long")
        for k, p in PII_PATTERNS.items()
    }
    out = c
    for k in ("EMAIL", "IP", "PHONE"):
        out = F.regexp_replace(out, PII_PATTERNS[k], f"[{k}]")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("clean_text"),
        counts["EMAIL"].alias("n_email"),
        counts["IP"].alias("n_ip"),
        counts["PHONE"].alias("n_phone"),
    )


def string_stats(
    docs: DataFrame,
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """ES string_stats aggregation (show_distribution's entropy included):
    one row — count, min_length, max_length, avg_length, and the Shannon
    entropy (bits/char) of the CHARACTER distribution pooled across every
    value, exactly ES's definition (−Σ p_c·log₂ p_c over all chars of
    all values).

    Plan: lengths come from one hash aggregation over the scan (pruned
    to the text column). Entropy needs the global char histogram: one
    explode of Σ|text| single-char rows → groupBy(char) count — the
    explode is the honest distributed plan (partial map-side combine
    collapses it to ≤ |alphabet| rows per task; no per-row Python, no
    driver pass) — then the #alphabet-row entropy reduce and a broadcast
    join of the two 1-row frames. Null texts count 0 chars (ES ignores
    missing)."""
    t = F.col(text_col)
    lens = docs.agg(
        F.count(t).cast("long").alias("count"),
        F.min(F.length(t)).cast("long").alias("min_length"),
        F.max(F.length(t)).cast("long").alias("max_length"),
        F.round(F.avg(F.length(t)), round_to).alias("avg_length"),
    )
    chars = (
        docs.select(t.alias("_t"))
        # length > 0, not just non-null: Spark sequence(1, 0) is the
        # DESCENDING [1, 0], not empty — an empty text would fabricate rows
        .filter(F.length("_t") > 0)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length("_t"))
            ).alias("_i"),
            "_t",
        )
        .select(F.expr("substring(_t, _i, 1)").alias("_ch"))
        .groupBy("_ch")
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
    )
    # entropy via the log identity: −Σ n_c/N·log2(n_c/N)
    #   = log2(N) − (Σ n_c·log2 n_c)/N   (one pass over the histogram)
    ent = chars.agg(
        F.sum("_n").alias("_N"),
        F.sum(F.col("_n") * F.log2("_n")).alias("_nlogn"),
    ).select(
        F.round(
            F.when(
                F.col("_N") > 0,
                F.log2("_N") - F.col("_nlogn") / F.col("_N"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("entropy")
    )
    return lens.crossJoin(F.broadcast(ent))


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "qcls",
    round_to: int = 4,
) -> DataFrame:
    """fastText-style linear text-classifier INFERENCE (Joulin et al.
    2016) — the shape of every learned quality/toxicity/language filter
    a pretraining pipeline runs at corpus scale: hashed unigram+bigram
    features, mean feature weight, sigmoid. ``weights`` is the trained
    model as a relation (feature_id ∈ [0, dim), w_int) with INTEGER
    weights (fixed-point ×1000) — integer sums are exact and
    partition-order-proof, so scores are bit-stable at any parallelism
    (the scripted_metric lesson); score = σ(Σw_int / (1000·n_feats)).

    Plan: one explode of doc features (tokens + adjacent bigrams as a
    zip-free array concat, no Python), md5-hash → pmod(dim) feature ids,
    broadcast join against the dim-row weight table, one hash
    aggregation per doc. At 100 TB: features ≈ corpus tokens ×2 through
    a map-side-combined agg keyed by dense doc id — the same volume the
    tokenize stage already proves out. Docs with no tokens drop (a
    trained filter has nothing to say about empty text)."""
    from kafka_es_spark.functions.tokenize import tokens
    from kafka_es_spark.operators.dedup import hash32

    d = docs.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))
    bi = F.when(
        F.size("_t") >= 2,
        F.expr(
            "transform(sequence(1, size(_t) - 1), "
            "i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
        ),
    ).otherwise(F.expr("array()"))
    feats = d.select(
        "_id", F.explode(F.concat(F.col("_t"), bi)).alias("gram")
    )
    fid = F.pmod(
        hash32(F.concat(F.lit(f"{salt}:"), F.col("gram"))), F.lit(int(dim))
    ).alias("feature_id")
    j = feats.select("_id", fid).join(
        F.broadcast(weights.select("feature_id", "w_int")), "feature_id"
    )
    agg = j.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.sum("w_int").cast("long").alias("_sw"),
    )
    score = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(F.col("_sw").cast("double") / (F.lit(1000.0) * F.col("n_feats")))
        )
    )
    return agg.select(
        F.col("_id").alias(id_col),
        "n_feats",
        F.round(score, round_to).alias("score"),
    )


def categorize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 6,
) -> DataFrame:
    """ES ``categorize_text`` aggregation, made deterministic: group
    log-like messages by their token TEMPLATE — tokenize, replace pure-
    number tokens with ``<num>`` (the drain/categorization move: the
    variable parts of a log line are overwhelmingly numerals), keep the
    first ``max_tokens`` template tokens (ES's similarity window is
    likewise prefix-weighted), space-join as the category key. ES's own
    agg is an online token-tree whose buckets can shift with shard
    routing; the fixed-template rule is order- and partition-independent,
    which is what an oracle can check. Output (category, doc_count),
    ordered (doc_count desc, category asc).

    Plan: pure Column template expression (codegen) + ONE hash
    aggregation to #categories rows — the terms-agg cost shape."""
    tmpl = F.array_join(
        F.transform(
            F.slice(tokens(text_col), 1, int(max_tokens)),
            lambda t: F.when(t.rlike(r"^\p{N}+$"), F.lit("<num>")).otherwise(t),
        ),
        " ",
    )
    return (
        docs.select(tmpl.alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("category").asc())
    )


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 → uint32-as-long (the ES `ip` field's sortable
    form for the v4 subset). Pure Column split + integer arithmetic —
    pushable, codegen'd; malformed strings null out via the casts."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.split(c, r"\.")
    return (
        p.getItem(0).cast("long") * 16777216
        + p.getItem(1).cast("long") * 65536
        + p.getItem(2).cast("long") * 256
        + p.getItem(3).cast("long")
    )


def ipv4_to_long_py(ip: str) -> int:
    """Driver-side mirror of ``ipv4_to_long`` (range-literal precompute)."""
    a, b, c, d = (int(x) for x in ip.split("."))
    return a * 16777216 + b * 65536 + c * 256 + d


def duckdb_ipv4_sql(expr: str) -> str:
    """DuckDB expression mirroring ``ipv4_to_long``."""
    return (
        f"(CAST(string_split({expr}, '.')[1] AS BIGINT) * 16777216"
        f" + CAST(string_split({expr}, '.')[2] AS BIGINT) * 65536"
        f" + CAST(string_split({expr}, '.')[3] AS BIGINT) * 256"
        f" + CAST(string_split({expr}, '.')[4] AS BIGINT))"
    )
