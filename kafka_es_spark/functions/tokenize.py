"""X2 — language-aware tokenization + stable term hashing.

The reference delegates analysis to Elasticsearch's analyzers; here the
analyzer is a deterministic, engine-portable spec so the DuckDB oracle can
reproduce it exactly:

    lower(text)  →  split on runs of non-(letter|digit)  →  drop empties

``\\p{L}\\p{N}`` Unicode classes are supported by both Java regex (Spark)
and RE2 (DuckDB), so the same pattern runs on both sides. CJK languages
would need a segmenter; that is documented as out of scope (the reference
inherits the same limitation from ES's `standard` analyzer family).

Term hashing (for the binary index format only — oracle paths keep the
term string) uses Spark's built-in ``xxhash64``: JVM-side, stable across
runs and cluster sizes.

Everything here stays inside whole-stage codegen — no Python UDFs.

Reference parity: analyzer spec stands in for the ES-side analysis the
sink relies on (SURVEY.md §2.8 X2); tag-filter & co live in operators/ingest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Runs of anything that is not a Unicode letter or digit. Same semantics in
# Java regex (Spark) and RE2 (DuckDB's regexp_split_to_array).
TOKEN_SPLIT_REGEX = r"[^\p{L}\p{N}]+"

# Per-language rules table. All currently share the Unicode split; the
# indirection is the hook where stemmers/stopword lists per lang plug in.
_LANG_RULES: dict[str, str] = {}


def token_split_regex(lang: str | None = None) -> str:
    return _LANG_RULES.get(lang or "", TOKEN_SPLIT_REGEX)


def tokens(col: Column | str, lang: str | None = None) -> Column:
    """array<string> of normalized tokens. Pure Column ops (codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(F.lower(c), token_split_regex(lang))
    return F.filter(parts, lambda x: x != F.lit(""))


def term_id(term: Column | str) -> Column:
    """Stable 64-bit term id (JVM xxhash64 of the UTF-8 term bytes)."""
    c = F.col(term) if isinstance(term, str) else term
    return F.xxhash64(c)


def tokenize_py(text: str, lang: str | None = None) -> list[str]:
    """Driver/executor-side Python mirror of ``tokens`` (same Unicode split,
    via the ``regex`` module's \\p classes). Used for query analysis so a
    top-k query doesn't spend a Spark job tokenizing 5 words; parity with
    the Column version is pytest-enforced."""
    import regex as _re

    if not text:
        return []
    return [t for t in _re.split(token_split_regex(lang), text.lower()) if t]


def duckdb_tokens_sql(text_expr: str) -> str:
    """DuckDB expression producing the identical token array."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> t <> '')"
    )


# --------------------------------------------------------------------------
# Analyzer filter chain — the ES analysis filters the sink's `standard`
# analyzer family composes (reference parity: the ES-side `stop`,
# `asciifolding` and light-stemmer token filters the index templates the
# sink targets typically enable). Engine-portable by construction: every
# rule is a regex both Java regex (Spark) and RE2 (DuckDB) run identically
# — no lookbehind (RE2 lacks it), capture-group rewrites instead.
# --------------------------------------------------------------------------

# Lucene's English default stopword set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET)
LUCENE_EN_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

# asciifolding (the Latin-1 block): applied after lower(), so only
# lowercase sources fold. Same translate() builtin in both engines.
_FOLD_SRC = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿ"
_FOLD_DST = "aaaaaaceeeeiiiinoooooouuuuyy"

# Harman (1991) S-stemmer, the `minimal_english` filter's algorithm:
#   IF   ends in ies, not eies/aies  -> ies => y
#   ELIF ends in es,  not aes/ees/oes -> es => e   (drop the s)
#   ELIF ends in s,   not us/ss       -> drop the s
# Sequential regex application is equivalent: rule 1's output ends in y,
# rule 2's in e, so later rules can never re-fire on a rewritten token.
# Capture-group form because RE2 has no lookbehind; a bare 3-letter "ies"
# token is left alone by BOTH engines (same pattern, same miss).
_STEM_RULES = [
    (r"([^ea])ies$", "y"),
    (r"([^aeo])es$", "e"),
    (r"([^us])s$", ""),
]


def analyze_tokens(
    col: Column | str,
    lang: str | None = None,
    stopwords: tuple[str, ...] = (),
    stem: bool = False,
    ascii_fold: bool = False,
) -> Column:
    """``tokens`` plus the ES filter chain, in analyzer order:
    lowercase → asciifold → split → stop-word drop → s-stem. Pure Column
    ops (whole-stage codegen'd); each filter is opt-in so the plain
    tokenizer stays byte-identical to ``tokens``."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    if ascii_fold:
        c = F.translate(c, _FOLD_SRC, _FOLD_DST)
    parts = F.split(c, token_split_regex(lang))
    parts = F.filter(parts, lambda x: x != F.lit(""))
    if stopwords:
        stopset = F.array(*[F.lit(w) for w in stopwords])
        parts = F.filter(parts, lambda x: ~F.array_contains(stopset, x))
    if stem:
        def _stem(t: Column) -> Column:
            for pat, repl in _STEM_RULES:
                t = F.regexp_replace(t, pat, "$1" + repl)
            return t

        parts = F.transform(parts, _stem)
    return parts


def analyze_py(
    text: str,
    lang: str | None = None,
    stopwords: tuple[str, ...] = (),
    stem: bool = False,
    ascii_fold: bool = False,
) -> list[str]:
    """Driver-side Python mirror of ``analyze_tokens`` (query analysis
    must match document analysis, same contract as tokenize_py)."""
    import regex as _re

    if not text:
        return []
    t = text.lower()
    if ascii_fold:
        t = t.translate(str.maketrans(_FOLD_SRC, _FOLD_DST))
    toks = [x for x in _re.split(token_split_regex(lang), t) if x]
    if stopwords:
        stopset = set(stopwords)
        toks = [x for x in toks if x not in stopset]
    if stem:
        out = []
        for x in toks:
            for pat, repl in _STEM_RULES:
                y = _re.sub(pat, r"\1" + repl, x)
                if y != x:
                    x = y
                    break
            out.append(x)
        toks = out
    return toks


def fingerprint_analyzer(col: Column | str, lang: str | None = None) -> Column:
    """The ES ``fingerprint`` analyzer: tokens lowered, DEDUPLICATED,
    SORTED, and space-joined into one normalized string — the clustering
    key OpenRefine popularized and ES ships for near-identical-value
    grouping. Pure Column chain (sort/dedup over a per-row array, no
    shuffle); pairs with the dedup operators as a cheap exact-after-
    normalization key."""
    return F.array_join(
        F.array_sort(F.array_distinct(tokens(col, lang))), " "
    )


def duckdb_fingerprint_sql(text_expr: str) -> str:
    """DuckDB expression mirroring ``fingerprint_analyzer``."""
    return (
        f"array_to_string(list_sort(list_distinct("
        f"{duckdb_tokens_sql(text_expr)})), ' ')"
    )


def duckdb_analyze_sql(
    text_expr: str,
    stopwords: tuple[str, ...] = (),
    stem: bool = False,
    ascii_fold: bool = False,
) -> str:
    """DuckDB expression producing the identical analyzed token array."""
    c = f"lower({text_expr})"
    if ascii_fold:
        c = f"translate({c}, '{_FOLD_SRC}', '{_FOLD_DST}')"
    arr = (
        f"list_filter(regexp_split_to_array({c}, "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> t <> '')"
    )
    if stopwords:
        inlist = ", ".join(f"'{w}'" for w in stopwords)
        arr = f"list_filter({arr}, t -> t NOT IN ({inlist}))"
    if stem:
        expr = "t"
        # reverse-nested so rules apply in order (innermost first)
        for pat, repl in _STEM_RULES:
            expr = f"regexp_replace({expr}, '{pat}', '\\1{repl}')"
        arr = f"list_transform({arr}, t -> {expr})"
    return arr
