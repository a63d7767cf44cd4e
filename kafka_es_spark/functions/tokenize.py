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
