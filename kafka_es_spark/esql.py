"""ES|QL — Elasticsearch's piped query language, compiled to DataFrames.

ES 8.11+ ships ES|QL (`POST /_query {"query": "FROM idx | WHERE ... |
STATS ... BY ..."}`) as the successor query surface to the JSON DSL; a
user of the reference stack (kafka-es feeding an ES index) queries the
indexed data with exactly this language. This module is a self-contained
compiler from the public ES|QL grammar (https://www.elastic.co/docs/
reference/query-languages/esql — syntax only; the implementation is
original) onto the PySpark DataFrame API:

    text  --lex-->  tokens  --parse-->  command AST  --compile-->  DataFrame

Design: compile, don't interpret. Every command becomes the declarative
DataFrame operator it denotes (`WHERE`→filter, `STATS..BY`→groupBy.agg,
`SORT`→orderBy, `LOOKUP JOIN`→broadcast left join, `MV_EXPAND`→explode),
and every expression becomes a `pyspark.sql.Column` tree — so Catalyst
sees the same logical plan a hand-written DataFrame program would produce
and all of its optimizations (predicate pushdown through the pipe chain,
column pruning from KEEP/STATS, partial aggregation, broadcast planning)
apply for free. There is no row-at-a-time evaluation anywhere: the
compiler never touches data, only plans.

Supported surface (the stable core of the public grammar):

* source commands: ``FROM table`` (resolver-provided relation), ``ROW
  name = literal, ...`` (inline one-row relation).
* processing commands: ``WHERE``, ``EVAL`` (left-to-right, later
  assignments may reference earlier ones), ``STATS aggs [BY keys]``
  (keys may themselves be ``name = expr``), ``SORT expr [ASC|DESC]
  [NULLS FIRST|LAST]`` (ES|QL default: nulls last), ``LIMIT``,
  ``KEEP``/``DROP`` (with ``*`` wildcards, KEEP reorders like ES|QL),
  ``RENAME old AS new``, ``MV_EXPAND col`` (explode, null-preserving),
  ``LOOKUP JOIN table ON key`` (left equi-join against a broadcast
  lookup relation — the ES|QL lookup-index join), ``ENRICH policy
  [ON match_field] [WITH [new =] field, ...]`` (broadcast left join
  against a policy relation resolved through the same namespace;
  convention: the policy's first column is its match_field; enriched
  fields overwrite same-named inputs, EVAL-style).
* expressions: arithmetic ``+ - * / %``, comparisons ``== != < <= >
  >=``, ``AND OR NOT``, ``IN (...)``, ``LIKE`` (``*``/``?`` wildcards),
  ``RLIKE``, ``IS [NOT] NULL``, literals (int/float/string/bool/null),
  parenthesised subexpressions, and the scalar/agg function library
  below.

* ``SAMPLE p [seed]`` — Bernoulli row sampling. Deviation from ES|QL's
  RNG sampling, by design: rows keep iff a portable md5 content hash of
  the full row (plus the seed) falls under p, so the sample is
  deterministic, replay-stable, and identical at any parallelism — the
  north-rule property RNG sampling cannot give — and an external system
  (or the DuckDB oracle) can reproduce it exactly.
* extraction commands: ``DISSECT col "%{a} - %{b}"`` (literal-separator
  splitting, ``%{}`` skip keys, trailing key takes the rest) and ``GROK
  col "%{WORD:etype} user=%{INT:uid:int}"`` (the classic logstash core
  pattern set, ``:type`` casts) — both compile to JVM-side
  ``regexp_extract`` columns; non-matching rows keep the row with null
  fields (ES|QL semantics).

Deviations (documented, deliberate): identifiers are bare or
backquoted; ``DATE_TRUNC("day", ts)`` and ``BUCKET(x, span)`` take a
string duration ("1 hour") instead of ES|QL's ``1 hour`` interval
literal; BUCKET implements only the deterministic direct-span form —
the 4-arg auto-"nice" width heuristic is out (not reproducible across
engines); ENRICH resolves its policy through the relation namespace
instead of a cluster-side enrich-policy store.

Scale (100 TB): the compiler emits only declarative plans, so the scale
properties are those of the operators it emits — a WHERE ahead of a
STATS reaches the parquet scan as a pushed filter, KEEP prunes the read
schema, STATS is a hash aggregation with map-side combine, LOOKUP JOIN
broadcasts the lookup side (dimension tables by contract, as in ES|QL
where lookup indices are bounded), and SORT+LIMIT plans as TakeOrdered
(no global sort materialization). Nothing in this module collects,
loops, or shuffles on its own.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


_SPAN_UNITS = {
    "millisecond", "second", "minute", "hour", "day", "week",
    "month", "quarter", "year",
}


class ESQLError(ValueError):
    """Parse/compile error with the source position of the offence."""


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<str>"(?:[^"\\]|\\.)*")
    | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<bq>`[^`]+`)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>==|!=|<=|>=|->|\|\||&&|[|(),=<>+\-*/%\[\]])
    """,
    re.X,
)

_KEYWORDS = {
    "from", "row", "where", "eval", "stats", "by", "sort", "limit",
    "keep", "drop", "rename", "as", "asc", "desc", "nulls", "first",
    "last", "and", "or", "not", "in", "like", "rlike", "is", "null",
    "true", "false", "mv_expand", "lookup", "join", "on",
    "dissect", "grok", "sample", "enrich", "with",
    "inlinestats", "change_point", "fork",
}


@dataclass
class _Tok:
    kind: str  # "str" | "num" | "ident" | "kw" | "op" | "eof"
    value: str
    pos: int


def _lex(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ESQLError(f"ES|QL: unexpected character {text[i]!r} at {i}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        v = m.group()
        if m.lastgroup == "str":
            body = v[1:-1]
            body = re.sub(r"\\(.)", lambda g: {"n": "\n", "t": "\t"}.get(g.group(1), g.group(1)), body)
            toks.append(_Tok("str", body, m.start()))
        elif m.lastgroup == "num":
            toks.append(_Tok("num", v, m.start()))
        elif m.lastgroup == "bq":
            toks.append(_Tok("ident", v[1:-1], m.start()))
        elif m.lastgroup == "ident":
            low = v.lower()
            toks.append(_Tok("kw" if low in _KEYWORDS else "ident", v, m.start()))
        else:
            toks.append(_Tok("op", v, m.start()))
    toks.append(_Tok("eof", "", len(text)))
    return toks


# --------------------------------------------------------------------------
# Expression AST → Column
# --------------------------------------------------------------------------
# Nodes are tuples: ("lit", v) ("col", name) ("call", fname, [args])
# ("bin", op, l, r) ("not", x) ("neg", x) ("in", x, [items], negated)
# ("like", x, pattern, negated, is_regex) ("isnull", x, negated)
# ("star",) — only valid inside COUNT().


# Grok pattern library (the classic logstash core set; fragments use only
# non-capturing groups so field-group numbering stays positional).
_GROK_LIB = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"[A-Za-z0-9._-]+",
    "USER": r"[A-Za-z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?|CRIT(?:ICAL)?|FATAL)",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
}

_GROK_TYPES = {"int": "int", "long": "long", "float": "double", "double": "double"}

_DISSECT_KEY_RE = re.compile(r"%\{([^}]*)\}")


def _dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """ES dissect pattern → (anchored regex, field names in group order).
    ``%{name}`` keys separated by literal text; ``%{}`` skips. Every key
    is non-greedy except a trailing one, which takes the rest."""
    fields: list[str] = []
    rx: list[str] = ["^"]
    last = 0
    matches = list(_DISSECT_KEY_RE.finditer(pattern))
    if not matches:
        raise ESQLError("ES|QL: DISSECT pattern has no %{...} keys")
    for i, m in enumerate(matches):
        rx.append(re.escape(pattern[last : m.start()]))
        name = m.group(1)
        trailing = i == len(matches) - 1 and m.end() == len(pattern)
        body = ".*" if trailing else ".*?"
        if name:
            fields.append(name)
            rx.append(f"({body})")
        else:
            rx.append(f"(?:{body})")
        last = m.end()
    rx.append(re.escape(pattern[last:]))
    rx.append("$")
    return "".join(rx), fields


def _grok_to_regex(pattern: str) -> tuple[str, list[tuple[str, str | None]]]:
    """ES grok pattern → (anchored regex, [(field, cast_type|None)] in
    group order). ``%{PATTERN:field}`` captures, ``%{PATTERN}`` matches
    anonymously, ``%{PATTERN:field:int}`` casts."""
    fields: list[tuple[str, str | None]] = []
    rx: list[str] = ["^"]
    last = 0
    matches = list(_DISSECT_KEY_RE.finditer(pattern))
    if not matches:
        raise ESQLError("ES|QL: GROK pattern has no %{...} tokens")
    for m in matches:
        rx.append(re.escape(pattern[last : m.start()]))
        parts = m.group(1).split(":")
        pname = parts[0]
        frag = _GROK_LIB.get(pname)
        if frag is None:
            raise ESQLError(
                f"ES|QL: unknown grok pattern %{{{pname}}} "
                f"(available: {', '.join(sorted(_GROK_LIB))})"
            )
        if len(parts) >= 2 and parts[1]:
            cast = None
            if len(parts) >= 3:
                cast = _GROK_TYPES.get(parts[2].lower())
                if cast is None:
                    raise ESQLError(f"ES|QL: unknown grok cast type {parts[2]!r}")
            fields.append((parts[1], cast))
            rx.append(f"({frag})")
        else:
            rx.append(f"(?:{frag})")
        last = m.end()
    rx.append(re.escape(pattern[last:]))
    rx.append("$")
    return "".join(rx), fields


def _like_to_sql(pattern: str) -> str:
    """ES|QL LIKE wildcards (* any run, ? one char) → SQL LIKE (%, _)."""
    out = []
    for ch in pattern:
        if ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(ch)
    return "".join(out)


def _fn_substring(s: Column, start: Column, length: Column | None = None) -> Column:
    # ES|QL substring is 1-based; omitted length = to end of string.
    if length is None:
        return s.substr(start, F.length(s))
    return s.substr(start, length)


def _fn_mv_slice(a: Column, s: Column, e: Column) -> Column:
    # Resolve ES|QL's 0-based end-inclusive (and possibly negative)
    # indices to a 1-based (start, length) window for Spark slice().
    n = F.size(a)
    s0 = F.greatest(F.when(s < 0, s + n).otherwise(s), F.lit(0))
    e0 = F.least(F.when(e < 0, e + n).otherwise(e), n - 1)
    length = F.greatest(e0 - s0 + F.lit(1), F.lit(0))
    return F.slice(a, s0 + F.lit(1), length)


def _fn_case(*args: Column) -> Column:
    # case(cond1, v1, cond2, v2, ..., [default])
    if len(args) < 2:
        raise ESQLError("ES|QL: case() needs at least a condition and a value")
    pairs, default = (args[:-1], args[-1]) if len(args) % 2 == 1 else (args, None)
    expr = F.when(pairs[0], pairs[1])
    for i in range(2, len(pairs), 2):
        expr = expr.when(pairs[i], pairs[i + 1])
    return expr.otherwise(default) if default is not None else expr


def _fn_ip_prefix_v4(ip: Column, v4: Column) -> Column:
    """Zero the host bits of an IPv4 dotted-quad: address → one u32,
    subtract (address mod 2^(32−len)), render back. No UDF, no shifts
    with Column amounts (Spark's shiftleft takes a literal)."""
    oct_ = F.split(ip, r"\.")
    ipn = (
        F.element_at(oct_, 1).cast("long") * 16777216
        + F.element_at(oct_, 2).cast("long") * 65536
        + F.element_at(oct_, 3).cast("long") * 256
        + F.element_at(oct_, 4).cast("long")
    )
    host = F.pow(F.lit(2.0), (F.lit(32) - v4).cast("double")).cast("long")
    masked = ipn - F.pmod(ipn, host)
    return F.concat_ws(
        ".",
        F.floor(masked / 16777216).cast("long").cast("string"),
        (F.floor(masked / 65536).cast("long") % 256).cast("string"),
        (F.floor(masked / 256).cast("long") % 256).cast("string"),
        (masked % 256).cast("string"),
    )


# name → (min_args, max_args, builder).  Builders receive compiled Columns.
_SCALAR_FNS: dict = {
    "abs": (1, 1, F.abs),
    "ceil": (1, 1, F.ceil),
    "floor": (1, 1, F.floor),
    "sqrt": (1, 1, F.sqrt),
    "exp": (1, 1, F.exp),
    "log10": (1, 1, F.log10),
    "log": (1, 2, lambda *a: F.log(a[0]) if len(a) == 1 else F.log(a[0], a[1])),
    "pow": (2, 2, F.pow),
    "length": (1, 1, F.length),
    "to_lower": (1, 1, F.lower),
    "to_upper": (1, 1, F.upper),
    "md5": (1, 1, F.md5),
    "sha1": (1, 1, F.sha1),
    "sha256": (1, 1, lambda c: F.sha2(c, 256)),
    "trim": (1, 1, F.trim),
    "ltrim": (1, 1, F.ltrim),
    "rtrim": (1, 1, F.rtrim),
    "concat": (2, 99, F.concat),
    "coalesce": (1, 99, F.coalesce),
    "greatest": (2, 99, F.greatest),
    "least": (2, 99, F.least),
    "substring": (2, 3, _fn_substring),
    "starts_with": (2, 2, lambda s, p: s.startswith(p)),
    "ends_with": (2, 2, lambda s, p: s.endswith(p)),
    "locate": (2, 2, lambda s, sub: F.instr(s, sub)),
    "left": (2, 2, lambda s, n: s.substr(F.lit(1), n)),
    "right": (2, 2, lambda s, n: s.substr(F.length(s) - n + 1, n)),
    "replace": (3, 3, lambda s, pat, rep: F.regexp_replace(s, pat, rep)),
    "split": (2, 2, lambda s, d: F.split(s, d)),
    "to_string": (1, 1, lambda x: x.cast("string")),
    "to_datetime": (1, 1, lambda x: x.cast("timestamp")),
    "to_long": (1, 1, lambda x: x.cast("long")),
    "to_integer": (1, 1, lambda x: x.cast("int")),
    "to_double": (1, 1, lambda x: x.cast("double")),
    "to_boolean": (1, 1, lambda x: x.cast("boolean")),
    # date_trunc / date_format / round are special-cased in _compile_expr
    # (they need literal unit/format/digit arguments).
    "mv_count": (1, 1, F.size),
    "mv_min": (1, 1, F.array_min),
    "mv_max": (1, 1, F.array_max),
    "mv_sum": (
        1, 1,
        lambda a: F.when(
            F.size(a) > 0,
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
        ),
    ),
    "mv_avg": (
        1, 1,
        lambda a: F.when(
            F.size(a) > 0,
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ) / F.size(a),
        ),
    ),
    "mv_dedupe": (1, 1, F.array_distinct),
    "mv_sort": (1, 1, F.array_sort),
    "mv_first": (1, 1, lambda a: F.element_at(a, 1)),
    "mv_last": (1, 1, lambda a: F.element_at(a, -1)),
    "mv_slice": (
        3, 3,
        # ES|QL mv_slice(list, start, end) is 0-based END-INCLUSIVE and
        # accepts NEGATIVE indices counted from the end (-1 = last);
        # Spark slice() is 1-based with a length argument, and its own
        # negative-start convention differs, so indices are resolved
        # against size() first (then clamped to the array bounds — the
        # result is empty when the resolved window is empty)
        lambda a, s, e: _fn_mv_slice(a, s, e),
    ),
    "case": (2, 99, _fn_case),
    # trig / math constants (ES|QL 8.x scalar surface)
    "sin": (1, 1, F.sin),
    "cos": (1, 1, F.cos),
    "tan": (1, 1, F.tan),
    "asin": (1, 1, F.asin),
    "acos": (1, 1, F.acos),
    "atan": (1, 1, F.atan),
    "atan2": (2, 2, F.atan2),
    "sinh": (1, 1, F.sinh),
    "cosh": (1, 1, F.cosh),
    "tanh": (1, 1, F.tanh),
    "cbrt": (1, 1, F.cbrt),
    "signum": (1, 1, F.signum),
    "hypot": (2, 2, F.hypot),
    "to_degrees": (1, 1, F.degrees),
    "to_radians": (1, 1, F.radians),
    "pi": (0, 0, lambda: F.lit(3.141592653589793)),
    "tau": (0, 0, lambda: F.lit(6.283185307179586)),
    "e": (0, 0, lambda: F.lit(2.718281828459045)),
    # string / binary extras
    "reverse": (1, 1, F.reverse),
    "repeat": (2, 2, F.repeat),
    "space": (1, 1, lambda n: F.repeat(F.lit(" "), n)),
    "to_base64": (1, 1, lambda s: F.base64(s.cast("binary"))),
    "from_base64": (1, 1, lambda s: F.unbase64(s).cast("string")),
    "md5": (1, 1, F.md5),
    "sha1": (1, 1, F.sha1),
    "sha256": (1, 1, lambda s: F.sha2(s, 256)),
    "bit_length": (1, 1, F.bit_length),
    "byte_length": (1, 1, F.octet_length),
    # multivalue extras
    "mv_concat": (2, 2, lambda a, d: F.array_join(a, d)),
    "mv_append": (2, 2, F.array_append),
    "mv_zip": (
        2, 3,
        # ES|QL mv_zip joins element-wise with a delimiter (default ",");
        # unequal lengths: the unpaired tail values appear ALONE (no
        # dangling delimiter) — zip_with null-pads the shorter side, so
        # guard both ends before concatenating
        lambda a, b, d=None: F.zip_with(
            a, b,
            # mv_zip always yields keyword — cast the lone-tail branches
            # so when/otherwise type unification stays string-typed
            lambda x, y: F.when(x.isNull(), y.cast("string"))
            .when(y.isNull(), x.cast("string"))
            .otherwise(
                F.concat_ws(
                    "", x, d if d is not None else F.lit(","), y
                )
            ),
        ),
    ),
    "mv_percentile": (
        2, 2,
        # exact percentile over a multivalue: linear interpolation on
        # the sorted values (quantile_cont contract, like MEDIAN); p in
        # 0..100 per ES|QL. Pure Column arithmetic — rank r = p/100 ·
        # (n−1), value = v[⌊r⌋] + frac(r) · (v[⌊r⌋+1] − v[⌊r⌋])
        lambda a, p: F.when(
            F.size(a) > 0,
            (
                F.element_at(
                    F.array_sort(a),
                    (
                        F.floor(
                            (p.cast("double") / 100.0) * (F.size(a) - 1)
                        ) + 1
                    ).cast("int"),
                ).cast("double")
                + (
                    (p.cast("double") / 100.0) * (F.size(a) - 1)
                    - F.floor(
                        (p.cast("double") / 100.0) * (F.size(a) - 1)
                    )
                )
                * (
                    F.element_at(
                        F.array_sort(a),
                        F.least(
                            F.floor(
                                (p.cast("double") / 100.0)
                                * (F.size(a) - 1)
                            ).cast("int") + 2,
                            F.size(a),
                        ),
                    ).cast("double")
                    - F.element_at(
                        F.array_sort(a),
                        (
                            F.floor(
                                (p.cast("double") / 100.0)
                                * (F.size(a) - 1)
                            ) + 1
                        ).cast("int"),
                    ).cast("double")
                )
            ),
        ),
    ),
    "ip_prefix": (
        3, 3,
        # ip_prefix(ip, v4_len, v6_len): zero the host bits of an IPv4
        # dotted-quad (v6 is out of scope — no IPv6 type here); integer
        # Column arithmetic end-to-end (mask = drop ipn mod 2^(32-len))
        lambda ip, v4, _v6: _fn_ip_prefix_v4(ip, v4),
    ),
    "mv_median": (
        1, 1,
        # even-length arrays average the two middle values (ES|QL)
        lambda a: F.when(
            F.size(a) > 0,
            (
                F.element_at(
                    F.array_sort(a),
                    F.floor((F.size(a) + 1) / 2).cast("int"),
                ).cast("double")
                + F.element_at(
                    F.array_sort(a),
                    F.floor((F.size(a) + 2) / 2).cast("int"),
                ).cast("double")
            ) / 2,
        ),
    ),
}

# date_diff units, as integer microsecond divisors (ES|QL truncates
# toward zero; calendar units beyond weeks need calendar math and are
# intentionally out)
_DATE_DIFF_US = {
    "microseconds": 1,
    "milliseconds": 1_000,
    "seconds": 1_000_000,
    "minutes": 60 * 1_000_000,
    "hours": 3600 * 1_000_000,
    "days": 86400 * 1_000_000,
    "weeks": 7 * 86400 * 1_000_000,
}

def _mad_outside_stats(_a):
    raise ESQLError(
        "ES|QL: median_absolute_deviation is supported in STATS only "
        "(it needs a per-group median pre-pass)"
    )


_AGG_FNS: dict = {
    "count": lambda a: F.count(a[0] if a else F.lit(1)),
    "count_distinct": lambda a: F.count_distinct(a[0]),
    "sum": lambda a: F.sum(a[0]),
    "avg": lambda a: F.avg(a[0]),
    "min": lambda a: F.min(a[0]),
    "max": lambda a: F.max(a[0]),
    "values": lambda a: F.sort_array(F.collect_set(a[0])),
    "weighted_avg": lambda a: F.sum(a[0] * a[1]) / F.sum(a[1]),
    # ES|QL MEDIAN/PERCENTILE are t-digest-approximate in ES by design;
    # exact percentile here is the oracle-checkable contract (the
    # documented scale path is percentile_approx — a mergeable sketch —
    # exactly like the _search percentiles agg)
    "median": lambda a: F.percentile(a[0], F.lit(0.5)),
    "percentile": lambda a: F.percentile(
        a[0], a[1].cast("double") / F.lit(100.0)
    ),
    # ES|QL STD_DEV is the population standard deviation (Welford)
    "std_dev": lambda a: F.stddev_pop(a[0]),
    # top() is special-cased in _compile_agg (literal limit/order args);
    # median_absolute_deviation is AST-rewritten by the STATS executor
    # (median pre-pass + join-back); both live here so agg detection
    # (_is_agg_call/_contains_agg) sees them
    "top": lambda a: (_ for _ in ()).throw(
        ESQLError("ES|QL: top() needs literal limit/order arguments")
    ),
    "median_absolute_deviation": _mad_outside_stats,
}


def _compile_expr(node) -> Column:
    kind = node[0]
    if kind == "lit":
        return F.lit(node[1])
    if kind == "col":
        return F.col("`" + node[1] + "`") if "." in node[1] else F.col(node[1])
    if kind == "arr":
        return F.array(*[_compile_expr(it) for it in node[1]])
    if kind == "neg":
        return -_compile_expr(node[1])
    if kind == "not":
        return ~_compile_expr(node[1])
    if kind == "bin":
        op, l, r = node[1], _compile_expr(node[2]), _compile_expr(node[3])
        if op == "==":
            return l == r
        if op == "!=":
            return l != r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "%":
            return l % r
        if op == "and":
            return l & r
        if op == "or":
            return l | r
        raise ESQLError(f"ES|QL: unknown operator {op}")
    if kind == "in":
        expr = _compile_expr(node[1]).isin([n[1] for n in node[2]])
        return ~expr if node[3] else expr
    if kind == "like":
        x = _compile_expr(node[1])
        # ES|QL RLIKE matches the ENTIRE string (Lucene RegexpQuery
        # semantics, where . also crosses newlines) — anchor and set
        # DOTALL, since Spark's rlike is a partial match by default
        expr = (
            x.rlike("^(?s:" + node[2] + ")$") if node[4]
            else x.like(_like_to_sql(node[2]))
        )
        return ~expr if node[3] else expr
    if kind == "isnull":
        x = _compile_expr(node[1])
        return x.isNotNull() if node[2] else x.isNull()
    if kind == "call":
        name, args = node[1], node[2]
        if name == "hash":
            # ES|QL hash(alg, v): the algorithm is a literal selecting
            # the digest — md5/sha1/sha256 (the Spark-native set)
            if len(args) != 2 or args[0][0] != "lit":
                raise ESQLError("ES|QL: hash() takes (literal alg, expr)")
            alg = str(args[0][1]).lower()
            x = _compile_expr(args[1])
            if alg == "md5":
                return F.md5(x)
            if alg == "sha1":
                return F.sha1(x)
            if alg in ("sha256", "sha-256"):
                return F.sha2(x, 256)
            raise ESQLError(
                f"ES|QL: hash() algorithm {alg!r} — md5/sha1/sha256 here"
            )
        if name == "date_trunc":
            # accept the timespan-literal form (``date_trunc(1 month, x)``
            # normalizes to the "1 month" string): count 1 → calendar
            # truncation; N second/minute/hour/day → fixed-width floor
            if (
                args and args[0][0] == "lit" and isinstance(args[0][1], str)
                and re.fullmatch(r"\d+\s+\w+", args[0][1].strip())
            ):
                n_s, unit = args[0][1].strip().split()
                n, unit = int(n_s), unit.rstrip("s")
                x = _compile_expr(args[1])
                if n == 1:
                    return F.date_trunc(unit, x)
                fixed = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
                if unit in fixed:
                    secs = n * fixed[unit]
                    return F.timestamp_seconds(
                        F.floor(F.unix_timestamp(x) / secs) * secs
                    )
                raise ESQLError(
                    f"ES|QL: date_trunc multiple {n} {unit} — calendar "
                    "units support count 1 only"
                )
            if args[0][0] != "lit" or not isinstance(args[0][1], str):
                raise ESQLError("ES|QL: date_trunc needs a literal string unit")
            return F.date_trunc(args[0][1], _compile_expr(args[1]))
        if name == "date_extract":
            # date_extract(part, date) — java.time ChronoField names,
            # the subset with exact Spark builtins
            if args[0][0] != "lit" or not isinstance(args[0][1], str):
                raise ESQLError(
                    "ES|QL: date_extract needs a literal ChronoField name"
                )
            part = args[0][1].strip().lower()
            fns = {
                "year": F.year,
                "month_of_year": F.month,
                "day_of_month": F.dayofmonth,
                "day_of_week": F.dayofweek,
                "day_of_year": F.dayofyear,
                "hour_of_day": F.hour,
                "minute_of_hour": F.minute,
                "second_of_minute": F.second,
                "aligned_week_of_year": F.weekofyear,
            }
            if part not in fns:
                raise ESQLError(
                    f"ES|QL: date_extract supports {sorted(fns)}, "
                    f"got {part!r}"
                )
            return fns[part](_compile_expr(args[1])).cast("long")
        if name == "date_parse":
            # date_parse(format, string) — java DateTimeFormatter
            # patterns, which Spark's to_timestamp shares
            if args[0][0] != "lit" or not isinstance(args[0][1], str):
                raise ESQLError(
                    "ES|QL: date_parse needs a literal format string"
                )
            return F.to_timestamp(_compile_expr(args[1]), args[0][1])
        if name in ("match", "qstr"):
            # ES|QL full-text functions (8.16+): boolean WHERE filters.
            # match(field, query[, operator]) analyzes the literal query
            # with the ENGINE analyzer and tests the analyzed field
            # tokens — OR (default) = any term present, AND = all terms.
            # qstr("text") is the field-less shorthand over the `text`
            # column. No scoring in WHERE context (ES|QL scores only
            # through METADATA _score, out of scope here); the filter is
            # pure Column set algebra — no UDF, no index required, and
            # on an indexed relation the same semantics are served by
            # Searcher.matching_doc_ids.
            from kafka_es_spark.functions.tokenize import (
                tokenize_py, tokens as _tokens_col,
            )

            if name == "qstr":
                if len(args) != 1 or args[0][0] != "lit":
                    raise ESQLError(
                        "ES|QL: qstr(query) needs one literal query string"
                    )
                field_col, qnode, op = F.col("text"), args[0], "or"
            else:
                if len(args) not in (2, 3) or args[1][0] != "lit":
                    raise ESQLError(
                        "ES|QL: match(field, query[, operator]) needs a "
                        "literal query"
                    )
                field_col = _compile_expr(args[0])
                qnode = args[1]
                op = "or"
                if len(args) == 3:
                    if args[2][0] != "lit":
                        raise ESQLError(
                            "ES|QL: match() operator must be a literal"
                        )
                    op = str(args[2][1]).lower()
                    if op not in ("or", "and"):
                        raise ESQLError(
                            "ES|QL: match() operator must be 'or'|'and'"
                        )
            terms = sorted(set(tokenize_py(str(qnode[1]))))
            if not terms:
                return F.lit(False)
            toks = _tokens_col(field_col)
            if op == "and":
                cond = F.array_contains(toks, terms[0])
                for t in terms[1:]:
                    cond = cond & F.array_contains(toks, t)
                return cond
            return F.arrays_overlap(
                toks, F.array(*[F.lit(t) for t in terms])
            )
        if name == "cidr_match":
            # cidr_match(ip, block...) — true when the IPv4 address
            # falls in ANY literal CIDR block: the address converts to
            # one u32 Column, each block to a (base, mask) pair folded
            # at compile time, so the match is pure integer Column
            # arithmetic (pushdown-friendly, no UDF)
            if len(args) < 2:
                raise ESQLError("ES|QL: cidr_match(ip, block, ...)")
            ip = _compile_expr(args[0])
            oct_ = F.split(ip, r"\.")
            ipn = (
                F.element_at(oct_, 1).cast("long") * 16777216
                + F.element_at(oct_, 2).cast("long") * 65536
                + F.element_at(oct_, 3).cast("long") * 256
                + F.element_at(oct_, 4).cast("long")
            )
            cond = None
            for b in args[1:]:
                if b[0] != "lit" or not isinstance(b[1], str):
                    raise ESQLError(
                        "ES|QL: cidr_match blocks must be literal strings"
                    )
                spec = b[1]
                addr, _, plen_s = spec.partition("/")
                parts = addr.split(".")
                if len(parts) != 4:
                    raise ESQLError(
                        f"ES|QL: cidr_match supports IPv4 blocks, got {spec!r}"
                    )
                plen = int(plen_s) if plen_s else 32
                if not (0 <= plen <= 32):
                    raise ESQLError(f"ES|QL: bad prefix length in {spec!r}")
                base = 0
                for p in parts:
                    base = base * 256 + int(p)
                mask = ((1 << 32) - 1) ^ ((1 << (32 - plen)) - 1)
                c = (
                    ipn.bitwiseAND(F.lit(mask)) == F.lit(base & mask)
                )
                cond = c if cond is None else (cond | c)
            return cond
        if name == "date_format":
            if args[0][0] != "lit" or not isinstance(args[0][1], str):
                raise ESQLError("ES|QL: date_format needs a literal format string")
            return F.date_format(_compile_expr(args[1]), args[0][1])
        if name == "date_diff":
            # date_diff(unit, start, end): whole units from start to end,
            # truncated toward zero (integer µs arithmetic — engine-exact)
            if args[0][0] != "lit" or not isinstance(args[0][1], str):
                raise ESQLError("ES|QL: date_diff needs a literal unit string")
            unit = args[0][1].strip().lower()
            u = unit if unit.endswith("s") else unit + "s"
            if u not in _DATE_DIFF_US:
                raise ESQLError(
                    f"ES|QL: date_diff supports only "
                    f"{sorted(_DATE_DIFF_US)}, got {unit!r}"
                )
            d = F.unix_micros(_compile_expr(args[2])) - F.unix_micros(
                _compile_expr(args[1])
            )
            # integer division truncates toward -inf for negatives; ES
            # truncates toward zero — route through the sign
            q = F.abs(d) / F.lit(_DATE_DIFF_US[u])
            return (F.signum(d.cast("double")).cast("long")
                    * F.floor(q).cast("long"))
        if name == "mv_concat":
            if args[1][0] != "lit" or not isinstance(args[1][1], str):
                raise ESQLError("ES|QL: mv_concat needs a literal delimiter")
            return F.array_join(_compile_expr(args[0]), args[1][1])
        if name == "bucket":
            # BUCKET(expr, span) — the direct-span form of ES|QL's grouping
            # function: numeric literal span → floor-aligned lower bound;
            # literal duration string ("1 hour", "30 minute", "1 week") →
            # calendar / fixed-width time bucket. The 4-arg auto-"nice"
            # form (target count + range) is intentionally not implemented:
            # its chosen width is a heuristic, and a deterministic span is
            # the reproducible subset.
            if len(args) != 2 or args[1][0] != "lit":
                raise ESQLError(
                    "ES|QL: bucket() takes (expr, literal span) — a number "
                    "or a duration string like '1 hour'"
                )
            span = args[1][1]
            x = _compile_expr(args[0])
            if isinstance(span, str):
                m = re.fullmatch(r"(\d+)\s*([a-z]+?)s?", span.strip().lower())
                if not m:
                    raise ESQLError(f"ES|QL: bucket() bad duration {span!r}")
                n, unit = int(m.group(1)), m.group(2)
                fixed = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
                if unit in fixed:
                    secs = n * fixed[unit]
                    return F.timestamp_seconds(
                        F.floor(F.unix_timestamp(x) / secs) * secs
                    )
                if unit in ("week", "month", "quarter", "year") and n == 1:
                    return F.date_trunc(unit, x)
                raise ESQLError(
                    f"ES|QL: bucket() duration unit {unit!r} supports only "
                    "count 1 (calendar units) or second/minute/hour/day"
                )
            return F.floor(x / F.lit(span)) * F.lit(span)
        if name == "round":
            # digits must stay a python int for Spark's round(); a
            # negative-digit literal arrives as a neg node — fold it
            if len(args) == 2:
                d = args[1]
                if d[0] == "neg" and d[1][0] == "lit":
                    d = ("lit", -d[1][1])
                if d[0] != "lit":
                    raise ESQLError("ES|QL: round() digits must be a literal")
                return F.round(_compile_expr(args[0]), int(d[1]))
            return F.round(_compile_expr(args[0]), 0)
        if name == "log" and len(args) == 2:
            # ES|QL log(base, value); Spark's two-arg F.log takes the
            # base as a python float, so the base must be a literal
            b = args[0]
            if b[0] == "neg" and b[1][0] == "lit":
                b = ("lit", -b[1][1])
            if b[0] != "lit":
                raise ESQLError("ES|QL: log(base, value) base must be a literal")
            return F.log(float(b[1]), _compile_expr(args[1]))
        spec = _SCALAR_FNS.get(name)
        if spec is None:
            raise ESQLError(f"ES|QL: unknown function {name}()")
        lo, hi, builder = spec
        if not (lo <= len(args) <= hi):
            raise ESQLError(f"ES|QL: {name}() takes {lo}..{hi} args, got {len(args)}")
        return builder(*[_compile_expr(a) for a in args])
    if kind == "star":
        raise ESQLError("ES|QL: * is only valid inside COUNT(*)")
    raise ESQLError(f"ES|QL: cannot compile node {node!r}")


def _expr_text(node) -> str:
    """Canonical text of an expression — ES|QL's default output column name."""
    kind = node[0]
    if kind == "lit":
        v = node[1]
        return f'"{v}"' if isinstance(v, str) else ("null" if v is None else str(v))
    if kind == "col":
        return node[1]
    if kind == "neg":
        return "-" + _expr_text(node[1])
    if kind == "not":
        return "NOT " + _expr_text(node[1])
    if kind == "bin":
        return f"{_expr_text(node[2])} {node[1]} {_expr_text(node[3])}"
    if kind == "call":
        return f"{node[1]}({', '.join(_expr_text(a) for a in node[2])})"
    if kind == "star":
        return "*"
    return "expr"


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------


@dataclass
class _Cmd:
    name: str
    payload: dict = field(default_factory=dict)


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _lex(text)
        self.i = 0

    # -- token helpers ----------------------------------------------------
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.value.lower() in words

    def eat_kw(self, word: str) -> _Tok:
        t = self.next()
        if t.kind != "kw" or t.value.lower() != word:
            raise ESQLError(f"ES|QL: expected {word.upper()} at {t.pos}, got {t.value!r}")
        return t

    def eat_op(self, op: str) -> _Tok:
        t = self.next()
        if t.kind != "op" or t.value != op:
            raise ESQLError(f"ES|QL: expected {op!r} at {t.pos}, got {t.value!r}")
        return t

    def eat_ident(self) -> str:
        t = self.next()
        if t.kind == "ident":
            return t.value
        # keywords are legal field names in ES|QL when unambiguous
        if t.kind == "kw" and t.value.lower() not in {"and", "or", "not", "null", "true", "false"}:
            return t.value
        raise ESQLError(f"ES|QL: expected identifier at {t.pos}, got {t.value!r}")

    # -- pipeline ----------------------------------------------------------
    def parse(self) -> list[_Cmd]:
        cmds = [self.parse_source()]
        while True:
            t = self.peek()
            if t.kind == "eof":
                break
            if not (t.kind == "op" and t.value == "|"):
                raise ESQLError(f"ES|QL: expected | at {t.pos}, got {t.value!r}")
            self.next()
            cmds.append(self.parse_command())
        return cmds

    def parse_source(self) -> _Cmd:
        t = self.peek()
        if self.at_kw("from"):
            self.next()
            return _Cmd("from", {"table": self.eat_ident()})
        if self.at_kw("row"):
            self.next()
            assigns = self.parse_assign_list()
            return _Cmd("row", {"assigns": assigns})
        raise ESQLError(f"ES|QL: query must start with FROM or ROW (at {t.pos})")

    def parse_command(self) -> _Cmd:
        t = self.peek()
        if t.kind != "kw":
            raise ESQLError(f"ES|QL: expected a command at {t.pos}, got {t.value!r}")
        word = t.value.lower()
        self.next()
        if word == "where":
            return _Cmd("where", {"expr": self.parse_expr()})
        if word == "eval":
            return _Cmd("eval", {"assigns": self.parse_assign_list()})
        if word == "stats":
            aggs = self.parse_named_expr_list()
            keys = []
            if self.at_kw("by"):
                self.next()
                keys = self.parse_named_expr_list()
            return _Cmd("stats", {"aggs": aggs, "keys": keys})
        if word == "inlinestats":
            aggs = self.parse_named_expr_list()
            keys = []
            if self.at_kw("by"):
                self.next()
                keys = self.parse_named_expr_list()
            return _Cmd("inlinestats", {"aggs": aggs, "keys": keys})
        if word == "change_point":
            value = self.eat_ident()
            on = "@timestamp"
            if self.at_kw("on"):
                self.next()
                on = self.eat_ident()
            names = ("type", "pvalue")
            if self.at_kw("as"):
                self.next()
                a = self.eat_ident()
                self.eat_op(",")
                b = self.eat_ident()
                names = (a, b)
            return _Cmd("change_point", {"value": value, "on": on, "as": names})
        if word == "sort":
            return _Cmd("sort", {"keys": self.parse_sort_keys()})
        if word == "limit":
            t = self.next()
            if t.kind != "num":
                raise ESQLError(f"ES|QL: LIMIT needs an integer at {t.pos}")
            return _Cmd("limit", {"n": int(t.value)})
        if word in ("keep", "drop"):
            pats = [self.parse_name_pattern()]
            while self.peek().kind == "op" and self.peek().value == ",":
                self.next()
                pats.append(self.parse_name_pattern())
            return _Cmd(word, {"patterns": pats})
        if word == "rename":
            pairs = []
            while True:
                old = self.eat_ident()
                self.eat_kw("as")
                new = self.eat_ident()
                pairs.append((old, new))
                if self.peek().kind == "op" and self.peek().value == ",":
                    self.next()
                    continue
                break
            return _Cmd("rename", {"pairs": pairs})
        if word == "mv_expand":
            return _Cmd("mv_expand", {"col": self.eat_ident()})
        if word == "lookup":
            self.eat_kw("join")
            table = self.eat_ident()
            self.eat_kw("on")
            key = self.eat_ident()
            return _Cmd("lookup_join", {"table": table, "key": key})
        if word in ("dissect", "grok"):
            col = self.eat_ident()
            t = self.next()
            if t.kind != "str":
                raise ESQLError(
                    f"ES|QL: {word.upper()} needs a string pattern at {t.pos}"
                )
            return _Cmd(word, {"col": col, "pattern": t.value})
        if word == "sample":
            t = self.next()
            if t.kind != "num":
                raise ESQLError(f"ES|QL: SAMPLE needs a probability at {t.pos}")
            p = float(t.value)
            if not (0.0 < p <= 1.0):
                raise ESQLError(f"ES|QL: SAMPLE probability must be in (0, 1], got {p}")
            seed = 0
            if self.peek().kind == "num":
                seed = int(self.next().value)
            return _Cmd("sample", {"p": p, "seed": seed})
        if word == "enrich":
            policy = self.eat_ident()
            on = None
            if self.at_kw("on"):
                self.next()
                on = self.eat_ident()
            withs = None
            if self.at_kw("with"):
                self.next()
                withs = []
                while True:
                    a = self.eat_ident()
                    if self.peek().kind == "op" and self.peek().value == "=":
                        self.next()
                        withs.append((a, self.eat_ident()))
                    else:
                        withs.append((a, a))
                    if self.peek().kind == "op" and self.peek().value == ",":
                        self.next()
                        continue
                    break
            return _Cmd("enrich", {"policy": policy, "on": on, "with": withs})
        if word == "fork":
            # FORK ( cmd | cmd | ... ) ( ... ) — each parenthesised branch
            # is a sub-pipeline over the SAME input; outputs union by name
            # with a _fork discriminator (ES|QL 8.16 semantics, max 8)
            branches: list[list[_Cmd]] = []
            while self.peek().kind == "op" and self.peek().value == "(":
                self.next()
                branch = [self.parse_command()]
                while self.peek().kind == "op" and self.peek().value == "|":
                    self.next()
                    branch.append(self.parse_command())
                self.eat_op(")")
                branches.append(branch)
            if len(branches) < 2:
                raise ESQLError(
                    f"ES|QL: FORK needs at least two (...) branches at {t.pos}"
                )
            if len(branches) > 8:
                raise ESQLError("ES|QL: FORK supports at most 8 branches")
            return _Cmd("fork", {"branches": branches})
        raise ESQLError(f"ES|QL: unknown command {word.upper()} at {t.pos}")

    # -- pieces -------------------------------------------------------------
    def parse_assign_list(self) -> list[tuple[str, tuple]]:
        out = []
        while True:
            name = self.eat_ident()
            self.eat_op("=")
            out.append((name, self.parse_expr()))
            if self.peek().kind == "op" and self.peek().value == ",":
                self.next()
                continue
            break
        return out

    def parse_named_expr_list(self) -> list[tuple[str, tuple]]:
        """`name = expr` or bare `expr` (named by its canonical text)."""
        out = []
        while True:
            mark = self.i
            name = None
            t = self.peek()
            if t.kind in ("ident", "kw") and t.value.lower() not in {"and", "or", "not"}:
                nxt = self.toks[self.i + 1]
                if nxt.kind == "op" and nxt.value == "=":
                    name = self.eat_ident()
                    self.next()  # '='
            expr = self.parse_expr()
            out.append((name or _expr_text(expr), expr))
            del mark
            if self.peek().kind == "op" and self.peek().value == ",":
                self.next()
                continue
            break
        return out

    def parse_sort_keys(self) -> list[tuple[tuple, bool, str | None]]:
        keys = []
        while True:
            expr = self.parse_expr()
            asc = True
            nulls = None
            if self.at_kw("asc", "desc"):
                asc = self.next().value.lower() == "asc"
            if self.at_kw("nulls"):
                self.next()
                t = self.next()
                if t.kind != "kw" or t.value.lower() not in ("first", "last"):
                    raise ESQLError(f"ES|QL: expected FIRST or LAST at {t.pos}")
                nulls = t.value.lower()
            keys.append((expr, asc, nulls))
            if self.peek().kind == "op" and self.peek().value == ",":
                self.next()
                continue
            break
        return keys

    def parse_name_pattern(self) -> str:
        """KEEP/DROP item: identifier possibly containing * wildcards."""
        parts = []
        if self.peek().kind == "op" and self.peek().value == "*":
            parts.append(self.next().value)
        while True:
            t = self.peek()
            if t.kind in ("ident", "kw") and t.value.lower() not in {"and", "or", "not"}:
                parts.append(self.next().value)
            elif t.kind == "op" and t.value == "*":
                parts.append(self.next().value)
            else:
                break
            # stop unless the next token glues directly (no space) — simpler:
            nxt = self.peek()
            if not (nxt.kind == "op" and nxt.value == "*") and not (
                parts[-1] == "*" and nxt.kind in ("ident", "kw")
            ):
                break
        if not parts:
            raise ESQLError(f"ES|QL: expected a column pattern at {self.peek().pos}")
        return "".join(parts)

    # -- expressions (precedence climbing) -----------------------------------
    def parse_expr(self) -> tuple:
        return self.parse_or()

    def parse_or(self) -> tuple:
        left = self.parse_and()
        while self.at_kw("or"):
            self.next()
            left = ("bin", "or", left, self.parse_and())
        return left

    def parse_and(self) -> tuple:
        left = self.parse_not()
        while self.at_kw("and"):
            self.next()
            left = ("bin", "and", left, self.parse_not())
        return left

    def parse_not(self) -> tuple:
        if self.at_kw("not"):
            self.next()
            return ("not", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> tuple:
        left = self.parse_additive()
        t = self.peek()
        if t.kind == "op" and t.value in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return ("bin", t.value, left, self.parse_additive())
        negated = False
        if self.at_kw("not"):
            nxt = self.toks[self.i + 1]
            if nxt.kind == "kw" and nxt.value.lower() in ("in", "like", "rlike"):
                self.next()
                negated = True
        if self.at_kw("in"):
            self.next()
            self.eat_op("(")
            items = []
            while True:
                items.append(self.parse_literal())
                if self.peek().kind == "op" and self.peek().value == ",":
                    self.next()
                    continue
                break
            self.eat_op(")")
            return ("in", left, items, negated)
        if self.at_kw("like", "rlike"):
            is_regex = self.next().value.lower() == "rlike"
            t = self.next()
            if t.kind != "str":
                raise ESQLError(f"ES|QL: LIKE/RLIKE needs a string pattern at {t.pos}")
            return ("like", left, t.value, negated, is_regex)
        if self.at_kw("is"):
            self.next()
            neg = False
            if self.at_kw("not"):
                self.next()
                neg = True
            self.eat_kw("null")
            return ("isnull", left, neg)
        return left

    def parse_additive(self) -> tuple:
        left = self.parse_multiplicative()
        while self.peek().kind == "op" and self.peek().value in ("+", "-"):
            op = self.next().value
            left = ("bin", op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self) -> tuple:
        left = self.parse_unary()
        while self.peek().kind == "op" and self.peek().value in ("*", "/", "%"):
            op = self.next().value
            left = ("bin", op, left, self.parse_unary())
        return left

    def parse_unary(self) -> tuple:
        t = self.peek()
        if t.kind == "op" and t.value == "-":
            self.next()
            return ("neg", self.parse_unary())
        return self.parse_primary()

    def parse_literal(self) -> tuple:
        t = self.next()
        if t.kind == "num":
            v = float(t.value) if ("." in t.value or "e" in t.value.lower()) else int(t.value)
            return ("lit", v)
        if t.kind == "str":
            return ("lit", t.value)
        if t.kind == "kw" and t.value.lower() in ("true", "false"):
            return ("lit", t.value.lower() == "true")
        if t.kind == "kw" and t.value.lower() == "null":
            return ("lit", None)
        if t.kind == "op" and t.value == "-":
            inner = self.parse_literal()
            return ("lit", -inner[1])
        raise ESQLError(f"ES|QL: expected a literal at {t.pos}, got {t.value!r}")

    def parse_primary(self) -> tuple:
        t = self.peek()
        if t.kind == "op" and t.value == "(":
            self.next()
            expr = self.parse_expr()
            self.eat_op(")")
            return expr
        if t.kind == "op" and t.value == "*":
            self.next()
            return ("star",)
        if t.kind == "op" and t.value == "[":
            # ES|QL multivalue literal: [expr, expr, ...]
            self.next()
            items = []
            if not (self.peek().kind == "op" and self.peek().value == "]"):
                while True:
                    items.append(self.parse_expr())
                    if self.peek().kind == "op" and self.peek().value == ",":
                        self.next()
                        continue
                    break
            self.eat_op("]")
            return ("arr", items)
        if t.kind == "num":
            lit = self.parse_literal()
            # ES|QL timespan literal: an integer followed by a calendar
            # unit (``1 month``, ``30 minutes``) — normalized to the
            # "<n> <unit>" duration-string form date_trunc/bucket accept
            nxt = self.peek()
            if (
                isinstance(lit[1], int)
                and nxt.kind in ("ident", "kw")
                and nxt.value.lower().rstrip("s") in _SPAN_UNITS
            ):
                unit = self.next().value.lower().rstrip("s")
                return ("lit", f"{lit[1]} {unit}")
            return lit
        if t.kind == "str":
            return self.parse_literal()
        if t.kind == "kw" and t.value.lower() in ("true", "false", "null"):
            return self.parse_literal()
        if t.kind in ("ident", "kw"):
            name = self.next().value
            if self.peek().kind == "op" and self.peek().value == "(":
                self.next()
                args = []
                if not (self.peek().kind == "op" and self.peek().value == ")"):
                    while True:
                        args.append(self.parse_expr())
                        if self.peek().kind == "op" and self.peek().value == ",":
                            self.next()
                            continue
                        break
                self.eat_op(")")
                return ("call", name.lower(), args)
            return ("col", name)
        raise ESQLError(f"ES|QL: unexpected token {t.value!r} at {t.pos}")


# --------------------------------------------------------------------------
# Compiler — command list → DataFrame
# --------------------------------------------------------------------------


def _is_agg_call(node) -> bool:
    return node[0] == "call" and node[1] in _AGG_FNS


def _contains_agg(node) -> bool:
    if _is_agg_call(node):
        return True
    if node[0] in ("neg", "not", "isnull"):
        return _contains_agg(node[1])
    if node[0] == "bin":
        return _contains_agg(node[2]) or _contains_agg(node[3])
    if node[0] in ("in", "like"):
        return _contains_agg(node[1])
    if node[0] == "call":
        return any(_contains_agg(a) for a in node[2])
    return False


def _compile_agg(node) -> Column:
    """STATS expression: scalar functions/arithmetic over aggregate-call
    leaves (ES|QL allows e.g. ``round(avg(x), 2)`` or ``sum(a)/sum(b)``)."""
    if _is_agg_call(node):
        name, args = node[1], node[2]
        if name == "count" and (not args or args[0][0] == "star"):
            return F.count(F.lit(1))
        if name == "top":
            # ES|QL top(field, limit, order): the limit/order arguments
            # must be literals (they shape the plan, not the data)
            if (
                len(args) != 3
                or args[1][0] != "lit"
                or args[2][0] != "lit"
            ):
                raise ESQLError(
                    "ES|QL: top(field, limit, order) needs literal "
                    "limit and order"
                )
            n = int(args[1][1])
            order = str(args[2][1]).lower()
            if order not in ("asc", "desc") or n < 1:
                raise ESQLError(
                    "ES|QL: top() order must be 'asc'|'desc' and limit >= 1"
                )
            arr = F.sort_array(
                F.collect_list(_compile_expr(args[0])), asc=(order == "asc")
            )
            return F.slice(arr, 1, n)
        compiled = [_compile_expr(a) for a in args]
        if name == "count":
            return F.count(compiled[0])
        return _AGG_FNS[name](compiled)
    if not _contains_agg(node):
        raise ESQLError(
            f"ES|QL: STATS expects aggregate functions "
            f"({', '.join(sorted(_AGG_FNS))}), got {_expr_text(node)}"
        )
    # Recurse: rebuild the scalar wrapper with agg leaves compiled.
    if node[0] == "neg":
        return -_compile_agg(node[1])
    if node[0] == "bin":
        op = node[1]
        l = _compile_agg(node[2]) if _contains_agg(node[2]) else _compile_expr(node[2])
        r = _compile_agg(node[3]) if _contains_agg(node[3]) else _compile_expr(node[3])
        return {
            "+": l + r, "-": l - r, "*": l * r, "/": l / r, "%": l % r,
            "==": l == r, "!=": l != r, "<": l < r, "<=": l <= r,
            ">": l > r, ">=": l >= r, "and": l & r, "or": l | r,
        }[op]
    if node[0] == "call":
        name, args = node[1], node[2]
        if name == "round":
            if len(args) == 2:
                if args[1][0] != "lit":
                    raise ESQLError("ES|QL: round() digits must be a literal")
                return F.round(_compile_agg(args[0]), int(args[1][1]))
            return F.round(_compile_agg(args[0]), 0)
        spec = _SCALAR_FNS.get(name)
        if spec is None:
            raise ESQLError(f"ES|QL: unknown function {name}()")
        lo, hi, builder = spec
        if not (lo <= len(args) <= hi):
            raise ESQLError(f"ES|QL: {name}() takes {lo}..{hi} args, got {len(args)}")
        return builder(*[
            _compile_agg(a) if _contains_agg(a) else _compile_expr(a) for a in args
        ])
    raise ESQLError(f"ES|QL: cannot mix {node[0]} with aggregates in STATS")


def _expand_patterns(patterns: list[str], columns: list[str], cmd: str) -> list[str]:
    out: list[str] = []
    for pat in patterns:
        if "*" in pat:
            rx = re.compile("^" + re.escape(pat).replace(r"\*", ".*") + "$")
            matched = [c for c in columns if rx.match(c) and c not in out]
            out.extend(matched)
        else:
            if pat not in columns:
                raise ESQLError(f"ES|QL: {cmd.upper()} references unknown column {pat!r}")
            if pat not in out:
                out.append(pat)
    return out


def _apply(df: DataFrame, cmd: _Cmd, resolve) -> DataFrame:
    if cmd.name == "fork":
        # Each branch is an independent sub-plan over the same input —
        # Catalyst sees one DAG with a shared scan, so the input is read
        # once per branch at worst and the fan-out is plan-level, never
        # materialized. Outputs union BY NAME (missing columns null) with
        # the _fork discriminator, exactly ES|QL's fork1..forkN labels.
        outs = []
        for i, branch in enumerate(cmd.payload["branches"], start=1):
            b = df
            for c in branch:
                b = _apply(b, c, resolve)
            outs.append(b.withColumn("_fork", F.lit(f"fork{i}")))
        out = outs[0]
        for b in outs[1:]:
            out = out.unionByName(b, allowMissingColumns=True)
        return out
    if cmd.name == "where":
        return df.filter(_compile_expr(cmd.payload["expr"]))
    if cmd.name == "eval":
        for name, expr in cmd.payload["assigns"]:
            df = df.withColumn(name, _compile_expr(expr))
        return df
    if cmd.name == "stats":
        agg_specs = cmd.payload["aggs"]
        # median_absolute_deviation = median(|x - median(x)|): a nested
        # aggregate, so it cannot be one agg expression. Rewrite each
        # MAD leaf to median(abs(x - __mad_med_i)) and feed the inner
        # per-group median through a pre-pass aggregation joined back
        # (broadcast — the join side is group-count-sized).
        mads: list = []

        def _rw(node):
            if isinstance(node, (tuple, list)):
                if (
                    node[0] == "call"
                    and node[1] == "median_absolute_deviation"
                ):
                    if len(node[2]) != 1:
                        raise ESQLError(
                            "ES|QL: median_absolute_deviation takes one "
                            "argument"
                        )
                    ph = f"__mad_med_{len(mads)}"
                    arg = node[2][0]
                    mads.append((ph, arg))
                    return (
                        "call", "median",
                        [("call", "abs", [("bin", "-", arg, ("col", ph))])],
                    )
                return type(node)(
                    _rw(x) if isinstance(x, (tuple, list)) else x
                    for x in node
                )
            return node

        agg_specs = [(name, _rw(expr)) for name, expr in agg_specs]
        if mads:
            key_specs = cmd.payload["keys"]
            for kname, kexpr in key_specs:
                if kexpr[0] != "col" or kname != kexpr[1]:
                    raise ESQLError(
                        "ES|QL: median_absolute_deviation BY supports "
                        "bare column keys only"
                    )
            med_aggs = [
                F.percentile(_compile_expr(arg), F.lit(0.5)).alias(ph)
                for ph, arg in mads
            ]
            if key_specs:
                knames = [k for k, _ in key_specs]
                med = df.groupBy(*knames).agg(*med_aggs)
                df = df.join(broadcast(med), on=knames, how="left")
            else:
                df = df.crossJoin(broadcast(df.agg(*med_aggs)))
        aggs = [
            _compile_agg(expr).alias(name) for name, expr in agg_specs
        ]
        keys = [
            _compile_expr(expr).alias(name) for name, expr in cmd.payload["keys"]
        ]
        if keys:
            return df.groupBy(*keys).agg(*aggs)
        return df.agg(*aggs)
    if cmd.name == "inlinestats":
        # INLINESTATS: STATS that keeps every input row — the aggregate
        # values join back onto the rows they summarize (ES|QL 8.16).
        # Plan: one hash aggregate to a #groups-row table, broadcast
        # back; same-named columns are shadowed (EVAL-style).
        # aggregate under reserved internal names and shadow AFTER the
        # join-back: an agg alias that equals a BY key (INLINESTATS
        # n = count(*) BY n) must group on the original column and then
        # replace it, not delete the key before grouping
        agg_names = [name for name, _ in cmd.payload["aggs"]]
        aggs = [
            _compile_agg(expr).alias(f"__inlinestats_{name}")
            for name, expr in cmd.payload["aggs"]
        ]
        keys = cmd.payload["keys"]
        if not keys:
            out = df.crossJoin(broadcast(df.agg(*aggs)))
        else:
            key_cols = []
            for name, expr in keys:
                if expr[0] != "col" or name != expr[1]:
                    raise ESQLError(
                        "ES|QL: INLINESTATS BY supports bare column keys only"
                    )
                if name not in df.columns:
                    raise ESQLError(
                        "ES|QL: INLINESTATS BY references unknown column "
                        f"{name!r}"
                    )
                key_cols.append(name)
            grouped = df.groupBy(*key_cols).agg(*aggs)
            out = df.join(broadcast(grouped), on=key_cols, how="left")
        for name in agg_names:
            out = out.drop(name).withColumnRenamed(
                f"__inlinestats_{name}", name
            )
        return out
    if cmd.name == "change_point":
        # CHANGE_POINT value [ON key] [AS type_name, pvalue_name]
        # (ES|QL 8.18): appends two columns, non-null only on the detected
        # row. Deterministic deviation from ES: the pvalue slot carries
        # the scaled mean-shift statistic (operators/sessions.change_point
        # — p-value calibration is model-side and intentionally out), so
        # reruns and oracles agree bit-for-bit.
        from kafka_es_spark.operators.sessions import change_point as _cp

        value, on = cmd.payload["value"], cmd.payload["on"]
        for c in (value, on):
            if c not in df.columns:
                raise ESQLError(
                    f"ES|QL: CHANGE_POINT references unknown column {c!r}"
                )
        tname, pname = cmd.payload["as"]
        cpr = _cp(df, order_col=on, metric_col=value).select(
            F.col("change_at").alias("__cp_at"),
            F.col("stat").alias("__cp_stat"),
            F.col("type").alias("__cp_type"),
        )
        out = df.join(broadcast(cpr), on=df[on] == cpr["__cp_at"], how="left")
        return (
            out.withColumn(tname, F.col("__cp_type"))
            .withColumn(pname, F.col("__cp_stat"))
            .drop("__cp_at", "__cp_stat", "__cp_type")
        )
    if cmd.name == "sort":
        cols = []
        for expr, asc, nulls in cmd.payload["keys"]:
            c = _compile_expr(expr)
            # ES|QL default: nulls sort LAST in both directions.
            if asc:
                c = c.asc_nulls_first() if nulls == "first" else c.asc_nulls_last()
            else:
                c = c.desc_nulls_first() if nulls == "first" else c.desc_nulls_last()
            cols.append(c)
        return df.orderBy(*cols)
    if cmd.name == "limit":
        return df.limit(cmd.payload["n"])
    if cmd.name == "keep":
        cols = _expand_patterns(cmd.payload["patterns"], df.columns, "keep")
        return df.select(*cols)
    if cmd.name == "drop":
        dropped = set(_expand_patterns(cmd.payload["patterns"], df.columns, "drop"))
        return df.select(*[c for c in df.columns if c not in dropped])
    if cmd.name == "rename":
        for old, new in cmd.payload["pairs"]:
            if old not in df.columns:
                raise ESQLError(f"ES|QL: RENAME references unknown column {old!r}")
            df = df.withColumnRenamed(old, new)
        return df
    if cmd.name == "mv_expand":
        col = cmd.payload["col"]
        if col not in df.columns:
            raise ESQLError(f"ES|QL: MV_EXPAND references unknown column {col!r}")
        others = [c for c in df.columns if c != col]
        return df.select(*others, F.explode_outer(col).alias(col)).select(*df.columns)
    if cmd.name == "sample":
        p, seed = cmd.payload["p"], cmd.payload["seed"]
        # Portable content-hash Bernoulli keep: first 8 md5 hex chars of
        # the seeded full row → uniform 32-bit int; keep iff its ppm bucket
        # is under p. Deterministic at any parallelism; oracle-reproducible.
        key = F.concat_ws(
            "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in df.columns]
        )
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        return df.filter((h % 1000000) < int(p * 1000000))
    if cmd.name in ("dissect", "grok"):
        src = cmd.payload["col"]
        if src not in df.columns:
            raise ESQLError(f"ES|QL: {cmd.name.upper()} references unknown column {src!r}")
        if cmd.name == "dissect":
            rx, names = _dissect_to_regex(cmd.payload["pattern"])
            fields = [(n, None) for n in names]
        else:
            rx, fields = _grok_to_regex(cmd.payload["pattern"])
        matched = F.col(src).rlike(rx)
        for gi, (name, cast) in enumerate(fields, start=1):
            val = F.regexp_extract(F.col(src), rx, gi)
            if cast:
                val = val.cast(cast)
            # non-matching rows keep the row, fields null (ES|QL semantics)
            df = df.withColumn(name, F.when(matched, val))
        return df
    if cmd.name == "lookup_join":
        lookup = resolve(cmd.payload["table"])
        key = cmd.payload["key"]
        # ES|QL lookup indices are bounded dimension relations → broadcast.
        return df.join(broadcast(lookup), on=key, how="left")
    if cmd.name == "enrich":
        # ENRICH policy [ON match_field] [WITH [new = ] enrich_field, ...]
        # The policy resolves through the same relation namespace as FROM /
        # LOOKUP JOIN; convention: its FIRST column is the policy's
        # match_field (the enrich-policy store of the ES cluster, reduced
        # to a relation). Enrich indices are bounded → broadcast left join;
        # enriched fields overwrite same-named input columns (EVAL-style
        # shadowing, ES|QL behaviour).
        pol = resolve(cmd.payload["policy"])
        pol_match = pol.columns[0]
        match = cmd.payload["on"] or pol_match
        if match not in df.columns:
            raise ESQLError(
                f"ES|QL: ENRICH match field {match!r} not in input columns"
            )
        withs = cmd.payload["with"] or [
            (c, c) for c in pol.columns if c != pol_match
        ]
        for _, src_f in withs:
            if src_f not in pol.columns:
                raise ESQLError(
                    f"ES|QL: ENRICH field {src_f!r} not in policy "
                    f"{cmd.payload['policy']!r}"
                )
        right = pol.select(
            F.col(pol_match).alias("__enrich_key"),
            *[
                F.col(src_f).alias(f"__enrich_{i}")
                for i, (_, src_f) in enumerate(withs)
            ],
        )
        out = df.join(
            broadcast(right),
            on=df[match] == right["__enrich_key"],
            how="left",
        ).drop("__enrich_key")
        for i, (new, _) in enumerate(withs):
            out = out.withColumn(new, F.col(f"__enrich_{i}")).drop(
                f"__enrich_{i}"
            )
        return out
    raise ESQLError(f"ES|QL: unhandled command {cmd.name}")


def esql_query(spark, query: str, tables) -> DataFrame:
    """Compile and run an ES|QL pipeline; returns the (lazy) DataFrame.

    ``tables``: dict name→DataFrame, or callable name→DataFrame — the
    relation resolver for FROM and LOOKUP JOIN (the ES|QL index
    namespace).
    """
    resolve = tables if callable(tables) else (
        lambda name: tables[name] if name in tables
        else (_ for _ in ()).throw(ESQLError(f"ES|QL: unknown index {name!r}"))
    )
    cmds = _Parser(query).parse()
    src = cmds[0]
    if src.name == "from":
        df = resolve(src.payload["table"])
    else:  # ROW
        exprs = [
            _compile_expr(expr).alias(name) for name, expr in src.payload["assigns"]
        ]
        df = spark.range(1).select(*exprs)
    for cmd in cmds[1:]:
        df = _apply(df, cmd, resolve)
    return df
