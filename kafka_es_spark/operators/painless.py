"""X9 remainder — painless-lite script updates.

The reference routes Update actions whose body is a script to ES
(BulkAction.kt:55-102; golden test BulkActionTests.kt:193-201 pins
``{"script": {"lang": "painless", "source":
"ctx._source.counter += params.param1", "params": {"param1": 1}}}``).
Rounds 1-4 documented general painless as out of scope; this module
closes the common subset — the shapes that appear in real bulk-update
traffic — WITHOUT a per-row interpreter: the script is COMPILED ONCE to
Spark Column expressions, so execution stays inside whole-stage codegen
(no Python in the row path, identical cost to hand-written withColumn
chains).

Supported subset (raises PainlessError for anything outside it, never
silently misexecutes):

* statements ``;``-separated; assignment targets ``ctx._source.<field>``
  with ``=  +=  -=  *=  /=  %=``
* ``ctx._source.remove('<field>')`` — assigns SQL NULL (the columnar
  analogue of removing a key from the source map)
* ``ctx.op = <expr>`` — 'index' (default), 'none' (keep the original
  doc), 'delete' (drop the row); evaluated per doc, so conditional
  deletes compile too
* expressions: long/double/string/boolean/null literals,
  ``params.<name>`` / ``params['name']`` (bound at compile time),
  ``ctx._source.<field>`` reads, arithmetic ``+ - * / %`` (``+``
  concatenates when either side is a string, painless/Java semantics),
  comparisons, ``&& || !``, ternary ``cond ? a : b``, parentheses, and
  ``Math.max/min/abs/floor/ceil/round``
* ``if (cond) { ... } [else if (...) ... else { ... }]`` — including
  braceless single-statement branches; branches compile to conditional
  assignment merges (still one projection)
* sequential semantics: a later statement reads the values earlier
  statements assigned (compiled via an expression environment, not by
  re-reading the input column)

Scale: the compiled plan is a single projection — 10^12 docs pay one
columnar map, no shuffle, no Python workers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PainlessError(ValueError):
    """Script uses syntax outside the compiled painless subset."""


# --- tokenizer --------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d+|\d+)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op>\+=|-=|\*=|/=|%=|==|!=|<=|>=|&&|\|\||[-+*/%=<>!?:;.,()\[\]{}])
    )""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            rest = src[pos:].strip()
            if not rest:
                break
            raise PainlessError(f"painless: cannot tokenize at {rest[:25]!r}")
        pos = m.end()
        for kind in ("num", "str", "ident", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


# --- AST --------------------------------------------------------------------


@dataclass
class _Lit:
    value: object


@dataclass
class _Field:
    name: str


@dataclass
class _Bin:
    op: str
    left: object
    right: object


@dataclass
class _Un:
    op: str
    operand: object


@dataclass
class _Tern:
    cond: object
    then: object
    other: object


@dataclass
class _Math:
    fn: str
    args: list


@dataclass
class _Assign:
    target: str  # field name, or the reserved "\x00op"
    op: str  # '=' or augmented
    expr: object


@dataclass
class _If:
    """``if (cond) { ... } [else ...]`` — compiled to conditional
    assignment merges, still one projection, no per-row interpreter."""

    cond: object
    then: list
    els: list


@dataclass
class _ScoreRef:
    """``_score`` inside a script_score expression."""


@dataclass
class _DocRef:
    """``doc['field'].value`` inside a script_score expression."""

    name: str


_MATH_FNS = {"max", "min", "abs", "floor", "ceil", "round",
             "log", "log10", "sqrt", "exp", "pow"}
_OP_TARGET = "\x00op"


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], params: dict):
        self.toks = tokens
        self.i = 0
        self.params = params or {}

    def _peek(self) -> str | None:
        return self.toks[self.i][1] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise PainlessError("painless: unexpected end of script")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, val: str) -> None:
        k, v = self._next()
        if v != val:
            raise PainlessError(f"painless: expected {val!r}, got {v!r}")

    # statements -------------------------------------------------------------

    def parse_script(self) -> list:
        stmts = []
        while self.i < len(self.toks):
            if self._peek() == ";":
                self._next()
                continue
            stmts.append(self.parse_stmt_or_if())
        if not stmts:
            raise PainlessError("painless: empty script")
        return stmts

    def parse_block(self) -> list:
        self._expect("{")
        stmts = []
        while self._peek() != "}":
            if self._peek() is None:
                raise PainlessError("painless: unterminated block")
            if self._peek() == ";":
                self._next()
                continue
            stmts.append(self.parse_stmt_or_if())
        self._expect("}")
        return stmts

    def parse_stmt_or_if(self):
        if self._peek() == "if":
            self._next()
            self._expect("(")
            cond = self.parse_expr()
            self._expect(")")
            then = (
                self.parse_block() if self._peek() == "{"
                else [self.parse_stmt_or_if()]
            )
            els: list = []
            if self._peek() == "else":
                self._next()
                if self._peek() == "if":
                    els = [self.parse_stmt_or_if()]
                else:
                    els = (
                        self.parse_block() if self._peek() == "{"
                        else [self.parse_stmt_or_if()]
                    )
            return _If(cond, then, els)
        return self.parse_stmt()

    def parse_stmt(self) -> _Assign:
        self._expect("ctx")
        self._expect(".")
        k, v = self._next()
        if v == "op":
            self._expect("=")
            return _Assign(_OP_TARGET, "=", self.parse_expr())
        if v != "_source":
            raise PainlessError(
                f"painless: only ctx._source / ctx.op assignable, got ctx.{v}"
            )
        self._expect(".")
        k, name = self._next()
        if k != "ident":
            raise PainlessError(f"painless: bad field name {name!r}")
        if name == "remove" and self._peek() == "(":
            self._next()
            k, s = self._next()
            if k != "str":
                raise PainlessError("painless: remove() takes a string literal")
            self._expect(")")
            return _Assign(_unquote(s), "=", _Lit(None))
        k, op = self._next()
        if op not in ("=", "+=", "-=", "*=", "/=", "%="):
            raise PainlessError(f"painless: bad assignment operator {op!r}")
        return _Assign(name, op, self.parse_expr())

    # expressions (precedence climbing) --------------------------------------

    def parse_expr(self):
        return self.parse_ternary()

    def parse_ternary(self):
        cond = self.parse_or()
        if self._peek() == "?":
            self._next()
            then = self.parse_expr()
            self._expect(":")
            return _Tern(cond, then, self.parse_expr())
        return cond

    def parse_or(self):
        n = self.parse_and()
        while self._peek() == "||":
            self._next()
            n = _Bin("||", n, self.parse_and())
        return n

    def parse_and(self):
        n = self.parse_cmp()
        while self._peek() == "&&":
            self._next()
            n = _Bin("&&", n, self.parse_cmp())
        return n

    def parse_cmp(self):
        n = self.parse_add()
        if self._peek() in ("==", "!=", "<", "<=", ">", ">="):
            op = self._next()[1]
            return _Bin(op, n, self.parse_add())
        return n

    def parse_add(self):
        n = self.parse_mul()
        while self._peek() in ("+", "-"):
            op = self._next()[1]
            n = _Bin(op, n, self.parse_mul())
        return n

    def parse_mul(self):
        n = self.parse_unary()
        while self._peek() in ("*", "/", "%"):
            op = self._next()[1]
            n = _Bin(op, n, self.parse_unary())
        return n

    def parse_unary(self):
        if self._peek() == "-":
            self._next()
            return _Un("-", self.parse_unary())
        if self._peek() == "!":
            self._next()
            return _Un("!", self.parse_unary())
        return self.parse_primary()

    def parse_primary(self):
        k, v = self._next()
        if k == "num":
            return _Lit(float(v) if "." in v else int(v))
        if k == "str":
            return _Lit(_unquote(v))
        if k == "ident":
            if v == "true":
                return _Lit(True)
            if v == "false":
                return _Lit(False)
            if v == "null":
                return _Lit(None)
            if v == "params":
                return self._parse_param()
            if v == "ctx":
                self._expect(".")
                self._expect("_source")
                self._expect(".")
                kk, name = self._next()
                if kk != "ident":
                    raise PainlessError(f"painless: bad field ref {name!r}")
                return _Field(name)
            if v == "_score":
                return _ScoreRef()
            if v == "doc":
                # doc['field'].value — the script_score field accessor
                self._expect("[")
                kk, s = self._next()
                if kk != "str":
                    raise PainlessError("painless: doc[...] takes a string")
                self._expect("]")
                self._expect(".")
                kk, attr = self._next()
                if attr != "value":
                    raise PainlessError(
                        f"painless: only doc[...].value supported, got "
                        f".{attr}"
                    )
                return _DocRef(_unquote(s))
            if v == "Math":
                self._expect(".")
                _, fn = self._next()
                if fn not in _MATH_FNS:
                    raise PainlessError(f"painless: Math.{fn} unsupported")
                self._expect("(")
                args = [self.parse_expr()]
                while self._peek() == ",":
                    self._next()
                    args.append(self.parse_expr())
                self._expect(")")
                return _Math(fn, args)
            if v in ("saturation", "sigmoid") and self._peek() == "(":
                # ES script_score helpers: saturation(x, pivot) =
                # x/(x+pivot); sigmoid(x, k, a) = x^a/(k^a + x^a)
                self._next()
                args = [self.parse_expr()]
                while self._peek() == ",":
                    self._next()
                    args.append(self.parse_expr())
                self._expect(")")
                want = 2 if v == "saturation" else 3
                if len(args) != want:
                    raise PainlessError(
                        f"painless: {v}() takes {want} args, got {len(args)}"
                    )
                return _Math(v, args)
            raise PainlessError(f"painless: unknown identifier {v!r}")
        if v == "(":
            e = self.parse_expr()
            self._expect(")")
            return e
        raise PainlessError(f"painless: unexpected token {v!r}")

    def _parse_param(self):
        if self._peek() == ".":
            self._next()
            k, name = self._next()
            if k != "ident":
                raise PainlessError(f"painless: bad param name {name!r}")
        elif self._peek() == "[":
            self._next()
            k, s = self._next()
            if k != "str":
                raise PainlessError("painless: params[...] takes a string")
            name = _unquote(s)
            self._expect("]")
        else:
            raise PainlessError("painless: params needs .name or ['name']")
        if name not in self.params:
            raise PainlessError(f"painless: missing script param {name!r}")
        return _Lit(self.params[name])


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


# --- compiler ---------------------------------------------------------------


def _is_stringy(node, env_types: dict) -> bool:
    if isinstance(node, _Lit):
        return isinstance(node.value, str)
    if isinstance(node, (_Field, _DocRef)):
        return env_types.get(node.name) == "string"
    if isinstance(node, _Bin) and node.op == "+":
        return _is_stringy(node.left, env_types) or _is_stringy(
            node.right, env_types
        )
    if isinstance(node, _Tern):
        return _is_stringy(node.then, env_types) or _is_stringy(
            node.other, env_types
        )
    return False


def _compile(node, env: dict, env_types: dict) -> Column:
    if isinstance(node, _Lit):
        return F.lit(node.value)
    if isinstance(node, _Field):
        if node.name not in env:
            raise PainlessError(
                f"painless: ctx._source.{node.name} is not a column of the "
                "target relation"
            )
        return env[node.name]
    if isinstance(node, _ScoreRef):
        if "\x00score" not in env:
            raise PainlessError("painless: _score is not available here")
        return env["\x00score"]
    if isinstance(node, _DocRef):
        if node.name not in env:
            raise PainlessError(
                f"painless: doc[{node.name!r}] is not a stored field of the "
                "target relation"
            )
        return env[node.name]
    if isinstance(node, _Un):
        c = _compile(node.operand, env, env_types)
        return -c if node.op == "-" else ~c
    if isinstance(node, _Tern):
        return F.when(
            _compile(node.cond, env, env_types),
            _compile(node.then, env, env_types),
        ).otherwise(_compile(node.other, env, env_types))
    if isinstance(node, _Math):
        args = [_compile(a, env, env_types) for a in node.args]
        fn = {
            "max": F.greatest, "min": F.least, "abs": F.abs,
            "floor": F.floor, "ceil": F.ceil, "round": F.round,
            "log": F.log, "log10": F.log10, "sqrt": F.sqrt,
            "exp": F.exp, "pow": F.pow,
            "saturation": lambda x, p: x / (x + p),
            "sigmoid": lambda x, k, a: F.pow(x, a)
            / (F.pow(k, a) + F.pow(x, a)),
        }[node.fn]
        return fn(*args)
    if isinstance(node, _Bin):
        le = _compile(node.left, env, env_types)
        ri = _compile(node.right, env, env_types)
        if node.op == "+":
            # painless/Java '+': string concatenation when either side is
            # a string (types resolved against the target schema)
            if _is_stringy(node.left, env_types) or _is_stringy(
                node.right, env_types
            ):
                return F.concat(le.cast("string"), ri.cast("string"))
            return le + ri
        return {
            "-": lambda: le - ri, "*": lambda: le * ri,
            "/": lambda: le / ri, "%": lambda: le % ri,
            "==": lambda: le == ri, "!=": lambda: le != ri,
            "<": lambda: le < ri, "<=": lambda: le <= ri,
            ">": lambda: le > ri, ">=": lambda: le >= ri,
            "&&": lambda: le & ri, "||": lambda: le | ri,
        }[node.op]()
    raise PainlessError(f"painless: cannot compile {node!r}")


class ScriptPlan:
    """A compiled painless-lite script: ``apply`` projects the update onto
    a DataFrame. ``assigned_fields`` is known at compile time so callers
    (update_by_query) can enforce their stored-fields contract BEFORE
    running anything."""

    def __init__(self, source: str, params: dict | None = None):
        self.source = source
        self.stmts = _Parser(_tokenize(source), params or {}).parse_script()
        targets: set = set()

        def walk(stmts):
            for s in stmts:
                if isinstance(s, _If):
                    walk(s.then)
                    walk(s.els)
                else:
                    targets.add(s.target)

        walk(self.stmts)
        self.assigned_fields = sorted(targets - {_OP_TARGET})
        self.sets_op = _OP_TARGET in targets

    def apply(self, df: DataFrame, where: Column | None = None) -> DataFrame:
        """Run the script over every row (or the ``where`` subset; other
        rows pass through byte-identical). ES semantics: ``ctx.op``
        'none' keeps the original doc, 'delete' drops the row."""
        env_types = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        for name in self.assigned_fields:
            if name not in env_types:
                raise PainlessError(
                    f"painless: ctx._source.{name} is not a column of the "
                    "target relation"
                )
        env = {c: F.col(c) for c in df.columns}
        op_col: Column = F.lit("index")

        def run(stmts, env, op_col):
            for s in stmts:
                if isinstance(s, _If):
                    # compile cond against the CURRENT env (sequential
                    # semantics), run each branch on a copy, and merge
                    # only the expressions a branch actually changed
                    cond = _compile(s.cond, env, env_types)
                    env_t, op_t = run(s.then, dict(env), op_col)
                    env_e, op_e = run(s.els, dict(env), op_col)
                    for key in set(env_t) | set(env_e):
                        a = env_t.get(key, env[key])
                        b = env_e.get(key, env[key])
                        if a is env.get(key) and b is env.get(key):
                            continue
                        env[key] = F.when(cond, a).otherwise(b)
                    if op_t is not op_col or op_e is not op_col:
                        op_col = F.when(cond, op_t).otherwise(op_e)
                    continue
                if s.target == _OP_TARGET:
                    op_col = _compile(s.expr, env, env_types).cast("string")
                    continue
                rhs = _compile(s.expr, env, env_types)
                if s.op != "=":
                    base = env[s.target]
                    rhs = {
                        "+=": lambda: base + rhs
                        if env_types.get(s.target) != "string"
                        else F.concat(base, rhs.cast("string")),
                        "-=": lambda: base - rhs,
                        "*=": lambda: base * rhs,
                        "/=": lambda: base / rhs,
                        "%=": lambda: base % rhs,
                    }[s.op]()
                # preserve the column's declared type (painless
                # arithmetic on a long column writes a long back; '/'
                # promotion is kept for double columns by the cast
                # target being the column's type)
                t = env_types.get(s.target)
                if t is not None:
                    rhs = rhs.cast(t)
                env[s.target] = rhs
            return env, op_col

        env, op_col = run(self.stmts, env, op_col)
        scoped = F.lit(True) if where is None else where
        # 'none': original values win even where the script matched
        eff = scoped & (op_col != F.lit("none"))
        out = df.select(
            *[
                F.when(eff, env[c]).otherwise(F.col(c)).alias(c)
                if c in self.assigned_fields
                else F.col(c)
                for c in df.columns
            ],
            F.when(scoped, op_col).otherwise(F.lit("index")).alias("__op"),
        )
        return out.filter(F.col("__op") != "delete").drop("__op")


def _walk_doc_fields(node, out: set) -> None:
    if isinstance(node, _DocRef):
        out.add(node.name)
    elif isinstance(node, _Bin):
        _walk_doc_fields(node.left, out)
        _walk_doc_fields(node.right, out)
    elif isinstance(node, _Un):
        _walk_doc_fields(node.operand, out)
    elif isinstance(node, _Tern):
        for n in (node.cond, node.then, node.other):
            _walk_doc_fields(n, out)
    elif isinstance(node, _Math):
        for n in node.args:
            _walk_doc_fields(n, out)


class ScoreScript:
    """A compiled script_score EXPRESSION (ES ``script_score`` query /
    ``function_score`` script function): ``_score`` is the inner query's
    BM25 score, ``doc['field'].value`` reads a stored field. Compiled
    once to a Column; ``doc_fields`` is known up front so the caller can
    join exactly the stored columns the script touches — nothing more."""

    def __init__(self, source: str, params: dict | None = None):
        self.source = source
        p = _Parser(_tokenize(source), params or {})
        self.ast = p.parse_expr()
        if p.i != len(p.toks):
            raise PainlessError(
                f"painless: trailing tokens after expression: "
                f"{[t[1] for t in p.toks[p.i:]][:5]}"
            )
        fields: set = set()
        _walk_doc_fields(self.ast, fields)
        self.doc_fields = sorted(fields)

    def column(
        self,
        score: Column,
        fields: dict[str, Column] | None = None,
        field_types: dict[str, str] | None = None,
    ) -> Column:
        env = {"\x00score": score, **(fields or {})}
        missing = [f for f in self.doc_fields if f not in env]
        if missing:
            raise PainlessError(
                f"painless: script references doc fields {missing} the "
                "caller did not provide"
            )
        return _compile(self.ast, env, dict(field_types or {}))


def script_update(
    docs: DataFrame,
    source: str,
    params: dict | None = None,
    where: Column | None = None,
) -> DataFrame:
    """One-call form: compile + apply (see ScriptPlan)."""
    return ScriptPlan(source, params).apply(docs, where=where)
