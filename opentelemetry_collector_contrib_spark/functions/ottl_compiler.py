"""OTTL statement compiler: statement strings → Spark Column edits.

The reference parses OTTL with participle into a closure tree it
interprets one record at a time with NO optimizer
(``pkg/ottl/grammar.go:14-20``, ``parser.go:150-169``,
``expression.go:25-57`` — see SURVEY.md §3 EP2). Here the same grammar
subset compiles to a ``DataFrame -> DataFrame`` transformation built
from Column expressions — Catalyst/codegen is the optimizer the
reference never had, and a list of statements fuses into one
projection.

Supported surface (the load-bearing subset of the grammar):
- statements: ``editor(args...) [where <bool expr>]`` with editors
  set, delete_key, delete_matching_keys, keep_keys, keep_matching_keys,
  truncate_all, limit, replace_pattern, replace_all_patterns,
  merge_maps
- paths: top-level fields (``body``, ``severity_number``...),
  ``attributes["k"]`` / ``resource["k"]`` map indexing, dotted struct
  fields (``resource.host``)
- converters: every Uppercase function in ``OTTL_CONVERTERS``
- literals: int/float/string/bool/nil, lists; enums
  ``SEVERITY_NUMBER_*``
- operators: ``+ - * /`` (OTTL math semantics: / by zero → NULL =
  statement error under error_mode=ignore), comparisons, and/or/not

error_mode=ignore matches the reference default: a NULL where-clause
leaves the row unedited (``apply_statement`` null-safe gate).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import SEVERITY_NUMBER
from ..operators import transform as TR
from .ottl import OTTL_CONVERTERS

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<op>==|!=|>=|<=|&&|\|\||[()\[\],.<>+\-*/])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise OTTLSyntaxError(f"bad character at {pos}: {src[pos:pos + 10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(Tok(kind, m.group()))
    toks.append(Tok("eof", ""))
    return toks


class OTTLSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST-free recursive-descent compile (expressions become Columns directly)
# ---------------------------------------------------------------------------

ENUMS = {f"SEVERITY_NUMBER_{k.upper()}": v for k, v in SEVERITY_NUMBER.items()}

_PATH_ROOTS = {"body", "attributes", "resource", "severity_number", "severity_text",
               "trace_id", "span_id", "ts", "observed_ts", "scope", "flags",
               "time", "time_unix_nano", "event_name", "cache"}


@dataclass
class Path:
    """A settable location: top-level column, map key, or struct field."""
    column: str
    map_key: str | None = None
    field: str | None = None

    def get(self) -> Column:
        c = F.col(self.column)
        if self.map_key is not None:
            return F.element_at(c, self.map_key)
        if self.field is not None:
            return c.getField(self.field)
        return c


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise OTTLSyntaxError(f"expected {text!r}, got {t.text!r}")
        return t

    # -- expressions --------------------------------------------------

    def parse_or(self) -> Column:
        left = self.parse_and()
        while self.peek().text in ("or", "||"):
            self.next()
            left = left | self.parse_and()
        return left

    def parse_and(self) -> Column:
        left = self.parse_not()
        while self.peek().text in ("and", "&&"):
            self.next()
            left = left & self.parse_not()
        return left

    def parse_not(self) -> Column:
        if self.peek().text == "not":
            self.next()
            return ~self.parse_not()
        return self.parse_comparison()

    def parse_comparison(self) -> Column:
        left = self.parse_additive()
        op = self.peek().text
        if op in ("==", "!=", ">", ">=", "<", "<="):
            self.next()
            right = self.parse_additive()
            lc, rc = _as_col(left), _as_col(right)
            return {
                "==": lc == rc, "!=": lc != rc, ">": lc > rc,
                ">=": lc >= rc, "<": lc < rc, "<=": lc <= rc,
            }[op]
        return left

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            right = self.parse_multiplicative()
            lc, rc = _as_col(left), _as_col(right)
            left = lc + rc if op == "+" else lc - rc
        return left

    def parse_multiplicative(self):
        left = self.parse_primary()
        while self.peek().text in ("*", "/"):
            op = self.next().text
            right = self.parse_primary()
            lc, rc = _as_col(left), _as_col(right)
            if op == "*":
                left = lc * rc
            else:
                # OTTL /0 is a statement error -> NULL (error_mode=ignore),
                # math.go:165-180
                left = F.when(rc != 0, lc / rc)
        return left

    def parse_primary(self):
        t = self.peek()
        if t.text == "(":
            self.next()
            e = self.parse_or()
            self.expect(")")
            return e
        if t.text == "[":
            return self.parse_list()
        if t.kind == "string":
            self.next()
            return _unquote(t.text)
        if t.kind == "int":
            self.next()
            return int(t.text)
        if t.kind == "float":
            self.next()
            return float(t.text)
        if t.kind == "ident":
            return self.parse_ident()
        raise OTTLSyntaxError(f"unexpected token {t.text!r}")

    def parse_list(self) -> list:
        self.expect("[")
        items = []
        while self.peek().text != "]":
            items.append(self.parse_or())
            if self.peek().text == ",":
                self.next()
        self.expect("]")
        return items

    def parse_ident(self):
        name = self.next().text
        if name == "true":
            return True
        if name == "false":
            return False
        if name == "nil":
            return None
        if name in ENUMS:
            return ENUMS[name]
        if self.peek().text == "(":
            return self.parse_call(name)
        return self.parse_path(name)

    def parse_call(self, name: str) -> Column:
        if name not in OTTL_CONVERTERS:
            raise OTTLSyntaxError(f"unknown converter {name!r}")
        self.expect("(")
        args = []
        while self.peek().text != ")":
            args.append(self.parse_or())
            if self.peek().text == ",":
                self.next()
        self.expect(")")
        fn = OTTL_CONVERTERS[name]
        # converters take (Column, python-literal...) — coerce the
        # first argument to a Column, keep literal args as literals
        if args and not isinstance(args[0], Column):
            if name in ("Concat", "Format"):
                # lead with a literal (delimiter/format), rest are values
                coerced = [args[0]] + [_as_col(a) for a in args[1:]]
                return fn(*coerced)
            if name != "Duration":  # Duration parses a literal string
                args[0] = _as_col(args[0])
        return fn(*args)

    def parse_path(self, root: str) -> Path | Column:
        if root not in _PATH_ROOTS:
            raise OTTLSyntaxError(f"unknown path root {root!r}")
        path = Path(column=root)
        while True:
            t = self.peek()
            if t.text == "[":
                self.next()
                key = self.next()
                if key.kind != "string":
                    raise OTTLSyntaxError("map index must be a string literal")
                self.expect("]")
                path.map_key = _unquote(key.text)
            elif t.text == ".":
                self.next()
                path.field = self.next().text
            else:
                break
        return path

    # -- statements ---------------------------------------------------

    def parse_statement(self):
        name = self.next().text
        self.expect("(")
        args = []
        while self.peek().text != ")":
            args.append(self.parse_or())
            if self.peek().text == ",":
                self.next()
        self.expect(")")
        where = None
        if self.peek().text == "where":
            self.next()
            where = _as_col(self.parse_or())
        if self.peek().kind != "eof":
            raise OTTLSyntaxError(f"trailing input: {self.peek().text!r}")
        return name, args, where


def _unquote(s: str) -> str:
    return s[1:-1].encode().decode("unicode_escape")


def _as_col(v) -> Column:
    if isinstance(v, Path):
        return v.get()
    if isinstance(v, Column):
        return v
    return F.lit(v)


# ---------------------------------------------------------------------------
# editor dispatch
# ---------------------------------------------------------------------------

def _edit(name: str, args: list, where: Column | None, df: DataFrame) -> DataFrame:
    def stmt(target: str, edit: Column) -> DataFrame:
        return TR.apply_statement(df, target, edit, where=where)

    if name == "set":
        path, value = args[0], _as_col(args[1])
        if not isinstance(path, Path):
            raise OTTLSyntaxError("set() target must be a path")
        if path.map_key is not None:
            return stmt(path.column, TR.map_set(F.col(path.column), path.map_key, value))
        return stmt(path.column, value)

    if name == "replace_pattern":
        tgt = args[0]
        if not isinstance(tgt, Path):
            raise OTTLSyntaxError("replace_pattern() target must be a path")
        edited = F.regexp_replace(tgt.get(), args[1], args[2])
        if tgt.map_key is not None:
            return stmt(tgt.column, TR.map_set(F.col(tgt.column), tgt.map_key, edited))
        return stmt(tgt.column, edited)

    # remaining editors operate on a map path
    path = args[0]
    if not isinstance(path, Path) or path.map_key is not None:
        raise OTTLSyntaxError(f"{name}() expects a map path")
    m = F.col(path.column)
    if name == "delete_key":
        return stmt(path.column, TR.map_delete_key(m, args[1]))
    if name == "delete_matching_keys":
        return stmt(path.column, TR.map_delete_matching_keys(m, args[1]))
    if name == "keep_matching_keys":
        return stmt(path.column, TR.map_keep_matching_keys(m, args[1]))
    if name == "keep_keys":
        return stmt(path.column, TR.map_keep_keys(m, list(args[1])))
    if name == "truncate_all":
        return stmt(path.column, TR.map_truncate_all(m, args[1]))
    if name == "limit":
        pri = list(args[2]) if len(args) > 2 else None
        return stmt(path.column, TR.map_limit(m, args[1], priority_keys=pri))
    if name == "replace_all_patterns":
        mode = args[1]  # "key" | "value"
        return stmt(path.column, TR.map_replace_all_patterns(m, args[2], args[3], mode))
    if name == "merge_maps":
        other = _as_col(args[1])
        strategy = args[2] if len(args) > 2 else "upsert"
        return stmt(path.column, TR.map_merge(m, other, strategy))
    raise OTTLSyntaxError(f"unknown editor {name!r}")


EDITORS = {
    "set", "delete_key", "delete_matching_keys", "keep_keys",
    "keep_matching_keys", "truncate_all", "limit", "replace_pattern",
    "replace_all_patterns", "merge_maps",
}


def compile_statement(src: str):
    """OTTL statement string -> (DataFrame -> DataFrame)."""
    name, args, where = Parser(src).parse_statement()
    if name not in EDITORS:
        raise OTTLSyntaxError(f"unknown editor {name!r}")

    def apply(df: DataFrame) -> DataFrame:
        return _edit(name, args, where, df)

    return apply


def compile_statements(statements: list[str]):
    """Statement sequence -> one composed transformation (order
    preserved, exactly the transformprocessor statement list)."""
    fns = [compile_statement(s) for s in statements]

    def apply(df: DataFrame) -> DataFrame:
        for fn in fns:
            df = fn(df)
        return df

    return apply


def compile_condition(src: str) -> Column:
    """OTTL boolean condition string -> Column (filterprocessor /
    routingconnector route conditions)."""
    p = Parser(src)
    col = _as_col(p.parse_or())
    if p.peek().kind != "eof":
        raise OTTLSyntaxError(f"trailing input: {p.peek().text!r}")
    return col
