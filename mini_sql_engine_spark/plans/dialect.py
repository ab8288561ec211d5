"""Parser for the reference's SQL dialect.

Grammar (the surveyed assignment spec, SURVEY.md §2.1 O3–O14; the
reference implements it as a hand-rolled walk over ``sqlparse`` tokens in
``main.py`` ``parse_query()``):

    query       := SELECT select_list FROM table_list [WHERE where] ';'
    select_list := '*'
                 | DISTINCT column (',' column)*
                 | agg (',' agg)*
                 | column (',' column)*
    agg         := (MAX|MIN|SUM|AVG|COUNT) '(' [DISTINCT] column ')'
    table_list  := name (',' name)*
    where       := cond [(AND|OR) cond]          # at most one connective
    cond        := operand op operand
    operand     := column | integer_literal
    op          := '<=' | '>=' | '!=' | '<>' | '=' | '<' | '>'
    column      := name | name '.' name

Case-insensitive keywords; the trailing ';' is required (the reference
rejects queries without it). ``!=``/``<>`` is [R-uncertain] in the
reference (present in sibling implementations) — supported here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class EngineError(Exception):
    """User-facing query error (parse or semantic), reference-style."""


AGG_FUNCS = ("MAX", "MIN", "SUM", "AVG", "COUNT")
COMPARE_OPS = ("<=", ">=", "!=", "<>", "=", "<", ">")

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<op><=|>=|!=|<>|=|<|>)
      | (?P<punct>[(),;*])
      | (?P<num>-?\d+)
      | (?P<name>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)?)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class ColumnRef:
    table: str | None  # None = bare column, resolved by the analyzer
    column: str

    def __str__(self) -> str:
        return f"{self.table}.{self.column}" if self.table else self.column


@dataclass(frozen=True)
class SelectItem:
    """One select-list item: a column, or agg(column) [with DISTINCT]."""

    column: ColumnRef
    agg: str | None = None  # MAX|MIN|SUM|AVG|COUNT
    agg_distinct: bool = False


@dataclass(frozen=True)
class Condition:
    lhs: ColumnRef
    op: str  # normalized: <> → !=
    rhs: ColumnRef | int  # int ⇒ literal comparison


@dataclass
class ParsedQuery:
    select_star: bool = False
    distinct: bool = False
    items: list[SelectItem] = field(default_factory=list)
    tables: list[str] = field(default_factory=list)
    conditions: list[Condition] = field(default_factory=list)
    connective: str | None = None  # AND | OR | None

    @property
    def is_aggregate(self) -> bool:
        return any(i.agg for i in self.items)


def _tokenize(text: str) -> list[str]:
    tokens: list[str] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            rest = text[pos:].strip()
            if not rest:
                break
            raise EngineError(f"syntax error near {rest[:20]!r}")
        tokens.append(m.group(m.lastgroup))
        pos = m.end()
    return tokens


class _Cursor:
    def __init__(self, tokens: list[str]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise EngineError("unexpected end of query")
        self.i += 1
        return tok

    def expect(self, *options: str) -> str:
        tok = self.next()
        if tok.upper() not in options:
            raise EngineError(f"expected {' or '.join(options)}, got {tok!r}")
        return tok


def _parse_column(tok: str) -> ColumnRef:
    if not re.fullmatch(r"[A-Za-z_][\w]*(\.[A-Za-z_][\w]*)?", tok):
        raise EngineError(f"invalid column name {tok!r}")
    if "." in tok:
        t, c = tok.split(".", 1)
        return ColumnRef(t, c)
    return ColumnRef(None, tok)


def _parse_operand(tok: str) -> ColumnRef | int:
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return _parse_column(tok)


def parse_query(text: str) -> ParsedQuery:
    """Parse one reference-dialect query string into a ParsedQuery."""
    text = text.strip()
    if not text.endswith(";"):
        raise EngineError("query must end with ';'")
    cur = _Cursor(_tokenize(text))
    q = ParsedQuery()

    cur.expect("SELECT")

    tok = cur.next()
    if tok.upper() == "DISTINCT":
        q.distinct = True
        tok = cur.next()

    # select list
    while True:
        up = tok.upper()
        if tok == "*":
            if q.items or q.distinct:
                raise EngineError("'*' cannot be combined with other select items")
            q.select_star = True
        elif tok == "(" and q.distinct and not q.items:
            # sibling form `SELECT DISTINCT(col)` (SURVEY.md §2.1 O13
            # [R-uncertain]) — equivalent to DISTINCT col
            q.items.append(SelectItem(_parse_column(cur.next())))
            cur.expect(")")
        elif up in AGG_FUNCS and cur.peek() == "(":
            cur.next()  # (
            inner = cur.next()
            agg_distinct = False
            if inner.upper() == "DISTINCT":
                agg_distinct = True
                inner = cur.next()
            col = _parse_column(inner)
            cur.expect(")")
            q.items.append(SelectItem(col, agg=up, agg_distinct=agg_distinct))
        else:
            q.items.append(SelectItem(_parse_column(tok)))
        nxt = cur.next()
        if nxt == ",":
            tok = cur.next()
            continue
        if nxt.upper() == "FROM":
            break
        raise EngineError(f"expected ',' or FROM, got {nxt!r}")

    if q.items and q.is_aggregate and any(not i.agg for i in q.items):
        # no GROUP BY in the dialect → mixing agg and plain columns is invalid
        raise EngineError("cannot mix aggregate and non-aggregate select items")
    if q.distinct and q.is_aggregate:
        raise EngineError("DISTINCT cannot be combined with aggregate functions")

    # table list
    while True:
        name = cur.next()
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise EngineError(f"invalid table name {name!r}")
        q.tables.append(name)
        nxt = cur.next()
        if nxt == ",":
            continue
        if nxt == ";":
            return q
        if nxt.upper() == "WHERE":
            break
        raise EngineError(f"expected ',', WHERE or ';', got {nxt!r}")

    # where clause: one or two conditions
    while True:
        lhs = _parse_operand(cur.next())
        if not isinstance(lhs, ColumnRef):
            raise EngineError("left side of a condition must be a column")
        op = cur.next()
        if op not in COMPARE_OPS:
            raise EngineError(f"invalid comparison operator {op!r}")
        rhs = _parse_operand(cur.next())
        q.conditions.append(Condition(lhs, "!=" if op == "<>" else op, rhs))
        nxt = cur.next()
        if nxt == ";":
            break
        up = nxt.upper()
        if up in ("AND", "OR"):
            if q.connective is not None:
                raise EngineError("at most two conditions (one AND/OR) are supported")
            q.connective = up
            continue
        raise EngineError(f"expected AND, OR or ';', got {nxt!r}")

    if len(q.conditions) not in (1, 2):
        raise EngineError("WHERE clause must have one or two conditions")
    if len(q.conditions) == 2 and q.connective is None:
        raise EngineError("two conditions require AND or OR")
    return q
