"""Tag-query language parser (the reference's "SQL").

Grammar ported from the ANTLR4 definition
(core/metrics-core-service/src/main/antlr4/.../TagQuery.g4:40-108):

    tagquery : object
    object   : pair | '(' object ')' | object (AND|OR) object
    pair     : key
             | NOT key
             | key ('='|'!=') value
             | key ('~'|'!~') value
             | key [NOT] IN '[' value (',' value)* ']'
    key      : SIMPLETEXT            ([a-zA-Z_0-9.]+)
    value    : SIMPLETEXT | COMPLEXTEXT ('quoted with \\ escapes')

AND binds tighter than OR (conventional); AND/OR/NOT/IN are
case-insensitive.  This is a ~150-line recursive-descent parser
producing a small AST that the compiler turns into a single DataFrame
filter (SURVEY.md §2.8).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<lbracket>\[) |
        (?P<rbracket>\]) |
        (?P<comma>,) |
        (?P<noteq>!=) |
        (?P<notregex>!~) |
        (?P<eq>=) |
        (?P<regex>~) |
        (?P<quoted>'(?:\\.|[^'\\])*') |
        (?P<text>[a-zA-Z_0-9.]+)
    )""",
    re.VERBOSE,
)

_ESCAPES = {"\\'": "'", "\\\\": "\\", "\\/": "/", "\\b": "\b", "\\f": "\f",
            "\\n": "\n", "\\r": "\r", "\\t": "\t"}


@dataclass(frozen=True)
class Token:
    kind: str
    text: str


def _unquote(raw: str) -> str:
    body = raw[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "\\" and i + 1 < len(body):
            two = body[i : i + 2]
            if two == "\\u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(two, two[1]))
            i += 2
        else:
            out.append(body[i])
            i += 1
    return "".join(out)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"tag query: bad token at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        tok = m.group(kind)
        if kind == "text":
            up = tok.upper()
            if up in ("AND", "OR", "NOT", "IN"):
                tokens.append(Token(up, tok))
                continue
        tokens.append(Token(kind, tok))
    return tokens


# --- AST -------------------------------------------------------------------


@dataclass(frozen=True)
class And:
    left: object
    right: object


@dataclass(frozen=True)
class Or:
    left: object
    right: object


@dataclass(frozen=True)
class Cmp:
    """key = v | key != v | key ~ re | key !~ re"""

    key: str
    op: str  # '=', '!=', '~', '!~'
    value: str


@dataclass(frozen=True)
class In:
    key: str
    values: tuple[str, ...]
    negated: bool


@dataclass(frozen=True)
class Exists:
    key: str
    negated: bool


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.pos = 0

    def peek(self) -> Token | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> Token:
        tok = self.peek()
        if tok is None:
            raise ValueError("tag query: unexpected end of input")
        self.pos += 1
        return tok

    def expect(self, kind: str) -> Token:
        tok = self.next()
        if tok.kind != kind:
            raise ValueError(f"tag query: expected {kind}, got {tok.kind} ({tok.text!r})")
        return tok

    # object := and_expr (OR and_expr)*
    def parse_object(self):
        node = self.parse_and()
        while (tok := self.peek()) is not None and tok.kind == "OR":
            self.next()
            node = Or(node, self.parse_and())
        return node

    # and_expr := unit (AND unit)*
    def parse_and(self):
        node = self.parse_unit()
        while (tok := self.peek()) is not None and tok.kind == "AND":
            self.next()
            node = And(node, self.parse_unit())
        return node

    def parse_unit(self):
        tok = self.peek()
        if tok is None:
            raise ValueError("tag query: unexpected end of input")
        if tok.kind == "lparen":
            self.next()
            node = self.parse_object()
            self.expect("rparen")
            return node
        if tok.kind == "NOT":
            self.next()
            key = self.expect("text").text
            return Exists(key, negated=True)
        return self.parse_pair()

    def _value(self) -> str:
        tok = self.next()
        if tok.kind == "quoted":
            return _unquote(tok.text)
        if tok.kind in ("text", "NOT", "AND", "OR", "IN"):
            return tok.text
        raise ValueError(f"tag query: expected value, got {tok.kind}")

    def parse_pair(self):
        key = self.expect("text").text
        tok = self.peek()
        if tok is None or tok.kind in ("AND", "OR", "rparen"):
            return Exists(key, negated=False)
        if tok.kind in ("eq", "noteq", "regex", "notregex"):
            self.next()
            op = {"eq": "=", "noteq": "!=", "regex": "~", "notregex": "!~"}[tok.kind]
            return Cmp(key, op, self._value())
        if tok.kind == "NOT":
            self.next()
            self.expect("IN")
            return In(key, self._array(), negated=True)
        if tok.kind == "IN":
            self.next()
            return In(key, self._array(), negated=False)
        raise ValueError(f"tag query: unexpected token {tok.kind} after key {key!r}")

    def _array(self) -> tuple[str, ...]:
        self.expect("lbracket")
        values: list[str] = []
        tok = self.peek()
        if tok is not None and tok.kind == "rbracket":
            self.next()
            return ()
        values.append(self._value())
        while (tok := self.peek()) is not None and tok.kind == "comma":
            self.next()
            values.append(self._value())
        self.expect("rbracket")
        return tuple(values)


def parse_tag_query(text: str):
    """Parse a tag-query expression into an AST (And/Or/Cmp/In/Exists)."""
    parser = _Parser(tokenize(text))
    node = parser.parse_object()
    if parser.peek() is not None:
        raise ValueError(f"tag query: trailing input at token {parser.pos}")
    return node
