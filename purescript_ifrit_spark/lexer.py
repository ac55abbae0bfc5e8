"""Lexer: SQL string → token list with positions.

Faithful re-expression of the reference lexer (src/Ifrit/Lexer.purs):

- case-sensitive keywords, matched in an order where longer alternatives win
  ("OR is included in ORDER BY, AS in ASC", Lexer.purs:176-177)
- functions AVG|COUNT|MAX|MIN|SUM (Lexer.purs:193-195)
- binaries != = < > (Lexer.purs:190-195). `<=` / `>=` exist as token kinds in
  the reference but are never emitted by its tokenizer (SURVEY.md §2.3 F3) —
  we lex them directly as a documented fix (they remain reachable via NOT).
- booleans `true|false`, numbers `[0-9]*\\.?[0-9]+` (no negatives), strings
  double-quoted over charset [a-zA-Z0-9_.], words over the same charset
  (Lexer.purs:198-229)
- error parity: "invalid token '<char>' at position <pos>"
"""

from __future__ import annotations

import re
from typing import Any, List

from purescript_ifrit_spark.errors import invalid_token

# token kinds
KEYWORD = "keyword"
FUNCTION = "function"
UNARY = "unary"
BINARY = "binary"
BOOLEAN = "boolean"
NUMBER = "number"
STRING = "string"
WORD = "word"
PAREN_OPEN = "paren_open"
PAREN_CLOSE = "paren_close"
COMMA = "comma"
EOF = "eof"


class Token:
    """Slotted value object (NOT a dataclass: token construction is the
    lexer's hot path — a frozen dataclass pays object.__setattr__ per
    field; __slots__ assignment is ~3× cheaper)."""

    __slots__ = ("kind", "value", "pos", "_length")

    def __init__(self, kind: str, value: Any, pos: int, _length: int = 0):
        self.kind = kind
        self.value = value
        self.pos = pos
        self._length = _length

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Token)
            and self.kind == other.kind
            and self.value == other.value
            and self.pos == other.pos
        )

    def __hash__(self) -> int:
        return hash((self.kind, self.value, self.pos))

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r}@{self.pos})"


# Keywords in the reference's match order (Lexer.purs:176-177); GROUP BY /
# ORDER BY are two-word keywords normalized to GROUPBY / ORDERBY.
_KEYWORDS = [
    ("DISTINCT", "DISTINCT"),
    ("GROUP\\s+BY", "GROUPBY"),
    ("ORDER\\s+BY", "ORDERBY"),
    ("OFFSET", "OFFSET"),
    ("SELECT", "SELECT"),
    ("WHERE", "WHERE"),
    ("LIMIT", "LIMIT"),
    ("NULL", "NULL"),
    ("FROM", "FROM"),
    ("AND", "AND"),
    ("ASC", "ASC"),
    ("AS", "AS"),
    ("OR", "OR"),
    ("DESC", "DESC"),
]
# reference functions (Lexer.purs:193-195) + engine extension functions
# (functions/dialect_ext.py — SURVEY §2.7/§7 phase 6). Order is safe: no
# name is a prefix of another within the boundary rule.
_FUNCTIONS = [
    "AVG", "COUNT", "MAX", "MIN", "SUM",
    "TOKEN_COUNT", "QUALITY_SCORE", "QUALITY", "LANG_ID", "FINGERPRINT",
    "CHUNK", "SPLIT", "REDACT", "HTMLTEXT", "TUMBLE", "SESSIONIZE",
    "VECTORIZE", "IMAGE_DHASH", "GOPHER", "C4PASS", "JL_PROJECT",
    # MINHASH is safe next to MIN: the _BOUNDARY lookahead stops MIN from
    # matching the "MIN" prefix of "MINHASH(" (H is a word char)
    "MINHASH",
    "BM25",
    "NFC",
    # SIMHASH is prefix-safe: no other name starts with "SIM" and SUM
    # diverges at the second character
    "SIMHASH",
    # PQ_ENCODE (r13): prefix-safe — no other name starts with "PQ"
    "PQ_ENCODE",
]

_WORD_CHARS = r"[a-zA-Z0-9_.]"
# a keyword/function match must not run into an identifier tail
_BOUNDARY = rf"(?!{_WORD_CHARS})"

# (kind, pattern, normalized value) in priority order. STRING's quotes are
# stripped in the handler (the charset has no escapes), so no rule needs an
# inner capture group — a requirement of the combined alternation below.
_RULE_SPECS = (
    [(KEYWORD, pat + _BOUNDARY, norm) for pat, norm in _KEYWORDS]
    + [(FUNCTION, f + _BOUNDARY, f) for f in _FUNCTIONS]
    + [
        (UNARY, "NOT" + _BOUNDARY, "NOT"),
        (BINARY, r"!=", "!="),
        (BINARY, r"<=", "<="),  # documented fix, SURVEY.md §2.3 F3
        (BINARY, r">=", ">="),
        (BINARY, r"=", "="),
        (BINARY, r"<", "<"),
        (BINARY, r">", ">"),
        (BOOLEAN, "(?:true|false)" + _BOUNDARY, None),
        (NUMBER, r"[0-9]*\.?[0-9]+", None),
        (STRING, r'"[a-zA-Z0-9_.]+"', None),
        (WORD, r"[a-zA-Z0-9_.]+", None),
        (PAREN_CLOSE, r"\)", ")"),
        (PAREN_OPEN, r"\(", "("),
        (COMMA, r",", ","),
    ]
)

# ONE alternation regex instead of trying ~27 rules per token: Python's
# alternation is leftmost-first, so rule priority is preserved exactly;
# m.lastgroup names the winning rule. Measured ~1.5× end-to-end compile
# throughput (the per-rule loop spent ~60% of compile time in failed
# re.match attempts — ~2M calls per 3k compiles of the nested shape).
_COMBINED = re.compile(
    "|".join(f"(?P<g{i}>{pat})" for i, (_, pat, _n) in enumerate(_RULE_SPECS))
)

_WS = re.compile(r"\s*")
# ASCII whitespace for the inline fast-path skip below; non-ASCII \s
# matches (NBSP etc.) take the _WS regex fallback so behavior is
# unchanged for every input the old regex-skip accepted
_WS_CHARS = " \t\n\r\x0b\x0c"


def tokenize(source: str) -> List[Token]:
    """Tokenize; appends EOF. Raises LexError with reference-parity message.

    Hot-loop shape (r14 optimization round, guide §1.2 "per-task work"):
    whitespace is skipped with an inline character loop (typical gaps are
    a single space — cheaper than a regex call), and the winning rule is
    recovered via `m.lastindex` (an int attribute) instead of parsing
    `m.lastgroup`'s name. Valid because every inner group in _RULE_SPECS
    is non-capturing, so group i+1 IS rule i. For fixed-value rules the
    matched text is never sliced out. Measured on a quiet host: ~1.25×
    tokenize throughput, identical Token streams (pinned by the existing
    lexer goldens)."""
    tokens: List[Token] = []
    append = tokens.append
    rx_match = _COMBINED.match
    specs = _RULE_SPECS
    pos = 0
    n = len(source)
    while True:
        while pos < n and source[pos] in _WS_CHARS:
            pos += 1
        if pos >= n:
            append(Token(EOF, None, pos))
            return tokens
        m = rx_match(source, pos)
        if not m:
            # rare path: \s covers non-ASCII whitespace the inline skip
            # does not — retry once through the full regex skip
            ws_end = _WS.match(source, pos).end()
            if ws_end != pos:
                pos = ws_end
                continue
            raise invalid_token(source[pos], pos)
        kind, _, norm = specs[m.lastindex - 1]
        end = m.end()
        if norm is not None:
            value: Any = norm
        else:
            raw = m.group(0)
            if kind == WORD:
                value = raw
            elif kind == NUMBER:
                value = float(raw)
            elif kind == STRING:
                value = raw[1:-1]
            else:  # BOOLEAN
                value = raw == "true"
        append(Token(kind, value, pos, end - pos))
        pos = end


