"""Recursive-descent parser: token list → Statement AST.

Faithful re-expression of the reference parser (src/Ifrit/Parser.purs):

- fixed clause order SELECT → FROM → WHERE → GROUP BY → ORDER BY → LIMIT →
  OFFSET (Parser.purs:443-451, README.md:245-254); input must end at EOF or
  `)` (Parser.purs:453-460)
- condition grammar (Parser.purs:74-99):
      Condition := Term (OR Term)?
      Term      := Factor (AND Factor)?
      Factor    := (Condition) | NOT Factor | Operand (BinOp Operand)?
  AND/OR are strictly binary — chaining needs parentheses.
- selectors: Word [AS Word] | FN(Word) [AS Word] | (selector), comma lists
  (Parser.purs:356-437); FN(a,b) / FN(14) → "invalid argument"
- LIMIT/OFFSET require integer literals (Parser.purs:326-338)
- FROM only introduces a parenthesized derived statement (Parser.purs:446)
- error-message parity with Parser.purs:585-608
"""

from __future__ import annotations

from typing import List, Optional

from purescript_ifrit_spark import lexer as L
from purescript_ifrit_spark.errors import ParseError
from purescript_ifrit_spark.plans.ast import (
    And,
    BinaryCond,
    Condition,
    FieldOperand,
    FnCall,
    FnOperand,
    Group,
    LitOperand,
    Not,
    Operand,
    Or,
    OrderKey,
    Projection,
    Select,
    Selector,
    Statement,
)


def _show_token(tok: L.Token) -> str:
    if tok.kind == L.EOF:
        return "EOF"
    if tok.kind == L.STRING:
        return f'"{tok.value}"'
    if tok.kind == L.BOOLEAN:
        return "true" if tok.value else "false"
    if tok.kind == L.NUMBER:
        v = tok.value
        return str(int(v)) if float(v).is_integer() else str(v)
    return str(tok.value)


class _Parser:
    __slots__ = ("tokens", "i", "cur")

    def __init__(self, tokens: List[L.Token]):
        self.tokens = tokens
        self.i = 0
        # `cur` is a plain attribute maintained by advance() — a @property
        # doing tokens[i] cost ~400k descriptor calls per 5k compiles
        self.cur = tokens[0]

    # -- cursor helpers -----------------------------------------------------
    def advance(self) -> L.Token:
        tok = self.cur
        if tok.kind != L.EOF:
            self.i += 1
            self.cur = self.tokens[self.i]
        return tok

    def at_keyword(self, kw: str) -> bool:
        c = self.cur
        return c.kind == L.KEYWORD and c.value == kw

    def eat_keyword(self, kw: str) -> bool:
        if self.at_keyword(kw):
            self.advance()
            return True
        return False

    # -- errors (message parity: Parser.purs:585-608) -----------------------
    def err_unexpected(self, tok: L.Token) -> ParseError:
        if tok.kind == L.EOF:
            return ParseError("unexpected end of expression")
        return ParseError(
            f"unexpected token: {_show_token(tok)} at position {tok.pos}"
        )

    def err_unbalanced(self, tok: L.Token) -> ParseError:
        if tok.kind == L.EOF:
            return ParseError(
                "unbalanced parenthesis expression: expected `)` but got end of input"
            )
        return ParseError(
            "unbalanced parenthesis expression: expected `)` but got: "
            f"{_show_token(tok)} at position {tok.pos}"
        )

    # -- statement ----------------------------------------------------------
    def parse_statement(self) -> Statement:
        if not self.eat_keyword("SELECT"):
            raise self.err_unexpected(self.cur)
        projections = self.parse_selector_list()

        source: Optional[Statement] = None
        if self.eat_keyword("FROM"):
            if self.cur.kind != L.PAREN_OPEN:
                raise self.err_unexpected(self.cur)
            self.advance()
            source = self.parse_statement()
            if self.cur.kind != L.PAREN_CLOSE:
                raise self.err_unbalanced(self.cur)
            self.advance()

        where: Optional[Condition] = None
        if self.eat_keyword("WHERE"):
            where = self.parse_condition()

        group_by: Optional[str | FnCall] = None
        grouped = False
        if self.eat_keyword("GROUPBY"):
            grouped = True
            if self.eat_keyword("NULL"):
                group_by = None
            elif self.cur.kind == L.WORD:
                group_by = self.advance().value
            elif self.cur.kind == L.FUNCTION:
                # engine extension: GROUP BY FN(field) — grouping by a
                # computed key (e.g. GROUP BY FINGERPRINT(text) for exact
                # dedup); the analyzer restricts FN to groupable extension
                # functions
                group_by = self.parse_fn_call()
            else:
                raise self.err_unexpected(self.cur)

        order_by: List[OrderKey] = []
        if self.eat_keyword("ORDERBY"):
            order_by = self.parse_order_keys()

        limit = self.parse_int_clause("LIMIT")
        offset = self.parse_int_clause("OFFSET")

        if grouped:
            return Group(
                projections=projections,
                group_by=group_by,
                source=source,
                where=where,
                order_by=order_by,
                limit=limit,
                offset=offset,
            )
        return Select(
            projections=projections,
            source=source,
            where=where,
            order_by=order_by,
            limit=limit,
            offset=offset,
        )

    # -- selectors ----------------------------------------------------------
    def parse_selector_list(self) -> List[Selector]:
        selectors = [self.parse_selector()]
        while self.cur.kind == L.COMMA:
            self.advance()
            selectors.append(self.parse_selector())
        return selectors

    def parse_selector(self) -> Selector:
        tok = self.cur
        if tok.kind == L.PAREN_OPEN:
            # parenthesized selector: `SELECT (a), b` (Parser.purs:389-399)
            self.advance()
            inner = self.parse_selector()
            if self.cur.kind != L.PAREN_CLOSE:
                raise self.err_unbalanced(self.cur)
            self.advance()
            return inner
        if tok.kind == L.WORD:
            self.advance()
            return Projection(path=tok.value, alias=self.parse_alias())
        if tok.kind == L.FUNCTION:
            call = self.parse_fn_call()
            return FnCall(fn=call.fn, path=call.path, alias=self.parse_alias())
        raise self.err_unexpected(tok)

    def parse_fn_call(self) -> FnCall:
        """`FN ( word )` with reference error parity (cursor at FUNCTION)."""
        fn = self.advance().value
        if self.cur.kind != L.PAREN_OPEN:
            raise self.err_unexpected(self.cur)
        self.advance()
        if self.cur.kind != L.WORD:
            # FN(14), FN("x") → invalid argument (Parser.purs:368-387)
            raise ParseError(
                f"{fn} has an invalid argument at position {self.cur.pos}"
            )
        arg = self.advance().value
        if self.cur.kind == L.COMMA:
            raise ParseError(
                f"{fn} has an invalid argument at position {self.cur.pos}"
            )
        if self.cur.kind != L.PAREN_CLOSE:
            raise self.err_unbalanced(self.cur)
        self.advance()
        return FnCall(fn=fn, path=arg, alias=None)

    def parse_alias(self) -> Optional[str]:
        if self.eat_keyword("AS"):
            if self.cur.kind != L.WORD:
                raise self.err_unexpected(self.cur)
            return self.advance().value
        return None

    # -- conditions ---------------------------------------------------------
    def parse_condition(self) -> Condition:
        term = self.parse_term()
        if self.eat_keyword("OR"):
            return Or(term, self.parse_term())
        return term

    def parse_term(self) -> Condition:
        factor = self.parse_factor()
        if self.eat_keyword("AND"):
            return And(factor, self.parse_factor())
        return factor

    def parse_factor(self) -> Condition:
        tok = self.cur
        if tok.kind == L.PAREN_OPEN:
            self.advance()
            cond = self.parse_condition()
            if self.cur.kind != L.PAREN_CLOSE:
                raise self.err_unbalanced(self.cur)
            self.advance()
            return cond
        if tok.kind == L.UNARY:  # NOT
            self.advance()
            return Not(self.parse_factor())
        operand = self.parse_operand()
        if self.cur.kind == L.BINARY:
            op = self.advance().value
            rhs = self.parse_operand()
            return BinaryCond(op=op, lhs=operand, rhs=rhs)
        if isinstance(operand, FnOperand):
            # extension scalars have no boolean result — a bare
            # `WHERE QUALITY(text)` predicate is meaningless; require a
            # comparison (bare-field F7 semantics stay boolean-field-only)
            raise self.err_unexpected(self.cur)
        return operand  # bare boolean field / literal predicate

    def parse_operand(self) -> Operand:
        tok = self.cur
        if tok.kind == L.WORD:
            self.advance()
            return FieldOperand(tok.value)
        if tok.kind in (L.STRING, L.NUMBER, L.BOOLEAN):
            self.advance()
            return LitOperand(tok.value)
        if tok.kind == L.KEYWORD and tok.value == "NULL":
            self.advance()
            return LitOperand(None)
        if tok.kind == L.FUNCTION:
            # engine extension: ext-fn operands in conditions
            # (WHERE QUALITY(text) > 0.5). Reference fns keep their
            # reference behavior — a parse error in operand position.
            from purescript_ifrit_spark.functions.dialect_ext import EXT_FUNCTIONS

            if tok.value in EXT_FUNCTIONS:
                call = self.parse_fn_call()
                return FnOperand(fn=call.fn, path=call.path)
        raise self.err_unexpected(tok)

    # -- order / limit / offset --------------------------------------------
    def parse_order_keys(self) -> List[OrderKey]:
        keys = [self.parse_order_key()]
        while self.cur.kind == L.COMMA:
            self.advance()
            keys.append(self.parse_order_key())
        return keys

    def parse_order_key(self) -> OrderKey:
        # ORDER BY NULL is a parse error (Parser.purs:294-323)
        if self.cur.kind != L.WORD:
            raise self.err_unexpected(self.cur)
        path = self.advance().value
        ascending = True
        if self.eat_keyword("ASC"):
            ascending = True
        elif self.eat_keyword("DESC"):
            ascending = False
        return OrderKey(path=path, ascending=ascending)

    def parse_int_clause(self, kw: str) -> Optional[int]:
        if not self.eat_keyword(kw):
            return None
        tok = self.cur
        if tok.kind != L.NUMBER or not float(tok.value).is_integer():
            # Parser.purs:601-602
            raise ParseError(f"{kw} must be an integer at position {tok.pos}")
        self.advance()
        return int(tok.value)


def parse(tokens: List[L.Token]) -> Statement:
    """Parse a full statement; must consume everything up to EOF
    (Parser.purs:453-460)."""
    p = _Parser(tokens)
    stmt = p.parse_statement()
    if p.cur.kind != L.EOF:
        raise p.err_unexpected(p.cur)
    return stmt


def parse_sql(source: str) -> Statement:
    return parse(L.tokenize(source))
