"""Lexer unit tests — modeled on the reference's layer 1
(test/Test.Main.purs:48-171): token kinds, positions, error goldens."""

from __future__ import annotations

import pytest

from purescript_ifrit_spark import lexer as L
from purescript_ifrit_spark.errors import LexError


def kinds(src):
    return [(t.kind, t.value) for t in L.tokenize(src)]


def test_simple_select():
    assert kinds("SELECT age") == [
        (L.KEYWORD, "SELECT"),
        (L.WORD, "age"),
        (L.EOF, None),
    ]


def test_positions():
    toks = L.tokenize("SELECT  age")
    assert [t.pos for t in toks] == [0, 8, 11]


def test_two_word_keywords():
    assert kinds("GROUP BY x ORDER BY y") == [
        (L.KEYWORD, "GROUPBY"),
        (L.WORD, "x"),
        (L.KEYWORD, "ORDERBY"),
        (L.WORD, "y"),
        (L.EOF, None),
    ]


def test_keyword_order_or_vs_orderby_as_vs_asc():
    # "OR is included in ORDER BY, AS in ASC" (Lexer.purs:176-177)
    assert kinds("AS ASC OR ORDER BY x DESC")[:4] == [
        (L.KEYWORD, "AS"),
        (L.KEYWORD, "ASC"),
        (L.KEYWORD, "OR"),
        (L.KEYWORD, "ORDERBY"),
    ]


def test_case_sensitive():
    # lowercase keywords are plain words (README: "Ifrit is case-sensitive")
    assert kinds("select age") == [
        (L.WORD, "select"),
        (L.WORD, "age"),
        (L.EOF, None),
    ]


def test_functions_and_parens():
    assert kinds("AVG(power)") == [
        (L.FUNCTION, "AVG"),
        (L.PAREN_OPEN, "("),
        (L.WORD, "power"),
        (L.PAREN_CLOSE, ")"),
        (L.EOF, None),
    ]


def test_operators():
    assert [k for k, _ in kinds("a != b = c < d > e <= f >= g")] == [
        L.WORD, L.BINARY, L.WORD, L.BINARY, L.WORD, L.BINARY, L.WORD,
        L.BINARY, L.WORD, L.BINARY, L.WORD, L.BINARY, L.WORD, L.EOF,
    ]


def test_literals():
    assert kinds('WHERE x = "abc_1.z" OR y = 14.5 OR z = true OR w = NULL') == [
        (L.KEYWORD, "WHERE"),
        (L.WORD, "x"), (L.BINARY, "="), (L.STRING, "abc_1.z"),
        (L.KEYWORD, "OR"),
        (L.WORD, "y"), (L.BINARY, "="), (L.NUMBER, 14.5),
        (L.KEYWORD, "OR"),
        (L.WORD, "z"), (L.BINARY, "="), (L.BOOLEAN, True),
        (L.KEYWORD, "OR"),
        (L.WORD, "w"), (L.BINARY, "="), (L.KEYWORD, "NULL"),
        (L.EOF, None),
    ]


def test_number_shapes():
    assert kinds(".5")[0] == (L.NUMBER, 0.5)
    assert kinds("42")[0] == (L.NUMBER, 42.0)
    # no negative literals (Lexer.purs nextNumber regex)
    with pytest.raises(LexError):
        L.tokenize("-42")


def test_dotted_word():
    assert kinds("details.bio.age")[0] == (L.WORD, "details.bio.age")


def test_invalid_token_golden():
    # reference golden shape: "invalid token '?' at position 6"
    with pytest.raises(LexError) as e:
        L.tokenize("SELECT ?")
    assert str(e.value) == "invalid token '?' at position 7"


def test_keyword_prefix_of_identifier_stays_word():
    assert kinds("ANDREW")[0] == (L.WORD, "ANDREW")
    assert kinds("trueish")[0] == (L.WORD, "trueish")
