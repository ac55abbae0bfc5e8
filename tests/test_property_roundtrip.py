"""Property-based tests (hypothesis): printer/parser round-trip and
compiler robustness over generated ASTs and garbage inputs."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings, strategies as st

from purescript_ifrit_spark.errors import IfritError
from purescript_ifrit_spark.parser import parse_sql
from purescript_ifrit_spark.plans.ast import (
    And,
    BinaryCond,
    FieldOperand,
    FnCall,
    FnOperand,
    Group,
    LitOperand,
    Not,
    Or,
    OrderKey,
    Projection,
    Select,
)
from purescript_ifrit_spark.plans.printer import to_sql

# identifiers: word charset, avoiding keyword collisions and leading digits
# (a bare "14" would lex as a number)
_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in {"true", "false"}
)
_path = st.lists(_ident, min_size=1, max_size=3).map(".".join)

_literal = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=0, max_value=10**6).map(float),
    st.floats(min_value=0, max_value=10**6, allow_nan=False).map(
        lambda x: float(round(x, 3))
    ),
    st.text(alphabet=string.ascii_letters + string.digits + "_.", min_size=1, max_size=8),
)

# FnOperand only ever appears inside a BinaryCond (bare ext-fn predicates
# are parse errors by design), so it joins the operand pool, not the
# condition-leaf pool
_ext_operand = st.builds(
    FnOperand,
    fn=st.sampled_from(
        ["TOKEN_COUNT", "QUALITY", "LANG_ID", "FINGERPRINT", "SPLIT", "REDACT"]
    ),
    path=_path,
)
_operand = st.one_of(
    _path.map(FieldOperand), _literal.map(LitOperand), _ext_operand
)

_binary = st.builds(
    BinaryCond,
    op=st.sampled_from(["=", "!=", "<", ">", "<=", ">="]),
    lhs=_operand,
    rhs=_operand,
)

_condition = st.recursive(
    st.one_of(_binary, _path.map(FieldOperand)),
    lambda kids: st.one_of(
        st.builds(And, kids, kids),
        st.builds(Or, kids, kids),
        st.builds(Not, kids),
    ),
    max_leaves=6,
)

_selector = st.one_of(
    st.builds(Projection, path=_path, alias=st.one_of(st.none(), _ident)),
    st.builds(
        FnCall,
        fn=st.sampled_from(["AVG", "COUNT", "MAX", "MIN", "SUM"]),
        path=_path,
        alias=st.one_of(st.none(), _ident),
    ),
)

_orders = st.lists(
    st.builds(OrderKey, path=_path, ascending=st.booleans()), max_size=2
)


def _statements(depth: int = 1):
    base = st.one_of(
        st.builds(
            Select,
            projections=st.lists(_selector, min_size=1, max_size=3),
            source=st.none(),
            where=st.one_of(st.none(), _condition),
            order_by=_orders,
            limit=st.one_of(st.none(), st.integers(0, 1000)),
            offset=st.one_of(st.none(), st.integers(0, 1000)),
        ),
        st.builds(
            Group,
            projections=st.lists(_selector, min_size=1, max_size=3),
            group_by=st.one_of(st.none(), _path),
            source=st.none(),
            where=st.one_of(st.none(), _condition),
            order_by=_orders,
            limit=st.one_of(st.none(), st.integers(0, 1000)),
            offset=st.one_of(st.none(), st.integers(0, 1000)),
        ),
    )
    if depth == 0:
        return base
    inner = _statements(depth - 1)
    return st.one_of(
        base,
        st.builds(
            Select,
            projections=st.lists(_selector, min_size=1, max_size=2),
            source=inner,
            where=st.one_of(st.none(), _condition),
            order_by=_orders,
            limit=st.one_of(st.none(), st.integers(0, 1000)),
            offset=st.one_of(st.none(), st.integers(0, 1000)),
        ),
        st.builds(
            Group,
            projections=st.lists(_selector, min_size=1, max_size=2),
            group_by=st.one_of(st.none(), _path),
            source=inner,
            where=st.one_of(st.none(), _condition),
            order_by=_orders,
            limit=st.one_of(st.none(), st.integers(0, 1000)),
            offset=st.one_of(st.none(), st.integers(0, 1000)),
        ),
    )


@settings(max_examples=300, deadline=None)
@given(_statements(depth=2))
def test_print_parse_roundtrip(stmt):
    assert parse_sql(to_sql(stmt)) == stmt


def test_tiny_float_literal_roundtrip():
    # regression: repr(1e-05) emits exponent notation the lexer rejects
    stmt = parse_sql("SELECT a WHERE b = 0.00001")
    assert parse_sql(to_sql(stmt)) == stmt
    stmt2 = parse_sql("SELECT a WHERE b = 0.1")
    assert "0.1" in to_sql(stmt2)
    # extreme magnitudes: exact positional expansion must round-trip the
    # double bit-for-bit (a %.17f fallback truncated these to '0.')
    from purescript_ifrit_spark.plans.ast import (
        BinaryCond,
        FieldOperand,
        LitOperand,
        Projection,
        Select,
    )

    for v in (1e-20, 1.2345678901234567e-05, 12345.000000001):
        ast = Select(
            projections=[Projection("a")],
            where=BinaryCond("=", FieldOperand("b"), LitOperand(v)),
        )
        assert parse_sql(to_sql(ast)) == ast


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_parser_never_crashes_on_garbage(src):
    try:
        parse_sql(src)
    except IfritError:
        pass  # structured compile error is the contract
    # any other exception type is a bug and propagates


@settings(max_examples=150, deadline=None)
@given(_statements(depth=1))
def test_analyzer_total_on_arbitrary_ast(stmt):
    """The analyzer must either produce a schema or raise IfritError —
    never crash — for any syntactically valid statement."""
    from purescript_ifrit_spark.analyzer import analyze
    from purescript_ifrit_spark.schema import schema_from_json

    schema = schema_from_json(
        {"a": "number", "b": {"c": "string"}, "d": ["number"], "e": "boolean"}
    )
    try:
        analyze(schema, stmt)
    except IfritError:
        pass


# --- decoder fuzzing: arbitrary bytes must never crash a batch ------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_decode_ppm_total_on_garbage(payload):
    """decode_ppm is TOTAL over arbitrary bytes: a valid ndarray or a clean
    ValueError — never an unhandled crash (the worker-closure twin maps the
    same failures to NULL rows, so a poison payload can't kill a batch)."""
    from purescript_ifrit_spark.operators.multimodal import decode_ppm

    try:
        img = decode_ppm(payload)
        assert img.ndim == 3
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_decode_wav_total_on_garbage(payload):
    from purescript_ifrit_spark.operators.multimodal import decode_wav

    try:
        rate, ch, samples = decode_wav(payload)
        assert rate >= 0 and samples.ndim == 1
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_decode_ppm_header_prefix_garbage(payload):
    """Valid magic + garbage header/raster still degrades cleanly."""
    from purescript_ifrit_spark.operators.multimodal import decode_ppm

    try:
        decode_ppm(b"P6" + payload)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_decode_ppm_stream_total_on_garbage(payload):
    """decode_ppm_stream is TOTAL: a frame list or a clean ValueError —
    including garbage spliced AFTER a valid frame (the frame walk must
    reject corrupt tails, never loop or crash)."""
    from purescript_ifrit_spark.operators.multimodal import decode_ppm_stream

    valid = b"P6\n2 2\n255\n" + bytes(12)
    for buf in (payload, valid + payload):
        try:
            frames = decode_ppm_stream(buf)
            assert all(f.ndim == 3 for f in frames)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# BM25 dialect scalar vs a from-scratch Python reference (r9)
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("absparkjoinmerge \t\n.!XYZ09")
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bm25_dialect_matches_python_reference(spark, texts):
    """Property pin: for arbitrary whitespace/case/punctuation noise the
    BM25 dialect scalar equals a from-scratch Python recomputation of
    the frozen model — exercising the double-space tf trick against the
    token-count reference across generated inputs."""
    from purescript_ifrit_spark.api import run_query
    from purescript_ifrit_spark.functions.dialect_ext import (
        BM25_AVGDL,
        BM25_B,
        BM25_K1,
        BM25_QUERY,
    )

    def ref(text):
        if text is None:
            return None
        toks = (
            " ".join(text.lower().split()).split(" ")
            if text.strip()
            else []
        )
        dl = float(len(toks))
        load = (1.0 - BM25_B) + (BM25_B * (dl / BM25_AVGDL))
        s = 0.0
        for term, idf in BM25_QUERY:
            tf = float(toks.count(term))
            s = s + idf * (
                (tf * (BM25_K1 + 1.0)) / (tf + (BM25_K1 * load))
            )
        return round(s, 6)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.score
        for r in run_query(
            spark, df, "SELECT doc_id, BM25(text) AS score"
        ).collect()
    }
    want = {i: ref(t) for i, t in rows}
    assert got == want
