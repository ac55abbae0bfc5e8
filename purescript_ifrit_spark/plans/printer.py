"""AST → dialect-SQL pretty-printer (the inverse of parser.parse_sql).

Mirrors the reference's Show instances for Statement/Selector/Condition
(src/Ifrit/Parser.purs:470-565). Round-trip law, enforced by property tests:
parse_sql(to_sql(ast)) == ast for every valid AST.
"""

from __future__ import annotations

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
    Or,
    Projection,
    Select,
    Statement,
)


def _number(v: float) -> str:
    # positional decimal only — repr() may emit exponent notation (1e-05),
    # which the lexer's [0-9]*\.?[0-9]+ charset cannot tokenize
    if v.is_integer():
        return str(int(v))
    s = repr(v)  # shortest round-trip form when it has no exponent
    if "e" in s or "E" in s:
        # exact positional expansion of the shortest repr: Decimal('1E-20')
        # formats to '0.00000000000000000001', which parses back to the
        # same double (fixed-precision %f would truncate tiny values to
        # an unparseable '0.')
        from decimal import Decimal

        s = format(Decimal(repr(v)), "f")
    return s


def _operand(o) -> str:
    if isinstance(o, FieldOperand):
        return o.path
    if isinstance(o, FnOperand):
        return f"{o.fn}({o.path})"
    v = o.value
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _number(v)
    return f'"{v}"'


def _condition(c: Condition) -> str:
    if isinstance(c, Or):
        return f"({_condition(c.lhs)} OR {_condition(c.rhs)})"
    if isinstance(c, And):
        return f"({_condition(c.lhs)} AND {_condition(c.rhs)})"
    if isinstance(c, Not):
        return f"NOT ({_condition(c.cond)})"
    if isinstance(c, BinaryCond):
        return f"{_operand(c.lhs)} {c.op} {_operand(c.rhs)}"
    return _operand(c)


def _selector(s) -> str:
    if isinstance(s, Projection):
        return s.path if s.alias is None else f"{s.path} AS {s.alias}"
    assert isinstance(s, FnCall)
    base = f"{s.fn}({s.path})"
    return base if s.alias is None else f"{base} AS {s.alias}"


def to_sql(stmt: Statement) -> str:
    parts = ["SELECT " + ", ".join(_selector(s) for s in stmt.projections)]
    if stmt.source is not None:
        parts.append(f"FROM ({to_sql(stmt.source)})")
    if stmt.where is not None:
        parts.append("WHERE " + _condition(stmt.where))
    if isinstance(stmt, Group):
        if stmt.group_by is None:
            key = "NULL"
        elif isinstance(stmt.group_by, FnCall):
            key = f"{stmt.group_by.fn}({stmt.group_by.path})"
        else:
            key = stmt.group_by
        parts.append("GROUP BY " + key)
    if stmt.order_by:
        keys = ", ".join(
            f"{k.path} {'ASC' if k.ascending else 'DESC'}" for k in stmt.order_by
        )
        parts.append("ORDER BY " + keys)
    if stmt.limit is not None:
        parts.append(f"LIMIT {stmt.limit}")
    if stmt.offset is not None:
        parts.append(f"OFFSET {stmt.offset}")
    return " ".join(parts)
