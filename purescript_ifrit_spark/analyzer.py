"""Semantic analyzer: (input Schema, Statement) → output Schema.

Faithful re-expression of the reference analyzer (src/Ifrit/Semantic.purs):

- dotted-path lookup against the schema allowlist (Semantic.purs:95-111)
- WHERE / ORDER BY validated against the *input* schema of the stage —
  i.e. pre-projection fields (Semantic.purs:116-137,139-148)
- derived tables analyzed first; their output schema feeds the outer stage
- condition typing (Semantic.purs:150-210): </> strictly Number×Number;
  =/!= on same-typed primitives or anything-vs-NULL; NOT requires Boolean;
  a bare operand factor passes with its own type (no boolean coercion —
  reference behavior)
- projection mode (Semantic.purs:216-302): bare field → its type;
  COUNT needs an Array; AVG/SUM/MIN/MAX need Array<number> or the one-level
  push-down `fn(arr.sub)` where `arr` (first path segment) is Array<object>
- grouped mode (Semantic.purs:305-359): `_id` reserved; bare field →
  Array<type> (value collection); COUNT → any existing field; others need
  Number fields
- default output names replace '.' with '_' (Semantic.purs:87-92)
- exact error-message parity (Semantic.purs:429-446)
"""

from __future__ import annotations

from typing import Dict, Optional

from purescript_ifrit_spark import errors as E
from purescript_ifrit_spark.plans.ast import (
    And,
    BinaryCond,
    Condition,
    FieldOperand,
    FnOperand,
    FnCall,
    Group,
    LitOperand,
    Not,
    Operand,
    Or,
    Projection,
    Select,
    Statement,
)
from purescript_ifrit_spark.schema import Schema

NUMERIC_FNS = ("AVG", "MAX", "MIN", "SUM")


def _ext_fn(name: str):
    """Dialect extension function (engine extension; None for reference
    fns). Imported lazily to keep analyzer import-light."""
    from purescript_ifrit_spark.functions.dialect_ext import EXT_FUNCTIONS

    return EXT_FUNCTIONS.get(name)


def lookup(stage: str, schema: Schema, key: str) -> Schema:
    """Path lookup with reference error parity (Semantic.purs:95-111).

    `stage` is the clause name used in messages: SELECT / WHERE / GROUP BY /
    ORDER BY.
    """
    if not schema.is_object:
        raise E.incompatible_schema(schema.show())
    if key == "":
        raise E.invalid_field_name(key)
    node = schema
    parts = key.split(".")
    for i, part in enumerate(parts):
        if not node.is_object:
            raise E.incompatible_schema(node.show())
        if part not in node.fields:
            raise E.unexisting_field(stage, key)
        node = node.fields[part]
    return node


def analyze(schema: Schema, stmt: Statement) -> Schema:
    """Validate `stmt` against `schema`; return the output schema."""
    inner = analyze(schema, stmt.source) if stmt.source is not None else schema
    if stmt.where is not None:
        _analyze_condition(inner, stmt.where)
    for key in stmt.order_by:
        lookup("ORDER BY", inner, key.path)

    out: Dict[str, Schema] = {}
    if isinstance(stmt, Select):
        for sel in stmt.projections:
            name, s = _analyze_projection(inner, sel)
            out[name] = s
        return Schema.object(out)

    assert isinstance(stmt, Group)
    for sel in stmt.projections:
        name, s = _analyze_aggregation(inner, sel)
        out[name] = s
    if stmt.group_by is None:
        out["_id"] = Schema.null()
    elif isinstance(stmt.group_by, FnCall):
        # engine extension: computed group key, e.g. GROUP BY FINGERPRINT(f)
        out["_id"] = _analyze_group_key_fn(inner, stmt.group_by)
    else:
        out["_id"] = lookup("GROUP BY", inner, stmt.group_by)
    return Schema.object(out)


def _analyze_group_key_fn(schema: Schema, call: FnCall) -> Schema:
    ext = _ext_fn(call.fn)
    if ext is None or not ext.groupable:
        # reference fns (and array-valued CHUNK) cannot key a group
        raise E.incompatible_fn_type(call.fn, schema.show())
    arg = lookup("GROUP BY", schema, call.path)
    if arg.kind not in ext.arg_kinds:
        raise E.incompatible_fn_type(call.fn, arg.show())
    return ext.result


# ---------------------------------------------------------------------------
# conditions
# ---------------------------------------------------------------------------


def _analyze_condition(schema: Schema, cond: Condition) -> Schema:
    if isinstance(cond, Or) or isinstance(cond, And):
        _analyze_condition(schema, cond.lhs)
        _analyze_condition(schema, cond.rhs)
        return Schema.boolean()
    if isinstance(cond, Not):
        s = _analyze_condition(schema, cond.cond)
        if s.kind != "boolean":
            raise E.incompatible_unary_type("NOT", s.show())
        return Schema.boolean()
    if isinstance(cond, BinaryCond):
        s1 = _analyze_operand(schema, cond.lhs)
        s2 = _analyze_operand(schema, cond.rhs)
        op = cond.op
        if op in ("<", ">", "<=", ">="):
            if s1.is_number and s2.is_number:
                return Schema.boolean()
            raise E.incompatible_binary_types(op, s1.show(), s2.show())
        # = / != : same primitive type, or anything vs NULL
        if (
            (s1.kind == s2.kind and s1.kind in ("number", "boolean", "string"))
            or s1.kind == "null"
            or s2.kind == "null"
        ):
            return Schema.boolean()
        raise E.incompatible_binary_types(op, s1.show(), s2.show())
    # bare operand factor: returns its own schema (Semantic.purs:173-175)
    return _analyze_operand(schema, cond)


def _analyze_operand(schema: Schema, operand: Operand) -> Schema:
    if isinstance(operand, FieldOperand):
        return lookup("WHERE", schema, operand.path)
    if isinstance(operand, FnOperand):
        # engine extension: WHERE QUALITY(text) > 0.5 — argument typed
        # against the input schema, result is the function's result schema
        ext = _ext_fn(operand.fn)
        if ext is None:
            raise E.incompatible_fn_type(operand.fn, schema.show())
        if ext.analytic:
            # window-backed fns have no value at filter time (Spark rejects
            # window expressions in WHERE) — compute in a derived table,
            # then filter the materialized column
            raise E.incompatible_fn_type(operand.fn, schema.show())
        arg = lookup("WHERE", schema, operand.path)
        if arg.kind not in ext.arg_kinds:
            raise E.incompatible_fn_type(operand.fn, arg.show())
        return ext.result
    v = operand.value
    if v is None:
        return Schema.null()
    if isinstance(v, bool):
        return Schema.boolean()
    if isinstance(v, (int, float)):
        return Schema.number()
    return Schema.string()


# ---------------------------------------------------------------------------
# projection mode (no GROUP BY): per-row array aggregation
# ---------------------------------------------------------------------------


def _analyze_projection(schema: Schema, sel) -> tuple[str, Schema]:
    if isinstance(sel, Projection):
        return sel.output_name, lookup("SELECT", schema, sel.path)

    assert isinstance(sel, FnCall)
    ext = _ext_fn(sel.fn)
    if ext is not None:
        # engine extension scalars: one argument of an accepted kind
        # (string for the text family; string-or-number for SPLIT ids)
        s = lookup("SELECT", schema, sel.path)
        if s.kind not in ext.arg_kinds:
            raise E.incompatible_fn_type(sel.fn, s.show())
        for field in ext.requires:
            # analytic fns with fixed window geometry (SESSIONIZE) read
            # these document fields besides the argument
            lookup("SELECT", schema, field)
        return sel.output_name, ext.result

    if sel.fn == "COUNT":
        s = lookup("SELECT", schema, sel.path)
        if s.is_array:
            return sel.output_name, Schema.number()
        raise E.incompatible_fn_type("COUNT", s.show())

    # AVG/SUM/MIN/MAX (Semantic.purs:253-299)
    parts = sel.path.split(".")
    if len(parts) == 1:
        s = lookup("SELECT", schema, sel.path)
        if s.is_array and s.element.is_number:
            return sel.output_name, Schema.number()
        raise E.incompatible_fn_type(sel.fn, s.show())
    # one-level push-down: first segment must be Array<object>
    base = lookup("SELECT", schema, parts[0])
    if not base.is_array:
        raise E.incompatible_fn_type(sel.fn, schema.show())
    sub = lookup("SELECT", base.element, ".".join(parts[1:]))
    if sub.is_number:
        return sel.output_name, Schema.number()
    raise E.incompatible_fn_type(sel.fn, sub.show())


# ---------------------------------------------------------------------------
# grouped mode
# ---------------------------------------------------------------------------


def _analyze_aggregation(schema: Schema, sel) -> tuple[str, Schema]:
    # `_id` reservation (Semantic.purs:305-318)
    path = sel.path
    alias = sel.alias
    if (path == "_id" and alias is None) or alias == "_id":
        raise E.reserved_field_name("_id")

    if isinstance(sel, Projection):
        # bare field → value collection, Array<type> (Semantic.purs:320-326)
        return sel.output_name, Schema.array(lookup("SELECT", schema, path))

    assert isinstance(sel, FnCall)
    s = lookup("SELECT", schema, path)
    if _ext_fn(sel.fn) is not None:
        # extension scalars are per-row functions, not aggregations —
        # rejected in grouped SELECT lists (compute them in a derived
        # table, then aggregate)
        raise E.incompatible_fn_type(sel.fn, s.show())
    if sel.fn == "COUNT":
        return sel.output_name, Schema.number()
    if s.is_number:
        return sel.output_name, Schema.number()
    raise E.incompatible_fn_type(sel.fn, s.show())
