"""Alternative backend: AST → Spark SQL string (for spark.sql()).

The DataFrame builder (planner.py) is the primary backend; this emitter is
the debugging/interop surface SURVEY §3 notes as "trivially exposable": the
same dialect semantics rendered as one nested ANSI-ish query, so users can
inspect, EXPLAIN, or embed the compiled form in SQL-first tooling.

Quirk encodings (must stay in lock-step with planner.py):
- stage order: WHERE → ORDER BY → LIMIT → OFFSET → (project | group),
  each as a nesting level only when needed
- faithful OFFSET-after-LIMIT needs two levels (inner ORDER BY+LIMIT,
  outer re-ORDER BY+OFFSET — outer re-sort keeps row selection
  deterministic); `sane_offset` collapses to one `LIMIT n OFFSET m`
- per-row array aggregates render as higher-order-function SQL
- `= NULL` → IS NULL; bare boolean field → `f = true`
"""

from __future__ import annotations

from purescript_ifrit_spark.planner import CompatFlags
from purescript_ifrit_spark.plans.ast import (
    And,
    BinaryCond,
    Condition,
    FieldOperand,
    FnCall,
    Group,
    LitOperand,
    Not,
    Or,
    Projection,
    Select,
    Statement,
)

NUMERIC_FNS = ("AVG", "MAX", "MIN", "SUM")


def _ident(path: str) -> str:
    return ".".join(f"`{p}`" for p in path.split("."))


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else repr(v)
    if isinstance(v, int):
        # programmatic ASTs may carry raw ints; render numerically like
        # planner's F.lit, not as a quoted string
        return str(v)
    # escape backslashes BEFORE quotes: Spark's default string literals are
    # C-style, so an unescaped backslash would be re-interpreted
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def _operand(o) -> str:
    return _ident(o.path) if isinstance(o, FieldOperand) else _lit(o.value)


def _cond(c: Condition, flags: CompatFlags = CompatFlags()) -> str:
    if isinstance(c, Or):
        return f"({_cond(c.lhs, flags)} OR {_cond(c.rhs, flags)})"
    if isinstance(c, And):
        return f"({_cond(c.lhs, flags)} AND {_cond(c.rhs, flags)})"
    if isinstance(c, Not):
        if isinstance(c.cond, FieldOperand):
            return f"{_ident(c.cond.path)} = false"
        return f"(NOT ({_cond(c.cond, flags)}))"
    if isinstance(c, BinaryCond):
        lhs, rhs, op = c.lhs, c.rhs, c.op
        # lock-step with planner._compile_binary: exactly one side must be
        # a field unless the compat flag lifts the restriction
        if not flags.allow_field_comparison:
            lhs_field = isinstance(lhs, FieldOperand)
            if lhs_field == isinstance(rhs, FieldOperand):
                from purescript_ifrit_spark.errors import PlanError

                raise PlanError(
                    f"invalid condition: {_operand(lhs)} {op} {_operand(rhs)}"
                    ": should target a field of the document"
                )
        if op in ("=", "!="):
            if isinstance(rhs, LitOperand) and rhs.value is None:
                null_test = "IS NULL" if op == "=" else "IS NOT NULL"
                return f"{_operand(lhs)} {null_test}"
            if isinstance(lhs, LitOperand) and lhs.value is None:
                null_test = "IS NULL" if op == "=" else "IS NOT NULL"
                return f"{_operand(rhs)} {null_test}"
        sql_op = "<>" if op == "!=" else op
        return f"{_operand(lhs)} {sql_op} {_operand(rhs)}"
    if isinstance(c, FieldOperand):
        return f"{_ident(c.path)} = true"
    raise ValueError(f"unrenderable condition {c!r}")


def _array_expr(sel: FnCall) -> str:
    if sel.fn == "COUNT":
        # full-path array (see planner._projection_column: COUNT accepts an
        # object-nested array, numeric fns push down at the first segment)
        whole = _ident(sel.path)
        return f"CASE WHEN {whole} IS NULL THEN NULL ELSE size({whole}) END"
    parts = sel.path.split(".")
    if len(parts) == 1:
        arr = _ident(sel.path)
    else:
        sub = ".".join(f"`{p}`" for p in parts[1:])
        arr = f"transform({_ident(parts[0])}, x -> x.{sub})"
    if sel.fn == "SUM":
        return f"aggregate({arr}, 0D, (s, x) -> s + CAST(x AS DOUBLE))"
    if sel.fn == "AVG":
        total = f"aggregate({arr}, 0D, (s, x) -> s + CAST(x AS DOUBLE))"
        return f"CASE WHEN size({arr}) > 0 THEN {total} / size({arr}) END"
    if sel.fn == "MAX":
        return f"array_max({arr})"
    return f"array_min({arr})"


def _projection_sql(sel) -> str:
    if isinstance(sel, Projection):
        return f"{_ident(sel.path)} AS `{sel.output_name}`"
    return f"{_array_expr(sel)} AS `{sel.output_name}`"


def _aggregation_sql(sel) -> str:
    if isinstance(sel, Projection):
        return f"collect_list({_ident(sel.path)}) AS `{sel.output_name}`"
    assert isinstance(sel, FnCall)
    if sel.fn == "COUNT":
        return f"COUNT(1) AS `{sel.output_name}`"
    return f"{sel.fn}({_ident(sel.path)}) AS `{sel.output_name}`"


def to_spark_sql(
    stmt: Statement, table: str, flags: CompatFlags = CompatFlags()
) -> str:
    """Render `stmt` over `table` (a view/table name) as a Spark SQL query."""
    rel = (
        f"({to_spark_sql(stmt.source, table, flags)})"
        if stmt.source is not None
        else f"`{table}`"
    )

    if stmt.where is not None:
        rel = f"(SELECT * FROM {rel} WHERE {_cond(stmt.where, flags)})"

    order_sql = ", ".join(
        f"{_ident(k.path)} {'ASC' if k.ascending else 'DESC'}" for k in stmt.order_by
    )
    if stmt.order_by or stmt.limit is not None or stmt.offset is not None:
        inner = f"SELECT * FROM {rel}"
        if order_sql:
            inner += f" ORDER BY {order_sql}"
        if flags.sane_offset:
            if stmt.limit is not None:
                inner += f" LIMIT {stmt.limit}"
            if stmt.offset is not None:
                inner += f" OFFSET {stmt.offset}"
            rel = f"({inner})"
        else:
            if stmt.limit is not None:
                inner += f" LIMIT {stmt.limit}"
            rel = f"({inner})"
            if stmt.offset is not None:
                outer = f"SELECT * FROM {rel}"
                if order_sql:
                    outer += f" ORDER BY {order_sql}"
                outer += f" OFFSET {stmt.offset}"
                rel = f"({outer})"

    if isinstance(stmt, Select):
        cols = ", ".join(_projection_sql(s) for s in stmt.projections)
        return f"SELECT {cols} FROM {rel}"

    assert isinstance(stmt, Group)
    aggs = ", ".join(_aggregation_sql(s) for s in stmt.projections)
    if stmt.group_by is None:
        return f"SELECT {aggs}, NULL AS `_id` FROM {rel}"
    key = _ident(stmt.group_by)
    return f"SELECT {aggs}, {key} AS `_id` FROM {rel} GROUP BY {key}"
