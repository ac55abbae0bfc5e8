"""Logical-plan layer: the dialect AST (the compiler's only IR before the
Spark DataFrame plan) and plan inspection helpers."""

from purescript_ifrit_spark.plans.ast import (
    Select,
    Group,
    Projection,
    FnCall,
    BinaryCond,
    And,
    Or,
    Not,
    FieldOperand,
    LitOperand,
    OrderKey,
)

__all__ = [
    "Select",
    "Group",
    "Projection",
    "FnCall",
    "BinaryCond",
    "And",
    "Or",
    "Not",
    "FieldOperand",
    "LitOperand",
    "OrderKey",
]
