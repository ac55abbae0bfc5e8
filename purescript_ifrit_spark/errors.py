"""Error taxonomy mirroring the reference's message shapes.

The reference asserts exact error strings in its test suite; we reproduce the
same shapes so behavior is comparable (reference: src/Ifrit/Lexer.purs:118-120,
src/Ifrit/Semantic.purs:429-446, src/Ifrit/Parser.purs error strings).
"""

from __future__ import annotations


class IfritError(Exception):
    """Base class for all compile-time errors of the dialect."""


class LexError(IfritError):
    pass


class ParseError(IfritError):
    pass


class AnalysisError(IfritError):
    pass


class PlanError(IfritError):
    pass


def invalid_token(fragment: str, pos: int) -> LexError:
    # reference: src/Ifrit/Lexer.purs ErrInvalidToken ("invalid token '?' at position 6")
    return LexError(f"invalid token '{fragment}' at position {pos}")


def unexisting_field(stage: str, field: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:432-433
    return AnalysisError(f"unexisting field '{field}' in {stage} expression")


def incompatible_schema(schema_repr: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:434-435
    return AnalysisError(f"incompatible object schema for operation: {schema_repr}")


def incompatible_unary_type(op: str, type_repr: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:436-437
    return AnalysisError(f"incompatible type {type_repr} with unary operator {op}")


def incompatible_binary_types(op: str, t1: str, t2: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:438-440
    return AnalysisError(f"incompatible types {t1}, {t2} with binary operator {op}")


def incompatible_fn_type(fn: str, type_repr: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:441-442
    return AnalysisError(f"incompatible type {type_repr} with function {fn}")


def invalid_field_name(field: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:443-444
    return AnalysisError(f"invalid field's name '{field}'")


def reserved_field_name(field: str) -> AnalysisError:
    # reference: src/Ifrit/Semantic.purs:445-446
    return AnalysisError(f"reserved field's name '{field}'")
