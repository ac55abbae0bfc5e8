"""Semantic-analysis unit tests — modeled on the reference's layer 4
(test/Test.Main.purs:973-1450): output schemas and error-message goldens."""

from __future__ import annotations

import pytest

from purescript_ifrit_spark.analyzer import analyze
from purescript_ifrit_spark.errors import AnalysisError
from purescript_ifrit_spark.parser import parse_sql
from purescript_ifrit_spark.schema import Schema, schema_from_json

SCHEMA = schema_from_json(
    {
        "name": "string",
        "bad_guy": "boolean",
        "age": "number",
        "details": {"bio": {"age": "number", "class": "string"}},
        "scores": ["number"],
        "spells": [{"name": "string", "power": "number"}],
    }
)


def out(sql):
    return analyze(SCHEMA, parse_sql(sql)).to_json_obj()


def test_projection_schema():
    assert out("SELECT name") == {"name": "string"}


def test_nested_projection_dot_to_underscore():
    # details.bio.class → details_bio_class (Semantic.purs:87-92)
    assert out("SELECT details.bio.class") == {"details_bio_class": "string"}


def test_alias():
    assert out("SELECT name AS n") == {"n": "string"}


def test_array_avg_projection():
    assert out("SELECT AVG(scores)") == {"scores": "number"}


def test_array_nested_avg_projection():
    assert out("SELECT AVG(spells.power) AS p") == {"p": "number"}


def test_count_needs_array_in_select_mode():
    with pytest.raises(AnalysisError) as e:
        out("SELECT COUNT(age)")
    assert str(e.value) == 'incompatible type "number" with function COUNT'


def test_avg_scalar_rejected_in_select_mode():
    with pytest.raises(AnalysisError) as e:
        out("SELECT AVG(age)")
    assert str(e.value) == 'incompatible type "number" with function AVG'


def test_group_by_schema():
    assert out("SELECT AVG(age) GROUP BY details.bio.class") == {
        "age": "number",
        "_id": "string",
    }


def test_group_by_null_schema():
    assert out("SELECT SUM(age) AS total GROUP BY NULL") == {
        "total": "number",
        "_id": "null",
    }


def test_grouped_bare_field_collects_array():
    assert out("SELECT name GROUP BY bad_guy") == {
        "name": ["string"],
        "_id": "boolean",
    }


def test_grouped_count_any_type():
    assert out("SELECT COUNT(name) AS n GROUP BY bad_guy") == {
        "n": "number",
        "_id": "boolean",
    }


def test_grouped_avg_requires_number():
    with pytest.raises(AnalysisError) as e:
        out("SELECT AVG(name) GROUP BY bad_guy")
    assert str(e.value) == 'incompatible type "string" with function AVG'


def test_reserved_id_golden():
    with pytest.raises(AnalysisError) as e:
        out("SELECT name AS _id GROUP BY bad_guy")
    assert str(e.value) == "reserved field's name '_id'"


def test_unexisting_field_goldens():
    with pytest.raises(AnalysisError) as e:
        out("SELECT patate")
    assert str(e.value) == "unexisting field 'patate' in SELECT expression"

    with pytest.raises(AnalysisError) as e:
        out("SELECT name WHERE patate = 1")
    assert str(e.value) == "unexisting field 'patate' in WHERE expression"

    with pytest.raises(AnalysisError) as e:
        out("SELECT AVG(age) GROUP BY patate")
    assert str(e.value) == "unexisting field 'patate' in GROUP BY expression"

    with pytest.raises(AnalysisError) as e:
        out("SELECT name ORDER BY patate")
    assert str(e.value) == "unexisting field 'patate' in ORDER BY expression"


def test_where_type_goldens():
    with pytest.raises(AnalysisError) as e:
        out("SELECT name WHERE name > 3")
    assert str(e.value) == (
        'incompatible types "string", "number" with binary operator >'
    )
    with pytest.raises(AnalysisError) as e:
        out('SELECT name WHERE age = "x"')
    assert str(e.value) == (
        'incompatible types "number", "string" with binary operator ='
    )


def test_null_comparison_ok():
    assert out("SELECT name WHERE age = NULL") == {"name": "string"}
    assert out("SELECT name WHERE age != NULL") == {"name": "string"}


def test_not_requires_boolean():
    with pytest.raises(AnalysisError) as e:
        out("SELECT name WHERE NOT age")
    assert str(e.value) == 'incompatible type "number" with unary operator NOT'


def test_derived_table_schema_flows():
    q = "SELECT p FROM (SELECT AVG(spells.power) AS p, age)"
    assert out(q) == {"p": "number"}


def test_derived_table_unknown_outer_field():
    with pytest.raises(AnalysisError) as e:
        out("SELECT power FROM (SELECT name)")
    assert str(e.value) == "unexisting field 'power' in SELECT expression"


def test_order_by_checked_against_input_schema():
    # ORDER BY validated against pre-projection fields (Semantic.purs:119-120)
    assert out("SELECT name ORDER BY age") == {"name": "string"}
