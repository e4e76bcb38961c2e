"""Rule-engine semantics matrix — mirrors the reference's basic-rule suite
(reference: libs/connectors_sdk/tests/filtering/test_basic_rule.py)."""

import pytest

from connectors_spark.operators.rules import (
    RuleValidationError,
    apply_rules,
    parse_rules,
    rule_match_stats,
    validate_rules,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a1", "user", "hello world", 5, True, "2025-01-01 00:00:00"),
        ("a2", "assistant", "goodbye world", 10, False, "2025-06-01 00:00:00"),
        ("b1", "tool", None, 15, True, "2025-09-01 00:00:00"),
        ("b2", "system", "Hello again", 20, None, None),
    ]
    return spark.createDataFrame(
        rows, "id string, role string, text string, n int, flag boolean, ts string"
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_default_include(df):
    assert _ids(apply_rules(df, [])) == ["a1", "a2", "b1", "b2"]


def test_exclude_equals(df):
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "role",
              "rule": "equals", "value": "tool"}]
    assert _ids(apply_rules(df, rules)) == ["a1", "a2", "b2"]


def test_first_match_wins_ordering(df):
    # include rule at order 0 shadows the exclude at order 1
    rules = [
        {"id": "r2", "order": 1, "policy": "exclude", "field": "id",
         "rule": "starts_with", "value": "a"},
        {"id": "r1", "order": 0, "policy": "include", "field": "id",
         "rule": "equals", "value": "a1"},
    ]
    assert _ids(apply_rules(df, rules)) == ["a1", "b1", "b2"]


def test_numeric_coercion_gt_lt(df):
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "n",
              "rule": ">", "value": "12.5"}]
    assert _ids(apply_rules(df, rules)) == ["a1", "a2"]
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "n",
              "rule": "<", "value": "10"}]
    assert _ids(apply_rules(df, rules)) == ["a2", "b1", "b2"]


def test_regex_anchored_at_start(df):
    # 'world' does not match 'hello world' under re.match semantics
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "text",
              "rule": "regex", "value": "world"}]
    assert _ids(apply_rules(df, rules)) == ["a1", "a2", "b1", "b2"]
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "text",
              "rule": "regex", "value": "hello.*"}]
    assert _ids(apply_rules(df, rules)) == ["a2", "b1", "b2"]  # case-sensitive


def test_null_field_never_matches(df):
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "text",
              "rule": "contains", "value": "o"}]
    # b1 has null text -> not matched -> kept
    assert _ids(apply_rules(df, rules)) == ["b1"]


def test_missing_field_never_matches(df):
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "nope",
              "rule": "equals", "value": "x"}]
    assert _ids(apply_rules(df, rules)) == ["a1", "a2", "b1", "b2"]


def test_bool_and_ts_coercion(df):
    rules = [{"id": "r1", "order": 0, "policy": "exclude", "field": "flag",
              "rule": "equals", "value": "True"}]
    assert _ids(apply_rules(df, rules)) == ["a2", "b2"]
    rules = [{"id": "r1", "order": 0, "policy": "include", "field": "ts",
              "rule": ">", "value": "2025-05-01"},
             {"id": "r2", "order": 1, "policy": "exclude", "field": "id",
              "rule": "regex", "value": ".+"}]
    assert _ids(apply_rules(df, rules)) == ["a2", "b1"]


def test_default_rule_dropped_and_sorting():
    rules = parse_rules([
        {"id": "DEFAULT", "order": 99, "policy": "include", "field": "x",
         "rule": "equals", "value": "y"},
        {"id": "r2", "order": 2, "policy": "exclude", "field": "x",
         "rule": "equals", "value": "y"},
        {"id": "r1", "order": 1, "policy": "include", "field": "x",
         "rule": "equals", "value": "y2"},
    ])
    assert [r.id for r in rules] == ["r1", "r2"]


def test_validation_rejects():
    with pytest.raises(RuleValidationError):
        validate_rules(parse_rules([{"id": "r", "order": 0, "policy": "nope",
                                     "field": "x", "rule": "equals", "value": "y"}]))
    with pytest.raises(RuleValidationError):
        validate_rules(parse_rules([{"id": "r", "order": 0, "policy": "include",
                                     "field": "x", "rule": "regex", "value": ".*"}]))
    with pytest.raises(RuleValidationError):
        validate_rules(parse_rules([
            {"id": "r1", "order": 0, "policy": "include", "field": "x",
             "rule": "equals", "value": "y"},
            {"id": "r2", "order": 1, "policy": "include", "field": "x",
             "rule": "equals", "value": "y"},
        ]))


def test_rule_match_stats(df):
    rules = [
        {"id": "r1", "order": 0, "policy": "exclude", "field": "role",
         "rule": "equals", "value": "user"},
        {"id": "r2", "order": 1, "policy": "include", "field": "n",
         "rule": ">", "value": "9"},
    ]
    stats = {r.rule_id: (r.policy, r.n_matched)
             for r in rule_match_stats(df, rules).collect()}
    assert stats == {"r1": ("exclude", 1), "r2": ("include", 3)}
