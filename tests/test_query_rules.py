"""ES query-rules analog: criteria matching, pin precedence,
exclude-wins-over-pin, pinned-not-in-organic, plan quality."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.query_rules import (
    MAX_RULES, apply_query_rules, match_rules, ruleset_budgets)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [("q1", "cheap spark cluster"), ("q2", "hash"),
         ("q3", "vector db"), ("q4", "nothing here")],
        "query_id string, query_text string")


RULES = [
    {"rule_id": "a", "type": "pinned",
     "criteria": [{"type": "contains", "values": ["spark"]}],
     "actions": [30, 31]},
    {"rule_id": "b", "type": "pinned",
     "criteria": [{"type": "exact", "values": ["hash", "hsh"]}],
     "actions": [32, 30]},
    {"rule_id": "c", "type": "pinned",
     "criteria": [{"type": "prefix", "values": ["vector"]},
                  {"type": "suffix", "values": ["db"]}],
     "actions": [33]},
    {"rule_id": "d", "type": "exclude",
     "criteria": [{"type": "fuzzy", "values": ["hashy"]}],
     "actions": [32, 10]},
]


def test_match_rules_criteria(spark, queries):
    got = sorted((r.query_id, r.rule_ord)
                 for r in match_rules(queries, RULES).collect())
    # q1 contains spark -> rule 0; q2 exact hash -> rule 1 and fuzzy
    # hashy (lev 1) -> rule 3; q3 prefix+suffix AND -> rule 2
    assert got == [("q1", 0), ("q2", 1), ("q2", 3), ("q3", 2)]


def test_match_rules_and_semantics(spark, queries):
    half = [{"rule_id": "x", "type": "pinned",
             "criteria": [{"type": "prefix", "values": ["vector"]},
                          {"type": "suffix", "values": ["nope"]}],
             "actions": [1]}]
    assert match_rules(queries, half).count() == 0


def test_apply_rules_full_semantics(spark, queries):
    organic = spark.createDataFrame(
        [("q1", 1, 5.0), ("q1", 30, 4.0), ("q1", 2, 3.0),
         ("q2", 10, 9.0), ("q2", 32, 8.0), ("q2", 5, 7.0),
         ("q4", 8, 2.0)],
        "query_id string, doc_id long, score double")
    out = apply_query_rules(organic, queries, RULES, k=4)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r)
    q1 = sorted(by_q["q1"], key=lambda r: r.rank)
    # pins 30 (ord 0) then 31 (ord 1, NOT in organic), then organic 1, 2
    assert [(r.doc_id, r.pinned) for r in q1] == [
        (30, True), (31, True), (1, False), (2, False)]
    q2 = sorted(by_q["q2"], key=lambda r: r.rank)
    # rule b pins 32 and 30, but rule d (fuzzy) EXCLUDES 32 and 10:
    # exclude wins over pin; 10 also drops from organic; 30 pinned
    # though absent from organic
    docs2 = [(r.doc_id, r.pinned) for r in q2]
    assert (32, True) not in docs2 and (32, False) not in docs2
    assert (10, False) not in docs2
    assert docs2[0] == (30, True) and (5, False) in docs2
    # q4 matches no rule: untouched organic
    assert [(r.doc_id, r.pinned) for r in by_q["q4"]] == [(8, False)]


def test_pin_precedence_min_ordinal(spark, queries):
    rules = [
        {"rule_id": "a", "type": "pinned",
         "criteria": [{"type": "always"}], "actions": [7, 8]},
        {"rule_id": "b", "type": "pinned",
         "criteria": [{"type": "always"}], "actions": [8, 9]},
    ]
    organic = spark.createDataFrame(
        [("q1", 1, 1.0)], "query_id string, doc_id long, score double")
    q = spark.createDataFrame([("q1", "x")],
                              "query_id string, query_text string")
    out = sorted(apply_query_rules(organic, q, rules, k=5).collect(),
                 key=lambda r: r.rank)
    # 8 is pinned by both rules -> earliest ordinal (rule a, pos 1)
    assert [r.doc_id for r in out] == [7, 8, 9, 1]


def test_budgets_and_validation(spark, queries):
    assert ruleset_budgets(RULES) == (5, 2)
    with pytest.raises(ValueError, match="1..100"):
        match_rules(queries, [])
    with pytest.raises(ValueError, match="unknown criterion"):
        match_rules(queries, [{"rule_id": "x", "type": "pinned",
                               "criteria": [{"type": "regex",
                                             "values": ["a"]}],
                               "actions": [1]}])
    with pytest.raises(ValueError, match="needs values"):
        match_rules(queries, [{"rule_id": "x", "type": "pinned",
                               "criteria": [{"type": "exact",
                                             "values": []}],
                               "actions": [1]}])
    assert len(str(MAX_RULES)) >= 2


def test_plan_broadcasts_pins_and_excludes(spark, queries):
    organic = spark.createDataFrame(
        [("q1", 1, 5.0)], "query_id string, doc_id long, score double")
    out = apply_query_rules(organic, queries, RULES, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
