"""Property-based rule-engine parity: hypothesis-generated rule sets and
rows, Spark Column evaluation vs an independent per-record Python
evaluator that mirrors the reference semantics (reference:
libs/connectors_sdk/connectors_sdk/filtering/basic_rule.py:107-156,
163-201, 259-302 — first-match-wins, missing/null never matches,
anchored regex, coerce-to-document-type)."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from connectors_spark.operators.rules import parse_rules, should_ingest_col

FIELDS = {"name": "str", "n": "int", "score": "float", "flag": "bool"}

_value_by_field = {
    "name": st.sampled_from(["alpha", "beta", "gamma", "a", ""]),
    "n": st.sampled_from(["0", "5", "10", "-3"]),
    "score": st.sampled_from(["0.5", "2.5", "-1.0"]),
    "flag": st.sampled_from(["true", "T", "yes", "on", "FALSE", "off", "", "1", "maybe"]),
}


def _rule_strategy():
    def mk(i, field, op, value):
        return {"id": f"r{i}", "order": i, "policy": None, "field": field,
                "rule": op, "value": value}

    def fill(draw_tuple):
        i, field, op, value, policy = draw_tuple
        r = mk(i, field, op, value)
        r["policy"] = policy
        return r

    string_ops = ["equals", "starts_with", "ends_with", "contains", "regex"]
    # string-family ops ARE legal on numeric fields (reference applies them
    # to str(document_value), basic_rule.py:293-299)
    num_ops = ["equals", ">", "<", "starts_with", "ends_with", "contains"]
    bool_ops = ["equals", "starts_with", "ends_with", "contains"]

    def one(i):
        return st.one_of(
            st.tuples(st.just(i), st.just("name"), st.sampled_from(string_ops),
                      _value_by_field["name"],
                      st.sampled_from(["include", "exclude"])).map(fill),
            st.tuples(st.just(i), st.just("n"), st.sampled_from(num_ops),
                      _value_by_field["n"],
                      st.sampled_from(["include", "exclude"])).map(fill),
            st.tuples(st.just(i), st.just("score"), st.sampled_from(num_ops),
                      _value_by_field["score"],
                      st.sampled_from(["include", "exclude"])).map(fill),
            st.tuples(st.just(i), st.just("flag"), st.sampled_from(bool_ops),
                      _value_by_field["flag"],
                      st.sampled_from(["include", "exclude"])).map(fill),
        )

    return st.integers(min_value=0, max_value=4).flatmap(
        lambda k: st.tuples(*[one(i) for i in range(k)]).map(list)
    )


ROWS = [
    (1, "alpha", 5, 2.5, True),
    (2, "beta", 10, 0.5, False),
    (3, None, 0, -1.0, True),
    (4, "gamma", -3, None, None),
    (5, "", 7, 0.0, False),
    (6, "alphabet", None, 3.5, True),
]


def py_should_ingest(row: dict, rules: list[dict]) -> bool:
    """Independent per-record evaluator (reference semantics)."""
    for r in sorted(rules, key=lambda r: r["order"]):
        v = row.get(r["field"])
        if v is None:
            continue
        rv = r["value"]
        op = r["rule"]
        try:
            if isinstance(v, bool):
                if op == "equals":
                    # to_bool semantics (basic_rule.py:16-17, 71-78):
                    # non-bool-pattern values never match a bool field
                    if re.fullmatch(r"true|t|yes|y|on", rv, re.I):
                        matched = v is True
                    elif rv == "" or re.fullmatch(r"false|f|no|n|off", rv, re.I):
                        matched = v is False
                    else:
                        matched = False
                else:
                    matched = _str_match("True" if v else "False", op, rv)
            elif isinstance(v, (int, float)):
                if op == "equals":
                    matched = float(v) == float(rv)
                elif op == ">":
                    matched = float(v) > float(rv)
                elif op == "<":
                    matched = float(v) < float(rv)
                else:
                    # str() of the RAW value: int 9 -> '9', never '9.0'
                    matched = _str_match(str(v), op, rv)
            else:
                if op == ">":
                    matched = str(v) > rv
                elif op == "<":
                    matched = str(v) < rv
                elif op == "equals":
                    matched = str(v) == rv
                else:
                    matched = _str_match(str(v), op, rv)
        except ValueError:
            matched = False
        if matched:
            return r["policy"] == "include"
    return True


def _str_match(v: str, op: str, rv: str) -> bool:
    if op == "equals":
        return v == rv
    if op == "starts_with":
        return v.startswith(rv)
    if op == "ends_with":
        return v.endswith(rv)
    if op == "contains":
        return rv in v
    if op == "regex":
        return re.match(rv, v) is not None
    raise AssertionError(op)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "id long, name string, n int, score double, flag boolean"
    ).cache()


@given(rules=_rule_strategy())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spark_rules_match_python_reference(spark, df, rules):
    parsed = parse_rules(rules)
    got = {
        r.id: r.keep
        for r in df.select(
            "id", should_ingest_col(df, parsed).alias("keep")
        ).collect()
    }
    for row in ROWS:
        d = dict(zip(["id", "name", "n", "score", "flag"], row))
        exp = py_should_ingest(d, rules)
        assert got[d["id"]] == exp, (rules, d, got[d["id"]], exp)
