"""ES ingest-pipeline compiler + alias registry/rollover/search merge."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.aliases import AliasRegistry, alias_topk
from connectors_spark.operators.ingest import (
    apply_pipeline, dissect_to_regex)


# ---------------------------------------------------------------- ingest

def test_dissect_compile_nongreedy_until_last():
    regex, fields = dissect_to_regex("%{a} %{b}|%{c}")
    assert fields == ["a", "b", "c"]
    assert regex == r"^(.*?)\ (.*?)\|(.*)$"


def test_pipeline_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "type=click user=7 v=0.50|x,y|0.5,click")], ["id", "line"])
    out = apply_pipeline(df, [
        {"dissect": {"field": "line", "pattern": "%{kv}|%{tags}|%{csv}"}},
        {"kv": {"field": "kv", "target_keys": ["type", "user", "v"]}},
        {"convert": {"field": "user", "type": "long"}},
        {"convert": {"field": "v", "type": "double"}},
        {"uppercase": {"field": "type"}},
        {"gsub": {"field": "type", "pattern": "K$", "replacement": "KK"}},
        {"split": {"field": "tags", "separator": ",",
                   "target_field": "tags_arr"}},
        {"join": {"field": "tags_arr", "separator": ";",
                  "target_field": "tags_joined"}},
        {"csv": {"field": "csv", "target_fields": ["c1", "c2"]}},
        {"set": {"field": "src", "value": "pipe"}},
        {"rename": {"field": "id", "target_field": "event_id"}},
        {"remove": {"field": "line"}},
    ])
    row = out.collect()[0].asDict()
    assert row["type"] == "CLICKK"
    assert row["user"] == 7 and isinstance(row["user"], int)
    assert row["v"] == 0.5
    assert row["tags_joined"] == "x;y"
    assert (row["c1"], row["c2"]) == ("0.5", "click")
    assert row["src"] == "pipe" and row["event_id"] == 1
    assert "line" not in row and "id" not in row


def test_pipeline_is_one_projection_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a=1")], ["id", "line"])
    out = apply_pipeline(df, [
        {"kv": {"field": "line", "target_keys": ["a"]}},
        {"convert": {"field": "a", "type": "integer"}},
        {"lowercase": {"field": "line"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # whole chain rides the scan stage


def test_pipeline_unknown_processor_raises(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="unknown ingest processor"):
        apply_pipeline(df, [{"frobnicate": {"field": "id"}}])


# ---------------------------------------------------------------- aliases

def _reg():
    r = AliasRegistry()
    r.update_aliases([
        {"add": {"alias": "docs", "index": "docs-000001",
                 "is_write_index": True}},
        {"add": {"alias": "docs", "index": "docs-000000",
                 "filter": "lang = 'en'"}},
    ])
    return r


def test_alias_actions_atomic_on_failure():
    r = _reg()
    before = r.members("docs")
    with pytest.raises(KeyError):
        r.update_aliases([
            {"add": {"alias": "docs", "index": "docs-000002"}},
            {"remove": {"alias": "docs", "index": "nope"}},  # fails
        ])
    assert r.members("docs") == before  # first action NOT applied


def test_alias_two_write_indices_rejected():
    r = _reg()
    with pytest.raises(ValueError, match="two write indices"):
        r.update_aliases([
            {"add": {"alias": "docs", "index": "docs-000002",
                     "is_write_index": True}},
        ])


def test_rollover_moves_write_flag_only_when_condition_met():
    r = _reg()
    assert not r.rollover("docs", "docs-000002", {"max_docs": 1000},
                          {"docs": 999})
    assert r.write_index("docs") == "docs-000001"
    assert r.rollover("docs", "docs-000002", {"max_docs": 1000},
                      {"docs": 1000})
    assert r.write_index("docs") == "docs-000002"
    names = [m.index for m in r.members("docs")]
    assert "docs-000001" in names  # old index still searchable


def test_alias_topk_merges_disjoint_members(spark):
    a = spark.createDataFrame(
        [("q", 10, 3.0), ("q", 11, 1.0)], ["query_id", "doc_id", "score"])
    b = spark.createDataFrame(
        [("q", 20, 2.0)], ["query_id", "doc_id", "score"])
    got = alias_topk([("ia", a), ("ib", b)], k=2).collect()
    assert [(r.rank, r.doc_id, r.member) for r in got] == [
        (1, 10, "ia"), (2, 20, "ib")]


def test_convert_malformed_yields_null_not_job_failure(spark):
    # ES convert fails one document, never the batch; distributed analog
    # is NULL-on-malformed (try_cast) — a plain ANSI cast would kill the
    # whole job on the first no-match extraction.
    df = spark.createDataFrame([(1, "garbage")], ["id", "line"])
    out = apply_pipeline(df, [
        {"dissect": {"field": "line", "pattern": "%{a}|%{b}"}},
        {"convert": {"field": "a", "type": "long"}},
    ]).collect()[0]
    assert out.a is None
