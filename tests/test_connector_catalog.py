"""Connector-doc CAS + filtering draft->active validation state machine
(VERDICT r2 item 10; reference protocol/connectors.py:935-975)."""

import pytest

from connectors_spark.plans.connectors import (
    EDITED, INVALID, VALID, ConnectorCatalog,
)
from connectors_spark.plans.jobs import ClaimConflict

GOOD_RULES = [
    {"id": "r1", "order": 1, "policy": "exclude", "field": "event_type",
     "rule": "equals", "value": "error"},
]
BAD_RULES = [
    {"id": "rX", "order": 1, "policy": "noSuchPolicy", "field": "f",
     "rule": "equals", "value": "v"},
]


@pytest.fixture()
def cat(tmp_path):
    return ConnectorCatalog(str(tmp_path / "connectors"))


def test_valid_draft_promotes_to_active(spark, cat):
    cid = cat.create("transcripts")
    # fresh connector: nothing edited -> validation pass skips, no write
    seq0 = cat.get(cid)["seq_no"]
    assert cat.validate_filtering(cid, spark) is None
    assert cat.get(cid)["seq_no"] == seq0

    cat.update_filtering_draft(cid, rules=GOOD_RULES)
    doc = cat.get(cid)
    assert doc["filtering"][0]["draft"]["validation"]["state"] == EDITED
    assert doc["filtering"][0]["active"]["rules"] == []

    assert cat.validate_filtering(cid, spark) == VALID
    doc = cat.get(cid)
    d = doc["filtering"][0]
    assert d["draft"]["validation"]["state"] == VALID
    # promotion: active IS the validated draft
    assert d["active"]["rules"] == GOOD_RULES
    assert cat.active_filter(cid)["rules"] == GOOD_RULES

    # re-validating a non-edited draft skips (reference short-circuit)
    seq = cat.get(cid)["seq_no"]
    assert cat.validate_filtering(cid, spark) is None
    assert cat.get(cid)["seq_no"] == seq


def test_invalid_draft_never_activates(spark, cat):
    cid = cat.create("transcripts")
    cat.update_filtering_draft(cid, rules=GOOD_RULES)
    assert cat.validate_filtering(cid, spark) == VALID
    # a bad edit: draft turns invalid WITH errors, active stays on the
    # last good filter
    cat.update_filtering_draft(cid, rules=BAD_RULES)
    assert cat.validate_filtering(cid, spark) == INVALID
    d = cat.get(cid)["filtering"][0]
    assert d["draft"]["validation"]["state"] == INVALID
    assert d["draft"]["validation"]["errors"]
    assert d["active"]["rules"] == GOOD_RULES


def test_advanced_snippet_validates_sql(spark, cat):
    cid = cat.create("transcripts")
    cat.update_filtering_draft(
        cid, advanced_snippet={"query": "DROP TABLE x"})
    assert cat.validate_filtering(cid, spark) == INVALID
    cat.update_filtering_draft(
        cid, advanced_snippet={"query": "SELECT 1 AS one"})
    assert cat.validate_filtering(cid, spark) == VALID
    assert cat.active_filter(cid)["advanced_snippet"] == {
        "query": "SELECT 1 AS one"}


def test_configuration_cas_and_schema_gate(cat):
    from connectors_spark.plans.config import Field, SourceConfiguration

    schema = SourceConfiguration([
        Field("host", field_type="str", required=True),
        Field("port", field_type="int", default_value=5432,
              validations=[{"type": "greater_than", "constraint": 0}]),
    ])
    cid = cat.create("pg", configuration={"host": "h1", "port": 5432})
    cat.update_configuration(cid, {"port": 9999}, schema=schema)
    assert cat.get(cid)["configuration"]["port"] == 9999
    # failing validation leaves the doc untouched (write never happens)
    seq = cat.get(cid)["seq_no"]
    with pytest.raises(Exception):
        cat.update_configuration(cid, {"port": "not-an-int"}, schema=schema)
    doc = cat.get(cid)
    assert doc["configuration"]["port"] == 9999 and doc["seq_no"] == seq


def test_concurrent_edit_conflicts_then_retries(cat):
    cid = cat.create("transcripts")
    # a stale writer (simulated: expect_seq from an old read) loses
    doc = cat.get(cid)
    cat.update_filtering_draft(cid, rules=GOOD_RULES)  # bumps seq
    with pytest.raises(ClaimConflict):
        cat._write(cid, doc, expect_seq=doc["seq_no"])
    # the CAS loop retries from a fresh read and succeeds
    out = cat._cas_update(cid, lambda d: d.update(service_type="new"))
    assert out["service_type"] == "new"
    # the earlier draft edit survived the concurrent update
    assert cat.get(cid)["filtering"][0]["draft"]["rules"] == GOOD_RULES
