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


def test_per_source_advanced_validator_registry(spark, cat):
    """VERDICT r2 missing-item 2: source types register their own
    advanced-rule validators (the reference's per-source validator
    lists); a connector validates its draft with ITS type's validators,
    others keep the default parse-only SQL dialect."""
    from connectors_spark.operators.rule_validation import (
        FilteringValidationResult,
        _ADVANCED_VALIDATORS,
        register_advanced_validator,
        validator_for,
    )

    def mongo_pipeline_validator(spark_, rules):
        res = FilteringValidationResult()
        # a Mongo-ish dialect: the rule must be a list of pipeline stages
        if not (isinstance(rules, str) and rules.strip().startswith("[")):
            res.add(["advanced_snippet"],
                    "pipeline must be a JSON array of stages")
        return res

    register_advanced_validator("mongoish", mongo_pipeline_validator)
    try:
        # a mongoish connector rejects SQL but accepts a pipeline array
        cid = cat.create("mongoish")
        cat.update_filtering_draft(
            cid, advanced_snippet={"query": "SELECT 1"})
        assert cat.validate_filtering(cid, spark) == "invalid"
        cat.update_filtering_draft(
            cid, advanced_snippet={"query": '[{"$match": {}}]'})
        assert cat.validate_filtering(cid, spark) == "valid"

        # an unregistered type still validates with the SQL dialect
        cid2 = cat.create("sqlish")
        cat.update_filtering_draft(
            cid2, advanced_snippet={"query": "SELECT 1 AS one"})
        assert cat.validate_filtering(cid2, spark) == "valid"
        cat.update_filtering_draft(
            cid2, advanced_snippet={"query": "DROP TABLE x"})
        assert cat.validate_filtering(cid2, spark) == "invalid"

        assert len(validator_for("mongoish").advanced_validators) == 1
    finally:
        _ADVANCED_VALIDATORS.pop("mongoish", None)
