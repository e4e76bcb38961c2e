"""Index-template resolution semantics (plans/templates.py) — pure
driver-side config plumbing, no Spark session needed."""

import pytest

from connectors_spark.plans.templates import (
    TemplateError,
    match_template,
    resolve_index_config,
    validate_templates,
    wildcard_match,
)

COMPS = {
    "base-settings": {"settings": {"number_of_shards": 1,
                                   "refresh_interval": "1s"}},
    "english-analysis": {"settings": {"analysis": {"analyzer": "english"}},
                         "mappings": {"properties": {
                             "text": {"type": "text"}}}},
    "wide-shards": {"settings": {"number_of_shards": 8}},
}

TEMPLATES = [
    {"name": "content", "index_patterns": ["search-*"], "priority": 100,
     "composed_of": ["base-settings", "english-analysis"],
     "template": {"settings": {"refresh_interval": "30s"}}},
    {"name": "content-acl", "index_patterns": ["search-acl-*"],
     "priority": 200,
     "composed_of": ["base-settings"],
     "template": {"mappings": {"properties": {
         "allow": {"type": "keyword"}}}}},
    {"name": "logs", "index_patterns": ["logs-*"], "priority": 100,
     "composed_of": ["wide-shards"], "template": {}},
]


def test_wildcard_match():
    assert wildcard_match("search-*", "search-main")
    assert wildcard_match("search-*", "search-")
    assert not wildcard_match("search-*", "logs-main")
    assert wildcard_match("*", "anything")
    assert wildcard_match("exact", "exact")
    assert not wildcard_match("exact", "exact2")
    assert not wildcard_match("a.b", "axb")  # dot is literal, not regex


def test_highest_priority_wins():
    t = match_template("search-acl-main", TEMPLATES)
    assert t["name"] == "content-acl"  # 200 beats content's 100
    assert match_template("search-main", TEMPLATES)["name"] == "content"
    assert match_template("other", TEMPLATES) is None


def test_composition_order_components_then_own_body():
    cfg = resolve_index_config("search-main", TEMPLATES, COMPS)
    # base-settings then english-analysis merged, own body wins last
    assert cfg["settings"]["number_of_shards"] == 1
    assert cfg["settings"]["analysis"] == {"analyzer": "english"}
    assert cfg["settings"]["refresh_interval"] == "30s"  # own body won
    assert cfg["mappings"]["properties"]["text"] == {"type": "text"}


def test_later_component_overrides_earlier():
    ts = [{"name": "t", "index_patterns": ["x-*"], "priority": 1,
           "composed_of": ["base-settings", "wide-shards"],
           "template": {}}]
    cfg = resolve_index_config("x-1", ts, COMPS)
    assert cfg["settings"]["number_of_shards"] == 8
    assert cfg["settings"]["refresh_interval"] == "1s"  # preserved


def test_no_match_returns_empty():
    assert resolve_index_config("zzz", TEMPLATES, COMPS) == {}


def test_validate_rejects_same_priority_overlap():
    bad = TEMPLATES + [{"name": "content2",
                        "index_patterns": ["search-other-*"],
                        "priority": 100, "template": {}}]
    with pytest.raises(TemplateError, match="overlapping"):
        validate_templates(bad, COMPS)
    # different priority: fine
    ok = TEMPLATES + [{"name": "content2",
                       "index_patterns": ["search-other-*"],
                       "priority": 150, "template": {}}]
    validate_templates(ok, COMPS)


def test_validate_rejects_dangling_component_and_dups():
    with pytest.raises(TemplateError, match="missing component"):
        validate_templates(
            [{"name": "t", "index_patterns": ["a*"],
              "composed_of": ["nope"], "template": {}}], COMPS)
    with pytest.raises(TemplateError, match="duplicate"):
        validate_templates(
            [{"name": "t", "index_patterns": ["a*"]},
             {"name": "t", "index_patterns": ["b*"]}], COMPS)
    with pytest.raises(TemplateError, match="index_patterns"):
        validate_templates([{"name": "t"}], COMPS)


def test_component_templates_not_mutated():
    before = {k: repr(v) for k, v in COMPS.items()}
    resolve_index_config("search-main", TEMPLATES, COMPS)
    resolve_index_config("x", [{"name": "t", "index_patterns": ["x"],
                                "composed_of": ["base-settings"],
                                "template": {"settings": {
                                    "number_of_shards": 5}}}], COMPS)
    assert {k: repr(v) for k, v in COMPS.items()} == before
