"""Composable index templates: ES's index-template resolution analog.

Reference context: the connectors service creates content indices with
language-specific mappings/settings
(`app/connectors_service/connectors/es/management_client.py:53`
`create_content_index`, settings from `svc/es/language_data.yml`); on
a real ES cluster those creations compose with the public index
template machinery. This module implements that machinery's documented
semantics for the engine's index catalog:

- an index name matches a template when ANY of the template's
  ``index_patterns`` (``*`` wildcards) matches;
- exactly ONE index template applies — the highest ``priority`` among
  matches (a same-priority overlap is rejected at registration time,
  as ES rejects it at PUT time);
- the effective config = the winner's ``composed_of`` component
  templates deep-merged IN ORDER (later components win), then the
  winner's own ``template`` body merged last (it wins over all
  components). Non-dict values (and lists) override wholesale.

Pure driver-side config plumbing (same tier as plans/config.py /
plans/connectors.py): templates are bounded configured artifacts,
never data.
"""

from __future__ import annotations

import copy
import re

from connectors_spark.functions.scalars import deep_merge_dicts


class TemplateError(ValueError):
    """Invalid template registration or unresolvable index name."""


def wildcard_match(pattern: str, name: str) -> bool:
    """ES index-pattern match: ``*`` = any run (incl. empty); every
    other char literal."""
    rex = "^" + "".join(
        ".*" if c == "*" else re.escape(c) for c in pattern) + "$"
    return re.match(rex, name) is not None


def _patterns_can_overlap(a: str, b: str) -> bool:
    """Conservative overlap test: literal prefixes up to the first
    ``*`` must agree (ES's own check is similarly syntactic)."""
    pa, pb = a.split("*", 1)[0], b.split("*", 1)[0]
    shorter = min(len(pa), len(pb))
    return pa[:shorter] == pb[:shorter] and ("*" in a or "*" in b
                                             or a == b)


def validate_templates(templates: list[dict],
                       component_templates: dict[str, dict]
                       | None = None) -> None:
    """Reject duplicate names, same-priority overlapping patterns, and
    dangling composed_of references — ES PUT-time errors."""
    comps = component_templates or {}
    seen: dict[str, dict] = {}
    for t in templates:
        name = t.get("name")
        if not name:
            raise TemplateError("template missing 'name'")
        if name in seen:
            raise TemplateError(f"duplicate template name {name!r}")
        if not t.get("index_patterns"):
            raise TemplateError(f"template {name!r} has no index_patterns")
        for ref in t.get("composed_of", []):
            if ref not in comps:
                raise TemplateError(
                    f"template {name!r} references missing component "
                    f"template {ref!r}")
        seen[name] = t
    ts = list(templates)
    for i, a in enumerate(ts):
        for b in ts[i + 1:]:
            if a.get("priority", 0) != b.get("priority", 0):
                continue
            for pa in a["index_patterns"]:
                for pb in b["index_patterns"]:
                    if _patterns_can_overlap(pa, pb):
                        raise TemplateError(
                            f"templates {a['name']!r} and {b['name']!r} "
                            f"have overlapping patterns ({pa!r}, {pb!r}) "
                            f"at the same priority "
                            f"{a.get('priority', 0)}")


def match_template(index_name: str, templates: list[dict]) -> dict | None:
    """The single applicable template: highest priority among pattern
    matches; None when nothing matches (ES: index created bare)."""
    matches = [
        t for t in templates
        if any(wildcard_match(p, index_name)
               for p in t.get("index_patterns", []))
    ]
    if not matches:
        return None
    return max(matches, key=lambda t: (t.get("priority", 0), t["name"]))


def resolve_index_config(
    index_name: str,
    templates: list[dict],
    component_templates: dict[str, dict] | None = None,
) -> dict:
    """Effective {settings, mappings, aliases} for a new index:
    composed_of components merged in order, winner's own template body
    last. Returns {} when no template matches."""
    comps = component_templates or {}
    winner = match_template(index_name, templates)
    if winner is None:
        return {}
    out: dict = {}
    for ref in winner.get("composed_of", []):
        if ref not in comps:
            raise TemplateError(
                f"missing component template {ref!r}")
        deep_merge_dicts(out, copy.deepcopy(comps[ref]))
    deep_merge_dicts(out, copy.deepcopy(winner.get("template", {})))
    return out
