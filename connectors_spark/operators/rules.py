"""Basic filtering rules — include/exclude, first-match-wins.

Re-expresses the reference's BasicRuleEngine (reference:
libs/connectors_sdk/connectors_sdk/filtering/basic_rule.py:107-156) as a
single Catalyst Column expression: an ordered chain of
`F.when(match_i, policy_i)` ending in `.otherwise(True)` (default =
include). Because the whole rule set compiles to one codegen'd predicate,
Catalyst can push it into the scan — the reference evaluates rules in
Python per record (basic_rule.py:163-201).

Semantics kept bit-for-bit:
- rules sorted by `order` asc; the DEFAULT rule is dropped
  (basic_rule.py:20-44);
- 7 predicates: equals, starts_with, ends_with, contains, regex
  (anchored at start, Python re.match semantics), > and <
  (basic_rule.py:259-302);
- a missing/null field never matches (basic_rule.py:150-155 try/except);
- the rule VALUE is coerced to the document field's type
  (basic_rule.py:47-78): here the schema is static, so coercion happens
  at plan time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_RULE_ID = "DEFAULT"
POLICIES = {"include", "exclude"}
RULE_OPS = {"equals", "starts_with", "ends_with", "contains", "regex", ">", "<"}

# mirrors basic_rule.py:16-17 IS_BOOL_TRUE / IS_BOOL_FALSE (full-match, case-insensitive)
_BOOL_TRUE_RE = re.compile(r"true|t|yes|y|on", re.I)
_BOOL_FALSE_RE = re.compile(r"false|f|no|n|off", re.I)


@dataclass(frozen=True)
class BasicRule:
    id: str
    order: int
    policy: str  # include | exclude
    field: str
    rule: str    # one of RULE_OPS
    value: str


class RuleValidationError(ValueError):
    pass


def parse_rules(raw: list[dict]) -> list[BasicRule]:
    """Drop DEFAULT, sort by order asc (basic_rule.py:20-44)."""
    rules = [
        BasicRule(
            id=str(r["id"]), order=int(r["order"]), policy=str(r["policy"]).lower(),
            field=str(r["field"]), rule=str(r["rule"]).lower(), value=str(r["value"]),
        )
        for r in raw
        if str(r.get("id")) != DEFAULT_RULE_ID
    ]
    return sorted(rules, key=lambda r: r.order)


def validate_rules(rules: list[BasicRule]) -> None:
    """Mirrors validation.py:248-386: names valid, no match-all regex,
    no semantic duplicates across the set."""
    seen = set()
    for r in rules:
        if r.policy not in POLICIES:
            raise RuleValidationError(f"rule {r.id}: unknown policy {r.policy!r}")
        if r.rule not in RULE_OPS:
            raise RuleValidationError(f"rule {r.id}: unknown rule {r.rule!r}")
        if r.rule == "regex":
            try:
                re.compile(r.value)
            except re.error as e:
                raise RuleValidationError(f"rule {r.id}: bad regex: {e}") from e
            if r.value.strip() in {".*", "(.*)", ".+?", ".*?", "(.*?)"}:
                raise RuleValidationError(f"rule {r.id}: match-all regex")
        key = (r.field, r.rule, r.value, r.policy)
        if key in seen:
            raise RuleValidationError(f"rule {r.id}: semantic duplicate {key}")
        seen.add(key)


def _coerced(col: Column, dtype: T.DataType, rule: BasicRule) -> tuple[Column, Column]:
    """(field_col, rule_value_col) with the rule value cast to the field's
    type (basic_rule.py:47-78: coerce-to-document-type)."""
    if isinstance(dtype, (T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)):
        return col.cast("double"), F.lit(float(rule.value)).cast("double")
    if isinstance(dtype, T.BooleanType):
        # to_bool (basic_rule.py:71-78): true|t|yes|y|on => True,
        # empty or false|f|no|n|off => False, anything else can never
        # match a boolean field (NULL literal => coalesce(..., False)).
        if _BOOL_TRUE_RE.fullmatch(rule.value):
            return col, F.lit(True)
        if rule.value == "" or _BOOL_FALSE_RE.fullmatch(rule.value):
            return col, F.lit(False)
        return col, F.lit(None).cast("boolean")
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        return col.cast("timestamp"), F.to_timestamp(F.lit(rule.value))
    return col.cast("string"), F.lit(rule.value)


def _raw_str(col: Column, dtype: T.DataType) -> Column:
    """str(document_value) on the RAW field (basic_rule.py:293-299): the
    string-family ops never see the numeric coercion — int 9 must render
    '9', not '9.0'. Booleans render Python-style 'True'/'False'."""
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("True")).otherwise(F.lit("False"))
    return col.cast("string")


def _match_cond(df: DataFrame, rule: BasicRule) -> Column:
    if rule.field not in df.columns:
        return F.lit(False)  # missing field => rule never matches
    dtype = df.schema[rule.field].dataType
    col = F.col(rule.field)
    fld, val = _coerced(col, dtype, rule)
    if rule.rule == "equals":
        cond = fld == val
    elif rule.rule == "starts_with":
        cond = _raw_str(col, dtype).startswith(F.lit(rule.value))
    elif rule.rule == "ends_with":
        cond = _raw_str(col, dtype).endswith(F.lit(rule.value))
    elif rule.rule == "contains":
        cond = _raw_str(col, dtype).contains(F.lit(rule.value))
    elif rule.rule == "regex":
        # Python re.match anchors at start only
        cond = _raw_str(col, dtype).rlike(f"^(?:{rule.value})")
    elif rule.rule == ">":
        cond = fld > val
    elif rule.rule == "<":
        cond = fld < val
    else:  # pragma: no cover — validate_rules rejects
        raise RuleValidationError(rule.rule)
    # null field value never matches (basic_rule.py:150-155)
    return col.isNotNull() & F.coalesce(cond, F.lit(False))


def should_ingest_col(df: DataFrame, rules: list[BasicRule]) -> Column:
    """First-match-wins boolean predicate; default include."""
    chain = None
    for r in rules:
        keep = F.lit(r.policy == "include")
        cond = _match_cond(df, r)
        chain = F.when(cond, keep) if chain is None else chain.when(cond, keep)
    return (chain.otherwise(F.lit(True))) if chain is not None else F.lit(True)


def matched_rule_col(df: DataFrame, rules: list[BasicRule]) -> Column:
    """id of the first matching rule (DEFAULT if none) — feeds
    RuleMatchStats (basic_rule.py:81-104)."""
    chain = None
    for r in rules:
        cond = _match_cond(df, r)
        chain = F.when(cond, F.lit(r.id)) if chain is None else chain.when(cond, F.lit(r.id))
    return (chain.otherwise(F.lit(DEFAULT_RULE_ID))) if chain is not None else F.lit(DEFAULT_RULE_ID)


def apply_rules(df: DataFrame, raw_rules: list[dict]) -> DataFrame:
    rules = parse_rules(raw_rules)
    validate_rules(rules)
    return df.filter(should_ingest_col(df, rules))


def rule_match_stats(df: DataFrame, raw_rules: list[dict]) -> DataFrame:
    """(rule_id, policy, n_matched) — per-rule match counts (A3)."""
    rules = parse_rules(raw_rules)
    validate_rules(rules)
    pol = {r.id: r.policy for r in rules}
    pol[DEFAULT_RULE_ID] = "include"
    mapping = F.create_map(*[F.lit(x) for kv in pol.items() for x in kv])
    return (
        df.select(matched_rule_col(df, rules).alias("rule_id"))
        .groupBy("rule_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .withColumn("policy", mapping[F.col("rule_id")])
        .select("rule_id", "policy", "n_matched")
    )
