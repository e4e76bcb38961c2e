"""ES query-rules analog: the `_query_rules` API + `rule` retriever.

ES publishes query rulesets — each rule has typed criteria matched
against query metadata (exact / contains / prefix / suffix / fuzzy /
gte / lte / always, values OR-ed within a criterion, criteria AND-ed
within a rule) and a pinned or exclude action over document ids — and a
`rule` retriever that applies a ruleset on top of an organic retriever:
matching rules' pinned ids rank first in rule order, excluded ids are
removed. Rulesets are size-capped by ES (max rules per ruleset, max
pinned docs), which is what makes the broadcast shapes below correct.

This is the search-engineer's merchandising tool (the reference syncs
content into exactly these indices; search teams then pin/exclude over
it), re-expressed Spark-first:

- criteria compile to ONE Catalyst predicate per rule, evaluated over
  the (tiny) queries frame — no UDF;
- pins/excludes are bounded-by-spec tables -> broadcast joins against
  the organic result;
- exactness at scale: with E = total excludable ids and P = total
  pinnable ids in the ruleset, organic top-(k + E) is sufficient to
  produce an exact final top-k (excludes can only free slots, pins only
  prepend), so the caller never needs the full scored set.

Semantics pinned down (and mirrored in the oracle SQL):
- a doc pinned by several matching rules takes its smallest pin ordinal
  (rule order, then action order — ES's documented precedence);
- exclude wins over pin when both match the same (query, doc);
- pinned docs score PIN_BASE - pin_ord (the same synthetic-score device
  as the pinned-query gate), organic docs keep their BM25 score;
  a pinned doc also present organically appears once, at its pin slot.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PIN_BASE = 1_000_000_000.0
# ES caps rules per ruleset (and pinned ids per rule) — the broadcast
# shapes below are correct BECAUSE of this bound; enforce it.
MAX_RULES = 100


def _criterion_pred(col, ctype: str, values: list):
    if ctype == "always":
        return F.lit(True)
    if not values:
        raise ValueError(f"criterion {ctype!r} needs values")
    per_value = {
        "exact": lambda v: col == F.lit(v),
        "contains": lambda v: col.contains(v),
        "prefix": lambda v: col.startswith(v),
        "suffix": lambda v: col.endswith(v),
        # NOTE levenshtein counts a transposition as 2 edits
        "fuzzy": lambda v: F.levenshtein(col, F.lit(v)) <= F.lit(1),
        "gte": lambda v: col >= F.lit(v),
        "lte": lambda v: col <= F.lit(v),
    }
    if ctype not in per_value:
        raise ValueError(f"unknown criterion type {ctype!r}")
    return reduce(lambda a, b: a | b, [per_value[ctype](v) for v in values])


def match_rules(queries: DataFrame, ruleset: list[dict],
                metadata_default: str = "query_text") -> DataFrame:
    """(query_id, rule_ord) for every rule whose criteria ALL match the
    query's metadata. One JVM select over the queries frame: each rule
    is a Catalyst predicate; matched ordinals come out of one array
    explode (nulls filtered), so the rule count never multiplies the
    scan."""
    if not 0 < len(ruleset) <= MAX_RULES:
        raise ValueError(f"ruleset must have 1..{MAX_RULES} rules")
    ords = []
    for rule_ord, rule in enumerate(ruleset):
        crits = rule.get("criteria") or [{"type": "always"}]
        pred = reduce(
            lambda a, b: a & b,
            [_criterion_pred(
                F.col(c.get("metadata", metadata_default)),
                c["type"], c.get("values", []))
             for c in crits])
        ords.append(F.when(pred, F.lit(rule_ord)))
    return (
        queries.select(
            "query_id", F.explode(F.array(*ords)).alias("rule_ord"))
        .filter(F.col("rule_ord").isNotNull())
    )


def ruleset_budgets(ruleset: list[dict]) -> tuple[int, int]:
    """(total pinnable ids, total excludable ids) across the ruleset —
    the organic over-fetch budget: top-(k + excludable) is exact."""
    pins = sum(len(r.get("actions", []))
               for r in ruleset if r["type"] == "pinned")
    excs = sum(len(r.get("actions", []))
               for r in ruleset if r["type"] == "exclude")
    return pins, excs


def apply_query_rules(
    organic: DataFrame,
    queries: DataFrame,
    ruleset: list[dict],
    k: int,
    metadata_default: str = "query_text",
) -> DataFrame:
    """Apply a query ruleset to organic per-query results
    (query_id, doc_id, score): ES `rule` retriever semantics. Returns
    (query_id, rank, doc_id, score, pinned) cut to top-k per query.
    `organic` must carry at least top-(k + total excludable ids) per
    query for an exact answer (see module docstring)."""
    spark = organic.sparkSession
    rm = match_rules(queries, ruleset, metadata_default)

    pin_rows, exc_rows = [], []
    for rule_ord, rule in enumerate(ruleset):
        for action_ord, doc in enumerate(rule.get("actions", [])):
            if rule["type"] == "pinned":
                pin_rows.append((rule_ord, rule_ord * 1000 + action_ord,
                                 int(doc)))
            elif rule["type"] == "exclude":
                exc_rows.append((rule_ord, int(doc)))
            else:
                raise ValueError(f"unknown rule type {rule['type']!r}")

    qd = ["query_id", "doc_id"]
    excs = spark.createDataFrame(
        exc_rows or [(None, None)], "rule_ord int, doc_id long")
    excs = (rm.join(F.broadcast(excs.filter(F.col("doc_id").isNotNull())),
                    "rule_ord")
            .select(*qd).distinct())
    pins = spark.createDataFrame(
        pin_rows or [(None, None, None)],
        "rule_ord int, pin_ord int, doc_id long")
    pins = (rm.join(F.broadcast(pins.filter(F.col("doc_id").isNotNull())),
                    "rule_ord")
            .groupBy(*qd).agg(F.min("pin_ord").alias("pin_ord"))
            .join(excs, qd, "left_anti"))        # exclude wins over pin

    kept = (organic.select(*qd, "score")
            .join(F.broadcast(excs), qd, "left_anti")
            .join(F.broadcast(pins.select(*qd)), qd, "left_anti")
            .withColumn("pinned", F.lit(False)))
    pinned_rows = pins.select(
        *qd, (F.lit(PIN_BASE) - F.col("pin_ord")).alias("score"),
        F.lit(True).alias("pinned"))
    merged = kept.unionByName(pinned_rows)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select("query_id", "rank", "doc_id", "score", "pinned")
    )
