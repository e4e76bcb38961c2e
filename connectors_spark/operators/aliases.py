"""ES index aliases: filtered members, write index, rollover, alias search.

Reference parity: the reference manages content indices behind names and
swaps them without client changes (index management in
app/connectors_service/connectors/es/management_client.py; ES-side the
`_aliases` API applies add/remove actions atomically and a filtered alias
restricts the visible doc set at query time WITHOUT changing index-wide
term statistics). This module is the engine-side catalog:

- `AliasRegistry.update_aliases(actions)` — the ES `_aliases` action list
  (`[{"add": {...}}, {"remove": {...}}]`), applied all-or-nothing by
  building the next catalog dict and swapping the reference once, so a
  reader never observes a half-applied action set (same contract as the
  serving store's CURRENT pointer in operators/delta.py).
- one `is_write_index` member per alias (ES invariant, validated).
- `rollover(alias, new_index, conditions, stats)` — ES rollover: if any
  max_docs / max_size_bytes / max_age_days condition is met, the write
  flag moves to `new_index` in the same atomic swap.
- `alias_topk(members_scored, k)` — cross-index search merge: each member
  index scores with ITS OWN corpus statistics (ES default
  query_then_fetch: per-shard/per-index df, merged by score), alias
  filters apply to the candidate set post-scoring (filter context never
  changes idf), then one rank window PARTITIONED by query merges the
  per-member top-k lists. Feed it per-member top-k frames (members are
  disjoint doc sets, so the union of per-member top-k is a superset of
  the global top-k) — the merge input stays bounded at G·k rows per
  query at any corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AliasMember:
    index: str
    filter_sql: str | None = None
    is_write_index: bool = False


@dataclass
class AliasRegistry:
    _aliases: dict[str, tuple[AliasMember, ...]] = field(default_factory=dict)

    def members(self, alias: str) -> tuple[AliasMember, ...]:
        if alias not in self._aliases:
            raise KeyError(f"unknown alias {alias!r}")
        return self._aliases[alias]

    def write_index(self, alias: str) -> str:
        ms = [m for m in self.members(alias) if m.is_write_index]
        if not ms:
            raise ValueError(f"alias {alias!r} has no write index")
        return ms[0].index

    def update_aliases(self, actions: list[dict]) -> None:
        """Apply an ES `_aliases` action list atomically: every action
        validates against a scratch copy; the registry reference swaps
        once at the end, so failures leave the catalog untouched and
        readers never see a partial action set."""
        nxt = {a: list(ms) for a, ms in self._aliases.items()}
        for act in actions:
            if len(act) != 1:
                raise ValueError(f"action must be one {{verb: params}}, "
                                 f"got {sorted(act)}")
            (verb, p), = act.items()
            if verb == "add":
                ms = nxt.setdefault(p["alias"], [])
                ms[:] = [m for m in ms if m.index != p["index"]]
                ms.append(AliasMember(
                    index=p["index"],
                    filter_sql=p.get("filter"),
                    is_write_index=p.get("is_write_index", False),
                ))
            elif verb == "remove":
                ms = nxt.get(p["alias"], [])
                if not any(m.index == p["index"] for m in ms):
                    raise KeyError(
                        f"alias {p['alias']!r} has no member {p['index']!r}")
                ms[:] = [m for m in ms if m.index != p["index"]]
                if not ms:
                    del nxt[p["alias"]]
            else:
                raise ValueError(f"unknown alias action {verb!r}")
        for a, ms in nxt.items():
            if sum(m.is_write_index for m in ms) > 1:
                raise ValueError(f"alias {a!r} would have two write indices")
        self._aliases = {a: tuple(ms) for a, ms in nxt.items()}

    def rollover(self, alias: str, new_index: str, conditions: dict,
                 stats: dict) -> bool:
        """ES rollover: if any met condition (max_docs / max_size_bytes /
        max_age_days vs the write index's `stats`), atomically move the
        write flag to `new_index`. Returns whether it rolled."""
        met = (
            stats.get("docs", 0) >= conditions.get("max_docs", float("inf"))
            or stats.get("size_bytes", 0)
            >= conditions.get("max_size_bytes", float("inf"))
            or stats.get("age_days", 0)
            >= conditions.get("max_age_days", float("inf"))
        )
        if not met:
            return False
        old = self.write_index(alias)
        ms = [replace(m, is_write_index=False) if m.index == old else m
              for m in self.members(alias)]
        ms.append(AliasMember(index=new_index, is_write_index=True))
        self._aliases = {**self._aliases, alias: tuple(ms)}
        return True


def alias_topk(members_scored: list[tuple[str, DataFrame]], k: int,
               round_scores: int | None = None) -> DataFrame:
    """Merge per-member scored frames (query_id, doc_id, score) into the
    alias-level top-k: tag each frame with its member index name, union,
    round (so engine float-sum order cannot flip a rank), then one rank
    window PARTITIONED by query_id — never a global window. Callers pass
    per-member top-k-bounded frames; the merge is G·k rows per query."""
    tagged = None
    for name, df in members_scored:
        t = df.select(
            "query_id", "doc_id", "score",
            F.lit(name).alias("member"))
        tagged = t if tagged is None else tagged.unionByName(t)
    if round_scores is not None:
        tagged = tagged.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        tagged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "doc_id", "member", "score")
    )
