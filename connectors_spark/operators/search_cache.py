"""ES shard request cache analog: memoize full search responses keyed
by (index generation, normalized request), invalidated by ANY write.

Reference context: Elasticsearch's request cache stores whole query
responses per shard and keys them by the request body; the cache is
invalidated when the shard refreshes with changes, never by clock time
(docs: shard-request-cache). The store here (operators/delta.py) gives
the same invalidation signal for free: the CURRENT pointer plus the
delta-generation chain change on every visible write (incremental
update, delete/update_by_query, compaction promote), so a version tuple
of (resolved generation dir, delta gen ids) is exact — a cached entry
can never serve stale results, and compaction (which preserves results)
costs one rebuildable miss, as in ES.

The reader itself is also version-pinned: one IndexReader per version
is reused across queries (its persisted postings frames are the
"segment-level" warm state), and replaced when the version moves —
an open reader keeps answering its own point in time, mirroring the
IndexReader PIT contract.
"""

from __future__ import annotations

import json
from collections import OrderedDict

from pyspark.sql import SparkSession

from connectors_spark.operators.delta import resolve_current
from connectors_spark.operators.index import IndexReader, read_meta


class RequestCache:
    """LRU response cache over an index dir or serving store."""

    def __init__(self, spark: SparkSession, path: str, capacity: int = 128):
        self.spark = spark
        self.path = path
        self.capacity = int(capacity)
        self._entries: OrderedDict = OrderedDict()
        self._reader: IndexReader | None = None
        self._reader_version = None
        self.hits = 0
        self.misses = 0

    def version(self) -> tuple:
        """Exact write watermark: generation dir + delta chain."""
        cur = resolve_current(self.path)
        meta = read_meta(cur)
        return (cur, tuple(int(d["gen"]) for d in meta.get("deltas", [])))

    def _reader_for(self, ver: tuple) -> IndexReader:
        if self._reader is None or self._reader_version != ver:
            self._reader = IndexReader(self.spark, self.path, cache=True)
            self._reader_version = ver
        return self._reader

    def topk(self, queries: list[dict], **kw) -> list:
        """Cached IndexReader.topk: returns the collected rows. The
        request key is the canonical JSON of (queries, kernel kwargs) —
        ES's request-body keying."""
        ver = self.version()
        key = (ver, json.dumps(queries, sort_keys=True),
               json.dumps(kw, sort_keys=True))
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        rows = self._reader_for(ver).topk(queries, **kw).collect()
        self._entries[key] = rows
        while len(self._entries) > self.capacity:
            self._entries.popitem(last=False)
        return rows

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "entries": len(self._entries)}
