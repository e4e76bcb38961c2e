"""Cursor-paginated API source (S8) with resumable checkpoints.

The reference pages external APIs by passing each response's end-cursor
into the next request (reference: app/connectors_service/connectors/
sources/github/query.py:21-64 pageInfo.hasNextPage/endCursor; generic
GraphQL pagination app/connectors_service/connectors/sources/graphql/
datasource.py:131-149). A cursor API is inherently SEQUENTIAL — each
request needs the previous response — so the reference drains it in one
async loop; parallelism there comes from running whole connectors side
by side, never from splitting one cursor stream.

The Spark-first version keeps the unavoidable sequential pull on the
driver but makes everything after the network hop scale and survive:

- pages are buffered only up to `rows_per_spill`, then spilled as a
  parquet part file — driver memory is one-spill-bounded no matter how
  long the stream is;
- after every spill the cursor is persisted atomically (same delta-link
  semantics as plans/checkpoint.py, S10): a crash resumes from the last
  spilled cursor instead of page zero;
- the returned DataFrame is a plain parquet scan of the spill dir, so
  downstream transformations distribute, prune and push down normally.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from connectors_spark import commitfs

# fetch_page(cursor | None) -> (rows, next_cursor | None)
FetchPage = Callable[[str | None], tuple[Iterable[dict], str | None]]

_CURSOR_FILE = "cursor.json"

# the reference's retry policy defaults: 5 tries, linear backoff
# (reference: app/connectors_service/connectors/utils.py retryable /
# svc/utils.py:383-502 — RetryStrategy.LINEAR_BACKOFF, retries=5)
RETRIES = 5
BACKOFF_BASE_SEC = 1.0


def _fetch_with_retry(fetch_page: FetchPage, cursor: str | None,
                      retries: int, backoff_base: float,
                      sleep=time.sleep):
    """One page pull under the reference's linear-backoff retry policy:
    attempt i sleeps i * backoff_base before retrying; the final failure
    re-raises. The cursor is NOT advanced by failed attempts, so a retry
    re-requests the same page (cursor APIs are idempotent per cursor)."""
    for attempt in range(retries):
        try:
            return fetch_page(cursor)
        except Exception:
            if attempt == retries - 1:
                raise
            sleep((attempt + 1) * backoff_base)


def _read_cursor(path: str) -> dict | None:
    f = os.path.join(path, _CURSOR_FILE)
    if not os.path.exists(f):
        return None
    with open(f) as fh:
        return json.load(fh)


def _write_cursor(path: str, state: dict) -> None:
    commitfs.put_json_atomic(os.path.join(path, _CURSOR_FILE), state)


def read_paged(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema: str,
    spill_dir: str,
    rows_per_spill: int = 50_000,
    retries: int = RETRIES,
    backoff_base_sec: float = BACKOFF_BASE_SEC,
    _sleep=time.sleep,
) -> DataFrame:
    """Drain a cursor-paginated API into a distributed DataFrame.

    Resumable: if `spill_dir` already holds a cursor checkpoint, pulling
    restarts from that cursor and appends new part files; already-spilled
    parts are never re-fetched. A stream that previously finished
    (cursor state 'done') is returned as-is without touching the API.
    Transient fetch failures retry under the reference's linear-backoff
    policy (`retries` tries); a page that keeps failing raises after the
    last try with the cursor checkpoint still pointing at it, so a later
    run resumes exactly there.
    """
    os.makedirs(spill_dir, exist_ok=True)
    state = _read_cursor(spill_dir) or {"cursor": None, "parts": 0, "done": False}

    if not state["done"]:
        buf: list[dict] = []
        cursor = state["cursor"]

        def spill(final: bool) -> None:
            nonlocal buf
            if buf:
                part = os.path.join(spill_dir, f"part-{state['parts']:05d}")
                spark.createDataFrame(buf, schema).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(part)
                state["parts"] += 1
                buf = []
            state["cursor"] = cursor
            state["done"] = final
            _write_cursor(spill_dir, state)

        while True:
            rows, cursor = _fetch_with_retry(
                fetch_page, cursor, retries, backoff_base_sec, _sleep
            )
            buf.extend(rows)
            if cursor is None:
                spill(final=True)
                break
            if len(buf) >= rows_per_spill:
                spill(final=False)

    parts = [os.path.join(spill_dir, d) for d in sorted(os.listdir(spill_dir))
             if d.startswith("part-")]
    if not parts:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*parts)
