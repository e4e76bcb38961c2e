"""Custom stateful streaming operator: the ErrorMonitor as live state.

The reference's ErrorMonitor is inherently stateful and sequential PER
SYNC JOB (consecutive-error counter, running total, fixed-size circular
error window — reference: app/connectors_service/connectors/utils.py:
827-923; thresholds config.py:82-89). Batch-side the engine evaluates it
with hash-partitioned windows (entry_queries error_budget); stream-side
the same contract becomes an `applyInPandasWithState` operator: one
state cell per stream key carried across micro-batches, parallel ACROSS
streams, sequential within a stream — exactly the reference's execution
model (one asyncio worker per connector), but resumable from the
streaming checkpoint and scaled out by Spark's state store.

The per-row loop inside the state function mirrors the reference's
per-operation loop; it is the semantics, not a shortcut — the monitor's
consecutive counter cannot be vectorized across a batch boundary without
changing abort timing.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame

MAX_CONSECUTIVE = 10   # config.py:82-89
MAX_TOTAL = 1000
MAX_RATE = 0.15
WINDOW_SIZE = 100

_OUT_SCHEMA = ("user_id long, n_ops long, consec long, total_errors long, "
               "rate double, tripped boolean")
_STATE_SCHEMA = ("consec long, total long, n_ops long, win array<boolean>, "
                 "idx int, win_count int, tripped boolean")


def streaming_error_monitor(
    events: DataFrame,
    max_consecutive: int = MAX_CONSECUTIVE,
    max_total: int = MAX_TOTAL,
    max_rate: float = MAX_RATE,
    window_size: int = WINDOW_SIZE,
) -> DataFrame:
    """Streaming DataFrame (user_id, n_ops, consec, total_errors, rate,
    tripped): one row per stream per micro-batch with the monitor state
    after that batch. `tripped` latches (the reference raises and kills
    the sync; a latched flag is the stream analog)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            consec, total, n_ops, win, idx, win_count, tripped = state.get
            win = list(win)
        else:
            consec, total, n_ops = 0, 0, 0
            win, idx, win_count = [False] * window_size, 0, 0
            tripped = False
        # applyInPandasWithState splits a large group into multiple Arrow
        # chunks (arrow.maxRecordsPerBatch) with NO cross-chunk ordering
        # guarantee — concat all chunks and sort ONCE, otherwise the
        # consecutive-error counter is wrong for groups >1 chunk.
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for is_err in (pdf["event_type"] == "error").tolist():
                n_ops += 1
                if is_err:
                    total += 1
                    consec += 1
                else:
                    consec = 0
                if win[idx] != is_err:
                    win_count += 1 if is_err else -1
                    win[idx] = is_err
                idx = (idx + 1) % window_size
                if is_err and not tripped:
                    rate = win_count / window_size
                    tripped = (consec > max_consecutive or total > max_total
                               or rate > max_rate)
        state.update((consec, total, n_ops, win, idx, win_count, tripped))
        yield pd.DataFrame([{
            "user_id": key[0], "n_ops": n_ops, "consec": consec,
            "total_errors": total, "rate": win_count / window_size,
            "tripped": tripped,
        }])

    return events.groupBy("user_id").applyInPandasWithState(
        update, _OUT_SCHEMA, _STATE_SCHEMA, "Update",
        GroupStateTimeout.NoTimeout,
    )


_SESS_OUT = ("user_id long, session_no long, n_events long, "
             "duration_sec long, total_value double, closed boolean")
_SESS_STATE = ("session_no long, first_ts double, last_ts double, "
               "n_events long, total_value double")


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_flush_minutes: float | None = None,
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful twin of the
    batch `sessionize` gate: per user, a session closes after
    `gap_minutes` idle (event-time gap within the stream). Emits one
    row per session TOUCHED in a micro-batch; `closed=True` rows are
    final, `closed=False` rows are the live session's running state —
    the Update-mode contract a downstream sink compacts on.

    `idle_flush_minutes` additionally arms a processing-time GroupState
    timeout that seals a silent user's LAST session. It is opt-in and
    meant for continuously-running streams: with trigger(availableNow)
    a pending processing-time timeout keeps the trigger alive
    ("no new data but cleaning up state" forever), so batch-style
    drains must leave it None.

    Same execution model as streaming_error_monitor: one state cell per
    user, parallel across users via the state store, sequential within
    a user (sessionization is order-dependent by definition; chunks are
    concatenated and sorted ONCE per the cross-chunk rule)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = float(gap_minutes) * 60.0
    flush_ms = (None if idle_flush_minutes is None
                else int(idle_flush_minutes * 60_000))

    def update(key, pdfs, state: GroupState):
        out = []
        if state.hasTimedOut:
            if state.exists:
                sno, fts, lts, n, tv = state.get
                out.append({"user_id": key[0], "session_no": sno,
                            "n_events": n,
                            "duration_sec": int(round(lts - fts)),
                            "total_value": tv, "closed": True})
            state.remove()
            yield pd.DataFrame(out, columns=[
                "user_id", "session_no", "n_events", "duration_sec",
                "total_value", "closed"])
            return
        if state.exists:
            sno, fts, lts, n, tv = state.get
        else:
            sno, fts, lts, n, tv = 0, None, None, 0, 0.0
        chunks = list(pdfs)
        pdf = (pd.concat(chunks, ignore_index=True)
               if len(chunks) > 1 else chunks[0])
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, val in zip(
            pdf["ts"].astype("datetime64[ns]").astype("int64") / 1e9,
            pdf["value"].tolist(),
        ):
            if fts is not None and ts - lts > gap:
                out.append({"user_id": key[0], "session_no": sno,
                            "n_events": n,
                            "duration_sec": int(round(lts - fts)),
                            "total_value": tv, "closed": True})
                sno, fts, n, tv = sno + 1, ts, 0, 0.0
            if fts is None:
                fts = ts
            lts = ts
            n += 1
            tv += float(val)
        state.update((sno, fts, lts, n, tv))
        if flush_ms is not None:
            state.setTimeoutDuration(flush_ms)
        out.append({"user_id": key[0], "session_no": sno, "n_events": n,
                    "duration_sec": int(round(lts - fts)),
                    "total_value": tv, "closed": False})
        yield pd.DataFrame(out)

    timeout_conf = (GroupStateTimeout.NoTimeout if flush_ms is None
                    else GroupStateTimeout.ProcessingTimeTimeout)
    return events.groupBy("user_id").applyInPandasWithState(
        update, _SESS_OUT, _SESS_STATE, "Update", timeout_conf,
    )
