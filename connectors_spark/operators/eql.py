"""EQL (Event Query Language) sequence matching over keyed event streams.

The reference ecosystem ships EQL as its security-analytics query
language: ``sequence by key with maxspan=10m [A] [B] ... until [C]``
finds ordered chains of events sharing a join key, each stage matching
its own predicate, the whole chain inside a time window, with ``until``
events expiring in-progress chains (public semantics: Elastic EQL
docs / x-pack EQL sequence state machine; the connectors reference
feeds exactly these event streams into ES for EQL consumption).

Spark-first design — N window passes over ONE key shuffle:

- Events are hash-shuffled once on the join key and ordered by
  ``(ts, id)``.  Every per-stage computation below is a window over
  that SAME (partitionBy, orderBy), so Catalyst plans a single
  Exchange followed by one Sort and a chain of Window operators — no
  self-joins, no per-key cross products, linear in events.
- The matcher is the "last pending candidate" state machine: for each
  stage *i* event, the candidate is the MOST RECENT completed
  stage-(i-1) chain strictly before it (``last(..., ignorenulls)``
  over ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING``).  Because a
  chain's start time is monotone in its completion time, if the most
  recent candidate is expired (maxspan/until) every older one is too
  — keeping ONE candidate per stage is lossless for these checks and
  bounds state to O(stages) per event instead of the combinatorial
  all-chains set.  This mirrors EQL's own bounded sequence buffer.
- Output size is at most one chain per final-stage event (each
  completion consumes the most recent pending prefix), so the result
  never blows past the input cardinality.

Expiry semantics (documented contract, deterministic on ties):

- ``maxspan_sec``: a stage-*i* event at time ``t`` can only extend a
  chain whose FIRST event satisfies ``t - t1 <= maxspan`` (checked at
  every stage, so over-span chains die as early as EQL kills them).
- ``until``: an until event at time ``u`` expires every pending chain
  whose LATEST matched event is strictly before ``u``; chains whose
  last event ties ``u`` survive.  Until events are evaluated from
  strictly-preceding rows only.

Timestamps are compared as exact integer microseconds
(``unix_micros``), never floating seconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["eql_sequence", "eql_sequence_consuming", "eql_sample"]


def eql_sequence(
    events: DataFrame,
    stages: list[Column],
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    maxspan_sec: float | None = None,
    until: Column | None = None,
) -> DataFrame:
    """Match ``sequence by key [stages[0]] [stages[1]] ...`` and return
    one row per completed chain: ``key, ts_1, id_1, ..., ts_n, id_n``
    (timestamps reconstructed at microsecond precision).

    ``stages`` are boolean Columns over the event row (at least 2).
    ``maxspan_sec`` / ``until`` implement ``with maxspan=`` and
    ``until [..]`` with the expiry contract in the module docstring.

    **Divergence from Elastic EQL (documented contract):** this
    window-native matcher does NOT consume a matched prefix on
    completion — the most recent pending candidate survives, so K
    repeated final-stage events each emit a chain reusing the same
    earlier-stage events (``a b b`` yields two chains from the one
    ``a``).  Elastic's sequence state machine consumes pending state
    when a chain extends/completes, so a program ported verbatim from
    real EQL can see extra matches here.  Parity-sensitive callers
    should use :func:`eql_sequence_consuming`, which implements the
    consume-on-extension semantics exactly (at the cost of a per-key
    sequential pass instead of pure window algebra).
    """
    n = len(stages)
    if n < 2:
        raise ValueError("eql_sequence needs at least 2 stages")
    span_us = None if maxspan_sec is None else int(round(maxspan_sec * 1_000_000))

    cols = [
        F.col(key),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.col(id_col).alias("__id"),
        *(p.alias(f"__p{i}") for i, p in enumerate(stages)),
    ]
    if until is not None:
        cols.append(until.alias("__pu"))
    df = events.select(*cols)

    w = Window.partitionBy(key).orderBy("__t", "__id")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)

    if until is not None:
        df = df.withColumn(
            "__u", F.last(F.when(F.col("__pu"), F.col("__t")),
                          ignorenulls=True).over(prev))

    # Stage-1 completions: the event itself.
    df = df.withColumn("__c1_t1", F.when(F.col("__p0"), F.col("__t")))
    df = df.withColumn("__c1_i1", F.when(F.col("__p0"), F.col("__id")))

    for i in range(2, n + 1):
        fields = [f"t{j}" for j in range(1, i)] + [f"i{j}" for j in range(1, i)]
        # Most recent completed stage-(i-1) chain strictly before this
        # row.  All __c{i-1}_* fields are null/non-null together (they
        # come from the same completion row), so per-field last() picks
        # a consistent tuple.
        for f_ in fields:
            df = df.withColumn(
                f"__q{i}_{f_}",
                F.last(F.col(f"__c{i-1}_{f_}"), ignorenulls=True).over(prev))
        alive = F.col(f"__q{i}_t1").isNotNull() & F.col(f"__p{i-1}")
        if span_us is not None:
            alive = alive & (F.col("__t") - F.col(f"__q{i}_t1") <= F.lit(span_us))
        if until is not None:
            # pending chain's latest event is t{i-1}
            alive = alive & (
                F.col("__u").isNull()
                | (F.col("__u") <= F.col(f"__q{i}_t{i-1}")))
        for f_ in fields:
            df = df.withColumn(f"__c{i}_{f_}",
                               F.when(alive, F.col(f"__q{i}_{f_}")))
        df = df.withColumn(f"__c{i}_t{i}", F.when(alive, F.col("__t")))
        df = df.withColumn(f"__c{i}_i{i}", F.when(alive, F.col("__id")))

    out = df.filter(F.col(f"__c{n}_t1").isNotNull())
    sel = [F.col(key)]
    for j in range(1, n + 1):
        sel.append(F.timestamp_micros(F.col(f"__c{n}_t{j}")).alias(f"ts_{j}"))
        sel.append(F.col(f"__c{n}_i{j}").alias(f"id_{j}"))
    return out.select(*sel)


def eql_sequence_consuming(
    events: DataFrame,
    stages: list[Column],
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    maxspan_sec: float | None = None,
    until: Column | None = None,
) -> DataFrame:
    """``eql_sequence`` with Elastic's CONSUME-ON-EXTENSION semantics:
    the per-key state machine keeps at most one in-flight chain per
    stage (a newer stage-i match replaces the older — EQL's tail
    behavior, same as the window variant), and extending or completing
    a chain CONSUMES it, so ``a b b`` emits exactly one chain and the
    second ``b`` finds nothing pending.  This is the parity path for
    programs ported from real EQL (x-pack sequence state machine);
    the window variant documents its non-consuming divergence.

    Implementation: one hash shuffle on the join key, then a per-key
    sequential scan in ``applyInPandas`` (sequence consumption is
    inherently stateful — the key is the parallel unit, exactly how a
    1000-executor cluster would shard it; per-key event counts bound
    the sequential work).  Expiry semantics (maxspan from the FIRST
    event, until expiring strictly-older state, microsecond integer
    time, (ts, id) tie order) are identical to :func:`eql_sequence`.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    n = len(stages)
    if n < 2:
        raise ValueError("eql_sequence_consuming needs at least 2 stages")
    span_us = (None if maxspan_sec is None
               else int(round(maxspan_sec * 1_000_000)))

    cols = [
        F.col(key),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.col(id_col).alias("__id"),
        *(p.alias(f"__p{i}") for i, p in enumerate(stages)),
    ]
    cols.append((until if until is not None
                 else F.lit(False)).alias("__pu"))
    df = events.select(*cols)

    key_field = events.schema[key]
    id_type = events.schema[id_col].dataType
    # the UDF emits epoch MICROS (long), converted to timestamps
    # JVM-side below: naive pandas datetimes would be re-interpreted
    # by Arrow as session-local wall clock, shifting every ts_j by the
    # UTC offset whenever spark.sql.session.timeZone != UTC
    out_fields = [StructField(key, key_field.dataType)]
    for j in range(1, n + 1):
        out_fields.append(StructField(f"ts_{j}", LongType()))
        out_fields.append(StructField(f"id_{j}", id_type))
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def _match(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__t", "__id"], kind="mergesort")
        ts = pdf["__t"].to_numpy()
        ids = pdf["__id"].to_numpy()
        preds = [pdf[f"__p{i}"].fillna(False).to_numpy() for i in range(n)]
        untl = pdf["__pu"].fillna(False).to_numpy()
        kval = pdf[key].iloc[0]
        # pending[i] (1-based stage count) = the single in-flight chain
        # that has completed stages 1..i, as ([t1..ti], [i1..ii])
        pending: list = [None] * n
        out: list[list] = []
        for r in range(len(pdf)):
            t = int(ts[r])
            # extend longest-first so one event never rides the chain
            # it just extended (Elastic evaluates criteria per stage)
            for i in range(n - 1, 0, -1):
                if not preds[i][r] or pending[i] is None:
                    continue
                chain_t, chain_i = pending[i]
                if span_us is not None and t - chain_t[0] > span_us:
                    # over-span: every older candidate is too (start
                    # times monotone) — the chain is dead, drop it
                    pending[i] = None
                    continue
                pending[i] = None  # CONSUME on extension/completion
                ext = (chain_t + [t], chain_i + [ids[r]])
                if i == n - 1:
                    out.append([kval] + ext[0] + ext[1])
                else:
                    pending[i + 1] = ext  # newer replaces older (tail)
            if preds[0][r]:
                pending[1] = ([t], [ids[r]])
            if untl[r]:
                # until expires chains whose LATEST event is strictly
                # before it; ties survive (module expiry contract)
                for i in range(1, n):
                    if pending[i] is not None and pending[i][0][-1] < t:
                        pending[i] = None
        if not out:
            return pd.DataFrame({
                key: pd.Series(dtype=pdf[key].dtype),
                **{f"ts_{j}": pd.Series(dtype="int64")
                   for j in range(1, n + 1)},
                **{f"id_{j}": pd.Series(dtype=pdf["__id"].dtype)
                   for j in range(1, n + 1)},
            })[out_cols]
        recs = pd.DataFrame(
            [[row[0]]
             + [v for j in range(n) for v in (row[1 + j], row[1 + n + j])]
             for row in out],
            columns=out_cols)
        for j in range(1, n + 1):
            recs[f"ts_{j}"] = recs[f"ts_{j}"].astype("int64")
        return recs

    matched = df.groupBy(key).applyInPandas(_match, out_schema)
    return matched.select(
        key,
        *(c
          for j in range(1, n + 1)
          for c in (F.timestamp_micros(F.col(f"ts_{j}")).alias(f"ts_{j}"),
                    F.col(f"id_{j}"))))


def eql_sample(
    events: DataFrame,
    filters: list[tuple[str, Column]],
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """EQL ``sample by key`` analog: keys where EVERY filter matched at
    least once (no ordering/window constraint), returning the LATEST
    matching event per filter — one map-side-combinable groupBy, no
    window, no join.  ``filters`` are ``(name, predicate)`` pairs;
    output columns are ``key, ts_<name>, id_<name>, ...``.

    Ties on timestamp break by the highest ``id`` (max over the
    ``(ts, id)`` struct — deterministic and engine-portable).
    """
    df = events.select(
        F.col(key),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.col(id_col).alias("__id"),
        *(p.alias(f"__f_{name}") for name, p in filters),
    )
    aggs = []
    for name, _ in filters:
        best = F.max(F.when(F.col(f"__f_{name}"),
                            F.struct(F.col("__t"), F.col("__id"))))
        aggs.append(best.alias(f"__b_{name}"))
    g = df.groupBy(key).agg(*aggs)
    cond = None
    for name, _ in filters:
        c = F.col(f"__b_{name}").isNotNull()
        cond = c if cond is None else (cond & c)
    sel = [F.col(key)]
    for name, _ in filters:
        sel.append(F.timestamp_micros(
            F.col(f"__b_{name}.__t")).alias(f"ts_{name}"))
        sel.append(F.col(f"__b_{name}.__id").alias(f"id_{name}"))
    return g.filter(cond).select(*sel)
