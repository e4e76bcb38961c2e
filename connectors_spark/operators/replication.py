"""Cross-cluster-replication follower apply: last-write-wins op-log
replay from a seq_no checkpoint.

Public Elasticsearch CCR shape (docs: "Cross-cluster replication"): a
follower index tails the leader's operation history by sequence
number — each op is (seq_no, _id, op_type, source) — and applies ops
with seq_no greater than its local checkpoint, idempotently, so a
retried batch converges to the same state.  The reference connector
framework leans on the same primitive for its sync cursors
(`connectors/sync_job_runner.py` cursor resume; `connectors/es/sink.py`
last-write-wins bulk).

Spark-first shape:

* The op log is a DataFrame ``(seq_no:int64, id, op_type, payload…)``.
  ``follower_apply(base, ops, checkpoint)`` filters ``seq_no >
  checkpoint`` (a pushed-down range predicate — at scale the op log is
  partitioned on seq_no so old history is partition-pruned, the exact
  analog of the leader only retaining soft-deletes history), reduces
  the batch to one winner per id with ``max_by`` (map-side-combinable
  aggregate, ONE shuffle on id — not a row_number window, which cannot
  partial-aggregate), then outer-merges with the follower base
  (batch wins; ``delete`` winners drop the row).
* Idempotence/convergence invariant (the CCR contract): replaying from
  ANY checkpoint over the matching base equals a full-log replay from
  zero.  The gate pins exactly this equivalence against a DuckDB
  window oracle.

Determinism: ties on seq_no (should not happen on a real leader, where
seq_no is unique) break by op_type desc then payload — explicit, like
every other tie-break in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE = "delete"


def _winners(ops: DataFrame, id_col: str, seq_col: str,
             op_col: str) -> DataFrame:
    """One winning op per id: max_by over (seq_no, op_type, payload).

    ``max_by(struct(all), struct(order))`` partial-aggregates map-side
    (each task keeps one candidate per id before the shuffle), so a
    hot id — one document rewritten millions of times — costs one row
    per task, not a skewed window partition.
    """
    order = F.struct(
        F.col(seq_col),
        F.col(op_col),  # deterministic tie-break; real seq_nos are unique
        *[F.col(c) for c in ops.columns if c not in (id_col, seq_col, op_col)],
    )
    payload = F.struct(*[F.col(c) for c in ops.columns])
    won = (ops.groupBy(id_col)
              .agg(F.max_by(payload, order).alias("_w")))
    return won.select(*[F.col(f"_w.{c}").alias(c) for c in ops.columns])


def follower_apply(base: DataFrame, ops: DataFrame, checkpoint: int,
                   id_col: str = "id", seq_col: str = "seq_no",
                   op_col: str = "op_type") -> DataFrame:
    """Apply leader ops with ``seq_no > checkpoint`` onto the follower
    base state; returns the new follower state (same schema as base:
    op_col dropped, one row per live id).

    base must be the exact follower state at `checkpoint` (every op
    ≤ checkpoint applied).  Re-applying an already-applied suffix is
    harmless: last-write-wins makes the merge idempotent.
    """
    batch = ops.where(F.col(seq_col) > F.lit(checkpoint))  # pushed down
    won = _winners(batch, id_col, seq_col, op_col)
    # Outer merge, batch wins. Broadcast is wrong here in general (both
    # sides are corpus-scale); a plain shuffled join on id is the shape,
    # and at 100 TB base+ops bucketed on id makes it shuffle-free.
    keep_cols = [c for c in base.columns]
    batch_live = (won.where(F.col(op_col) != DELETE)
                     .select(*[F.col(c) for c in keep_cols]))
    batch_ids = won.select(id_col)
    survived = base.join(batch_ids, on=id_col, how="left_anti")
    return survived.unionByName(batch_live)


def bootstrap_state(ops: DataFrame, upto: int | None = None,
                    id_col: str = "id", seq_col: str = "seq_no",
                    op_col: str = "op_type") -> DataFrame:
    """Full-log replay (leader-side truth): last-write-wins per id over
    ops with seq_no ≤ upto (all ops when upto is None), deletes dropped.
    This is the follower's remote-recovery bootstrap — in ES CCR terms,
    the snapshot copy phase before op tailing starts."""
    scoped = ops if upto is None else ops.where(F.col(seq_col) <= F.lit(upto))
    won = _winners(scoped, id_col, seq_col, op_col)
    return (won.where(F.col(op_col) != DELETE)
               .drop(op_col))
