"""Access-control sync: identity-document extraction + ACL-index diff.

The reference runs a dedicated ACCESS_CONTROL sync job type alongside
content syncs: the source emits one permission document per identity
(reference: libs/connectors_sdk/connectors_sdk/source.py:582-589
get_access_control / access_control_query) and the sink syncs them into a
`.search-acl-filter-*` index with the same create/update/skip/delete diff
semantics as content docs (reference: app/connectors_service/connectors/
es/sink.py:826-856). Query side, content is filtered by intersecting a
document's `_allow_access_control` list with the caller's identities
(app/connectors_service/connectors/access_control.py:7-53 — the engine's
`dls_filter` gate).

Here the identity source is the event stream's user key: one permission
doc per user, `access_control = [user:<id>] + sorted activity groups`,
timestamped by latest activity, diffed against the ACL-index manifest by
the SAME classify_sync_ops the content path uses (operators/sync.py).
Every stage is JVM expression code; the groupBy(user_id) aggregation
combines map-side, so a 10^12-event log reduces to |users| rows before
the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connectors_spark.operators.sync import classify_sync_ops


def extract_identities(events: DataFrame) -> DataFrame:
    """(doc_id='user:<id>', access_control=array<string>, ts) — one
    permission document per identity, the get_access_control analog."""
    uid = F.concat(F.lit("user:"), F.col("user_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max("ts").alias("ts"),
            F.sort_array(
                F.collect_set(F.concat(F.lit("type:"), F.col("event_type")))
            ).alias("_groups"),
        )
        .select(
            uid.alias("doc_id"),
            F.concat(F.array(uid), F.col("_groups")).alias("access_control"),
            "ts",
        )
    )


def access_control_sync(identities: DataFrame, manifest: DataFrame) -> DataFrame:
    """(doc_id, op, access_control) — create/update/skip/delete for
    permission docs against the ACL-index manifest; deletes carry a NULL
    access list (they exist only in the manifest)."""
    ops = classify_sync_ops(
        identities.select("doc_id", "ts"), manifest.select("doc_id", "ts")
    )
    return ops.join(
        identities.select("doc_id", "access_control"), "doc_id", "left"
    ).select("doc_id", "op", "access_control")


def apply_fls(df: DataFrame, allowed_fields: list[str],
              always_visible: tuple = ("doc_id",)) -> DataFrame:
    """Field-level security: the ES FLS analog of the DLS row filter
    (reference grants field_security alongside DLS in role definitions;
    DLS analog entry_queries.q_dls_filter). ES omits ungranted fields
    from _source; in a fixed-schema DataFrame the equivalent is masking
    them to NULL — the SCHEMA stays stable for downstream plans while
    the values are withheld. Pure projection: zero shuffle, column
    pruning still reaches the scan for fully-masked columns when
    downstream projections drop them."""
    keep = set(allowed_fields) | set(always_visible)
    cols = [
        F.col(c) if c in keep
        else F.lit(None).cast(df.schema[c].dataType).alias(c)
        for c in df.columns
    ]
    return df.select(*cols)
