"""Schemas: transcripts input, postings, lexicon, manifests.

The transcripts shape is fixed by the engine contract:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). Document identity is `doc_id = conv_id || ':' || turn_idx`,
mirroring the reference's composite message ids (reference:
app/connectors_service/connectors/sources/slack/datasource.py:205-207)
and its string-`_id` invariant (reference: app/connectors_service/
connectors/utils.py:794-800 sanitize()).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Uncompressed postings: one row per (term, doc).
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
    ]
)

# Encoded postings: one row per (term, shard); doc ids delta+varint packed.
ENCODED_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_shards", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),
        T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
        T.StructField("block_offsets", T.ArrayType(T.LongType()), False),
        T.StructField("block_tf_offsets", T.ArrayType(T.LongType()), False),
        T.StructField("block_dl_offsets", T.ArrayType(T.LongType()), False),
        T.StructField("block_pos_offsets", T.ArrayType(T.LongType()), True),
        T.StructField("block_max_w", T.ArrayType(T.DoubleType()), False),
    ]
)

LEXICON_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)

DOCMAP_SCHEMA = T.StructType(
    [
        T.StructField("doc_idx", T.LongType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)

# Per-partition build checkpoint rows — mirrors the reference's sync-job
# doc status machine + counters (reference: app/connectors_service/
# connectors/protocol/connectors.py:105-113, 84-93).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("cursor", T.StringType(), True),
    ]
)

# The "existing index" view used for diffs — mirrors
# yield_existing_documents_metadata (reference: app/connectors_service/
# connectors/es/management_client.py:191-212).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
