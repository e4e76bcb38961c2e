"""Labeled-span annotation QC — admission screening for NER/PII-style
training sets.

Span-labeled corpora (PII tagging, NER, grounding citations) routinely
arrive with corrupt offsets: spans past the end of a re-exported text,
reversed or empty intervals, spans cut through the middle of a token
(the classic tokenizer-mismatch bug between the labeling tool and the
training tokenizer), and double-labeled overlaps. Before such labels
train anything, a pipeline classifies every span.

The reference performs the same class of edge validation on documents
before indexing (reference: libs/connectors_sdk/connectors_sdk/
source.py document sanity checks); this operator is that screen for
span labels.

Checks per span (start/end are 0-based char offsets, end exclusive):
- in_bounds:      0 <= start < end <= len(text)
- token_aligned:  the span starts at a token start and ends at a token
                  end under the canonical analyzer's [A-Za-z0-9] token
                  class (char before start is a non-token char or BOS;
                  char at start is a token char; mirrored at end)
- overlapping:    intersects ANY earlier span of the same doc (sorted
                  by (start, end, label); running-max-of-end window,
                  doc-partitioned — never global)
- valid:          in_bounds AND token_aligned AND NOT overlapping

Shape: one doc-keyed equi-join to fetch text + one doc-partitioned
window; both scale with spans-per-doc, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["span_annotation_qc"]

_TOKCH = "[A-Za-z0-9]"


def span_annotation_qc(docs: DataFrame, spans: DataFrame,
                       doc_id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """-> (doc_id, start, end, label, in_bounds, token_aligned,
    overlapping, valid) for every span row."""
    t = docs.select(F.col(doc_id_col).alias("doc_id"),
                    F.col(text_col).alias("_text"))
    s = spans.select(F.col(doc_id_col).alias("doc_id"),
                     F.col("start").cast("int").alias("start"),
                     F.col("end").cast("int").alias("end"),
                     F.col("label").alias("label"))
    j = s.join(t, "doc_id")
    n = F.length("_text")
    in_bounds = ((F.col("start") >= 0) & (F.col("start") < F.col("end"))
                 & (F.col("end") <= n))
    # substring() is 1-based; guard all probes behind in_bounds
    ch_at_start = F.substring(F.col("_text"), F.col("start") + 1, 1)
    ch_before = F.substring(F.col("_text"), F.col("start"), 1)
    ch_last = F.substring(F.col("_text"), F.col("end"), 1)
    ch_after = F.substring(F.col("_text"), F.col("end") + 1, 1)
    aligned = (ch_at_start.rlike(_TOKCH)
               & ((F.col("start") == 0) | ~ch_before.rlike(_TOKCH))
               & ch_last.rlike(_TOKCH)
               & ((F.col("end") == n) | ~ch_after.rlike(_TOKCH)))
    token_aligned = F.when(in_bounds, aligned).otherwise(F.lit(False))
    # only structurally-sane spans participate in overlap accounting —
    # an out-of-bounds garbage span must not poison a later valid one
    j = j.withColumn("_ib", in_bounds)
    w = Window.partitionBy("doc_id").orderBy("start", "end", "label") \
        .rowsBetween(Window.unboundedPreceding, -1)
    prev_end = F.max(F.when(F.col("_ib"), F.col("end"))).over(w)
    overlapping = F.coalesce(prev_end > F.col("start"), F.lit(False))
    return j.select(
        "doc_id", "start", "end", "label",
        in_bounds.cast("int").alias("in_bounds"),
        token_aligned.cast("int").alias("token_aligned"),
        overlapping.cast("int").alias("overlapping"),
        (in_bounds & token_aligned & ~overlapping).cast("int")
        .alias("valid"))
