"""ES inference API analog: registered endpoints + ES|QL COMPLETION.

ES routes `semantic_text`, rerankers and the ES|QL `COMPLETION` command
through registered inference endpoints (`PUT _inference/<task>/<id>`).
No model server exists in this sandbox, so endpoints are a REGISTRY of
batch text -> text functions and the default `test_completion` endpoint
is a deterministic prompt summarizer — the same declared-stub
convention as the compressed-codec decoders (operators/multimodal.py):
the Spark-side plumbing (Arrow-batched mapInPandas, schema widening,
batch shape, registry dispatch) is the real artifact; swap in a real
client by registering it.

Scale shape: inference is the textbook Pandas-UDF case — per-row
Python is unavoidable (network/model call), so it runs Arrow-batched
via mapInPandas, one call per batch, no driver loop; the added column
widens the schema without reordering partitions, so downstream
operators keep their partitioning.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from connectors_spark import TOKEN_SPLIT_RE

_SPLIT = re.compile(TOKEN_SPLIT_RE)


def _test_completion(prompts):
    """Deterministic fake: 'completion: ' + first 6 tokens of the
    normalized prompt — chosen to be exactly replayable in SQL so the
    gate hash-verifies the PLUMBING end-to-end."""
    def one(p):
        if p is None:
            return None
        toks = [t for t in _SPLIT.split(p.lower()) if t][:6]
        return "completion: " + " ".join(toks)

    return prompts.map(one)


INFERENCE_REGISTRY: dict[str, Callable] = {
    "test_completion": _test_completion,
}


def register_endpoint(name: str, fn: Callable) -> None:
    """fn: pandas.Series[str] -> pandas.Series[str] (batch API)."""
    INFERENCE_REGISTRY[name] = fn


def complete(
    df: DataFrame,
    prompt_col: str,
    endpoint: str,
    out_col: str = "completion",
) -> DataFrame:
    """Add `out_col` = endpoint(prompt_col) via Arrow-batched
    mapInPandas (ES|QL COMPLETION / inference ingest processor)."""
    if endpoint not in INFERENCE_REGISTRY:
        raise ValueError(
            f"unknown inference endpoint {endpoint!r}; registered: "
            f"{sorted(INFERENCE_REGISTRY)}")
    fn = INFERENCE_REGISTRY[endpoint]
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType())])

    def gen(batches):
        for pdf in batches:
            pdf[out_col] = fn(pdf[prompt_col])
            yield pdf

    return df.mapInPandas(gen, schema)
