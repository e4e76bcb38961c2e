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


def _test_rerank(query, texts):
    """Deterministic fake reranker: distinct-token overlap fraction
    |tokens(query) ∩ tokens(text)| / |tokens(query)|, rounded to 6 —
    SQL-replayable so the RERANK gate hash-verifies the plumbing."""
    q = {t for t in _SPLIT.split(query.lower()) if t}

    def one(x):
        if x is None or not q:
            return None
        d = {t for t in _SPLIT.split(x.lower()) if t}
        return round(len(q & d) / len(q), 6)

    return texts.map(one)


RERANK_REGISTRY: dict[str, Callable] = {
    "test_rerank": _test_rerank,
}


def register_reranker(name: str, fn: Callable) -> None:
    """fn: (query: str, texts: pandas.Series[str]) ->
    pandas.Series[float] (batch API)."""
    RERANK_REGISTRY[name] = fn


def rerank(
    df: DataFrame,
    query: str,
    text_col: str,
    endpoint: str,
    out_col: str = "_score",
) -> DataFrame:
    """Add `out_col` = endpoint(query, text_col) — the ES|QL RERANK
    command's scoring half (ordering is the caller's SORT, matching
    ES|QL where RERANK emits scores and composes with SORT/LIMIT).
    Arrow-batched mapInPandas; at scale this runs AFTER a first-stage
    retrieval cut, so the per-row model cost touches only the rank
    window (the text_similarity_reranker shape)."""
    if endpoint not in RERANK_REGISTRY:
        raise ValueError(
            f"unknown rerank endpoint {endpoint!r}; registered: "
            f"{sorted(RERANK_REGISTRY)}")
    fn = RERANK_REGISTRY[endpoint]
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())])

    def gen(batches):
        for pdf in batches:
            pdf[out_col] = fn(query, pdf[text_col])
            yield pdf

    return df.mapInPandas(gen, schema)
