"""semantic_chunk_topk vs a NumPy oracle; terms_lookup_filter semantics + plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.joins import terms_lookup_filter
from connectors_spark.operators.similarity import semantic_chunk_topk

N, DIM, CPD, K = 200, 16, 4, 5


@pytest.fixture(scope="module")
def chunk_np():
    rng = np.random.RandomState(23)
    return rng.randn(N, DIM).astype(np.float32)


@pytest.fixture(scope="module")
def chunks(spark, chunk_np):
    rows = [(i, chunk_np[i].tolist()) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _oracle(chunk_np, qids, k):
    v = chunk_np.astype(np.float64)
    norms = np.sqrt((v * v).sum(axis=1))
    out = {}
    for qi in qids:
        cos = np.round(v @ v[qi] / (norms * norms[qi]), 6)
        doc_best = {}
        for i, c in enumerate(cos):
            d = i // CPD
            if d == qi // CPD:
                continue
            doc_best[d] = max(doc_best.get(d, -2.0), c)
        cand = sorted(doc_best.items(), key=lambda t: (-t[1], t[0]))
        out[qi] = cand[:k]
    return out


def test_semantic_chunk_topk_matches_oracle(spark, chunks, chunk_np):
    qids = [0, 37, 111]
    qs = chunks.filter(F.col("vec_id").isin(qids))
    got = semantic_chunk_topk(chunks, qs, chunks_per_doc=CPD, k=K).collect()
    exp = _oracle(chunk_np, qids, K)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(qids)
    for qi in qids:
        rows = sorted(by_q[qi], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in exp[qi]]
        for r, (_, c) in zip(rows, exp[qi]):
            assert r.score == pytest.approx(c, abs=2e-6)
        # own doc never appears
        assert qi // CPD not in {r.doc_id for r in rows}


def test_semantic_doc_score_is_max_over_chunks(spark):
    # doc 0 = query's own doc; doc 1 has one near-parallel chunk among
    # orthogonal ones -> doc 1's score must be the near-parallel chunk's.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),   # doc 1, chunk 0 (orthogonal)
        (3, [1.0, 0.1, 0.0, 0.0]),   # doc 1, chunk 1 (near-parallel)
        (4, [0.0, 0.0, 0.0, 1.0]),   # doc 2
        (5, [0.0, -1.0, 0.0, 0.0]),  # doc 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") == 0)
    got = semantic_chunk_topk(df, qs, chunks_per_doc=2, k=2).collect()
    got.sort(key=lambda r: r.rank)
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].score == pytest.approx(1.0 / np.sqrt(1.01), abs=1e-6)
    assert got[1].score == pytest.approx(0.0, abs=1e-6)


def test_terms_lookup_filter_semantics_and_plan(spark):
    corpus = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4]) for i in range(40)],
        "row_id long, tag string",
    )
    lookup = spark.createDataFrame(
        [("b",), ("d",), ("b",), (None,)], "term string"
    )
    out = terms_lookup_filter(corpus, lookup, "tag", lookup_field="term")
    rows = out.collect()
    assert len(rows) == 20
    assert {r.tag for r in rows} == {"b", "d"}
    # duplicate lookup terms must not duplicate corpus rows (semi join)
    assert len({r.row_id for r in rows}) == 20
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
