"""Tests for the round-4 API-tail gates: pipeline aggs (derivative /
serial_diff / bucket_sort), _msearch batching, _field_caps,
_mtermvectors and the span-query family. The DuckDB oracle gates pin
values end-to-end; these tests pin the semantics that the hash compare
can't isolate (paging boundaries, anti-join exclusion windows, plan
shape of the batched search)."""

from pyspark.sql import functions as F

from connectors_spark.entry_queries import (
    _MSEARCH_SPECS,
    _MTV_DOC_IDS,
    q_bucket_sort_agg,
    q_derivative_agg,
    q_field_caps,
    q_msearch,
    q_mtermvectors,
    q_serial_diff_agg,
    q_span_first_query,
    q_span_not_query,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_derivative_first_bucket_null(spark, sf_dir):
    rows = q_derivative_agg(spark, sf_dir).orderBy("day").collect()
    assert rows[0]["deriv"] is None, "ES derivative emits no first value"
    for prev, cur in zip(rows, rows[1:]):
        assert abs(cur["deriv"] - (cur["total"] - prev["total"])) < 1e-6


def test_serial_diff_lag7_null_head(spark, sf_dir):
    rows = q_serial_diff_agg(spark, sf_dir).orderBy("day").collect()
    assert all(r["diff7"] is None for r in rows[:7])
    if len(rows) > 7:
        assert rows[7]["diff7"] == rows[7]["n"] - rows[0]["n"]


def test_bucket_sort_paging_skips_from_buckets(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full = (ev.groupBy("event_type")
            .agg(F.round(F.sum("value"), 3).alias("total"))
            .orderBy(F.desc("total"), F.asc("event_type"))
            .collect())
    paged = q_bucket_sort_agg(spark, sf_dir).collect()
    want = [r["event_type"] for r in full[2:7]]
    assert [r["event_type"] for r in paged] == want


def test_msearch_specs_broadcast_no_sort_merge(spark, sf_dir):
    plan = _plan(q_msearch(spark, sf_dir))
    assert "BroadcastExchange" in plan
    out = {r["query_id"]: r for r in q_msearch(spark, sf_dir).collect()}
    # every spec with any hit appears once; lang filter shrinks m0 vs m2
    assert set(out) <= {q for q, _, _ in _MSEARCH_SPECS}
    for r in out.values():
        assert r["n_hits"] >= 1 and r["max_tf"] >= 1


def test_field_caps_one_row_per_field(spark, sf_dir):
    rows = q_field_caps(spark, sf_dir).collect()
    by_field = {r["field"]: r for r in rows}
    assert len(rows) == len(by_field) == 6
    assert by_field["props"]["aggregatable"] == 0
    assert by_field["event_type"]["aggregatable"] == 1
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert by_field["event_id"]["non_null"] == ev.count()


def test_mtermvectors_only_requested_docs(spark, sf_dir):
    rows = q_mtermvectors(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} <= set(_MTV_DOC_IDS)
    for r in rows:
        assert r["ttf"] >= r["df"] >= 1 and r["ttf"] >= r["tf"] >= 1


def test_span_first_respects_position_bound(spark, sf_dir):
    rows = q_span_first_query(spark, sf_dir).collect()
    assert rows, "corpus contains 'table' in a head position"
    assert all(0 <= r["first_pos"] < 5 for r in rows)


def test_span_not_excludes_near_positions(spark):
    docs = spark.createDataFrame(
        [(1, "table near scan"),          # table at 0, scan at 2 -> excluded
         (2, "table alpha beta gamma scan"),  # scan at 4, dist 4 -> kept
         (3, "table only here")],         # no scan -> kept
        "doc_id long, text string")
    import connectors_spark.entry_queries as eq
    toks = eq.tokenize(docs, "text", "doc_id")
    t0 = toks.filter(F.col("term") == "table").select(
        "doc_id", F.col("pos").alias("p0"))
    t1 = toks.filter(F.col("term") == "scan").select(
        F.col("doc_id").alias("_d"), F.col("pos").alias("p1"))
    kept = t0.join(
        t1, (t0.doc_id == t1._d)
        & (F.abs(F.col("p1") - F.col("p0")) <= 2), "left_anti")
    got = {r["doc_id"] for r in kept.collect()}
    assert got == {2, 3}


def test_span_not_gate_runs(spark, sf_dir):
    n = q_span_not_query(spark, sf_dir).count()
    first = q_span_first_query(spark, sf_dir).count()
    assert n >= 0 and first >= 0


def test_ks_stat_bounds_and_argmax(spark, sf_dir):
    from connectors_spark.entry_queries import q_bucket_count_ks_test
    row = q_bucket_count_ks_test(spark, sf_dir).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["ks_day"].startswith("2024-01-")


def test_reranker_window_subset_and_order(spark, sf_dir):
    from connectors_spark.entry_queries import (
        _TSR_K, _TSR_TEXT, _TSR_WINDOW, q_text_similarity_reranker,
        _docs_index, queries_df, ROUND_SCORE,
    )
    from connectors_spark.operators.query import score_topk_dataframe

    out = q_text_similarity_reranker(spark, sf_dir).orderBy("rank").collect()
    assert len(out) == _TSR_K
    sims = [r["sim"] for r in out]
    assert sims == sorted(sims, reverse=True), "final order is semantic"
    # every reranked doc must come from the first-stage window, with the
    # first-stage score carried through unchanged
    idx = _docs_index(spark, sf_dir, with_positions=False)
    qdf = queries_df(
        spark,
        [{"query_id": "tsr", "query_text": _TSR_TEXT, "k": _TSR_WINDOW}])
    first = {r["doc_id"]: r["score"]
             for r in score_topk_dataframe(
                 idx, qdf, round_scores=ROUND_SCORE).collect()}
    for r in out:
        assert r["doc_id"] in first
        assert abs(r["bm25_score"] - first[r["doc_id"]]) < 1e-9


def test_terms_shard_error_bounds_true_df(spark, sf_dir):
    """The ES contract for the distributed terms agg: the merged count
    is a lower bound on the true document frequency and the true df
    never exceeds doc_count + doc_count_error_upper_bound."""
    from connectors_spark.entry_queries import q_terms_shard_error
    from connectors_spark.functions.analysis import tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    true_df = {
        r["term"]: r["df"]
        for r in tokenize(docs, "text", "doc_id")
        .select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    rows = q_terms_shard_error(spark, sf_dir).collect()
    assert rows, "gate returns candidates"
    for r in rows:
        t = true_df[r["term"]]
        assert r["doc_count"] <= t <= r["doc_count"] + r["err_upper"], (
            r["term"], r["doc_count"], r["err_upper"], t)


def test_fim_packed_reconstructs_original(spark, sf_dir):
    """PSM reorder is lossless: prefix + middle + suffix == text, and
    the pass-through rows carry the text verbatim."""
    from connectors_spark.entry_queries import q_fim_transform

    docs = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()}
    rows = q_fim_transform(spark, sf_dir).collect()
    n_fim = 0
    for r in rows:
        orig = docs[r["doc_id"]]
        if r["fim"] == 0:
            assert r["packed"] == orig
            continue
        n_fim += 1
        body = r["packed"]
        assert body.startswith("<PRE>")
        pre, rest = body[len("<PRE>"):].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == orig
        assert (len(pre), len(mid), len(suf)) == (
            r["n_prefix"], r["n_middle"], r["n_suffix"])
        assert len(mid) >= 1 and len(suf) >= 1
    assert 0 < n_fim < len(rows), "fim_rate split actually splits"
