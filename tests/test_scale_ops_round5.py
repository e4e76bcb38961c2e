"""Leakage-safe splits, LSH recall curve, shuffle-skew diagnostics."""

import pytest

from pyspark.sql import functions as F


def _dup_corpus(spark):
    # docs 1/2 are near-identical (share almost all shingles), 3 is
    # unrelated, 4 is an exact dup of 1
    base = ("spark merge sort table window group customer data batch "
            "stream vector hash join filter order")
    rows = [
        (1, base + " alpha"),
        (2, base + " beta"),
        (3, "completely different words about nothing in particular "
            "zebra quark lattice osmosis thunder velvet"),
        (4, base + " alpha"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_leakage_safe_split_keeps_clusters_together(spark):
    from connectors_spark.operators.dedup import dedup_clusters
    from connectors_spark.operators.pretrain import leakage_safe_split

    docs = _dup_corpus(spark)
    comps = dedup_clusters(docs, jaccard_threshold=0.5)
    out = {r.doc_id: r for r in
           leakage_safe_split(docs, comps).collect()}
    assert len(out) == 4
    # the 1-2-4 cluster shares one component and ONE split
    assert out[1].component == out[2].component == out[4].component == 1
    assert out[1].split == out[2].split == out[4].split
    assert out[1].bucket == out[2].bucket


def test_leakage_safe_split_singleton_matches_assign_split(spark):
    from connectors_spark.operators.dedup import dedup_clusters
    from connectors_spark.operators.pretrain import (assign_split,
                                                     leakage_safe_split)

    docs = _dup_corpus(spark)
    comps = dedup_clusters(docs, jaccard_threshold=0.5)
    safe = {r.doc_id: r for r in leakage_safe_split(docs, comps).collect()}
    plain = {r.doc_id: r for r in
             assign_split(docs, "doc_id").collect()}
    # doc 3 has no dups: its component is itself and its split is
    # EXACTLY what per-doc hashing gives — stability preserved
    assert safe[3].component == 3
    assert safe[3].split == plain[3].split
    assert safe[3].bucket == plain[3].bucket


def test_lsh_recall_curve_monotone_and_ceiling(spark):
    from connectors_spark.operators.dedup import lsh_recall_curve

    # corpus with several planted near-dup pairs of varying closeness
    words = ("spark merge sort table window group customer data batch "
             "stream vector hash join filter order row line scan key "
             "value").split()
    rows = []
    for i in range(10):
        text = " ".join(words[j % len(words)]
                        for j in range(i, i + 15))
        rows.append((2 * i, text))
        # partner doc: mutate the tail progressively more with i
        mut = text.split()
        for k in range(1 + i % 4):
            mut[-(k + 1)] = f"mut{i}x{k}"
        rows.append((2 * i + 1, " ".join(mut)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.bands, r.rows_per_band): r
           for r in lsh_recall_curve(docs, jaccard_threshold=0.3).collect()}
    assert len(out) == 4
    # all configs see the same truth-set size
    sizes = {r.n_truth_pairs for r in out.values()}
    assert len(sizes) == 1 and sizes.pop() > 0
    # the 1-row banding is the truth ceiling by construction
    assert out[(16, 1)].recall == 1.0
    # recall is non-increasing as rows-per-band grows
    rs = [out[(16, 1)].recall, out[(8, 2)].recall,
          out[(4, 4)].recall, out[(2, 8)].recall]
    assert rs == sorted(rs, reverse=True)
    assert all(0.0 <= r <= 1.0 for r in rs)


def test_lsh_recall_curve_rejects_mixed_budget(spark):
    from connectors_spark.operators.dedup import lsh_recall_curve

    docs = _dup_corpus(spark)
    with pytest.raises(ValueError, match="hash budget"):
        lsh_recall_curve(docs, configs=((16, 1), (4, 2)))


def test_shuffle_skew_report_closed_form(spark):
    from connectors_spark.operators.diagnostics import shuffle_skew_report

    # key 'a' x 60, 'b' x 30, 'c' x 10
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = shuffle_skew_report(df, "k", n_partitions=4).collect()
    assert sum(r.n_rows for r in out) == 100
    assert sum(r.n_keys for r in out) == 3
    for r in out:
        assert r.load_factor == round(r.n_rows * 4 / 100, 6)
        assert r.heaviest_n <= r.n_rows
    # the partition holding 'a' reports it as heaviest
    pa = [r for r in out if r.heaviest_key == "a"]
    assert len(pa) == 1 and pa[0].heaviest_n == 60
    # max load factor is the straggler multiplier: >= 1 always
    assert max(r.load_factor for r in out) >= 1.0


def test_shuffle_skew_report_balanced_keys(spark):
    from connectors_spark.operators.diagnostics import shuffle_skew_report

    rows = [(f"k{i}",) for i in range(256) for _ in range(4)]
    df = spark.createDataFrame(rows, "k string")
    out = shuffle_skew_report(df, "k", n_partitions=8).collect()
    assert len(out) == 8                      # no empty partitions
    assert sum(r.n_keys for r in out) == 256
    # many uniform keys: no partition should exceed 2x balanced load
    assert max(r.load_factor for r in out) < 2.0
