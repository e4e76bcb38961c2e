"""Round-5 operators: ILM planners, conversation-prefix dedup,
tool-call arg validation, best-of-n selection."""

from datetime import datetime

from pyspark.sql import functions as F

from connectors_spark.operators.dedup import conv_prefix_dup_groups
from connectors_spark.operators.ilm import rollover_plan, tiered_merge_plan
from connectors_spark.operators.pretrain import best_of_n
from connectors_spark.operators.transcript_qc import tool_call_validation


# ------------------------------------------------------------ rollover
def _indices(spark, rows):
    return spark.createDataFrame(
        rows, "index_name string, created_ts timestamp, "
              "size_bytes long, docs long")


def test_rollover_triggers_and_phases(spark):
    now = F.lit("2024-04-10").cast("date")
    rows = [
        # young + small: hot, no rollover
        ("a", datetime(2024, 4, 8), 10, 10),
        # age trigger exactly at max_age_days=30 -> rollover, warm
        ("b", datetime(2024, 3, 11), 10, 10),
        # size trigger alone
        ("c", datetime(2024, 4, 9), 1_000_000, 10),
        # docs trigger alone
        ("d", datetime(2024, 4, 9), 10, 1_000_000),
        # cold (>= 60d), delete (>= 90d)
        ("e", datetime(2024, 2, 1), 10, 10),
        ("f", datetime(2023, 12, 1), 10, 10),
    ]
    out = {
        r["index_name"]: r
        for r in rollover_plan(
            _indices(spark, rows), now, max_age_days=30,
            max_size_bytes=1000, max_docs=1000, warm_after_days=7,
            cold_after_days=60, delete_after_days=90).collect()
    }
    assert out["a"]["rollover"] == 0 and out["a"]["phase"] == "hot"
    assert out["b"]["rollover"] == 1 and out["b"]["phase"] == "warm"
    assert out["c"]["rollover"] == 1 and out["c"]["phase"] == "hot"
    assert out["d"]["rollover"] == 1 and out["d"]["phase"] == "hot"
    assert out["e"]["phase"] == "cold"
    assert out["f"]["phase"] == "delete"
    # boundary: age 30 == max_age_days trips (>=), age 29 does not
    assert out["b"]["age_days"] == 30


# --------------------------------------------------------- tiered merge
def _segments(spark, rows):
    return spark.createDataFrame(
        rows, "index_name string, seg_id long, size_units long")


def test_tiered_merge_exact_tiers_and_groups(spark):
    # power-of-two boundary: 8 -> tier 3, 7 -> tier 2 (exact, not float)
    rows = [("i", 1, 8), ("i", 2, 7), ("i", 3, 8), ("i", 4, 8),
            ("i", 5, 8), ("i", 6, 8),
            ("j", 1, 1)]
    out = tiered_merge_plan(_segments(spark, rows), merge_factor=4)
    rows_out = {(r["index_name"], r["seg_id"]): r for r in out.collect()}
    assert rows_out[("i", 1)]["tier"] == 3
    assert rows_out[("i", 2)]["tier"] == 2
    # five tier-3 segments, factor 4: first 4 merge, 5th is a singleton
    t3 = [r for r in rows_out.values()
          if r["index_name"] == "i" and r["tier"] == 3]
    merged = [r for r in t3 if r["action"] == "merge"]
    kept = [r for r in t3 if r["action"] == "keep"]
    assert len(merged) == 4 and len(kept) == 1
    assert len({r["merge_id"] for r in merged}) == 1
    # size-desc + seg_id order: the singleton is the LAST in order,
    # i.e. the max seg_id among equal sizes
    assert kept[0]["seg_id"] == 6
    # the lone tier-2 segment and the other index's singleton are kept
    assert rows_out[("i", 2)]["action"] == "keep"
    assert rows_out[("j", 1)]["action"] == "keep"
    assert rows_out[("j", 1)]["merge_id"] is None


def test_tiered_merge_groups_never_exceed_factor(spark):
    rows = [("x", i, 100 + (i % 3)) for i in range(23)]
    out = tiered_merge_plan(_segments(spark, rows), merge_factor=4)
    sizes = (out.where(F.col("merge_id").isNotNull())
             .groupBy("merge_id").count().collect())
    assert sizes, "expected at least one merge group"
    assert all(2 <= r["count"] <= 4 for r in sizes)


# ------------------------------------------------ conv prefix dedup
def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, text string")


def test_conv_prefix_keep_longest_min_id(spark):
    rows = [
        # group A: convs 1 (3 turns), 2 (5 turns), 3 (5 turns)
        (1, 0, "sys"), (1, 1, "hi"), (1, 2, "x"),
        (2, 0, "sys"), (2, 1, "hi"), (2, 2, "a"), (2, 3, "b"), (2, 4, "c"),
        (3, 0, "sys"), (3, 1, "hi"), (3, 2, "d"), (3, 3, "e"), (3, 4, "f"),
        # conv 4: same turn-0 but different turn-1 -> NOT in group A
        (4, 0, "sys"), (4, 1, "yo"), (4, 2, "z"),
    ]
    out = conv_prefix_dup_groups(_turns(spark, rows), prefix_turns=2)
    got = {r["conv_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}  # conv 4 is a singleton prefix
    # longest wins; 2 vs 3 tie on n_turns=5 -> min conv_id
    assert all(r["canon_conv_id"] == 2 for r in got.values())
    assert got[2]["is_canon"] == 1 and got[1]["is_canon"] == 0
    assert got[1]["dup_group_size"] == 3


def test_conv_prefix_only_prefix_counts(spark):
    rows = [(1, 0, "p"), (1, 1, "q"), (1, 2, "DIFFERENT"),
            (2, 0, "p"), (2, 1, "q"), (2, 2, "OTHER")]
    out = conv_prefix_dup_groups(_turns(spark, rows), prefix_turns=2)
    assert out.count() == 2  # suffix divergence does not split the group


# ------------------------------------------------ tool arg validation
def test_tool_call_validation_buckets(spark):
    rows = [
        ("t", '{"query":"a","k":3}'),       # valid
        ("t", '{"query":"a","k":-7}'),      # valid (negative int ok)
        ("t", '{"query":"a"}'),             # missing k
        ("t", '{"k":3}'),                   # missing query
        ("t", '{"query":"a","k":"many"}'),  # bad value
        ("t", '{"query":"a'),               # malformed
    ]
    df = spark.createDataFrame(rows, "tool string, args_json string")
    out = tool_call_validation(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_calls"] == 6
    assert r["n_malformed"] == 1
    assert r["n_missing"] == 2
    assert r["n_bad_value"] == 1
    assert r["n_valid"] == 2
    # buckets are mutually exclusive and exhaustive
    assert (r["n_malformed"] + r["n_missing"] + r["n_bad_value"]
            + r["n_valid"]) == r["n_calls"]


# ------------------------------------------------------- best of n
def test_best_of_n_argmax_margin_tiebreak(spark):
    rows = [
        ("p1", 1, 0.9), ("p1", 2, 0.7), ("p1", 3, 0.4),
        ("p2", 4, 0.5), ("p2", 5, 0.5),   # tie -> min doc_id
        ("p3", 6, 0.3),                   # singleton -> margin 0
    ]
    df = spark.createDataFrame(rows, "prompt_id string, doc_id long, "
                                     "reward double")
    out = {r["prompt_id"]: r for r in best_of_n(df).collect()}
    assert out["p1"]["chosen_id"] == 1
    assert abs(out["p1"]["margin"] - 0.2) < 1e-12
    assert out["p2"]["chosen_id"] == 4 and out["p2"]["margin"] == 0.0
    assert out["p3"]["chosen_id"] == 6 and out["p3"]["margin"] == 0.0
    assert out["p1"]["n_cands"] == 3


# --------------------------------------------------------- slm retention
def test_slm_min_count_survives_expiry(spark):
    from datetime import datetime as dt

    from connectors_spark.operators.snapshot import slm_retention_plan

    # all 8 snapshots are long expired; min_count=3 keeps the newest 3
    rows = [("p", f"s{i}", dt(2023, 1, 1 + i)) for i in range(8)]
    df = spark.createDataFrame(
        rows, "policy string, snap_name string, created_ts timestamp")
    out = slm_retention_plan(df, F.lit("2024-01-01").cast("date"),
                             expire_after_days=30, min_count=3,
                             max_count=100)
    kept = sorted(r["snap_name"] for r in out.collect()
                  if r["action"] == "keep")
    assert kept == ["s5", "s6", "s7"]  # the three newest


def test_slm_max_count_cuts_regardless_of_age(spark):
    from datetime import datetime as dt

    from connectors_spark.operators.snapshot import slm_retention_plan

    # all fresh (age 0) but max_count=4: the 2 oldest still go
    rows = [("p", f"s{i}", dt(2024, 1, 1 + i)) for i in range(6)]
    df = spark.createDataFrame(
        rows, "policy string, snap_name string, created_ts timestamp")
    out = slm_retention_plan(df, F.lit("2024-01-06").cast("date"),
                             expire_after_days=9999, min_count=1,
                             max_count=4)
    deleted = sorted(r["snap_name"] for r in out.collect()
                     if r["action"] == "delete")
    assert deleted == ["s0", "s1"]


# ------------------------------------------------------------- reindex
def test_reindex_op_types(spark):
    from connectors_spark.operators.sync import reindex_classify

    src = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    dst = spark.createDataFrame([(0,), (2,), (4,)], "doc_id long")
    create = {r["doc_id"]: r["action"]
              for r in reindex_classify(src, dst, op_type="create").collect()}
    assert create[0] == "version_conflict" and create[1] == "created"
    assert sum(a == "version_conflict" for a in create.values()) == 3
    index = {r["doc_id"]: r["action"]
             for r in reindex_classify(src, dst, op_type="index").collect()}
    assert index[0] == "updated" and index[1] == "created"


# --------------------------------------------------------------- doremi
def test_doremi_closed_form(spark):
    import math

    from connectors_spark.operators.pretrain import doremi_domain_weights

    rows = ([("a", 0.4)] * 2) + ([("b", 0.1)] * 2) + [("c", 0.7)]
    df = spark.createDataFrame(rows, "domain string, excess_loss double")
    out = {r["domain"]: r
           for r in doremi_domain_weights(df, eta=1.0,
                                          smoothing=0.2).collect()}
    raw = {d: math.exp(m) for d, m in [("a", 0.4), ("b", 0.1), ("c", 0.7)]}
    z = sum(raw.values())
    for d in raw:
        assert abs(out[d]["weight"] - round(raw[d] / z, 6)) <= 1e-6
        assert abs(out[d]["weight_smoothed"]
                   - round(0.8 * raw[d] / z + 0.2 / 3, 6)) <= 1e-6
    # weights sum to 1 (up to rounding), higher excess -> higher weight
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    assert out["c"]["weight"] > out["a"]["weight"] > out["b"]["weight"]
    assert out["a"]["n_docs"] == 2


# ------------------------------------------------------ static pruning
def test_static_prune_identity_and_two_stage_equivalence(spark):
    from pyspark.sql import Window

    from connectors_spark.operators.build import (
        build_index,
        static_prune_postings,
    )

    rows = [(i, " ".join(
        ["common"] * (1 + i % 4) + [f"rare{i % 9}", "tail"]
    )) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, with_positions=False)

    # keep_n >= n_docs: pruning is the identity
    full = sorted(tuple(r) for r in idx.postings
                  .select("term", "doc_id", "tf").collect())
    kept = sorted(tuple(r) for r in
                  static_prune_postings(idx, keep_n=1000).postings
                  .select("term", "doc_id", "tf").collect())
    assert kept == full

    # two-stage salted selection == naive single window
    pruned = sorted(tuple(r) for r in
                    static_prune_postings(idx, keep_n=3).postings
                    .select("term", "doc_id", "tf").collect())
    p = idx.postings.join(idx.docs, "doc_id")
    imp = (F.col("tf") * F.lit(2.2)
           / (F.col("tf") + F.lit(1.2) * (F.lit(0.25)
              + F.lit(0.75) * F.col("dl") / F.lit(float(idx.avgdl)))))
    w = Window.partitionBy("term").orderBy(F.desc(imp), F.asc("doc_id"))
    naive = sorted(tuple(r) for r in
                   p.withColumn("_r", F.row_number().over(w))
                   .where(F.col("_r") <= 3)
                   .select("term", "doc_id", "tf").collect())
    assert pruned == naive

    # per-term cap holds
    over = (static_prune_postings(idx, keep_n=3).postings
            .groupBy("term").count().where(F.col("count") > 3).count())
    assert over == 0


# ------------------------------------------------------- corpus drift
def test_corpus_drift_kl_properties(spark):
    import math

    from connectors_spark.operators.pretrain import corpus_drift_kl

    # identical snapshots -> zero drift on every term
    rows = [(0, "a", 4), (0, "b", 6), (1, "a", 4), (1, "b", 6)]
    df = spark.createDataFrame(rows, "snap int, term string, tf long")
    out = corpus_drift_kl(df).collect()
    assert all(r["kl_ab_term"] == 0.0 and r["kl_ba_term"] == 0.0
               for r in out)

    # drifted term: closed-form contribution; oov term excluded
    rows = [(0, "a", 8), (0, "b", 2), (1, "a", 2), (1, "b", 8),
            (0, "only_in_a", 5)]
    df = spark.createDataFrame(rows, "snap int, term string, tf long")
    out = {r["term"]: r for r in corpus_drift_kl(df).collect()}
    assert "only_in_a" not in out  # shared-vocab join
    pa, pb = 8 / 15, 2 / 10
    assert abs(out["a"]["kl_ab_term"]
               - round(pa * math.log(pa / pb), 6)) <= 1e-6
    # total KL over shared vocab is nonnegative
    assert sum(r["kl_ab_term"] for r in out.values()) > 0


# ------------------------------------------------------- RM3 PRF expansion
def _prf_fixture(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df

    docs = spark.createDataFrame(
        [(0, "spark fast engine"),
         (1, "spark slow engine engine"),
         (2, "other text here")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    return idx, qdf


def test_prf_weights_closed_form(spark):
    from connectors_spark.operators.query import (
        prf_expansion_terms, score_topk_dataframe)

    idx, qdf = _prf_fixture(spark)
    # replay the RM3 sum in plain Python from the first-stage scores
    s = {r.doc_id: r.score for r in
         score_topk_dataframe(idx, qdf, round_scores=6).collect()}
    assert set(s) == {0, 1}  # doc 2 matches nothing
    tf_dl = {0: {"fast": (1, 3), "engine": (1, 3), "spark": (1, 3)},
             1: {"slow": (1, 4), "engine": (2, 4), "spark": (1, 4)}}
    exp = {}
    for term in ("fast", "engine", "slow"):
        w_u = 0
        for d, terms in tf_dl.items():
            if term in terms:
                tf, dl = terms[term]
                w_u += (round(s[d] * 1e6)
                        * round(round(tf / dl, 6) * 1e6))
        exp[term] = round(w_u / 1e12, 6)

    out = {r.term: r for r in prf_expansion_terms(idx, qdf).collect()}
    # original query term excluded; all feedback-doc terms present
    assert set(out) == {"fast", "engine", "slow"}
    for term, r in out.items():
        assert r.weight == exp[term], term
    # engine appears in both feedback docs (tf 2 in doc 1) -> top-1
    assert out["engine"].rank == 1
    # ranks follow (weight DESC, term ASC)
    ranked = sorted(out.values(), key=lambda r: (-r.weight, r.term))
    assert [r.rank for r in ranked] == [1, 2, 3]


def test_prf_respects_fb_docs_and_fb_terms(spark):
    from connectors_spark.operators.query import prf_expansion_terms

    idx, qdf = _prf_fixture(spark)
    # fb_docs=1: doc 0 outranks doc 1 (same tf, shorter dl), so 'slow'
    # (doc 1 only) must not be a candidate
    out = {r.term for r in
           prf_expansion_terms(idx, qdf, fb_docs=1).collect()}
    assert out == {"fast", "engine"}
    # fb_terms caps the report per query
    assert prf_expansion_terms(idx, qdf, fb_terms=2).count() == 2


def test_prf_oov_query_yields_no_rows(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        prf_expansion_terms, queries_df)

    docs = spark.createDataFrame(
        [(0, "spark fast")], "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "oov", "query_text": "zzmissing", "k": 5}])
    assert prf_expansion_terms(idx, qdf).count() == 0


def test_prf_requery_closed_form(spark):
    from connectors_spark.operators.query import (
        prf_expansion_terms, prf_requery_topk, queries_df,
        score_topk_dataframe)

    idx, qdf = _prf_fixture(spark)
    out = {r.doc_id: r for r in prf_requery_topk(idx, qdf).collect()}
    # replay: boosts -> rescore via the scorer's own override path
    exp = prf_expansion_terms(idx, qdf).collect()
    tot_u = sum(round(r.weight * 1e6) for r in exp)
    boosts = {"spark": round(0.5 / 1, 6)}
    for r in exp:
        boosts[r.term] = round(0.5 * round(r.weight * 1e6) / tot_u, 6)
    ov = spark.createDataFrame(
        [("q", 5, t, b) for t, b in boosts.items()],
        "query_id string, k int, term string, boost double")
    ref = {r.doc_id: r for r in score_topk_dataframe(
        idx, qdf, round_scores=6, qterms_override=ov).collect()}
    assert set(out) == set(ref)
    for d in out:
        assert (out[d].rank, out[d].score) == (ref[d].rank, ref[d].score)
    # expansion pulls in doc 2 ('other text here' shares no query term
    # but none of the expansion terms either) -> still only docs 0,1
    assert set(out) == {0, 1}


def test_prf_requery_expansion_changes_ranking(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        prf_requery_topk, queries_df, score_topk_dataframe)

    # doc 2 shares NO original query term but is saturated with the
    # expansion term 'engine' that the feedback docs carry
    docs = spark.createDataFrame(
        [(0, "spark engine fast"),
         (1, "spark engine slow"),
         (2, "engine engine engine turbine")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    first = {r.doc_id for r in
             score_topk_dataframe(idx, qdf, round_scores=6).collect()}
    assert first == {0, 1}  # doc 2 invisible to the literal query
    requery = {r.doc_id for r in prf_requery_topk(idx, qdf).collect()}
    assert 2 in requery  # RM3 recall gain


def test_prf_requery_oov_query_is_empty(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        prf_requery_topk, queries_df)

    docs = spark.createDataFrame(
        [(0, "spark fast")], "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "oov", "query_text": "zzmissing", "k": 5}])
    assert prf_requery_topk(idx, qdf).count() == 0


# ------------------------------------------------------- LM similarities
def test_lm_dirichlet_closed_form(spark):
    import math

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_lm

    docs = spark.createDataFrame(
        [(0, "spark fast engine"),
         (1, "spark spark slow"),
         (2, "other text here")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    mu, total, ctf = 2000.0, 9.0, 3.0  # |C|=9 tokens, ctf(spark)=3

    def dirichlet(tf, dl):
        s = (math.log(1.0 + tf * total / (mu * ctf))
             + math.log(mu / (dl + mu)))
        return round(round(max(s, 0.0), 6) * 1e6) / 1e6

    out = {r.doc_id: r for r in
           score_topk_lm(idx, qdf, similarity="dirichlet").collect()}
    assert set(out) == {0, 1}
    assert out[0].score == dirichlet(1, 3)
    assert out[1].score == dirichlet(2, 3)
    # tf=2 beats tf=1 at equal dl
    assert out[1].rank == 1


def test_lm_jm_closed_form_and_clamp(spark):
    import math

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_lm

    docs = spark.createDataFrame(
        [(0, "spark fast engine"), (1, "spark spark slow")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark fast", "k": 5}])
    lam, total = 0.1, 6.0

    def jm(tf, dl, ctf):
        s = math.log(1.0 + ((1.0 - lam) * tf * total)
                     / (lam * dl * ctf))
        return round(round(s, 6) * 1e6)

    out = {r.doc_id: r for r in
           score_topk_lm(idx, qdf, similarity="jm").collect()}
    # doc 0 matches both terms: contributions sum as integers
    assert round(out[0].score * 1e6) == jm(1, 3, 3) + jm(1, 3, 1)
    assert round(out[1].score * 1e6) == jm(2, 3, 3)


def test_lm_rejects_unknown_similarity(spark):
    import pytest as _pytest

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_lm

    docs = spark.createDataFrame(
        [(0, "spark")], "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    with _pytest.raises(ValueError):
        score_topk_lm(idx, qdf, similarity="bm42")


def test_dfi_closed_form_and_clamp(spark):
    import math

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_dfi

    docs = spark.createDataFrame(
        [(0, "spark spark spark fast"),
         (1, "spark slow engine other")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    total, ctf, dl = 8.0, 4.0, 4.0
    e = ctf * 1.0 * dl / total  # = 2.0 for both docs

    def dfi(tf):
        if tf <= e:
            return 0.0
        return round(round(math.log2(1.0 + (tf - e) / math.sqrt(e)), 6)
                     * 1e6) / 1e6

    out = {r.doc_id: r for r in
           score_topk_dfi(idx, qdf, measure="standardized").collect()}
    assert out[0].score == dfi(3)       # tf=3 > e=2 -> positive
    assert out[1].score == 0.0          # tf=1 <= e -> Lucene clamp
    assert out[0].rank == 1

    # the other two independence measures change the value, not the set
    for m, f in (("saturated", lambda tf: (tf - e) / e),
                 ("chisquared", lambda tf: (tf - e) ** 2 / e)):
        got = {r.doc_id: r.score for r in
               score_topk_dfi(idx, qdf, measure=m).collect()}
        assert got[0] == round(
            round(math.log2(1.0 + f(3)), 6) * 1e6) / 1e6, m
        assert got[1] == 0.0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        score_topk_dfi(idx, qdf, measure="entropic")


def _r6(x):
    return round(round(x, 6) * 1e6) / 1e6


def _two_doc_idx(spark):
    from connectors_spark.operators.build import build_index

    docs = spark.createDataFrame(
        [(0, "spark spark spark fast"),
         (1, "spark slow engine other")],
        "doc_id long, text string")
    return build_index(docs, with_positions=False)


def test_dfr_closed_form(spark):
    import math

    import pytest as _pytest

    from connectors_spark.operators.query import queries_df, score_topk_dfr

    idx = _two_doc_idx(spark)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    # N=2, avgdl=4, dl=4 both docs -> tfn_h2 = tf*log2(2) = tf
    # "spark": df=2, ttf=4, lambda_g = 4/2 = 2
    lam = 2.0

    def gl(tf):
        inf1 = math.log2(1 + lam) + tf * math.log2((1 + lam) / lam)
        return _r6(inf1 / (tf + 1.0))

    out = {r.doc_id: r for r in
           score_topk_dfr(idx, qdf, basic_model="g", after_effect="l",
                          normalization="h2").collect()}
    assert out[0].score == gl(3)
    assert out[1].score == gl(1)
    # lambda = ttf/N = 2 is a stop-word-class rate: under G the extra
    # occurrences are EXPECTED, so the tf=1 doc diverges more and
    # outranks the tf=3 doc — the DFR burstiness discount, by design
    assert gl(1) > gl(3) and out[1].rank == 1

    # in/b/no: inf1 = tf*log2(3/2.5), inf2 = (ttf+1)/(df*(tf+1))
    def inb(tf):
        return _r6(tf * math.log2(3 / 2.5) * 5.0 / (2 * (tf + 1.0)))

    got = {r.doc_id: r.score for r in
           score_topk_dfr(idx, qdf, basic_model="in", after_effect="b",
                          normalization="no").collect()}
    assert got[0] == inb(3) and got[1] == inb(1)

    # if / ine only change the per-term constant, not the doc order
    for bm in ("if", "ine"):
        rows = score_topk_dfr(idx, qdf, basic_model=bm).collect()
        assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] \
            == [0, 1], bm
        assert all(r.score > 0 for r in rows), bm

    with _pytest.raises(ValueError):
        score_topk_dfr(idx, qdf, basic_model="p")
    with _pytest.raises(ValueError):
        score_topk_dfr(idx, qdf, after_effect="x")
    with _pytest.raises(ValueError):
        score_topk_dfr(idx, qdf, normalization="h9")


def test_ib_closed_form_and_spl_guard(spark):
    import math

    import pytest as _pytest

    from connectors_spark.operators.query import queries_df, score_topk_ib

    idx = _two_doc_idx(spark)
    q_spark = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    # "spark" in both docs: lambda_df = (2+1)/(2+1) = 1.0
    out = {r.doc_id: r.score for r in
           score_topk_ib(idx, q_spark, distribution="ll").collect()}
    assert out[0] == _r6(math.log2(3 + 1))    # log2((tfn+1)/1), tfn=3
    assert out[1] == _r6(math.log2(1 + 1))
    # SPL at lambda=1 is 0/0 -> guarded to 0 (zero-information term)
    spl_all = {r.doc_id: r.score for r in
               score_topk_ib(idx, q_spark, distribution="spl").collect()}
    assert spl_all == {0: 0.0, 1: 0.0}

    # "fast" only in doc0: lambda_df = 2/3, tfn = 1
    q_fast = queries_df(spark, [
        {"query_id": "q", "query_text": "fast", "k": 5}])
    lam = 2.0 / 3.0
    exp = -math.log2((lam ** 0.5 - lam) / (1 - lam))
    got = {r.doc_id: r.score for r in
           score_topk_ib(idx, q_fast, distribution="spl").collect()}
    assert got == {0: _r6(exp)}

    # lambda=ttf variant shifts the rate: (4+1)/(2+1) for "spark"
    lam_t = 5.0 / 3.0
    out_t = {r.doc_id: r.score for r in
             score_topk_ib(idx, q_spark, distribution="ll",
                           lam="ttf").collect()}
    assert out_t[0] == _r6(math.log2((3 + lam_t) / lam_t))

    with _pytest.raises(ValueError):
        score_topk_ib(idx, q_spark, distribution="gauss")
    with _pytest.raises(ValueError):
        score_topk_ib(idx, q_spark, lam="cf")


def test_boolean_and_scripted_sim(spark):
    import math

    from connectors_spark.operators.query import (
        queries_df, score_topk_boolean, score_topk_scripted)

    idx = _two_doc_idx(spark)
    # doc0 matches {spark, fast}, doc1 matches {spark, slow}; dup
    # query terms score once (engine semantic) -> scores 2.0 / 2.0,
    # tie broken by doc_id
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark FAST slow spark", "k": 5}])
    rows = sorted(score_topk_boolean(idx, qdf).collect(),
                  key=lambda r: r.rank)
    assert [(r.doc_id, r.score) for r in rows] == [(0, 2.0), (1, 2.0)]

    # scripted: saturating tf * idf / sqrt(dl), computed by hand
    def script(ctx):
        from pyspark.sql import functions as F
        return ((ctx["tf"] / (ctx["tf"] + F.lit(1.0)))
                * F.log(F.lit(1.0) + F.lit(ctx["n_docs"] + 1.0)
                        / (ctx["df_t"] + F.lit(0.5)))
                / F.sqrt(ctx["dl"]))

    q1 = queries_df(spark, [
        {"query_id": "q", "query_text": "fast", "k": 5}])
    got = {r.doc_id: r.score for r in
           score_topk_scripted(idx, q1, script).collect()}
    exp = (1.0 / 2.0) * math.log(1.0 + 3.0 / 1.5) / 2.0
    assert got == {0: _r6(exp)}


# ------------------------------------------------- lossy Lucene norms
def test_lucene_quantized_dl_closed_form(spark):
    from connectors_spark.operators.query import lucene_quantized_dl

    vals = [0, 1, 7, 8, 15, 16, 17, 19, 255, 256, 2049, 1_000_003]
    df = spark.createDataFrame([(v,) for v in vals], "dl long")
    got = {r.dl: r.q for r in df.select(
        "dl", lucene_quantized_dl(F.col("dl")).alias("q")).collect()}

    def ref(v):  # SmallFloat.intToByte4 round-trip: top-4 sig bits
        if v < 8:
            return v
        s = v.bit_length() - 4
        return (v >> s) << s

    assert got == {v: ref(v) for v in vals}
    assert got[17] == 16 and got[19] == 18 and got[255] == 240


def test_lossy_norms_tie_and_exact_avgdl(spark):
    import math

    from connectors_spark import BM25_B, BM25_K1
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        queries_df, score_topk_dataframe, with_lossy_norms)

    def doc(i, n_fill):
        fill = " ".join(f"w{i}x{j}" for j in range(n_fill))
        return (i, "spark " + fill)

    # dl 16 and 17 share the top-4 significant bits (both -> 16)
    docs = spark.createDataFrame([doc(0, 15), doc(1, 16)],
                                 "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    lossy = with_lossy_norms(idx)
    # avgdl stays EXACT: Lucene derives it from sumTotalTermFreq, not norms
    assert lossy.avgdl == idx.avgdl

    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark", "k": 5}])
    exact = {r.doc_id: r.score for r in
             score_topk_dataframe(idx, qdf, round_scores=6).collect()}
    q = {r.doc_id: (r.rank, r.score) for r in
         score_topk_dataframe(lossy, qdf, round_scores=6).collect()}
    # exact dl 16 vs 17: shorter doc strictly wins
    assert exact[0] > exact[1]
    # lossy: identical norm byte -> identical scores, doc_id ASC tiebreak
    assert q[0][1] == q[1][1]
    assert (q[0][0], q[1][0]) == (1, 2)
    # closed form at dl_q=16, exact avgdl=16.5, N=2, df=2
    idf = math.log(1.0 + 0.5 / 2.5)
    tfn = 1.0 / (1.0 + BM25_K1 * (1 - BM25_B + BM25_B * 16 / 16.5))
    assert q[0][1] == _r6(idf * tfn)


# ---------------------------------------------- Kneser-Ney trigram LM
def test_kneser_ney_closed_form(spark):
    import math
    from collections import Counter, defaultdict

    from connectors_spark.functions.text import kneser_ney_score

    texts = {10: "a b a b a", 11: "a b c a b", 12: "b c"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in kneser_ney_score(docs).collect()}
    # doc 12 has < 3 tokens -> no trigram -> absent
    assert set(out) == {10, 11}

    # independent reference, built exactly per Chen & Goodman's
    # interpolated KN from the trigram type table
    D = 0.75
    tris = {d: [tuple(t.split()[i:i + 3])
                for i in range(len(t.split()) - 2)]
            for d, t in texts.items() if len(t.split()) >= 3}
    types = Counter(g for gs in tris.values() for g in gs)
    h12, n1p_12 = defaultdict(int), defaultdict(int)
    a23_w1 = defaultdict(set)
    for (w1, w2, w3), c in types.items():
        h12[(w1, w2)] += c
        n1p_12[(w1, w2)] += 1
        a23_w1[(w2, w3)].add(w1)
    a23 = {k: len(v) for k, v in a23_w1.items()}
    A2, n1p_2 = defaultdict(int), defaultdict(int)
    u3 = defaultdict(int)
    for (w2, w3), a in a23.items():
        A2[w2] += a
        n1p_2[w2] += 1
        u3[w3] += 1
    U = float(len(a23))

    def lp_u(g):
        w1, w2, w3 = g
        p_uni = u3[w3] / U
        p_bi = (max(a23[(w2, w3)] - D, 0.0)
                + D * n1p_2[w2] * p_uni) / A2[w2]
        p_tri = (max(types[g] - D, 0.0)
                 + D * n1p_12[(w1, w2)] * p_bi) / h12[(w1, w2)]
        return round(round(math.log2(p_tri), 6) * 1e6)

    for d, gs in tris.items():
        assert out[d].n_trigrams == len(gs)
        exp = round(sum(lp_u(g) for g in gs) / 1e6 / len(gs), 6)
        assert out[d].avg_log2p == exp


def test_kneser_ney_probabilities_are_probabilities(spark):
    """Every scored trigram is a corpus trigram, so log2 P < 0 always
    (P < 1 whenever the type table has > 1 continuation anywhere)."""
    from connectors_spark.functions.text import kneser_ney_score

    docs = spark.createDataFrame(
        [(1, "x y z x y w x y z"), (2, "y z x y z q")],
        "doc_id long, text string")
    rows = kneser_ney_score(docs).collect()
    assert len(rows) == 2
    assert all(r.avg_log2p < 0 for r in rows)
