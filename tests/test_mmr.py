"""MMR diversified reranking (Carbonell & Goldstein 1998)."""

import numpy as np

from connectors_spark.operators.similarity import mmr_rerank


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _clustered():
    # query ~ cluster A; A-members nearly identical, B-members distinct
    rng = np.random.RandomState(3)
    a_axis = np.array([1.0, 0, 0, 0])
    b_axis = np.array([0, 1.0, 0, 0])
    vecs = [a_axis]  # vec 0 = the query
    for _ in range(4):   # 1..4: near-duplicates of A
        vecs.append(a_axis + rng.randn(4) * 0.01)
    for _ in range(3):   # 5..7: cluster B (still positive cos to query)
        vecs.append(0.3 * a_axis + b_axis + rng.randn(4) * 0.01)
    return vecs


def test_mmr_breaks_out_of_the_duplicate_cluster(spark):
    df = _emb_df(spark, _clustered())
    qs = df.filter("vec_id = 0")
    out = (mmr_rerank(df, qs, k=3, fetch_k=7, lam=0.5)
           .toPandas().sort_values("step"))
    picked = list(out.vec_id)
    # pure relevance would pick three A-near-dups (1..4); MMR must
    # include a B-cluster doc among the first three
    assert picked[0] in {1, 2, 3, 4}
    assert any(p in {5, 6, 7} for p in picked), picked


def test_mmr_lam1_equals_relevance_order(spark):
    from connectors_spark.operators.similarity import brute_force_cosine_topk

    df = _emb_df(spark, _clustered())
    qs = df.filter("vec_id = 0")
    rel = (brute_force_cosine_topk(df, qs, k=3)
           .toPandas().sort_values("rank"))
    out = (mmr_rerank(df, qs, k=3, fetch_k=7, lam=1.0)
           .toPandas().sort_values("step"))
    assert list(out.vec_id) == list(rel.vec_id)


def test_mmr_matches_python_greedy(spark):
    rng = np.random.RandomState(9)
    V = rng.randn(25, 8)
    df = _emb_df(spark, V)
    qs = df.filter("vec_id % 11 = 0")
    k, fetch, lam_pm = 4, 6, 700
    out = (mmr_rerank(df, qs, k=k, fetch_k=fetch, lam=0.7)
           .toPandas())
    Vf = np.stack([np.asarray([float(np.float32(x)) for x in row])
                   for row in V])

    def cos_u(i, j):
        c = float(Vf[i] @ Vf[j]
                  / (np.linalg.norm(Vf[i]) * np.linalg.norm(Vf[j])))
        return int(round(round(c, 6) * 1e6))

    for qi in (0, 11, 22):
        rels = sorted(((cos_u(qi, i), -i) for i in range(25) if i != qi),
                      reverse=True)
        cand = [(-ni, r) for r, ni in rels[:fetch]]
        sel = []
        for step in range(1, k + 1):
            best = None
            for c, r in cand:
                if c in [s[0] for s in sel]:
                    continue
                pen = max((cos_u(c, s[0]) for s in sel), default=0)
                m = lam_pm * r - (1000 - lam_pm) * pen
                if best is None or (m, -c) > (best[1], -best[0]):
                    best = (c, m)
            sel.append(best)
        got = [(int(r.vec_id), float(r.mmr_score))
               for r in out[out.query_id == qi]
               .sort_values("step").itertuples()]
        assert got == [(c, m / 1e9) for c, m in sel], (qi, got, sel)
