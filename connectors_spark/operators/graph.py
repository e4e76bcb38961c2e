"""Iterative graph propagation: fixed-iteration PageRank over an edge
DataFrame, plus a kNN-graph builder over embeddings.

Use case (LLM-data pipeline): centrality over a document/embedding
similarity graph — rank "hub" documents inside near-duplicate
neighborhoods for canonical election, or weight quality propagation
across a similarity graph (harmonic/TrustRank-style seeds are a
one-line variant: swap the uniform teleport vector).

Scale shape: the edge-transition frame is computed ONCE (one groupBy
for out-degree + one join) and persisted; each iteration is exactly
one join (ranks ⋈ transitions on src) + one groupBy(dst) — two
shuffles per iteration, both on the edge key, no driver-side data
loop (the Python ``for`` loops over ITERATIONS, building the plan).
At cluster scale you'd localCheckpoint every ~5 iterations to cut
lineage; with the small fixed iteration counts used here the lineage
is bounded and checkpointing is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connectors_spark.operators.similarity import brute_force_cosine_topk


def knn_edges(vectors: DataFrame, k: int = 3,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Directed kNN graph: src → its k nearest neighbors by cosine
    (self excluded, ties broken by rounded-cosine then id — the same
    deterministic ranking the ann gates pin). Exact all-pairs baseline;
    at corpus scale swap in the IVF/LSH candidate generators from
    operators/similarity.py — the PageRank side is edge-source-agnostic.
    """
    knn = brute_force_cosine_topk(vectors, vectors, k=k,
                                  vec_col=vec_col, id_col=id_col)
    return knn.select(F.col("query_id").alias("src"),
                      F.col("vec_id").alias("dst"))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = 0.85,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous power iterations of
    PageRank with uniform teleport:

        rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u) · w(u,v)/outw(u)

    ``nodes`` defaults to the distinct edge endpoints; pass it
    explicitly to include isolated nodes (they hold the teleport
    floor). Dangling nodes (no out-edges) leak their damped mass —
    the usual redistribute-to-all correction is a broadcast scalar
    add; omitted here because every intended edge source (kNN graphs)
    has out-degree k. ``weight``: optional edge-weight column,
    normalized per source; None = uniform 1/out-degree.

    ``teleport``: optional (node, weight) frame for PERSONALIZED
    PageRank / TrustRank — the teleport term becomes (1-d)·t(v) with
    t normalized to sum 1 (nodes absent from the frame get 0), so
    authority flows out from the seed set instead of uniformly. The
    LLM-data use: seed trusted/curated sources and propagate quality
    through the document-similarity graph. Initial rank = t(v)."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    if nodes is None:
        nodes = (e.select(F.col("src").alias("node"))
                 .union(e.select(F.col("dst").alias("node")))
                 .distinct())
    else:
        cols = nodes.columns
        nodes = nodes.select(F.col(cols[0]).alias("node"))
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (e.join(outw, "src")
             .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
             .persist())
    trans.count()  # materialize once; reused every iteration

    if teleport is None:
        base_col = F.lit((1.0 - damping) / n)
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
        with_base = nodes.select("node", base_col.alias("_base"))
    else:
        tc = teleport.columns
        t = teleport.select(F.col(tc[0]).alias("node"),
                            F.col(tc[1]).cast("double").alias("_tw"))
        tot = t.agg(F.sum("_tw")).collect()[0][0]
        if not tot or tot <= 0:
            raise ValueError("teleport weights must sum > 0")
        norm = (
            nodes.join(t, "node", "left")
            .select("node",
                    (F.coalesce("_tw", F.lit(0.0)) / F.lit(float(tot)))
                    .alias("_t"))
            .persist()
        )
        ranks = norm.select("node", F.col("_t").alias("rank"))
        with_base = norm.select(
            "node", (F.lit(1.0 - damping) * F.col("_t")).alias("_base"))
    with_base = with_base.persist()
    for _ in range(int(iters)):
        inflow = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
        )
        ranks = (
            with_base.join(inflow, with_base["node"] == inflow["dst"],
                           "left")
            .select(
                "node",
                (F.col("_base")
                 + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                 ).alias("rank"),
            )
        )
    return ranks
