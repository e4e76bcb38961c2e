"""In-engine quality classifier: distributed logistic regression over
hashed bag-of-words features — the trainable analog of the
fastText/CCNet quality filters LLM pipelines use to score web text
against a curated reference corpus.

Everything is DataFrame algebra (no MLlib, no UDF):

- features: md5-hashed unigram buckets (engine-portable hash — the
  same construction the sketch gates use), value = tf / doc_len, plus
  a constant bias feature;
- training: full-batch gradient descent. Each iteration is
  (1) score: triples ⋈ broadcast weights → per-doc z → p = σ(z),
  (2) gradient: triples ⋈ per-doc (p−y) → per-feature sum,
  (3) update: weights − lr·(grad/N + λ·w).
  The weight frame is D+1 rows — broadcast each round (the
  parameter-server shape); the corpus-side work is two linear
  shuffles per iteration, so the plan scales with the corpus while
  the model stays O(D).

Iterations loop in Python over PLAN CONSTRUCTION (like
operators/graph.pagerank); weights persist per round to bound
lineage. Deterministic end-to-end: no rand() — init is zeros, data
order never matters (sums are the only reduction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connectors_spark.functions.analysis import tokens_col

DEFAULT_DIM = 256


def _bucket(term, dim: int):
    return (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("lrfeat"), term)),
                           1, 8), 16, 10).cast("long") % dim
    )


def doc_features(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 dim: int = DEFAULT_DIM) -> DataFrame:
    """(id, f, x): hashed-unigram tf/dl triples + bias feature f=dim
    with x=1. Docs with no tokens still get the bias row."""
    toks = df.select(F.col(id_col),
                     F.explode_outer(tokens_col(F.col(text_col)))
                     .alias("term"))
    counts = (
        toks.filter(F.col("term").isNotNull())
        .select(id_col, _bucket(F.col("term"), dim).alias("f"))
        .groupBy(id_col, "f").agg(F.count(F.lit(1)).alias("c"))
    )
    dl = counts.groupBy(id_col).agg(F.sum("c").alias("dl"))
    feats = (counts.join(dl, id_col)
             .select(id_col, "f",
                     (F.col("c") / F.col("dl")).alias("x")))
    bias = df.select(F.col(id_col), F.lit(dim).alias("f"),
                     F.lit(1.0).alias("x"))
    return feats.unionByName(bias)


def train_logreg(
    df: DataFrame,
    label_col: str = "y",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    iters: int = 6,
    lr: float = 2.0,
    l2: float = 0.001,
) -> DataFrame:
    """(f, w) after `iters` full-batch GD steps from zero init.
    `label_col` must be 0.0/1.0."""
    spark = df.sparkSession
    triples = doc_features(df, text_col, id_col, dim).persist()
    labels = df.select(F.col(id_col),
                       F.col(label_col).cast("double").alias("y"))
    n = labels.count()
    # Parameter-server loop: the O(D) weight vector round-trips
    # through the driver each iteration (that IS the PS shape — model
    # state is small, data never moves). The round-trip also resets
    # plan lineage: expressing w_{i+1} as a DataFrame over w_i's plan
    # references w_i twice (score path + update join), which DOUBLES
    # the logical plan per iteration — exponential analysis blow-up by
    # ~8 iterations. collect()/createDataFrame keeps plan depth
    # constant and is float64-exact.
    w_vals = {f: 0.0 for f in range(dim + 1)}
    for _ in range(int(iters)):
        w = spark.createDataFrame(
            sorted(w_vals.items()), "f long, w double")
        z = (triples.join(F.broadcast(w), "f")
             .groupBy(id_col)
             .agg(F.sum(F.col("x") * F.col("w")).alias("z")))
        p = (labels.join(z, id_col, "left")
             .select(id_col, "y",
                     (F.lit(1.0)
                      / (F.lit(1.0) + F.exp(-F.coalesce("z", F.lit(0.0))))
                      ).alias("p")))
        resid = p.select(id_col, (F.col("p") - F.col("y")).alias("r"))
        grad = {
            r.f: r.g
            for r in triples.join(resid, id_col)
            .groupBy("f")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .collect()
        }
        w_vals = {
            f: wv - lr * (grad.get(f, 0.0) / n + l2 * wv)
            for f, wv in w_vals.items()
        }
    triples.unpersist()
    return spark.createDataFrame(sorted(w_vals.items()),
                                 "f long, w double")


def score_logreg(df: DataFrame, weights: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 dim: int = DEFAULT_DIM) -> DataFrame:
    """(id, score): σ(w·x) per doc under a trained weight frame."""
    triples = doc_features(df, text_col, id_col, dim)
    z = (triples.join(F.broadcast(weights), "f")
         .groupBy(id_col)
         .agg(F.sum(F.col("x") * F.col("w")).alias("z")))
    return (df.select(id_col).join(z, id_col, "left")
            .select(id_col,
                    (F.lit(1.0)
                     / (F.lit(1.0) + F.exp(-F.coalesce("z", F.lit(0.0))))
                     ).alias("score")))


def reliability_bins(scored: DataFrame, score_col: str = "score",
                     label_col: str = "y", n_bins: int = 10) -> DataFrame:
    """Reliability diagram / Expected-Calibration-Error bins for a
    probabilistic classifier (Naeini et al. AAAI 2015's ECE, public) —
    the post-training audit a quality/reward classifier needs before
    its scores gate corpus admission: per score-decile, how far does
    the predicted probability sit from the observed positive rate?

        bin_b: n, mean_score, mean_label, gap = |mean_label-mean_score|
        ece_term_b = (n_b / N) * gap_b     (ECE = sum of ece_terms)

    Determinism: scores arrive rounded (ROUND_SCORE decimals); they are
    lifted to micro-unit integers, binning is integer arithmetic
    (bin = min(score_u * n_bins div 1e6, n_bins-1), so score=1.0 folds
    into the top bin), and every output is a single division of exact
    integer sums — the same cross-engine convention as mmr_rerank /
    rank_biased_overlap. Labels must be 0/1 integers.

    Scale shape: one map-side-combinable groupBy on <= n_bins keys plus
    a broadcast of the scalar N — a constant-size result regardless of
    corpus size.
    """
    score_u = F.round(F.col(score_col) * 1e6).cast("long")
    bin_col = F.least(
        (score_u * n_bins / F.lit(1_000_000)).cast("long"),
        F.lit(n_bins - 1)).alias("bin")
    agg = (scored.select(bin_col,
                         score_u.alias("s_u"),
                         F.col(label_col).cast("long").alias("lab"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("s_u").alias("sum_u"),
                F.sum("lab").alias("sum_label")))
    total = scored.agg(F.count(F.lit(1)).alias("n_total"))
    agg = agg.crossJoin(F.broadcast(total))
    gap_num = F.abs(F.col("sum_label") * F.lit(1_000_000) - F.col("sum_u"))
    return agg.select(
        F.col("bin").cast("int").alias("bin"), "n",
        F.round(F.col("sum_u").cast("double")
                / (F.col("n") * 1e6), 6).alias("mean_score"),
        F.round(F.col("sum_label").cast("double")
                / F.col("n"), 6).alias("mean_label"),
        F.round(gap_num.cast("double")
                / (F.col("n") * 1e6), 6).alias("gap"),
        F.round(gap_num.cast("double")
                / (F.col("n_total") * 1e6), 6).alias("ece_term"))


def roc_auc(scored: DataFrame, score_col: str = "score",
            label_col: str = "y", round_to: int = 6) -> DataFrame:
    """Exact ROC-AUC of a probabilistic classifier via the Mann-Whitney
    rank-sum identity (Hanley & McNeil 1982, public) — the
    threshold-free companion to reliability_bins for auditing a
    quality/reward classifier before its scores gate corpus admission:
    AUC = P(score_pos > score_neg) + 0.5 * P(tie).

    Determinism: scores arrive rounded (ROUND_SCORE decimals) and lift
    to micro-unit integers; ties are handled with MIDRANKS, and since
    2*midrank = rank_min + rank_max is always an INTEGER, the whole
    statistic stays in exact integer arithmetic until one division:

        2*sum(rank_pos) = sum over distinct scores v of
                          n_pos(v) * (c_lt(v) + c_le(v) + 1)
        AUC = (2*sum(rank_pos) - n_pos*(n_pos+1)) / (2*n_pos*n_neg)

    (c_lt/c_le = cumulative counts strictly-below / at-or-below v).
    Both engines hash identically — the agreement-module convention.

    Returns one row (n, n_pos, n_neg, auc, gini) with gini = 2*AUC - 1
    computed as the single division (2*num - den)/den. Degenerate
    single-class inputs emit NULL auc/gini (undefined, matching
    sklearn's ValueError).

    Scale shape: one groupBy on distinct score values (<= 1e6+1 keys at
    6-decimal rounding), one window over that bounded frame, one scalar
    row out — never a window over raw rows."""
    from pyspark.sql import Window

    s_u = F.round(F.col(score_col) * 1e6).cast("long")
    cells = (scored.select(s_u.alias("s_u"),
                           F.col(label_col).cast("long").alias("lab"))
             .groupBy("s_u")
             .agg(F.count(F.lit(1)).alias("n_v"),
                  F.sum("lab").alias("n_pos_v")))
    w = Window.orderBy("s_u").rowsBetween(Window.unboundedPreceding, 0)
    c_le = F.sum("n_v").over(w)
    ranked = cells.select(
        "n_v", "n_pos_v", c_le.alias("c_le"),
        (c_le - F.col("n_v")).alias("c_lt"))
    agg = ranked.agg(
        F.sum("n_v").alias("n"),
        F.sum("n_pos_v").alias("n_pos"),
        F.sum(F.col("n_pos_v")
              * (F.col("c_lt") + F.col("c_le") + 1)).alias("r2"))
    n, n_pos = F.col("n"), F.col("n_pos")
    n_neg = (n - n_pos).alias("n_neg")
    num = F.col("r2") - n_pos * (n_pos + 1)
    den = 2 * n_pos * (n - n_pos)
    defined = (n_pos > 0) & (n_pos < n)
    return agg.select(
        n.alias("n"), n_pos.alias("n_pos"), n_neg,
        F.when(defined, F.round(num.cast("double") / den.cast("double"),
                                round_to)).alias("auc"),
        F.when(defined, F.round((2 * num - den).cast("double")
                                / den.cast("double"),
                                round_to)).alias("gini"))


def score_covariate_bias(scored: DataFrame, score_col: str = "score",
                         x_col: str = "x", n_bins: int = 10,
                         round_to: int = 6) -> DataFrame:
    """Length/covariate-bias audit of a learned quality scorer — the
    known failure mode of classifier-gated corpus admission (quality
    classifiers drift into length priors; verbosity bias in reward
    models is the same defect): per equal-WIDTH bucket of an integer
    covariate, the scorer's mean output, plus the corpus-wide OLS
    slope and r^2 of score on covariate.

    Bucketing is value-range (bucket = (x - min) * n_bins div
    (max - min + 1) against broadcast min/max scalars — the
    heaps_vocab_growth shape, map-side combinable, NO global window).
    OLS runs on exact integer sufficient statistics: scores round to
    6 then lift to MILLI-units for the quadratic sums (y^2 terms must
    stay inside int64 — milli keeps n*sum(y^2) exact to ~3e6 rows
    per audit; pre-aggregate or sample beyond), x stays raw. slope is
    reported in score-units per x-unit; r2 squares the exact-integer
    covariance in double (identical IEEE expression both engines).

    Returns n_bins rows: (bin, x_lo, n, mean_score, mean_x,
    slope, r2) — slope/r2 repeated per row (the gate-friendly
    broadcast-scalar convention). Degenerate inputs (constant x or
    constant score) emit NULL slope/r2."""
    y_m = F.round(F.col(score_col) * 1e3).cast("long")
    base = scored.select(F.col(x_col).cast("long").alias("x"),
                         y_m.alias("y"))
    rng = base.agg(F.min("x").alias("x_min"), F.max("x").alias("x_max"))
    b = base.crossJoin(F.broadcast(rng))
    width = F.col("x_max") - F.col("x_min") + 1
    bucket = F.floor((F.col("x") - F.col("x_min")) * n_bins / width)
    per_bin = (b.select(bucket.alias("bin"), "x", "y")
               .groupBy("bin")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("x").alias("sx_b"),
                    F.sum("y").alias("sy_b")))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_t"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    nt = F.col("n_t")
    cov = nt * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nt * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nt * F.col("syy") - F.col("sy") * F.col("sy")
    consts = stats.select(
        F.when((vx > 0),
               F.round(cov.cast("double") / vx.cast("double") / 1e3,
                       round_to + 3)).alias("slope"),
        F.when((vx > 0) & (vy > 0),
               F.round(cov.cast("double") * cov.cast("double")
                       / (vx.cast("double") * vy.cast("double")),
                       round_to)).alias("r2"))
    rng2 = rng.select(F.col("x_min").alias("xm"),
                      (F.col("x_max") - F.col("x_min") + 1).alias("w"))
    out = per_bin.crossJoin(F.broadcast(consts)).crossJoin(
        F.broadcast(rng2))
    return out.select(
        F.col("bin").cast("int").alias("bin"),
        (F.col("xm") + F.floor(F.col("bin") * F.col("w") / n_bins))
        .cast("long").alias("x_lo"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sy_b").cast("double") / (F.col("n") * 1e3),
                round_to).alias("mean_score"),
        F.round(F.col("sx_b").cast("double") / F.col("n"),
                round_to).alias("mean_x"),
        "slope", "r2")
