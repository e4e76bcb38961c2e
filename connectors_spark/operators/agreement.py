"""Inter-annotator agreement — the label-QC layer of a training-data
pipeline (are the preference / safety / quality labels feeding the
classifiers any good?).

Cohen's kappa (Cohen 1960, two raters) and Fleiss' kappa (Fleiss 1971,
m raters) — both reduced to SINGLE DIVISIONS OF EXACT INTEGERS so the
DuckDB twins hash-match by construction:

    Cohen:   kappa = (n * agree - SUM_c n1c * n2c)
                     / (n * n    - SUM_c n1c * n2c)
    Fleiss:  with S = SUM_items SUM_labels n_ij^2,  T_j = label totals,
             num = (n*m)^2 * (S - n*m)  -  n*m*(m-1) * SUM_j T_j^2
             den = (n*m)^2 * n*m*(m-1)  -  n*m*(m-1) * SUM_j T_j^2
             kappa = num / den
             (the standard (Pbar - Pe)/(1 - Pe) with every ratio
             cleared to a common integer denominator first)

Plan shape: one combine-friendly groupBy per statistic, k-label-sized
frames after the first agg, one scalar row out — nothing grows with
corpus size beyond the initial count pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(df: DataFrame, a_col: str, b_col: str,
                round_to: int = 6) -> DataFrame:
    """One row (n_items, po, pe, kappa) for two raters' label columns.

    po/pe/kappa are each a single division of exact integer sums
    (agreement count, per-label marginal products), so both engines
    round identically. Labels are compared by equality — any orderable
    type works; NULL labels count as their own category only if both
    sides are NULL-equal (they are dropped: a missing label is not an
    agreement)."""
    base = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    base = base.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    counts = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
         .alias("agree"))
    ma = base.groupBy("a").agg(F.count(F.lit(1)).alias("n1"))
    mb = base.groupBy("b").agg(F.count(F.lit(1)).alias("n2"))
    cross = (ma.join(mb, ma["a"] == mb["b"])
             .agg(F.coalesce(F.sum(F.col("n1") * F.col("n2")), F.lit(0))
                  .alias("mprod")))
    j = counts.crossJoin(F.broadcast(cross))
    n, agree, mprod = F.col("n"), F.col("agree"), F.col("mprod")
    return j.select(
        n.alias("n_items"),
        F.round(agree / n, round_to).alias("po"),
        F.round(mprod / (n * n), round_to).alias("pe"),
        F.round((n * agree - mprod).cast("double")
                / (n * n - mprod).cast("double"), round_to)
         .alias("kappa"))


def fleiss_kappa(long_df: DataFrame, item_col: str, label_col: str,
                 round_to: int = 6) -> DataFrame:
    """One row (n_items, m_raters, pbar, pe, kappa) from LONG-form
    annotations (one row per (item, rater) with a label). Every item
    must carry the same rater count m (the fixed-panel Fleiss setting;
    validated — raises on ragged panels via a NULL-poisoned result is
    NOT acceptable here, so the check is explicit)."""
    cells = (long_df.select(F.col(item_col).alias("item"),
                            F.col(label_col).alias("label"))
             .groupBy("item", "label")
             .agg(F.count(F.lit(1)).alias("nij")))
    per_item = cells.groupBy("item").agg(
        F.sum("nij").alias("m"),
        F.sum(F.col("nij") * F.col("nij")).alias("sq"))
    panel = per_item.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("m").alias("m_lo"), F.max("m").alias("m_hi"),
        F.sum("sq").alias("s"))
    totals = cells.groupBy("label").agg(F.sum("nij").alias("tj"))
    tsq = totals.agg(F.sum(F.col("tj") * F.col("tj")).alias("tj2"))
    j = panel.crossJoin(F.broadcast(tsq))
    n, m, s, tj2 = (F.col("n"), F.col("m_lo"), F.col("s"), F.col("tj2"))
    nm = n * m
    denom_p = nm * (m - 1)  # n * m * (m-1)
    # exact-integer clearing of (Pbar - Pe) / (1 - Pe), factored by
    # nm(m-1) to keep magnitudes <= ~n^2 m^3 (int64-exact to ~1e8
    # items; pre-aggregate larger panels per stratum)
    num = (nm * (s - nm) - tj2 * (m - 1)).cast("double")
    den = ((m - 1) * (nm * nm - tj2)).cast("double")
    out = j.select(
        n.alias("n_items"), m.alias("m_raters"),
        F.col("m_hi").alias("_m_hi"),
        F.round((s - nm).cast("double") / denom_p.cast("double"),
                round_to).alias("pbar"),
        F.round(tj2.cast("double") / (nm * nm).cast("double"),
                round_to).alias("pe"),
        F.round(num / den, round_to).alias("kappa"))
    row_probe = out.select("m_raters", "_m_hi").first()
    if row_probe is not None and row_probe["m_raters"] != row_probe["_m_hi"]:
        raise ValueError(
            "fleiss_kappa requires a fixed rater panel: every item must "
            f"have the same rater count (saw {row_probe['m_raters']} and "
            f"{row_probe['_m_hi']})")
    return out.drop("_m_hi")
