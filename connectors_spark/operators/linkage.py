"""Probabilistic record linkage: blocked Fellegi-Sunter scoring.

Public method: Fellegi & Sunter 1969 ("A theory for record linkage")
as popularized by Splink/FEBRL — candidate pairs from BLOCKING
(equi-join on coarse keys; never a full cross product), a boolean
agreement vector per comparison field, and a log-likelihood match
weight

    w = sum_i  log2(m_i / u_i)            if field i agrees
             | log2((1-m_i) / (1-u_i))    if it disagrees

where m_i = P(agree | match) and u_i = P(agree | non-match). This
module scores with FIXED m/u parameters (the deterministic, engine-
twinnable core); EM parameter estimation is a bounded driver loop over
the same agreement-pattern counts and intentionally out of scope here.

LLM-pipeline use: cross-source entity dedup (the same author/user/doc
appearing in two crawls under slightly different rendering) ahead of
leakage-safe splits — string-identity dedup misses these, embedding
near-dup over-merges distinct entities with similar prose.

Reference context: the reference syncs records by exact `_id` identity
(svc sync rules); linkage is the fuzzy-identity generalization a
multi-source corpus needs.

Scale shape: ONE hash equi-join on the blocking key; per-task width is
the block-pair product, so blocking keys must be chosen with bounded
selectivity (documented contract — the Splink convention; add more
blocking passes and union for recall). Scoring is row-local JVM
arithmetic; log2 terms are computed in-engine from the m/u literals so
both engines evaluate the identical IEEE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fellegi_sunter_link(a: DataFrame, b: DataFrame,
                        block_keys: list[str],
                        comparisons: list[dict],
                        min_weight: float | None = None,
                        id_col: str = "rec_id",
                        round_to: int = 6) -> DataFrame:
    """Score blocked candidate pairs between `a` and `b`.

    `comparisons`: [{"name": str, "agree": fn(a_col, b_col) -> bool
    Column OR None to use equality, "col": source column name,
    "m": float, "u": float}]. Both frames must carry `id_col` and
    every comparison/blocking column. Returns
    (a_id, b_id, <name>_agree ..., weight) for pairs with
    weight >= min_weight (None keeps all blocked pairs).
    Self-linkage (a is b) callers should filter a_id < b_id."""
    asel = a.select(F.col(id_col).alias("a_id"),
                    *[F.col(c).alias(f"a_{c}") for c in
                      {k for k in block_keys}
                      | {c["col"] for c in comparisons}])
    bsel = b.select(F.col(id_col).alias("b_id"),
                    *[F.col(c).alias(f"b_{c}") for c in
                      {k for k in block_keys}
                      | {c["col"] for c in comparisons}])
    cond = None
    for k in block_keys:
        e = F.col(f"a_{k}").eqNullSafe(F.col(f"b_{k}"))
        cond = e if cond is None else cond & e
    pairs = asel.join(bsel, cond)

    weight: Column = F.lit(0.0)
    agree_cols = []
    for c in comparisons:
        ac, bc = F.col(f"a_{c['col']}"), F.col(f"b_{c['col']}")
        agree = (c.get("agree") or (lambda x, y: x.eqNullSafe(y)))(ac, bc)
        m, u = float(c["m"]), float(c["u"])
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"{c['name']}: need 0 < u < m < 1")
        # log2 evaluated IN-ENGINE from the same literals on both
        # sides -> identical IEEE doubles
        term = F.when(agree, F.log2(F.lit(m) / F.lit(u))) \
            .otherwise(F.log2(F.lit(1.0 - m) / F.lit(1.0 - u)))
        weight = weight + term
        agree_cols.append(agree.alias(f"{c['name']}_agree"))
    out = pairs.select("a_id", "b_id", *agree_cols,
                       F.round(weight, round_to).alias("weight"))
    if min_weight is not None:
        out = out.filter(F.col("weight") >= min_weight)
    return out
