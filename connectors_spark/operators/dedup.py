"""Deduplication operators for training-data pipelines.

All hot paths are JVM Column expressions (md5 / min / groupBy / join —
whole-stage codegen), no Python UDFs:

- exact_dup_groups: hash-groupBy on normalized text digest.
- minhash_signatures / lsh_candidate_pairs: word-shingle MinHash + banded
  LSH. The "permutation" family is min(md5(i || '|' || shingle)) — md5 hex
  strings compare bytewise-identically in Spark, DuckDB and Python, which
  keeps the DuckDB oracle exact. Banding with (bands, rows_per_band) gives
  the usual S-curve collision probability 1-(1-j^r)^b.
- pair_jaccard: exact shingle-set Jaccard verify for candidate pairs
  (the n-gram Jaccard near-dup measure).
- simhash_bits: tf-weighted 64-bit SimHash, emitted as a '0'/'1' string
  (bitstring avoids int64 sign pitfalls across engines).

Scale notes: minhash signature agg is one groupBy(doc) over the distinct
(doc, shingle) frame; LSH bucket join shuffles on (band_idx, band_hash) —
bucket sizes are bounded by banding, and the pair self-join is on bucket
keys, never a full cross join. Mirrors MinHashLSH literature; nothing in
the reference does dedup (ES handles nothing similar) — this is the
engine-native extension surface (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from connectors_spark.functions.analysis import tokens_col

N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = 4
SHINGLE_N = 3
# band buckets beyond this size switch from all-pairs to star edges
BUCKET_CAP = 1024


def normalized_text(text: Column) -> Column:
    """Canonical text for exact dup: analyzer tokens re-joined."""
    return F.array_join(tokens_col(text), " ")


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_dups, min_doc_id) for groups of exact (normalized)
    duplicates, n_dups >= 2."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.md5(normalized_text(F.col(text_col))).alias("text_md5"),
        )
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_dups") >= 2)
    )


def doc_shingles(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = SHINGLE_N) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Kept as posexplode + doc-partitioned lead() window deliberately: an
    array-side formulation (transform + slice + array_join per
    position, no shuffle) was tried in the r6 optimization round and
    measured 9x SLOWER at sf0.1 — interpreted higher-order-function
    evaluation pays per-element constants that the codegen'd
    explode/window pipeline does not, and the removed exchange was also
    the materialization point exchange-reuse shares between this
    frame's three downstream references (signatures + both Jaccard
    sides)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "t"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, n)]
    sh = toks.select(
        "doc_id", F.concat_ws(" ", *cols).alias("shingle"),
        cols[-1].isNotNull().alias("_full"),
    )
    return sh.filter("_full").select("doc_id", "shingle").distinct()


def minhash_signatures(shingles: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, s0..s{n-1}) — min over md5(i || '|' || shingle)."""
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle")))).alias(f"s{i}")
        for i in range(n_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = BANDS,
                        rows_per_band: int = ROWS_PER_BAND,
                        bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """(doc_a, doc_b) distinct pairs sharing >= 1 LSH band.

    Bucket bound: a band bucket with n <= bucket_cap members emits
    all-pairs (the exact LSH candidate set); a bucket beyond the cap
    switches to STAR edges — every member paired with the bucket's min
    doc_id — turning a potentially O(n^2) self-join blowup into O(n)
    edges. Oversize buckets only arise from big classes of near-identical
    docs (identical ones are collapsed upstream, `minhash_near_dups`), so
    the star + exact-Jaccard verify + transitive clustering downstream is
    the standard recall/cost trade for web-scale dedup; the cap is
    per-bucket so normal corpora are unaffected."""
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"),
                     F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    exploded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bnd")
    ).select("doc_id", "bnd.band_idx", "bnd.band_hash")
    # bucket sizes via groupBy (map-side combine) — never a per-bucket
    # single-task window
    stats = exploded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("_bn"), F.min("doc_id").alias("_rep")
    )
    e2 = exploded.join(stats, ["band_idx", "band_hash"])
    small = e2.filter(F.col("_bn") <= bucket_cap)
    a = small.alias("a")
    b = small.alias("b")
    pairs_small = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    pairs_big = (
        e2.filter((F.col("_bn") > bucket_cap) & (F.col("doc_id") != F.col("_rep")))
        .select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return pairs_small.unionByName(pairs_big).distinct()


def pair_jaccard(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b, jaccard) exact shingle Jaccard."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_a").join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("n_sh", "n_b"), "doc_b")
    )
    return out.select(
        "doc_a", "doc_b", "n_inter", "n_a", "n_b",
        F.round(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
        ).alias("jaccard"),
    )


def minhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """End-to-end: exact-dup collapse -> shingle -> minhash -> bounded
    LSH bands -> exact-Jaccard verify.

    Near-dup pairs are emitted between REPRESENTATIVES of distinct
    normalized texts (min doc_id per text digest). A corpus with millions
    of IDENTICAL documents would otherwise put them all in every band
    bucket and the candidate self-join would go quadratic; identical docs
    are `exact_dup_groups`' output, not near-dup pairs — run exact dedup
    first, then near-dup over distinct texts."""
    reps = (
        df.select(
            F.md5(normalized_text(F.col(text_col))).alias("_h"),
            F.struct(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text")).alias("_s"),
        )
        .groupBy("_h")
        .agg(F.min("_s").alias("_s"))  # min doc_id; O(1) agg state per key
        .select(F.col("_s.doc_id").alias("doc_id"),
                F.col("_s.text").alias("text"))
    )
    sh = doc_shingles(reps, "text", "doc_id")
    sigs = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sigs, bucket_cap=bucket_cap)
    return pair_jaccard(pairs, sh)


def simhash_bits(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash as a '0'/'1' bitstring.

    Bit j of md5(term): hex char j//4, nibble bit 3-j%4. Contribution
    tf * (2*bit - 1); sign of the sum sets the output bit.
    """
    tf = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    # shiftright with a column shift amount needs the SQL form
    bit = F.expr(
        "shiftright(instr('0123456789abcdef', substring(h, cast(j / 4 as int) + 1, 1)) - 1, "
        "cast(3 - j % 4 as int)) % 2"
    )
    contrib = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        "tf", "h",
    ).select(
        "doc_id", "j",
        (F.col("tf") * (bit * 2 - 1)).alias("c"),
    )
    per_bit = contrib.groupBy("doc_id", "j").agg(
        F.when(F.sum("c") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bc")
    )
    return per_bit.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "bc"))), lambda s: s["bc"]
            ),
            "",
        ).alias("simhash")
    )


def connected_components(edges: DataFrame, max_iter: int = 25,
                         local_edge_budget: int = 500_000) -> DataFrame:
    """(doc_id, component) — component = min doc_id reachable over the
    undirected edge set (doc_a, doc_b).

    Small-graph fast path: duplicate graphs are tiny relative to the
    corpus (one edge per detected dup pair, already star-capped by
    lsh_candidate_pairs), and each distributed label-propagation round
    costs several fixed-overhead join jobs. When the distinct edge
    count fits `local_edge_budget` the closure runs as driver-side
    union-find instead (exact same min-label result; the min per
    component is order-identical because UTF-8 byte order equals
    code-point order) — the same documented budget-routing pattern as
    IndexReader.topk_local. The budget bounds driver memory by
    contract (~500k edges ≈ tens of MB of ids); beyond it, the
    distributed path below is unchanged.

    Distributed path — min-label propagation: every vertex starts
    labeled with itself; each round takes least(own label, min over
    neighbor labels) until a round changes nothing. Converges in
    O(diameter) rounds — dedup graphs are unions of near-cliques and
    star-capped buckets, so diameter is small by construction;
    `max_iter` bounds adversarial chains. Each round is one
    broadcast-free shuffle join + groupBy-min (map-side combine) with
    the changed-count riding the same job via Observation; the driver
    loop carries only the converged flag, never data (GraphX / Kiveris
    et al., "Connected Components in MapReduce and Beyond").
    """
    und = edges.select("doc_a", "doc_b").distinct().persist()
    n_edges = und.count()
    if n_edges <= local_edge_budget:
        try:
            import pandas as _pd

            pairs = und.toPandas()
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
            verts = set(pairs["doc_a"]) | set(pairs["doc_b"])
            comp_min: dict = {}
            for v in verts:
                r = find(v)
                m = comp_min.get(r)
                if m is None or v < m:
                    comp_min[r] = v
            out = _pd.DataFrame({
                "doc_id": list(verts),
                "component": [comp_min[find(v)] for v in verts],
            })
            ft = dict(edges.dtypes)["doc_a"]
            return edges.sparkSession.createDataFrame(
                out, schema=f"doc_id {ft}, component {ft}")
        finally:
            und.unpersist()
    sym = und.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    und.unpersist()
    labels = (
        sym.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("comp", F.col("doc_id")).persist()
    )
    try:
        from pyspark.sql import Observation

        for it in range(max_iter):
            nbr = (
                sym.join(
                    labels.select(F.col("doc_id").alias("dst"),
                                  F.col("comp").alias("nc")), "dst")
                .groupBy("src").agg(F.min("nc").alias("nbr_comp"))
                .withColumnRenamed("src", "doc_id")
            )
            # the changed-label count rides the SAME job that
            # materializes the round's labels (Observation on the
            # persist-filling count) — one job per round, not a second
            # join-and-count pass against the previous labels
            obs = Observation(f"cc_round_{it}")
            new = (
                labels.join(nbr, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(F.col("comp"),
                            F.coalesce("nbr_comp", F.col("comp")))
                    .alias("comp"),
                    (F.coalesce("nbr_comp", F.col("comp"))
                     < F.col("comp")).alias("_chg"),
                )
                .observe(obs, F.sum(F.col("_chg").cast("long")).alias("n"))
                .drop("_chg")
                .persist()
            )
            new.count()
            changed = int(obs.get["n"] or 0)
            labels.unpersist()
            labels = new
            if changed == 0:
                break
        return labels.select("doc_id", F.col("comp").alias("component"))
    finally:
        sym.unpersist()


def dedup_clusters(df: DataFrame, jaccard_threshold: float = 0.5,
                   text_col: str = "text", id_col: str = "doc_id",
                   bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """(doc_id, component, is_canonical) duplicate CLUSTERS with a
    canonical-doc election — the step after pairwise near-dup detection
    that a keep-one-per-cluster corpus clean actually needs: transitive
    closure over (a) exact-dup star edges (every doc -> its normalized-
    text group's min doc_id) and (b) Jaccard-verified near-dup pairs
    between group representatives (minhash_near_dups). component = min
    doc_id in the cluster; is_canonical = 1 for the kept doc (the
    member equal to the component id), 0 for the drops. Docs with no
    duplicate edge do not appear (they are trivially canonical)."""
    base = df.select(
        F.md5(normalized_text(F.col(text_col))).alias("_h"),
        F.col(id_col).alias("doc_id"),
    )
    grp = base.groupBy("_h").agg(F.min("doc_id").alias("_rep"))
    star = (
        base.join(grp, "_h")
        .filter(F.col("doc_id") != F.col("_rep"))
        .select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    near = (
        minhash_near_dups(df, text_col, id_col, bucket_cap=bucket_cap)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(star.unionByName(near))
    return comps.select(
        "doc_id", "component",
        F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0)
        .cast("int").alias("is_canonical"),
    )


def dup_span_stats(df: DataFrame, window: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_windows, n_dup, dup_frac): exact duplicate-SPAN signal
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every stride-1 window of `window` tokens is hashed; a
    window duplicated anywhere in the corpus (global occurrence count
    >= 2, within- or cross-doc) marks its position as memorization-risk
    text. Per doc: total windows, duplicated windows, duplicated
    fraction. Docs shorter than `window` tokens have no window and are
    absent.

    Plan: one tokenize pass, windows via JVM sequence/slice (no UDF),
    md5 BEFORE the shuffle so the agg key is fixed-width, ONE window-
    keyed groupBy for global counts (map-side combine), one broadcast-
    free join back, one doc-keyed agg. Window hashes are Zipf-skewed at
    100 TB exactly like hot terms — the count agg combines map-side, and
    the join key is (hash) so AQE skew-split applies."""
    toks = tokens_col(F.col(text_col))
    W = int(window)
    nw = (F.size(toks) - F.lit(W - 1)).cast("int")
    # guard INSIDE the projection: sequence(0, n) with n < 0 generates a
    # DESCENDING range, not an empty one, and the filter below runs
    # after this expression is computed for every row
    win_arr = F.when(nw > 0, F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i + 1, W), " ")),
    )).otherwise(F.array().cast("array<string>"))
    wins = (
        df.select(F.col(id_col).alias("doc_id"), nw.alias("_nw"),
                  win_arr.alias("_w"))
        .filter(F.col("_nw") > 0)  # sequence guard: short docs drop
        .select("doc_id", F.explode("_w").alias("wh"))
    )
    counts = wins.groupBy("wh").agg(F.count(F.lit(1)).alias("_n"))
    return (
        wins.join(counts, "wh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("_n") >= 2, 1).otherwise(0))
            .cast("long").alias("n_dup"),
        )
        .select(
            "doc_id", "n_windows", "n_dup",
            F.round(F.col("n_dup") / F.col("n_windows"), 6).alias("dup_frac"),
        )
    )


def line_dedup(df, line_tokens: int = 12, text_col: str = "text",
               doc_id_col: str = "doc_id"):
    """(doc_id, n_lines, n_kept, cleaned_md5): C4-style LINE-level exact
    deduplication — the corpus-cleaning step between whole-doc dedup and
    n-gram near-dup: boilerplate lines (headers, navigation, license
    blocks) repeat across documents that are NOT duplicates of each
    other. Docs are segmented into fixed `line_tokens`-token windows
    ("lines"); a line's FIRST global occurrence (doc_id ASC, line_no
    ASC) is kept, every later exact repeat is dropped; the doc's
    cleaned text is the kept lines re-joined in order (md5 here so the
    gate stays narrow).

    Plan: one tokenize pass, line windows built with JVM higher-order
    functions (sequence/slice/array_join — no UDF), ONE shuffle keyed
    on the line string for the first-occurrence window, one doc-keyed
    agg for recomposition. Line strings are the shuffle key, so the
    Zipf head (empty/boilerplate lines) is the skew to watch at 100 TB
    — salt or pre-filter ubiquitous lines exactly as the df-capped
    shard strategy does for hot terms."""
    from pyspark.sql import Window
    from connectors_spark.functions.analysis import tokens_col

    toks = tokens_col(F.col(text_col))
    L = int(line_tokens)
    n_lines = F.ceil(F.size(toks) / F.lit(float(L))).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(toks, i * L + 1, L), " "),
    )
    lines = (
        df.select(F.col(doc_id_col).alias("doc_id"),
                  n_lines.alias("_nl"), lines_arr.alias("_lines"))
        .filter(F.col("_nl") > 0)  # sequence(0,-1) guard on empty docs
        .select("doc_id", F.posexplode("_lines").alias("line_no", "line"))
    )
    w = Window.partitionBy("line").orderBy(F.asc("doc_id"), F.asc("line_no"))
    flagged = lines.withColumn("_rn", F.row_number().over(w))
    return (
        flagged.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("long").alias("n_kept"),
            F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("_rn") == 1,
                        F.struct("line_no", "line")))),
                    lambda s: s["line"],
                ), " ")).alias("cleaned_md5"),
        )
    )


def dup_span_excise(df: DataFrame, window: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_excised, n_spans, kept_frac): duplicate-span
    EXCISION accounting — the removal step of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), which
    cuts every repeated substring but keeps one global copy. Every
    stride-1 window of `window` tokens is hashed; a window occurrence is
    excised iff the same window text appears EARLIER in the corpus
    (global first occurrence by (doc_id, pos) is kept — keep-first).
    Overlapping/adjacent excised windows merge into maximal spans
    (gaps-and-islands); `n_excised` counts covered token positions,
    `n_spans` the merged spans, `kept_frac` the surviving fraction.
    Docs shorter than `window` tokens have no window and report zero
    excision.

    Plan: one tokenize pass; fixed-width md5 BEFORE the shuffle; ONE
    window-hash-keyed window function for the global first-occurrence
    rank (same key as dup_span_stats' count agg — Zipf-skewed like hot
    terms, AQE skew-split applies); then everything else is PARTITIONED
    BY doc (lag + cumsum islands) — no global window, no UDF, no
    collect. At 100 TB the only corpus-wide exchange is the window-hash
    shuffle, identical in shape to the detection pass."""
    toks = tokens_col(F.col(text_col))
    W = int(window)
    nw = (F.size(toks) - F.lit(W - 1)).cast("int")
    win_arr = F.when(nw > 0, F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i + 1, W), " ")),
    )).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.size(toks).cast("long").alias("n_tokens"),
                     nw.alias("_nw"), win_arr.alias("_w"))
    wins = (base.filter(F.col("_nw") > 0)
            .select("doc_id", F.posexplode("_w").alias("pos", "wh")))
    # global keep-first: rank within window-hash by (doc_id, pos)
    first_w = Window.partitionBy("wh").orderBy(F.asc("doc_id"),
                                               F.asc("pos"))
    excise = (wins.withColumn("_rn", F.row_number().over(first_w))
              .filter(F.col("_rn") >= 2)
              .select("doc_id", "pos"))
    # gaps-and-islands per doc: windows sorted by pos merge while the
    # next start is within W of the previous (coverage stays contiguous)
    doc_w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (excise
           .withColumn("_brk", F.when(
               F.col("pos") - F.lag("pos").over(doc_w) <= W, 0)
               .otherwise(1))
           .withColumn("_isl", F.sum("_brk").over(
               doc_w.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow))))
    spans = (isl.groupBy("doc_id", "_isl")
             .agg(F.min("pos").alias("_s"), F.max("pos").alias("_e")))
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("_e") - F.col("_s") + W).cast("long")
        .alias("n_excised"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )
    return (base.select("doc_id", "n_tokens")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                F.coalesce("n_excised", F.lit(0)).cast("long")
                .alias("n_excised"),
                F.coalesce("n_spans", F.lit(0)).cast("long")
                .alias("n_spans"),
                F.when(F.col("n_tokens") > 0, F.round(
                    (F.col("n_tokens")
                     - F.coalesce("n_excised", F.lit(0)))
                    / F.col("n_tokens"), 6)).otherwise(F.lit(1.0))
                .alias("kept_frac"),
            ))


def conv_prefix_dup_groups(turns: DataFrame, prefix_turns: int = 2,
                           conv_col: str = "conv_id",
                           turn_col: str = "turn_idx",
                           text_col: str = "text") -> DataFrame:
    """Conversation-prefix deduplication over multi-turn transcripts
    (the north-rule input shape): conversations whose first
    `prefix_turns` turns are textually identical are one dup group —
    the transcript-native analog of shared-document-prefix dup groups
    (same template/system-prompt fan-out, retried agent sessions,
    branchy sampling trees that share a root).

    Keeps the LONGEST conversation per group (most turns; min conv_id
    tie-break) as canonical. Returns only conversations in groups of
    >=2: (conv_id, canon_conv_id, n_turns, dup_group_size, is_canon).

    Scale shape: the prefix key is an md5 computed AFTER the per-conv
    groupBy (one shuffle on conv_id, combine-friendly), so the wide
    text column collapses to a 32-char digest BEFORE the second
    (key-hash) shuffle; group stats are one window over groups that
    are template-bounded, never corpus-bounded.
    """
    per_conv = (
        turns.where(F.col(turn_col) < prefix_turns)
        .groupBy(conv_col)
        .agg(F.md5(F.concat_ws(
            "\x1f",
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col(turn_col), F.col(text_col).alias("t")))),
                lambda s: s["t"]),
        )).alias("prefix_key"))
    )
    n_turns = turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"))
    keyed = per_conv.join(n_turns, conv_col)
    wg = Window.partitionBy("prefix_key")
    wr = Window.partitionBy("prefix_key").orderBy(
        F.col("n_turns").desc(), F.col(conv_col))
    ranked = (
        keyed
        .withColumn("dup_group_size", F.count(F.lit(1)).over(wg))
        .withColumn(
            "canon_conv_id",
            F.min(
                F.when(F.row_number().over(wr) == 1, F.col(conv_col))
            ).over(wg))
    )
    return (
        ranked.where(F.col("dup_group_size") >= 2)
        .select(
            F.col(conv_col).alias("conv_id"),
            "canon_conv_id", "n_turns",
            F.col("dup_group_size").cast("long").alias("dup_group_size"),
            (F.col(conv_col) == F.col("canon_conv_id"))
            .cast("int").alias("is_canon"),
        )
    )


LSH_CURVE_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))


def lsh_recall_curve(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     jaccard_threshold: float = 0.5,
                     configs: tuple = LSH_CURVE_CONFIGS,
                     round_to: int = 6) -> DataFrame:
    """Recall curve of MinHash-LSH banding configurations — the dedup
    twin of ann_recall_curve: makes the bands x rows trade-off
    AUDITABLE instead of folklore. For each (bands, rows_per_band)
    over the same n_hashes = bands*rows budget, the probability a pair
    at Jaccard J is caught is 1-(1-J^r)^b — more rows per band means
    fewer false candidates but misses more true near-dups; this
    operator measures the realized recall on THIS corpus.

    Truth set: pairs caught by the most sensitive banding (1 row per
    band — any agreeing hash) whose EXACT shingle Jaccard clears the
    threshold, computed with the uncapped candidate join (recall is
    relative to the 1-row banding, the standard practical ceiling:
    exact all-pairs truth is quadratic and this audit is meant to run
    on a bounded sample at 100 TB — documented, not hidden).
    Detection for each config is a pure signature comparison (OR over
    bands of AND over rows), so no second LSH pass is needed.

    Returns one row per config: (bands, rows_per_band, n_truth_pairs,
    n_detected, recall) — recall a single division of exact counts.
    The exact-dup collapse runs first (minhash_near_dups' rep
    convention), so identical docs never inflate the curve."""
    n_hashes = configs[0][0] * configs[0][1]
    for b, r in configs:
        if b * r != n_hashes:
            raise ValueError("all configs must share one hash budget")
    reps = (
        df.select(
            F.md5(normalized_text(F.col(text_col))).alias("_h"),
            F.struct(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text")).alias("_s"),
        )
        .groupBy("_h").agg(F.min("_s").alias("_s"))
        .select(F.col("_s.doc_id").alias("doc_id"),
                F.col("_s.text").alias("text"))
    )
    sh = doc_shingles(reps, "text", "doc_id")
    sigs = minhash_signatures(sh, n_hashes=n_hashes)
    widest = max(configs, key=lambda c: c[0])
    cand = lsh_candidate_pairs(sigs, bands=widest[0],
                               rows_per_band=widest[1],
                               bucket_cap=2 ** 62)
    truth = (pair_jaccard(cand, sh)
             .filter(F.col("jaccard") >= jaccard_threshold)
             .select("doc_a", "doc_b"))
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     *[F.col(f"s{i}").alias(f"a{i}")
                       for i in range(n_hashes)])
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     *[F.col(f"s{i}").alias(f"b{i}")
                       for i in range(n_hashes)])
    j = truth.join(sa, "doc_a").join(sb, "doc_b")

    def detected(bands: int, rows: int):
        band_hits = []
        for b in range(bands):
            eqs = [F.col(f"a{b * rows + r}") == F.col(f"b{b * rows + r}")
                   for r in range(rows)]
            conj = eqs[0]
            for e in eqs[1:]:
                conj = conj & e
            band_hits.append(conj)
        disj = band_hits[0]
        for h in band_hits[1:]:
            disj = disj | h
        return disj

    cfg_structs = [
        F.struct(F.lit(b).alias("bands"), F.lit(r).alias("rows_per_band"),
                 detected(b, r).cast("long").alias("det"))
        for b, r in configs
    ]
    exploded = j.select(F.explode(F.array(*cfg_structs)).alias("c")) \
        .select("c.bands", "c.rows_per_band", "c.det")
    return (exploded.groupBy("bands", "rows_per_band")
            .agg(F.count(F.lit(1)).alias("n_truth_pairs"),
                 F.sum("det").alias("n_detected"))
            .select("bands", "rows_per_band",
                    F.col("n_truth_pairs").cast("long")
                    .alias("n_truth_pairs"),
                    F.col("n_detected").cast("long").alias("n_detected"),
                    F.round(F.col("n_detected").cast("double")
                            / F.col("n_truth_pairs").cast("double"),
                            round_to).alias("recall")))


def cross_source_overlap(df: DataFrame, prefix_len: int = 8,
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Cross-source boilerplate/template contamination matrix:
    (src_a, src_b, n_shared) = how many distinct normalized first-
    `prefix_len`-token prefixes occur in BOTH sources (src_a < src_b).
    The mix-curation diagnostic behind per-pair dedup budgets: source
    pairs sharing many templates double-count content when both are
    upsampled (the conv-prefix / prefix_dup_groups key, aggregated to
    the source level).

    Shape: distinct on (prefix, source) with map-side combine, ONE
    prefix-keyed collect_set (values are source labels — bounded by
    the source catalog, not the corpus), then per-key pair expansion
    via higher-order exprs (the facet_adjacency_matrix idiom: never a
    corpus self-join) and a tiny (src_a, src_b) agg."""
    from connectors_spark.functions.analysis import tokens_col

    key = F.array_join(
        F.slice(tokens_col(F.col(text_col)), 1, prefix_len), " ")
    ks = (df.select(key.alias("k"), F.col(source_col).alias("source"))
          .filter(F.col("k") != "")
          .distinct()
          .groupBy("k")
          .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
          .filter(F.size("srcs") >= 2))
    pairs = ks.select(F.explode(F.flatten(F.transform(
        F.col("srcs"),
        lambda a, i: F.transform(
            F.slice(F.col("srcs"), i + F.lit(2),
                    F.greatest(F.size("srcs") - i - 1, F.lit(0))),
            lambda b: F.struct(a.alias("src_a"), b.alias("src_b")))))
    ).alias("p"))
    return (pairs.select("p.src_a", "p.src_b")
            .groupBy("src_a", "src_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
