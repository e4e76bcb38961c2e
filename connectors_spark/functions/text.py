"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM Column expressions (codegen'd); each has an exact DuckDB SQL
twin in entry_queries.py. The heuristics are deliberately simple,
deterministic re-implementations of the standard recipes (stopword-marker
language ID, length/punct/stopword quality features, whitespace + 4-char
subword token estimate, min-hash-of-character-8-grams fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from connectors_spark.functions.analysis import ENGLISH_STOP, tokens_col

# function-word marker sets (ASCII-only: the analyzer strips accents, so
# only accent-free markers can ever match). The DuckDB lang_id oracle is
# generated from this SAME dict (entry_queries._lang_id_sql), so engine
# and oracle stay in lockstep by construction.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "a", "is", "and", "of", "to", "in"],
    "es": ["el", "los", "las", "y", "es", "que", "un"],
    "fr": ["le", "les", "et", "est", "que", "une", "dans"],
    "it": ["il", "la", "che", "di", "e", "per", "sono"],
    "nl": ["de", "het", "een", "van", "en", "niet", "zijn"],
    "pt": ["o", "os", "as", "de", "que", "um", "uma"],
    "sv": ["och", "att", "det", "som", "jag", "inte", "en"],
}

FINGERPRINT_NGRAM = 8


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, n_hits) — argmax marker hits, ties lang ASC,
    zero hits -> 'und' (undetermined)."""
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, m) for lang, ms in sorted(LANG_MARKERS.items()) for m in ms],
        "lang string, term string",
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    hits = (
        toks.join(F.broadcast(markers), "term")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("lang"))
    best = hits.withColumn("r", F.row_number().over(w)).filter("r = 1")
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     extra_cols: list[str] | None = None) -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio, quality).

    quality = clamp01(0.3*len_score + 0.4*stop_score + 0.3*tok_score):
      len_score  = least(1, n_tokens/100)
      stop_score = 1 - |stopword_ratio - 0.4| / 0.4  (clamped at 0)
      tok_score  = 1 - |mean_token_len - 5| / 5      (clamped at 0)
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*ENGLISH_STOP)))
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_len = F.when(n_tokens > 0, total_len / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    stop_score = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(stop_ratio - 0.4) / F.lit(0.4)
    )
    tok_score = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(mean_len - 5.0) / F.lit(5.0)
    )
    quality = 0.3 * len_score + 0.4 * stop_score + 0.3 * tok_score
    # extra_cols ride the same single projection (no join-back needed
    # by callers that still want the raw text beside the features)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
        *[F.col(c) for c in (extra_cols or [])],
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_tokens, n_subwords) — whitespace split,
    analyzer tokens, and a BPE-ish ceil(len/4) subword estimate."""
    text = F.col(text_col)
    toks = tokens_col(text)
    ws = F.filter(F.split(text, " "), lambda t: t != "")
    n_subwords = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        n_subwords.cast("long").alias("n_subwords"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", n: int = FINGERPRINT_NGRAM) -> DataFrame:
    """(doc_id, fp) — min md5 over character n-grams of lower(text);
    short/empty text falls back to md5(lower(text)). A winnowing-style
    content fingerprint robust to local edits."""
    low = F.lower(F.col(text_col))
    grams = F.expr(
        f"transform(sequence(1, greatest(0, length(lower({text_col})) - {n - 1})), "
        f"i -> md5(substr(lower({text_col}), i, {n})))"
    )
    fp = F.when(F.length(low) >= n, F.array_min(grams)).otherwise(F.md5(low))
    return df.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))


def highlight_snippets(docs: DataFrame, qterms: DataFrame, window: int = 30,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(query_id, doc_id, pos, snippet) — ES plain-highlighter analog:
    the FIRST occurrence of any query term in the raw text
    (case-insensitive substring, like the plain highlighter over
    unanalyzed source), cut to ±window chars. Pure JVM expressions: one
    broadcast of (query_id, term), instr per (doc, term), min-position
    per (query, doc), one substring. qterms: (query_id, term)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.lower(F.col(text_col)).alias("_lt"),
    )
    hits = (
        base.join(F.broadcast(qterms.select("query_id", "term")))
        .withColumn("_pos", F.instr(F.col("_lt"), F.col("term")))
        .filter(F.col("_pos") > 0)
        .groupBy("query_id", "doc_id")
        .agg(F.min("_pos").alias("pos"))
    )
    return (
        hits.join(base.select("doc_id", "_text"), "doc_id")
        .select(
            "query_id", "doc_id", "pos",
            F.substring(
                F.col("_text"),
                F.greatest(F.lit(1), F.col("pos") - F.lit(window)),
                F.lit(2 * window),
            ).alias("snippet"),
        )
    )


def significant_terms(df: DataFrame, fg: Column, text_col: str = "text",
                      doc_id_col: str = "doc_id", top_n: int = 15,
                      round_to: int = 6) -> DataFrame:
    """(term, fg_df, bg_df, score): the ES significant_terms aggregation
    — terms over-represented in the FOREGROUND doc set (`fg` boolean
    Column) vs the whole corpus, scored with ES's JLH heuristic
    (public): (fg% - bg%) * (fg% / bg%). Ties (score DESC, term ASC),
    top_n kept. Plan: one tokenize pass, per-term df aggregated with a
    conditional count for the foreground (map-side combined — the fg
    flag rides the token rows, so there is ONE shuffle keyed on term,
    no separate foreground scan). The reference delegates this agg to
    ES after sync (es/sink.py:212-248); significant-term surfacing is
    also the classic corpus-drift probe for training-data pipelines."""
    from connectors_spark.functions.analysis import tokenize

    flagged = df.withColumn("_fg", fg)
    toks = tokenize(flagged, text_col, doc_id_col).join(
        flagged.select(F.col(doc_id_col).alias("doc_id"), "_fg"), "doc_id"
    )
    per_term = (
        toks.select("term", "doc_id", "_fg").distinct()
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("bg_df"),
            F.sum(F.when(F.col("_fg"), 1).otherwise(0)).alias("fg_df"),
        )
        .filter(F.col("fg_df") > 0)
    )
    totals = flagged.agg(
        F.count(F.lit(1)).alias("_bg_n"),
        F.sum(F.when(F.col("_fg"), 1).otherwise(0)).alias("_fg_n"),
    )
    fg_pct = F.col("fg_df") / F.col("_fg_n")
    bg_pct = F.col("bg_df") / F.col("_bg_n")
    scored = per_term.crossJoin(F.broadcast(totals)).select(
        "term", "fg_df", "bg_df",
        F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), round_to).alias("score"),
    )
    # top-n via orderBy+limit => TakeOrderedAndProject: per-partition
    # heaps + tiny driver merge, NOT a single-task global window (the
    # scored frame is vocabulary-sized, which at 10^12 docs is billions
    # of rows)
    return (
        scored.orderBy(F.desc("score"), F.asc("term"))
        .limit(top_n)
        .select("term", "fg_df", "bg_df", "score")
    )


def significant_text(df: DataFrame, fg: Column, text_col: str = "text",
                     doc_id_col: str = "doc_id", top_n: int = 15,
                     round_to: int = 6,
                     filter_duplicate_text: bool = True) -> DataFrame:
    """(term, fg_df, bg_df, score): the ES significant_text aggregation —
    significant_terms semantics over a FREE-TEXT field, re-analyzed on
    the fly, with ES's filter_duplicate_text behavior: exact-duplicate
    texts (boilerplate, retweets) are collapsed to one representative
    doc (lowest doc_id) BEFORE frequency counting, so copy-pasted
    content cannot fake significance. The foreground is typically the
    hit set of a query (`fg` boolean Column). One md5-keyed dedup
    window + the significant_terms single term-keyed shuffle."""
    from pyspark.sql import Window

    base = df
    if filter_duplicate_text:
        w = Window.partitionBy(F.md5(F.col(text_col))) \
            .orderBy(F.asc(doc_id_col))
        base = base.withColumn("_dup_rn", F.row_number().over(w)) \
            .filter(F.col("_dup_rn") == 1).drop("_dup_rn")
    return significant_terms(base, fg, text_col, doc_id_col, top_n, round_to)


# Training-data scrubbing: the classic pre-training PII pass. Patterns
# deliberately conservative + engine-portable (same semantics in Java
# regex and DuckDB/RE2 — no lookarounds, no backrefs).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Adds `out_col` (text with emails/URLs/IPs replaced by typed
    placeholder tokens) and one `n_<kind>` count column per pattern —
    pure JVM regexp_replace/regexp_extract_all chain, whole-stage
    codegen'd; order (email -> url -> ip) is fixed so counts compose
    deterministically (each count is taken on the text AFTER the
    previous kinds were replaced)."""
    out = df
    cleaned = F.col(text_col)
    for kind, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(cleaned, F.lit(pat), F.lit(0))),
        )
        cleaned = F.regexp_replace(cleaned, pat, token)
    return out.withColumn(out_col, cleaned)


def ngram_counts(df: DataFrame, n: int = 2, text_col: str = "text",
                 top_n: int = 20) -> DataFrame:
    """(ngram, n_occurrences): corpus-level adjacent word n-gram counts,
    top_n by (count DESC, ngram ASC) — the LM-training corpus statistic.
    Token n-grams are built INSIDE the tokens array (one transform per
    row, no position self-join), counted with a map-side-combined
    groupBy, selected with distributed TakeOrdered."""
    arr = tokens_col(F.col(text_col))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short docs
    grams = F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(top_n)
    )


def _doc_grams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) — adjacent token n-grams per doc, built inside the
    tokens array (one transform per row, no position self-join)."""
    arr = tokens_col(F.col(text_col))
    grams = F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(grams).alias("gram"))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       round_to: int = 6) -> DataFrame:
    """Gopher-style per-document repetition quality signals (Rae et al.
    2021 §A1.1, public): LM pretraining corpora drop documents dominated
    by repeated content. Token-fraction variants (the paper uses
    character fractions; token fractions are the standard proxy when the
    tokenizer is fixed — documented delta):

    - top_word_frac:  occurrences of the most frequent token / n_tokens
    - top_2gram_frac: tokens covered by the most frequent 2-gram
                      (2 * count) / n_tokens
    - dup_3gram_frac: tokens covered by 3-grams occurring more than
                      once: sum(3 * count | count > 1) / n_tokens,
                      capped at 1.0 (overlapping grams can over-count)

    Scale shape: each metric is groupBy(id, gram) -> groupBy(id) — two
    hash shuffles keyed by the doc id, partial-aggregated map-side; no
    window over raw tokens, no driver collects. Zero-token docs emit
    0.0 for every fraction."""
    def _per_doc(n: int, dup: bool, out: str) -> DataFrame:
        g = _doc_grams(df, n, text_col, id_col)
        cnt = g.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
        if dup:
            covered = F.sum(F.when(F.col("c") > 1, F.col("c") * n)
                            .otherwise(F.lit(0)))
        else:
            covered = F.max("c") * n
        return cnt.groupBy(id_col).agg(covered.alias(out))

    base = df.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w1 = _per_doc(1, False, "_t1")
    w2 = _per_doc(2, False, "_t2")
    d3 = _per_doc(3, True, "_d3")
    out = (
        base.join(w1, id_col, "left").join(w2, id_col, "left")
        .join(d3, id_col, "left")
    )

    def frac(c):
        # coalesce the DIVISION before least: least() skips nulls in
        # both Spark and DuckDB, so least(1.0, null) would turn a
        # zero-token doc into 1.0 instead of 0.0
        ratio = F.coalesce(
            F.coalesce(c, F.lit(0))
            / F.nullif(F.col("n_tokens"), F.lit(0)),
            F.lit(0.0),
        )
        return F.round(F.least(F.lit(1.0), ratio), round_to)

    return out.select(
        F.col(id_col), "n_tokens",
        frac(F.col("_t1")).alias("top_word_frac"),
        frac(F.col("_t2")).alias("top_2gram_frac"),
        frac(F.col("_d3")).alias("dup_3gram_frac"),
    )


def contamination_overlap(df: DataFrame, eval_filter,
                          n: int = 5, text_col: str = "text",
                          id_col: str = "doc_id",
                          round_to: int = 6,
                          broadcast_eval: bool = True) -> DataFrame:
    """Train/eval contamination check (the n-gram overlap audit every
    serious pretraining pipeline runs — e.g. GPT-3 appendix C, public):
    for each candidate document NOT in the eval set, the fraction of its
    DISTINCT token n-grams that also occur anywhere in the eval set.

    -> (id, n_grams, n_hit, overlap_frac). Scale shape: the eval-set
    gram table is distinct-deduped and (being the small side) broadcast
    into a left-semi-style hit count — candidates' grams never shuffle
    against each other, only against the eval grams; with a huge eval
    set the join degrades gracefully to a hash shuffle on `gram`."""
    evl = df.filter(eval_filter)
    cand = df.filter(~eval_filter)
    eg = _doc_grams(evl, n, text_col, id_col).select("gram").distinct()
    cg = _doc_grams(cand, n, text_col, id_col).distinct()
    # eval sets are typically tiny vs the corpus -> broadcast by
    # default; pass broadcast_eval=False when the eval-gram table
    # outgrows executor memory (plain hash join on `gram` instead)
    eg_marked = eg.withColumn("_hit", F.lit(1))
    if broadcast_eval:
        eg_marked = F.broadcast(eg_marked)
    hits = (
        cg.join(eg_marked, "gram", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"))
    )
    base = cand.select(F.col(id_col))
    return (
        base.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit") / F.nullif(F.col("n_grams"),
                                                     F.lit(0)),
                           F.lit(0.0)),
                round_to,
            ).alias("overlap_frac"),
        )
    )


def soundex_py(w: str) -> str:
    """American Soundex (the public algorithm: Knuth TAoCP vol.3 /
    US census rules): first letter + consonant class digits, vowels
    reset the repeat-collapse, H/W are transparent (Ashcraft -> A261,
    Tymczak -> T522, Pfister -> P236 — all verified against the JVM
    implementation Spark exposes as F.soundex). The DuckDB oracle for
    the phonetic gate embeds THIS function's output as literals, so
    the gate cross-checks two independent implementations (JVM vs
    Python), not one function against itself."""
    w = "".join(c for c in w.upper() if c.isalpha())
    if not w:
        return ""
    codes = {**{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
             **{c: "3" for c in "DT"}, "L": "4", **{c: "5" for c in "MN"},
             "R": "6"}
    out = [w[0]]
    prev = codes.get(w[0], "")
    for c in w[1:]:
        code = codes.get(c, "")
        if c in "HW":
            continue  # transparent: do not reset prev
        if code and code != prev:
            out.append(code)
        prev = code
    return ("".join(out) + "000")[:4]


def ngram_lm_score(df, text_col: str = "text", id_col: str = "doc_id",
                   add_k: float = 0.5, round_to: int = 6):
    """(doc_id, n_bigrams, avg_log2p): bigram language-model quality
    score — the CCNet/KenLM-style perplexity-proxy filter (Wenzek et
    al. 2020 §3.3) with the corpus itself as training data (standard
    for RELATIVE outlier filtering: repetitive/boilerplate docs score
    high, garbled docs score low): per doc, the mean log2 of add-k-
    smoothed transition probabilities P(w2 | w1) = (c(w1 w2) + k) /
    (c(w1) + k*V). Docs with fewer than 2 tokens have no transition and
    are absent.

    Plan: ONE tokenize pass; bigrams built with JVM array slicing
    (zip_with over the shifted array — no per-doc window, no UDF);
    bigram and unigram counts are map-side-combined aggs; V rides a
    1-row broadcast. The Zipf head of bigram keys is the usual skew —
    AQE skew-join handles the count join at 100 TB."""
    from pyspark.sql import functions as F
    from connectors_spark.functions.analysis import tokens_col

    toks = tokens_col(F.col(text_col))
    big = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = (
        df.select(F.col(id_col).alias("doc_id"), big.alias("_b"))
        .filter(F.size("_b") > 0)
        .select("doc_id", F.explode("_b").alias("bigram"))
        .withColumn("w1", F.split("bigram", " ").getItem(0))
    )
    uni = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w1"))
        .groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    )
    bic = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    scored = (
        pairs.join(bic, "bigram")
        .join(uni, "w1")  # vocab-sized: let AQE pick broadcast vs shuffle
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log2((F.col("c2") + add_k)
                   / (F.col("c1") + add_k * F.col("v"))).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), round_to).alias("avg_log2p"),
    )


def ngram_novelty(df: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty_frac) — per document, the
    fraction of its DISTINCT n-grams whose corpus-wide first occurrence
    (min doc id) is this document. A diversity/memorization probe for
    training mixes: near-duplicate and boilerplate-heavy corpora show
    collapsing novelty curves when docs are ordered by ingest id.

    Shape: distinct (doc, gram) → gram-keyed min-id agg (map-side
    combinable) → one gram-keyed join back — both shuffles linear in
    the gram stream, never all-pairs. Docs with fewer than n tokens
    report 0 grams / 0.0 novelty (kept, not dropped)."""
    grams = _doc_grams(df, n, text_col, id_col).distinct()
    first = grams.groupBy("gram").agg(F.min(id_col).alias("_first"))
    o = (
        grams.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long"))
            .alias("n_novel"),
        )
    )
    return (
        df.select(id_col).join(o, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce(
                    F.col("n_novel")
                    / F.nullif(F.col("n_grams"), F.lit(0)).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("novelty_frac"),
        )
    )


def ccnet_perplexity_buckets(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", lang_col: str = "lang",
                             ref_mod: int = 5, add_k: float = 0.5,
                             round_to: int = 6) -> DataFrame:
    """(doc_id, lang, n_bigrams, avg_log2p, bucket): CCNet's
    perplexity bucketing (Wenzek et al. 2020 §3.3): a PER-LANGUAGE
    bigram LM is trained on a deterministic reference slice
    (doc_id % ref_mod == 0 — CCNet uses Wikipedia; in-engine the slice
    is the clean-reference stand-in), every doc of that language is
    scored by mean log2 transition probability, and docs are cut into
    head / middle / tail TERCILES per language (head = most
    reference-like). Downstream mixes keep head+middle — the public
    CommonCrawl-filtering recipe.

    Unseen transitions smooth to add_k / (c1 + add_k*V_lang); languages
    with no reference docs drop out (inner join on the per-lang vocab).
    Plan: one tokenize pass each for corpus and reference slice,
    lang-keyed count aggs (map-side combinable), one lang-partitioned
    ntile window — no global window, no UDF."""
    from pyspark.sql import Window as W

    from connectors_spark.functions.analysis import tokens_col

    toks = tokens_col(F.col(text_col))
    big = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(lang_col).alias("lang"),
                     toks.alias("_t"), big.alias("_b"))
    is_ref = F.col("doc_id") % ref_mod == 0
    pairs = (base.filter(F.size("_b") > 0)
             .select("doc_id", "lang", F.explode("_b").alias("bigram"))
             .withColumn("w1", F.split("bigram", " ").getItem(0)))
    ref_uni = (base.filter(is_ref)
               .select("lang", F.explode("_t").alias("w1"))
               .groupBy("lang", "w1").agg(F.count(F.lit(1)).alias("c1")))
    ref_bic = (pairs.filter(is_ref)
               .groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("c2")))
    vocab = ref_uni.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("v"))
    lp = (pairs
          .join(ref_bic, ["lang", "bigram"], "left")
          .join(ref_uni, ["lang", "w1"], "left")
          .join(vocab, "lang")  # inner: langs with no reference drop out
          .select("doc_id", "lang",
                  F.log2((F.coalesce("c2", F.lit(0)) + add_k)
                         / (F.coalesce("c1", F.lit(0)) + add_k * F.col("v")))
                  .alias("lp")))
    sc = lp.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), round_to).alias("avg_log2p"))
    w = W.partitionBy("lang").orderBy(F.desc("avg_log2p"), F.asc("doc_id"))
    tile = F.ntile(3).over(w)
    return sc.select(
        "doc_id", "lang", "n_bigrams", "avg_log2p",
        F.when(tile == 1, "head").when(tile == 2, "middle")
         .otherwise("tail").alias("bucket"))


def c4_line_rules(lines: DataFrame, bad_words: list[str] | None = None,
                  min_words: int = 5, min_sentences: int = 3,
                  doc_col: str = "doc_id", line_col: str = "line"):
    """C4's cleaning heuristics (Raffel et al. 2020 §2.2, public) over a
    (doc_id, line) frame: a line is KEPT iff it ends in terminal
    punctuation and has >= min_words words; a document is DROPPED if it
    contains "lorem ipsum", a curly brace `{`, any policy bad word, or
    fewer than min_sentences sentences across its kept lines.

    Returns (doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, has_badword, keep) — flags as ints. One doc-keyed agg
    over line rows (map-side combinable), all JVM expressions; at
    100 TB lines arrive pre-split from ingest, so there is no
    per-doc explode hotspot."""
    line = F.col(line_col)
    low = F.lower(line)
    kept = (line.rlike('[.!?"]$')
            & (F.size(F.split(F.trim(line), " +")) >= min_words))
    n_sent = F.when(kept, F.size(F.regexp_extract_all(
        line, F.lit("[.!?]"), F.lit(0)))).otherwise(F.lit(0))
    bw = bad_words or []
    has_bad = F.lit(False)
    for w in bw:
        has_bad = has_bad | low.contains(w.lower())
    agg = lines.groupBy(F.col(doc_col).alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(kept.cast("long")).alias("n_kept_lines"),
        F.sum(n_sent).alias("n_sentences"),
        F.max(low.contains("lorem ipsum").cast("int")).alias("has_lorem"),
        F.max(line.contains("{").cast("int")).alias("has_brace"),
        F.max(has_bad.cast("int")).alias("has_badword"),
    )
    keep = ((F.col("has_lorem") == 0) & (F.col("has_brace") == 0)
            & (F.col("has_badword") == 0)
            & (F.col("n_sentences") >= min_sentences))
    return agg.select("doc_id", "n_lines", "n_kept_lines", "n_sentences",
                      "has_lorem", "has_brace", "has_badword",
                      keep.cast("int").alias("keep"))


def rouge_n_overlap(pairs: DataFrame, n: int = 2,
                    cand_col: str = "cand_text", ref_col: str = "ref_text",
                    id_col: str = "pair_id",
                    round_to: int = 6) -> DataFrame:
    """ROUGE-N with BLEU-style clipping over (candidate, reference) text
    pairs (Lin 2004 / Papineni 2002, public) — the distillation and
    eval-overlap screen: how much of a model output is n-gram-copied
    from its reference (or, pairing corpus docs with each other, a
    sampled self-BLEU diversity probe).

    Per pair, over adjacent token n-grams (the corpus-wide tokenizer
    chain, analysis.py:tokens_col):

        clip      = sum_g min(count_cand(g), count_ref(g))
        precision = clip / n_cand_grams      (0 when candidate is empty)
        recall    = clip / n_ref_grams       (0 when reference is empty)
        f1        = 2PR / (P + R)            (0 when both are 0)

    Returns (pair_id, n_cand_grams, n_ref_grams, clip, precision,
    recall, f1) — counts are exact integers; the ratios are single
    divisions of those integers, so both engines round identically.

    Scale shape: grams are built INSIDE the tokens array (one transform
    per row — no position self-join), each side collapses to
    (pair_id, gram, count) with map-side combine BEFORE the only
    shuffle, and the clip join is keyed (pair_id, gram) — co-partitioned
    with the counts, skew-bounded by per-doc gram diversity. No
    all-pairs, no Python in the loop.
    """
    cand = (_doc_grams(pairs.select(id_col, F.col(cand_col).alias("t")),
                       n, "t", id_col)
            .groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c_cand")))
    ref = (_doc_grams(pairs.select(id_col, F.col(ref_col).alias("t")),
                      n, "t", id_col)
           .groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c_ref")))
    clip = (cand.join(ref, [id_col, "gram"])
            .groupBy(id_col)
            .agg(F.sum(F.least("c_cand", "c_ref")).alias("clip")))
    totals = (cand.groupBy(id_col).agg(F.sum("c_cand").alias("n_cand_grams"))
              .join(ref.groupBy(id_col).agg(F.sum("c_ref")
                                            .alias("n_ref_grams")),
                    id_col, "outer"))
    out = (pairs.select(id_col).distinct()
           .join(totals, id_col, "left")
           .join(clip, id_col, "left")
           .fillna(0, ["n_cand_grams", "n_ref_grams", "clip"]))
    p = F.when(F.col("n_cand_grams") > 0,
               F.col("clip") / F.col("n_cand_grams")).otherwise(F.lit(0.0))
    r = F.when(F.col("n_ref_grams") > 0,
               F.col("clip") / F.col("n_ref_grams")).otherwise(F.lit(0.0))
    scored = out.select(
        id_col, "n_cand_grams", "n_ref_grams", "clip",
        F.round(p, round_to).alias("precision"),
        F.round(r, round_to).alias("recall"),
        p.alias("_p"), r.alias("_r"))
    f1 = F.when(F.col("_p") + F.col("_r") > 0,
                2.0 * F.col("_p") * F.col("_r")
                / (F.col("_p") + F.col("_r"))).otherwise(F.lit(0.0))
    return scored.select(
        id_col, "n_cand_grams", "n_ref_grams", "clip",
        "precision", "recall", F.round(f1, round_to).alias("f1"))


def kneser_ney_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", discount: float = 0.75,
                     round_to: int = 6) -> DataFrame:
    """(doc_id, n_trigrams, avg_log2p): interpolated Kneser-Ney
    trigram language-model score (Kneser & Ney 1995; Chen & Goodman
    1999 §2.7 interpolated form, fixed discount D) — the standard
    KenLM-style pretraining quality filter one order above
    ngram_lm_score's add-k bigram, trained on the corpus itself.

    Every statistic derives from ONE table, the trigram TYPE table T
    (distinct (w1,w2,w3) with token count c123) — the single-source
    formulation keeps the Spark and SQL twins trivially identical:

        h12        = sum_w3 c123            (history tokens)
        N1p_12dot  = |{w3 : (w1,w2,w3) in T}|
        a23(w2,w3) = |{w1 : (w1,w2,w3) in T}|   (adjusted bigram count)
        A2(w2)     = sum_w3 a23             (= trigram types mid w2)
        N1p_2dot   = |{w3 : a23 > 0}|
        u3(w3)     = |{w2 : a23 > 0}|       (adjusted unigram count)
        U          = |{(w2,w3) in T}|

        P(w3)       = u3 / U
        P(w3|w2)    = (max(a23-D,0) + D*N1p_2dot*P(w3)) / A2
        P(w3|w1,w2) = (max(c123-D,0) + D*N1p_12dot*P(w3|w2)) / h12

    Scored trigrams are corpus trigrams, so every denominator is > 0.
    Per-trigram log2 P rounds to `round_to` and lifts to micro-unit
    int64 — the per-doc mean is a ratio of exact integers, engine-
    independent. Docs with < 3 tokens have no trigram and are absent.

    Plan: one tokenize pass; trigrams via JVM array slicing (no per-doc
    window); the probability is assembled on the TYPE table (|T| <<
    corpus tokens), then one broadcast-or-AQE join back to trigram
    tokens; aggs are map-side combinable; the Zipf head of (w2) keys is
    the usual skew — AQE skew-join territory at 100 TB."""
    from connectors_spark.functions.analysis import tokens_col as _tc

    d = F.lit(float(discount))
    toks = _tc(F.col(text_col))
    n3 = F.greatest(F.size(toks) - 2, F.lit(0))
    tri = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.arrays_zip(
                F.slice(toks, 1, n3).alias("w1"),
                F.slice(toks, 2, n3).alias("w2"),
                F.slice(toks, 3, n3).alias("w3"),
            ).alias("_z"))
        .filter(F.size("_z") > 0)
        .select("doc_id", F.explode("_z").alias("_t"))
        .select("doc_id", F.col("_t.w1").alias("w1"),
                F.col("_t.w2").alias("w2"), F.col("_t.w3").alias("w3"))
    )
    types = tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c123"))
    h = types.groupBy("w1", "w2").agg(
        F.sum("c123").alias("h12"),
        F.count(F.lit(1)).alias("n1p_12dot"))
    a23 = types.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("a23"))
    a2 = a23.groupBy("w2").agg(
        F.sum("a23").alias("a2"), F.count(F.lit(1)).alias("n1p_2dot"))
    u3 = a23.groupBy("w3").agg(F.count(F.lit(1)).alias("u3"))
    uu = a23.agg(F.count(F.lit(1)).cast("double").alias("uu"))

    p_uni = F.col("u3") / F.col("uu")
    p_bi = ((F.greatest(F.col("a23") - d, F.lit(0.0))
             + d * F.col("n1p_2dot") * p_uni) / F.col("a2"))
    p_tri = ((F.greatest(F.col("c123") - d, F.lit(0.0))
              + d * F.col("n1p_12dot") * p_bi) / F.col("h12"))
    scored_types = (
        types.join(h, ["w1", "w2"])
        .join(a23, ["w2", "w3"])
        .join(a2, "w2")
        .join(u3, "w3")
        .crossJoin(F.broadcast(uu))
        .select(
            "w1", "w2", "w3",
            F.round(F.round(F.log2(p_tri), round_to) * 1e6)
             .cast("long").alias("lp_u"))
    )
    per_doc = (
        tri.join(scored_types, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_trigrams"),
             F.sum("lp_u").alias("_sum_u"))
    )
    return per_doc.select(
        "doc_id", "n_trigrams",
        F.round(F.col("_sum_u").cast("double") / 1e6
                / F.col("n_trigrams"), round_to).alias("avg_log2p"))


def zipf_fit(df: DataFrame, text_col: str = "text",
             max_rank: int = 1000, round_to: int = 6) -> DataFrame:
    """ONE row (n_terms, slope, intercept, r2): least-squares fit of
    Zipf's law ln(freq) = intercept + slope * ln(rank) over the corpus'
    top-`max_rank` terms (Zipf 1949; the exponent near -1 is the
    classic sanity check that a crawl slice looks like natural
    language — tokenizer bugs, boilerplate floods and spam farms all
    bend it).

    Determinism: the rank head is a TakeOrderedAndProject
    (freq DESC, term ASC — total order), per-term ln(rank)/ln(freq)
    round to `round_to` and lift to micro-unit int64, and all five
    OLS sufficient statistics are EXACT integer sums over <= max_rank
    rows. The final slope/intercept/r2 combine those six exact
    integers in one fixed-shape double expression — no aggregation
    order anywhere. int64 bound: Sxx <= max_rank * (1e6*ln(max_rank))^2
    keeps max_rank <= ~50k safe; the head is where Zipf holds anyway.

    Scale shape: term counting is one map-side-combinable groupBy; the
    head never exceeds max_rank rows (distributed partial top-k, k-row
    driver merge); the fit itself is O(max_rank)."""
    from connectors_spark.functions.analysis import tokens_col

    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    head = freq.orderBy(F.desc("f"), F.asc("term")).limit(max_rank)
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    ranked = head.withColumn("rank", F.row_number().over(w))
    u = ranked.select(
        F.round(F.round(F.log(F.col("rank").cast("double")), round_to)
                * 1e6).cast("long").alias("xu"),
        F.round(F.round(F.log(F.col("f").cast("double")), round_to)
                * 1e6).cast("long").alias("yu"))
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xu").alias("sx"), F.sum("yu").alias("sy"),
        F.sum(F.col("xu") * F.col("xu")).alias("sxx"),
        F.sum(F.col("xu") * F.col("yu")).alias("sxy"),
        F.sum(F.col("yu") * F.col("yu")).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, round_to).alias("slope"),
        F.round((sy - slope * sx) / n / F.lit(1e6), round_to)
         .alias("intercept"),
        F.round(cov * cov / (varx * vary), round_to).alias("r2"))


def vocab_growth(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n_buckets: int = 10) -> DataFrame:
    """(bucket, n_docs, cum_tokens, cum_vocab): Heaps-law vocabulary
    growth curve — distinct terms seen vs tokens seen as the corpus is
    consumed in `id_col` order, at `n_buckets` checkpoints (Heaps 1978;
    V(n) ~ K n^beta with beta ~ 0.4-0.6 for natural text — a flat curve
    means template spam, a linear one means random noise).

    No global row window: buckets are RANGE slices of the id domain
    (floor((id - min) * n_buckets / span), computed against broadcast
    min/max scalars), a term's first sighting is min(bucket) per term
    (map-side combinable), and the cumulative sums run over the
    <= n_buckets aggregated rows. Empty buckets surface with zero
    deltas via the doc-count spine."""
    from connectors_spark.functions.analysis import tokens_col

    bounds = df.agg(F.min(id_col).alias("lo"),
                    F.max(id_col).alias("hi"))
    base = df.crossJoin(F.broadcast(bounds))
    # explicit floor-of-double on BOTH sides of the twin: Spark's
    # double->long cast truncates but DuckDB's CAST rounds
    bucket = F.least(
        F.floor((F.col(id_col) - F.col("lo")).cast("double") * n_buckets
                / (F.col("hi") - F.col("lo") + 1).cast("double"))
         .cast("long"),
        F.lit(n_buckets - 1)).alias("bucket")
    docs = base.select(bucket, F.col(id_col).alias("_id"),
                       F.col(text_col).alias("_t"))
    toks = docs.select("bucket",
                       F.explode(tokens_col(F.col("_t"))).alias("term"))
    per_bucket_tok = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("toks"))
    first = toks.groupBy("term").agg(F.min("bucket").alias("bucket"))
    per_bucket_new = first.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_terms"))
    spine = docs.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    joined = (spine.join(per_bucket_tok, "bucket", "left")
              .join(per_bucket_new, "bucket", "left")
              .fillna(0, ["toks", "new_terms"]))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return joined.select(
        "bucket", "n_docs",
        F.sum("toks").over(w).alias("cum_tokens"),
        F.sum("new_terms").over(w).alias("cum_vocab"))


def lexical_diversity(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      round_to: int = 6) -> DataFrame:
    """Per-doc lexical-diversity screen: (doc_id, n_tokens, n_types,
    n_hapax, ttr, rttr, herdan_c, hapax_ratio) — type-token ratio,
    Guiraud's root TTR, Herdan's C = ln V / ln N (the length-robust
    variant), and the hapax-legomena share. Low-diversity docs are
    keyword stuffing / template output; implausibly high ones are
    random-token spam. Zero-token docs are absent (no tokens, no row).

    One tokenize pass, one (doc, term) combine-friendly agg, one doc
    agg — integer counts end-to-end, ratios as single divisions."""
    from connectors_spark.functions.analysis import tokens_col

    tf = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(F.col(text_col))).alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0)).alias("n_hapax"))
    nt = F.col("n_tokens").cast("double")
    ty = F.col("n_types").cast("double")
    herdan = F.when(F.col("n_tokens") > 1,
                    F.log(ty) / F.log(nt)).otherwise(F.lit(None))
    return per_doc.select(
        "doc_id", "n_tokens", "n_types", "n_hapax",
        F.round(ty / nt, round_to).alias("ttr"),
        F.round(ty / F.sqrt(nt), round_to).alias("rttr"),
        F.round(herdan, round_to).alias("herdan_c"),
        F.round(F.col("n_hapax") / nt, round_to).alias("hapax_ratio"))


def bleu_pairs(pairs: DataFrame, max_n: int = 4,
               cand_col: str = "cand_text", ref_col: str = "ref_text",
               id_col: str = "pair_id", round_to: int = 6) -> DataFrame:
    """Sentence-BLEU (Papineni et al. 2002) over (candidate, reference)
    text pairs, all orders 1..max_n: clipped n-gram precisions p_n, the
    brevity penalty, and the LOG-domain score

        log_bleu = min(0, 1 - ref_len/cand_len)         (ln BP)
                 + (1/max_n) * sum_n ln p_n

    (bleu = exp(log_bleu); the log form is emitted because it stays
    inside the repo's integer-exact convention — each ln p_n rounds to
    `round_to` and lifts to micro-unit int64, the order sum is an exact
    integer, and /4.0 + the micro-lifted ln BP are exact doubles — no
    transcendental AFTER the integer stage, so both engines round the
    final value identically). log_bleu is NULL when any order has zero
    clipped matches or the candidate is shorter than max_n tokens — the
    unsmoothed sentence-BLEU zero, kept distinguishable from tiny
    scores.

    Returns (pair_id, cand_len, ref_len, p1..p{max_n}, log_bleu).

    Scale shape: ONE tokenize pass per side — every order's grams are
    built inside the tokens array and flattened to (pair, n, gram)
    before a single combine-friendly count; the clip join is keyed
    (pair, n, gram), co-partitioned with the counts. No all-pairs, no
    Python in the loop."""
    from connectors_spark.functions.analysis import tokens_col

    def side_grams(col_name, alias):
        arr = tokens_col(F.col(col_name))

        # closure factories, NOT default args: pyspark's higher-order
        # functions read the lambda's arity to decide how many lambda
        # variables to bind
        def gram_fn(n):
            return lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j) for j in range(n)])

        def tag_fn(n):
            return lambda x: F.struct(F.lit(n).alias("n"),
                                      x.alias("gram"))

        per_n = []
        for n in range(1, max_n + 1):
            g = F.when(
                F.size(arr) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                    gram_fn(n),
                ),
            ).otherwise(F.array().cast("array<string>"))
            per_n.append(F.transform(g, tag_fn(n)))
        flat = F.flatten(F.array(*per_n))
        return (pairs.select(id_col, F.explode(flat).alias("_g"))
                .select(id_col, F.col("_g.n").alias("n"),
                        F.col("_g.gram").alias("gram"))
                .groupBy(id_col, "n", "gram")
                .agg(F.count(F.lit(1)).alias(alias)))

    c = side_grams(cand_col, "cc")
    r = side_grams(ref_col, "cr")
    clip = (c.join(r, [id_col, "n", "gram"])
            .groupBy(id_col, "n")
            .agg(F.sum(F.least("cc", "cr")).alias("clip")))
    per_n = (c.groupBy(id_col, "n").agg(F.sum("cc").alias("cn"))
             .join(clip, [id_col, "n"], "left")
             .fillna(0, ["clip"]))
    agg_cols = [F.count(F.lit(1)).alias("_orders")]
    for n in range(1, max_n + 1):
        agg_cols.append(F.max(F.when(F.col("n") == n, F.col("clip")))
                        .alias(f"clip{n}"))
        agg_cols.append(F.max(F.when(F.col("n") == n, F.col("cn")))
                        .alias(f"c{n}"))
    wide = per_n.groupBy(id_col).agg(*agg_cols)
    ref_len = (r.filter(F.col("n") == 1).groupBy(id_col)
               .agg(F.sum("cr").alias("ref_len")))
    base = (pairs.select(id_col).distinct()
            .join(wide, id_col, "left")
            .join(ref_len, id_col, "left")
            .fillna(0, [c for n in range(1, max_n + 1)
                        for c in (f"clip{n}", f"c{n}")] + ["ref_len"]))
    cand_len = F.col("c1")
    lnp_us = []
    p_cols = []
    for n in range(1, max_n + 1):
        cn, cl = F.col(f"c{n}").cast("double"), F.col(f"clip{n}")
        p_cols.append(F.round(F.when(F.col(f"c{n}") > 0, cl / cn)
                              .otherwise(F.lit(0.0)), round_to)
                      .alias(f"p{n}"))
        lnp_us.append(F.round(F.round(F.log(cl.cast("double") / cn),
                                      round_to) * 1e6).cast("long"))
    ok = (F.col(f"c{max_n}") > 0)
    for n in range(1, max_n + 1):
        ok = ok & (F.col(f"clip{n}") > 0)
    sum_u = lnp_us[0]
    for x in lnp_us[1:]:
        sum_u = sum_u + x
    bp_u = F.round(F.round(
        F.least(F.lit(0.0),
                1.0 - F.col("ref_len").cast("double")
                / cand_len.cast("double")), round_to) * 1e6).cast("long")
    log_bleu = F.when(
        ok, F.round((sum_u.cast("double") / max_n + bp_u.cast("double"))
                    / 1e6, round_to))
    return base.select(
        id_col, cand_len.alias("cand_len"), F.col("ref_len"),
        *p_cols, log_bleu.alias("log_bleu"))


def good_turing_estimate(df: DataFrame, text_col: str = "text",
                         round_to: int = 6) -> DataFrame:
    """Simple Good-Turing frequency re-estimation (Good 1953; Gale &
    Sampson 1995 "linear Good-Turing" variant): per observed frequency
    r, the adjusted frequency r* and the unseen-mass estimate
    p0 = N1/N — the corpus-coverage question every tokenizer/vocab
    decision rests on ("how much probability mass belongs to types we
    have not seen yet?").

        N_r   = #types with corpus frequency r
        Z_r   = N_r / (0.5 * (t - q)),  q/t = neighboring observed r
                (q=0 at the smallest r, t=2r-q at the largest — the
                Gale-Sampson smooth for gappy high-r counts)
        b     = OLS slope of ln Z on ln r       (must be < -1 for the
                estimator to be proper; emitted so callers can check)
        r*    = (r+1) * ((r+1)/r)^b             (LGT smoothed)
        p0    = N_1 / N                         (total unseen mass)

    Returns one row per observed r: (r, n_r, r_star, slope_b, p0) —
    slope_b/p0 are corpus constants repeated per row. Micro-unit
    integer OLS statistics exactly as zipf_fit; r* is a single pow of
    exact-integer-derived doubles, rounded once.

    Scale shape: the frequency-of-frequencies table has one row per
    DISTINCT frequency — O(sqrt(total tokens)) rows by the
    Hardy-Ramanujan-style bound on distinct part sizes — so the
    neighbor window and the OLS run on a frame thousands of times
    smaller than the lexicon; everything upstream is two
    combine-friendly groupBys."""
    from connectors_spark.functions.analysis import tokens_col

    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("r"))
    nr = freq.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    w = Window.orderBy("r")
    z = (nr
         .withColumn("q", F.coalesce(F.lag("r").over(w), F.lit(0)))
         .withColumn("t", F.lead("r").over(w))
         .withColumn(
             "z",
             F.col("n_r").cast("double")
             / (0.5 * (F.coalesce(F.col("t"),
                                  2 * F.col("r") - F.col("q"))
                       - F.col("q")).cast("double"))))
    u = z.select(
        "r", "n_r",
        F.round(F.round(F.log(F.col("r").cast("double")), round_to)
                * 1e6).cast("long").alias("xu"),
        F.round(F.round(F.log("z"), round_to) * 1e6)
         .cast("long").alias("yu"))
    s = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xu").cast("double").alias("sx"),
        F.sum("yu").cast("double").alias("sy"),
        F.sum(F.col("xu") * F.col("xu")).cast("double").alias("sxx"),
        F.sum(F.col("xu") * F.col("yu")).cast("double").alias("sxy"))
    b = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    consts = s.select(b.alias("_b"))
    totals = freq.agg(
        F.sum("r").cast("double").alias("_n_tokens"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0))
         .cast("double").alias("_n1"))
    rr = F.col("r").cast("double")
    r_star = (rr + 1.0) * F.pow((rr + 1.0) / rr, F.col("_b"))
    return (u.select("r", "n_r")
            .crossJoin(F.broadcast(consts))
            .crossJoin(F.broadcast(totals))
            .select(
                "r", "n_r",
                F.round(r_star, round_to).alias("r_star"),
                F.round(F.col("_b"), round_to).alias("slope_b"),
                F.round(F.col("_n1") / F.col("_n_tokens"), round_to)
                 .alias("p0")))


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", round_to: int = 6) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade level (Kincaid et al.
    1975, public) per document — the classic readability pair of a
    corpus quality pipeline (C4/Gopher-style heuristic screens filter
    on them; they also make strong classifier features).

    The counting heuristics are deliberately regex-only so the whole
    operator is one JVM projection (no UDF, no tokenizer pass):

        words     = count of \\S+ runs
        sentences = max(1, count of [.!?]+ runs)
        syllables = count of [aeiouy]+ runs in lower(text)
                    (the standard vowel-group approximation; all-
                    consonant tokens contribute 0 — a documented
                    divergence from dictionary syllabification)

    Determinism: both formulas are cleared to a SINGLE DIVISION of
    exact integer products (coefficients x1000), the cross-engine
    convention:

        flesch = (206835*W*S - 1015*W^2 - 84600*Y*S) / (1000*W*S)
        fk     = (390*W^2 + 11800*Y*S - 15590*W*S)   / (1000*W*S)

    Zero-word documents emit NULL scores (undefined). Row-local, no
    shuffle — scales linearly with the corpus."""
    w = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("long")
    s = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"))
    y = F.regexp_count(F.lower(F.col(text_col)),
                       F.lit(r"[aeiouy]+")).cast("long")
    out = df.select(F.col(id_col), w.alias("n_words"),
                    s.alias("n_sentences"), y.alias("n_syllables"))
    W, S, Y = F.col("n_words"), F.col("n_sentences"), F.col("n_syllables")
    den = (1000 * W * S).cast("double")
    flesch = (206835 * W * S - 1015 * W * W - 84600 * Y * S).cast(
        "double") / den
    fk = (390 * W * W + 11800 * Y * S - 15590 * W * S).cast("double") / den
    return out.select(
        id_col, "n_words", "n_sentences", "n_syllables",
        F.when(W > 0, F.round(flesch, round_to)).alias("flesch"),
        F.when(W > 0, F.round(fk, round_to)).alias("fk_grade"))


def chrf_pairs(pairs: DataFrame, max_n: int = 3, beta: int = 2,
               cand_col: str = "cand_text", ref_col: str = "ref_text",
               id_col: str = "pair_id", round_to: int = 6) -> DataFrame:
    """chrF (Popović, WMT 2015) over (candidate, reference) text pairs:
    character-n-gram F_beta averaged over orders 1..max_n — the
    tokenization-free companion to bleu_pairs for distillation /
    paraphrase screening (robust to morphology and tokenizer choice,
    which word-n-gram BLEU is not).

    Text is lowercased and whitespace-stripped (the standard chrF
    preprocessing); per order n, clipped matches m = sum min(cand
    count, ref count) per gram, and with P = m/tc, R = m/tr the
    F-score algebra clears to a SINGLE DIVISION of exact integers:

        F_beta = (1+b^2)PR / (b^2 P + R) = (1+b^2) m / (b^2 tr + tc)

    (recall-weighted: b=2 doubles recall's weight). Each F_n rounds at
    micro-units and lifts to int64; chrF = sum(F_n)/max_n is then a
    single division of an exact integer sum — both engines hash
    identically. Orders with zero matches (or empty sides) contribute
    F_n = 0, the chrF convention; pairs whose stripped candidate AND
    reference are both empty emit NULL.

    Returns (pair_id, cand_chars, ref_chars, f1..f{max_n}, chrf).

    Scale shape: one strip pass per side, grams built inside the char
    domain and flattened to (pair, n, gram) before a single
    combine-friendly count; the clip join is keyed (pair, n, gram) —
    identical plan family to bleu_pairs, no all-pairs, no Python."""

    def stripped(col_name):
        return F.regexp_replace(F.lower(F.col(col_name)), r"\s+", "")

    def side_grams(col_name, alias):
        s = stripped(col_name)

        def gram_fn(n):
            return lambda i: F.substr(s, i, F.lit(n))

        def tag_fn(n):
            return lambda x: F.struct(F.lit(n).alias("n"),
                                      x.alias("gram"))

        per_n = []
        for n in range(1, max_n + 1):
            g = F.when(
                F.length(s) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - (n - 1)),
                    gram_fn(n),
                ),
            ).otherwise(F.array().cast("array<string>"))
            per_n.append(F.transform(g, tag_fn(n)))
        flat = F.flatten(F.array(*per_n))
        return (pairs.select(id_col, F.explode(flat).alias("_g"))
                .select(id_col, F.col("_g.n").alias("n"),
                        F.col("_g.gram").alias("gram"))
                .groupBy(id_col, "n", "gram")
                .agg(F.count(F.lit(1)).alias(alias)))

    c = side_grams(cand_col, "cc")
    r = side_grams(ref_col, "cr")
    clip = (c.join(r, [id_col, "n", "gram"])
            .groupBy(id_col, "n")
            .agg(F.sum(F.least("cc", "cr")).alias("m")))
    tc = c.groupBy(id_col, "n").agg(F.sum("cc").alias("tc"))
    tr = r.groupBy(id_col, "n").agg(F.sum("cr").alias("tr"))
    per_n = (tc.join(tr, [id_col, "n"], "full")
             .join(clip, [id_col, "n"], "left")
             .fillna(0, ["tc", "tr", "m"]))
    b2 = beta * beta
    f_u = F.when(
        F.col("m") > 0,
        F.round((1 + b2) * F.col("m") * F.lit(1_000_000.0)
                / (b2 * F.col("tr") + F.col("tc"))).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    per_n = per_n.withColumn("f_u", f_u)
    agg_cols = [F.sum("f_u").alias("_fsum")]
    for n in range(1, max_n + 1):
        agg_cols.append(
            F.round(F.max(F.when(F.col("n") == n, F.col("f_u")))
                    .cast("double") / 1e6, round_to).alias(f"f{n}"))
    wide = per_n.groupBy(id_col).agg(*agg_cols)
    lens = pairs.select(
        id_col,
        F.length(stripped(cand_col)).cast("long").alias("cand_chars"),
        F.length(stripped(ref_col)).cast("long").alias("ref_chars"))
    out = lens.join(wide, id_col, "left")
    defined = (F.col("cand_chars") > 0) | (F.col("ref_chars") > 0)
    return out.select(
        id_col, "cand_chars", "ref_chars",
        *[F.when(defined, F.coalesce(F.col(f"f{n}"), F.lit(0.0)))
          .alias(f"f{n}") for n in range(1, max_n + 1)],
        F.when(defined,
               F.round(F.coalesce(F.col("_fsum"), F.lit(0)).cast("double")
                       / (max_n * 1e6), round_to)).alias("chrf"))


def significant_terms_scored(df: DataFrame, fg: Column,
                             text_col: str = "text",
                             doc_id_col: str = "doc_id", top_n: int = 15,
                             round_to: int = 6) -> DataFrame:
    """`significant_terms` with Lucene's full public heuristic menu
    beside JLH (ES significant-terms docs list them as pluggable
    `chi_square` / `mutual_information` / `percentage` scorers), all
    from ONE counts frame: the 2x2 contingency per term is
    N11=fg_df, N12=bg_df-fg_df, N21=fg_n-fg_df, N22=N-fg_n-N12 with
    N=bg_n (background is a superset of the foreground, ES default).

    - jlh            = (fg% - bg%) * (fg% / bg%)
    - chi_square     = N*(N11*N22 - N12*N21)^2 / (product of marginals)
      (textbook 2x2; include-negatives form — symmetric in direction)
    - mutual_information = sum_cells (Nxy/N) * log2(N*Nxy / (Nx*Ny)),
      zero-count cells contribute 0 (Manning & Schuetze 13.133 form)
    - pct_of_bg      = fg_df / bg_df (ES `percentage` heuristic)

    All cell math in IEEE double (counts are far below 2^53, so the
    inputs are exact and both engines round identically); plan shape is
    the significant_terms one: a single term-keyed shuffle with the fg
    flag riding the token rows, then broadcast totals + TakeOrdered."""
    from connectors_spark.functions.analysis import tokenize

    flagged = df.withColumn("_fg", fg)
    toks = tokenize(flagged, text_col, doc_id_col).join(
        flagged.select(F.col(doc_id_col).alias("doc_id"), "_fg"), "doc_id")
    per_term = (
        toks.select("term", "doc_id", "_fg").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("bg_df"),
             F.sum(F.when(F.col("_fg"), 1).otherwise(0)).alias("fg_df"))
        .filter(F.col("fg_df") > 0))
    totals = flagged.agg(
        F.count(F.lit(1)).alias("_bg_n"),
        F.sum(F.when(F.col("_fg"), 1).otherwise(0)).alias("_fg_n"))
    t = per_term.crossJoin(F.broadcast(totals))

    n11 = F.col("fg_df").cast("double")
    n12 = (F.col("bg_df") - F.col("fg_df")).cast("double")
    n21 = (F.col("_fg_n") - F.col("fg_df")).cast("double")
    n = F.col("_bg_n").cast("double")
    n22 = n - F.col("_fg_n") - n12
    fg_pct = F.col("fg_df") / F.col("_fg_n")
    bg_pct = F.col("bg_df") / F.col("_bg_n")

    denom = (n11 + n12) * (n11 + n21) * (n12 + n22) * (n21 + n22)
    chi = F.when(denom > 0,
                 n * F.pow(n11 * n22 - n12 * n21, 2) / denom)

    def mi_cell(nxy: Column, nx: Column, ny: Column) -> Column:
        return F.when(nxy > 0,
                      (nxy / n) * F.log2(n * nxy / (nx * ny))
                      ).otherwise(F.lit(0.0))

    mi = (mi_cell(n11, n11 + n12, n11 + n21)
          + mi_cell(n12, n11 + n12, n12 + n22)
          + mi_cell(n21, n21 + n22, n11 + n21)
          + mi_cell(n22, n21 + n22, n12 + n22))

    scored = t.select(
        "term", "fg_df", "bg_df",
        F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), round_to)
        .alias("jlh"),
        F.round(chi, round_to).alias("chi_square"),
        F.round(mi, round_to).alias("mutual_info"),
        F.round(F.col("fg_df") / F.col("bg_df"), round_to)
        .alias("pct_of_bg"))
    return scored.orderBy(F.desc("jlh"), F.asc("term")).limit(top_n)
