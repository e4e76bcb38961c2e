"""Transcript structure validation — the SFT-ingest sanity screen.

Multi-turn conversation corpora routinely contain structurally broken
conversations (truncated exports, merged turns, resumed sessions):
before any training use, a pipeline flags conversations whose turn
structure violates the chat contract. Checks, per conversation:

- starts_ok:     first turn is `system` or `user` (never assistant)
- system_ok:     `system` turns appear only at turn 0
- alternates_ok: consecutive NON-system turns alternate roles
                 (no user-user or assistant-assistant adjacency)
- no_gaps:       turn_idx is exactly 0..n-1 (no holes, no dupes)
- no_empty:      every turn has at least one token
- valid:         all of the above

Shape: two windows, both PARTITIONED BY conv_id (never global), then
one conv-keyed bool_and aggregation — a single shuffle on the
conversation key at any corpus size. The reference's sync pipeline
performs the same class of edge validation before indexing
(reference: connectors/sync_job_runner.py validation hooks +
sdk/source.py document sanity checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connectors_spark.functions.analysis import tokens_col

__all__ = ["transcript_structure_qc", "tool_call_validation",
           "merge_adjacent_turns", "refusal_screen", "code_fence_qc"]


def transcript_structure_qc(df: DataFrame,
                            conv_col: str = "conv_id",
                            turn_col: str = "turn_idx",
                            role_col: str = "role",
                            text_col: str = "text") -> DataFrame:
    """(conv_id, n_turns, starts_ok, alternates_ok, system_ok, no_gaps,
    no_empty, valid) — flags as ints for portable hashing."""
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    base = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.size(tokens_col(F.col(text_col))).alias("ntok"),
    ).withColumn("rn", F.row_number().over(w)) \
     .withColumn("prev_idx", F.lag("turn_idx").over(w))
    # alternation is checked on the non-system subsequence only
    wns = Window.partitionBy("conv_id").orderBy("turn_idx")
    nonsys = (base.filter(F.col("role") != "system")
              .withColumn("prev_role", F.lag("role").over(wns))
              .groupBy("conv_id")
              .agg(F.bool_and(F.col("prev_role").isNull()
                              | (F.col("role") != F.col("prev_role")))
                   .alias("alternates_ok")))
    agg = base.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.bool_and(F.when(F.col("rn") == 1,
                          F.col("role").isin("system", "user"))
                   .otherwise(F.lit(True))).alias("starts_ok"),
        F.bool_and((F.col("rn") == 1) | (F.col("role") != "system"))
        .alias("system_ok"),
        (F.bool_and((F.col("rn") == 1)
                    | (F.col("turn_idx") == F.col("prev_idx") + 1))
         & (F.min("turn_idx") == 0)).alias("no_gaps"),
        F.bool_and(F.col("ntok") > 0).alias("no_empty"),
    )
    out = agg.join(nonsys, "conv_id", "left").withColumn(
        "alternates_ok", F.coalesce("alternates_ok", F.lit(True)))
    flags = ["starts_ok", "alternates_ok", "system_ok", "no_gaps",
             "no_empty"]
    valid = None
    for f in flags:
        c = F.col(f)
        valid = c if valid is None else (valid & c)
    return out.select(
        "conv_id", "n_turns",
        *[F.col(f).cast("int").alias(f) for f in flags],
        valid.cast("int").alias("valid"))


def turn_boilerplate(df: DataFrame, min_convs: int = 2,
                     conv_col: str = "conv_id", turn_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "text") -> DataFrame:
    """Cross-conversation boilerplate turns: a normalized turn text that
    recurs in >= min_convs DISTINCT conversations is template noise
    (canned greetings, tool banners, refusal templates) — the
    transcript-level counterpart of the n-gram boilerplate blocklist.

    Returns every turn with (norm, conv_df, is_boilerplate). Shape: one
    text-keyed agg for conv_df (map-side combinable count-distinct via
    two-level agg) + one join back on the text key; the Zipf head of
    template texts is the usual skew — AQE skew-join territory at
    100 TB."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(conv_col).alias("conv_id"),
                     F.col(turn_col).alias("turn_idx"),
                     F.col(role_col).alias("role"),
                     norm.alias("norm"))
    # exact distinct, expressed as two stacked aggs so the first stage
    # combines map-side on (norm, conv)
    conv_df = (base.select("norm", "conv_id").distinct()
               .groupBy("norm").agg(F.count(F.lit(1)).alias("conv_df")))
    return (base.join(conv_df, "norm")
            .select("conv_id", "turn_idx", "role", "norm", "conv_df",
                    (F.col("conv_df") >= min_convs).cast("int")
                    .alias("is_boilerplate")))


def tool_call_validation(calls: DataFrame, str_key: str = "query",
                         int_key: str = "k",
                         tool_col: str = "tool",
                         args_col: str = "args_json") -> DataFrame:
    """Agent tool-call argument validation over transcript tool turns —
    the QA screen a training pipeline runs before trusting tool-use
    traces: per tool, how many recorded calls carry well-formed
    arguments, and how they fail when they don't.

    Schema-lite validation, per call (columns: tool, args_json):
    - malformed:  args_json does not parse as a JSON document
    - missing:    required keys absent (str_key or int_key)
    - bad_value:  int_key present but not a decimal integer literal
                  (lexical type check — identical semantics in any
                  engine that extracts JSON scalars as text)
    - valid:      none of the above

    Output per tool: n_calls, n_malformed, n_missing, n_bad_value,
    n_valid. Pure JVM expression work (`get_json_object` + regexp) in
    one combine-friendly groupBy on the tool name — no UDFs, no state;
    at trillion-turn scale this is a single map-side-combined pass.
    """
    parsed = F.get_json_object(F.col(args_col), "$")
    v_str = F.get_json_object(F.col(args_col), f"$.{str_key}")
    v_int = F.get_json_object(F.col(args_col), f"$.{int_key}")
    malformed = parsed.isNull()
    missing = ~malformed & (v_str.isNull() | v_int.isNull())
    # mutually exclusive buckets: a call is bad_value only once both
    # required keys are present, so the four counters sum to n_calls
    bad_value = ~malformed & ~missing & ~v_int.rlike(r"^-?[0-9]+$")
    valid = ~malformed & ~missing & ~bad_value
    return (
        calls.groupBy(F.col(tool_col).alias("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum(malformed.cast("long")).alias("n_malformed"),
            F.sum(missing.cast("long")).alias("n_missing"),
            F.sum(bad_value.cast("long")).alias("n_bad_value"),
            F.sum(valid.cast("long")).alias("n_valid"),
        )
    )


def merge_adjacent_turns(df: DataFrame, sep: str = "\n") -> DataFrame:
    """Transcript canonicalization: merge runs of CONSECUTIVE same-role
    turns into one turn and re-index turn_idx contiguously — the repair
    for the most common structural defect transcript_structure_qc
    flags (streaming/chunked logging and resumed sessions split one
    logical message into several adjacent turns; chat-template
    renderers and SFT packers require strict alternation).

    Gaps-and-islands: within a conversation ordered by turn_idx, a new
    island starts where role differs from the previous turn; each
    island collapses to one turn (texts joined in turn order by `sep`,
    n_merged = run length), and the island's rank becomes the new
    0-based contiguous turn_idx.

    Returns (conv_id, turn_idx, role, text, n_merged).

    Shape: two conv-partitioned windows (flag + running island id) and
    one (conv, island) groupBy whose per-group width is the run length
    — a single conversation-keyed shuffle at any corpus size, the same
    contract as transcript_structure_qc. Ordering inside the merged
    text is pinned by sort_array on (turn_idx, text) structs, not by
    collect order, so results are partitioning-invariant.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    flagged = df.withColumn(
        "_new_run",
        F.when(F.lag("role").over(w).isNull()
               | (F.col("role") != F.lag("role").over(w)), 1).otherwise(0))
    run = flagged.withColumn(
        "_island",
        F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    merged = (run.groupBy("conv_id", "_island")
              .agg(F.any_value("role").alias("role"),
                   F.array_join(
                       F.transform(
                           F.sort_array(F.collect_list(
                               F.struct("turn_idx", "text"))),
                           lambda s: s["text"]),
                       sep).alias("text"),
                   F.count(F.lit(1)).alias("n_merged")))
    return merged.select(
        "conv_id",
        (F.col("_island") - 1).cast("int").alias("turn_idx"),
        "role", "text", F.col("n_merged").cast("int").alias("n_merged"))


def tool_call_runs(df: DataFrame, conv_col: str = "conv_id",
                   turn_col: str = "turn_idx", tool_col: str = "tool",
                   loop_min: int = 3) -> DataFrame:
    """Stuck-agent loop detection over agent transcripts (north-rule
    schema's `tool` column): maximal runs of CONSECUTIVE tool calls
    invoking the same tool within a conversation — the curation signal
    for agents caught re-issuing the same call (retry storms, stuck
    search loops), one level up from tool_chain_stats' adjacent-retry
    count (which totals retries but cannot localize or size the runs).

    Gaps-and-islands on the tool-call subsequence: island id = (call
    sequence number) - (per-tool sequence number), both row_numbers
    over conversation-PARTITIONED windows ordered by turn — bounded by
    turns-per-conversation, never global. Non-tool turns between two
    calls of the same tool do NOT split a run (the agent's consecutive
    ACTIONS are what loop); conversations without tool calls emit
    nothing.

    Returns (conv_id, tool, start_turn, end_turn, run_len, is_loop)
    with is_loop = run_len >= loop_min. Deterministic: turn_idx is
    unique per conversation, so both row_numbers are pinned."""
    calls = df.filter(F.col(tool_col) != "").select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(tool_col).alias("tool"))
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_tool = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    isl = (F.row_number().over(w_all)
           - F.row_number().over(w_tool)).alias("_isl")
    runs = (calls.select("conv_id", "turn_idx", "tool", isl)
            .groupBy("conv_id", "tool", "_isl")
            .agg(F.count(F.lit(1)).alias("run_len"),
                 F.min("turn_idx").alias("start_turn"),
                 F.max("turn_idx").alias("end_turn")))
    return runs.select(
        "conv_id", "tool", "start_turn", "end_turn",
        F.col("run_len").cast("long").alias("run_len"),
        (F.col("run_len") >= loop_min).alias("is_loop"))


# --------------------------------------------------------------------
# Refusal / deflection screening — SFT-corpus admission filter
# --------------------------------------------------------------------

# Shared regex family (RE2-compatible: no lookarounds, (?i) inline
# flag) — rendered identically into Spark rlike and the DuckDB oracle.
# The canned-refusal screen is a standard SFT-data admission step:
# assistant turns that deflect ("I cannot help with", "As an AI ...")
# teach the model to refuse benign requests when they dominate a
# source, so pipelines measure and cap the per-source refusal rate.
REFUSAL_PATTERNS: list[str] = [
    r"(?i)\bi (?:cannot|can't|won't|will not) "
    r"(?:help|assist|provide|comply|do that|answer)\b",
    r"(?i)\bas an ai\b",
    r"(?i)\bi(?:'m| am) (?:unable|not able) to\b",
    r"(?i)\bi(?:'m| am) sorry,? but i\b",
]


def refusal_screen(df: DataFrame, conv_col: str = "conv_id",
                   turn_col: str = "turn_idx", role_col: str = "role",
                   text_col: str = "text",
                   patterns: list[str] | None = None) -> DataFrame:
    """Per-conversation refusal statistics over assistant turns:
    (conv_id, n_assistant, n_refusals, refusal_rate, first_refusal_turn).

    A turn is a refusal iff it matches ANY pattern (one fused rlike
    disjunction — a single JVM regex pass per turn, no UDF). Shape: a
    pushed-down role filter then ONE conv-keyed aggregation with
    map-side partials; no windows, no joins — scales to any corpus."""
    pats = patterns if patterns is not None else REFUSAL_PATTERNS
    is_ref = F.lit(False)
    for p in pats:
        is_ref = is_ref | F.col(text_col).rlike(p)
    a = (df.filter(F.col(role_col) == "assistant")
         .select(F.col(conv_col).alias("conv_id"),
                 F.col(turn_col).alias("turn_idx"),
                 is_ref.cast("int").alias("is_refusal")))
    return a.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_assistant"),
        F.sum("is_refusal").cast("long").alias("n_refusals"),
        F.round(F.sum("is_refusal") / F.count(F.lit(1)), 6)
        .alias("refusal_rate"),
        F.min(F.when(F.col("is_refusal") == 1, F.col("turn_idx")))
        .cast("int").alias("first_refusal_turn"),
    )


# --------------------------------------------------------------------
# Code-fence integrity — truncated-generation QC
# --------------------------------------------------------------------

def code_fence_qc(df: DataFrame, conv_col: str = "conv_id",
                  turn_col: str = "turn_idx", role_col: str = "role",
                  text_col: str = "text") -> DataFrame:
    """Per assistant turn, triple-backtick fence accounting:
    (conv_id, turn_idx, n_fences, balanced, ends_open) for turns that
    contain at least one fence. An ODD fence count means an unclosed
    code block — the signature of a truncated generation or a mangled
    export, a standard SFT-corpus QC screen (truncated assistant code
    answers train cut-off completions).

    n_fences counts non-overlapping '```' occurrences exactly as
    (len(text) - len(replace(text, '```', ''))) / 3 — pure JVM string
    ops, engine-portable to the SQL oracle verbatim. ends_open flags
    odd counts (text ends inside a fence). Narrow projection + filter
    only — no shuffle at all."""
    n = ((F.length(F.col(text_col))
          - F.length(F.replace(F.col(text_col), F.lit("```"), F.lit(""))))
         / F.lit(3)).cast("int")
    return (df.filter(F.col(role_col) == "assistant")
            .select(F.col(conv_col).alias("conv_id"),
                    F.col(turn_col).alias("turn_idx"),
                    n.alias("n_fences"))
            .filter(F.col("n_fences") > 0)
            .select("conv_id", "turn_idx", "n_fences",
                    (F.col("n_fences") % 2 == 0).cast("int")
                    .alias("balanced"),
                    (F.col("n_fences") % 2 == 1).cast("int")
                    .alias("ends_open")))


# --------------------------------------------------------------------
# Conversation language consistency — multilingual SFT QC
# --------------------------------------------------------------------

def conv_lang_consistency(df: DataFrame, conv_col: str = "conv_id",
                          turn_col: str = "turn_idx",
                          text_col: str = "text") -> DataFrame:
    """Per-conversation language-switch QC over per-turn heuristic
    language ID (functions/text.py marker profiles): mid-conversation
    language flips are a known multilingual-SFT corpus defect (mixed
    exports, code-switching scrapes) that trains spurious language
    drift. Marker-free turns identify as 'und' and count as their own
    label (documented).

    -> (conv_id, n_turns, dominant_lang, n_dominant, n_switches,
    consistent): dominant = most frequent per-turn language (ties lang
    ASC), n_switches = adjacent turn pairs whose language differs,
    consistent = no switches at all.

    Shape: tokens explode -> broadcast marker join -> (conv, turn,
    lang) agg -> per-TURN argmax window -> per-CONV lag window + one
    conv agg; every window is conversation-partitioned (bounded by
    turns-per-conv), never global."""
    from connectors_spark.functions.text import LANG_MARKERS

    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, m) for lang, ms in sorted(LANG_MARKERS.items())
         for m in ms],
        "lang string, term string")
    base = df.select(F.col(conv_col).alias("conv_id"),
                     F.col(turn_col).alias("turn_idx"),
                     F.col(text_col).alias("text"))
    toks = base.select(
        "conv_id", "turn_idx",
        F.explode(tokens_col(F.col("text"))).alias("term"))
    hits = (toks.join(F.broadcast(markers), "term")
            .groupBy("conv_id", "turn_idx", "lang")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    wt = Window.partitionBy("conv_id", "turn_idx") \
        .orderBy(F.desc("n_hits"), F.asc("lang"))
    best = (hits.withColumn("r", F.row_number().over(wt))
            .filter("r = 1").select("conv_id", "turn_idx", "lang"))
    turns = (base.select("conv_id", "turn_idx")
             .join(best, ["conv_id", "turn_idx"], "left")
             .select("conv_id", "turn_idx",
                     F.coalesce("lang", F.lit("und")).alias("lang")))
    wc = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = turns.withColumn("prev", F.lag("lang").over(wc))
    per_lang = (turns.groupBy("conv_id", "lang")
                .agg(F.count(F.lit(1)).alias("n")))
    wd = Window.partitionBy("conv_id").orderBy(F.desc("n"), F.asc("lang"))
    dom = (per_lang.withColumn("r", F.row_number().over(wd))
           .filter("r = 1")
           .select("conv_id", F.col("lang").alias("dominant_lang"),
                   F.col("n").cast("long").alias("n_dominant")))
    agg = seq.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("prev").isNotNull()
                     & (F.col("prev") != F.col("lang")), 1)
              .otherwise(0)).cast("long").alias("n_switches"))
    return (agg.join(dom, "conv_id")
            .select("conv_id", "n_turns", "dominant_lang", "n_dominant",
                    "n_switches",
                    (F.col("n_switches") == 0).cast("int")
                    .alias("consistent")))


# --------------------------------------------------------------------
# Instruction diversity — Self-Instruct-style template audit
# --------------------------------------------------------------------

def instruction_diversity(df: DataFrame, conv_col: str = "conv_id",
                          turn_col: str = "turn_idx",
                          role_col: str = "role",
                          text_col: str = "text",
                          source_col: str = "source") -> DataFrame:
    """Per-source instruction-diversity audit (the Self-Instruct §4.2
    analysis shape): the FIRST user turn of each conversation is its
    instruction; a source whose instructions collapse onto few
    templates (low distinct ratio, one dominant leading token) teaches
    the model that template, not the task.

    -> (source, n_convs, n_distinct, distinct_ratio, top_first_token,
    top_share): n_distinct counts whitespace-normalized lowercase
    instructions; top_first_token is the most frequent instruction-
    leading token (the heuristic verb slot; ties token ASC) with its
    share of conversations.

    Shape: conv-partitioned row_number to pick the first user turn
    (bounded by turns-per-conv), then source-keyed aggs; the leading-
    token argmax is a source-partitioned window over a token-histogram
    frame bounded by the vocabulary, never the corpus."""
    base = df.filter(F.col(role_col) == "user").select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    first = (base.withColumn("r", F.row_number().over(w)).filter("r = 1")
             .select("conv_id", "source",
                     F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
                     .alias("norm")))
    first = first.withColumn(
        "tok1", F.element_at(tokens_col(F.col("norm")), 1))
    per_src = first.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.countDistinct("norm").cast("long").alias("n_distinct"))
    tok_hist = (first.filter(F.col("tok1").isNotNull())
                .groupBy("source", "tok1")
                .agg(F.count(F.lit(1)).alias("n")))
    wt = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("tok1"))
    top = (tok_hist.withColumn("r", F.row_number().over(wt)).filter("r = 1")
           .select("source", F.col("tok1").alias("top_first_token"),
                   F.col("n").alias("top_n")))
    return (per_src.join(top, "source", "left")
            .select("source", "n_convs", "n_distinct",
                    F.round(F.col("n_distinct") / F.col("n_convs"), 6)
                    .alias("distinct_ratio"),
                    "top_first_token",
                    F.round(F.col("top_n") / F.col("n_convs"), 6)
                    .alias("top_share")))


# --------------------------------------------------------------------
# Prompt-injection screening over tool turns — untrusted-context QC
# --------------------------------------------------------------------

# RE2-safe shared family (no lookarounds; (?i) inline). Tool turns
# carry UNTRUSTED retrieved content into the context window; injected
# imperatives are the classic poisoning vector for agent transcripts
# used as training data — screen and cap before training, exactly like
# refusal density.
INJECTION_PATTERNS: list[str] = [
    r"(?i)\bignore (?:all |the )?(?:previous|prior|above) instructions\b",
    r"(?i)\bdisregard (?:the |your )?(?:system|previous) prompt\b",
    r"(?i)\byou are now\b",
    r"(?i)\bnew instructions?:\s",
    r"(?i)\bsystem override\b",
]


def injection_screen(df: DataFrame, conv_col: str = "conv_id",
                     turn_col: str = "turn_idx", role_col: str = "role",
                     text_col: str = "text",
                     patterns: list[str] | None = None) -> DataFrame:
    """Per-conversation injected-imperative statistics over TOOL turns
    (the untrusted-content channel): (conv_id, n_tool, n_flagged,
    flagged_rate, first_flagged_turn). Same shape as refusal_screen —
    one fused rlike disjunction, pushed-down role filter, ONE conv-
    keyed map-side-combinable aggregation."""
    pats = patterns if patterns is not None else INJECTION_PATTERNS
    hit = F.lit(False)
    for p in pats:
        hit = hit | F.col(text_col).rlike(p)
    t = (df.filter(F.col(role_col) == "tool")
         .select(F.col(conv_col).alias("conv_id"),
                 F.col(turn_col).alias("turn_idx"),
                 hit.cast("int").alias("is_inj")))
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tool"),
        F.sum("is_inj").cast("long").alias("n_flagged"),
        F.round(F.sum("is_inj") / F.count(F.lit(1)), 6)
        .alias("flagged_rate"),
        F.min(F.when(F.col("is_inj") == 1, F.col("turn_idx")))
        .cast("int").alias("first_flagged_turn"),
    )
