"""span_annotation_qc + instruction_diversity: closed-form fixture
expectations, overlap semantics, plan shape."""

from pyspark.sql import functions as F

from connectors_spark.operators.annotation import span_annotation_qc
from connectors_spark.operators.transcript_qc import instruction_diversity


def _fixture(spark):
    from connectors_spark.entry_queries import _SPANQC_DOCS, _SPANQC_SPANS
    docs = spark.createDataFrame(_SPANQC_DOCS, "doc_id int, text string")
    spans = spark.createDataFrame(
        _SPANQC_SPANS, "doc_id int, start int, end int, label string")
    return docs, spans


def test_span_qc_closed_form(spark):
    docs, spans = _fixture(spark)
    out = {r["label"]: r for r in span_annotation_qc(docs, spans).collect()}
    for lab in ("PER", "O", "LOC", "ID", "ID2", "X"):
        assert out[lab]["in_bounds"] == 1, lab
        assert out[lab]["token_aligned"] == 1, lab
    # valid set: exactly the non-overlapping aligned in-bounds spans
    assert {lab for lab, r in out.items() if r["valid"] == 1} == \
        {"PER", "O", "LOC", "ID2", "X"}
    # failure classes, each isolated
    assert out["OOB"]["in_bounds"] == 0
    assert out["NEG"]["in_bounds"] == 0
    assert out["EMPTY"]["in_bounds"] == 0
    assert out["BAD"]["token_aligned"] == 0 and out["BAD"]["overlapping"] == 1
    assert out["LOC2"]["overlapping"] == 1
    # keep-first overlap semantics: of the (ID2, ID) pair the LATER
    # (longer) span carries the flag
    assert out["ID2"]["overlapping"] == 0 and out["ID"]["overlapping"] == 1


def test_span_qc_garbage_spans_do_not_poison_overlap(spark):
    # the out-of-bounds NEG span (-1, 1) precedes X (0, 1) in doc 2 —
    # it must NOT mark X as overlapping
    docs, spans = _fixture(spark)
    out = {r["label"]: r for r in span_annotation_qc(docs, spans).collect()}
    assert out["X"]["valid"] == 1 and out["X"]["overlapping"] == 0


def test_span_qc_window_is_doc_partitioned(spark):
    docs, spans = _fixture(spark)
    plan = span_annotation_qc(docs, spans) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "doc_id" in spec, plan


def test_hyphen_interior_span_is_boundary_aligned(spark):
    # alignment checks BOUNDARIES only: "LOG-42" (interior hyphen) is
    # aligned; "LOG-" (ends on the hyphen) is not
    docs = spark.createDataFrame(
        [(0, "call LOG-42 at once")], "doc_id int, text string")
    spans = spark.createDataFrame(
        [(0, 5, 11, "full"), (0, 5, 9, "dash_end")],
        "doc_id int, start int, end int, label string")
    out = {r["label"]: r["token_aligned"]
           for r in span_annotation_qc(docs, spans).collect()}
    assert out["full"] == 1 and out["dash_end"] == 0


# ------------------------------------------------ instruction diversity
def test_instruction_diversity_closed_form(spark):
    from connectors_spark.entry_queries import _instr_rows
    df = spark.createDataFrame(
        _instr_rows(),
        "conv_id int, turn_idx int, role string, text string, "
        "source string")
    out = {r["source"]: r for r in instruction_diversity(df).collect()}
    s = out["synth"]
    # 4 convs, case/whitespace-normalized dup collapses to 3 distinct
    assert s["n_convs"] == 4 and s["n_distinct"] == 3
    assert abs(s["distinct_ratio"] - 0.75) < 1e-12
    assert s["top_first_token"] == "write"
    assert abs(s["top_share"] - 0.75) < 1e-12
    h = out["human"]
    # the assistant-only conv is excluded; the system-opener conv's
    # instruction is its turn-1 user text
    assert h["n_convs"] == 3 and h["n_distinct"] == 3
    # leading tokens how/why/can each once -> tie broken token ASC
    assert h["top_first_token"] == "can"


def test_instruction_diversity_windows_partitioned(spark):
    from connectors_spark.entry_queries import _instr_rows
    df = spark.createDataFrame(
        _instr_rows(),
        "conv_id int, turn_idx int, role string, text string, "
        "source string")
    plan = instruction_diversity(df) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert ("conv_id" in spec) or ("source" in spec), plan


# --------------------------------------------------- injection screen
def test_injection_screen_closed_form(spark):
    from connectors_spark.entry_queries import _inj_rows
    from connectors_spark.operators.transcript_qc import injection_screen
    df = spark.createDataFrame(
        _inj_rows(), "conv_id int, turn_idx int, role string, text string")
    out = {r["conv_id"]: r for r in injection_screen(df).collect()}
    # conv 0: 2 tool turns, the uppercase injected one flags (case-
    # insensitive family), first at turn 3
    assert out[0]["n_tool"] == 2 and out[0]["n_flagged"] == 1
    assert out[0]["first_flagged_turn"] == 3
    # conv 1: both template variants flag
    assert out[1]["n_flagged"] == out[1]["n_tool"] == 2
    # conv 2: text ABOUT injection does not flag
    assert out[2]["n_flagged"] == 0
    assert out[2]["first_flagged_turn"] is None
    # conv 3 has no tool turns -> absent
    assert 3 not in out
    # assistant/user turns never flag even if they contained templates
    df2 = df.withColumn("role", F.lit("assistant"))
    assert injection_screen(df2).count() == 0


# --------------------------------------------------- curation pipeline
def test_curation_pipeline_funnel_conserves_corpus(spark, sf_dir):
    from connectors_spark.entry_queries import q_curation_pipeline, _read
    out = q_curation_pipeline(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in out)
    assert total == _read(spark, sf_dir, "documents").count()
    stages = {r["stage"] for r in out}
    assert stages <= {"dropped_quality", "dropped_dup",
                      "train", "val", "test"}
    assert "train" in stages


def test_curation_pipeline_drops_planted_duplicates(spark):
    from connectors_spark.functions.text import quality_features
    from connectors_spark.operators.pretrain import assign_split
    # same text planted twice: keep-first leaves ONE rep; quality gate
    # applies BEFORE dedup (a low-quality dup never reaches the hash)
    good = ("the curious engineers examined the ancient library and the "
            "massive archive to understand the forgotten history of the "
            "distant country and the remarkable culture that the "
            "travelers described in the journals")  # quality ~0.70
    rows = [(0, good), (1, good), (2, "zz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = quality_features(docs).join(docs, "doc_id")
    surv = q.filter(F.col("quality") >= 0.5).withColumn("h", F.md5("text"))
    reps = surv.groupBy("h").agg(F.min("doc_id").alias("rep_id"))
    kept = surv.join(reps, "h")
    assert kept.filter(F.col("doc_id") != F.col("rep_id")).count() == 1
    rep_ids = [r["doc_id"] for r in
               kept.filter(F.col("doc_id") == F.col("rep_id")).collect()]
    assert rep_ids == [0]  # keep-FIRST
    # and the split of the surviving rep is the stable md5 bucket
    s = assign_split(kept.filter(F.col("doc_id") == F.col("rep_id")),
                     "doc_id").collect()[0]
    assert s["split"] in ("train", "val", "test")


# -------------------------------------------- centroid similarity matrix
def test_label_centroid_similarity_closed_form(spark):
    from connectors_spark.operators.similarity import (
        label_centroid_similarity)
    # label 0 centroid -> (1, 0); label 1 -> (0, 1); label 2 -> (1, 0)
    rows = [(0, [1.0, 0.0]), (0, [1.0, 0.0]),
            (1, [0.0, 2.0]), (1, [0.0, 0.5]),
            (2, [2.0, 0.0])]
    emb = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {(r["label_a"], r["label_b"]): r["cos"]
           for r in label_centroid_similarity(emb).collect()}
    assert abs(out[(0, 1)]) < 1e-9          # orthogonal
    assert abs(out[(0, 2)] - 1.0) < 1e-9    # parallel (scale-invariant)
    assert abs(out[(1, 2)]) < 1e-9
    # upper triangle only: 3 labels -> 3 pairs, label_a < label_b
    assert set(out) == {(0, 1), (0, 2), (1, 2)}


def test_label_centroid_pair_frame_is_label_bounded(spark, sf_dir):
    from connectors_spark.entry_queries import q_label_centroid_similarity
    df = q_label_centroid_similarity(spark, sf_dir)
    n_labels = 10  # testdata embeddings carry 10 labels
    assert df.count() == n_labels * (n_labels - 1) // 2


# ---------------------------------------------------- counter rate
def test_counter_rate_reset_semantics(spark):
    from connectors_spark.entry_queries import _counter_rows
    from connectors_spark.operators.timeseries import counter_rate
    df = spark.createDataFrame(
        _counter_rows(), "series string, ts string, value double")
    out = {r["series"]: r for r in counter_rate(df).collect()}
    # s0: deltas 2,3,(reset->1),3 = 9 over 40s
    assert abs(out["s0"]["increase"] - 9.0) < 1e-9
    assert abs(out["s0"]["rate_per_sec"] - 9.0 / 40) < 1e-6
    # s1 monotone with a flat step: increase = 35 - 10
    assert abs(out["s1"]["increase"] - 25.0) < 1e-9
    # s2 two resets: deltas (3->1 reset)=1, 1, (2->0 reset)=0, 6 = 8
    assert abs(out["s2"]["increase"] - 8.0) < 1e-9
    # a naive last-minus-first would say 6 - 3 = 3: resets must matter
    assert out["s2"]["increase"] > 6.0 - 3.0
    # singleton: zero span -> NULL rate, zero increase
    assert out["s3"]["n_samples"] == 1
    assert abs(out["s3"]["increase"]) < 1e-12
    assert out["s3"]["rate_per_sec"] is None


# ------------------------------------------------- esql CATEGORIZE
def test_esql_categorize_groups_log_templates(spark):
    from connectors_spark.operators.esql import esql
    rows = [(0, "Connection timeout after 30 ms"),
            (1, "Connection timeout after 4500 ms"),
            (2, "Connection timeout after 7 ms"),
            (3, "User 42 logged in"),
            (4, "User 7 logged in")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["cat"]: r["n"] for r in esql(
        spark, {"documents": docs},
        'FROM documents | STATS n = COUNT(*) BY cat = CATEGORIZE(text)'
    ).collect()}
    # numeric slots vanish -> the three timeout lines share a template
    assert out["connection timeout after ms"] == 3
    assert out["user logged in"] == 2


# ------------------------------------------------- image dHash dedup
def test_dhash_absorbs_then_detects_then_misses(spark, sf_dir):
    from connectors_spark.entry_queries import q_image_dhash_neardup
    out = {(r["class_a"], r["class_b"]): r
           for r in q_image_dhash_neardup(spark, sf_dir).collect()}
    # perturbed copies of their 4k+2 base: absorbed / near / boundary
    assert out[(10, 11)]["hamming"] == 0 and out[(10, 11)]["near"] == 1
    assert out[(2, 3)]["hamming"] == 1 and out[(2, 3)]["near"] == 1
    assert out[(6, 7)]["hamming"] == 5 and out[(6, 7)]["near"] == 0
    # structurally different classes stay far apart
    assert out[(0, 4)]["hamming"] > 4


def test_dhash_codec_roundtrip_is_pure_function(spark):
    from connectors_spark.operators.multimodal import (
        decode_ppm, dhash64, encode_ppm, synth_class_image)
    # python-side recompute matches the frozen oracle constant for a
    # couple of classes (drift in codec or hash math fails here first)
    assert dhash64(decode_ppm(encode_ppm(synth_class_image(0)))) == \
        -4311812355
    assert dhash64(decode_ppm(encode_ppm(synth_class_image(11)))) == \
        -5208439413319207210


def test_curation_pipeline_no_corpus_self_join(spark, sf_dir):
    from connectors_spark.entry_queries import q_curation_pipeline
    plan = q_curation_pipeline(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    # text rides the feature projection; dedup rep join is hash-keyed
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan


# ---------------------------------------------------- tsid time series
def test_tsid_last_value_tie_break(spark):
    from pyspark.sql import functions as FF
    # two samples share the max ts: the higher event_id wins (the
    # sortable-scalar tie-break, identical on the oracle side)
    rows = [("a", "2024-01-01 00:00:00", 1.0, 1),
            ("a", "2024-01-01 00:00:10", 2.0, 2),
            ("a", "2024-01-01 00:00:10", 9.0, 3)]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double, event_id long")
    key = FF.format_string(
        "%020d-%020d",
        FF.unix_micros(FF.col("ts").cast("timestamp")), FF.col("event_id"))
    got = df.groupBy("event_type").agg(
        FF.max_by("value", key).alias("last_value")).collect()[0]
    assert got["last_value"] == 9.0


# ------------------------------------------------------- TPC-H tail
def test_tpch_q6_predicates_reach_scan_and_no_join(spark, sf_dir):
    from connectors_spark.entry_queries import q_tpch_forecast_revenue
    df = q_tpch_forecast_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters")[1][:300]
    assert df.collect()[0]["revenue"] > 0


def test_tpch_q10_q18_heads_are_take_ordered(spark, sf_dir):
    from connectors_spark.entry_queries import (
        q_tpch_large_orders, q_tpch_returned_items)
    for fn in (q_tpch_returned_items, q_tpch_large_orders):
        plan = fn(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, fn.__name__
        assert "Window" not in plan, fn.__name__


def test_tpch_q4_compiles_to_left_semi(spark, sf_dir):
    from connectors_spark.entry_queries import q_tpch_priority_semijoin
    plan = q_tpch_priority_semijoin(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "Window" not in plan


def test_tpch_q12_single_agg_pass(spark, sf_dir):
    from connectors_spark.entry_queries import q_tpch_shipmode_priority
    plan = q_tpch_shipmode_priority(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    # one join, conditional counts in one aggregation — never a second
    # scan/join pair for the high/low split
    import re
    assert len(re.findall(r"Scan parquet", plan)) == 2, plan
