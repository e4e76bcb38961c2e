"""LLM-pipeline ops: repetition metrics, contamination, filter stack."""

from pyspark.sql import functions as F

from connectors_spark.functions.text import (
    contamination_overlap, repetition_metrics,
)
from connectors_spark.operators.pretrain import pretrain_filter


def test_repetition_metrics_hand_computed(spark):
    rows = [
        (1, "a b c d"),          # all unique: top word 1/4, top 2gram 2/4
        (2, "x x x x"),          # degenerate: everything 1.0
        (3, "a b a b a"),        # top word 3/5; "a b" x2 -> 4/5; 3grams
                                 # "a b a" x2 -> 6/5 capped at 1.0
        (4, ""),                 # zero tokens -> all 0.0
        (5, "q r"),              # too short for 3-grams -> dup 0.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert got[1].n_tokens == 4
    assert abs(got[1].top_word_frac - 0.25) < 1e-9
    assert abs(got[1].top_2gram_frac - 0.5) < 1e-9
    assert got[1].dup_3gram_frac == 0.0
    assert got[2].top_word_frac == 1.0
    assert got[2].top_2gram_frac == 1.0   # "x x" x3 -> 6/4 capped
    assert got[2].dup_3gram_frac == 1.0   # "x x x" x2 -> 6/4 capped
    assert abs(got[3].top_word_frac - 0.6) < 1e-9
    assert abs(got[3].top_2gram_frac - 0.8) < 1e-9
    assert got[3].dup_3gram_frac == 1.0
    assert got[4].n_tokens == 0 and got[4].top_word_frac == 0.0
    assert got[5].dup_3gram_frac == 0.0


def test_contamination_overlap_detects_copies(spark):
    evl = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, evl, "eval"),
        (2, evl, "train"),                          # exact copy -> 1.0
        (3, "completely different words here now ok", "train"),  # 0.0
        (4, "the quick brown fox jumps away from here ok", "train"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in contamination_overlap(
        docs, F.col("source") == "eval", n=5).collect()}
    assert set(got) == {2, 3, 4}  # eval doc itself excluded
    assert got[2].overlap_frac == 1.0
    assert got[3].overlap_frac == 0.0
    # doc 4 shares exactly the one 5-gram "the quick brown fox jumps"
    assert got[4].n_hit == 1 and 0.0 < got[4].overlap_frac < 1.0


def test_pretrain_filter_rules_and_dedup(spark):
    long_ok = " ".join(f"w{i}" for i in range(30))
    rows = [
        (1, long_ok, "en"),            # keep
        (2, long_ok, "en"),            # exact dup of 1 -> dropped
        (3, long_ok, "fr"),            # wrong lang
        (4, "short text", "en"),       # too short
        (5, " ".join(["spam"] * 40), "en"),  # repetitive
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in pretrain_filter(docs).collect()}
    assert got[1].keep and got[1].keep_dedup
    assert not got[2].keep and not got[2].keep_dedup  # later id loses
    assert got[2].keep_lang and got[2].keep_len and got[2].keep_rep
    assert not got[3].keep_lang and not got[3].keep
    assert not got[4].keep_len and not got[4].keep
    assert not got[5].keep_rep and not got[5].keep


def test_vocab_table_ranking_and_oov(spark):
    from connectors_spark.operators.pretrain import (
        tokens_to_ids, vocab_table)

    rows = [(1, 0, "b"), (1, 1, "b"), (1, 2, "a"), (1, 3, "a"),
            (2, 0, "c"), (2, 1, "rare")]
    toks = spark.createDataFrame(rows, "doc_id long, pos int, term string")
    vocab = {r.term: r.token_id
             for r in vocab_table(toks, vocab_size=3).collect()}
    # count DESC then term ASC: a(2)=1, b(2)=2, c(1)=3; "rare" cut at V=3
    assert vocab == {"a": 1, "b": 2, "c": 3}
    ids = {(r.doc_id, r.pos): r.token_id
           for r in tokens_to_ids(toks, vocab_table(toks, 3)).collect()}
    assert ids[(2, 1)] == 0          # OOV -> <unk>
    assert ids[(1, 2)] == 1 and ids[(1, 0)] == 2


def test_pack_sequences_matches_serial_and_partition_invariant(spark):
    import numpy as np

    from connectors_spark.operators.pretrain import pack_sequences

    rng = np.random.default_rng(7)
    lens = rng.integers(1, 40, size=50)
    rows = [(int(d), int(p), int(rng.integers(0, 9)))
            for d in range(50) for p in range(lens[d])]
    toks = spark.createDataFrame(
        rows, "doc_id long, pos int, token_id int")

    # serial oracle: concatenate streams in (doc_id, pos) order
    serial = {}
    g = 0
    for d in range(50):
        for p in range(lens[d]):
            serial[(d, p)] = (g // 128, g % 128)
            g += 1

    for nparts in (3, 32):
        got = {(r.doc_id, r.pos): (r.seq_id, r.pos_in_seq)
               for r in pack_sequences(toks, seq_len=128,
                                       num_parts=nparts).collect()}
        assert got == serial, f"num_parts={nparts}"


def _py_bpe_reference(word_freqs, n_merges):
    """Independent single-process Sennrich BPE for the oracle."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = (
                    counts.get((seq[i], seq[i + 1]), 0) + f)
        if not counts:
            break
        # ties: count DESC then pair ASC — same rule as the engine
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        a, b = best
        nv = {}
        for seq, f in vocab.items():
            r, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    r.append(a + b)
                    i += 2
                else:
                    r.append(seq[i])
                    i += 1
            nv[tuple(r)] = nv.get(tuple(r), 0) + f
        vocab = nv
    return merges


def test_learn_bpe_matches_reference_and_encode_roundtrip(spark):
    from connectors_spark.functions.analysis import tokenize_py
    from connectors_spark.operators.pretrain import (
        bpe_encode_udf, learn_bpe_merges)

    texts = [
        "low lower lowest newer new news widest wide",
        "low low lower newer newer newest wide wider",
        "the newer the better the widest the lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    freqs = {}
    for t in texts:
        for w in tokenize_py(t):
            freqs[w] = freqs.get(w, 0) + 1
    expected = _py_bpe_reference(freqs, 12)

    merges, syms = learn_bpe_merges(docs, n_merges=12)
    assert merges == expected

    # encoding each distinct word with the learned merges reproduces
    # the training-side final symbol sequence exactly
    enc = bpe_encode_udf(merges)
    got = {r.w: (r.syms, r.enc) for r in
           syms.withColumn("enc", enc(F.col("w"))).collect()}
    assert set(got) == set(freqs)
    for w, (train_syms, enc_syms) in got.items():
        assert enc_syms == train_syms, w
    syms.unpersist()


def test_learn_bpe_sampled_head_matches_full_corpus(spark):
    """VERDICT r4 #4: learning merges on the word-frequency HEAD
    (sample_top_n_words) reproduces full-corpus merges exactly when the
    head covers the pair-count mass, while encode runs unchanged over
    the whole corpus. Also pins that the head restriction is
    deterministic (freq DESC, word ASC) by learning twice."""
    from connectors_spark.operators.pretrain import (
        bpe_encode_udf, learn_bpe_merges)

    # head words carry all the pair mass; the freq-1 tail ("qq" "zz"
    # "xx") contributes count-1 pairs only, so every argmax through 10
    # merges is identical with or without it (verified against the
    # pure-python reference: head==full for n_merges<=10, min winning
    # pair count 6; at 11 the full corpus would pick ('q','q')).
    freqs = {"banana": 10, "bandana": 8, "cabana": 6,
             "qq": 1, "zz": 1, "xx": 1}
    texts = [" ".join([w] * f) for w, f in freqs.items()]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    expected = _py_bpe_reference(freqs, 10)

    full, syms_full = learn_bpe_merges(docs, n_merges=10)
    syms_full.unpersist()
    assert full == expected

    head, syms_head = learn_bpe_merges(docs, n_merges=10,
                                       sample_top_n_words=3)
    n_head = syms_head.count()
    syms_head.unpersist()
    assert n_head == 3, "learning table must shrink to the head"
    assert head == full

    # encode is decoupled from the learning sample: every corpus word —
    # including tail words ABSENT from the head — encodes with the
    # learned merges into symbols that reassemble the word + marker
    enc = bpe_encode_udf(head)
    words = spark.createDataFrame(
        [("qq",), ("zz",), ("banana",)], "w string")
    for r in words.withColumn("e", enc(F.col("w"))).collect():
        assert "".join(r.e) == r.w + "</w>"


def test_pack_shards_scalable_matches_window_version(spark):
    """The two-pass per-stratum prefix-sum (stratified_offsets) must
    reproduce the window-based shard assignment exactly, at any
    partition count — the 100 TB path for corpus_shard_pack."""
    from pyspark.sql import Window

    from connectors_spark.operators.pretrain import pack_shards_scalable

    import numpy as np
    rng = np.random.default_rng(3)
    rows = [(int(i), ["en", "fr", "de"][int(i) % 3],
             int(rng.integers(50, 4000)))
            for i in range(300)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long")

    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    exp = {(r.doc_id): r.shard for r in docs.select(
        "doc_id",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / 20000)
        .alias("shard")).collect()}

    for nparts in (2, 17):
        got = {r.doc_id: r.shard for r in pack_shards_scalable(
            docs, budget=20000, num_parts=nparts).collect()}
        assert got == exp, f"num_parts={nparts}"


def test_longest_run_matches_naive_and_partition_invariant(spark):
    """segmented.longest_run's monoid combine == naive per-group RLE,
    at multiple partition counts, including boundary-straddling runs,
    all-hot and no-hot keys."""
    import numpy as np

    from connectors_spark.operators.segmented import longest_run

    rng = np.random.default_rng(5)
    rows = []
    for k in ("a", "b", "allhot", "cold"):
        for i in range(400):
            if k == "allhot":
                f = 1
            elif k == "cold":
                f = 0
            else:
                f = int(rng.integers(0, 2))
            rows.append((k, i, f))
    df = spark.createDataFrame(rows, "k string, i long, hot int")

    def naive(flags):
        best = run = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        return best

    by_key = {}
    for k, i, f in rows:
        by_key.setdefault(k, []).append((i, f))
    exp = {k: naive([f for _, f in sorted(v)]) for k, v in by_key.items()}
    assert exp["allhot"] == 400 and exp["cold"] == 0

    for nparts in (3, 32):
        got = {r.k: r.max_run for r in
               longest_run(df, "k", ["i"], "hot",
                           num_parts=nparts).collect()}
        assert got == exp, f"num_parts={nparts}"


def test_run_monoid_associative_and_split_invariant():
    """The run-length chunk summary merge is associative and
    split-invariant: any way of cutting a 0/1 sequence into chunks and
    folding _merge over per-chunk summaries yields the naive answer.
    Property-based — this is the algebra the distributed combine
    relies on."""
    from hypothesis import given, strategies as st

    from connectors_spark.operators.segmented import _merge

    def summary(seq):
        best = run = prefix = 0
        n = len(seq)
        counting_prefix = True
        for f in seq:
            run = run + 1 if f else 0
            best = max(best, run)
            if counting_prefix:
                if f:
                    prefix += 1
                else:
                    counting_prefix = False
        suffix = 0
        for f in reversed(seq):
            if f:
                suffix += 1
            else:
                break
        return (prefix, suffix, best, n)

    @given(st.lists(st.integers(0, 1), max_size=60),
           st.lists(st.integers(0, 59), max_size=5))
    def check(seq, cutpoints):
        cuts = sorted({c for c in cutpoints if c <= len(seq)})
        bounds = [0] + cuts + [len(seq)]
        acc = (0, 0, 0, 0)
        for a, b in zip(bounds, bounds[1:]):
            if b > a:
                acc = _merge(acc, summary(seq[a:b]))
        assert acc[2] == summary(seq)[2], (seq, cuts)
        if seq:
            assert acc == summary(seq)

    check()


def test_bpe_encode_word_invariants():
    """Pure-function BPE encode invariants, property-based: (1) the
    concatenated symbols always reconstruct word+</w> (lossless), (2)
    with no merges the output is chars+</w>, (3) every emitted symbol
    is either a single char, </w>, or the concatenation of a learned
    merge (closure under the merge table)."""
    from hypothesis import given, strategies as st

    from connectors_spark.operators.pretrain import (
        _EOW, bpe_encode_word)

    words = st.text(alphabet="abcd", min_size=1, max_size=12)

    @given(words, st.lists(
        st.tuples(st.text("abcd", min_size=1, max_size=3),
                  st.text("abcd", min_size=1, max_size=3)),
        max_size=8))
    def check(w, merge_list):
        ranks = {m: i for i, m in enumerate(dict.fromkeys(merge_list))}
        out = bpe_encode_word(w, ranks)
        assert "".join(out) == w + _EOW
        assert bpe_encode_word(w, {}) == list(w) + [_EOW]
        vocab_closure = set("abcd") | {_EOW}
        grown = True
        while grown:
            grown = False
            for (a, b) in ranks:
                if a in vocab_closure and b in vocab_closure \
                        and a + b not in vocab_closure:
                    vocab_closure.add(a + b)
                    grown = True
        for sym in out:
            assert sym in vocab_closure, (w, sym, ranks)

    check()


def test_dsir_importance_prefers_target_like_docs(spark):
    from connectors_spark.operators.pretrain import dsir_importance

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox sleeps near the lazy dog", "en"),
        (3, "der schnelle braune fuchs springt faul hund", "de"),
        (4, "le renard brun rapide saute par dessus chien", "fr"),
        (5, "the quick dog jumps over the brown fox", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = dsir_importance(df, F.col("lang") == "en", n_buckets=512)
    got = {r.doc_id: r.logw for r in w.collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # English-n-gram docs score above the German/French ones; doc 5
    # shares the target's n-grams despite its lang tag (DSIR scores
    # CONTENT, not metadata)
    assert min(got[1], got[2], got[5]) > max(got[3], got[4])
    # deterministic across runs
    again = {r.doc_id: r.logw for r in
             dsir_importance(df, F.col("lang") == "en",
                             n_buckets=512).collect()}
    assert again == got


def test_weighted_sample_wor_bias_and_determinism(spark):
    from connectors_spark.operators.pretrain import weighted_sample_wor

    # 2000 rows: half weight 10, half weight 1 -> heavy rows should win
    # far more of the 200 slots (ES race: P(inclusion) grows with w)
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"))
    out = weighted_sample_wor(df, "w", 200)
    rows = out.collect()
    assert len(rows) == 200
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == \
        list(range(1, 201))
    heavy = sum(1 for r in rows if r.weight == 10.0)
    assert heavy > 150  # ~10:1 odds per slot; binomial tail is tiny
    # determinism: rerun identical
    again = weighted_sample_wor(df, "w", 200).collect()
    assert sorted((r.doc_id, r.rank) for r in again) == \
        sorted((r.doc_id, r.rank) for r in rows)
    # zero/negative weights never race
    df2 = df.withColumn("w", F.when(F.col("doc_id") < 1990, 0.0)
                        .otherwise(F.col("w")))
    out2 = weighted_sample_wor(df2, "w", 200)
    assert out2.count() == 10


def test_md5_uniform_no_overflow_at_huge_ids(spark):
    # the old Knuth (id*2654435761) % 2^32 went NEGATIVE past
    # id ~3.47e9 (int64 overflow -> always-sampled bias); md5_uniform
    # must stay in [0, 1) at any id magnitude (ADVICE r4)
    from connectors_spark.operators.pretrain import md5_uniform

    ids = [0, 1, 3_470_000_000, 2**40, 2**62, -5]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = df.select("doc_id", md5_uniform(F.col("doc_id")).alias("u")
                    ).collect()
    assert len(got) == len(ids)
    for r in got:
        assert 0.0 <= r.u < 1.0, (r.doc_id, r.u)


def test_temperature_mix_huge_ids_not_always_sampled(spark):
    # with the overflow bug every huge-id doc was unconditionally kept;
    # now the keep rate must track the stratum rate
    from connectors_spark.operators.pretrain import temperature_mix

    base = 4_000_000_000  # past the old overflow threshold
    rows = [(base + i, "en") for i in range(400)] + \
           [(base + 10_000 + i, "zh") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, alpha=1.0, budget=250)
    # alpha=1 -> every stratum rate = budget/total = 0.5; an
    # always-true sampler would return all 500
    n = out.count()
    assert 150 < n < 350
