"""Dedup operators: exact groups, MinHash+LSH near-dups, SimHash."""

import pyspark.sql.functions as F
import pytest

from connectors_spark.operators.dedup import (
    doc_shingles,
    exact_dup_groups,
    minhash_near_dups,
    simhash_bits,
)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again today "
    "while the shiny river runs past the quiet village mill under bright "
    "morning light carrying small wooden boats to the old stone bridge"
)
NEAR = BASE + " afterwards"  # appended token: jaccard ~ n/(n+1)
OTHER = "completely different content about spark query engines at scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                      # exact dup of 1
        (3, BASE.replace("the quick", "The  QUICK").replace("dog", "DOG")),
        (4, NEAR),                      # near dup of 1
        (5, OTHER),
        (6, None),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups_normalized(spark, docs):
    groups = exact_dup_groups(docs).collect()
    # 1, 2 and 3 normalize identically (case/whitespace differences)
    assert len(groups) == 1
    g = groups[0]
    assert g.n_dups == 3 and g.min_doc_id == 1


def test_minhash_finds_near_dup(spark, docs):
    out = {(r.doc_a, r.doc_b): r for r in minhash_near_dups(docs).collect()}
    # exact (normalized) dups are COLLAPSED to one representative before
    # LSH — they are exact_dup_groups' output, never near-dup pairs
    assert (1, 2) not in out and (1, 3) not in out
    # near dup shares most shingles -> high jaccard, found via LSH
    assert (1, 4) in out
    assert 0.9 < out[(1, 4)].jaccard < 1.0
    # unrelated docs never pair
    assert not any(5 in p for p in out)


def test_jaccard_matches_python(spark, docs):
    sh = doc_shingles(docs)
    got = {r.doc_id: set() for r in sh.select("doc_id").distinct().collect()}
    for r in sh.collect():
        got[r.doc_id].add(r.shingle)
    out = {(r.doc_a, r.doc_b): r for r in minhash_near_dups(docs).collect()}
    a, b = got[1], got[4]
    exp = len(a & b) / len(a | b)
    assert out[(1, 4)].jaccard == pytest.approx(round(exp, 6))


def test_simhash_properties(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash_bits(docs).collect()}
    assert set(sh) == {1, 2, 3, 4, 5}  # null/empty text yield no terms
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in sh.values())
    assert sh[1] == sh[2] == sh[3]
    ham_near = sum(x != y for x, y in zip(sh[1], sh[4]))
    ham_far = sum(x != y for x, y in zip(sh[1], sh[5]))
    assert ham_near < ham_far
    assert ham_near <= 16


def test_lsh_pair_count_sane_on_random(spark):
    # random docs: candidate pairs must stay tiny (LSH, not cross join)
    from connectors_spark.synth import synth_transcripts
    from connectors_spark.operators.build import with_doc_id

    t = with_doc_id(synth_transcripts(spark, 40, seed=9)).select("doc_id", "text")
    n = t.count()
    pairs = minhash_near_dups(t).count()
    assert pairs < n * (n - 1) / 20


def test_identical_doc_blowup_is_linear(spark):
    """10k identical docs: exact-dup collapse keeps the LSH stage to ONE
    representative — the near-dup pipeline completes with zero pairs and
    no quadratic bucket self-join (round-1 VERDICT scale defect)."""
    from connectors_spark.operators.dedup import minhash_near_dups

    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact text repeated in every document body").alias("text"),
    )
    # a couple of genuinely near-dup distinct texts ride along
    extra = spark.createDataFrame(
        [(n + 1, "a distinct near duplicate body with shared shingle runs here"),
         (n + 2, "a distinct near duplicate body with shared shingle runs there")],
        "doc_id long, text string",
    )
    out = minhash_near_dups(docs.unionByName(extra)).collect()
    # identical docs produce NO near-dup pairs (they are exact-dup output);
    # the two distinct near-dups still pair up
    assert {(r.doc_a, r.doc_b) for r in out} == {(n + 1, n + 2)}


def test_oversize_bucket_emits_star_edges(spark):
    """A band bucket past bucket_cap emits O(n) star edges, not O(n^2)."""
    from connectors_spark.operators.dedup import lsh_candidate_pairs

    n = 40
    sigs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        *[F.lit("deadbeef").alias(f"s{i}") for i in range(16)],
    )
    pairs = lsh_candidate_pairs(sigs, bucket_cap=8).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert got == {(0, d) for d in range(1, n)}  # star around min doc_id

    # under the cap: exact all-pairs candidate set
    pairs_small = lsh_candidate_pairs(
        sigs.filter(F.col("doc_id") < 5), bucket_cap=8
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs_small} == {
        (a, b) for a in range(5) for b in range(5) if a < b
    }


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation reaches the component min across a chain
    longer than one hop (transitivity), keeps disjoint clusters apart,
    and elects exactly one canonical doc per cluster."""
    from connectors_spark.operators.dedup import (
        connected_components, dedup_clusters)

    # chain 10-20-30-40 plus disjoint pair (5, 7): diameter 3 > 1 hop
    edges = spark.createDataFrame(
        [(20, 10), (20, 30), (40, 30), (5, 7)], "doc_a long, doc_b long"
    )
    got = {(r.doc_id, r.component)
           for r in connected_components(edges).collect()}
    assert got == {(10, 10), (20, 10), (30, 10), (40, 10), (5, 5), (7, 5)}

    # end-to-end: exact dups + a near-dup of the representative fold
    # into ONE cluster with the min doc_id canonical
    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, body), (2, body),                       # exact dups
         (3, body + " tail"),                        # near-dup of rep 1
         (9, "an entirely different document body about spark plans")],
        "doc_id long, text string",
    )
    out = dedup_clusters(docs, jaccard_threshold=0.5).collect()
    assert {(r.doc_id, r.component, r.is_canonical) for r in out} == {
        (1, 1, 1), (2, 1, 0), (3, 1, 0)
    }  # doc 9 has no edge -> absent (trivially canonical)
