"""Best-fit-decreasing packing: known answer + invariants."""

from __future__ import annotations

import random
from collections import defaultdict

from connectors_spark.operators.pretrain import bestfit_pack


def _pack(spark, lens, L, parts=None):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long")
    return bestfit_pack(df, seq_len=L, num_parts=parts).collect()


def test_known_answer_single_partition(spark):
    rows = _pack(spark, [9, 8, 3, 2, 1, 1], L=10, parts=1)
    by_bin = defaultdict(list)
    for r in rows:
        by_bin[r.bin_id].append(r)
    # BFD: {9,1} {8,2} {3,1} -> 3 bins, fills 10/10/4
    assert len(by_bin) == 3
    assert sorted(sum(x.n_tokens for x in b) for b in by_bin.values()) \
        == [4, 10, 10]
    for b in by_bin.values():
        assert all(x.bin_fill == sum(y.n_tokens for y in b) for x in b)
    assert all(r.truncated == 0 for r in rows)


def test_oversize_doc_gets_solo_truncated_bin(spark):
    rows = _pack(spark, [25, 4, 4], L=10, parts=1)
    big = next(r for r in rows if r.n_tokens == 25)
    assert big.truncated == 1 and big.bin_fill == 10
    # nothing else shares the oversize doc's bin
    assert sum(1 for r in rows if r.bin_id == big.bin_id) == 1


def test_invariants_multi_partition(spark):
    rng = random.Random(7)
    lens = [rng.randint(1, 40) for _ in range(300)] + [99, 150]
    L = 32
    rows = _pack(spark, lens, L=L, parts=4)
    assert len(rows) == len(lens)          # every doc placed once
    assert len({r.doc_id for r in rows}) == len(lens)
    by_bin = defaultdict(list)
    for r in rows:
        by_bin[r.bin_id].append(r)
    for b in by_bin.values():
        packed = sum(min(x.n_tokens, L) for x in b)
        assert packed <= L                  # no bin overflows
        assert all(x.bin_fill == packed for x in b)
    for r in rows:
        assert r.truncated == (1 if r.n_tokens > L else 0)
        if r.truncated:
            assert len(by_bin[r.bin_id]) == 1
    # BFD efficiency sanity: no more bins than first-fit-arbitrary
    n_bins = len(by_bin)
    naive_lower = -(-sum(min(n, L) for n in lens) // L)
    assert n_bins <= 2 * naive_lower


def _pack_grouped(spark, lens, L, G, parts=None):
    df = spark.createDataFrame(
        [(i, n, i % G) for i, n in enumerate(lens)],
        "doc_id long, n_tokens long, grp long")
    if parts:
        df = df.repartition(parts)
    return bestfit_pack(df, seq_len=L, group_col="grp").collect()


def test_group_mode_known_answer(spark):
    # one group -> classic BFD: {9,1} {8,2} {3,1}, bin ids 0..2 in
    # open order (9 opens 0, 8 opens 1, 3 opens 2)
    rows = sorted(_pack_grouped(spark, [9, 8, 3, 2, 1, 1], L=10, G=1),
                  key=lambda r: r.doc_id)
    assert [r.bin_id for r in rows] == [0, 1, 2, 1, 0, 2]
    assert [r.bin_fill for r in rows] == [10, 10, 4, 10, 10, 4]


def test_group_mode_deterministic_across_parallelism(spark):
    """group_col packing is a pure function of the rows: identical
    output (bin ids included) no matter how the input is partitioned —
    the property the physical-partition mode cannot give."""
    import random
    rng = random.Random(11)
    lens = [rng.randint(1, 40) for _ in range(257)] + [99]
    outs = []
    for parts in (1, 3, 16):
        rows = _pack_grouped(spark, lens, L=32, G=4, parts=parts)
        outs.append(sorted((r.doc_id, r.n_tokens, r.bin_id, r.bin_fill,
                            r.truncated) for r in rows))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == len(lens)


def test_group_mode_bins_scoped_to_group(spark):
    rows = _pack_grouped(spark, [5, 5, 5, 5, 5, 5], L=10, G=2)
    for r in rows:
        assert (r.bin_id >> 33) == r.doc_id % 2  # group in the high bits
    # docs never share a bin across groups
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin_id, set()).add(r.doc_id % 2)
    assert all(len(g) == 1 for g in by_bin.values())
