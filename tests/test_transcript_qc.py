"""Transcript structure QC: each planted corruption trips exactly its flag."""

from __future__ import annotations

from connectors_spark.operators.transcript_qc import transcript_structure_qc

SCHEMA = "conv_id int, turn_idx int, role string, text string"


def _qc(spark, rows):
    return {r.conv_id: r for r in
            transcript_structure_qc(
                spark.createDataFrame(rows, SCHEMA)).collect()}


def test_well_formed_conversation_valid(spark):
    rows = [(0, 0, "system", "be helpful"), (0, 1, "user", "hi there"),
            (0, 2, "assistant", "hello friend"), (0, 3, "user", "thanks a lot")]
    r = _qc(spark, rows)[0]
    assert (r.starts_ok, r.alternates_ok, r.system_ok, r.no_gaps,
            r.no_empty, r.valid) == (1, 1, 1, 1, 1, 1)


def test_each_corruption_trips_its_flag(spark):
    rows = [
        # c1: user-user adjacency
        (1, 0, "user", "a b"), (1, 1, "user", "c d"),
        # c2: gap in turn_idx
        (2, 0, "user", "a b"), (2, 2, "assistant", "c d"),
        # c3: starts with assistant
        (3, 0, "assistant", "a b"), (3, 1, "user", "c d"),
        # c4: system mid-conversation
        (4, 0, "user", "a b"), (4, 1, "system", "c d"),
        # c5: empty turn
        (5, 0, "user", "a b"), (5, 1, "assistant", ""),
        # c6: turn_idx not starting at 0
        (6, 1, "user", "a b"), (6, 2, "assistant", "c d"),
    ]
    out = _qc(spark, rows)
    assert out[1].alternates_ok == 0 and out[1].valid == 0
    assert out[2].no_gaps == 0 and out[2].alternates_ok == 1
    assert out[3].starts_ok == 0 and out[3].no_gaps == 1
    assert out[4].system_ok == 0
    assert out[5].no_empty == 0
    assert out[6].no_gaps == 0
    # flags not implicated stay green
    assert out[2].starts_ok == out[4].starts_ok == out[5].starts_ok == 1


def test_system_only_conversation(spark):
    # no non-system turns: alternation vacuously true
    r = _qc(spark, [(9, 0, "system", "be nice")])[9]
    assert r.alternates_ok == 1 and r.system_ok == 1 and r.valid == 1


def test_turn_boilerplate_flags_cross_conv_templates(spark):
    from connectors_spark.operators.transcript_qc import turn_boilerplate
    rows = [
        (0, 0, "user", "Hello   There"),
        (0, 1, "assistant", "How can I help you today?"),
        (1, 0, "user", "hello there"),            # same after normalize
        (1, 1, "assistant", "How can I help you today?"),
        (2, 0, "user", "completely unique ask"),
    ]
    out = turn_boilerplate(
        spark.createDataFrame(rows, SCHEMA), min_convs=2).collect()
    by = {(r.conv_id, r.turn_idx): r for r in out}
    assert by[(0, 0)].is_boilerplate == 1      # normalization unifies
    assert by[(0, 0)].conv_df == 2
    assert by[(1, 1)].is_boilerplate == 1
    assert by[(2, 0)].is_boilerplate == 0
    # repeat WITHIN one conv does not count as cross-conv boilerplate
    rows2 = [(0, 0, "user", "same text"), (0, 1, "user", "same text")]
    out2 = turn_boilerplate(
        spark.createDataFrame(rows2, SCHEMA), min_convs=2).collect()
    assert all(r.is_boilerplate == 0 for r in out2)


# ------------------------------------------------- merge_adjacent_turns
def test_merge_adjacent_same_role_runs(spark):
    from connectors_spark.operators.transcript_qc import (
        merge_adjacent_turns)

    rows = [
        (1, 0, "system", "sys"),
        (1, 1, "user", "part one"),
        (1, 2, "user", "part two"),
        (1, 3, "user", "part three"),
        (1, 4, "assistant", "answer"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, text string")
    out = sorted(merge_adjacent_turns(df).collect(),
                 key=lambda r: r.turn_idx)
    assert [(r.turn_idx, r.role, r.n_merged) for r in out] == [
        (0, "system", 1), (1, "user", 3), (2, "assistant", 1)]
    assert out[1].text == "part one\npart two\npart three"


def test_merge_is_identity_on_alternating_conv(spark):
    from connectors_spark.operators.transcript_qc import (
        merge_adjacent_turns)

    rows = [(1, i, ("user", "assistant")[i % 2], f"t{i}")
            for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, text string")
    out = sorted(merge_adjacent_turns(df).collect(),
                 key=lambda r: r.turn_idx)
    assert [(r.turn_idx, r.role, r.text, r.n_merged) for r in out] == [
        (i, ("user", "assistant")[i % 2], f"t{i}", 1) for i in range(6)]


def test_merge_output_alternates(spark):
    """Post-condition: after the repair, no same-role adjacency remains
    anywhere (the defect transcript_structure_qc flags is gone)."""
    from connectors_spark.operators.transcript_qc import (
        merge_adjacent_turns, transcript_structure_qc)

    rows = [
        (1, 0, "user", "a"), (1, 1, "user", "b"),
        (1, 2, "assistant", "c"), (1, 3, "assistant", "d"),
        (1, 4, "user", "e"),
        (2, 0, "system", "s"), (2, 1, "user", "u"), (2, 2, "user", "v"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, text string")
    fixed = merge_adjacent_turns(df)
    qc = {r.conv_id: r for r in transcript_structure_qc(fixed).collect()}
    assert all(r.alternates_ok and r.no_gaps for r in qc.values()), qc
