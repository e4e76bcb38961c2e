"""EQL sequence/sample state-machine semantics (operators/eql.py)."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.eql import eql_sample, eql_sequence


def _ev(spark, rows):
    # rows: (id, key, second-offset, type)
    df = spark.createDataFrame(
        [(i, k, f"2024-01-01 00:00:{s:02d}", t) for i, k, s, t in rows],
        "event_id long, user_id string, ts string, event_type string",
    )
    return df.selectExpr("event_id", "user_id",
                         "cast(ts as timestamp) ts", "event_type")


def _stages(*types):
    return [F.col("event_type") == t for t in types]


def _seqs(df, n=3):
    cols = ["user_id"] + [f"id_{j}" for j in range(1, n + 1)]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_basic_three_stage_chain(spark):
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "b"), (3, "u", 3, "c"),
                     (4, "v", 1, "a"), (5, "v", 2, "c")])  # v: no b
    out = eql_sequence(ev, _stages("a", "b", "c"), key="user_id")
    assert _seqs(out) == [("u", 1, 2, 3)]


def test_last_pending_candidate_wins(spark):
    # a1 .. a2 .. b: the chain uses the MOST RECENT a (EQL runs-ahead).
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "a"), (3, "u", 3, "b")])
    out = eql_sequence(ev, _stages("a", "b"), key="user_id")
    assert _seqs(out, n=2) == [("u", 2, 3)]


def test_maxspan_expires_chain(spark):
    # a at t=1; b at t=30 — dead under maxspan=10s, alive under 60s.
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 30, "b")])
    tight = eql_sequence(ev, _stages("a", "b"), key="user_id",
                         maxspan_sec=10)
    wide = eql_sequence(ev, _stages("a", "b"), key="user_id",
                        maxspan_sec=60)
    assert _seqs(tight, n=2) == []
    assert _seqs(wide, n=2) == [("u", 1, 2)]


def test_maxspan_measured_from_first_stage(spark):
    # a t=1, b t=5, c t=20: span(first..last)=19 > 10 — the 3-stage
    # completion must check against t1, not t2.
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 5, "b"), (3, "u", 20, "c")])
    out = eql_sequence(ev, _stages("a", "b", "c"), key="user_id",
                       maxspan_sec=10)
    assert _seqs(out) == []


def test_until_expires_pending(spark):
    # a t=1, X t=2 (until), b t=3: the pending a died at X.
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "x"), (3, "u", 3, "b"),
                     (4, "v", 1, "a"), (5, "v", 3, "b")])
    out = eql_sequence(ev, _stages("a", "b"), key="user_id",
                       until=F.col("event_type") == "x")
    assert _seqs(out, n=2) == [("v", 4, 5)]


def test_until_only_kills_older_state(spark):
    # X t=1 BEFORE a t=2 must not kill the later chain.
    ev = _ev(spark, [(1, "u", 1, "x"), (2, "u", 2, "a"), (3, "u", 3, "b")])
    out = eql_sequence(ev, _stages("a", "b"), key="user_id",
                       until=F.col("event_type") == "x")
    assert _seqs(out, n=2) == [("u", 2, 3)]


def test_chains_never_cross_keys(spark):
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "v", 2, "b")])
    out = eql_sequence(ev, _stages("a", "b"), key="user_id")
    assert _seqs(out, n=2) == []


def test_each_completion_event_emits_at_most_one_chain(spark):
    # two b's after one a: each b completes a chain (the a stays
    # pending), but each emits exactly once.
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "b"), (3, "u", 3, "b")])
    out = eql_sequence(ev, _stages("a", "b"), key="user_id")
    assert _seqs(out, n=2) == [("u", 1, 2), ("u", 1, 3)]


def test_sequence_partition_invariance(spark):
    ev = _ev(spark, [(i, f"u{i % 2}", i, "abc"[i % 3])
                     for i in range(60)])
    args = dict(stages=_stages("a", "b", "c"), key="user_id",
                maxspan_sec=25)
    one = _seqs(eql_sequence(ev.coalesce(1), **args))
    many = _seqs(eql_sequence(ev.repartition(13), **args))
    assert one == many and one


def test_sample_requires_all_filters_and_picks_latest(spark):
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 5, "a"), (3, "u", 2, "b"),
                     (4, "v", 1, "a")])  # v lacks b
    out = eql_sample(ev, [("a", F.col("event_type") == "a"),
                          ("b", F.col("event_type") == "b")],
                     key="user_id")
    rows = {r["user_id"]: (r["id_a"], r["id_b"]) for r in out.collect()}
    assert rows == {"u": (2, 3)}


def test_sequence_rejects_single_stage(spark):
    ev = _ev(spark, [(1, "u", 1, "a")])
    with pytest.raises(ValueError):
        eql_sequence(ev, _stages("a"), key="user_id")


# ---------------------------------------------------------- consuming variant

def test_consuming_each_prefix_used_once(spark):
    # a b b: real EQL consumes the a on the first completion — the
    # second b finds nothing pending (vs 2 chains from eql_sequence).
    from connectors_spark.operators.eql import eql_sequence_consuming

    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "b"), (3, "u", 3, "b")])
    out = eql_sequence_consuming(ev, _stages("a", "b"), key="user_id")
    assert _seqs(out, n=2) == [("u", 1, 2)]


def test_consuming_matches_window_variant_when_finals_unique(spark):
    from connectors_spark.operators.eql import eql_sequence_consuming

    ev = _ev(spark, [(i, f"u{i % 2}", i, "abc"[i % 3])
                     for i in range(60)])
    args = dict(stages=_stages("a", "b", "c"), key="user_id",
                maxspan_sec=25)
    # alternating a/b/c per key: no repeated finals against one prefix,
    # so consuming and non-consuming semantics coincide
    assert _seqs(eql_sequence_consuming(ev, **args)) == \
        _seqs(eql_sequence(ev, **args))


def test_consuming_maxspan_and_until(spark):
    from connectors_spark.operators.eql import eql_sequence_consuming

    # maxspan: a t=1, b t=30 dead at 10s, alive at 60s
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 30, "b")])
    assert _seqs(eql_sequence_consuming(
        ev, _stages("a", "b"), key="user_id", maxspan_sec=10), n=2) == []
    assert _seqs(eql_sequence_consuming(
        ev, _stages("a", "b"), key="user_id", maxspan_sec=60),
        n=2) == [("u", 1, 2)]
    # until kills strictly-older pending state only
    ev2 = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "x"), (3, "u", 3, "b"),
                      (4, "v", 2, "a"), (5, "v", 3, "b")])
    out = eql_sequence_consuming(ev2, _stages("a", "b"), key="user_id",
                                 until=F.col("event_type") == "x")
    assert _seqs(out, n=2) == [("v", 4, 5)]


def test_consuming_newer_start_replaces_older(spark):
    from connectors_spark.operators.eql import eql_sequence_consuming

    # a1 a2 b: tail semantics — the chain uses the MOST RECENT a,
    # same as the window variant
    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "a"), (3, "u", 3, "b")])
    out = eql_sequence_consuming(ev, _stages("a", "b"), key="user_id")
    assert _seqs(out, n=2) == [("u", 2, 3)]


def test_consuming_partition_invariance(spark):
    from connectors_spark.operators.eql import eql_sequence_consuming

    ev = _ev(spark, [(i, f"u{i % 3}", i, "abcb"[i % 4])
                     for i in range(48)])
    args = dict(stages=_stages("a", "b", "c"), key="user_id",
                maxspan_sec=30)
    one = _seqs(eql_sequence_consuming(ev.coalesce(1), **args))
    many = _seqs(eql_sequence_consuming(ev.repartition(13), **args))
    assert one == many and one


def test_consuming_timestamps_tz_safe(spark):
    # Regression: the UDF used to emit naive pandas datetimes, which
    # Arrow re-interprets as session-LOCAL wall clock — every ts_j
    # shifted by the UTC offset whenever the session tz != UTC. The
    # emitted instants must equal the input events' instants and the
    # non-consuming variant's, under any session timezone.
    from connectors_spark.operators.eql import eql_sequence_consuming

    ev = _ev(spark, [(1, "u", 1, "a"), (2, "u", 2, "b")])
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = eql_sequence_consuming(ev, _stages("a", "b"), key="user_id")
        want = eql_sequence(ev, _stages("a", "b"), key="user_id")
        cols = ["user_id", "ts_1", "ts_2"]
        g = [tuple(r) for r in got.select(*cols).collect()]
        w = [tuple(r) for r in want.select(*cols).collect()]
        assert g == w
        micros = {r[0]: (r[1], r[2]) for r in
                  got.selectExpr("user_id", "unix_micros(ts_1)",
                                 "unix_micros(ts_2)").collect()}
        src = {r[0]: r[1] for r in
               ev.selectExpr("event_id", "unix_micros(ts)").collect()}
        assert micros["u"] == (src[1], src[2])
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
