"""ES|QL compiler: expression semantics, command behavior, error
handling, and plan quality (pushdown / partial agg / broadcast enrich).
"""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.esql import EsqlError, esql


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "ada", "fr", 10.0, ["x", "y"]),
        (2, "bob", "de", -3.5, []),
        (3, "cat", None, 7.25, None),
        (4, "dan", "fr", 2.0, ["z"]),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, lang string, score double, "
              "tags array<string>")


def _run(spark, tables, prog, **kw):
    return esql(spark, tables, prog, **kw)


def test_precedence_and_arithmetic(spark, people):
    out = _run(spark, {"t": people},
               'FROM t | EVAL v = 2 + 3 * 4 - 1, w = (2 + 3) * 4, '
               'm = 10 % 3, d = 7 / 2 | KEEP id, v, w, m, d | SORT id '
               '| LIMIT 1').collect()[0]
    assert (out.v, out.w, out.m, out.d) == (13, 20, 1, 3.5)


def test_where_boolean_operators(spark, people):
    got = _run(spark, {"t": people},
               'FROM t | WHERE (lang == "fr" OR score < 0) '
               'AND NOT name == "dan" | KEEP id').collect()
    assert sorted(r.id for r in got) == [1, 2]


def test_like_wildcards_and_rlike(spark, people):
    got = _run(spark, {"t": people},
               'FROM t | WHERE name LIKE "?a*" | KEEP id').collect()
    assert sorted(r.id for r in got) == [3, 4]  # cat, dan
    got2 = _run(spark, {"t": people},
                'FROM t | WHERE name NOT RLIKE "^[abc]" '
                '| KEEP name').collect()
    assert [r.name for r in got2] == ["dan"]


def test_in_and_is_null(spark, people):
    got = _run(spark, {"t": people},
               'FROM t | WHERE lang IN ("fr", "es") | KEEP id').collect()
    assert sorted(r.id for r in got) == [1, 4]
    got2 = _run(spark, {"t": people},
                'FROM t | WHERE lang IS NULL | KEEP id').collect()
    assert [r.id for r in got2] == [3]
    got3 = _run(spark, {"t": people},
                'FROM t | WHERE lang IS NOT NULL AND lang NOT IN ("fr") '
                '| KEEP id').collect()
    assert [r.id for r in got3] == [2]


def test_stats_global_and_grouped(spark, people):
    row = _run(spark, {"t": people},
               'FROM t | STATS n = COUNT(*), s = ROUND(SUM(score), 2), '
               'u = COUNT_DISTINCT(lang)').collect()[0]
    assert (row.n, row.s, row.u) == (4, 15.75, 2)
    got = _run(spark, {"t": people},
               'FROM t | STATS n = COUNT(*) BY lang '
               '| SORT lang NULLS FIRST').collect()
    assert [(r.lang, r.n) for r in got] == [(None, 1), ("de", 1), ("fr", 2)]


def test_stats_expression_of_aggregate(spark, people):
    row = _run(spark, {"t": people},
               'FROM t | STATS r = ROUND(SUM(score) / COUNT(*), 3)'
               ).collect()[0]
    assert row.r == pytest.approx(3.938)


def test_sort_nulls_last_and_limit(spark, people):
    got = _run(spark, {"t": people},
               'FROM t | SORT lang DESC NULLS LAST, id ASC '
               '| KEEP id | LIMIT 3').collect()
    assert [r.id for r in got] == [1, 4, 2]


def test_keep_wildcard_order_and_drop(spark, people):
    df = _run(spark, {"t": people}, 'FROM t | KEEP na*, id')
    assert df.columns == ["name", "id"]
    df2 = _run(spark, {"t": people}, 'FROM t | DROP ta*, score')
    assert df2.columns == ["id", "name", "lang"]


def test_rename_and_row_source(spark, people):
    df = _run(spark, {"t": people}, 'FROM t | RENAME name AS who')
    assert "who" in df.columns and "name" not in df.columns
    row = _run(spark, {}, 'ROW a = 1, b = "x" | EVAL c = a + 10'
               ).collect()[0]
    assert (row.a, row.b, row.c) == (1, "x", 11)


def test_mv_expand_preserves_null_and_empty_rows(spark, people):
    got = _run(spark, {"t": people},
               'FROM t | MV_EXPAND tags | KEEP id, tags').collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.id, []).append(r.tags)
    # ES|QL: empty/null multivalue keeps its row with a null value
    assert by_id == {1: ["x", "y"], 2: [None], 3: [None], 4: ["z"]}


def test_enrich_duplicate_policy_keys_do_not_duplicate(spark, people):
    policy = spark.createDataFrame(
        [("fr", "France"), ("fr", "FRANCE"), ("de", "Germany")],
        "code string, country string")
    got = _run(spark, {"t": people},
               'FROM t | ENRICH geo ON lang WITH country | KEEP id, country',
               enrich_policies={"geo": (policy, "code")}).collect()
    assert len(got) == 4  # left join, no fan-out
    by_id = {r.id: r.country for r in got}
    assert by_id[2] == "Germany" and by_id[3] is None
    # duplicate policy keys resolve DETERMINISTICALLY to the
    # lexicographically smallest enrich row (ADVICE r4): 'FRANCE' < 'France'
    assert by_id[1] == "FRANCE"


def test_case_date_trunc_and_functions(spark):
    df = spark.createDataFrame(
        [(1, "2024-03-05 13:45:00")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    row = esql(spark, {"t": df}, '''
        FROM t
        | EVAL d = DATE_TRUNC(1 hour, ts), y = DATE_EXTRACT("year", ts),
               s = SUBSTRING(TO_UPPER(CONCAT("ab", "cd")), 2, 2),
               c = CASE(id > 5, "big", "small"),
               g = GREATEST(1, COALESCE(NULL, 3), 2)
    ''').collect()[0]
    assert str(row.d) == "2024-03-05 13:00:00"
    assert (row.y, row.s, row.c, row.g) == (2024, "BC", "small", 3)


def test_multi_table_from_unions(spark, people):
    half = people.limit(2)
    got = _run(spark, {"a": half, "b": half}, "FROM a, b")
    assert got.count() == 4


def test_errors(spark, people):
    t = {"t": people}
    with pytest.raises(EsqlError, match="unknown function"):
        _run(spark, t, "FROM t | EVAL x = NOPE(1)")
    with pytest.raises(EsqlError, match="outside STATS"):
        _run(spark, t, "FROM t | EVAL x = SUM(score)")
    with pytest.raises(EsqlError, match="unknown table"):
        _run(spark, t, "FROM missing")
    with pytest.raises(EsqlError, match="unknown enrich policy"):
        _run(spark, t, "FROM t | ENRICH nope ON lang")
    with pytest.raises(EsqlError, match="trailing"):
        _run(spark, t, 'FROM t | WHERE id == 1 extra_garbage')
    with pytest.raises(EsqlError, match="COUNT"):
        _run(spark, t, "FROM t | EVAL x = ABS(*)")
    with pytest.raises(EsqlError, match="FROM or ROW"):
        _run(spark, t, "WHERE id == 1")


def test_trailing_tokens_rejected_everywhere(spark, people):
    # the mis-parse bug class: a dropped tail must never pass silently
    for prog in [
        "FROM t | EVAL x = 1 1",
        "FROM t | STATS n = COUNT(*) BY lang lang",
        "FROM t | SORT id ASC id",
    ]:
        with pytest.raises(EsqlError):
            _run(spark, {"t": people}, prog)


# ------------------------------------------------------------ plan tests

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_where_pushes_to_scan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = esql(spark, {"events": ev},
              'FROM events | WHERE event_type == "click" | KEEP event_id')
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" \
        in plan
    # KEEP prunes the scan to the two referenced columns
    assert "ReadSchema: struct<event_id:bigint,event_type:string>" in plan


def test_stats_has_partial_aggregation(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = esql(spark, {"events": ev},
              'FROM events | STATS n = COUNT(*) BY event_type')
    assert _plan(df).count("HashAggregate") == 2  # partial + final


def test_enrich_is_broadcast(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    policy = spark.createDataFrame([(7, "vip")], "uid long, tier string")
    df = esql(spark, {"events": ev},
              'FROM events | ENRICH tiers ON user_id WITH tier',
              enrich_policies={"tiers": (policy, "uid")})
    assert "BroadcastHashJoin" in _plan(df)


def test_sort_limit_is_take_ordered(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = esql(spark, {"events": ev},
              'FROM events | SORT value DESC | LIMIT 5')
    assert "TakeOrderedAndProject" in _plan(df)


def test_bucket_numeric_auto_and_time(spark):
    from connectors_spark.operators.esql import _nice_span

    assert _nice_span(0.0, 100.0, 20) == 5.0
    assert _nice_span(0.0, 100.0, 3) == 50.0
    assert _nice_span(0.0, 7.0, 100) == 0.1
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, x double")
    got = esql(spark, {"t": df},
               'FROM t | STATS n = COUNT(*) BY b = BUCKET(x, 20, 0, 100) '
               '| SORT b').collect()
    # span 5 -> ids 0..4 in bucket 0, 5..9 in bucket 5
    assert [(r.b, r.n) for r in got] == [(0.0, 5), (5.0, 5)]


def test_stats_per_agg_where(spark, people):
    row = _run(spark, {"t": people},
               'FROM t | STATS n = COUNT(*), pos = COUNT(*) WHERE score > 0, '
               's = SUM(score) WHERE lang == "fr"').collect()[0]
    assert (row.n, row.pos, row.s) == (4, 3, 12.0)


def test_dissect_round_trip_and_final_greedy(spark):
    from connectors_spark.functions.scalars import dissect_to_regex
    import re as _re

    regex, fields = dissect_to_regex("%{a} | %{b} rest=%{rest}")
    assert fields == ["a", "b", "rest"]
    m = _re.match(regex, "x | y z rest=p q r")
    assert m.groups() == ("x", "y z", "p q r")  # final field greedy
    # skip + padding modifiers
    regex2, fields2 = dissect_to_regex("%{?skip}:%{val->} end")
    assert fields2 == ["val"]
    assert _re.match(regex2, "ignored:v   end").group(1) == "v"

    df = spark.createDataFrame([(1, "a=1 b=2")], "id long, line string")
    row = esql(spark, {"t": df},
               'FROM t | DISSECT line "a=%{av} b=%{bv}"').collect()[0]
    assert (row.av, row.bv) == ("1", "2")


def test_lookup_join_fans_out_and_broadcasts(spark, people):
    lk = spark.createDataFrame(
        [("fr", "France"), ("fr", "Francophone"), ("de", "Germany")],
        "lang string, label string")
    df = esql(spark, {"t": people, "labels": lk},
              'FROM t | LOOKUP JOIN labels ON lang | KEEP id, label')
    rows = df.collect()
    # ids 1 and 4 are fr -> two rows EACH (fan-out, unlike ENRICH)
    assert len(rows) == 6
    assert sorted(r.label for r in rows if r.id == 1) == \
        ["France", "Francophone"]
    assert "BroadcastHashJoin" in _plan(df)
    with pytest.raises(EsqlError, match="unknown lookup table"):
        esql(spark, {"t": people}, "FROM t | LOOKUP JOIN nope ON lang")
    with pytest.raises(EsqlError, match="no field"):
        esql(spark, {"t": people, "labels": lk},
             "FROM t | LOOKUP JOIN labels ON name")


def test_mv_function_tail(spark, people):
    row = _run(spark, {"t": people}, '''
ROW x = 1
| EVAL arr = SPLIT("d b c a b", " ")
| EVAL s = MV_SORT(arr), sd = MV_SORT(arr, "DESC"),
       dd = MV_DEDUPE(arr), first = MV_FIRST(arr), last = MV_LAST(arr),
       sl = MV_SLICE(arr, 1, 2), neg = MV_SLICE(arr, -2, -1),
       one = MV_SLICE(arr, 2),
       med = MV_MEDIAN(SPLIT("4 1 3 2", " ")),
       medo = MV_MEDIAN(SPLIT("9 1 5", " "))
| KEEP s, sd, dd, first, last, sl, neg, one, med, medo
''').collect()[0]
    assert row.s == ["a", "b", "b", "c", "d"]
    assert row.sd == ["d", "c", "b", "b", "a"]
    assert row.dd == ["d", "b", "c", "a"]
    assert (row.first, row.last) == ("d", "b")
    assert row.sl == ["b", "c"]
    assert row.neg == ["a", "b"]
    assert row.one == ["c"]
    assert row.med == 2.5 and row.medo == 5.0
    # empty / null arrays: null-safe, no ANSI element_at error
    r2 = _run(spark, {"t": people},
              'FROM t | EVAL f = MV_FIRST(tags), l = MV_LAST(tags), '
              's = MV_SLICE(tags, 0, 1) | KEEP id, f, l, s').collect()
    by_id = {r.id: r for r in r2}
    assert by_id[2].f is None and by_id[2].s == []
    assert by_id[3].f is None and by_id[3].s is None


def test_mv_sum_avg_median_empty_and_null_semantics(spark, people):
    # ES|QL: an empty / all-null multivalue is MISSING -> null result,
    # never 0; null elements are ignored in the fold (ADVICE r4)
    r = _run(spark, {"t": people}, '''
ROW x = 1
| EVAL ok = SPLIT("1 2 3", " "),
       s = MV_SUM(ok), a = MV_AVG(ok), m = MV_MEDIAN(ok)
| KEEP s, a, m
''').collect()[0]
    assert (r.s, r.a, r.m) == (6.0, 2.0, 2.0)
    got = _run(spark, {"t": people},
               'FROM t | EVAL s = MV_SUM(tags), a = MV_AVG(tags), '
               'm = MV_MEDIAN(tags) | KEEP id, s, a, m').collect()
    by_id = {x.id: x for x in got}
    # id=2 has tags=[] and id=3 has tags=null (people fixture)
    for i in (2, 3):
        assert by_id[i].s is None and by_id[i].a is None \
            and by_id[i].m is None


def test_date_diff_and_format(spark):
    row = _run(spark, {}, '''
ROW a = 1
| EVAL t0 = TO_STRING("2024-01-10 06:30:00"),
       t1 = TO_STRING("2024-03-01 07:00:00")
| EVAL dd = DATE_DIFF("day", t0, t1), dn = DATE_DIFF("day", t1, t0),
       dh = DATE_DIFF("hour", t0, t1), dm = DATE_DIFF("month", t0, t1),
       dw = DATE_DIFF("week", t0, t1), dq = DATE_DIFF("quarter", t0, t1),
       fmt = DATE_FORMAT("yyyy/MM/dd HH", t0)
| KEEP dd, dn, dh, dm, dw, dq, fmt
''').collect()[0]
    # 51 days + 30 min elapsed -> truncation toward zero, sign-symmetric
    assert (row.dd, row.dn) == (51, -51)
    assert row.dh == 51 * 24
    assert (row.dm, row.dw, row.dq) == (1, 7, 0)
    assert row.fmt == "2024/01/10 06"
    with pytest.raises(EsqlError, match="unknown unit"):
        _run(spark, {},
             'ROW a = 1 | EVAL x = DATE_DIFF("fortnight", a, a)')


def test_inlinestats_by_key_window(spark, people):
    out = _run(spark, {"t": people}, '''
FROM t | WHERE lang IS NOT NULL
| INLINESTATS avg_s = AVG(score), n = COUNT(*) BY lang
| EVAL d = ROUND(score - avg_s, 6) | KEEP id, lang, d, n | SORT id''')
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n == 2 and rows[1].d == 4.0   # fr avg = 6.0
    assert rows[4].d == -4.0
    assert rows[2].n == 1 and rows[2].d == 0.0
    # keyless form: broadcast cross join, NOT a global window
    g = _run(spark, {"t": people},
             'FROM t | INLINESTATS m = MAX(score) | KEEP id, m')
    assert all(r.m == 10.0 for r in g.collect())
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan and "Window" not in plan


def test_inlinestats_per_agg_where_and_computed_key(spark, people):
    out = _run(spark, {"t": people}, '''
FROM t | INLINESTATS pos = COUNT(*) WHERE score > 0 BY half = id % 2
| KEEP id, half, pos | SORT id''').collect()
    by_id = {r.id: r for r in out}
    # half=1 -> ids 1,3 (10.0, 7.25 both > 0); half=0 -> ids 2,4 (one > 0)
    assert by_id[1].pos == 2 and by_id[3].pos == 2
    assert by_id[2].pos == 1 and by_id[4].pos == 1


def test_sample_deterministic_and_bounded(spark):
    big = spark.range(4000).withColumn("k", F.col("id").cast("string"))
    s1 = _run(spark, {"b": big}, "FROM b | SAMPLE 0.3")
    n1 = s1.count()
    assert 900 < n1 < 1500
    assert s1.count() == n1                      # same rows every run
    ids1 = {r.id for r in s1.collect()}
    ids2 = {r.id for r in
            _run(spark, {"b": big}, "FROM b | SAMPLE 0.3").collect()}
    assert ids1 == ids2
    with pytest.raises(EsqlError, match="probability"):
        _run(spark, {"b": big}, "FROM b | SAMPLE 1.5")


def test_fork_branches_and_errors(spark, people):
    out = _run(spark, {"t": people}, '''
FROM t | FORK (WHERE score > 0 | STATS n = COUNT(*))
              (STATS m = MIN(score))
              (WHERE lang == "fr" | EVAL s2 = score * 2 | KEEP id, s2)
| SORT _fork, id''').collect()
    forks = [r._fork for r in out]
    assert forks == ["fork1", "fork2", "fork3", "fork3"]
    assert out[0].n == 3 and out[1].m == -3.5
    assert [r.s2 for r in out[2:]] == [20.0, 4.0]
    with pytest.raises(EsqlError, match="2..8|branches"):
        _run(spark, {"t": people}, "FROM t | FORK (WHERE score > 0)")
    with pytest.raises(EsqlError, match="unbalanced"):
        _run(spark, {"t": people},
             "FROM t | FORK (WHERE a > 0) (WHERE b > 0")


def test_change_point_detects_step_and_indeterminable(spark):
    rows = [(i, 5.0 + (4.0 if i >= 12 else 0.0) + 0.2 * (i % 3))
            for i in range(24)]
    ser = spark.createDataFrame(rows, "i int, m double")
    out = _run(spark, {"s": ser},
               "FROM s | CHANGE_POINT m ON i").collect()
    hits = [r for r in out if r.type is not None]
    assert len(hits) == 1
    assert hits[0].i == 12 and hits[0].type == "step_change"
    assert hits[0].pvalue <= 0.05
    assert len(out) == 24                        # every row preserved
    # flat noise -> indeterminable, custom AS names
    flat = spark.createDataFrame(
        [(i, 5.0 + 0.3 * ((i * 7) % 5)) for i in range(20)],
        "i int, m double")
    out2 = _run(spark, {"s": flat},
                "FROM s | CHANGE_POINT m ON i AS kind, p").collect()
    hit2 = [r for r in out2 if r.kind is not None]
    assert len(hit2) == 1 and hit2[0].kind == "indeterminable"
    with pytest.raises(EsqlError, match="no column"):
        _run(spark, {"s": flat}, "FROM s | CHANGE_POINT nope ON i")


def test_keyword_named_assignment_targets(spark, people):
    # ES|QL allows columns named like clause keywords when followed by =
    row = _run(spark, {"t": people},
               'FROM t | EVAL first = 1, last = 2, on = 3 '
               '| KEEP first, last, on | LIMIT 1').collect()[0]
    assert (row.first, row.last, row.on) == (1, 2, 3)


def test_esql_parser_fuzz_typed_errors_only(spark, people):
    """Any input either compiles, raises EsqlError (parser/compiler
    contract), or raises Spark's AnalysisException (unresolved columns /
    type mismatches — Catalyst's job, surfaced as-is) — never a raw
    Python exception. Plans are built but not executed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.errors import AnalysisException

    commands = st.sampled_from([
        "WHERE", "EVAL", "STATS", "SORT", "LIMIT", "KEEP", "DROP",
        "RENAME", "MV_EXPAND", "INLINESTATS", "SAMPLE", "FORK",
        "CHANGE_POINT", "LOOKUP", "ENRICH", "GROK", "DISSECT"])
    frags = st.text(
        alphabet='abz019 =<>!|,()*"%+-.:', min_size=0, max_size=24)

    @settings(max_examples=250, deadline=None)
    @given(st.lists(st.tuples(commands, frags), min_size=0, max_size=3))
    def run(segs):
        prog = "FROM t" + "".join(
            f" | {c} {body}" for c, body in segs)
        try:
            esql(spark, {"t": people}, prog)
        except (EsqlError, AnalysisException):
            pass

    run()


def test_completion_registry_and_errors(spark, people):
    from connectors_spark.operators.inference import register_endpoint

    out = _run(spark, {"t": people}, '''
FROM t | COMPLETION s = CONCAT(name, " Speaks ", lang)
         WITH test_completion
| KEEP id, s''').collect()
    by_id = {r.id: r.s for r in out}
    assert by_id[1] == "completion: ada speaks fr"
    with pytest.raises(EsqlError, match="unknown inference endpoint"):
        _run(spark, {"t": people},
             "FROM t | COMPLETION name WITH nope")
    with pytest.raises(EsqlError, match="WITH"):
        _run(spark, {"t": people}, "FROM t | COMPLETION name")
    register_endpoint("shout", lambda s: s.map(
        lambda p: None if p is None else p.upper()))
    row = _run(spark, {"t": people}, '''
FROM t | COMPLETION c = name WITH shout | KEEP id, c
| SORT id | LIMIT 1''').collect()[0]
    assert row.c == "ADA"


def test_from_metadata_index(spark, people):
    half = people.limit(2)
    got = _run(spark, {"a": half, "b": half},
               'FROM a, b METADATA _index | STATS n = COUNT(*) '
               'BY _index | SORT _index').collect()
    assert [(r._index, r.n) for r in got] == [("a", 2), ("b", 2)]
    with pytest.raises(EsqlError, match="unsupported METADATA"):
        _run(spark, {"a": half}, "FROM a METADATA _score")


def test_rerank_command(spark, people):
    out = _run(spark, {"t": people}, '''
FROM t | RERANK r = "ada bob zz" ON name WITH test_rerank
| SORT r DESC, id ASC | KEEP id, r''').collect()
    assert [(r.id, r.r) for r in out[:2]] == [
        (1, round(1 / 3, 6)), (2, round(1 / 3, 6))]
    assert all(r.r == 0.0 for r in out[2:])
    with pytest.raises(EsqlError, match="unknown rerank endpoint"):
        _run(spark, {"t": people},
             'FROM t | RERANK "x" ON name WITH nope')
    with pytest.raises(EsqlError, match="no column"):
        _run(spark, {"t": people},
             'FROM t | RERANK "x" ON missing WITH test_rerank')


def test_enrich_range_policy_and_overlap_validation(spark, people):
    tiers = spark.createDataFrame(
        [(0.0, 5.0, "low"), (5.0, 100.0, "high")],
        "lo double, hi double, tier string")
    out = _run(spark, {"t": people}, '''
FROM t | ENRICH tiers ON score WITH tier | KEEP id, tier''',
               enrich_policies={"tiers": (tiers, ("range", "lo", "hi"))}
               ).collect()
    by_id = {r.id: r.tier for r in out}
    # -3.5 falls in no tier (left join null); 2.0 low; 7.25/10.0 high
    assert by_id == {1: "high", 2: None, 3: "high", 4: "low"}
    bad = spark.createDataFrame(
        [(0.0, 6.0, "a"), (5.0, 9.0, "b")],
        "lo double, hi double, tier string")
    with pytest.raises(EsqlError, match="overlapping ranges"):
        _run(spark, {"t": people}, "FROM t | ENRICH bad ON score",
             enrich_policies={"bad": (bad, ("range", "lo", "hi"))})


def test_match_function_semantics(spark, people):
    got = _run(spark, {"t": people}, '''
FROM t | WHERE MATCH(name, "Ada") | KEEP id''').collect()
    assert [r.id for r in got] == [1]
    # AND semantics: both terms must appear
    df = spark.createDataFrame(
        [(1, "big data table scan"), (2, "data only"), (3, "table only")],
        "id int, text string")
    got2 = _run(spark, {"d": df},
                'FROM d | WHERE MATCH(text, "data table") | KEEP id'
                ).collect()
    assert [r.id for r in got2] == [1]
    with pytest.raises(EsqlError, match="non-empty"):
        _run(spark, {"d": df}, 'FROM d | WHERE MATCH(text, "  !! ")')


def test_cidr_match_function(spark):
    df = spark.createDataFrame(
        [(1, "10.64.0.1"), (2, "10.0.0.1"), (3, "192.168.0.9"),
         (4, "10.127.255.255")],
        "id long, ip string")
    out = esql(spark, {"t": df},
               'FROM t | WHERE CIDR_MATCH(ip, "10.64.0.0/10", '
               '"192.168.0.0/24") | SORT id | KEEP id')
    assert [r.id for r in out.collect()] == [1, 3, 4]
    with pytest.raises(EsqlError, match="at least one block"):
        esql(spark, {"t": df}, 'FROM t | WHERE CIDR_MATCH(ip)')
