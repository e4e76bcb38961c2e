"""Config field schema, cursor-paginated source, advanced-rule
validation, job cancellation, and the C5/C10/C12 utility trio."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from connectors_spark.plans.config import (
    ConfigValidationError, Field, SourceConfiguration,
)


# ------------------------------------------------------------------
# Field / SourceConfiguration (reference sdk/source.py:41-258)
# ------------------------------------------------------------------

def _cfg():
    return SourceConfiguration([
        Field("host"),
        Field("port", field_type="int", default_value=5432, required=False,
              validations=[{"type": "greater_than", "constraint": 0},
                           {"type": "less_than", "constraint": 65536}]),
        Field("tables", field_type="list", required=False, default_value="*"),
        Field("ssl", field_type="bool", required=False, default_value=False),
        Field("ssl_ca", depends_on=[{"field": "ssl", "value": True}]),
        Field("mode", required=False, default_value="full",
              validations=[{"type": "included_in",
                            "constraint": ["full", "incremental"]}]),
    ])


def test_config_defaults_and_coercion():
    c = _cfg().set_values(host="db", port="1234", tables="a, b, ,c")
    assert c.get("port") == 1234                      # str -> int
    assert c.get("tables") == ["a", "b", "c"]         # comma list, empties dropped
    assert c.get("ssl") is False                      # default
    c.check_valid()                                   # no errors


def test_config_missing_required_and_validations():
    c = _cfg().set_values(port=0, mode="bogus")       # host missing
    with pytest.raises(ConfigValidationError) as ei:
        c.check_valid()
    msgs = " ".join(ei.value.errors)
    assert "'host' cannot be empty" in msgs
    assert "should be greater than 0" in msgs
    assert "should be one of full, incremental" in msgs


def test_config_dependency_gating():
    # ssl off: ssl_ca not validated even though required+empty
    _cfg().set_values(host="db").check_valid()
    # ssl on: ssl_ca becomes active and fails
    c = _cfg().set_values(host="db", ssl=True)
    with pytest.raises(ConfigValidationError) as ei:
        c.check_valid()
    assert "'ssl_ca' cannot be empty" in " ".join(ei.value.errors)


def test_config_unknown_field_rejected():
    with pytest.raises(ConfigValidationError):
        _cfg().set_values(bogus=1)


# ------------------------------------------------------------------
# Cursor-paginated source (S8) + resumable checkpoint
# ------------------------------------------------------------------

def _fake_api(n_rows=230, page=37, fail_after=None):
    calls = {"n": 0}

    def fetch(cursor):
        calls["n"] += 1
        start = int(cursor) if cursor else 0
        if fail_after is not None and start >= fail_after:
            raise RuntimeError("api blew up")
        rows = [{"id": i, "body": f"row-{i}"}
                for i in range(start, min(start + page, n_rows))]
        nxt = str(start + page) if start + page < n_rows else None
        return rows, nxt

    return fetch, calls


def test_read_paged_drains_and_orders(spark, tmp_path):
    from connectors_spark.sources.paged import read_paged

    fetch, calls = _fake_api()
    df = read_paged(spark, fetch, "id long, body string",
                    str(tmp_path / "spill"), rows_per_spill=100)
    rows = sorted(r.id for r in df.collect())
    assert rows == list(range(230))
    assert calls["n"] == 7  # ceil(230/37)


def test_read_paged_resumes_from_cursor(spark, tmp_path):
    from connectors_spark.sources.paged import read_paged

    spill = str(tmp_path / "spill2")
    fetch, calls = _fake_api(fail_after=148)  # dies mid-stream
    with pytest.raises(RuntimeError):
        read_paged(spark, fetch, "id long, body string", spill,
                   rows_per_spill=74)
    # resume with a healthy API: only un-spilled pages are re-fetched
    fetch2, calls2 = _fake_api()
    df = read_paged(spark, fetch2, "id long, body string", spill,
                    rows_per_spill=74)
    assert sorted(r.id for r in df.collect()) == list(range(230))
    assert calls2["n"] < 7  # did NOT restart from page zero

    # a finished stream never touches the API again
    fetch3, calls3 = _fake_api()
    df2 = read_paged(spark, fetch3, "id long, body string", spill)
    assert df2.count() == 230 and calls3["n"] == 0


# ------------------------------------------------------------------
# Advanced-rule validation (reference sdk/filtering/validation.py)
# ------------------------------------------------------------------

def test_advanced_sql_validator(spark):
    from connectors_spark.operators.rule_validation import (
        FilteringValidator, validate_advanced_sql,
    )

    spark.createDataFrame([(1, "x")], "id long, body string") \
         .createOrReplaceTempView("adv_docs")

    ok = validate_advanced_sql(spark, "SELECT id FROM adv_docs WHERE id > 0")
    assert ok.state == "valid" and not ok.errors

    bad_col = validate_advanced_sql(spark, "SELECT nope FROM adv_docs")
    assert bad_col.state == "invalid"
    assert "analysis error" in bad_col.errors[0].messages[0].lower()

    bad_syntax = validate_advanced_sql(spark, "SELEKT * FORM x")
    assert bad_syntax.state == "invalid"

    # DDL/DML must be rejected WITHOUT executing
    ddl = validate_advanced_sql(spark, "DROP TABLE adv_docs")
    assert ddl.state == "invalid"
    assert "pure query" in ddl.errors[0].messages[0]
    assert spark.sql("SELECT count(*) FROM adv_docs").first()[0] == 1  # survived

    # facade aggregates basic + advanced
    res = FilteringValidator().validate(spark, {
        "rules": [
            {"id": "r1", "order": 0, "policy": "include", "field": "body",
             "rule": "equals", "value": "x"},
            {"id": "r2", "order": 1, "policy": "bogus", "field": "body",
             "rule": "equals", "value": "y"},
        ],
        "advanced_snippet": {"query": "SELECT id FROM adv_docs"},
    })
    assert res.state == "invalid"
    assert any("r2" in e.ids for e in res.errors)

    good = FilteringValidator().validate(spark, {
        "rules": [{"id": "r1", "order": 0, "policy": "include",
                   "field": "body", "rule": "equals", "value": "x"}],
        "advanced_snippet": {"query": "SELECT id FROM adv_docs"},
    })
    assert good.state == "valid"


# ------------------------------------------------------------------
# Cooperative cancellation (cancelJobGroup wiring)
# ------------------------------------------------------------------

def test_cancel_interrupts_running_spark_job(spark, tmp_path):
    from connectors_spark.plans.jobs import JobCatalog

    cat = JobCatalog(str(tmp_path / "jobs"))
    j = cat.create("conn-x")
    cat.claim(j, worker="w1")

    out = {}

    def long_job():
        # ~minutes of codegen'd work if not cancelled (no ANSI overflow)
        return spark.range(1 << 38).selectExpr("sum(id % 7)").first()

    def runner():
        out["result"] = cat.run_cancellable(spark, j, long_job)

    t = threading.Thread(target=runner)
    t.start()
    time.sleep(3)  # let the stage start
    cat.cancel(j, spark)
    t.join(timeout=120)
    assert not t.is_alive(), "cancelled job did not stop"
    assert out["result"] is None                  # cooperative stop
    assert cat.get(j)["status"] == "canceled"


def test_run_cancellable_marks_real_failures(spark, tmp_path):
    from connectors_spark.plans.jobs import JobCatalog

    cat = JobCatalog(str(tmp_path / "jobs2"))
    j = cat.create("conn-y")
    cat.claim(j, worker="w1")
    with pytest.raises(ZeroDivisionError):
        cat.run_cancellable(spark, j, lambda: 1 / 0)
    doc = cat.get(j)
    assert doc["status"] == "error" and "division" in doc["error"]


# ------------------------------------------------------------------
# C5 / C10 / C12 utilities
# ------------------------------------------------------------------

def test_scalar_utility_trio(spark):
    from connectors_spark.functions.scalars import (
        deep_merge_dicts, map_column_names, prefix_columns, truncate_id,
    )

    # C10 truncate_id
    df = spark.createDataFrame([("x" * 30,), ("short",)], "id string")
    got = [r.t for r in df.select(truncate_id(F.col("id")).alias("t")).collect()]
    assert got[0] == "x" * 8 + "..." + "x" * 8 and got[1] == "short"

    # C5 column prefixing
    assert map_column_names(["ID", "Name"], schema="Pub", tables=["b", "a"]) \
        == ["pub_a_b_id", "pub_a_b_name"]
    pdf = prefix_columns(spark.createDataFrame([(1, "n")], "ID long, Name string"),
                         schema="s", tables=["t"])
    assert pdf.columns == ["s_t_id", "s_t_name"]

    # C12 deep merge (new wins, recursion on dict-dict only)
    base = {"a": {"x": 1, "y": 2}, "b": 1}
    out = deep_merge_dicts(base, {"a": {"y": 3, "z": 4}, "c": 5})
    assert out == {"a": {"x": 1, "y": 3, "z": 4}, "b": 1, "c": 5}


def test_read_paged_retries_with_linear_backoff(spark, tmp_path):
    """S8 backoff (VERDICT r2 item 8): transient fetch failures retry
    under the reference's 5-try linear-backoff policy without advancing
    the cursor; a persistently failing page raises after the last try and
    a later run resumes from that exact page."""
    from connectors_spark.sources.paged import read_paged

    sleeps = []
    calls = {"n": 0}
    pages = {None: ([{"id": 0}], "c1"), "c1": ([{"id": 1}], "c2"),
             "c2": ([{"id": 2}], None)}

    def flaky(cursor):
        calls["n"] += 1
        # fail the first two attempts at page c1, then succeed
        if cursor == "c1" and calls.setdefault("c1_fails", 0) < 2:
            calls["c1_fails"] += 1
            raise ConnectionError("transient")
        return pages[cursor]

    out = read_paged(spark, flaky, "id long", str(tmp_path / "s1"),
                     _sleep=sleeps.append)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2]
    # linear backoff: 1*base then 2*base before the two retries
    assert sleeps == [1.0, 2.0]

    # a page that NEVER succeeds: raises after 5 tries, cursor checkpoint
    # still points at it, and a healed fetcher resumes there
    import pytest as _pytest
    hard_calls = []

    def hard_fail(cursor):
        hard_calls.append(cursor)
        if cursor == "c1":
            raise ConnectionError("down")
        return pages[cursor]

    sleeps2 = []
    d2 = str(tmp_path / "s2")
    with _pytest.raises(ConnectionError):
        read_paged(spark, hard_fail, "id long", d2, rows_per_spill=1,
                   _sleep=sleeps2.append)
    assert hard_calls.count("c1") == 5 and sleeps2 == [1.0, 2.0, 3.0, 4.0]

    healed = read_paged(spark, lambda c: pages[c], "id long", d2,
                        rows_per_spill=1)
    assert sorted(r.id for r in healed.collect()) == [0, 1, 2]
