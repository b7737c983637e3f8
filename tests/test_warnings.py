"""Statement warnings + SHOW WARNINGS (VERDICT r12 missing #1).

The reference accumulates per-statement warnings in the statement
context (stmtctx AppendWarning) and renders them via executor/show.go:
division by zero evaluates to NULL **with warning 1365**
(builtin_arithmetic.go div family), lossy string casts warn 1292 and
range saturation 1264 (types/convert.go StrToUint). The engine
populates the list where it KNOWS it diverged-with-warning — constant
operands at rewrite time; per-row events arriving from table data do
not warn (documented bound — detecting them needs an extra scan).
SHOW ERRORS stays empty for warning-class events.
"""

from __future__ import annotations

import pytest

from tinysql_spark.engine import Engine


@pytest.fixture()
def weng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    yield e
    e.close()


def _warns(e):
    return [tuple(r) for r in e.sql("SHOW WARNINGS").df.collect()]


def test_division_by_zero_warns_1365(weng):
    r = weng.sql("SELECT 1 / 0 AS v").df.collect()
    assert r[0][0] is None  # NULL value semantics (already pinned)
    got = _warns(weng)
    assert got == [("Warning", 1365, "Division by 0")]


def test_modulo_and_div_by_zero_warn(weng):
    assert weng.sql("SELECT 7 % 0 AS v").df.collect()[0][0] is None
    assert _warns(weng) == [("Warning", 1365, "Division by 0")]
    assert weng.sql("SELECT 7 DIV 0 AS v").df.collect()[0][0] is None
    assert _warns(weng) == [("Warning", 1365, "Division by 0")]


def test_nonzero_divisions_do_not_warn(weng):
    weng.sql("SELECT 1 / 2 AS a, 7 % 3 AS b, 10 DIV 5 AS c").df.collect()
    assert _warns(weng) == []
    # 0 as NUMERATOR or a 0.5-style literal must not trip the scan
    weng.sql("SELECT 0 / 2 AS a, 1 / 0.5 AS b").df.collect()
    assert _warns(weng) == []


def test_unsigned_cast_truncation_warns_1292(weng):
    v = weng.sql("SELECT CAST('12.7junk' AS UNSIGNED) AS v").df.collect()[0][0]
    assert int(v) == 13  # value semantics unchanged (r12 prefix parse)
    got = _warns(weng)
    assert len(got) == 1
    lvl, code, msg = got[0]
    assert (lvl, code) == ("Warning", 1292)
    assert "Truncated" in msg and "12.7junk" in msg
    # clean numeric strings parse without warning (reference:
    # getValidFloatPrefix only warns when it actually cut something)
    weng.sql("SELECT CAST('12.5' AS UNSIGNED) AS v").df.collect()
    assert _warns(weng) == []


def test_unsigned_cast_saturation_warns_1264(weng):
    v = weng.sql(
        "SELECT CAST('18446744073709551616' AS UNSIGNED) AS v"
    ).df.collect()[0][0]
    assert int(v) == 2**64 - 1  # saturation value (pinned in r12)
    got = _warns(weng)
    assert len(got) == 1
    assert (got[0][0], got[0][1]) == ("Warning", 1264)
    assert "range" in got[0][2]


def test_reset_contract_and_show_does_not_clear(weng):
    weng.sql("SELECT 1 / 0 AS v").df.collect()
    # SHOW WARNINGS reads WITHOUT clearing — twice gives the same list
    assert _warns(weng) == [("Warning", 1365, "Division by 0")]
    assert _warns(weng) == [("Warning", 1365, "Division by 0")]
    # any other statement resets the diagnostics area
    weng.sql("SELECT 1 AS v").df.collect()
    assert _warns(weng) == []


def test_show_errors_stays_empty_for_warning_class(weng):
    weng.sql("SELECT 1 / 0 AS v").df.collect()
    assert weng.sql("SHOW ERRORS").df.collect() == []
    assert _warns(weng) == [("Warning", 1365, "Division by 0")]


def test_multiple_warnings_accumulate_per_statement(weng):
    weng.sql(
        "SELECT 1 / 0 AS a, CAST('x9' AS UNSIGNED) AS b, 2 % 0 AS c"
    ).df.collect()
    got = _warns(weng)
    codes = sorted(c for _, c, _ in got)
    assert codes == [1292, 1365, 1365]


def test_string_literals_never_trip_the_scan(weng):
    # '/' '%' 'DIV 0' inside string literals are data, not operators
    r = weng.sql("SELECT 'a/0' AS a, '% 0' AS b, 'DIV 0' AS c").df.collect()
    assert tuple(r[0]) == ("a/0", "% 0", "DIV 0")
    assert _warns(weng) == []


def test_if_exists_noops_leave_note_diagnostics(weng):
    """MySQL demotes the would-be error to a NOTE under IF [NOT]
    EXISTS: DROP of a missing table notes 1051, CREATE of an existing
    one notes 1050 — the statement is a no-op but not silent."""
    weng.sql("DROP TABLE IF EXISTS nvr")
    got = _warns(weng)
    assert len(got) == 1 and got[0][0] == "Note" and got[0][1] == 1051
    assert "nvr" in got[0][2]
    weng.sql("CREATE TABLE nt (a INT)")
    assert _warns(weng) == []  # a real create notes nothing
    weng.sql("CREATE TABLE IF NOT EXISTS nt (a INT)")
    got = _warns(weng)
    assert len(got) == 1 and (got[0][0], got[0][1]) == ("Note", 1050)


def test_show_count_warnings(weng):
    weng.sql("SELECT 1 / 0 AS a, 2 % 0 AS b").df.collect()
    n = weng.sql("SHOW COUNT(*) WARNINGS").df.collect()[0][0]
    assert n == 2
    # counting does not clear (it is a SHOW)
    assert len(_warns(weng)) == 2


def test_sysvar_reads_and_last_insert_id(weng):
    """@@sysvar reads substitute session values (SET overrides win
    over read-side defaults; warning_count is dynamic; unknown vars
    error 1193), and LAST_INSERT_ID() tracks the first generated auto
    id of the most recent generating INSERT (0 before any)."""
    assert weng.sql("SELECT @@autocommit AS v").df.collect()[0][0] == 1
    assert (
        weng.sql("SELECT @@cow_online_min_mb AS v").df.collect()[0][0] == 256
    )
    weng.sql("SET @@cow_online_min_mb = 64")
    assert (
        weng.sql("SELECT @@cow_online_min_mb AS v").df.collect()[0][0] == 64
    )
    assert weng.sql("SELECT @@session.sql_mode AS v").df.collect()[0][0] == (
        "STRICT_TRANS_TABLES"
    )
    weng.sql("SELECT 1 / 0 AS v").df.collect()
    assert weng.sql("SELECT @@warning_count AS n").df.collect()[0][0] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="1193"):
        weng.sql("SELECT @@no_such_var")
    # LAST_INSERT_ID: 0 before any generating insert
    assert weng.sql("SELECT LAST_INSERT_ID() AS v").df.collect()[0][0] == 0
    weng.sql("CREATE TABLE lii (id INT AUTO_INCREMENT PRIMARY KEY, v INT)")
    weng.sql("INSERT INTO lii (v) VALUES (10), (11)")
    assert weng.sql("SELECT LAST_INSERT_ID() AS v").df.collect()[0][0] == 1
    weng.sql("INSERT INTO lii (v) VALUES (12)")
    assert weng.sql("SELECT LAST_INSERT_ID() AS v").df.collect()[0][0] == 3
    # an explicit-id insert generates nothing -> value unchanged
    weng.sql("INSERT INTO lii VALUES (100, 13)")
    assert weng.sql("SELECT LAST_INSERT_ID() AS v").df.collect()[0][0] == 3


def test_insert_lossy_cast_warns_1366(weng):
    """Runtime write-path warnings: a value the declared type cannot
    represent stores NULL here (strictly narrower than MySQL's
    warn-and-truncate — pinned) and now warns 1366 with a per-column
    row count, riding the existing validation aggregate (no extra
    job). Clean batches stay silent; string->string never warns."""
    weng.sql("CREATE TABLE lw (k INT PRIMARY KEY, v INT, s VARCHAR(16))")
    weng.sql("INSERT INTO lw VALUES (1, '12abc', 'x'), (2, 'junk', '12abc')")
    got = _warns(weng)
    assert len(got) == 1, got
    lvl, code, msg = got[0]
    assert (lvl, code) == ("Warning", 1366)
    assert "'v'" in msg and "2 row(s)" in msg
    rows = sorted(
        tuple(r) for r in weng.sql("SELECT k, v, s FROM lw").df.collect()
    )
    assert rows == [(1, None, "x"), (2, None, "12abc")]
    # clean insert: no warning
    weng.sql("INSERT INTO lw VALUES (3, '42', 'ok')")
    assert _warns(weng) == []
    assert weng.sql("SELECT v FROM lw WHERE k = 3").df.collect()[0][0] == 42
    # SELECT-sourced inserts count too
    weng.sql("CREATE TABLE lw_src (k INT PRIMARY KEY, txt VARCHAR(16))")
    weng.sql("INSERT INTO lw_src VALUES (10, 'zzz'), (11, '7')")
    weng.sql("INSERT INTO lw SELECT k, txt, txt FROM lw_src")
    got = _warns(weng)
    assert len(got) == 1 and got[0][1] == 1366 and "1 row(s)" in got[0][2]


def test_read_path_lossy_cast_warns_when_opted_in(weng):
    """Round 14 (VERDICT r13 next #4): ``SET sql_warnings = 1`` makes
    a SELECT that casts column values lossily report per-statement
    1366 row counts — the user opts into the extra diagnostic scan.
    Default off: the same SELECT is silent (the r13 documented
    no-silent-scan bound)."""
    weng.sql("CREATE TABLE rl (k INT PRIMARY KEY, s VARCHAR(16))")
    weng.sql(
        "INSERT INTO rl VALUES (1, '12'), (2, 'abc'), (3, 'x9'), (4, NULL)"
    )
    # default off: lossy read casts stay silent
    weng.sql("SELECT CAST(s AS SIGNED) AS v FROM rl").df.collect()
    assert _warns(weng) == []
    # opted in: 'abc' and 'x9' cast to NULL from NOT NULL operands ->
    # one 1366 with the row count; the NULL operand does not count
    weng.sql("SET sql_warnings = 1")
    weng.sql("SELECT CAST(s AS SIGNED) AS v FROM rl").df.collect()
    got = _warns(weng)
    assert len(got) == 1
    lvl, code, msg = got[0]
    assert (lvl, code) == ("Warning", 1366)
    assert "'s'" in msg and "2 row(s)" in msg
    # WHERE narrows the evaluated rows -> the count follows
    weng.sql("SELECT CAST(s AS SIGNED) AS v FROM rl WHERE k <= 2").df.collect()
    got = _warns(weng)
    assert len(got) == 1 and "1 row(s)" in got[0][2]
    # clean casts stay silent even when opted in
    weng.sql("SELECT CAST(k AS SIGNED) AS v FROM rl").df.collect()
    assert _warns(weng) == []
    # switching back off restores silence
    weng.sql("SET sql_warnings = 0")
    weng.sql("SELECT CAST(s AS SIGNED) AS v FROM rl").df.collect()
    assert _warns(weng) == []


def test_read_path_probe_never_reaches_explain(weng):
    """EXPLAIN stays indicator-free and probe-free: the opt-in scan
    runs only on executed SELECTs, and the rendered plan carries no
    __lossy indicator columns."""
    weng.sql("CREATE TABLE re (k INT PRIMARY KEY, s VARCHAR(16))")
    weng.sql("INSERT INTO re VALUES (1, 'abc')")
    weng.sql("SET sql_warnings = 1")
    plan = "\n".join(
        str(r[0]) for r in
        weng.sql("EXPLAIN SELECT CAST(s AS SIGNED) AS v FROM re").df.collect()
    )
    assert "__lossy" not in plan
    assert _warns(weng) == []  # the EXPLAIN itself probed nothing
    weng.sql("SET sql_warnings = 0")
