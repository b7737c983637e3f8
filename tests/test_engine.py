"""End-to-end SQL tests for the Engine — the testkit pattern of the
reference (`/root/reference/util/testkit/testkit.go` MustExec /
MustQuery().Check(Rows(...))), re-expressed with pytest. Cases mirror
executor_test.go / aggregate_test.go / join_test.go shapes."""

from __future__ import annotations

import pytest

from tinysql_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "warehouse"))
    yield e


def rows(result):
    # None-last, type-stable sort (None can't compare with ints)
    def cell_key(v):
        if v is None:
            return (2, 0, "")
        if isinstance(v, bool):
            return (1, 0, str(v))
        if isinstance(v, (int, float)):
            return (0, v, "")
        return (1, 0, str(v))

    return sorted(
        (tuple(r) for r in result.df.collect()),
        key=lambda row: tuple(cell_key(v) for v in row),
    )


# ---------------------------------------------------------------------------
# DDL + catalog
# ---------------------------------------------------------------------------


def test_create_use_show(eng):
    eng.sql("CREATE DATABASE d1")
    eng.sql("USE d1")
    eng.sql("CREATE TABLE t (a int, b int, c int)")
    assert rows(eng.sql("SHOW TABLES")) == [("t",)]
    assert ("d1",) in rows(eng.sql("SHOW DATABASES"))
    out = eng.sql("SHOW CREATE TABLE t").df.collect()[0]
    assert "`a` INT" in out[1]


def test_create_table_pk_and_index(eng):
    eng.sql("CREATE TABLE t (a int primary key, b int, c int, index idx(b))")
    info = eng.catalog.get_table("default", "t")
    assert info.primary_key == ["a"]
    assert info.indexes[0].name == "idx" and info.indexes[0].columns == ["b"]
    assert not info.column("a").nullable


def test_drop_and_if_exists(eng):
    eng.sql("CREATE TABLE t (a int)")
    eng.sql("DROP TABLE t")
    with pytest.raises(ValueError):
        eng.sql("DROP TABLE t")
    eng.sql("DROP TABLE IF EXISTS t")  # no error
    with pytest.raises(ValueError):
        eng.sql("CREATE TABLE missing_db.t (a int)")


def test_alter_add_column(eng):
    eng.sql("CREATE TABLE t (a int)")
    eng.sql("INSERT INTO t VALUES (1), (2)")
    eng.sql("ALTER TABLE t ADD COLUMN b varchar(255) DEFAULT 'x'")
    # existing rows read the DEFAULT (MySQL fills pre-existing rows —
    # metadata-only here via the initial-default rowid watermark)
    assert rows(eng.sql("SELECT a, b FROM t")) == [(1, "x"), (2, "x")]
    eng.sql("INSERT INTO t (a) VALUES (3)")
    assert (3, "x") in rows(eng.sql("SELECT a, b FROM t"))


def test_create_index_metadata_and_unique_backfill(eng):
    eng.sql("CREATE TABLE t (a int, b int)")
    eng.sql("INSERT INTO t VALUES (1, 10), (2, 10)")
    eng.sql("CREATE INDEX ib ON t (b)")
    assert any(i.name == "ib" for i in eng.catalog.get_table("default", "t").indexes)
    with pytest.raises(ValueError, match="duplicate"):
        eng.sql("CREATE UNIQUE INDEX ub ON t (b)")
    eng.sql("DROP INDEX ib ON t")
    assert not any(i.name == "ib" for i in eng.catalog.get_table("default", "t").indexes)


# ---------------------------------------------------------------------------
# INSERT / SELECT  (reference: executor/insert_test.go)
# ---------------------------------------------------------------------------


def test_insert_select_basic(eng):
    eng.sql("CREATE TABLE t (a int, b int, c int)")
    eng.sql("INSERT INTO t VALUES (1, 2, 3), (4, 5, 6), (NULL, 7, 8)")
    assert rows(eng.sql("SELECT * FROM t")) == [(1, 2, 3), (4, 5, 6), (None, 7, 8)]
    assert eng.sql("SELECT count(*) AS c FROM t").df.collect()[0][0] == 3


def test_insert_column_list_and_defaults(eng):
    eng.sql("CREATE TABLE t (id int NOT NULL DEFAULT 1, name varchar(255))")
    eng.sql("INSERT INTO t (name) VALUES ('alice')")
    assert rows(eng.sql("SELECT id, name FROM t")) == [(1, "alice")]


def test_insert_not_null_violation(eng):
    eng.sql("CREATE TABLE t (a int NOT NULL)")
    with pytest.raises(ValueError, match="cannot be null"):
        eng.sql("INSERT INTO t VALUES (NULL)")


def test_insert_expressions(eng):
    eng.sql("CREATE TABLE t (a int, b double)")
    eng.sql("INSERT INTO t VALUES (1+1, 2.5*2)")
    assert rows(eng.sql("SELECT a, b FROM t")) == [(2, 5.0)]


def test_insert_select_from_table(eng):
    eng.sql("CREATE TABLE src (a int)")
    eng.sql("CREATE TABLE dst (a int)")
    eng.sql("INSERT INTO src VALUES (1), (2), (3)")
    r = eng.sql("INSERT INTO dst SELECT a * 10 FROM src WHERE a > 1")
    assert r.rows_affected == 2
    assert rows(eng.sql("SELECT a FROM dst")) == [(20,), (30,)]


def test_insert_duplicate_pk_rejected(eng):
    eng.sql("CREATE TABLE t (a int primary key, b int)")
    eng.sql("INSERT INTO t VALUES (1, 10)")
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql("INSERT INTO t VALUES (1, 20)")


def test_insert_duplicate_within_batch_rejected(eng):
    # reference: executor/insert.go — the batch itself must satisfy the
    # key, not only batch-vs-existing
    eng.sql("CREATE TABLE t (a int primary key, b int)")
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql("INSERT INTO t VALUES (1, 10), (1, 20)")
    assert rows(eng.sql("SELECT * FROM t")) == []


def test_insert_null_keys_never_conflict(eng):
    eng.sql("CREATE TABLE t (a int, b int, UNIQUE KEY ua (a))")
    eng.sql("INSERT INTO t VALUES (NULL, 1), (NULL, 2)")
    eng.sql("INSERT INTO t VALUES (NULL, 3)")
    assert len(rows(eng.sql("SELECT * FROM t"))) == 3


def test_insert_job_count_independent_of_width(eng):
    """NOT NULL validation is ONE aggregation job for all columns, not
    one job per column (VERDICT r01 item 7): the Spark job count of an
    INSERT must not grow with the number of non-nullable columns.
    (AQE splits shuffle queries into several jobs, so the absolute
    count is environment-dependent; the width-independence is the
    invariant.)"""

    def insert_jobs(table: str, n_cols: int) -> int:
        cols = ", ".join(f"c{i} int NOT NULL" for i in range(n_cols))
        eng.sql(f"CREATE TABLE {table} (id int primary key, {cols})")
        vals = ", ".join(str(i) for i in range(n_cols))
        sc = eng.spark.sparkContext
        group = f"insert-jobs-{table}"
        sc.setJobGroup(group, "count jobs for one INSERT")
        try:
            eng.sql(f"INSERT INTO {table} VALUES (1, {vals})")
        finally:
            sc._jsc.clearJobGroup()
        return len(sc.statusTracker().getJobIdsForGroup(group))

    narrow = insert_jobs("narrow_t", 2)
    wide = insert_jobs("wide_t", 12)
    assert narrow > 0
    assert wide == narrow, f"jobs grew with width: {narrow} -> {wide}"


# ---------------------------------------------------------------------------
# REPLACE  (reference: executor/replace.go, write_test.go)
# ---------------------------------------------------------------------------


def test_replace_no_key_is_insert(eng):
    eng.sql("CREATE TABLE t (a int, b int)")
    eng.sql("REPLACE INTO t VALUES (1, 1)")
    eng.sql("REPLACE INTO t VALUES (1, 1)")
    assert len(rows(eng.sql("SELECT * FROM t"))) == 2


def test_replace_pk_conflict(eng):
    eng.sql("CREATE TABLE t (a int primary key, b int)")
    eng.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    r = eng.sql("REPLACE INTO t VALUES (1, 99)")
    assert r.rows_affected == 2  # MySQL: 1 deleted + 1 inserted
    assert rows(eng.sql("SELECT a, b FROM t")) == [(1, 99), (2, 20)]


def test_replace_unique_index_conflict(eng):
    eng.sql("CREATE TABLE t (a int primary key, b int, UNIQUE KEY ub (b))")
    eng.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    eng.sql("REPLACE INTO t VALUES (3, 10)")  # kicks out a=1 via unique b
    assert rows(eng.sql("SELECT a, b FROM t")) == [(2, 20), (3, 10)]


def test_replace_batch_keeps_last_per_key(eng):
    # reference: executor/replace.go — each tuple replaces the previous
    # one within the same statement; the last write wins
    eng.sql("CREATE TABLE t (a int primary key, b int)")
    eng.sql("REPLACE INTO t VALUES (1, 10), (1, 20), (1, 30), (2, 5)")
    assert rows(eng.sql("SELECT a, b FROM t")) == [(1, 30), (2, 5)]


# ---------------------------------------------------------------------------
# DELETE / TRUNCATE  (reference: executor/delete.go)
# ---------------------------------------------------------------------------


def test_delete_where(eng):
    eng.sql("CREATE TABLE t (a int, b int)")
    eng.sql("INSERT INTO t VALUES (1, 1), (2, 2), (3, 3), (NULL, 4)")
    r = eng.sql("DELETE FROM t WHERE a >= 2")
    assert r.rows_affected == 2
    # NULL condition rows are kept (3VL)
    assert rows(eng.sql("SELECT b FROM t")) == [(1,), (4,)]


def test_delete_all_and_truncate(eng):
    eng.sql("CREATE TABLE t (a int)")
    eng.sql("INSERT INTO t VALUES (1), (2)")
    assert eng.sql("DELETE FROM t").rows_affected == 2
    eng.sql("INSERT INTO t VALUES (3)")
    eng.sql("TRUNCATE TABLE t")
    assert rows(eng.sql("SELECT * FROM t")) == []


# ---------------------------------------------------------------------------
# SELECT surface: joins, agg, having, topn (reference: executor tests)
# ---------------------------------------------------------------------------


def test_join_inner_left_right(eng):
    eng.sql("CREATE TABLE t1 (c1 int, c2 int)")
    eng.sql("CREATE TABLE t2 (c1 int, c2 int)")
    eng.sql("INSERT INTO t1 VALUES (1, 10), (2, 20), (NULL, 30)")
    eng.sql("INSERT INTO t2 VALUES (1, 100), (3, 300), (NULL, 400)")
    # NULL keys never match
    assert rows(eng.sql("SELECT t1.c1, t2.c2 FROM t1 JOIN t2 ON t1.c1 = t2.c1")) == [(1, 100)]
    assert rows(
        eng.sql("SELECT t1.c1, t1.c2, t2.c2 FROM t1 LEFT JOIN t2 ON t1.c1 = t2.c1")
    ) == [(1, 10, 100), (2, 20, None), (None, 30, None)]
    assert rows(
        eng.sql("SELECT t2.c1, t1.c2, t2.c2 FROM t1 RIGHT JOIN t2 ON t1.c1 = t2.c1")
    ) == [(1, 10, 100), (3, None, 300), (None, None, 400)]


def test_agg_having_orderby_limit(eng):
    eng.sql("CREATE TABLE t (a int, b int)")
    eng.sql("INSERT INTO t VALUES (1, 1), (1, 2), (2, 3), (2, 4), (2, 5), (NULL, 6)")
    assert rows(
        eng.sql("SELECT a, count(*) AS c, sum(b) AS s FROM t GROUP BY a HAVING count(*) > 1")
    ) == [(1, 2, 3), (2, 3, 12)]
    # NULL group exists
    assert (None, 1, 6) in rows(eng.sql("SELECT a, count(*) AS c, sum(b) AS s FROM t GROUP BY a"))
    got = eng.sql("SELECT b FROM t ORDER BY b DESC LIMIT 2 OFFSET 1").df.collect()
    assert [r[0] for r in got] == [5, 4]


def test_mysql_functions_via_sql(eng):
    eng.sql("CREATE TABLE ts (id int, name varchar(255), score double)")
    eng.sql("INSERT INTO ts VALUES (1, 'abc', 1.5), (2, NULL, -2.0), (3, '', NULL)")
    got = rows(
        eng.sql(
            "SELECT id, length(name) AS l, isnull(name) AS n, "
            "if(score > 0, 'pos', 'neg') AS sgn, ifnull(score, 0.0) AS sc, "
            "strcmp(name, 'abc') AS cmp FROM ts"
        )
    )
    assert got == [
        (1, 3, False, "pos", 1.5, 0),
        (2, None, True, "neg", -2.0, None),
        (3, 0, False, "neg", 0.0, -1),
    ]


def test_three_valued_logic_and_arith(eng):
    eng.sql("CREATE TABLE t (a int, b int)")
    eng.sql("INSERT INTO t VALUES (1, 0), (NULL, 1), (2, NULL)")
    got = rows(
        eng.sql("SELECT a, a / b AS d, a + b AS s, -a AS neg FROM t")
    )
    # div-by-zero -> NULL, NULL propagates
    assert got == [(1, None, 1, -1), (2, None, None, -2), (None, None, None, None)]


def test_between_in_dual(eng):
    eng.sql("CREATE TABLE t (a int)")
    eng.sql("INSERT INTO t VALUES (1), (5), (10)")
    assert rows(eng.sql("SELECT a FROM t WHERE a BETWEEN 2 AND 10 AND a IN (5, 7, 10)")) == [
        (5,),
        (10,),
    ]
    assert eng.sql("SELECT 1 + 1 AS x").df.collect()[0][0] == 2


# ---------------------------------------------------------------------------
# SET / user vars / EXPLAIN / ANALYZE / txn no-ops
# ---------------------------------------------------------------------------


def test_user_vars(eng):
    eng.sql("CREATE TABLE t (a int)")
    eng.sql("INSERT INTO t VALUES (1), (2), (3)")
    eng.sql("SET @x := 2")
    assert rows(eng.sql("SELECT a FROM t WHERE a > @x")) == [(3,)]
    eng.sql("SET @s = 'abc'")
    assert eng.sql("SELECT @s AS v").df.collect()[0][0] == "abc"


def test_row_stream_setvar_capture_and_loud_error(eng):
    """`SELECT @a := col ...` projects the assigned expression per row
    — exactly MySQL's result set for the assignment (the variable's
    final value is row-order dependent and NOT captured; documented).
    Self-referencing non-running forms stay loudly refused (reference:
    executor/executor.go:413 unBatchedNext exists precisely for
    row-at-a-time SetVar). `SET @a := expr` (session scope) stays
    supported; @ inside string literals stays data."""
    eng.sql("CREATE TABLE tv (a int)")
    eng.sql("INSERT INTO tv VALUES (1), (2)")
    # plain capture: result set is the expression per row, order-free
    assert sorted(rows(eng.sql("SELECT @r := a FROM tv"))) == [(1,), (2,)]
    assert sorted(rows(eng.sql("SELECT @r := a * 10 AS v FROM tv"))) == [
        (10,), (20,),
    ]
    # in a scalar subquery the capture is the subquery's projection
    assert rows(eng.sql("SELECT a FROM tv WHERE a > (SELECT @x := 1)")) == [(2,)]
    # a capture read elsewhere in the same statement is order-dependent
    with pytest.raises(ValueError, match="read"):
        eng.sql("SELECT @r := a, @r + 1 FROM tv")
    # self-referencing non-running form stays loud
    with pytest.raises(ValueError, match="row-order-dependent SetVar"):
        eng.sql("SELECT @r := @r * 2 FROM tv")
    eng.sql("SET @r := 5")  # session-scoped assignment still fine
    assert rows(eng.sql("SELECT a FROM tv WHERE a < @r")) == [(1,), (2,)]
    # '@... :=' inside a string literal is data, not an assignment
    eng.sql("CREATE TABLE ts (s varchar(20))")
    eng.sql("INSERT INTO ts VALUES ('x @a := y')")
    assert rows(eng.sql("SELECT s FROM ts")) == [("x @a := y",)]


def test_sys_vars_and_show_variables(eng):
    eng.sql("SET @@tidb_executor_concurrency = 8")
    vals = dict(rows(eng.sql("SHOW VARIABLES")))
    assert vals.get("tidb_executor_concurrency") == "8"


def test_explain_and_analyze(eng):
    eng.sql("CREATE TABLE t (a int, b int)")
    eng.sql("INSERT INTO t VALUES (1, 2)")
    plan = eng.sql("EXPLAIN SELECT a FROM t WHERE b > 0").df.collect()[0][0]
    assert "Scan" in plan or "Filter" in plan
    eng.sql("ANALYZE TABLE t")  # must not raise


def test_explain_dml(eng):
    """ExplainableStmt covers DML (reference: parser/parser.y:4545-4550
    — EXPLAIN {SELECT|DELETE|INSERT|REPLACE}): DML explains as the
    write node + the underlying read plan, without executing."""
    eng.sql("CREATE TABLE t (a int primary key, b int)")
    eng.sql("INSERT INTO t VALUES (1, 2)")

    plan = eng.sql("EXPLAIN INSERT INTO t VALUES (3, 4)").df.collect()[0][0]
    assert "InsertExec" in plan and "t" in plan

    plan = eng.sql("EXPLAIN REPLACE INTO t VALUES (1, 9)").df.collect()[0][0]
    assert "ReplaceExec" in plan

    plan = eng.sql("EXPLAIN DELETE FROM t WHERE b > 0").df.collect()[0][0]
    assert "DeleteExec" in plan and ("Filter" in plan or "Scan" in plan)

    plan = eng.sql("EXPLAIN INSERT INTO t SELECT a + 10, b FROM t").df.collect()[0][0]
    assert "InsertExec" in plan and "Scan" in plan

    # explaining must not have modified anything
    assert rows(eng.sql("SELECT a, b FROM t")) == [(1, 2)]


def test_txn_outside_transaction(eng):
    # COMMIT/ROLLBACK with no open transaction are harmless no-ops
    assert "no active transaction" in eng.sql("COMMIT").message
    assert "no active transaction" in eng.sql("ROLLBACK").message
    assert "started" in eng.sql("BEGIN").message
    eng.sql("ROLLBACK")


def test_txn_read_your_writes_and_rollback(eng):
    """The UnionScan contract (union_scan.go:57-90): an in-txn SELECT
    sees the txn's own inserts; ROLLBACK makes them vanish; nothing
    ever hits the committed table until COMMIT."""
    eng.sql("CREATE TABLE tx (a int, b varchar(8))")
    eng.sql("INSERT INTO tx VALUES (1, 'base')")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO tx VALUES (2, 'dirty')")
    # read-your-writes, both unqualified and db-qualified
    assert sorted(rows(eng.sql("SELECT a, b FROM tx"))) == [(1, "base"), (2, "dirty")]
    assert sorted(rows(eng.sql("SELECT a, b FROM default.tx"))) == [
        (1, "base"), (2, "dirty"),
    ]
    eng.sql("ROLLBACK")
    assert rows(eng.sql("SELECT a, b FROM tx")) == [(1, "base")]
    # and a commit path
    eng.sql("BEGIN")
    eng.sql("INSERT INTO tx VALUES (3, 'kept')")
    eng.sql("COMMIT")
    assert sorted(rows(eng.sql("SELECT a, b FROM tx"))) == [(1, "base"), (3, "kept")]


def test_txn_delete_visibility(eng):
    """In-txn DELETE hides rows from subsequent in-txn reads (dirty
    delete, mem_reader.go semantics); ROLLBACK restores them; COMMIT
    publishes the deletion. Deletes apply to buffered adds too."""
    eng.sql("CREATE TABLE txd (a int)")
    eng.sql("INSERT INTO txd VALUES (1), (2), (3)")
    eng.sql("BEGIN")
    r = eng.sql("DELETE FROM txd WHERE a = 2")
    assert r.rows_affected == 1
    assert sorted(rows(eng.sql("SELECT a FROM txd"))) == [(1,), (3,)]
    # delete a row the txn itself inserted: visible in neither read
    eng.sql("INSERT INTO txd VALUES (4)")
    eng.sql("DELETE FROM txd WHERE a = 4")
    assert sorted(rows(eng.sql("SELECT a FROM txd"))) == [(1,), (3,)]
    eng.sql("ROLLBACK")
    assert sorted(rows(eng.sql("SELECT a FROM txd"))) == [(1,), (2,), (3,)]
    eng.sql("BEGIN")
    eng.sql("DELETE FROM txd WHERE a = 1")
    eng.sql("COMMIT")
    assert sorted(rows(eng.sql("SELECT a FROM txd"))) == [(2,), (3,)]


def test_txn_multi_table_commit_and_replace(eng):
    """COMMIT publishes every touched table (prepare-all-then-swap);
    REPLACE inside a txn resolves conflicts against the overlay."""
    eng.sql("CREATE TABLE txa (k int PRIMARY KEY, v varchar(8))")
    eng.sql("CREATE TABLE txb (x int)")
    eng.sql("INSERT INTO txa VALUES (1, 'old')")
    eng.sql("BEGIN")
    eng.sql("REPLACE INTO txa VALUES (1, 'new'), (2, 'two')")
    eng.sql("INSERT INTO txb VALUES (10)")
    assert sorted(rows(eng.sql("SELECT k, v FROM txa"))) == [(1, "new"), (2, "two")]
    eng.sql("COMMIT")
    assert sorted(rows(eng.sql("SELECT k, v FROM txa"))) == [(1, "new"), (2, "two")]
    assert rows(eng.sql("SELECT x FROM txb")) == [(10,)]
    # dup-key inside txn checks the overlay (2 is now taken)
    eng.sql("BEGIN")
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql("INSERT INTO txa VALUES (2, 'boom')")
    eng.sql("ROLLBACK")


def test_txn_ddl_implicit_commit(eng):
    """DDL inside a transaction implicitly commits it first (MySQL
    semantics — DDL cannot be rolled back)."""
    eng.sql("CREATE TABLE txi (a int)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO txi VALUES (7)")
    eng.sql("CREATE TABLE txi2 (b int)")  # implicit COMMIT of the insert
    eng.sql("ROLLBACK")  # nothing left to roll back
    assert rows(eng.sql("SELECT a FROM txi")) == [(7,)]


def test_multi_statement_and_describe(eng):
    results = eng.execute("CREATE TABLE t (a int); INSERT INTO t VALUES (1); SELECT a FROM t")
    assert results[-1].df.collect()[0][0] == 1
    fields = [r[0] for r in eng.sql("DESC t").df.collect()]
    assert fields == ["a"]


def test_catalog_persistence(spark, tmp_path):
    wh = str(tmp_path / "wh")
    e1 = Engine(spark, wh)
    e1.sql("CREATE TABLE t (a int primary key, b varchar(255))")
    e1.sql("INSERT INTO t VALUES (1, 'x')")
    # new engine over the same warehouse sees table + data
    e2 = Engine(spark, wh)
    assert rows(e2.sql("SELECT a, b FROM t")) == [(1, "x")]
    info = e2.catalog.get_table("default", "t")
    assert info.primary_key == ["a"]


def test_attach_testdata_and_readonly(eng):
    tables = eng.attach_testdata("/root/testdata/sf0.001")
    assert "lineitem" in tables and "events" in tables
    n = eng.sql("SELECT count(*) AS c FROM lineitem").df.collect()[0][0]
    assert n > 5000
    # joins between external and managed tables work
    eng.sql("CREATE TABLE flags (f varchar(8))")
    eng.sql("INSERT INTO flags VALUES ('A'), ('N')")
    got = eng.sql(
        "SELECT count(*) AS c FROM lineitem JOIN flags ON l_returnflag = f"
    ).df.collect()[0][0]
    assert 0 < got <= n
    # external tables reject DML with a clear error
    with pytest.raises(ValueError, match="read-only external"):
        eng.sql("DELETE FROM lineitem WHERE l_orderkey = 1")
    # events nanos-ts table is queryable through SQL
    hrs = eng.sql(
        "SELECT count(DISTINCT date_trunc('hour', ts)) AS h FROM events"
    ).df.collect()[0][0]
    assert hrs > 0


def test_large_insert_select_sparse_rowids(eng):
    eng.sql("CREATE TABLE big (a bigint)")
    eng._DENSE_ROWID_MAX = 1000  # force the sparse path
    eng.attach_testdata("/root/testdata/sf0.001")
    r = eng.sql("INSERT INTO big SELECT l_orderkey FROM lineitem")
    assert r.rows_affected > 1000
    info = eng.catalog.get_table("default", "big")
    # rowids unique, allocator advanced past them
    raw = eng._raw("default", "big")
    from tinysql_spark.catalog import ROWID
    assert raw.select(ROWID).distinct().count() == r.rows_affected
    assert info.next_rowid > r.rows_affected
    # second insert does not collide
    eng.sql("INSERT INTO big VALUES (1)")
    assert raw.select(ROWID).distinct().count() == r.rows_affected  # lazy df unchanged
    assert eng._raw("default", "big").select(ROWID).distinct().count() == r.rows_affected + 1


def test_show_create_database_and_errors(eng):
    eng.sql("CREATE DATABASE showdb")
    r = eng.sql("SHOW CREATE DATABASE showdb")
    assert rows(r) == [("showdb", "CREATE DATABASE `showdb`")]
    assert eng.sql("SHOW ERRORS").df.count() == 0
    with pytest.raises(ValueError, match="unknown database"):
        eng.sql("SHOW CREATE DATABASE nope")


def test_admin_show_ddl_jobs(eng):
    eng.sql("CREATE TABLE j1 (a int)")
    eng.sql("CREATE INDEX ia ON j1 (a)")
    eng.sql("DROP TABLE j1")
    got = [tuple(r) for r in eng.sql("ADMIN SHOW DDL JOBS").df.collect()]
    kinds = [(r[1], r[2], r[3]) for r in got]
    assert ("create_table", "j1", "synced") in kinds
    assert ("create_index", "j1", "synced") in kinds[1:] or ("create_index", "ia", "synced") in kinds
    assert ("drop_table", "j1", "synced") in kinds
    # job ids are dense and ordered
    assert [r[0] for r in got] == list(range(1, len(got) + 1))
    # JOBS n — the most recent n (parser.y:4383 JobNumber)
    last2 = [tuple(r) for r in eng.sql("ADMIN SHOW DDL JOBS 2").df.collect()]
    assert last2 == got[-2:]
    # WHERE filters on the result columns (parser.y:4374 WhereClauseOptional)
    only_idx = eng.sql("ADMIN SHOW DDL JOBS WHERE JOB_TYPE = 'create_index'").df.collect()
    assert {r["JOB_TYPE"] for r in only_idx} == {"create_index"}


def test_admin_check_table_ok(eng):
    eng.sql("CREATE TABLE chk (id int NOT NULL, v varchar(16), PRIMARY KEY (id))")
    eng.sql("CREATE UNIQUE INDEX uv ON chk (v)")
    eng.sql("INSERT INTO chk VALUES (1,'a'), (2,'b'), (3,NULL), (4,NULL)")
    got = [tuple(r) for r in eng.sql("ADMIN CHECK TABLE chk").df.collect()]
    assert got == [("chk", 4, "OK")]
    got = [tuple(r) for r in eng.sql("ADMIN CHECK INDEX chk uv").df.collect()]
    assert got == [("chk", 4, "OK")]
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("ADMIN CHECK INDEX chk nope")


def test_admin_check_table_detects_corruption(eng, spark):
    """Bypass the engine's INSERT validation by appending a parquet
    file straight into the data dir (a crashed writer / foreign tool),
    then assert ADMIN CHECK TABLE reports the violation — the
    ErrAdminCheckTable analog (executor/errors.go:37)."""
    eng.sql("CREATE TABLE corr (id int NOT NULL, PRIMARY KEY (id))")
    eng.sql("INSERT INTO corr VALUES (1), (2)")
    db, t = eng._qualify("corr")
    data_dir = eng.catalog.data_dir(db, t)
    rogue = spark.createDataFrame([(1, 1)], "_rowid: bigint, id: int")
    rogue.write.mode("append").parquet(data_dir)
    with pytest.raises(ValueError, match="duplicate _rowid"):
        eng.sql("ADMIN CHECK TABLE corr")


def test_admin_check_table_detects_dup_key(eng, spark):
    eng.sql("CREATE TABLE corr2 (id int, PRIMARY KEY (id))")
    eng.sql("INSERT INTO corr2 VALUES (1), (2)")
    db, t = eng._qualify("corr2")
    rogue = spark.createDataFrame([(99, 2)], "_rowid: bigint, id: int")
    rogue.write.mode("append").parquet(eng.catalog.data_dir(db, t))
    # rowid allocator is now behind the injected handle 99
    with pytest.raises(ValueError, match="allocator behind data"):
        eng.sql("ADMIN CHECK TABLE corr2")
    eng.catalog.get_table(db, t).next_rowid = 100
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql("ADMIN CHECK TABLE corr2")


def test_attach_csv_json_and_export(eng, tmp_path, spark):
    eng.sql("CREATE TABLE src (a int, b varchar(8))")
    eng.sql("INSERT INTO src VALUES (1,'x'), (2,'y')")
    # sink: export to csv and json
    csv_dir = str(tmp_path / "out_csv")
    json_dir = str(tmp_path / "out_json")
    eng.export_table("src", csv_dir, fmt="csv")
    eng.export_table("src", json_dir, fmt="json")
    # source: attach both back and query through SQL
    eng.attach_external("src_csv", csv_dir, fmt="csv")
    eng.attach_external("src_json", json_dir, fmt="json")
    got_csv = rows(eng.sql("SELECT a, b FROM src_csv"))
    got_json = rows(eng.sql("SELECT a, b FROM src_json"))
    assert got_csv == [(1, "x"), (2, "y")]
    assert got_json == [(1, "x"), (2, "y")]
    # external csv is read-only like any attached table
    with pytest.raises(ValueError, match="read-only external"):
        eng.sql("DELETE FROM src_csv WHERE a = 1")


def test_explain_synonyms_and_format(eng):
    """DESCRIBE/DESC are EXPLAIN synonyms over ExplainableStmt, and
    FORMAT = 'row'|'dot' parses (parser.y:2128-2153)."""
    eng.sql("CREATE TABLE ex (a int)")
    eng.sql("INSERT INTO ex VALUES (1)")
    for q in (
        "DESC SELECT * FROM ex",
        "DESCRIBE SELECT a FROM ex WHERE a > 0",
        "EXPLAIN FORMAT = 'row' SELECT * FROM ex",
        "EXPLAIN FORMAT = 'dot' SELECT * FROM ex",
        "DESC DELETE FROM ex WHERE a = 1",
    ):
        plan = eng.sql(q).df.collect()[0][0]
        assert "ex" in plan or "Scan" in plan or "Exec" in plan, (q, plan)
    # bare DESC table still describes
    got = [r["Field"] for r in eng.sql("DESC ex").df.collect()]
    assert got == ["a"]


def test_show_grammar_forms(eng):
    """SHOW [FULL] TABLES [FROM db] [LIKE], SHOW DATABASES LIKE,
    SHOW VARIABLES LIKE, SHOW [FULL] PROCESSLIST (parser.y:4396-4419)."""
    eng.sql("CREATE DATABASE shg")
    eng.sql("CREATE TABLE shg.alpha (a int)")
    eng.sql("CREATE TABLE shg.beta (a int)")
    assert rows(eng.sql("SHOW TABLES FROM shg")) == [("alpha",), ("beta",)]
    assert rows(eng.sql("SHOW TABLES FROM shg LIKE 'al%'")) == [("alpha",)]
    assert rows(eng.sql("SHOW FULL TABLES FROM shg LIKE '%eta'")) == [("beta", "BASE TABLE")]
    assert rows(eng.sql("SHOW DATABASES LIKE 'shg'")) == [("shg",)]
    eng.sql("SET @@timeout = '30'")
    eng.sql("SET @@other = '1'")
    assert rows(eng.sql("SHOW VARIABLES LIKE 'time%'")) == [("timeout", "30")]
    pl = eng.sql("SHOW PROCESSLIST").df.collect()
    assert len(pl) == 1 and pl[0]["Command"] == "Query"
    assert eng.sql("SHOW FULL PROCESSLIST").df.count() == 1


def test_alter_drop_modify_rename_column(eng):
    """AlterTableSpec surface: DROP/MODIFY/CHANGE/RENAME COLUMN,
    SET/DROP DEFAULT, DROP PRIMARY KEY, RENAME INDEX."""
    eng.sql("CREATE TABLE at (a int primary key, b int, c varchar(8), d int)")
    eng.sql("INSERT INTO at VALUES (1, 10, 'x', 5), (2, 20, 'y', 6)")
    # DROP COLUMN: metadata-only; reads project it away
    eng.sql("ALTER TABLE at DROP COLUMN d")
    assert [f.name for f in eng.sql("SELECT * FROM at").df.schema.fields] == ["a", "b", "c"]
    # MODIFY widens int -> bigint, data preserved
    eng.sql("ALTER TABLE at MODIFY COLUMN b bigint")
    assert eng.catalog.get_table("default", "at").column("b").type == "BIGINT"
    assert rows(eng.sql("SELECT a, b FROM at")) == [(1, 10), (2, 20)]
    # MODIFY that loses values must fail
    with pytest.raises(ValueError, match="do not fit"):
        eng.sql("ALTER TABLE at MODIFY COLUMN c int")
    # RENAME COLUMN is metadata-only: the parquet files must be
    # untouched (at 100 TB a rename cannot rewrite the table) — the
    # catalog maps logical -> in-file names instead
    import os

    data_dir = eng.catalog.data_dir("default", "at")
    before = {f: os.path.getmtime(os.path.join(data_dir, f)) for f in os.listdir(data_dir)}
    eng.sql("ALTER TABLE at RENAME COLUMN c TO label")
    after = {f: os.path.getmtime(os.path.join(data_dir, f)) for f in os.listdir(data_dir)}
    assert after == before, "rename rewrote data files"
    assert rows(eng.sql("SELECT a, label FROM at")) == [(1, "x"), (2, "y")]
    # inserts and deletes keep working through the name mapping
    eng.sql("INSERT INTO at (a, label) VALUES (9, 'w')")
    assert (9, "w") in rows(eng.sql("SELECT a, label FROM at"))
    eng.sql("DELETE FROM at WHERE a = 9")
    assert (9, "w") not in rows(eng.sql("SELECT a, label FROM at"))
    # CHANGE = rename + retype in one spec
    eng.sql("ALTER TABLE at CHANGE COLUMN b b_big bigint")
    assert rows(eng.sql("SELECT a, b_big FROM at")) == [(1, 10), (2, 20)]
    # defaults
    eng.sql("ALTER TABLE at ADD COLUMN e int")
    eng.sql("ALTER TABLE at ALTER COLUMN e SET DEFAULT 7")
    eng.sql("INSERT INTO at (a) VALUES (3)")
    assert (3, 7) in rows(eng.sql("SELECT a, e FROM at"))
    eng.sql("ALTER TABLE at ALTER COLUMN e DROP DEFAULT")
    eng.sql("INSERT INTO at (a) VALUES (4)")
    assert (4, None) in rows(eng.sql("SELECT a, e FROM at"))
    # key metadata specs
    eng.sql("CREATE INDEX ie ON at (e)")
    eng.sql("ALTER TABLE at RENAME INDEX ie TO ie2")
    assert any(i.name == "ie2" for i in eng.catalog.get_table("default", "at").indexes)
    eng.sql("ALTER TABLE at DROP INDEX ie2")
    eng.sql("ALTER TABLE at DROP PRIMARY KEY")
    assert eng.catalog.get_table("default", "at").primary_key == []
    # dropping an indexed column is rejected
    eng.sql("CREATE INDEX ib ON at (b_big)")
    with pytest.raises(ValueError, match="part of a key"):
        eng.sql("ALTER TABLE at DROP COLUMN b_big")
    # multiple comma-separated specs
    eng.sql("ALTER TABLE at ADD COLUMN f int, ADD COLUMN g int")
    assert eng.catalog.get_table("default", "at").column("g") is not None


def test_insert_set_form(eng):
    """INSERT/REPLACE ... SET a=1, b='x' (parser.y InsertValues SET
    ColumnSetValueList) desugars to the column-list VALUES form."""
    eng.sql("CREATE TABLE ist (a int primary key, b varchar(8), c int)")
    eng.sql("INSERT INTO ist SET a = 1, b = 'x'")
    eng.sql("INSERT INTO ist SET b = 'y', a = 2, c = 1 + 1")
    assert rows(eng.sql("SELECT a, b, c FROM ist")) == [(1, "x", None), (2, "y", 2)]
    eng.sql("REPLACE INTO ist SET a = 1, b = 'z'")
    assert (1, "z", None) in rows(eng.sql("SELECT a, b, c FROM ist"))


def test_delete_order_by_limit(eng):
    """DELETE ... [WHERE] [ORDER BY] LIMIT n (parser.y DeleteFromStmt
    OrderByOptional LimitClause): only the first n ordered rows go."""
    eng.sql("CREATE TABLE dl (a int, b int)")
    eng.sql("INSERT INTO dl VALUES (1, 5), (2, 4), (3, 3), (4, 2), (5, 1)")
    r = eng.sql("DELETE FROM dl ORDER BY b LIMIT 2")  # deletes b=1, b=2
    assert r.rows_affected == 2
    assert rows(eng.sql("SELECT a FROM dl")) == [(1,), (2,), (3,)]
    r = eng.sql("DELETE FROM dl WHERE a > 1 ORDER BY a DESC LIMIT 1")  # deletes a=3
    assert r.rows_affected == 1
    assert rows(eng.sql("SELECT a FROM dl")) == [(1,), (2,)]
    r = eng.sql("DELETE FROM dl LIMIT 10")  # limit larger than table
    assert r.rows_affected == 2
    assert rows(eng.sql("SELECT a FROM dl")) == []


def test_alter_add_parenthesized_list(eng):
    """ALTER TABLE t ADD (a int, b varchar) — TableElementList form."""
    eng.sql("CREATE TABLE ap (a int)")
    eng.sql("ALTER TABLE ap ADD (b int DEFAULT 3, c varchar(4))")
    eng.sql("INSERT INTO ap (a) VALUES (1)")
    assert rows(eng.sql("SELECT a, b, c FROM ap")) == [(1, 3, None)]


def test_rename_on_bucketed_table_keeps_mapping(eng, spark):
    """Metadata-only rename on a bucketed table: files untouched,
    bucket spec follows the logical name, data intact through the
    physical-name mapping, and further writes keep the mapping."""
    import os

    eng.sql(
        "CREATE TABLE bt (k int, v int) CLUSTERED BY (k) INTO 4 BUCKETS"
    )
    eng.sql("INSERT INTO bt VALUES (1, 10), (2, 20), (3, 30)")
    data_dir = eng.catalog.data_dir("default", "bt")
    before = sorted(os.listdir(data_dir))
    eng.sql("ALTER TABLE bt RENAME COLUMN k TO key_id")
    assert sorted(os.listdir(data_dir)) == before
    info = eng.catalog.get_table("default", "bt")
    assert info.bucket.columns == ["key_id"]
    assert rows(eng.sql("SELECT key_id, v FROM bt")) == [(1, 10), (2, 20), (3, 30)]
    # write through the mapping, then read back
    eng.sql("INSERT INTO bt VALUES (4, 40)")
    eng.sql("REPLACE INTO bt VALUES (4, 44)")
    assert (4, 44) in rows(eng.sql("SELECT key_id, v FROM bt"))
    # the in-file name stays the original
    assert info.column("key_id").physical == "k"
    got = [f.name for f in spark.read.parquet(data_dir).schema.fields]
    assert "k" in got and "key_id" not in got


def test_add_column_after_drop_reads_null(eng):
    """DROP COLUMN is metadata-only, so the old bytes stay in the
    part-files; re-ADDing the same name must read NULL, not resurrect
    the dead values (fresh physical name — the column-ID pattern)."""
    eng.sql("CREATE TABLE adn (a int, b int)")
    eng.sql("INSERT INTO adn VALUES (1, 10), (2, 20)")
    eng.sql("ALTER TABLE adn DROP COLUMN b")
    eng.sql("ALTER TABLE adn ADD COLUMN b int")
    assert rows(eng.sql("SELECT a, b FROM adn")) == [(1, None), (2, None)]
    # new writes land in the fresh physical column and read back
    eng.sql("INSERT INTO adn VALUES (3, 30)")
    assert (3, 30) in rows(eng.sql("SELECT a, b FROM adn"))
    info = eng.catalog.get_table("default", "adn")
    assert info.column("b").physical not in (None, "b")


def test_add_column_matching_frozen_physical_name(eng):
    """After RENAME a TO c (physical 'a' frozen in-file), ADD COLUMN a
    must not alias the frozen bytes: two distinct physical names, old
    data under c, NULL under the new a."""
    eng.sql("CREATE TABLE afz (a int, b int)")
    eng.sql("INSERT INTO afz VALUES (1, 10), (2, 20)")
    eng.sql("ALTER TABLE afz RENAME COLUMN a TO c")
    eng.sql("ALTER TABLE afz ADD COLUMN a int")
    assert rows(eng.sql("SELECT c, a FROM afz")) == [(1, None), (2, None)]
    info = eng.catalog.get_table("default", "afz")
    names = [col.file_name for col in info.columns]
    assert len(names) == len(set(names)), f"duplicate physical names: {names}"
    eng.sql("INSERT INTO afz (c, a) VALUES (3, 33)")
    assert (3, 33) in rows(eng.sql("SELECT c, a FROM afz"))


def test_analyze_after_rename_column(eng):
    """ANALYZE TABLE on a renamed table: the logical name is a view
    over the __phys backing table; stats must target the backing
    table instead of raising AnalysisException on the view."""
    eng.sql("CREATE TABLE art (a int, b varchar(8))")
    eng.sql("INSERT INTO art VALUES (1, 'x'), (2, 'y')")
    eng.sql("ALTER TABLE art RENAME COLUMN a TO k")
    eng.sql("ANALYZE TABLE art")
    assert eng.load_stats("default", "art") is not None


def test_delete_where_keyword_inside_string_literal(eng):
    """Quote-aware DELETE clause split: ORDER BY / LIMIT inside a
    string literal is data, not a clause."""
    eng.sql("CREATE TABLE dq (a int, note varchar(64))")
    eng.sql(
        "INSERT INTO dq VALUES (1, 'x ORDER BY y'), (2, 'keep LIMIT 5'), (3, 'plain')"
    )
    r = eng.sql("DELETE FROM dq WHERE note = 'x ORDER BY y'")
    assert r.rows_affected == 1
    assert rows(eng.sql("SELECT a FROM dq")) == [(2,), (3,)]
    r = eng.sql("DELETE FROM dq WHERE note = 'keep LIMIT 5' LIMIT 1")
    assert r.rows_affected == 1
    assert rows(eng.sql("SELECT a FROM dq")) == [(3,)]


def test_delete_order_by_without_limit_no_broadcast(eng):
    """DELETE ... ORDER BY with no LIMIT matches an unbounded row set —
    correctness here; the plan-side guarantee is that the doomed set is
    not force-broadcast (a whole-table broadcast OOMs at scale)."""
    eng.sql("CREATE TABLE dob (a int, b int)")
    eng.sql("INSERT INTO dob VALUES (1, 1), (2, 2), (3, 3)")
    r = eng.sql("DELETE FROM dob WHERE b >= 2 ORDER BY b")
    assert r.rows_affected == 2
    assert rows(eng.sql("SELECT a FROM dob")) == [(1,)]


def test_partitioned_table_ddl_pruning_and_dml(eng, spark):
    """CREATE TABLE ... PARTITIONED BY: hive-style directory layout,
    partition pruning visible as PartitionFilters with a pruned file
    count (1 of 3 partitions read), declared column order preserved,
    DML + ANALYZE working through the backing table, and destructive
    ALTERs on the partition column rejected. The third pruning lever
    next to sorted layout and bucketing — the analog of the
    reference's index range scans (util/ranger/ranger.go:282)."""
    import os

    from tinysql_spark.plans import plan_string

    eng.sql(
        "CREATE TABLE evp (event_id bigint, event_date varchar(10), value double) "
        "PARTITIONED BY (event_date)"
    )
    eng.sql(
        "INSERT INTO evp VALUES (1, '2024-01-01', 1.0), (2, '2024-01-02', 2.0), "
        "(3, '2024-01-03', 3.0), (4, '2024-01-01', 4.0)"
    )
    data = eng.catalog.data_dir("default", "evp")
    dirs = sorted(d for d in os.listdir(data) if d.startswith("event_date="))
    assert dirs == [
        "event_date=2024-01-01",
        "event_date=2024-01-02",
        "event_date=2024-01-03",
    ]
    r = eng.sql("SELECT event_id FROM evp WHERE event_date = '2024-01-01'")
    assert rows(r) == [(1,), (4,)]
    plan = plan_string(r.df)
    assert "PartitionFilters" in plan and "event_date" in plan
    # pruned file count: the scan's file index holds only the matching
    # partition directory (1 file of 3 partitions)
    leaves = r.df._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.apply(0)
    assert len(scan.relation().location().inputFiles()) == 1
    # declared column order survives the partition-column reordering
    assert eng.sql("SELECT * FROM evp WHERE event_id = 2").df.columns == [
        "event_id",
        "event_date",
        "value",
    ]
    # DML + stats flow through the partitioned backing table
    eng.sql("DELETE FROM evp WHERE event_id = 1")
    assert rows(eng.sql("SELECT event_id FROM evp")) == [(2,), (3,), (4,)]
    eng.sql("REPLACE INTO evp VALUES (2, '2024-01-02', 9.0)")
    assert (2, 9.0) in rows(eng.sql("SELECT event_id, value FROM evp"))
    eng.sql("ANALYZE TABLE evp")
    assert eng.load_stats("default", "evp") is not None
    # partition columns are immutable layout
    with pytest.raises(ValueError, match="partition column"):
        eng.sql("ALTER TABLE evp DROP COLUMN event_date")
    with pytest.raises(ValueError, match="partition column"):
        eng.sql("ALTER TABLE evp RENAME COLUMN event_date TO d")
    with pytest.raises(ValueError, match="unknown column"):
        eng.sql("CREATE TABLE bad (a int) PARTITIONED BY (nope)")
    with pytest.raises(ValueError, match="unsupported"):
        eng.sql(
            "CREATE TABLE bad (a int, b int) PARTITIONED BY (b) "
            "CLUSTERED BY (a) INTO 4 BUCKETS"
        )


def test_partitioned_events_date_rollup(eng):
    """The date-partitioned-events shape end to end: ingest the driver
    events into a date-partitioned table via INSERT ... SELECT, then a
    single-day query prunes to that day's partition."""
    eng.attach_testdata("/root/testdata/sf0.001")
    eng.sql(
        "CREATE TABLE events_p (event_id bigint, event_date varchar(10), "
        "event_type varchar(16), value double) PARTITIONED BY (event_date)"
    )
    eng.sql(
        "INSERT INTO events_p SELECT event_id, date_format(ts, 'yyyy-MM-dd'), "
        "event_type, value FROM events"
    )
    import os

    data = eng.catalog.data_dir("default", "events_p")
    days = sorted(d for d in os.listdir(data) if d.startswith("event_date="))
    assert len(days) > 1, days
    one_day = days[0].split("=", 1)[1]
    r = eng.sql(
        f"SELECT count(*) AS n FROM events_p WHERE event_date = '{one_day}'"
    )
    n_day = r.df.collect()[0][0]
    n_all = eng.sql("SELECT count(*) AS n FROM events_p").df.collect()[0][0]
    assert 0 < n_day < n_all
    from tinysql_spark.plans import plan_string

    assert "PartitionFilters" in plan_string(r.df)


def test_show_create_table_renders_partitioned_by(eng):
    eng.sql("CREATE TABLE scp (a int, d varchar(10)) PARTITIONED BY (d)")
    out = eng.sql("SHOW CREATE TABLE scp").df.collect()[0][1]
    assert "PARTITIONED BY (`d`)" in out
    # round-trip: the rendered DDL parses back to the same layout
    from tinysql_spark import sqlparse as P

    ct = P.parse_create_table(out)
    assert ct.info.partition_by == ["d"]


def test_auto_increment_allocation(eng):
    """AUTO_INCREMENT parity (reference: meta/autoid; insert fills on
    omitted/NULL/0, explicit values rebase the counter, allocator
    survives persistence)."""
    eng.sql("CREATE TABLE ai (id int AUTO_INCREMENT PRIMARY KEY, v varchar(8))")
    eng.sql("INSERT INTO ai (v) VALUES ('a'), ('b')")
    assert rows(eng.sql("SELECT id, v FROM ai")) == [(1, "a"), (2, "b")]
    # explicit value rebases the counter past it
    eng.sql("INSERT INTO ai VALUES (10, 'x')")
    eng.sql("INSERT INTO ai (v) VALUES ('c')")
    assert (11, "c") in rows(eng.sql("SELECT id, v FROM ai"))
    # NULL and 0 both trigger allocation (MySQL fill rule)
    eng.sql("INSERT INTO ai VALUES (NULL, 'n'), (0, 'z')")
    got = dict((v, i) for i, v in rows(eng.sql("SELECT id, v FROM ai")))
    assert got["n"] == 12 and got["z"] == 13
    # rendered in DESCRIBE Extra and SHOW CREATE TABLE
    desc = {r[0]: r[5] for r in rows(eng.sql("DESCRIBE ai"))}
    assert desc["id"] == "auto_increment"
    assert "AUTO_INCREMENT" in eng.sql("SHOW CREATE TABLE ai").df.collect()[0][1]
    # constraint violations
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integer"):
        eng.sql("CREATE TABLE bad1 (s varchar(4) AUTO_INCREMENT PRIMARY KEY)")
    with _pytest.raises(ValueError, match="must be a key"):
        eng.sql("CREATE TABLE bad2 (a int, b int AUTO_INCREMENT)")
    with _pytest.raises(ValueError, match="only one"):
        eng.sql(
            "CREATE TABLE bad3 (a int AUTO_INCREMENT PRIMARY KEY, "
            "b int AUTO_INCREMENT, INDEX ib (b))"
        )


def test_auto_increment_explicit_and_fill_same_batch(eng):
    """A fill must never collide with an explicit id in the SAME
    statement: INSERT VALUES (1,'x'),(NULL,'y') on a fresh table — a
    pre-statement-counter allocation would hand the fill id 1 and fail
    the dup-key check; fills allocate above max(counter, explicit)
    (whole-batch rebase; MySQL rebases row-by-row, which differs only
    in which ids fills before a high explicit value get — documented
    divergence, never a collision)."""
    eng.sql("CREATE TABLE aib (id int AUTO_INCREMENT PRIMARY KEY, v varchar(8))")
    eng.sql("INSERT INTO aib VALUES (1, 'x'), (NULL, 'y')")
    got = dict((v, i) for i, v in rows(eng.sql("SELECT id, v FROM aib")))
    assert got["x"] == 1 and got["y"] == 2
    # explicit value above the fill range in the same batch
    eng.sql("INSERT INTO aib VALUES (NULL, 'a'), (50, 'b'), (0, 'c')")
    got = dict((v, i) for i, v in rows(eng.sql("SELECT id, v FROM aib")))
    assert got["b"] == 50
    assert len(set(got.values())) == len(got), got  # all ids distinct
    assert got["a"] == 51 and got["c"] == 52
    # counter rebased past everything
    eng.sql("INSERT INTO aib (v) VALUES ('d')")
    got = dict((v, i) for i, v in rows(eng.sql("SELECT id, v FROM aib")))
    assert got["d"] == 53


def test_auto_increment_persists(spark, tmp_path):
    from tinysql_spark.engine import Engine

    wh = str(tmp_path / "wh_ai")
    e1 = Engine(spark, wh)
    e1.sql("CREATE TABLE ai (id int AUTO_INCREMENT PRIMARY KEY, v int)")
    e1.sql("INSERT INTO ai (v) VALUES (1), (2), (3)")
    e2 = Engine(spark, wh)  # fresh engine over the same warehouse
    e2.sql("INSERT INTO ai (v) VALUES (4)")
    got = sorted(tuple(r) for r in e2.sql("SELECT id, v FROM ai").df.collect())
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_create_table_as_select(eng):
    """CTAS: schema inferred from the SELECT, rows loaded through the
    normal rowid path, result queryable/DML-able like any table."""
    eng.attach_testdata("/root/testdata/sf0.001")
    r = eng.sql(
        "CREATE TABLE big_orders AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 100000"
    )
    assert r.rows_affected > 0
    info = eng.catalog.get_table("default", "big_orders")
    assert [c.type for c in info.columns] == ["BIGINT", "BIGINT", "DOUBLE"]
    n = eng.sql("SELECT count(*) AS c FROM big_orders").df.collect()[0][0]
    assert n == r.rows_affected
    # DML works on the materialized table
    eng.sql("DELETE FROM big_orders WHERE o_totalprice < 200000")
    n2 = eng.sql("SELECT count(*) AS c FROM big_orders").df.collect()[0][0]
    assert n2 <= n
    # IF NOT EXISTS short-circuits; plain duplicate errors
    eng.sql("CREATE TABLE IF NOT EXISTS big_orders AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE TABLE big_orders AS SELECT 1 AS x")
    # unsupported result types get a clear error, not silent
    # corruption (timestamps are storable since the round-6 temporal
    # types; arrays remain outside the declared type surface)
    with pytest.raises(ValueError, match="cannot store column type"):
        eng.sql("CREATE TABLE ev2 AS SELECT array(1, 2) AS a FROM events")
    eng.sql("CREATE TABLE ev3 AS SELECT ts FROM events")  # now storable
    assert eng.sql("DESCRIBE ev3").rows()[0]["Type"] in ("timestamp", "datetime")
    # DDL job log records it
    jobs = eng.sql("ADMIN SHOW DDL JOBS 5").df.collect()
    assert any("create table as select" in str(r).lower() for r in jobs)


def test_ctas_nondeterministic_select_consistent(eng):
    """CTAS materializes the SELECT exactly once (localCheckpoint):
    a nondeterministic source must not disagree between the count,
    the rowid pass, and the write — table contents, rows_affected,
    and rowid accounting all describe the same execution."""
    eng.attach_testdata("/root/testdata/sf0.001")
    r = eng.sql(
        "CREATE TABLE rnd AS "
        "SELECT o_orderkey, rand() AS x FROM orders ORDER BY rand() LIMIT 50"
    )
    assert r.rows_affected == 50
    got = eng.sql("SELECT o_orderkey, x FROM rnd").df.collect()
    assert len(got) == 50
    # re-reading yields the SAME materialized values (one execution)
    again = eng.sql("SELECT o_orderkey, x FROM rnd").df.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_ctas_failure_drops_half_created_table(eng, monkeypatch):
    """A failure during the CTAS load must roll back the catalog entry
    — no half-created table that blocks a retry."""
    from tinysql_spark.engine import Engine

    def boom(self, db, t, df):
        raise RuntimeError("simulated load failure")

    monkeypatch.setattr(Engine, "_append", boom)
    with pytest.raises(RuntimeError, match="simulated load failure"):
        eng.sql("CREATE TABLE half AS SELECT 1 AS x")
    assert not eng.catalog.has_table("default", "half")
    monkeypatch.undo()
    # retry succeeds cleanly
    r = eng.sql("CREATE TABLE half AS SELECT 1 AS x")
    assert r.rows_affected == 1


def test_show_index_from(eng):
    """SHOW INDEX FROM t (executor/show.go fetchShowIndex shape): PK
    rows first (Key_name PRIMARY, Non_unique 0), then declared
    indexes, one row per key column in sequence."""
    eng.sql(
        "CREATE TABLE six (a int PRIMARY KEY, b int, c int, "
        "UNIQUE KEY ub (b), INDEX ibc (b, c))"
    )
    got = [tuple(r) for r in eng.sql("SHOW INDEX FROM six").df.collect()]
    assert ("six", 0, "PRIMARY", 1, "a") in got
    assert ("six", 0, "ub", 1, "b") in got
    assert ("six", 1, "ibc", 1, "b") in got and ("six", 1, "ibc", 2, "c") in got
    # SHOW KEYS / INDEXES synonyms (parser.y ShowTargetFilterable)
    assert [tuple(r) for r in eng.sql("SHOW KEYS IN six").df.collect()] == got
    assert [tuple(r) for r in eng.sql("SHOW INDEXES FROM six").df.collect()] == got


def test_ctas_partitioned(eng):
    """CTAS + PARTITIONED BY: one-statement date-partitioned
    materialization — hive dirs on disk, pruning active on the result."""
    import os

    eng.attach_testdata("/root/testdata/sf0.001")
    r = eng.sql(
        "CREATE TABLE ev_day PARTITIONED BY (event_date) AS "
        "SELECT event_id, value, date_format(ts, 'yyyy-MM-dd') AS event_date "
        "FROM events"
    )
    assert r.rows_affected > 0
    data = eng.catalog.data_dir("default", "ev_day")
    days = [d for d in os.listdir(data) if d.startswith("event_date=")]
    assert len(days) > 1
    one = days[0].split("=", 1)[1]
    q = eng.sql(f"SELECT count(*) AS n FROM ev_day WHERE event_date = '{one}'")
    assert 0 < q.df.collect()[0][0] < r.rows_affected
    from tinysql_spark.plans import plan_string

    assert "PartitionFilters" in plan_string(q.df)
    with pytest.raises(ValueError, match="unknown column"):
        eng.sql("CREATE TABLE bad PARTITIONED BY (nope) AS SELECT 1 AS x")


def test_show_columns_is_describe(eng):
    eng.sql("CREATE TABLE sc (a int PRIMARY KEY, b varchar(8))")
    want = rows(eng.sql("DESCRIBE sc"))
    assert rows(eng.sql("SHOW COLUMNS FROM sc")) == want
    assert rows(eng.sql("SHOW FULL FIELDS IN sc")) == want


def test_second_engine_preserves_live_txn_staging(eng, spark):
    """Review r04 finding 2: constructing another Engine over the same
    warehouse must NOT destroy a live session's open-transaction
    staging (the PID liveness marker gates startup cleanup); the
    first session's COMMIT still publishes its buffered writes."""
    import os

    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE lv (a int)")
    eng.sql("INSERT INTO lv VALUES (1)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO lv VALUES (2)")
    staging = eng.txn.dir
    assert os.path.isdir(staging)
    Engine(spark, eng.catalog.warehouse)  # same warehouse, same process
    assert os.path.isdir(staging), "live txn staging was destroyed"
    eng.sql("COMMIT")
    assert sorted(rows(eng.sql("SELECT a FROM lv"))) == [(1,), (2,)]
    # a genuinely dead txn dir (no live PID) IS cleaned on startup
    dead = os.path.join(eng.catalog.warehouse, ".txn-deadbeef")
    os.makedirs(dead, exist_ok=True)
    with open(os.path.join(dead, "PID"), "w") as f:
        f.write("999999999")
    Engine(spark, eng.catalog.warehouse)
    assert not os.path.exists(dead)


def test_txn_nondeterministic_delete_count_matches_staged(eng):
    """Review r04 finding 4: the reported rows_affected of an in-txn
    DELETE must equal the rows actually staged/removed even when the
    predicate is nondeterministic (single plan execution)."""
    eng.sql("CREATE TABLE nd (a int)")
    eng.sql("INSERT INTO nd VALUES " + ", ".join(f"({i})" for i in range(200)))
    eng.sql("BEGIN")
    n_del = eng.sql("DELETE FROM nd WHERE rand() < 0.5").rows_affected
    remaining = rows(eng.sql("SELECT a FROM nd"))
    assert len(remaining) == 200 - n_del
    eng.sql("COMMIT")
    assert len(rows(eng.sql("SELECT a FROM nd"))) == 200 - n_del


def test_txn_commit_appends_publish_as_renames(eng, spark):
    """Review r04 finding 1: add-only commit publishing must be
    rename-only — the prepared part files land in the data dir with
    no phase-2 Spark write job (assert via the staged tmp dir being
    consumed and the rows arriving)."""
    eng.sql("CREATE TABLE ap (a int)")
    eng.sql("INSERT INTO ap VALUES (1)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO ap VALUES (2), (3)")
    eng.sql("COMMIT")
    assert sorted(rows(eng.sql("SELECT a FROM ap"))) == [(1,), (2,), (3,)]
    import os

    leftovers = [
        d
        for d in os.listdir(eng.catalog.warehouse)
        if d.startswith(".txn-") or ".append-" in d or ".tmp-" in d
    ]
    assert leftovers == [], leftovers


def test_concurrent_engines_isolated_sessions(eng, spark):
    """VERDICT r04 item 1 (session isolation — reference analog:
    per-session context, session/session.go:562): two Engines over
    ONE SparkSession and ONE warehouse. Engine A opens a txn; engine
    B constructs (its _register_all must not re-point A's overlay),
    reads, and writes; A's overlay reads and COMMIT stay correct
    throughout, and B never sees A's uncommitted rows."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE iso (a int)")
    eng.sql("INSERT INTO iso VALUES (1)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO iso VALUES (2)")
    # A sees its own buffered write
    assert sorted(rows(eng.sql("SELECT a FROM iso"))) == [(1,), (2,)]

    # B: same SparkSession, same warehouse — registers everything fresh
    b = Engine(spark, eng.catalog.warehouse)
    try:
        # B reads COMMITTED data only (no dirty read of A's buffer)
        assert rows(b.sql("SELECT a FROM iso")) == [(1,)]
        assert rows(b.sql("SELECT a FROM default.iso")) == [(1,)]
        # B can create and write its own table concurrently
        b.sql("CREATE TABLE iso_b (x int)")
        b.sql("INSERT INTO iso_b VALUES (10)")
        assert rows(b.sql("SELECT x FROM iso_b")) == [(10,)]

        # A's overlay still live and correct AFTER B's registrations
        assert sorted(rows(eng.sql("SELECT a FROM iso"))) == [(1,), (2,)]
        assert sorted(rows(eng.sql("SELECT a FROM default.iso"))) == [
            (1,), (2,),
        ]
        eng.sql("INSERT INTO iso VALUES (3)")
        assert sorted(rows(eng.sql("SELECT a FROM iso"))) == [(1,), (2,), (3,)]
        eng.sql("COMMIT")
        assert sorted(rows(eng.sql("SELECT a FROM iso"))) == [(1,), (2,), (3,)]

        # the two Spark namespaces are distinct databases
        assert eng._spark_db("default") != b._spark_db("default")
    finally:
        b.close()
    # close() released B's namespace; A's is untouched
    assert sorted(rows(eng.sql("SELECT a FROM iso"))) == [(1,), (2,), (3,)]


def test_engine_session_temp_views_isolated(eng, spark, tmp_path):
    """attach_external registers a TEMP view on the engine's private
    session — a second engine attaching the same name to different
    data does not clobber the first."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tinysql_spark.engine import Engine

    p1, p2 = str(tmp_path / "x1.parquet"), str(tmp_path / "x2.parquet")
    pq.write_table(pa.table({"v": pa.array([1], pa.int64())}), p1)
    pq.write_table(pa.table({"v": pa.array([2], pa.int64())}), p2)
    eng.attach_external("ext", p1)
    b = Engine(spark, eng.catalog.warehouse)
    try:
        b.attach_external("ext", p2)
        assert rows(eng.sql("SELECT v FROM ext")) == [(1,)]
        assert rows(b.sql("SELECT v FROM ext")) == [(2,)]
    finally:
        b.close()


def test_explain_analyze_runtime_metrics(eng):
    """EXPLAIN ANALYZE executes the SELECT and returns one row per
    physical operator with actual row counts + runtime metric summary
    (VERDICT r04 item 6; TiDB's EXPLAIN ANALYZE surface)."""
    eng.sql("CREATE TABLE ea (k int, v double)")
    eng.sql(
        "INSERT INTO ea SELECT CAST(id % 7 AS INT), CAST(id AS DOUBLE) FROM range(100)"
    )
    r = eng.sql("EXPLAIN ANALYZE SELECT k, sum(v) AS s FROM ea GROUP BY k")
    got = r.df.collect()
    assert [f.name for f in r.df.schema.fields] == ["id", "actRows", "execution_info"]
    ops = [row["id"].strip() for row in got]
    # the executed tree contains a scan and an aggregate
    assert any("Scan" in o for o in ops), ops
    assert any("HashAggregate" in o for o in ops), ops
    # actual runtime row counts are populated: the scan saw 100 rows,
    # the final aggregate emitted 7 groups
    by_op = {row["id"].strip(): row for row in got}
    scan = next(row for op, row in by_op.items() if "Scan" in op)
    assert scan["actRows"] == 100
    assert any(row["actRows"] == 7 for row in got if "HashAggregate" in row["id"])
    # metric summaries carry real counters (time/memory/shuffle)
    assert any(row["execution_info"] for row in got)

    # DML is refused loudly — EXPLAIN ANALYZE must not execute writes
    with pytest.raises(ValueError, match="SELECT only"):
        eng.sql("EXPLAIN ANALYZE INSERT INTO ea VALUES (1, 1.0)")
    # and nothing was written by the refused statement
    assert rows(eng.sql("SELECT count(*) AS c FROM ea")) == [(100,)]


def test_explain_analyze_force_executes_dml(eng):
    """EXPLAIN ANALYZE FORCE <dml> (VERDICT r5 item 7): the explicit
    opt-in executes the write and reports actual metrics — rows
    affected, wall time, files/bytes delta — over the source plan
    tree; the plain form keeps refusing, so only a deliberate FORCE
    can make an 'explain' write."""
    eng.sql("CREATE TABLE eaf_src (k int, v double)")
    eng.sql(
        "INSERT INTO eaf_src SELECT CAST(id % 5 AS INT), CAST(id AS DOUBLE) "
        "FROM range(40)"
    )
    eng.sql("CREATE TABLE eaf_dst (k int, v double)")
    r = eng.sql(
        "EXPLAIN ANALYZE FORCE INSERT INTO eaf_dst SELECT k, v FROM eaf_src WHERE k < 3"
    )
    got = r.df.collect()
    assert [f.name for f in r.df.schema.fields] == ["id", "actRows", "execution_info"]
    # executor node: actual affected rows + runtime/write metrics
    assert got[0]["id"].startswith("InsertExec"), got[0]
    assert got[0]["actRows"] == 24 and r.rows_affected == 24
    info = got[0]["execution_info"]
    assert "time:" in info and "files:+" in info and "rows inserted" in info
    # the source plan tree is rendered underneath
    assert any("Scan" in row["id"] for row in got[1:]), got
    # the rows actually landed
    assert rows(eng.sql("SELECT count(*) AS c FROM eaf_dst")) == [(24,)]

    # DELETE under FORCE: executes, reports, rows gone
    r = eng.sql("EXPLAIN ANALYZE FORCE DELETE FROM eaf_dst WHERE k = 0")
    assert r.df.collect()[0]["id"].startswith("DeleteExec")
    assert r.rows_affected == 8
    assert rows(eng.sql("SELECT count(*) AS c FROM eaf_dst")) == [(16,)]


def test_ctas_failure_mid_append_leaves_no_orphan_dir(eng, monkeypatch):
    """VERDICT r04 item 10: a failure DURING _append (after data files
    are already on disk) must drop the catalog entry AND the on-disk
    table dir — no orphan directory next to the warehouse data."""
    import os

    from tinysql_spark.engine import Engine

    real_append = Engine._append

    def partial_then_boom(self, db, t, df):
        real_append(self, db, t, df)  # files land in data/
        raise RuntimeError("simulated post-write failure")

    monkeypatch.setattr(Engine, "_append", partial_then_boom)
    with pytest.raises(RuntimeError, match="post-write"):
        eng.sql("CREATE TABLE orphan AS SELECT 1 AS x")
    assert not eng.catalog.has_table("default", "orphan")
    tdir = os.path.join(eng.catalog.warehouse, "default", "orphan")
    assert not os.path.exists(tdir), "orphan table dir left on disk"
    monkeypatch.undo()
    r = eng.sql("CREATE TABLE orphan AS SELECT 1 AS x")
    assert r.rows_affected == 1
    assert rows(eng.sql("SELECT x FROM orphan")) == [(1,)]


def test_running_setvar_window_rewrite(eng):
    """Row-stream SetVar running idioms (reference:
    executor/executor.go:413-415 unBatchedNext exists for row-at-a-time
    SetVar): `@t := @t + x ... ORDER BY k` and `@r := @r + 1` execute
    as prefix-sum windows over the statement's ORDER BY; non-running
    forms still fail loudly."""
    eng.sql("CREATE TABLE rs (k int, v double)")
    eng.sql("INSERT INTO rs VALUES (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)")
    eng.sql("SET @t = 0")
    got = rows(eng.sql("SELECT k, @t := @t + v AS rt FROM rs ORDER BY k"))
    assert got == [(1, 10.0), (2, 30.0), (3, 60.0), (4, 100.0)]
    # non-zero initial value participates (MySQL: @t carries in)
    eng.sql("SET @t = 5")
    got = rows(eng.sql("SELECT k, @t := @t + v AS rt FROM rs ORDER BY k DESC"))
    assert got == [(1, 105.0), (2, 95.0), (3, 75.0), (4, 45.0)]
    # row counter
    eng.sql("SET @r = 0")
    got = rows(eng.sql("SELECT k, @r := @r + 1 AS rn FROM rs ORDER BY k"))
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]
    # unset variable: NULL propagates to every row (MySQL semantics)
    got = rows(eng.sql("SELECT k, @unset := @unset + v AS rt FROM rs ORDER BY k"))
    assert all(r[1] is None for r in got)
    # inside a scalar function
    eng.sql("SET @t = 0")
    got = rows(eng.sql("SELECT k, round(@t := @t + v, 1) AS rt FROM rs ORDER BY k"))
    assert got == [(1, 10.0), (2, 30.0), (3, 60.0), (4, 100.0)]
    # plain capture projects the expression per row (order irrelevant)
    got = rows(eng.sql("SELECT k, @a := v AS cv FROM rs ORDER BY k"))
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)]
    # unsupported forms stay loud
    import pytest as _pt

    with _pt.raises(ValueError, match="row-order-dependent"):
        eng.sql("SELECT @t := @t + v FROM rs")  # no ORDER BY
    with _pt.raises(ValueError, match="assigned more than once"):
        eng.sql("SELECT @t := @t + v, @t := @t + 1 FROM rs ORDER BY k")
    with _pt.raises(ValueError, match="read"):
        eng.sql("SELECT @t := @t + v AS rt, @t * 2 AS x FROM rs ORDER BY k")
    # a capture must not read a variable assigned in the same statement
    with _pt.raises(ValueError, match="read"):
        eng.sql("SELECT @t := @t + v AS rt, @b := @t FROM rs ORDER BY k")
    # ADVICE r5: ORDER BY ordinal / select-list alias would silently
    # change meaning inside the window spec — refuse loudly
    with _pt.raises(ValueError, match="ordinal"):
        eng.sql("SELECT k, @t := @t + v AS rt FROM rs ORDER BY 1")
    with _pt.raises(ValueError, match="alias"):
        eng.sql("SELECT k AS kk, @t := @t + v AS rt FROM rs ORDER BY kk")


def test_engine_reload_sees_other_sessions_ddl(eng, spark):
    """Cross-session schema visibility (schema-reload analog,
    domain/domain.go:66): the per-statement catalog stamp AUTO-reloads
    another session's committed DDL and data — create, insert, and
    drop become visible with no explicit call; inside an open txn the
    snapshot is kept (no reload) and explicit reload is refused."""
    from tinysql_spark.engine import Engine

    b = Engine(spark, eng.catalog.warehouse)
    try:
        b.sql("CREATE TABLE shared (a int)")
        b.sql("INSERT INTO shared VALUES (1), (2)")
        # auto-reload: A's next statement picks up B's table
        assert sorted(rows(eng.sql("SELECT a FROM shared"))) == [(1,), (2,)]
        # data-only change by B, visible automatically (fresh listing)
        b.sql("INSERT INTO shared VALUES (3)")
        assert sorted(rows(eng.sql("SELECT a FROM shared"))) == [(1,), (2,), (3,)]
        # drop by B
        b.sql("DROP TABLE shared")
        with pytest.raises(Exception):
            eng.sql("SELECT a FROM shared").df.collect()
        # inside a txn: A keeps its snapshot (no auto reload) and
        # explicit reload is refused
        eng.sql("CREATE TABLE own (x int)")
        eng.sql("INSERT INTO own VALUES (1)")
        eng.sql("BEGIN")
        eng.sql("INSERT INTO own VALUES (2)")
        assert sorted(rows(eng.sql("SELECT x FROM own"))) == [(1,), (2,)]
        with pytest.raises(ValueError, match="open transaction"):
            eng.reload()
        eng.sql("COMMIT")
        assert sorted(rows(eng.sql("SELECT x FROM own"))) == [(1,), (2,)]
        # B's DDL AFTER A's commit: A's next statement auto-reloads it.
        # (Concurrent DDL *during* A's txn is the documented
        # last-write-wins race on catalog.json — SURVEY §7.12 item 3 —
        # so the deterministic contract is post-commit visibility.)
        b.sql("CREATE TABLE b_side (y int)")  # B auto-reloads past A's commit first
        assert rows(eng.sql("SELECT count(*) AS c FROM b_side")) == [(0,)]
    finally:
        b.close()


def test_external_commit_during_reader_not_masked(eng, spark):
    """ADVICE r5 (engine.py stamp race): a SELECT takes no flock, so
    another session's commit can land BETWEEN A's start-of-statement
    stamp check and statement end. The old code re-stat'ed the stamp
    at statement end, absorbing that external commit without ever
    reloading it — B's table stayed invisible to A indefinitely.
    Readers must leave the stamp untouched so A's NEXT statement sees
    the mismatch and reloads."""
    from tinysql_spark.engine import Engine

    b = Engine(spark, eng.catalog.warehouse)
    try:
        eng.sql("SELECT 1")  # A fully in sync
        orig = eng._exec_select

        def select_with_interleaved_commit(stmt):
            r = orig(stmt)
            # external commit lands mid-statement, after A's start check
            b.sql("CREATE TABLE raced (y int)")
            b.sql("INSERT INTO raced VALUES (7)")
            return r

        eng._exec_select = select_with_interleaved_commit
        try:
            eng.sql("SELECT 1")
        finally:
            eng._exec_select = orig
        # A's next statement must auto-reload and see B's table
        assert rows(eng.sql("SELECT y FROM raced")) == [(7,)]
    finally:
        b.close()


def test_concurrent_writers_merge_not_clobber(eng, spark):
    """The cross-process catalog write lock (flock + under-lock
    stamp-reload): two engines WRITING concurrently from two threads
    must merge their catalog mutations — before the lock, the
    read-modify-write race could silently drop one engine's tables
    from catalog.json. Afterward both engines see both tables with
    the right contents."""
    import threading

    from tinysql_spark.engine import Engine

    b = Engine(spark, eng.catalog.warehouse)
    errors: list[Exception] = []

    def work(engine, name):
        try:
            engine.sql(f"CREATE TABLE {name} (v int)")
            for i in range(5):
                engine.sql(f"INSERT INTO {name} VALUES ({i})")
        except Exception as ex:  # surfaced after join
            errors.append(ex)

    try:
        ta = threading.Thread(target=work, args=(eng, "cw_a"))
        tb = threading.Thread(target=work, args=(b, "cw_b"))
        ta.start(); tb.start(); ta.join(); tb.join()
        assert not errors, errors
        # both tables survived in the shared catalog, visible to BOTH
        # engines (auto-reload), with all rows
        for engine in (eng, b):
            assert rows(engine.sql("SELECT count(*) AS c FROM cw_a")) == [(5,)]
            assert rows(engine.sql("SELECT count(*) AS c FROM cw_b")) == [(5,)]
        from tinysql_spark.catalog import Catalog

        disk = Catalog(eng.catalog.warehouse)
        assert disk.has_table("default", "cw_a") and disk.has_table("default", "cw_b")
    finally:
        b.close()


def test_txn_model_random_sequences(eng):
    """Model-based test for the transaction overlay (UnionScanExec
    analog): seeded random statement sequences — autocommit and
    in-txn INSERT/DELETE/REPLACE, COMMIT, ROLLBACK — run against the
    engine AND a plain Python model of MySQL semantics (txn buffers
    writes, reads see the overlay, ROLLBACK discards, REPLACE
    resolves on the PK). The engine's visible table state must match
    the model after every statement. Single fixed corpora cannot
    explore the overlay's interleavings; three seeds x 24 ops do."""
    import random

    eng.sql("CREATE TABLE tm (k int PRIMARY KEY, v int)")

    def visible():
        return sorted(
            (r["k"], r["v"]) for r in eng.sql("SELECT k, v FROM tm").rows()
        )

    for seed in (11, 23, 47):
        eng.sql("DELETE FROM tm")
        committed: dict[int, int] = {}
        buffered: dict[int, int] | None = None  # None = autocommit
        rng = random.Random(seed)

        def model():
            cur = dict(committed)
            if buffered is not None:
                cur.update({k: v for k, v in buffered.items() if v is not None})
                for k, v in buffered.items():
                    if v is None:
                        cur.pop(k, None)
            return sorted(cur.items())

        def write(k, v):
            # v=None encodes a delete in the overlay dicts
            tgt = buffered if buffered is not None else committed
            if v is None:
                if buffered is not None:
                    tgt[k] = None
                else:
                    tgt.pop(k, None)
            else:
                tgt[k] = v

        for step in range(24):
            op = rng.choice(
                ["ins", "ins", "rep", "del", "begin", "commit", "rollback"]
            )
            k = rng.randrange(8)
            v = rng.randrange(100)
            live = dict(model())
            if op == "ins":
                if k in live:
                    with pytest.raises(ValueError, match="duplicate key"):
                        eng.sql(f"INSERT INTO tm VALUES ({k}, {v})")
                else:
                    eng.sql(f"INSERT INTO tm VALUES ({k}, {v})")
                    write(k, v)
            elif op == "rep":
                eng.sql(f"REPLACE INTO tm VALUES ({k}, {v})")
                write(k, v)
            elif op == "del":
                eng.sql(f"DELETE FROM tm WHERE k = {k}")
                if k in live:
                    write(k, None)
            elif op == "begin":
                if buffered is None:
                    eng.sql("BEGIN")
                    buffered = {}
            elif op == "commit":
                if buffered is not None:
                    eng.sql("COMMIT")
                    for bk, bv in buffered.items():
                        if bv is None:
                            committed.pop(bk, None)
                        else:
                            committed[bk] = bv
                    buffered = None
            elif op == "rollback":
                if buffered is not None:
                    eng.sql("ROLLBACK")
                    buffered = None
            assert visible() == model(), (seed, step, op, k, v)
        if buffered is not None:
            eng.sql("ROLLBACK")
            buffered = None
        assert visible() == model(), (seed, "final")



def test_mysql_cast_unsigned_signed(eng):
    """MySQL's CAST targets UNSIGNED/SIGNED [INTEGER] (parser.y
    CastType) run end-to-end. Round 11 closes the former pinned
    divergence: CAST(negative AS UNSIGNED) now wraps mod 2^64 into
    DECIMAL(20,0) — true KindUint64 semantics (types/datum.go:36;
    CAST(-1 AS UNSIGNED) = 18446744073709551615 in MySQL). Doubles
    round before the wrap (MySQL rounds float->int on cast)."""
    from decimal import Decimal

    eng.sql("CREATE TABLE uc (s string, d double)")
    eng.sql("INSERT INTO uc VALUES ('42', -1.7)")
    assert rows(eng.sql("SELECT CAST(s AS UNSIGNED) AS u FROM uc")) == [
        (Decimal(42),)
    ]
    assert rows(eng.sql("SELECT CAST(d AS SIGNED INTEGER) AS i FROM uc")) == [(-1,)]
    # the wrap side: -1 -> 2^64-1; -1.7 rounds to -2 -> 2^64-2
    assert rows(eng.sql("SELECT CAST(0 - 1 AS UNSIGNED) AS u FROM uc")) == [
        (Decimal(18446744073709551615),)
    ]
    assert rows(eng.sql("SELECT CAST(d AS UNSIGNED) AS u FROM uc")) == [
        (Decimal(18446744073709551614),)
    ]
    # round-trip: a wrapped value re-cast to SIGNED comes back
    assert rows(
        eng.sql("SELECT CAST(CAST(0 - 1 AS UNSIGNED) - 18446744073709551616 AS SIGNED) AS i FROM uc")
    ) == [(-1,)]
    # string literal containing the keyword passes through untouched
    assert rows(eng.sql("SELECT 'AS UNSIGNED' AS s FROM uc")) == [("AS UNSIGNED",)]


def test_empty_statement_is_noop(eng):
    """EmptyStmt parity (reference parser.y EmptyStmt): whitespace or
    bare-semicolon input is a no-op result, not an internal error."""
    for s in ("", "   ", ";", " ; ; "):
        r = eng.sql(s)
        assert r.df is None and r.rows_affected == 0, s


def test_explain_table_is_describe_synonym(eng):
    """EXPLAIN <table> == DESCRIBE <table> (MySQL's ExplainSym applied
    symmetrically — DESC t already worked; the EXPLAIN spelling must
    too)."""
    eng.sql("CREATE TABLE ed (k int, v double)")
    a = [tuple(r) for r in eng.sql("EXPLAIN ed").rows()]
    b = [tuple(r) for r in eng.sql("DESCRIBE ed").rows()]
    assert a == b and a[0][0] == "k", (a, b)


def test_mysql_date_format_and_session_functions(eng):
    """MySQL-isms as extensions (the reference registry has no
    time/info builtins): DATE_FORMAT %-patterns translate to Spark's
    Java patterns, and DATABASE()/SCHEMA()/CONNECTION_ID() resolve
    from session state."""
    eng.sql("CREATE TABLE df (d date)")
    eng.sql("INSERT INTO df VALUES ('1997-03-09')")
    assert rows(eng.sql("SELECT DATE_FORMAT(d, '%Y/%m') AS a FROM df")) == [
        ("1997/03",)
    ]
    assert rows(
        eng.sql("SELECT DATE_FORMAT(d, '%d.%m.%y') AS a FROM df")
    ) == [("09.03.97",)]
    # Java-style pattern (Spark's own date_format, case-insensitive
    # name) passes through untouched
    assert rows(eng.sql("SELECT DATE_FORMAT(d, 'yyyy') AS a FROM df")) == [
        ("1997",)
    ]
    assert rows(eng.sql("SELECT DATABASE() AS db FROM df"))[0][0] == eng.current_db
    assert rows(eng.sql("SELECT CONNECTION_ID() AS c FROM df")) == [(1,)]
    # the function NAME inside a string literal is untouched
    assert rows(eng.sql("SELECT 'DATABASE()' AS s FROM df")) == [("DATABASE()",)]


def test_temporal_decimal_boolean_column_types(eng):
    """DATE/DATETIME/TIMESTAMP/DECIMAL(p,s)/BOOLEAN columns (reference
    type bytes TypeDate/TypeDatetime/TypeTimestamp/TypeNewDecimal —
    parser/mysql/type.go:25-38) work through the full surface:
    CREATE, INSERT (string literals cast on write), DESCRIBE, CTAS
    type round-trip, SHOW CREATE TABLE."""
    import datetime
    from decimal import Decimal

    eng.sql(
        "CREATE TABLE ty (d date, dt datetime, ts timestamp, "
        "amt decimal(10,2), ok boolean)"
    )
    eng.sql(
        "INSERT INTO ty VALUES ('1997-03-09', '1997-03-09 12:30:00', "
        "'1997-03-09 12:30:00', 12.345, true)"
    )
    got = eng.sql("SELECT * FROM ty").rows()[0]
    assert got["d"] == datetime.date(1997, 3, 9)
    assert got["dt"] == datetime.datetime(1997, 3, 9, 12, 30)
    assert got["amt"] == Decimal("12.35")  # 2-digit scale rounds on write
    assert got["ok"] is True
    types = {r["Field"]: r["Type"] for r in eng.sql("DESCRIBE ty").rows()}
    assert types == {
        "d": "date", "dt": "datetime", "ts": "timestamp",
        "amt": "decimal(10,2)", "ok": "boolean",
    }
    # CTAS preserves the new types end to end
    eng.sql("CREATE TABLE ty2 AS SELECT d, dt, amt, ok FROM ty")
    ddl = eng.sql("SHOW CREATE TABLE ty2").rows()[0]["Create Table"]
    for frag in ("`d` DATE", "`dt` DATETIME", "`amt` DECIMAL(10,2)", "`ok` BOOLEAN"):
        assert frag in ddl, ddl


def test_auto_increment_sparse_large_batch(eng, monkeypatch):
    """VERDICT r6 item 3: a large INSERT..SELECT into an
    AUTO_INCREMENT table must not funnel through one task. Above
    _DENSE_ROWID_MAX the fill switches to sparse per-partition ranges
    (mirroring _assign_rowids): the fill plan contains NO unpartitioned
    window / single-partition Exchange, ids stay unique and monotone in
    batch order, and MySQL fill-on-NULL/0 semantics hold (explicit ids
    survive, fills allocate above max(counter, explicit))."""
    from tinysql_spark.engine import Engine

    monkeypatch.setattr(Engine, "_DENSE_ROWID_MAX", 10)
    eng.attach_testdata("/root/testdata/sf0.001")
    eng.sql("CREATE TABLE big_ai (id bigint AUTO_INCREMENT PRIMARY KEY, k bigint)")
    eng.sql("INSERT INTO big_ai VALUES (7, -1)")  # explicit id rebases

    # plan evidence: build the exact fill plan the INSERT..SELECT
    # executes (no write — the real statements follow below)
    import tinysql_spark.sqlparse as P

    ins = P.parse_insert(
        "INSERT INTO big_ai (k) SELECT o_orderkey FROM orders"
    )
    info = eng.catalog.get_table("default", "big_ai")
    filled, n = eng._values_df(ins, info)
    plan = filled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" not in plan, plan  # sparse path: no window at all

    got = filled.select("id", "k").collect()
    assert n == len(got) > 10
    ids = [r["id"] for r in got]
    assert len(set(ids)) == len(ids), "duplicate auto ids"
    assert min(ids) > 7, "fill must allocate above the explicit id"
    # allocator advanced past the largest handed-out id
    assert info.next_auto == max(ids) + 1

    # the full statement path: unique within and across batches
    eng.sql("INSERT INTO big_ai (k) SELECT o_orderkey FROM orders")
    eng.sql("INSERT INTO big_ai (k) SELECT o_orderkey + 1000000 FROM orders")
    r = eng.sql("SELECT count(*) AS n, count(DISTINCT id) AS d FROM big_ai")
    n_all, d_all = r.df.collect()[0]
    assert n_all == d_all == 2 * n + 1


def test_setvar_last_value_capture(eng):
    """VERDICT r6 item 5: `@a := col` under a top-level ORDER BY
    leaves the session variable at the FINAL row's assigned value
    (MySQL row-at-a-time SetVar, executor/executor.go:413-415); the
    result set itself is unchanged. Without ORDER BY the variable
    stays untouched (scan-order 'last row' is indeterminate —
    documented divergence). Running forms capture their final total."""
    eng.sql("CREATE TABLE cv (k int, v int)")
    eng.sql("INSERT INTO cv VALUES (1, 10), (2, 20), (3, 30)")

    # plain capture: last row in ORDER BY k => v = 30
    assert sorted(rows(eng.sql("SELECT @a := v FROM cv ORDER BY k"))) == [
        (10,), (20,), (30,)
    ]
    assert rows(eng.sql("SELECT @a + 1 AS x")) == [(31,)]
    # descending order flips the captured row
    eng.sql("SELECT @a := v AS val FROM cv ORDER BY k DESC")
    assert rows(eng.sql("SELECT @a AS x")) == [(10,)]
    # LIMIT bounds the stream: last emitted row is the 2nd
    eng.sql("SELECT @a := v FROM cv ORDER BY k LIMIT 2")
    assert rows(eng.sql("SELECT @a AS x")) == [(20,)]
    # no ORDER BY: variable untouched
    eng.sql("SELECT @a := v * 100 FROM cv")
    assert rows(eng.sql("SELECT @a AS x")) == [(20,)]
    # empty result: variable untouched (MySQL: no row, no assignment)
    eng.sql("SELECT @a := v FROM cv WHERE k > 99 ORDER BY k")
    assert rows(eng.sql("SELECT @a AS x")) == [(20,)]
    # running form: final running total is captured
    eng.sql("SET @t := 0")
    got = rows(eng.sql("SELECT k, @t := @t + v AS rt FROM cv ORDER BY k"))
    assert got == [(1, 10), (2, 30), (3, 60)]
    assert rows(eng.sql("SELECT @t AS x")) == [(60,)]
    # multiple captures in one statement, mixed with plain columns
    eng.sql("SELECT k, @lo := v, @hi := v * 2 FROM cv ORDER BY k")
    assert rows(eng.sql("SELECT @lo AS a, @hi AS b")) == [(30, 60)]
    # nested assignment is not a whole select item -> no capture
    # (and mid-stream-read refusals still fire)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="assigned more than once"):
        eng.sql("SELECT @z := v, @z := k FROM cv ORDER BY k")


def test_q69_warehouse_memoized(spark, sf_dir):
    """VERDICT r8 item 6: q69 must NOT rebuild its typed warehouse per
    invocation. Cold run builds (CTAS + INSERT jobs); warm run reuses
    the memoized warehouse dir and schedules strictly fewer jobs —
    in particular no parquet-write job from the INSERT."""
    import os as _os

    from tinysql_spark.operators import relational as R

    sc = spark.sparkContext
    R._Q69_WAREHOUSE_MEMO.clear()  # force a genuinely cold first run

    def run(group):
        sc.setJobGroup(group, group)
        try:
            rows = R.q69_typed_ctas(spark, sf_dir).collect()
            jobs = sc.statusTracker().getJobIdsForGroup(group)
        finally:
            sc.setJobGroup(None, None)
        return rows, jobs

    cold_rows, cold_jobs = run("q69-cold")
    d1 = R._Q69_WAREHOUSE_MEMO[_os.path.abspath(sf_dir)]
    warm_rows, warm_jobs = run("q69-warm")
    d2 = R._Q69_WAREHOUSE_MEMO[_os.path.abspath(sf_dir)]
    assert d1 == d2, "memo handed out a different warehouse dir"
    assert sorted(map(tuple, cold_rows)) == sorted(map(tuple, warm_rows))
    # the cold path's INSERT..SELECT alone schedules write jobs the
    # warm path must not repeat
    assert len(warm_jobs) <= len(cold_jobs) - 2, (
        f"warm q69 scheduled {len(warm_jobs)} jobs vs cold "
        f"{len(cold_jobs)} — warehouse likely rebuilt"
    )


def test_mysql_errno_prefixes(eng):
    """User-facing error parity (reference: parser/mysql error codes):
    the engine's rejection messages carry the MySQL errno a client
    would see — 1062 dup-key, 1048 not-null, 1054 unknown column,
    1136 count mismatch, 1146 unknown table, 1049 unknown database."""
    import pytest

    eng.sql("CREATE TABLE errno_t (k INT PRIMARY KEY, v INT NOT NULL)")
    eng.sql("INSERT INTO errno_t VALUES (1, 1)")
    for errno, stmt in [
        ("1062", "INSERT INTO errno_t VALUES (1, 2)"),
        ("1048", "INSERT INTO errno_t VALUES (2, NULL)"),
        ("1054", "INSERT INTO errno_t (k, nope) VALUES (2, 1)"),
        ("1136", "INSERT INTO errno_t VALUES (2)"),
        ("1146", "INSERT INTO errno_nosuch VALUES (1)"),
        ("1049", "USE errno_nodb"),
    ]:
        with pytest.raises(ValueError, match=rf"\(errno {errno}\)"):
            eng.sql(stmt)


def test_txn_statement_failure_keeps_txn_consistent(eng):
    """MySQL/InnoDB semantics: a failing statement inside a
    transaction rolls back the STATEMENT, never the transaction — the
    dup-key check must also see the txn's OWN buffered writes
    (read-your-writes), and COMMIT publishes exactly the successful
    statements."""
    import pytest

    eng.sql("CREATE TABLE txf (k BIGINT PRIMARY KEY, v BIGINT)")
    eng.sql("INSERT INTO txf VALUES (1, 10)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO txf VALUES (2, 20)")
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql("INSERT INTO txf VALUES (1, 99)")  # dup vs committed
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql("INSERT INTO txf VALUES (2, 99)")  # dup vs own buffer
    eng.sql("INSERT INTO txf VALUES (3, 30)")
    eng.sql("COMMIT")
    assert rows(eng.sql("SELECT k, v FROM txf")) == [(1, 10), (2, 20), (3, 30)]


def test_unsigned_bigint_true_semantics(eng):
    """BIGINT UNSIGNED holds the full [0, 2^64) range exactly — the
    formerly-accepted cut (reference: types/datum.go KindUint64,
    parser/mysql/type.go UnsignedFlag) closed via a DECIMAL(20,0)
    mapping: values above 2^63-1 round-trip without wrap, arithmetic
    and ordering are exact, negative inserts are rejected with
    MySQL's 1264, and the unique-key path works on the decimal key."""
    import decimal

    import pytest

    eng.sql(
        "CREATE TABLE uns (k BIGINT UNSIGNED PRIMARY KEY, "
        "b INT UNSIGNED, c SMALLINT UNSIGNED, s VARCHAR(16))"
    )
    top = 18446744073709551615  # 2^64 - 1
    eng.sql(f"INSERT INTO uns VALUES ({top}, 4294967295, 65535, 'max')")
    eng.sql("INSERT INTO uns VALUES (0, 0, 0, 'min')")
    got = rows(eng.sql("SELECT k, b, c FROM uns"))
    assert got == [
        (decimal.Decimal(0), 0, 0),
        (decimal.Decimal(top), 4294967295, 65535),
    ]
    # arithmetic past int64 and predicates above the signed max
    assert rows(eng.sql("SELECT k + 1 AS k1 FROM uns WHERE k > 9223372036854775807")) == [
        (decimal.Decimal(top) + 1,)
    ]
    # strict-mode range enforcement, each unsigned width, BOTH bounds
    # (the r10 close only rejected negatives; MySQL's errno 1264 also
    # fires above each width's max — 2^64 and 4294967296 must fail)
    for bad in (f"INSERT INTO uns VALUES (-1, 1, 1, 'x')",
                f"INSERT INTO uns VALUES (5, -1, 1, 'x')",
                f"INSERT INTO uns VALUES (5, 1, -1, 'x')",
                f"INSERT INTO uns VALUES ({top + 1}, 1, 1, 'x')",  # 2^64
                f"INSERT INTO uns VALUES (5, 4294967296, 1, 'x')",
                f"INSERT INTO uns VALUES (5, 1, 65536, 'x')"):
        with pytest.raises(ValueError, match=r"\(errno 1264\) out of range"):
            eng.sql(bad)
    # state unchanged on every reject, and the stored data passes the
    # range invariant ADMIN CHECK TABLE now audits
    assert rows(eng.sql("SELECT count(*) AS n FROM uns"))[0][0] == 2
    assert eng.sql("ADMIN CHECK TABLE uns").rows()[0][2] == "OK"
    # unique/REPLACE/DELETE machinery on the decimal-mapped key
    with pytest.raises(ValueError, match="duplicate key"):
        eng.sql(f"INSERT INTO uns VALUES ({top}, 1, 1, 'dup')")
    eng.sql(f"REPLACE INTO uns VALUES ({top}, 7, 7, 'rep')")
    eng.sql("DELETE FROM uns WHERE k < 100")
    assert rows(eng.sql("SELECT k, s FROM uns")) == [(decimal.Decimal(top), "rep")]
    # ALTER ADD COLUMN keeps the modifier; SHOW CREATE round-trips it
    eng.sql("ALTER TABLE uns ADD COLUMN d BIGINT UNSIGNED")
    eng.sql(f"INSERT INTO uns (k, b, c, s, d) VALUES (9, 1, 1, 'y', {top - 1})")
    assert rows(eng.sql("SELECT max(d) AS md FROM uns")) == [(decimal.Decimal(top - 1),)]
    ddl = eng.sql("SHOW CREATE TABLE uns").df.collect()[0][1]
    assert "BIGINT UNSIGNED" in ddl


def test_optimize_logged_as_ddl_job(eng):
    """Table-maintenance rewrites (compaction / ZORDER re-clustering)
    must leave an audit row in ADMIN SHOW DDL JOBS like any DDL — the
    reference's job queue records reorganization work the same way."""
    eng.sql("CREATE TABLE zj (a BIGINT, b BIGINT)")
    eng.sql("INSERT INTO zj VALUES (1, 2), (3, 4)")
    eng.sql("OPTIMIZE TABLE zj")
    eng.sql("OPTIMIZE TABLE zj ZORDER BY (a, b)")
    rows = [tuple(r) for r in eng.sql("ADMIN SHOW DDL JOBS").df.collect()]
    opt = [r for r in rows if r[1] == "optimize"]
    assert len(opt) == 2
    assert any("ZORDER BY (a, b)" in r[-1] for r in opt)


# ---------------------------------------------------------------------------
# ALTER ADD COLUMN initial-default fill (round-11 continuation):
# MySQL fills PRE-EXISTING rows with the DEFAULT (implicit type
# default under NOT NULL) — ddl/column.go backfill. The engine records
# the literal plus a rowid watermark at ALTER time and fills at read,
# so the 100 TB table is never rewritten (Iceberg v3 initial_default
# is the same design).
# ---------------------------------------------------------------------------


def test_add_column_default_fills_existing_rows(eng):
    eng.sql("CREATE TABLE idf (a INT)")
    eng.sql("INSERT INTO idf VALUES (1), (2)")
    eng.sql("ALTER TABLE idf ADD COLUMN c INT DEFAULT 5")
    # pre-existing rows read the default; the fill works in
    # projections AND predicates (the DELETE/REPLACE planning paths)
    assert sorted((r.a, r.c) for r in eng.sql("SELECT a, c FROM idf").df.collect()) == [
        (1, 5),
        (2, 5),
    ]
    assert sorted(r.a for r in eng.sql("SELECT a FROM idf WHERE c = 5").df.collect()) == [1, 2]
    # post-ALTER rows keep what they write: explicit NULL stays NULL,
    # omitted fills the declared default — the fill applies ONLY below
    # the ALTER's rowid watermark
    eng.sql("INSERT INTO idf (a, c) VALUES (3, NULL)")
    eng.sql("INSERT INTO idf (a) VALUES (4)")
    got = dict((r.a, r.c) for r in eng.sql("SELECT a, c FROM idf").df.collect())
    assert got == {1: 5, 2: 5, 3: None, 4: 5}
    ddl = eng.sql("SHOW CREATE TABLE idf").df.collect()[0][1]
    assert "DEFAULT 5" in ddl


def test_add_column_not_null_implicit_defaults(eng):
    """NOT NULL without DEFAULT fills the MySQL implicit type default
    (numeric 0, string '', boolean FALSE) for pre-existing rows — and
    the table passes its own ADMIN CHECK immediately after the ALTER
    (previously the NULLs made the audit fail its NOT NULL invariant)."""
    eng.sql("CREATE TABLE inn (a INT)")
    eng.sql("INSERT INTO inn VALUES (1)")
    eng.sql("ALTER TABLE inn ADD COLUMN n BIGINT NOT NULL")
    eng.sql("ALTER TABLE inn ADD COLUMN s VARCHAR(8) NOT NULL")
    eng.sql("ALTER TABLE inn ADD COLUMN b BOOLEAN NOT NULL")
    row = eng.sql("SELECT n, s, b FROM inn").df.collect()[0]
    assert (row.n, row.s, row.b) == (0, "", False)
    assert eng.sql("ADMIN CHECK TABLE inn").df.collect()[0]["STATUS"] == "OK"
    # temporal types have no representable zero-date: designed error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="declare an explicit DEFAULT"):
        eng.sql("ALTER TABLE inn ADD COLUMN ts DATETIME NOT NULL")
    # ... but with an explicit DEFAULT the fill works for temporals too
    eng.sql("ALTER TABLE inn ADD COLUMN d DATE NOT NULL DEFAULT '2020-01-02'")
    assert str(eng.sql("SELECT d FROM inn").df.collect()[0].d) == "2020-01-02"


def test_initial_default_survives_rewrite_and_reload(spark, eng):
    """The fill is pure metadata: it round-trips through catalog.json
    to a fresh session, and a full-rewrite DML (DELETE) materializes
    the filled values without changing what any read returns."""
    eng.sql("CREATE TABLE isr (a INT)")
    eng.sql("INSERT INTO isr VALUES (1), (2), (3)")
    eng.sql("ALTER TABLE isr ADD COLUMN c INT DEFAULT 7")
    eng.sql("DELETE FROM isr WHERE a = 2")  # rewrite materializes fills
    from tinysql_spark.engine import Engine

    e2 = Engine(spark, eng.catalog.warehouse)
    assert sorted((r.a, r.c) for r in e2.sql("SELECT a, c FROM isr").df.collect()) == [
        (1, 7),
        (3, 7),
    ]
    assert e2.sql("ADMIN CHECK TABLE isr").df.collect()[0]["STATUS"] == "OK"
    e2.close()


def test_insert_omitted_no_default_not_null_is_1364(eng):
    """MySQL strict mode separates the two NOT NULL failure modes:
    writing an explicit NULL is errno 1048, OMITTING a no-default NOT
    NULL column from the column list is errno 1364 ('doesn't have a
    default value') — and the latter is a static check, no scan."""
    eng.sql("CREATE TABLE nn64 (a INT, d INT NOT NULL)")
    with pytest.raises(ValueError, match="1364"):
        eng.sql("INSERT INTO nn64 (a) VALUES (1)")
    with pytest.raises(ValueError, match="1048"):
        eng.sql("INSERT INTO nn64 (a, d) VALUES (1, NULL)")
    # a declared DEFAULT or nullable column keeps omission legal
    eng.sql("ALTER TABLE nn64 ADD COLUMN e INT DEFAULT 3")
    eng.sql("INSERT INTO nn64 (a, d) VALUES (1, 2)")
    assert rows(eng.sql("SELECT a, d, e FROM nn64")) == [(1, 2, 3)]


def test_add_column_current_timestamp_fills_alter_time(eng):
    """ALTER ADD COLUMN ... DEFAULT CURRENT_TIMESTAMP fills
    pre-existing rows with the ALTER's own execution time,
    materialized once (MySQL re-evaluates per STATEMENT, never per
    read — a read-time re-evaluation would drift)."""
    import datetime

    eng.sql("CREATE TABLE cts (a INT)")
    eng.sql("INSERT INTO cts VALUES (1)")
    before = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    eng.sql("ALTER TABLE cts ADD COLUMN dt DATETIME DEFAULT CURRENT_TIMESTAMP")
    after = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    v1 = eng.sql("SELECT dt FROM cts").df.collect()[0].dt
    assert before.replace(microsecond=0) <= v1 <= after.replace(microsecond=0) + datetime.timedelta(seconds=1)
    # the fill is frozen: the same row reads the same value later
    import time

    time.sleep(1.1)
    assert eng.sql("SELECT dt FROM cts").df.collect()[0].dt == v1


# ---------------------------------------------------------------------------
# Commit-time schema validation (round-11 continuation) — the
# reference's SchemaChecker (domain/schema_checker.go:45 Check ->
# ErrInfoSchemaChanged, TiDB errno 8028): a txn spanning a schema
# change of a touched table aborts at COMMIT; data-level concurrency
# keeps the merge-on-commit contract. Closes the SURVEY §7.12 residue
# ("concurrent DDL during someone else's open txn out of contract").
# ---------------------------------------------------------------------------


def test_txn_aborts_when_concurrent_ddl_touches_its_table(spark, eng):
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE sc (a INT)")
    eng.sql("INSERT INTO sc VALUES (1)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO sc VALUES (2)")
    other = Engine(spark, eng.catalog.warehouse)
    other.sql("ALTER TABLE sc ADD COLUMN b INT DEFAULT 9")
    with pytest.raises(ValueError, match="8028"):
        eng.sql("COMMIT")
    # the txn was rolled back: the buffered row never landed, and the
    # session is usable against the NEW schema immediately
    assert rows(eng.sql("SELECT a, b FROM sc")) == [(1, 9)]
    eng.sql("BEGIN")
    eng.sql("INSERT INTO sc (a, b) VALUES (2, 2)")
    eng.sql("COMMIT")  # retry against the new schema succeeds
    assert sorted(rows(eng.sql("SELECT a, b FROM sc"))) == [(1, 9), (2, 2)]
    other.close()


def test_txn_merges_when_concurrency_is_data_only(spark, eng):
    """A concurrent plain INSERT moves the catalog stamp (allocator
    counters) but not the schema — the txn must still merge, not
    abort (the established interleaved-write contract)."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE scm (a INT)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO scm VALUES (1)")
    other = Engine(spark, eng.catalog.warehouse)
    other.sql("INSERT INTO scm VALUES (100)")
    eng.sql("COMMIT")
    assert sorted(rows(eng.sql("SELECT a FROM scm"))) == [(1,), (100,)]
    other.close()


def test_txn_aborts_when_table_dropped_mid_txn(spark, eng):
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE scd (a INT)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO scd VALUES (1)")
    other = Engine(spark, eng.catalog.warehouse)
    other.sql("DROP TABLE scd")
    with pytest.raises(ValueError, match="8028"):
        eng.sql("COMMIT")
    other.close()


def test_analyze_works_on_initial_default_table(eng):
    """A table with an initial-default fill registers as backing+view;
    ANALYZE must target the __phys backing (Spark rejects ANALYZE on a
    view) — the needs_backing() predicate keeps registration, refresh
    and ANALYZE agreeing on which tables are backed."""
    eng.sql("CREATE TABLE anb (a INT)")
    eng.sql("INSERT INTO anb VALUES (1), (2)")
    eng.sql("ALTER TABLE anb ADD COLUMN c INT DEFAULT 5")
    eng.sql("ANALYZE TABLE anb")
    st = eng.table_stats.get(("default", "anb"))
    assert st and "c" in st


def test_optimize_target_mb_validated_before_enqueue(eng):
    """Zero/negative/non-numeric optimize_target_mb must fail BEFORE
    a job is enqueued (a failure past that point would leave a
    cancelled job row for a statement that never did anything)."""
    eng.sql("CREATE TABLE otv (a INT)")
    eng.sql("INSERT INTO otv VALUES (1)")
    jobs_before = eng.sql("ADMIN SHOW DDL JOBS").df.count()
    for bad in ("'abc'", "0", "-4"):
        eng.sql(f"SET optimize_target_mb = {bad}")
        with pytest.raises(ValueError, match="positive integer"):
            eng.sql("OPTIMIZE TABLE otv")
    assert eng.sql("ADMIN SHOW DDL JOBS").df.count() == jobs_before
    eng.sql("SET optimize_target_mb = 128")
    assert "optimized" in eng.sql("OPTIMIZE TABLE otv").message


def test_racing_replace_txns_one_winner_one_9007(spark, eng):
    """Write-write conflict at COMMIT (reference: store/tikv/2pc.go:67
    prewrite -> WriteConflict, TiDB errno 9007): two transactions
    REPLACE the same existing PK; the first commit wins, the second
    aborts instead of silently merging last-publisher-wins."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE wc (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO wc VALUES (1, 0)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("REPLACE INTO wc VALUES (1, 111)")
    other.sql("BEGIN")
    other.sql("REPLACE INTO wc VALUES (1, 222)")
    other.sql("COMMIT")  # first committer wins
    with pytest.raises(ValueError, match="9007"):
        eng.sql("COMMIT")
    eng.reload()
    assert rows(eng.sql("SELECT k, v FROM wc")) == [(1, 222)]
    # the aborted session is clean and can retry
    eng.sql("BEGIN")
    eng.sql("REPLACE INTO wc VALUES (1, 111)")
    eng.sql("COMMIT")
    assert rows(eng.sql("SELECT k, v FROM wc")) == [(1, 111)]
    other.close()


def test_racing_delete_txns_second_gets_9007(spark, eng):
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE wd (k INT)")
    eng.sql("INSERT INTO wd VALUES (1), (2)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("DELETE FROM wd WHERE k = 1")
    other.sql("DELETE FROM wd WHERE k = 1")  # autocommit, lands first
    with pytest.raises(ValueError, match="9007"):
        eng.sql("COMMIT")
    eng.reload()
    assert rows(eng.sql("SELECT k FROM wd")) == [(2,)]
    other.close()


def test_txn_delete_of_own_insert_is_not_a_conflict(spark, eng):
    """Rows inserted then deleted inside the txn never existed on
    disk; their absence from the committed table must not read as a
    write conflict even when a concurrent commit moved the stamp."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE wo2 (k INT)")
    eng.sql("INSERT INTO wo2 VALUES (1)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO wo2 VALUES (5)")
    eng.sql("DELETE FROM wo2 WHERE k = 5")
    other.sql("INSERT INTO wo2 VALUES (9)")  # moves the stamp
    eng.sql("COMMIT")
    assert rows(eng.sql("SELECT k FROM wo2")) == [(1,), (9,)]
    other.close()


def test_in_txn_insert_does_not_clobber_concurrent_ddl(spark, eng):
    """An open txn's session catalog is intentionally stale; its
    statement-time allocator persists must MERGE into the on-disk
    catalog, never write the stale snapshot back whole — the old
    whole-catalog update() erased a concurrent session's CREATE TABLE
    from catalog.json (round-12 probe: t2 vanished)."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE cl1 (k INT)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO cl1 VALUES (1)")
    other = Engine(spark, eng.catalog.warehouse)
    other.sql("CREATE TABLE cl2 (x INT)")
    other.sql("INSERT INTO cl2 VALUES (9)")
    eng.sql("INSERT INTO cl1 VALUES (2)")  # in-txn allocator publish
    eng.sql("ROLLBACK")
    assert rows(eng.sql("SELECT x FROM cl2")) == [(9,)], "cl2 must survive"
    assert rows(other.sql("SELECT x FROM cl2")) == [(9,)]
    other.close()


def test_concurrent_txn_inserts_get_disjoint_rowids(spark, eng):
    """Rowid allocation is GLOBAL and non-transactional (reference:
    meta/autoid): two open txns inserting concurrently must draw
    disjoint rowids — snapshot isolation does not extend to the
    allocator, or the uniqueness invariant behind COW anti-joins and
    ADMIN CHECK breaks."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE al (k INT)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO al VALUES (1)")
    other.sql("BEGIN")
    other.sql("INSERT INTO al VALUES (2)")  # must NOT reuse eng's rowid
    other.sql("COMMIT")
    eng.sql("COMMIT")
    assert rows(eng.sql("SELECT k FROM al")) == [(1,), (2,)]
    ids = [r[0] for r in eng._raw("default", "al").select("_rowid").collect()]
    assert len(ids) == len(set(ids)), f"duplicate rowids: {ids}"
    assert eng.sql("ADMIN CHECK TABLE al").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_racing_fresh_pk_insert_txns_one_winner_one_1062(spark, eng):
    """Two txns INSERT the same brand-new PK value: both pass the
    statement-time snapshot check; the commit-time unique revalidation
    (prewrite ErrKeyExists, surfaced as 1062) aborts the later one."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE fp (k INT PRIMARY KEY, v INT)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO fp VALUES (7, 10)")
    other.sql("BEGIN")
    other.sql("INSERT INTO fp VALUES (7, 20)")
    other.sql("COMMIT")
    with pytest.raises(ValueError, match="1062"):
        eng.sql("COMMIT")
    eng.reload()
    assert rows(eng.sql("SELECT k, v FROM fp")) == [(7, 20)]
    assert eng.sql("ADMIN CHECK TABLE fp").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_replace_txn_does_not_self_conflict_at_commit(spark, eng):
    """A txn that REPLACEs an existing key deletes the old row and
    adds the new one; the commit-time unique recheck must net out its
    own deletes (otherwise every in-txn REPLACE would 1062 against
    the very row it replaces) even when an unrelated concurrent
    commit moved the stamp."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE rs (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO rs VALUES (1, 10)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("REPLACE INTO rs VALUES (1, 11)")
    other.sql("INSERT INTO rs VALUES (2, 20)")  # moves the stamp
    eng.sql("COMMIT")
    assert rows(eng.sql("SELECT k, v FROM rs")) == [(1, 11), (2, 20)]
    other.close()


def test_racing_fresh_pk_reverse_commit_order_still_one_winner(spark, eng):
    """Same fresh-PK race, commits in ALLOCATION order this time: the
    commit-time gate must key on files COMMITTED since the statement
    check, not on allocator positions — allocation order and commit
    order are independent, and a gate confusing them lets the second
    committer merge a duplicate."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE fp2 (k INT PRIMARY KEY, v INT)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO fp2 VALUES (7, 10)")  # allocates first
    other.sql("BEGIN")
    other.sql("INSERT INTO fp2 VALUES (7, 20)")  # allocates second
    eng.sql("COMMIT")  # commits first -> wins
    with pytest.raises(ValueError, match="1062"):
        other.sql("COMMIT")
    assert rows(eng.sql("SELECT k, v FROM fp2")) == [(7, 10)]
    other.close()


def test_later_txn_statement_does_not_mask_earlier_dup(spark, eng):
    """The commit-time gate stamp is pinned at the txn's FIRST add
    (ADVICE r12): advancing it on every statement let this sequence
    publish a duplicate — txn inserts K; another session commits K;
    txn inserts L (that statement's check validates only L's batch,
    but used to advance the stamp PAST the conflicting file); COMMIT
    saw no new files and skipped the rescan."""
    from tinysql_spark.engine import Engine

    eng.sql("CREATE TABLE mk (k INT PRIMARY KEY, v INT)")
    other = Engine(spark, eng.catalog.warehouse)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO mk VALUES (7, 10)")  # K buffered
    other.sql("INSERT INTO mk VALUES (7, 99)")  # K committed concurrently
    eng.sql("INSERT INTO mk VALUES (8, 20)")  # L: own check passes
    with pytest.raises(ValueError, match="1062"):
        eng.sql("COMMIT")
    eng.reload()
    assert rows(eng.sql("SELECT k, v FROM mk")) == [(7, 99)]
    assert eng.sql("ADMIN CHECK TABLE mk").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_commit_race_fuzz_three_sessions(spark, eng):
    """Seeded 3-session commit races on one PK table: any mix of
    txn-INSERT/REPLACE on overlapping fresh and existing keys must
    end with exactly one row per key (the committed winners), every
    loser aborted with the conflict family (1062/9007), and a clean
    ADMIN CHECK — the pairwise commit-time checks compose because the
    flock serializes every publish."""
    import random as _random

    from tinysql_spark.engine import Engine

    wh = eng.catalog.warehouse
    sessions = [eng, Engine(spark, wh), Engine(spark, wh)]
    try:
        for seed in range(6):
            rng = _random.Random(seed * 7349 + 11)
            tbl = f"rc{seed}"
            eng.sql(f"CREATE TABLE {tbl} (k INT PRIMARY KEY, v INT)")
            eng.sql(f"INSERT INTO {tbl} VALUES (1, 0), (2, 0)")
            for s in sessions:
                s.reload()
            keypool = [1, 2, 7, 8]  # existing + fresh, deliberately overlapping
            stmts = []
            for s in sessions:
                k = rng.choice(keypool)
                v = rng.randrange(100, 999)
                form = rng.choice(["REPLACE", "INSERT"])
                stmts.append((s, form, k, v))
                s.sql("BEGIN")
                try:
                    s.sql(f"{form} INTO {tbl} VALUES ({k}, {v})")
                except ValueError as e:
                    # INSERT of an existing key fails at statement
                    # time (snapshot 1062) — roll that session back
                    assert "1062" in str(e)
                    s.sql("ROLLBACK")
                    stmts.pop()
            outcomes = []
            order = list(range(len(stmts)))
            rng.shuffle(order)  # commit order independent of alloc order
            for i in order:
                s, form, k, v = stmts[i]
                try:
                    s.sql("COMMIT")
                    outcomes.append(("ok", form, k, v))
                except ValueError as e:
                    msg = str(e)
                    assert "1062" in msg or "9007" in msg, (seed, msg)
                    outcomes.append(("abort", form, k, v))
            for s in sessions:
                s.reload()
            got = {r.k: r.v for r in eng.sql(f"SELECT k, v FROM {tbl}").df.collect()}
            assert len(got) == len(
                set(r.k for r in eng.sql(f"SELECT k FROM {tbl}").df.collect())
            ), f"seed {seed}: duplicate PK rows: {got}"
            # every key seen exactly once; each key's value is either 0
            # (untouched) or some winner's value
            winner_vals = {v for (st, f, k, v) in outcomes if st == "ok"}
            for k, v in got.items():
                assert v == 0 or v in winner_vals, (seed, k, v, outcomes)
            chk = eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()
            assert chk[0]["STATUS"] == "OK", (seed, chk)
    finally:
        for s in sessions[1:]:
            s.close()


def test_commit_race_fuzz_mixed_delete_multi_table(spark, eng):
    """VERDICT r12 next #4 — NEW seeded corpus (existing seeds above
    untouched, house rule): 3-session commit races where sessions also
    DELETE the contended keys and touch a SECOND table inside the same
    transaction (multi-table publish order x conflict family). Pinned
    invariants: PK uniqueness on the contended table, every losing
    COMMIT aborts with the conflict family (1062/9007), ADMIN CHECK on
    both tables, and MULTI-TABLE ATOMICITY — a loser's insert into the
    second table must vanish with its rollback, a winner's must land."""
    import random as _random

    from tinysql_spark.engine import Engine

    wh = eng.catalog.warehouse
    sessions = [eng, Engine(spark, wh), Engine(spark, wh)]
    try:
        for seed in range(8):
            rng = _random.Random(seed * 9173 + 5)
            t1, t2 = f"md{seed}", f"md{seed}b"
            eng.sql(f"CREATE TABLE {t1} (k INT PRIMARY KEY, v INT)")
            eng.sql(f"INSERT INTO {t1} VALUES (1, 0), (2, 0), (3, 0)")
            eng.sql(f"CREATE TABLE {t2} (k INT PRIMARY KEY, v INT)")
            for s in sessions:
                s.reload()
            plans = []
            for si, s in enumerate(sessions):
                s.sql("BEGIN")
                ops, ok = [], True
                for _ in range(rng.choice([1, 2])):
                    k = rng.choice([1, 2, 3, 9])
                    act = rng.choice(["INSERT", "REPLACE", "DELETE"])
                    try:
                        if act == "DELETE":
                            s.sql(f"DELETE FROM {t1} WHERE k = {k}")
                            ops.append(("D", k, None))
                        else:
                            v = rng.randrange(100, 999)
                            s.sql(f"{act} INTO {t1} VALUES ({k}, {v})")
                            ops.append((act[0], k, v))
                    except ValueError as e:
                        # statement-time snapshot 1062 (INSERT of an
                        # existing key) rolls the whole session back
                        assert "1062" in str(e), (seed, si, str(e))
                        s.sql("ROLLBACK")
                        ok = False
                        break
                if ok and rng.random() < 0.7:
                    s.sql(f"INSERT INTO {t2} VALUES ({100 + si}, {si})")
                    ops.append(("T2", 100 + si, si))
                if ok:
                    plans.append((si, s, ops))
            outcomes = {}
            order = list(range(len(plans)))
            rng.shuffle(order)  # commit order independent of alloc order
            for i in order:
                si, s, ops = plans[i]
                try:
                    s.sql("COMMIT")
                    outcomes[si] = ("ok", ops)
                except ValueError as e:
                    msg = str(e)
                    assert "1062" in msg or "9007" in msg, (seed, si, msg)
                    outcomes[si] = ("abort", ops)
            for s in sessions:
                s.reload()
            rows1 = eng.sql(f"SELECT k, v FROM {t1}").df.collect()
            ks = [r.k for r in rows1]
            assert len(ks) == len(set(ks)), f"seed {seed}: dup PKs {sorted(ks)}"
            winner_vals = {
                v
                for st, ops in outcomes.values()
                if st == "ok"
                for (a, k, v) in ops
                if a in ("I", "R")
            }
            for r in rows1:
                assert r.v == 0 or r.v in winner_vals, (seed, r, outcomes)
            # multi-table atomicity: t2 holds EXACTLY the winners' rows
            want_t2 = {
                (k, v)
                for st, ops in outcomes.values()
                if st == "ok"
                for (a, k, v) in ops
                if a == "T2"
            }
            got_t2 = {(r.k, r.v) for r in eng.sql(f"SELECT k, v FROM {t2}").df.collect()}
            assert got_t2 == want_t2, (seed, got_t2, want_t2, outcomes)
            for t in (t1, t2):
                chk = eng.sql(f"ADMIN CHECK TABLE {t}").df.collect()
                assert chk[0]["STATUS"] == "OK", (seed, t, chk)
    finally:
        for s in sessions[1:]:
            s.close()


def test_ddl_vs_txn_race_fuzz(spark, eng):
    """Round 14 (VERDICT r13 next #5): the online-DDL kernel racing
    OPEN multi-statement transactions that COMMIT mid-job. Pinned
    outcome per (op, phase) — explored and frozen:

    - CREATE INDEX at any job phase: the mid-chain index is already
      in the schema signature (delete-only state lands in the catalog
      before the backfill), so the commit ABORTS with the 8028 family
      and the transaction's rows vanish atomically;
    - OPTIMIZE (staged or done): schema identity is untouched, the
      commit SUCCEEDS and the reorg publish catches the transaction's
      freshly committed files up into the swap;
    - MODIFY COLUMN before publish: commit SUCCEEDS and the publish
      catch-up re-casts the transaction's rows to the new type;
      after publish: 8028 abort (the type changed under the txn).

    Every seed ends with ADMIN CHECK OK (and CHECK INDEX OK where an
    index was built) and the job synced."""
    import random as _random

    from tinysql_spark.engine import Engine

    wh = eng.catalog.warehouse
    other = Engine(spark, wh)
    cases = [
        ("create_index", "create_index:backfill done", "abort"),
        ("create_index", "create_index:public", "abort"),
        ("optimize", "optimize:staged", "ok"),
        ("optimize", "optimize:done", "ok"),
        ("modify", "modify_column:backfill done", "ok"),
        ("modify", "modify_column:published", "abort"),
        ("optimize", "optimize:staged", "ok"),  # rng-varied DML twin
        ("modify", "modify_column:backfill done", "ok"),
    ]
    try:
        for seed, (op, ph, expect) in enumerate(cases):
            rng = _random.Random(seed * 6151 + 29)
            tbl = f"dx{seed}"
            eng.sql(f"CREATE TABLE {tbl} (k INT PRIMARY KEY, v INT)")
            vals = ", ".join(f"({k}, {k * 3})" for k in range(1, 41))
            eng.sql(f"INSERT INTO {tbl} VALUES {vals}")
            other.reload()
            other.sql("BEGIN")
            f1, f2 = rng.sample(range(100, 140), 2)
            other.sql(f"INSERT INTO {tbl} VALUES ({f1}, 1), ({f2}, 2)")
            doomed = replaced = None
            roll = rng.random()
            if roll < 0.4:
                doomed = rng.randrange(1, 41)
                other.sql(f"DELETE FROM {tbl} WHERE k = {doomed}")
            elif roll < 0.7:
                replaced = rng.randrange(1, 41)
                other.sql(f"REPLACE INTO {tbl} VALUES ({replaced}, 999)")
            out = {}

            def hook(phase, job, _o=other, _out=out, _p=ph):
                if phase == _p and not _out:
                    try:
                        _o.sql("COMMIT")
                        _out["status"] = "ok"
                    except ValueError as e:
                        _out["status"] = "abort"
                        _out["err"] = str(e)

            ddl = {
                "create_index": f"CREATE INDEX dxi{seed} ON {tbl} (v)",
                "optimize": f"OPTIMIZE TABLE {tbl}",
                "modify": f"ALTER TABLE {tbl} MODIFY v BIGINT",
            }[op]
            eng.ddl_phase_hook = hook
            try:
                eng.sql(ddl)
            finally:
                eng.ddl_phase_hook = None
            assert out, f"seed {seed}: the mid-job COMMIT never fired"
            assert out["status"] == expect, (seed, op, ph, out)
            eng.reload()
            got = {r.k: r.v for r in eng.sql(f"SELECT k, v FROM {tbl}").df.collect()}
            if expect == "ok":
                # publish catch-up landed the txn's files (and, for
                # MODIFY, re-cast them): rows visible post-DDL
                assert got.get(f1) == 1 and got.get(f2) == 2, (seed, op)
                if doomed is not None:
                    assert doomed not in got, (seed, op)
                if replaced is not None:
                    assert got.get(replaced) == 999, (seed, op)
            else:
                assert "8028" in out["err"], (seed, out)
                # multi-statement atomicity: NOTHING of the txn landed
                assert f1 not in got and f2 not in got, (seed, op)
                if doomed is not None:
                    assert doomed in got, (seed, op)
                if replaced is not None:
                    assert got.get(replaced) == replaced * 3, (seed, op)
            if op == "modify":
                typ = dict(eng.sql(f"SELECT k, v FROM {tbl}").df.dtypes)["v"]
                assert typ == "bigint", (seed, typ)
            if op == "create_index":
                chk = eng.sql(f"ADMIN CHECK INDEX {tbl} dxi{seed}").df.collect()
                assert chk[0]["STATUS"] == "OK", (seed, chk)
            chk = eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()
            assert chk[0]["STATUS"] == "OK", (seed, chk)
            jobs = [j for j in eng.ddl_log.load() if j["target"] == tbl]
            assert jobs and jobs[-1]["status"] == "synced", (seed, jobs[-1])
    finally:
        other.close()
