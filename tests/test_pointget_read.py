"""Manifest-backed point-get on the READ path (round 14).

The reference turns an equality predicate on a unique key into a key
SEEK instead of a scan (planner/core/physical_plans.go:319
IsPointGetByUniqueKey; util/ranger/points.go builds the ranges). The
parquet analog: a flat single-table SELECT whose WHERE carries a
depth-0 conjunct ``col = literal`` / ``col IN (literals)`` executes
over the EXPLICIT file set whose durable-manifest min/max overlaps the
literals — on a sorted/z-ordered 100k-file table a point SELECT
schedules O(overlapping files) read tasks instead of one per file.

Two-source discipline (house rule): the engine's probe_log
kind="read" rows are pinned against the independent pyarrow footer
overlap count, and results are pinned against the UNPRUNED answer.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tinysql_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "warehouse"))
    yield e
    e.close()


def _ranged(eng, name, n_files=6, per=100):
    eng.sql(f"CREATE TABLE {name} (k INT PRIMARY KEY, v INT, s VARCHAR(16))")
    for i in range(n_files):
        lo = i * per + 1
        vals = ", ".join(f"({k}, {k % 7}, 's{k}')" for k in range(lo, lo + per))
        eng.sql(f"INSERT INTO {name} VALUES {vals}")


def _overlap(eng, t, col, values, db="default"):
    """Independent witness: files whose footer [min,max] of ``col``
    covers ANY value (no-stats files count; zero-row-group files are
    rowless and never count)."""
    data = eng.catalog.data_dir(db, t)
    hits = 0
    for rel in eng._list_data_files(db, t):
        md = pq.ParquetFile(os.path.join(data, rel)).metadata
        if md.num_row_groups == 0:
            continue
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        if mn is None or any(mn <= v <= mx for v in values):
            hits += 1
    return hits


def _reads(eng, t):
    return [
        p for p in eng.probe_log
        if p.get("kind") == "read" and p["table"].endswith(t)
    ]


def test_point_select_reads_only_overlapping_files(eng):
    _ranged(eng, "pr", n_files=6)
    expect = _overlap(eng, "pr", "k", [250])
    assert expect < 6  # the layout really ranges k
    eng.probe_log.clear()
    rows = eng.sql("SELECT k, v, s FROM pr WHERE k = 250").df.collect()
    assert [(r.k, r.s) for r in rows] == [(250, "s250")]
    reads = _reads(eng, "pr")
    assert reads and reads[0]["files_read"] == expect, (reads, expect)
    assert reads[0]["files_given"] > expect


def test_in_list_and_string_col_prune(eng):
    _ranged(eng, "pi", n_files=6)
    eng.probe_log.clear()
    got = eng.sql("SELECT count(*) AS c FROM pi WHERE k IN (1, 250, 599)")
    assert got.df.collect()[0]["c"] == 3
    reads = _reads(eng, "pi")
    assert reads and reads[0]["files_read"] == _overlap(
        eng, "pi", "k", [1, 250, 599]
    )
    # string column: parquet string stats prune the same way
    eng.probe_log.clear()
    rows = eng.sql("SELECT k FROM pi WHERE s = 's123'").df.collect()
    assert [r.k for r in rows] == [123]
    reads = _reads(eng, "pi")
    assert reads and reads[0]["files_read"] <= reads[0]["files_given"]


def test_pruned_result_matches_unpruned(eng):
    """Every supported statement shape answers identically with and
    without the prune (the unpruned twin rephrases the predicate so
    the conjunct matcher cannot fire)."""
    _ranged(eng, "pm", n_files=5)
    shapes = [
        (
            "SELECT v, count(*) AS c FROM pm WHERE k IN (3, 103, 203) "
            "GROUP BY v ORDER BY v",
            "SELECT v, count(*) AS c FROM pm WHERE k + 0 IN (3, 103, 203) "
            "GROUP BY v ORDER BY v",
        ),
        (
            "SELECT t.s FROM pm t WHERE t.k = 77 AND t.v >= 0",
            "SELECT t.s FROM pm t WHERE t.k + 0 = 77 AND t.v + 0 >= 0",
        ),
        (
            "SELECT k FROM pm WHERE 250 = k ORDER BY k LIMIT 3",
            "SELECT k FROM pm WHERE 250 = k + 0 ORDER BY k LIMIT 3",
        ),
    ]
    for pruned_sql, plain_sql in shapes:
        eng.probe_log.clear()
        a = [tuple(r) for r in eng.sql(pruned_sql).df.collect()]
        assert _reads(eng, "pm"), pruned_sql  # the prune really fired
        eng.probe_log.clear()
        b = [tuple(r) for r in eng.sql(plain_sql).df.collect()]
        assert not _reads(eng, "pm"), plain_sql
        assert a == b, pruned_sql


def test_or_and_unmatched_conjuncts_never_misprune(eng):
    _ranged(eng, "po", n_files=6)
    # OR at depth 0: the conjunct is the whole disjunction — no match,
    # no prune, full answer
    eng.probe_log.clear()
    n = eng.sql(
        "SELECT count(*) AS c FROM po WHERE k = 5 OR v = 3"
    ).df.collect()[0]["c"]
    assert not _reads(eng, "po")
    plain = eng.sql(
        "SELECT count(*) AS c FROM po WHERE k + 0 = 5 OR v = 3"
    ).df.collect()[0]["c"]
    assert n == plain
    # a second non-point conjunct rides along inside the pruned scan
    rows = eng.sql(
        "SELECT k FROM po WHERE k IN (250, 251, 252) AND v <> 250 % 7"
    ).df.collect()
    assert sorted(r.k for r in rows) == [251, 252]


def test_txn_prune_rebuilds_the_overlay(eng):
    """In a transaction the prune rebuilds the UnionScan overlay over
    the pruned committed branch: buffered adds stay visible, buffered
    deletes stay invisible (read-your-writes), and ROLLBACK erases
    both — while the committed branch still reads O(overlap) files.
    Top-k refuses buffered tables (deleted rows would break the
    cumulative row-count bound)."""
    _ranged(eng, "pt", n_files=4)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO pt VALUES (9999, 1, 'x')")
    eng.sql("DELETE FROM pt WHERE k = 250")
    eng.probe_log.clear()
    rows = eng.sql("SELECT k FROM pt WHERE k = 9999").df.collect()
    assert [r.k for r in rows] == [9999]  # buffered add visible
    reads = _reads(eng, "pt")
    assert reads and reads[0]["files_read"] < reads[0]["files_given"]
    eng.probe_log.clear()
    assert eng.sql("SELECT k FROM pt WHERE k = 250").df.collect() == []
    assert _reads(eng, "pt")  # pruned AND the buffered delete held
    # the committed row k=17 still reads through the pruned overlay
    assert [
        r.k for r in eng.sql("SELECT k FROM pt WHERE k = 17").df.collect()
    ] == [17]
    # top-k refuses the buffered table
    eng.probe_log.clear()
    eng.sql("SELECT k FROM pt ORDER BY k LIMIT 2").df.collect()
    assert not _reads(eng, "pt")
    eng.sql("ROLLBACK")
    rows = eng.sql("SELECT k FROM pt WHERE k = 9999").df.collect()
    assert rows == []
    assert [
        r.k for r in eng.sql("SELECT k FROM pt WHERE k = 250").df.collect()
    ] == [250]
    # un-buffered tables in a txn still prune top-k
    eng.sql("BEGIN")
    eng.probe_log.clear()
    rows = eng.sql("SELECT k FROM pt ORDER BY k LIMIT 2").df.collect()
    assert [r.k for r in rows] == [1, 2] and _reads(eng, "pt")
    eng.sql("ROLLBACK")


def test_initial_default_column_never_prunes(eng):
    """An ALTER-added column with a DEFAULT stores NULL physically for
    pre-ALTER rows while reading the default LOGICALLY — min/max
    pruning on it would wrongly exclude those rows, so the column is
    ineligible; other columns in the same statement still prune."""
    _ranged(eng, "pd", n_files=4)
    eng.sql("ALTER TABLE pd ADD COLUMN tag INT DEFAULT 5")
    eng.sql("INSERT INTO pd VALUES (9001, 0, 'n', 7)")
    eng.probe_log.clear()
    n = eng.sql("SELECT count(*) AS c FROM pd WHERE tag = 5").df.collect()[0]["c"]
    assert n == 400  # every pre-ALTER row reads the default
    assert not _reads(eng, "pd")
    # combined: k prunes, tag rides as a plain filter
    rows = eng.sql("SELECT k FROM pd WHERE k = 250 AND tag = 5").df.collect()
    assert [r.k for r in rows] == [250]
    reads = _reads(eng, "pd")
    assert reads and reads[0]["key"] == ("k",)


def test_strnum_semantics_survive_the_prune(eng):
    """The spliced statement's FROM names a temp view the int-column
    resolver cannot type — the resolver must run on the ORIGINAL text
    so string-vs-int compares keep the REAL-compare rewrite."""
    _ranged(eng, "ps", n_files=4)
    eng.probe_log.clear()
    row = eng.sql(
        "SELECT (v = '3.5') AS a, (v > '2.5') AS b FROM ps WHERE k = 250"
    ).df.collect()[0]
    assert _reads(eng, "ps")
    assert row["a"] is False  # REAL compare: 3 = 3.5 is FALSE
    assert row["b"] is True   # 3 > 2.5 TRUE (truncating compare would differ)


def test_admin_show_probes_lists_read_rows(eng):
    _ranged(eng, "pa", n_files=4)
    eng.sql("SELECT k FROM pa WHERE k = 17").df.collect()
    rows = eng.sql("ADMIN SHOW PROBES pa").df.collect()
    kinds = {r["KIND"] for r in rows}
    assert "read" in kinds and "write" in kinds
    rd = [r for r in rows if r["KIND"] == "read"][-1]
    assert rd["KEY"] == "k" and rd["LITERAL"]
    assert rd["FILES_READ"] <= rd["FILES_GIVEN"]


def test_cold_session_point_select_prunes_from_manifest(spark, tmp_path):
    """The read path inherits the durable manifest: a FRESH session's
    first point SELECT prunes without opening data-file footers."""
    wh = str(tmp_path / "warehouse")
    e1 = Engine(spark, wh)
    try:
        _ranged(e1, "pc", n_files=5)
    finally:
        e1.close()
    e2 = Engine(spark, wh)
    try:
        spy_paths = []
        real = pq.ParquetFile

        class Spy:
            def __new__(cls, path, *a, **kw):
                spy_paths.append(str(path))
                return real(path, *a, **kw)

        import pyarrow.parquet as _pq

        _pq.ParquetFile, orig = Spy, _pq.ParquetFile
        try:
            rows = e2.sql("SELECT k FROM pc WHERE k = 250").df.collect()
        finally:
            _pq.ParquetFile = orig
        assert [r.k for r in rows] == [250]
        reads = _reads(e2, "pc")
        assert reads and reads[0]["files_read"] < reads[0]["files_given"]
        assert not [p for p in spy_paths if "part-" in p]  # zero footer opens
    finally:
        e2.close()


def _overlap_iv(eng, t, col, lo, hi, db="default"):
    """Independent witness for interval probes: files whose footer
    [min,max] intersects [lo, hi] inclusively (None = unbounded)."""
    data = eng.catalog.data_dir(db, t)
    hits = 0
    for rel in eng._list_data_files(db, t):
        md = pq.ParquetFile(os.path.join(data, rel)).metadata
        if md.num_row_groups == 0:
            continue
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        if mn is None or ((lo is None or mx >= lo) and (hi is None or mn <= hi)):
            hits += 1
    return hits


def test_range_predicates_prune(eng):
    """</<=/>/>=/BETWEEN prune via inclusive interval overlap — the
    ranger analog (util/ranger/points.go builds the same ranges for
    the reference's index scan)."""
    _ranged(eng, "rr", n_files=6)
    cases = [
        ("k >= 550", "k + 0 >= 550", _overlap_iv(eng, "rr", "k", 550, None)),
        ("k < 99", "k + 0 < 99", _overlap_iv(eng, "rr", "k", None, 99)),
        ("250 <= k", "250 <= k + 0", _overlap_iv(eng, "rr", "k", 250, None)),
        (
            "k BETWEEN 150 AND 250",
            "k + 0 BETWEEN 150 AND 250",
            _overlap_iv(eng, "rr", "k", 150, 250),
        ),
    ]
    for cond, twin, expect in cases:
        eng.probe_log.clear()
        a = eng.sql(f"SELECT count(*) AS c FROM rr WHERE {cond}").df.collect()
        reads = _reads(eng, "rr")
        assert reads and reads[0]["files_read"] == expect, (cond, reads, expect)
        b = eng.sql(f"SELECT count(*) AS c FROM rr WHERE {twin}").df.collect()
        assert a == b, cond


def test_between_and_never_breaks_conjunct_split(eng):
    """The AND inside BETWEEN belongs to the BETWEEN: a following
    point conjunct still prunes, and the answer matches the
    unpruned twin."""
    _ranged(eng, "rb", n_files=5)
    eng.probe_log.clear()
    a = eng.sql(
        "SELECT k FROM rb WHERE v BETWEEN 0 AND 6 AND k = 250"
    ).df.collect()
    reads = _reads(eng, "rb")
    assert reads and reads[0]["files_read"] < reads[0]["files_given"]
    assert set(reads[0]["key"]) == {"v", "k"}
    b = eng.sql(
        "SELECT k FROM rb WHERE v BETWEEN 0 AND 6 AND k + 0 = 250"
    ).df.collect()
    assert a == b and [r.k for r in a] == [250]


def test_topk_order_by_pk_limit_prunes(eng):
    """WHERE-less ORDER BY pk LIMIT n takes the top-k file prune —
    files by ascending min until cumulative rows cover the LIMIT
    bound the k-th value (the file-level analog of coprocessor TopN
    pushdown). Two-source: files_read pinned against an independent
    footer computation; result pinned against the defused twin."""
    _ranged(eng, "tka", n_files=6)

    def independent_topk(n, desc=False):
        data = eng.catalog.data_dir("default", "tka")
        cand = []
        for rel in eng._list_data_files("default", "tka"):
            md = pq.ParquetFile(os.path.join(data, rel)).metadata
            if md.num_row_groups == 0:
                continue
            mn = mx = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == "k" and c.statistics is not None:
                        s = c.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            cand.append((mn, mx, md.num_rows))
        cand.sort(key=(lambda c: c[1]) if desc else (lambda c: c[0]),
                  reverse=desc)
        cum, cut = 0, None
        for mn, mx, rows in cand:
            b = mn if desc else mx
            cut = b if cut is None else (min(cut, b) if desc else max(cut, b))
            cum += rows
            if cum >= n:
                break
        if desc:
            return sum(1 for mn, mx, _ in cand if mx >= cut)
        return sum(1 for mn, mx, _ in cand if mn <= cut)

    for sql, twin, n, desc in [
        ("SELECT k FROM tka ORDER BY k LIMIT 5",
         "SELECT k FROM tka ORDER BY k + 0 LIMIT 5", 5, False),
        ("SELECT k, v FROM tka ORDER BY k DESC LIMIT 3",
         "SELECT k, v FROM tka ORDER BY k + 0 DESC LIMIT 3", 3, True),
        ("SELECT k FROM tka ORDER BY k LIMIT 4 OFFSET 120",
         "SELECT k FROM tka ORDER BY k + 0 LIMIT 4 OFFSET 120", 124, False),
    ]:
        eng.probe_log.clear()
        a = [tuple(r) for r in eng.sql(sql).df.collect()]
        reads = _reads(eng, "tka")
        expect = independent_topk(n, desc)
        assert reads and reads[0]["files_read"] == expect, (sql, reads, expect)
        assert reads[0]["files_read"] < reads[0]["files_given"], sql
        b = [tuple(r) for r in eng.sql(twin).df.collect()]
        assert a == b, sql


def test_topk_refusal_corners(eng):
    """No prune when the bound cannot be trusted: non-PK sort column
    (could hold NULLs the stats cannot see — Spark sorts them
    FIRST), DISTINCT/aggregate select lists (LIMIT counts
    post-reduction rows), LIMIT exceeding the table, GROUP BY."""
    _ranged(eng, "tkr", n_files=4)
    for sql in [
        "SELECT k FROM tkr ORDER BY v LIMIT 2",
        "SELECT DISTINCT v FROM tkr ORDER BY v LIMIT 2",
        "SELECT max(k) AS m FROM tkr",
        "SELECT k FROM tkr ORDER BY k LIMIT 99999",
        "SELECT v, count(*) AS c FROM tkr GROUP BY v ORDER BY v LIMIT 2",
    ]:
        eng.probe_log.clear()
        eng.sql(sql).df.collect()
        assert not _reads(eng, "tkr"), sql


def test_topk_sees_fresh_writes(eng):
    """A committed write lands in the manifest at publish; the next
    top-k answers with the new row — no staleness window."""
    _ranged(eng, "tkf", n_files=3)
    eng.sql("INSERT INTO tkf VALUES (-7, 0, 'neg')")
    rows = eng.sql("SELECT k FROM tkf ORDER BY k LIMIT 2").df.collect()
    assert [r.k for r in rows] == [-7, 1]


def test_delete_doomed_scan_prunes(eng):
    """The DELETE doomed-row pass file-prunes on the condition's
    point/range conjuncts (kind="delete" probe rows): a point DELETE
    scans O(overlap) files, a miss DELETE scans ZERO files, and the
    survivors are byte-identical to an unpruned twin table driven
    through the same statements."""
    _ranged(eng, "dp", n_files=6)
    eng.sql(
        "CREATE TABLE dp2 (k INT PRIMARY KEY, v INT, s VARCHAR(16))"
    )
    eng.sql("INSERT INTO dp2 SELECT k, v, s FROM dp")

    def dels(t):
        out = [
            p for p in eng.probe_log
            if p.get("kind") == "delete" and p["table"].endswith(t)
        ]
        eng.probe_log.clear()
        return out

    eng.probe_log.clear()
    r = eng.sql("DELETE FROM dp WHERE k = 250")
    p = dels("dp")
    assert r.rows_affected == 1
    assert p and p[0]["files_read"] == _overlap(eng, "dp", "k", [250])
    # twin table: defused condition scans everything, same survivors
    r2 = eng.sql("DELETE FROM dp2 WHERE k + 0 = 250")
    assert not dels("dp2") and r2.rows_affected == 1
    # miss: zero files scanned, no write
    r = eng.sql("DELETE FROM dp WHERE k = 987654")
    p = dels("dp")
    assert r.rows_affected == 0 and p and p[0]["files_read"] == 0
    # range + rider
    r = eng.sql("DELETE FROM dp WHERE k BETWEEN 100 AND 130 AND v <> 999")
    p = dels("dp")
    assert p and p[0]["files_read"] < p[0]["files_given"]
    eng.sql("DELETE FROM dp2 WHERE k + 0 BETWEEN 100 AND 130 AND v <> 999")
    a = [tuple(r) for r in
         eng.sql("SELECT k, v, s FROM dp ORDER BY k").df.collect()]
    b = [tuple(r) for r in
         eng.sql("SELECT k, v, s FROM dp2 ORDER BY k").df.collect()]
    assert a == b and len(a) == 600 - 1 - 31
    assert eng.sql("ADMIN CHECK TABLE dp").df.collect()[0]["STATUS"] == "OK"


def test_explain_renders_point_get_header(eng):
    """EXPLAIN on a qualifying SELECT leads with a Point_Get /
    TopN_FileSkip header reporting the file prune the execution would
    take (reference: a qualifying plan renders as Point_Get_N,
    executor/explain.go) — with zero side effects: no probe_log rows,
    no temp views."""
    _ranged(eng, "eh", n_files=4)
    eng.probe_log.clear()
    txt = eng.sql("EXPLAIN SELECT k FROM eh WHERE k = 250").df.collect()[0][0]
    assert txt.splitlines()[0].startswith("Point_Get (key: k, files: ")
    assert "== Physical Plan ==" in txt  # the Spark plan follows
    txt = eng.sql(
        "EXPLAIN SELECT k FROM eh ORDER BY k DESC LIMIT 3"
    ).df.collect()[0][0]
    assert txt.splitlines()[0].startswith("TopN_FileSkip (key: k, files: ")
    # non-qualifying statements keep the plain plan
    txt = eng.sql("EXPLAIN SELECT k FROM eh WHERE v + 0 = 1").df.collect()[0][0]
    assert txt.splitlines()[0].startswith("== ")
    assert not [p for p in eng.probe_log if p.get("kind")]
    leaked = [
        v.name for v in eng.spark.catalog.listTables()
        if v.name.startswith("__ptget")
    ]
    assert not leaked
