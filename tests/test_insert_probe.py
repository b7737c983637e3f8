"""Index-backed, unlocked unique-key enforcement for INSERT
(VERDICT r12 next #1).

The reference's dup-key check is an index point-get, O(batch)
(executor/insert.go dup-key path via tablecodec/tablecodec.go:80
EncodeIndexSeekKey), and never blocks other writers. The parquet
analog: the batch's key values prune committed files via footer
min/max (the engine's own IndexReader replacement applied to its own
write path), the probe and the batch's physical write run UNLOCKED
against a file snapshot, and publish revalidates only the DELTA under
a short lock.

Manifest discipline (two independent sources): the probe's pruned
file count (engine.probe_log) is asserted against an independent
pyarrow footer scan of the same files.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tinysql_spark.engine import Engine


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "warehouse")


@pytest.fixture()
def eng(spark, wh):
    e = Engine(spark, wh)
    yield e
    e.close()


def _vals(e, sql):
    return [tuple(r) for r in e.sql(sql).df.collect()]


def _footer_overlaps(eng, t, col, value, db="default"):
    """Independent source: pyarrow-scan every committed file's footer
    and count the files a probe for ``value`` must read — [min,max] of
    ``col`` covers it, or the file has row groups but no usable stats
    (a stats-less file can never be pruned; the engine keeps it, so
    must we). A ZERO-row-group file has no rows at all — prunable for
    any value (round 14: the engine prunes the empty part CREATE
    TABLE writes the same way)."""
    data = eng.catalog.data_dir(db, t)
    hits = 0
    for root, dirs, files in os.walk(data):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        for f in files:
            if not f.startswith("part-") or f.endswith((".crc", ".tmp")):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
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
            if mn is None or mn <= value <= mx:
                hits += 1
    return hits


def _ranged_table(eng, name, n_files=6, per=100):
    """One file per INSERT statement, disjoint key ranges — the
    PK-sorted layout whose footer min/max the probe prunes on."""
    eng.sql(f"CREATE TABLE {name} (k INT PRIMARY KEY, v INT)")
    for i in range(n_files):
        lo = i * per + 1
        vals = ", ".join(f"({k}, {k * 10})" for k in range(lo, lo + per))
        eng.sql(f"INSERT INTO {name} VALUES {vals}")


def test_point_insert_probe_reads_only_overlapping_files(eng):
    """A fresh-key point INSERT into a range-laid-out table must read
    ZERO committed files (no footer covers the key); a duplicate key
    reads exactly the files an independent pyarrow footer scan says
    overlap — never the table."""
    _ranged_table(eng, "pp")
    total = 6
    # fresh key far outside every file's range: probe prunes every
    # file WITH stats (a stats-less empty part can never be pruned —
    # both sources count it identically)
    expect_fresh = _footer_overlaps(eng, "pp", "k", 100000)
    eng.probe_log.clear()
    eng.sql("INSERT INTO pp VALUES (100000, 1)")
    probes = [p for p in eng.probe_log if p["table"] == "default.pp"]
    assert probes and all(p["literal"] for p in probes)
    assert probes[0]["files_given"] >= total
    assert probes[0]["files_read"] == expect_fresh, (probes, expect_fresh)
    assert probes[0]["files_read"] <= 1
    # duplicate key: 1062, and the probe read exactly the files the
    # independent footer scan says can hold k=150
    expect = _footer_overlaps(eng, "pp", "k", 150)
    assert expect >= 1
    eng.probe_log.clear()
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO pp VALUES (150, 9)")
    probes = [p for p in eng.probe_log if p["table"] == "default.pp"]
    assert probes[0]["files_read"] == expect, (probes, expect)
    assert probes[0]["files_read"] < probes[0]["files_given"]
    # table unchanged by the failed insert
    assert _vals(eng, "SELECT v FROM pp WHERE k = 150") == [(1500,)]


def test_probe_file_count_stays_flat_as_table_grows(eng):
    """The 100x claim in miniature: the point-probe's files_read is
    governed by key-range overlap, not table size — doubling the file
    count must not grow the probe."""
    _ranged_table(eng, "pg", n_files=3)
    eng.probe_log.clear()
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO pg VALUES (50, 0)")
    small = eng.probe_log[0]["files_read"]
    for i in range(3, 9):  # triple the file count, same key ranges ×3
        lo = i * 100 + 1
        vals = ", ".join(f"({k}, {k})" for k in range(lo, lo + 100))
        eng.sql(f"INSERT INTO pg VALUES {vals}")
    eng.probe_log.clear()
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO pg VALUES (50, 0)")
    big = eng.probe_log[0]["files_read"]
    assert big == small, (small, big)
    assert eng.probe_log[0]["files_given"] >= 9


def test_delta_revalidation_catches_mid_statement_commit(spark, eng, wh):
    """The probe runs unlocked against a snapshot; a key committed by
    another session BETWEEN the probe and the publish must be caught
    by the publish-time delta recheck (only the delta files are
    probed), aborting with 1062 and leaving no staged litter."""
    eng.sql("CREATE TABLE dr (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO dr VALUES (1, 10)")
    other = Engine(spark, wh)
    real = eng._prepare_append
    fired = []

    def hook(db, t, df, info=None):
        if not fired and t == "dr":
            fired.append(1)
            other.sql("INSERT INTO dr VALUES (7, 70)")  # lands mid-statement
        return real(db, t, df, info=info)

    eng._prepare_append = hook
    try:
        with pytest.raises(ValueError, match="1062"):
            eng.sql("INSERT INTO dr VALUES (7, 99)")
    finally:
        eng._prepare_append = real
    assert fired
    # delta pass probed ONLY the delta, not the snapshot again
    delta_probes = [
        p for p in eng.probe_log if p["table"] == "default.dr" and p["files_given"] == 1
    ]
    assert delta_probes, eng.probe_log
    eng.reload()
    assert _vals(eng, "SELECT k, v FROM dr ORDER BY k") == [(1, 10), (7, 70)]
    # no orphaned append staging left behind
    tdir = os.path.join(wh, "default", "dr")
    litter = [e for e in os.listdir(tdir) if e.startswith("data.append-")]
    assert litter == [], litter
    assert eng.sql("ADMIN CHECK TABLE dr").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_concurrent_insert_proceeds_during_big_insert_probe(spark, eng, wh):
    """The writer-latency claim: another session's single-row INSERTs
    complete WHILE this session is inside its (unlocked) probe+write
    window — the flock no longer spans the statement."""
    eng.sql("CREATE TABLE ci (k INT PRIMARY KEY, v INT)")
    vals = ", ".join(f"({k}, {k})" for k in range(1, 2001))
    eng.sql(f"INSERT INTO ci VALUES {vals}")
    other = Engine(spark, wh)
    real = eng._prepare_append
    done_mid_statement = []

    def hook(db, t, df, info=None):
        if t == "ci" and not done_mid_statement:
            # we are mid-INSERT, after the probe, before publish — the
            # lock is NOT held; these must complete, not deadlock
            for k in (90001, 90002, 90003):
                other.sql(f"INSERT INTO ci VALUES ({k}, 1)")
            done_mid_statement.append(3)
        return real(db, t, df, info=info)

    eng._prepare_append = hook
    try:
        vals2 = ", ".join(f"({k}, {k})" for k in range(10001, 12001))
        eng.sql(f"INSERT INTO ci VALUES {vals2}")
    finally:
        eng._prepare_append = real
    assert done_mid_statement == [3]
    n = _vals(eng, "SELECT COUNT(*) AS n FROM ci")[0][0]
    assert n == 2000 + 2000 + 3
    ids = [r[0] for r in eng._raw("default", "ci").select("_rowid").collect()]
    assert len(ids) == len(set(ids))
    assert eng.sql("ADMIN CHECK TABLE ci").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_schema_change_mid_insert_aborts_retryable(spark, eng, wh):
    """A DDL publishing between the snapshot and the publish leaves
    the prepared files with the OLD physical schema — the publish-time
    sig check must abort with the reference's 8028 (schema changed),
    and a plain retry succeeds."""
    eng.sql("CREATE TABLE sc (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO sc VALUES (1, 10)")
    other = Engine(spark, wh)
    real = eng._prepare_append
    fired = []

    def hook(db, t, df, info=None):
        if not fired and t == "sc":
            fired.append(1)
            other.sql("ALTER TABLE sc ADD COLUMN tag INT DEFAULT 5")
        return real(db, t, df, info=info)

    eng._prepare_append = hook
    try:
        with pytest.raises(ValueError, match="8028"):
            eng.sql("INSERT INTO sc VALUES (2, 20)")
    finally:
        eng._prepare_append = real
    eng.reload()
    eng.sql("INSERT INTO sc (k, v) VALUES (2, 20)")  # retry, new schema
    assert _vals(eng, "SELECT k, v, tag FROM sc ORDER BY k") == [
        (1, 10, 5),
        (2, 20, 5),
    ]
    other.close()


def test_truncate_mid_insert_aborts_instead_of_resurrecting_ids(spark, eng, wh):
    """TRUNCATE resets the allocator; publishing a batch whose rowids
    were reserved pre-truncate would duplicate ids once the fresh
    allocator catches up — the publish-time allocator-regression check
    aborts instead."""
    eng.sql("CREATE TABLE tm (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO tm VALUES (1, 10), (2, 20)")
    other = Engine(spark, wh)
    real = eng._prepare_append
    fired = []

    def hook(db, t, df, info=None):
        if not fired and t == "tm":
            fired.append(1)
            other.sql("TRUNCATE TABLE tm")
        return real(db, t, df, info=info)

    eng._prepare_append = hook
    try:
        with pytest.raises(ValueError, match="8028"):
            eng.sql("INSERT INTO tm VALUES (3, 30)")
    finally:
        eng._prepare_append = real
    eng.reload()
    assert _vals(eng, "SELECT COUNT(*) AS n FROM tm")[0][0] == 0
    eng.sql("INSERT INTO tm VALUES (3, 30)")  # retry on the fresh table
    ids = [r[0] for r in eng._raw("default", "tm").select("_rowid").collect()]
    assert len(ids) == len(set(ids))
    other.close()


def test_multi_column_unique_key_probe(eng):
    """Composite unique keys prune on the INTERSECTION of every key
    column's footer overlap (round 14 — first-column-only pruning let
    a low-cardinality leading column defeat the point probe) and
    compare full tuples — same-first-column different-second-column
    must NOT conflict."""
    eng.sql("CREATE TABLE mc (a INT, b INT, v INT, UNIQUE KEY ab (a, b))")
    eng.sql("INSERT INTO mc VALUES (1, 1, 10), (1, 2, 20)")
    eng.sql("INSERT INTO mc VALUES (1, 3, 30)")  # same a, new b: fine
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO mc VALUES (1, 2, 99)")
    # NULL in any key column never conflicts (MySQL)
    eng.sql("INSERT INTO mc VALUES (1, NULL, 1), (1, NULL, 2)")
    assert _vals(eng, "SELECT COUNT(*) AS n FROM mc")[0][0] == 5


def test_big_batch_falls_back_to_semi_join_probe(eng):
    """Batches past _PROBE_LITERAL_MAX distinct keys skip the literal
    collect (bounded driver memory) and still enforce uniqueness via
    the unlocked semi-join."""
    eng.sql("CREATE TABLE bb (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO bb VALUES (1, 1)")
    n = Engine._PROBE_LITERAL_MAX + 10
    vals = ", ".join(f"({k}, 0)" for k in range(10_000, 10_000 + n))
    eng.probe_log.clear()
    eng.sql(f"INSERT INTO bb VALUES {vals}")
    assert any(not p["literal"] for p in eng.probe_log), eng.probe_log
    vals2 = ", ".join(f"({k}, 0)" for k in range(20_000, 20_000 + n - 1))
    with pytest.raises(ValueError, match="1062"):
        eng.sql(f"INSERT INTO bb VALUES {vals2}, (1, 9)")
    assert _vals(eng, "SELECT COUNT(*) AS n FROM bb")[0][0] == 1 + n


def test_point_replace_probe_reads_only_overlapping_files(eng):
    """The REPLACE conflict attribution uses the same footer pruning
    (round 13): a point upsert into a range-laid-out table attributes
    against only the files whose footer covers its key — two-source
    check against the independent pyarrow footer scan."""
    _ranged_table(eng, "rp")
    expect = _footer_overlaps(eng, "rp", "k", 150)
    eng.probe_log.clear()
    r = eng.sql("REPLACE INTO rp VALUES (150, 9)")
    assert r.rows_affected == 2  # 1 replaced + 1 inserted (MySQL count)
    probes = [
        p
        for p in eng.probe_log
        if p["table"] == "default.rp" and p["key"] == ("replace",)
    ]
    assert probes and probes[0]["literal"]
    assert probes[0]["files_read"] == expect, (probes, expect)
    assert probes[0]["files_read"] < probes[0]["files_given"]
    assert _vals(eng, "SELECT v FROM rp WHERE k = 150") == [(9,)]
    # fresh-key REPLACE prunes everything with stats: pure append
    expect2 = _footer_overlaps(eng, "rp", "k", 99999)
    eng.probe_log.clear()
    eng.sql("REPLACE INTO rp VALUES (99999, 1)")
    probes = [
        p
        for p in eng.probe_log
        if p["table"] == "default.rp" and p["key"] == ("replace",)
    ]
    assert probes[0]["files_read"] == expect2 <= 1
    assert eng.sql("ADMIN CHECK TABLE rp").df.collect()[0]["STATUS"] == "OK"


def test_admin_show_probes_surfaces_probe_health(eng):
    """VERDICT r13 wrong #2: the probe trace is operator-visible.
    ``ADMIN SHOW PROBES t`` lists the last probe_log rows with ADVICE
    — empty for a healthy pruning layout, naming the online OPTIMIZE
    when literal point probes stop pruning (the table's layout no
    longer clusters the key), and flagging bulk semi-join fallbacks
    as expected-amortized."""
    # healthy: range-laid-out table, point probe prunes
    _ranged_table(eng, "ph", n_files=6)
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO ph VALUES (150, 0)")
    rows = eng.sql("ADMIN SHOW PROBES ph").df.collect()
    assert rows and rows[-1]["TABLE_NAME"] == "default.ph"
    assert rows[-1]["LITERAL"] and rows[-1]["ADVICE"] == ""
    assert rows[-1]["FILES_READ"] < rows[-1]["FILES_GIVEN"]

    # unhealthy: every file spans the whole key range (strided
    # inserts), so a literal point probe reads most of the table —
    # the ADVICE names the existing online fix
    eng.sql("CREATE TABLE uh (k INT PRIMARY KEY, v INT)")
    n_files, per = 10, 40
    for i in range(n_files):
        vals = ", ".join(f"({i + n_files * j}, 0)" for j in range(per))
        eng.sql(f"INSERT INTO uh VALUES {vals}")
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO uh VALUES (205, 1)")
    rows = eng.sql("ADMIN SHOW PROBES uh").df.collect()
    assert rows[-1]["LITERAL"]
    assert rows[-1]["FILES_READ"] > rows[-1]["FILES_GIVEN"] // 2
    assert "OPTIMIZE TABLE uh" in rows[-1]["ADVICE"]

    # bulk fallback rows are annotated, not alarmed
    n = Engine._PROBE_LITERAL_MAX + 10
    vals = ", ".join(f"({k}, 0)" for k in range(100_000, 100_000 + n))
    eng.sql(f"INSERT INTO uh VALUES {vals}")
    rows = eng.sql("ADMIN SHOW PROBES uh 50").df.collect()
    bulk = [r for r in rows if not r["LITERAL"]]
    assert bulk and "bulk" in bulk[-1]["ADVICE"]

    # unfiltered view spans tables; the count cap applies
    allrows = eng.sql("ADMIN SHOW PROBES").df.collect()
    assert {r["TABLE_NAME"] for r in allrows} >= {"default.ph", "default.uh"}
    assert len(eng.sql("ADMIN SHOW PROBES uh 1").df.collect()) == 1
