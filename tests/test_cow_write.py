"""File-granular copy-on-write DELETE / REPLACE (VERDICT r11 next #1).

The reference's DELETE is O(matched rows) — per-key KV deletes
(table/tables/tables.go:652 RemoveRecord); REPLACE removes exactly the
conflicting rows (executor/replace.go removeRow). A parquet warehouse
deletes at FILE granularity instead: only the files that contain
doomed rowids are rewritten, every other file survives the publish by
hard link (a rename — zero bytes copied), and the swap stays one
atomic metadata rename. A one-row DELETE on an N-file table must
rewrite exactly the files holding that row, never the table.

Manifest discipline (the s14 two-independent-sources rule): the dirty
set is asserted from (a) an independent pyarrow scan of each file for
the doomed rows and (b) the before/after file listing with INODE
identity — a surviving name with the same inode is a link, provably
not a rewrite.
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


def _manifest(eng, t, db="default"):
    """rel path -> inode of every committed data file."""
    data = eng.catalog.data_dir(db, t)
    out = {}
    for root, dirs, files in os.walk(data):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith("part-") and not f.endswith((".crc", ".tmp")):
                p = os.path.join(root, f)
                out[os.path.relpath(p, data)] = os.stat(p).st_ino
    return out


def _files_containing(eng, t, col, values, db="default"):
    """Independent source: pyarrow-scan each committed file for rows
    whose `col` is in `values`."""
    data = eng.catalog.data_dir(db, t)
    hits = set()
    for rel in _manifest(eng, t, db):
        tbl = pq.read_table(os.path.join(data, rel), columns=[col])
        if any(v is not None and v in values for v in tbl.column(col).to_pylist()):
            hits.add(rel)
    return hits


def _vals(e, sql):
    return sorted(tuple(r) for r in e.sql(sql).df.collect())


def test_one_row_delete_rewrites_only_matching_files(eng):
    eng.sql("CREATE TABLE cw (a INT, b INT)")
    for i in range(4):  # four separate appends -> four disjoint file sets
        eng.sql(f"INSERT INTO cw VALUES ({i * 10 + 1}, {i}), ({i * 10 + 2}, {i})")
    before = _manifest(eng, "cw")
    assert len(before) >= 4
    dirty_expected = _files_containing(eng, "cw", "a", {21})
    assert dirty_expected, "the doomed row must live somewhere"
    r = eng.sql("DELETE FROM cw WHERE a = 21")
    assert r.rows_affected == 1
    after = _manifest(eng, "cw")
    # every clean file survives AS THE SAME INODE (linked, not copied)
    for rel, ino in before.items():
        if rel in dirty_expected:
            assert rel not in after, f"dirty file {rel} must be rewritten away"
        else:
            assert after.get(rel) == ino, f"clean file {rel} must survive by link"
    assert _vals(eng, "SELECT a FROM cw ORDER BY a") == [
        (v,) for v in [1, 2, 11, 12, 22, 31, 32]
    ]
    assert eng.sql("ADMIN CHECK TABLE cw").df.collect()[0]["STATUS"] == "OK"


def test_delete_with_limit_is_file_granular(eng):
    eng.sql("CREATE TABLE cl (a INT)")
    for i in range(3):
        eng.sql(f"INSERT INTO cl VALUES ({i * 10}), ({i * 10 + 1})")
    before = _manifest(eng, "cl")
    dirty_expected = _files_containing(eng, "cl", "a", {0, 1})
    r = eng.sql("DELETE FROM cl WHERE a < 10 ORDER BY a LIMIT 2")
    assert r.rows_affected == 2
    after = _manifest(eng, "cl")
    for rel, ino in before.items():
        if rel not in dirty_expected:
            assert after.get(rel) == ino
    assert _vals(eng, "SELECT a FROM cl ORDER BY a") == [(10,), (11,), (20,), (21,)]


def test_replace_rewrites_only_conflicting_files(eng):
    eng.sql("CREATE TABLE cr (k INT PRIMARY KEY, v INT)")
    for i in range(3):
        eng.sql(f"INSERT INTO cr VALUES ({i * 10 + 1}, {i}), ({i * 10 + 2}, {i})")
    before = _manifest(eng, "cr")
    dirty_expected = _files_containing(eng, "cr", "k", {11})
    r = eng.sql("REPLACE INTO cr VALUES (11, 99)")
    assert r.rows_affected == 2  # 1 replaced + 1 inserted (MySQL count)
    after = _manifest(eng, "cr")
    for rel, ino in before.items():
        if rel in dirty_expected:
            assert rel not in after, f"conflicting file {rel} must be rewritten"
        else:
            assert after.get(rel) == ino, f"clean file {rel} must survive by link"
    assert _vals(eng, "SELECT k, v FROM cr ORDER BY k") == [
        (1, 0), (2, 0), (11, 99), (12, 1), (21, 2), (22, 2),
    ]
    assert eng.sql("ADMIN CHECK TABLE cr").df.collect()[0]["STATUS"] == "OK"


def test_replace_without_conflict_is_pure_append(eng):
    """No key conflict -> the statement is an append: EVERY committed
    file survives by inode; nothing is rewritten at all."""
    eng.sql("CREATE TABLE ca (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO ca VALUES (1, 1), (2, 2)")
    before = _manifest(eng, "ca")
    eng.sql("REPLACE INTO ca VALUES (3, 3)")
    after = _manifest(eng, "ca")
    for rel, ino in before.items():
        assert after.get(rel) == ino
    assert set(after) > set(before), "the batch appended new files"
    assert _vals(eng, "SELECT k, v FROM ca ORDER BY k") == [(1, 1), (2, 2), (3, 3)]


def test_partitioned_delete_leaves_other_partitions_linked(eng):
    eng.sql(
        "CREATE TABLE cp (a INT, p INT) PARTITIONED BY (p)"
    )
    eng.sql("INSERT INTO cp VALUES (1, 1), (2, 1), (3, 2), (4, 2), (5, 3)")
    before = _manifest(eng, "cp")
    assert any("p=2" in rel for rel in before)
    r = eng.sql("DELETE FROM cp WHERE a = 3")
    assert r.rows_affected == 1
    after = _manifest(eng, "cp")
    for rel, ino in before.items():
        if "p=2" not in rel:
            assert after.get(rel) == ino, f"{rel}: other partitions untouched"
    assert _vals(eng, "SELECT a, p FROM cp ORDER BY a") == [
        (1, 1), (2, 1), (4, 2), (5, 3),
    ]


def test_bucketed_delete_keeps_bucket_contract(eng):
    eng.sql(
        "CREATE TABLE cb (k INT, v INT) CLUSTERED BY (k) INTO 4 BUCKETS"
    )
    eng.sql("INSERT INTO cb VALUES (1, 1), (2, 2), (3, 3), (4, 4)")
    eng.sql("INSERT INTO cb VALUES (5, 5), (6, 6), (7, 7), (8, 8)")
    r = eng.sql("DELETE FROM cb WHERE k = 3")
    assert r.rows_affected == 1
    assert _vals(eng, "SELECT k FROM cb ORDER BY k") == [
        (k,) for k in [1, 2, 4, 5, 6, 7, 8]
    ]
    assert eng.sql("ADMIN CHECK TABLE cb").df.collect()[0]["STATUS"] == "OK"


def test_txn_commit_delete_is_file_granular(eng):
    eng.sql("CREATE TABLE ct (a INT)")
    for i in range(3):
        eng.sql(f"INSERT INTO ct VALUES ({i * 10}), ({i * 10 + 1})")
    before = _manifest(eng, "ct")
    dirty_expected = _files_containing(eng, "ct", "a", {20})
    eng.sql("BEGIN")
    eng.sql("DELETE FROM ct WHERE a = 20")
    eng.sql("INSERT INTO ct VALUES (99)")
    eng.sql("COMMIT")
    after = _manifest(eng, "ct")
    for rel, ino in before.items():
        if rel in dirty_expected:
            assert rel not in after
        else:
            assert after.get(rel) == ino, f"clean file {rel} must survive commit"
    assert _vals(eng, "SELECT a FROM ct ORDER BY a") == [
        (0,), (1,), (10,), (11,), (21,), (99,),
    ]


def test_txn_insert_then_delete_same_row_publishes_nothing(eng):
    """A row inserted and deleted inside one txn never reaches disk;
    committed files are not even relinked (no doomed committed row)."""
    eng.sql("CREATE TABLE cn (a INT)")
    eng.sql("INSERT INTO cn VALUES (1)")
    before = _manifest(eng, "cn")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO cn VALUES (2)")
    eng.sql("DELETE FROM cn WHERE a = 2")
    eng.sql("COMMIT")
    after = _manifest(eng, "cn")
    assert after == before, "no committed row doomed -> no rewrite, no append"
    assert _vals(eng, "SELECT a FROM cn") == [(1,)]


def test_cow_preserves_initial_default_watermark(eng):
    """The COW rewrite is PHYSICAL-faithful: surviving pre-ALTER rows
    in a rewritten file keep their physical NULL, and the metadata
    fill keeps applying — the rewrite must not materialize half a
    backfill or lose it."""
    eng.sql("CREATE TABLE cwm (k INT)")
    eng.sql("INSERT INTO cwm VALUES (1), (2), (3)")
    eng.sql("ALTER TABLE cwm ADD COLUMN tag INT DEFAULT 7")
    eng.sql("INSERT INTO cwm (k, tag) VALUES (4, NULL)")
    # doomed row shares its file with pre-ALTER survivors
    r = eng.sql("DELETE FROM cwm WHERE k = 2")
    assert r.rows_affected == 1
    got = {r.k: r.tag for r in eng.sql("SELECT k, tag FROM cwm").df.collect()}
    assert got == {1: 7, 3: 7, 4: None}
    # and DROP DEFAULT still preserves the fill for pre-ALTER rows
    eng.sql("ALTER TABLE cwm ALTER COLUMN tag DROP DEFAULT")
    got = {r.k: r.tag for r in eng.sql("SELECT k, tag FROM cwm").df.collect()}
    assert got == {1: 7, 3: 7, 4: None}


def test_predicate_matching_everything_empties_table(eng):
    eng.sql("CREATE TABLE ce (a INT)")
    eng.sql("INSERT INTO ce VALUES (1), (2), (3)")
    r = eng.sql("DELETE FROM ce WHERE a > 0")
    assert r.rows_affected == 3
    assert _vals(eng, "SELECT a FROM ce") == []
    eng.sql("INSERT INTO ce VALUES (9)")  # table still writable
    assert _vals(eng, "SELECT a FROM ce") == [(9,)]


def test_delete_miss_writes_nothing(eng):
    """A predicate matching no rows must not touch a single file."""
    eng.sql("CREATE TABLE cm (a INT)")
    eng.sql("INSERT INTO cm VALUES (1), (2)")
    before = _manifest(eng, "cm")
    r = eng.sql("DELETE FROM cm WHERE a = 999")
    assert r.rows_affected == 0
    assert _manifest(eng, "cm") == before


# ---------------------------------------------------------------------------
# online DELETE: dirty sets above @@cow_online_min_mb run through the
# reorg kernel — persisted job, unlocked survivor rewrite, short-lock
# publish with link catch-up (the CREATE INDEX machinery, VERDICT r11 #1b)
# ---------------------------------------------------------------------------

import json as _json


def test_large_delete_runs_online_and_concurrent_insert_survives(spark, eng, wh):
    """With the threshold forced to 0 every dirty set is 'large': the
    DELETE records a running DDL job, rewrites with no lock held, and
    a concurrent session's INSERT between rewrite and publish is
    linked in verbatim (the DELETE serializes first)."""
    eng.sql("CREATE TABLE ol (a INT)")
    for i in range(3):
        eng.sql(f"INSERT INTO ol VALUES ({i * 10}), ({i * 10 + 1})")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)
    seen = []

    def hook(phase, job):
        seen.append(phase)
        if phase == "delete:backfill done":
            other.sql("INSERT INTO ol VALUES (777)")

    eng.ddl_phase_hook = hook
    r = eng.sql("DELETE FROM ol WHERE a = 10")
    assert r.rows_affected == 1
    assert "delete:reorg start" in seen and "delete:published" in seen
    assert _vals(eng, "SELECT a FROM ol ORDER BY a") == [
        (0,), (1,), (11,), (20,), (21,), (777,),
    ]
    jobs = [j for j in eng.ddl_log.load() if j["type"] == "delete"]
    assert jobs and jobs[-1]["status"] == "synced"
    assert jobs[-1]["row_count"] == 1 and jobs[-1]["staging"] is None
    other.close()


def test_online_delete_redoes_when_dirty_file_rewritten(spark, eng, wh):
    """A concurrent small COW DELETE rewrites one of OUR dirty files
    mid-rewrite: publish detects the vanished file and redoes the pass
    under the lock — both deletes land, nothing resurrects."""
    eng.sql("CREATE TABLE od (a INT)")
    eng.sql("INSERT INTO od VALUES (1), (2)")  # one file set holds both
    eng.sql("INSERT INTO od VALUES (3), (4)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "delete:backfill done":
            # doomed row 2 shares its file(s) with row 1 — this
            # rewrites the file our unlocked pass attributed
            other.sql("DELETE FROM od WHERE a = 2")

    eng.ddl_phase_hook = hook
    r = eng.sql("DELETE FROM od WHERE a = 1")
    assert r.rows_affected == 1
    assert _vals(eng, "SELECT a FROM od ORDER BY a") == [(3,), (4,)]
    assert _vals(other, "SELECT a FROM od ORDER BY a") == [(3,), (4,)]
    other.close()


def test_crashed_online_delete_never_happened(spark, eng, wh):
    """An orphaned running delete job (owner dead) is cancelled on the
    next engine's startup and its staging swept: an online DELETE that
    crashed before publish simply never happened (statement
    atomicity), and the table accepts DDL again."""
    eng.sql("CREATE TABLE oc (a INT)")
    eng.sql("INSERT INTO oc VALUES (1), (2)")
    tdir = os.path.join(wh, "default", "oc")
    staging = os.path.join(tdir, "data.reorg-deadDELETE")
    os.makedirs(staging)
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = _json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "delete",
            "target": "oc",
            "table": "default.oc",
            "query": "DELETE FROM oc WHERE a = 1",
            "status": "running",
            "schema_state": "write reorganization",
            "row_count": 0,
            "pid": 2**22 + 54321,  # dead owner
            "staging": staging,
        }
    )
    with open(jobs_path, "w") as f:
        _json.dump(jobs, f)
    e2 = Engine(spark, wh)
    states = {j["id"]: j["status"] for j in e2.ddl_log.load()}
    assert states[jobs[-1]["id"]] == "cancelled"
    assert not os.path.exists(staging), "orphan staging is swept"
    assert _vals(e2, "SELECT a FROM oc ORDER BY a") == [(1,), (2,)]
    e2.sql("CREATE INDEX ioc ON oc (a)")  # DDL not wedged
    e2.close()


def test_online_delete_refused_while_index_job_running(spark, eng, wh):
    """The job queue serializes per-table: an online DELETE cannot
    start while an index job is mid-flight (and vice versa)."""
    eng.sql("CREATE TABLE oq (a INT)")
    eng.sql("INSERT INTO oq VALUES (1), (2)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)
    errors = []

    def hook(phase, job):
        if phase == "create_index:backfill done":
            other.sys_vars["cow_online_min_mb"] = "0"
            try:
                other.sql("DELETE FROM oq WHERE a = 1")
            except ValueError as e:
                errors.append(str(e))

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ioq ON oq (a)")
    assert errors and "already running" in errors[0]
    # the refused DELETE changed nothing
    assert _vals(eng, "SELECT a FROM oq ORDER BY a") == [(1,), (2,)]
    other.close()


def test_online_delete_partitioned_links_partition_dirs(spark, eng, wh):
    """Online DELETE on a hive-partitioned table: the publish links
    clean files under their partition subdirs and the concurrent
    insert's partition files land intact."""
    eng.sql("CREATE TABLE op (a INT, p INT) PARTITIONED BY (p)")
    eng.sql("INSERT INTO op VALUES (1, 1), (2, 1), (3, 2), (4, 2), (5, 3)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "delete:backfill done":
            other.sql("INSERT INTO op VALUES (9, 9)")

    eng.ddl_phase_hook = hook
    r = eng.sql("DELETE FROM op WHERE a = 3")
    assert r.rows_affected == 1
    assert _vals(eng, "SELECT a, p FROM op ORDER BY a") == [
        (1, 1), (2, 1), (4, 2), (5, 3), (9, 9),
    ]
    after = _manifest(eng, "op")
    assert any("p=1" in rel for rel in after) and any("p=9" in rel for rel in after)
    other.close()


# ---------------------------------------------------------------------------
# COW granularity fuzz (round 12): random DML sequences on multi-file
# tables must keep the FILE-GRANULARITY invariant, not just the data:
# after every DELETE/REPLACE, files that contained no matched row
# survive with their inode (linked, never rewritten), and the table
# content matches an in-python model. Guards the 100x property the
# directed tests pin on fixed shapes.
# ---------------------------------------------------------------------------

import random as _random


def test_cow_granularity_fuzz(spark, eng):
    for seed in range(8):
        rng = _random.Random(seed * 513239 + 3)
        tbl = f"cg{seed}"
        eng.sql(f"CREATE TABLE {tbl} (k INT PRIMARY KEY, v INT)")
        model: dict[int, int] = {}
        kpool = iter(rng.sample(range(1, 2000), 200))
        for _ in range(rng.randint(3, 5)):  # multi-file history
            rows_ = [(next(kpool), rng.randrange(100)) for _ in range(rng.randint(2, 5))]
            eng.sql(
                f"INSERT INTO {tbl} VALUES "
                + ", ".join(f"({k}, {v})" for k, v in rows_)
            )
            model.update(dict(rows_))
        for _ in range(rng.randint(3, 6)):
            before = _manifest(eng, tbl)
            op = rng.choice(["del_one", "del_pred", "replace", "insert"])
            if op == "del_one" and model:
                k = rng.choice(sorted(model))
                dirty = _files_containing(eng, tbl, "k", {k})
                eng.sql(f"DELETE FROM {tbl} WHERE k = {k}")
                model.pop(k)
            elif op == "del_pred" and model:
                cut = rng.choice(sorted(model)) + rng.randint(-50, 50)
                doomed = {k for k in model if k < cut}
                dirty = _files_containing(eng, tbl, "k", doomed) if doomed else set()
                eng.sql(f"DELETE FROM {tbl} WHERE k < {cut}")
                for k in doomed:
                    model.pop(k)
            elif op == "replace":
                # mix of conflicting and fresh keys
                ks = rng.sample(sorted(model), min(len(model), rng.randint(1, 2))) + [
                    next(kpool)
                ]
                dirty = _files_containing(eng, tbl, "k", set(ks))
                vals = [(k, rng.randrange(1000, 2000)) for k in ks]
                eng.sql(
                    f"REPLACE INTO {tbl} VALUES "
                    + ", ".join(f"({k}, {v})" for k, v in vals)
                )
                model.update(dict(vals))
            else:
                rows_ = [(next(kpool), rng.randrange(100)) for _ in range(rng.randint(1, 3))]
                dirty = set()
                eng.sql(
                    f"INSERT INTO {tbl} VALUES "
                    + ", ".join(f"({k}, {v})" for k, v in rows_)
                )
                model.update(dict(rows_))
            after = _manifest(eng, tbl)
            for rel, ino in before.items():
                if rel not in dirty:
                    assert after.get(rel) == ino, (
                        f"seed {seed} {op}: clean file {rel} was rewritten"
                    )
            got = dict(
                (r.k, r.v) for r in eng.sql(f"SELECT k, v FROM {tbl}").df.collect()
            )
            assert got == model, f"seed {seed} {op}: content diverged"
        assert eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()[0]["STATUS"] == "OK"


# ---------------------------------------------------------------------------
# online REPLACE: a bulk upsert whose dirty set exceeds the threshold
# runs through the reorg kernel like the large DELETE; serialization
# is REPLACE-LAST — concurrently inserted rows conflicting on a batch
# key are replaced at publish (no duplicate survives), clean delta
# files are linked verbatim.
# ---------------------------------------------------------------------------


def test_replace_select_rowid_reservation_outrun_is_reallocated(spark, eng, wh):
    """REPLACE ... SELECT allocates rowids for the batch as measured
    under the lock, but the lazy plan re-executes at the unlocked
    checkpoint (ADVICE r12): a source-table commit in between yields
    MORE rows, whose ids would spill past the reservation and collide
    with ids a concurrent session allocated. The guard re-verifies the
    materialized batch against the reserved range and re-allocates
    under the lock when outrun — rowids stay globally unique.

    The outrun is SIMULATED at the dedup seam (a real one needs the
    lazy plan to re-list the source mid-statement — Spark's file-index
    cache makes that timing nondeterministic): the hook extends the
    batch with rows whose ids run past the reservation, exactly what
    a grown re-execution of the row_number assignment would produce,
    while a concurrent session allocates those very ids in rdst."""
    from tinysql_spark.catalog import ROWID

    eng.sql("CREATE TABLE rsrc (k INT, v INT)")
    eng.sql("INSERT INTO rsrc VALUES (1, 10), (2, 20)")
    eng.sql("CREATE TABLE rdst (k INT PRIMARY KEY, v INT)")
    other = Engine(spark, wh)
    real = eng._replace_dedup_batch
    fired = []

    def hook(df, keys):
        if not fired:
            fired.append(1)
            # concurrent session allocates the ids right past eng's
            # 2-row reservation — the collision victims
            other.sql("INSERT INTO rdst VALUES (100, 1), (101, 2)")
            # the "re-executed, grown" batch: 3 extra rows whose
            # row_number ids spill past the reserved range
            start = int(df.agg({ROWID: "min"}).collect()[0][0])
            rows_ = [
                {ROWID: start + 2 + i, "k": 3 + i, "v": 30 + 10 * i}
                for i in range(3)
            ]
            extra = spark.createDataFrame(rows_, schema=df.schema)
            df = df.unionByName(extra)
        return real(df, keys)

    eng._replace_dedup_batch = hook
    try:
        eng.sql("REPLACE INTO rdst SELECT k, v FROM rsrc")
    finally:
        eng._replace_dedup_batch = real
    assert fired, "hook must have interleaved the concurrent commits"
    got = sorted(_vals(eng, "SELECT k, v FROM rdst"))
    assert got == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50), (100, 1), (101, 2)]
    ids = [r[0] for r in eng._raw("default", "rdst").select("_rowid").collect()]
    assert len(ids) == len(set(ids)), f"duplicate rowids: {sorted(ids)}"
    assert eng.sql("ADMIN CHECK TABLE rdst").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_bulk_replace_runs_online_and_replaces_delta_conflicts(spark, eng, wh):
    eng.sql("CREATE TABLE orp (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO orp VALUES (1, 10), (2, 20)")
    eng.sql("INSERT INTO orp VALUES (3, 30)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)
    seen = []

    def hook(phase, job):
        seen.append(phase)
        if phase == "replace:backfill done":
            # one conflicting key (5 arrives concurrently, the batch
            # also writes 5) and one clean key (77)
            other.sql("INSERT INTO orp VALUES (5, 555), (77, 770)")

    eng.ddl_phase_hook = hook
    r = eng.sql("REPLACE INTO orp VALUES (2, 99), (5, 50)")
    assert "replace:reorg start" in seen and "replace:published" in seen
    # 2 inserted; replaced = committed k=2 + the concurrent k=5 row
    assert r.rows_affected == 4, r.message
    assert _vals(eng, "SELECT k, v FROM orp ORDER BY k") == [
        (1, 10), (2, 99), (3, 30), (5, 50), (77, 770),
    ]
    jobs = [j for j in eng.ddl_log.load() if j["type"] == "replace"]
    assert jobs and jobs[-1]["status"] == "synced" and jobs[-1]["staging"] is None
    assert eng.sql("ADMIN CHECK TABLE orp").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_online_replace_redoes_when_dirty_file_rewritten(spark, eng, wh):
    eng.sql("CREATE TABLE orr (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO orr VALUES (1, 10), (2, 20)")  # one shared file set
    eng.sql("INSERT INTO orr VALUES (3, 30)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "replace:backfill done":
            # rewrites the file our conflict pass attributed (k=1
            # shares its file with k=2, the batch's conflict)
            other.sql("DELETE FROM orr WHERE k = 1")

    eng.ddl_phase_hook = hook
    r = eng.sql("REPLACE INTO orr VALUES (2, 99)")
    assert r.rows_affected == 2
    assert _vals(eng, "SELECT k, v FROM orr ORDER BY k") == [(2, 99), (3, 30)]
    assert eng.sql("ADMIN CHECK TABLE orr").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_crashed_online_replace_never_happened(spark, eng, wh):
    eng.sql("CREATE TABLE orc (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO orc VALUES (1, 10)")
    tdir = os.path.join(wh, "default", "orc")
    staging = os.path.join(tdir, "data.reorg-deadREPLACE")
    os.makedirs(staging)
    import json as _json

    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = _json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "replace",
            "target": "orc",
            "table": "default.orc",
            "query": "REPLACE INTO orc VALUES (1, 99)",
            "status": "running",
            "schema_state": "write reorganization",
            "row_count": 0,
            "pid": 2**22 + 31337,
            "staging": staging,
        }
    )
    with open(jobs_path, "w") as f:
        _json.dump(jobs, f)
    e2 = Engine(spark, wh)
    states = {j["id"]: j["status"] for j in e2.ddl_log.load()}
    assert states[jobs[-1]["id"]] == "cancelled"
    assert not os.path.exists(staging)
    assert _vals(e2, "SELECT k, v FROM orc") == [(1, 10)], "statement never ran"
    e2.close()


def test_online_delete_survives_file_unlinked_before_rewrite(spark, eng, wh):
    """A concurrent small COW DELETE unlinks one of OUR dirty files
    BEFORE the unlocked survivor read even starts: the read failure is
    an invalidated pass, not a statement error — publish redoes under
    the lock (review r12 #4)."""
    eng.sql("CREATE TABLE ouf (a INT)")
    eng.sql("INSERT INTO ouf VALUES (1), (2)")  # shared file set
    eng.sql("INSERT INTO ouf VALUES (3)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "delete:reorg start":
            other.sql("DELETE FROM ouf WHERE a = 2")  # rewrites our dirty file

    eng.ddl_phase_hook = hook
    r = eng.sql("DELETE FROM ouf WHERE a = 1")
    assert r.rows_affected == 1
    assert _vals(eng, "SELECT a FROM ouf") == [(3,)]
    jobs = [j for j in eng.ddl_log.load() if j["type"] == "delete"]
    assert jobs[-1]["status"] == "synced"
    other.close()


def test_online_replace_survives_file_unlinked_before_rewrite(spark, eng, wh):
    eng.sql("CREATE TABLE ouf2 (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO ouf2 VALUES (1, 10), (2, 20)")
    eng.sql("SET @@cow_online_min_mb = 0")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "replace:reorg start":
            other.sql("DELETE FROM ouf2 WHERE k = 1")  # unlinks the dirty file

    eng.ddl_phase_hook = hook
    r = eng.sql("REPLACE INTO ouf2 VALUES (2, 99)")
    assert r.rows_affected == 2
    assert _vals(eng, "SELECT k, v FROM ouf2") == [(2, 99)]
    other.close()


def test_fragmentation_audit_trips_and_optimize_clears(eng):
    """VERDICT r12 next #5 — the warehouse fragmentation gate: a table
    accumulating small COW/append files must trip the audit with
    advice naming the existing online fix; a compact table is a
    no-op; OPTIMIZE folds the litter and the audit goes quiet."""
    eng.sql("CREATE TABLE fr (k INT PRIMARY KEY, v INT)")
    eng.sql("SET @@frag_min_files = 4")  # local-scale threshold
    for i in range(8):  # 8 single-row appends = 8 tiny files
        eng.sql(f"INSERT INTO fr VALUES ({i}, {i})")
    row = eng.sql("ADMIN SHOW FRAGMENTATION fr").df.collect()[0]
    assert row["FILES"] >= 8
    assert row["SMALL_FILES"] == row["FILES"]  # all tiny at this SF
    assert row["SMALL_RATIO"] == 1.0
    assert row["FRAGMENTED"] is True
    assert row["ADVICE"] == "OPTIMIZE TABLE fr"
    eng.sql("OPTIMIZE TABLE fr")
    row2 = eng.sql("ADMIN SHOW FRAGMENTATION fr").df.collect()[0]
    assert row2["FILES"] < row["FILES"]
    assert row2["FRAGMENTED"] is False and row2["ADVICE"] == ""
    # rows survive the compaction
    assert eng.sql("SELECT COUNT(*) AS n FROM fr").df.collect()[0][0] == 8
    # compact table: below the file-count gate, never fragmented
    eng.sql("CREATE TABLE frc (k INT PRIMARY KEY)")
    eng.sql("INSERT INTO frc VALUES (1), (2), (3)")
    rc = eng.sql("ADMIN SHOW FRAGMENTATION frc").df.collect()[0]
    assert rc["FRAGMENTED"] is False and rc["ADVICE"] == ""
    # threshold validation is loud, not silent
    eng.sql("SET @@frag_small_ratio = 'junk'")
    with pytest.raises(ValueError, match="frag_small_ratio"):
        eng.sql("ADMIN SHOW FRAGMENTATION fr")
