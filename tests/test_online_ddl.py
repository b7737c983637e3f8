"""Online DDL — the F1 schema-change protocol over the parquet
warehouse (reference: ddl/ddl_worker.go:299 handleDDLJobQueue,
parser/model/model.go:32-40 SchemaState, ddl/index.go onCreateIndex).

What these tests pin:
- CREATE INDEX walks delete-only -> write-only -> write-reorg ->
  public, each transition its own catalog publish, observable from a
  SECOND session between phases (the two-version invariant).
- The long backfill holds NO lock: a concurrent session can INSERT
  mid-backfill and the publish step catches the rows up.
- From write-only on, concurrent writers ENFORCE a unique index under
  construction; rows from before write-only are audited by the
  backfill, which rolls the job back on duplicates.
- A concurrent full rewrite (DELETE) during the backfill invalidates
  the snapshot; publish redoes the work under the lock — rows never
  lost.
- A crashed job (owner PID dead) is adopted and rolled FORWARD by the
  next engine over the warehouse (worker-restart path).
- DDL on a table with a live in-flight job is refused.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from tinysql_spark import catalog as C
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
    return sorted(tuple(r) for r in e.sql(sql).df.collect())


def _disk_index_state(wh, table, idx):
    """The index state a brand-new session would load — read straight
    from catalog.json, no engine caching involved."""
    with open(os.path.join(wh, "catalog.json")) as f:
        raw = json.load(f)
    for i in raw["default"][table].get("indexes", []):
        if i["name"] == idx:
            return i.get("state", C.STATE_PUBLIC)
    return C.STATE_NONE


def test_index_states_published_one_at_a_time(eng, wh):
    """Every F1 transition is its own on-disk catalog publish: the
    state visible to a new session advances delete-only -> write-only
    -> write-reorg -> public with no skipped step (model.go:32-40)."""
    eng.sql("CREATE TABLE s1 (a INT, b INT)")
    eng.sql("INSERT INTO s1 VALUES (1, 1), (2, 2)")
    seen = []

    def hook(phase, job):
        seen.append((phase, _disk_index_state(wh, "s1", "ia")))

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ia ON s1 (a)")
    assert seen == [
        ("create_index:delete only", C.STATE_DELETE_ONLY),
        ("create_index:write only", C.STATE_WRITE_ONLY),
        ("create_index:write reorganization", C.STATE_WRITE_REORG),
        ("create_index:backfill done", C.STATE_WRITE_REORG),
        ("create_index:public", C.STATE_PUBLIC),
    ]


def test_concurrent_insert_during_backfill_is_not_lost(spark, eng, wh):
    """The backfill holds no lock; a second session INSERTs between
    the snapshot and the publish. The publish moves the appended files
    into the staged layout — all rows survive, and ADMIN CHECK TABLE
    stays clean."""
    eng.sql("CREATE TABLE cb (a INT, b INT)")
    eng.sql("INSERT INTO cb VALUES (1, 10), (2, 20)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "create_index:backfill done":
            other.sql("INSERT INTO cb VALUES (3, 30), (4, 40)")

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ia ON cb (a)")
    assert _vals(eng, "SELECT a, b FROM cb") == [(1, 10), (2, 20), (3, 30), (4, 40)]
    assert eng.sql("ADMIN CHECK TABLE cb").df.collect()[0]["STATUS"] == "OK"
    assert _disk_index_state(wh, "cb", "ia") == C.STATE_PUBLIC
    other.close()


def test_write_only_unique_enforced_by_concurrent_writer(spark, eng, wh):
    """From write-only on, OTHER sessions' inserts maintain the
    not-yet-public unique index (F1's whole point): a duplicate is
    rejected with errno 1062 even though the index is still mid-job,
    and SHOW INDEX does not list it yet."""
    eng.sql("CREATE TABLE wo (a INT)")
    eng.sql("INSERT INTO wo VALUES (1), (2)")
    other = Engine(spark, wh)
    checked = {}

    def hook(phase, job):
        if phase == "create_index:write only":
            with pytest.raises(ValueError, match="1062"):
                other.sql("INSERT INTO wo VALUES (2)")
            other.sql("INSERT INTO wo VALUES (3)")  # non-dup passes
            checked["invisible"] = other.sql("SHOW INDEX FROM wo").df.count() == 0

    eng.ddl_phase_hook = hook
    eng.sql("CREATE UNIQUE INDEX ua ON wo (a)")
    assert checked["invisible"]
    assert _vals(eng, "SELECT a FROM wo") == [(1,), (2,), (3,)]


def test_delete_only_insert_still_audited_by_backfill(spark, eng, wh):
    """An insert that lands while the index is DELETE-ONLY does not
    self-enforce (writes don't maintain the index yet) — but it is in
    the backfill snapshot, so a duplicate it creates rolls the whole
    job back and removes the half-built index."""
    eng.sql("CREATE TABLE dl (a INT)")
    eng.sql("INSERT INTO dl VALUES (1)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "create_index:delete only":
            other.sql("INSERT INTO dl VALUES (1)")  # dup, unenforced here

    eng.ddl_phase_hook = hook
    with pytest.raises(ValueError, match="duplicate entries violate unique index"):
        eng.sql("CREATE UNIQUE INDEX ua ON dl (a)")
    assert _disk_index_state(wh, "dl", "ua") == C.STATE_NONE
    jobs = eng.sql("ADMIN SHOW DDL JOBS").df.collect()
    assert jobs[-1]["STATE"] == "rollback done"
    # both rows kept — rollback cancels the INDEX, never user data
    assert _vals(eng, "SELECT a FROM dl") == [(1,), (1,)]
    other.close()


def test_concurrent_full_rewrite_invalidates_snapshot(spark, eng, wh):
    """A DELETE (full dir swap) during the unlocked backfill removes
    snapshot files; the publish detects it and redoes the work under
    the lock — the final table matches the rewrite, not the stale
    snapshot."""
    eng.sql("CREATE TABLE rw (a INT, b INT)")
    eng.sql("INSERT INTO rw VALUES (1, 1), (2, 2), (3, 3)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "create_index:backfill done":
            other.sql("DELETE FROM rw WHERE a = 2")

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ia ON rw (a)")
    assert _vals(eng, "SELECT a, b FROM rw") == [(1, 1), (3, 3)]
    assert eng.sql("ADMIN CHECK TABLE rw").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_replace_during_backfill_redo_path(spark, eng, wh):
    """REPLACE is a full dir swap, so it too invalidates the snapshot
    — and because the unique index is write-visible from write-only
    on, the REPLACE maintains it (replaces instead of duplicating).
    The publish redo re-audits the live table and the job lands."""
    eng.sql("CREATE TABLE ru (a INT, b INT)")
    eng.sql("INSERT INTO ru VALUES (1, 10), (2, 20), (3, 30)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "create_index:backfill done":
            # conflicts on the MID-JOB unique index: must replace, not dup
            other.sql("REPLACE INTO ru VALUES (2, 99)")

    eng.ddl_phase_hook = hook
    eng.sql("CREATE UNIQUE INDEX ua ON ru (a)")
    assert _disk_index_state(wh, "ru", "ua") == C.STATE_PUBLIC
    assert _vals(eng, "SELECT a, b FROM ru") == [(1, 10), (2, 99), (3, 30)]
    assert eng.sql("ADMIN CHECK TABLE ru").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_ddl_refused_while_job_in_flight(spark, eng, wh):
    """Per-table DDL serialization (ddl/ddl.go ErrRunMultiSchemaChanges):
    a second session's DDL on the same table is refused while a job is
    live; DML is NOT refused (that is the point of online DDL)."""
    eng.sql("CREATE TABLE g1 (a INT)")
    eng.sql("INSERT INTO g1 VALUES (1)")
    other = Engine(spark, wh)
    hit = {}

    def hook(phase, job):
        if phase == "create_index:write only":
            with pytest.raises(ValueError, match="DDL job is already running"):
                other.sql("CREATE INDEX ib ON g1 (a)")
            with pytest.raises(ValueError, match="DDL job is already running"):
                other.sql("ALTER TABLE g1 ADD COLUMN c INT")
            with pytest.raises(ValueError, match="DDL job is already running"):
                other.sql("DROP INDEX ia ON g1")
            other.sql("INSERT INTO g1 VALUES (2)")  # DML flows freely
            hit["done"] = True

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ia ON g1 (a)")
    assert hit["done"]
    assert _vals(eng, "SELECT a FROM g1") == [(1,), (2,)]
    other.close()


def test_crash_resume_rolls_index_job_forward(spark, eng, wh):
    """Worker-restart path (ddl_worker.go:299): a job whose owner died
    mid-chain (here: after write-only published) is adopted by the
    next engine over the warehouse and driven to public — index
    usable, data intact, job synced."""
    eng.sql("CREATE TABLE cr (a INT, b INT)")
    eng.sql("INSERT INTO cr VALUES (1, 1), (2, 2)")

    # BaseException: models PROCESS DEATH. An Exception-derived error
    # would be caught by the terminal-state wrapper and roll the job
    # back instead of leaving it running for the resume path.
    class Crash(BaseException):
        pass

    def hook(phase, job):
        if phase == "create_index:write only":
            raise Crash()

    eng.ddl_phase_hook = hook
    with pytest.raises(Crash):
        eng.sql("CREATE UNIQUE INDEX ua ON cr (a)")
    assert _disk_index_state(wh, "cr", "ua") == C.STATE_WRITE_ONLY

    # forge the owner's death: repoint the job at a PID that is gone
    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    assert jobs[-1]["status"] == "running"
    jobs[-1]["pid"] = p.pid
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)

    e2 = Engine(spark, wh)  # init adopts + rolls forward
    assert _disk_index_state(wh, "cr", "ua") == C.STATE_PUBLIC
    got = e2.sql("ADMIN SHOW DDL JOBS").df.collect()
    assert got[-1]["STATE"] == "synced"
    # the resumed unique index enforces
    with pytest.raises(ValueError, match="1062"):
        e2.sql("INSERT INTO cr VALUES (1, 9)")
    assert _vals(e2, "SELECT a, b FROM cr") == [(1, 1), (2, 2)]
    e2.close()


def test_crash_resume_cancels_optimize(spark, eng, wh):
    """A crashed OPTIMIZE leaves no schema inconsistency, so the
    restart path cancels it (and removes its staging dir) instead of
    re-running a maintenance rewrite at startup."""
    eng.sql("CREATE TABLE co (a INT)")
    for i in range(3):
        eng.sql(f"INSERT INTO co VALUES ({i})")

    # BaseException: models PROCESS DEATH. An Exception-derived error
    # would be caught by the terminal-state wrapper and roll the job
    # back instead of leaving it running for the resume path.
    class Crash(BaseException):
        pass

    def hook(phase, job):
        if phase == "optimize:staged":
            raise Crash()

    eng.ddl_phase_hook = hook
    with pytest.raises(Crash):
        eng.sql("OPTIMIZE TABLE co")
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    staging = jobs[-1]["staging"]
    assert staging and os.path.exists(staging)
    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    jobs[-1]["pid"] = p.pid
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)

    e2 = Engine(spark, wh)
    got = e2.sql("ADMIN SHOW DDL JOBS").df.collect()
    assert got[-1]["STATE"] == "cancelled"
    assert not os.path.exists(staging)
    assert _vals(e2, "SELECT a FROM co") == [(0,), (1,), (2,)]
    e2.close()


def test_optimize_concurrent_append_survives(spark, eng, wh):
    """Online compaction: rows appended while the rewrite ran move
    into the published layout untouched."""
    eng.sql("CREATE TABLE oc (a INT)")
    for i in range(4):
        eng.sql(f"INSERT INTO oc VALUES ({i})")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "optimize:staged":
            other.sql("INSERT INTO oc VALUES (100)")

    eng.ddl_phase_hook = hook
    msg = eng.sql("OPTIMIZE TABLE oc").message
    assert "optimized" in msg
    assert _vals(eng, "SELECT a FROM oc") == [(0,), (1,), (2,), (3,), (100,)]
    assert eng.sql("ADMIN CHECK TABLE oc").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_admin_show_ddl_jobs_shows_live_schema_state(spark, eng, wh):
    """Mid-job, ADMIN SHOW DDL JOBS from ANOTHER session shows the
    running job with its current F1 state — the queue is shared
    warehouse state, not session memory."""
    eng.sql("CREATE TABLE js (a INT)")
    eng.sql("INSERT INTO js VALUES (1)")
    other = Engine(spark, wh)
    seen = {}

    def hook(phase, job):
        if phase == "create_index:write reorganization":
            row = other.sql(
                "ADMIN SHOW DDL JOBS WHERE JOB_TYPE = 'create_index'"
            ).df.collect()[-1]
            seen["state"] = (row["STATE"], row["SCHEMA_STATE"])

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ia ON js (a)")
    assert seen["state"] == ("running", C.STATE_WRITE_REORG)
    other.close()


def test_partitioned_table_online_index_keeps_partitions(spark, eng, wh):
    """Delta catch-up walks hive partition subdirectories: appends
    into partition dirs during the backfill survive the swap with
    their partition values intact."""
    eng.sql("CREATE TABLE pt (a INT, p INT) PARTITIONED BY (p)")
    eng.sql("INSERT INTO pt VALUES (1, 1), (2, 2)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "create_index:backfill done":
            other.sql("INSERT INTO pt VALUES (3, 1), (4, 3)")

    eng.ddl_phase_hook = hook
    eng.sql("CREATE INDEX ia ON pt (a)")
    assert _vals(eng, "SELECT a, p FROM pt") == [(1, 1), (2, 2), (3, 1), (4, 3)]
    assert eng.sql("ADMIN CHECK TABLE pt").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_unique_backfill_sees_initial_default_fill(eng):
    """The backfill audit reads through the initial-default fill: two
    pre-ALTER rows both reading the filled DEFAULT are duplicates, so
    a UNIQUE index on that column must roll back — even though the
    physical bytes are NULL (which never conflict)."""
    eng.sql("CREATE TABLE ud (a INT)")
    eng.sql("INSERT INTO ud VALUES (1), (2)")
    eng.sql("ALTER TABLE ud ADD COLUMN c INT DEFAULT 5")
    with pytest.raises(ValueError, match="duplicate entries violate unique index"):
        eng.sql("CREATE UNIQUE INDEX uc ON ud (c)")
    assert eng.sql("SHOW INDEX FROM ud").df.count() == 0


def test_txn_buffered_dup_cannot_outrun_online_unique_index(spark, eng, wh):
    """The soundness hole the commit-time SchemaChecker closes: a txn
    buffers a duplicate BEFORE the index job starts (so neither the
    backfill — which reads committed data only — nor the write-only
    enforcement — which the txn's old-schema statement never saw —
    catches it). The index lands; the txn's COMMIT must then abort
    with errno 8028, keeping the unique invariant intact."""
    eng.sql("CREATE TABLE tq (a INT)")
    eng.sql("INSERT INTO tq VALUES (1), (2)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO tq VALUES (2)")  # dup, legal under old schema
    other = Engine(spark, wh)
    other.sql("CREATE UNIQUE INDEX ua ON tq (a)")  # full online job lands
    with pytest.raises(ValueError, match="8028"):
        eng.sql("COMMIT")
    assert _vals(eng, "SELECT a FROM tq") == [(1,), (2,)]
    assert eng.sql("ADMIN CHECK TABLE tq").df.collect()[0]["STATUS"] == "OK"
    other.close()


@pytest.mark.parametrize(
    "crash_at",
    [
        "create_index:delete only",
        "create_index:write only",
        "create_index:write reorganization",
        "create_index:backfill done",
    ],
)
def test_crash_at_every_phase_resumes_to_public(spark, eng, wh, crash_at):
    """Systematic crash-window sweep: kill the owner at EACH phase
    boundary of an online unique-index build; the next engine adopts
    the orphan and rolls it forward to the identical end state —
    index public and enforcing, all rows intact, job synced.
    (ddl_worker.go:299 — the restart path must work from every
    intermediate state, not just the ones that are easy.)"""
    eng.sql("CREATE TABLE cw (a INT, b INT)")
    eng.sql("INSERT INTO cw VALUES (1, 1), (2, 2), (3, 3)")

    # BaseException: models PROCESS DEATH. An Exception-derived error
    # would be caught by the terminal-state wrapper and roll the job
    # back instead of leaving it running for the resume path.
    class Crash(BaseException):
        pass

    def hook(phase, job):
        if phase == crash_at:
            raise Crash()

    eng.ddl_phase_hook = hook
    with pytest.raises(Crash):
        eng.sql("CREATE UNIQUE INDEX ua ON cw (a)")

    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    assert jobs[-1]["status"] == "running"
    jobs[-1]["pid"] = p.pid
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)

    e2 = Engine(spark, wh)
    assert _disk_index_state(wh, "cw", "ua") == C.STATE_PUBLIC
    got = e2.sql("ADMIN SHOW DDL JOBS").df.collect()
    assert got[-1]["STATE"] == "synced"
    with pytest.raises(ValueError, match="1062"):
        e2.sql("INSERT INTO cw VALUES (3, 9)")
    assert _vals(e2, "SELECT a, b FROM cw") == [(1, 1), (2, 2), (3, 3)]
    assert e2.sql("ADMIN CHECK TABLE cw").df.collect()[0]["STATUS"] == "OK"
    e2.close()


# ---------------------------------------------------------------------------
# Review-hardening cases (round-11 continuation): terminal-state
# guarantee for in-process failures, resume of an already-public
# index, and sweeper-vs-live-staging coexistence.
# ---------------------------------------------------------------------------


def test_inprocess_failure_rolls_job_back_not_wedged(eng):
    """An Exception during the job (here: a hook failure standing in
    for a Spark stage error) must NOT leave the job 'running' with a
    live pid — that would refuse all DDL on the table for the life of
    the process. The wrapper rolls the half-built index back; the
    table is immediately DDL-able again."""
    eng.sql("CREATE TABLE ipf (a INT)")
    eng.sql("INSERT INTO ipf VALUES (1)")

    def hook(phase, job):
        if phase == "create_index:write only":
            raise ValueError("injected stage failure")

    eng.ddl_phase_hook = hook
    with pytest.raises(ValueError, match="injected stage failure"):
        eng.sql("CREATE INDEX ia ON ipf (a)")
    eng.ddl_phase_hook = None
    jobs = eng.sql("ADMIN SHOW DDL JOBS").df.collect()
    assert jobs[-1]["STATE"] == "rollback done"
    assert _disk_index_state(eng.catalog.warehouse, "ipf", "ia") == C.STATE_NONE
    # not wedged: DDL on the table proceeds at once
    eng.sql("CREATE INDEX ia ON ipf (a)")
    assert _disk_index_state(eng.catalog.warehouse, "ipf", "ia") == C.STATE_PUBLIC


def test_resume_of_already_public_index_just_closes_job(spark, eng, wh):
    """Crash window between the catalog publish (state=public) and the
    job-file write: the resume path must close the job out, NOT demote
    the completed index back to write-reorg and redo the backfill."""
    eng.sql("CREATE TABLE rp (a INT)")
    eng.sql("INSERT INTO rp VALUES (1), (2)")
    eng.sql("CREATE UNIQUE INDEX ua ON rp (a)")  # completes normally
    # forge the crash window: catalog says public, job says running+dead
    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    assert jobs[-1]["type"] == "create_index"
    jobs[-1]["status"] = "running"
    jobs[-1]["schema_state"] = C.STATE_PUBLIC
    jobs[-1]["pid"] = p.pid
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    files_before = sorted(os.listdir(os.path.join(wh, "default", "rp", "data")))
    e2 = Engine(spark, wh)
    got = e2.sql("ADMIN SHOW DDL JOBS").df.collect()
    assert got[-1]["STATE"] == "synced"
    assert _disk_index_state(wh, "rp", "ua") == C.STATE_PUBLIC
    # no re-backfill: the data files were not rewritten
    files_after = sorted(os.listdir(os.path.join(wh, "default", "rp", "data")))
    assert files_before == files_after
    e2.close()


def test_sweeper_spares_live_reorg_staging(spark, eng, wh):
    """data.reorg-* staging belongs to an hours-long ONLINE job; the
    orphan sweeper must spare it while a running job with a live owner
    claims it, and collect it once the claim is gone."""
    eng.sql("CREATE TABLE sw (a INT)")
    eng.sql("INSERT INTO sw VALUES (1)")
    tdir = os.path.join(wh, "default", "sw")
    live = os.path.join(tdir, "data.reorg-livejob1")
    dead = os.path.join(tdir, "data.reorg-deadjob1")
    os.makedirs(live)
    os.makedirs(dead)
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "create_index",
            "target": "sw",
            "table": "default.sw",
            "query": "CREATE INDEX fake ON sw (a)",
            "status": "running",
            "schema_state": C.STATE_WRITE_REORG,
            "row_count": 0,
            "pid": os.getpid(),  # alive: this claim protects `live`
            "staging": live,
            "index": "fake",
        }
    )
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)  # init runs the sweeper
    assert os.path.isdir(live), "live staging must survive the sweep"
    assert not os.path.exists(dead), "unclaimed reorg dir is crash litter"
    e2.close()


def test_truncate_clears_initial_default_watermarks(eng):
    """TRUNCATE resets rowids to 1; stale fill watermarks would make
    brand-new rows below the old watermark read the DEFAULT instead of
    their real NULL (review finding) — truncation voids the fills."""
    eng.sql("CREATE TABLE twm (k INT)")
    eng.sql("INSERT INTO twm VALUES (1), (2), (3)")
    eng.sql("ALTER TABLE twm ADD COLUMN tag INT DEFAULT 7")
    assert {r.tag for r in eng.sql("SELECT tag FROM twm").df.collect()} == {7}
    eng.sql("TRUNCATE TABLE twm")
    eng.sql("INSERT INTO twm (k, tag) VALUES (1, NULL)")
    eng.sql("INSERT INTO twm (k) VALUES (2)")  # omitted -> declared default
    got = {r.k: r.tag for r in eng.sql("SELECT k, tag FROM twm").df.collect()}
    assert got == {1: None, 2: 7}


# ---------------------------------------------------------------------------
# round-12 hardening (ADVICE r11): snapshot vs in-flight committers,
# job-before-publish crash window, PID reuse, realpath claims
# ---------------------------------------------------------------------------


def test_snapshot_skips_inflight_committer_files(eng):
    """_list_data_files must prune Spark committer staging: a
    concurrent append's task files live under data/_temporary/ (names
    start with part-) until the job commits, then MOVE away — a
    snapshot that includes them fails later when the explicit file-set
    read finds them gone, spuriously rolling an index job back."""
    eng.sql("CREATE TABLE snp (a INT)")
    eng.sql("INSERT INTO snp VALUES (1), (2)")
    data = eng.catalog.data_dir("default", "snp")
    tmpdir = os.path.join(data, "_temporary", "0", "task_x", "attempt_1")
    os.makedirs(tmpdir)
    with open(os.path.join(tmpdir, "part-00000-inflight.parquet"), "wb") as f:
        f.write(b"not yet committed")
    snap = eng._list_data_files("default", "snp")
    assert snap, "committed files still snapshot"
    assert not any("_temporary" in p for p in snap), snap
    # the fake staging must not break reads or maintenance either
    assert _vals(eng, "SELECT a FROM snp") == [(1,), (2,)]
    eng.sql("CREATE INDEX isnp ON snp (a)")
    assert eng.sql("ADMIN CHECK TABLE snp").df.collect()[0]["STATUS"] == "OK"


def test_snapshot_keeps_underscore_named_partition_dirs(eng):
    """Hive partition dirs are `<physical_col>=<value>`, and a column
    name may legally start with '_' (ADVICE r12): the committer-dir
    pruning must not swallow `_p=1/` — that silently dropped the
    partition's rows from every snapshot/COW/online-swap file listing
    while _raw still read them."""
    eng.sql("CREATE TABLE usp (a INT, _p INT) PARTITIONED BY (_p)")
    eng.sql("INSERT INTO usp VALUES (1, 1), (2, 2)")
    data = eng.catalog.data_dir("default", "usp")
    subdirs = [d for d in os.listdir(data) if os.path.isdir(os.path.join(data, d))]
    assert any(d.startswith("_p=") for d in subdirs), subdirs
    snap = eng._list_data_files("default", "usp")
    parts = {p.split(os.sep)[0] for p in snap if os.sep in p}
    assert any(d.startswith("_p=") for d in parts), (
        f"underscore-named partition dirs missing from the snapshot: {snap}"
    )
    # committer staging (no '=') still pruned alongside real partitions
    tmpdir = os.path.join(data, "_temporary", "0")
    os.makedirs(tmpdir)
    with open(os.path.join(tmpdir, "part-00000-x.parquet"), "wb") as f:
        f.write(b"in flight")
    snap2 = eng._list_data_files("default", "usp")
    assert not any("_temporary" in p for p in snap2), snap2
    assert snap <= snap2 and snap2 <= snap
    # snapshot consumers see every row: online index build + check
    eng.sql("CREATE INDEX iusp ON usp (a)")
    assert _vals(eng, "SELECT a FROM usp ORDER BY a") == [(1,), (2,)]
    assert eng.sql("ADMIN CHECK TABLE usp").df.collect()[0]["STATUS"] == "OK"


def test_crash_between_job_record_and_catalog_publish_cancels(spark, eng, wh):
    """The job record lands BEFORE the catalog publishes the
    delete-only index (reference: ddl/ddl.go enqueues the job first).
    The crash window therefore leaves a running job with NO index —
    adopted by the next engine as a cancel, after which the index name
    is immediately reusable (the reverse order left an invisible,
    job-less index that blocked the name until a manual DROP)."""
    eng.sql("CREATE TABLE jw (a INT)")
    eng.sql("INSERT INTO jw VALUES (1), (2)")
    # simulate the crash shape directly: a dead-owner running job
    # whose index never reached the catalog
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "create_index",
            "target": "jw",
            "table": "default.jw",
            "query": "CREATE INDEX ijw ON jw (a)",
            "status": "running",
            "schema_state": C.STATE_DELETE_ONLY,
            "row_count": 0,
            "pid": 2**22 + 12345,  # no such process: owner crashed
            "staging": None,
            "index": "ijw",
        }
    )
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)  # adoption runs at init
    states = {j["id"]: j["status"] for j in e2.ddl_log.load()}
    assert states[jobs[-1]["id"]] == "cancelled"
    # the name is reusable right away
    e2.sql("CREATE INDEX ijw ON jw (a)")
    assert _disk_index_state(wh, "jw", "ijw") == C.STATE_PUBLIC
    e2.close()


def test_pid_reuse_does_not_keep_dead_job_alive():
    """(pid, pid_start) identifies one process INCARNATION: a job
    record whose pid now belongs to a different process (recycled PID
    -> different /proc start time) must read as dead, so running_on
    stops refusing DDL and orphan adoption proceeds (ADVICE r11)."""
    from tinysql_spark.ddljobs import pid_alive, proc_start

    me = os.getpid()
    mine = proc_start(me)
    assert mine is not None, "/proc start time must be readable on linux"
    assert pid_alive(me, mine), "correct incarnation is alive"
    assert not pid_alive(me, mine - 1), "same pid, older start = recycled"
    # records without a start time (pre-round-12 jobs) keep the
    # kill-0 fallback
    assert pid_alive(me, None)


def test_reorg_claim_matched_by_realpath(spark, eng, wh):
    """A live job's staging claim recorded under one path spelling
    must protect the dir from a sweeper that resolves it through a
    symlink (two engines over the same warehouse, different mounts) —
    string equality deleted the other engine's live backfill."""
    eng.sql("CREATE TABLE rp (a INT)")
    eng.sql("INSERT INTO rp VALUES (1)")
    tdir = os.path.join(wh, "default", "rp")
    live = os.path.join(tdir, "data.reorg-realpathjob")
    os.makedirs(live)
    # claim it under a DIFFERENT spelling: via a symlink to the warehouse
    alias = wh + ".alias"
    os.symlink(wh, alias)
    spelled = os.path.join(alias, "default", "rp", "data.reorg-realpathjob")
    from tinysql_spark.ddljobs import proc_start

    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "create_index",
            "target": "rp",
            "table": "default.rp",
            "query": "CREATE INDEX fake ON rp (a)",
            "status": "running",
            "schema_state": C.STATE_WRITE_REORG,
            "row_count": 0,
            "pid": os.getpid(),
            "pid_start": proc_start(os.getpid()),
            "staging": spelled,
            "index": "fake",
        }
    )
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)  # init runs the sweeper
    assert os.path.isdir(live), "realpath-equal claim must protect the dir"
    e2.close()


# ---------------------------------------------------------------------------
# round-12: online MODIFY/CHANGE through the reorg kernel (VERDICT r11 #2;
# reference: ddl/column.go:216 column state chain). The catalog is
# untouched until publish, so data and type land atomically and a
# crashed job simply never happened.
# ---------------------------------------------------------------------------


def test_online_modify_concurrent_insert_cast_adopted(spark, eng, wh):
    """A second session INSERTs (old-type values) between the unlocked
    rewrite and the publish: the publish cast-adopts the delta files,
    so the rows land with the NEW type — nothing lost, nothing stale."""
    eng.sql("CREATE TABLE om (a INT, s INT)")
    eng.sql("INSERT INTO om VALUES (1, 10), (2, 20)")
    other = Engine(spark, wh)
    seen = []

    def hook(phase, job):
        seen.append(phase)
        if phase == "modify_column:backfill done":
            other.sql("INSERT INTO om VALUES (3, 30)")

    eng.ddl_phase_hook = hook
    eng.sql("ALTER TABLE om MODIFY s BIGINT")
    assert "modify_column:published" in seen
    assert _vals(eng, "SELECT a, s FROM om") == [(1, 10), (2, 20), (3, 30)]
    # the column really is BIGINT now (catalog + files agree)
    typ = dict(eng.sql("SELECT a, s FROM om").df.dtypes)["s"]
    assert typ == "bigint"
    jobs = [j for j in eng.ddl_log.load() if j["type"] == "modify_column"]
    assert jobs and jobs[-1]["status"] == "synced" and jobs[-1]["staging"] is None
    other.close()


def test_online_modify_unfit_concurrent_insert_cancels_alter(spark, eng, wh):
    """A concurrent writer inserts a value that does NOT fit the new
    type while the rewrite runs: the publish validation catches it and
    the ALTER cancels — the table keeps its old type and every row,
    including the late insert."""
    eng.sql("CREATE TABLE ou (a INT, s VARCHAR(20))")
    eng.sql("INSERT INTO ou VALUES (1, '10'), (2, '20')")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "modify_column:backfill done":
            other.sql("INSERT INTO ou VALUES (3, 'not a number')")

    eng.ddl_phase_hook = hook
    with pytest.raises(ValueError, match="do not fit"):
        eng.sql("ALTER TABLE ou MODIFY s INT")
    eng.reload()
    assert _vals(eng, "SELECT a, s FROM ou") == [
        (1, "10"), (2, "20"), (3, "not a number"),
    ]
    typ = dict(eng.sql("SELECT a, s FROM ou").df.dtypes)["s"]
    assert typ == "string", "failed ALTER must leave the old type"
    jobs = [j for j in eng.ddl_log.load() if j["type"] == "modify_column"]
    assert jobs and jobs[-1]["status"] == "cancelled"
    other.close()


def test_online_change_renames_and_retypes_with_concurrent_insert(spark, eng, wh):
    eng.sql("CREATE TABLE oc2 (a INT, v INT)")
    eng.sql("INSERT INTO oc2 VALUES (1, 5)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "modify_column:backfill done":
            other.sql("INSERT INTO oc2 VALUES (2, 6)")

    eng.ddl_phase_hook = hook
    eng.sql("ALTER TABLE oc2 CHANGE v big_v BIGINT")
    assert _vals(eng, "SELECT a, big_v FROM oc2") == [(1, 5), (2, 6)]
    assert eng.sql("ADMIN CHECK TABLE oc2").df.collect()[0]["STATUS"] == "OK"
    other.close()


def test_online_modify_redoes_after_concurrent_delete(spark, eng, wh):
    """A concurrent DELETE rewrites snapshot files mid-MODIFY: the
    publish detects the invalidated snapshot and redoes the cast under
    the lock — the deleted row stays deleted, the type still changes."""
    eng.sql("CREATE TABLE ord (a INT, s INT)")
    eng.sql("INSERT INTO ord VALUES (1, 10), (2, 20)")
    eng.sql("INSERT INTO ord VALUES (3, 30)")
    other = Engine(spark, wh)

    def hook(phase, job):
        if phase == "modify_column:backfill done":
            other.sql("DELETE FROM ord WHERE a = 2")

    eng.ddl_phase_hook = hook
    eng.sql("ALTER TABLE ord MODIFY s BIGINT")
    assert _vals(eng, "SELECT a, s FROM ord") == [(1, 10), (3, 30)]
    typ = dict(eng.sql("SELECT a, s FROM ord").df.dtypes)["s"]
    assert typ == "bigint"
    other.close()


def test_crashed_modify_job_never_happened(spark, eng, wh):
    """Orphan modify_column jobs are CANCELLED on adoption (the
    catalog is untouched until publish, so cancel IS the atomic
    statement-never-ran outcome), staging swept, DDL unwedged."""
    eng.sql("CREATE TABLE omc (a INT, s INT)")
    eng.sql("INSERT INTO omc VALUES (1, 10)")
    tdir = os.path.join(wh, "default", "omc")
    staging = os.path.join(tdir, "data.reorg-deadmodify")
    os.makedirs(staging)
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "modify_column",
            "target": "omc",
            "table": "default.omc",
            "query": "ALTER TABLE omc MODIFY s BIGINT",
            "status": "running",
            "schema_state": C.STATE_WRITE_REORG,
            "row_count": 0,
            "pid": 2**22 + 77777,
            "staging": staging,
        }
    )
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)
    states = {j["id"]: j["status"] for j in e2.ddl_log.load()}
    assert states[jobs[-1]["id"]] == "cancelled"
    assert not os.path.exists(staging)
    typ = dict(e2.sql("SELECT s FROM omc").df.dtypes)["s"]
    assert typ == "int", "crashed MODIFY must leave the old type"
    e2.sql("ALTER TABLE omc MODIFY s BIGINT")  # retry works
    assert dict(e2.sql("SELECT s FROM omc").df.dtypes)["s"] == "bigint"
    e2.close()


def test_sweeper_spares_claimed_staging_side_dirs(spark, eng, wh):
    """A live job's claim covers its staging's SIDE dirs too (the
    bucketed rewrite's `<staging>.bparts`, the REPLACE publish's
    `<staging>.delta`): equality-only matching let a concurrent
    engine's sweeper empty a mid-write side dir (review r12 #1)."""
    from tinysql_spark.ddljobs import proc_start

    eng.sql("CREATE TABLE sd (a INT)")
    eng.sql("INSERT INTO sd VALUES (1)")
    tdir = os.path.join(wh, "default", "sd")
    live = os.path.join(tdir, "data.reorg-livejob2")
    live_side = live + ".bparts"
    dead_side = os.path.join(tdir, "data.reorg-unclaimed.delta")
    os.makedirs(live)
    os.makedirs(live_side)
    os.makedirs(dead_side)
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "replace",
            "target": "sd",
            "table": "default.sd",
            "query": "REPLACE INTO sd ...",
            "status": "running",
            "schema_state": C.STATE_WRITE_REORG,
            "row_count": 0,
            "pid": os.getpid(),
            "pid_start": proc_start(os.getpid()),
            "staging": live,
        }
    )
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)  # init runs the sweeper
    assert os.path.isdir(live), "claimed staging survives"
    assert os.path.isdir(live_side), "claimed staging's side dir survives"
    assert not os.path.exists(dead_side), "unclaimed side dir is litter"
    e2.close()


def test_sweeper_claim_is_path_bounded(spark, eng, wh):
    """The claim's prefix match requires a path boundary (ADVICE r12):
    an unclaimed sibling whose NAME merely string-extends a live
    staging's (`data.reorg-ab` vs `data.reorg-abcd1234`) is crash
    litter and must be swept, while the staging itself and its
    '.'-suffixed side dirs stay shielded."""
    from tinysql_spark.ddljobs import proc_start

    eng.sql("CREATE TABLE pb (a INT)")
    eng.sql("INSERT INTO pb VALUES (1)")
    tdir = os.path.join(wh, "default", "pb")
    live = os.path.join(tdir, "data.reorg-ab")
    live_side = live + ".delta"
    # string-prefix sibling: NOT covered by the claim (no boundary)
    litter = os.path.join(tdir, "data.reorg-abcd1234")
    os.makedirs(live)
    os.makedirs(live_side)
    os.makedirs(litter)
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    jobs.append(
        {
            "id": len(jobs) + 1,
            "type": "replace",
            "target": "pb",
            "table": "default.pb",
            "query": "REPLACE INTO pb ...",
            "status": "running",
            "schema_state": C.STATE_WRITE_REORG,
            "row_count": 0,
            "pid": os.getpid(),
            "pid_start": proc_start(os.getpid()),
            "staging": live,
        }
    )
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)  # init runs the sweeper
    assert os.path.isdir(live), "claimed staging survives"
    assert os.path.isdir(live_side), "side dir survives (boundary '.')"
    assert not os.path.exists(litter), (
        "a name that string-extends the claim without a path boundary "
        "is unclaimed litter and must be swept"
    )
    e2.close()


def test_modify_failure_after_swap_rolls_forward(spark, eng, wh):
    """In-process failure between the data swap and the catalog save
    (review r12 #3): the data already carries the new type, so the
    terminal handler must roll the metadata FORWARD — cancelling
    would leave new-typed files under an old-typed schema and every
    read would fail."""
    eng.sql("CREATE TABLE mfp (a INT, s INT)")
    eng.sql("INSERT INTO mfp VALUES (1, 10), (2, 20)")
    real_update = eng.catalog.update
    fired = []

    def boom():
        if not fired:  # only the publish-time save fails
            fired.append(1)
            raise OSError("simulated catalog-save failure")
        real_update()

    def hook(phase, job):
        if phase == "modify_column:backfill done":
            eng.catalog.update = boom  # arm just before the publish

    eng.ddl_phase_hook = hook
    try:
        with pytest.raises(Exception):
            eng.sql("ALTER TABLE mfp MODIFY s BIGINT")
    finally:
        eng.catalog.update = real_update
        eng.ddl_phase_hook = None
    # rolled FORWARD: type changed, data intact, job synced
    assert _vals(eng, "SELECT a, s FROM mfp") == [(1, 10), (2, 20)]
    assert dict(eng.sql("SELECT s FROM mfp").df.dtypes)["s"] == "bigint"
    jobs = [j for j in eng.ddl_log.load() if j["type"] == "modify_column"]
    assert jobs[-1]["status"] == "synced", jobs[-1]
    assert _disk_index_state(wh, "mfp", "nonexistent") == C.STATE_NONE  # sanity


def test_modify_crash_after_swap_resumes_forward(spark, eng, wh):
    """Process DEATH in the same window: the orphaned job is in
    'publishing' with its staging renamed away — adoption must finish
    the publish (metadata forward), not cancel into a broken state."""

    class Death(BaseException):
        pass

    eng.sql("CREATE TABLE mcp (a INT, s INT)")
    eng.sql("INSERT INTO mcp VALUES (1, 10)")
    real_update = eng.catalog.update
    fired = []

    def boom():
        if not fired:
            fired.append(1)
            raise Death()  # BaseException: models process death
        real_update()

    def hook(phase, job):
        if phase == "modify_column:backfill done":
            eng.catalog.update = boom

    eng.ddl_phase_hook = hook
    try:
        with pytest.raises(Death):
            eng.sql("ALTER TABLE mcp MODIFY s BIGINT")
    finally:
        eng.catalog.update = real_update
        eng.ddl_phase_hook = None
    # forge the owner's death, then adopt
    import subprocess

    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    jobs_path = os.path.join(wh, "ddl_jobs.json")
    with open(jobs_path) as f:
        jobs = json.load(f)
    assert jobs[-1]["status"] == "running" and jobs[-1]["schema_state"] == "publishing"
    jobs[-1]["pid"] = p.pid
    with open(jobs_path, "w") as f:
        json.dump(jobs, f)
    e2 = Engine(spark, wh)
    assert _vals(e2, "SELECT a, s FROM mcp") == [(1, 10)]
    assert dict(e2.sql("SELECT s FROM mcp").df.dtypes)["s"] == "bigint"
    got = [j for j in e2.ddl_log.load() if j["type"] == "modify_column"][-1]
    assert got["status"] == "synced", got
    e2.close()
