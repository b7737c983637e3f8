"""Durable per-table footer-stats manifest (VERDICT r13 next #1).

The reference's unique-key probe is a seek into a PERSISTENT secondary
index — durable in the KV store, O(log) from any session
(tablecodec/tablecodec.go:80-87 EncodeIndexSeekKey). Round 13's footer
pruning matched the read shape but kept the "index" session-local: a
fresh session's first point probe into an N-file table opened N parquet
footers serially on the driver before it could prune. Round 14 persists
the per-file key-column min/max in an append-only JSONL sidecar
(`<table_dir>/_stats_manifest.jsonl`) written at every publish point,
so a COLD session prunes from one small manifest read — ZERO footer
opens — and footer reads remain only the fallback for files a crash
published without a record (which the fallback then records back).

Two-source discipline (house rule): the engine's probe_log file counts
are pinned against an independent pyarrow footer scan AND against a
counting spy on pyarrow.parquet.ParquetFile itself.
"""

from __future__ import annotations

import json
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


def _ranged_table(eng, name, n_files=6, per=100):
    eng.sql(f"CREATE TABLE {name} (k INT PRIMARY KEY, v INT)")
    for i in range(n_files):
        lo = i * per + 1
        vals = ", ".join(f"({k}, {k * 10})" for k in range(lo, lo + per))
        eng.sql(f"INSERT INTO {name} VALUES {vals}")


class _FooterSpy:
    """Counting wrapper around pyarrow.parquet.ParquetFile — the
    independent witness that a manifest-served probe opened no
    footers. Delegates, so any genuine fallback still works."""

    def __init__(self):
        self.paths: list[str] = []
        self.real = pq.ParquetFile

    def __call__(self, path, *a, **kw):
        self.paths.append(str(path))
        return self.real(path, *a, **kw)


@pytest.fixture()
def footer_spy(monkeypatch):
    spy = _FooterSpy()
    monkeypatch.setattr(pq, "ParquetFile", spy)
    return spy


def test_publish_writes_manifest_records(eng, wh):
    """Every publish appends the new files' stats: after N single-file
    INSERTs the sidecar holds one record per data file, and each
    record's [min,max] for the key column agrees with the footer."""
    _ranged_table(eng, "mw", n_files=4)
    path = eng._manifest_path("default", "mw")
    assert os.path.exists(path)
    recs = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            recs[r["file"]] = r["cols"]
    live = eng._list_data_files("default", "mw")
    assert set(recs) >= set(live)
    data = eng.catalog.data_dir("default", "mw")
    for rel in live:
        md = pq.ParquetFile(os.path.join(data, rel)).metadata
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == "k" and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        got = recs[rel].get("k")
        if mn is None:
            assert got is None
        else:
            assert got == [mn, mx], (rel, got, mn, mx)


def test_cold_session_point_probe_opens_zero_footers(spark, eng, wh, footer_spy):
    """THE r14 gate: a fresh engine over a warm-manifest warehouse
    runs a point probe without a single pyarrow footer open — the
    manifest is the durable index. The duplicate aborts pre-publish,
    so the WHOLE statement does zero footer opens."""
    _ranged_table(eng, "cold")
    committed = eng._list_data_files("default", "cold")
    assert len(committed) >= 6
    e2 = Engine(spark, wh)
    try:
        footer_spy.paths.clear()
        with pytest.raises(ValueError, match="1062"):
            e2.sql("INSERT INTO cold VALUES (150, 0)")
        assert footer_spy.paths == [], footer_spy.paths
        probes = [p for p in e2.probe_log if p["table"] == "default.cold"]
        assert probes and probes[0]["literal"]
        # manifest-served pruning still points at the covering file(s)
        assert 1 <= probes[0]["files_read"] < probes[0]["files_given"]
    finally:
        e2.close()


def test_missing_manifest_falls_back_and_regenerates(spark, eng, wh, footer_spy):
    """Sidecar deleted (or crash-published files): the probe falls
    back to footer reads ONCE, writes the records back, and the next
    cold session is footer-free again."""
    _ranged_table(eng, "regen")
    path = eng._manifest_path("default", "regen")
    os.unlink(path)
    n_files = len(eng._list_data_files("default", "regen"))
    e2 = Engine(spark, wh)
    try:
        footer_spy.paths.clear()
        with pytest.raises(ValueError, match="1062"):
            e2.sql("INSERT INTO regen VALUES (150, 0)")
        # fallback opened each committed file's footer exactly once
        assert len(footer_spy.paths) == n_files, footer_spy.paths
        assert os.path.exists(path)  # written back
    finally:
        e2.close()
    e3 = Engine(spark, wh)
    try:
        footer_spy.paths.clear()
        with pytest.raises(ValueError, match="1062"):
            e3.sql("INSERT INTO regen VALUES (250, 0)")
        assert footer_spy.paths == [], footer_spy.paths
    finally:
        e3.close()


def test_torn_manifest_tail_is_tolerated(spark, eng, wh, footer_spy):
    """A crash mid-append leaves a torn last line: the loader consumes
    complete lines only, the probe stays correct, and pruning still
    works off the intact records."""
    _ranged_table(eng, "torn")
    path = eng._manifest_path("default", "torn")
    with open(path, "ab") as f:
        f.write(b'{"file": "part-torn", "cols": {"k": [99')  # no newline
    e2 = Engine(spark, wh)
    try:
        footer_spy.paths.clear()
        with pytest.raises(ValueError, match="1062"):
            e2.sql("INSERT INTO torn VALUES (150, 0)")
        assert footer_spy.paths == []  # intact records served the probe
        probes = [p for p in e2.probe_log if p["table"] == "default.torn"]
        assert probes[0]["files_read"] < probes[0]["files_given"]
        e2.sql("INSERT INTO torn VALUES (100000, 0)")  # fresh key fine
    finally:
        e2.close()


def test_manifest_compacts_dead_records(eng, wh):
    """COW churn retires file names; once dead records dominate 4x the
    live set the publish hook compacts the sidecar (tmp+rename) down
    to live files only — the sidecar tracks table SIZE, not write
    history."""
    eng.sql("CREATE TABLE cmp (k INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO cmp VALUES (1, 1), (2, 2)")
    path = eng._manifest_path("default", "cmp")
    live = eng._list_data_files("default", "cmp")
    # synthesize a long retired-file history (names are never reused,
    # so dead records are exactly this shape)
    with open(path, "a") as f:
        for i in range(200):
            f.write(
                json.dumps(
                    {"file": f"part-dead-{i:04d}.parquet", "cols": {"k": [0, 0]}}
                )
                + "\n"
            )
    # next publish triggers the compaction sweep
    eng.sql("INSERT INTO cmp VALUES (3, 3)")
    with open(path) as f:
        recs = [json.loads(line) for line in f]
    live = eng._list_data_files("default", "cmp")
    assert {r["file"] for r in recs} == set(live)
    assert len(recs) <= 4 * max(len(live), 16)
    # and the probe still enforces uniqueness off the compacted sidecar
    with pytest.raises(ValueError, match="1062"):
        eng.sql("INSERT INTO cmp VALUES (1, 9)")


def test_compound_key_prunes_on_all_columns(eng, wh, footer_spy):
    """VERDICT r13 wrong #1: a unique key (src, id) with a 3-value
    leading column must prune on the ID column's ranges, not degrade
    to src-overlap (= every file). Two-source: probe_log files_read
    vs an independent pyarrow footer scan over the id column."""
    eng.sql("CREATE TABLE ck (src INT, id INT, v INT, UNIQUE KEY sk (src, id))")
    n_files, per = 6, 60
    for i in range(n_files):
        lo = i * per + 1
        vals = ", ".join(
            f"({s}, {k}, {k * 10})" for k in range(lo, lo + per) for s in (1, 2, 3)
        )
        eng.sql(f"INSERT INTO ck VALUES {vals}")
    # independent witness: id-overlap of the probe key
    data = eng.catalog.data_dir("default", "ck")
    target = 130
    id_overlap = 0
    for rel in sorted(eng._list_data_files("default", "ck")):
        md = pq.ParquetFile(os.path.join(data, rel)).metadata
        if md.num_row_groups == 0:
            continue  # empty part file: zero rows, always prunable
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == "id" and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        if mn is None or mn <= target <= mx:
            id_overlap += 1
    assert id_overlap < n_files  # layout really is id-ranged
    eng.probe_log.clear()
    with pytest.raises(ValueError, match="1062"):
        eng.sql(f"INSERT INTO ck VALUES (2, {target}, 0)")
    probes = [p for p in eng.probe_log if p["table"] == "default.ck"]
    assert probes and probes[0]["literal"]
    assert probes[0]["files_read"] == id_overlap, (probes, id_overlap)
    # same discipline on the REPLACE attribution path
    eng.probe_log.clear()
    eng.sql(f"REPLACE INTO ck VALUES (2, {target}, 777)")
    rp = [p for p in eng.probe_log if p["key"] == ("replace",)]
    assert rp and rp[0]["files_read"] == id_overlap, (rp, id_overlap)
    rows = eng.sql(f"SELECT v FROM ck WHERE src = 2 AND id = {target}").df.collect()
    assert [tuple(r) for r in rows] == [(777,)]
