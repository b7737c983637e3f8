"""Persistent DDL job queue + history — the reference's DDL job table
re-expressed over the warehouse directory.

Reference surface:
- `ddl/ddl_worker.go:299` handleDDLJobQueue — jobs are enqueued,
  picked up by the owner, and driven through their schema states;
  a restarted owner resumes whatever the dead one left mid-flight.
- `executor/executor.go:205` ShowDDLJobsExec — ADMIN SHOW DDL JOBS
  reads the queue plus the history.

Here one JSON file per warehouse (`ddl_jobs.json`) holds both queue
and history. Every MUTATION happens while the caller holds the
engine's cross-process catalog flock, so read-modify-write is safe;
the file itself is swapped atomically (write-tmp-then-rename) so an
unlocked reader (ADMIN SHOW DDL JOBS) always sees a complete JSON
document. Jobs carry the owning PID: a `running` job whose owner is
dead is an orphan a new engine adopts and rolls forward
(`Engine._resume_orphan_ddl`), exactly the worker-restart path.
"""

from __future__ import annotations

import json
import os
import tempfile


def proc_start(pid: int) -> int | None:
    """The process's kernel start time (clock ticks since boot,
    /proc/<pid>/stat field 22) — the disambiguator that makes PID
    liveness robust to PID reuse: a recycled PID gets a NEW start
    time, so (pid, start) identifies one process incarnation.
    Returns None where /proc is unavailable (then liveness falls
    back to the kill-0 probe alone)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read()
        # comm (field 2) may contain spaces/parens — split AFTER the
        # last ')' per proc(5); start time is field 22 overall, i.e.
        # index 19 of the post-comm fields
        return int(stat.rsplit(b")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


def pid_alive(pid: int, start: int | None = None) -> bool:
    """Is the process incarnation (pid, start) still running? A bare
    kill-0 probe is vulnerable to PID reuse — a recycled PID would
    make a crashed job's record look live forever (blocking all DDL
    on its table) — so when the record carries the owner's start
    time, BOTH must match (ADVICE r11)."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass  # alive under another user — still check the start time
    except OSError:
        return False
    if start is not None:
        current = proc_start(pid)
        if current is not None and current != start:
            return False  # PID recycled: same number, new process
    return True


class DDLJobLog:
    """Dense-id job records: {id, type, target, query, status,
    schema_state, row_count, pid, staging}. ``status`` is the job
    lifecycle (running / synced / cancelled / rollback done — the
    reference's JobState), ``schema_state`` the F1 element state."""

    def __init__(self, warehouse: str):
        self.path = os.path.join(warehouse, "ddl_jobs.json")

    def load(self) -> list[dict]:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return []

    def _save(self, jobs: list[dict]) -> None:
        d = os.path.dirname(self.path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".jobs.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(jobs, f, indent=1)
        os.replace(tmp, self.path)

    def append(self, **fields) -> dict:
        """Add a job (caller holds the catalog lock); returns it with
        its assigned dense id."""
        jobs = self.load()
        job = {
            "id": len(jobs) + 1,
            "type": "",
            "target": "",  # display name, as written in the statement
            "table": "",  # db-qualified — the per-table job-guard key
            "query": "",
            "status": "synced",
            "schema_state": "public",
            "row_count": 0,
            "pid": os.getpid(),
            "pid_start": proc_start(os.getpid()),
            "staging": None,
        }
        job.update(fields)
        jobs.append(job)
        self._save(jobs)
        return job

    def update(self, job_id: int, **fields) -> dict:
        """Mutate one job in place (caller holds the catalog lock)."""
        jobs = self.load()
        for j in jobs:
            if j["id"] == job_id:
                j.update(fields)
                self._save(jobs)
                return j
        raise KeyError(f"ddl job {job_id} not found")

    def running_on(self, table: str) -> dict | None:
        """The live in-flight job on db-qualified ``table``, if any. A
        running job whose owner PID is dead does not count — it is an
        orphan the resume path will adopt, not a reason to refuse new
        DDL."""
        for j in self.load():
            if (
                j["status"] == "running"
                and j.get("table") == table
                and pid_alive(j.get("pid", 0), j.get("pid_start"))
            ):
                return j
        return None

    def orphans(self) -> list[dict]:
        """Running jobs whose owning process is gone (crashed mid-DDL)."""
        return [
            j
            for j in self.load()
            if j["status"] == "running"
            and not pid_alive(j.get("pid", 0), j.get("pid_start"))
        ]
