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


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return False
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
                and pid_alive(j.get("pid", 0))
            ):
                return j
        return None

    def orphans(self) -> list[dict]:
        """Running jobs whose owning process is gone (crashed mid-DDL)."""
        return [
            j
            for j in self.load()
            if j["status"] == "running" and not pid_alive(j.get("pid", 0))
        ]
