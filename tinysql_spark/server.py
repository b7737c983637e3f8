"""Line-oriented local-socket front end over ``Engine.sql`` — the
cheapest partial close of the reference's MySQL wire-protocol server
(reference: ``server/server.go`` accept loop, ``server/conn.go:664-667``
command dispatch). SURVEY §2.5 keeps the binary protocol a declared
cut; this gives non-Python clients (netcat, a CI smoke step, any
language with a TCP socket) a way to drive the engine without
implementing it.

**This is NOT the MySQL binary protocol.** The framing is plain text:

- Client sends ONE line per request: a SQL statement, or several
  ``;``-separated statements (the reference's multi-statement
  dispatch, session.go Execute). ``QUIT`` closes the connection.
- Server answers with one BLOCK per statement:
    - result sets:   ``COLS <tab-separated names>`` then one
      ``ROW <tab-separated values>`` line per row (NULL renders as
      ``\\N``, embedded tab/newline/backslash escaped ``\\t \\n \\\\``
      — the MySQL dump text conventions) then ``OK <n> rows``
    - DML/DDL/etc.:  ``OK <rows_affected> <message>``
    - failures:      ``ERR <message>`` (statement-level: later
      statements on the line still run, matching Engine.sql's
      per-statement atomicity)
  and terminates the whole response with a ``READY`` line — clients
  read until READY, so blocks never need length prefixes.

Concurrency: connections are served on daemon threads but statements
execute under one lock — the engine is a single-writer system (DDL
holds a cross-process flock; the session write-buffer is per-Engine),
so the server serializes like one reference session rather than
pretending to be many.
"""

from __future__ import annotations

import socket
import threading

from .engine import Engine

_ESC = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}


def _cell(v) -> str:
    if v is None:
        return "\\N"
    s = str(v)
    for raw, esc in _ESC.items():
        s = s.replace(raw, esc)
    return s


class LineServer:
    """Serve ``Engine.sql`` over a loopback TCP socket (port 0 picks
    an ephemeral port; read it from ``.port`` after ``start()``)."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._sock = socket.create_server((host, port))
        self.host, self.port = self._sock.getsockname()
        self._lock = threading.Lock()  # one statement at a time
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "LineServer":
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass

    # ------------------------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except OSError:
                return  # socket closed
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        with conn, conn.makefile("rw", encoding="utf-8", newline="\n") as f:
            for line in f:
                line = line.strip()
                if not line:
                    f.write("READY\n")
                    f.flush()
                    continue
                if line.upper() == "QUIT":
                    f.write("BYE\n")
                    f.flush()
                    return
                for block in self._run_line(line):
                    f.write(block)
                f.write("READY\n")
                f.flush()

    def _run_line(self, line: str):
        """One response block per statement on the line. Statement
        split + execution both come from the engine (quote/comment-
        aware split; per-statement atomicity), so the server adds
        framing only — no second SQL dialect."""
        from . import sqlparse as P

        try:
            stmts = [s for s in P.split_statements(line) if s.strip()]
        except Exception as e:  # malformed input must not kill the conn
            yield f"ERR {_cell(str(e))}\n"
            return
        if not stmts:
            yield "OK 0 \n"
            return
        for stmt in stmts:
            with self._lock:
                try:
                    res = self.engine.sql(stmt)
                except Exception as e:
                    yield f"ERR {_cell(str(e))}\n"
                    continue
            if res.df is not None:
                rows = res.df.collect()
                cols = res.df.columns
                out = ["COLS " + "\t".join(cols)]
                out.extend(
                    "ROW " + "\t".join(_cell(v) for v in r) for r in rows
                )
                out.append(f"OK {len(rows)} rows")
                yield "\n".join(out) + "\n"
            else:
                yield f"OK {res.rows_affected} {_cell(res.message)}\n"
