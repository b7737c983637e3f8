"""Socket round-trip tests for the wire-protocol-lite line server
(VERDICT r10 item 6): query + error + multi-statement over a real TCP
connection, plus the escaping rules. The server is explicitly NOT the
MySQL binary protocol — these tests pin the documented text framing."""

from __future__ import annotations

import socket

import pytest

from tinysql_spark.engine import Engine
from tinysql_spark.server import LineServer


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("srvwh")))
    s = LineServer(eng).start()
    yield s
    s.close()


class _Client:
    def __init__(self, srv: LineServer):
        self.sock = socket.create_connection((srv.host, srv.port))
        self.f = self.sock.makefile("rw", encoding="utf-8", newline="\n")

    def ask(self, line: str) -> list[str]:
        """Send one request line, read lines until READY."""
        self.f.write(line + "\n")
        self.f.flush()
        out = []
        for resp in self.f:
            resp = resp.rstrip("\n")
            if resp == "READY":
                return out
            out.append(resp)
        raise AssertionError(f"connection closed before READY: {out}")

    def quit(self) -> str:
        self.f.write("QUIT\n")
        self.f.flush()
        bye = self.f.readline().rstrip("\n")
        self.sock.close()
        return bye


def test_server_query_error_multistatement(srv):
    c = _Client(srv)
    assert c.ask("CREATE TABLE srv_t (k int, v varchar(32))") == [
        "OK 0 table srv_t created"
    ]
    assert c.ask("INSERT INTO srv_t VALUES (1, 'a'), (2, NULL)") == [
        "OK 2 2 rows inserted"
    ]
    got = c.ask("SELECT k, v FROM srv_t ORDER BY k")
    assert got == ["COLS k\tv", "ROW 1\ta", "ROW 2\t\\N", "OK 2 rows"]
    # error block: statement fails, connection survives
    err = c.ask("SELECT nope FROM srv_t")
    assert len(err) == 1 and err[0].startswith("ERR ")
    # multi-statement line: one block per statement, errors don't stop
    # later statements (Engine.sql per-statement atomicity)
    blocks = c.ask(
        "INSERT INTO srv_t VALUES (3, 'c'); SELECT count(*) AS n FROM srv_t; "
        "INSERT INTO srv_t VALUES (1, 'x', 99); SELECT max(k) AS mk FROM srv_t"
    )
    assert blocks[0] == "OK 1 1 rows inserted"
    assert blocks[1:4] == ["COLS n", "ROW 3", "OK 1 rows"]
    assert blocks[4].startswith("ERR ")
    assert blocks[5:] == ["COLS mk", "ROW 3", "OK 1 rows"]
    assert c.quit() == "BYE"


def test_server_escaping_and_second_connection(srv):
    """Values containing the framing characters escape per the MySQL
    dump text conventions; a second connection sees the first one's
    committed data (one engine, one warehouse)."""
    c = _Client(srv)
    c.ask("CREATE TABLE srv_e (s varchar(64))")
    assert c.ask(r"INSERT INTO srv_e VALUES ('tab\there')") == [
        "OK 1 1 rows inserted"
    ]
    got = c.ask("SELECT s FROM srv_e")
    assert got == ["COLS s", "ROW tab\\there", "OK 1 rows"]
    c.quit()
    c2 = _Client(srv)
    got = c2.ask("SELECT count(*) AS n FROM srv_t")
    assert got == ["COLS n", "ROW 3", "OK 1 rows"]
    # blank line is a no-op keepalive
    assert c2.ask("") == []
    c2.quit()
