"""Seeded differential SQL fuzz (SURVEY §5 randomized-testing layer —
the reference's suite leans on randomized/differential checks; this is
the engine-level analog): generate bounded random SELECTs in the
MySQL/DuckDB common dialect, run each through BOTH `Engine.sql` and
DuckDB over the SAME parquet, and compare canonicalized row sets.

Scope is deliberately the COMMON subset so every divergence is a real
engine bug, not a dialect gap: projections/arithmetic on numeric and
string columns, AND/OR/NOT predicates with comparisons and IN/BETWEEN/
LIKE, COUNT/SUM/AVG/MIN/MAX with GROUP BY [HAVING], ORDER BY + LIMIT.
Known-divergent surfaces stay out by construction: division
(MySQL NULL vs DuckDB error on /0), per-row double rounding (HALF_UP
vs HALF_EVEN — the house rule: round aggregates only, sum->2 avg->4),
and the date column in projections (python date vs pandas Timestamp
rendering); dates appear only inside predicates as string comparisons.

The generator is SEEDED — failures reproduce by seed, and the corpus
is stable across runs (no flaky CI).
"""

from __future__ import annotations

import math
import random

import pytest

from tinysql_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
GROUP_COLS = ["o_orderstatus", "o_orderpriority"]

STR_VALS = {
    "o_orderstatus": ["'O'", "'F'", "'P'"],
    "o_orderpriority": ["'1-URGENT'", "'2-HIGH'", "'3-MEDIUM'"],
}


def _pred(rng: random.Random) -> str:
    kind = rng.choice(["numcmp", "strcmp", "in", "between", "like", "date"])
    if kind == "numcmp":
        c = rng.choice(NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        v = rng.choice([0, 1, 500, 750, 1000, 1200, 100000, 150000])
        return f"{c} {op} {v}"
    if kind == "strcmp":
        c = rng.choice(STR_COLS)
        return f"{c} {rng.choice(['=', '<>'])} {rng.choice(STR_VALS[c])}"
    if kind == "in":
        c = rng.choice(GROUP_COLS)
        return f"{c} IN ({', '.join(STR_VALS[c][:2])})"
    if kind == "between":
        c = rng.choice(["o_orderkey", "o_custkey", "o_totalprice"])
        lo = rng.choice([0, 100, 500])
        return f"{c} BETWEEN {lo} AND {lo + rng.choice([200, 1000, 100000])}"
    if kind == "like":
        return "o_orderpriority LIKE '%HIGH%'" if rng.random() < 0.5 else "o_orderstatus LIKE 'O%'"
    return f"o_orderdate {rng.choice(['<', '>='])} '{rng.choice(['1994-06-01', '1996-01-01', '1997-09-15'])}'"


def _where(rng: random.Random) -> str:
    n = rng.choice([0, 1, 1, 2, 2, 3])
    if n == 0:
        return ""
    parts = [_pred(rng) for _ in range(n)]
    glue = f" {rng.choice(['AND', 'OR'])} "
    body = glue.join(parts)
    if rng.random() < 0.2:
        body = f"NOT ({body})"
    return f" WHERE {body}"


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    if rng.random() < 0.5:  # aggregate form
        g = rng.choice(GROUP_COLS)
        aggs = rng.sample(
            [
                "CAST(COUNT(*) AS BIGINT) AS n",
                "CAST(SUM(o_orderkey) AS BIGINT) AS s_key",
                "ROUND(SUM(o_totalprice), 2) AS s_price",
                "ROUND(AVG(o_totalprice), 4) AS a_price",
                "CAST(MIN(o_orderkey) AS BIGINT) AS mn",
                "CAST(MAX(o_custkey) AS BIGINT) AS mx",
            ],
            k=rng.choice([1, 2, 3]),
        )
        having = " HAVING COUNT(*) > 1" if rng.random() < 0.3 else ""
        return (
            f"SELECT {g}, {', '.join(aggs)} FROM orders"
            f"{_where(rng)} GROUP BY {g}{having}"
        )
    # projection form
    cols = rng.sample(NUM_COLS + STR_COLS, k=rng.choice([2, 3, 4]))
    exprs = list(cols)
    if rng.random() < 0.5:
        a, b = rng.sample(["o_orderkey", "o_custkey"], k=2)
        exprs.append(f"CAST({a} {rng.choice(['+', '-', '*'])} {b} AS BIGINT) AS calc")
    q = f"SELECT {', '.join(exprs)} FROM orders{_where(rng)}"
    if rng.random() < 0.4:
        q += f" ORDER BY {rng.choice(cols)}, o_orderkey LIMIT {rng.choice([7, 25, 100])}"
    return q


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


@pytest.fixture(scope="module")
def fuzz_eng(spark, tmp_path_factory):
    e = Engine(spark, str(tmp_path_factory.mktemp("fuzzwh")))
    e.attach_testdata(SF_DIR)
    return e


@pytest.fixture(scope="module")
def fuzz_duck():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(40))
def test_differential_sql_fuzz(fuzz_eng, fuzz_duck, seed):
    sql = gen_query(seed)
    sdf = fuzz_eng.sql(sql).df.toPandas()
    ddf = fuzz_duck.execute(sql).df()
    a = sorted(
        tuple(_canon(x) for x in r)
        for r in sdf[sorted(sdf.columns)].itertuples(index=False)
    )
    b = sorted(
        tuple(_canon(x) for x in r)
        for r in ddf[sorted(ddf.columns)].itertuples(index=False)
    )
    # ORDER BY ... LIMIT can tie-break differently across engines ONLY
    # if the sort key set is non-unique; the generator always appends
    # o_orderkey (unique) to ORDER BY, so row SETS must match exactly.
    assert [c.lower() for c in sorted(sdf.columns)] == [
        c.lower() for c in sorted(ddf.columns)
    ], sql
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# Join-form fuzz: orders x customer through the same differential gate
# ---------------------------------------------------------------------------

MKT_VALS = ["'AUTOMOBILE'", "'BUILDING'", "'FURNITURE'", "'HOUSEHOLD'", "'MACHINERY'"]


def gen_join_query(seed: int) -> str:
    rng = random.Random(seed * 7919 + 13)
    join_kind = rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
    on = "o.o_custkey = c.c_custkey"
    preds = []
    if rng.random() < 0.7:
        preds.append(f"c.c_mktsegment {rng.choice(['=', '<>'])} {rng.choice(MKT_VALS)}")
    if rng.random() < 0.5:
        preds.append(f"o.o_totalprice {rng.choice(['<', '>='])} {rng.choice([50000, 120000, 200000])}")
    if rng.random() < 0.3:
        preds.append(f"c.c_acctbal {rng.choice(['<', '>='])} {rng.choice([0, 2500, 7500])}")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    if rng.random() < 0.5:  # aggregate form
        g = rng.choice(["c.c_mktsegment", "o.o_orderstatus", "c.c_nationkey"])
        aggs = rng.sample(
            [
                "CAST(COUNT(*) AS BIGINT) AS n",
                "ROUND(SUM(o.o_totalprice), 2) AS s_price",
                "CAST(MIN(o.o_orderkey) AS BIGINT) AS mn",
                "CAST(MAX(o.o_custkey) AS BIGINT) AS mx",
                "CAST(COUNT(c.c_name) AS BIGINT) AS n_cust",
            ],
            k=rng.choice([1, 2]),
        )
        # LEFT JOIN + aggregate on the right side exercises null groups
        return (
            f"SELECT {g} AS grp, {', '.join(aggs)} FROM orders o "
            f"{join_kind} customer c ON {on}{where} GROUP BY {g}"
        )
    cols = ["o.o_orderkey", "c.c_custkey"] + rng.sample(
        ["o.o_orderstatus", "c.c_mktsegment", "c.c_name", "o.o_orderpriority"],
        k=rng.choice([1, 2]),
    )
    q = f"SELECT {', '.join(cols)} FROM orders o {join_kind} customer c ON {on}{where}"
    if rng.random() < 0.4:
        q += f" ORDER BY o.o_orderkey LIMIT {rng.choice([11, 50])}"
    return q


@pytest.fixture(scope="module")
def fuzz_duck2(fuzz_duck):
    fuzz_duck.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    return fuzz_duck


@pytest.mark.parametrize("seed", range(25))
def test_differential_join_fuzz(fuzz_eng, fuzz_duck2, seed):
    sql = gen_join_query(seed)
    sdf = fuzz_eng.sql(sql).df.toPandas()
    ddf = fuzz_duck2.execute(sql).df()
    a = sorted(
        tuple(_canon(x) for x in r)
        for r in sdf[sorted(sdf.columns)].itertuples(index=False)
    )
    b = sorted(
        tuple(_canon(x) for x in r)
        for r in ddf[sorted(ddf.columns)].itertuples(index=False)
    )
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# Subquery-form fuzz: EXISTS / IN (SELECT ...) / scalar subqueries
# ---------------------------------------------------------------------------


def gen_subquery_query(seed: int) -> str:
    rng = random.Random(seed * 104729 + 7)
    form = rng.choice(["exists", "not_exists", "in", "not_in", "scalar"])
    inner_pred = rng.choice(
        [
            "c.c_acctbal < 0",
            "c.c_mktsegment = 'BUILDING'",
            "c.c_nationkey < 10",
            "c.c_acctbal >= 5000",
        ]
    )
    outer_pred = rng.choice(
        [
            "", " AND o.o_orderstatus = 'O'",
            " AND o.o_totalprice >= 100000",
        ]
    )
    if form in ("exists", "not_exists"):
        neg = "NOT " if form == "not_exists" else ""
        return (
            "SELECT o.o_orderkey, o.o_custkey FROM orders o "
            f"WHERE {neg}EXISTS (SELECT 1 FROM customer c "
            f"WHERE c.c_custkey = o.o_custkey AND {inner_pred}){outer_pred}"
        )
    if form in ("in", "not_in"):
        neg = "NOT " if form == "not_in" else ""
        # NOT IN over a guaranteed non-NULL key column (c_custkey) —
        # NULL-aware NOT IN semantics are pinned separately by q39
        return (
            "SELECT o.o_orderkey, o.o_orderstatus FROM orders o "
            f"WHERE o.o_custkey {neg}IN (SELECT c.c_custkey FROM customer c "
            f"WHERE {inner_pred}){outer_pred}"
        )
    agg = rng.choice(["AVG(o2.o_totalprice)", "MAX(o2.o_totalprice) * 0.5"])
    return (
        "SELECT o.o_orderkey, o.o_custkey FROM orders o "
        f"WHERE o.o_totalprice > (SELECT {agg} FROM orders o2){outer_pred}"
    )


@pytest.mark.parametrize("seed", range(20))
def test_differential_subquery_fuzz(fuzz_eng, fuzz_duck2, seed):
    sql = gen_subquery_query(seed)
    sdf = fuzz_eng.sql(sql).df.toPandas()
    ddf = fuzz_duck2.execute(sql).df()
    a = sorted(
        tuple(_canon(x) for x in r)
        for r in sdf[sorted(sdf.columns)].itertuples(index=False)
    )
    b = sorted(
        tuple(_canon(x) for x in r)
        for r in ddf[sorted(ddf.columns)].itertuples(index=False)
    )
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# DISTINCT / multi-column grouping forms
# ---------------------------------------------------------------------------


def _canon_rows(df) -> list[tuple]:
    return sorted(
        tuple(_canon(x) for x in r)
        for r in df[sorted(df.columns)].itertuples(index=False)
    )


def gen_distinct_query(seed: int) -> str:
    rng = random.Random(seed * 31337 + 101)
    form = rng.choice(["distinct", "count_distinct", "multi_group"])
    if form == "distinct":
        cols = rng.sample(STR_COLS + ["o_custkey"], k=rng.choice([1, 2]))
        return f"SELECT DISTINCT {', '.join(cols)} FROM orders{_where(rng)}"
    if form == "count_distinct":
        g = rng.choice(GROUP_COLS)
        return (
            f"SELECT {g}, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd "
            f"FROM orders{_where(rng)} GROUP BY {g}"
        )
    return (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(o_orderkey) AS BIGINT) AS mx "
        f"FROM orders{_where(rng)} GROUP BY o_orderstatus, o_orderpriority"
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_distinct_fuzz(fuzz_eng, fuzz_duck, seed):
    sql = gen_distinct_query(seed)
    sdf = fuzz_eng.sql(sql).df.toPandas()
    ddf = fuzz_duck.execute(sql).df()
    a = sorted(
        tuple(_canon(x) for x in r)
        for r in sdf[sorted(sdf.columns)].itertuples(index=False)
    )
    b = sorted(
        tuple(_canon(x) for x in r)
        for r in ddf[sorted(ddf.columns)].itertuples(index=False)
    )
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# WRITE-path fuzz (VERDICT r9 item 1): seeded random statement SEQUENCES
# — CREATE TABLE, INSERT VALUES / INSERT..SELECT, REPLACE, DELETE,
# TRUNCATE, BEGIN/COMMIT/ROLLBACK — executed through BOTH the ENGINE
# warehouse (rowid assignment, unique-key checks, append/anti-join/
# atomic-swap machinery, txn overlay) and DuckDB, comparing per-
# statement affected-row counts AND the FINAL table state. This is the
# randomized analog of the reference's TestDMLStmt gate
# (executor/write_test.go); the read surface already has 100 cases.
#
# Dialect mapping is minimal and semantic-preserving by construction:
# REPLACE INTO -> INSERT OR REPLACE INTO (identical on a single-PK
# table with no other unique index, and the generator never emits
# duplicate keys within one REPLACE statement — DuckDB rejects those),
# TRUNCATE TABLE -> DELETE FROM, and rolled-back transaction interiors
# simply never reach DuckDB (the net effect MUST be nothing — which is
# exactly the overlay property under test).
# ---------------------------------------------------------------------------


def gen_write_sequence(seed: int) -> list[tuple[str, str | None, bool]]:
    """Return [(engine_sql, duck_sql | None, check_rowcount)] — a full
    statement sequence over a fresh table w{seed}. duck_sql None means
    engine-only (txn control statements, rolled-back interiors)."""
    rng = random.Random(seed * 257 + 911)
    tbl = f"w{seed}"
    has_pk = rng.random() < 0.7
    pk = " PRIMARY KEY" if has_pk else ""
    ddl = f"CREATE TABLE {tbl} (k BIGINT{pk}, v BIGINT, s VARCHAR(255))"
    ops: list[tuple[str, str | None, bool]] = [(ddl, ddl, False)]
    hi = 1000  # next fresh key; monotone — keys are NEVER reused, so
    # PK inserts cannot conflict by construction (conflict ERRORS are
    # example-tested; the fuzz exercises the success paths' state)

    def fresh(n: int) -> list[int]:
        nonlocal hi
        ks = list(range(hi, hi + n))
        hi += n
        return ks

    def ins_values() -> tuple[str, str, bool]:
        n = rng.randint(1, 5)
        ks = fresh(n) if has_pk else [rng.randrange(2000) for _ in range(n)]
        rows = []
        for k in ks:
            v = "NULL" if rng.random() < 0.15 else str(rng.randrange(2000))
            s = "NULL" if rng.random() < 0.1 else rng.choice(["'O'", "'F'", "'P'", "'x'"])
            rows.append(f"({k}, {v}, {s})")
        sql = f"INSERT INTO {tbl} VALUES {', '.join(rows)}"
        return (sql, sql, True)

    def ins_select() -> tuple[str, str, bool]:
        nonlocal hi
        a = rng.choice([0, 100, 400, 900])
        b = a + rng.choice([40, 120, 300])
        sql = (
            f"INSERT INTO {tbl} (k, v, s) SELECT o_orderkey + {hi}, "
            f"o_custkey, o_orderstatus FROM orders "
            f"WHERE o_orderkey BETWEEN {a} AND {b}"
        )
        hi += 10000  # max o_orderkey at sf0.001 is 1499 < 10000
        return (sql, sql, True)

    def delete() -> tuple[str, str, bool]:
        if rng.random() < 0.08:
            sql = f"DELETE FROM {tbl}"
            return (sql, sql, True)
        s_lit = rng.choice(["'O'", "'F'", "'x'"])
        choices = [
            f"k % {rng.choice([2, 3, 5, 7])} = {rng.choice([0, 1])}",
            f"v < {rng.choice([300, 800, 1500])}",
            f"s = {s_lit}",
            f"k BETWEEN {rng.randrange(1500)} AND {rng.randrange(1500, max(hi, 1501))}",
        ]
        pred = f" {rng.choice(['AND', 'OR'])} ".join(
            rng.sample(choices, rng.choice([1, 1, 2]))
        )
        sql = f"DELETE FROM {tbl} WHERE {pred}"
        return (sql, sql, True)

    def replace() -> tuple[str, str, bool]:
        n = rng.randint(1, 4)
        # keys below 3000: a mix of live, deleted, and never-existed —
        # distinct within the statement (see dialect note above)
        ks = rng.sample(range(min(hi, 3000)), n)
        rows = ", ".join(f"({k}, {rng.randrange(5000, 9000)}, 'R')" for k in ks)
        return (
            f"REPLACE INTO {tbl} VALUES {rows}",
            f"INSERT OR REPLACE INTO {tbl} VALUES {rows}",
            False,  # MySQL REPLACE counts delete+insert; state is the check
        )

    def truncate() -> tuple[str, str, bool]:
        return (f"TRUNCATE TABLE {tbl}", f"DELETE FROM {tbl}", False)

    ops.append(ins_values())  # seed the table
    kinds = [ins_values, ins_select, delete, delete]
    if has_pk:
        kinds.append(replace)
    for _ in range(rng.randint(4, 7)):
        op = truncate if rng.random() < 0.06 else rng.choice(kinds)
        ops.append(op())
    if rng.random() < 0.5:  # one transaction group: COMMIT or ROLLBACK
        commit = rng.random() < 0.5
        inner = [
            (ins_values if rng.random() < 0.6 else delete)()
            for _ in range(rng.randint(1, 3))
        ]
        ops.append(("BEGIN", None, False))
        # inside the txn: counts not compared (overlay bookkeeping is
        # example-tested); rolled-back interiors never reach DuckDB
        ops.extend((e, d if commit else None, False) for e, d, _ in inner)
        ops.append(("COMMIT" if commit else "ROLLBACK", None, False))
        ops.append(ins_values())  # post-txn write over the published state
    return ops


@pytest.mark.parametrize("seed", range(50))
def test_differential_write_fuzz(fuzz_eng, fuzz_duck, seed):
    ops = gen_write_sequence(seed)
    # mid-sequence READ checkpoints (every 5th seed, to bound runtime):
    # after each statement that reached BOTH engines, a cheap aggregate
    # must already agree — catching intermediate-state divergence the
    # final-state compare alone would mask (e.g. a wrong-then-rewritten
    # rowid). Checkpoints live in the TEST loop, not the generator, so
    # the seeded statement corpus stays byte-stable.
    checkpointed = seed % 5 == 0
    chk = (
        f"SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv, "
        f"CAST(min(k) AS BIGINT) AS mn, CAST(max(k) AS BIGINT) AS mx FROM w{seed}"
    )
    for eng_sql, duck_sql, check in ops:
        r = fuzz_eng.sql(eng_sql)
        if duck_sql is not None:
            d = fuzz_duck.execute(duck_sql)
            if check:
                n_duck = d.fetchall()[0][0]
                assert r.rows_affected == n_duck, (
                    f"seed {seed} count diverged ({r.rows_affected} vs "
                    f"{n_duck}):\n{eng_sql}"
                )
            if checkpointed:
                a = _canon_rows(fuzz_eng.sql(chk).df.toPandas())
                b = _canon_rows(fuzz_duck.execute(chk).df())
                assert a == b, f"seed {seed} mid-sequence diverged after:\n{eng_sql}"
    sel = f"SELECT k, v, s FROM w{seed}"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, (
        f"seed {seed} final state diverged ({len(a)} vs {len(b)} rows):\n"
        + "\n".join(e for e, _, _ in ops)
    )
    # engine-side invariant audit over the randomly-built table:
    # rowid handles, NOT NULL, unique keys (ErrAdminCheckTable analog)
    chk_rows = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE w{seed}").df.collect()]
    assert chk_rows and all(r[-1] == "OK" for r in chk_rows), (seed, chk_rows)


# ---------------------------------------------------------------------------
# Schema-EVOLUTION fuzz (SURVEY §7.20 item 1, pulled into round 10):
# ALTER TABLE ADD/RENAME/DROP COLUMN mid-sequence, then writes/deletes
# that use the evolved schema (rename/drop exercise the engine's
# metadata-only physical-name mapping layer against DuckDB's rewrite
# — reads of the surviving columns must agree exactly).
# Constraints that keep the dialect mapping
# semantic-preserving: no DEFAULT (a HISTORICAL constraint kept for
# corpus byte-stability — the engine now fills pre-existing rows
# MySQL-style via the initial-default watermark, and the separate
# default-evolution corpus below covers exactly that),
# ALTERs never inside a txn group (the engine's DDL implicitly
# commits — MySQL semantics DuckDB's session txns don't share), and
# inserts after an ALTER list their columns explicitly.
# A separate generator so the original 50-sequence corpus stays
# byte-stable (its contract is reproducibility by seed).
# ---------------------------------------------------------------------------


def gen_evolve_sequence(
    seed: int,
) -> tuple[list[tuple[str, str | None, bool]], list[str]]:
    """Return (ops, final_select_columns) over a fresh table e{seed}."""
    rng = random.Random(seed * 104003 + 77)
    tbl = f"e{seed}"
    has_pk = rng.random() < 0.7
    pk = " PRIMARY KEY" if has_pk else ""
    ddl = f"CREATE TABLE {tbl} (k BIGINT{pk}, v BIGINT, s VARCHAR(255))"
    ops: list[tuple[str, str | None, bool]] = [(ddl, ddl, False)]
    extra: list[str] = []
    hi = 1000

    def fresh(n: int) -> list[int]:
        nonlocal hi
        ks = list(range(hi, hi + n))
        hi += n
        return ks

    def ins_values() -> tuple[str, str, bool]:
        n = rng.randint(1, 4)
        ks = fresh(n) if has_pk else [rng.randrange(2000) for _ in range(n)]
        cols = ["k", "v", "s"] + extra
        rows = []
        for k in ks:
            vals = [str(k)]
            vals.append("NULL" if rng.random() < 0.15 else str(rng.randrange(2000)))
            vals.append(
                "NULL" if rng.random() < 0.1 else rng.choice(["'O'", "'F'", "'x'"])
            )
            for _c in extra:
                vals.append("NULL" if rng.random() < 0.3 else str(rng.randrange(100)))
            rows.append(f"({', '.join(vals)})")
        sql = (
            f"INSERT INTO {tbl} ({', '.join(cols)}) VALUES {', '.join(rows)}"
        )
        return (sql, sql, True)

    def ins_select() -> tuple[str, str, bool]:
        # unlisted post-ALTER columns fill NULL in both engines
        nonlocal hi
        a = rng.choice([0, 200, 700])
        sql = (
            f"INSERT INTO {tbl} (k, v, s) SELECT o_orderkey + {hi}, "
            f"o_custkey, o_orderstatus FROM orders "
            f"WHERE o_orderkey BETWEEN {a} AND {a + rng.choice([30, 90])}"
        )
        hi += 10000
        return (sql, sql, True)

    n_named = 0

    def alter_add() -> tuple[str, str, bool]:
        nonlocal n_named
        n_named += 1
        name = f"c{n_named}"
        extra.append(name)
        sql = f"ALTER TABLE {tbl} ADD COLUMN {name} BIGINT"
        return (sql, sql, False)

    def alter_rename() -> tuple[str, str, bool]:
        # engine: metadata-only rename through the physical-name
        # mapping layer; DuckDB renames in place — reads must agree
        nonlocal n_named
        old = rng.choice(extra)
        n_named += 1
        new = f"r{n_named}"
        extra[extra.index(old)] = new
        sql = f"ALTER TABLE {tbl} RENAME COLUMN {old} TO {new}"
        return (sql, sql, False)

    def alter_drop() -> tuple[str, str, bool]:
        # engine: metadata-only drop (pruning hides the data); DuckDB
        # rewrites — the remaining columns must read identically
        c = extra.pop(rng.randrange(len(extra)))
        sql = f"ALTER TABLE {tbl} DROP COLUMN {c}"
        return (sql, sql, False)

    def delete() -> tuple[str, str, bool]:
        choices = [
            f"k % {rng.choice([2, 3, 5])} = 0",
            f"v < {rng.choice([300, 900])}",
        ]
        if extra:
            c = rng.choice(extra)
            choices.append(rng.choice([f"{c} < 50", f"{c} IS NULL"]))
        pred = f" {rng.choice(['AND', 'OR'])} ".join(
            rng.sample(choices, rng.choice([1, 2]))
        )
        sql = f"DELETE FROM {tbl} WHERE {pred}"
        return (sql, sql, True)

    ops.append(ins_values())
    ops.append(alter_add())  # every sequence evolves at least once
    kinds = [ins_values, ins_values, ins_select, delete]
    for _ in range(rng.randint(4, 6)):
        roll = rng.random()
        if roll < 0.15 and len(extra) < 3:
            op = alter_add
        elif roll < 0.25 and extra:
            op = alter_rename
        elif roll < 0.32 and extra:
            op = alter_drop
        else:
            op = rng.choice(kinds)
        ops.append(op())
    return ops, ["k", "v", "s"] + extra


@pytest.mark.parametrize("seed", range(25))
def test_differential_schema_evolution_fuzz(fuzz_eng, fuzz_duck, seed):
    ops, cols = gen_evolve_sequence(seed)
    for eng_sql, duck_sql, check in ops:
        r = fuzz_eng.sql(eng_sql)
        if duck_sql is not None:
            d = fuzz_duck.execute(duck_sql)
            if check:
                n_duck = d.fetchall()[0][0]
                assert r.rows_affected == n_duck, (
                    f"seed {seed} count diverged ({r.rows_affected} vs "
                    f"{n_duck}):\n{eng_sql}"
                )
    sel = f"SELECT {', '.join(cols)} FROM e{seed}"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, (
        f"seed {seed} final state diverged ({len(a)} vs {len(b)} rows):\n"
        + "\n".join(e for e, _, _ in ops)
    )
    # the evolved table must also pass the engine's invariant audit
    chk_rows = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE e{seed}").df.collect()]
    assert chk_rows and all(r[-1] == "OK" for r in chk_rows), (seed, chk_rows)


# ---------------------------------------------------------------------------
# Window-function fuzz (VERDICT r9 item 7): ranking / offset / framed-
# aggregate forms — Spark-delegated, so any divergence is a dialect-
# shim bug. Determinism by construction: every ORDER BY inside a
# window ends with o_orderkey (unique), ties in RANK/DENSE_RANK are a
# pure function of the sort key, and running sums add in a fixed
# order. Per the house rounding rule, double window-aggregates round
# to 2dp (sum) / 4dp (avg).
# ---------------------------------------------------------------------------


def gen_window_query(seed: int) -> str:
    rng = random.Random(seed * 52361 + 3)
    p = rng.choice(GROUP_COLS)
    form = rng.choice(
        ["rank", "dense_rank", "row_number", "lag", "lead", "cumsum", "winavg"]
    )
    if form in ("rank", "dense_rank"):
        expr = (
            f"CAST({form.upper()}() OVER (PARTITION BY {p} "
            "ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rnk"
        )
    elif form == "row_number":
        expr = (
            f"CAST(ROW_NUMBER() OVER (PARTITION BY {p} "
            "ORDER BY o_orderkey) AS BIGINT) AS rnk"
        )
    elif form in ("lag", "lead"):
        off = rng.choice([1, 2])
        expr = (
            f"CAST({form.upper()}(o_orderkey, {off}) OVER (PARTITION BY {p} "
            "ORDER BY o_orderkey) AS BIGINT) AS nbr"
        )
    elif form == "cumsum":
        expr = (
            f"ROUND(SUM(o_totalprice) OVER (PARTITION BY {p} "
            "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW), 2) AS cum"
        )
    else:
        expr = (
            f"ROUND(AVG(o_totalprice) OVER (PARTITION BY {p}), 4) AS a_price"
        )
    return f"SELECT o_orderkey, {p}, {expr} FROM orders{_where(rng)}"


@pytest.mark.parametrize("seed", range(15))
def test_differential_window_fuzz(fuzz_eng, fuzz_duck, seed):
    sql = gen_window_query(seed)
    a = _canon_rows(fuzz_eng.sql(sql).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sql).df())
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# Set-operation fuzz: INTERSECT / EXCEPT / UNION [ALL] — both engines
# implement standard bag/set semantics (INTERSECT and EXCEPT are
# DISTINCT forms in Spark and DuckDB alike).
# ---------------------------------------------------------------------------


def gen_setop_query(seed: int) -> str:
    rng = random.Random(seed * 90001 + 17)
    op = rng.choice(["INTERSECT", "EXCEPT", "UNION", "UNION ALL"])
    if rng.random() < 0.4:  # cross-table key form: orders keys vs customer keys
        lhs = f"SELECT o_custkey AS k FROM orders{_where(rng)}"
        rhs = "SELECT c_custkey AS k FROM customer"
        if rng.random() < 0.6:
            rhs += f" WHERE c_acctbal {rng.choice(['<', '>='])} {rng.choice([0, 2500, 7500])}"
        return f"{lhs} {op} {rhs}"
    cols = rng.choice(
        ["o_orderstatus", "o_orderstatus, o_orderpriority", "o_custkey"]
    )
    return (
        f"SELECT {cols} FROM orders{_where(rng)} {op} "
        f"SELECT {cols} FROM orders{_where(rng)}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_differential_setop_fuzz(fuzz_eng, fuzz_duck2, seed):
    sql = gen_setop_query(seed)
    a = _canon_rows(fuzz_eng.sql(sql).df.toPandas())
    b = _canon_rows(fuzz_duck2.execute(sql).df())
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# Scalar-function fuzz (SURVEY §7.20 item 5, pulled into round 10):
# CASE WHEN nesting, string functions, COALESCE/NULLIF — the mysql.py
# registry surfaces the predicate corpus exercises only via
# comparisons. Stays in the MySQL/DuckDB common dialect: SUBSTR is
# 1-based in both, || is unavailable in MySQL so CONCAT() is used,
# and no division (the known /0 divergence).
# ---------------------------------------------------------------------------


def gen_scalar_query(seed: int) -> str:
    rng = random.Random(seed * 777767 + 5)
    form = rng.choice(["case", "case_nested", "string", "coalesce", "nullif"])
    if form == "case":
        thr = rng.choice([50000, 120000, 200000])
        expr = (
            f"CASE WHEN o_totalprice < {thr} THEN 'small' "
            f"WHEN o_orderstatus = 'O' THEN 'open' ELSE 'big' END AS cls"
        )
    elif form == "case_nested":
        expr = (
            "CASE WHEN o_orderstatus = 'O' THEN "
            "  CASE WHEN o_custkey % 2 = 0 THEN 'open-even' ELSE 'open-odd' END "
            f"WHEN o_orderpriority IN ({', '.join(STR_VALS['o_orderpriority'][:2])}) "
            "THEN 'closed-hot' ELSE 'closed-cold' END AS cls"
        )
    elif form == "string":
        expr = rng.choice(
            [
                "UPPER(SUBSTR(o_orderpriority, 3, 4)) AS cls",
                "CONCAT(o_orderstatus, '-', SUBSTR(o_orderpriority, 1, 1)) AS cls",
                "LOWER(o_orderpriority) AS cls",
                f"CAST(LENGTH(o_orderpriority) + {rng.choice([0, 7])} AS BIGINT) AS cls",
            ]
        )
    elif form == "coalesce":
        # NULLIF makes a NULL stream; COALESCE repairs it — both
        # engines 3VL-identical
        expr = (
            "COALESCE(NULLIF(o_orderstatus, 'O'), 'was-open') AS cls"
        )
    else:
        expr = f"NULLIF(o_custkey % {rng.choice([3, 5])}, 0) AS cls"
    agg = rng.random() < 0.5
    if agg:
        return (
            f"SELECT {expr}, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(MIN(o_orderkey) AS BIGINT) AS mn "
            f"FROM orders{_where(rng)} GROUP BY cls"
        )
    return f"SELECT o_orderkey, {expr} FROM orders{_where(rng)}"


@pytest.mark.parametrize("seed", range(20))
def test_differential_scalar_fuzz(fuzz_eng, fuzz_duck, seed):
    sql = gen_scalar_query(seed)
    a = _canon_rows(fuzz_eng.sql(sql).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sql).df())
    assert a == b, f"seed {seed} diverged:\n{sql}\nspark rows {len(a)} duck rows {len(b)}"


# ---------------------------------------------------------------------------
# String-vs-number comparison corpus (round 13, VERDICT r12 next #2 —
# NEW section, existing seeds untouched per house rule): the engine
# rewrites string-vs-int comparisons to REAL (getBaseCmpType ETReal);
# DuckDB would ERROR casting '12.5' to INTEGER, so the duck twin gets
# the EXPLICIT real form (TRY_CAST .. AS DOUBLE) — engine(MySQL form)
# must equal duck(real form) row for row.
# ---------------------------------------------------------------------------

_SN_STRS = ["12.5", "0.5", "-4.5", "1e2", "9", "12", " 3.5 ", "0.0", "abc", ""]
_SN_OPS = ["=", "<>", "<", "<=", ">", ">="]


def gen_strnum_pair(seed: int) -> tuple[str, str]:
    """(engine_sql, duck_sql): same comparisons, MySQL coercion form
    vs explicit-real form."""
    rng = random.Random(10_000 + seed)
    eng_exprs, duck_exprs = [], []
    for i in range(rng.choice([2, 3, 4])):
        s, op = rng.choice(_SN_STRS), rng.choice(_SN_OPS)
        if rng.random() < 0.5:
            num = rng.choice([-5, 0, 9, 12, 13, 100])
            if rng.random() < 0.5:
                e, d = f"('{s}' {op} {num})", f"(TRY_CAST('{s}' AS DOUBLE) {op} {num})"
            else:
                e, d = f"({num} {op} '{s}')", f"({num} {op} TRY_CAST('{s}' AS DOUBLE))"
        else:
            col = rng.choice(["ik", "bk"])
            if rng.random() < 0.5:
                e, d = f"({col} {op} '{s}')", f"({col} {op} TRY_CAST('{s}' AS DOUBLE))"
            else:
                e, d = f"('{s}' {op} {col})", f"(TRY_CAST('{s}' AS DOUBLE) {op} {col})"
        eng_exprs.append(f"{e} AS c{i}")
        duck_exprs.append(f"{d} AS c{i}")
    base = "SELECT k, {} FROM strnum_t ORDER BY k"
    return base.format(", ".join(eng_exprs)), base.format(", ".join(duck_exprs))


@pytest.fixture(scope="module")
def strnum_tables(fuzz_eng, fuzz_duck):
    ddl = "CREATE TABLE strnum_t (k BIGINT PRIMARY KEY, ik INT, bk BIGINT)"
    ins = (
        "INSERT INTO strnum_t VALUES (1, 12, 12), (2, 13, 13), (3, 0, 0), "
        "(4, -5, -5), (5, 100, 100), (6, NULL, NULL), (7, 9, 9)"
    )
    fuzz_eng.sql(ddl)
    fuzz_eng.sql(ins)
    fuzz_duck.execute(ddl)
    fuzz_duck.execute(ins)
    return fuzz_eng, fuzz_duck


@pytest.mark.parametrize("seed", range(15))
def test_differential_strnum_compare_fuzz(strnum_tables, seed):
    eng, duck = strnum_tables
    e_sql, d_sql = gen_strnum_pair(seed)
    a = _canon_rows(eng.sql(e_sql).df.toPandas())
    b = _canon_rows(duck.execute(d_sql).df())
    assert a == b, f"seed {seed} diverged:\n{e_sql}\n{d_sql}\n{a[:5]}\n{b[:5]}"


# ---------------------------------------------------------------------------
# Error-path differential checks (SURVEY §7.20 item 3, pulled into
# round 10): statements that must FAIL must fail in BOTH engines, and
# — the stronger property — must leave the table state UNCHANGED and
# still equal across engines (statement atomicity: the engine checks
# constraints before any append, so a half-applied batch is the bug
# class this pins; the reference's write_test.go negative cases are
# the example-based analog).
# ---------------------------------------------------------------------------

_ERR_CASES = [
    ("dup_pk_batch", "INSERT INTO err_t VALUES (50, 1, 'x'), (50, 2, 'y')"),
    ("dup_pk_existing", "INSERT INTO err_t VALUES (60, 1, 'x'), (1, 2, 'y')"),
    ("not_null", "INSERT INTO err_t VALUES (70, NULL, 'x')"),
    ("unknown_col", "INSERT INTO err_t (k, v, nope) VALUES (80, 1, 'x')"),
    ("arity_more", "INSERT INTO err_t VALUES (90, 1, 'x', 99)"),
    ("arity_less", "INSERT INTO err_t VALUES (95)"),
    ("unknown_table", "INSERT INTO err_nosuch VALUES (1)"),
    ("delete_unknown_col", "DELETE FROM err_t WHERE nope = 1"),
    # omitted no-default NOT NULL column: errno 1364 in the engine
    # (static strict-mode check, distinct from not_null's 1048 above);
    # DuckDB rejects it as a NOT NULL violation at execution
    ("omitted_not_null_1364", "INSERT INTO err_t (k, s) VALUES (99, 'x')"),
]


@pytest.fixture(scope="module")
def err_tables(fuzz_eng, fuzz_duck):
    ddl = "CREATE TABLE err_t (k BIGINT PRIMARY KEY, v BIGINT NOT NULL, s VARCHAR(255))"
    ins = "INSERT INTO err_t VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, NULL)"
    fuzz_eng.sql(ddl)
    fuzz_eng.sql(ins)
    fuzz_duck.execute(ddl)
    fuzz_duck.execute(ins)
    return fuzz_eng, fuzz_duck


@pytest.mark.parametrize("name,bad", _ERR_CASES)
def test_differential_error_paths(err_tables, name, bad):
    eng, duck = err_tables
    with pytest.raises(Exception):
        eng.sql(bad)
    with pytest.raises(Exception):
        duck.execute(bad)
    sel = "SELECT k, v, s FROM err_t"
    a = _canon_rows(eng.sql(sel).df.toPandas())
    b = _canon_rows(duck.execute(sel).df())
    assert a == b and len(a) == 3, (name, a, b)


# ---------------------------------------------------------------------------
# Interleaved MIXED-KIND fuzz (SURVEY §7.20-r11 item 1, pulled into
# round 10): one generator emits writes, reads, schema evolution,
# must-fail statements, and transactions in a single random sequence —
# cross-surface interleavings the separated corpora cannot produce
# (a read planned right after an ALTER, an error mid-txn, a rollback
# after evolution). Reads compare IMMEDIATELY (inside committed txns
# the engine answers from its read-your-writes overlay, DuckDB from
# applied state — they must agree); must-fail statements are
# state-independent by construction (in-batch dup keys, unknown
# columns/tables, arity) so "fails in both" holds at any point.
# ---------------------------------------------------------------------------


def gen_mixed_sequence(
    seed: int,
) -> tuple[list[tuple[str, str | None, str]], list[str]]:
    """Return (ops, final_select_cols); each op is (engine_sql,
    duck_sql | None, kind) with kind in: none (just execute),
    dml_count (compare affected rows), read (compare result rows
    immediately), error (must raise in both engines),
    error_eng_only (must raise in the engine; DuckDB never sees it —
    rolled-back txn interiors)."""
    rng = random.Random(seed * 424243 + 11)
    tbl = f"mx{seed}"
    has_pk = rng.random() < 0.7
    pk = " PRIMARY KEY" if has_pk else ""
    ddl = f"CREATE TABLE {tbl} (k BIGINT{pk}, v BIGINT, s VARCHAR(255))"
    ops: list[tuple[str, str | None, str]] = [(ddl, ddl, "none")]
    extra: list[str] = []
    hi, n_named = 1000, 0

    def fresh(n: int) -> list[int]:
        nonlocal hi
        ks = list(range(hi, hi + n))
        hi += n
        return ks

    def ins_values() -> tuple[str, str, str]:
        n = rng.randint(1, 4)
        ks = fresh(n) if has_pk else [rng.randrange(2000) for _ in range(n)]
        cols = ["k", "v", "s"] + extra
        rows = []
        for k in ks:
            vals = [str(k)]
            vals.append("NULL" if rng.random() < 0.15 else str(rng.randrange(2000)))
            vals.append("NULL" if rng.random() < 0.1 else rng.choice(["'O'", "'F'", "'x'"]))
            vals += [
                "NULL" if rng.random() < 0.3 else str(rng.randrange(100))
                for _ in extra
            ]
            rows.append(f"({', '.join(vals)})")
        sql = f"INSERT INTO {tbl} ({', '.join(cols)}) VALUES {', '.join(rows)}"
        return (sql, sql, "dml_count")

    def ins_select() -> tuple[str, str, str]:
        nonlocal hi
        a = rng.choice([0, 300, 800])
        sql = (
            f"INSERT INTO {tbl} (k, v, s) SELECT o_orderkey + {hi}, "
            f"o_custkey, o_orderstatus FROM orders "
            f"WHERE o_orderkey BETWEEN {a} AND {a + rng.choice([25, 80])}"
        )
        hi += 10000
        return (sql, sql, "dml_count")

    def delete() -> tuple[str, str, str]:
        preds = [
            f"k % {rng.choice([2, 3, 5])} = 0",
            f"v < {rng.choice([400, 1000])}",
            "s = 'O'",
        ]
        if extra:
            preds.append(f"{rng.choice(extra)} IS NULL")
        sql = f"DELETE FROM {tbl} WHERE {rng.choice(preds)}"
        return (sql, sql, "dml_count")

    def replace() -> tuple[str, str, str]:
        ks = rng.sample(range(min(hi, 2500)), rng.randint(1, 3))
        rows = ", ".join(f"({k}, {rng.randrange(5000, 9000)}, 'R')" for k in ks)
        return (
            f"REPLACE INTO {tbl} VALUES {rows}"
            if not extra
            else f"REPLACE INTO {tbl} (k, v, s) VALUES {rows}",
            f"INSERT OR REPLACE INTO {tbl} (k, v, s) VALUES {rows}",
            "none",
        )

    def read() -> tuple[str, str, str]:
        form = rng.choice(["agg", "agg", "filter"])
        if form == "agg":
            sql = (
                f"SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv, "
                f"CAST(min(k) AS BIGINT) AS mn, CAST(max(k) AS BIGINT) AS mx FROM {tbl}"
            )
        else:
            sql = f"SELECT k, v FROM {tbl} WHERE k % {rng.choice([2, 3])} = 0"
        return (sql, sql, "read")

    def alter_op() -> tuple[str, str, str]:
        nonlocal n_named
        roll = rng.random()
        if extra and roll < 0.3:
            c = extra.pop(rng.randrange(len(extra)))
            sql = f"ALTER TABLE {tbl} DROP COLUMN {c}"
        elif extra and roll < 0.55:
            old = rng.choice(extra)
            n_named += 1
            extra[extra.index(old)] = f"r{n_named}"
            sql = f"ALTER TABLE {tbl} RENAME COLUMN {old} TO r{n_named}"
        else:
            n_named += 1
            extra.append(f"c{n_named}")
            sql = f"ALTER TABLE {tbl} ADD COLUMN c{n_named} BIGINT"
        return (sql, sql, "none")

    def error_stmt() -> tuple[str, str, str]:
        pool = [
            f"INSERT INTO {tbl} (k, v, nope_col) VALUES (1, 1, 1)",
            f"INSERT INTO {tbl} (k, v, s) VALUES (1, 1)",
            f"INSERT INTO mx_nosuch VALUES (1)",
            f"DELETE FROM {tbl} WHERE nope_col = 1",
        ]
        if has_pk:
            x = fresh(1)[0]  # burn a fresh key: in-batch dup, always fails
            pool.append(f"INSERT INTO {tbl} (k, v, s) VALUES ({x}, 1, 'a'), ({x}, 2, 'b')")
        return (rng.choice(pool), None, "error_both")

    def optimize_op() -> tuple[str, str | None, str]:
        # layout rewrite must be INVISIBLE to every later read and to
        # the final-state compare — DuckDB never sees it (no analog);
        # the zorder form exercises the Morton rewrite on the two
        # always-present numeric columns (v is nullable — the
        # null-key path rides along)
        sql = (
            f"OPTIMIZE TABLE {tbl} ZORDER BY (k, v)"
            if rng.random() < 0.5
            else f"OPTIMIZE TABLE {tbl}"
        )
        return (sql, None, "none")

    ops.append(ins_values())
    kinds = [ins_values, ins_select, delete, read, read]
    if has_pk:
        kinds.append(replace)
    for _ in range(rng.randint(6, 9)):
        roll = rng.random()
        if roll < 0.15:
            ops.append(alter_op())
        elif roll < 0.22:
            ops.append(optimize_op())
        elif roll < 0.35:
            e, _d, _k = error_stmt()
            ops.append((e, e, "error"))
        else:
            ops.append(rng.choice(kinds)())
    if rng.random() < 0.6:  # txn group with reads and maybe an error inside
        commit = rng.random() < 0.5
        ops.append(("BEGIN", None, "none"))
        for _ in range(rng.randint(1, 3)):
            roll = rng.random()
            if roll < 0.2:
                e, _d, _k = error_stmt()
                # engine must raise mid-txn (statement-level rollback);
                # DuckDB sees it only when the group commits
                ops.append((e, e if commit else None, "error" if commit else "error_eng_only"))
            else:
                e, d, _k = (ins_values if roll < 0.7 else delete)()
                ops.append((e, d if commit else None, "none"))
                if commit and rng.random() < 0.5:
                    e, d, _k = read()  # read-your-writes vs duck applied
                    ops.append((e, d, "read"))
        ops.append(("COMMIT" if commit else "ROLLBACK", None, "none"))
        ops.append(ins_values())
    return ops, ["k", "v", "s"] + extra


@pytest.mark.parametrize("seed", range(25))
def test_differential_mixed_fuzz(fuzz_eng, fuzz_duck, seed):
    ops, cols = gen_mixed_sequence(seed)
    for eng_sql, duck_sql, kind in ops:
        if kind in ("error", "error_eng_only"):
            with pytest.raises(Exception):
                fuzz_eng.sql(eng_sql)
            if kind == "error" and duck_sql is not None:
                with pytest.raises(Exception):
                    fuzz_duck.execute(duck_sql)
            continue
        r = fuzz_eng.sql(eng_sql)
        if duck_sql is None:
            continue
        d = fuzz_duck.execute(duck_sql)
        if kind == "dml_count":
            n_duck = d.fetchall()[0][0]
            assert r.rows_affected == n_duck, f"seed {seed} count diverged:\n{eng_sql}"
        elif kind == "read":
            a = _canon_rows(r.df.toPandas())
            b = _canon_rows(d.df())
            assert a == b, f"seed {seed} read diverged:\n{eng_sql}"
    sel = f"SELECT {', '.join(cols)} FROM mx{seed}"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, f"seed {seed} final state diverged ({len(a)} vs {len(b)})"
    chk = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE mx{seed}").df.collect()]
    assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


def test_unsigned_differential_vs_duckdb(fuzz_eng, fuzz_duck):
    """The round-10 unsigned close gets an EXTERNAL oracle: the same
    statement sequence over the engine's BIGINT UNSIGNED (DECIMAL(20,0)
    mapping) and DuckDB's native UBIGINT must agree on every read —
    including values above 2^63 that the old LongType mapping wrapped
    negative."""
    fuzz_eng.sql("CREATE TABLE ub (k BIGINT UNSIGNED PRIMARY KEY, v BIGINT)")
    fuzz_duck.execute("CREATE TABLE ub (k UBIGINT PRIMARY KEY, v BIGINT)")
    top = 18446744073709551615
    stmts = [
        f"INSERT INTO ub VALUES ({top}, 1), ({top - 7}, 2), (42, 3), "
        f"(9223372036854775808, 4)",  # 2^63: the wrap boundary
        "DELETE FROM ub WHERE v = 2",
        f"INSERT INTO ub VALUES (9223372036854775807, 5)",  # 2^63 - 1
    ]
    for s in stmts:
        fuzz_eng.sql(s)
        fuzz_duck.execute(s)
    for sel in [
        "SELECT k, v FROM ub",
        "SELECT k, v FROM ub WHERE k > 9223372036854775807",
        # VARCHAR casts: DuckDB's pandas bridge renders wide decimals
        # as float64 and would lose exactness in the COMPARISON (the
        # values themselves are exact in both engines)
        "SELECT CAST(count(*) AS BIGINT) AS n, CAST(min(k) AS VARCHAR(64)) AS mn, "
        "CAST(max(k) AS VARCHAR(64)) AS mx, "
        "CAST(CAST(sum(k) AS DECIMAL(38,0)) AS VARCHAR(64)) AS sk FROM ub",
        "SELECT CAST(k % 1000 AS BIGINT) AS km, v FROM ub WHERE k >= 42",
    ]:
        a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
        b = _canon_rows(fuzz_duck.execute(sel).df())
        assert a == b, (sel, a, b)
    # boundary must-fails, BOTH engines: -1 and 2^64 are out of
    # UBIGINT range in DuckDB and errno-1264 rejects in the engine;
    # neither may mutate state (the r10 close accepted 2^64 silently)
    import pytest

    for bad in ("INSERT INTO ub VALUES (-1, 9)",
                f"INSERT INTO ub VALUES ({top + 1}, 9)"):
        with pytest.raises(ValueError, match=r"\(errno 1264\)"):
            fuzz_eng.sql(bad)
        with pytest.raises(Exception):
            fuzz_duck.execute(bad)
    sel = "SELECT CAST(count(*) AS BIGINT) AS n FROM ub"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, (a, b)


# ---------------------------------------------------------------------------
# TYPED-column differential fuzz (VERDICT r10 item 3): the write /
# evolution / mixed generators above run on integer k/v tables; this
# corpus randomizes the SCHEMA — DECIMAL(10,2), DATETIME, BOOLEAN,
# VARCHAR, and every unsigned width — so the q69-class cast-on-write
# path and the round-11 unsigned range close get external signal.
# The reference tests typed DML hardest (executor/write_test.go).
# Reads cast to stable comparison types (DECIMAL→DOUBLE, temporal and
# u64→VARCHAR) because the pandas bridges of the two engines render
# wide decimals differently, not because values differ.
# ---------------------------------------------------------------------------

# name, engine type, duck type, unsigned max (None = signed/non-integer)
_TYPED_POOL = [
    ("dc", "DECIMAL(10,2)", "DECIMAL(10,2)", None),
    ("dt", "DATETIME", "TIMESTAMP", None),
    ("ok", "BOOLEAN", "BOOLEAN", None),
    ("vs", "VARCHAR(32)", "VARCHAR", None),
    ("u1", "TINYINT UNSIGNED", "UTINYINT", 255),
    ("u2", "SMALLINT UNSIGNED", "USMALLINT", 65535),
    ("u4", "INT UNSIGNED", "UINTEGER", 4294967295),
    ("u8", "BIGINT UNSIGNED", "UBIGINT", 18446744073709551615),
]


def _typed_value(rng: random.Random, name: str, mx: int | None) -> str:
    if rng.random() < 0.12:
        return "NULL"
    if name == "dc":
        return f"{rng.randrange(-9999, 9999)}.{rng.randrange(100):02d}"
    if name == "dt":
        return (
            f"'2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} "
            f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00'"
        )
    if name == "ok":
        return rng.choice(["TRUE", "FALSE"])
    if name == "vs":
        return rng.choice(["'alpha'", "'beta'", "'gamma'", "'delta'"])
    # unsigned: bias toward the boundary region where wraps would show
    return str(rng.choice([0, 1, mx, mx - 1, rng.randrange(mx + 1)]))


def gen_typed_sequence(seed: int):
    """Return (ddl_eng, ddl_duck, ops) — ops are (eng_sql, duck_sql,
    kind) with kind in none/read/error, over a randomly-typed table."""
    rng = random.Random(seed * 911171 + 29)
    tbl = f"ty{seed}"
    cols = [_TYPED_POOL[i] for i in sorted(rng.sample(range(len(_TYPED_POOL)), rng.randint(3, 5)))]
    ddl_e = f"CREATE TABLE {tbl} (k BIGINT PRIMARY KEY, " + ", ".join(
        f"{n} {te}" for n, te, _td, _m in cols
    ) + ")"
    ddl_d = f"CREATE TABLE {tbl} (k BIGINT PRIMARY KEY, " + ", ".join(
        f"{n} {td}" for n, _te, td, _m in cols
    ) + ")"
    hi = 0

    def sel_cols() -> str:
        casts = ["k"]
        for n, _te, _td, mx in cols:
            if n == "dc":
                casts.append("CAST(dc AS DOUBLE) AS dc")
            elif n == "dt":
                casts.append("CAST(dt AS VARCHAR(32)) AS dt")
            elif mx is not None and mx > 2**32:
                casts.append(f"CAST({n} AS VARCHAR(32)) AS {n}")
            elif mx is not None:
                casts.append(f"CAST({n} AS BIGINT) AS {n}")
            else:
                casts.append(n)
        return ", ".join(casts)

    ops = []

    def insert():
        nonlocal hi
        n = rng.randint(1, 4)
        rows = []
        for _ in range(n):
            hi += 1
            rows.append(
                f"({hi}, " + ", ".join(_typed_value(rng, c, m) for c, _t, _d, m in cols) + ")"
            )
        sql = f"INSERT INTO {tbl} VALUES {', '.join(rows)}"
        ops.append((sql, sql, "none"))

    def delete():
        preds = ["k % 3 = 0"]
        for n, _te, _td, mx in cols:
            if n == "dc":
                preds.append("dc < 0")
            elif n == "dt":
                preds.append("dt < '2024-06-01 00:00:00'")
            elif n == "ok":
                preds.append("ok = TRUE")
            elif n == "vs":
                preds.append("vs = 'beta'")
            elif mx is not None:
                preds.append(f"{n} > {mx // 2}")
        sql = f"DELETE FROM {tbl} WHERE {rng.choice(preds)}"
        ops.append((sql, sql, "none"))

    def read():
        sql = f"SELECT {sel_cols()} FROM {tbl}"
        ops.append((sql, sql, "read"))

    def boundary_error():
        uns = [(n, mx) for n, _te, _td, mx in cols if mx is not None]
        if not uns:
            return
        nonlocal hi
        hi += 1
        n, mx = rng.choice(uns)
        bad = rng.choice([-1, mx + 1])
        vals = []
        for c, _te, _td, m in cols:
            vals.append(str(bad) if c == n else _typed_value(rng, c, m))
        # re-roll NULL on the target column so the bad value lands
        vals = [str(bad) if (c == n) else v for (c, *_), v in zip(cols, vals)]
        sql = f"INSERT INTO {tbl} VALUES ({hi}, {', '.join(vals)})"
        ops.append((sql, sql, "error"))

    insert()
    for _ in range(rng.randint(7, 10)):
        roll = rng.random()
        if roll < 0.45:
            insert()
        elif roll < 0.62:
            delete()
        elif roll < 0.82:
            read()
        else:
            boundary_error()
    read()
    return ddl_e, ddl_d, ops


@pytest.mark.parametrize("seed", range(25))
def test_differential_typed_fuzz(fuzz_eng, fuzz_duck, seed):
    ddl_e, ddl_d, ops = gen_typed_sequence(seed)
    fuzz_eng.sql(ddl_e)
    fuzz_duck.execute(ddl_d)
    for step, (e_sql, d_sql, kind) in enumerate(ops):
        if kind == "error":
            with pytest.raises(Exception):
                fuzz_eng.sql(e_sql)
            with pytest.raises(Exception):
                fuzz_duck.execute(d_sql)
            continue
        fuzz_eng.sql(e_sql)
        fuzz_duck.execute(d_sql)
        if kind == "read":
            a = _canon_rows(fuzz_eng.sql(e_sql).df.toPandas())
            b = _canon_rows(fuzz_duck.execute(d_sql).df())
            assert a == b, f"seed {seed} step {step} diverged:\n{e_sql}"
    tbl = f"ty{seed}"
    chk = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()]
    assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


def test_cast_unsigned_wrap_differential(fuzz_eng, fuzz_duck):
    """CAST(x AS UNSIGNED) parity vs DuckDB (VERDICT r10 item 2):
    non-negatives compare against native CAST(x AS UBIGINT); the wrap
    side (negative x -> x + 2^64) compares against explicit HUGEINT
    arithmetic, since DuckDB's UBIGINT cast rejects negatives rather
    than wrapping. VARCHAR render on both sides keeps the comparison
    exact past float64 precision."""
    fuzz_eng.sql("CREATE TABLE cw (k BIGINT PRIMARY KEY, x BIGINT)")
    fuzz_duck.execute("CREATE TABLE cw (k BIGINT PRIMARY KEY, x BIGINT)")
    vals = [0, 1, 42, 2**31, 2**63 - 1, -1, -2, -42, -(2**63), -(2**31)]
    ins = "INSERT INTO cw VALUES " + ", ".join(
        f"({i}, {v})" for i, v in enumerate(vals)
    )
    fuzz_eng.sql(ins)
    fuzz_duck.execute(ins)
    a = _canon_rows(
        fuzz_eng.sql(
            "SELECT k, CAST(CAST(x AS UNSIGNED) AS VARCHAR(32)) AS u FROM cw"
        ).df.toPandas()
    )
    b = _canon_rows(
        fuzz_duck.execute(
            "SELECT k, CAST(CASE WHEN x < 0 "
            "THEN CAST(x AS HUGEINT) + 18446744073709551616 "
            "ELSE CAST(x AS UBIGINT) END AS VARCHAR) AS u FROM cw"
        ).df()
    )
    assert a == b, (a, b)
    # non-negative slice also agrees with DuckDB's NATIVE UBIGINT cast
    a = _canon_rows(
        fuzz_eng.sql(
            "SELECT k, CAST(CAST(x AS UNSIGNED) AS VARCHAR(32)) AS u "
            "FROM cw WHERE x >= 0"
        ).df.toPandas()
    )
    b = _canon_rows(
        fuzz_duck.execute(
            "SELECT k, CAST(CAST(x AS UBIGINT) AS VARCHAR) AS u "
            "FROM cw WHERE x >= 0"
        ).df()
    )
    assert a == b, (a, b)


# ---------------------------------------------------------------------------
# TYPED schema-EVOLUTION fuzz (round 11): the evolution corpus above
# ALTERs only BIGINT columns; this one ADDs randomly-TYPED columns
# (DECIMAL/DATETIME/BOOLEAN/VARCHAR + every unsigned width) mid-
# sequence, writes through them, renames/drops them, and injects
# unsigned boundary must-fails AFTER the ALTER — so the ALTER ADD
# COLUMN ... UNSIGNED close and the cast-on-write path get randomized
# signal on the evolved-schema surface too. Same dialect constraints
# as gen_evolve_sequence (no DEFAULT, ALTERs never inside a txn,
# explicit column lists after an ALTER); reads cast to the stable
# comparison types the typed corpus uses.
# ---------------------------------------------------------------------------


def gen_typed_evolution(seed: int):
    """Return ops as (eng_sql, duck_sql, kind) with kind in
    none/read/error over a fresh table tev{seed} whose schema evolves
    with typed columns."""
    rng = random.Random(seed * 700921 + 13)
    tbl = f"tev{seed}"
    ddl = f"CREATE TABLE {tbl} (k BIGINT PRIMARY KEY, v BIGINT)"
    ops: list[tuple[str, str, str]] = [(ddl, ddl, "none")]
    # (colname, pool kind, engine type, duck type, unsigned max)
    extras: list[tuple[str, str, str, str, int | None]] = []
    hi = 0
    n_named = 0

    def sel_cols() -> str:
        casts = ["k", "v"]
        for n, kind, _te, _td, mx in extras:
            if kind == "dc":
                casts.append(f"CAST({n} AS DOUBLE) AS {n}")
            elif kind == "dt":
                casts.append(f"CAST({n} AS VARCHAR(32)) AS {n}")
            elif mx is not None and mx > 2**32:
                casts.append(f"CAST({n} AS VARCHAR(32)) AS {n}")
            elif mx is not None:
                casts.append(f"CAST({n} AS BIGINT) AS {n}")
            else:
                casts.append(n)
        return ", ".join(casts)

    def insert():
        nonlocal hi
        rows = []
        for _ in range(rng.randint(1, 4)):
            hi += 1
            vals = [str(hi), str(rng.randrange(1000))]
            for _n, kind, _te, _td, mx in extras:
                vals.append(_typed_value(rng, kind, mx))
            rows.append("(" + ", ".join(vals) + ")")
        cols = ["k", "v"] + [n for n, *_ in extras]
        sql = f"INSERT INTO {tbl} ({', '.join(cols)}) VALUES {', '.join(rows)}"
        ops.append((sql, sql, "none"))

    def alter_add():
        nonlocal n_named
        n_named += 1
        kind, te, td, mx = rng.choice(_TYPED_POOL)
        name = f"tc{n_named}"
        extras.append((name, kind, te, td, mx))
        ops.append(
            (
                f"ALTER TABLE {tbl} ADD COLUMN {name} {te}",
                f"ALTER TABLE {tbl} ADD COLUMN {name} {td}",
                "none",
            )
        )

    def alter_rename():
        nonlocal n_named
        i = rng.randrange(len(extras))
        old, kind, te, td, mx = extras[i]
        n_named += 1
        new = f"tr{n_named}"
        extras[i] = (new, kind, te, td, mx)
        sql = f"ALTER TABLE {tbl} RENAME COLUMN {old} TO {new}"
        ops.append((sql, sql, "none"))

    def alter_drop():
        n, *_ = extras.pop(rng.randrange(len(extras)))
        sql = f"ALTER TABLE {tbl} DROP COLUMN {n}"
        ops.append((sql, sql, "none"))

    def delete():
        preds = [f"k % {rng.choice([2, 3, 5])} = 0", "v < 300"]
        for n, kind, _te, _td, mx in extras:
            if kind == "dc":
                preds.append(f"{n} < 0")
            elif kind == "dt":
                preds.append(f"{n} < '2024-06-01 00:00:00'")
            elif kind == "ok":
                preds.append(f"{n} = TRUE")
            elif kind == "vs":
                preds.append(f"{n} = 'beta'")
            elif mx is not None:
                preds.append(f"{n} > {mx // 2}")
            preds.append(f"{n} IS NULL")
        sql = f"DELETE FROM {tbl} WHERE {rng.choice(preds)}"
        ops.append((sql, sql, "none"))

    def read():
        sql = f"SELECT {sel_cols()} FROM {tbl}"
        ops.append((sql, sql, "read"))

    def boundary_error():
        uns = [(n, mx) for n, _k, _te, _td, mx in extras if mx is not None]
        if not uns:
            return
        nonlocal hi
        hi += 1
        n, mx = rng.choice(uns)
        bad = rng.choice([-1, mx + 1])
        sql = f"INSERT INTO {tbl} (k, {n}) VALUES ({hi}, {bad})"
        ops.append((sql, sql, "error"))

    insert()
    alter_add()  # every sequence evolves with at least one typed column
    insert()
    for _ in range(rng.randint(6, 9)):
        roll = rng.random()
        if roll < 0.16 and len(extras) < 4:
            alter_add()
        elif roll < 0.24 and extras:
            alter_rename()
        elif roll < 0.30 and len(extras) > 1:
            alter_drop()
        elif roll < 0.42:
            delete()
        elif roll < 0.58:
            read()
        elif roll < 0.68 and any(mx is not None for *_x, mx in extras):
            boundary_error()
        else:
            insert()
    read()
    return tbl, ops


@pytest.mark.parametrize("seed", range(25))
def test_differential_typed_evolution_fuzz(fuzz_eng, fuzz_duck, seed):
    tbl, ops = gen_typed_evolution(seed)
    for step, (e_sql, d_sql, kind) in enumerate(ops):
        if kind == "error":
            with pytest.raises(Exception):
                fuzz_eng.sql(e_sql)
            with pytest.raises(Exception):
                fuzz_duck.execute(d_sql)
            continue
        fuzz_eng.sql(e_sql)
        fuzz_duck.execute(d_sql)
        if kind == "read":
            a = _canon_rows(fuzz_eng.sql(e_sql).df.toPandas())
            b = _canon_rows(fuzz_duck.execute(d_sql).df())
            assert a == b, f"seed {seed} step {step} diverged:\n{e_sql}"
    chk = [
        tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()
    ]
    assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


# ---------------------------------------------------------------------------
# Partitioned-table differential fuzz: hive-style PARTITIONED BY is its
# own write path (partition dirs, recovery-on-write, pruned reads and
# deletes, the __phys backing + view indirection) and none of the other
# corpora touch it. DuckDB twin: the same table UNPARTITIONED —
# partitioning must be semantically invisible.
# ---------------------------------------------------------------------------


def gen_partitioned_sequence(seed: int) -> list[tuple[str, str | None, str]]:
    """[(engine_sql, duck_sql | None, kind)] over a fresh hive-
    partitioned table pt{seed}; kind as in gen_mixed_sequence."""
    rng = random.Random(seed * 7673 + 29)
    tbl = f"pt{seed}"
    ddl_eng = (
        f"CREATE TABLE {tbl} (k BIGINT, v BIGINT, s VARCHAR(255), p BIGINT) "
        f"PARTITIONED BY (p)"
    )
    ddl_duck = f"CREATE TABLE {tbl} (k BIGINT, v BIGINT, s VARCHAR(255), p BIGINT)"
    ops: list[tuple[str, str | None, str]] = [(ddl_eng, ddl_duck, "none")]
    hi = 0
    extra: list[str] = []
    n_named = 0

    def fresh(n: int) -> list[int]:
        nonlocal hi
        ks = list(range(hi, hi + n))
        hi += n
        return ks

    def ins() -> tuple[str, str, str]:
        n = rng.randint(1, 5)
        cols = ["k", "v", "s", "p"] + extra
        rows = []
        for k in fresh(n):
            vals = [str(k)]
            vals.append("NULL" if rng.random() < 0.15 else str(rng.randrange(2000)))
            vals.append("NULL" if rng.random() < 0.1 else rng.choice(["'O'", "'F'", "'x'"]))
            vals.append(str(rng.randrange(5)))  # partition value 0-4
            vals += [
                "NULL" if rng.random() < 0.3 else str(rng.randrange(100))
                for _ in extra
            ]
            rows.append(f"({', '.join(vals)})")
        sql = f"INSERT INTO {tbl} ({', '.join(cols)}) VALUES {', '.join(rows)}"
        return (sql, sql, "dml_count")

    def delete() -> tuple[str, str, str]:
        preds = [
            f"p = {rng.randrange(5)}",  # whole-partition delete (pruned)
            f"p = {rng.randrange(5)} AND v < {rng.choice([500, 1200])}",
            f"k % {rng.choice([2, 3])} = 0",  # cross-partition
        ]
        sql = f"DELETE FROM {tbl} WHERE {rng.choice(preds)}"
        return (sql, sql, "dml_count")

    def read() -> tuple[str, str, str]:
        form = rng.random()
        if form < 0.5:
            # partition-literal filter: the PRUNED read path
            sql = (
                f"SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv "
                f"FROM {tbl} WHERE p = {rng.randrange(5)}"
            )
        elif form < 0.8:
            sql = (
                f"SELECT p, CAST(count(*) AS BIGINT) AS n, "
                f"CAST(min(k) AS BIGINT) AS mn FROM {tbl} GROUP BY p"
            )
        else:
            sql = f"SELECT k, v, p FROM {tbl} WHERE k % 3 = 0"
        return (sql, sql, "read")

    def alter_add() -> tuple[str, str, str]:
        nonlocal n_named
        n_named += 1
        extra.append(f"c{n_named}")
        sql = f"ALTER TABLE {tbl} ADD COLUMN c{n_named} BIGINT"
        return (sql, sql, "none")

    ops.append(ins())
    for _ in range(rng.randint(6, 9)):
        roll = rng.random()
        if roll < 0.1:
            ops.append(alter_add())
        elif roll < 0.35:
            ops.append(delete())
        elif roll < 0.6:
            ops.append(read())
        else:
            ops.append(ins())
    return ops


@pytest.mark.parametrize("seed", range(20))
def test_differential_partitioned_fuzz(fuzz_eng, fuzz_duck, seed):
    ops = gen_partitioned_sequence(seed)
    for eng_sql, duck_sql, kind in ops:
        r = fuzz_eng.sql(eng_sql)
        d = fuzz_duck.execute(duck_sql)
        if kind == "dml_count":
            n_duck = d.fetchall()[0][0]
            assert r.rows_affected == n_duck, f"seed {seed} count diverged:\n{eng_sql}"
        elif kind == "read":
            a = _canon_rows(r.df.toPandas())
            b = _canon_rows(d.df())
            assert a == b, f"seed {seed} read diverged:\n{eng_sql}"
    cols = "k, v, s, p"
    sel = f"SELECT {cols} FROM pt{seed}"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, f"seed {seed} final state diverged ({len(a)} vs {len(b)})"
    chk = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE pt{seed}").df.collect()]
    assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


# ---------------------------------------------------------------------------
# ONLINE-DDL interleaving fuzz (round-11 continuation): a SECOND
# session fires random DML at seeded points INSIDE a running online
# CREATE INDEX job (the F1 state machine — engine.py _drive_index_job),
# and the final table must match DuckDB executing the same serialized
# statement order. This randomizes exactly the windows the directed
# tests in test_online_ddl.py pin one at a time: delete-only /
# write-only appends, mid-backfill appends (delta catch-up), and
# full-rewrite snapshot invalidation (DELETE / REPLACE during
# write-reorg).
#
# Semantics-preserving constraints: the table always has PRIMARY KEY k
# (REPLACE conflicts resolve identically in both engines regardless of
# the mid-job index's state), and when the fuzzed index is UNIQUE its
# column v draws from a no-repeat pool so the backfill never rolls the
# job back (rollback is example-tested; here the job must LAND so the
# final states are comparable).
# ---------------------------------------------------------------------------

_ODDL_PHASES = [
    "create_index:delete only",
    "create_index:write only",
    "create_index:write reorganization",
    "create_index:backfill done",
]


def gen_online_ddl_case(seed: int):
    rng = random.Random(seed * 611953 + 41)
    tbl = f"od{seed}"
    unique = rng.random() < 0.4
    ddl = f"CREATE TABLE {tbl} (k BIGINT PRIMARY KEY, v BIGINT, s VARCHAR(255))"
    kpool = iter(rng.sample(range(1, 500), 60))
    vpool = iter(rng.sample(range(1000, 9999), 60))
    used_ks: list[int] = []

    def fresh_rows(n: int) -> str:
        rows = []
        for _ in range(n):
            k = next(kpool)
            used_ks.append(k)
            rows.append(f"({k}, {next(vpool)}, 's{rng.randint(0, 9)}')")
        return ", ".join(rows)

    seed_ops = [(ddl, ddl)] + [
        (lambda r: (f"INSERT INTO {tbl} VALUES {r}",) * 2)(fresh_rows(rng.randint(1, 3)))
        for _ in range(rng.randint(1, 3))
    ]
    phases = sorted(
        rng.sample(_ODDL_PHASES, rng.randint(1, 3)), key=_ODDL_PHASES.index
    )
    phase_ops: dict[str, list[tuple[str, str]]] = {}
    for ph in phases:
        ops = []
        for _ in range(rng.randint(1, 2)):
            kind = rng.choice(["ins", "ins", "del", "rep_new", "rep_used"])
            if kind == "ins":
                r = fresh_rows(rng.randint(1, 2))
                ops.append((f"INSERT INTO {tbl} VALUES {r}",) * 2)
            elif kind == "del":
                lo = rng.randint(1, 400)
                hi = lo + rng.randint(10, 80)
                ops.append((f"DELETE FROM {tbl} WHERE k BETWEEN {lo} AND {hi}",) * 2)
            else:
                k = rng.choice(used_ks) if kind == "rep_used" and used_ks else next(kpool)
                if k not in used_ks:
                    used_ks.append(k)
                # duck twin is delete-then-insert: INSERT OR REPLACE
                # refuses tables with TWO unique constraints (PK + the
                # fuzzed unique index), and the REPLACE rows' v is
                # always fresh, so only the PK can conflict
                row = f"({k}, {next(vpool)}, 'r{rng.randint(0, 9)}')"
                ops.append(
                    (
                        f"REPLACE INTO {tbl} VALUES {row}",
                        [
                            f"DELETE FROM {tbl} WHERE k = {k}",
                            f"INSERT INTO {tbl} VALUES {row}",
                        ],
                    )
                )
        phase_ops[ph] = ops
    idx_sql = f"CREATE {'UNIQUE ' if unique else ''}INDEX oi{seed} ON {tbl} (v)"
    return tbl, seed_ops, idx_sql, phase_ops


@pytest.mark.parametrize("seed", range(20))
def test_differential_online_ddl_fuzz(spark, fuzz_eng, fuzz_duck, seed):
    tbl, seed_ops, idx_sql, phase_ops = gen_online_ddl_case(seed)
    for eng_sql, duck_sql in seed_ops:
        fuzz_eng.sql(eng_sql)
        fuzz_duck.execute(duck_sql)
    # DuckDB applies the index up front: the corpus is dup-free by
    # construction, so the index is data-transparent and only the
    # serialized DML order matters
    fuzz_duck.execute(idx_sql)
    second = Engine(spark, fuzz_eng.catalog.warehouse)

    def hook(phase, job):
        for eng_sql, duck_sql in phase_ops.get(phase, []):
            second.sql(eng_sql)
            for d in [duck_sql] if isinstance(duck_sql, str) else duck_sql:
                fuzz_duck.execute(d)

    fuzz_eng.ddl_phase_hook = hook
    try:
        fuzz_eng.sql(idx_sql)
    finally:
        fuzz_eng.ddl_phase_hook = None
        second.close()
    sel = f"SELECT k, v, s FROM {tbl}"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, (
        f"seed {seed} final state diverged ({len(a)} vs {len(b)} rows) after "
        f"interleaving at {sorted(phase_ops)}"
    )
    # the job landed public and the table's invariants (rowid handles,
    # PK, the new unique index) audit clean
    jobs = fuzz_eng.sql(
        "ADMIN SHOW DDL JOBS WHERE JOB_TYPE = 'create_index'"
    ).df.collect()
    assert jobs[-1]["STATE"] == "synced" and jobs[-1]["SCHEMA_STATE"] == "public"
    chk = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()]
    assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


# ---------------------------------------------------------------------------
# Initial-DEFAULT evolution fuzz (round-11 continuation): ALTER ADD
# COLUMN with DEFAULT / NOT NULL mid-sequence. MySQL fills PRE-EXISTING
# rows with the default (implicit type default under NOT NULL); the
# engine now does the same via the metadata-only rowid-watermark fill
# (catalog.ColumnInfo.initial_default — no table rewrite), and DuckDB
# fills physically on ALTER, so the two must agree row-for-row. The
# original schema-evolution corpus above deliberately EXCLUDED
# DEFAULT (it predates the fill and is byte-stable by contract); this
# is the separate corpus that covers it, including the fill as seen
# through predicates (WHERE c = default / c IS NULL) and through
# full-rewrite materialization (DELETE after the ALTER).
# NOT NULL's DuckDB twin is ADD COLUMN ... DEFAULT 0 + SET NOT NULL:
# DuckDB refuses a bare NOT NULL add on a non-empty table, while
# MySQL (and the engine) fill the implicit default.
# ---------------------------------------------------------------------------


def gen_default_evolution_sequence(seed: int):
    rng = random.Random(seed * 415229 + 59)
    tbl = f"df{seed}"
    ddl = f"CREATE TABLE {tbl} (k BIGINT PRIMARY KEY, v BIGINT)"
    ops: list[tuple[str, str, bool]] = [(ddl, ddl, False)]
    hi = 0
    # name -> (type, declared default or None, not_null)
    added: dict[str, tuple[str, str | None, bool]] = {}
    n = 0

    def ins() -> tuple[str, str, bool]:
        nonlocal hi
        cnt = rng.randint(1, 3)
        cols = ["k", "v"]
        omit = set()
        for c, (_t, d, nn) in added.items():
            if d is not None and rng.random() < 0.3:
                omit.add(c)  # both engines fill the declared default
            else:
                cols.append(c)
        rows = []
        for _ in range(cnt):
            hi += 1
            vals = [str(hi), str(rng.randrange(1000))]
            for c in cols[2:]:
                typ, d, nn = added[c]
                if typ == "BIGINT":
                    vals.append(str(rng.randrange(100)))
                else:
                    vals.append(rng.choice(["'a'", "'b'", "'zz'"]))
            rows.append(f"({', '.join(vals)})")
        sql = f"INSERT INTO {tbl} ({', '.join(cols)}) VALUES {', '.join(rows)}"
        return (sql, sql, True)

    def alter_add() -> tuple[str, str, bool]:
        nonlocal n
        n += 1
        name = f"c{n}"
        kind = rng.choice(["int_default", "str_default", "int_notnull", "str_notnull"])
        if kind == "int_default":
            d = str(rng.randrange(1, 9))
            added[name] = ("BIGINT", d, False)
            sql = f"ALTER TABLE {tbl} ADD COLUMN {name} BIGINT DEFAULT {d}"
            return (sql, sql, False)
        if kind == "str_default":
            d = rng.choice(["'x'", "'y'"])
            added[name] = ("VARCHAR(16)", d, False)
            sql = f"ALTER TABLE {tbl} ADD COLUMN {name} VARCHAR(16) DEFAULT {d}"
            return (sql, sql, False)
        if kind == "int_notnull":
            added[name] = ("BIGINT", None, True)
            return (
                f"ALTER TABLE {tbl} ADD COLUMN {name} BIGINT NOT NULL",
                f"ALTER TABLE {tbl} ADD COLUMN {name} BIGINT DEFAULT 0; "
                f"ALTER TABLE {tbl} ALTER COLUMN {name} SET NOT NULL",
                False,
            )
        added[name] = ("VARCHAR(16)", None, True)
        return (
            f"ALTER TABLE {tbl} ADD COLUMN {name} VARCHAR(16) NOT NULL",
            f"ALTER TABLE {tbl} ADD COLUMN {name} VARCHAR(16) DEFAULT ''; "
            f"ALTER TABLE {tbl} ALTER COLUMN {name} SET NOT NULL",
            False,
        )

    def delete() -> tuple[str, str, bool]:
        preds = [f"k % {rng.choice([2, 3, 5])} = 0", f"v < {rng.choice([200, 600])}"]
        for c, (typ, d, nn) in added.items():
            if typ == "BIGINT":
                preds.append(rng.choice([f"{c} IS NULL", f"{c} < 5", f"{c} = 0"]))
            else:
                preds.append(rng.choice([f"{c} IS NULL", f"{c} = ''", f"{c} = 'x'"]))
        pred = f" {rng.choice(['AND', 'OR'])} ".join(
            rng.sample(preds, rng.choice([1, 2]))
        )
        sql = f"DELETE FROM {tbl} WHERE {pred}"
        return (sql, sql, True)

    ops.append(ins())
    ops.append(alter_add())  # every sequence fills at least once
    for _ in range(rng.randint(4, 6)):
        roll = rng.random()
        if roll < 0.25 and len(added) < 3:
            ops.append(alter_add())
        elif roll < 0.45:
            ops.append(delete())
        else:
            ops.append(ins())
    return tbl, ops, ["k", "v"] + list(added)


@pytest.mark.parametrize("seed", range(15))
def test_differential_default_evolution_fuzz(fuzz_eng, fuzz_duck, seed):
    tbl, ops, cols = gen_default_evolution_sequence(seed)
    for eng_sql, duck_sql, check in ops:
        r = fuzz_eng.sql(eng_sql)
        d = None
        for stmt in duck_sql.split("; "):
            d = fuzz_duck.execute(stmt)
        if check:
            n_duck = d.fetchall()[0][0]
            assert r.rows_affected == n_duck, f"seed {seed} count diverged:\n{eng_sql}"
    sel = f"SELECT {', '.join(cols)} FROM {tbl}"
    a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
    b = _canon_rows(fuzz_duck.execute(sel).df())
    assert a == b, (
        f"seed {seed} final state diverged ({len(a)} vs {len(b)} rows):\n"
        + "\n".join(e for e, _, _ in ops)
    )
    chk = [tuple(r) for r in fuzz_eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()]
    assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


# ---------------------------------------------------------------------------
# CRASH-RESUME fuzz (round-11 continuation): combines the online-DDL
# interleaving corpus with the crash-window sweep — a seeded case
# fires concurrent DML at one phase, "kills" the owner (BaseException
# from the hook + forged dead pid) at the same or a later phase, then
# a fresh engine adopts the orphan and rolls the index job forward.
# The final table must match DuckDB executing exactly the statements
# that actually ran before the crash, the job must land synced, and
# the table must audit clean — i.e. recovery is correct from ANY
# (phase, concurrent-DML) combination, not just the directed ones.
# ---------------------------------------------------------------------------


class _FuzzCrash(BaseException):
    """Models process death (BaseException: the terminal-state wrapper
    must NOT catch it — a caught crash would roll the job back instead
    of leaving it for the resume path)."""


def test_differential_crash_resume_fuzz(spark, fuzz_eng, fuzz_duck):
    import json as _json
    import os as _os
    import subprocess as _sp

    wh = fuzz_eng.catalog.warehouse
    for seed in range(10):
        rng = random.Random(seed * 292241 + 7)
        tbl = f"cr{seed}"
        unique = rng.random() < 0.5
        ddl = f"CREATE TABLE {tbl} (k BIGINT PRIMARY KEY, v BIGINT)"
        fuzz_eng.sql(ddl)
        fuzz_duck.execute(ddl)
        kpool = iter(rng.sample(range(1, 400), 40))

        def rows_sql(n):
            return ", ".join(f"({next(kpool)}, {rng.randrange(1000)})" for _ in range(n))

        base = f"INSERT INTO {tbl} VALUES {rows_sql(rng.randint(2, 5))}"
        fuzz_eng.sql(base)
        fuzz_duck.execute(base)

        phases = _ODDL_PHASES
        dml_at = rng.choice(phases)
        crash_at = rng.choice(phases[phases.index(dml_at):])
        dml = (
            f"INSERT INTO {tbl} VALUES {rows_sql(rng.randint(1, 3))}"
            if rng.random() < 0.7
            else f"DELETE FROM {tbl} WHERE k < {rng.randrange(50, 300)}"
        )
        second = Engine(spark, wh)
        ran: list[str] = []

        def hook(phase, job):
            if phase == dml_at:
                second.sql(dml)
                ran.append(dml)
            if phase == crash_at:
                raise _FuzzCrash()

        fuzz_eng.ddl_phase_hook = hook
        idx_sql = f"CREATE {'UNIQUE ' if unique else ''}INDEX ci{seed} ON {tbl} (k)"
        try:
            fuzz_eng.sql(idx_sql)
            crashed = False
        except _FuzzCrash:
            crashed = True
        finally:
            fuzz_eng.ddl_phase_hook = None
            second.close()
        assert crashed, f"seed {seed}: crash hook did not fire"
        # mirror to DuckDB only what actually ran before the "death"
        for d in ran:
            fuzz_duck.execute(d)
        fuzz_duck.execute(idx_sql)
        # forge the owner's death, then resume
        p = _sp.Popen(["sleep", "0"])
        p.wait()
        jobs_path = _os.path.join(wh, "ddl_jobs.json")
        with open(jobs_path) as f:
            jobs = _json.load(f)
        assert jobs[-1]["status"] == "running", (seed, jobs[-1])
        jobs[-1]["pid"] = p.pid
        with open(jobs_path, "w") as f:
            _json.dump(jobs, f)
        e2 = Engine(spark, wh)
        sel = f"SELECT k, v FROM {tbl}"
        a = _canon_rows(e2.sql(sel).df.toPandas())
        b = _canon_rows(fuzz_duck.execute(sel).df())
        assert a == b, (
            f"seed {seed} diverged after crash@{crash_at} dml@{dml_at} "
            f"({len(a)} vs {len(b)} rows)"
        )
        got = e2.sql("ADMIN SHOW DDL JOBS").df.collect()
        assert got[-1]["STATE"] == "synced", (seed, got[-1])
        chk = [tuple(r) for r in e2.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()]
        assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)
        e2.close()


# ---------------------------------------------------------------------------
# OPTIMIZE / ZORDER crash-resume fuzz (round 12, VERDICT r11 #7): the
# index-job crash matrix covered CREATE INDEX; this corpus interleaves
# OPTIMIZE [ZORDER BY] with concurrent writes from a second session,
# kills the owner at a seeded phase, and verifies the cancel path:
# orphaned OPTIMIZE jobs are CANCELLED on adoption (a maintenance
# rewrite leaves no schema inconsistency — re-running is the DBA's
# call), their reorg staging is swept, the data matches DuckDB
# executing exactly the statements that ran, and the table accepts a
# fresh OPTIMIZE immediately. Crashing AFTER the publish instead must
# leave the job synced and the compaction in effect.
# ---------------------------------------------------------------------------

_OPT_PHASES = ["optimize:staged", "optimize:done"]


def test_optimize_crash_resume_fuzz(spark, fuzz_eng, fuzz_duck):
    import json as _json
    import os as _os
    import subprocess as _sp

    wh = fuzz_eng.catalog.warehouse
    for seed in range(10):
        rng = random.Random(seed * 664579 + 13)
        tbl = f"oz{seed}"
        ddl = f"CREATE TABLE {tbl} (k BIGINT, v BIGINT)"
        fuzz_eng.sql(ddl)
        fuzz_duck.execute(ddl)
        kpool = iter(rng.sample(range(1, 500), 60))

        def rows_sql(n):
            return ", ".join(
                f"({next(kpool)}, {rng.randrange(1000)})" for _ in range(n)
            )

        for _ in range(rng.randint(2, 4)):  # fragmented file history
            stmt = f"INSERT INTO {tbl} VALUES {rows_sql(rng.randint(2, 4))}"
            fuzz_eng.sql(stmt)
            fuzz_duck.execute(stmt)

        dml_at = rng.choice(_OPT_PHASES)
        crash_at = rng.choice(_OPT_PHASES[_OPT_PHASES.index(dml_at):])
        dml = (
            f"INSERT INTO {tbl} VALUES {rows_sql(rng.randint(1, 3))}"
            if rng.random() < 0.6
            else f"DELETE FROM {tbl} WHERE k < {rng.randrange(60, 400)}"
        )
        second = Engine(spark, wh)
        ran: list[str] = []

        def hook(phase, job):
            if phase == dml_at:
                second.sql(dml)
                ran.append(dml)
            if phase == crash_at:
                raise _FuzzCrash()

        opt = (
            f"OPTIMIZE TABLE {tbl} ZORDER BY (k, v)"
            if rng.random() < 0.5
            else f"OPTIMIZE TABLE {tbl}"
        )
        fuzz_eng.ddl_phase_hook = hook
        try:
            fuzz_eng.sql(opt)
            crashed = False
        except _FuzzCrash:
            crashed = True
        finally:
            fuzz_eng.ddl_phase_hook = None
            second.close()
        assert crashed, f"seed {seed}: crash hook did not fire"
        for d in ran:  # mirror only what actually ran before the death
            fuzz_duck.execute(d)
        # forge the owner's death, then let a fresh engine adopt
        p = _sp.Popen(["sleep", "0"])
        p.wait()
        jobs_path = _os.path.join(wh, "ddl_jobs.json")
        with open(jobs_path) as f:
            jobs = _json.load(f)
        jobs[-1]["pid"] = p.pid
        with open(jobs_path, "w") as f:
            _json.dump(jobs, f)
        e2 = Engine(spark, wh)
        # cancel iff the crash preceded the publish; synced after it
        want = "cancelled" if crash_at == "optimize:staged" else "synced"
        got = [j for j in e2.ddl_log.load() if j["type"] == "optimize"][-1]
        assert got["status"] == want, (seed, crash_at, got)
        # no stranded reorg staging anywhere under the warehouse
        stranded = [
            _os.path.join(r, d)
            for r, dirs, _ in _os.walk(wh)
            for d in dirs
            if d.startswith("data.reorg-")
        ]
        assert stranded == [], (seed, stranded)
        sel = f"SELECT k, v FROM {tbl}"
        a = _canon_rows(e2.sql(sel).df.toPandas())
        b = _canon_rows(fuzz_duck.execute(sel).df())
        assert a == b, (
            f"seed {seed} diverged after crash@{crash_at} dml@{dml_at} "
            f"({len(a)} vs {len(b)} rows)"
        )
        # the table is not wedged: a fresh OPTIMIZE runs to synced
        e2.sql(f"OPTIMIZE TABLE {tbl}")
        got = [j for j in e2.ddl_log.load() if j["type"] == "optimize"][-1]
        assert got["status"] == "synced", (seed, got)
        chk = [tuple(r) for r in e2.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()]
        assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)
        e2.close()


# ---------------------------------------------------------------------------
# Online MODIFY/CHANGE concurrent-DML fuzz (round 12, VERDICT r11 #2
# done-criteria): single-spec type changes now run through the reorg
# kernel (unlocked cast rewrite + short-lock delta cast-adopt). Each
# seeded case fires a concurrent INSERT (delta cast-adopt path) or
# DELETE (snapshot-invalidation redo path) from a second session
# between the rewrite and the publish, and the final table must match
# DuckDB executing the DML before the ALTER — the serialization the
# publish's catch-up implements.
# ---------------------------------------------------------------------------


def test_online_modify_concurrent_dml_fuzz(spark, fuzz_eng, fuzz_duck):
    wh = fuzz_eng.catalog.warehouse
    for seed in range(10):
        rng = random.Random(seed * 787711 + 29)
        tbl = f"om{seed}"
        ddl = f"CREATE TABLE {tbl} (k BIGINT, v INTEGER)"
        fuzz_eng.sql(ddl)
        fuzz_duck.execute(ddl)
        kpool = iter(rng.sample(range(1, 500), 60))

        def rows_sql(n):
            return ", ".join(
                f"({next(kpool)}, {rng.randrange(100)})" for _ in range(n)
            )

        for _ in range(rng.randint(1, 3)):
            stmt = f"INSERT INTO {tbl} VALUES {rows_sql(rng.randint(2, 4))}"
            fuzz_eng.sql(stmt)
            fuzz_duck.execute(stmt)

        use_change = rng.random() < 0.4
        target = "w" if use_change else "v"
        alter = (
            f"ALTER TABLE {tbl} CHANGE v w BIGINT"
            if use_change
            else f"ALTER TABLE {tbl} MODIFY v BIGINT"
        )
        dml = (
            f"INSERT INTO {tbl} VALUES {rows_sql(rng.randint(1, 3))}"
            if rng.random() < 0.6
            else f"DELETE FROM {tbl} WHERE k < {rng.randrange(60, 400)}"
        )
        second = Engine(spark, wh)
        ran: list[str] = []

        def hook(phase, job):
            if phase == "modify_column:backfill done":
                second.sql(dml)
                ran.append(dml)

        fuzz_eng.ddl_phase_hook = hook
        try:
            fuzz_eng.sql(alter)
        finally:
            fuzz_eng.ddl_phase_hook = None
            second.close()
        assert ran, f"seed {seed}: the concurrent DML never fired"
        # serialization: the publish catch-up lands the DML BEFORE the
        # type change — mirror that order to DuckDB
        for d in ran:
            fuzz_duck.execute(d)
        fuzz_duck.execute(f"ALTER TABLE {tbl} ALTER v TYPE BIGINT")
        if use_change:
            fuzz_duck.execute(f"ALTER TABLE {tbl} RENAME COLUMN v TO w")
        sel = f"SELECT k, {target} FROM {tbl}"
        a = _canon_rows(fuzz_eng.sql(sel).df.toPandas())
        b = _canon_rows(fuzz_duck.execute(sel).df())
        assert a == b, f"seed {seed} diverged ({len(a)} vs {len(b)} rows)"
        typ = dict(fuzz_eng.sql(sel).df.dtypes)[target]
        assert typ == "bigint", (seed, typ)
        jobs = [j for j in fuzz_eng.ddl_log.load() if j["type"] == "modify_column"]
        assert jobs and jobs[-1]["status"] == "synced", (seed, jobs[-1])
        chk = [
            tuple(r)
            for r in fuzz_eng.sql(f"ADMIN CHECK TABLE {tbl}").df.collect()
        ]
        assert chk and all(r[-1] == "OK" for r in chk), (seed, chk)


# ---------------------------------------------------------------------------
# Derived-table string-vs-number corpus (round 14, VERDICT r13 next #3
# — NEW section, existing seeds untouched per house rule): the schema
# resolver now propagates integer typings through single-level
# subqueries, CTEs, and simple AS-aliases, so the MySQL REAL-compare
# rewrite fires on derived references too. The duck twin spells the
# REAL compare explicitly (TRY_CAST .. AS DOUBLE) through the same
# derivation. Retyping derivations (a concat alias) must REFUSE the
# rewrite — there engine and duck run the IDENTICAL binary-string
# compare.
# ---------------------------------------------------------------------------

_DSN_STRS = ["12.5", "0.5", "-4.5", "1e2", "9", "12", "0.0", "abc"]
_DSN_OPS = ["=", "<>", "<", "<=", ">", ">="]


def gen_derived_strnum_pair(seed: int) -> tuple[str, str]:
    """(engine_sql, duck_sql) — one derived level, then string-number
    comparisons on the derived reference."""
    rng = random.Random(20_000 + seed)
    col = rng.choice(["ik", "bk"])
    wrap = rng.choice(["sub", "cte", "alias", "retype"])
    if wrap == "sub":
        e_from = d_from = f"(SELECT k, {col} FROM dstrnum_t) d"
        name = col
    elif wrap == "cte":
        e_from = d_from = None  # WITH form built below
        name = col
    elif wrap == "alias":
        e_from = d_from = f"(SELECT k, {col} AS a2 FROM dstrnum_t) d"
        name = "a2"
    else:  # retype: string-valued alias shadows the int name — the
        # resolver must refuse; both engines binary-string compare.
        # (duck twin: DuckDB's concat IGNORES NULL operands where
        # Spark/MySQL propagate them, so the duck derivation keeps
        # NULL explicitly — same values, engine-independent shape)
        e_from = f"(SELECT k, concat({col}, '') AS {col} FROM dstrnum_t) d"
        d_from = (
            f"(SELECT k, CASE WHEN {col} IS NULL THEN NULL "
            f"ELSE concat({col}, '') END AS {col} FROM dstrnum_t) d"
        )
        name = col
    e_exprs, d_exprs = [], []
    for i in range(rng.choice([2, 3])):
        s, op = rng.choice(_DSN_STRS), rng.choice(_DSN_OPS)
        if wrap == "retype":
            e = d = f"({name} {op} '{s}')"
        elif rng.random() < 0.5:
            e = f"({name} {op} '{s}')"
            d = f"({name} {op} TRY_CAST('{s}' AS DOUBLE))"
        else:
            e = f"('{s}' {op} {name})"
            d = f"(TRY_CAST('{s}' AS DOUBLE) {op} {name})"
        e_exprs.append(f"{e} AS c{i}")
        d_exprs.append(f"{d} AS c{i}")
    if wrap == "cte":
        head = f"WITH c AS (SELECT k, {col} FROM dstrnum_t) "
        base = head + "SELECT k, {} FROM c ORDER BY k"
        return base.format(", ".join(e_exprs)), base.format(", ".join(d_exprs))
    return (
        f"SELECT k, {', '.join(e_exprs)} FROM {e_from} ORDER BY k",
        f"SELECT k, {', '.join(d_exprs)} FROM {d_from} ORDER BY k",
    )


@pytest.fixture(scope="module")
def dstrnum_tables(fuzz_eng, fuzz_duck):
    ddl = "CREATE TABLE dstrnum_t (k BIGINT PRIMARY KEY, ik INT, bk BIGINT)"
    ins = (
        "INSERT INTO dstrnum_t VALUES (1, 12, 12), (2, 13, 13), (3, 0, 0), "
        "(4, -5, -5), (5, 100, 100), (6, NULL, NULL), (7, 9, 9)"
    )
    fuzz_eng.sql(ddl)
    fuzz_eng.sql(ins)
    fuzz_duck.execute(ddl)
    fuzz_duck.execute(ins)
    return fuzz_eng, fuzz_duck


@pytest.mark.parametrize("seed", range(12))
def test_differential_derived_strnum_fuzz(dstrnum_tables, seed):
    eng, duck = dstrnum_tables
    e_sql, d_sql = gen_derived_strnum_pair(seed)
    a = _canon_rows(eng.sql(e_sql).df.toPandas())
    b = _canon_rows(duck.execute(d_sql).df())
    assert a == b, f"seed {seed} diverged:\n{e_sql}\n{d_sql}\n{a[:5]}\n{b[:5]}"


# ---------------------------------------------------------------------------
# Point-get read-prune corpus (round 14 — NEW section, existing seeds
# untouched per house rule): the manifest-backed point-get path
# executes flat point SELECTs over an explicit pruned file set
# (engine._pointget_prune). The corpus drives random =/IN conjuncts on
# the key, a string column, and non-point rider predicates over a
# MULTI-FILE engine table, and compares against a DuckDB twin holding
# identical rows — plus a per-seed assertion that the answer equals
# the engine's own UNPRUNED twin (predicate rephrased so the conjunct
# matcher cannot fire), catching any wrong file exclusion directly.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ptget_tables(fuzz_eng, fuzz_duck):
    ddl = "CREATE TABLE ptf (k BIGINT PRIMARY KEY, grp INT, s VARCHAR(16))"
    fuzz_eng.sql(ddl)
    fuzz_duck.execute(ddl)
    for i in range(6):  # six INSERT batches -> six+ data files
        lo = i * 120 + 1
        vals = ", ".join(
            f"({k}, {k % 5}, 'v{k:04d}')" for k in range(lo, lo + 120)
        )
        fuzz_eng.sql(f"INSERT INTO ptf VALUES {vals}")
        fuzz_duck.execute(f"INSERT INTO ptf VALUES {vals}")
    return fuzz_eng, fuzz_duck


def gen_ptget_query(seed: int) -> tuple[str, str]:
    """(pruned_sql, unpruned_twin) — same semantics, the twin's point
    conjunct is wrapped so the matcher cannot fire."""
    rng = random.Random(40_000 + seed)
    conjs, twins = [], []
    col = rng.choice(["k", "s"])
    if col == "k":
        if rng.random() < 0.5:
            v = rng.randrange(1, 760)
            conjs.append(f"k = {v}")
            twins.append(f"k + 0 = {v}")
        else:
            vs = sorted(rng.sample(range(1, 760), rng.choice([2, 3, 5])))
            inl = ", ".join(str(v) for v in vs)
            conjs.append(f"k IN ({inl})")
            twins.append(f"k + 0 IN ({inl})")
    else:
        v = rng.randrange(1, 760)
        conjs.append(f"s = 'v{v:04d}'")
        twins.append(f"concat(s, '') = 'v{v:04d}'")
    if rng.random() < 0.5:  # rider conjunct stays inside the scan
        g = rng.randrange(5)
        op = rng.choice(["<>", ">=", "<"])
        conjs.append(f"grp {op} {g}")
        twins.append(f"grp + 0 {op} {g}")  # defused: twin never prunes
    if rng.random() < 0.3:  # miss probe: value beyond every file range
        conjs.append("k = 99999" if rng.random() < 0.5 else "s = 'zzzz'")
        twins.append(conjs[-1].replace("k =", "k + 0 =").replace("s =", "concat(s, '') ="))
    where = " AND ".join(conjs)
    where_t = " AND ".join(twins)
    if rng.random() < 0.4:
        sel = "SELECT grp, CAST(count(*) AS BIGINT) AS c, CAST(sum(k) AS BIGINT) AS sk"
        tail = " GROUP BY grp"
    else:
        sel = "SELECT k, grp, s"
        tail = ""
    return (
        f"{sel} FROM ptf WHERE {where}{tail}",
        f"{sel} FROM ptf WHERE {where_t}{tail}",
    )


@pytest.mark.parametrize("seed", range(14))
def test_differential_ptget_fuzz(ptget_tables, seed):
    eng, duck = ptget_tables
    pruned_sql, twin_sql = gen_ptget_query(seed)
    eng.probe_log.clear()
    a = _canon_rows(eng.sql(pruned_sql).df.toPandas())
    fired = [p for p in eng.probe_log if p.get("kind") == "read"]
    b = _canon_rows(eng.sql(twin_sql).df.toPandas())
    d = _canon_rows(duck.execute(pruned_sql).df())
    assert a == b, f"seed {seed} pruned != unpruned:\n{pruned_sql}\n{twin_sql}"
    assert a == d, f"seed {seed} engine != duck:\n{pruned_sql}"
    assert fired, f"seed {seed}: the point path never fired\n{pruned_sql}"
