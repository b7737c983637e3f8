"""Layout-INDEPENDENCE of correctness (VERDICT r10 item 5): the x16
multi-file layout was bench-only; this module re-runs a ~30-seed slice
of the differential fuzz corpus — plus the scan-order-sensitive
registry entries — against the SAME data rewritten as 16 range-
partitioned parquet files per big table. Row-group and file boundaries
are exactly where subtle bugs (q36's scan-order FIRST_ROW, metadata-
key composites, partition-local assumptions) would surface; a 100 TB
table is always thousands of files, so correctness must not depend on
the driver fixture's 1-file-per-table layout.

Retarget knob: SPARK_GRAFT_FUZZ_LAYOUT_N (default 16) controls the
files-per-table of the rewritten corpus; the rewrite itself reuses
bench.build_multifile (cached under .bench_multifile/)."""

from __future__ import annotations

import os

import pytest

from tinysql_spark.engine import Engine

from .conftest import SF_SMALL
from .test_sql_fuzz import _canon_rows, gen_join_query, gen_query

LAYOUT_N = int(os.environ.get("SPARK_GRAFT_FUZZ_LAYOUT_N", "16"))

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def x16_dir(spark) -> str:
    from bench import build_multifile

    return build_multifile(spark, SF_SMALL, LAYOUT_N)


@pytest.fixture(scope="module")
def x16_eng(spark, x16_dir, tmp_path_factory) -> Engine:
    e = Engine(spark, str(tmp_path_factory.mktemp("x16wh")))
    e.attach_testdata(x16_dir)
    return e


@pytest.fixture(scope="module")
def x16_duck(x16_dir):
    import duckdb

    con = duckdb.connect()
    for t in _TABLES:
        # multi-file layout: each table is a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{x16_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(20))
def test_x16_scan_agg_fuzz(x16_eng, x16_duck, seed):
    """The read-fuzz generator, retargeted at the x16 layout: scans,
    filters, aggregates, ORDER BY + LIMIT — any divergence here is a
    layout-dependence bug (the same seeds are green on the single-file
    corpus in test_sql_fuzz)."""
    sql = gen_query(seed)
    a = _canon_rows(x16_eng.sql(sql).df.toPandas())
    b = _canon_rows(x16_duck.execute(sql).df())
    assert a == b, f"seed {seed} diverged on x{LAYOUT_N} layout:\n{sql}"


@pytest.mark.parametrize("seed", range(10))
def test_x16_join_fuzz(x16_eng, x16_duck, seed):
    sql = gen_join_query(seed)
    a = _canon_rows(x16_eng.sql(sql).df.toPandas())
    b = _canon_rows(x16_duck.execute(sql).df())
    assert a == b, f"seed {seed} diverged on x{LAYOUT_N} layout:\n{sql}"


def test_x16_first_row_scan_order(spark, x16_dir):
    """q36 FIRST_ROW is THE layout-sensitive entry (its whole point is
    deterministic scan-order semantics from the parquet metadata key):
    on 16 files the (file_name, row_index) composite must still agree
    with DuckDB's (filename, file_row_number) — both engines list the
    same directory, so basename-lexicographic order is shared."""
    import duckdb

    from tinysql_spark.operators import REGISTRY
    from tinysql_spark.operators.registry import render_oracle

    from .parity import assert_match

    spec = REGISTRY["q36_first_row"]
    # DuckDB's read_parquet needs an explicit glob for directories
    oracle = render_oracle(spec.oracle, x16_dir).replace(
        "lineitem.parquet'", "lineitem.parquet/*.parquet'"
    )
    con = duckdb.connect()
    try:
        assert_match(spec.fn(spark, x16_dir), con.execute(oracle).df(), "q36@x16")
    finally:
        con.close()


def _assert_match_float_tol(spark_df, duck_pdf, name: str, tol: float = 0.02):
    """assert_match, but floats compare within ``tol`` instead of via
    canonical strings. Needed ONLY on the multi-file layout: a double
    SUM's accumulation order changes with the file count, and a
    ROUND(sum, 2) whose unrounded value sits within ~1e-9 of a .005
    boundary can land on either side (float non-associativity — q07
    diverges by exactly one cent on x16). Everything non-float still
    compares exactly."""
    import math

    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(duck_pdf.columns), name
    assert len(spdf) == len(duck_pdf), name

    def keyed(df):
        cols = sorted(df.columns)
        rows = []
        for _, row in df[cols].iterrows():
            cells = list(row[c] for c in cols)
            key = tuple(
                f"{v:.6g}" if isinstance(v, float) and not math.isnan(v) else str(v)
                for v in cells
            )
            rows.append((key, cells))
        rows.sort(key=lambda kv: kv[0])
        return rows

    for (ka, a), (kb, b) in zip(keyed(spdf), keyed(duck_pdf)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert abs(x - y) <= tol, (name, ka, x, y)
            else:
                assert str(x) == str(y), (name, ka, kb)


def test_x16_headliners_parity(spark, x16_dir, x16_duck):
    """A slice of view-based oracle entries (the flagship agg, the
    five-way join, sessionization, exact dedup) re-checked on the
    multi-file layout — these exercise shuffle/join/window paths whose
    partition boundaries all move when the file count changes. Floats
    compare within one cent (see _assert_match_float_tol: double-sum
    accumulation order legitimately moves with the layout)."""
    from tinysql_spark.operators import REGISTRY
    from tinysql_spark.operators.registry import render_oracle

    for name in (
        "q01_pricing_summary",
        "q07_five_way_join",
        "q18_sessionization",
        "d01_dedup_exact",
    ):
        spec = REGISTRY[name]
        _assert_match_float_tol(
            spec.fn(spark, x16_dir),
            x16_duck.execute(render_oracle(spec.oracle, x16_dir)).df(),
            f"{name}@x{LAYOUT_N}",
        )


# ---------------------------------------------------------------------------
# Z-ORDERED layout variant: the round-11 Morton rewrite is a layout
# the engine itself can produce (OPTIMIZE ... ZORDER BY), so the
# layout-independence gate must cover it — rows arrive in an order
# correlated with NEITHER key alone, the adversarial case for any
# scan-order or partition-local assumption.
# ---------------------------------------------------------------------------

_Z_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["user_id", "event_id"],
}


@pytest.fixture(scope="module")
def zorder_dir(spark, tmp_path_factory) -> str:
    from tinysql_spark.sources.layout import zorder_parquet
    from tinysql_spark.sources.tables import load_table

    base = str(tmp_path_factory.mktemp("zlayout"))
    for t in _TABLES:
        df = load_table(spark, SF_SMALL, t)
        dst = os.path.join(base, f"{t}.parquet")
        keys = _Z_KEYS.get(t)
        if keys:
            zorder_parquet(df, dst, keys, n_files=4)
        else:
            df.coalesce(1).write.mode("overwrite").parquet(dst)
    return base


@pytest.fixture(scope="module")
def z_eng(spark, zorder_dir, tmp_path_factory) -> Engine:
    e = Engine(spark, str(tmp_path_factory.mktemp("zwh")))
    e.attach_testdata(zorder_dir)
    return e


@pytest.fixture(scope="module")
def z_duck(zorder_dir):
    import duckdb

    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{zorder_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(10))
def test_zorder_scan_agg_fuzz(z_eng, z_duck, seed):
    sql = gen_query(seed)
    a = _canon_rows(z_eng.sql(sql).df.toPandas())
    b = _canon_rows(z_duck.execute(sql).df())
    assert a == b, f"seed {seed} diverged on z-order layout:\n{sql}"


@pytest.mark.parametrize("seed", range(5))
def test_zorder_join_fuzz(z_eng, z_duck, seed):
    sql = gen_join_query(seed)
    a = _canon_rows(z_eng.sql(sql).df.toPandas())
    b = _canon_rows(z_duck.execute(sql).df())
    assert a == b, f"seed {seed} diverged on z-order layout:\n{sql}"


def test_zorder_first_row_scan_order(spark, zorder_dir):
    """q36 on the Morton layout: rows are ordered by NEITHER
    (file, position) key's natural column order, so the scan-order
    FIRST_ROW must still agree file-for-file with DuckDB."""
    import duckdb

    from tinysql_spark.operators import REGISTRY
    from tinysql_spark.operators.registry import render_oracle

    from .parity import assert_match

    spec = REGISTRY["q36_first_row"]
    oracle = render_oracle(spec.oracle, zorder_dir).replace(
        "lineitem.parquet'", "lineitem.parquet/*.parquet'"
    )
    con = duckdb.connect()
    try:
        assert_match(spec.fn(spark, zorder_dir), con.execute(oracle).df(), "q36@zorder")
    finally:
        con.close()
