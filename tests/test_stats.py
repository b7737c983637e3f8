"""Statistics module: CMSketch / histogram / NDV parity with the
reference's ANALYZE artifacts (SURVEY §4.3; statistics/cmsketch.go
semantics — insert/query — validated against exact counts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinysql_spark.sources.tables import load_table
from tinysql_spark.stats import CMSketch, collect_column_stats, eq_selectivity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF, "lineitem")


@pytest.fixture()
def eng(spark, tmp_path):
    from tinysql_spark.engine import Engine

    yield Engine(spark, str(tmp_path / "warehouse"))


def test_cmsketch_point_query_bounds(spark, lineitem):
    sk = CMSketch.build(lineitem, "l_returnflag")
    truth = {
        r["l_returnflag"]: r["n"]
        for r in lineitem.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for v, true_n in truth.items():
        est = sk.query(spark, v)
        # CM never underestimates; overestimate bounded by 2N/width
        assert est >= true_n
        assert est <= true_n + 2 * sk.total / sk.width + 1

    assert sk.total == sum(truth.values())
    # a value never inserted: estimate must be small (collisions only)
    assert sk.query(spark, "ZZZ-not-a-flag") <= 2 * sk.total / sk.width + 1


def test_cmsketch_on_integers(spark, lineitem):
    sk = CMSketch.build(lineitem, "l_linenumber")
    true_1 = lineitem.filter(F.col("l_linenumber") == 1).count()
    assert sk.query(spark, 1) >= true_1


def test_collect_column_stats(spark, lineitem):
    stats = collect_column_stats(
        lineitem, ["l_quantity", "l_returnflag"], with_cmsketch=True
    )
    q = stats["l_quantity"]
    n = lineitem.count()
    assert q.n == n
    assert q.null_count == 0
    assert 40 <= q.ndv <= 60  # 50 distinct quantities, HLL ±few %
    assert q.min == 1 and q.max == 50
    # equi-depth histogram: 17 ascending bounds spanning [min, max]
    assert len(q.histogram) == 17
    assert q.histogram == sorted(q.histogram)
    assert q.histogram[0] == 1.0 and q.histogram[-1] == 50.0

    rf = stats["l_returnflag"]
    assert rf.ndv == 3
    assert rf.histogram == []  # non-numeric: no histogram

    sel = eq_selectivity(spark, rf, "A")
    true_sel = lineitem.filter(F.col("l_returnflag") == "A").count() / n
    assert abs(sel - true_sel) < 0.05


def test_engine_analyze_populates_stats(eng):
    eng.sql("CREATE TABLE st (a int, b varchar(16))")
    eng.sql("INSERT INTO st VALUES (1,'x'), (2,'y'), (2,'y'), (3, NULL)")
    eng.sql("ANALYZE TABLE st")
    stats = eng.table_stats[("default", "st")]
    assert stats["a"].n == 4
    assert stats["b"].null_count == 1
    assert stats["a"].cmsketch.query(eng.spark, 2) >= 2


def test_stats_persist_across_engine_restart(spark, tmp_path):
    from tinysql_spark.engine import Engine

    wh = str(tmp_path / "wh")
    e1 = Engine(spark, wh)
    e1.sql("CREATE TABLE p (a int)")
    e1.sql("INSERT INTO p VALUES (1), (2), (2)")
    e1.sql("ANALYZE TABLE p")

    e2 = Engine(spark, wh)  # fresh engine over the same warehouse
    s = e2.load_stats("default", "p")
    assert s is not None
    assert s["a"].n == 3 and s["a"].ndv == 2
    assert s["a"].cmsketch.query(spark, 2) >= 2


def test_show_stats_statement(spark, tmp_path):
    from tinysql_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh2"))
    eng.sql("CREATE TABLE ss (a int, b varchar(8))")
    eng.sql("INSERT INTO ss VALUES (1,'x'), (2,NULL), (2,'y')")
    with pytest.raises(ValueError, match="run ANALYZE"):
        eng.sql("SHOW STATS ss")
    eng.sql("ANALYZE TABLE ss")
    got = {r["Column"]: r for r in eng.sql("SHOW STATS ss").df.collect()}
    assert got["a"]["Rows"] == 3 and got["a"]["NDV"] == 2
    assert got["b"]["Nulls"] == 1
    assert got["a"]["Hist_bounds"] == 17


def test_analyze_stats_flip_join_strategy(spark, tmp_path):
    """CBO wiring proof (SURVEY §4.3, reference: joinReOrderSolver +
    DataSource.DeriveStats): ANALYZE-produced stats must actually
    change Catalyst's physical choice. A selective dim filter is
    opaque without column stats (filter size = table size -> SMJ);
    with cbo.enabled + stats, the estimated post-filter size drops
    under the broadcast threshold -> BroadcastHashJoin."""
    from tinysql_spark.engine import Engine
    from tinysql_spark.plans.inspect import join_strategies, plan_string

    eng = Engine(spark, str(tmp_path / "wh_cbo"))
    eng.sql("CREATE TABLE dim (k int, v int)")
    eng.sql("CREATE TABLE fact (k int, x int)")
    eng.sql("INSERT INTO dim SELECT CAST(id AS INT), CAST(id % 500 AS INT) FROM range(2000)")
    eng.sql("INSERT INTO fact SELECT CAST(id % 2000 AS INT), CAST(id AS INT) FROM range(4000)")
    q = "SELECT fact.k AS k, x, v FROM fact JOIN dim ON fact.k = dim.k WHERE dim.v = 7"

    # Catalyst knobs for ENGINE queries live on the engine's private
    # session (session isolation), not the shared fixture session
    old_cbo = eng.spark.conf.get("spark.sql.cbo.enabled")
    old_thresh = eng.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        eng.spark.conf.set("spark.sql.cbo.enabled", "true")
        eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")

        before = join_strategies(eng.sql(q).df)
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before

        eng.sql("ANALYZE TABLE dim")
        eng.sql("ANALYZE TABLE fact")

        df = eng.sql(q).df
        after = join_strategies(df)
        assert "BroadcastHashJoin" in after, after
        # stats are visible to the cost model (EXPLAIN COST rowCount)
        assert "rowCount" in plan_string(df, "cost")
    finally:
        eng.spark.conf.set("spark.sql.cbo.enabled", old_cbo)
        eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
