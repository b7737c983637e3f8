"""Layout tests: bucketed joins skip the shuffle; sorted parquet
prunes row groups via min/max stats."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tinysql_spark.sources.layout import bucket_by, exchange_count, sorted_parquet
from tinysql_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    # warehouse.dir is static; scope the managed tables via db LOCATION
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{wh}'")
    spark.sql("USE bktest")
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    bucket_by(li, "bktest.li_b", ["l_orderkey"], num_buckets=8)
    bucket_by(orders, "bktest.ord_b", ["o_orderkey"], num_buckets=8)
    yield
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")
    spark.sql("USE default")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("bktest.li_b")
        orders = spark.table("bktest.ord_b")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
            "o_orderstatus"
        ).agg(F.sum("l_quantity").alias("q"))
        # the join itself must not introduce a shuffle on either side;
        # only the final groupBy re-partitions (1 exchange, not 3)
        assert exchange_count(joined) <= 1
        # and results are correct vs the plain-parquet join
        plain = (
            load_table(spark, SF, "lineitem")
            .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        got = {(r[0], round(r[1], 2)) for r in joined.collect()}
        want = {(r[0], round(r[1], 2)) for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_shuffles_both_sides(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert exchange_count(joined) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_sorted_parquet_prunes(spark, tmp_path):
    path = str(tmp_path / "li_sorted")
    sorted_parquet(load_table(spark, SF, "lineitem"), path, ["l_orderkey"])
    df = spark.read.parquet(path).filter(F.col("l_orderkey") == 42)
    from tinysql_spark.plans import pushed_filters

    assert any("l_orderkey" in f for f in pushed_filters(df))
    got = df.count()
    want = load_table(spark, SF, "lineitem").filter(F.col("l_orderkey") == 42).count()
    assert got == want


def test_create_index_backfill_relayout(spark, tmp_path):
    """CREATE INDEX on a populated table re-lays data range-partitioned
    + sorted on the index columns; data and rowids survive intact."""
    import pyarrow.parquet as pq
    import glob as g

    from tinysql_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE bk (a int, b varchar(8))")
    vals = ", ".join(f"({i % 97}, 'v{i}')" for i in range(500))
    eng.sql(f"INSERT INTO bk VALUES {vals}")
    before = sorted(tuple(r) for r in eng.sql("SELECT a, b FROM bk").df.collect())

    eng.sql("CREATE INDEX ia ON bk (a)")
    after = sorted(tuple(r) for r in eng.sql("SELECT a, b FROM bk").df.collect())
    assert after == before

    # every data file must be internally sorted on `a` (row-group
    # min/max stats are then selective for point/range reads)
    files = g.glob(str(tmp_path / "wh" / "default" / "bk" / "data" / "*.parquet"))
    assert files
    multi = 0
    for f in files:
        col = pq.read_table(f, columns=["a"])["a"].to_pylist()
        assert col == sorted(col), f
        multi += len(col) > 0
    assert multi > 0

    # point query still correct after relayout
    n = eng.sql("SELECT count(*) AS c FROM bk WHERE a = 5").df.collect()[0][0]
    assert n == len([1 for i in range(500) if i % 97 == 5])

# --------------------------------------------------------------------------
# CREATE TABLE ... CLUSTERED BY ... INTO n BUCKETS (engine DDL surface)
# --------------------------------------------------------------------------


@pytest.fixture()
def bkeng(spark, tmp_path):
    from tinysql_spark.engine import Engine

    return Engine(spark, str(tmp_path / "wh")), tmp_path


def _load_bucketed(eng):
    eng.sql("CREATE TABLE fact (k INT, v DOUBLE) CLUSTERED BY (k) SORTED BY (k) INTO 8 BUCKETS")
    eng.sql("CREATE TABLE dim (k INT, name VARCHAR(20)) CLUSTERED BY (k) INTO 8 BUCKETS")
    eng.sql("INSERT INTO fact VALUES " + ",".join(f"({i % 50},{i * 1.5})" for i in range(1000)))
    eng.sql("INSERT INTO dim VALUES " + ",".join(f"({i},'n{i}')" for i in range(50)))


def test_ddl_bucketed_join_no_shuffle(spark, bkeng):
    """Co-bucketed equi-join + bucket-key groupBy through engine SQL:
    zero shuffle exchanges — the scans' HashPartitioning(k, 8) serves
    the join and the aggregation."""
    eng, _ = bkeng
    _load_bucketed(eng)
    eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = eng.sql(
            "EXPLAIN FORMATTED SELECT f.k, sum(f.v) AS s, max(d.name) AS nm "
            "FROM fact f JOIN dim d ON f.k = d.k GROUP BY f.k"
        ).df.collect()[0][0]
        import re as _re

        assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
        assert "Bucketed: true" in plan, plan
        rows = eng.sql(
            "SELECT f.k, sum(f.v) AS s FROM fact f JOIN dim d ON f.k = d.k "
            "GROUP BY f.k ORDER BY f.k"
        ).df.collect()
        assert len(rows) == 50
        assert rows[0][1] == sum(i * 1.5 for i in range(1000) if i % 50 == 0)
    finally:
        eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_ddl_bucketed_append_delete_layout(spark, bkeng):
    """Appends add bucket-suffixed files per batch (O(batch), multiple
    files per bucket); DELETE's rewrite re-buckets; every data file
    keeps the bucket-id suffix so the bucketed scan stays valid."""
    import glob as g
    import re as _re

    eng, tmp_path = bkeng
    _load_bucketed(eng)
    eng.sql("INSERT INTO fact VALUES (1, 999.0)")
    assert eng.sql("SELECT count(*) AS n FROM fact").df.collect()[0][0] == 1001
    eng.sql("DELETE FROM fact WHERE k = 1")
    assert eng.sql("SELECT count(*) AS n FROM fact").df.collect()[0][0] == 980
    files = g.glob(str(tmp_path / "wh" / "default" / "fact" / "data" / "part-*.parquet"))
    assert files
    for f in files:
        assert _re.search(r"_\d{5}\.", f), f"file lacks bucket suffix: {f}"
    # TRUNCATE keeps the table readable (and still bucketed on reload)
    eng.sql("TRUNCATE TABLE fact")
    assert eng.sql("SELECT count(*) AS n FROM fact").df.collect()[0][0] == 0


def test_ddl_bucket_spec_persists_and_validates(spark, bkeng):
    from tinysql_spark.engine import Engine

    eng, tmp_path = bkeng
    _load_bucketed(eng)
    show = eng.sql("SHOW CREATE TABLE fact").df.collect()[0][1]
    assert "CLUSTERED BY (`k`) SORTED BY (`k`) INTO 8 BUCKETS" in show
    # reopen the warehouse: spec must survive the catalog round-trip
    eng2 = Engine(spark, str(tmp_path / "wh"))
    info = eng2.catalog.get_table("default", "fact")
    assert info.bucket and info.bucket.num_buckets == 8 and info.bucket.columns == ["k"]
    with pytest.raises(ValueError, match="unknown column"):
        eng.sql("CREATE TABLE bad (a INT) CLUSTERED BY (zz) INTO 4 BUCKETS")


def test_optimize_table_compacts(spark, bkeng):
    """OPTIMIZE TABLE merges per-insert file sets into the declared
    layout: plain -> coalesced file(s); bucketed -> one file/bucket."""
    import glob as g

    eng, tmp_path = bkeng
    eng.sql("CREATE TABLE plain (a INT, b VARCHAR(10))")
    for i in range(6):
        eng.sql(f"INSERT INTO plain VALUES ({i}, 'x{i}')")
    pdir = str(tmp_path / "wh" / "default" / "plain" / "data")
    assert len(g.glob(pdir + "/part-*")) >= 6
    msg = eng.sql("OPTIMIZE TABLE plain").message
    assert "optimized" in msg
    assert len(g.glob(pdir + "/part-*")) == 1
    assert eng.sql("SELECT count(*) AS n FROM plain").df.collect()[0][0] == 6

    _load_bucketed(eng)
    for i in range(5):
        eng.sql(f"INSERT INTO fact VALUES ({i}, {i}.5)")
    fdir = str(tmp_path / "wh" / "default" / "fact" / "data")
    n_before = len(g.glob(fdir + "/part-*"))
    eng.sql("OPTIMIZE TABLE fact")
    n_after = len(g.glob(fdir + "/part-*"))
    assert n_after <= 8 < n_before
    assert eng.sql("SELECT count(*) AS n FROM fact").df.collect()[0][0] == 1005
    # still a valid bucketed table: co-bucketed join stays shuffle-free
    # (engine queries plan on the engine's private session)
    eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import re as _re

        plan = eng.sql(
            "EXPLAIN FORMATTED SELECT f.k, max(d.name) AS nm "
            "FROM fact f JOIN dim d ON f.k = d.k GROUP BY f.k"
        ).df.collect()[0][0]
        assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 0
    finally:
        eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """The composite-index capability: a lexicographic sort gives
    file-level min/max pruning on the LEADING column only (every file
    spans the trailing column's full range); the Morton z-order layout
    gives it on BOTH. Judged from the same parquet footers a scan's
    file skipping consults: a 1/16-range predicate on the trailing
    column must read (nearly) all lexicographic files but only a
    minority of z-ordered ones."""
    from pyspark.sql import functions as F

    from tinysql_spark.sources.layout import (
        files_overlapping,
        sorted_parquet,
        zorder_parquet,
    )

    n = 1 << 14
    df = (
        spark.range(n)
        .select(
            # two independent uniform dims (decorrelated by hashing)
            (F.abs(F.xxhash64("id")) % 1000).alias("a"),
            (F.abs(F.xxhash64((F.col("id") + 1).cast("string"))) % 1000).alias("b"),
        )
    )
    lex = str(tmp_path / "lex")
    zed = str(tmp_path / "zed")
    n_files = 16
    sorted_parquet(df.repartition(n_files), lex, ["a", "b"])
    zorder_parquet(df, zed, ["a", "b"], n_files=n_files)

    import glob

    assert len(glob.glob(zed + "/*.parquet")) == n_files
    # zorder_parquet's repartitionByRange samples with a seed derived
    # from the RDD id, so the exact file boundaries depend on session
    # history (how many RDDs earlier tests created) — a SINGLE query
    # range's overlap count jitters by a few files across runs (the
    # round-14 driver read 9 where a fresh session reads 5). Average
    # over all 16 disjoint 1/16-ranges instead: the mean is the
    # layout's actual pruning factor and is stable (probed 6.3-6.9 for
    # the trailing dim across 12 session histories and 8/32/48 cores).
    ranges = [(r * 1000 // 16, (r + 1) * 1000 // 16 - 1) for r in range(16)]
    lex_files = len(glob.glob(lex + "/*.parquet"))
    avg_lex_b = sum(files_overlapping(lex, "b", lo, hi) for lo, hi in ranges) / 16
    avg_z_b = sum(files_overlapping(zed, "b", lo, hi) for lo, hi in ranges) / 16
    avg_z_a = sum(files_overlapping(zed, "a", lo, hi) for lo, hi in ranges) / 16
    # lexicographic: b spans its full range in every a-sorted file
    assert avg_lex_b >= lex_files - 1, (avg_lex_b, lex_files)
    # z-order: each file covers ~a quarter of each dimension (16 files
    # across 2 dims -> 4x4 grid), so a 1/16-range predicate touches
    # on average at most half the files — on BOTH dimensions
    assert avg_z_b <= n_files / 2, (avg_z_b, n_files)
    assert avg_z_a <= n_files / 2, (avg_z_a, n_files)
    # correctness: same rows either way
    assert (
        spark.read.parquet(zed).orderBy("a", "b").collect()
        == spark.read.parquet(lex).orderBy("a", "b").collect()
    )


def test_optimize_zorder_by(spark, bkeng):
    """OPTIMIZE TABLE ... ZORDER BY (a, b) rewrites the table
    clustered by the Morton key: footer min/max must prune range
    predicates on BOTH columns (a plain sort covers the leading one
    only), rows survive the rewrite exactly, and bucketed tables /
    unknown or non-numeric columns are rejected loudly."""
    import glob as g

    import pytest as _pytest

    from tinysql_spark.sources.layout import files_overlapping

    eng, tmp_path = bkeng
    eng.sql("CREATE TABLE zt (a INT, b INT, s VARCHAR(20))")
    eng.sql(
        "INSERT INTO zt SELECT"
        " CAST(abs(xxhash64(CAST(id AS STRING))) % 1000 AS INT),"
        " CAST(abs(xxhash64(CAST(id + 1 AS STRING))) % 1000 AS INT),"
        " CAST(id AS STRING)"
        " FROM range(16384)"
    )
    n_total = eng.sql("SELECT count(*) AS n FROM zt").df.collect()[0][0]
    checksum = eng.sql("SELECT sum(a*31 + b) AS c FROM zt").df.collect()[0][0]
    eng.sql("SET @@optimize_target_mb = 1")  # force a multi-file rewrite
    # make each file small enough that the target yields a grid
    msg = eng.sql("OPTIMIZE TABLE zt ZORDER BY (a, b)").message
    assert "zorder by a, b" in msg
    zdir = str(tmp_path / "wh" / "default" / "zt" / "data")
    n_files = len(g.glob(zdir + "/part-*"))
    if n_files >= 4:
        # with a z-grid, a narrow range on EITHER column skips files
        assert files_overlapping(zdir, "b", 400, 430) < n_files
        assert files_overlapping(zdir, "a", 400, 430) < n_files
    assert eng.sql("SELECT count(*) AS n FROM zt").df.collect()[0][0] == n_total
    assert eng.sql("SELECT sum(a*31 + b) AS c FROM zt").df.collect()[0][0] == checksum
    with _pytest.raises(ValueError, match="unknown column"):
        eng.sql("OPTIMIZE TABLE zt ZORDER BY (zz)")
    with _pytest.raises(ValueError, match="numeric"):
        eng.sql("OPTIMIZE TABLE zt ZORDER BY (s)")
    _load_bucketed(eng)
    with _pytest.raises(ValueError, match="bucket"):
        eng.sql("OPTIMIZE TABLE fact ZORDER BY (k)")
