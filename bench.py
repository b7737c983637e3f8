"""Benchmark harness: runs the registered query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (no collect — the
full plan executes, nothing ships to the driver), matching how a
cluster job would materialize results.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from tinysql_spark.operators import REGISTRY  # noqa: E402
from tinysql_spark.session import get_spark  # noqa: E402


def parse_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


# Range-partition keys for the multi-file layout: repartitionByRange
# keeps each table globally sorted on its natural key across files, so
# the variant measures FILE PARALLELISM, not accidental de-clustering.
_MULTI_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "ts",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}


def build_multifile(spark, sf_dir: str, n: int) -> str:
    """Rewrite the (driver-generated, 1-file-per-table) SF dir into an
    n-file-per-big-table layout under .bench_multifile/ and return its
    path. VERDICT r4 item 9 / r5 item 9: the single-file layout hides
    map-stage parallelism — a real 100 TB table is thousands of files
    and Spark schedules one task per split. Built once, reused."""
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}x{n}"
    base = os.path.join(REPO, ".bench_multifile", tag)
    done = os.path.join(base, ".done")
    if not os.path.exists(done):
        from tinysql_spark.sources.tables import TPCH_TABLES, load_table

        os.makedirs(base, exist_ok=True)
        for t in TPCH_TABLES:
            df = load_table(spark, sf_dir, t)
            key = _MULTI_KEYS.get(t)
            out = df.repartitionByRange(n, key) if key else df.coalesce(1)
            out.write.mode("overwrite").parquet(os.path.join(base, f"{t}.parquet"))
        open(done, "w").close()
    return base


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    spark = get_spark(app_name="tinysql_spark_bench")
    # Warm the one-time machinery (JVM codegen, shuffle service, Arrow
    # python workers, parquet footer reads) so per-query numbers
    # measure the queries, not whichever query happens to run first.
    # The cost is reported separately as startup_sec.
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 8).alias("k")).count().collect()
    warm_pdf = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(warm_pdf("id")).write.mode("overwrite").format("noop").save()
    spark.range(100).select(
        F.aggregate(F.array(F.lit(1.0)), F.lit(0.0), lambda a, x: a + x)
    ).collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    multifile = int(os.environ.get("SPARK_GRAFT_MULTIFILE", "0"))
    if multifile:
        sf_real = parse_sf(sf_dir)
        sf_dir = build_multifile(spark, sf_dir, multifile)
    startup = time.time() - t0

    # Best-of-N per query: this box is shared (driver-side correctness
    # checks run concurrently), so single-shot timings see multi-second
    # stalls unrelated to the plan under test. Min over reps is the
    # standard noisy-host estimator; 3 warm reps keeps untouched-query
    # deltas attributable across rounds (best-of-2 still showed 2-4x
    # inflation on unchanged plans).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    only = {n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}
    names = sorted(n for n in REGISTRY if not only or n in only)
    times: dict[str, float] = {}
    for rep in range(reps):
        for name in names:
            fn = REGISTRY[name].fn
            t = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.time() - t, 3)
            times[name] = min(times.get(name, elapsed), elapsed)

    total = round(sum(times.values()), 3)
    # Per-class subtotals (VERDICT r9 item 5): one blended s/query rate
    # penalizes the pair-generation / iterative / streaming classes as
    # the relational majority gets faster; each class gets its own
    # subtotal and rate so the "weak" bar is computed per class.
    from tinysql_spark.operators.registry import bench_class

    classes: dict[str, dict[str, float]] = {}
    for name, sec in times.items():
        c = classes.setdefault(bench_class(name), {"sec": 0.0, "n": 0})
        c["sec"] += sec
        c["n"] += 1
    for c in classes.values():
        c["sec"] = round(c["sec"], 3)
        c["rate"] = round(c["sec"] / c["n"], 3)
    out = {
        "metric": "suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_real if multifile else parse_sf(sf_dir),
        "startup_sec": round(startup, 3),
        "n_queries": len(times),
        "classes": classes,
        # scaling contract (VERDICT r14 item 2): echo the requested
        # core count AND the parallelism the session actually runs
        # with, so a flat 8-vs-32-core ratio is attributable to
        # fixed-overhead-bound queries rather than an ignored knob.
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    if multifile:
        out["files_per_table"] = multifile
    print(json.dumps(out))


if __name__ == "__main__":
    main()
