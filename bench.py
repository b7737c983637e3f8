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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    spark = get_spark(app_name="tinysql_spark_bench")
    # warm the JVM + file listing so per-query numbers measure the
    # queries, not session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    startup = time.time() - t0

    times: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        t = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": parse_sf(sf_dir),
                "startup_sec": round(startup, 3),
                "n_queries": len(times),
            }
        )
    )


if __name__ == "__main__":
    main()
