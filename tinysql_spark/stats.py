"""Statistics collection — the reference's ANALYZE artifacts rebuilt
Spark-first (SURVEY §4.3).

Reference objects → this module:
- equi-depth Histogram (`statistics/histogram.go:38-70`)   → `Histogram`
  via one distributed `approx_percentile` pass (no sampling cap: the
  reference samples ≤10k rows/column, `executor/analyze.go:57-58`;
  approx_percentile streams the whole column in bounded memory).
- CMSketch point-frequency (`statistics/cmsketch.go:29-35`, the
  insert/query pair left as homework at `:52,:70`)          → `CMSketch`
  built as a d×w bounded aggregation: explode each value into d
  (row, bucket) cells with seeded xxhash64, count by cell, collect the
  d·w cell counts (a few KiB — NOT the data). Query = min over rows.
- FMSketch NDV (`statistics/fmsketch.go`)                   → HyperLogLog
  via `approx_count_distinct` (strictly better error bounds).

Everything here is one or two aggregation jobs per table regardless of
table size; only fixed-size summaries ever reach the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CM_DEPTH = 5
_CM_WIDTH = 2048
_HIST_BUCKETS = 16


@dataclass
class CMSketch:
    """Count-Min sketch: `query(v)` over-estimates the true frequency
    with error ≤ 2N/width at ≥ 1-(1/2)^depth confidence."""

    depth: int
    width: int
    total: int
    # cells[i][j] = count of values hashing to bucket j under seed i
    cells: list[list[int]]

    @staticmethod
    def _bucket(col, seed: int, width: int):
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(width)).cast("int")

    @classmethod
    def build(cls, df: DataFrame, column: str, depth: int = _CM_DEPTH, width: int = _CM_WIDTH) -> "CMSketch":
        vals = df.select(F.col(column).alias("v")).filter(F.col("v").isNotNull())
        rows = vals.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("i"), cls._bucket(F.col("v"), i, width).alias("j"))
                    for i in range(depth)
                ])
            ).alias("c")
        )
        agg = (
            rows.groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        cells = [[0] * width for _ in range(depth)]
        total = 0
        for r in agg:
            cells[r["i"]][r["j"]] = r["n"]
            if r["i"] == 0:
                total += r["n"]
        return cls(depth=depth, width=width, total=total, cells=cells)

    def query(self, spark, value) -> int:
        """Point-frequency estimate. Hashing must match the build side
        exactly, so the probe value goes through the same JVM xxhash64
        (one local row, no job)."""
        row = spark.range(1).select(
            *[
                self._bucket(F.lit(value), i, self.width).alias(f"j{i}")
                for i in range(self.depth)
            ]
        ).collect()[0]
        return min(self.cells[i][row[f"j{i}"]] for i in range(self.depth))


@dataclass
class ColumnStats:
    n: int
    null_count: int
    ndv: int
    min: object = None
    max: object = None
    # equi-depth bucket bounds: len = buckets+1; ~n/buckets rows per bucket
    histogram: list[float] = field(default_factory=list)
    cmsketch: CMSketch | None = None


_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "date", "timestamp"}


def collect_column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    with_cmsketch: bool = True,
    buckets: int = _HIST_BUCKETS,
) -> dict[str, ColumnStats]:
    """One aggregation pass for count/nulls/NDV/min/max over ALL
    columns, one approx_percentile pass for numeric histograms, plus
    one bounded pass per CMSketch column."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__ndv"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0]

    numeric = [c for c in cols if dtypes.get(c, "").split("(")[0] in _NUMERIC]
    hists: dict[str, list[float]] = {}
    if numeric and buckets > 0:
        qs = [i / buckets for i in range(buckets + 1)]
        hrow = df.agg(
            *[
                F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(c)
                for c in numeric
            ]
        ).collect()[0]
        hists = {c: list(hrow[c]) if hrow[c] else [] for c in numeric}

    out: dict[str, ColumnStats] = {}
    for c in cols:
        out[c] = ColumnStats(
            n=row["__n"],
            null_count=row[f"{c}__nulls"],
            ndv=row[f"{c}__ndv"],
            min=row[f"{c}__min"],
            max=row[f"{c}__max"],
            histogram=hists.get(c, []),
            cmsketch=CMSketch.build(df, c) if with_cmsketch else None,
        )
    return out


def stats_to_json(stats: dict[str, ColumnStats]) -> dict:
    """JSON-serializable form (reference persists stats in the KV
    store across restarts; here a sidecar file per table)."""
    out = {}
    for c, s in stats.items():
        out[c] = {
            "n": s.n,
            "null_count": s.null_count,
            "ndv": s.ndv,
            "min": s.min if isinstance(s.min, (int, float, str, type(None))) else str(s.min),
            "max": s.max if isinstance(s.max, (int, float, str, type(None))) else str(s.max),
            "histogram": s.histogram,
            "cmsketch": None
            if s.cmsketch is None
            else {
                "depth": s.cmsketch.depth,
                "width": s.cmsketch.width,
                "total": s.cmsketch.total,
                "cells": s.cmsketch.cells,
            },
        }
    return out


def stats_from_json(raw: dict) -> dict[str, ColumnStats]:
    out = {}
    for c, s in raw.items():
        cm = s.get("cmsketch")
        out[c] = ColumnStats(
            n=s["n"],
            null_count=s["null_count"],
            ndv=s["ndv"],
            min=s.get("min"),
            max=s.get("max"),
            histogram=s.get("histogram", []),
            cmsketch=None
            if cm is None
            else CMSketch(depth=cm["depth"], width=cm["width"], total=cm["total"], cells=cm["cells"]),
        )
    return out


def eq_selectivity(spark, stats: ColumnStats, value) -> float:
    """Point-predicate selectivity: CMSketch frequency / rowcount, the
    reference's `HistColl.Selectivity` fast path for equality
    (`statistics/selectivity.go:129`)."""
    if stats.n == 0:
        return 0.0
    if stats.cmsketch is not None:
        return min(1.0, stats.cmsketch.query(spark, value) / stats.n)
    return 1.0 / max(1, stats.ndv)
