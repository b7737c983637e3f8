"""Physical layout helpers: bucketing & sorted files.

The reference's secondary indexes (SURVEY §4.4, util/ranger) have no
Spark analog; their *capability* — avoiding full scans and avoiding
re-shuffles on known keys — maps to physical layout:

- ``bucket_by`` — hash-bucketed managed table: two tables bucketed on
  the same join key join WITHOUT an Exchange on either side. At 100 TB
  this is the difference between an hourly fact-fact join shuffling
  200 TB and shuffling nothing.
- ``sorted_parquet`` — sort-within-files on declared index columns so
  parquet row-group min/max statistics actually prune (the moral
  equivalent of an index range scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucket_by(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table.

    Joins/aggregations on ``bucket_cols`` between tables with the same
    bucket count read co-located partitions and skip the shuffle.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")


def sorted_parquet(df: DataFrame, path: str, sort_cols: list[str]) -> None:
    """Write parquet range-partitioned + sorted on sort_cols: each file
    covers a narrow key range, so min/max row-group stats prune reads
    for range predicates on those columns (index-scan equivalent)."""
    (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the physical plan."""
    from ..plans.inspect import plan_string

    return plan_string(df, mode="simple").count("Exchange hashpartitioning")


def zorder_keys(df: DataFrame, cols: list[str], bits: int = 16):
    """Morton (Z-order) interleave key over ``cols`` as a Column.

    Each column is scaled to a ``bits``-bit bucket id by min/max range
    (one bounded 1-row aggregate per call — the house-allowed collect
    class), then the bucket ids are bit-interleaved so that sorting by
    the resulting key clusters rows that are close in EVERY dimension.
    Files written in z-key order therefore carry tight min/max
    statistics on ALL the z-ordered columns — the multi-column
    index-scan analog a single-column sort cannot give (a lexicographic
    sort leaves every trailing column spanning its full range in every
    file). The linear min/max scale is the simple variant; a skewed
    production corpus swaps in rank-based buckets (percentile
    boundaries from ANALYZE histograms) — same interleave, different
    scale. Public design: Morton 1966; Delta Lake / Databricks
    OPTIMIZE ZORDER BY use the same construction."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n = len(cols)
    scaled = []
    for i, c in enumerate(cols):
        # empty table / all-NULL column: no range to scale — constant
        # bucket 0 (NULL values yield a NULL key either way, which
        # range-partitioning groups first; rewrite stays correct)
        mn = float(stats[f"mn_{i}"]) if stats[f"mn_{i}"] is not None else 0.0
        mx = float(stats[f"mx_{i}"]) if stats[f"mx_{i}"] is not None else 0.0
        span = max(mx - mn, 1e-300)
        b = F.least(
            F.lit((1 << bits) - 1),
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * ((1 << bits) - 1))
            .cast("long"),
        )
        scaled.append(b)
    # interleave: output bit (j*n + i) takes bit j of column i's bucket
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(scaled):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def zorder_parquet(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = 16
) -> None:
    """Write parquet clustered by the Morton key over ``cols``: range-
    partition + sort on the z-key, so each of the ``n_files`` files
    covers a compact hyper-rectangle and min/max row-group stats prune
    reads for predicates on ANY z-ordered column — the composite-index
    capability (reference: multi-column EncodeIndexSeekKey,
    tablecodec/tablecodec.go:80-87) that ``sorted_parquet`` only
    provides for the leading column."""
    zk = zorder_keys(df, cols, bits)
    (
        df.withColumn("__zk", zk)
        .repartitionByRange(n_files, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` from parquet footers — the same
    statistics a scan's file-skipping consults; used by tests to count
    how many files a range predicate would actually read."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        out.append((mn, mx))
    return out


def files_overlapping(path: str, col: str, lo, hi) -> int:
    """How many files of ``path`` a scan with ``col BETWEEN lo AND hi``
    must read, judged by footer min/max — the file-skipping count."""
    return sum(
        1 for mn, mx in file_ranges(path, col) if mn is not None and not (mx < lo or mn > hi)
    )
