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
