"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — every implemented operator from SURVEY.md §2 plus the
                 training-data pipeline ops; (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent ANSI SQL per query (omitted only for
                 genuinely non-SQL-expressible ops: xxhash64-based LSH
                 sketches, the Python decode stub).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tinysql_spark.operators import all_oracles, all_queries
from tinysql_spark.operators.relational import q03_shipping_priority


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q3-shaped join+agg+TopN on sf0.001."""
    return q03_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
