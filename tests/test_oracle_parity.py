"""Run every registered query against its DuckDB oracle at sf0.01 —
the same comparison the driver performs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from tinysql_spark.operators import REGISTRY

from .parity import assert_match

ORACLED = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    spark_df = spec.fn(spark, sf_dir)
    duck_df = duck.execute(spec.oracle).df()
    assert_match(spark_df, duck_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
