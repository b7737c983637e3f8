"""Unit tests for the MySQL-semantics expression layer against MySQL
truth tables — the reference's builtin tests
(`/root/reference/expression/builtin_op.go` three-valued logic,
`builtin_control.go` IF/IFNULL, `builtin_string.go` LENGTH/STRCMP,
`types/compare.go` coercion) re-expressed over Spark Columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinysql_spark.functions import mysql as M


def eval_rows(spark, cols):
    return spark.range(1).select(*cols).collect()[0]


# --- three-valued logic (builtin_op.go:64,:106,:168) ----------------------

TRUE, FALSE, NULL = True, False, None


@pytest.mark.parametrize(
    "a,b,want_and,want_or",
    [
        (TRUE, TRUE, TRUE, TRUE),
        (TRUE, FALSE, FALSE, TRUE),
        (FALSE, FALSE, FALSE, FALSE),
        (TRUE, NULL, NULL, TRUE),
        (FALSE, NULL, FALSE, NULL),
        (NULL, NULL, NULL, NULL),
    ],
)
def test_three_valued_and_or(spark, a, b, want_and, want_or):
    la, lb = F.lit(a).cast("boolean"), F.lit(b).cast("boolean")
    r = eval_rows(spark, [M.logic_and(la, lb).alias("x"), M.logic_or(la, lb).alias("y")])
    assert r["x"] == want_and
    assert r["y"] == want_or


@pytest.mark.parametrize("a,want", [(TRUE, FALSE), (FALSE, TRUE), (NULL, NULL)])
def test_three_valued_not(spark, a, want):
    assert eval_rows(spark, [M.logic_not(F.lit(a).cast("boolean")).alias("x")])["x"] == want


# --- ISNULL / IF / IFNULL (builtin_op.go:340, builtin_control.go) ---------


def test_isnull(spark):
    r = eval_rows(
        spark,
        [
            M.isnull(F.lit(None)).alias("a"),
            M.isnull(F.lit(0)).alias("b"),
            M.isnull(F.lit("")).alias("c"),
        ],
    )
    assert (r["a"], r["b"], r["c"]) == (1, 0, 0)


def test_if_null_condition_is_false(spark):
    # MySQL IF: NULL condition -> else branch
    cond = F.lit(None).cast("boolean")
    assert eval_rows(spark, [M.if_(cond, F.lit("t"), F.lit("f")).alias("x")])["x"] == "f"


def test_ifnull(spark):
    r = eval_rows(
        spark,
        [
            M.ifnull(F.lit(None), F.lit(5)).alias("a"),
            M.ifnull(F.lit(3), F.lit(5)).alias("b"),
            M.ifnull(F.lit(None).cast("int"), F.lit(None).cast("int")).alias("c"),
        ],
    )
    assert (r["a"], r["b"], r["c"]) == (5, 3, None)


# --- LENGTH / STRCMP (builtin_string.go:63,:99) ---------------------------


def test_length_is_bytes(spark):
    r = eval_rows(
        spark,
        [
            M.length(F.lit("abc")).alias("a"),
            M.length(F.lit("")).alias("b"),
            M.length(F.lit("héllo")).alias("c"),  # é = 2 bytes in UTF-8
            M.length(F.lit(None).cast("string")).alias("d"),
        ],
    )
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 0, 6, None)


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("a", "b", -1),
        ("b", "a", 1),
        ("a", "a", 0),
        ("", "", 0),
        ("", "a", -1),
        (None, "a", None),
        ("a", None, None),
    ],
)
def test_strcmp(spark, a, b, want):
    r = eval_rows(
        spark, [M.strcmp(F.lit(a).cast("string"), F.lit(b).cast("string")).alias("x")]
    )
    assert r["x"] == want


# --- arithmetic: div-by-zero -> NULL, NULL propagation --------------------


def test_safe_div(spark):
    r = eval_rows(
        spark,
        [
            M.safe_div(F.lit(10), F.lit(4)).alias("a"),
            M.safe_div(F.lit(10), F.lit(0)).alias("b"),
            M.safe_div(F.lit(None).cast("int"), F.lit(2)).alias("c"),
            M.safe_div(F.lit(10), F.lit(None).cast("int")).alias("d"),
        ],
    )
    assert r["a"] == 2.5
    assert r["b"] is None
    assert r["c"] is None
    assert r["d"] is None


# --- coercion: int vs string/real compare (types/compare.go) --------------


def test_numeric_string_compare_coercion(spark):
    # MySQL compares int vs numeric-string numerically; Spark casts the
    # string side to the numeric type in a binary comparison
    r = eval_rows(
        spark,
        [
            (F.lit(10) > F.lit("9")).alias("a"),
            (F.lit(1) == F.lit("1")).alias("b"),
            (F.lit(1.5) > F.lit(1)).alias("c"),  # int promoted to real
        ],
    )
    assert (r["a"], r["b"], r["c"]) == (True, True, True)


def test_between_in(spark):
    r = eval_rows(
        spark,
        [
            M.between(F.lit(5), 1, 10).alias("a"),
            M.between(F.lit(11), 1, 10).alias("b"),
            M.in_list(F.lit(3), [1, 2, 3]).alias("c"),
            M.in_list(F.lit(9), [1, 2, 3]).alias("d"),
            M.in_list(F.lit(None).cast("int"), [1, 2]).alias("e"),  # NULL IN -> NULL
        ],
    )
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (True, False, True, False, None)
