"""MySQL-semantics scalar functions re-expressed as PySpark Columns.

This is the complete closed builtin registry of the reference
(`/root/reference/expression/builtin.go:332-364` — SURVEY §2.4):
ISNULL, LENGTH/OCTET_LENGTH, STRCMP, IF, IFNULL, AND/OR/NOT (3VL),
comparisons, arithmetic (+ - * /, div-by-zero → NULL), unary minus,
IN, BETWEEN desugar. Everything stays JVM-side (pure Column algebra,
no Python UDFs) so it lives inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def isnull(col: Column) -> Column:
    """ISNULL(x) -> 1/0 (reference: expression/builtin_op.go:340-370)."""
    return F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0))


def length(col: Column) -> Column:
    """LENGTH(str): byte length (MySQL LENGTH = octets).

    Reference: expression/builtin_string.go:63 (builtinLengthSig works on
    []byte). Spark's octet_length matches.
    """
    return F.octet_length(col)


def strcmp(a: Column, b: Column) -> Column:
    """STRCMP(a,b) -> -1/0/1, NULL if either is NULL.

    Reference: expression/builtin_string.go:99 (CompareStringString).
    """
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
        .when(a < b, F.lit(-1))
        .when(a > b, F.lit(1))
        .otherwise(F.lit(0))
    )


def if_(cond: Column, then: Column, otherwise: Column) -> Column:
    """IF(c,a,b): MySQL treats NULL condition as false.

    Reference: expression/builtin_control.go:142-282.
    F.when already treats a NULL predicate as not-matched -> otherwise.
    """
    return F.when(cond, then).otherwise(otherwise)


def ifnull(a: Column, b: Column) -> Column:
    """IFNULL(a,b) (reference: expression/builtin_control.go)."""
    return F.coalesce(a, b)


def safe_div(num: Column, den: Column) -> Column:
    """MySQL division: x/0 -> NULL (no error, no inf).

    Reference: expression/builtin_arithmetic.go (arithmeticDivide
    returns NULL on zero divisor). Spark's `/` already yields NULL for
    a zero divisor under non-ANSI mode, but we make it explicit so the
    semantics survive `spark.sql.ansi.enabled=true`.
    """
    return num / F.nullif(den, F.lit(0))


def logic_and(a: Column, b: Column) -> Column:
    """3-valued AND (reference: expression/builtin_op.go:64)."""
    return a & b


def logic_or(a: Column, b: Column) -> Column:
    """3-valued OR (reference: expression/builtin_op.go:106)."""
    return a | b


def logic_not(a: Column) -> Column:
    """3-valued NOT (reference: expression/builtin_op.go:168-189)."""
    return ~a


def between(col: Column, lo, hi) -> Column:
    """BETWEEN desugars to >= AND <= (planner/core/expression_rewriter.go:317-321)."""
    return (col >= lo) & (col <= hi)


def in_list(col: Column, values) -> Column:
    """IN (list) (reference: expression/builtin_other.go:77-208)."""
    return col.isin(*values)
