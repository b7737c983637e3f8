"""Comparison-coercion truth tables (SURVEY §7.3.2 watch item).

The reference picks ONE of three eval types per comparison
(expression/builtin_compare.go:59-76 getBaseCmpType):
  string vs string -> ETString (binary collation compare)
  int    vs int    -> ETInt    (exact 64-bit compare)
  anything else    -> ETReal   (both sides to float64; strings via
                                types/convert.go:408 StrToFloat —
                                best-effort valid-prefix parse, ""->0)

The engine evaluates comparisons in Spark SQL with ANSI off
(engine.py sets spark.sql.ansi.enabled=false). These tests pin where
that MATCHES the reference and document the bounded divergences:

1. Non-numeric string vs number: MySQL parses the valid numeric
   PREFIX ('12abc' -> 12.0, '' -> 0, with a truncation warning);
   Spark's lenient cast yields NULL for any string that is not fully
   parseable, so the comparison is NULL (never TRUE). Spark is
   STRICTER; rows drop where MySQL would warn-and-match.
2. String vs INT-typed side: CLOSED in round 13 (was: Spark cast the
   STRING to the int side, truncating). The engine rewrites such
   comparisons to REAL — numeric literals unconditionally, identifier
   sides via a conservative schema resolver (sqlparse.py
   rewrite_string_number_compares + engine.py _int_col_resolver) —
   so '12.5' > 12 is TRUE and '12.5' = 12 is FALSE, matching
   getBaseCmpType's ETReal. Round 14 extends the resolver through
   single-level derived schemas (subquery/CTE pass-through, simple
   AS-aliases). Where it still cannot PROVE the identifier is an int
   column (retyping aliases, CTE column lists, set operations, mixed
   types, external tables), the expression keeps Spark's native
   coercion — pinned below as the remaining bounded corner.
3. Exact-looking literals: 'x.0' literals are DECIMAL in Spark
   (exact), REAL in the reference's three-type system — so
   2^53+1 = 9007199254740992.0 is FALSE in Spark (exact) and TRUE in
   the reference (both through float64). Spark is more precise.
"""

from __future__ import annotations

import pytest

from tinysql_spark.engine import Engine


@pytest.fixture(scope="module")
def ceng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh_coerce")))


def scalar(ceng, expr: str):
    return ceng.sql(f"SELECT ({expr}) AS v").df.collect()[0][0]


def truth(ceng, expr: str):
    v = scalar(ceng, expr)
    return None if v is None else bool(v)


# -- int vs int: exact 64-bit compare, never through double ---------------


def test_int_int_is_exact_64bit(ceng):
    """types/compare.go:22 CompareInt64 — a double roundtrip would
    collapse 2^53+1 and 2^53; the int path must not."""
    assert truth(ceng, "9007199254740993 = 9007199254740992") is False
    assert truth(ceng, "9007199254740993 > 9007199254740992") is True
    assert truth(ceng, "-9223372036854775807 < 9223372036854775807") is True
    assert truth(ceng, "5 = 5") is True
    assert truth(ceng, "5 <> 5") is False


# -- int vs real: promote to real (getBaseCmpType fallthrough) ------------


def test_int_real_promotes_to_real(ceng):
    assert truth(ceng, "1 = 1.0") is True
    assert truth(ceng, "3 < 3.5") is True
    assert truth(ceng, "4 > 3.5") is True
    assert truth(ceng, "0 = 0.0") is True
    # divergence 3 (Spark MORE precise): 'x.0' literals are DECIMAL in
    # Spark, so 2^53+1 keeps full precision and the compare is FALSE;
    # the reference's ETReal path pushes both through float64 -> TRUE
    assert truth(ceng, "9007199254740993 = 9007199254740992.0") is False
    # forced through an actual REAL, parity with the reference returns
    assert truth(ceng, "9007199254740993 = CAST(9007199254740992 AS DOUBLE)") is True


# -- string vs string: binary compare (CompareString) ---------------------


def test_string_string_binary_compare(ceng):
    assert truth(ceng, "'abc' < 'abd'") is True
    assert truth(ceng, "'abc' = 'abc'") is True
    assert truth(ceng, "'B' < 'a'") is True  # binary collation: 0x42 < 0x61
    assert truth(ceng, "'abc' < 'abcd'") is True  # prefix sorts first
    # numeric-looking strings still compare as STRINGS when both sides
    # are strings — '9' > '10' lexicographically (MySQL parity)
    assert truth(ceng, "'9' > '10'") is True


# -- string vs number: ETReal via numeric parse ---------------------------


def test_string_number_numeric_compare(ceng):
    """Fully numeric strings convert and compare numerically
    (StrToFloat happy path); integral strings agree with the
    reference against either int or real sides."""
    assert truth(ceng, "'12' = 12") is True
    assert truth(ceng, "' 3.5 ' = 3.5") is True  # whitespace trimmed
    assert truth(ceng, "'-4' < 0") is True
    assert truth(ceng, "'0.0' = 0") is True
    # and it is a NUMERIC compare, not lexicographic: '9' < 10
    assert truth(ceng, "'9' < 10") is True
    # reference semantics (ETReal) whenever the numeric side is real
    assert truth(ceng, "'12.5' > 12.0") is True
    assert truth(ceng, "'1e2' = CAST(100 AS DOUBLE)") is True


def test_string_vs_int_literal_compares_as_real(ceng):
    """Former DOCUMENTED DIVERGENCE 2, closed in round 13: a string
    literal against an INT literal compares as REAL (getBaseCmpType
    ETReal; types/convert.go StrToFloat), exactly like MySQL — the
    rewrite wraps the numeric side in CAST(.. AS DOUBLE)."""
    assert truth(ceng, "'12.5' > 12") is True  # was FALSE pre-r13
    assert truth(ceng, "'12.5' = 12") is False  # was TRUE pre-r13
    assert truth(ceng, "'1e2' = 100") is True  # was NULL pre-r13
    assert truth(ceng, "12 < '12.5'") is True  # mirrored operand order
    assert truth(ceng, "'0.5' < 1") is True
    assert truth(ceng, "'-4.5' < -4") is True
    # strings against REAL sides were already ETReal — unchanged
    assert truth(ceng, "'12.5' > 12.0") is True


def test_string_vs_int_column_compares_as_real(ceng):
    """The identifier half: an INT COLUMN against a numeric string
    compares as REAL via the schema resolver; a STRING column keeps
    the binary string compare (both sides strings -> ETString)."""
    ceng.sql("CREATE TABLE coerce_ic (ik INT, bk BIGINT, sk VARCHAR(8))")
    ceng.sql("INSERT INTO coerce_ic VALUES (12, 12, '12')")
    one = lambda q: ceng.sql(q).df.collect()  # noqa: E731
    assert len(one("SELECT 1 AS v FROM coerce_ic WHERE ik < '12.5'")) == 1
    assert len(one("SELECT 1 AS v FROM coerce_ic WHERE ik = '12.5'")) == 0
    assert len(one("SELECT 1 AS v FROM coerce_ic WHERE '12.5' > bk")) == 1
    assert len(one("SELECT 1 AS v FROM coerce_ic WHERE bk = '1.2e1'")) == 1
    # string column vs string literal: BINARY compare, not numeric —
    # '12' < '12.5' lexicographically AND numerically here, so pin a
    # case where they differ: '9' vs '10' (lexicographic: '9' > '10')
    ceng.sql("INSERT INTO coerce_ic VALUES (9, 9, '9')")
    got = one("SELECT sk FROM coerce_ic WHERE sk > '10'")
    assert {r[0] for r in got} == {"12", "9"}  # lexicographic, kept
    ceng.sql("DROP TABLE coerce_ic")


def test_string_int_resolver_through_derived_schemas(ceng):
    """Round 14 (VERDICT r13 next #3): resolution propagates through
    single-level subqueries, CTEs, and simple aliases — the r13
    pinned corner rows flip to REAL-compare parity — while anything
    that RETYPES a name still refuses."""
    ceng.sql("CREATE TABLE coerce_g (ik INT)")
    ceng.sql("INSERT INTO coerce_g VALUES (12)")
    # alias shadows ik with a string expression -> resolver refuses
    # ik; Spark's native string-vs-string compare applies
    got = ceng.sql(
        "SELECT concat(ik, 'x') AS ik FROM coerce_g ORDER BY ik = '12.5'"
    ).df.collect()
    assert [r[0] for r in got] == ["12x"]
    # subquery pass-through: WAS the pinned truncating corner (TRUE);
    # now resolves through the derived schema -> REAL -> FALSE
    v = ceng.sql(
        "SELECT (ik = '12.5') AS v FROM (SELECT ik FROM coerce_g) t"
    ).df.collect()[0][0]
    assert v is False
    assert ceng.sql(
        "SELECT (ik > '11.5') AS v FROM (SELECT ik FROM coerce_g) t"
    ).df.collect()[0][0] is True
    # CTE pass-through resolves the same way
    v = ceng.sql(
        "WITH c AS (SELECT ik FROM coerce_g) SELECT (ik = '12.5') AS v FROM c"
    ).df.collect()[0][0]
    assert v is False
    # simple AS-alias of an int column: the alias inherits resolution
    v = ceng.sql(
        "SELECT (k2 = '12.5') AS v FROM (SELECT ik AS k2 FROM coerce_g) t"
    ).df.collect()[0][0]
    assert v is False
    ceng.sql("DROP TABLE coerce_g")


def test_string_int_resolver_refusal_corners(ceng):
    """What still refuses (conservative direction — a skipped rewrite
    keeps Spark's native coercion, never a wrong retype):
    - complex-expression aliases (CAST to CHAR shadows the type),
    - implicit trailing-identifier aliases,
    - CTE column lists (positional rename),
    - set operations (UNION renames positionally across branches)."""
    ceng.sql("CREATE TABLE coerce_r (ik INT, sk VARCHAR(8))")
    ceng.sql("INSERT INTO coerce_r VALUES (12, 'x')")
    # string-typed alias via explicit AS: ik poisoned -> the outer
    # compare is string-vs-string (binary); pin the shape that
    # differs from REAL: lexicographic GT ('12' > '110' as strings,
    # 12 < 110 as numbers)
    v = ceng.sql(
        "SELECT (ik > '110') AS v FROM "
        "(SELECT concat(ik, '') AS ik FROM coerce_r) t"
    ).df.collect()[0][0]
    assert v is True  # lexicographic; a wrong retype would be False
    # implicit alias (no AS): same refusal
    v = ceng.sql(
        "SELECT (ik > '110') AS v FROM "
        "(SELECT concat(ik, '') ik FROM coerce_r) t"
    ).df.collect()[0][0]
    assert v is True
    # CTE column list renames sk's values to ik -> poisoned -> binary
    v = ceng.sql(
        "WITH c (ik) AS (SELECT sk FROM coerce_r) "
        "SELECT (ik = '12.5') AS v FROM c"
    ).df.collect()[0][0]
    assert v is False  # 'x' = '12.5' binary; a wrong retype would be NULL
    ceng.sql("DROP TABLE coerce_r")


def test_string_number_divergence_is_null_not_prefix(ceng):
    """DOCUMENTED DIVERGENCE: MySQL/the reference parse the valid
    numeric prefix ('12abc' -> 12, '' -> 0, truncation warning);
    Spark's lenient cast yields NULL, making the comparison NULL.
    Strictly narrower: a row MySQL would warn-and-match drops instead
    of silently matching something else. Pin the NULL so a future
    Spark upgrade cannot change this silently."""
    assert truth(ceng, "'12abc' = 12") is None
    assert truth(ceng, "'abc' = 0") is None
    assert truth(ceng, "'' = 0") is None
    # NULL propagates through 3VL, so NOT(cmp) is also NULL, and a
    # WHERE clause drops the row either way
    assert truth(ceng, "NOT ('12abc' = 12)") is None
    ceng.sql("CREATE TABLE coerce_t (s varchar(8))")
    ceng.sql("INSERT INTO coerce_t VALUES ('12abc'), ('12')")
    got = [r[0] for r in ceng.sql("SELECT s FROM coerce_t WHERE s = 12").df.collect()]
    assert got == ["12"]  # MySQL would also return '12abc'
    ceng.sql("DROP TABLE coerce_t")


# -- NULL operands: any comparison with NULL is NULL (3VL) ----------------


def test_null_comparisons_are_null(ceng):
    for op in ("=", "<>", "<", "<=", ">", ">="):
        assert truth(ceng, f"NULL {op} 1") is None
        assert truth(ceng, f"'a' {op} NULL") is None
    # and the reference's 3VL logic ops over those NULLs
    assert truth(ceng, "(NULL = 1) AND FALSE") is False
    assert truth(ceng, "(NULL = 1) OR TRUE") is True
    assert truth(ceng, "(NULL = 1) OR FALSE") is None


# -- comparisons nested in reference builtins -----------------------------


def test_coercion_composes_with_mysql_builtins(ceng):
    """The coerced comparison feeds IF/IFNULL/ISNULL like any boolean
    (builtin_control.go IF evaluates cond as int)."""
    assert scalar(ceng, "IF('12' = 12, 'y', 'n')") == "y"
    # NULL condition takes the else branch (MySQL IF semantics)
    assert scalar(ceng, "IF('12abc' = 12, 'y', 'n')") == "n"
    assert scalar(ceng, "ISNULL('' = 0)") in (1, True)


# -- CAST(string AS UNSIGNED) prefix parse (round 12) ----------------------
# Reference: types/convert.go StrToUint -> getValidFloatPrefix +
# floatStrToIntStr + ErrOverflow saturation. Closes VERDICT r11
# missing #3: garbage-suffixed strings parse their longest float
# prefix with a warning in MySQL; fully non-numeric strings parse as
# 0; overflowing magnitudes saturate (positive -> 2^64-1, negative ->
# 0); NULL stays NULL. Integer negatives keep the mod-2^64 wrap.


def test_unsigned_cast_string_prefix_parse(ceng):
    import decimal

    U64MAX = decimal.Decimal(2**64 - 1)
    cases = {
        "'12abc'": 12,
        "'abc'": 0,
        "''": 0,
        "'12.7junk'": 13,          # float prefix rounds (floatStrToIntStr)
        "'  42  '": 42,            # TrimSpace first
        "'+7q'": 7,
        "'1e3'": 1000,             # exponent prefix
        "'-5xyz'": decimal.Decimal(2**64 - 5),  # negative prefix wraps
        "NULL": None,
        "'1e30'": U64MAX,          # positive overflow saturates
        "'-1e30'": 0,              # negative overflow saturates at 0
    }
    for expr, want in cases.items():
        got = scalar(ceng, f"CAST({expr} AS UNSIGNED)")
        assert got == want, f"CAST({expr} AS UNSIGNED) = {got!r}, want {want!r}"


def test_unsigned_cast_numeric_paths_unchanged(ceng):
    import decimal

    assert scalar(ceng, "CAST(-1 AS UNSIGNED)") == decimal.Decimal(2**64 - 1)
    assert scalar(ceng, "CAST(-1.7 AS UNSIGNED)") == decimal.Decimal(2**64 - 2)
    assert scalar(ceng, "CAST(0 AS UNSIGNED)") == 0
    assert scalar(ceng, "CAST(18446744073709551615 AS UNSIGNED)") == decimal.Decimal(
        2**64 - 1
    )


def test_unsigned_cast_decimal_window_saturates(ceng):
    """The DECIMAL(21,0) fast path holds up to 10^21-1, so values in
    [2^64, 10^21) passed it and WRAPPED via pmod where MySQL
    saturates (review r12 #2) — now every operand >= 2^64 saturates
    to 2^64-1 and every operand below int64 range saturates to 0
    (ConvertDecimalToUint); true int64 negatives keep the wrap."""
    import decimal

    U64MAX = decimal.Decimal(2**64 - 1)
    assert scalar(ceng, "CAST('18446744073709551616' AS UNSIGNED)") == U64MAX
    assert scalar(ceng, "CAST('99999999999999999999' AS UNSIGNED)") == U64MAX
    assert scalar(ceng, "CAST(18446744073709551616 AS UNSIGNED)") == U64MAX
    assert scalar(ceng, "CAST('-9223372036854775809' AS UNSIGNED)") == 0
    assert scalar(ceng, "CAST(-9223372036854775808 AS UNSIGNED)") == decimal.Decimal(
        2**63
    )
