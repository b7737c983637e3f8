"""Unit tests for the dialect shim — statement splitting, user-var
substitution, STRCMP rewrite. Mirrors the reference's parser tests
(`/root/reference/parser/parser_test.go`) for the statement subset
this engine hand-parses."""

from __future__ import annotations

from tinysql_spark.sqlparse import (
    render_literal,
    rewrite_strcmp,
    split_statements,
    substitute_user_vars,
)


class TestSubstituteUserVars:
    def test_basic(self):
        assert substitute_user_vars("SELECT @a", {"a": 5}) == "SELECT 5"

    def test_unset_renders_null(self):
        assert substitute_user_vars("SELECT @nope", {}) == "SELECT NULL"

    def test_string_value_quoted(self):
        assert substitute_user_vars("SELECT @s", {"s": "x'y"}) == "SELECT 'x\\'y'"

    def test_at_inside_single_quotes_untouched(self):
        sql = "SELECT * FROM t WHERE email = 'a@b.com'"
        assert substitute_user_vars(sql, {"b": 1}) == sql

    def test_at_inside_double_quotes_untouched(self):
        sql = 'SELECT "@a" FROM t'
        assert substitute_user_vars(sql, {"a": 1}) == sql

    def test_at_inside_backticks_untouched(self):
        sql = "SELECT `weird@col` FROM t"
        assert substitute_user_vars(sql, {"weird": 1}) == sql

    def test_mixed_quoted_and_real_var(self):
        got = substitute_user_vars(
            "SELECT @a FROM t WHERE email = 'a@b.com' AND x > @a", {"a": 7}
        )
        assert got == "SELECT 7 FROM t WHERE email = 'a@b.com' AND x > 7"

    def test_sysvar_untouched(self):
        sql = "SELECT @@max_connections"
        assert substitute_user_vars(sql, {"max_connections": 1}) == sql

    def test_escaped_quote_inside_literal(self):
        sql = r"SELECT 'it\'s @a' FROM t"
        assert substitute_user_vars(sql, {"a": 1}) == sql

    def test_bare_at_passthrough(self):
        sql = "SELECT '@' , x FROM t WHERE y = '@ @'"
        assert substitute_user_vars(sql, {}) == sql

    def test_no_vars_returns_same_object(self):
        sql = "SELECT 1 FROM t WHERE email = 'a@b.com'"
        assert substitute_user_vars(sql, {}) is sql


class TestRenderLiteral:
    def test_none(self):
        assert render_literal(None) == "NULL"

    def test_int_float(self):
        assert render_literal(3) == "3"
        assert render_literal(2.5) == "2.5"

    def test_string_escaping(self):
        assert render_literal("a'b\\c") == "'a\\'b\\\\c'"


class TestStrcmp:
    def test_rewrite_ignores_parens_in_strings(self):
        out = rewrite_strcmp("SELECT STRCMP(a, ')')")
        assert out.count("CASE WHEN") == 1

    def test_nested(self):
        out = rewrite_strcmp("SELECT STRCMP(lower(a), lower(b)) FROM t")
        assert "STRCMP" not in out.upper().replace("CASE", "")


class TestSplit:
    def test_semicolon_in_string(self):
        assert split_statements("SELECT ';'; SELECT 1") == ["SELECT ';'", "SELECT 1"]


class TestDbQualifierRewrite:
    def setup_method(self):
        from tinysql_spark.sqlparse import rewrite_db_qualifiers

        self.rw = rewrite_db_qualifiers
        self.m = {"default": "default__abc", "db2": "db2__abc"}

    def test_bare_and_backticked(self):
        assert (
            self.rw("SELECT a FROM default.tx", self.m)
            == "SELECT a FROM `default__abc`.tx"
        )
        assert (
            self.rw("SELECT a FROM `default`.`tx`", self.m)
            == "SELECT a FROM `default__abc`.`tx`"
        )

    def test_string_literals_untouched(self):
        sql = "SELECT 'default.tx' AS s FROM default.tx"
        assert self.rw(sql, self.m) == "SELECT 'default.tx' AS s FROM `default__abc`.tx"

    def test_non_db_words_untouched(self):
        assert self.rw("SELECT t.a FROM tx t", self.m) == "SELECT t.a FROM tx t"
        assert self.rw("SELECT 1.5 + x.y FROM tx x", self.m) == "SELECT 1.5 + x.y FROM tx x"

    def test_three_part_middle_not_remapped(self):
        # x.default.y: 'default' is preceded by '.', so it is a table
        # named default under db x — not a db qualifier
        assert self.rw("SELECT * FROM x.default.y", self.m) == "SELECT * FROM x.default.y"

    def test_word_without_dot_untouched(self):
        assert self.rw("SELECT `default` FROM tx", self.m) == "SELECT `default` FROM tx"

    def test_multiple_and_case_insensitive(self):
        out = self.rw("SELECT * FROM DEFAULT.a JOIN db2.b ON default.a.k = db2.b.k", self.m)
        assert out == (
            "SELECT * FROM `default__abc`.a JOIN `db2__abc`.b "
            "ON `default__abc`.a.k = `db2__abc`.b.k"
        )

    def test_alias_shadowing_db_name_not_rewritten(self):
        # ADVICE r5: a table alias spelled like an engine database must
        # resolve the ALIAS — rewriting it breaks resolution or reads
        # the wrong table
        m = {"d": "d__abc"}
        assert self.rw("SELECT d.x FROM t AS d", m) == "SELECT d.x FROM t AS d"
        assert self.rw("SELECT d.x FROM t d WHERE d.x > 1", m) == (
            "SELECT d.x FROM t d WHERE d.x > 1"
        )
        assert self.rw("SELECT d.x FROM (SELECT 1 AS x) d", m) == (
            "SELECT d.x FROM (SELECT 1 AS x) d"
        )
        # the SAME db name used as a genuine qualifier (no alias def)
        # still rewrites
        assert self.rw("SELECT d.t.x FROM d.t", m) == (
            "SELECT `d__abc`.t.x FROM `d__abc`.t"
        )

    def test_alias_shadowing_is_per_name(self):
        # only the colliding name is shadowed; other dbs still rewrite
        out = self.rw("SELECT d.x FROM default.t AS d", {"d": "d__abc", **self.m})
        assert out == "SELECT d.x FROM `default__abc`.t AS d"


def test_rewrite_mysql_casts():
    """CAST(... AS SIGNED [INTEGER]) maps to BIGINT; CAST(... AS
    UNSIGNED [INTEGER]) maps to the mod-2^64 pmod/DECIMAL(20,0) wrap
    form (true KindUint64 semantics — the former no-wrap divergence is
    closed); string literals are untouched; case-insensitive.

    The round-13 form binds each stage ONCE via single-element-array
    transform() lambdas (ADVICE r12: the textual expansion embedded
    the operand ~12 times — inconsistent for rand(), exponential for
    nested casts) — so the shape assertions here are structural, not
    byte-exact: the operand appears exactly once, bound to the
    outermost lambda variable; value semantics stay pinned by
    tests/test_coercion.py's CAST-AS-UNSIGNED table."""
    import re

    from tinysql_spark.sqlparse import rewrite_mysql_casts as rw

    def occurs(out, inner):
        # standalone occurrences of the operand text (word-bounded,
        # so lambda var names like __uc1x never count as 'x')
        return len(re.findall(rf"(?<!\w){re.escape(inner)}(?!\w)", out))

    def check_unsigned(out, inner, n_casts=1):
        # each cast emits exactly one evaluation of its operand, as
        # the single element of the outer transform()'s array
        assert out.count(f"transform(array(({inner}))") == n_casts
        assert occurs(out, inner) == n_casts, out
        # three nested binding levels per cast: operand / prefix /
        # wrapped value — each lambda var unique per rewrite
        assert len(re.findall(r"__uc\d+x ->", out)) >= n_casts
        assert out.count("pmod(") == n_casts
        assert out.count("AS DECIMAL(20,0))") == n_casts
        # balanced parens (the splice is mid-expression)
        assert out.count("(") == out.count(")")

    check_unsigned(rw("SELECT CAST(x AS UNSIGNED) FROM t"), "x")
    check_unsigned(rw("CAST(x AS unsigned integer)"), "x")
    assert rw("CAST(-1 AS SIGNED)") == "CAST(-1 AS BIGINT)"
    assert rw("SELECT 'keep AS UNSIGNED' AS s") == "SELECT 'keep AS UNSIGNED' AS s"
    assert rw("CAST(a AS STRING)") == "CAST(a AS STRING)"
    # nested parens inside the cast argument balance correctly
    check_unsigned(rw("CAST(f(a, b) - 1 AS UNSIGNED)"), "f(a, b) - 1")
    # two casts in one statement, each rewritten independently with
    # DISTINCT lambda variable names (no shadowing between them)
    out2 = rw("SELECT CAST(a AS UNSIGNED), CAST(b AS UNSIGNED) FROM t")
    assert out2.count("transform(array((a))") == 1
    assert out2.count("transform(array((b))") == 1
    vars2 = set(re.findall(r"__uc(\d+)x ->", out2))
    assert len(vars2) == 2
    # nested unsigned casts expand LINEARLY (the operand of the outer
    # cast is the inner's rewrite, spliced exactly once)
    nested = rw("CAST(CAST(mycol AS UNSIGNED) AS UNSIGNED)")
    assert nested.count("mycol") == 1
    assert nested.count("pmod(") == 2
    assert nested.count("(") == nested.count(")")
    # mixed: literal protected, cast outside rewritten
    out3 = rw("SELECT CAST(n AS UNSIGNED), 'AS SIGNED' FROM t")
    assert "'AS SIGNED'" in out3
    check_unsigned(out3, "n")
    import pytest

    with pytest.raises(ValueError, match="AS UNSIGNED outside a CAST"):
        rw("SELECT x AS UNSIGNED)")


def test_split_statements_comment_aware():
    """MySQL comment forms are stripped during the split: a ';' inside
    a comment never splits, leading/comment-only fragments vanish
    (EmptyStmt), `a--b` stays arithmetic, and `/*+ hints */` are
    preserved for the optimizer."""
    from tinysql_spark.sqlparse import split_statements as sp

    assert sp("-- lead\nSELECT 1") == ["SELECT 1"]
    assert sp("# hash\nSELECT 1") == ["SELECT 1"]
    assert sp("/* block */ SELECT 1") == ["SELECT 1"]
    assert sp("SELECT 1; -- tail") == ["SELECT 1"]
    assert sp("-- only a comment") == []
    assert sp("SELECT 1 -- note; not a split\nFROM t") == ["SELECT 1  \nFROM t"]
    assert sp("SELECT 1--2") == ["SELECT 1--2"]  # double negation, not comment
    assert sp("SELECT /*+ BROADCAST(t) */ k FROM t") == [
        "SELECT /*+ BROADCAST(t) */ k FROM t"
    ]
    assert sp("SELECT '--not; a comment' AS s") == ["SELECT '--not; a comment' AS s"]
    assert sp("SELECT 1 /* a; b */; SELECT 2") == ["SELECT 1", "SELECT 2"]
    assert sp("SELECT 1 /* unterminated; SELECT 9") == ["SELECT 1"]


def test_mysql_date_format_mapping():
    from tinysql_spark.sqlparse import (
        mysql_datetime_format_to_java as j,
        rewrite_date_format as rw,
    )

    assert j("%Y/%m") == "yyyy/MM"
    assert j("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss"
    assert j("%d.%m.%y") == "dd.MM.yy"
    assert j("%H%%") == "HH'%'"
    # literal ASCII letters are quoted (Java reserves all of them)
    assert j("%Yq%m") == "yyyy'q'MM"
    import pytest
    with pytest.raises(ValueError, match="%V"):
        j("%V")
    # rewrite: MySQL patterns translate, Java patterns pass through
    assert (
        rw("SELECT DATE_FORMAT(ts, '%Y/%m') FROM t")
        == "SELECT date_format(ts, 'yyyy/MM') FROM t"
    )
    assert (
        rw("SELECT DATE_FORMAT(ts, 'yyyy-MM') FROM t")
        == "SELECT DATE_FORMAT(ts, 'yyyy-MM') FROM t"
    )
    # nested call in the first argument survives
    assert (
        rw("SELECT DATE_FORMAT(date_add(ts, 1), '%Y') AS a FROM t")
        == "SELECT date_format(date_add(ts, 1), 'yyyy') AS a FROM t"
    )
