"""Statement classifier + lightweight parser for the TinySQL dialect.

The reference carries a full goyacc LALR grammar (~8k lines,
`/root/reference/parser/parser.y`); this engine deliberately does NOT
rebuild a parser-generator (SURVEY §7.0). SELECT/expression parsing is
delegated to Spark SQL; only the statement *heads* Spark can't serve
(CREATE/DROP/ALTER/INSERT/REPLACE/DELETE/SET/SHOW/ANALYZE/USE/txn
stmts — statement list `parser/parser.y:4521-4543`) get a small
hand-rolled parser here, plus MySQL-ism rewrites (STRCMP, @user vars,
backticks) applied before handing SELECT text to Spark.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .catalog import BucketSpec, ColumnInfo, IndexInfo, TableInfo

# --------------------------------------------------------------------------
# statement splitting / classification
# --------------------------------------------------------------------------


def split_statements(sql: str) -> list[str]:
    """Split on top-level ';' — quote-aware AND comment-aware.

    MySQL's three comment forms (`-- ` to end of line, `#` to end of
    line, `/* ... */`) are stripped during the scan, so a `;` inside
    a comment never splits, a leading or comment-only fragment
    becomes an EmptyStmt, and the statement-kind dispatch sees the
    first real keyword. Per the MySQL rule, `--` starts a comment
    only when followed by whitespace/EOL (`a--b` stays arithmetic).
    Optimizer-hint comments `/*+ ... */` are PRESERVED — both MySQL
    and Spark treat them as hints, not comments. Comments act as
    token separators (replaced by one space)."""
    out, buf, i, n = [], [], 0, len(sql)
    quote = None
    while i < n:
        ch = sql[i]
        if quote:
            buf.append(ch)
            if ch == "\\" and quote in "'\"" and i + 1 < n:
                buf.append(sql[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            buf.append(ch)
        elif ch == "-" and sql[i : i + 2] == "--" and (
            i + 2 >= n or sql[i + 2] in " \t\r\n"
        ):
            while i < n and sql[i] != "\n":
                i += 1
            buf.append(" ")
            continue
        elif ch == "#":
            while i < n and sql[i] != "\n":
                i += 1
            buf.append(" ")
            continue
        elif ch == "/" and sql[i : i + 2] == "/*" and sql[i : i + 3] != "/*+":
            end = sql.find("*/", i + 2)
            i = n if end < 0 else end + 2
            buf.append(" ")
            continue
        elif ch == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(ch)
        i += 1
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


_HEAD_RE = re.compile(r"^\s*([A-Za-z]+)")


def statement_kind(stmt: str) -> str:
    head = _HEAD_RE.match(stmt)
    word = head.group(1).upper() if head else ""
    if word in ("SELECT", "WITH", "TABLE", "VALUES"):
        return "select"
    if word == "EXPLAIN":
        return "explain"
    if word == "INSERT":
        return "insert"
    if word == "REPLACE":
        return "replace"
    if word == "DELETE":
        return "delete"
    if word == "UPDATE":
        return "update"
    if word == "TRUNCATE":
        return "truncate"
    if word == "USE":
        return "use"
    if word == "SET":
        return "set"
    if word == "SHOW":
        return "show"
    if word == "ANALYZE":
        return "analyze"
    if word in ("BEGIN", "COMMIT", "ROLLBACK", "START"):
        return "txn"
    if word == "ADMIN":
        return "admin"
    if word == "OPTIMIZE":
        return "optimize"
    if word == "CREATE":
        m = re.match(r"^\s*CREATE\s+(DATABASE|SCHEMA|TABLE|UNIQUE\s+INDEX|INDEX)", stmt, re.I)
        if not m:
            raise ValueError(f"unsupported CREATE statement: {stmt[:60]}")
        obj = re.sub(r"\s+", " ", m.group(1).upper())
        return {
            "DATABASE": "create_database",
            "SCHEMA": "create_database",
            "TABLE": "create_table",
            "INDEX": "create_index",
            "UNIQUE INDEX": "create_index",
        }[obj]
    if word == "DROP":
        m = re.match(r"^\s*DROP\s+(DATABASE|SCHEMA|TABLE|INDEX)", stmt, re.I)
        if not m:
            raise ValueError(f"unsupported DROP statement: {stmt[:60]}")
        return {
            "DATABASE": "drop_database",
            "SCHEMA": "drop_database",
            "TABLE": "drop_table",
            "INDEX": "drop_index",
        }[m.group(1).upper()]
    if word == "ALTER":
        return "alter_table"
    if word == "DESC" or word == "DESCRIBE":
        return "describe"
    raise ValueError(f"unsupported statement: {stmt[:60]}")


# --------------------------------------------------------------------------
# identifier / literal helpers
# --------------------------------------------------------------------------


def unquote_ident(s: str) -> str:
    s = s.strip()
    if s.startswith("`") and s.endswith("`"):
        return s[1:-1]
    return s


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on sep at paren depth 0, quote-aware."""
    out, buf, depth, quote = [], [], 0, None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            buf.append(ch)
            if ch == "\\" and quote in "'\"" and i + 1 < n:
                buf.append(sql_next(s, i))
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    last = "".join(buf).strip()
    if last:
        out.append(last)
    return out


def sql_next(s: str, i: int) -> str:
    return s[i + 1] if i + 1 < len(s) else ""


# --------------------------------------------------------------------------
# CREATE TABLE
# --------------------------------------------------------------------------


@dataclass
class CreateTable:
    table: str
    info: TableInfo
    if_not_exists: bool = False


_CREATE_TABLE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([`\w.]+)\s*\((.*)\)\s*[^)]*$",
    re.I | re.S,
)

# Trailing physical-layout clause (Hive/Spark SQL syntax):
#   ... ) CLUSTERED BY (c1, c2) [SORTED BY (s1, ...)] INTO n BUCKETS
_BUCKET_CLAUSE_RE = re.compile(
    r"\bCLUSTERED\s+BY\s*\(([^)]*)\)"
    r"(?:\s*SORTED\s+BY\s*\(([^)]*)\))?"
    r"\s*INTO\s+(\d+)\s+BUCKETS\s*$",
    re.I | re.S,
)

# Trailing partition clause (Hive/Spark SQL syntax):
#   ... ) PARTITIONED BY (c1, ...)
_PARTITION_CLAUSE_RE = re.compile(
    r"\bPARTITIONED\s+BY\s*\(([^)]*)\)\s*$",
    re.I | re.S,
)

_COL_TYPE_RE = re.compile(
    r"^([`\w]+)\s+"
    r"(TINYINT|SMALLINT|INTEGER|INT|BIGINT|FLOAT|DOUBLE|REAL|VARCHAR|CHAR|TEXT"
    r"|STRING|DATETIME|DATE|TIMESTAMP|DECIMAL|NUMERIC|BOOLEAN|BOOL)"
    r"(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?",
    re.I,
)


def parse_create_table(stmt: str) -> CreateTable:
    # strip trailing layout clauses innermost-last: ... ) [PARTITIONED
    # BY (...)] [CLUSTERED BY (...) ... INTO n BUCKETS] — the bucket
    # clause is outermost, so it comes off first
    bucket: BucketSpec | None = None
    bm = _BUCKET_CLAUSE_RE.search(stmt)
    if bm:
        n = int(bm.group(3))
        if n < 1:
            raise ValueError("INTO n BUCKETS requires n >= 1")
        bucket = BucketSpec(
            columns=[unquote_ident(c) for c in split_top_level(bm.group(1))],
            num_buckets=n,
            sort_columns=[unquote_ident(c) for c in split_top_level(bm.group(2))]
            if bm.group(2)
            else [],
        )
        stmt = stmt[: bm.start()]
    partition_by: list[str] = []
    pm = _PARTITION_CLAUSE_RE.search(stmt)
    if pm:
        partition_by = [unquote_ident(c) for c in split_top_level(pm.group(1))]
        stmt = stmt[: pm.start()]
    m = _CREATE_TABLE_RE.match(stmt)
    if not m:
        raise ValueError(f"cannot parse CREATE TABLE: {stmt[:80]}")
    if_not_exists = bool(m.group(1))
    name = unquote_ident(m.group(2))
    body = m.group(3)
    columns: list[ColumnInfo] = []
    pk: list[str] = []
    indexes: list[IndexInfo] = []
    auto_idx = 0
    for item in split_top_level(body):
        up = item.upper()
        if up.startswith("PRIMARY KEY"):
            cols = re.search(r"\((.*?)\)", item, re.S).group(1)
            pk = [unquote_ident(c) for c in split_top_level(cols)]
        elif up.startswith(("UNIQUE KEY", "UNIQUE INDEX", "UNIQUE")):
            mm = re.match(r"UNIQUE(?:\s+(?:KEY|INDEX))?\s*([`\w]*)\s*\((.*?)\)", item, re.I | re.S)
            idx_name = unquote_ident(mm.group(1)) or f"uniq_{auto_idx}"
            auto_idx += 1
            cols = [unquote_ident(c) for c in split_top_level(mm.group(2))]
            indexes.append(IndexInfo(name=idx_name, columns=cols, unique=True))
        elif up.startswith(("KEY", "INDEX")):
            mm = re.match(r"(?:KEY|INDEX)\s*([`\w]*)\s*\((.*?)\)", item, re.I | re.S)
            idx_name = unquote_ident(mm.group(1)) or f"idx_{auto_idx}"
            auto_idx += 1
            cols = [unquote_ident(c) for c in split_top_level(mm.group(2))]
            indexes.append(IndexInfo(name=idx_name, columns=cols, unique=False))
        else:
            cm = _COL_TYPE_RE.match(item)
            if not cm:
                raise ValueError(f"cannot parse column definition: {item!r}")
            col_name = unquote_ident(cm.group(1))
            col_type = cm.group(2).upper() + (cm.group(3) or "").replace(" ", "")
            rest = item[cm.end() :].strip()
            # integer display-width modifiers: UNSIGNED becomes part
            # of the declared type (true uint64 semantics — BIGINT
            # UNSIGNED maps to DECIMAL(20,0), see
            # catalog.sql_type_to_spark); SIGNED is the default and
            # strips. Consumed here so DEFAULT/UNIQUE parsing below
            # sees only the attribute tail.
            um = re.match(r"(UNSIGNED|SIGNED)\b\s*", rest, re.I)
            if um:
                if um.group(1).upper() == "UNSIGNED":
                    col_type += " UNSIGNED"
                rest = rest[um.end() :].strip()
            rest_up = rest.upper()
            nullable = "NOT NULL" not in rest_up
            default = None
            dm = re.search(r"DEFAULT\s+('(?:[^'\\]|\\.)*'|[\w.+-]+)", rest, re.I)
            if dm:
                default = dm.group(1)
            if "PRIMARY KEY" in rest_up:
                pk = [col_name]
                nullable = False
            if re.search(r"(?<!PRIMARY KEY)\bUNIQUE\b", rest_up) and "PRIMARY" not in rest_up:
                indexes.append(IndexInfo(name=f"uniq_{col_name}", columns=[col_name], unique=True))
            auto = "AUTO_INCREMENT" in rest_up
            if auto:
                if col_type.split("(")[0] not in (
                    "TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT",
                ):
                    raise ValueError(
                        f"AUTO_INCREMENT column {col_name!r} must be an integer type"
                    )
                nullable = False
            columns.append(
                ColumnInfo(
                    name=col_name, type=col_type, nullable=nullable,
                    default=default, auto_increment=auto,
                )
            )
    for c in columns:
        if c.name in pk:
            c.nullable = False
    autos = [c for c in columns if c.auto_increment]
    if len(autos) > 1:
        raise ValueError("only one AUTO_INCREMENT column is allowed")
    if autos:
        a = autos[0].name.lower()
        keyed = (pk and pk[0].lower() == a) or any(
            i.columns and i.columns[0].lower() == a for i in indexes
        )
        if not keyed:
            # MySQL rule the reference inherits: the auto column must
            # head a key (meta/autoid allocates per key-owner table)
            raise ValueError(
                "AUTO_INCREMENT column must be a key (PK or first column of an index)"
            )
    if bucket:
        declared = {c.name.lower() for c in columns}
        for c in bucket.columns + bucket.sort_columns:
            if c.lower() not in declared:
                raise ValueError(f"CLUSTERED/SORTED BY references unknown column {c!r}")
    if partition_by:
        declared = {c.name.lower() for c in columns}
        for c in partition_by:
            if c.lower() not in declared:
                raise ValueError(f"PARTITIONED BY references unknown column {c!r}")
        if bucket:
            raise ValueError("PARTITIONED BY + CLUSTERED BY on one table is unsupported")
    info = TableInfo(
        name=name.split(".")[-1],
        columns=columns,
        primary_key=pk,
        indexes=indexes,
        bucket=bucket,
        partition_by=partition_by,
    )
    return CreateTable(table=name, info=info, if_not_exists=if_not_exists)


# --------------------------------------------------------------------------
# INSERT / REPLACE
# --------------------------------------------------------------------------


@dataclass
class InsertStmt:
    table: str
    columns: list[str] | None
    values_sql: str | None  # "(...),(...)" tuple list text
    select_sql: str | None  # trailing SELECT text
    is_replace: bool = False


_INSERT_RE = re.compile(
    r"^\s*(INSERT|REPLACE)\s+INTO\s+([`\w.]+)\s*(\(([^)]*)\))?\s*(VALUES?|SELECT|WITH)(.*)$",
    re.I | re.S,
)


_INSERT_SET_RE = re.compile(
    r"^\s*(INSERT|REPLACE)\s+INTO\s+([`\w.]+)\s+SET\s+(.+)$", re.I | re.S
)


def parse_insert(stmt: str) -> InsertStmt:
    m = _INSERT_SET_RE.match(stmt)
    if m:
        # INSERT ... SET a = 1, b = 2 (parser.y InsertValues "SET"
        # ColumnSetValueList) — desugar to the column-list VALUES form
        cols, vals = [], []
        for a in split_top_level(m.group(3)):
            am = re.match(r"^\s*([`\w]+)\s*=\s*(.+)$", a, re.S)
            if not am:
                raise ValueError(f"cannot parse SET assignment: {a[:40]}")
            cols.append(unquote_ident(am.group(1)))
            vals.append(am.group(2).strip())
        return InsertStmt(
            table=unquote_ident(m.group(2)),
            columns=cols,
            values_sql="(" + ", ".join(vals) + ")",
            select_sql=None,
            is_replace=m.group(1).upper() == "REPLACE",
        )
    m = _INSERT_RE.match(stmt)
    if not m:
        raise ValueError(f"cannot parse INSERT/REPLACE: {stmt[:80]}")
    verb, table, _, cols, tail_kind, tail = m.groups()
    columns = [unquote_ident(c) for c in split_top_level(cols)] if cols else None
    tail_kind = tail_kind.upper()
    if tail_kind in ("VALUES", "VALUE"):
        return InsertStmt(
            table=unquote_ident(table),
            columns=columns,
            values_sql=tail.strip(),
            select_sql=None,
            is_replace=verb.upper() == "REPLACE",
        )
    return InsertStmt(
        table=unquote_ident(table),
        columns=columns,
        values_sql=None,
        select_sql=(tail_kind + " " + tail.strip()),
        is_replace=verb.upper() == "REPLACE",
    )


# --------------------------------------------------------------------------
# DELETE / misc regexes
# --------------------------------------------------------------------------

_DELETE_HEAD_RE = re.compile(
    # DELETE [LOW_PRIORITY] [QUICK] FROM t <tail>
    # (parser.y DeleteFromStmt: OrderByOptional LimitClause)
    r"^\s*DELETE\s+(?:LOW_PRIORITY\s+)?(?:QUICK\s+)?FROM\s+([`\w.]+)\s*(.*)$",
    re.I | re.S,
)


def _top_level_keyword_spans(s: str) -> list[tuple[int, int, str]]:
    """(start, end, KEYWORD) for top-level WHERE / ORDER BY / LIMIT —
    quote- and paren-aware, so a keyword inside a string literal (e.g.
    WHERE note = 'x ORDER BY y') or a subquery never splits the
    clause."""
    spans = []
    depth, quote = 0, None
    i, n = 0, len(s)
    kw = re.compile(r"(WHERE\b|ORDER\s+BY\b|LIMIT\b)", re.I)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\" and quote in "'\"":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch.isalpha() and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] in "_`")):
            m = kw.match(s, i)
            if m:
                spans.append((m.start(), m.end(), re.sub(r"\s+", " ", m.group(1).upper())))
                i = m.end()
                continue
        i += 1
    return spans


def parse_delete(stmt: str) -> tuple[str, str | None, str | None, str | None]:
    """DELETE FROM t [WHERE w] [ORDER BY o] [LIMIT n] →
    (table, where, order_by, limit) with quote-aware clause splitting
    (a plain regex misparses string literals containing keywords)."""
    m = _DELETE_HEAD_RE.match(stmt)
    if not m:
        raise ValueError(f"cannot parse DELETE: {stmt[:60]}")
    table, tail = m.group(1), m.group(2)
    spans = _top_level_keyword_spans(tail)
    # clauses must appear in grammar order; a later WHERE after ORDER BY
    # would be malformed — take the first of each in order
    where = order_by = limit = None
    bounds = spans + [(len(tail), len(tail), "")]
    for idx, (start, end, word) in enumerate(spans):
        text = tail[end : bounds[idx + 1][0]].strip()
        if word == "WHERE" and where is None and order_by is None and limit is None:
            where = text
        elif word == "ORDER BY" and order_by is None and limit is None:
            order_by = text
        elif word == "LIMIT" and limit is None:
            if not re.fullmatch(r"\d+", text):
                raise ValueError(f"cannot parse DELETE LIMIT: {text[:30]!r}")
            limit = text
        else:
            raise ValueError(f"cannot parse DELETE clause order near: {word}")
    leading = tail[: spans[0][0]].strip() if spans else tail.strip()
    if leading:
        raise ValueError(f"cannot parse DELETE: unexpected {leading[:30]!r}")
    return table, where, order_by, limit
_TRUNCATE_RE = re.compile(r"^\s*TRUNCATE\s+(?:TABLE\s+)?([`\w.]+)\s*$", re.I)
_USE_RE = re.compile(r"^\s*USE\s+([`\w]+)\s*$", re.I)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?:TABLE\s+)?([`\w.]+)"
    r"(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*$",
    re.I,
)

_CREATE_DB_RE = re.compile(
    r"^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(IF\s+NOT\s+EXISTS\s+)?([`\w]+)\s*$", re.I
)
_DROP_DB_RE = re.compile(r"^\s*DROP\s+(?:DATABASE|SCHEMA)\s+(IF\s+EXISTS\s+)?([`\w]+)\s*$", re.I)
_DROP_TABLE_RE = re.compile(r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([`\w.,\s]+)\s*$", re.I)
_CREATE_INDEX_RE = re.compile(
    r"^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+([`\w]+)\s+ON\s+([`\w.]+)\s*\((.*?)\)\s*$", re.I | re.S
)
_DROP_INDEX_RE = re.compile(r"^\s*DROP\s+INDEX\s+([`\w]+)\s+ON\s+([`\w.]+)\s*$", re.I)
_ALTER_ADD_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+(?:COLUMN\s+)?(.*)$", re.I | re.S
)
_ANALYZE_RE = re.compile(r"^\s*ANALYZE\s+TABLE\s+([`\w.,\s]+)\s*$", re.I)
_SET_USER_VAR_RE = re.compile(r"^\s*SET\s+@(\w+)\s*:?=\s*(.*)$", re.I | re.S)
_SET_SYS_VAR_RE = re.compile(r"^\s*SET\s+(?:@@(?:GLOBAL\.|SESSION\.)?|(?:GLOBAL|SESSION)\s+)?(\w+)\s*:?=\s*(.*)$", re.I | re.S)


# --------------------------------------------------------------------------
# MySQL-ism rewrites on SELECT-ish text
# --------------------------------------------------------------------------


def _sub_outside_quotes(sql: str, pat: "re.Pattern[str]", repl: str) -> str:
    """re.sub applied only OUTSIDE string literals: the SQL text is
    walked with the same quote discipline as the statement splitter,
    and the pattern is matched per unquoted segment."""
    out: list[str] = []
    i, n, quote, seg_start = 0, len(sql), None, 0
    while i < n:
        ch = sql[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
                out.append(sql[seg_start : i + 1])
                seg_start = i + 1
        elif ch in ("'", '"'):
            out.append(pat.sub(repl, sql[seg_start:i]))
            quote = ch
            seg_start = i
        i += 1
    out.append(sql[seg_start:] if quote else pat.sub(repl, sql[seg_start:]))
    return "".join(out)


_MYSQL_SIGNED_CAST_RE = re.compile(r"\bAS\s+SIGNED(?:\s+INTEGER)?\b", re.I)
_UNSIGNED_CAST_END_RE = re.compile(r"\bAS\s+UNSIGNED(?:\s+INTEGER)?\s*\)", re.I)
_U64 = "18446744073709551616"  # 2^64


def _quote_mask(sql: str) -> str:
    """Copy of the SQL with string-literal INTERIORS blanked (quote
    chars kept, same escape discipline as the splitter) so regex
    positions and paren balancing computed on the mask are valid
    indices into the original text."""
    out = list(sql)
    i, n, quote = 0, len(sql), None
    while i < n:
        ch = sql[i]
        if quote:
            if ch == "\\":
                out[i] = " "
                if i + 1 < n:
                    out[i + 1] = " "
                i += 2
                continue
            if ch == quote:
                quote = None
            else:
                out[i] = " "
        elif ch in ("'", '"'):
            quote = ch
        i += 1
    return "".join(out)


# -- string-vs-number comparison coercion (VERDICT r12 next #2) -----------
#
# The reference compares a string against ANY numeric side as REAL
# (expression/builtin_compare.go getBaseCmpType -> ETReal;
# types/convert.go StrToFloat), while Spark's legacy coercion casts the
# string to the INT side's type, truncating: '12.5' = 12 was TRUE here,
# FALSE in MySQL. Rewrite: wrap the NUMERIC side of such comparisons in
# CAST(... AS DOUBLE), which forces Spark's string-vs-double path — the
# exact ETReal behavior (the CAST half of this family closed in r12 via
# the unsigned-cast prefix parse; this closes the comparison half).
# Non-numeric strings stay NULL-compares (documented divergence 1 —
# strictly narrower than MySQL's warn-and-parse-prefix).
_CMP_OP = r"<=>|<=|>=|<>|!=|=|<|>"
_NUMLIT = r"[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?"
_STRLIT_M = r"'[ ]*'|\"[ ]*\""  # literal shape in a _quote_mask
_IDENT_PATH = r"(?:`[^`]+`|[A-Za-z_]\w*)(?:\.(?:`[^`]+`|[A-Za-z_]\w*)){0,2}"
_STR_NUM_RIGHT = re.compile(
    rf"(?:{_STRLIT_M})\s*(?:{_CMP_OP})\s*({_NUMLIT})(?![\w.])"
)
_STR_NUM_LEFT = re.compile(
    rf"(?<![\w.])({_NUMLIT})\s*(?:{_CMP_OP})\s*(?:{_STRLIT_M})"
)
_STR_ID_RIGHT = re.compile(
    rf"(?:{_STRLIT_M})\s*(?:{_CMP_OP})\s*({_IDENT_PATH})(?![\w.`(])"
)
_STR_ID_LEFT = re.compile(
    rf"(?<![\w.`])({_IDENT_PATH})\s*(?:{_CMP_OP})\s*(?:{_STRLIT_M})"
)


def rewrite_string_number_compares(sql: str, int_col=None) -> str:
    """Comparisons with a string literal on one side go REAL:

    - numeric LITERAL on the other side: always wrapped (type known
      from the token itself) — ``'12.5' > 12`` becomes
      ``'12.5' > CAST(12 AS DOUBLE)``.
    - IDENTIFIER on the other side: wrapped only when ``int_col``
      (a schema resolver the engine builds per statement) confirms it
      is an integer-typed column — a string column must KEEP the
      binary string compare (CompareString), so unknown types are
      never touched.

    Spans are located on the quote mask, so literal interiors can
    never trigger a rewrite; the wrap widens at most one term of a
    surrounding arithmetic expression, which only nudges the compare
    further toward REAL — the target semantics."""
    mask = _quote_mask(sql)
    edits = set()
    for m in _STR_NUM_RIGHT.finditer(mask):
        edits.add((m.start(1), m.end(1)))
    for m in _STR_NUM_LEFT.finditer(mask):
        edits.add((m.start(1), m.end(1)))
    if int_col is not None:
        for m in _STR_ID_RIGHT.finditer(mask):
            if int_col(m.group(1)):
                edits.add((m.start(1), m.end(1)))
        for m in _STR_ID_LEFT.finditer(mask):
            if int_col(m.group(1)):
                edits.add((m.start(1), m.end(1)))
    for s, e in sorted(edits, reverse=True):
        sql = sql[:s] + f"CAST({sql[s:e]} AS DOUBLE)" + sql[e:]
    return sql


# monotone id for unsigned-cast lambda variables: nested casts emit
# nested transform() lambdas, and unique names sidestep any shadowing
# ambiguity across Spark versions
_UNSIGNED_CAST_SEQ = 0


_UNSIGNED_PREFIX_RE = re.compile(
    r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?"
)


def _warn_constant_unsigned_cast(inner: str, warnings: list | None) -> None:
    """Record the MySQL warning a CONSTANT string operand of
    CAST(.. AS UNSIGNED) produces (reference: types/convert.go
    StrToUint — truncation warns 1292, ErrOverflow saturation warns
    1264). Constant-only: the rewrite site knows a literal's value;
    per-row column values would need a runtime scan (documented
    bound)."""
    if warnings is None:
        return
    m = re.match(r"^'([^']*)'$", inner.strip())
    if m is None:
        return
    s = m.group(1).strip()
    pm = _UNSIGNED_PREFIX_RE.match(s)
    if pm is None or pm.group(0) != s:
        warnings.append(
            ("Warning", 1292, f"Truncated incorrect INTEGER value: '{m.group(1)}'")
        )
        return
    try:
        v = float(s)
    except ValueError:
        return
    if v >= 2**64:
        warnings.append(
            ("Warning", 1264, f"Out of range value: '{m.group(1)}' saturates to {2**64 - 1}")
        )


def _rewrite_unsigned_casts(sql: str, warnings: list | None = None) -> str:
    """CAST(x AS UNSIGNED [INTEGER]) -> true MySQL uint64 semantics:
    the value lands in DECIMAL(20,0) (the BIGINT UNSIGNED column
    mapping) and negatives wrap mod 2^64 (types/datum.go:36
    KindUint64; CAST(-1 AS UNSIGNED) = 18446744073709551615). The
    former pinned divergence (-> BIGINT, no wrap) is closed.

    pmod does the wrap in one evaluation of x: pmod(-2, 2^64) =
    2^64-2, non-negatives pass through. DECIMAL(21,0) is the operand
    type so both the full uint64 range AND any int64 negative fit
    pre-wrap. Doubles round half-up on the decimal cast, matching
    MySQL's round-then-wrap (CAST(-1.7 AS UNSIGNED) = 2^64-2)."""
    while True:
        mask = _quote_mask(sql)
        m = None
        for m in _UNSIGNED_CAST_END_RE.finditer(mask):
            pass  # rightmost match: rewrite inner/later casts first so
            # earlier indices stay valid on the next pass
        if m is None:
            return sql
        depth, j = 0, m.start() - 1
        while j >= 0:
            c = mask[j]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    break
                depth -= 1
            j -= 1
        k = j - 1
        while k >= 0 and mask[k].isspace():
            k -= 1
        if (
            j < 0
            or k < 3
            or mask[k - 3 : k + 1].upper() != "CAST"
            or (k >= 4 and (mask[k - 4].isalnum() or mask[k - 4] == "_"))
        ):
            raise ValueError(
                "AS UNSIGNED outside a CAST(...) expression is not supported: "
                + sql[max(0, m.start() - 40) : m.end()]
            )
        inner = sql[j + 1 : m.start()].strip()
        _warn_constant_unsigned_cast(inner, warnings)
        # numeric-prefix fallback (closes VERDICT r11 missing #3;
        # reference: types/convert.go StrToUint -> getValidFloatPrefix
        # + floatStrToIntStr + the ErrOverflow saturation): a
        # garbage-suffixed string parses its longest float prefix
        # ('12.7abc' -> 13), a fully non-numeric string parses as 0
        # ('abc' -> 0), an overflowing magnitude saturates (positive
        # -> 2^64-1, negative -> 0), NULL stays NULL. try_cast (not
        # CAST) everywhere so ANSI-mode sessions NULL-and-fall-through
        # instead of throwing, like MySQL's warn-don't-error. Branch
        # order keeps non-string types on the direct decimal cast —
        # coalesce short-circuits, so numerics stay single-evaluation.
        #
        # SINGLE EVALUATION of each stage (ADVICE r12): the naive
        # textual expansion embedded `inner` ~12 times — a
        # nondeterministic operand (rand()) evaluated inconsistently
        # across the CASE branches, and nested unsigned casts expanded
        # the SQL string exponentially with depth. Bind each stage
        # ONCE as a single-element-array transform() lambda variable:
        # inner, its float prefix, and the wrapped operand each appear
        # exactly once in the emitted SQL, so nesting is linear and
        # nondeterministic operands are consistent. Unique var names
        # per rewrite keep nested lambdas from shadowing each other.
        global _UNSIGNED_CAST_SEQ
        _UNSIGNED_CAST_SEQ += 1
        vx = f"__uc{_UNSIGNED_CAST_SEQ}x"  # the operand, evaluated once
        vp = f"__uc{_UNSIGNED_CAST_SEQ}p"  # its float prefix (strings)
        vd = f"__uc{_UNSIGNED_CAST_SEQ}d"  # the DECIMAL(21,0) value
        pre = (
            f"regexp_extract(trim(CAST({vx} AS STRING)), "
            r"'^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?', 0)"
        )
        u64max = "18446744073709551615"
        operand = (
            f"coalesce(try_cast({vx} AS DECIMAL(21,0)), "
            f"CASE WHEN {vx} IS NULL THEN NULL "
            f"WHEN length({vp}) = 0 THEN CAST(0 AS DECIMAL(21,0)) "
            f"WHEN try_cast({vp} AS DECIMAL(21,0)) IS NULL THEN "
            f"CAST(CASE WHEN {vp} LIKE '-%' THEN 0 ELSE {u64max} END "
            f"AS DECIMAL(21,0)) "
            f"ELSE try_cast({vp} AS DECIMAL(21,0)) END)"
        )
        # saturation applies to the OPERAND too, not just the regexp
        # branch (review r12 #2): DECIMAL(21,0) holds up to 10^21-1,
        # so values in [2^64, 10^21) pass the fast path and would WRAP
        # via pmod where MySQL saturates — CAST('18446744073709551616'
        # AS UNSIGNED) is 2^64-1 with a warning, not 0. Negatives
        # below int64 range cannot be a wrapped KindInt64 and saturate
        # at 0 (ConvertDecimalToUint); true int64 negatives keep the
        # mod-2^64 wrap.
        body = (
            f"CAST(CASE WHEN {vd} >= CAST({_U64} AS DECIMAL(21,0)) "
            f"THEN CAST({u64max} AS DECIMAL(21,0)) "
            f"WHEN {vd} < CAST(-9223372036854775808 AS DECIMAL(21,0)) "
            f"THEN CAST(0 AS DECIMAL(21,0)) "
            f"ELSE pmod({vd}, CAST({_U64} AS DECIMAL(21,0))) END "
            f"AS DECIMAL(20,0))"
        )
        repl = (
            f"element_at(transform(array(({inner})), {vx} -> "
            f"element_at(transform(array({pre}), {vp} -> "
            f"element_at(transform(array({operand}), {vd} -> "
            f"{body}), 1)), 1)), 1)"
        )
        sql = sql[: k - 3] + repl + sql[m.end() :]


def rewrite_mysql_casts(sql: str, warnings: list | None = None) -> str:
    """MySQL cast-target grammar Spark rejects outright (reference:
    parser/parser.y CastType, types/field_type.go):

    - CAST(x AS SIGNED [INTEGER]) -> CAST(x AS BIGINT).
    - CAST(x AS UNSIGNED [INTEGER]) -> DECIMAL(20,0) with mod-2^64
      wrap of negatives (_rewrite_unsigned_casts; KindUint64 parity).

    Quote-aware: `'cast me AS UNSIGNED'` string literals pass
    through untouched. `UNSIGNED`/`SIGNED` are MySQL reserved words,
    so a bare `expr AS unsigned` alias cannot appear in valid input.

    ``warnings``, when given, collects (Level, Code, Message) rows
    for CONSTANT string operands whose unsigned cast is lossy —
    truncated prefix parse (1292) or out-of-range saturation (1264),
    the classes types/convert.go warns on."""
    sql = _rewrite_unsigned_casts(sql, warnings)
    return _sub_outside_quotes(sql, _MYSQL_SIGNED_CAST_RE, "AS BIGINT")


# MySQL DATE_FORMAT % specifiers -> Java DateTimeFormatter patterns
# (the common deterministic subset; %X/%V week-system and locale
# specifiers are refused loudly rather than silently mis-mapped)
_MYSQL_DATEFMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "i": "mm", "s": "ss",
    "S": "ss", "f": "SSSSSS", "p": "a", "M": "MMMM", "b": "MMM",
    "a": "EEE", "W": "EEEE", "j": "DDD", "T": "HH:mm:ss", "r": "hh:mm:ss a",
    "%": "%",
}


def mysql_datetime_format_to_java(fmt: str) -> str:
    """Translate a MySQL DATE_FORMAT pattern ('%Y/%m') to the Java
    DateTimeFormatter pattern Spark's date_format expects ('yyyy/MM').
    Literal ASCII letters are single-quoted (Java reserves all of
    them as pattern letters); unsupported % specifiers raise."""
    out: list[str] = []
    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= n:
                raise ValueError("DATE_FORMAT pattern ends with bare '%'")
            spec = fmt[i + 1]
            mapped = _MYSQL_DATEFMT.get(spec)
            if mapped is None:
                raise ValueError(
                    f"DATE_FORMAT specifier %{spec} is not supported "
                    "(supported: %" + " %".join(sorted(_MYSQL_DATEFMT)) + ")"
                )
            out.append("'%'" if mapped == "%" else mapped)
            i += 2
        elif ch.isalpha():
            out.append(f"'{ch}'")
            i += 1
        elif ch == "'":
            out.append("''")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def rewrite_date_format(sql: str) -> str:
    """DATE_FORMAT(expr, '%Y/%m') -> date_format(expr, 'yyyy/MM').

    MySQL's %-specifier format strings (an extension here — the
    reference has no time builtins at all, expression/builtin_*.go)
    translated to Spark's Java patterns. Only a LITERAL format
    argument is rewritten; a non-literal one is refused loudly (a
    silent pass-through would make Spark mis-read % as literals)."""
    out = sql
    pat = re.compile(r"\bDATE_FORMAT\s*\(", re.I)
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        start = m.end()
        depth, i, quote = 1, start, None
        last_comma = -1
        while i < len(out):
            ch = out[i]
            if quote:
                if ch == "\\":
                    i += 2
                    continue
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                last_comma = i
            i += 1
        if i >= len(out) or last_comma < 0:
            raise ValueError("cannot parse DATE_FORMAT call")
        fmt_arg = out[last_comma + 1 : i].strip()
        fm = re.fullmatch(r"'((?:[^'\\]|\\.)*)'", fmt_arg)
        if not fm or "%" not in fm.group(1):
            # non-literal or already-Java pattern (no % specifiers —
            # DATE_FORMAT is case-insensitively Spark's own
            # date_format, so 'yyyy-MM' must pass through untouched)
            pos = m.end()
            continue
        java = mysql_datetime_format_to_java(fm.group(1))
        out = (
            out[: m.start()]
            + "date_format("
            + out[start : last_comma + 1]
            + f" '{java}')"
            + out[i + 1 :]
        )
        pos = m.start() + 1
    return out


def rewrite_strcmp(sql: str) -> str:
    """STRCMP(a,b) -> CASE WHEN ... (Spark has no strcmp builtin).

    Reference: expression/builtin_string.go:99.
    """
    out = sql
    pat = re.compile(r"\bSTRCMP\s*\(", re.I)
    while True:
        m = pat.search(out)
        if not m:
            return out
        start = m.end()  # position after '('
        depth, i, quote = 1, start, None
        args_end = -1
        while i < len(out):
            ch = out[i]
            if quote:
                if ch == "\\":
                    i += 2
                    continue
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args_end = i
                    break
            i += 1
        if args_end < 0:
            raise ValueError("unbalanced parentheses in STRCMP call")
        args = split_top_level(out[start:args_end])
        if len(args) != 2:
            raise ValueError(f"STRCMP expects 2 arguments, got {len(args)}")
        a, b = args
        repl = (
            f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN CAST(NULL AS INT) "
            f"WHEN ({a}) < ({b}) THEN -1 WHEN ({a}) > ({b}) THEN 1 ELSE 0 END)"
        )
        out = out[: m.start()] + repl + out[args_end + 1 :]


_SETVAR_RE = re.compile(r"@(\w+)\s*:=\s*@(\w+)\s*\+", re.S)
_SETVAR_ASSIGN_RE = re.compile(r"@(\w+)\s*:=", re.S)
_SETVAR_STOP_KW = re.compile(
    r"(AS|FROM|WHERE|GROUP|HAVING|ORDER|LIMIT|UNION|EXCEPT|INTERSECT)\b", re.I
)


def _validate_window_order(sql: str, order_text: str) -> None:
    """The running-SetVar rewrite copies the outer ORDER BY text
    verbatim into an OVER(...) spec — two top-level forms change
    meaning there (ADVICE r5): a positional ordinal (``ORDER BY 2``)
    is positional at top level but a CONSTANT inside a window (the
    running sum would accumulate in arbitrary partition order —
    silently wrong), and a select-list alias does not resolve inside
    OVER. Refuse both loudly."""
    for item in order_text.split(","):
        head = item.strip().split()[0] if item.strip() else ""
        if head.isdigit():
            raise ValueError(
                f"running-SetVar rewrite: ORDER BY ordinal {head!r} is "
                "positional at top level but a constant inside the window "
                "spec the rewrite builds — spell out the column name"
            )
    # select-list aliases: text between SELECT and the top-level FROM
    m = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?", sql, re.I)
    sel_start = m.end() if m else 0
    depth, quote, from_idx = 0, None, len(sql)
    i = sel_start
    while i < len(sql):
        ch = sql[i]
        if quote:
            if ch == "\\" and quote in "'\"":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and ch in "Ff"
            and not (sql[i - 1].isalnum() or sql[i - 1] in "_`")
            and re.match(r"FROM\b", sql[i:], re.I)
        ):
            from_idx = i
            break
        i += 1
    aliases = re.findall(r"\bAS\s+`?(\w+)`?", sql[sel_start:from_idx], re.I)
    for a in aliases:
        if re.search(rf"(?i)(?<![\w`.@]){re.escape(a)}(?![\w`])", order_text):
            raise ValueError(
                f"running-SetVar rewrite: ORDER BY references select-list "
                f"alias {a!r}, which does not resolve inside the window "
                "spec the rewrite builds — order by the underlying "
                "expression instead"
            )


def rewrite_running_setvars(sql: str, user_vars: dict[str, object]) -> str:
    """Translate MySQL's row-stream SetVar idioms into deterministic
    algebra — the pre-8.0 patterns users actually port (reference:
    executor/executor.go:413-415 unBatchedNext exists precisely for
    row-at-a-time SetVar evaluation):

        SELECT @t := @t + x  ... ORDER BY k   -- running total
        SELECT @r := @r + 1  ... ORDER BY k   -- row counter
        SELECT @a := <expr>  ...              -- plain capture

    Running forms become ``(<init> + sum(<expr>) OVER (ORDER BY k ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))`` with ``<init>`` the
    variable's current session value (NULL if unset — and NULL + x is
    NULL on every row, exactly MySQL's propagation). A top-level ORDER
    BY is REQUIRED for them (it is what gives "the previous row" a
    meaning in a distributed scan), and ordinals / select-list aliases
    in it are refused (_validate_window_order). The plain-capture form
    ``@a := <expr>`` projects ``(<expr>)`` — exactly MySQL's result set
    for the assignment expression, row-order free — provided the
    variable is not read elsewhere in the statement and <expr> reads no
    variable assigned in the same statement (those are row-order
    dependent: loud error). Ties in a running ORDER BY are processed in
    arbitrary order — the same indeterminism MySQL documents. The
    session variable IS updated after the query when the statement has
    a top-level ORDER BY (Engine._capture_setvars pulls the final
    row's value — MySQL's last-assigned semantics); without one,
    'last row' is scan-order indeterminism and the variable is left
    untouched (documented divergence).
    """
    if ":=" not in sql:
        return sql
    spans = {kw: (a, b) for a, b, kw in _top_level_keyword_spans(sql)}
    order_text = None
    if "ORDER BY" in spans:
        ob_end = spans["ORDER BY"][1]
        order_stop = spans["LIMIT"][0] if "LIMIT" in spans else len(sql)
        order_text = sql[ob_end:order_stop].strip() or None
    order_validated = False

    out = []
    i, n = 0, len(sql)
    quote = None
    depth = 0
    rewritten: list[str] = []
    captured: dict[str, str] = {}
    while i < n:
        ch = sql[i]
        if quote:
            out.append(ch)
            if ch == "\\" and quote in "'\"" and i + 1 < n:
                out.append(sql[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            quote = ch
            out.append(ch)
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "@" and sql[i + 1 : i + 2] != "@":
            m = _SETVAR_RE.match(sql, i)
            ma = _SETVAR_ASSIGN_RE.match(sql, i)
            self_running = bool(m and m.group(1).lower() == m.group(2).lower())
            # running form needs an ORDER BY to rewrite; a plain
            # assignment (@a := expr, expr not self-referencing)
            # rewrites order-free. Anything else falls through to the
            # loud error in substitute_user_vars.
            running = self_running and order_text is not None
            capture = ma is not None and not self_running
            if running or capture:
                name = (m if running else ma).group(1).lower()
                if name in rewritten or name in captured:
                    raise ValueError(
                        f"@{name} is assigned more than once in one statement — "
                        "interleaved running-variable updates have no "
                        "deterministic distributed meaning"
                    )
                # capture the assigned expression: up to a comma at this
                # depth, a close paren below this depth, or a top-level
                # keyword
                j = (m if running else ma).end()
                d2 = depth
                start = j
                while j < n:
                    c = sql[j]
                    if quote is None and c in ("'", '"', "`"):
                        q2 = c
                        j += 1
                        while j < n:
                            if sql[j] == "\\" and q2 in "'\"":
                                j += 2
                                continue
                            if sql[j] == q2:
                                break
                            j += 1
                        j += 1
                        continue
                    if c == "(":
                        d2 += 1
                    elif c == ")":
                        if d2 == depth:
                            break
                        d2 -= 1
                    elif c == "," and d2 == depth:
                        break
                    elif (
                        d2 == depth
                        and c.isalpha()
                        and not (sql[j - 1].isalnum() or sql[j - 1] in "_`@")
                        and _SETVAR_STOP_KW.match(sql, j)
                    ):
                        break
                    j += 1
                expr = sql[start:j].strip()
                if capture and re.search(rf"(?<!@)@{name}\b", expr, re.I):
                    # self-referencing non-running form (@a := @a * 2):
                    # row-order dependent — leave for the loud error
                    expr = ""
                if expr:
                    if running:
                        if not order_validated:
                            _validate_window_order(sql, order_text)
                            order_validated = True
                        init = render_literal(user_vars.get(name))
                        out.append(
                            f"({init} + sum({expr}) OVER (ORDER BY {order_text} "
                            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
                        )
                        rewritten.append(name)
                    else:
                        # MySQL's result set for @a := expr IS expr per
                        # row — the projection is row-order free
                        out.append(f"({expr}) ")
                        captured[name] = expr
                    i = j
                    continue
        out.append(ch)
        i += 1
    if not rewritten and not captured:
        return sql
    result = "".join(out)
    # a mid-stream READ of a rewritten variable elsewhere in the
    # statement would see the constant initial value, not the running
    # one — refuse instead of silently diverging from MySQL
    for name in list(rewritten) + list(captured):
        if re.search(rf"(?<!@)@{name}\b", result, re.I):
            raise ValueError(
                f"@{name} is both an assignment target and read elsewhere "
                "in the statement — mid-stream variable reads are "
                "row-order dependent and unsupported; materialize the "
                "value once and reference its alias"
            )
    # a captured expr reading a variable that is ALSO assigned in this
    # statement would see the constant initial value — row-order
    # dependent, refuse
    assigned = set(rewritten) | set(captured)
    for name, expr in captured.items():
        for other in assigned - {name}:
            if re.search(rf"(?<!@)@{other}\b", expr, re.I):
                raise ValueError(
                    f"@{name} := ... reads @{other}, which is assigned in "
                    "the same statement — interleaved assignment/read has "
                    "no deterministic distributed meaning"
                )
    return result


def substitute_user_vars(sql: str, user_vars: dict[str, object]) -> str:
    """Replace @name references with their literal values.

    The reference evaluates GetVar at runtime
    (expression/builtin_other.go:238-281); constant substitution covers
    the session-scoped usage (SURVEY §7.2 documents the row-order-
    dependent SetVar-in-stream case as unsupported).

    Quote-aware: ``@`` inside '...'/"..."/`...` literals is data, not a
    variable reference (``WHERE email = 'a@b.com'`` must pass through
    untouched). ``@@sysvar`` references are also left alone.
    """
    out = []
    i, n = 0, len(sql)
    quote = None
    changed = False
    while i < n:
        ch = sql[i]
        if quote:
            out.append(ch)
            if ch == "\\" and quote in "'\"" and i + 1 < n:
                out.append(sql[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
        elif ch in ("'", '"', "`"):
            quote = ch
            out.append(ch)
            i += 1
        elif ch == "@":
            if i + 1 < n and sql[i + 1] == "@":  # @@sysvar: pass through
                j = i + 2
                while j < n and (sql[j].isalnum() or sql[j] in "_."):
                    j += 1
                out.append(sql[i:j])
                i = j
            else:
                j = i + 1
                while j < n and (sql[j].isalnum() or sql[j] == "_"):
                    j += 1
                if j == i + 1:  # bare '@' with no name
                    out.append(ch)
                    i += 1
                else:
                    name = sql[i + 1 : j].lower()
                    # @a := expr inside a row stream is row-order
                    # dependent (reference: executor/executor.go:413
                    # unBatchedNext exists precisely for it) — loud
                    # failure beats a silent wrong answer
                    k = j
                    while k < n and sql[k].isspace():
                        k += 1
                    if sql[k : k + 2] == ":=":
                        raise ValueError(
                            f"row-order-dependent SetVar '@{name} := ...' inside a "
                            "query is unsupported (rows have no deterministic order "
                            "in a distributed scan); supported: the running forms "
                            f"'@{name} := @{name} + <expr>' WITH a top-level ORDER "
                            f"BY (window rewrite), or SET @{name} = <expr> for "
                            "session-scoped assignment"
                        )
                    out.append(render_literal(user_vars.get(name)))
                    changed = True
                    i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out) if changed else sql


_ALIAS_KW = {
    # clause keywords that can directly follow a relation in a FROM
    # clause — never aliases
    "on", "using", "where", "group", "order", "having", "limit", "by",
    "join", "inner", "left", "right", "full", "cross", "natural",
    "union", "except", "intersect", "as", "set", "values", "qualify",
    "window", "lateral", "straight_join", "anti", "semi", "outer",
    "offset", "for", "select", "from", "and", "or", "not", "in", "is",
    "between", "like", "case", "when", "then", "else", "end", "asc",
    "desc", "distinct", "all", "exists",
}


def _alias_definitions(sql: str) -> set[str]:
    """Names defined as table aliases anywhere in the statement
    (``FROM t [AS] d``, ``JOIN t d``, subquery ``(...) d``, comma
    items ``FROM a x, b y`` — nested subqueries included). Used to
    shadow engine-database names out of the qualifier mapping (ADVICE
    r5): ``SELECT d.x FROM t AS d`` with a database named ``d`` must
    resolve the alias, not the database. Over-collection is safe in
    the right direction — a shadowed real qualifier fails loudly at
    resolution instead of silently reading another table.

    Token walk per FROM/JOIN region: after a relation token (word or
    closing paren), a word that is not a clause keyword and is not
    followed by ``.``/``(`` is an alias definition."""
    aliases: set[str] = set()
    # strip string literals so keywords/names inside them don't count
    stripped = re.sub(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"", "''", sql)
    toks = re.findall(r"`[^`]*`|\w+|[(),.]", stripped)
    in_from = 0  # inside a FROM/JOIN clause at the CURRENT paren depth
    from_stack: list[int] = []  # saved in_from per enclosing paren level
    prev_kind = ""  # "", "rel" (word/`)` that could be a relation), "as", "dot"
    for idx, tok in enumerate(toks):
        t = tok.strip("`").lower()
        nxt = toks[idx + 1] if idx + 1 < len(toks) else ""
        if tok == "(":
            from_stack.append(in_from)
            in_from = 0
            prev_kind = ""
            continue
        if tok == ")":
            in_from = from_stack.pop() if from_stack else 0
            prev_kind = "rel"
            continue
        if tok == ".":
            prev_kind = "dot"
            continue
        if tok == ",":
            prev_kind = ""
            continue
        if t in ("from", "join"):
            in_from += 1
            prev_kind = ""
            continue
        if t in ("where", "group", "having", "order", "limit", "select",
                 "union", "except", "intersect", "qualify", "window",
                 "on", "using"):
            in_from = 0
            prev_kind = ""
            continue
        if t == "as" and prev_kind == "rel":
            prev_kind = "as"
            continue
        if (
            in_from
            and prev_kind in ("rel", "as")
            and t not in _ALIAS_KW
            and nxt not in (".", "(")
        ):
            aliases.add(t)
            prev_kind = ""
            continue
        if prev_kind == "dot":
            prev_kind = "rel"
            continue
        prev_kind = "rel" if re.match(r"[`\w]", tok) else ""
    return aliases


def rewrite_db_qualifiers(sql: str, mapping: dict[str, str]) -> str:
    """Rewrite ``db.x`` / ```db`.x`` qualifiers whose db part names an
    engine database into the engine's PRIVATE Spark-catalog namespace
    for that database (session isolation — reference analog: every
    session owns its context, session/session.go:562).

    Quote-aware: a matching word inside a string literal is data and
    passes through. Only a token immediately followed by ``.`` and an
    identifier start is a qualifier; a token already preceded by ``.``
    (the middle of ``db.table.col``) is never re-mapped. Alias shadowing
    (ADVICE r5): a table alias spelled exactly like an engine database
    (``FROM t AS d`` with a database named d, then ``d.x``) must NOT be
    rewritten — alias definitions (``FROM/JOIN <rel> [AS] <name>``,
    including subquery aliases ``) <name>``) are detected and excluded
    from the mapping for this statement. Residual ambiguity: a STRUCT
    column named like a database and accessed as ``col.field`` without
    an alias definition is still rewritten — name struct columns apart
    from databases.
    """
    if not mapping:
        return sql
    low = {k.lower(): v for k, v in mapping.items()}
    low = {k: v for k, v in low.items() if k not in _alias_definitions(sql)}
    if not low:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    changed = False
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            q = ch
            out.append(ch)
            i += 1
            while i < n:
                out.append(sql[i])
                if sql[i] == "\\" and q != "`" and i + 1 < n:
                    out.append(sql[i + 1])
                    i += 2
                    continue
                if sql[i] == q:
                    i += 1
                    break
                i += 1
            continue
        if ch == "`" or ch.isalpha() or ch == "_":
            if ch == "`":
                j = sql.find("`", i + 1)
                if j == -1:
                    out.append(sql[i:])
                    break
                name, end = sql[i + 1 : j], j + 1
            else:
                j = i
                while j < n and (sql[j].isalnum() or sql[j] == "_"):
                    j += 1
                name, end = sql[i:j], j
            target = low.get(name.lower())
            qualifier = (
                target is not None
                and end + 1 < n
                and sql[end] == "."
                and (sql[end + 1] == "`" or sql[end + 1].isalnum() or sql[end + 1] == "_")
            )
            prev = out[-1][-1] if out and out[-1] else ""
            if qualifier and prev != ".":
                out.append(f"`{target}`")
                changed = True
            else:
                out.append(sql[i:end])
            i = end
            continue
        out.append(ch)
        i += 1
    return "".join(out) if changed else sql


def _top_level_from_idx(sql: str, start: int = 0) -> int:
    """Index of the first top-level FROM keyword at/after ``start``
    (paren- and quote-aware), or len(sql) if none."""
    depth, quote = 0, None
    i, n = start, len(sql)
    while i < n:
        ch = sql[i]
        if quote:
            if ch == "\\" and quote in "'\"":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and ch in "Ff"
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in "_`"))
            and re.match(r"FROM\b", sql[i:], re.I)
        ):
            return i
        i += 1
    return n


def select_capture_items(sql: str) -> list[tuple[int, str]]:
    """(select-item index, variable name) for every TOP-LEVEL select
    item of the form ``@name := expr [AS alias]`` in a plain SELECT.
    These are the assignments whose post-statement value the engine
    captures from the result's last row (MySQL leaves the variable at
    the value assigned on the final processed row —
    executor/executor.go:413-415 evaluates SetVar row-at-a-time).
    Nested assignments (inside function calls or subqueries) are NOT
    returned — their per-row evaluation order has no distributed
    meaning, and the statement rewrite refuses the row-order-dependent
    ones already."""
    if ":=" not in sql:
        return []
    m = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?", sql, re.I)
    if not m:
        return []
    sel_start = m.end()
    from_idx = _top_level_from_idx(sql, sel_start)
    out = []
    for idx, item in enumerate(split_top_level(sql[sel_start:from_idx])):
        mm = re.match(r"\s*@(\w+)\s*:=", item)
        if mm:
            out.append((idx, mm.group(1).lower()))
    return out


def render_literal(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def rewrite_select(
    sql: str,
    user_vars: dict[str, object],
    int_col=None,
    warnings: list | None = None,
) -> str:
    # running-SetVar idioms first: what it rewrites no longer contains
    # ':=', so the loud error below only fires for unsupported forms
    sql = rewrite_running_setvars(sql, user_vars)
    # string-number compare coercion AFTER user-var substitution (a
    # numeric @var against a string literal must also go REAL) and
    # BEFORE the cast rewrites (whose emitted SQL must stay untouched)
    sql = rewrite_string_number_compares(
        substitute_user_vars(sql, user_vars), int_col
    )
    return rewrite_date_format(
        rewrite_mysql_casts(rewrite_strcmp(sql), warnings)
    )
