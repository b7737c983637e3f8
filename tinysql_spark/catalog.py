"""Engine catalog: databases → tables → columns/indexes, JSON-persisted.

Mirrors the reference's `model.DBInfo` / `model.TableInfo` /
`model.ColumnInfo` / `model.IndexInfo`
(`/root/reference/parser/model/model.go:564,:180,:82,:507`) with a
Spark-native storage mapping: one parquet directory per table plus an
internal `_rowid` handle column (the reference's int64 row handle,
`table/tables/tables.go:378`) used by DELETE/REPLACE.

Short DDL (CREATE/DROP/ALTER metadata) is synchronous catalog
mutation under the engine's cross-process lock. Long DDL — index
backfill and OPTIMIZE rewrites — runs ONLINE through the F1 schema
states declared here (`STATE_*`, reference `ddl/ddl_worker.go:300`,
`parser/model/model.go:32-40`): the rewrite itself holds no lock, so
writers never block behind a 100 TB reorganization (engine.py
`_exec_create_index` / `_exec_optimize`).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import types as T

ROWID = "_rowid"

# F1 online-schema-change states (reference: parser/model/model.go:32-40
# SchemaState; the protocol ddl/ddl_worker.go drives). An index being
# built transitions delete-only -> write-only -> write-reorganization ->
# public, each transition published as its own catalog commit, so a
# concurrent session never observes a jump of more than one state.
# String values match TiDB's ADMIN SHOW DDL JOBS SCHEMA_STATE column.
STATE_NONE = "none"
STATE_DELETE_ONLY = "delete only"
STATE_WRITE_ONLY = "write only"
STATE_WRITE_REORG = "write reorganization"
STATE_PUBLIC = "public"

# States whose elements every WRITE must maintain (model.go: from
# write-only on, inserts/updates keep the element consistent; in
# delete-only, only deletes do — which a layout-index satisfies
# trivially, so writes simply skip it).
WRITE_VISIBLE_STATES = frozenset(
    {STATE_WRITE_ONLY, STATE_WRITE_REORG, STATE_PUBLIC}
)

_TYPE_MAP = {
    "TINYINT": T.IntegerType(),
    "SMALLINT": T.IntegerType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "REAL": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "TEXT": T.StringType(),
    "STRING": T.StringType(),
    # temporal/decimal/bool (reference type bytes: TypeDate=10,
    # TypeDatetime=12, TypeTimestamp=7, TypeNewDecimal=0xf6,
    # parser/mysql/type.go:25-38). DATETIME is MySQL wall-clock ->
    # TIMESTAMP_NTZ; TIMESTAMP is session-tz-converted -> Spark
    # TIMESTAMP (the session tz is UTC, so both read back what was
    # written).
    "DATE": T.DateType(),
    "DATETIME": T.TimestampNTZType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
}


# Upper bound of each MySQL unsigned integer width (strict-mode
# inserts above these raise errno 1264, mirroring the negative side).
_UNSIGNED_MAX = {
    "TINYINT": 255,
    "SMALLINT": 65535,
    "MEDIUMINT": 16777215,
    "INT": 4294967295,
    "INTEGER": 4294967295,
    "BIGINT": 18446744073709551615,
}


def sql_type_to_spark(type_str: str) -> T.DataType:
    up = type_str.strip().upper()
    if up.endswith(" UNSIGNED"):
        # True unsigned semantics (reference: types/datum.go:36
        # KindUint64, parser/mysql/type.go:60 UnsignedFlag — the
        # former accepted cut): BIGINT UNSIGNED needs the full
        # [0, 2^64) range, which no Spark integral type holds, so it
        # maps to DECIMAL(20,0) — exact, order-correct, parquet-
        # native. Smaller unsigned types fit the next signed size up.
        base = up[:-len(" UNSIGNED")].split("(")[0].strip()
        if base == "BIGINT":
            return T.DecimalType(20, 0)
        if base in ("INT", "INTEGER", "MEDIUMINT"):
            return T.LongType()
        if base in ("SMALLINT", "TINYINT"):
            return T.IntegerType()
        raise ValueError(f"unsupported unsigned column type: {type_str}")
    base = type_str.split("(")[0].strip().upper()
    if base in ("DECIMAL", "NUMERIC"):
        import re as _re

        m = _re.fullmatch(
            r"(?:DECIMAL|NUMERIC)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?",
            type_str.strip(),
            _re.I,
        )
        if not m:
            raise ValueError(f"cannot parse decimal type: {type_str}")
        # MySQL defaults: DECIMAL == DECIMAL(10,0)
        return T.DecimalType(int(m.group(1) or 10), int(m.group(2) or 0))
    if base not in _TYPE_MAP:
        raise ValueError(f"unsupported column type: {type_str}")
    return _TYPE_MAP[base]


def spark_type_to_sql(dt: T.DataType) -> str:
    """Inverse mapping for CTAS: the SELECT's inferred Spark schema
    back to declared SQL types (only the engine's three eval families —
    SURVEY §1.2 — are representable; anything else is a clear error)."""
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampNTZType):
        return "DATETIME"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    raise ValueError(
        f"CREATE TABLE AS SELECT cannot store column type {dt.simpleString()!r}: "
        "declare the table explicitly and cast, or project to "
        "int/bigint/float/double/string/date/datetime/timestamp/"
        "boolean/decimal columns"
    )


@dataclass
class ColumnInfo:
    name: str
    type: str  # declared SQL type, e.g. "INT", "VARCHAR(255)"
    nullable: bool = True
    default: str | None = None  # SQL literal text, or None
    # AUTO_INCREMENT (reference: meta/autoid, table/tables.go:378
    # AddRecord allocates when the column is missing/NULL): at most
    # one integer key column per table; values come from the table's
    # persistent allocator (TableInfo.next_auto).
    auto_increment: bool = False
    # Physical (in-file) parquet column name when it differs from the
    # logical name — RENAME COLUMN updates only this mapping, making
    # renames metadata-only (no 100 TB rewrite). The reference keys
    # rows by column ID for the same reason (parser/model/model.go
    # ColumnInfo.ID); Iceberg/Delta field IDs are the same idea.
    physical: str | None = None
    # MySQL fills PRE-EXISTING rows on ALTER ADD COLUMN with the
    # declared DEFAULT (or the type's implicit default under NOT
    # NULL) — ddl/column.go backfills them. Here the fill is
    # metadata-only (no 100 TB rewrite): rows with
    # _rowid < initial_default_below predate the column (rowids are
    # monotone and immutable, and there is no UPDATE statement, so an
    # old rowid can never carry a genuinely-written value) and read
    # COALESCE to this SQL literal. Iceberg v3's initial_default vs
    # write_default split is the same idea.
    initial_default: str | None = None
    initial_default_below: int | None = None

    @property
    def file_name(self) -> str:
        return self.physical or self.name

    @property
    def is_unsigned(self) -> bool:
        return self.type.strip().upper().endswith(" UNSIGNED")

    @property
    def unsigned_max(self) -> int | None:
        """Per-width maximum for an UNSIGNED column (MySQL strict mode
        rejects values above it with errno 1264 — types/datum.go:36
        KindUint64). None for signed columns."""
        if not self.is_unsigned:
            return None
        up = self.type.strip().upper()
        base = up[: -len(" UNSIGNED")].split("(")[0].strip()
        return _UNSIGNED_MAX[base]

    def spark_type(self) -> T.DataType:
        return sql_type_to_spark(self.type)


@dataclass
class IndexInfo:
    name: str
    columns: list[str]
    unique: bool = False
    # F1 schema state (model.go:32-40). Synchronously-created indexes
    # and catalogs written before states existed load as public (the
    # dataclass default); an online CREATE INDEX walks the full chain.
    state: str = STATE_PUBLIC

    @property
    def write_visible(self) -> bool:
        """True when writes must maintain this index (state >= write-only)."""
        return self.state in WRITE_VISIBLE_STATES


@dataclass
class BucketSpec:
    """Declared physical bucketing (CREATE TABLE ... CLUSTERED BY ...
    INTO n BUCKETS): every write hash-partitions rows into
    ``num_buckets`` files on ``columns`` with Spark's bucket hashing,
    so equi-joins/aggregations on the bucket columns between
    same-bucketed tables read co-located partitions and skip the
    shuffle. The Spark analog of the reference's hash-partitioned
    regions keyed by handle (tablecodec/tablecodec.go:74)."""

    columns: list[str]
    num_buckets: int
    sort_columns: list[str] = field(default_factory=list)


@dataclass
class TableInfo:
    name: str
    columns: list[ColumnInfo]
    primary_key: list[str] = field(default_factory=list)
    indexes: list[IndexInfo] = field(default_factory=list)
    bucket: BucketSpec | None = None
    # CREATE TABLE ... PARTITIONED BY (col, ...): rows land in
    # hive-style directories (col=value/), so a predicate on the
    # partition column prunes whole directories at planning time
    # (PartitionFilters) — the third pruning lever next to sorted
    # layout and bucketing, and the direct analog of the reference's
    # index range scans (util/ranger/ranger.go:282).
    partition_by: list[str] = field(default_factory=list)
    next_rowid: int = 1
    next_auto: int = 1  # AUTO_INCREMENT allocator (reference: meta/autoid)
    # In-file names of DROPped columns. DROP COLUMN is metadata-only
    # (pruning means the dead column is never read), so the bytes stay
    # in old part-files; a later ADD COLUMN of the same name must NOT
    # resolve to them (parquet resolves by name — the old values would
    # silently resurrect instead of reading NULL/default). ADD checks
    # this list plus live file_names and mints a fresh physical name on
    # collision — the column-ID discipline (model.ColumnInfo.ID).
    dropped_physical: list[str] = field(default_factory=list)

    def column(self, name: str) -> ColumnInfo | None:
        for c in self.columns:
            if c.name.lower() == name.lower():
                return c
        return None

    def auto_column(self) -> ColumnInfo | None:
        for c in self.columns:
            if c.auto_increment:
                return c
        return None

    def user_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type(), c.nullable) for c in self.columns]
        )

    def full_schema(self) -> T.StructType:
        """User columns + the hidden rowid handle."""
        return T.StructType(
            [T.StructField(ROWID, T.LongType(), False)] + list(self.user_schema().fields)
        )

    def physical_schema(self) -> T.StructType:
        """full_schema with in-file column names (see ColumnInfo.physical)."""
        return T.StructType(
            [T.StructField(ROWID, T.LongType(), False)]
            + [T.StructField(c.file_name, c.spark_type(), c.nullable) for c in self.columns]
        )

    def has_name_mapping(self) -> bool:
        return any(c.physical and c.physical != c.name for c in self.columns)

    def unique_keys(self) -> list[list[str]]:
        """PK + write-visible unique indexes — the conflict targets for
        REPLACE and the INSERT dup-key check (reference:
        executor/replace.go:29 removeRow on dup key). An index still in
        delete-only state is NOT enforced on writes (F1: inserts do not
        maintain it yet — model.go:32-40); from write-only on it is,
        which is what lets the online backfill audit only the rows that
        existed before write-only published."""
        keys = []
        if self.primary_key:
            keys.append(self.primary_key)
        for idx in self.indexes:
            if idx.unique and idx.write_visible:
                keys.append(idx.columns)
        return keys

    def public_indexes(self) -> list[IndexInfo]:
        """Indexes the READ side may use (SHOW/plan layout hints): only
        fully-published ones — a mid-DDL index is incomplete over
        existing rows until its backfill lands."""
        return [i for i in self.indexes if i.state == STATE_PUBLIC]

    def needs_backing(self) -> bool:
        """True when the table registers as a __phys backing table
        behind a view (physical-name mapping, hive partitioning, or
        the initial-default fill — which needs _rowid in the backing
        schema). Every site that special-cases 'the logical name is a
        VIEW' (registration, refresh, ANALYZE) must use this ONE
        predicate, or a new backing reason silently breaks them."""
        return bool(
            self.has_name_mapping()
            or self.partition_by
            or self.initial_default_columns()
        )

    def initial_default_columns(self) -> list[ColumnInfo]:
        """Columns whose pre-ALTER rows need the read-time default fill."""
        return [
            c
            for c in self.columns
            if c.initial_default is not None and c.initial_default_below
        ]

    def write_indexes(self) -> list[IndexInfo]:
        """Indexes the WRITE side must maintain (sorted-append layout):
        write-only and later states."""
        return [i for i in self.indexes if i.write_visible]


class Catalog:
    """JSON-file-backed catalog over a warehouse directory.

    Layout: <warehouse>/catalog.json, <warehouse>/<db>/<table>/data/
    (parquet files). Writes go through write-tmp-then-swap so a
    statement is atomic at the directory level (SURVEY §7.3.1).
    """

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self.path = os.path.join(warehouse, "catalog.json")
        self.dbs: dict[str, dict[str, TableInfo]] = {"default": {}}
        if os.path.exists(self.path):
            self._load()
        else:
            self._save()

    # -- persistence -------------------------------------------------------

    def _load(self) -> None:
        with open(self.path) as f:
            raw = json.load(f)
        self.dbs = {}
        for db, tables in raw.items():
            self.dbs[db] = {}
            for tname, t in tables.items():
                self.dbs[db][tname] = TableInfo(
                    name=t["name"],
                    columns=[ColumnInfo(**c) for c in t["columns"]],
                    primary_key=t.get("primary_key", []),
                    indexes=[IndexInfo(**i) for i in t.get("indexes", [])],
                    bucket=BucketSpec(**t["bucket"]) if t.get("bucket") else None,
                    partition_by=t.get("partition_by", []),
                    next_rowid=t.get("next_rowid", 1),
                    next_auto=t.get("next_auto", 1),
                    dropped_physical=t.get("dropped_physical", []),
                )

    def _save(self) -> None:
        raw = {
            db: {tname: asdict(t) for tname, t in tables.items()}
            for db, tables in self.dbs.items()
        }
        fd, tmp = tempfile.mkstemp(dir=self.warehouse, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(raw, f, indent=1)
        os.replace(tmp, self.path)

    # -- databases ---------------------------------------------------------

    def create_database(self, db: str, if_not_exists: bool = False) -> None:
        if db in self.dbs:
            if if_not_exists:
                return
            raise ValueError(f"(errno 1007) database {db!r} already exists")
        self.dbs[db] = {}
        self._save()

    def drop_database(self, db: str, if_exists: bool = False) -> None:
        if db not in self.dbs:
            if if_exists:
                return
            raise ValueError(f"(errno 1049) database {db!r} does not exist")
        del self.dbs[db]
        shutil.rmtree(os.path.join(self.warehouse, db), ignore_errors=True)
        self._save()

    def has_database(self, db: str) -> bool:
        return db in self.dbs

    # -- tables ------------------------------------------------------------

    def table_dir(self, db: str, table: str) -> str:
        return os.path.join(self.warehouse, db, table)

    def data_dir(self, db: str, table: str) -> str:
        return os.path.join(self.table_dir(db, table), "data")

    def get_table(self, db: str, table: str) -> TableInfo:
        try:
            return self.dbs[db][table.lower()]
        except KeyError:
            raise ValueError(f"(errno 1146) table {db}.{table} does not exist") from None

    def has_table(self, db: str, table: str) -> bool:
        return db in self.dbs and table.lower() in self.dbs[db]

    def add_table(self, db: str, info: TableInfo) -> None:
        if db not in self.dbs:
            raise ValueError(f"(errno 1049) database {db!r} does not exist")
        self.dbs[db][info.name.lower()] = info
        self._save()

    def drop_table(self, db: str, table: str) -> None:
        del self.dbs[db][table.lower()]
        shutil.rmtree(self.table_dir(db, table), ignore_errors=True)
        self._save()

    def tables(self, db: str) -> list[str]:
        return sorted(self.dbs.get(db, {}))

    def update(self) -> None:
        """Persist in-place mutations of TableInfo (next_rowid, ALTER)."""
        self._save()

    # -- atomic data swap --------------------------------------------------

    def swap_data_dir(self, db: str, table: str, new_dir: str) -> None:
        """Atomically replace the table's data directory with new_dir.

        write-new-dir-then-rename (SURVEY §7.3.1): the data dir is
        replaced in two renames; the trash dir is cleaned best-effort.
        """
        if not os.path.isdir(new_dir):
            # NEVER rename the live data dir aside for a staging dir
            # that is gone (e.g. swept or deleted by a racing cleanup)
            # — failing after the first rename would leave the table
            # with no data dir at all
            raise ValueError(f"swap source missing: {new_dir}")
        data = self.data_dir(db, table)
        trash = data + f".trash-{uuid.uuid4().hex[:8]}"
        if os.path.exists(data):
            os.rename(data, trash)
        os.rename(new_dir, data)
        shutil.rmtree(trash, ignore_errors=True)
