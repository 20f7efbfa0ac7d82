"""Schema-definition statements — the reference's DDL surface
(CreateStatement / AlterStatement / DropStatement / PragmaStatement,
duckdb.hpp:11960-11990; ALTER column machinery duckdb-internal.hpp
AlterTableInfo).

Spark-side semantics, documented per statement:

- ``CREATE TABLE (col defs)`` → managed parquet table. Constraints:
  PRIMARY KEY / UNIQUE / NOT NULL / CHECK / FOREIGN KEY are parsed AND
  enforced (r6) — the reference enforces them per-row via its ART index
  (duckdb-internal.hpp); we enforce them per-STATEMENT with one bounded
  validation job before the write lands (see _enforce_insert /
  enforce_update / enforce_parent_keys; a referenced parent also cannot
  be dropped while a child exists). ``DEFAULT`` expressions ARE
  honored: partial-column INSERTs fill missing columns with their
  default.
- ``TEMP TABLE`` → ordinary managed table: the metastore/warehouse of
  this deployment is already session-scoped, which is exactly DuckDB's
  temp-table lifetime.
- ``CREATE VIEW`` → temporary view (DuckDB views live in the in-process
  catalog; a Spark *persistent* view cannot reference our temp views).
- ``ALTER TABLE ADD/DROP/RENAME/retype COLUMN`` → copy-on-write staging
  swap, the same machinery the UPDATE/DELETE DML layer uses
  (sqlfront._swap_in). ``RENAME TO`` passes to Spark directly.
- ``CREATE/DROP INDEX`` → metadata no-op with a status row. The
  reference's ART index (duckdb-internal.hpp:4100) is a performance
  structure, not query semantics; broadcast and bucketed joins are the
  Spark-side analogue (SURVEY §7).
- ``COMMENT ON`` → recorded in the session comment registry.
- ``TRUNCATE t`` / ``DROP … CASCADE`` → normalized to Spark's grammar.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: per-table column DEFAULT expressions (DuckDB text), applied on
#: partial-column INSERT
TABLE_DEFAULTS: dict[str, dict[str, str]] = {}
#: raw constraint text, for introspection
TABLE_CONSTRAINTS: dict[str, list[str]] = {}
#: CREATE INDEX shim registry
INDEXES: dict[str, str] = {}
#: PRIMARY KEY / UNIQUE key columns per table (conflict-target for
#: INSERT OR IGNORE / OR REPLACE / ON CONFLICT)
TABLE_PKEYS: dict[str, list[str]] = {}
#: COMMENT ON registry
COMMENTS: dict[str, str] = {}
#: enforced-constraint registries (r6 — the reference enforces these via
#: its ART index + binder, duckdb-internal.hpp; we enforce them with one
#: bounded validation job per DML statement, see _enforce_insert)
TABLE_NOTNULL: dict[str, list[str]] = {}
TABLE_CHECKS: dict[str, list[str]] = {}  # DuckDB-dialect expressions
TABLE_UNIQUES: dict[str, list[list[str]]] = {}  # key sets; PK set first
#: child table → [{"cols": [...], "parent": str, "pcols": [...]}]
TABLE_FKEYS: dict[str, list[dict]] = {}


class ConstraintError(ValueError):
    """A PRIMARY KEY / UNIQUE / NOT NULL / CHECK violation — mirrors the
    reference's ConstraintException (its messages start the same way:
    ``Constraint Error: …``)."""


def drop_table_metadata(table: str) -> None:
    """Forget every registry entry for ``table`` (DROP TABLE, and the
    start of a fresh CREATE TABLE so re-created tables never inherit a
    previous definition's constraints/defaults)."""
    key = table.lower()
    for reg in (
        TABLE_DEFAULTS,
        TABLE_CONSTRAINTS,
        TABLE_PKEYS,
        TABLE_NOTNULL,
        TABLE_CHECKS,
        TABLE_UNIQUES,
        TABLE_FKEYS,
    ):
        reg.pop(key, None)

_CONSTRAINT_KEYWORDS = {
    "primary", "unique", "not", "check", "references", "default", "collate",
}

_CREATE_TABLE_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s*\((.*)\)\s*;?\s*$",
    re.I | re.S,
)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+AS\s+(.*?)\s*;?\s*$",
    re.I | re.S,
)
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+AS\s+(.*?)\s*;?\s*$",
    re.I | re.S,
)
_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s*;?\s*$", re.I
)
_DROP_CASCADE_RE = re.compile(
    r"^\s*(DROP\s+(?:TABLE|VIEW)\s+.*?)\s+(?:CASCADE|RESTRICT)\s*;?\s*$", re.I
)
_CREATE_INDEX_RE = re.compile(
    r"^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([A-Za-z_]\w*)\s+ON\s+(([A-Za-z_][\w.]*).*?)\s*;?\s*$",
    re.I | re.S,
)
_DROP_INDEX_RE = re.compile(
    r"^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$", re.I
)
_COMMENT_RE = re.compile(
    r"^\s*COMMENT\s+ON\s+(\w+)\s+([\w.]+)\s+IS\s+('(?:[^']|'')*'|NULL)\s*;?\s*$",
    re.I,
)
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s+(.*?)\s*;?\s*$",
    re.I | re.S,
)
_INSERT_COLS_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s*\(([^)]*)\)\s*(VALUES\s*\(.*|SELECT\b.*|FROM\b.*)$",
    re.I | re.S,
)


def _status(spark: SparkSession, **cols: str) -> DataFrame:
    names = list(cols)
    return spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{n} string" for n in names)
    )


def _translate_type(type_toks: list[str]) -> str:
    """DuckDB column type tokens → Spark DDL type string."""
    from quackspark.sqlfront import (
        _TYPE_RENAMES,
        UnsupportedSQL,
        _rewrite_array_type_suffix,
    )

    # T[] suffixes only fire after ::/AS in the expression pass — give the
    # tokens a cast context, then strip it
    toks = _rewrite_array_type_suffix(["::"] + type_toks)[1:]
    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        low = t.lower()
        if low in ("varchar", "char", "text", "string") and (
            i + 1 < len(toks) and toks[i + 1] == "("
        ):
            # VARCHAR(n): DuckDB ignores the length — so do we
            while i < len(toks) and toks[i] != ")":
                i += 1
            i += 1
            out.append("STRING")
            continue
        from quackspark.sqlfront import _ENUM_TYPES

        if low in _ENUM_TYPES:
            # a named ENUM column (CREATE TYPE … AS ENUM) stores the
            # validated-string carrier; the dictionary stays registry-side
            out.append("STRING")
            i += 1
            continue
        prev = toks[i - 1].lower() if i else ""
        if low in ("time", "timetz") and prev != "with":
            # (`prev != "with"` skips the TIME inside TIMESTAMP WITH TIME
            # ZONE, which the trailing regex normalizes to TIMESTAMP)
            # TIME / TIME WITH TIME ZONE columns store their engine
            # carriers (reference LogicalTypeId TIME/TIME_TZ
            # duckdb.hpp:914,931): µs-since-midnight BIGINT, resp.
            # struct<micros,offset_s> (functions/compat.make_time_tz);
            # TIME/TIMETZ literals arrive in exactly these shapes via
            # sqlfront._rewrite_time_literals, so INSERT/compare/sort
            # work end-to-end (VERDICT r6 missing #2)
            with_zone = low == "timetz" or "zone" in [
                x.lower() for x in toks[i + 1 : i + 4]
            ]
            if with_zone:
                out.append("STRUCT<micros:BIGINT,offset_s:INT>")
                if low == "timetz":
                    # single-token spelling: consume exactly it — a trailing
                    # suffix like TIMETZ(3) must surface as a loud
                    # downstream error, not be silently swallowed (r7
                    # ADVICE: the zone-scan below ate every remaining token)
                    i += 1
                else:
                    while i < len(toks) and toks[i].lower() != "zone":
                        i += 1
                    i += 1
            else:
                out.append("BIGINT")
                i += 1
            continue
        out.append(_TYPE_RENAMES.get(low, t))
        i += 1
    joined = " ".join(out)
    # normalize parameterized forms the join spaced out: DECIMAL ( 10 , 2 )
    joined = re.sub(r"\s*\(\s*", "(", joined)
    joined = re.sub(r"\s*\)\s*", ")", joined)
    joined = re.sub(r"\s*,\s*", ",", joined)
    joined = re.sub(r"\s*<\s*", "<", joined)
    joined = re.sub(r"\s*>", ">", joined)
    # TIMESTAMP WITH TIME ZONE → TIMESTAMP
    joined = re.sub(r"(?i)TIMESTAMP\s+WITH\s+TIME\s+ZONE", "TIMESTAMP", joined)
    return joined


def _parse_column_defs(defs_sql: str, table: str):
    """Split a CREATE TABLE body into (name, spark_type, default_expr)
    triples, collecting constraints into the registry."""
    from quackspark.sqlfront import UnsupportedSQL, _split_args, _tokens

    cols: list[tuple[str, str, str | None]] = []
    constraints: list[str] = []
    drop_table_metadata(table)  # a fresh definition replaces the old one
    key = table.lower()

    def _paren_cols(toks: list[str]) -> list[str]:
        inner = toks[toks.index("(") + 1 : len(toks) - 1 - toks[::-1].index(")")]
        return [t.strip('"').lower() for t in inner if t != ","]

    def _add_pk(pk_cols: list[str]) -> None:
        TABLE_PKEYS[key] = pk_cols
        TABLE_UNIQUES.setdefault(key, []).insert(0, pk_cols)
        nn = TABLE_NOTNULL.setdefault(key, [])
        nn.extend(c for c in pk_cols if c not in nn)  # PK implies NOT NULL

    for item in _split_args(_tokens(defs_sql)):
        head = item[0].lower()
        if head in ("primary", "unique", "check", "foreign", "constraint"):
            constraints.append(" ".join(item))
            if head == "constraint":  # CONSTRAINT <name> <definition>
                item = item[2:]
                head = item[0].lower() if item else ""
            low_toks = [t.lower() for t in item]
            if low_toks[:2] == ["primary", "key"] and "(" in item:
                _add_pk(_paren_cols(item))
            elif head == "unique" and "(" in item:
                TABLE_UNIQUES.setdefault(key, []).append(_paren_cols(item))
            elif head == "check" and "(" in item:
                i0 = item.index("(")
                i1 = len(item) - 1 - item[::-1].index(")")
                TABLE_CHECKS.setdefault(key, []).append(
                    " ".join(item[i0 + 1 : i1])
                )
            elif head == "foreign":
                # FOREIGN KEY (cols) REFERENCES parent [(pcols)]
                low_toks = [t.lower() for t in item]
                if "references" not in low_toks or "(" not in item:
                    raise UnsupportedSQL(f"FOREIGN KEY form: {' '.join(item)}")
                ri = low_toks.index("references")
                fcols = _paren_cols(item[:ri])
                parent = item[ri + 1].strip('"').lower()
                pcols = (
                    _paren_cols(item[ri + 1 :]) if "(" in item[ri + 1 :] else []
                )
                TABLE_FKEYS.setdefault(key, []).append(
                    {"cols": fcols, "parent": parent, "pcols": pcols}
                )
            continue
        name = item[0].strip('"')
        type_toks: list[str] = []
        default: str | None = None
        i = 1
        depth = 0
        while i < len(item):
            t = item[i]
            low = t.lower()
            if depth == 0 and low in _CONSTRAINT_KEYWORDS:
                break
            if t in ("(", "["):
                depth += 1
            elif t in (")", "]"):
                depth -= 1
            type_toks.append(t)
            i += 1
        # a named-ENUM-typed column gets an implicit membership CHECK —
        # the constraint machinery then raises on non-member INSERT/UPDATE
        # exactly where DuckDB raises its enum conversion error
        from quackspark.sqlfront import _ENUM_TYPES, _qstr

        if len(type_toks) == 1 and type_toks[0].lower() in _ENUM_TYPES:
            labels = ", ".join(
                _qstr(s) for s in _ENUM_TYPES[type_toks[0].lower()]
            )
            TABLE_CHECKS.setdefault(key, []).append(f"{name} IN ({labels})")
        # constraint tail: record; extract DEFAULT expr
        while i < len(item):
            low = item[i].lower()
            if low == "default":
                j = i + 1
                d = 0
                expr: list[str] = []
                while j < len(item):
                    tj = item[j]
                    if d == 0 and tj.lower() in _CONSTRAINT_KEYWORDS and expr:
                        break
                    if tj in ("(", "["):
                        d += 1
                    elif tj in (")", "]"):
                        d -= 1
                    expr.append(tj)
                    j += 1
                default = " ".join(expr)
                i = j
            else:
                low = item[i].lower()
                if low == "primary":  # PRIMARY [KEY]
                    pk = TABLE_PKEYS.setdefault(key, [])
                    if name.lower() not in pk:
                        pk.append(name.lower())
                    constraints.append(f"{name} {item[i]}")
                    i += 1
                elif low == "not" and i + 1 < len(item) and item[i + 1].lower() == "null":
                    nn = TABLE_NOTNULL.setdefault(key, [])
                    if name.lower() not in nn:
                        nn.append(name.lower())
                    constraints.append(f"{name} not null")
                    i += 2
                elif low == "unique":
                    TABLE_UNIQUES.setdefault(key, []).append([name.lower()])
                    constraints.append(f"{name} unique")
                    i += 1
                elif low == "references" and i + 1 < len(item):
                    parent = item[i + 1].strip('"').lower()
                    j = i + 2
                    pcols: list[str] = []
                    if j < len(item) and item[j] == "(":
                        k2 = j
                        d2 = 0
                        while k2 < len(item):
                            if item[k2] == "(":
                                d2 += 1
                            elif item[k2] == ")":
                                d2 -= 1
                                if d2 == 0:
                                    break
                            k2 += 1
                        pcols = [
                            t.strip('"').lower()
                            for t in item[j + 1 : k2]
                            if t != ","
                        ]
                        j = k2 + 1
                    TABLE_FKEYS.setdefault(key, []).append(
                        {"cols": [name.lower()], "parent": parent, "pcols": pcols}
                    )
                    constraints.append(f"{name} references {parent}")
                    i = j
                elif low == "check" and i + 1 < len(item) and item[i + 1] == "(":
                    j = i + 1
                    d = 0
                    while j < len(item):
                        if item[j] == "(":
                            d += 1
                        elif item[j] == ")":
                            d -= 1
                            if d == 0:
                                break
                        j += 1
                    TABLE_CHECKS.setdefault(key, []).append(
                        " ".join(item[i + 2 : j])
                    )
                    constraints.append(f"{name} check")
                    i = j + 1
                else:
                    constraints.append(f"{name} {item[i]}")
                    i += 1
        if not type_toks:
            raise UnsupportedSQL(f"column {name} needs a type")
        cols.append((name, _translate_type(type_toks), default))
    if key in TABLE_PKEYS:
        # inline single-column PRIMARY KEY: register its unique set and
        # implied NOT NULL (the table-level path did this in _add_pk)
        pk_cols = TABLE_PKEYS[key]
        uq = TABLE_UNIQUES.setdefault(key, [])
        if not uq or uq[0] != pk_cols:
            uq.insert(0, pk_cols)
        nn = TABLE_NOTNULL.setdefault(key, [])
        nn.extend(c for c in pk_cols if c not in nn)
    if constraints:
        TABLE_CONSTRAINTS[table.lower()] = constraints
    return cols


def run_ddl(spark: SparkSession, duckdb_sql: str) -> DataFrame | None:
    """Dispatch a DDL statement; None when the text is not DDL."""
    from quackspark.sqlfront import UnsupportedSQL, transpile

    if re.match(r"^\s*(?:FORCE\s+)?CHECKPOINT\s*;?\s*$", duckdb_sql, re.I):
        # reference WAL checkpoint (duckdb.hpp storage surface;
        # checkpoint fn duckdb-6.cpp:9490) — plain managed-parquet tables
        # are durable at write, but versioned (commit-log) tables have a
        # real analog: force a full-state log checkpoint at the current
        # tip so snapshot replay restarts from here
        from quackspark import versioned as _versioned

        forced = []
        for key, (vt, tip) in list(_versioned._REGISTRY.items()):
            if vt.force_checkpoint(tip):
                forced.append(key)
        return _status(
            spark,
            status=(
                f"checkpointed {len(forced)} versioned table(s)"
                if forced
                else "checkpoint noop (no WAL)"
            ),
        )

    # PREPARE/EXECUTE/DEALLOCATE moved to sqlfront._run_prepared (r12):
    # one registry, named-$param support, live-pinned error spellings —
    # this module's earlier token-level substitution is retired.

    if m := _CREATE_TABLE_RE.match(duckdb_sql):
        replace, if_not_exists, table, defs = m.groups()
        cols = _parse_column_defs(defs, table)
        from quackspark import versioned as _versioned

        if _versioned.enabled(spark) or _versioned.is_versioned(spark, table):
            schema_sql = ", ".join(f"`{n}` {t}" for n, t, _ in cols)
            created = _versioned.create(
                spark,
                table,
                spark.createDataFrame([], schema_sql),
                replace=bool(replace),
                if_not_exists=bool(if_not_exists),
            )
            defaults = {n.lower(): d for n, _, d in cols if d is not None}
            if defaults:
                TABLE_DEFAULTS[table.lower()] = defaults
            return _status(
                spark,
                table=table,
                status="created (versioned)" if created else "exists",
            )
        if replace:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        # clear an orphaned warehouse dir from a crashed prior session
        # (fresh metastore per session → DROP above may be a no-op)
        if not spark.catalog.tableExists(table):
            import shutil
            from urllib.parse import urlparse

            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
            if wh:
                shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
        ine = "IF NOT EXISTS " if if_not_exists else ""
        col_sql = ", ".join(f"`{n}` {t}" for n, t, _ in cols)
        spark.sql(f"CREATE TABLE {ine}{table} ({col_sql}) USING parquet")
        defaults = {n.lower(): d for n, _, d in cols if d is not None}
        if defaults:
            TABLE_DEFAULTS[table.lower()] = defaults
        return _status(spark, table=table, status="created")

    if m := _CTAS_RE.match(duckdb_sql):
        replace, if_not_exists, table, body = m.groups()
        from quackspark import versioned as _versioned

        if _versioned.enabled(spark) or _versioned.is_versioned(spark, table):
            df = spark.sql(transpile(body, spark))
            created = _versioned.create(
                spark,
                table,
                df,
                replace=bool(replace),
                if_not_exists=bool(if_not_exists),
            )
            return _status(
                spark,
                table=table,
                status="created (versioned)" if created else "exists",
            )
        # plain CTAS: fall through to the generic transpile → spark.sql
        # path (managed parquet CREATE TABLE AS)

    if m := _CREATE_VIEW_RE.match(duckdb_sql):
        replace, if_not_exists, view, body = m.groups()
        exists = any(
            v.name.lower() == view.lower() for v in spark.catalog.listTables()
        )
        if if_not_exists and exists:
            return _status(spark, view=view, status="exists")
        if not replace and not if_not_exists and exists:
            # DuckDB errors on plain CREATE VIEW over an existing name
            raise ValueError(
                f'Catalog Error: View with name "{view}" already exists!'
            )
        body_sql = transpile(body, spark)
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {view} AS {body_sql}")
        return _status(spark, view=view, status="created")

    if m := _TRUNCATE_RE.match(duckdb_sql):
        from quackspark import versioned as _versioned

        if _versioned.is_versioned(spark, m.group(1)):
            _versioned.truncate(spark, m.group(1))
        else:
            spark.sql(f"TRUNCATE TABLE {m.group(1)}")
        return _status(spark, table=m.group(1), status="truncated")

    if m := _DROP_CASCADE_RE.match(duckdb_sql):
        # a versioned table must drop through its commit-log root, or the
        # on-disk log resurrects it at the next reference
        from quackspark import versioned as _versioned

        if tm := re.match(
            r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)",
            m.group(1),
            re.I,
        ):
            drop_table_metadata(tm.group(1))
            if _versioned.is_versioned(spark, tm.group(1)):
                _versioned.drop(spark, tm.group(1))
                return _status(spark, table=tm.group(1), status="dropped")
        return spark.sql(m.group(1))

    if m := _CREATE_INDEX_RE.match(duckdb_sql):
        # normalized serialization like the reference's catalog
        # (CREATE [UNIQUE] INDEX name ON table(cols); — no space before
        # the paren, keywords upper); expression indexes keep their text
        tail = re.sub(r"^" + re.escape(m.group(4)) + r"\s*", "", m.group(3))
        INDEXES[m.group(2).lower()] = {
            "table": m.group(4).lower(),
            "unique": bool(m.group(1)),
            "on": m.group(3),
            "sql": (f"CREATE {'UNIQUE ' if m.group(1) else ''}INDEX "
                    f"{m.group(2)} ON {m.group(4)}{tail};"),
        }
        return _status(spark, index=m.group(2), status="noop (no ART index on Spark)")

    if m := _DROP_INDEX_RE.match(duckdb_sql):
        INDEXES.pop(m.group(1).lower(), None)
        return _status(spark, index=m.group(1), status="dropped")

    if m := _COMMENT_RE.match(duckdb_sql):
        kind, name, text = m.groups()
        COMMENTS[f"{kind.lower()}:{name.lower()}"] = text.strip("'")
        return _status(spark, object=name, status="comment recorded")

    if m := _ALTER_RE.match(duckdb_sql):
        return _run_alter(spark, m.group(1), m.group(2))

    if m := _COPY_FROM_RE.match(duckdb_sql):
        return _run_copy_from(spark, *m.groups())

    if (m := _INSERT_CONFLICT_RE.match(duckdb_sql)) and (
        m.group(1) or m.group(5)
    ):
        return _run_insert_conflict(spark, *m.groups())

    if m := _INSERT_BY_NAME_RE.match(duckdb_sql):
        return _run_insert_by_name(spark, *m.groups())

    if m := _INSERT_COLS_RE.match(duckdb_sql):
        return _run_insert_with_columns(spark, *m.groups())

    if m := _INSERT_PLAIN_RE.match(duckdb_sql):
        return _run_insert_plain(spark, m.group(1), m.group(2))

    if m := re.match(
        r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)", duckdb_sql, re.I
    ):
        # refuse to drop a table other tables still reference (DuckDB FK
        # dependency error), else forget its metadata and fall through
        # (return None) so the normal paths execute the actual drop
        dropped = m.group(1).lower()
        children = [
            child
            for child, fks in TABLE_FKEYS.items()
            if child != dropped and any(fk["parent"] == dropped for fk in fks)
        ]
        if children:
            raise ConstraintError(
                f"Constraint Error: Could not drop the table because this "
                f"table is main key table of the table {children[0]}"
            )
        drop_table_metadata(dropped)
        from quackspark import versioned as _versioned

        if _versioned.is_versioned(spark, dropped):
            _versioned.drop(spark, dropped)
            return _status(spark, table=dropped, status="dropped")

    return None


_INSERT_PLAIN_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s*"
    r"((?:VALUES|SELECT|FROM|TABLE)\b.*?|\(\s*(?:SELECT|FROM)\b.*?\))\s*;?\s*$",
    re.I | re.S,
)
_INSERT_BY_NAME_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s+BY\s+NAME\s+"
    r"((?:SELECT|FROM|VALUES|TABLE)\b.*?)\s*;?\s*$",
    re.I | re.S,
)


def _run_insert_by_name(spark: SparkSession, table: str, source: str) -> DataFrame:
    """``INSERT INTO t BY NAME SELECT …`` (DuckDB's by-name insert,
    insert grammar duckdb-libpg_query.cpp): the source's column NAMES
    pick the target columns; unnamed target columns fill with DEFAULT or
    NULL; a source column the table lacks is a binder error. Lowers onto
    the column-list insert (same DEFAULT binding, constraint checks, and
    versioned-table chokepoint)."""
    from quackspark.sqlfront import transpile

    src_sql = transpile(source, spark)
    if re.match(r"^\s*FROM\b", src_sql, re.I):
        src_sql = f"SELECT * {src_sql}"
    src_cols = [c.lower() for c in spark.sql(src_sql).columns]
    table_cols = {f.name.lower() for f in spark.table(table).schema.fields}
    unknown = [c for c in src_cols if c not in table_cols]
    if unknown:
        raise ValueError(
            f'Binder Error: Column "{unknown[0]}" of the INSERT BY NAME '
            f"source does not exist in table {table}"
        )
    return _run_insert_with_columns(spark, table, ", ".join(src_cols), source)


def _run_insert_plain(
    spark: SparkSession, table: str, source: str
) -> DataFrame | None:
    """Full-column INSERT on a table WITH enforced constraints (or a
    versioned table, whose appends must go through the commit log): bind
    the source, validate (see _enforce_insert), then append. Plain
    unconstrained tables return None and keep the zero-overhead
    spark.sql path."""
    from quackspark import versioned as _versioned

    if not has_enforced_constraints(table) and not _versioned.is_versioned(
        spark, table
    ):
        return None
    from quackspark.sqlfront import transpile

    s = source.strip()
    if s.startswith("(") and s.endswith(")"):
        source = s[1:-1]  # parenthesized SELECT source
    schema = spark.table(table).schema
    src_sql = transpile(source, spark)
    if re.match(r"^\s*VALUES\b", src_sql, re.I):
        names = ", ".join(f.name for f in schema.fields)
        src_sql = f"SELECT * FROM ({src_sql}) AS __v({names})"
    elif re.match(r"^\s*FROM\b", src_sql, re.I):
        src_sql = f"SELECT * {src_sql}"
    src = spark.sql(src_sql).toDF(*[f.name for f in schema.fields])
    src = src.selectExpr(
        *[
            f"CAST(`{f.name}` AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in schema.fields
        ]
    )
    _enforce_insert(spark, table, src)
    if not _versioned.intercept_append(spark, table, src):
        src.write.insertInto(table, overwrite=False)
    return _status(spark, table=table, status="inserted")


def _swap(spark: SparkSession, table: str, df: DataFrame) -> None:
    from quackspark.sqlfront import _swap_in

    _swap_in(spark, table, df)


def _run_alter(spark: SparkSession, table: str, action: str) -> DataFrame:
    from quackspark.sqlfront import UnsupportedSQL, transpile

    if m := re.match(r"^RENAME\s+TO\s+([A-Za-z_]\w*)$", action, re.I):
        from quackspark import versioned as _versioned

        if _versioned.is_versioned(spark, table):
            _versioned.rename(spark, table, m.group(1))
        else:
            spark.sql(f"ALTER TABLE {table} RENAME TO {m.group(1)}")
        for reg in (
            TABLE_DEFAULTS,
            TABLE_CONSTRAINTS,
            TABLE_PKEYS,
            TABLE_NOTNULL,
            TABLE_CHECKS,
            TABLE_UNIQUES,
        ):
            if table.lower() in reg:
                reg[m.group(1).lower()] = reg.pop(table.lower())
        return _status(spark, table=m.group(1), status="renamed")

    if m := re.match(
        r"^RENAME\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)$",
        action,
        re.I,
    ):
        old, new = m.groups()
        fields = spark.table(table).schema.fieldNames()
        if old.lower() not in [f.lower() for f in fields]:
            raise UnsupportedSQL(f"RENAME COLUMN: no column {old} in {table}")
        items = [
            f"`{f}` AS `{new}`" if f.lower() == old.lower() else f"`{f}`"
            for f in fields
        ]
        _swap(spark, table, spark.table(table).selectExpr(*items))
        d = TABLE_DEFAULTS.get(table.lower(), {})
        if old.lower() in d:
            d[new.lower()] = d.pop(old.lower())
        return _status(spark, table=table, status=f"renamed {old} -> {new}")

    if m := re.match(
        r"^ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+(.+?)"
        r"(?:\s+DEFAULT\s+(.+))?$",
        action,
        re.I | re.S,
    ):
        from quackspark.sqlfront import _tokens

        col, type_sql, default = m.groups()
        fields = [f.lower() for f in spark.table(table).schema.fieldNames()]
        if col.lower() in fields:
            if re.search(r"IF\s+NOT\s+EXISTS", action, re.I):
                return _status(spark, table=table, status="column exists")
            raise UnsupportedSQL(f"ADD COLUMN: {col} already in {table}")
        spark_t = _translate_type(_tokens(type_sql))
        fill = transpile(default, spark) if default else "NULL"
        _swap(
            spark,
            table,
            spark.table(table).selectExpr(
                "*", f"CAST(({fill}) AS {spark_t}) AS `{col}`"
            ),
        )
        if default:
            # the DEFAULT also applies to FUTURE partial-column inserts,
            # not just the backfill above (found by tools/fuzz_ddl.py:
            # DuckDB fills the added column on INSERT (id, v) VALUES …,
            # we filled NULL)
            TABLE_DEFAULTS.setdefault(table.lower(), {})[col.lower()] = default
        return _status(spark, table=table, status=f"added {col}")

    if m := re.match(
        r"^DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)$", action, re.I
    ):
        col = m.group(1)
        fields = spark.table(table).schema.fieldNames()
        keep = [f"`{f}`" for f in fields if f.lower() != col.lower()]
        if len(keep) == len(fields):
            if re.search(r"IF\s+EXISTS", action, re.I):
                return _status(spark, table=table, status="column absent")
            raise UnsupportedSQL(f"DROP COLUMN: no column {col} in {table}")
        if any(
            col.lower() in ks for ks in TABLE_UNIQUES.get(table.lower(), [])
        ):
            # DuckDB refuses to drop a column an index/key depends on
            raise ConstraintError(
                f"Constraint Error: Cannot drop column {col}: it is part "
                f"of a PRIMARY KEY or UNIQUE constraint on {table}"
            )
        _swap(spark, table, spark.table(table).selectExpr(*keep))
        TABLE_DEFAULTS.get(table.lower(), {}).pop(col.lower(), None)
        # a dropped column takes its NOT NULL with it; CHECKs referencing
        # it fail to bind on the next DML, matching a missing-column error
        nn = TABLE_NOTNULL.get(table.lower())
        if nn and col.lower() in nn:
            nn.remove(col.lower())
        return _status(spark, table=table, status=f"dropped {col}")

    if m := re.match(
        r"^ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)"
        r"(?:\s+USING\s+(.+))?$",
        action,
        re.I | re.S,
    ):
        from quackspark.sqlfront import _tokens

        col, type_sql, using = m.groups()
        spark_t = _translate_type(_tokens(type_sql))
        fields = spark.table(table).schema.fieldNames()
        expr = transpile(using, spark) if using else f"`{col}`"
        items = [
            f"CAST(({expr}) AS {spark_t}) AS `{f}`"
            if f.lower() == col.lower()
            else f"`{f}`"
            for f in fields
        ]
        _swap(spark, table, spark.table(table).selectExpr(*items))
        return _status(spark, table=table, status=f"retyped {col}")

    if m := re.match(
        r"^ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+SET\s+DEFAULT\s+(.+)$",
        action,
        re.I | re.S,
    ):
        TABLE_DEFAULTS.setdefault(table.lower(), {})[m.group(1).lower()] = m.group(2)
        return _status(spark, table=table, status="default set")

    if m := re.match(
        r"^ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+DROP\s+DEFAULT$", action, re.I
    ):
        TABLE_DEFAULTS.get(table.lower(), {}).pop(m.group(1).lower(), None)
        return _status(spark, table=table, status="default dropped")

    raise UnsupportedSQL(f"ALTER TABLE action: {action[:60]}")


_COPY_FROM_RE = re.compile(
    r"^\s*COPY\s+([A-Za-z_]\w*)\s+FROM\s+'([^']+)'\s*(?:\((.*)\))?\s*;?\s*$",
    re.I | re.S,
)
_INSERT_CONFLICT_RE = re.compile(
    r"^\s*INSERT\s+(?:(OR\s+IGNORE|OR\s+REPLACE)\s+)?INTO\s+([A-Za-z_]\w*)\s+"
    r"(.*?)(?:\s+ON\s+CONFLICT(?:\s*\(([^)]*)\))?\s+DO\s+(NOTHING|UPDATE\b.*?))?"
    r"\s*;?\s*$",
    re.I | re.S,
)


def _run_copy_from(
    spark: SparkSession, table: str, path: str, opts: str | None
) -> DataFrame:
    """``COPY t FROM 'file'`` (reference CopyStatement, duckdb.hpp:11969):
    append rows read with the TARGET TABLE's schema — DuckDB's binding.
    Accepts both single files and Spark-written part-file directories."""
    from quackspark.sqlfront import UnsupportedSQL, _parse_copy_options

    o = _parse_copy_options(opts)
    fmt = o.get("format")
    if fmt is None:
        low = path.lower()
        fmt = ("parquet" if low.endswith((".parquet", ".parq"))
               else "json" if low.endswith((".json", ".ndjson", ".jsonl"))
               else "csv")
    schema = spark.table(table).schema
    reader = spark.read
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "json":
        df = reader.schema(schema).json(path)
    elif fmt == "csv":
        df = (reader.schema(schema)
              .option("header", o.get("header", True))
              .option("sep", o.get("delim", ","))
              .csv(path))
    else:
        raise UnsupportedSQL(f"COPY FROM format {fmt!r}")
    df = df.select(*[f"`{f.name}`" for f in schema.fields])
    if has_enforced_constraints(table):
        _enforce_insert(spark, table, df)
    from quackspark import versioned as _versioned

    if not _versioned.intercept_append(spark, table, df):
        df.write.insertInto(table, overwrite=False)
    return _status(spark, table=table, status="copied")


def has_enforced_constraints(table: str) -> bool:
    key = table.lower()
    return bool(
        TABLE_NOTNULL.get(key)
        or TABLE_CHECKS.get(key)
        or TABLE_UNIQUES.get(key)
        or TABLE_FKEYS.get(key)
        or table_is_fk_parent(key)
    )


def _dup_key_msg(keys: list[str], row, kind: str) -> str:
    kv = ", ".join(f"{k}: {row[k]}" for k in keys)
    return f'Constraint Error: Duplicate key "{kv}" violates {kind} constraint'


def _unique_kind(table: str, i: int, keys: list[str]) -> str:
    pk = TABLE_PKEYS.get(table.lower())
    return "primary key" if i == 0 and pk == keys else "unique"


def _enforce_insert(
    spark: SparkSession,
    table: str,
    src_df: DataFrame,
    *,
    uniques: bool = True,
    against_existing: bool = True,
) -> None:
    """Validate proposed rows BEFORE they land, failing the statement
    atomically like the reference's ConstraintException.

    Cost model (the 100 TB posture): the reference pays a per-row ART
    probe (duckdb-internal.hpp index machinery); we pay per-STATEMENT
    distributed jobs — ONE aggregate over the proposed rows for every
    NOT NULL + CHECK at once, then per key set one duplicate probe whose
    result is a single offending key (bounded metadata, never row data).
    NULL key parts never conflict (DuckDB unique semantics); CHECK
    passes on NULL (SQL three-valued logic)."""
    from pyspark.sql import functions as F

    from quackspark.sqlfront import transpile

    key = table.lower()
    cols = {c.lower() for c in src_df.columns}
    aggs, labels = [], []
    for c in TABLE_NOTNULL.get(key, []):
        if c in cols:
            aggs.append(F.max(F.col(c).isNull()).alias(f"v{len(labels)}"))
            labels.append(("notnull", c))
    for expr in TABLE_CHECKS.get(key, []):
        sexpr = transpile(expr, spark)
        aggs.append(
            F.max(~F.coalesce(F.expr(sexpr), F.lit(True))).alias(f"v{len(labels)}")
        )
        labels.append(("check", expr))
    if aggs:
        row = src_df.agg(*aggs).first()
        for (kind, what), bad in zip(labels, row):
            if bad:
                if kind == "notnull":
                    raise ConstraintError(
                        f"Constraint Error: NOT NULL constraint failed: "
                        f"{table}.{what}"
                    )
                raise ConstraintError(
                    f"Constraint Error: CHECK constraint failed on table "
                    f"{table} with expression CHECK(({what}))"
                )
    for fk in TABLE_FKEYS.get(key, []):
        fcols = fk["cols"]
        if not set(fcols) <= cols:
            continue
        pcols = fk["pcols"] or TABLE_PKEYS.get(fk["parent"], [])
        if not pcols or len(pcols) != len(fcols):
            continue  # unresolvable target → recorded-only
        pk_df = spark.table(fk["parent"]).select(
            *[F.col(p).alias(c) for p, c in zip(pcols, fcols)]
        )
        missing = (
            src_df.select(*fcols)
            .na.drop("any")
            .distinct()
            .join(pk_df, on=list(fcols), how="left_anti")
            .limit(1)
            .collect()
        )
        if missing:
            kv = ", ".join(f"{c}: {missing[0][c]}" for c in fcols)
            raise ConstraintError(
                f'Constraint Error: Violates foreign key constraint because '
                f'key "{kv}" does not exist in the referenced table'
            )
    if not uniques:
        return
    for i, keys in enumerate(TABLE_UNIQUES.get(key, [])):
        if not set(keys) <= cols:
            continue
        kind = _unique_kind(table, i, keys)
        proposed = src_df.select(*keys).na.drop("any")
        dup = (
            proposed.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ConstraintError(_dup_key_msg(keys, dup[0], kind))
        if against_existing:
            hit = (
                proposed.join(
                    spark.table(table).select(*keys), on=list(keys), how="left_semi"
                )
                .limit(1)
                .collect()
            )
            if hit:
                raise ConstraintError(_dup_key_msg(keys, hit[0], kind))


def table_is_fk_parent(table: str) -> bool:
    return any(
        fk["parent"] == table.lower()
        for fks in TABLE_FKEYS.values()
        for fk in fks
    )


def enforce_parent_keys(
    spark: SparkSession, table: str, post_image: DataFrame
) -> None:
    """DELETE / key-UPDATE on a referenced parent: every child FK value
    must still resolve against the parent's POST-image — a key removed
    while still referenced fails the statement (reference FK semantics:
    the delete side of the ART FK machinery)."""
    from pyspark.sql import functions as F

    for child, fks in TABLE_FKEYS.items():
        for fk in fks:
            if fk["parent"] != table.lower():
                continue
            pcols = fk["pcols"] or TABLE_PKEYS.get(table.lower(), [])
            if not pcols or len(pcols) != len(fk["cols"]):
                continue
            child_df = (
                post_image if child == table.lower() else spark.table(child)
            )
            child_vals = (
                child_df.select(
                    *[
                        F.col(c).alias(p)
                        for c, p in zip(fk["cols"], pcols)
                    ]
                )
                .na.drop("any")
                .distinct()
            )
            dangling = (
                child_vals.join(
                    post_image.select(*pcols), on=list(pcols), how="left_anti"
                )
                .limit(1)
                .collect()
            )
            if dangling:
                kv = ", ".join(f"{p}: {dangling[0][p]}" for p in pcols)
                raise ConstraintError(
                    f'Constraint Error: Violates foreign key constraint '
                    f'because key "{kv}" is still referenced by a foreign '
                    f'key in table {child}'
                )


def enforce_update(
    spark: SparkSession,
    table: str,
    updated_rows: DataFrame,
    post_image: DataFrame,
    assigned_cols: set[str],
) -> None:
    """UPDATE-side enforcement: NOT NULL + CHECK + child-side FK evaluate
    on the post-image of the rows the statement modifies; key sets that
    intersect the assigned columns re-verify uniqueness over the table's
    full post-image (one count-aggregate per affected key set); assigning
    a column some CHILD references re-verifies the children against the
    parent post-image."""
    from pyspark.sql import functions as F

    _enforce_insert(
        spark, table, updated_rows, uniques=False, against_existing=False
    )
    for i, keys in enumerate(TABLE_UNIQUES.get(table.lower(), [])):
        if not assigned_cols & set(keys):
            continue
        dup = (
            post_image.select(*keys)
            .na.drop("any")
            .groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ConstraintError(
                _dup_key_msg(keys, dup[0], _unique_kind(table, i, keys))
            )
    if table_is_fk_parent(table):
        referenced = {
            p
            for fks in TABLE_FKEYS.values()
            for fk in fks
            if fk["parent"] == table.lower()
            for p in (fk["pcols"] or TABLE_PKEYS.get(table.lower(), []))
        }
        if assigned_cols & referenced:
            enforce_parent_keys(spark, table, post_image)


def _conflict_keys(spark: SparkSession, table: str, target: str | None):
    from quackspark.sqlfront import UnsupportedSQL

    if target:
        return [c.strip().strip('"').lower() for c in target.split(",")]
    keys = TABLE_PKEYS.get(table.lower())
    if not keys:
        raise UnsupportedSQL(
            f"INSERT conflict clause on {table}: no PRIMARY KEY recorded "
            f"and no explicit conflict target"
        )
    return keys


def _run_insert_conflict(
    spark: SparkSession,
    or_action: str | None,
    table: str,
    source: str,
    conflict_target: str | None,
    do_action: str | None,
) -> DataFrame | None:
    """INSERT OR IGNORE / OR REPLACE / ON CONFLICT DO NOTHING / ON
    CONFLICT DO UPDATE (reference OnConflictInfo; upsert grammar
    duckdb-libpg_query.cpp OnConflictClause). IGNORE/NOTHING = anti-join
    the new rows against the existing key set; REPLACE = delete matching
    keys, then append; DO UPDATE = MERGE over the copy-on-write swap —
    matched rows get the SET expressions (``excluded.col`` = proposed
    row, bare ``col`` = existing row, optional DO UPDATE WHERE gates the
    update per-row), unmatched new rows insert as-is."""
    from quackspark.sqlfront import UnsupportedSQL, transpile

    if or_action is None and do_action is None:
        return None  # plain INSERT — let the generic paths handle it
    action = (or_action or "").upper().replace(" ", "_") or (
        "OR_IGNORE" if do_action.upper() == "NOTHING" else "DO_UPDATE"
    )
    if source.lstrip().startswith("("):
        raise UnsupportedSQL(
            "INSERT conflict clause with an explicit column list — "
            "supply full rows"
        )
    keys = _conflict_keys(spark, table, conflict_target)
    schema = spark.table(table).schema
    src_sql = transpile(source, spark)
    if re.match(r"^\s*VALUES\b", src_sql, re.I):
        src_sql = f"SELECT * FROM ({src_sql}) AS __v({', '.join(f.name for f in schema.fields)})"
    new_rows = spark.sql(src_sql).toDF(*[f.name for f in schema.fields])
    # NOT NULL / CHECK apply to the proposed rows regardless of conflict
    # action; the key-duplicate handling below IS the unique enforcement
    # for the conflict target (other unique sets are checked too, minus
    # rows the IGNORE path drops — kept simple: conflict actions own keys)
    _enforce_insert(spark, table, new_rows, uniques=False)
    existing = spark.table(table)
    # EVERY conflict action rejects a batch that repeats a conflict key
    # within itself — including OR IGNORE / DO NOTHING (probed against
    # the oracle engine; found by tools/fuzz_ddl.py state diffing).
    # Check first instead of silently keeping an arbitrary duplicate.
    from pyspark.sql import functions as F

    from quackspark.sqlfront import _swap_in

    dup = (
        new_rows.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "Constraint Error: duplicate conflict key within the inserted "
            "batch — DuckDB rejects a command whose proposed rows repeat a "
            "constrained value (for DO UPDATE: 'can not update the same row "
            "twice in the same command')"
        )
    if action in ("OR_IGNORE", "OR_NOTHING"):
        fresh = new_rows.join(
            existing.select(*keys).distinct(), on=keys, how="left_anti"
        )
        from quackspark import versioned as _versioned

        if not _versioned.intercept_append(spark, table, fresh):
            fresh.write.insertInto(table, overwrite=False)
        return _status(spark, table=table, status="inserted (conflicts ignored)")
    if action == "DO_UPDATE":
        final = _merge_do_update(
            spark, existing, new_rows, keys, schema, do_action
        )
        # the SET expressions can write values the proposed rows never
        # carried (e.g. x = excluded.x + x) — NOT NULL/CHECK re-validate
        # on the merged post-image, like the engine's updated-row check
        _enforce_insert(spark, table, final, uniques=False)
        _swap_in(spark, table, final)
        return _status(spark, table=table, status="upserted (conflicts updated)")
    kept = existing.join(new_rows.select(*keys).distinct(), on=keys, how="left_anti")
    _swap_in(spark, table, kept.unionByName(new_rows))
    return _status(spark, table=table, status="inserted (conflicts replaced)")


def _split_top_commas(s: str) -> list[str]:
    """Split on commas outside parens and string/ident quotes."""
    out: list[str] = []
    cur: list[str] = []
    depth, q = 0, None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in ("'", '"'):
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _rewrite_excluded(expr: str) -> str:
    """``excluded.col`` / ``excluded."col"`` → the renamed proposed-row
    column ``__exc_col`` (bare names keep resolving to the existing row
    because the proposed side is joined under the __exc_ prefix)."""
    return re.sub(
        r'(?i)\bexcluded\s*\.\s*("([^"]+)"|[A-Za-z_]\w*)',
        lambda m: "__exc_" + (m.group(2) or m.group(1)).lower(),
        expr,
    )


def _merge_do_update(
    spark: SparkSession,
    existing: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    schema,
    do_action: str,
) -> DataFrame:
    """MERGE semantics for ON CONFLICT DO UPDATE, as one lazy plan:
    existing rows without a proposed match pass through; matched rows get
    the SET expressions (gated by DO UPDATE WHERE if present — a FALSE/
    NULL gate keeps the existing row, and the proposed row is dropped per
    DuckDB); proposed rows without a match insert unchanged. One
    anti-join + one inner join on the conflict keys, both shuffle-free
    when the table is bucketed on its PK; no driver materialization."""
    from pyspark.sql import functions as F

    from quackspark.sqlfront import UnsupportedSQL, transpile

    m = re.match(
        r"^UPDATE\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
        do_action.strip(),
        re.I | re.S,
    )
    if not m:
        raise UnsupportedSQL(f"ON CONFLICT DO {do_action!r}: cannot parse")
    set_part, where_part = m.group(1), m.group(2)
    assigns: dict[str, str] = {}
    fields = {f.name.lower(): f for f in schema.fields}
    for a in _split_top_commas(set_part):
        col, eq, val = a.partition("=")
        col = col.strip().strip('"').lower()
        if not eq or col not in fields:
            raise UnsupportedSQL(f"DO UPDATE SET assignment {a!r}")
        assigns[col] = transpile(_rewrite_excluded(val.strip()), spark)
    wcond = (
        transpile(_rewrite_excluded(where_part.strip()), spark)
        if where_part
        else "true"
    )
    exc = new_rows.select(
        *[F.col(f.name).alias(f"__exc_{f.name.lower()}") for f in schema.fields]
    )
    # Plain equality, NOT null-safe `<=>`: NULL keys never conflict in
    # DuckDB's unique semantics (consistent with the `=` anti-joins below
    # and the OR IGNORE/OR REPLACE paths) — a `<=>` match here would emit
    # a NULL-key row twice: once "updated" and once "untouched".
    key_eq = " AND ".join(f"`{k}` = `__exc_{k}`" for k in keys)
    matched = existing.join(exc, F.expr(key_eq), "inner")
    items = []
    for f in schema.fields:
        ln = f.name.lower()
        if ln in assigns:
            t = f.dataType.simpleString()
            items.append(
                f"CASE WHEN ({wcond}) THEN CAST(({assigns[ln]}) AS {t}) "
                f"ELSE `{f.name}` END AS `{f.name}`"
            )
        else:
            items.append(f"`{f.name}`")
    updated = matched.selectExpr(*items)
    untouched = existing.join(
        exc.select(*[f"__exc_{k}" for k in keys])
        .toDF(*keys)
        .distinct(),
        on=keys,
        how="left_anti",
    )
    fresh = new_rows.join(
        existing.select(*keys).distinct(), on=keys, how="left_anti"
    )
    return untouched.unionByName(updated).unionByName(fresh)


def _run_insert_with_columns(
    spark: SparkSession, table: str, col_list: str, source: str
) -> DataFrame:
    """Partial-column INSERT: missing columns fill with their recorded
    DEFAULT (CREATE TABLE defs) or NULL — DuckDB's insert binding."""
    from quackspark.sqlfront import transpile

    listed = [c.strip().strip('"').lower() for c in col_list.split(",")]
    schema = spark.table(table).schema
    defaults = TABLE_DEFAULTS.get(table.lower(), {})
    src_sql = transpile(source, spark)
    if re.match(r"^\s*FROM\b", src_sql, re.I):
        src_sql = f"SELECT * {src_sql}"
    alias_cols = ", ".join(f"`{c}`" for c in listed)
    items = []
    for f in schema.fields:
        t = f.dataType.simpleString()
        if f.name.lower() in listed:
            items.append(f"CAST(`{f.name.lower()}` AS {t}) AS `{f.name}`")
        elif f.name.lower() in defaults:
            d = transpile(defaults[f.name.lower()], spark)
            items.append(f"CAST(({d}) AS {t}) AS `{f.name}`")
        else:
            items.append(f"CAST(NULL AS {t}) AS `{f.name}`")
    from quackspark import versioned as _versioned

    if has_enforced_constraints(table) or _versioned.is_versioned(spark, table):
        df = spark.sql(
            f"SELECT {', '.join(items)} FROM ({src_sql}) AS __src({alias_cols})"
        )
        _enforce_insert(spark, table, df)
        if not _versioned.intercept_append(spark, table, df):
            df.write.insertInto(table, overwrite=False)
    else:
        spark.sql(
            f"INSERT INTO {table} SELECT {', '.join(items)} "
            f"FROM ({src_sql}) AS __src({alias_cols})"
        )
    return _status(spark, table=table, status="inserted")
