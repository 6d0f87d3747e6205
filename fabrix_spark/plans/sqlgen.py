"""Select-ADT -> SQL string renderer (whole-query pushdown + oracle).

The reference compiles its ADT to dialect SQL via sea-query
(fabrix-sql/src/builder/query_dml.rs:31-86, golden strings at
query_dml.rs:106-269). We render ANSI SQL directly — used for
(a) whole-query JDBC pushdown (``spark.read.jdbc(query=...)``) and
(b) DuckDB-oracle parity in the correctness gate: the same ADT renders
to the SQL the oracle runs, so Spark DSL and SQL semantics are pinned
to each other.

Also renders the DML/DDL statements of §2.4/§2.5 (INSERT / UPDATE /
DELETE / CREATE / ALTER / DROP — mutation_dml.rs, mutation_ddl.rs).

Dialect handling: every renderer threads an explicit quoter function
down the call tree — no module-level state, so concurrent renders for
different dialects can never leak quoting into each other.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from typing import Any, Callable, Sequence

from .adt import (
    AND,
    Col,
    Cond,
    Exists,
    Expression,
    FnCol,
    Nest,
    NOT,
    OR,
    Delete,
    Select,
    WinCol,
)

__all__ = [
    "render_select",
    "render_delete",
    "render_insert",
    "render_update_by_key",
    "render_value",
    "render_filter",
    "render_alter_add_column",
    "render_alter_drop_column",
    "render_alter_modify_column",
    "render_create_index",
    "render_drop_index",
    "render_create_foreign_key",
    "render_drop_foreign_key",
    "render_primary_key_query",
    "render_constraints_query",
    "render_indexes_query",
]

Quoter = Callable[[str], str]

# dialect -> identifier quote char (the reference's statement! macro
# switches sea-query backends per dialect the same way; MySQL quotes
# with backticks, Postgres/SQLite with double quotes)
_QUOTE = {"ansi": '"', "postgres": '"', "sqlite": '"', "mysql": "`", "duckdb": '"', "derby": '"'}


def _render_limit_offset(limit: "int | None", offset: "int | None", dialect: str) -> str:
    """Row-limit clause per dialect. Derby (and the actual SQL
    standard) has no LIMIT keyword — it takes ``OFFSET n ROWS FETCH
    NEXT m ROWS ONLY``, in that order; everything else takes
    ``LIMIT m OFFSET n``. Centralized so every rendering site (plain
    Select, QUALIFY wrap, Compound) agrees."""
    s = ""
    if dialect == "derby":
        if offset is not None:
            s += f" OFFSET {offset} ROWS"
        if limit is not None:
            s += f" FETCH NEXT {limit} ROWS ONLY"
        return s
    if limit is not None:
        s += f" LIMIT {limit}"
    if offset is not None:
        s += f" OFFSET {offset}"
    return s


def _quoter(dialect: str) -> Quoter:
    q = _QUOTE[dialect]

    def quote(name: str) -> str:
        if dialect == "ansi" and name.replace("_", "").isalnum() and not name[0].isdigit():
            return name
        return q + name.replace(q, q + q) + q

    return quote


def render_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        # plain numeric literal — exact lexical value, no quotes (a
        # DECIMAL index key must render in the upsert probe's IN list)
        return str(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"cannot render literal {v!r}")


def _render_colref(name: str, tbl: str | None, quote: Quoter) -> str:
    return f"{quote(tbl)}.{quote(name)}" if tbl else quote(name)


def _frame_bound(b, side: str) -> str:
    if b == "unbounded_preceding":
        return "UNBOUNDED PRECEDING"
    if b == "unbounded_following":
        return "UNBOUNDED FOLLOWING"
    if b == "current":
        return "CURRENT ROW"
    n = int(b)
    if n == 0:
        return "CURRENT ROW"
    return f"{abs(n)} {'PRECEDING' if n < 0 else 'FOLLOWING'}"


def _render_wincol(c: WinCol, quote: Quoter, with_alias: bool = True) -> str:
    """WinCol -> ``fn(args) OVER (PARTITION BY .. ORDER BY .. frame)``
    (r8; the Spark compiler's _win_expr is the DSL twin)."""
    inner = _render_column(c.col, quote, with_alias=False) if c.col is not None else ""
    fn = c.fn
    if fn == "ntile":
        call = f"ntile({int(c.args[0])})"
    elif fn in ("lag", "lead"):
        offset = int(c.args[0]) if c.args else 1
        call = f"{fn}({inner}, {offset}"
        if len(c.args) > 1:
            call += f", {render_value(c.args[1])}"
        call += ")"
    else:
        call = f"{fn}({inner})"
    over: list[str] = []
    if c.partition_by:
        over.append("PARTITION BY " + ", ".join(quote(p) for p in c.partition_by))
    if c.order:
        over.append(
            "ORDER BY "
            + ", ".join(f"{quote(o.col)} {'DESC' if o.desc else 'ASC'}" for o in c.order)
        )
    if c.frame is not None:
        mode, lo, hi = c.frame
        over.append(
            f"{mode.upper()} BETWEEN {_frame_bound(lo, 'lo')} AND {_frame_bound(hi, 'hi')}"
        )
    s = f"{call} OVER ({' '.join(over)})"
    if with_alias:
        s += f" AS {quote(c.display_name())}"
    return s


def _render_column(c: Col | FnCol, quote: Quoter, with_alias: bool = True) -> str:
    if isinstance(c, WinCol):
        return _render_wincol(c, quote, with_alias)
    if isinstance(c, Col):
        s = _render_colref(c.name, c.tbl, quote)
        if with_alias and c.alias:
            s += f" AS {quote(c.alias)}"
        return s
    inner = _render_column(c.col, quote, with_alias=False)
    fn = c.fn
    if fn in ("max", "min", "sum", "avg", "count", "abs", "lower", "upper"):
        s = f"{fn}({inner})"
    elif fn == "count_distinct":
        s = f"count(DISTINCT {inner})"
    elif fn == "char_length":
        s = f"length({inner})"
    elif fn == "ifnull":
        s = f"coalesce({inner}, {render_value(c.args[0])})"
    elif fn == "coalesce":
        rest = ", ".join(render_value(a) for a in c.args)
        s = f"coalesce({inner}, {rest})"
    elif fn == "cast":
        s = f"CAST({inner} AS {c.args[0]})"
    elif fn == "round":
        s = f"round({inner}, {int(c.args[0]) if c.args else 0})"
    elif fn == "trim":
        s = f"trim({inner})"
    elif fn == "substr":
        if len(c.args) > 1:
            s = f"substr({inner}, {int(c.args[0])}, {int(c.args[1])})"
        else:
            s = f"substr({inner}, {int(c.args[0])})"
    elif fn == "replace":
        s = f"replace({inner}, {render_value(str(c.args[0]))}, {render_value(str(c.args[1]))})"
    else:  # pragma: no cover
        raise ValueError(f"unhandled function {fn!r}")
    if with_alias:
        s += f" AS {quote(c.display_name())}"
    return s


def _render_cond(
    c: Cond,
    quote: Quoter,
    subst: dict[str, str] | None = None,
    dialect: str = "ansi",
) -> str:
    if subst and c.col in subst:
        # HAVING over an aggregate projection column: strict SQL can't
        # reference the SELECT alias, so substitute the aggregate
        # expression itself (what the reference's sea-query emits for
        # Expr::expr(...) in a having clause)
        col = subst[c.col]
    else:
        col = _render_colref(c.col, c.tbl, quote)
    op = c.op
    if op == "eq":
        return f"{col} = {render_value(c.value)}"
    if op == "ne":
        return f"{col} <> {render_value(c.value)}"
    if op == "gt":
        return f"{col} > {render_value(c.value)}"
    if op == "ge":
        return f"{col} >= {render_value(c.value)}"
    if op == "lt":
        return f"{col} < {render_value(c.value)}"
    if op == "le":
        return f"{col} <= {render_value(c.value)}"
    if op == "in":
        if not c.value:
            # `IN ()` is a syntax error on DuckDB/Postgres/MySQL while
            # the Spark compiler's isin([]) is simply FALSE — render
            # the same constant so the two backends agree (NOT-wrapped
            # it becomes TRUE, matching ~isin([]))
            return "1 = 0"
        vals = ", ".join(render_value(v) for v in c.value)
        return f"{col} IN ({vals})"
    if op == "between":
        return f"{col} BETWEEN {render_value(c.value[0])} AND {render_value(c.value[1])}"
    if op == "like":
        return f"{col} LIKE {render_value(c.value)}"
    if op == "is_null":
        return f"{col} IS NULL"
    if op == "is_not_null":
        return f"{col} IS NOT NULL"
    if op == "in_select":
        return f"{col} IN ({render_select(c.value, dialect)})"
    raise ValueError(f"unhandled equation {op!r}")  # pragma: no cover


def _render_exists(t: Exists, quote: Quoter, dialect: str, outer_tbl: str | None) -> str:
    corr = []
    for oc, ic in t.on:
        if "." in oc:
            ot, oname = oc.split(".", 1)
        elif outer_tbl:
            ot, oname = outer_tbl, oc
        else:
            raise ValueError("correlated Exists needs the outer table context")
        # table_name(), not table: the subquery's FROM may itself be a
        # Select (FROM-subquery), addressable only via its alias.
        corr.append(
            f"{quote(t.select.table_name())}.{quote(ic)} = {quote(ot)}.{quote(oname)}"
        )
    sub = render_select(t.select, dialect, _extra_where=corr)
    return f"EXISTS ({sub})"


def render_filter(tokens: Sequence[Expression], dialect: str = "ansi") -> str:
    return _render_filter(tokens, _quoter(dialect), dialect=dialect)


def _render_filter(
    tokens: Sequence[Expression],
    quote: Quoter,
    subst: dict[str, str] | None = None,
    dialect: str = "ansi",
    outer_tbl: str | None = None,
) -> str:
    parts: list[str] = []
    for t in tokens:
        if t is AND:
            parts.append("AND")
        elif t is OR:
            parts.append("OR")
        elif t is NOT:
            parts.append("NOT")
        elif isinstance(t, Nest):
            parts.append(f"({_render_filter(t.tokens, quote, subst, dialect, outer_tbl)})")
        elif isinstance(t, Exists):
            parts.append(_render_exists(t, quote, dialect, outer_tbl))
        elif isinstance(t, Cond):
            parts.append(_render_cond(t, quote, subst, dialect))
        else:  # pragma: no cover
            raise ValueError(f"unexpected token {t!r}")
    return " ".join(parts)


def render_select(sel: Select, dialect: str = "ansi", _extra_where: Sequence[str] = ()) -> str:
    quote = _quoter(dialect)
    if sel.qualify:
        # Portable QUALIFY: wrap the windowed projection in a subquery
        # and filter it outside (DuckDB has native QUALIFY but the
        # wrap works on every dialect and pins the same SQL order the
        # Spark compiler applies: window SELECT -> qualify ->
        # DISTINCT -> ORDER -> LIMIT).
        inner = Select(
            table=sel.table,
            table_alias=sel.table_alias,
            columns=sel.columns,
            filter=sel.filter,
            joins=sel.joins,
            group_by=sel.group_by,
            having=sel.having,
        )
        dkw = "DISTINCT " if sel.distinct else ""
        sql = (
            f"SELECT {dkw}* FROM ({render_select(inner, dialect, _extra_where)}) "
            f"AS {quote('__q')} WHERE {_render_filter(sel.qualify, quote, dialect=dialect)}"
        )
        if sel.order:
            sql += " ORDER BY " + ", ".join(
                f"{quote(o.col)} {'DESC' if o.desc else 'ASC'}" for o in sel.order
            )
        sql += _render_limit_offset(sel.limit, sel.offset, dialect)
        return sql
    cols = ", ".join(_render_column(c, quote) for c in sel.columns) if sel.columns else "*"
    dkw = "DISTINCT " if sel.distinct else ""
    base = sel.table_name()
    if isinstance(sel.table, Select):
        src = f"({render_select(sel.table, dialect)}) AS {quote(base)}"
    else:
        src = quote(sel.table)
    sql = f"SELECT {dkw}{cols} FROM {src}"
    for j in sel.joins:
        how = {"join": "JOIN", "inner": "INNER JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
               "full": "FULL JOIN", "cross": "CROSS JOIN", "semi": "SEMI JOIN", "anti": "ANTI JOIN"}[j.how]
        if j.how in ("semi", "anti") and dialect != "duckdb":
            # SEMI/ANTI JOIN is DuckDB syntax only; sqlite would parse
            # SEMI as a table alias and fail later with a misleading
            # no-such-column error, Postgres/MySQL with a syntax error
            # (verified live, r16 self-review). The Spark compiler
            # supports these join types on every backend; in SQL use
            # EXISTS/IN-subquery filters instead.
            raise ValueError(
                f"{j.how} join renders only on duckdb (got {dialect!r}); "
                f"express it as an Exists/in_select filter for other dialects"
            )
        if j.how == "cross":
            if j.on:
                raise ValueError("cross join cannot carry on-conditions")
            # a dangling `ON ` after CROSS JOIN is a syntax error on
            # every dialect
            sql += f" {how} {quote(j.right)}"
            continue
        on = " AND ".join(
            f"{quote(base)}.{quote(l)} = {quote(j.right)}.{quote(r)}"
            for l, r in j.on
        )
        sql += f" {how} {quote(j.right)} ON {on}"
    where_parts: list[str] = []
    if sel.filter:
        f = _render_filter(sel.filter, quote, dialect=dialect, outer_tbl=base)
        where_parts.append(f"({f})" if _extra_where else f)
    where_parts.extend(_extra_where)
    if where_parts:
        sql += " WHERE " + " AND ".join(where_parts)
    if sel.group_by:
        sql += " GROUP BY " + ", ".join(quote(k) for k in sel.group_by)
    if sel.having:
        agg_map = {
            c.display_name(): _render_column(c, quote, with_alias=False)
            for c in sel.columns
            if isinstance(c, FnCol) and c.is_aggregate()
        }
        sql += f" HAVING {_render_filter(sel.having, quote, agg_map, dialect)}"
    if sel.order:
        sql += " ORDER BY " + ", ".join(
            f"{quote(o.col)} {'DESC' if o.desc else 'ASC'}" for o in sel.order
        )
    sql += _render_limit_offset(sel.limit, sel.offset, dialect)
    return sql


_COMPOUND_SQL = {
    "union": "UNION",
    "union_all": "UNION ALL",
    "intersect": "INTERSECT",
    "intersect_all": "INTERSECT ALL",
    "except": "EXCEPT",
    "except_all": "EXCEPT ALL",
}


def render_compound(cp, dialect: str = "ansi") -> str:
    """Compound -> SQL: parenthesized operands chained with the set-op
    keyword (left-assoc), ORDER/LIMIT/OFFSET on the whole. Derby does
    not accept parenthesized set-op operands, and also forbids
    ORDER BY / row limits inside them — bare chaining is unambiguous
    there, so its operands render unwrapped."""
    quote = _quoter(dialect)
    kw = _COMPOUND_SQL[cp.op]
    if dialect in ("derby", "sqlite"):
        # neither accepts parenthesized set-op operands (sqlite:
        # near "(": syntax error — verified live, r16 self-review),
        # and both forbid ORDER BY / row limits inside them — bare
        # chaining is unambiguous there, so operands render unwrapped
        for s in cp.selects:
            if s.order or s.limit is not None or s.offset is not None:
                raise ValueError(
                    f"{dialect} compound operands cannot carry order/limit/offset"
                )
        sql = f" {kw} ".join(render_select(s, dialect) for s in cp.selects)
    else:
        sql = f" {kw} ".join(f"({render_select(s, dialect)})" for s in cp.selects)
    if cp.order:
        sql += " ORDER BY " + ", ".join(
            f"{quote(o.col)} {'DESC' if o.desc else 'ASC'}" for o in cp.order
        )
    sql += _render_limit_offset(cp.limit, cp.offset, dialect)
    return sql


def render_delete(d: Delete, dialect: str = "ansi") -> str:
    """DELETE with filter (mutation_dml.rs:87-94)."""
    quote = _quoter(dialect)
    return (
        f"DELETE FROM {quote(d.table)} WHERE "
        f"{_render_filter(d.filter, quote, dialect=dialect, outer_tbl=d.table)}"
    )


def render_insert(table: str, columns: Sequence[str], rows: Sequence[Sequence[Any]], dialect: str = "ansi") -> str:
    """Multi-row ``INSERT INTO t (..) VALUES (..), (..)`` — one
    statement per frame like the reference (mutation_dml.rs:11-38)."""
    quote = _quoter(dialect)
    collist = ", ".join(quote(c) for c in columns)
    vals = ", ".join("(" + ", ".join(render_value(v) for v in row) + ")" for row in rows)
    return f"INSERT INTO {quote(table)} ({collist}) VALUES {vals}"


# ---------------------------------------------------------------------------
# DDL renderers (§2.5) — mutation_ddl.rs analogues with per-dialect
# golden strings (ALTER MODIFY mutation_ddl.rs:36-68, indexes 91-112,
# foreign keys 114-141)
# ---------------------------------------------------------------------------


def render_alter_add_column(table: str, column: str, sql_type: str, dialect: str = "ansi") -> str:
    quote = _quoter(dialect)
    return f"ALTER TABLE {quote(table)} ADD COLUMN {quote(column)} {sql_type}"


def render_alter_drop_column(table: str, column: str, dialect: str = "ansi") -> str:
    quote = _quoter(dialect)
    return f"ALTER TABLE {quote(table)} DROP COLUMN {quote(column)}"


def render_alter_modify_column(table: str, column: str, sql_type: str, dialect: str = "ansi") -> str:
    """ALTER ... column type change (mutation_ddl.rs:36-68 Modify).
    MySQL spells it MODIFY COLUMN; Postgres ALTER COLUMN TYPE. SQLite
    has no in-place column retype — callers rebuild the table."""
    quote = _quoter(dialect)
    if dialect == "mysql":
        return f"ALTER TABLE {quote(table)} MODIFY COLUMN {quote(column)} {sql_type}"
    if dialect == "sqlite":
        raise ValueError("SQLite cannot ALTER COLUMN TYPE; rebuild the table instead")
    return f"ALTER TABLE {quote(table)} ALTER COLUMN {quote(column)} TYPE {sql_type}"


def render_create_index(
    table: str, columns: Sequence[str], name: str | None = None, unique: bool = False, dialect: str = "ansi"
) -> str:
    """CREATE [UNIQUE] INDEX (mutation_ddl.rs:91-105) — multi-column."""
    quote = _quoter(dialect)
    name = name or f"idx_{table}_{'_'.join(columns)}"
    u = "UNIQUE " if unique else ""
    collist = ", ".join(quote(c) for c in columns)
    return f"CREATE {u}INDEX {quote(name)} ON {quote(table)} ({collist})"


def render_drop_index(table: str, name: str, dialect: str = "ansi") -> str:
    """DROP INDEX (mutation_ddl.rs:107-112). MySQL scopes the index
    name to the table; everyone else drops by bare name."""
    quote = _quoter(dialect)
    if dialect == "mysql":
        return f"DROP INDEX {quote(name)} ON {quote(table)}"
    return f"DROP INDEX {quote(name)}"


def render_create_foreign_key(
    table: str,
    column: str,
    ref_table: str,
    ref_column: str,
    name: str | None = None,
    dialect: str = "ansi",
) -> str:
    """ADD CONSTRAINT ... FOREIGN KEY (mutation_ddl.rs:114-130)."""
    quote = _quoter(dialect)
    name = name or f"fk_{table}_{column}"
    return (
        f"ALTER TABLE {quote(table)} ADD CONSTRAINT {quote(name)} "
        f"FOREIGN KEY ({quote(column)}) REFERENCES {quote(ref_table)} ({quote(ref_column)})"
    )


def render_drop_foreign_key(table: str, name: str, dialect: str = "ansi") -> str:
    """DROP the FK constraint (mutation_ddl.rs:132-141); MySQL's
    spelling differs from the standard DROP CONSTRAINT."""
    quote = _quoter(dialect)
    if dialect == "mysql":
        return f"ALTER TABLE {quote(table)} DROP FOREIGN KEY {quote(name)}"
    return f"ALTER TABLE {quote(table)} DROP CONSTRAINT {quote(name)}"


def render_primary_key_query(table: str, dialect: str) -> str:
    """Catalog query returning the PK column name(s)
    (query_ddl.rs:201-244: per-dialect information_schema / PRAGMA)."""
    t = table.replace("'", "''")
    if dialect == "mysql":
        return (
            "SELECT COLUMN_NAME FROM information_schema.KEY_COLUMN_USAGE "
            f"WHERE TABLE_NAME = '{t}' AND CONSTRAINT_NAME = 'PRIMARY' "
            "ORDER BY ORDINAL_POSITION"
        )
    if dialect == "postgres":
        return (
            "SELECT a.attname FROM pg_index i "
            "JOIN pg_attribute a ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey) "
            f"WHERE i.indrelid = '{t}'::regclass AND i.indisprimary"
        )
    if dialect == "sqlite":
        return f"SELECT name FROM pragma_table_info('{t}') WHERE pk > 0 ORDER BY pk"
    return (
        "SELECT kcu.column_name FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON tc.constraint_name = kcu.constraint_name "
        f"WHERE tc.table_name = '{t}' AND tc.constraint_type = 'PRIMARY KEY' "
        "ORDER BY kcu.ordinal_position"
    )


def render_constraints_query(table: str, dialect: str) -> str:
    """Table-constraint introspection (query_ddl.rs:76-173): returns
    (constraint_name, constraint_type) rows."""
    t = table.replace("'", "''")
    if dialect == "sqlite":
        # synthesized from pragma tables: PK + unique indexes + FKs
        return (
            f"SELECT 'pk_{t}' AS constraint_name, 'PRIMARY KEY' AS constraint_type "
            f"FROM pragma_table_info('{t}') WHERE pk > 0 "
            "UNION ALL "
            f"SELECT name, 'UNIQUE' FROM pragma_index_list('{t}') WHERE \"unique\" = 1 AND origin = 'u' "
            "UNION ALL "
            f"SELECT DISTINCT 'fk_' || \"table\", 'FOREIGN KEY' FROM pragma_foreign_key_list('{t}')"
        )
    return (
        "SELECT constraint_name, constraint_type FROM information_schema.table_constraints "
        f"WHERE table_name = '{t}' ORDER BY constraint_name"
    )


def render_indexes_query(table: str, dialect: str) -> str:
    """Column-index introspection (query_ddl.rs:140-173)."""
    t = table.replace("'", "''")
    if dialect == "sqlite":
        return f"SELECT name, \"unique\" FROM pragma_index_list('{t}') ORDER BY name"
    if dialect == "duckdb":
        # no information_schema.indexes in DuckDB; its own catalog fn
        # (pg_indexes also exists and serves the postgres rendering)
        return (
            "SELECT index_name, is_unique FROM duckdb_indexes() "
            f"WHERE table_name = '{t}' ORDER BY index_name"
        )
    if dialect == "mysql":
        return (
            f"SELECT INDEX_NAME, NON_UNIQUE = 0 FROM information_schema.STATISTICS "
            f"WHERE TABLE_NAME = '{t}' GROUP BY INDEX_NAME, NON_UNIQUE ORDER BY INDEX_NAME"
        )
    if dialect == "postgres":
        return (
            "SELECT indexname, indexdef LIKE 'CREATE UNIQUE%' FROM pg_indexes "
            f"WHERE tablename = '{t}' ORDER BY indexname"
        )
    return (
        "SELECT index_name, is_unique FROM information_schema.indexes "
        f"WHERE table_name = '{t}' ORDER BY index_name"
    )


def render_update_by_key(
    table: str,
    columns: Sequence[str],
    rows: Sequence[Sequence[Any]],
    key: str,
    dialect: str = "ansi",
) -> list[str]:
    """Per-row ``UPDATE .. SET .. WHERE key = v`` batch
    (mutation_dml.rs:44-84) — kept for wire parity; at scale prefer
    the lake upsert merge (SURVEY.md §7.4)."""
    quote = _quoter(dialect)
    ki = list(columns).index(key)
    out = []
    for row in rows:
        sets = ", ".join(
            f"{quote(c)} = {render_value(v)}" for c, v in zip(columns, row) if c != key
        )
        out.append(f"UPDATE {quote(table)} SET {sets} WHERE {quote(key)} = {render_value(row[ki])}")
    return out
