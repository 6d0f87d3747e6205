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
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Sequence

from .adt import (
    AND,
    Col,
    Cond,
    Expression,
    FnCol,
    Nest,
    NOT,
    OR,
    Delete,
    Select,
)

__all__ = [
    "render_select",
    "render_delete",
    "render_insert",
    "render_update_by_key",
    "render_value",
    "render_filter",
]

# dialect -> identifier quote char (the reference's statement! macro
# switches sea-query backends per dialect the same way; MySQL quotes
# with backticks, Postgres/SQLite with double quotes)
_QUOTE = {"ansi": '"', "postgres": '"', "sqlite": '"', "mysql": "`", "duckdb": '"'}


def _quoter(dialect: str):
    q = _QUOTE[dialect]

    def _quote_ident(name: str) -> str:
        if dialect == "ansi" and name.replace("_", "").isalnum() and not name[0].isdigit():
            return name
        return q + name.replace(q, q + q) + q

    return _quote_ident


def _quote_ident(name: str) -> str:
    if name.replace("_", "").isalnum() and not name[0].isdigit():
        return name
    return '"' + name.replace('"', '""') + '"'


def render_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"cannot render literal {v!r}")


def _render_colref(name: str, tbl: str | None) -> str:
    return f"{_quote_ident(tbl)}.{_quote_ident(name)}" if tbl else _quote_ident(name)


def _render_column(c: Col | FnCol, with_alias: bool = True) -> str:
    if isinstance(c, Col):
        s = _render_colref(c.name, c.tbl)
        if with_alias and c.alias:
            s += f" AS {_quote_ident(c.alias)}"
        return s
    inner = _render_column(c.col, with_alias=False)
    fn = c.fn
    if fn in ("max", "min", "sum", "avg", "count", "abs", "lower", "upper"):
        s = f"{fn}({inner})"
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
    else:  # pragma: no cover
        raise ValueError(f"unhandled function {fn!r}")
    if with_alias:
        s += f" AS {_quote_ident(c.display_name())}"
    return s


def _render_cond(c: Cond) -> str:
    col = _render_colref(c.col, c.tbl)
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
    raise ValueError(f"unhandled equation {op!r}")  # pragma: no cover


def render_filter(tokens: Sequence[Expression]) -> str:
    parts: list[str] = []
    for t in tokens:
        if t is AND:
            parts.append("AND")
        elif t is OR:
            parts.append("OR")
        elif t is NOT:
            parts.append("NOT")
        elif isinstance(t, Nest):
            parts.append(f"({render_filter(t.tokens)})")
        elif isinstance(t, Cond):
            parts.append(_render_cond(t))
        else:  # pragma: no cover
            raise ValueError(f"unexpected token {t!r}")
    return " ".join(parts)


def render_select(sel: Select, dialect: str = "ansi") -> str:
    global _quote_ident
    _quote_ident = _quoter(dialect)
    cols = ", ".join(_render_column(c) for c in sel.columns) if sel.columns else "*"
    sql = f"SELECT {cols} FROM {_quote_ident(sel.table)}"
    for j in sel.joins:
        how = {"join": "JOIN", "inner": "INNER JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
               "full": "FULL JOIN", "cross": "CROSS JOIN", "semi": "SEMI JOIN", "anti": "ANTI JOIN"}[j.how]
        on = " AND ".join(
            f"{_quote_ident(sel.table)}.{_quote_ident(l)} = {_quote_ident(j.right)}.{_quote_ident(r)}"
            for l, r in j.on
        )
        sql += f" {how} {_quote_ident(j.right)} ON {on}"
    if sel.filter:
        sql += f" WHERE {render_filter(sel.filter)}"
    if sel.group_by:
        sql += " GROUP BY " + ", ".join(_quote_ident(k) for k in sel.group_by)
    if sel.order:
        sql += " ORDER BY " + ", ".join(
            f"{_quote_ident(o.col)} {'DESC' if o.desc else 'ASC'}" for o in sel.order
        )
    if sel.limit is not None:
        sql += f" LIMIT {sel.limit}"
    if sel.offset is not None:
        sql += f" OFFSET {sel.offset}"
    return sql


def render_delete(d: Delete, dialect: str = "ansi") -> str:
    """DELETE with filter (mutation_dml.rs:87-94)."""
    global _quote_ident
    _quote_ident = _quoter(dialect)
    return f"DELETE FROM {_quote_ident(d.table)} WHERE {render_filter(d.filter)}"


def render_insert(table: str, columns: Sequence[str], rows: Sequence[Sequence[Any]], dialect: str = "ansi") -> str:
    """Multi-row ``INSERT INTO t (..) VALUES (..), (..)`` — one
    statement per frame like the reference (mutation_dml.rs:11-38)."""
    quote = _quoter(dialect)
    collist = ", ".join(quote(c) for c in columns)
    vals = ", ".join("(" + ", ".join(render_value(v) for v in row) + ")" for row in rows)
    return f"INSERT INTO {quote(table)} ({collist}) VALUES {vals}"


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
