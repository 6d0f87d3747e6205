"""Serializable query algebra (the fabrix ``Select`` ADT on Spark).

Reference: ``fabrix-sql/src/builder/sql_adt.rs`` — Select (744-754),
Column/Function (220-292), Expressions token grammar (447-547), Join
(679-736), Order (148-162). The ADT is JSON-(de)serializable like the
reference's serde wire format (sql_adt.rs:1085-1139) and has two
backends: ``plans.compiler.to_df`` (Spark DataFrame DSL — Catalyst
optimizes & executes) and ``plans.sqlgen.to_sql`` (dialect SQL string
for whole-query JDBC pushdown, mirroring the reference's sea-query
compilation at query_dml.rs:31-86).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

__all__ = [
    "Col",
    "FnCol",
    "WinCol",
    "Cond",
    "Exists",
    "AND",
    "OR",
    "NOT",
    "Nest",
    "Order",
    "Join",
    "Select",
    "Compound",
    "Delete",
    "AGGREGATE_FNS",
    "SCALAR_FNS",
    "WINDOW_FNS",
    "expressions_from_json",
    "expression_to_json",
    "with_primary_key",
]

# Function names (sql_adt.rs:220-246). Aggregates fold under group_by;
# scalars compile to row expressions.
AGGREGATE_FNS = {"max", "min", "sum", "avg", "count", "count_distinct"}
SCALAR_FNS = {
    "abs", "ifnull", "cast", "coalesce", "char_length", "lower", "upper", "round",
    # r9 extension — capability ≥ reference: portable string scalars
    "trim", "substr", "replace",
}
# Window functions (r8, capability ≥ reference — its ADT stops at
# aggregates; the engine's w_* query family gets a serializable form):
# ranking fns take no operand; lag/lead take (offset[, default]);
# the aggregate-over-window forms reuse the aggregate names.
WINDOW_FNS = {
    "row_number",
    "rank",
    "dense_rank",
    "percent_rank",
    "cume_dist",
    "ntile",
    "lag",
    "lead",
    "first_value",
    "last_value",
    "sum",
    "avg",
    "count",
    "min",
    "max",
}


@dataclass(frozen=True)
class Col:
    """Plain or table-qualified column (Column::Col / Column::Tbl,
    sql_adt.rs:273-292)."""

    name: str
    tbl: str | None = None
    alias: str | None = None

    def display_name(self) -> str:
        return self.alias or self.name

    def to_json(self) -> dict:
        d: dict[str, Any] = {"col": self.name}
        if self.tbl:
            d["tbl"] = self.tbl
        if self.alias:
            d["alias"] = self.alias
        return d


@dataclass(frozen=True)
class FnCol:
    """Function over a column (Column::FnCol / FnTbl, sql_adt.rs:283-292).

    ``fn`` is one of AGGREGATE_FNS | SCALAR_FNS; ``args`` carries extra
    operands (cast target type; ifnull/coalesce fallbacks)."""

    fn: str
    col: "Col | FnCol"
    args: tuple = ()
    alias: str | None = None

    def __post_init__(self) -> None:
        if self.fn not in AGGREGATE_FNS | SCALAR_FNS:
            raise ValueError(f"unknown function {self.fn!r}")

    def display_name(self) -> str:
        """Default display name like the reference's columns_name
        (sql_adt.rs:332-371): ``max(col)`` unless aliased."""
        return self.alias or f"{self.fn}({self.col.display_name()})"

    def is_aggregate(self) -> bool:
        if self.fn in AGGREGATE_FNS:
            return True
        return isinstance(self.col, FnCol) and self.col.is_aggregate()

    def to_json(self) -> dict:
        d: dict[str, Any] = {"fn": self.fn, "col": self.col.to_json()}
        if self.args:
            d["args"] = list(self.args)
        if self.alias:
            d["alias"] = self.alias
        return d


@dataclass(frozen=True)
class WinCol:
    """Window-function projection column (r8 extension; the reference
    ADT has no window surface — SURVEY.md §2.11's w_* family gets its
    serializable form here). ``fn`` ∈ WINDOW_FNS; ``col`` is the
    operand (None for ranking functions); ``args`` carries the extra
    operands (ntile bucket count; lag/lead offset and optional
    default); ``frame`` is None (engine default) or a
    ``(mode, start, end)`` triple with mode ``rows``/``range`` and
    bounds being an int (negative = preceding, positive = following),
    ``"unbounded_preceding"``, ``"unbounded_following"`` or
    ``"current"``."""

    fn: str
    col: "Col | FnCol | None" = None
    partition_by: tuple = ()
    order: tuple = ()
    args: tuple = ()
    frame: tuple | None = None
    alias: str | None = None

    def __init__(
        self,
        fn: str,
        col: "Col | FnCol | None" = None,
        partition_by: Sequence = (),
        order: Sequence = (),
        args: Sequence = (),
        frame: Sequence | None = None,
        alias: str | None = None,
    ):
        if fn not in WINDOW_FNS:
            raise ValueError(f"unknown window function {fn!r}")
        if fn in ("row_number", "rank", "dense_rank", "percent_rank", "cume_dist", "ntile"):
            if col is not None:
                raise ValueError(f"{fn} takes no column operand")
            if not order:
                raise ValueError(f"{fn} requires an ORDER BY")
        elif col is None:
            raise ValueError(f"{fn} requires a column operand")
        if fn in ("first_value", "last_value") and not order:
            raise ValueError(f"{fn} requires an ORDER BY")
        if fn == "ntile" and (len(args) != 1 or int(args[0]) < 1):
            raise ValueError("ntile takes one positive bucket count")
        if fn in ("lag", "lead"):
            if not order:
                raise ValueError(f"{fn} requires an ORDER BY")
            if len(args) not in (0, 1, 2):
                raise ValueError(f"{fn} takes (offset[, default])")
        if frame is not None:
            mode, lo, hi = frame
            if mode not in ("rows", "range"):
                raise ValueError("frame mode must be rows|range")
            for b in (lo, hi):
                if not (
                    isinstance(b, int)
                    or b in ("unbounded_preceding", "unbounded_following", "current")
                ):
                    raise ValueError(f"bad frame bound {b!r}")
            if fn not in ("sum", "avg", "count", "min", "max", "first_value", "last_value"):
                raise ValueError("frames apply to aggregate window functions only")
            if not order:
                raise ValueError("a frame requires an ORDER BY")
            frame = (mode, lo, hi)
        object.__setattr__(self, "fn", fn)
        object.__setattr__(self, "col", Col(col) if isinstance(col, str) else col)
        object.__setattr__(self, "partition_by", tuple(partition_by))
        object.__setattr__(
            self,
            "order",
            tuple(Order(o) if isinstance(o, str) else o for o in order),
        )
        object.__setattr__(self, "args", tuple(args))
        object.__setattr__(self, "frame", tuple(frame) if frame is not None else None)
        object.__setattr__(self, "alias", alias)

    def display_name(self) -> str:
        if self.alias:
            return self.alias
        inner = self.col.display_name() if self.col is not None else ""
        return f"{self.fn}({inner})"

    def is_aggregate(self) -> bool:
        return False

    def to_json(self) -> dict:
        d: dict[str, Any] = {"win": {"fn": self.fn}}
        w = d["win"]
        if self.col is not None:
            w["col"] = self.col.to_json()
        if self.partition_by:
            w["partition_by"] = list(self.partition_by)
        if self.order:
            w["order"] = [o.to_json() for o in self.order]
        if self.args:
            w["args"] = list(self.args)
        if self.frame:
            w["frame"] = list(self.frame)
        if self.alias:
            w["alias"] = self.alias
        return d


ColumnLike = Col | FnCol


def column_from_json(d: dict | str) -> "ColumnLike | WinCol":
    if isinstance(d, str):
        return Col(d)
    if "win" in d:
        w = d["win"]
        return WinCol(
            w["fn"],
            column_from_json(w["col"]) if "col" in w else None,
            tuple(w.get("partition_by", ())),
            tuple(Order(o["col"], o.get("order") == "desc") for o in w.get("order", ())),
            tuple(w.get("args", ())),
            tuple(w["frame"]) if w.get("frame") else None,
            w.get("alias"),
        )
    if "fn" in d:
        return FnCol(
            d["fn"], column_from_json(d["col"]), tuple(d.get("args", ())), d.get("alias")
        )
    return Col(d["col"], d.get("tbl"), d.get("alias"))


# ---------------------------------------------------------------------------
# Filter expressions — flat token grammar (sql_adt.rs:447-547).
# Legal sequences validated by a tiny FSM mirroring sql_adt.rs:553-673.
# ---------------------------------------------------------------------------

_EQUATIONS = {
    "eq", "ne", "gt", "ge", "lt", "le", "in", "between", "like",
    "is_null", "is_not_null", "in_select",
}


@dataclass(frozen=True)
class Cond:
    """A simple predicate: column <equation> value(s)
    (Condition, sql_adt.rs:465-483).

    r8 extension: ``op="in_select"`` takes a one-column :class:`Select`
    as ``value`` — the serializable form of the reference's
    existing-ids probe (``WHERE id IN (SELECT id FROM ...)``,
    query_dml.rs:14-28). Negate with the grammar's NOT token; both
    backends honor SQL's three-valued NOT IN NULL semantics."""

    col: str
    op: str
    value: Any = None
    tbl: str | None = None

    def __post_init__(self) -> None:
        if self.op not in _EQUATIONS:
            raise ValueError(f"unknown equation {self.op!r}")
        if self.op == "between" and (not isinstance(self.value, (tuple, list)) or len(self.value) != 2):
            raise ValueError("between takes a (low, high) pair")
        if self.op == "in" and not isinstance(self.value, (tuple, list)):
            raise ValueError("in takes a list")
        if self.op == "in_select":
            if not isinstance(self.value, Select):
                raise ValueError("in_select takes a Select")
            if len(self.value.columns) != 1:
                raise ValueError("in_select subquery must project exactly one column")

    def to_json(self) -> dict:
        d: dict[str, Any] = {"cond": {"col": self.col, "op": self.op}}
        if isinstance(self.value, Select):
            d["cond"]["select"] = self.value.to_json()
        elif self.value is not None:
            d["cond"]["value"] = list(self.value) if isinstance(self.value, tuple) else self.value
        if self.tbl:
            d["cond"]["tbl"] = self.tbl
        return d


@dataclass(frozen=True)
class Exists:
    """EXISTS subquery predicate (r8 extension). ``on`` carries the
    correlation as equi-pairs ``(outer_col, inner_col)`` — empty means
    an uncorrelated EXISTS. Negate with the grammar's NOT token."""

    select: "Select"
    on: tuple = ()

    def __init__(self, select: "Select", on: Sequence = ()):
        object.__setattr__(self, "select", select)
        object.__setattr__(self, "on", tuple((o, i) for o, i in on))
        # Correlated EXISTS compiles on Spark as an equi-join found-flag,
        # which cannot honor a per-outer-row LIMIT/OFFSET on the inner
        # query; SQL rendering would honor it, so the two backends would
        # disagree (e.g. LIMIT 0). Reject loudly and backend-consistently
        # at construction. ORDER/DISTINCT are semantically inert inside
        # EXISTS and stay legal; group_by is rejected at compile time.
        if self.on and (select.limit is not None or select.offset is not None):
            raise ValueError(
                "correlated Exists subqueries cannot use limit/offset "
                "(EXISTS is per-outer-row; a row cap on the inner query "
                "is not expressible as the join the Spark backend plans)"
            )

    def to_json(self) -> dict:
        d: dict[str, Any] = {"exists": {"select": self.select.to_json()}}
        if self.on:
            d["exists"]["on"] = [list(p) for p in self.on]
        return d


class _Token:
    def __init__(self, kind: str):
        self.kind = kind

    def __repr__(self) -> str:  # pragma: no cover
        return self.kind

    def to_json(self) -> str:
        return self.kind


AND = _Token("AND")
OR = _Token("OR")
NOT = _Token("NOT")


@dataclass(frozen=True)
class Nest:
    """Parenthesized sub-expression (Expression::Nest, sql_adt.rs:517)."""

    tokens: tuple

    def __init__(self, tokens: Sequence):
        object.__setattr__(self, "tokens", tuple(tokens))

    def to_json(self) -> dict:
        return {"nest": [expression_to_json(t) for t in self.tokens]}


Expression = Cond | Nest | Exists | _Token


def expression_to_json(t: Expression) -> Any:
    return t.to_json()


def expressions_from_json(items: Sequence) -> list[Expression]:
    out: list[Expression] = []
    for it in items:
        if isinstance(it, str):
            tok = {"AND": AND, "OR": OR, "NOT": NOT}.get(it.upper())
            if tok is None:
                raise ValueError(f"unknown token {it!r}")
            out.append(tok)
        elif "nest" in it:
            out.append(Nest(expressions_from_json(it["nest"])))
        elif "exists" in it:
            e = it["exists"]
            out.append(Exists(Select.from_json(e["select"]), tuple(e.get("on", ()))))
        else:
            c = it["cond"]
            if c["op"] == "in_select":
                out.append(Cond(c["col"], "in_select", Select.from_json(c["select"]), c.get("tbl")))
                continue
            val = c.get("value")
            if c["op"] in ("between", "in") and isinstance(val, list):
                val = tuple(val) if c["op"] == "between" else list(val)
            out.append(Cond(c["col"], c["op"], val, c.get("tbl")))
    return out


def validate_expressions(tokens: Sequence[Expression]) -> None:
    """Runtime re-statement of the reference's compile-time filter FSM
    (sql_adt.rs:553-673): Init -> {Cond, Nest, NOT}; Cond/Nest ->
    {AND, OR}; AND/OR -> {Cond, Nest, NOT}; NOT -> {Cond, Nest}.
    Duplicate conjunctions / trailing conjunctions are illegal (the
    reference silently skips illegal tokens at bd.rs:247-252 — we
    prefer loud errors)."""
    state = "init"
    for t in tokens:
        if state in ("init", "conj"):
            if isinstance(t, (Cond, Nest, Exists)):
                state = "operand"
            elif t is NOT:
                state = "not"
            else:
                raise ValueError(f"conjunction {t!r} not allowed at position (state={state})")
        elif state == "not":
            if isinstance(t, (Cond, Nest, Exists)):
                state = "operand"
            else:
                raise ValueError("NOT must be followed by a condition or nest")
        elif state == "operand":
            if t in (AND, OR):
                state = "conj"
            else:
                raise ValueError("conditions must be joined by AND/OR")
    if state in ("conj", "not"):
        raise ValueError("filter ends with a dangling token")
    for t in tokens:
        if isinstance(t, Nest):
            validate_expressions(t.tokens)


# ---------------------------------------------------------------------------
# Order / Join / Select / Delete (sql_adt.rs:148-162, 679-736, 744-754, 861-880)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Order:
    col: str
    desc: bool = False

    def to_json(self) -> dict:
        return {"col": self.col, "order": "desc" if self.desc else "asc"}


# join types: reference supports join/inner/left/right (sql_adt.rs:681-686);
# Spark adds the rest for free (SURVEY.md §2.3).
_JOIN_TYPES = {"join", "inner", "left", "right", "full", "semi", "anti", "cross"}


@dataclass(frozen=True)
class Join:
    right: str
    on: tuple  # ((left_col, right_col), ...) equi-join, multi-key AND
    how: str = "inner"

    def __init__(self, right: str, on: Sequence, how: str = "inner"):
        if how not in _JOIN_TYPES:
            raise ValueError(f"unknown join type {how!r}")
        object.__setattr__(self, "right", right)
        object.__setattr__(self, "on", tuple((l, r) for l, r in on))
        object.__setattr__(self, "how", how)

    def to_json(self) -> dict:
        return {"right": self.right, "on": [list(p) for p in self.on], "how": self.how}


@dataclass
class Select:
    """The root query node (sql_adt.rs:744-754).

    ``distinct`` and ``having`` extend the reference's grammar (which
    stops at group_by) — capability ≥ reference: the serializable ADT
    covers what the raw-query surface already could. ``having`` reuses
    the same token grammar as ``filter``; its conditions may reference
    group keys or the display names of aggregate projection columns
    (both backends resolve alias → aggregate expression).

    r8: ``columns`` may contain :class:`WinCol` window projections
    (illegal together with ``group_by`` — project the aggregate first,
    window in a second Select), and ``qualify`` is a post-window filter
    over display names (DuckDB's QUALIFY; rendered portably as a
    wrapping subquery, compiled on Spark as a filter after the window
    projection). SQL order: WHERE → window SELECT → QUALIFY →
    DISTINCT → ORDER → LIMIT.

    r8: ``table`` may itself be a Select (a FROM-subquery), exposed
    under ``table_alias`` — this is what composes aggregate-then-
    window (or any staged query) into ONE serializable object:
    ``Select(table=Select(...group_by...), columns=[..., WinCol(...)],
    qualify=[...])``. Joins/qualified conds in the outer query
    reference the alias."""

    table: "str | Select"
    columns: list[ColumnLike] = field(default_factory=list)
    filter: list[Expression] | None = None
    joins: list[Join] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    order: list[Order] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    include_primary_key: bool = False
    distinct: bool = False
    having: list[Expression] | None = None
    qualify: list[Expression] | None = None
    table_alias: str = "__sub"

    def table_name(self) -> str:
        """The name the FROM source is addressable by: the table name
        itself, or ``table_alias`` for a FROM-subquery."""
        return self.table_alias if isinstance(self.table, Select) else self.table

    def __post_init__(self) -> None:
        self.columns = [Col(c) if isinstance(c, str) else c for c in self.columns]
        if self.filter:
            validate_expressions(self.filter)
        if self.having:
            if not self.group_by:
                raise ValueError("having requires group_by")
            validate_expressions(self.having)
        wins = [c for c in self.columns if isinstance(c, WinCol)]
        if wins and self.group_by:
            raise ValueError(
                "window columns cannot mix with group_by in one Select; "
                "aggregate first, then window over the result"
            )
        if self.qualify:
            if not wins:
                raise ValueError("qualify requires at least one window column")
            validate_expressions(self.qualify)

    def columns_name(self) -> list[str]:
        """Display names incl. ``max(col)`` forms (sql_adt.rs:332-371)."""
        return [c.display_name() for c in self.columns]

    def to_json(self) -> dict:
        d: dict[str, Any] = {
            "table": self.table.to_json() if isinstance(self.table, Select) else self.table,
            "columns": [c.to_json() for c in self.columns],
        }
        if isinstance(self.table, Select) and self.table_alias != "__sub":
            d["table_alias"] = self.table_alias
        if self.filter:
            d["filter"] = [expression_to_json(t) for t in self.filter]
        if self.joins:
            d["join"] = [j.to_json() for j in self.joins]
        if self.group_by:
            d["group_by"] = list(self.group_by)
        if self.order:
            d["order"] = [o.to_json() for o in self.order]
        if self.limit is not None:
            d["limit"] = self.limit
        if self.offset is not None:
            d["offset"] = self.offset
        if self.include_primary_key:
            d["include_primary_key"] = True
        if self.distinct:
            d["distinct"] = True
        if self.having:
            d["having"] = [expression_to_json(t) for t in self.having]
        if self.qualify:
            d["qualify"] = [expression_to_json(t) for t in self.qualify]
        return d

    @classmethod
    def from_json(cls, d: dict) -> "Select":
        return cls(
            table=cls.from_json(d["table"]) if isinstance(d["table"], dict) else d["table"],
            table_alias=d.get("table_alias", "__sub"),
            columns=[column_from_json(c) for c in d.get("columns", [])],
            filter=expressions_from_json(d["filter"]) if d.get("filter") else None,
            joins=[Join(j["right"], j["on"], j.get("how", "inner")) for j in d.get("join", [])],
            group_by=list(d.get("group_by", [])),
            order=[Order(o["col"], o.get("order") == "desc") for o in d.get("order", [])],
            limit=d.get("limit"),
            offset=d.get("offset"),
            include_primary_key=bool(d.get("include_primary_key", False)),
            distinct=bool(d.get("distinct", False)),
            having=expressions_from_json(d["having"]) if d.get("having") else None,
            qualify=expressions_from_json(d["qualify"]) if d.get("qualify") else None,
        )


_COMPOUND_OPS = {"union", "union_all", "intersect", "intersect_all", "except", "except_all"}


@dataclass
class Compound:
    """Set operation over two or more Selects (r8 extension; the
    reference ADT stops at single Selects — SURVEY.md §2.11's s_*
    family gets its serializable form). ``op`` applies left-fold
    across ``selects`` (SQL's left-associative chain); ORDER BY /
    LIMIT / OFFSET apply to the combined result. Operand projections
    must agree in arity; names follow the FIRST operand (SQL rule,
    and what both backends produce)."""

    op: str
    selects: list
    order: list = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None

    def __post_init__(self) -> None:
        if self.op not in _COMPOUND_OPS:
            raise ValueError(f"unknown compound op {self.op!r}")
        if len(self.selects) < 2:
            raise ValueError("a compound needs at least two selects")
        arity = {len(s.columns) for s in self.selects}
        if len(arity) != 1 or 0 in arity:
            raise ValueError(
                "compound operands must project the same non-zero column count"
            )

    def columns_name(self) -> list[str]:
        return self.selects[0].columns_name()

    def to_json(self) -> dict:
        d: dict[str, Any] = {
            "compound": self.op,
            "selects": [s.to_json() for s in self.selects],
        }
        if self.order:
            d["order"] = [o.to_json() for o in self.order]
        if self.limit is not None:
            d["limit"] = self.limit
        if self.offset is not None:
            d["offset"] = self.offset
        return d

    @classmethod
    def from_json(cls, d: dict) -> "Compound":
        return cls(
            op=d["compound"],
            selects=[Select.from_json(s) for s in d["selects"]],
            order=[Order(o["col"], o.get("order") == "desc") for o in d.get("order", [])],
            limit=d.get("limit"),
            offset=d.get("offset"),
        )


@dataclass
class Delete:
    """Filtered delete (sql_adt.rs:861-880)."""

    table: str
    filter: list[Expression]

    def __post_init__(self) -> None:
        validate_expressions(self.filter)

    def to_json(self) -> dict:
        return {"table": self.table, "filter": [expression_to_json(t) for t in self.filter]}

    @classmethod
    def from_json(cls, d: dict) -> "Delete":
        return cls(d["table"], expressions_from_json(d["filter"]))


def with_primary_key(sel: Select, pk: str) -> Select:
    """Enrich a Select with its table's primary key — prepended to the
    projection unless already present (ec.rs:555-567, 588-591; the
    reference fetches the PK from the catalog then puts it first so
    the result frame can be index-tagged on column 0)."""
    if not sel.columns or any(c.display_name() == pk for c in sel.columns):
        return sel
    return Select(
        table=sel.table,
        table_alias=sel.table_alias,
        columns=[Col(pk, tbl=sel.table_name() if sel.joins else None), *sel.columns],
        filter=sel.filter,
        joins=sel.joins,
        group_by=sel.group_by,
        order=sel.order,
        limit=sel.limit,
        offset=sel.offset,
        include_primary_key=sel.include_primary_key,
        distinct=sel.distinct,
        having=sel.having,
        qualify=sel.qualify,
    )
