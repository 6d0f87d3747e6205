"""Differential fuzzing of the two ADT backends: for random Select
trees, the Spark DataFrame plan (plans/compiler.py) and the rendered
SQL executed by DuckDB (plans/sqlgen.py) must produce identical
results. This is the sqllogictest-style corpus the reference lacks
(SURVEY.md §5 'Absent') — every random query is an executable golden
test."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fabrix_spark.plans import ParquetDirProvider, compile_select, render_select
from fabrix_spark.plans.adt import (
    AND,
    Col,
    Cond,
    Exists,
    FnCol,
    Join,
    Nest,
    NOT,
    OR,
    Order,
    Select,
    WinCol,
)

SF = "/root/testdata/sf0.001"

NUM_COLS = ["c_custkey", "c_nationkey", "c_acctbal"]
STR_COLS = ["c_name", "c_mktsegment"]


_num_cond = st.builds(
    Cond,
    col=st.sampled_from(NUM_COLS),
    op=st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"]),
    value=st.integers(-500, 1500),
)
_in_cond = st.builds(
    Cond,
    col=st.just("c_nationkey"),
    op=st.just("in"),
    value=st.lists(st.integers(0, 24), min_size=1, max_size=5),
)
_between_cond = st.builds(
    Cond,
    col=st.just("c_acctbal"),
    op=st.just("between"),
    value=st.tuples(st.integers(-1000, 0), st.integers(1, 10000)),
)
_like_cond = st.builds(
    Cond,
    col=st.sampled_from(STR_COLS),
    op=st.just("like"),
    value=st.sampled_from(["%1%", "%a%", "B%", "%G"]),
)
# r8: subquery predicates are ordinary grammar operands — fuzz them
# inside the same AND/OR/NOT/Nest token machinery as plain conds
_subq_cond = st.builds(
    lambda op, v: Cond(
        "c_nationkey",
        "in_select",
        Select(
            table="nation",
            columns=[Col("n_nationkey")],
            filter=[Cond("n_regionkey", op, v)],
        ),
    ),
    st.sampled_from(["eq", "ne", "lt", "ge"]),
    st.integers(0, 4),
)
_exists_cond = st.builds(
    lambda op, v: Exists(
        Select(
            table="nation",
            columns=[Col("n_name")],
            filter=[Cond("n_regionkey", op, v)],
        ),
        on=(("c_nationkey", "n_nationkey"),),
    ),
    st.sampled_from(["eq", "lt", "ge"]),
    st.integers(0, 4),
)
_cond = st.one_of(
    _num_cond, _in_cond, _between_cond, _like_cond, _subq_cond, _exists_cond
)

# table-qualified conds (Cond.tbl) — both backends must resolve the
# qualifier identically on joins (ADVICE round 1)
_qual_cust_cond = st.builds(
    Cond,
    col=st.sampled_from(NUM_COLS),
    op=st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"]),
    value=st.integers(-500, 1500),
    tbl=st.just("customer"),
)
_qual_nation_cond = st.builds(
    Cond,
    col=st.just("n_regionkey"),
    op=st.sampled_from(["eq", "lt", "ge"]),
    value=st.integers(0, 4),
    tbl=st.just("nation"),
)
_join_cond = st.one_of(_cond, _qual_cust_cond, _qual_nation_cond)


@st.composite
def _tokens(draw, depth=0, cond=_cond):
    def operand():
        if depth < 1 and draw(st.booleans()) and draw(st.booleans()):
            return Nest(draw(_tokens(depth + 1, cond)))
        return draw(cond)

    out = []
    if draw(st.booleans()):
        out.append(NOT)
    out.append(operand())
    for _ in range(draw(st.integers(0, 2))):
        out.append(draw(st.sampled_from([AND, OR])))
        if draw(st.booleans()):
            out.append(NOT)
        out.append(operand())
    return out


@st.composite
def _selects(draw):
    if draw(st.integers(0, 4)) == 0:
        # window variant (r8): one WinCol over a deterministic total
        # order (unique c_custkey tiebreak), integer operands only so
        # both engines agree bit-for-bit; ranking windows may QUALIFY
        part = draw(st.sampled_from(["c_nationkey", "c_mktsegment"]))
        fn = draw(
            st.sampled_from(
                ["row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
                 "sum", "lag", "ntile", "first_value", "last_value"]
            )
        )
        order_in = (Order("c_acctbal", desc=draw(st.booleans())), Order("c_custkey"))
        if fn == "sum":
            w = WinCol(
                "sum",
                col=Col("c_custkey"),
                partition_by=(part,),
                order=order_in,
                frame=("rows", "unbounded_preceding", "current"),
                alias="wv",
            )
        elif fn == "lag":
            w = WinCol(
                "lag", col=Col("c_custkey"), partition_by=(part,),
                order=order_in, args=(1, -1), alias="wv",
            )
        elif fn == "ntile":
            w = WinCol(
                "ntile", partition_by=(part,), order=order_in,
                args=(draw(st.integers(1, 5)),), alias="wv",
            )
        elif fn in ("first_value", "last_value"):
            w = WinCol(
                fn, col=Col("c_custkey"), partition_by=(part,), order=order_in,
                alias="wv",
            )
        else:
            w = WinCol(fn, partition_by=(part,), order=order_in, alias="wv")
        qualify = None
        if fn in ("row_number", "rank", "dense_rank") and draw(st.booleans()):
            qualify = [Cond("wv", "le", draw(st.integers(1, 5)))]
        # half the window draws run over a FROM-subquery (r8): an
        # inner per-key aggregate feeds the outer window — the
        # aggregate-then-window composition
        if draw(st.booleans()):
            inner = Select(
                table="customer",
                columns=[
                    Col(part),
                    FnCol("count", Col("c_custkey"), alias="c_acctbal"),
                    FnCol("min", Col("c_custkey"), alias="c_custkey"),
                ],
                group_by=[part],
                filter=draw(st.none() | _tokens()),
            )
            sel = Select(
                table=inner,
                columns=[Col("c_custkey"), Col(part), w],
                qualify=qualify,
            )
        else:
            sel = Select(
                table="customer",
                columns=[Col("c_custkey"), Col(part), w],
                filter=draw(st.none() | _tokens()),
                qualify=qualify,
            )
        return Select.from_json(sel.to_json())  # serde round-trip in the fuzz
    if draw(st.integers(0, 3)) == 0:
        # join variant: customer ⋈ nation, mixed-side projection
        return Select(
            table="customer",
            columns=[
                Col("c_custkey", tbl="customer"),
                Col("n_name", tbl="nation"),
                Col("c_acctbal", tbl="customer"),
            ],
            joins=[
                Join(
                    "nation",
                    [("c_nationkey", "n_nationkey")],
                    draw(st.sampled_from(["inner", "left"])),
                )
            ],
            filter=draw(st.none() | _tokens(cond=_join_cond)),
            order=[Order("c_custkey")],
            limit=draw(st.none() | st.integers(1, 50)),
        )
    grouped = draw(st.booleans())
    if grouped:
        keys = draw(
            st.lists(st.sampled_from(["c_nationkey", "c_mktsegment"]), min_size=1, max_size=2, unique=True)
        )
        columns = [Col(k) for k in keys] + [
            FnCol("count", Col("c_custkey"), alias="n"),
            FnCol("max", Col("c_acctbal"), alias="mx"),
            FnCol("min", Col("c_custkey"), alias="mn"),
            FnCol("count_distinct", Col("c_mktsegment"), alias="nseg"),
        ]
        order = [Order(k) for k in keys]
        # having over the count alias (→ substituted aggregate expr in
        # SQL) and/or a raw group key — int comparisons only, so no
        # float-boundary flake between engines
        having = draw(
            st.none()
            | st.builds(
                lambda op, v: [Cond("n", op, v)],
                st.sampled_from(["ge", "gt", "le", "lt", "ne"]),
                st.integers(0, 40),
            )
            | st.builds(
                lambda v1, v2: [Cond("n", "ge", v1), AND, Cond("mn", "lt", v2)],
                st.integers(0, 30),
                st.integers(1, 1500),
            )
        )
        return Select(
            table="customer",
            columns=columns,
            filter=draw(st.none() | _tokens()),
            group_by=keys,
            order=order,
            having=having,
        )
    columns = [Col(c) for c in draw(
        st.lists(st.sampled_from(NUM_COLS + STR_COLS), min_size=1, max_size=4, unique=True)
    )]
    # r9: scalar-fn projections join the fuzz — trim/substr/replace/
    # lower/upper/char_length/abs over the same corpus, each an
    # executable golden test of compiler ⇄ sqlgen fn parity
    columns += draw(st.lists(_scalar_fncols, max_size=2, unique_by=lambda f: f.alias))
    # deterministic total order so limit/offset slices agree
    order = [Order("c_custkey")] if draw(st.booleans()) else []
    return Select(
        table="customer",
        columns=columns,
        filter=draw(st.none() | _tokens()),
        order=order,
        limit=draw(st.none() | st.integers(1, 50)) if order else None,
        offset=draw(st.none() | st.integers(0, 20)) if order else None,
        # DISTINCT only on the unordered branch: both engines require
        # ORDER BY columns to appear in a DISTINCT projection
        distinct=draw(st.booleans()) if not order else False,
    )



# r9: scalar FnCol projection strategies (aliased so display names are
# deterministic and unique per draw)
_scalar_fncols = st.one_of(
    st.builds(lambda c: FnCol("trim", Col(c), alias=f"tr_{c}"), st.sampled_from(STR_COLS)),
    st.builds(lambda c: FnCol("lower", Col(c), alias=f"lo_{c}"), st.sampled_from(STR_COLS)),
    st.builds(lambda c: FnCol("upper", Col(c), alias=f"up_{c}"), st.sampled_from(STR_COLS)),
    st.builds(
        lambda c, a, n: FnCol("substr", Col(c), args=(a, n), alias=f"su_{c}_{a}_{n}"),
        st.sampled_from(STR_COLS), st.integers(1, 5), st.integers(1, 8),
    ),
    st.builds(
        lambda c, f: FnCol("replace", Col(c), args=(f, "_"), alias=f"re_{c}_{ord(f)}"),
        st.sampled_from(STR_COLS), st.sampled_from(["a", "e", "#", "0"]),
    ),
    st.builds(lambda c: FnCol("char_length", Col(c), alias=f"cl_{c}"), st.sampled_from(STR_COLS)),
    st.builds(lambda: FnCol("abs", Col("c_acctbal"), alias="ab_bal")),
)

@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    con.execute(f"CREATE VIEW nation AS SELECT * FROM '{SF}/nation.parquet'")
    return con


@st.composite
def _compounds(draw):
    from fabrix_spark.plans import Compound

    def operand():
        return Select(
            table="customer",
            columns=[Col("c_custkey"), Col("c_nationkey")],
            filter=draw(st.none() | _tokens()),
        )

    cp = Compound(
        op=draw(
            st.sampled_from(
                ["union", "union_all", "intersect", "intersect_all", "except", "except_all"]
            )
        ),
        selects=[operand() for _ in range(draw(st.integers(2, 3)))],
    )
    return Compound.from_json(cp.to_json())  # serde round-trip in the fuzz


@given(cp=_compounds())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compound_compiler_and_sqlgen_agree(spark, duck, cp):
    from fabrix_spark.plans import compile_compound, render_compound

    spark_rows = sorted(
        map(repr, (tuple(r) for r in compile_compound(cp, ParquetDirProvider(spark, SF)).collect()))
    )
    duck_rows = sorted(
        map(repr, (tuple(r) for r in duck.execute(render_compound(cp)).fetchall()))
    )
    assert spark_rows == duck_rows


@pytest.mark.slow
@given(sel=_selects())
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compiler_and_sqlgen_agree(spark, duck, sel):
    spark_rows = [tuple(r) for r in compile_select(sel, ParquetDirProvider(spark, SF)).collect()]
    duck_rows = [tuple(r) for r in duck.execute(render_select(sel)).fetchall()]
    if sel.order and (sel.limit is None and sel.offset is None):
        spark_rows, duck_rows = sorted(map(repr, spark_rows)), sorted(map(repr, duck_rows))
    elif not sel.order:
        spark_rows, duck_rows = sorted(map(repr, spark_rows)), sorted(map(repr, duck_rows))
    else:
        spark_rows, duck_rows = list(map(repr, spark_rows)), list(map(repr, duck_rows))
    assert spark_rows == duck_rows


@pytest.fixture(scope="module")
def duck_ex(spark):
    from fabrix_spark.sources.sql import SqlExecutor

    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return SqlExecutor(spark, lambda: con, dialect="duckdb")


@pytest.mark.slow
@given(sel=_selects())
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_live_duckdb_executor_agrees_with_compiler(spark, duck_ex, sel):
    """Third-backend differential fuzz: the FULL SqlExecutor path
    (dialect-rendered SQL, live DuckDB execution, catalog-driven
    schema, Arrow back into Spark) must agree with the Spark DataFrame
    compiler on every random Select — this exercises the executor
    end-to-end, not just the SQL string."""
    spark_rows = [tuple(r) for r in compile_select(sel, ParquetDirProvider(spark, SF)).collect()]
    ex_rows = [tuple(r) for r in duck_ex.select(sel).df.collect()]
    if sel.order and (sel.limit is not None or sel.offset is not None):
        spark_rows, ex_rows = list(map(repr, spark_rows)), list(map(repr, ex_rows))
    else:
        spark_rows, ex_rows = sorted(map(repr, spark_rows)), sorted(map(repr, ex_rows))
    assert spark_rows == ex_rows
