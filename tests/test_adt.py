"""ADT serde + golden SQL strings + compiler vs DuckDB oracle.

Mirrors the reference's golden-string SQL tests
(fabrix-sql/src/builder/query_dml.rs:89-270) and ADT JSON serde tests
(sql_adt.rs:1031-1139), then goes further: every compiled DataFrame is
checked against DuckDB running the rendered SQL on the same parquet.
"""

import duckdb
import pytest

from fabrix_spark.plans import (
    AND,
    Col,
    Cond,
    FnCol,
    Join,
    Nest,
    NOT,
    OR,
    Order,
    ParquetDirProvider,
    Select,
    compile_select,
    render_select,
)
from fabrix_spark.plans.adt import validate_expressions


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _assert_same(df, sf_dir, sql, ordered=False):
    got = _rows(df)
    want = _oracle(sf_dir, sql)
    if not ordered:
        got, want = sorted(got, key=repr), sorted(want, key=repr)
    assert got == want, f"mismatch for {sql}\nspark={got[:5]}\nduck={want[:5]}"


def test_select_json_roundtrip():
    sel = Select(
        table="lineitem",
        columns=[Col("l_orderkey"), FnCol("sum", Col("l_quantity"), alias="sum_qty")],
        filter=[
            Cond("l_quantity", "lt", 24.0),
            AND,
            Nest([Cond("l_returnflag", "eq", "A"), OR, Cond("l_returnflag", "eq", "R")]),
        ],
        group_by=["l_orderkey"],
        order=[Order("l_orderkey")],
        limit=10,
        offset=5,
    )
    again = Select.from_json(sel.to_json())
    assert again.to_json() == sel.to_json()


def test_select_json_roundtrip_distinct_having():
    sel = Select(
        table="orders",
        columns=[Col("o_custkey"), FnCol("count", Col("o_orderkey"), alias="n")],
        group_by=["o_custkey"],
        having=[Cond("n", "ge", 5), AND, Cond("o_custkey", "lt", 100)],
        distinct=True,
    )
    again = Select.from_json(sel.to_json())
    assert again.to_json() == sel.to_json()
    assert again.distinct and len(again.having) == 3


def test_having_requires_group_by():
    with pytest.raises(ValueError, match="group_by"):
        Select(table="orders", columns=[Col("o_custkey")], having=[Cond("o_custkey", "gt", 1)])


def test_having_unknown_name_is_loud(spark, sf_dir):
    from fabrix_spark.plans import ParquetDirProvider, compile_select

    sel = Select(
        table="orders",
        columns=[Col("o_custkey"), FnCol("count", Col("o_orderkey"), alias="n")],
        group_by=["o_custkey"],
        having=[Cond("nope", "ge", 5)],
    )
    with pytest.raises(ValueError, match="nope"):
        compile_select(sel, ParquetDirProvider(spark, sf_dir))


def test_golden_sql_distinct_having():
    sel = Select(
        table="orders",
        columns=[
            Col("o_custkey"),
            FnCol("count", Col("o_orderkey"), alias="n"),
        ],
        group_by=["o_custkey"],
        having=[Cond("n", "ge", 5), AND, Cond("o_custkey", "lt", 100)],
        order=[Order("o_custkey")],
    )
    assert render_select(sel) == (
        "SELECT o_custkey, count(o_orderkey) AS n FROM orders "
        "GROUP BY o_custkey HAVING count(o_orderkey) >= 5 AND o_custkey < 100 "
        "ORDER BY o_custkey ASC"
    )
    dsel = Select(
        table="customer",
        columns=[Col("c_mktsegment")],
        distinct=True,
    )
    assert render_select(dsel) == "SELECT DISTINCT c_mktsegment FROM customer"


def test_golden_sql_shape():
    sel = Select(
        table="orders",
        columns=[Col("o_orderkey"), Col("o_totalprice", alias="price")],
        filter=[
            Cond("o_orderstatus", "eq", "F"),
            OR,
            Nest([Cond("o_totalprice", "ge", 1000.0), AND, Cond("o_orderpriority", "like", "1%")]),
        ],
        order=[Order("o_orderkey", desc=True)],
        limit=3,
        offset=1,
    )
    assert render_select(sel) == (
        "SELECT o_orderkey, o_totalprice AS price FROM orders "
        "WHERE o_orderstatus = 'F' OR (o_totalprice >= 1000.0 AND o_orderpriority LIKE '1%') "
        "ORDER BY o_orderkey DESC LIMIT 3 OFFSET 1"
    )


def test_filter_fsm_rejects_illegal():
    with pytest.raises(ValueError):
        validate_expressions([AND, Cond("a", "eq", 1)])
    with pytest.raises(ValueError):
        validate_expressions([Cond("a", "eq", 1), Cond("b", "eq", 2)])
    with pytest.raises(ValueError):
        validate_expressions([Cond("a", "eq", 1), AND])
    with pytest.raises(ValueError):
        validate_expressions([NOT])
    # legal: NOT over nest, reference bd.rs:301-318
    validate_expressions([NOT, Nest([Cond("a", "eq", 1), OR, Cond("b", "eq", 2)])])


def test_compile_scan_filter_order_limit(spark, sf_dir):
    sel = Select(
        table="lineitem",
        columns=[Col("l_orderkey"), Col("l_quantity"), Col("l_returnflag")],
        filter=[
            Cond("l_quantity", "between", (10.0, 20.0)),
            AND,
            NOT,
            Cond("l_returnflag", "eq", "N"),
        ],
        order=[Order("l_orderkey"), Order("l_quantity", desc=True)],
        limit=50,
        offset=10,
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    # offset/limit after an ORDER BY is deterministic given a total order;
    # add tiebreak-free comparison by comparing as multisets of rows
    _assert_same(df, sf_dir, render_select(sel), ordered=False)


def test_compile_in_like_isnull(spark, sf_dir):
    sel = Select(
        table="orders",
        columns=[Col("o_orderkey"), Col("o_orderpriority")],
        filter=[
            Cond("o_orderpriority", "in", ["1-URGENT", "2-HIGH"]),
            AND,
            Cond("o_orderstatus", "ne", "X"),
        ],
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    _assert_same(df, sf_dir, render_select(sel))


def test_compile_groupby_aggs(spark, sf_dir):
    sel = Select(
        table="lineitem",
        columns=[
            Col("l_returnflag"),
            FnCol("count", Col("l_orderkey"), alias="n"),
            FnCol("max", Col("l_quantity"), alias="max_qty"),
            FnCol("min", Col("l_quantity"), alias="min_qty"),
        ],
        group_by=["l_returnflag"],
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    _assert_same(df, sf_dir, render_select(sel))


def test_compile_join(spark, sf_dir):
    sel = Select(
        table="orders",
        columns=[
            Col("o_orderkey", tbl="orders"),
            Col("c_name", tbl="customer"),
        ],
        joins=[Join("customer", [("o_custkey", "c_custkey")], "inner")],
        filter=[Cond("o_totalprice", "gt", 50000.0, tbl="orders")],
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    _assert_same(df, sf_dir, render_select(sel))


def test_compile_scalar_fns(spark, sf_dir):
    sel = Select(
        table="customer",
        columns=[
            Col("c_custkey"),
            FnCol("upper", Col("c_mktsegment"), alias="seg_u"),
            FnCol("lower", Col("c_name"), alias="name_l"),
            FnCol("char_length", Col("c_name"), alias="name_len"),
            FnCol("abs", Col("c_acctbal"), alias="bal_abs"),
            FnCol("cast", Col("c_custkey"), ("string",), alias="key_s"),
        ],
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    _assert_same(df, sf_dir, render_select(sel).replace("AS string", "AS varchar"))


def test_qualified_cond_on_shared_column_name(spark, sf_dir):
    """Cond.tbl must qualify the Spark-side reference too: nation and
    region both expose a *key column whose bare name the compiler can
    resolve only through the table alias when both sides carry it."""
    sel = Select(
        table="nation",
        columns=[
            Col("n_name", tbl="nation"),
            Col("r_name", tbl="region"),
        ],
        joins=[Join("region", [("n_regionkey", "r_regionkey")], "inner")],
        filter=[Cond("n_regionkey", "in", [0, 1], tbl="nation")],
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    _assert_same(df, sf_dir, render_select(sel))


def test_grouped_select_aliased_key_and_scalar_fn(spark, sf_dir):
    """Group keys may be projected with an alias or through a scalar
    function — those apply AFTER aggregation (the raw key is what was
    grouped on)."""
    sel = Select(
        table="customer",
        columns=[
            Col("c_mktsegment", alias="segment"),
            FnCol("count", Col("c_custkey"), alias="n"),
        ],
        group_by=["c_mktsegment"],
    )
    df = compile_select(sel, ParquetDirProvider(spark, sf_dir))
    assert df.columns == ["segment", "n"]
    _assert_same(df, sf_dir, render_select(sel))

    sel2 = Select(
        table="customer",
        columns=[
            FnCol("lower", Col("c_mktsegment"), alias="seg_lower"),
            FnCol("max", Col("c_acctbal"), alias="max_bal"),
        ],
        group_by=["c_mktsegment"],
    )
    df2 = compile_select(sel2, ParquetDirProvider(spark, sf_dir))
    assert df2.columns == ["seg_lower", "max_bal"]
    got = {r["seg_lower"] for r in df2.collect()}
    assert got and all(s == s.lower() for s in got)
