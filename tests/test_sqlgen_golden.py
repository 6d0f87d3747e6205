"""Golden-string SQL tests — the reference's own strategy
(fabrix-sql/src/builder/query_dml.rs:106-269, mutation_dml.rs:105-247
assert exact rendered SQL per dialect). Ours additionally EXECUTE the
ANSI rendering against DuckDB in the oracle harness; these pin the
dialect-specific text form."""

from fabrix_spark.plans.adt import AND, Col, Cond, Delete, FnCol, Nest, OR, Order, Select
from fabrix_spark.plans.sqlgen import (
    render_delete,
    render_insert,
    render_select,
    render_update_by_key,
)

CANONICAL = Select(
    table="test",
    columns=[Col("v1"), Col("v2"), FnCol("sum", Col("v3"), alias="v3_sum")],
    filter=[
        Cond("ord", "eq", 15),
        OR,
        Nest([Cond("names", "eq", "X"), AND, Cond("val", "ge", 10.0)]),
    ],
    group_by=["v1", "v2"],
    order=[Order("v1"), Order("v2", desc=True)],
    limit=10,
    offset=5,
)


def test_golden_ansi():
    assert render_select(CANONICAL) == (
        "SELECT v1, v2, sum(v3) AS v3_sum FROM test "
        "WHERE ord = 15 OR (names = 'X' AND val >= 10.0) "
        "GROUP BY v1, v2 ORDER BY v1 ASC, v2 DESC LIMIT 10 OFFSET 5"
    )


def test_golden_mysql_backticks():
    sql = render_select(CANONICAL, dialect="mysql")
    assert sql.startswith("SELECT `v1`, `v2`, sum(`v3`) AS `v3_sum` FROM `test`")
    assert "`names` = 'X'" in sql


def test_golden_postgres_quotes():
    sql = render_select(CANONICAL, dialect="postgres")
    assert sql.startswith('SELECT "v1", "v2", sum("v3") AS "v3_sum" FROM "test"')


def test_golden_insert():
    sql = render_insert("t", ["id", "name"], [(1, "a"), (2, "O'x")], dialect="postgres")
    assert sql == 'INSERT INTO "t" ("id", "name") VALUES (1, \'a\'), (2, \'O\'\'x\')'


def test_golden_update_by_key():
    stmts = render_update_by_key(
        "t", ["id", "name", "val"], [(1, "a", 1.5), (2, "b", 2.5)], key="id", dialect="postgres"
    )
    assert stmts == [
        'UPDATE "t" SET "name" = \'a\', "val" = 1.5 WHERE "id" = 1',
        'UPDATE "t" SET "name" = \'b\', "val" = 2.5 WHERE "id" = 2',
    ]


def test_golden_delete():
    sql = render_delete(Delete(table="t", filter=[Cond("id", "in", [1, 2])]), dialect="mysql")
    assert sql == "DELETE FROM `t` WHERE `id` IN (1, 2)"


def test_dialect_state_does_not_leak():
    render_select(CANONICAL, dialect="mysql")
    # a following default render must be back to bare/ANSI idents
    assert render_select(CANONICAL).startswith("SELECT v1, v2")


def test_render_filter_dialect_param():
    from fabrix_spark.plans.sqlgen import render_filter

    toks = [Cond("weird col", "eq", 1)]
    assert render_filter(toks, dialect="mysql") == "`weird col` = 1"
    assert render_filter(toks) == '"weird col" = 1'
