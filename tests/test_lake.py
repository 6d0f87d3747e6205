"""Lake-table save strategies + the positional/column frame ops."""

import pytest
from pyspark.sql import functions as F

from fabrix_spark.frame import FxFrame
from fabrix_spark.sources.lake import LakeTable, save_lake
from fabrix_spark.sources.sql import SaveStrategy


@pytest.fixture()
def fx(spark):
    return FxFrame.from_series(
        spark,
        {"id": [1, 2, 3, 4], "name": ["a", "b", "c", "d"], "val": [1.5, 2.5, 3.5, 4.5]},
        index="id",
    )


def test_lake_fail_if_exists(spark, fx, tmp_path):
    p = str(tmp_path / "t")
    t = save_lake(spark, p, fx, SaveStrategy.FAIL_IF_EXISTS, index="id")
    assert t.read().height == 4
    with pytest.raises(ValueError, match="FailIfExists"):
        t.save(fx, SaveStrategy.FAIL_IF_EXISTS)


def test_lake_replace_append(spark, fx, tmp_path):
    p = str(tmp_path / "t")
    t = LakeTable(spark, p, index="id")
    t.save(fx, SaveStrategy.REPLACE)
    t.save(fx, SaveStrategy.REPLACE)
    assert t.read().height == 4
    t.save(fx, SaveStrategy.APPEND)
    assert t.read().height == 8


def test_lake_upsert(spark, fx, tmp_path):
    p = str(tmp_path / "t")
    t = LakeTable(spark, p, index="id")
    t.save(fx, SaveStrategy.UPSERT)  # creates
    upd = FxFrame.from_series(
        spark,
        {"id": [3, 4, 5], "name": ["C", "D", "E"], "val": [30.0, 40.0, 50.0]},
        index="id",
    )
    t.save(upd, SaveStrategy.UPSERT)
    rows = {r[0]: (r[1], r[2]) for r in t.read().data()}
    assert len(rows) == 5
    assert rows[3] == ("C", 30.0) and rows[5] == ("E", 50.0) and rows[1] == ("a", 1.5)


def test_lake_partitioned_upsert(spark, tmp_path):
    fx = FxFrame.from_series(
        spark,
        {"id": [1, 2, 3, 4], "part": ["x", "x", "y", "y"], "v": [1.0, 2.0, 3.0, 4.0]},
        index="id",
    )
    p = str(tmp_path / "t")
    t = LakeTable(spark, p, index="id", partition_by=["part"])
    t.save(fx, SaveStrategy.REPLACE)
    upd = FxFrame.from_series(spark, {"id": [4, 5], "part": ["y", "z"], "v": [40.0, 50.0]}, index="id")
    t.upsert(upd)
    rows = {r["id"]: (r["part"], r["v"]) for r in t.read().collect()}
    assert rows == {1: ("x", 1.0), 2: ("x", 2.0), 3: ("y", 3.0), 4: ("y", 40.0), 5: ("z", 50.0)}


def test_lake_delete_where(spark, fx, tmp_path):
    p = str(tmp_path / "t")
    t = save_lake(spark, p, fx, SaveStrategy.REPLACE, index="id")
    n = t.delete_where(F.col("val") > 2.0)
    assert n == 3
    assert sorted(r[0] for r in t.read().data()) == [1]


def test_frame_positional_ops(spark, fx):
    assert fx.tail(2).height == 2
    assert sorted(r[0] for r in fx.remove_slice(1, 2).data()) == [1, 4]
    assert fx.get(0) is not None
    assert fx.contains("name", "c") and not fx.contains("name", "zz")
    assert fx.find_indices("name", "c") == [2]


def test_frame_drop_nulls(spark):
    fx = FxFrame.from_series(spark, {"a": [1, None, 3], "b": ["x", "y", None]})
    assert fx.drop_nulls().height == 1
    assert fx.drop_nulls(subset=["a"]).height == 2


def test_lake_delete_adt(spark, fx, tmp_path):
    from fabrix_spark.plans.adt import Cond, Delete

    p = str(tmp_path / "t")
    t = save_lake(spark, p, fx, SaveStrategy.REPLACE, index="id")
    n = t.delete(Delete(table="t", filter=[Cond("id", "in", [2, 3])]))
    assert n == 2
    assert sorted(r[0] for r in t.read().data()) == [1, 4]


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL (not
    TRUE) must survive — a bare ~cond would silently drop them."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0)], "id long, val double"
    )
    p = str(tmp_path / "t_null")
    t = save_lake(spark, p, df, SaveStrategy.REPLACE, index="id")
    n = t.delete_where(F.col("val") > 2)
    assert n == 1  # only id=1 matches TRUE
    assert sorted(r[0] for r in t.read().data()) == [2, 3]  # NULL row kept


def test_compact_small_files(spark, tmp_path):
    from fabrix_spark.sources.lake import compact

    p = str(tmp_path / "frag")
    # 40 tiny appends → 40+ small files
    base = spark.range(100).withColumnRenamed("id", "k")
    base.repartition(40).write.parquet(p)
    import glob

    assert len(glob.glob(p + "/*.parquet")) >= 40
    before, after = compact(spark, p, target_file_mb=128)
    assert before >= 40 and after <= 2
    got = sorted(r["k"] for r in spark.read.parquet(p).collect())
    assert got == list(range(100))


def test_swap_unreadable_staging_restores_original(spark, tmp_path):
    """_swap_table must never drop the original until the swapped-in
    table proves readable; a corrupt staging dir rolls back."""
    import os

    import pytest

    from fabrix_spark.sources.lake import _swap_table

    p = str(tmp_path / "live")
    spark.range(10).write.parquet(p)
    staging = str(tmp_path / "staging_bad")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-00000.parquet"), "w") as f:
        f.write("not a parquet file")
    with pytest.raises(RuntimeError, match="unreadable"):
        _swap_table(spark, p, staging)
    # original restored intact; bad output preserved for inspection
    assert spark.read.parquet(p).count() == 10
    assert os.path.isdir(staging)
