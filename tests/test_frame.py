"""FxFrame construction + op surface (fabrix.rs / row.rs / series.rs tests)."""

import pytest

from fabrix_spark.frame import FxFrame
from fabrix_spark.types import ValueType


@pytest.fixture()
def fx(spark):
    return FxFrame.from_series(
        spark,
        {
            "id": [1, 2, 3, 4, 5],
            "name": ["a", "b", "c", "d", "e"],
            "val": [1.5, None, 3.5, 4.5, 5.5],
        },
        index="id",
    )


def test_from_series_inference(fx):
    assert [f.dtype for f in fx.fields] == [ValueType.I64, ValueType.STRING, ValueType.F64]
    assert fx.shape == (5, 3)
    assert fx.index_tag.name == "id"
    assert fx.index_tag.loc == 0


def test_from_rows(spark):
    fx = FxFrame.from_rows(spark, [[1, "x"], [2, "y"]], names=["k", "v"], index="k")
    assert fx.shape == (2, 2)
    assert fx.get_row(2)["v"] == "y"


def test_from_column_values_header(spark):
    fx = FxFrame.from_column_values(spark, [["k", 1, 2], ["v", "x", "y"]], has_header=True)
    assert fx.columns == ["k", "v"]
    assert fx.height == 2


def test_mixed_types_nullified(spark):
    # first-non-null inference; mismatches -> null when nullable
    # (series.rs:588-591)
    fx = FxFrame.from_series(spark, {"a": [1, "oops", 3]})
    vals = [r["a"] for r in fx.collect()]
    assert vals == [1, None, 3]


def test_strict_mode_raises(spark):
    from fabrix_spark.types import normalize_value

    with pytest.raises(ValueError):
        normalize_value("oops", ValueType.I64, nullable=False)


def test_take_cols_rename(fx):
    assert fx.take_cols(["id", "val"]).columns == ["id", "val"]
    assert fx.rename("val", "value").columns == ["id", "name", "value"]
    # index tag follows a rename of the index column
    assert fx.rename("id", "pk").index_tag.name == "pk"


def test_has_null(fx):
    assert fx.has_null()
    assert not fx.index_has_null()
    assert not fx.take_cols(["id", "name"]).has_null()


def test_take_remove_popup_rows(fx):
    assert fx.take_rows([2, 4]).height == 2
    assert fx.remove_rows([2, 4]).height == 3
    popped, kept = fx.popup_rows([1])
    assert popped.height == 1 and kept.height == 4


def test_positional_ops(fx):
    assert fx.slice(1, 2).height == 2
    assert fx.take_rows_by_idx([0, 4]).height == 2
    a, b = fx.split(2)
    assert a.height == 2 and b.height == 3


def test_concat(spark, fx):
    other = FxFrame.from_series(
        spark, {"id": [6], "name": ["f"], "val": [6.5]}, index="id"
    )
    assert fx.vconcat(other).height == 6
    wide = FxFrame.from_series(spark, {"id": [1, 2, 3, 4, 5], "extra": [9, 9, 9, 9, 9]}, index="id")
    h = fx.hconcat(wide)
    assert h.width == 4 and h.height == 5


def test_generate_index(spark):
    fx = FxFrame.from_series(spark, {"x": [10, 20, 30]})
    out = fx.generate_index("idx", dense=True)
    assert out.index_tag.name == "idx"
    assert sorted(r["idx"] for r in out.collect()) == [0, 1, 2]


def test_apply(fx):
    from pyspark.sql import functions as F

    out = fx.apply("val2", F.col("val") * 2)
    row = out.get_row(1)
    assert row["val2"] == 3.0


def test_typed_parquet_roundtrip(spark, tmp_path):
    """Decimal/uuid/bytes — the types the reference smuggles into
    Polars as opaque objects (value.rs:369-371) — are native here and
    must survive a parquet round trip with the mapped Spark types."""
    import datetime as dt
    import decimal
    import uuid

    from fabrix_spark.types import ValueType

    u = uuid.uuid5(uuid.NAMESPACE_DNS, "fabrix")
    fx = FxFrame.from_series(
        spark,
        {
            "id": [1, 2],
            "money": [decimal.Decimal("12.340000000000000001"), None],
            "uid": [u, None],
            "blob": [b"\x00\x01\xff", b""],
            "seen": [dt.datetime(2024, 2, 29, 23, 59, 59, 123456), None],
        },
        index="id",
    )
    # uuid is stored as canonical StringType (SURVEY.md §1.2), so the
    # reflected dtype is STRING — the documented deviation
    assert [f.dtype for f in fx.fields] == [
        ValueType.I64, ValueType.DECIMAL, ValueType.STRING, ValueType.BYTES, ValueType.DATETIME,
    ]
    p = str(tmp_path / "typed")
    fx.df.write.parquet(p)
    back = FxFrame(spark.read.parquet(p), "id")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["money"] == decimal.Decimal("12.340000000000000001")
    assert rows[1]["uid"] == str(u)
    assert bytes(rows[1]["blob"]) == b"\x00\x01\xff"
    assert rows[1]["seen"] == dt.datetime(2024, 2, 29, 23, 59, 59, 123456)
    assert rows[2]["money"] is None and rows[2]["uid"] is None


def test_frame_null_key_rows_survive_key_ops(spark):
    """NULL-key rows must never vanish silently: ~isin is NULL (not
    False) for them, so the pre-fix remove_rows deleted them and
    popup_rows dropped them from BOTH halves of the upsert split."""
    fx = FxFrame.from_series(
        spark,
        {"k": [1, 2, None, 4], "v": ["a", "b", "c", "d"]},
        index="k",
    )
    kept = fx.remove_rows([1, 4])
    assert sorted(r["v"] for r in kept.collect()) == ["b", "c"]

    removed, remaining = fx.popup_rows([2])
    assert sorted(r["v"] for r in removed.collect()) == ["b"]
    # the two halves partition the frame — the NULL-key row is in remaining
    assert sorted(r["v"] for r in remaining.collect()) == ["a", "c", "d"]

    # None in the value list explicitly targets NULL keys
    assert sorted(r["v"] for r in fx.take_rows([None, 1]).collect()) == ["a", "c"]
    assert fx.get_row(None)["v"] == "c"
    assert fx.contains("k", None) is True
    assert fx.remove_rows([None]).df.filter("k IS NULL").count() == 0


def test_frame_ragged_inputs_refused(spark):
    """Ragged construction inputs previously truncated silently via
    zip (from_series) or IndexError'd mid-transpose (from_rows)."""
    import pytest

    with pytest.raises(ValueError, match="ragged series"):
        FxFrame.from_series(spark, {"a": [1, 2, 3], "b": [1]})
    with pytest.raises(ValueError, match="ragged rows"):
        FxFrame.from_rows(spark, [[1, 2], [3]], names=["a", "b"])
    with pytest.raises(ValueError, match="names"):
        FxFrame.from_rows(spark, [[1, 2]], names=["a"])
    with pytest.raises(ValueError, match="header"):
        FxFrame.from_column_values(spark, [[1, 2], []], has_header=True)
