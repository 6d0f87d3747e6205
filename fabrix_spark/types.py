"""Value / ValueType layer: fabrix's scalar type system on Spark.

Reference semantics: ``fabrix-core/src/value.rs:124-151`` defines a
19-variant scalar enum; ``value.rs:230-250`` the matching ValueType.
Mapping table: SURVEY.md §1.2. Spark has no unsigned ints and no TIME
type, so unsigned types widen to the next signed type and Time is a
ns-since-midnight LongType (documented deviation). Decimal/Uuid/Bytes
— which the reference smuggles into Polars as opaque objects
(value.rs:369-371) — are native here: DecimalType(38,18), StringType
(canonical uuid text), BinaryType.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import enum
import uuid as _uuid
from typing import Any

from pyspark.sql import types as T


class ValueType(enum.Enum):
    """fabrix ValueType (value.rs:229-250), serde-string compatible."""

    BOOL = "bool"
    U8 = "u8"
    U16 = "u16"
    U32 = "u32"
    U64 = "u64"
    I8 = "i8"
    I16 = "i16"
    I32 = "i32"
    I64 = "i64"
    F32 = "f32"
    F64 = "f64"
    DATE = "date"
    TIME = "time"
    DATETIME = "datetime"
    STRING = "string"
    DECIMAL = "decimal"
    UUID = "uuid"
    BYTES = "bytes"
    NULL = "null"


# ValueType -> Spark DataType (SURVEY.md §1.2). Unsigned types widen so no
# value is lost; Time carries ns-since-midnight (value.rs:142) in a long.
_TO_SPARK: dict[ValueType, T.DataType] = {
    ValueType.BOOL: T.BooleanType(),
    ValueType.U8: T.ShortType(),
    ValueType.U16: T.IntegerType(),
    ValueType.U32: T.LongType(),
    ValueType.U64: T.DecimalType(20, 0),
    ValueType.I8: T.ByteType(),
    ValueType.I16: T.ShortType(),
    ValueType.I32: T.IntegerType(),
    ValueType.I64: T.LongType(),
    ValueType.F32: T.FloatType(),
    ValueType.F64: T.DoubleType(),
    ValueType.DATE: T.DateType(),
    ValueType.TIME: T.LongType(),
    ValueType.DATETIME: T.TimestampNTZType(),
    ValueType.STRING: T.StringType(),
    ValueType.DECIMAL: T.DecimalType(38, 18),
    ValueType.UUID: T.StringType(),
    ValueType.BYTES: T.BinaryType(),
    ValueType.NULL: T.NullType(),
}

# Spark DataType class -> ValueType for round-tripping frames back into
# the wire formats (§1.7). Ambiguous mappings resolve to the signed type.
_FROM_SPARK: dict[type, ValueType] = {
    T.BooleanType: ValueType.BOOL,
    T.ByteType: ValueType.I8,
    T.ShortType: ValueType.I16,
    T.IntegerType: ValueType.I32,
    T.LongType: ValueType.I64,
    T.FloatType: ValueType.F32,
    T.DoubleType: ValueType.F64,
    T.DateType: ValueType.DATE,
    T.TimestampNTZType: ValueType.DATETIME,
    T.TimestampType: ValueType.DATETIME,
    T.StringType: ValueType.STRING,
    T.DecimalType: ValueType.DECIMAL,
    T.BinaryType: ValueType.BYTES,
    T.NullType: ValueType.NULL,
}


def to_spark_type(vt: ValueType | str) -> T.DataType:
    if isinstance(vt, str):
        vt = ValueType(vt)
    return _TO_SPARK[vt]


def from_spark_type(dt: T.DataType) -> ValueType:
    vt = _FROM_SPARK.get(type(dt))
    if vt is None:
        # Nested types (array/map/struct) have no fabrix equivalent
        # (SURVEY.md §1.1 "No nested types") — report as bytes-opaque.
        return ValueType.BYTES
    return vt


def infer_value_type(v: Any) -> ValueType:
    """Type of a single Python value, mirroring the reference's
    per-value dtype (value.rs:353-381 From impls)."""
    if v is None:
        return ValueType.NULL
    if isinstance(v, bool):
        return ValueType.BOOL
    if isinstance(v, int):
        return ValueType.I64
    if isinstance(v, float):
        return ValueType.F64
    if isinstance(v, _decimal.Decimal):
        return ValueType.DECIMAL
    if isinstance(v, _uuid.UUID):
        return ValueType.UUID
    if isinstance(v, (bytes, bytearray)):
        return ValueType.BYTES
    if isinstance(v, _dt.datetime):
        return ValueType.DATETIME
    if isinstance(v, _dt.date):
        return ValueType.DATE
    if isinstance(v, _dt.time):
        return ValueType.TIME
    if isinstance(v, str):
        return ValueType.STRING
    raise TypeError(f"unsupported value: {type(v)!r}")


def infer_series_type(values: list[Any]) -> ValueType:
    """First-non-null inference, exactly the reference's
    ``Series::from_values`` rule (series.rs:588-647): the first
    non-null value decides the column type; an all-null column
    defaults to the integer index type (series.rs:643-646)."""
    for v in values:
        if v is not None:
            return infer_value_type(v)
    return ValueType.I64


def normalize_value(v: Any, vt: ValueType, nullable: bool = True) -> Any:
    """Coerce ``v`` to ``vt``'s Python repr; mismatches become null when
    nullable (series.rs:588-591), raise otherwise (strict mode,
    series.rs:1084-1096)."""
    if v is None:
        return None
    actual = infer_value_type(v)
    if actual is vt:
        if vt is ValueType.UUID:
            return str(v)
        if vt is ValueType.TIME:
            t = v
            return ((t.hour * 60 + t.minute) * 60 + t.second) * 1_000_000_000 + t.microsecond * 1000
        if vt is ValueType.BYTES:
            return bytes(v)
        return v
    # numeric widening tolerated (int -> float / decimal)
    if actual is ValueType.I64 and vt in (ValueType.F32, ValueType.F64):
        return float(v)
    if actual is ValueType.I64 and vt is ValueType.DECIMAL:
        return _decimal.Decimal(v)
    if actual is ValueType.DATETIME and vt is ValueType.DATE:
        return v.date()
    if nullable:
        return None
    raise ValueError(f"value {v!r} is {actual}, column is {vt} (strict)")


def schema_from_value_types(names: list[str], vts: list[ValueType], nullable: bool = True) -> T.StructType:
    return T.StructType(
        [T.StructField(n, to_spark_type(vt), nullable) for n, vt in zip(names, vts)]
    )


class FieldInfo:
    """Name + dtype pair (schema.rs:11-15)."""

    __slots__ = ("name", "dtype")

    def __init__(self, name: str, dtype: ValueType | str):
        self.name = name
        self.dtype = ValueType(dtype) if isinstance(dtype, str) else dtype

    def __repr__(self) -> str:  # pragma: no cover
        return f"FieldInfo({self.name!r}, {self.dtype.value})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, FieldInfo)
            and other.name == self.name
            and other.dtype == self.dtype
        )
