"""Scalar/aggregate function registry — the reference's function
surface plus the families it lacks.

Reference functions (fabrix-sql/src/builder/sql_adt.rs:220-246,
compiled at bd.rs:330-435): aggregates Max/Min/Sum/Avg/Count and
scalars Abs/IfNull/Cast/Coalesce/CharLength/Lower/Upper. Everything
else here is the §2.11 extension set the reference cannot express —
regex, date math, arrays, maps, JSON, approximate aggregates — each a
built-in JVM expression (whole-stage codegen; never a Python UDF).

``fn(name)`` returns the builder so the ADT layer and user code share
one registry; unknown names raise with the candidates listed.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["FUNCTIONS", "fn", "apply_fn"]


def _ifnull(col: Column, default: Any) -> Column:
    return F.coalesce(col, F.lit(default))


def _cast(col: Column, t: str) -> Column:
    return col.cast(t)


FUNCTIONS: dict[str, Callable[..., Column]] = {
    # -- reference aggregates (sql_adt.rs:222-232) ---------------------
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "avg": F.avg,
    "count": F.count,
    # -- reference scalars (sql_adt.rs:230-246) ------------------------
    "abs": F.abs,
    "ifnull": _ifnull,
    "cast": _cast,
    "coalesce": F.coalesce,
    "char_length": F.length,
    "lower": F.lower,
    "upper": F.upper,
    # -- string / regex (§2.11) ----------------------------------------
    "concat": F.concat,
    "concat_ws": F.concat_ws,
    "substring": F.substring,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "lpad": F.lpad,
    "rpad": F.rpad,
    "replace": F.replace,
    "regexp_extract": F.regexp_extract,
    "regexp_replace": F.regexp_replace,
    "split": F.split,
    "format_string": F.format_string,
    "initcap": F.initcap,
    "reverse": F.reverse,
    # -- math ----------------------------------------------------------
    "round": F.round,
    "floor": F.floor,
    "ceil": F.ceil,
    "sqrt": F.sqrt,
    "exp": F.exp,
    "ln": F.log,
    "log10": F.log10,
    "pow": F.pow,
    # SQL MOD keeps the dividend's sign (mod(-7, 3) = -1); pmod is the
    # always-positive variant (pmod(-7, 3) = 2) — they are different
    # functions, and aliasing "mod" to pmod silently flips negatives
    "mod": lambda a, b: a % b,
    "pmod": F.pmod,
    "sign": F.signum,
    "greatest": F.greatest,
    "least": F.least,
    # -- date / time ---------------------------------------------------
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "dayofweek": F.dayofweek,
    "date_trunc": F.date_trunc,
    "date_add": F.date_add,
    "date_sub": F.date_sub,
    "datediff": F.datediff,
    "last_day": F.last_day,
    "unix_timestamp": F.unix_timestamp,
    "to_date": F.to_date,
    # -- array ---------------------------------------------------------
    "size": F.size,
    "array_contains": F.array_contains,
    "array_distinct": F.array_distinct,
    "sort_array": F.sort_array,
    "element_at": F.element_at,
    "slice": F.slice,
    "array_union": F.array_union,
    "array_intersect": F.array_intersect,
    "array_except": F.array_except,
    "flatten": F.flatten,
    "arrays_zip": F.arrays_zip,
    "transform": F.transform,
    "filter": F.filter,
    "aggregate": F.aggregate,
    "zip_with": F.zip_with,
    "explode": F.explode,
    # -- map / struct / json -------------------------------------------
    "map_keys": F.map_keys,
    "map_values": F.map_values,
    "create_map": F.create_map,
    "struct": F.struct,
    "to_json": F.to_json,
    "from_json": F.from_json,
    "get_json_object": F.get_json_object,
    "json_tuple": F.json_tuple,
    # -- conditional ---------------------------------------------------
    "when": F.when,
    "nullif": F.nullif,
    # -- approximate / statistical aggregates --------------------------
    "approx_count_distinct": F.approx_count_distinct,
    "percentile_approx": F.percentile_approx,
    "stddev": F.stddev_samp,
    "variance": F.var_samp,
    "corr": F.corr,
    "skewness": F.skewness,
    "kurtosis": F.kurtosis,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    # -- hashing / ids -------------------------------------------------
    "md5": F.md5,
    "sha2": F.sha2,
    "xxhash64": F.xxhash64,
    "crc32": F.crc32,
    "monotonically_increasing_id": F.monotonically_increasing_id,
}


def fn(name: str) -> Callable[..., Column]:
    """Look up a function builder by its fabrix-style name."""
    try:
        return FUNCTIONS[name]
    except KeyError:
        import difflib

        hint = difflib.get_close_matches(name, FUNCTIONS, n=3)
        raise ValueError(f"unknown function {name!r}" + (f"; did you mean {hint}?" if hint else ""))


def apply_fn(name: str, *args: Any, **kwargs: Any) -> Column:
    return fn(name)(*args, **kwargs)
