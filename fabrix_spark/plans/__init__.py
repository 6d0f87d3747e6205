from .adt import (
    AND,
    Col,
    Cond,
    Delete,
    FnCol,
    Join,
    Nest,
    NOT,
    OR,
    Order,
    Select,
    with_primary_key,
)
from .compiler import ParquetDirProvider, compile_filter, compile_select, compile_select_fx
from .sqlgen import render_delete, render_filter, render_select

__all__ = [
    "AND",
    "Col",
    "Cond",
    "Delete",
    "FnCol",
    "Join",
    "Nest",
    "NOT",
    "OR",
    "Order",
    "Select",
    "with_primary_key",
    "ParquetDirProvider",
    "compile_filter",
    "compile_select",
    "compile_select_fx",
    "render_delete",
    "render_filter",
    "render_select",
]
