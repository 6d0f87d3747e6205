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
)
from .compiler import ParquetDirProvider, compile_filter, compile_select
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
    "ParquetDirProvider",
    "compile_filter",
    "compile_select",
    "render_delete",
    "render_filter",
    "render_select",
]
