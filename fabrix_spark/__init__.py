"""fabrix_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Jacobbishopxy/fabrix, re-expressed
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout:
- ``types``   — Value/ValueType layer (SURVEY.md §1.1-1.2)
- ``frame``   — FxFrame: DataFrame + index tag (§1.4, §2.1-2.2)
- ``plans``   — Select query ADT + DataFrame compiler + SQL renderer (§2.3)
- ``sources`` — readers/writers with fabrix option structs (§2.6) + save strategies (§2.4)
- ``operators`` — dedup / similarity / text analysis / multimodal (north-star ops)
- ``streaming`` — micro-batch ingestion & event-time analytics (§2.7)
- ``io``      — JSON wire formats for frames (§1.7)
- ``pipe``    — Dispatcher/DynConn cross-source ETL (§2.9)
"""

from .frame import FxFrame, IndexTag
from .pipe import Dispatcher, DynConn, dispatch
from .plans import Select, compile_select, render_select
from .plans.adt import Delete
from .session import get_spark, tune_session
from .types import FieldInfo, ValueType

__version__ = "0.1.0"

__all__ = [
    "Delete",
    "Dispatcher",
    "DynConn",
    "FieldInfo",
    "FxFrame",
    "IndexTag",
    "Select",
    "ValueType",
    "compile_select",
    "dispatch",
    "get_spark",
    "render_select",
    "tune_session",
]
