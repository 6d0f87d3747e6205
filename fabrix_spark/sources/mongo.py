"""MongoDB source: frame-as-document CRUD via the JSON wire formats.

Reference: fabrix-mg — frame CRUD keyed by document id (``find_fx``/
``find_fxs``/``insert_fx``/``update_fx``/``replace_fx``/``delete_fx``/
``delete_fxs``, fabrix-mg/src/dy.rs:247-455), raw doc ops
(dy.rs:22-227), admin (ec.rs:147-190), and a ``SavingCategory``
choosing which wire layout the stored document uses
(Column/Row/Dataset — fabrix/src/sources/mongo/writer.rs:61, formats
§1.7 → ``fabrix_spark.io.wire``).

The codec (frame <-> document) is pure and tested without a server.
The client layer is import-gated on ``pymongo``; at scale the
collection-as-DataFrame path belongs to the Mongo Spark connector —
this class covers the reference's control-plane frame-as-single-
document model.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import SparkSession

from ..frame import FxFrame
from ..io.wire import from_wire, to_wire

__all__ = ["SavingCategory", "frame_to_doc", "doc_to_frame", "MongoExecutor"]


class SavingCategory:
    COLUMN = "column"
    ROW = "row"
    DATASET = "dataset"


def frame_to_doc(fx: FxFrame, category: str = SavingCategory.COLUMN) -> dict:
    """Frame -> Mongo document body (one frame per document, the
    reference's persistence model)."""
    return {"category": category, **to_wire(fx, category)}


def doc_to_frame(spark: SparkSession, doc: dict, category: str | None = None) -> FxFrame:
    cat = category or doc.get("category", SavingCategory.COLUMN)
    return from_wire(spark, doc, cat)


class MongoExecutor:
    """CRUD over a pymongo collection, mirroring MongoExecutor
    (fabrix-mg/src/ec.rs:85-145) + the ``*_fx`` trait surface.

    Constructed from a live ``pymongo.MongoClient`` (or any object with
    the same ``client[db][coll]`` access), so tests can inject
    ``mongomock`` and production injects the real driver.
    """

    def __init__(self, spark: SparkSession, client: Any, database: str, collection: str):
        self.spark = spark
        self.client = client
        self.database = database
        self.collection = collection

    @classmethod
    def connect(cls, spark: SparkSession, conn_str: str, database: str, collection: str):
        try:
            import pymongo  # type: ignore
        except ImportError as e:  # pragma: no cover - driver not in container
            raise ImportError(
                "pymongo is required for MongoExecutor.connect(); "
                "construct with an injected client instead"
            ) from e
        return cls(spark, pymongo.MongoClient(conn_str), database, collection)

    @property
    def _coll(self):
        return self.client[self.database][self.collection]

    # -- admin (ec.rs:147-190) -----------------------------------------
    def show_dbs(self) -> list[str]:
        return list(self.client.list_database_names())

    def show_collections(self) -> list[str]:
        return list(self.client[self.database].list_collection_names())

    def list_indexes(self) -> list[str]:
        return [ix["name"] for ix in self._coll.list_indexes()]

    def create_index(
        self,
        keys: list[tuple[str, int | str]],
        unique: bool = False,
        text: bool = False,
    ) -> str:
        """Single/compound asc(1)/desc(-1)/text index.

        Mirrors the reference surface (fabrix-mg/src/indexes.rs:11-53):
        ``SingleIndex``/``CompoundIndexOptions`` carry ``(key, dir)``
        pairs plus ``unique`` and ``text`` flags. ``text=True`` turns
        every key's direction into Mongo's ``"text"`` specifier; a
        per-key direction of the string ``"text"`` does the same for
        just that key (mixed compound text indexes are legal in Mongo).
        """
        spec: list[tuple[str, int | str]] = []
        for name, direction in keys:
            d: int | str = "text" if text else direction
            if d not in (1, -1, "text"):
                raise ValueError(
                    f"index direction must be 1, -1 or 'text'; got {direction!r} for {name!r}"
                )
            spec.append((name, d))
        return self._coll.create_index(spec, unique=unique)

    # -- raw doc ops (dy.rs:22-227) ------------------------------------
    def find_one(self, query: dict) -> dict | None:
        return self._coll.find_one(query)

    def find_many(self, query: dict) -> list[dict]:
        return list(self._coll.find(query))

    def insert_one(self, doc: dict) -> Any:
        return self._coll.insert_one(doc).inserted_id

    def insert_many(self, docs: Iterable[dict]) -> list[Any]:
        return self._coll.insert_many(list(docs)).inserted_ids

    def replace_one(self, query: dict, doc: dict) -> int:
        return self._coll.replace_one(query, doc).modified_count

    def delete_one(self, query: dict) -> int:
        return self._coll.delete_one(query).deleted_count

    def delete_many(self, query: dict) -> int:
        return self._coll.delete_many(query).deleted_count

    # -- frame-as-document (dy.rs:247-455) -----------------------------
    def insert_fx(self, fx: FxFrame, category: str = SavingCategory.COLUMN) -> Any:
        return self.insert_one(frame_to_doc(fx, category))

    def find_fx(self, id: Any, category: str | None = None) -> FxFrame:
        doc = self.find_one({"_id": id})
        if doc is None:
            raise KeyError(f"no frame document with id {id!r}")
        return doc_to_frame(self.spark, doc, category)

    def find_fxs(self, ids: Iterable[Any], category: str | None = None) -> list[FxFrame]:
        docs = self.find_many({"_id": {"$in": list(ids)}})
        return [doc_to_frame(self.spark, d, category) for d in docs]

    def update_fx(self, id: Any, fx: FxFrame, category: str = SavingCategory.COLUMN) -> int:
        return self.replace_one({"_id": id}, frame_to_doc(fx, category))

    replace_fx = update_fx

    def delete_fx(self, id: Any) -> int:
        return self.delete_one({"_id": id})

    def delete_fxs(self, ids: Iterable[Any]) -> int:
        return self.delete_many({"_id": {"$in": list(ids)}})
