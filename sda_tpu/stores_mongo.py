"""MongoDB storage backend (optional; requires pymongo).

The reference ships a Mongo production store (`sda-server-store-mongodb`)
whose one special trick is pushing the snapshot transposition into a Mongo
aggregation pipeline (/root/reference/server-store-mongodb/src/
aggregations.rs:164-195) because the jfs default transposes in RAM.

Here the transposition has a better home — the TPU engine's device-side
``all_to_all`` (:mod:`sda_tpu.parallel`) — so the Mongo backend is a thin
KV adapter over the shared :class:`sda_tpu.stores.Stores` logic: one
document per record, one collection per namespace, unique index on ``_k``.
All store semantics (compare-on-conflict create, durable job queues,
snapshot freezing) are inherited and therefore covered by the same tests.
"""

from __future__ import annotations

from sda_tpu.stores import Stores, _KV

__all__ = ["MongoStores", "new_mongo_server"]


class _MongoKV(_KV):
    def __init__(self, url: str, db_name: str = "sda"):
        try:
            import pymongo
        except ImportError as e:
            raise ImportError(
                "MongoDB store requires pymongo (not installed in this environment)"
            ) from e
        self._client = pymongo.MongoClient(url)
        self._db = self._client[db_name]
        self._indexed: set[str] = set()

    def _coll(self, ns: str):
        name = ns.replace("/", "__")
        coll = self._db[name]
        if name not in self._indexed:
            coll.create_index("_k", unique=True, background=True)
            self._indexed.add(name)
        return coll

    def get(self, ns, key):
        doc = self._coll(ns).find_one({"_k": key})
        if doc is None:
            return None
        doc.pop("_id", None)
        doc.pop("_k", None)
        return doc["v"]

    def put(self, ns, key, value):
        self._coll(ns).update_one({"_k": key}, {"$set": {"v": value}}, upsert=True)

    def delete(self, ns, key):
        self._coll(ns).delete_one({"_k": key})

    def keys(self, ns):
        return sorted(d["_k"] for d in self._coll(ns).find({}, {"_k": 1}))


def MongoStores(url: str, db_name: str = "sda") -> Stores:
    return Stores(_MongoKV(url, db_name))


def new_mongo_server(url: str, db_name: str = "sda"):
    from sda_tpu.server import SdaServer, SdaServerService

    return SdaServerService(SdaServer(MongoStores(url, db_name)))
