"""A minimal in-memory pymongo-API fake for the Mongo store test lane.

Neither a mongod nor mongomock is available in this environment, so this
implements exactly the API surface :mod:`sda_tpu.stores_mongo` consumes:
``MongoClient``, database/collection access, ``create_index``,
``find_one`` / ``update_one`` / ``delete_one`` / ``find``, and an
``aggregate`` subset covering the transposition pipeline stages the
reference uses (``$match`` with ``$in``, ``$unwind`` with
``includeArrayIndex``, ``$group`` with ``$push``, ``$sort`` —
/root/reference/server-store-mongodb/src/aggregations.rs:164-195).

Install with: ``sys.modules["pymongo"] = tests.fake_pymongo`` before
``sda_tpu.stores_mongo`` first imports pymongo.
"""

from __future__ import annotations

import copy
import itertools
import threading

_counter = itertools.count()


def _get_path(doc, dotted):
    cur = doc
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _set_path(doc, dotted, value):
    parts = dotted.split(".")
    cur = doc
    for part in parts[:-1]:
        cur = cur.setdefault(part, {})
    cur[parts[-1]] = value


def _matches(doc, query):
    for field, cond in query.items():
        got = _get_path(doc, field)
        if isinstance(cond, dict) and any(k.startswith("$") for k in cond):
            for op, arg in cond.items():
                if op == "$in":
                    if got not in arg:
                        return False
                else:
                    raise NotImplementedError(f"fake pymongo: operator {op}")
        elif got != cond:
            return False
    return True


def _resolve(expr, doc):
    """Resolve a '$path' expression against a document."""
    if isinstance(expr, str) and expr.startswith("$"):
        return _get_path(doc, expr[1:])
    return expr


class _Errors:
    """pymongo.errors stand-in (attribute access via the module object)."""

    class PyMongoError(Exception):
        pass

    class DuplicateKeyError(PyMongoError):
        pass


errors = _Errors


class Collection:
    def __init__(self, name):
        self.name = name
        self._docs: dict = {}
        self._unique: set[str] = set()
        self._lock = threading.RLock()

    # ------------------------------------------------------- index / CRUD

    def create_index(self, field, unique=False, background=False):
        if unique:
            with self._lock:
                self._unique.add(field)
        return field

    def insert_one(self, doc):
        with self._lock:
            for field in self._unique:
                val = _get_path(doc, field)
                for other in self._docs.values():
                    if _get_path(other, field) == val:
                        raise _Errors.DuplicateKeyError(
                            f"duplicate key: {field}={val!r}"
                        )
            doc = copy.deepcopy(doc)
            doc.setdefault("_id", next(_counter))
            self._docs[doc["_id"]] = doc

    def find_one(self, query):
        with self._lock:
            for doc in self._docs.values():
                if _matches(doc, query):
                    return copy.deepcopy(doc)
        return None

    def update_one(self, query, update, upsert=False):
        with self._lock:
            for doc in self._docs.values():
                if _matches(doc, query):
                    for field, value in update.get("$set", {}).items():
                        _set_path(doc, field, copy.deepcopy(value))
                    return
            if upsert:
                doc = {"_id": next(_counter)}
                # seed equality fields of the filter, then apply $set
                for field, cond in query.items():
                    if not (isinstance(cond, dict) and any(k.startswith("$") for k in cond)):
                        _set_path(doc, field, copy.deepcopy(cond))
                for field, value in update.get("$set", {}).items():
                    _set_path(doc, field, copy.deepcopy(value))
                self._docs[doc["_id"]] = doc

    def delete_one(self, query):
        with self._lock:
            for _id, doc in list(self._docs.items()):
                if _matches(doc, query):
                    del self._docs[_id]
                    return

    def count_documents(self, query):
        with self._lock:
            return sum(1 for doc in self._docs.values() if _matches(doc, query))

    def find(self, query=None, projection=None):
        with self._lock:
            out = []
            for doc in self._docs.values():
                if query and not _matches(doc, query):
                    continue
                if projection:
                    picked = {"_id": doc["_id"]}
                    for field, keep in projection.items():
                        if keep:
                            picked[field] = copy.deepcopy(_get_path(doc, field))
                    out.append(picked)
                else:
                    out.append(copy.deepcopy(doc))
            return out

    # -------------------------------------------------------- aggregation

    def aggregate(self, pipeline, allowDiskUse=False):
        with self._lock:
            docs = [copy.deepcopy(d) for d in self._docs.values()]
        for stage in pipeline:
            (op, spec), = stage.items()
            if op == "$match":
                docs = [d for d in docs if _matches(d, spec)]
            elif op == "$unwind":
                path = spec["path"][1:]  # strip leading $
                ix_field = spec.get("includeArrayIndex")
                out = []
                for d in docs:
                    arr = _get_path(d, path)
                    if not isinstance(arr, list):
                        continue
                    for i, item in enumerate(arr):
                        nd = copy.deepcopy(d)
                        _set_path(nd, path, item)
                        if ix_field:
                            nd[ix_field] = i
                        out.append(nd)
                docs = out
            elif op == "$group":
                groups: dict = {}
                order: list = []
                for d in docs:
                    gid = _resolve(spec["_id"], d)
                    key = repr(gid)
                    if key not in groups:
                        groups[key] = {"_id": gid}
                        for field, acc in spec.items():
                            if field != "_id":
                                groups[key][field] = []
                        order.append(key)
                    for field, acc in spec.items():
                        if field == "_id":
                            continue
                        (acc_op, acc_expr), = acc.items()
                        if acc_op != "$push":
                            raise NotImplementedError(f"fake pymongo: {acc_op}")
                        groups[key][field].append(_resolve(acc_expr, d))
                docs = [groups[k] for k in order]
            elif op == "$sort":
                for field, direction in reversed(list(spec.items())):
                    docs.sort(key=lambda d: _get_path(d, field), reverse=direction < 0)
            else:
                raise NotImplementedError(f"fake pymongo: stage {op}")
        return iter(docs)


class Database:
    def __init__(self, name):
        self.name = name
        self._colls: dict[str, Collection] = {}

    def __getitem__(self, name) -> Collection:
        return self._colls.setdefault(name, Collection(name))


class MongoClient:
    _instances: dict[str, dict] = {}
    _lock = threading.RLock()

    def __init__(self, url):
        self.url = url
        with MongoClient._lock:
            self._dbs = MongoClient._instances.setdefault(url, {})

    def __getitem__(self, name) -> Database:
        with MongoClient._lock:
            return self._dbs.setdefault(name, Database(name))

    def drop_database(self, name):
        with MongoClient._lock:
            self._dbs.pop(name, None)
