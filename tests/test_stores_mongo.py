"""Mongo store lane: KV contract, pipeline transposition, full crypto loop.

Runs against the in-repo pymongo-API fake (tests/fake_pymongo.py) since no
mongod/mongomock exists in this environment; against a real mongod the same
tests run unchanged through tests.fixtures.with_service("mongo"). Mirrors
the reference's Mongo coverage (integration-tests/src/lib.rs:124-140 +
server-store-mongodb tests).
"""

import sys

import numpy as np
import pytest

from sda_tpu import protocol as proto
from sda_tpu.utils.errors import Invalid

from tests.fixtures import make_client, with_service


@pytest.fixture
def mongo_kv():
    try:
        import pymongo  # noqa: F401
    except ImportError:
        from tests import fake_pymongo

        sys.modules["pymongo"] = fake_pymongo
    from sda_tpu.stores_mongo import _MongoKV

    import secrets as _secrets

    db = f"sda-test-{_secrets.randbits(64)}"
    kv = _MongoKV("mongodb://localhost:27017", db)
    yield kv
    import pymongo

    pymongo.MongoClient("mongodb://localhost:27017").drop_database(db)


def test_kv_contract(mongo_kv):
    assert mongo_kv.get("ns", "a") is None
    mongo_kv.put("ns", "a", {"x": 1})
    assert mongo_kv.get("ns", "a") == {"x": 1}
    mongo_kv.put("ns", "a", {"x": 2})  # upsert overwrites
    assert mongo_kv.get("ns", "a") == {"x": 2}
    mongo_kv.put("ns", "b", {"y": 3})
    mongo_kv.put("other/ns", "c", {"z": 4})  # namespaces are isolated
    assert mongo_kv.keys("ns") == ["a", "b"]
    assert mongo_kv.keys("other/ns") == ["c"]
    mongo_kv.delete("ns", "a")
    assert mongo_kv.get("ns", "a") is None
    assert mongo_kv.keys("ns") == ["b"]
    # compare-on-conflict create (jfs_stores/mod.rs:79-89 semantics)
    mongo_kv.create("ns", "d", {"v": 1})
    mongo_kv.create("ns", "d", {"v": 1})  # idempotent re-create
    with pytest.raises(Invalid):
        mongo_kv.create("ns", "d", {"v": 2})


def test_pipeline_transposition_streams_columns(mongo_kv):
    """The $unwind/$group pipeline regroups [P x C] -> [C x P] correctly."""
    pids = []
    for pi in range(10):
        pid = proto.new_id()
        pids.append(pid)
        mongo_kv.put(
            "participations/agg",
            pid,
            {
                "id": pid,
                "clerk_encryptions": [
                    [f"clerk{ci}", {"Sodium": proto._b64e(bytes([ci, pi]))}]
                    for ci in range(3)
                ],
            },
        )
    cols = list(mongo_kv.transpose_clerk_encryptions("participations/agg", pids, 3))
    assert len(cols) == 3
    for ci, col in enumerate(cols):
        assert len(col) == 10
        decoded = sorted(proto._b64d(e["Sodium"]) for e in col)
        assert decoded == [bytes([ci, pi]) for pi in range(10)]
    # subset $match: only the first 4 participations
    cols4 = list(mongo_kv.transpose_clerk_encryptions("participations/agg", pids[:4], 3))
    assert all(len(c) == 4 for c in cols4)
    # zero participations -> empty columns, still clerks_number of them
    empty = list(mongo_kv.transpose_clerk_encryptions("participations/agg", [], 3))
    assert empty == [[], [], []]


def _put_participation(kv, ns, pid, n_clerks, tag):
    kv.put(
        ns,
        pid,
        {
            "id": pid,
            "clerk_encryptions": [
                [f"clerk{ci}", {"Sodium": proto._b64e(bytes([ci, tag]))}]
                for ci in range(n_clerks)
            ],
        },
    )


def test_pipeline_contract_columns_sorted_by_clerk_index(mongo_kv):
    """$group emits in unspecified order; the adapter's correctness rests on
    the trailing ``$sort {_id: 1}``. Pin it with shuffled insertion order:
    columns must come out strictly clerk-index-ascending regardless."""
    ns = "participations/sorted"
    pids = [proto.new_id() for _ in range(7)]
    for pi in (3, 0, 6, 2, 5, 1, 4):  # shuffled insertion
        _put_participation(mongo_kv, ns, pids[pi], 4, pi)
    cols = list(mongo_kv.transpose_clerk_encryptions(ns, pids, 4))
    assert len(cols) == 4
    for ci, col in enumerate(cols):
        # every byte in column ci is tagged with clerk index ci — the
        # byte-level assertion of the reference's mocked-loop test
        # (/root/reference/integration-tests/tests/service.rs:85-92)
        assert {proto._b64d(e["Sodium"])[0] for e in col} == {ci}


def test_pipeline_contract_array_index_numeric(mongo_kv):
    """``includeArrayIndex`` emits a NUMBER (a BSON long on real Mongo,
    where ``bson.Int64`` subclasses ``int``): the adapter's ``int(_id)``
    and the ``ix >= clerks_number`` comparison must both be valid. Pin the
    raw pipeline output type, not just the adapter's view of it."""
    ns = "participations/ixtype"
    pid = proto.new_id()
    _put_participation(mongo_kv, ns, pid, 3, 0)
    pipeline = [
        {"$match": {"_k": {"$in": [pid]}}},
        {"$unwind": {"path": "$v.clerk_encryptions", "includeArrayIndex": "clerk_ix"}},
        {"$group": {"_id": "$clerk_ix", "shares": {"$push": "$v.clerk_encryptions"}}},
        {"$sort": {"_id": 1}},
    ]
    ids = [d["_id"] for d in mongo_kv._coll(ns).aggregate(pipeline, allowDiskUse=True)]
    assert [int(i) for i in ids] == [0, 1, 2]
    for i in ids:
        assert isinstance(i, int) and i < 3  # int() and < both well-defined


def test_pipeline_contract_in_subsetting(mongo_kv):
    """$match with $in restricts the unwind to exactly the frozen snapshot
    set — later participations must not leak into an older snapshot's jobs
    (aggregations.rs:132-142 snapshot-tagging semantics)."""
    ns = "participations/subset"
    pids = [proto.new_id() for _ in range(6)]
    for pi, pid in enumerate(pids):
        _put_participation(mongo_kv, ns, pid, 2, pi)
    frozen = pids[:3]
    cols = list(mongo_kv.transpose_clerk_encryptions(ns, frozen, 2))
    for col in cols:
        tags = sorted(proto._b64d(e["Sodium"])[1] for e in col)
        assert tags == [0, 1, 2]  # only the frozen set, all of it


def test_pipeline_contract_missing_pid_raises(mongo_kv):
    """A frozen pid absent from the collection is a corrupted snapshot: the
    transposition must raise, never silently shrink the aggregate."""
    ns = "participations/missing"
    pid = proto.new_id()
    _put_participation(mongo_kv, ns, pid, 2, 0)
    with pytest.raises(Invalid, match="inconsistent snapshot"):
        list(mongo_kv.transpose_clerk_encryptions(ns, [pid, proto.new_id()], 2))


def test_pipeline_contract_short_arrays_gap_fill(mongo_kv):
    """Participations carrying fewer encryptions than clerks_number leave
    trailing clerk indices with no group: the adapter must still yield
    exactly clerks_number columns, empty where no shares exist."""
    ns = "participations/short"
    pids = [proto.new_id() for _ in range(2)]
    for pi, pid in enumerate(pids):
        _put_participation(mongo_kv, ns, pid, 1, pi)  # only clerk 0
    cols = list(mongo_kv.transpose_clerk_encryptions(ns, pids, 3))
    assert [len(c) for c in cols] == [2, 0, 0]


def test_upsert_contract(mongo_kv):
    """update_one(upsert=True) must seed the filter's equality fields into
    the created doc (so the unique ``_k`` index holds) and must never
    duplicate on repeat — the put() path the whole KV rests on."""
    ns = "upsert/contract"
    mongo_kv.put(ns, "k1", {"a": 1})
    mongo_kv.put(ns, "k1", {"a": 2})
    coll = mongo_kv._coll(ns)
    docs = list(coll.find({"_k": "k1"}))
    assert len(docs) == 1
    assert docs[0]["_k"] == "k1" and docs[0]["v"] == {"a": 2}


def test_mongo_full_crypto_loop():
    """End-to-end packed-Shamir aggregation over the Mongo backend."""
    from tests.test_full_loop import CONFIGS, agg_default

    with with_service("mongo") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey, **CONFIGS["with_packedshamir"])
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(8)]
        for c in clerks:
            k = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(k)
        recipient.begin_aggregation(agg.id)
        for _ in range(2):
            p = make_client(service)
            p.upload_agent()
            p.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)
        recipient.run_chores(-1)
        for c in clerks:
            c.run_chores(-1)
        out = recipient.reveal_aggregation(agg.id)
        assert out.positive().values.tolist() == [2, 4, 6, 8]


def test_default_transpose_is_lazy_per_clerk():
    """The KV-generic transposition yields one clerk column at a time."""
    from sda_tpu.stores import MemoryStores

    stores = MemoryStores()
    agg_id = proto.new_id()
    for pi in range(5):
        stores.create_participation(
            proto.Participation(
                id=proto.new_id(),
                participant=proto.new_id(),
                aggregation=agg_id,
                recipient_encryption=None,
                clerk_encryptions=tuple(
                    (f"clerk{ci}", proto.Encryption(bytes([ci, pi]))) for ci in range(3)
                ),
            )
        )
    snap = proto.new_id()
    stores.snapshot_participations(agg_id, snap)
    gen = stores.iter_snapshot_clerk_jobs_data(agg_id, snap, 3)
    assert iter(gen) is gen  # a generator, not a materialised matrix
    cols = list(gen)
    assert [len(c) for c in cols] == [5, 5, 5]
    for ci, col in enumerate(cols):
        assert sorted(e.data for e in col) == [bytes([ci, pi]) for pi in range(5)]


def test_create_contract_atomic_via_unique_index(mongo_kv):
    """create() uses insert_one against the unique _k index as its
    linearisation point (the base get-then-put could lose a concurrent
    conflicting create): repeat-create with identical value is idempotent,
    a conflicting value raises, and the winning document is unchanged."""
    ns = "create/contract"
    mongo_kv.create(ns, "k", {"a": 1})
    mongo_kv.create(ns, "k", {"a": 1})  # idempotent retry
    with pytest.raises(Invalid, match="conflicting create"):
        mongo_kv.create(ns, "k", {"a": 2})
    assert mongo_kv.get(ns, "k") == {"a": 1}
    docs = list(mongo_kv._coll(ns).find({"_k": "k"}))
    assert len(docs) == 1


def test_create_contention_distinct_from_conflict(mongo_kv):
    """Retry exhaustion under delete/create churn (the key vanishes between
    every failed insert and the read-back) reports contention, not a
    compare-on-conflict protocol failure (advisor r4)."""
    ns = "create/churn"
    coll = mongo_kv._coll(ns)
    real_insert = coll.insert_one

    def churny_insert(doc):
        import pymongo

        # simulate another writer winning then deleting before our read
        real_insert(dict(doc))
        coll.delete_one({"_k": doc["_k"]})
        raise pymongo.errors.DuplicateKeyError("duplicate key")

    coll.insert_one = churny_insert
    try:
        with pytest.raises(Invalid, match="contention.*retry"):
            mongo_kv.create(ns, "k", {"a": 1})
    finally:
        coll.insert_one = real_insert


def test_insert_one_contract_duplicate_key(mongo_kv):
    """Pin the pymongo behavior create() relies on: insert_one against a
    unique index raises DuplicateKeyError and leaves the original doc."""
    import pymongo

    ns = "insert/contract"
    coll = mongo_kv._coll(ns)
    coll.insert_one({"_k": "x", "v": 1})
    with pytest.raises(pymongo.errors.DuplicateKeyError):
        coll.insert_one({"_k": "x", "v": 2})
    assert [d["v"] for d in coll.find({"_k": "x"})] == [1]
