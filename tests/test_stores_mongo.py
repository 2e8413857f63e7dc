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
