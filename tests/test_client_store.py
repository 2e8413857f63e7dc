"""Client-side store + keystore semantics (client-store crate parity)."""

import pytest

from sda_tpu.client.crypto import Keystore
from sda_tpu.client.store import Filebased, MemoryStore


@pytest.mark.parametrize("make", [MemoryStore, None], ids=["memory", "filebased"])
def test_kv_and_alias(tmp_path, make):
    store = make() if make else Filebased(str(tmp_path / "s"))
    assert store.get("missing") is None
    store.put("k", {"a": 1})
    assert store.get("k") == {"a": 1}
    store.put("k", {"a": 2})  # upsert
    assert store.get("k") == {"a": 2}
    # alias indirection (store.rs:3-40)
    store.put_alias("latest", "k")
    assert store.get_alias("latest") == "k"
    assert store.get_aliased("latest") == {"a": 2}
    assert store.get_aliased("nothing") is None


def test_filebased_persists(tmp_path):
    p = str(tmp_path / "s")
    Filebased(p).put("x", [1, 2, 3])
    assert Filebased(p).get("x") == [1, 2, 3]


def test_keystore_roundtrip(tmp_path):
    ks = Keystore(Filebased(str(tmp_path / "keys")))
    ks.put_encryption_keypair("id1", b"\x01" * 32, b"\x02" * 32)
    assert ks.get_encryption_keypair("id1") == (b"\x01" * 32, b"\x02" * 32)
    assert ks.get_encryption_keypair("nope") is None
    ks.put_signature_keypair("id2", b"\x03" * 32, b"\x04" * 64)
    assert ks.get_signature_keypair("id2") == (b"\x03" * 32, b"\x04" * 64)


def test_store_create_conflict_semantics(tmp_path):
    """jfs compare-on-conflict create (jfs_stores/mod.rs:79-89)."""
    from sda_tpu.stores import JsonDirStores
    from sda_tpu import protocol as proto
    from sda_tpu.utils.errors import Invalid

    stores = JsonDirStores(str(tmp_path / "srv"))
    agent = proto.Agent(
        id=proto.new_id(),
        verification_key=proto.Labelled(id=proto.new_id(), body=proto.VerificationKey(bytes(32))),
    )
    stores.create_agent(agent)
    stores.create_agent(agent)  # identical re-create OK (retry safety)
    conflicting = proto.Agent(id=agent.id, verification_key=proto.Labelled(
        id=proto.new_id(), body=proto.VerificationKey(bytes(32))))
    with pytest.raises(Invalid):
        stores.create_agent(conflicting)
