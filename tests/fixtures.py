"""Test fixtures mirroring the reference integration harness.

/root/reference/integration-tests/src/lib.rs: ``with_service`` runs the same
test body against either the in-process service or real HTTP; ``new_client``
builds agents with fresh tempdir keystores; dummy-identity helpers build
agents with all-zero keys for store/ACL tests that never touch crypto
(lib.rs:51-71).
"""

from __future__ import annotations

import contextlib

from sda_tpu import protocol as proto
from sda_tpu.client import Keystore, MemoryStore, SdaClient, new_agent
from sda_tpu.server import new_memory_server


def make_client(service) -> SdaClient:
    # HTTP proxies carry a per-agent auth token; give each client its own
    if hasattr(service, "clone_fresh"):
        service = service.clone_fresh()
    keystore = Keystore(MemoryStore())
    agent = new_agent(keystore)
    return SdaClient(agent, keystore, service)


def dummy_agent() -> proto.Agent:
    """All-zero keys/signatures (lib.rs:51-71) for ACL/store tests."""
    return proto.Agent(
        id=proto.new_id(),
        verification_key=proto.Labelled(
            id=proto.new_id(), body=proto.VerificationKey(bytes(32))
        ),
    )


def dummy_signed_key(agent: proto.Agent) -> proto.Signed:
    return proto.Signed(
        signature=proto.Signature(bytes(64)),
        signer=agent.id,
        body=proto.Labelled(id=proto.new_id(), body=proto.EncryptionKey(bytes(32))),
    )


@contextlib.contextmanager
def with_service(kind: str = "memory"):
    """Yield a service; kinds: memory, jsondir, http (added as they land)."""
    if kind == "memory":
        yield new_memory_server()
    elif kind == "jsondir":
        import tempfile

        from sda_tpu.server import new_jsondir_server

        with tempfile.TemporaryDirectory(prefix="sda-tests-") as d:
            yield new_jsondir_server(d)
    elif kind == "mongo":
        # real pymongo + mongod when present, else the in-repo pymongo-API
        # fake; either way a throwaway db, dropped afterwards — the
        # reference's pattern (integration-tests/src/lib.rs:124-140)
        import secrets as _secrets
        import sys

        try:
            import pymongo  # noqa: F401
        except ImportError:
            from tests import fake_pymongo

            sys.modules["pymongo"] = fake_pymongo
        from sda_tpu.stores_mongo import new_mongo_server

        db = f"sda-test-{_secrets.randbits(64)}"
        url = "mongodb://localhost:27017"
        try:
            yield new_mongo_server(url, db)
        finally:
            import pymongo

            pymongo.MongoClient(url).drop_database(db)
    elif kind == "http":
        import tempfile

        from sda_tpu.http.server import serve_background
        from sda_tpu.http.client import HttpSdaService
        from sda_tpu.server import new_jsondir_server

        with tempfile.TemporaryDirectory(prefix="sda-tests-http-") as d:
            inner = new_jsondir_server(d)
            with serve_background(inner) as url:
                yield HttpSdaService(url, token_store=MemoryStore())
    else:
        raise ValueError(kind)
