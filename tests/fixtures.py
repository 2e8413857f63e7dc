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


def _start_local_mongod(stack: contextlib.ExitStack) -> str | None:
    """Start a throwaway mongod when the binary exists; return its URL.

    Mirrors the reference CI, which runs integration tests against a real
    MongoDB when available (integration-tests/src/lib.rs:124-140). The
    daemon gets a random high port + tempdir dbpath and is torn down (and
    its dbpath removed) with the enclosing ExitStack.
    """
    import shutil
    import socket
    import subprocess
    import tempfile
    import time

    if shutil.which("mongod") is None:
        return None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    dbpath = stack.enter_context(tempfile.TemporaryDirectory(prefix="sda-mongod-"))
    proc = subprocess.Popen(
        ["mongod", "--dbpath", dbpath, "--port", str(port), "--bind_ip", "127.0.0.1"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )

    def _stop():
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

    stack.callback(_stop)
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                return f"mongodb://127.0.0.1:{port}"
        except OSError:
            time.sleep(0.1)
    return None


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
        # reference's pattern (integration-tests/src/lib.rs:124-140).
        # With real pymongo but no reachable mongod we must NOT leave the
        # real client in place: every op would block on server selection
        # (~30 s each) before failing. Probe with a short timeout and fall
        # back to the fake; a local `mongod` binary is auto-started on a
        # throwaway port/dbpath when one exists so the real lane is a
        # drop-in wherever the binary is installed.
        import secrets as _secrets
        import sys

        url = "mongodb://localhost:27017"
        with contextlib.ExitStack() as stack:
            try:
                import pymongo
            except ImportError:
                pymongo = None
            if pymongo is not None:
                started = _start_local_mongod(stack)
                if started:
                    url = started
                try:
                    client = pymongo.MongoClient(url, serverSelectionTimeoutMS=500)
                    client.admin.command("ping")
                    client.close()
                except Exception:
                    pymongo = None  # unreachable: use the fake below
            if pymongo is None:
                from tests import fake_pymongo

                sys.modules["pymongo"] = fake_pymongo
                url = "mongodb://localhost:27017"
            from sda_tpu.stores_mongo import new_mongo_server

            db = f"sda-test-{_secrets.randbits(64)}"
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
