"""HTTP transport specifics: auth TOFU, status mapping, route-vs-resource 404.

Mirrors the reference's HTTP-layer unit tests (server-http/src/lib.rs:345-374
auth parsing) plus the client status mapping (client-http/src/client.rs:43-96).
"""

import pytest
import requests

from sda_tpu import protocol as proto
from sda_tpu.client.store import MemoryStore
from sda_tpu.http.client import HttpSdaService, token_for_store
from sda_tpu.http.server import serve_background
from sda_tpu.server import new_memory_server
from sda_tpu.utils.errors import InvalidCredentials, SdaError

from .fixtures import dummy_agent


@pytest.fixture
def http_service():
    inner = new_memory_server()
    with serve_background(inner) as url:
        yield url, inner


def test_ping_no_auth(http_service):
    url, _ = http_service
    svc = HttpSdaService(url, MemoryStore())
    assert svc.ping().running is True


def test_tofu_auth_lifecycle(http_service):
    url, _ = http_service
    svc = HttpSdaService(url, MemoryStore())
    agent = dummy_agent()
    svc.create_agent(agent, agent)  # records the token (TOFU)
    assert svc.get_agent(agent, agent.id) == agent
    # same agent id with a DIFFERENT token -> 401 InvalidCredentials
    svc2 = HttpSdaService(url, MemoryStore())
    with pytest.raises(InvalidCredentials):
        svc2.get_agent(agent, agent.id)


def test_token_store_generates_once():
    store = MemoryStore()
    t1 = token_for_store(store)
    t2 = token_for_store(store)
    assert t1 == t2 and len(t1) == 32 and t1.isalnum()


def test_resource_not_found_vs_route_not_found(http_service):
    url, _ = http_service
    svc = HttpSdaService(url, MemoryStore())
    agent = dummy_agent()
    svc.create_agent(agent, agent)
    # unknown resource id -> 404 + Resource-not-found header -> None
    assert svc.get_agent(agent, proto.new_id()) is None
    # unknown route -> plain 404 -> error
    r = requests.get(url + "/v1/nonsense")
    assert r.status_code == 404 and "Resource-not-found" not in r.headers
    with pytest.raises(SdaError):
        svc._process(r)


def test_missing_auth_is_400(http_service):
    url, _ = http_service
    r = requests.get(url + "/v1/agents/" + proto.new_id())
    assert r.status_code == 400  # "Basic Authorization required"


def test_malformed_body_is_400(http_service):
    url, _ = http_service
    agent = dummy_agent()
    r = requests.post(
        url + "/v1/agents/me",
        data=b"not json",
        auth=(agent.id, "tok"),
        headers={"Content-Type": "application/json"},
    )
    assert r.status_code in (400, 500)
    # empty body -> clean 400 "Expected a body"
    r = requests.post(url + "/v1/agents/me", auth=(agent.id, "tok"))
    assert r.status_code == 400


def test_inconsistent_agent_id_rejected(http_service):
    url, _ = http_service
    agent = dummy_agent()
    other_id = proto.new_id()
    r = requests.post(
        url + "/v1/agents/me",
        json=agent.to_obj(),
        auth=(other_id, "tok"),
    )
    assert r.status_code == 400
    assert "inconsistent" in r.text
