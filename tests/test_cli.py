"""CLI walkthrough: the README simple-cli-example flow end-to-end.

Drives `sda` / `sdad` (in-process invocations of their mains against a
background HTTP server) through the exact walkthrough of
/root/reference/docs/simple-cli-example.sh; golden reveal
``0 2 2 4 4 6 6 8 8 10`` (README.md:157).
"""

import pytest

from sda_tpu.http.server import serve_background
from sda_tpu.server import new_jsondir_server
from sda_tpu import cli


@pytest.fixture
def http_url(tmp_path):
    service = new_jsondir_server(str(tmp_path / "server"))
    with serve_background(service) as url:
        yield url


def sda(url, tmp_path, ident, *args):
    rc = cli.main(["-s", url, "-i", str(tmp_path / "agent" / ident), *map(str, args)])
    assert rc == 0, f"sda {args} failed"


def test_readme_walkthrough(http_url, tmp_path, capsys):
    url = http_url
    for i in ["recipient", "clerk-1", "clerk-2", "clerk-3"]:
        sda(url, tmp_path, i, "agent", "create")
        sda(url, tmp_path, i, "agent", "keys", "create")
    for i in ["part-1", "part-2", "part-3"]:
        sda(url, tmp_path, i, "agent", "create")

    sda(url, tmp_path, "recipient", "agent", "keys", "show")
    key_id = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(key_id) == 36

    aggid = "ad3142d8-9a83-4f40-a64a-a8c90b701bde"
    sda(url, tmp_path, "recipient", "aggregations", "create", "--id", aggid,
        "aggro", 10, 433, key_id, 3)
    sda(url, tmp_path, "recipient", "aggregations", "begin", aggid)

    sda(url, tmp_path, "part-1", "participate", aggid, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
    sda(url, tmp_path, "part-2", "participate", aggid, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    sda(url, tmp_path, "part-3", "participate", aggid, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1)

    sda(url, tmp_path, "recipient", "aggregations", "end", aggid)
    for i in ["recipient", "clerk-1", "clerk-2", "clerk-3"]:
        sda(url, tmp_path, i, "clerk", "--once")

    capsys.readouterr()
    sda(url, tmp_path, "recipient", "aggregations", "reveal", aggid)
    out = capsys.readouterr().out
    assert "result: 0 2 2 4 4 6 6 8 8 10" in out  # README.md:157 golden


def test_cli_shamir_sharing(http_url, tmp_path, capsys):
    """--sharing shamir works (reference left it unimplemented, main.rs:226)."""
    url = http_url
    for i in ["recipient"] + [f"c{j}" for j in range(8)]:
        sda(url, tmp_path, i, "agent", "create")
        sda(url, tmp_path, i, "agent", "keys", "create")
    sda(url, tmp_path, "p1", "agent", "create")

    sda(url, tmp_path, "recipient", "agent", "keys", "show")
    key_id = capsys.readouterr().out.strip().splitlines()[-1]
    capsys.readouterr()
    sda(url, tmp_path, "recipient", "aggregations", "create", "sham", 4, 433, key_id, 8,
        "--sharing", "shamir", "--secret-count", 3, "--privacy-threshold", 4)
    aggid = capsys.readouterr().out.strip().split()[-1]

    sda(url, tmp_path, "recipient", "aggregations", "begin", aggid)
    sda(url, tmp_path, "p1", "participate", aggid, 10, 20, 30, 40)
    sda(url, tmp_path, "recipient", "aggregations", "end", aggid)
    for i in ["recipient"] + [f"c{j}" for j in range(8)]:
        sda(url, tmp_path, i, "clerk", "--once")
    capsys.readouterr()
    sda(url, tmp_path, "recipient", "aggregations", "reveal", aggid)
    assert "result: 10 20 30 40" in capsys.readouterr().out


def test_cli_agent_errors(http_url, tmp_path, capsys):
    url = http_url
    # participate without an agent -> helpful error, exit 1
    rc = cli.main(["-s", url, "-i", str(tmp_path / "agent" / "nobody"),
                   "participate", "some-agg", "1", "2"])
    assert rc == 1
    assert "sda agent create" in capsys.readouterr().err
    # agent create twice without --force keeps the identity
    sda(url, tmp_path, "alice", "agent", "create")
    ident = (tmp_path / "agent" / "alice" / "agent_record.json").read_text()
    sda(url, tmp_path, "alice", "agent", "create")
    assert (tmp_path / "agent" / "alice" / "agent_record.json").read_text() == ident
