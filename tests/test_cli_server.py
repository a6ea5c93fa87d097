"""CLI (L4) and development server (L5) capability tests.

Mirrors the reference's surfaces: `aleo account|new|build|clean|run` command
behavior (`/root/reference/cli/commands/*.rs`) and the dev server's
`POST /testnet3/{deploy,execute,transfer}` + `GET /health`
(`rust/develop/src/routes.rs:21-56`), including the per-request key
resolution matrix (routes.rs:61-80).
"""

import json
import os
import urllib.request

import pytest

from aleo_tpu import cli
from aleo_tpu.sdk import encryptor
from aleo_tpu.sdk.account import PrivateKey
from aleo_tpu.sdk.api_client import LocalAPIClient
from aleo_tpu.sdk.dev_server import DevServer
from aleo_tpu.sdk.ledger import Ledger


# -- CLI ----------------------------------------------------------------------


def test_cli_account_new_and_write(tmp_path, capsys):
    out_file = tmp_path / "account.json"
    cli.main(["account", "new", "--seed", "123", "--write", str(out_file)])
    captured = capsys.readouterr().out
    assert "aleo1" in captured
    model = json.loads(out_file.read_text())
    assert set(model) == {"private_key", "view_key", "address"}
    pk = PrivateKey.from_string(model["private_key"])
    assert pk.address().to_string() == model["address"]


def test_cli_account_encrypt_decrypt(capsys):
    pk = PrivateKey(seed=5)
    cli.main(["account", "encrypt", "--key", pk.to_string(), "--password", "pw"])
    ct = capsys.readouterr().out.strip()
    cli.main(["account", "decrypt", "--ciphertext", ct, "--password", "pw"])
    assert pk.address().to_string() in capsys.readouterr().out


def test_cli_package_lifecycle(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli.main(["new", "demo"])
    assert (tmp_path / "demo" / "program.json").exists()
    cli.main(["build", "--path", "demo"])
    out = capsys.readouterr().out
    assert "demo.aleo/hello" in out and "constraints" in out
    assert (tmp_path / "demo" / "build" / "main.aleo").exists()
    cli.main(["run", "hello", "2u32", "3u32", "--path", "demo"])
    out = capsys.readouterr().out
    assert "output r0: 5" in out
    assert "constraints" in out
    cli.main(["clean", "--path", "demo"])
    assert not (tmp_path / "demo" / "build").exists()


def test_cli_devnet_and_execute(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(cli, "DEVNET_PATH", str(tmp_path / "devnet.pkl"))
    alice = PrivateKey(seed=88)
    cli.main(["devnet", "mint", "--address", alice.address().to_string(),
              "--amount", "5000000"])
    bob = PrivateKey(seed=89)
    cli.main([
        "transfer", "--amount", "100000", "--recipient",
        bob.address().to_string(), "--private-key", alice.to_string(),
    ])
    out = capsys.readouterr().out
    assert "transfer transaction: at1" in out
    cli.main(["devnet", "status"])
    out = capsys.readouterr().out
    assert "height: 2" in out


# -- dev server ---------------------------------------------------------------


@pytest.fixture
def server():
    ledger = Ledger()
    alice = PrivateKey(seed=2001)
    ledger.genesis_mint(alice.address().to_string(), 10_000_000, n_records=4)
    ct = encryptor.encrypt_private_key_with_secret(alice, "serverpw")
    srv = DevServer(LocalAPIClient(ledger), key_ciphertext=ct, host="127.0.0.1",
                    port=0)
    srv.start()
    yield srv, alice, ledger
    srv.stop()


def _post(srv, route, body):
    url = f"http://127.0.0.1:{srv.port}/testnet3/{route}"
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_server_health(server):
    srv, _alice, _ledger = server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/health") as r:
        assert json.loads(r.read()) == "ok"


def test_server_transfer_with_server_key(server):
    srv, alice, ledger = server
    bob = PrivateKey(seed=2002)
    status, tx_id = _post(srv, "transfer", {
        "amount": 250_000, "recipient": bob.address().to_string(),
        "password": "serverpw", "transfer_type": "private",
    })
    assert status == 200 and tx_id.startswith("at1")
    client = LocalAPIClient(ledger)
    assert [
        r.entries["microcredits"].data
        for _c, r in client.get_unspent_records(bob)
    ] == [250_000]


def test_server_deploy_and_execute_with_request_key(server):
    srv, alice, _ledger = server
    prog = (
        "program srvtest.aleo;\n\nfunction double:\n"
        "    input r0 as u32.private;\n    add r0 r0 into r1;\n"
        "    output r1 as u32.private;\n"
    )
    status, tx_id = _post(srv, "deploy", {
        "program": prog, "private_key": alice.to_string(),
    })
    assert status == 200 and tx_id.startswith("ad1")
    status, tx_id = _post(srv, "execute", {
        "program_id": "srvtest.aleo", "program_function": "double",
        "inputs": ["21u32"], "private_key": alice.to_string(),
    })
    assert status == 200 and tx_id.startswith("at1")


def test_server_rejects_missing_key(server):
    srv, _alice, _ledger = server
    try:
        _post(srv, "transfer", {"amount": 1, "recipient": "aleo1xyz"})
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        assert e.code == 400


import urllib.error  # noqa: E402


def test_development_client_roundtrip(server):
    """DevelopmentClient (L6 twin) against the dev server over real HTTP."""
    from aleo_tpu.sdk.development_client import (
        DevelopmentClient,
        DevelopmentClientError,
    )

    srv, alice, ledger = server
    client = DevelopmentClient(f"http://127.0.0.1:{srv.port}")
    bob = PrivateKey(seed=2077)
    tx = client.transfer(
        100_000, 0, bob.address().to_string(), "private", password="serverpw"
    )
    assert tx.startswith("at1")
    with pytest.raises(DevelopmentClientError):
        client.transfer(1, 0, "aleo1nonsense")  # no key material
