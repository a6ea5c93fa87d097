"""Browser-console surface (L7): the static page + /console/* operations
mirroring the reference website's 21 tabs
(`/root/reference/website/src/tabs/**`), served end-to-end by the
DevServer over real HTTP."""

import json
import urllib.request

import pytest

from aleo_tpu.sdk import wire
from aleo_tpu.sdk.account import PrivateKey
from aleo_tpu.sdk.api_client import LocalAPIClient
from aleo_tpu.sdk.dev_server import DevServer
from aleo_tpu.sdk.ledger import Ledger


@pytest.fixture(scope="module")
def server():
    ledger = Ledger()
    alice = PrivateKey(seed=5001)
    ledger.genesis_mint(alice.address().to_string(), 10_000_000, n_records=4)
    srv = DevServer(LocalAPIClient(ledger), host="127.0.0.1", port=0)
    srv.start(background=True)
    yield f"http://127.0.0.1:{srv.port}", alice
    srv.stop()


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_console_page_served(server):
    base, _ = server
    with urllib.request.urlopen(base + "/") as resp:
        page = resp.read().decode()
        assert resp.headers["Content-Type"].startswith("text/html")
    # all five tab groups of the reference website are present (the GROUPS
    # object literal; section ids are mounted by JS at runtime)
    for group in ("account", "record", "advanced", "rest", "develop"):
        assert f"{group}: [" in page
    # spot-check operation cards across the groups
    for title in (
        "New account", "Sign message", "Decrypt record", "Encrypt account",
        "Latest block height", "Mapping value", "Execute", "Split record",
    ):
        assert title in page


def test_account_group(server):
    base, _ = server
    acc = _post(base, "/console/account/new", {"seed": 7100})
    assert acc["private_key"].startswith("aprivatekey1")
    assert acc["view_key"].startswith("aviewkey1")
    assert acc["address"].startswith("aleo1")
    # derivations agree with the generated bundle
    derived = _post(
        base, "/console/account/from_private_key",
        {"private_key": acc["private_key"]},
    )
    assert derived == {"view_key": acc["view_key"], "address": acc["address"]}
    addr = _post(
        base, "/console/account/address_from_view_key",
        {"view_key": acc["view_key"]},
    )
    assert addr == {"address": acc["address"]}


def test_sign_verify_roundtrip(server):
    base, _ = server
    acc = _post(base, "/console/account/new", {"seed": 7200})
    msg = "hello from the tpu console — 31+ bytes of utf-8 text"
    sig = _post(
        base, "/console/account/sign",
        {"private_key": acc["private_key"], "message": msg},
    )["signature"]
    assert sig.startswith("sign1")
    ok = _post(
        base, "/console/account/verify",
        {"address": acc["address"], "message": msg, "signature": sig},
    )
    assert ok == {"verified": True}
    bad = _post(
        base, "/console/account/verify",
        {"address": acc["address"], "message": msg + "!", "signature": sig},
    )
    assert bad == {"verified": False}


def test_advanced_encrypt_decrypt(server):
    base, _ = server
    acc = _post(base, "/console/account/new", {"seed": 7300})
    ct = _post(
        base, "/console/advanced/encrypt",
        {"private_key": acc["private_key"], "password": "s3cret"},
    )["ciphertext"]
    assert ct.startswith("ciphertext1")
    back = _post(
        base, "/console/advanced/decrypt",
        {"ciphertext": ct, "password": "s3cret"},
    )
    assert back["private_key"] == acc["private_key"]
    with pytest.raises(Exception):
        _post(base, "/console/advanced/decrypt",
              {"ciphertext": ct, "password": "wrong"})


def test_record_decrypt(server):
    base, alice = server
    # fetch one of alice's genesis record ciphertexts over the node surface
    client = __import__(
        "aleo_tpu.sdk.api_client", fromlist=["HttpAPIClient"]
    ).HttpAPIClient(base)
    cts = client.scan(alice.view_key(), 0, client.latest_height() + 1)
    assert cts
    body = {
        "view_key": alice.view_key().to_string(),
        "record": wire.record_ct_to_json(cts[0]),
    }
    out = _post(base, "/console/record/decrypt", body)
    assert out["owned"] is True
    rec = out["record"]
    assert rec["program"] == "credits.aleo"
    assert rec["owner"] == alice.address().to_string()
    assert int(rec["entries"]["microcredits"]) > 0
    # a stranger's view key does not own it
    other = PrivateKey(seed=7400)
    body["view_key"] = other.view_key().to_string()
    assert _post(base, "/console/record/decrypt", body) == {"owned": False}


def test_develop_join_split(server):
    base, alice = server
    pk = alice.to_string()
    tx1 = _post(base, "/testnet3/split",
                {"private_key": pk, "split_amount": 500_000})
    assert tx1.startswith("at1")
    tx2 = _post(base, "/testnet3/join", {"private_key": pk, "fee": 0})
    assert tx2.startswith("at1")
