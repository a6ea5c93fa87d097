"""L2 SDK capability tests against the in-process dev ledger.

Mirrors the reference's test strategy (SURVEY.md §4): the flows of
`rust/src/program/{mod,execute,deploy,transfer}.rs` and
`rust/src/account/encryptor.rs` exercised against a local chain (the role
the snarkOS devnet plays in the reference CI). Dev mode (no SNARK) keeps
this tier fast; the proof-backed path is covered by
test_e2e_program_proof.py and the slow tier below.
"""

import pytest

from aleo_tpu.program.values import Record, Value
from aleo_tpu.sdk import encryptor
from aleo_tpu.sdk.account import PrivateKey
from aleo_tpu.sdk.api_client import ApiError, LocalAPIClient
from aleo_tpu.sdk.ledger import Ledger
from aleo_tpu.sdk.program_manager import (
    OnChainProgramState,
    ProgramManager,
    ProgramManagerError,
    TransferType,
)
from aleo_tpu.sdk.records import RecordFinder, RecordFinderError
from aleo_tpu.sdk.transactions import Authorization


# -- encryptor (encryptor.rs:84-152 shapes) ----------------------------------


def test_encryptor_roundtrip():
    pk = PrivateKey(seed=12345)
    ct = encryptor.encrypt_private_key_with_secret(pk, "mypassword")
    rec = encryptor.decrypt_private_key_with_secret(ct, "mypassword")
    assert rec.seed == pk.seed
    assert rec.address().to_string() == pk.address().to_string()


def test_encryptor_wrong_password_fails():
    pk = PrivateKey(seed=77)
    ct = encryptor.encrypt_private_key_with_secret(pk, "mypassword")
    with pytest.raises(encryptor.DecryptionError):
        encryptor.decrypt_private_key_with_secret(ct, "wrong_password")


def test_encryptor_nondeterministic_but_consistent():
    pk = PrivateKey(seed=99)
    c1 = encryptor.encrypt_private_key_with_secret(pk, "pw")
    c2 = encryptor.encrypt_private_key_with_secret(pk, "pw")
    assert c1 != c2
    assert encryptor.decrypt_private_key_with_secret(c1, "pw").seed == pk.seed
    assert encryptor.decrypt_private_key_with_secret(c2, "pw").seed == pk.seed


def test_encryptor_string_roundtrip():
    pk = PrivateKey(seed=4242)
    ct = encryptor.encrypt_private_key_with_secret(pk, "pw")
    s = ct.to_string()
    assert encryptor.PrivateKeyCiphertext.from_string(s) == ct


# -- ledger + api client ------------------------------------------------------


@pytest.fixture
def chain():
    ledger = Ledger()
    alice = PrivateKey(seed=1001)
    bob = PrivateKey(seed=1002)
    ledger.genesis_mint(alice.address().to_string(), 10_000_000, n_records=4)
    client = LocalAPIClient(ledger)
    return ledger, client, alice, bob


def test_genesis_and_scan(chain):
    ledger, client, alice, bob = chain
    assert client.latest_height() == 1
    recs = client.get_unspent_records(alice)
    assert len(recs) == 4
    assert sum(r.entries["microcredits"].data for _c, r in recs) == 10_000_000
    assert client.get_unspent_records(bob) == []
    # view-key scan sees the ciphertexts
    assert len(client.scan(alice.view_key(), 0, 10)) == 4


def test_transfer_private_roundtrip(chain):
    """transfer.rs:220-304 journey, private leg."""
    ledger, client, alice, bob = chain
    pm = ProgramManager(client, private_key=alice)
    tx_id = pm.transfer(1_000_000, 0, bob.address().to_string(),
                        TransferType.Private)
    assert client.get_transaction(tx_id).kind == "execute"
    bob_recs = client.get_unspent_records(bob)
    assert [r.entries["microcredits"].data for _c, r in bob_recs] == [1_000_000]
    # alice got change; her spent record's serial is consumed
    alice_total = sum(
        r.entries["microcredits"].data for _c, r in client.get_unspent_records(alice)
    )
    assert alice_total == 9_000_000
    # double spend rejected
    spent = next(iter(ledger.spent_serials))
    assert client.find_transition_id(spent) is not None


def test_transfer_public_and_mappings(chain):
    """Public transfer with mapping-value assertions (transfer.rs:283-293)."""
    ledger, client, alice, bob = chain
    pm = ProgramManager(client, private_key=alice)
    # move 2M into public balance, then send 500k publicly to bob
    pm.transfer(2_000_000, 0, alice.address().to_string(),
                TransferType.PrivateToPublic)
    assert client.get_mapping_value(
        "credits.aleo", "account", alice.address().x
    ) == 2_000_000
    pm.transfer(500_000, 0, bob.address().to_string(), TransferType.Public)
    assert client.get_mapping_value(
        "credits.aleo", "account", alice.address().x
    ) == 1_500_000
    assert client.get_mapping_value(
        "credits.aleo", "account", bob.address().x
    ) == 500_000
    # back to private for bob
    pm_bob = ProgramManager(client, private_key=bob)
    pm_bob.transfer(250_000, 0, bob.address().to_string(),
                    TransferType.PublicToPrivate)
    assert client.get_mapping_value(
        "credits.aleo", "account", bob.address().x
    ) == 250_000
    assert [
        r.entries["microcredits"].data
        for _c, r in client.get_unspent_records(bob)
    ] == [250_000]


MULTIPLY = """
program multiply_test.aleo;

function multiply:
    input r0 as u32.public;
    input r1 as u32.private;
    mul r0 r1 into r2;
    output r2 as u32.private;
"""

IMPORTER = """
import multiply_test.aleo;
program importer.aleo;

function main:
    input r0 as u32.public;
    call multiply_test.aleo/multiply r0 5u32 into r1;
    output r1 as u32.private;
"""


def test_deploy_and_execute(chain):
    ledger, client, alice, bob = chain
    pm = ProgramManager(client, private_key=alice)
    assert pm.on_chain_program_state(MULTIPLY) == OnChainProgramState.NotDeployed
    tx_id = pm.deploy_program(MULTIPLY)
    assert client.get_transaction(tx_id).kind == "deploy"
    assert pm.on_chain_program_state(MULTIPLY) == OnChainProgramState.Same
    # re-deploy rejected (deploy.rs:38-41)
    with pytest.raises(ProgramManagerError):
        pm.deploy_program(MULTIPLY)
    # execute on-chain program from a fresh manager (chain resolution)
    pm2 = ProgramManager(client, private_key=bob)
    tx2 = pm2.execute_program(
        "multiply_test.aleo", "multiply", [Value("u32", 6), Value("u32", 7)]
    )
    tx = client.get_transaction(tx2)
    assert tx.execution.authorization.verify()


def test_deploy_import_checks(chain):
    """Imports must already be on chain (deploy.rs:66-90)."""
    ledger, client, alice, bob = chain
    pm = ProgramManager(client, private_key=alice)
    with pytest.raises(ProgramManagerError):
        pm.deploy_program(IMPORTER)
    pm.deploy_program(MULTIPLY)
    pm.deploy_program(IMPORTER)
    assert "multiply_test.aleo" in client.get_program_imports("importer.aleo")


def test_record_finder_insufficient(chain):
    ledger, client, alice, bob = chain
    rf = RecordFinder(client)
    with pytest.raises(RecordFinderError):
        rf.find_one_record(bob, 1)
    rec = rf.find_one_record(alice, 2_000_000)
    assert rec.entries["microcredits"].data >= 2_000_000
    r1, r2 = rf.find_amount_and_fee_records(1_000_000, 500_000, alice)
    assert r1.commitment() != r2.commitment()


def test_fees_charged_and_estimated(chain):
    ledger, client, alice, bob = chain
    pm = ProgramManager(client, private_key=alice)
    est = pm.estimate_execution_fee(
        "credits.aleo", "transfer_private",
        [
            Record("credits.aleo", "credits", alice.address().x, 0,
                   {"microcredits": Value("u64", 100)}, 1),
            Value("address", bob.address().x),
            Value("u64", 10),
        ],
    )
    assert est > 0
    assert pm.estimate_namespace_fee("multiply_test.aleo") == 0
    assert pm.estimate_namespace_fee("abcd.aleo") == 10 ** 6 * 10 ** 6
    # a transfer with a fee consumes fee microcredits
    pm.transfer(1_000_000, 300_000, bob.address().to_string(),
                TransferType.Private)
    alice_total = sum(
        r.entries["microcredits"].data for _c, r in client.get_unspent_records(alice)
    )
    assert alice_total == 10_000_000 - 1_000_000 - 300_000


def test_manager_key_rules(chain):
    ledger, client, alice, bob = chain
    with pytest.raises(ProgramManagerError):
        ProgramManager(client)
    ct = encryptor.encrypt_private_key_with_secret(alice, "pw")
    pm = ProgramManager(client, private_key_ciphertext=ct)
    with pytest.raises(ProgramManagerError):
        pm.get_private_key()  # needs password
    assert pm.get_private_key("pw").seed == alice.seed
    pm2 = ProgramManager(client, private_key=alice)
    with pytest.raises(ProgramManagerError):
        pm2.get_private_key("pw")  # password without ciphertext


def test_authorization_signature(chain):
    ledger, client, alice, bob = chain
    auth = Authorization.sign(alice, "credits.aleo", "transfer_private", [1, 2, 3])
    assert auth.verify()
    auth.input_ids[0] = 9
    assert not auth.verify()


# -- proof-backed SDK flow (slow tier) ---------------------------------------

MICRO = """
program microsdk.aleo;

function bump:
    input r0 as u64.private;
    add r0 1u64 into r1;
    output r1 as u64.private;
"""


def test_execute_with_proof_and_verifying_ledger():
    """Fast-tier SNARK-backed flow (VERDICT r3 #9): broadcast with a real
    proof into a proof-verifying ledger. Micro-circuit keys ride the disk
    cache, keeping this inside the fast tier's budget (~2 min cold)."""
    ledger = Ledger(verify_proofs=True)
    alice = PrivateKey(seed=31337)
    ledger.genesis_mint(alice.address().to_string(), 1_000_000)
    client = LocalAPIClient(ledger)
    pm = ProgramManager(client, private_key=alice)
    pm.add_program(MICRO)
    ledger.program_sources["microsdk.aleo"] = MICRO
    ledger.registry.add(__import__("aleo_tpu.program.parser", fromlist=["parse_program"]).parse_program(MICRO))
    tx_id = pm.execute_program(
        "microsdk.aleo", "bump", [Value("u64", 41)], prove=True
    )
    tx = client.get_transaction(tx_id)
    assert tx.transitions()[0].proof is not None


def test_device_batch_ecdh_matches_host():
    """curves/edwards_device ECDH ladder vs the host oracle (VERDICT row 3:
    device kernels for the bulk record scan)."""
    import random

    from aleo_tpu.curves.edwards_device import shared_secrets
    from aleo_tpu.reference import edwards

    rng = random.Random(9)
    G = edwards.generator()
    pts = [edwards.mul(rng.randrange(2, 10_000), G) for _ in range(5)]
    view = rng.randrange(2, 10**30)
    got = shared_secrets(view, pts)
    want = [edwards.mul(view, p) for p in pts]
    assert got == want


def test_scan_uses_batch_path(chain, monkeypatch):
    """Large scans route through the device batch ECDH and agree with the
    per-record host path."""
    from aleo_tpu.sdk import api_client as ac

    ledger, client, alice, bob = chain
    monkeypatch.setattr(ac, "BATCH_ECDH_MIN", 1)
    recs_batch = client.get_unspent_records(alice)
    monkeypatch.setattr(ac, "BATCH_ECDH_MIN", 10_000)
    recs_host = client.get_unspent_records(alice)
    assert sorted(c for c, _ in recs_batch) == sorted(c for c, _ in recs_host)


def test_state_paths_and_inclusion_proofs(chain):
    """Merkle state paths (Trace::prepare twin, VERDICT row 19)."""
    from aleo_tpu.sdk.merkle import verify_path

    ledger, client, alice, bob = chain
    cm = next(iter(ledger.commitment_index))
    root, path = client.get_state_path(cm)
    assert verify_path(root, cm, path)
    assert not verify_path(root, (cm + 1), path)
    with pytest.raises(ApiError):
        client.get_state_path(123456789)
    # a transfer's transition carries verifying inclusion proofs
    pm = ProgramManager(client, private_key=alice)
    tx_id = pm.transfer(500_000, 0, bob.address().to_string(), TransferType.Private)
    tx = client.get_transaction(tx_id)
    t = tx.execution.transitions[0]
    assert t.inclusion_proofs, "consumed record must carry a state path"
    for (c, r, p) in t.inclusion_proofs:
        assert r in ledger.known_roots and verify_path(r, c, p)
    # forged path is rejected by the ledger
    from aleo_tpu.sdk.transactions import Transaction as Tx

    bad = client.get_transaction(tx_id)
    t.inclusion_proofs[0] = (t.inclusion_proofs[0][0] + 1, r, p)
    tx.id = Tx.fresh_id("execute")
    with pytest.raises(ApiError):
        client.transaction_broadcast(tx)
