"""L7 proving-worker surface: message-driven operations over queues
(twin of `/root/reference/website/src/workers/worker.js:95-658`)."""

import pytest

from aleo_tpu.sdk.account import PrivateKey
from aleo_tpu.sdk.api_client import LocalAPIClient
from aleo_tpu.sdk.ledger import Ledger
from aleo_tpu.sdk.worker import ProvingWorker

DOUBLER = (
    "program wdouble.aleo;\n\nfunction double:\n"
    "    input r0 as u32.private;\n    add r0 r0 into r1;\n"
    "    output r1 as u32.private;\n"
)


@pytest.fixture
def worker():
    ledger = Ledger()
    alice = PrivateKey(seed=5001)
    ledger.genesis_mint(alice.address().to_string(), 10_000_000, n_records=3)
    w = ProvingWorker(LocalAPIClient(ledger)).start()
    yield w, alice, ledger
    w.stop()


def test_local_execution_message(worker):
    w, alice, _ = worker
    resp = w.call({
        "type": "ALEO_EXECUTE_PROGRAM_LOCAL",
        "localProgram": DOUBLER,
        "aleoFunction": "double",
        "inputs": ["21u32"],
        "privateKey": alice.to_string(),
    })
    assert resp["type"] == "OFFLINE_EXECUTION_COMPLETED"
    assert resp["outputs"] == ["42"]


def test_deploy_then_execute_on_chain(worker):
    w, alice, ledger = worker
    resp = w.call({
        "type": "ALEO_DEPLOY", "program": DOUBLER,
        "privateKey": alice.to_string(),
    })
    assert resp["type"] == "DEPLOY_TRANSACTION_COMPLETED"
    resp = w.call({
        "type": "ALEO_EXECUTE_PROGRAM_ON_CHAIN",
        "programId": "wdouble.aleo",
        "aleoFunction": "double",
        "inputs": ["8u32"],
        "privateKey": alice.to_string(),
    })
    assert resp["type"] == "EXECUTION_TRANSACTION_COMPLETED"
    assert resp["transaction"].startswith("at1")


def test_transfer_split_join_messages(worker):
    w, alice, ledger = worker
    bob = PrivateKey(seed=5002)
    resp = w.call({
        "type": "ALEO_TRANSFER", "amountCredits": 400_000,
        "recipient": bob.address().to_string(),
        "privateKey": alice.to_string(),
    })
    assert resp["type"] == "TRANSFER_TRANSACTION_COMPLETED"
    client = LocalAPIClient(ledger)
    assert [
        r.entries["microcredits"].data
        for _c, r in client.get_unspent_records(bob)
    ] == [400_000]
    resp = w.call({
        "type": "ALEO_SPLIT", "splitAmount": 100_000,
        "privateKey": bob.to_string(),
    })
    assert resp["type"] == "SPLIT_TRANSACTION_COMPLETED"
    amounts = sorted(
        r.entries["microcredits"].data
        for _c, r in client.get_unspent_records(bob)
    )
    assert amounts == [100_000, 300_000]
    resp = w.call({
        "type": "ALEO_JOIN", "privateKey": bob.to_string(),
    })
    assert resp["type"] == "JOIN_TRANSACTION_COMPLETED"
    amounts = [
        r.entries["microcredits"].data
        for _c, r in client.get_unspent_records(bob)
    ]
    assert amounts == [400_000]


def test_fee_estimates_and_errors(worker):
    w, alice, _ = worker
    resp = w.call({
        "type": "ALEO_ESTIMATE_DEPLOYMENT_FEE", "program": DOUBLER,
        "privateKey": alice.to_string(),
    })
    assert resp["deploymentFee"] > 0
    with pytest.raises(RuntimeError):
        w.call({"type": "NO_SUCH_OP", "privateKey": alice.to_string()})
