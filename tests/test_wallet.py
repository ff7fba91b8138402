"""Native wallet layer (native/symphony-wallet) — the simfony-wallet
analogue (SURVEY.md §2.3): BIP39/BIP32 key derivation, taproot commitment
of the program artifact (leaf version 0xbe), script-path spend bundle with
cost/budget accounting, key-path Schnorr signing.
"""

import pathlib
import subprocess

import pytest

ROOT = pathlib.Path(__file__).parent.parent
BIN = ROOT / "native" / "symphony-wallet"
MNEMONIC = ("abandon abandon abandon abandon abandon abandon abandon "
            "abandon abandon abandon abandon about")


@pytest.fixture(scope="module")
def wallet():
    subprocess.run(["make", "-C", str(ROOT / "native"), "symphony-wallet"],
                   check=True, capture_output=True)
    assert BIN.exists()
    return str(BIN)


def test_wallet_selftest(wallet):
    out = subprocess.run([wallet, "selftest"], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "FAIL" not in out.stdout


def test_wallet_address_bip84_vector(wallet, fixtures_dir):
    """Internal key must match the published BIP84 test-vector pubkey for
    m/84'/0'/0'/0/0 of the 'abandon...about' mnemonic
    (02/03-prefixed compressed key 0330d54f...af3c)."""
    out = subprocess.run(
        [wallet, "address", "--mnemonic", MNEMONIC,
         "--program", str(fixtures_dir / "stwo" / "proof_test.json")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert ("internal key: 30d54fd0dd420a6e5f8d3624f5f3482cae350f79d5f0753b"
            "f5beef9c2d91af3c") in out.stdout
    assert "address:      tb1p" in out.stdout
    assert "leaf version: 0xbe" in out.stdout


def test_wallet_spend_bundle(wallet, fixtures_dir):
    prog = str(fixtures_dir / "stwo" / "proof_test.json")
    out = subprocess.run(
        [wallet, "spend", "--mnemonic", MNEMONIC, "--program", prog,
         "--witness", prog],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "control block: be" in out.stdout  # simplicity leaf version
    budget = int(out.stdout.split("budget:")[1].split()[0])
    cost = int(out.stdout.split("cost:")[1].split()[0])
    assert budget >= cost


def test_wallet_keypath_sign(wallet, fixtures_dir):
    prog = str(fixtures_dir / "stwo" / "proof_test.json")
    out = subprocess.run(
        [wallet, "spend", "--key-path", "--mnemonic", MNEMONIC,
         "--program", prog],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "keypath signature: " in out.stdout
    sig = out.stdout.split("keypath signature: ")[1].strip()
    assert len(sig) == 128
