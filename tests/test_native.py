"""Native C++ harness (native/symphony) — build + run against fixtures.

The CLI is the simfony-cli analogue (scalar oracle verifier + transcript
debugger + proof inspector); it must agree with the JAX verifiers on all
fixtures.
"""

import pathlib
import subprocess

import pytest

ROOT = pathlib.Path(__file__).parent.parent
BIN = ROOT / "native" / "symphony"


@pytest.fixture(scope="module")
def binary():
    subprocess.run(["make", "-C", str(ROOT / "native")], check=True,
                   capture_output=True)
    assert BIN.exists()
    return str(BIN)


def test_native_stwo_fixtures(binary, fixtures_dir):
    for name in ["proof_test.json", "proof.json"]:
        out = subprocess.run(
            [binary, "verify-stwo", str(fixtures_dir / "stwo" / name)],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "ACCEPT" in out.stdout


def test_native_stark101_golden(binary, fixtures_dir):
    out = subprocess.run(
        [binary, "verify-stark101",
         str(fixtures_dir / "stark101" / "golden_proof.json")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ACCEPT" in out.stdout


def test_native_rejects_tampered(binary, fixtures_dir, tmp_path):
    import json

    data = json.load(open(fixtures_dir / "stwo" / "proof_test.json"))
    data["proof_of_work"] = int(data["proof_of_work"]) + 1
    bad = tmp_path / "bad.json"
    json.dump(data, open(bad, "w"))
    out = subprocess.run([binary, "verify-stwo", str(bad)],
                         capture_output=True, text=True)
    assert out.returncode == 1
    assert "REJECT" in out.stdout


def test_native_inspect(binary, fixtures_dir):
    out = subprocess.run(
        [binary, "inspect", str(fixtures_dir / "stwo" / "proof.json")],
        capture_output=True, text=True)
    assert out.returncode == 0
    assert "queries=16" in out.stdout
