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


class _MockChain:
    """Tiny localhost HTTP server standing in for Esplora / the Elements
    JSON-RPC node (the reference's network boundary, esplora.rs/rpc.rs)."""

    def __init__(self):
        import http.server
        import threading

        self.posts = []
        mock = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode()
                mock.posts.append((self.path, body))
                self.send_response(200)
                self.end_headers()
                if self.path == "/tx":  # esplora: respond with txid
                    self.wfile.write(b"deadbeef" * 8)
                else:  # json-rpc
                    self.wfile.write(
                        b'{"result":"cafebabe","error":null,"id":"symphony"}'
                    )

            def do_GET(self):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b'{"txid":"ab","status":{"confirmed":true}}')

            def log_message(self, *a):
                pass

        self.srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_port
        self.thread = threading.Thread(target=self.srv.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.srv.shutdown()


def test_wallet_broadcast_esplora_mock(wallet, fixtures_dir, tmp_path):
    """spend --broadcast hits the Esplora-style /tx endpoint with the
    4-item bundle and reports the returned txid (esplora.rs analogue)."""
    mock = _MockChain()
    try:
        wit = tmp_path / "w.bin"
        wit.write_bytes(b"\x01\x02\x03\x04" * 64)
        out = subprocess.run(
            [wallet, "spend", "--mnemonic", MNEMONIC,
             "--program", str(fixtures_dir / "stwo" / "proof_test.json"),
             "--witness", str(wit),
             "--broadcast", f"http://127.0.0.1:{mock.port}"],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "broadcast (esplora): txid " + "deadbeef" * 8 in out.stdout
        assert len(mock.posts) == 1
        path, body = mock.posts[0]
        assert path == "/tx"
        # bundle = witness:program:script:control, all hex
        parts = body.split(":")
        assert len(parts) == 4
        assert parts[0].startswith("01020304")
        assert len(parts[2]) == 64  # script = 32-byte program commitment
        assert len(parts[3]) == 66  # control = leaf-version byte + 32-byte key
    finally:
        mock.close()


def test_wallet_broadcast_rpc_mock(wallet, fixtures_dir, tmp_path):
    """spend --rpc issues sendrawtransaction and surfaces the result
    (rpc.rs analogue)."""
    mock = _MockChain()
    try:
        wit = tmp_path / "w.bin"
        wit.write_bytes(b"\xaa" * 16)
        out = subprocess.run(
            [wallet, "spend", "--mnemonic", MNEMONIC,
             "--program", str(fixtures_dir / "stwo" / "proof_test.json"),
             "--witness", str(wit),
             "--rpc", f"http://127.0.0.1:{mock.port}/",
             "--rpc-auth", "dXNlcjpwYXNz"],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "broadcast (rpc): txid cafebabe" in out.stdout
        path, body = mock.posts[0]
        assert '"method":"sendrawtransaction"' in body
    finally:
        mock.close()
