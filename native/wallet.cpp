// symphony-wallet — native deployment layer: the C++ analogue of the
// reference's Rust wallet (/root/reference/simfony-wallet/src/main.rs:24-150).
//
// Maps the reference's on-chain deployment flow onto this framework's
// artifacts:
//   * the "program" is a compiled verifier artifact (any byte blob — e.g.
//     a serialized XLA executable or the proof-system config); its
//     commitment (SHA-256, standing in for the Simplicity CMR,
//     script.rs:20-23) is the tapleaf script.
//   * `address`  — BIP39 mnemonic -> BIP32 m/84'/0'/0'/0/i keypair
//     (keys.rs:24-59) -> taproot output key committing to the Simplicity
//     tapleaf (version 0xbe, script.rs:46-48) -> bech32m address.
//   * `spend`    — assembles the script-path witness stack
//     [witness, program, script, control block] (transaction.rs:17-43),
//     runs the consensus cost / witness-budget check and appends padding
//     when the budget is short (transaction.rs:44-77 analogue;
//     cf. stark101/src/padding.simf), or key-path signs with the tweaked
//     key (transaction.rs:83-113, BIP340 Schnorr).
//   * network broadcast mirrors esplora.rs:4-24 / rpc.rs:9-43:
//     `--broadcast URL` POSTs the spend bundle to an Esplora-style /tx
//     endpoint, `--rpc URL` issues a sendrawtransaction JSON-RPC call
//     (net.hpp; offline-mock-tested in tests/test_wallet.py).  Without a
//     URL the bundle is printed for out-of-band submission.
//   * `selftest` — key-derivation and Schnorr test vectors.
//
// Exit code 0 = success, 1 = check failed, 2 = usage error.

#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "bech32.hpp"
#include "net.hpp"
#include "secp256k1.hpp"
#include "sha256.hpp"

namespace symphony {

static std::string hex(const uint8_t* p, size_t n) {
  static const char* d = "0123456789abcdef";
  std::string s;
  s.reserve(2 * n);
  for (size_t i = 0; i < n; i++) {
    s += d[p[i] >> 4];
    s += d[p[i] & 15];
  }
  return s;
}

static std::vector<uint8_t> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::stringstream ss;
  ss << f.rdbuf();
  std::string s = ss.str();
  return std::vector<uint8_t>(s.begin(), s.end());
}

// ---------------------------------------------------------------------- //
// cost / budget model (transaction.rs:44-77 analogue)                     //
// ---------------------------------------------------------------------- //
// The reference checks the Simplicity consensus cost of the program
// against the witness-proportional budget and appends padding bytes when
// short (the same constraint stark101 meets statically with pad_60kb(),
// padding.simf:7).  Same shape here: budget grows linearly with the
// serialized witness, cost is the verifier's hash-dominated execution
// estimate.
struct CostModel {
  static constexpr uint64_t BUDGET_PER_WITNESS_BYTE = 8;
  static constexpr uint64_t COST_PER_PROGRAM_BYTE = 2;
  static constexpr uint64_t COST_PER_WITNESS_BYTE = 1;

  static uint64_t cost(size_t program_len, size_t witness_len) {
    return COST_PER_PROGRAM_BYTE * program_len +
           COST_PER_WITNESS_BYTE * witness_len;
  }
  static uint64_t budget(size_t witness_len) {
    return BUDGET_PER_WITNESS_BYTE * witness_len;
  }
  // padding bytes needed so budget(w + pad) >= cost(p, w + pad)
  static uint64_t padding(size_t program_len, size_t witness_len) {
    uint64_t c = cost(program_len, witness_len);
    uint64_t b = budget(witness_len);
    if (b >= c) return 0;
    uint64_t per_byte = BUDGET_PER_WITNESS_BYTE - COST_PER_WITNESS_BYTE;
    return (c - b + per_byte - 1) / per_byte;
  }
};

struct Options {
  std::string mnemonic;
  std::string program_path;
  std::string witness_path;
  std::string hrp = "tb";
  std::string broadcast_url;  // Esplora-style base URL (esplora.rs)
  std::string rpc_url;        // JSON-RPC endpoint (rpc.rs)
  std::string rpc_auth;       // base64 user:pass for Authorization: Basic
  uint32_t index = 0;
  bool key_path = false;
};

static TaprootSpendInfo commit_program(const Options& opt, KeyPair* kp_out,
                                       std::vector<uint8_t>* script_out) {
  std::vector<uint8_t> program = read_file(opt.program_path);
  Digest cmr = sha256_bytes(program);  // program commitment (CMR analogue)
  std::vector<uint8_t> script(cmr.begin(), cmr.end());
  Digest leaf = tapleaf_hash(SIMPLICITY_LEAF_VERSION, script);
  U256 sec = derive_bip84(opt.mnemonic, opt.index);
  KeyPair kp = keypair_from_secret(sec);
  if (kp_out) *kp_out = kp;
  if (script_out) *script_out = script;
  return taproot_commit(kp, leaf);
}

static int cmd_address(const Options& opt) {
  KeyPair kp;
  TaprootSpendInfo info = commit_program(opt, &kp, nullptr);
  uint8_t buf[32];
  u256_to_be(info.internal_x, buf);
  std::printf("internal key: %s\n", hex(buf, 32).c_str());
  u256_to_be(info.output_x, buf);
  std::printf("output key:   %s\n", hex(buf, 32).c_str());
  std::printf("leaf version: 0x%02x\n", SIMPLICITY_LEAF_VERSION);
  std::printf("address:      %s\n",
              bech32m_segwit_v1(
                  opt.hrp, std::vector<uint8_t>(buf, buf + 32)).c_str());
  return 0;
}

static int cmd_spend(const Options& opt) {
  KeyPair kp;
  std::vector<uint8_t> script;
  TaprootSpendInfo info = commit_program(opt, &kp, &script);
  std::vector<uint8_t> program = read_file(opt.program_path);

  if (opt.key_path) {
    // key-path spend: Schnorr-sign the sighash with the tweaked key
    // (transaction.rs:83-113).
    KeyPair tweaked = taproot_tweak_seckey(kp, info.merkle_root);
    uint8_t out_be[32];
    u256_to_be(info.output_x, out_be);
    uint8_t tw_be[32];
    u256_to_be(tweaked.pub_x, tw_be);
    if (std::memcmp(out_be, tw_be, 32) != 0) {
      std::fprintf(stderr, "tweak mismatch: seckey/output key disagree\n");
      return 1;
    }
    Digest sighash = tagged_hash("TapSighash", out_be, 32);
    auto sig = schnorr_sign(tweaked, sighash.data());
    if (!schnorr_verify(tweaked.pub_x, sighash.data(), sig.data())) {
      std::fprintf(stderr, "self-verify of signature failed\n");
      return 1;
    }
    std::printf("keypath signature: %s\n", hex(sig.data(), 64).c_str());
    return 0;
  }

  // script-path spend: [witness, program, script, control block]
  std::vector<uint8_t> witness = read_file(opt.witness_path);
  uint64_t pad = CostModel::padding(program.size(), witness.size());
  std::vector<uint8_t> control;
  control.push_back(SIMPLICITY_LEAF_VERSION | (info.output_parity ? 1 : 0));
  uint8_t ik[32];
  u256_to_be(info.internal_x, ik);
  control.insert(control.end(), ik, ik + 32);

  std::printf("witness size:  %zu (+%llu padding)\n", witness.size(),
              (unsigned long long)pad);
  std::printf("program size:  %zu\n", program.size());
  std::printf("cost:          %llu\n",
              (unsigned long long)CostModel::cost(
                  program.size(), witness.size() + pad));
  std::printf("budget:        %llu\n",
              (unsigned long long)CostModel::budget(witness.size() + pad));
  std::printf("script:        %s\n", hex(script.data(), script.size()).c_str());
  std::printf("control block: %s\n",
              hex(control.data(), control.size()).c_str());
  witness.insert(witness.end(), pad, 0);
  Digest wd = sha256_bytes(witness);
  std::printf("witness digest: %s\n", hex(wd.data(), 32).c_str());

  // serialize the spend bundle: the four witness-stack items, hex, in
  // stack order (transaction.rs:17-43)
  std::string bundle = hex(witness.data(), witness.size()) + ":" +
                       hex(program.data(), program.size()) + ":" +
                       hex(script.data(), script.size()) + ":" +
                       hex(control.data(), control.size());

  if (!opt.broadcast_url.empty()) {
    std::string txid = esplora_broadcast(opt.broadcast_url, bundle);
    std::printf("broadcast (esplora): txid %s\n", txid.c_str());
    return 0;
  }
  if (!opt.rpc_url.empty()) {
    std::string txid =
        rpc_sendrawtransaction(opt.rpc_url, bundle, opt.rpc_auth);
    std::printf("broadcast (rpc): txid %s\n", txid.c_str());
    return 0;
  }
  std::printf("broadcast: no endpoint given (--broadcast/--rpc); submit the "
              "four stack items above via external tooling\n");
  return 0;
}

static int cmd_selftest() {
  int fails = 0;
  auto expect = [&](bool ok, const char* what) {
    std::printf("%s %s\n", ok ? "ok  " : "FAIL", what);
    if (!ok) fails++;
  };

  // BIP340: x-only pubkey of secret d=3
  KeyPair kp3 = keypair_from_secret({3, 0, 0, 0});
  uint8_t px[32];
  u256_to_be(kp3.pub_x, px);
  expect(hex(px, 32) ==
             "f9308a019258c31049344f85f89d5229b531c845836f99b08601f113bce0"
             "36f9",
         "BIP340 pubkey for d=3");

  // Schnorr sign/verify round-trip + tamper rejection
  uint8_t msg[32] = {0};
  msg[31] = 0x42;
  auto sig = schnorr_sign(kp3, msg);
  expect(schnorr_verify(kp3.pub_x, msg, sig.data()), "schnorr roundtrip");
  sig[40] ^= 1;
  expect(!schnorr_verify(kp3.pub_x, msg, sig.data()), "schnorr tamper");
  sig[40] ^= 1;
  msg[0] ^= 1;
  expect(!schnorr_verify(kp3.pub_x, msg, sig.data()), "schnorr wrong msg");
  msg[0] ^= 1;

  // BIP39 seed vector ("abandon"x11 + "about", empty passphrase)
  std::string mn =
      "abandon abandon abandon abandon abandon abandon abandon abandon "
      "abandon abandon abandon about";
  Digest64 seed = pbkdf2_sha512_bip39(mn, "");
  expect(hex(seed.data(), 64) ==
             "5eb00bbddcf069084889a8ab9155568165f5c453ccb85e70811aaed6f6da5fc1"
             "9a5ac40b389cd370d086206dec8aa6c43daea6690f20ad3d8d48b2d2ce9e38e4",
         "BIP39 seed vector");

  // taproot: key-path signature under the tweaked key verifies against
  // the committed output key
  std::vector<uint8_t> script = {0xde, 0xad, 0xbe, 0xef};
  Digest leaf = tapleaf_hash(SIMPLICITY_LEAF_VERSION, script);
  TaprootSpendInfo info = taproot_commit(kp3, leaf);
  KeyPair tweaked = taproot_tweak_seckey(kp3, leaf);
  expect(u256_cmp(info.output_x, tweaked.pub_x) == 0,
         "taproot tweak pub/sec agree");
  auto sig2 = schnorr_sign(tweaked, msg);
  expect(schnorr_verify(info.output_x, msg, sig2.data()),
         "taproot keypath signature");

  // cost/budget: padding makes the budget cover the cost
  uint64_t pad = CostModel::padding(100000, 1000);
  expect(CostModel::budget(1000 + pad) >=
             CostModel::cost(100000, 1000 + pad),
         "budget covers cost after padding");

  return fails ? 1 : 0;
}

}  // namespace symphony

int main(int argc, char** argv) {
  using namespace symphony;
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: symphony-wallet <address|spend|fetch|selftest> "
                 "[--mnemonic M] [--index N] [--program F] [--witness F] "
                 "[--broadcast URL] [--rpc URL] [--rpc-auth B64] "
                 "[--hrp H] [--key-path]\n");
    return 2;
  }
  std::string cmd = argv[1];
  Options opt;
  for (int i = 2; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) throw std::runtime_error("missing value for " + a);
      return argv[++i];
    };
    try {
      if (a == "--mnemonic") opt.mnemonic = next();
      else if (a == "--index") opt.index = uint32_t(std::stoul(next()));
      else if (a == "--program") opt.program_path = next();
      else if (a == "--witness") opt.witness_path = next();
      else if (a == "--hrp") opt.hrp = next();
      else if (a == "--broadcast") opt.broadcast_url = next();
      else if (a == "--rpc") opt.rpc_url = next();
      else if (a == "--rpc-auth") opt.rpc_auth = next();
      else if (a == "--key-path") opt.key_path = true;
      else {
        std::fprintf(stderr, "unknown flag %s\n", a.c_str());
        return 2;
      }
    } catch (const std::exception& e) {
      std::fprintf(stderr, "%s\n", e.what());
      return 2;
    }
  }
  try {
    if (cmd == "selftest") return cmd_selftest();
    if (cmd == "address") return cmd_address(opt);
    if (cmd == "spend") return cmd_spend(opt);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 2;
  }
  std::fprintf(stderr, "unknown command %s\n", cmd.c_str());
  return 2;
}
