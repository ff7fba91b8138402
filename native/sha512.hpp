// SHA-512 + HMAC-SHA512 + PBKDF2-HMAC-SHA512 — key-derivation primitives
// for the wallet layer (BIP39 seed / BIP32 child keys), the C++ analogue
// of the Rust bip39/bip32 crates used by the reference wallet
// (/root/reference/simfony-wallet/src/keys.rs:24-59).
#pragma once

#include <array>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace symphony {

using Digest64 = std::array<uint8_t, 64>;

class Sha512 {
 public:
  Sha512() { reset(); }

  void reset() {
    static const uint64_t init[8] = {
        0x6a09e667f3bcc908ull, 0xbb67ae8584caa73bull, 0x3c6ef372fe94f82bull,
        0xa54ff53a5f1d36f1ull, 0x510e527fade682d1ull, 0x9b05688c2b3e6c1full,
        0x1f83d9abfb41bd6bull, 0x5be0cd19137e2179ull};
    std::memcpy(h_, init, sizeof(h_));
    len_ = 0;
    buf_used_ = 0;
  }

  void update(const uint8_t* data, size_t n) {
    len_ += n;
    while (n) {
      size_t take = 128 - buf_used_;
      if (take > n) take = n;
      std::memcpy(buf_ + buf_used_, data, take);
      buf_used_ += take;
      data += take;
      n -= take;
      if (buf_used_ == 128) {
        compress(buf_);
        buf_used_ = 0;
      }
    }
  }

  Digest64 finalize() {
    uint64_t bitlen = len_ * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t zero = 0;
    while (buf_used_ != 112) update(&zero, 1);
    uint8_t lenb[16] = {0};
    for (int i = 0; i < 8; i++) lenb[15 - i] = uint8_t(bitlen >> (8 * i));
    update(lenb, 16);
    Digest64 out;
    for (int i = 0; i < 8; i++)
      for (int j = 0; j < 8; j++) out[8 * i + j] = uint8_t(h_[i] >> (56 - 8 * j));
    return out;
  }

 private:
  static uint64_t rotr(uint64_t x, int n) { return (x >> n) | (x << (64 - n)); }

  void compress(const uint8_t* p) {
    static const uint64_t K[80] = {
        0x428a2f98d728ae22ull, 0x7137449123ef65cdull, 0xb5c0fbcfec4d3b2full,
        0xe9b5dba58189dbbcull, 0x3956c25bf348b538ull, 0x59f111f1b605d019ull,
        0x923f82a4af194f9bull, 0xab1c5ed5da6d8118ull, 0xd807aa98a3030242ull,
        0x12835b0145706fbeull, 0x243185be4ee4b28cull, 0x550c7dc3d5ffb4e2ull,
        0x72be5d74f27b896full, 0x80deb1fe3b1696b1ull, 0x9bdc06a725c71235ull,
        0xc19bf174cf692694ull, 0xe49b69c19ef14ad2ull, 0xefbe4786384f25e3ull,
        0x0fc19dc68b8cd5b5ull, 0x240ca1cc77ac9c65ull, 0x2de92c6f592b0275ull,
        0x4a7484aa6ea6e483ull, 0x5cb0a9dcbd41fbd4ull, 0x76f988da831153b5ull,
        0x983e5152ee66dfabull, 0xa831c66d2db43210ull, 0xb00327c898fb213full,
        0xbf597fc7beef0ee4ull, 0xc6e00bf33da88fc2ull, 0xd5a79147930aa725ull,
        0x06ca6351e003826full, 0x142929670a0e6e70ull, 0x27b70a8546d22ffcull,
        0x2e1b21385c26c926ull, 0x4d2c6dfc5ac42aedull, 0x53380d139d95b3dfull,
        0x650a73548baf63deull, 0x766a0abb3c77b2a8ull, 0x81c2c92e47edaee6ull,
        0x92722c851482353bull, 0xa2bfe8a14cf10364ull, 0xa81a664bbc423001ull,
        0xc24b8b70d0f89791ull, 0xc76c51a30654be30ull, 0xd192e819d6ef5218ull,
        0xd69906245565a910ull, 0xf40e35855771202aull, 0x106aa07032bbd1b8ull,
        0x19a4c116b8d2d0c8ull, 0x1e376c085141ab53ull, 0x2748774cdf8eeb99ull,
        0x34b0bcb5e19b48a8ull, 0x391c0cb3c5c95a63ull, 0x4ed8aa4ae3418acbull,
        0x5b9cca4f7763e373ull, 0x682e6ff3d6b2b8a3ull, 0x748f82ee5defb2fcull,
        0x78a5636f43172f60ull, 0x84c87814a1f0ab72ull, 0x8cc702081a6439ecull,
        0x90befffa23631e28ull, 0xa4506cebde82bde9ull, 0xbef9a3f7b2c67915ull,
        0xc67178f2e372532bull, 0xca273eceea26619cull, 0xd186b8c721c0c207ull,
        0xeada7dd6cde0eb1eull, 0xf57d4f7fee6ed178ull, 0x06f067aa72176fbaull,
        0x0a637dc5a2c898a6ull, 0x113f9804bef90daeull, 0x1b710b35131c471bull,
        0x28db77f523047d84ull, 0x32caab7b40c72493ull, 0x3c9ebe0a15c9bebcull,
        0x431d67c49c100d4cull, 0x4cc5d4becb3e42b6ull, 0x597f299cfc657e2aull,
        0x5fcb6fab3ad6faecull, 0x6c44198c4a475817ull};
    uint64_t w[80];
    for (int i = 0; i < 16; i++) {
      w[i] = 0;
      for (int j = 0; j < 8; j++) w[i] = (w[i] << 8) | p[8 * i + j];
    }
    for (int i = 16; i < 80; i++) {
      uint64_t s0 = rotr(w[i - 15], 1) ^ rotr(w[i - 15], 8) ^ (w[i - 15] >> 7);
      uint64_t s1 = rotr(w[i - 2], 19) ^ rotr(w[i - 2], 61) ^ (w[i - 2] >> 6);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint64_t a = h_[0], b = h_[1], c = h_[2], d = h_[3];
    uint64_t e = h_[4], f = h_[5], g = h_[6], h = h_[7];
    for (int i = 0; i < 80; i++) {
      uint64_t S1 = rotr(e, 14) ^ rotr(e, 18) ^ rotr(e, 41);
      uint64_t ch = (e & f) ^ (~e & g);
      uint64_t t1 = h + S1 + ch + K[i] + w[i];
      uint64_t S0 = rotr(a, 28) ^ rotr(a, 34) ^ rotr(a, 39);
      uint64_t maj = (a & b) ^ (a & c) ^ (b & c);
      uint64_t t2 = S0 + maj;
      h = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h_[0] += a; h_[1] += b; h_[2] += c; h_[3] += d;
    h_[4] += e; h_[5] += f; h_[6] += g; h_[7] += h;
  }

  uint64_t h_[8];
  uint8_t buf_[128];
  size_t buf_used_ = 0;
  uint64_t len_ = 0;
};

inline Digest64 hmac_sha512(const uint8_t* key, size_t keylen,
                            const uint8_t* msg, size_t msglen) {
  uint8_t k[128] = {0};
  if (keylen > 128) {
    Sha512 h;
    h.update(key, keylen);
    Digest64 d = h.finalize();
    std::memcpy(k, d.data(), 64);
  } else {
    std::memcpy(k, key, keylen);
  }
  uint8_t ipad[128], opad[128];
  for (int i = 0; i < 128; i++) {
    ipad[i] = k[i] ^ 0x36;
    opad[i] = k[i] ^ 0x5c;
  }
  Sha512 inner;
  inner.update(ipad, 128);
  inner.update(msg, msglen);
  Digest64 ih = inner.finalize();
  Sha512 outer;
  outer.update(opad, 128);
  outer.update(ih.data(), 64);
  return outer.finalize();
}

// BIP39: seed = PBKDF2-HMAC-SHA512(mnemonic, "mnemonic" || passphrase, 2048, 64)
inline Digest64 pbkdf2_sha512_bip39(const std::string& mnemonic,
                                    const std::string& passphrase) {
  std::string salt = "mnemonic" + passphrase;
  std::vector<uint8_t> block(salt.begin(), salt.end());
  block.push_back(0); block.push_back(0); block.push_back(0); block.push_back(1);
  Digest64 u = hmac_sha512(
      reinterpret_cast<const uint8_t*>(mnemonic.data()), mnemonic.size(),
      block.data(), block.size());
  Digest64 out = u;
  for (int iter = 1; iter < 2048; iter++) {
    u = hmac_sha512(reinterpret_cast<const uint8_t*>(mnemonic.data()),
                    mnemonic.size(), u.data(), 64);
    for (int i = 0; i < 64; i++) out[i] ^= u[i];
  }
  return out;
}

}  // namespace symphony
