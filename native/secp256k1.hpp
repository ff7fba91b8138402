// Minimal from-scratch secp256k1 + BIP340 Schnorr + BIP341 taproot tweak +
// BIP32 key derivation, for the native wallet layer — the C++ analogue of
// the reference's Rust key/taproot stack
// (/root/reference/simfony-wallet/src/keys.rs:5-59, script.rs:46-74).
//
// Not constant-time; intended for the offline address/spend CLI harness,
// not as a hardened production signer.
#pragma once

#include <array>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

#include "sha256.hpp"
#include "sha512.hpp"

namespace symphony {

using u128 = unsigned __int128;
using U256 = std::array<uint64_t, 4>;  // little-endian limbs

// ---------------------------------------------------------------------- //
// generic 256-bit helpers                                                 //
// ---------------------------------------------------------------------- //
inline bool u256_is_zero(const U256& a) {
  return !(a[0] | a[1] | a[2] | a[3]);
}
inline int u256_cmp(const U256& a, const U256& b) {
  for (int i = 3; i >= 0; i--) {
    if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
  }
  return 0;
}
inline uint64_t u256_add(U256& r, const U256& a, const U256& b) {
  u128 c = 0;
  for (int i = 0; i < 4; i++) {
    c += (u128)a[i] + b[i];
    r[i] = (uint64_t)c;
    c >>= 64;
  }
  return (uint64_t)c;
}
inline uint64_t u256_sub(U256& r, const U256& a, const U256& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
  return (uint64_t)borrow;
}
inline U256 u256_from_be(const uint8_t* p) {
  U256 r{};
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 8; j++)
      r[3 - i] = (r[3 - i] << 8) | p[8 * i + j];
  return r;
}
inline void u256_to_be(const U256& a, uint8_t* p) {
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 8; j++)
      p[8 * i + j] = uint8_t(a[3 - i] >> (56 - 8 * j));
}

// 512-bit product
inline void u256_mul_wide(const U256& a, const U256& b, uint64_t out[8]) {
  std::memset(out, 0, 8 * sizeof(uint64_t));
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)a[i] * b[j] + out[i + j] + carry;
      out[i + j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    out[i + 4] += (uint64_t)carry;
  }
}

// slow generic 512-bit mod m (shift-subtract); used only for scalar (mod n)
// math in signing — a handful of calls per signature.
inline U256 u512_mod(const uint64_t w[8], const U256& m) {
  U256 r{};
  for (int bit = 511; bit >= 0; bit--) {
    // r = r*2 + bit
    uint64_t top = r[3] >> 63;
    for (int i = 3; i > 0; i--) r[i] = (r[i] << 1) | (r[i - 1] >> 63);
    r[0] = (r[0] << 1) | ((w[bit / 64] >> (bit % 64)) & 1);
    if (top || u256_cmp(r, m) >= 0) u256_sub(r, r, m);
  }
  return r;
}

// ---------------------------------------------------------------------- //
// field mod p = 2^256 - 2^32 - 977 (fast special-form reduction)          //
// ---------------------------------------------------------------------- //
static const U256 SECP_P = {0xFFFFFFFEFFFFFC2Full, 0xFFFFFFFFFFFFFFFFull,
                            0xFFFFFFFFFFFFFFFFull, 0xFFFFFFFFFFFFFFFFull};
static const U256 SECP_N = {0xBFD25E8CD0364141ull, 0xBAAEDCE6AF48A03Bull,
                            0xFFFFFFFFFFFFFFFEull, 0xFFFFFFFFFFFFFFFFull};

inline U256 fe_norm(U256 a) {
  if (u256_cmp(a, SECP_P) >= 0) u256_sub(a, a, SECP_P);
  return a;
}
inline U256 fe_add(const U256& a, const U256& b) {
  U256 r;
  uint64_t c = u256_add(r, a, b);
  if (c || u256_cmp(r, SECP_P) >= 0) u256_sub(r, r, SECP_P);
  return r;
}
inline U256 fe_sub(const U256& a, const U256& b) {
  U256 r;
  if (u256_sub(r, a, b)) u256_add(r, r, SECP_P);
  return r;
}
inline U256 fe_mul(const U256& a, const U256& b) {
  // 512-bit product; fold high 256 bits H via H*(2^32 + 977), twice.
  uint64_t w[8];
  u256_mul_wide(a, b, w);
  const uint64_t C = 0x1000003D1ull;  // 2^32 + 977
  // first fold: lo += hi * C
  uint64_t acc[5] = {w[0], w[1], w[2], w[3], 0};
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)w[4 + i] * C + acc[i] + carry;
    acc[i] = (uint64_t)cur;
    carry = cur >> 64;
  }
  acc[4] = (uint64_t)carry;
  // second fold: acc[4] * C
  u128 cur = (u128)acc[4] * C + acc[0];
  U256 r;
  r[0] = (uint64_t)cur;
  cur >>= 64;
  for (int i = 1; i < 4; i++) {
    cur += acc[i];
    r[i] = (uint64_t)cur;
    cur >>= 64;
  }
  if (cur) {  // rare third fold
    U256 add = {C, 0, 0, 0};
    uint64_t c2 = u256_add(r, r, add);
    (void)c2;
  }
  return fe_norm(r);
}
inline U256 fe_sqr(const U256& a) { return fe_mul(a, a); }

inline U256 fe_pow(U256 base, const U256& exp) {
  U256 r = {1, 0, 0, 0};
  for (int i = 255; i >= 0; i--) {
    r = fe_sqr(r);
    if ((exp[i / 64] >> (i % 64)) & 1) r = fe_mul(r, base);
  }
  return r;
}
inline U256 fe_inv(const U256& a) {
  U256 pm2 = SECP_P;
  pm2[0] -= 2;
  return fe_pow(a, pm2);
}

// scalar (mod n) ops
inline U256 sc_mod(const U256& a) {
  U256 r = a;
  if (u256_cmp(r, SECP_N) >= 0) u256_sub(r, r, SECP_N);
  return r;
}
inline U256 sc_add(const U256& a, const U256& b) {
  U256 r;
  uint64_t c = u256_add(r, a, b);
  if (c || u256_cmp(r, SECP_N) >= 0) u256_sub(r, r, SECP_N);
  return r;
}
inline U256 sc_mul(const U256& a, const U256& b) {
  uint64_t w[8];
  u256_mul_wide(a, b, w);
  return u512_mod(w, SECP_N);
}
inline U256 sc_neg(const U256& a) {
  if (u256_is_zero(a)) return a;
  U256 r;
  u256_sub(r, SECP_N, a);
  return r;
}

// ---------------------------------------------------------------------- //
// group (Jacobian coordinates)                                            //
// ---------------------------------------------------------------------- //
struct Point {
  U256 x, y, z;  // z == 0 -> infinity
  bool infinity() const { return u256_is_zero(z); }
};

static const Point SECP_G = {
    {0x59F2815B16F81798ull, 0x029BFCDB2DCE28D9ull, 0x55A06295CE870B07ull,
     0x79BE667EF9DCBBACull},
    {0x9C47D08FFB10D4B8ull, 0xFD17B448A6855419ull, 0x5DA4FBFC0E1108A8ull,
     0x483ADA7726A3C465ull},
    {1, 0, 0, 0}};

inline Point pt_double(const Point& p) {
  if (p.infinity() || u256_is_zero(p.y)) return {{0},{0},{0}};
  U256 ysq = fe_sqr(p.y);
  U256 s = fe_mul(p.x, ysq);
  s = fe_add(fe_add(s, s), fe_add(s, s));  // 4*x*y^2
  U256 xsq = fe_sqr(p.x);
  U256 m = fe_add(fe_add(xsq, xsq), xsq);  // 3*x^2 (a=0)
  Point r;
  r.x = fe_sub(fe_sqr(m), fe_add(s, s));
  U256 ysq2 = fe_sqr(ysq);
  U256 e = fe_add(fe_add(ysq2, ysq2), fe_add(ysq2, ysq2));
  e = fe_add(e, e);  // 8*y^4
  r.y = fe_sub(fe_mul(m, fe_sub(s, r.x)), e);
  r.z = fe_mul(p.y, p.z);
  r.z = fe_add(r.z, r.z);
  return r;
}

inline Point pt_add(const Point& p, const Point& q) {
  if (p.infinity()) return q;
  if (q.infinity()) return p;
  U256 z1z1 = fe_sqr(p.z), z2z2 = fe_sqr(q.z);
  U256 u1 = fe_mul(p.x, z2z2), u2 = fe_mul(q.x, z1z1);
  U256 s1 = fe_mul(fe_mul(p.y, q.z), z2z2);
  U256 s2 = fe_mul(fe_mul(q.y, p.z), z1z1);
  if (u256_cmp(u1, u2) == 0) {
    if (u256_cmp(s1, s2) == 0) return pt_double(p);
    return {{0},{0},{0}};
  }
  U256 h = fe_sub(u2, u1);
  U256 i = fe_sqr(fe_add(h, h));
  U256 j = fe_mul(h, i);
  U256 rr = fe_sub(s2, s1);
  rr = fe_add(rr, rr);
  U256 v = fe_mul(u1, i);
  Point r;
  r.x = fe_sub(fe_sub(fe_sqr(rr), j), fe_add(v, v));
  U256 s1j = fe_mul(s1, j);
  r.y = fe_sub(fe_mul(rr, fe_sub(v, r.x)), fe_add(s1j, s1j));
  // z3 = ((z1+z2)^2 - z1z1 - z2z2) * h
  U256 zs = fe_sqr(fe_add(p.z, q.z));
  zs = fe_sub(fe_sub(zs, z1z1), z2z2);
  r.z = fe_mul(zs, h);
  return r;
}

inline Point pt_mul(const Point& p, const U256& k) {
  Point r = {{0},{0},{0}};
  for (int i = 255; i >= 0; i--) {
    r = pt_double(r);
    if ((k[i / 64] >> (i % 64)) & 1) r = pt_add(r, p);
  }
  return r;
}

struct Affine {
  U256 x, y;
};
inline Affine pt_affine(const Point& p) {
  if (p.infinity()) throw std::runtime_error("point at infinity");
  U256 zi = fe_inv(p.z);
  U256 zi2 = fe_sqr(zi);
  return {fe_mul(p.x, zi2), fe_mul(p.y, fe_mul(zi2, zi))};
}
inline bool fe_is_odd(const U256& a) { return a[0] & 1; }

// ---------------------------------------------------------------------- //
// BIP340 Schnorr (x-only keys)                                            //
// ---------------------------------------------------------------------- //
inline Digest tagged_hash(const std::string& tag, const uint8_t* data,
                          size_t n) {
  Digest th = sha256_bytes(
      std::vector<uint8_t>(tag.begin(), tag.end()));
  Sha256 c;
  c.update(th.data(), 32);
  c.update(th.data(), 32);
  c.update(data, n);
  return c.finalize();
}

struct KeyPair {
  U256 seckey;   // normalized so pubkey has even y
  U256 pub_x;    // x-only public key
};

inline U256 u512_mod_from_be(const Digest& d);
inline U256 lift_x_even_y(const U256& x);

inline KeyPair keypair_from_secret(U256 d) {
  d = sc_mod(d);
  if (u256_is_zero(d)) throw std::runtime_error("zero secret key");
  Affine P = pt_affine(pt_mul(SECP_G, d));
  if (fe_is_odd(P.y)) d = sc_neg(d);
  return {d, P.x};
}

// BIP340 sign of a 32-byte message with zero aux randomness.
inline std::array<uint8_t, 64> schnorr_sign(const KeyPair& kp,
                                            const uint8_t msg[32]) {
  uint8_t dbe[32], aux[32] = {0};
  u256_to_be(kp.seckey, dbe);
  Digest auxh = tagged_hash("BIP0340/aux", aux, 32);
  uint8_t t[32];
  for (int i = 0; i < 32; i++) t[i] = dbe[i] ^ auxh[i];
  uint8_t noncebuf[96];
  std::memcpy(noncebuf, t, 32);
  u256_to_be(kp.pub_x, noncebuf + 32);
  std::memcpy(noncebuf + 64, msg, 32);
  Digest rand = tagged_hash("BIP0340/nonce", noncebuf, 96);
  U256 k = u512_mod_from_be(rand);
  if (u256_is_zero(k)) throw std::runtime_error("bad nonce");
  Affine R = pt_affine(pt_mul(SECP_G, k));
  if (fe_is_odd(R.y)) k = sc_neg(k);
  uint8_t ebuf[96];
  u256_to_be(R.x, ebuf);
  u256_to_be(kp.pub_x, ebuf + 32);
  std::memcpy(ebuf + 64, msg, 32);
  Digest eh = tagged_hash("BIP0340/challenge", ebuf, 96);
  U256 e = u512_mod_from_be(eh);
  U256 s = sc_add(k, sc_mul(e, kp.seckey));
  std::array<uint8_t, 64> sig;
  u256_to_be(R.x, sig.data());
  u256_to_be(s, sig.data() + 32);
  return sig;
}

inline bool schnorr_verify(const U256& pub_x, const uint8_t msg[32],
                           const uint8_t sig[64]) {
  U256 rx = u256_from_be(sig);
  U256 s = u256_from_be(sig + 32);
  if (u256_cmp(rx, SECP_P) >= 0 || u256_cmp(s, SECP_N) >= 0) return false;
  uint8_t ebuf[96];
  std::memcpy(ebuf, sig, 32);
  u256_to_be(pub_x, ebuf + 32);
  std::memcpy(ebuf + 64, msg, 32);
  Digest eh = tagged_hash("BIP0340/challenge", ebuf, 96);
  U256 e = u512_mod_from_be(eh);
  U256 y;
  try {
    y = lift_x_even_y(pub_x);
  } catch (const std::exception&) {
    return false;  // x not on curve
  }
  Point P = {pub_x, y, {1, 0, 0, 0}};
  // R' = s*G - e*P
  Point sG = pt_mul(SECP_G, s);
  Point eP = pt_mul(P, e);
  eP.y = fe_sub({0, 0, 0, 0}, eP.y);
  Point Rp = pt_add(sG, eP);
  if (Rp.infinity()) return false;
  Affine Ra = pt_affine(Rp);
  return !fe_is_odd(Ra.y) && u256_cmp(Ra.x, rx) == 0;
}

inline U256 u512_mod_from_be(const Digest& d) {
  U256 a = u256_from_be(d.data());
  uint64_t w[8] = {a[0], a[1], a[2], a[3], 0, 0, 0, 0};
  return u512_mod(w, SECP_N);
}

// ---------------------------------------------------------------------- //
// BIP32 (HMAC-SHA512 chain) — keys.rs:24-59 analogue                      //
// ---------------------------------------------------------------------- //
struct XPriv {
  U256 key;
  uint8_t chain[32];
};

inline XPriv bip32_master(const uint8_t* seed, size_t n) {
  static const char* hk = "Bitcoin seed";
  Digest64 I = hmac_sha512(reinterpret_cast<const uint8_t*>(hk), 12, seed, n);
  XPriv x;
  x.key = sc_mod(u256_from_be(I.data()));
  std::memcpy(x.chain, I.data() + 32, 32);
  return x;
}

inline XPriv bip32_child(const XPriv& parent, uint32_t index) {
  uint8_t data[37];
  if (index & 0x80000000u) {  // hardened: 0x00 || ser256(k) || index
    data[0] = 0;
    u256_to_be(parent.key, data + 1);
  } else {  // normal: serP(K) || index
    Affine P = pt_affine(pt_mul(SECP_G, parent.key));
    data[0] = fe_is_odd(P.y) ? 0x03 : 0x02;
    u256_to_be(P.x, data + 1);
  }
  for (int i = 0; i < 4; i++) data[33 + i] = uint8_t(index >> (24 - 8 * i));
  Digest64 I = hmac_sha512(parent.chain, 32, data, 37);
  XPriv x;
  x.key = sc_add(sc_mod(u256_from_be(I.data())), parent.key);
  std::memcpy(x.chain, I.data() + 32, 32);
  return x;
}

// m/84'/0'/0'/0/index — the derivation path of keys.rs:36-44.
inline U256 derive_bip84(const std::string& mnemonic, uint32_t index) {
  Digest64 seed = pbkdf2_sha512_bip39(mnemonic, "");
  XPriv x = bip32_master(seed.data(), 64);
  const uint32_t H = 0x80000000u;
  for (uint32_t step : {84u | H, 0u | H, 0u | H, 0u, index}) {
    x = bip32_child(x, step);
  }
  return x.key;
}

// ---------------------------------------------------------------------- //
// BIP341 taproot                                                          //
// ---------------------------------------------------------------------- //
// Leaf version 0xbe = Simplicity tapleaf (script.rs:46-48).
constexpr uint8_t SIMPLICITY_LEAF_VERSION = 0xbe;

inline Digest tapleaf_hash(uint8_t leaf_version,
                           const std::vector<uint8_t>& script) {
  std::vector<uint8_t> buf;
  buf.push_back(leaf_version);
  // compact-size length (scripts here are < 0xfd or < 2^16)
  if (script.size() < 0xfd) {
    buf.push_back(uint8_t(script.size()));
  } else {
    buf.push_back(0xfd);
    buf.push_back(uint8_t(script.size() & 0xff));
    buf.push_back(uint8_t(script.size() >> 8));
  }
  buf.insert(buf.end(), script.begin(), script.end());
  return tagged_hash("TapLeaf", buf.data(), buf.size());
}

struct TaprootSpendInfo {
  U256 internal_x;     // internal (untweaked) x-only key
  U256 output_x;       // tweaked output key
  bool output_parity;  // y parity of tweaked key
  Digest merkle_root;  // single-leaf tree root = tapleaf hash
};

inline TaprootSpendInfo taproot_commit(const KeyPair& internal,
                                       const Digest& merkle_root) {
  uint8_t buf[64];
  u256_to_be(internal.pub_x, buf);
  std::memcpy(buf + 32, merkle_root.data(), 32);
  Digest th = tagged_hash("TapTweak", buf, 64);
  U256 t = u512_mod_from_be(th);
  Point Q = pt_add(pt_mul(SECP_G, t),
                   Point{internal.pub_x, lift_x_even_y(internal.pub_x),
                         {1, 0, 0, 0}});
  Affine Qa = pt_affine(Q);
  return {internal.pub_x, Qa.x, fe_is_odd(Qa.y), merkle_root};
}

// tweaked secret key for key-path spends (keys.rs:5-21 analogue)
inline KeyPair taproot_tweak_seckey(const KeyPair& internal,
                                    const Digest& merkle_root) {
  uint8_t buf[64];
  u256_to_be(internal.pub_x, buf);
  std::memcpy(buf + 32, merkle_root.data(), 32);
  Digest th = tagged_hash("TapTweak", buf, 64);
  U256 t = u512_mod_from_be(th);
  return keypair_from_secret(sc_add(internal.seckey, t));
}

inline U256 lift_x_even_y(const U256& x) {
  U256 rhs = fe_add(fe_mul(fe_sqr(x), x), {7, 0, 0, 0});
  U256 exp = SECP_P;
  uint64_t carry = 1;
  for (int i = 0; i < 4 && carry; i++) {
    uint64_t prev = exp[i];
    exp[i] = prev + carry;
    carry = exp[i] < prev;
  }
  for (int shift = 0; shift < 2; shift++) {
    for (int i = 0; i < 3; i++) exp[i] = (exp[i] >> 1) | (exp[i + 1] << 63);
    exp[3] >>= 1;
  }
  U256 y = fe_pow(rhs, exp);
  if (u256_cmp(fe_sqr(y), fe_norm(rhs)) != 0)
    throw std::runtime_error("x not on curve");
  if (fe_is_odd(y)) y = fe_sub({0, 0, 0, 0}, y);
  return y;
}

}  // namespace symphony
