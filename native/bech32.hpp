// Bech32m (BIP350) encoding for segwit v1 (taproot) addresses — the
// address-rendering analogue of the reference wallet's Liquid-testnet
// address builder (/root/reference/simfony-wallet/src/script.rs:26-43).
#pragma once

#include <cstdint>
#include <stdexcept>
#include <string>
#include <vector>

namespace symphony {

inline uint32_t bech32_polymod(const std::vector<uint8_t>& values) {
  static const uint32_t GEN[5] = {0x3b6a57b2, 0x26508e6d, 0x1ea119fa,
                                  0x3d4233dd, 0x2a1462b3};
  uint32_t chk = 1;
  for (uint8_t v : values) {
    uint8_t top = chk >> 25;
    chk = ((chk & 0x1ffffff) << 5) ^ v;
    for (int i = 0; i < 5; i++)
      if ((top >> i) & 1) chk ^= GEN[i];
  }
  return chk;
}

inline std::vector<uint8_t> bech32_hrp_expand(const std::string& hrp) {
  std::vector<uint8_t> out;
  for (char c : hrp) out.push_back(uint8_t(c) >> 5);
  out.push_back(0);
  for (char c : hrp) out.push_back(uint8_t(c) & 31);
  return out;
}

// 8-bit groups -> 5-bit groups, left-padded
inline std::vector<uint8_t> convert_bits_8to5(const std::vector<uint8_t>& in) {
  std::vector<uint8_t> out;
  uint32_t acc = 0;
  int bits = 0;
  for (uint8_t b : in) {
    acc = (acc << 8) | b;
    bits += 8;
    while (bits >= 5) {
      bits -= 5;
      out.push_back((acc >> bits) & 31);
    }
  }
  if (bits) out.push_back((acc << (5 - bits)) & 31);
  return out;
}

// Encode a segwit v1 program (32-byte x-only key) as bech32m.
inline std::string bech32m_segwit_v1(const std::string& hrp,
                                     const std::vector<uint8_t>& program) {
  static const char* CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l";
  const uint32_t BECH32M_CONST = 0x2bc830a3;
  std::vector<uint8_t> data;
  data.push_back(1);  // witness version 1
  std::vector<uint8_t> prog5 = convert_bits_8to5(program);
  data.insert(data.end(), prog5.begin(), prog5.end());

  std::vector<uint8_t> values = bech32_hrp_expand(hrp);
  values.insert(values.end(), data.begin(), data.end());
  values.insert(values.end(), 6, 0);
  uint32_t polymod = bech32_polymod(values) ^ BECH32M_CONST;
  std::string out = hrp + "1";
  for (uint8_t d : data) out += CHARSET[d];
  for (int i = 0; i < 6; i++) out += CHARSET[(polymod >> (5 * (5 - i))) & 31];
  return out;
}

}  // namespace symphony
