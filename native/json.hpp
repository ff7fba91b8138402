// Minimal recursive-descent JSON parser (objects, arrays, numbers, strings,
// booleans, null) — enough for the stwo/stark101 proof fixtures.  No
// external dependencies.
#pragma once

#include <cstdint>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace symphony {

struct Json;
using JsonPtr = std::shared_ptr<Json>;

struct Json {
  enum Type { Null, Bool, Num, Str, Arr, Obj } type = Null;
  bool b = false;
  double num = 0;
  uint64_t unum = 0;  // exact integer payload when integral
  std::string str;
  std::vector<JsonPtr> arr;
  std::map<std::string, JsonPtr> obj;

  const Json& at(size_t i) const { return *arr.at(i); }
  const Json& at(const std::string& k) const { return *obj.at(k); }
  bool has(const std::string& k) const { return obj.count(k) != 0; }
  size_t size() const { return type == Arr ? arr.size() : obj.size(); }
  uint64_t u64() const { return unum; }
  uint32_t u32() const { return uint32_t(unum); }
};

class JsonParser {
 public:
  explicit JsonParser(const std::string& s) : s_(s) {}

  JsonPtr parse() {
    auto v = value();
    ws();
    if (p_ != s_.size()) throw std::runtime_error("trailing json");
    return v;
  }

 private:
  const std::string& s_;
  size_t p_ = 0;

  void ws() {
    while (p_ < s_.size() && (s_[p_] == ' ' || s_[p_] == '\n' ||
                              s_[p_] == '\t' || s_[p_] == '\r'))
      p_++;
  }
  char peek() {
    ws();
    if (p_ >= s_.size()) throw std::runtime_error("eof");
    return s_[p_];
  }
  void expect(char c) {
    if (peek() != c) throw std::runtime_error(std::string("expected ") + c);
    p_++;
  }

  JsonPtr value() {
    char c = peek();
    auto v = std::make_shared<Json>();
    if (c == '{') {
      v->type = Json::Obj;
      p_++;
      if (peek() == '}') { p_++; return v; }
      while (true) {
        std::string key = string_lit();
        expect(':');
        v->obj[key] = value();
        char n = peek();
        p_++;
        if (n == '}') break;
        if (n != ',') throw std::runtime_error("bad obj");
      }
    } else if (c == '[') {
      v->type = Json::Arr;
      p_++;
      if (peek() == ']') { p_++; return v; }
      while (true) {
        v->arr.push_back(value());
        char n = peek();
        p_++;
        if (n == ']') break;
        if (n != ',') throw std::runtime_error("bad arr");
      }
    } else if (c == '"') {
      v->type = Json::Str;
      v->str = string_lit();
    } else if (c == 't') {
      v->type = Json::Bool; v->b = true; p_ += 4;
    } else if (c == 'f') {
      v->type = Json::Bool; v->b = false; p_ += 5;
    } else if (c == 'n') {
      p_ += 4;
    } else {
      v->type = Json::Num;
      size_t start = p_;
      if (s_[p_] == '-') p_++;
      while (p_ < s_.size() &&
             (isdigit(s_[p_]) || s_[p_] == '.' || s_[p_] == 'e' ||
              s_[p_] == 'E' || s_[p_] == '+' || s_[p_] == '-'))
        p_++;
      std::string tok = s_.substr(start, p_ - start);
      v->str = tok;  // raw token (big u256 literals exceed uint64)
      v->num = std::stod(tok);
      if (tok.find('.') == std::string::npos &&
          tok.find('e') == std::string::npos) {
        try {
          v->unum = std::stoull(tok);
        } catch (const std::out_of_range&) {
          v->unum = 0;  // consumer reads v->str for big integers
        }
      } else {
        v->unum = uint64_t(v->num);
      }
    }
    return v;
  }

  std::string string_lit() {
    expect('"');
    std::string out;
    while (s_[p_] != '"') {
      if (s_[p_] == '\\') p_++;
      out += s_[p_++];
    }
    p_++;
    return out;
  }
};

}  // namespace symphony
