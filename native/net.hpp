// net.hpp — minimal HTTP/1.1 client over POSIX sockets: the network layer
// of the wallet, mirroring the reference's Esplora client
// (/root/reference/simfony-wallet/src/esplora.rs:4-24 — GET tx info, POST
// broadcast) and JSON-RPC client (rpc.rs:9-43 — sendrawtransaction).
//
// Plain HTTP only (the reference's local Elements RPC is plain HTTP too);
// TLS endpoints need an external proxy — out of scope for this sandbox,
// and injectable in tests via a localhost mock server.

#pragma once

#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <stdexcept>
#include <string>

namespace symphony {

struct HttpResponse {
  int status = 0;
  std::string body;
};

struct ParsedUrl {
  std::string host;
  std::string port = "80";
  std::string path = "/";
};

inline ParsedUrl parse_url(const std::string& url) {
  const std::string scheme = "http://";
  if (url.rfind(scheme, 0) != 0)
    throw std::runtime_error("only http:// URLs supported: " + url);
  ParsedUrl u;
  std::string rest = url.substr(scheme.size());
  size_t slash = rest.find('/');
  std::string hostport = slash == std::string::npos ? rest : rest.substr(0, slash);
  if (slash != std::string::npos) u.path = rest.substr(slash);
  size_t colon = hostport.find(':');
  if (colon == std::string::npos) {
    u.host = hostport;
  } else {
    u.host = hostport.substr(0, colon);
    u.port = hostport.substr(colon + 1);
  }
  if (u.host.empty()) throw std::runtime_error("bad URL: " + url);
  return u;
}

inline HttpResponse http_request(const std::string& method,
                                 const std::string& url,
                                 const std::string& body = "",
                                 const std::string& content_type =
                                     "text/plain",
                                 const std::string& auth_basic = "") {
  ParsedUrl u = parse_url(url);

  addrinfo hints{};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo* res = nullptr;
  int rc = getaddrinfo(u.host.c_str(), u.port.c_str(), &hints, &res);
  if (rc != 0)
    throw std::runtime_error("resolve " + u.host + ": " + gai_strerror(rc));
  int fd = -1;
  for (addrinfo* a = res; a; a = a->ai_next) {
    fd = socket(a->ai_family, a->ai_socktype, a->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, a->ai_addr, a->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd < 0) throw std::runtime_error("connect " + u.host + ":" + u.port);

  std::string req = method + " " + u.path + " HTTP/1.1\r\n";
  req += "Host: " + u.host + "\r\n";
  req += "Connection: close\r\n";
  if (!auth_basic.empty()) req += "Authorization: Basic " + auth_basic + "\r\n";
  if (!body.empty()) {
    req += "Content-Type: " + content_type + "\r\n";
    req += "Content-Length: " + std::to_string(body.size()) + "\r\n";
  }
  req += "\r\n" + body;

  size_t off = 0;
  while (off < req.size()) {
    ssize_t n = send(fd, req.data() + off, req.size() - off, 0);
    if (n <= 0) {
      close(fd);
      throw std::runtime_error("send failed");
    }
    off += size_t(n);
  }

  std::string raw;
  char buf[4096];
  ssize_t n;
  while ((n = recv(fd, buf, sizeof buf, 0)) > 0) raw.append(buf, size_t(n));
  close(fd);

  HttpResponse resp;
  size_t sp = raw.find(' ');
  if (sp == std::string::npos) throw std::runtime_error("bad HTTP response");
  resp.status = std::atoi(raw.c_str() + sp + 1);
  size_t hdr_end = raw.find("\r\n\r\n");
  resp.body = hdr_end == std::string::npos ? "" : raw.substr(hdr_end + 4);
  // tolerate chunked transfer from toy servers: strip a single chunk frame
  if (raw.find("Transfer-Encoding: chunked") != std::string::npos) {
    size_t nl = resp.body.find("\r\n");
    if (nl != std::string::npos) {
      size_t end = resp.body.rfind("\r\n0\r\n");
      resp.body = resp.body.substr(nl + 2, end == std::string::npos
                                               ? std::string::npos
                                               : end - nl - 2);
    }
  }
  return resp;
}

// --------------------------------------------------------------------- //
// Esplora client (esplora.rs:4-24)                                       //
// --------------------------------------------------------------------- //

// GET {base}/tx/{txid} — transaction/UTXO info (raw JSON body).
inline std::string esplora_fetch_tx(const std::string& base,
                                    const std::string& txid) {
  HttpResponse r = http_request("GET", base + "/tx/" + txid);
  if (r.status != 200)
    throw std::runtime_error("esplora GET tx: HTTP " +
                             std::to_string(r.status));
  return r.body;
}

// POST {base}/tx with the raw hex payload — returns the txid echoed by
// the endpoint (esplora.rs broadcast).
inline std::string esplora_broadcast(const std::string& base,
                                     const std::string& payload_hex) {
  HttpResponse r = http_request("POST", base + "/tx", payload_hex);
  if (r.status != 200)
    throw std::runtime_error("esplora broadcast: HTTP " +
                             std::to_string(r.status) + " " + r.body);
  return r.body;
}

// --------------------------------------------------------------------- //
// JSON-RPC client (rpc.rs:9-43)                                          //
// --------------------------------------------------------------------- //

// POST a sendrawtransaction JSON-RPC call; returns the "result" string.
inline std::string rpc_sendrawtransaction(const std::string& url,
                                          const std::string& payload_hex,
                                          const std::string& auth_basic = "") {
  std::string body =
      "{\"jsonrpc\":\"1.0\",\"id\":\"symphony\",\"method\":"
      "\"sendrawtransaction\",\"params\":[\"" +
      payload_hex + "\"]}";
  HttpResponse r =
      http_request("POST", url, body, "application/json", auth_basic);
  if (r.status != 200)
    throw std::runtime_error("rpc: HTTP " + std::to_string(r.status) + " " +
                             r.body);
  // extract "result":"..." (error -> throw)
  size_t e = r.body.find("\"error\"");
  size_t res_pos = r.body.find("\"result\"");
  if (res_pos == std::string::npos)
    throw std::runtime_error("rpc: no result in " + r.body);
  if (e != std::string::npos && r.body.find("\"error\":null") ==
                                    std::string::npos)
    throw std::runtime_error("rpc error: " + r.body);
  size_t q1 = r.body.find('"', r.body.find(':', res_pos) + 1);
  size_t q2 = r.body.find('"', q1 + 1);
  if (q1 == std::string::npos || q2 == std::string::npos)
    throw std::runtime_error("rpc: unparseable result " + r.body);
  return r.body.substr(q1 + 1, q2 - q1 - 1);
}

}  // namespace symphony
