// Native client for the MSM offload service — the non-Python caller of
// the example app, playing the role of the reference's Swift/UniFFI side
// (example-app/ios/MoproApp/ContentView.swift -> MoproiOSBindings ->
// C ABI -> metal_msm_benchmark, lib.rs:17-26): a prover written in a
// native language hands its MSM to the framework across a language-
// neutral boundary. Here the boundary is the wire format of
// example_app/protocol.py (little-endian u64 words, no bignum library
// needed on the client).
//
// Build:  g++ -O2 -o msm_client example_app/native_client.cpp
// Usage:  msm_client HOST PORT VECTOR_FILE
//   VECTOR_FILE: request bytes from `python -m example_app.client
//   --write-vectors N PATH` (magic | curve_id | n | xs | ys | scalars).
// Prints the Jacobian result and the server-reported compute time.

#include <arpa/inet.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <netdb.h>
#include <string>
#include <sys/socket.h>
#include <unistd.h>
#include <vector>

static bool send_all(int fd, const void* buf, size_t len) {
  const char* p = static_cast<const char*>(buf);
  while (len) {
    ssize_t k = send(fd, p, len, 0);
    if (k <= 0) return false;
    p += k;
    len -= static_cast<size_t>(k);
  }
  return true;
}

static bool recv_all(int fd, void* buf, size_t len) {
  char* p = static_cast<char*>(buf);
  while (len) {
    ssize_t k = recv(fd, p, len, 0);
    if (k <= 0) return false;
    p += k;
    len -= static_cast<size_t>(k);
  }
  return true;
}

static void print_hex(const char* name, const uint64_t* w, int nw) {
  std::printf("%s = 0x", name);
  bool lead = true;
  for (int i = nw - 1; i >= 0; --i) {
    if (lead) {
      if (w[i] == 0 && i > 0) continue;
      std::printf("%llx", static_cast<unsigned long long>(w[i]));
      lead = false;
    } else {
      std::printf("%016llx", static_cast<unsigned long long>(w[i]));
    }
  }
  std::printf("\n");
}

int main(int argc, char** argv) {
  if (argc != 4) {
    std::fprintf(stderr, "usage: %s HOST PORT VECTOR_FILE\n", argv[0]);
    return 2;
  }
  // --- load the pre-serialized request (FileInputIterator analogue) ---
  FILE* f = std::fopen(argv[3], "rb");
  if (!f) {
    std::perror("open vector file");
    return 1;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> req(static_cast<size_t>(size));
  if (std::fread(req.data(), 1, req.size(), f) != req.size()) {
    std::fprintf(stderr, "short read on %s\n", argv[3]);
    return 1;
  }
  std::fclose(f);
  if (req.size() < 16 || std::memcmp(req.data(), "MSM1", 4) != 0) {
    std::fprintf(stderr, "%s is not an MSM1 request file\n", argv[3]);
    return 1;
  }
  uint32_t curve_id;
  uint64_t n;
  std::memcpy(&curve_id, req.data() + 4, 4);
  std::memcpy(&n, req.data() + 8, 8);
  const int nw = curve_id == 0 ? 4 : 6;  // bn254 : bls12-377 coord words

  // --- connect ---
  addrinfo hints{}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(argv[1], argv[2], &hints, &res) != 0 || !res) {
    std::fprintf(stderr, "cannot resolve %s:%s\n", argv[1], argv[2]);
    return 1;
  }
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    std::perror("connect");
    return 1;
  }
  freeaddrinfo(res);

  if (!send_all(fd, req.data(), req.size())) {
    std::perror("send");
    return 1;
  }

  // --- response: u32 status | f64 compute_ms | x,y,z (nw u64 each) ---
  uint32_t status;
  double compute_ms;
  char head[12];
  if (!recv_all(fd, head, sizeof head)) {
    std::fprintf(stderr, "connection closed before response\n");
    return 1;
  }
  std::memcpy(&status, head, 4);
  std::memcpy(&compute_ms, head + 4, 8);
  if (status != 0) {
    uint32_t len;
    if (!recv_all(fd, &len, 4)) return 1;
    std::string msg(len, '\0');
    recv_all(fd, msg.data(), len);
    std::fprintf(stderr, "server error: %s\n", msg.c_str());
    return 1;
  }
  std::vector<uint64_t> out(3 * static_cast<size_t>(nw));
  if (!recv_all(fd, out.data(), out.size() * 8)) {
    std::fprintf(stderr, "short response\n");
    return 1;
  }
  close(fd);

  std::printf("MSM n=%llu curve=%s compute=%.1f ms\n",
              static_cast<unsigned long long>(n),
              curve_id == 0 ? "bn254" : "bls12_377", compute_ms);
  print_hex("x", out.data(), nw);
  print_hex("y", out.data() + nw, nw);
  print_hex("z", out.data() + 2 * nw, nw);
  return 0;
}
