// Native inference-service client — the tis/cpp_client role.
//
// Reference: tis/cpp_client/main.cpp (330 LoC, gRPC raw-tensor Triton
// client). Ours speaks the raw-tensor HTTP protocol of
// mds_tpu/deploy/server.py over plain POSIX sockets (no deps):
//
//   tis_client <host> <port> <model> <raw_u8_file> <out_i32_file> [iters]
//
// With iters > 1 it doubles as a service-latency benchmark (the reference
// client prints per-request timing the same way).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

static int connect_to(const char* host, int port) {
  addrinfo hints{}, *res;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  std::string p = std::to_string(port);
  if (getaddrinfo(host, p.c_str(), &hints, &res) != 0) return -1;
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    freeaddrinfo(res);
    return -1;
  }
  freeaddrinfo(res);
  return fd;
}

static bool send_all(int fd, const char* buf, size_t n) {
  while (n) {
    ssize_t k = write(fd, buf, n);
    if (k <= 0) return false;
    buf += k;
    n -= k;
  }
  return true;
}

int main(int argc, char** argv) {
  if (argc < 6) {
    std::cerr << "usage: tis_client <host> <port> <model> <raw_u8> <out_i32>"
                 " [iters]\n";
    return 2;
  }
  const char* host = argv[1];
  int port = std::stoi(argv[2]);
  std::string model = argv[3];
  std::ifstream in(argv[4], std::ios::binary);
  std::vector<char> payload((std::istreambuf_iterator<char>(in)),
                            std::istreambuf_iterator<char>());
  int iters = argc > 6 ? std::stoi(argv[6]) : 1;

  std::vector<char> body;
  double total_ms = 0;
  for (int it = 0; it < iters; it++) {
    int fd = connect_to(host, port);
    if (fd < 0) {
      std::cerr << "connect failed\n";
      return 1;
    }
    std::ostringstream hdr;
    hdr << "POST /v2/models/" << model << "/infer HTTP/1.1\r\n"
        << "Host: " << host << "\r\nContent-Length: " << payload.size()
        << "\r\nConnection: close\r\n\r\n";
    auto t0 = std::chrono::steady_clock::now();
    std::string h = hdr.str();
    if (!send_all(fd, h.data(), h.size()) ||
        !send_all(fd, payload.data(), payload.size())) {
      std::cerr << "send failed\n";
      return 1;
    }
    std::string resp;
    char buf[65536];
    ssize_t k;
    while ((k = read(fd, buf, sizeof buf)) > 0) resp.append(buf, k);
    close(fd);
    auto t1 = std::chrono::steady_clock::now();
    total_ms += std::chrono::duration<double, std::milli>(t1 - t0).count();
    size_t pos = resp.find("\r\n\r\n");
    if (pos == std::string::npos || resp.find("200") == std::string::npos) {
      std::cerr << "bad response: " << resp.substr(0, 200) << "\n";
      return 1;
    }
    body.assign(resp.begin() + pos + 4, resp.end());
  }
  std::ofstream(argv[5], std::ios::binary).write(body.data(), body.size());
  std::cout << iters << " requests, avg " << total_ms / iters << " ms, wrote "
            << body.size() << " bytes\n";
  return 0;
}
