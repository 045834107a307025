// Unix-domain-socket listener in front of the request batcher
// (iinsvae_batcher.cc) — the native IO plane of the serving front.
//
// Wire protocol (little-endian, caller = any client):
//   request:  int64 n, then n * cir_len doubles
//   response: n * { double err, int64 label }
// Each row is submitted to the batcher individually, so rows from many
// connections share batches; the per-connection thread waits on its own
// tickets and streams the responses back in order.
//
// The reference has no network surface at all; this is a new-build
// component (SURVEY.md §5.8). Zero dependencies beyond pthreads/libc.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <set>
#include <sys/socket.h>
#include <sys/un.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {
int64_t iins_batcher_submit(void* h, const double* cir);
int iins_batcher_wait(void* h, int64_t ticket, double* err, int64_t* label,
                      double wait_ms);
}

namespace {

struct Server {
  void* batcher;
  int64_t cir_len;
  int listen_fd = -1;
  std::atomic<bool> running{true};
  std::thread acceptor;
  std::mutex mu;
  std::set<int> conn_fds;
  std::vector<std::thread> conns;
};

bool read_full(int fd, void* buf, size_t n) {
  auto* p = static_cast<char*>(buf);
  while (n > 0) {
    ssize_t r = read(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

bool write_full(int fd, const void* buf, size_t n) {
  auto* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t r = write(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

void handle_conn(Server* s, int fd) {
  std::vector<double> cir(static_cast<size_t>(s->cir_len));
  while (s->running.load()) {
    int64_t n = 0;
    if (!read_full(fd, &n, sizeof(n)) || n <= 0 || n > (1 << 20)) break;
    std::vector<int64_t> tickets(static_cast<size_t>(n));
    bool ok = true;
    for (int64_t i = 0; i < n && ok; ++i) {
      ok = read_full(fd, cir.data(), sizeof(double) * cir.size());
      if (ok) {
        tickets[static_cast<size_t>(i)] =
            iins_batcher_submit(s->batcher, cir.data());
        if (tickets[static_cast<size_t>(i)] < 0) ok = false;
      }
    }
    if (!ok) break;
    for (int64_t i = 0; i < n; ++i) {
      double err = 0.0;
      int64_t label = -1;
      int rc = iins_batcher_wait(s->batcher, tickets[static_cast<size_t>(i)],
                                 &err, &label, 60e3);
      if (rc != 1) {
        err = 0.0;
        label = -1;
      }
      struct { double e; int64_t l; } resp{err, label};
      if (!write_full(fd, &resp, sizeof(resp))) { ok = false; break; }
    }
    if (!ok) break;
  }
  close(fd);
  std::lock_guard<std::mutex> lk(s->mu);
  s->conn_fds.erase(fd);
}

void accept_loop(Server* s) {
  while (s->running.load()) {
    int fd = accept(s->listen_fd, nullptr, nullptr);
    if (fd < 0) {
      if (!s->running.load()) break;
      continue;
    }
    std::lock_guard<std::mutex> lk(s->mu);
    s->conn_fds.insert(fd);
    s->conns.emplace_back(handle_conn, s, fd);
  }
}

}  // namespace

extern "C" {

// Start listening on a unix socket path; requests are batched through the
// given iins_batcher handle. Returns the server handle or nullptr.
void* iins_server_start(void* batcher, const char* sock_path,
                        int64_t cir_len) {
  int fd = socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) return nullptr;
  sockaddr_un addr{};
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, sock_path, sizeof(addr.sun_path) - 1);
  unlink(sock_path);
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      listen(fd, 128) != 0) {
    close(fd);
    return nullptr;
  }
  auto* s = new Server;
  s->batcher = batcher;
  s->cir_len = cir_len;
  s->listen_fd = fd;
  s->acceptor = std::thread(accept_loop, s);
  return s;
}

void iins_server_stop(void* h) {
  auto* s = static_cast<Server*>(h);
  if (!s) return;
  s->running.store(false);
  shutdown(s->listen_fd, SHUT_RDWR);
  close(s->listen_fd);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (int fd : s->conn_fds) shutdown(fd, SHUT_RDWR);
  }
  s->acceptor.join();
  for (auto& t : s->conns) t.join();
  delete s;
}

}  // extern "C"
