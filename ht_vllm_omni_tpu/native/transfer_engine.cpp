// Native stage-to-stage transfer engine (TPU-host data plane).
//
// C++ counterpart of the reference's Mooncake TransferEngine (the one
// native dependency of vllm_omni's distributed layer — reference
// vllm_omni/distributed/omni_connectors/connectors/
// mooncake_transfer_engine_connector.py:24-27 loads the C++ library;
// Mooncake itself is C++ RDMA).  TPU hosts have no GPUDirect RDMA to
// drive, so the speed-of-light path for cross-host KV/chunk handoff is
// the DCN NIC via kernel TCP: this engine keeps persistent connections,
// writes each message with one writev (no Python-side buffer joins),
// and serves blocking GETs with a condition variable so consumers wake
// on arrival instead of poll-sleeping.
//
// Exposed as a plain C ABI consumed through ctypes
// (ht_vllm_omni_tpu/native/transfer.py) — no pybind11 dependency.
//
// Wire protocol (all little-endian, matching connectors/codec.py's
// framing spirit: opaque value bytes, server never deserializes):
//   request : u8 op | u16 key_len | u32 timeout_ms | u64 val_len
//             | key bytes | value bytes
//   response: u8 status | u64 val_len | value bytes
//   op: 1=PUT 2=GET(consume) 3=GET(peek) 4=DELETE 5=PING
//   status: 0=ok 1=missing/timeout 2=error

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <sys/uio.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint8_t OP_PUT = 1;
constexpr uint8_t OP_GET = 2;
constexpr uint8_t OP_PEEK = 3;
constexpr uint8_t OP_DELETE = 4;
constexpr uint8_t OP_PING = 5;

constexpr uint8_t ST_OK = 0;
constexpr uint8_t ST_MISSING = 1;
constexpr uint8_t ST_ERROR = 2;

// Network trust boundary: frames come from untrusted peers, so lengths
// must be validated before any allocation (a desynced or malicious
// stream can claim arbitrary u64 sizes).  4 GiB covers the largest KV
// payloads the connectors ship while bounding a single allocation.
constexpr uint64_t kMaxValLen = 4ull << 30;
constexpr uint16_t kMaxKeyLen = 4096;

#pragma pack(push, 1)
struct ReqHeader {
  uint8_t op;
  uint16_t key_len;
  uint32_t timeout_ms;
  uint64_t val_len;
};
struct RespHeader {
  uint8_t status;
  uint64_t val_len;
};
#pragma pack(pop)

bool read_exact(int fd, void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::read(fd, p, n);
    if (r <= 0) {
      if (r < 0 && (errno == EINTR)) continue;
      return false;
    }
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

bool write_all(int fd, const struct iovec* iov_in, int iovcnt) {
  struct iovec iov[4];
  for (int i = 0; i < iovcnt; i++) iov[i] = iov_in[i];
  int idx = 0;
  while (idx < iovcnt) {
    ssize_t w = ::writev(fd, iov + idx, iovcnt - idx);
    if (w < 0) {
      if (errno == EINTR) continue;
      return false;
    }
    size_t done = static_cast<size_t>(w);
    while (idx < iovcnt && done >= iov[idx].iov_len) {
      done -= iov[idx].iov_len;
      idx++;
    }
    if (idx < iovcnt && done > 0) {
      iov[idx].iov_base = static_cast<uint8_t*>(iov[idx].iov_base) + done;
      iov[idx].iov_len -= done;
    }
  }
  return true;
}

using Clock = std::chrono::steady_clock;

struct Entry {
  std::vector<uint8_t> data;
  Clock::time_point stored;
};

struct Server {
  int listen_fd = -1;
  uint16_t port = 0;
  std::atomic<bool> running{true};
  int64_t ttl_ms;

  std::mutex mu;
  std::condition_variable cv;
  std::unordered_map<std::string, Entry> store;
  uint64_t put_count = 0;

  std::thread accept_thread;
  std::vector<std::thread> conn_threads;
  std::vector<int> conn_fds;  // live accepted sockets (severed on stop)
  std::mutex threads_mu;

  // stats (for metrics/observability parity with Mooncake's counters)
  std::atomic<uint64_t> bytes_in{0}, bytes_out{0}, n_puts{0}, n_gets{0};

  void purge_expired_locked() {
    if (ttl_ms <= 0) return;
    auto now = Clock::now();
    for (auto it = store.begin(); it != store.end();) {
      auto age = std::chrono::duration_cast<std::chrono::milliseconds>(
                     now - it->second.stored)
                     .count();
      if (age > ttl_ms)
        it = store.erase(it);
      else
        ++it;
    }
  }

  void handle_conn(int fd) {
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    try {
      handle_conn_loop(fd);
    } catch (...) {
      // Never let a bad frame (e.g. bad_alloc from a hostile length we
      // somehow still failed to reject) escape the thread: that would
      // std::terminate the whole serving process.
    }
    drop_conn_fd(fd);
    ::close(fd);
  }

  void handle_conn_loop(int fd) {
    std::string key;
    while (running.load()) {
      ReqHeader h;
      if (!read_exact(fd, &h, sizeof(h))) break;
      if (h.key_len > kMaxKeyLen || h.val_len > kMaxValLen) {
        // Oversized/desynced frame: we cannot resync a byte stream, so
        // reply ST_ERROR and drop the connection.
        RespHeader resp{ST_ERROR, 0};
        struct iovec iov[1] = {{&resp, sizeof(resp)}};
        write_all(fd, iov, 1);
        break;
      }
      key.resize(h.key_len);
      if (h.key_len && !read_exact(fd, key.data(), h.key_len)) break;

      RespHeader resp{ST_OK, 0};
      std::vector<uint8_t> out;

      if (h.op == OP_PUT) {
        std::vector<uint8_t> val(h.val_len);
        if (h.val_len && !read_exact(fd, val.data(), h.val_len)) break;
        bytes_in += h.val_len;
        n_puts++;
        {
          std::lock_guard<std::mutex> lk(mu);
          if ((++put_count & 0x3F) == 0) purge_expired_locked();
          store[key] = Entry{std::move(val), Clock::now()};
        }
        cv.notify_all();
      } else if (h.op == OP_GET || h.op == OP_PEEK) {
        n_gets++;
        std::unique_lock<std::mutex> lk(mu);
        auto deadline =
            Clock::now() + std::chrono::milliseconds(h.timeout_ms);
        bool found = cv.wait_until(lk, deadline, [&] {
          return store.count(key) > 0 || !running.load();
        });
        auto it = store.find(key);
        if (found && it != store.end()) {
          if (h.op == OP_GET) {
            out = std::move(it->second.data);
            store.erase(it);
          } else {
            out = it->second.data;  // peek copies
          }
          resp.val_len = out.size();
        } else {
          resp.status = ST_MISSING;
        }
      } else if (h.op == OP_DELETE) {
        std::lock_guard<std::mutex> lk(mu);
        resp.status = store.erase(key) ? ST_OK : ST_MISSING;
      } else if (h.op == OP_PING) {
        resp.status = ST_OK;
      } else {
        resp.status = ST_ERROR;
      }

      struct iovec iov[2] = {
          {&resp, sizeof(resp)},
          {out.data(), out.size()},
      };
      bytes_out += out.size();
      if (!write_all(fd, iov, out.empty() ? 1 : 2)) break;
    }
  }

  void drop_conn_fd(int fd) {
    std::lock_guard<std::mutex> lk(threads_mu);
    for (auto it = conn_fds.begin(); it != conn_fds.end(); ++it) {
      if (*it == fd) {
        conn_fds.erase(it);
        break;
      }
    }
  }

  void accept_loop() {
    while (running.load()) {
      int fd = ::accept(listen_fd, nullptr, nullptr);
      if (fd < 0) {
        if (errno == EINTR) continue;
        break;  // listen socket closed on shutdown
      }
      std::lock_guard<std::mutex> lk(threads_mu);
      conn_fds.push_back(fd);
      conn_threads.emplace_back([this, fd] { handle_conn(fd); });
    }
  }
};

struct Client {
  int fd = -1;
  std::mutex mu;  // one in-flight request per client handle
};

int connect_to(const char* host, uint16_t port) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  if (::inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    ::close(fd);
    return -1;
  }
  if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    ::close(fd);
    return -1;
  }
  int one = 1;
  ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

}  // namespace

extern "C" {

// ----------------------------------------------------------------- server
void* te_server_start(const char* host, uint16_t port, int64_t ttl_ms) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return nullptr;
  int one = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  if (::inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    ::close(fd);
    return nullptr;
  }
  if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0 ||
      ::listen(fd, 128) < 0) {
    ::close(fd);
    return nullptr;
  }
  socklen_t alen = sizeof(addr);
  ::getsockname(fd, reinterpret_cast<sockaddr*>(&addr), &alen);

  auto* s = new Server();
  s->listen_fd = fd;
  s->port = ntohs(addr.sin_port);
  s->ttl_ms = ttl_ms;
  s->accept_thread = std::thread([s] { s->accept_loop(); });
  return s;
}

uint16_t te_server_port(void* handle) {
  return static_cast<Server*>(handle)->port;
}

void te_server_stop(void* handle) {
  auto* s = static_cast<Server*>(handle);
  s->running.store(false);
  ::shutdown(s->listen_fd, SHUT_RDWR);
  ::close(s->listen_fd);
  s->cv.notify_all();
  if (s->accept_thread.joinable()) s->accept_thread.join();
  {
    // Sever live client connections: handler threads sit blocked in
    // read() on persistent idle sockets (the connector's normal state),
    // so without a shutdown() the join below would deadlock forever.
    std::lock_guard<std::mutex> lk(s->threads_mu);
    for (int fd : s->conn_fds) ::shutdown(fd, SHUT_RDWR);
  }
  for (;;) {
    std::vector<std::thread> threads;
    {
      std::lock_guard<std::mutex> lk(s->threads_mu);
      threads.swap(s->conn_threads);
    }
    if (threads.empty()) break;
    for (auto& t : threads)
      if (t.joinable()) t.join();
  }
  delete s;
}

// n_keys / bytes_in / bytes_out / n_puts / n_gets
void te_server_stats(void* handle, uint64_t out[5]) {
  auto* s = static_cast<Server*>(handle);
  std::lock_guard<std::mutex> lk(s->mu);
  out[0] = s->store.size();
  out[1] = s->bytes_in.load();
  out[2] = s->bytes_out.load();
  out[3] = s->n_puts.load();
  out[4] = s->n_gets.load();
}

// ----------------------------------------------------------------- client
void* te_client_connect(const char* host, uint16_t port) {
  int fd = connect_to(host, port);
  if (fd < 0) return nullptr;
  auto* c = new Client();
  c->fd = fd;
  return c;
}

void te_client_close(void* handle) {
  auto* c = static_cast<Client*>(handle);
  ::close(c->fd);
  delete c;
}

// returns status (0 ok / 2 error)
int te_put(void* handle, const char* key, uint16_t key_len,
           const uint8_t* data, uint64_t len) {
  auto* c = static_cast<Client*>(handle);
  std::lock_guard<std::mutex> lk(c->mu);
  ReqHeader h{OP_PUT, key_len, 0, len};
  struct iovec iov[3] = {
      {&h, sizeof(h)},
      {const_cast<char*>(key), key_len},
      {const_cast<uint8_t*>(data), len},
  };
  if (!write_all(c->fd, iov, len ? 3 : 2)) return ST_ERROR;
  RespHeader resp;
  if (!read_exact(c->fd, &resp, sizeof(resp))) return ST_ERROR;
  return resp.status;
}

// returns status; on ok fills *out (malloc'd, caller te_free) + *out_len.
// consume=0 peeks, 1 drains.  timeout_ms waits server-side on the cv.
int te_get(void* handle, const char* key, uint16_t key_len,
           uint32_t timeout_ms, int consume, uint8_t** out,
           uint64_t* out_len) {
  auto* c = static_cast<Client*>(handle);
  std::lock_guard<std::mutex> lk(c->mu);
  ReqHeader h{consume ? OP_GET : OP_PEEK, key_len, timeout_ms, 0};
  struct iovec iov[2] = {
      {&h, sizeof(h)},
      {const_cast<char*>(key), key_len},
  };
  if (!write_all(c->fd, iov, 2)) return ST_ERROR;
  RespHeader resp;
  if (!read_exact(c->fd, &resp, sizeof(resp))) return ST_ERROR;
  *out = nullptr;
  *out_len = 0;
  if (resp.status != ST_OK) return resp.status;
  if (resp.val_len > kMaxValLen) return ST_ERROR;  // desynced/hostile server
  auto* buf = static_cast<uint8_t*>(::malloc(resp.val_len ? resp.val_len : 1));
  if (buf == nullptr) return ST_ERROR;
  if (resp.val_len && !read_exact(c->fd, buf, resp.val_len)) {
    ::free(buf);
    return ST_ERROR;
  }
  *out = buf;
  *out_len = resp.val_len;
  return ST_OK;
}

int te_delete(void* handle, const char* key, uint16_t key_len) {
  auto* c = static_cast<Client*>(handle);
  std::lock_guard<std::mutex> lk(c->mu);
  ReqHeader h{OP_DELETE, key_len, 0, 0};
  struct iovec iov[2] = {
      {&h, sizeof(h)},
      {const_cast<char*>(key), key_len},
  };
  if (!write_all(c->fd, iov, 2)) return ST_ERROR;
  RespHeader resp;
  if (!read_exact(c->fd, &resp, sizeof(resp))) return ST_ERROR;
  return resp.status;
}

void te_free(uint8_t* ptr) { ::free(ptr); }

}  // extern "C"
