// Native HTTP/1.1 front-end for the federation server.
//
// Why this exists: the measured host profile (BENCHMARKS.md, round 3)
// puts aiohttp's per-request parse/header/socket work at ~0.67 ms of
// host CPU — a hard ~1.5k q/s ceiling on one core regardless of device
// speed. The reference pays the same class of cost in its Python HTTP
// coordinator (reference http_server.py:105-166). This file moves the
// whole IO plane to C++: an epoll event loop owns the sockets, parses
// requests, keeps per-connection pipeline order, and writes responses;
// Python pulls PARSED REQUESTS IN BATCHES (fe_next) and pushes complete
// response bodies (fe_respond). The batch pull doubles as the serving
// micro-batcher: requests that arrive while Python is running a device
// step accumulate here and are handed over as one batch.
//
// Threading contract: one internal IO thread touches sockets; Python
// threads call fe_next/fe_respond under ctypes (GIL released). The two
// sides meet only at mutex-protected queues + an eventfd wakeup.
//
// Memory contract: each request's strings stay valid from fe_next until
// fe_respond(id) (or fe_stop). Python must respond to every request it
// pops (any status); fe_stop frees stragglers.

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

constexpr size_t kMaxHeaderBytes = 64 * 1024;
constexpr size_t kMaxBodyBytes = 64 * 1024 * 1024;

struct Request {
  uint64_t id = 0;
  uint64_t conn_key = 0;   // (fd << 32) | generation — survives fd reuse
  int method = 2;          // 0=GET 1=POST 2=other
  bool close_after = false;
  std::string path, qs, body;
  Clock::time_point arrived;
};

// Layout must match the ctypes struct in engine/native_frontend.py.
struct FeReq {
  uint64_t id;
  int32_t method;
  int32_t path_len, qs_len, body_len;
  int32_t _pad;
  const char* path;
  const char* qs;
  const char* body;
};

struct Conn {
  int fd = -1;
  uint32_t gen = 0;
  std::string rbuf;
  std::string wbuf;
  std::deque<uint64_t> order;  // req ids awaiting response, pipeline order
  bool close_after = false;    // stop reading; close once wbuf drains
  bool want_write = false;
};

struct Response {
  uint64_t req_id;
  std::string bytes;  // HTTP bytes, ready to write
  bool close_after;
  // streaming: 0 = complete response; 1 = stream begin (headers,
  // chunked transfer); 2 = stream chunk; 3 = stream end (terminator)
  int kind = 0;
};

const char* status_text(int code) {
  switch (code) {
    case 200: return "OK";
    case 400: return "Bad Request";
    case 404: return "Not Found";
    case 409: return "Conflict";
    case 500: return "Internal Server Error";
    case 501: return "Not Implemented";
    case 503: return "Service Unavailable";
    case 504: return "Gateway Timeout";
    default: return "OK";
  }
}

struct Server {
  int listen_fd = -1;
  int epoll_fd = -1;
  int event_fd = -1;
  std::thread io;
  std::atomic<bool> running{false};

  std::mutex mu;
  std::condition_variable cv;
  std::deque<Request*> ready;                       // parsed, not yet popped
  std::unordered_map<uint64_t, Request*> inflight;  // popped by Python
  std::deque<Response> responses;                   // fe_respond -> IO thread
  // Python-side stream registry (under mu): id -> chunked framing?
  // (HTTP/1.1 keep-alive streams are chunk-framed; close-delimited
  // streams write raw bytes and end by closing the connection)
  std::unordered_map<uint64_t, bool> stream_chunked;

  // IO-thread-only state
  std::unordered_map<int, Conn*> conns;
  std::unordered_map<uint64_t, std::string> done;  // req id -> bytes (await order)
  std::unordered_map<uint64_t, bool> done_close;
  std::unordered_map<uint64_t, uint64_t> req_conn;  // req id -> conn key
  // req ids with an OPEN chunked stream: the ordered drain forwards
  // their accumulated bytes but must not advance past them until the
  // end-frame arrives (pipelined responses behind a stream wait)
  std::unordered_map<uint64_t, bool> open_streams;
  uint64_t next_id = 1;
  uint32_t next_gen = 1;

  // stats (relaxed counters)
  std::atomic<long long> n_accepted{0}, n_requests{0}, n_bad{0},
      n_responses{0}, n_dropped{0};
};

int set_nonblock(int fd) {
  int fl = fcntl(fd, F_GETFL, 0);
  return fcntl(fd, F_SETFL, fl | O_NONBLOCK);
}

void epoll_mod(Server* s, Conn* c) {
  epoll_event ev{};
  ev.events = EPOLLIN | (c->want_write ? EPOLLOUT : 0);
  ev.data.fd = c->fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_MOD, c->fd, &ev);
}

void close_conn(Server* s, Conn* c) {
  epoll_ctl(s->epoll_fd, EPOLL_CTL_DEL, c->fd, nullptr);
  close(c->fd);
  s->conns.erase(c->fd);
  // Orphan pending responses for this conn: their reqs stay inflight
  // until Python responds; the respond path then finds no conn and drops.
  for (uint64_t id : c->order) {
    s->done.erase(id);
    s->done_close.erase(id);
    s->open_streams.erase(id);
  }
  // also drop the Python-side stream registry entries: if the Python
  // finisher dies mid-generation fe_stream_end never runs, and the
  // entries would otherwise leak for the process lifetime (mu-guarded;
  // a racing fe_stream_chunk/_end just gets -1, which it handles)
  if (!c->order.empty()) {
    std::lock_guard<std::mutex> lk(s->mu);
    for (uint64_t id : c->order) s->stream_chunked.erase(id);
  }
  delete c;
}

// Append as many in-order completed responses as available to wbuf.
// A response whose stream is still open forwards whatever bytes have
// accumulated and then stops the drain (order preserved behind it).
void drain_ready_responses(Server* s, Conn* c) {
  while (!c->order.empty()) {
    uint64_t id = c->order.front();
    auto it = s->done.find(id);
    if (it == s->done.end()) break;
    c->wbuf += it->second;
    it->second.clear();
    if (s->open_streams.count(id)) break;  // await more chunks / end
    if (s->done_close[id]) c->close_after = true;
    s->done_close.erase(id);
    s->req_conn.erase(id);
    s->done.erase(it);
    c->order.pop_front();
  }
}

// Flush wbuf; returns false if the connection died.
bool flush_conn(Server* s, Conn* c) {
  while (!c->wbuf.empty()) {
    ssize_t n = send(c->fd, c->wbuf.data(), c->wbuf.size(), MSG_NOSIGNAL);
    if (n > 0) {
      c->wbuf.erase(0, (size_t)n);
      continue;
    }
    if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      if (!c->want_write) { c->want_write = true; epoll_mod(s, c); }
      return true;
    }
    close_conn(s, c);
    return false;
  }
  if (c->want_write) { c->want_write = false; epoll_mod(s, c); }
  if (c->close_after && c->order.empty()) {
    close_conn(s, c);
    return false;
  }
  return true;
}

bool iequal(const char* a, const char* b, size_t n) {
  for (size_t i = 0; i < n; i++) {
    char x = a[i], y = b[i];
    if (x >= 'A' && x <= 'Z') x += 32;
    if (y >= 'A' && y <= 'Z') y += 32;
    if (x != y) return false;
  }
  return true;
}

// Protocol-error responses ride the same ordered-response path as real
// requests, so a 400 for a malformed pipelined request can never jump
// ahead of an earlier request still being processed in Python.
void write_simple(Server* s, Conn* c, int code, const std::string& body,
                  bool close_after) {
  std::string out = "HTTP/1.1 " + std::to_string(code) + " " +
                    status_text(code) +
                    "\r\nContent-Type: text/plain; charset=utf-8"
                    "\r\nContent-Length: " + std::to_string(body.size());
  out += close_after ? "\r\nConnection: close\r\n\r\n"
                     : "\r\nConnection: keep-alive\r\n\r\n";
  out += body;
  uint64_t id = s->next_id++;
  c->order.push_back(id);
  s->done[id] = std::move(out);
  s->done_close[id] = close_after;
  // Latch close_after NOW (not when the response drains): parse_requests
  // checks it to stop re-parsing the same malformed bytes while earlier
  // pipelined requests are still in Python — otherwise every new read
  // event would queue a duplicate error response.
  if (close_after) c->close_after = true;
  drain_ready_responses(s, c);
}

// Parse complete requests out of c->rbuf. Returns false if the conn was
// closed (protocol error).
bool parse_requests(Server* s, Conn* c) {
  for (;;) {
    if (c->close_after) return true;  // draining; ignore pipelined extras
    size_t hdr_end = c->rbuf.find("\r\n\r\n");
    if (hdr_end == std::string::npos) {
      if (c->rbuf.size() > kMaxHeaderBytes) {
        s->n_bad.fetch_add(1, std::memory_order_relaxed);
        write_simple(s, c, 400, "Header too large", true);
        return flush_conn(s, c);
      }
      return true;  // need more bytes
    }
    // request line
    size_t line_end = c->rbuf.find("\r\n");
    const char* p = c->rbuf.data();
    size_t sp1 = c->rbuf.find(' ');
    size_t sp2 = (sp1 == std::string::npos || sp1 >= line_end)
                     ? std::string::npos
                     : c->rbuf.find(' ', sp1 + 1);
    if (sp2 == std::string::npos || sp2 >= line_end) {
      s->n_bad.fetch_add(1, std::memory_order_relaxed);
      write_simple(s, c, 400, "Malformed request line", true);
      return flush_conn(s, c);
    }
    int method = 2;
    if (sp1 == 3 && memcmp(p, "GET", 3) == 0) method = 0;
    else if (sp1 == 4 && memcmp(p, "POST", 4) == 0) method = 1;
    std::string target = c->rbuf.substr(sp1 + 1, sp2 - sp1 - 1);
    bool http10 = c->rbuf.compare(sp2 + 1, line_end - sp2 - 1,
                                  "HTTP/1.0") == 0;

    // headers we care about
    long long content_length = 0;
    bool conn_close = http10;  // 1.0 defaults to close, 1.1 to keep-alive
    size_t pos = line_end + 2;
    while (pos < hdr_end) {
      size_t eol = c->rbuf.find("\r\n", pos);
      if (eol == std::string::npos || eol > hdr_end) eol = hdr_end;
      size_t colon = c->rbuf.find(':', pos);
      if (colon != std::string::npos && colon < eol) {
        size_t nlen = colon - pos;
        size_t v = colon + 1;
        while (v < eol && (c->rbuf[v] == ' ' || c->rbuf[v] == '\t')) v++;
        if (nlen == 14 && iequal(p + pos, "content-length", 14)) {
          content_length = atoll(c->rbuf.c_str() + v);
        } else if (nlen == 10 && iequal(p + pos, "connection", 10)) {
          size_t vlen = eol - v;
          if (vlen >= 5 && iequal(p + v, "close", 5)) conn_close = true;
          else if (vlen >= 10 && iequal(p + v, "keep-alive", 10))
            conn_close = false;
        } else if (nlen == 17 && iequal(p + pos, "transfer-encoding", 17)) {
          // chunked bodies unsupported (no client here sends them)
          s->n_bad.fetch_add(1, std::memory_order_relaxed);
          write_simple(s, c, 501, "Transfer-Encoding not supported", true);
          return flush_conn(s, c);
        }
      }
      pos = eol + 2;
    }
    if (content_length < 0 || (size_t)content_length > kMaxBodyBytes) {
      s->n_bad.fetch_add(1, std::memory_order_relaxed);
      write_simple(s, c, 400, "Body too large", true);
      return flush_conn(s, c);
    }
    size_t total = hdr_end + 4 + (size_t)content_length;
    if (c->rbuf.size() < total) return true;  // need body bytes

    auto* r = new Request();
    r->id = s->next_id++;
    r->conn_key = ((uint64_t)(uint32_t)c->fd << 32) | c->gen;
    r->method = method;
    r->close_after = conn_close;
    size_t q = target.find('?');
    if (q == std::string::npos) {
      r->path = target;
    } else {
      r->path = target.substr(0, q);
      r->qs = target.substr(q + 1);
    }
    r->body = c->rbuf.substr(hdr_end + 4, (size_t)content_length);
    r->arrived = Clock::now();
    c->rbuf.erase(0, total);
    c->order.push_back(r->id);
    if (conn_close) c->close_after = true;  // last request on this conn
    s->req_conn[r->id] = r->conn_key;
    s->n_requests.fetch_add(1, std::memory_order_relaxed);
    {
      std::lock_guard<std::mutex> lk(s->mu);
      s->ready.push_back(r);
    }
    s->cv.notify_one();
  }
}

void handle_readable(Server* s, Conn* c) {
  char buf[65536];
  for (;;) {
    ssize_t n = recv(c->fd, buf, sizeof(buf), 0);
    if (n > 0) {
      c->rbuf.append(buf, (size_t)n);
      if ((size_t)n < sizeof(buf)) break;
      continue;
    }
    if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) break;
    // peer closed (n == 0) or hard error
    close_conn(s, c);
    return;
  }
  parse_requests(s, c);
}

void handle_responses(Server* s) {
  std::deque<Response> batch;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    batch.swap(s->responses);
  }
  for (auto& resp : batch) {
    auto rc = s->req_conn.find(resp.req_id);
    if (rc == s->req_conn.end()) {
      s->n_dropped.fetch_add(1, std::memory_order_relaxed);
      continue;  // connection died before the response
    }
    uint64_t key = rc->second;
    int fd = (int)(key >> 32);
    auto ci = s->conns.find(fd);
    if (ci == s->conns.end() || ci->second->gen != (uint32_t)key) {
      s->req_conn.erase(rc);
      s->n_dropped.fetch_add(1, std::memory_order_relaxed);
      continue;
    }
    Conn* c = ci->second;
    switch (resp.kind) {
      case 0:  // complete response
        s->done[resp.req_id] = std::move(resp.bytes);
        s->done_close[resp.req_id] = resp.close_after;
        s->n_responses.fetch_add(1, std::memory_order_relaxed);
        break;
      case 1:  // stream begin: headers; hold the drain open
        s->done[resp.req_id] += resp.bytes;
        s->done_close[resp.req_id] = resp.close_after;
        s->open_streams[resp.req_id] = true;
        break;
      case 2:  // stream chunk
        if (!s->open_streams.count(resp.req_id)) {
          s->n_dropped.fetch_add(1, std::memory_order_relaxed);
          continue;
        }
        s->done[resp.req_id] += resp.bytes;
        break;
      case 3:  // stream end: terminator, release the drain
        if (!s->open_streams.count(resp.req_id)) {
          s->n_dropped.fetch_add(1, std::memory_order_relaxed);
          continue;
        }
        s->done[resp.req_id] += resp.bytes;
        s->open_streams.erase(resp.req_id);
        s->n_responses.fetch_add(1, std::memory_order_relaxed);
        break;
    }
    drain_ready_responses(s, c);
    flush_conn(s, c);  // may delete c
  }
}

void io_loop(Server* s) {
  epoll_event events[256];
  while (s->running.load(std::memory_order_acquire)) {
    int n = epoll_wait(s->epoll_fd, events, 256, 500);
    if (n < 0) {
      if (errno == EINTR) continue;
      break;
    }
    for (int i = 0; i < n; i++) {
      int fd = events[i].data.fd;
      if (fd == s->listen_fd) {
        for (;;) {
          int cfd = accept(s->listen_fd, nullptr, nullptr);
          if (cfd < 0) break;
          set_nonblock(cfd);
          int one = 1;
          setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
          auto* c = new Conn();
          c->fd = cfd;
          c->gen = s->next_gen++;
          s->conns[cfd] = c;
          epoll_event ev{};
          ev.events = EPOLLIN;
          ev.data.fd = cfd;
          epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, cfd, &ev);
          s->n_accepted.fetch_add(1, std::memory_order_relaxed);
        }
      } else if (fd == s->event_fd) {
        uint64_t junk;
        while (read(s->event_fd, &junk, 8) == 8) {}
        handle_responses(s);
      } else {
        auto ci = s->conns.find(fd);
        if (ci == s->conns.end()) continue;
        Conn* c = ci->second;
        if (events[i].events & (EPOLLHUP | EPOLLERR)) {
          close_conn(s, c);
          continue;
        }
        if (events[i].events & EPOLLOUT) {
          if (!flush_conn(s, c)) continue;  // c deleted
        }
        if (events[i].events & EPOLLIN) handle_readable(s, c);
      }
    }
  }
  // shutdown: close everything IO-side
  for (auto& kv : s->conns) {
    close(kv.second->fd);
    delete kv.second;
  }
  s->conns.clear();
}

}  // namespace

extern "C" {

void* fe_start(const char* host, int port, int reuse_port) {
  auto* s = new Server();
  s->listen_fd = socket(AF_INET, SOCK_STREAM, 0);
  if (s->listen_fd < 0) { delete s; return nullptr; }
  int one = 1;
  setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  if (reuse_port)
    setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEPORT, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (!host || !*host || strcmp(host, "0.0.0.0") == 0)
    addr.sin_addr.s_addr = INADDR_ANY;
  else if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    close(s->listen_fd);
    delete s;
    return nullptr;
  }
  if (bind(s->listen_fd, (sockaddr*)&addr, sizeof(addr)) < 0 ||
      listen(s->listen_fd, 1024) < 0) {
    close(s->listen_fd);
    delete s;
    return nullptr;
  }
  set_nonblock(s->listen_fd);
  s->epoll_fd = epoll_create1(0);
  s->event_fd = eventfd(0, EFD_NONBLOCK);
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.fd = s->listen_fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->listen_fd, &ev);
  ev.data.fd = s->event_fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->event_fd, &ev);
  s->running.store(true, std::memory_order_release);
  s->io = std::thread(io_loop, s);
  return s;
}

int fe_port(void* h) {
  auto* s = (Server*)h;
  sockaddr_in addr{};
  socklen_t len = sizeof(addr);
  if (getsockname(s->listen_fd, (sockaddr*)&addr, &len) < 0) return -1;
  return ntohs(addr.sin_port);
}

// Pop up to max_n parsed requests. Blocks up to first_timeout_ms for the
// first request; once one is in hand, keeps collecting until window_ms
// has passed since THAT request arrived (0 = take whatever is queued).
// If fill_n > 0 and fewer than fill_n requests are queued after those
// waits, keeps waiting up to fill_ms measured from NOW for the queue to
// reach fill_n — the window wait anchors on the front request's arrival,
// which under sustained load is already in the past, so only a
// now-anchored wait can trade a few ms of latency for a fuller device
// batch (a 512-bucket step costs the same whether 301 or 512 rows are
// real). Returns the count (0 = timeout, -1 = stopped).
int fe_next(void* h, FeReq* out, int max_n, int first_timeout_ms,
            int window_ms, int fill_n, int fill_ms) {
  auto* s = (Server*)h;
  std::unique_lock<std::mutex> lk(s->mu);
  if (s->ready.empty()) {
    s->cv.wait_for(lk, std::chrono::milliseconds(first_timeout_ms), [&] {
      return !s->ready.empty() || !s->running.load();
    });
  }
  if (!s->running.load() && s->ready.empty()) return -1;
  if (s->ready.empty()) return 0;
  if (window_ms > 0 && (int)s->ready.size() < max_n) {
    auto deadline = s->ready.front()->arrived +
                    std::chrono::milliseconds(window_ms);
    s->cv.wait_until(lk, deadline, [&] {
      return (int)s->ready.size() >= max_n || !s->running.load();
    });
  }
  if (fill_n > 0 && fill_ms > 0 && (int)s->ready.size() < fill_n) {
    auto deadline = Clock::now() + std::chrono::milliseconds(fill_ms);
    s->cv.wait_until(lk, deadline, [&] {
      return (int)s->ready.size() >= fill_n || !s->running.load();
    });
  }
  int n = 0;
  while (n < max_n && !s->ready.empty()) {
    Request* r = s->ready.front();
    s->ready.pop_front();
    s->inflight[r->id] = r;
    out[n].id = r->id;
    out[n].method = r->method;
    out[n].path = r->path.c_str();
    out[n].path_len = (int32_t)r->path.size();
    out[n].qs = r->qs.c_str();
    out[n].qs_len = (int32_t)r->qs.size();
    out[n].body = r->body.c_str();
    out[n].body_len = (int32_t)r->body.size();
    out[n]._pad = 0;
    n++;
  }
  return n;
}

static void build_response(Response& resp, const Request* r, int status,
                           const char* ctype, const char* body,
                           long long body_len) {
  resp.req_id = r->id;
  resp.close_after = r->close_after;
  resp.bytes.reserve((size_t)body_len + 128);
  resp.bytes = "HTTP/1.1 " + std::to_string(status) + " " +
               status_text(status) + "\r\nContent-Type: " +
               (ctype && *ctype ? ctype : "application/json") +
               "\r\nContent-Length: " + std::to_string(body_len);
  resp.bytes += r->close_after ? "\r\nConnection: close\r\n\r\n"
                               : "\r\nConnection: keep-alive\r\n\r\n";
  if (body && body_len > 0) resp.bytes.append(body, (size_t)body_len);
}

int fe_respond(void* h, uint64_t id, int status, const char* ctype,
               const char* body, long long body_len) {
  auto* s = (Server*)h;
  Request* r;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    auto it = s->inflight.find(id);
    if (it == s->inflight.end()) return -1;
    r = it->second;
    s->inflight.erase(it);
  }
  Response resp;
  build_response(resp, r, status, ctype, body, body_len);
  delete r;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->responses.push_back(std::move(resp));
  }
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
  return 0;
}

// Deliver a whole batch of responses with ONE inflight-map pass, ONE
// queue push, and ONE eventfd wakeup. Per-response fe_respond calls on a
// shared core cause a context-switch storm (each wakeup lets the IO
// thread preempt the Python serving thread mid-batch; measured 0.24 ms
// of wallclock per respond under 512-client load). Returns the number of
// responses accepted (ids not in flight are skipped, matching
// fe_respond's -1).
int fe_respond_many(void* h, int n, const uint64_t* ids,
                    const int32_t* statuses, const char* const* ctypes,
                    const char* const* bodies, const long long* body_lens) {
  auto* s = (Server*)h;
  std::vector<Request*> reqs((size_t)n, nullptr);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (int i = 0; i < n; i++) {
      auto it = s->inflight.find(ids[i]);
      if (it == s->inflight.end()) continue;
      reqs[(size_t)i] = it->second;
      s->inflight.erase(it);
    }
  }
  std::vector<Response> built;
  built.reserve((size_t)n);
  int accepted = 0;
  for (int i = 0; i < n; i++) {
    Request* r = reqs[(size_t)i];
    if (!r) continue;
    built.emplace_back();
    build_response(built.back(), r, statuses[i], ctypes[i], bodies[i],
                   body_lens[i]);
    delete r;
    accepted++;
  }
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (auto& resp : built) s->responses.push_back(std::move(resp));
  }
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
  return accepted;
}

// Begin a streaming response (SSE generation): writes the headers now,
// keeps the connection's pipeline order held open until fe_stream_end.
// Keep-alive connections use chunked transfer framing; close-delimited
// ones (HTTP/1.0 or Connection: close) stream raw and end by closing.
// Safe to call from any thread (like fe_respond).
int fe_begin_stream(void* h, uint64_t id, int status, const char* ctype) {
  auto* s = (Server*)h;
  Request* r;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    auto it = s->inflight.find(id);
    if (it == s->inflight.end()) return -1;
    r = it->second;
    s->inflight.erase(it);
    s->stream_chunked[id] = !r->close_after;
  }
  Response resp;
  resp.req_id = id;
  resp.kind = 1;
  resp.close_after = r->close_after;
  resp.bytes = "HTTP/1.1 " + std::to_string(status) + " " +
               status_text(status) + "\r\nContent-Type: " +
               (ctype && *ctype ? ctype : "text/event-stream") +
               "\r\nCache-Control: no-cache";
  resp.bytes += r->close_after
                    ? "\r\nConnection: close\r\n\r\n"
                    : "\r\nTransfer-Encoding: chunked"
                      "\r\nConnection: keep-alive\r\n\r\n";
  delete r;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->responses.push_back(std::move(resp));
  }
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
  return 0;
}

int fe_stream_chunk(void* h, uint64_t id, const char* data,
                    long long len) {
  auto* s = (Server*)h;
  if (len <= 0) return 0;
  bool chunked;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    auto it = s->stream_chunked.find(id);
    if (it == s->stream_chunked.end()) return -1;
    chunked = it->second;
  }
  Response resp;
  resp.req_id = id;
  resp.kind = 2;
  resp.close_after = false;
  if (chunked) {
    char hdr[32];
    int hn = snprintf(hdr, sizeof(hdr), "%llx\r\n",
                      (unsigned long long)len);
    resp.bytes.reserve((size_t)len + (size_t)hn + 2);
    resp.bytes.append(hdr, (size_t)hn);
    resp.bytes.append(data, (size_t)len);
    resp.bytes += "\r\n";
  } else {
    resp.bytes.assign(data, (size_t)len);
  }
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->responses.push_back(std::move(resp));
  }
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
  return 0;
}

int fe_stream_end(void* h, uint64_t id) {
  auto* s = (Server*)h;
  bool chunked;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    auto it = s->stream_chunked.find(id);
    if (it == s->stream_chunked.end()) return -1;
    chunked = it->second;
    s->stream_chunked.erase(it);
  }
  Response resp;
  resp.req_id = id;
  resp.kind = 3;
  resp.close_after = false;
  if (chunked) resp.bytes = "0\r\n\r\n";
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->responses.push_back(std::move(resp));
  }
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
  return 0;
}

long long fe_stat(void* h, int which) {
  auto* s = (Server*)h;
  switch (which) {
    case 0: return s->n_accepted.load(std::memory_order_relaxed);
    case 1: return s->n_requests.load(std::memory_order_relaxed);
    case 2: return s->n_bad.load(std::memory_order_relaxed);
    case 3: return s->n_responses.load(std::memory_order_relaxed);
    case 4: return s->n_dropped.load(std::memory_order_relaxed);
    default: return -1;
  }
}

// Wake any fe_next caller and stop accepting work, WITHOUT freeing the
// server: the serving loop thread (the fe_next caller) observes the stop
// and is the one to call fe_stop. Splitting shutdown from free avoids a
// use-after-free when stop is requested from another thread.
void fe_shutdown(void* h) {
  auto* s = (Server*)h;
  s->running.store(false, std::memory_order_release);
  s->cv.notify_all();
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
}

void fe_stop(void* h) {
  auto* s = (Server*)h;
  s->running.store(false, std::memory_order_release);
  s->cv.notify_all();
  uint64_t one = 1;
  ssize_t ignored = write(s->event_fd, &one, 8);
  (void)ignored;
  if (s->io.joinable()) s->io.join();
  close(s->listen_fd);
  close(s->epoll_fd);
  close(s->event_fd);
  std::lock_guard<std::mutex> lk(s->mu);
  for (auto* r : s->ready) delete r;
  for (auto& kv : s->inflight) delete kv.second;
  delete s;
}

}  // extern "C"
