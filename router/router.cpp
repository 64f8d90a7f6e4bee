// iaas-sglang-tpu router: cache-aware HTTP load balancer.
//
// Native C++ re-implementation of the reference's Rust sgl-router
// (sgl-router/src/router.rs:31 policies, src/tree.rs:26 approximate radix
// tree). The environment has no Rust toolchain, so this is C++17 with no
// external dependencies: a minimal threaded HTTP proxy + per-worker
// character-level radix tree tracking each worker's likely cache state.
//
// Policies:
//   cache_aware  -- route to the worker with the highest prefix-match rate
//                   when it exceeds a threshold, else to the least loaded
//                   (router.rs CacheAware with abs/rel thresholds)
//   round_robin, random, power_of_two
//
// Extras mirroring the reference router's surface:
//   /metrics                 -- Prometheus text exposition (prometheus.rs)
//   --pd --prefill/--decode  -- PD pairing mode (pd_router.rs): inject
//                               rid + disagg_decode_url, send to prefill,
//                               await decode's /disagg_wait/{rid} on handoff
//   --worker-list-file FILE  -- poll a file of worker URLs (one per line)
//                               and add/remove workers to match — the
//                               zero-Kubernetes analog of the reference's
//                               pod-watch service discovery
//                               (service_discovery.rs)
//
// Build: g++ -O2 -std=c++17 -pthread router.cpp -o sgl_tpu_router

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstring>
#include <iostream>
#include <map>
#include <memory>
#include <mutex>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

// ----------------------------------------------------------- radix tree

struct TreeNode {
  std::map<char, std::unique_ptr<TreeNode>> children;
  uint64_t last_access = 0;
};

class ApproxRadixTree {
  // Character-level trie approximating a worker's radix cache
  // (tree.rs:26). Bounded by node count; halved LRU-ish on overflow.
 public:
  explicit ApproxRadixTree(size_t max_nodes = 1 << 20)
      : max_nodes_(max_nodes) {}

  size_t match_len(const std::string& text) {
    std::lock_guard<std::mutex> lk(mu_);
    TreeNode* node = &root_;
    size_t n = 0;
    for (char c : text) {
      auto it = node->children.find(c);
      if (it == node->children.end()) break;
      node = it->second.get();
      node->last_access = ++clock_;
      n++;
    }
    return n;
  }

  void insert(const std::string& text) {
    std::lock_guard<std::mutex> lk(mu_);
    TreeNode* node = &root_;
    for (char c : text) {
      auto it = node->children.find(c);
      if (it == node->children.end()) {
        if (num_nodes_ >= max_nodes_) {
          evict_locked();
          // re-walk from root after eviction
          return;
        }
        it = node->children.emplace(c, std::make_unique<TreeNode>()).first;
        num_nodes_++;
      }
      node = it->second.get();
      node->last_access = ++clock_;
    }
  }

  void clear() {
    std::lock_guard<std::mutex> lk(mu_);
    root_.children.clear();
    num_nodes_ = 0;
  }

 private:
  void evict_locked() {
    // cheap eviction: drop the least-recently-used top-level subtree
    uint64_t best = UINT64_MAX;
    char victim = 0;
    bool found = false;
    for (auto& [c, child] : root_.children) {
      if (child->last_access < best) {
        best = child->last_access;
        victim = c;
        found = true;
      }
    }
    if (found) {
      num_nodes_ -= count(root_.children[victim].get()) + 1;
      root_.children.erase(victim);
    }
  }

  size_t count(TreeNode* n) {
    size_t total = 0;
    for (auto& [c, ch] : n->children) total += 1 + count(ch.get());
    return total;
  }

  TreeNode root_;
  std::mutex mu_;
  size_t num_nodes_ = 0;
  size_t max_nodes_;
  uint64_t clock_ = 0;
};

// --------------------------------------------------------------- workers

struct Worker {
  std::string host;
  int port;
  std::string url;
  std::atomic<int> load{0};
  std::atomic<uint64_t> processed{0};
  std::atomic<bool> healthy{true};
  ApproxRadixTree tree;

  Worker(std::string h, int p, std::string u)
      : host(std::move(h)), port(p), url(std::move(u)) {}
};

static std::vector<std::shared_ptr<Worker>> g_workers;
static std::mutex g_workers_mu;
static std::string g_policy = "cache_aware";
static std::atomic<uint64_t> g_rr{0};
static thread_local std::mt19937 g_rng{std::random_device{}()};

// ---------------------------------------------------------------- metrics
// Prometheus counters (reference sgl-router/src/prometheus.rs)

static std::atomic<uint64_t> g_m_requests{0};
static std::atomic<uint64_t> g_m_cache_hits{0};   // cache_aware prefix route
static std::atomic<uint64_t> g_m_cache_misses{0}; // load-balanced fallback
static std::atomic<uint64_t> g_m_retries{0};
static std::atomic<uint64_t> g_m_errors{0};       // 503s returned
static std::atomic<uint64_t> g_m_pd_handoffs{0};

struct PdPair {
  std::string prefill_url;
  std::string decode_url;
  std::string decode_ingest;  // transfer endpoint handed to the prefill side
  std::atomic<int> load{0};
};
static bool g_pd_mode = false;
static std::vector<std::shared_ptr<PdPair>> g_pd_pairs;

// cache-aware thresholds (router.rs: match-rate threshold + balance check)
static constexpr double kCacheThreshold = 0.3;
static constexpr int kBalanceAbs = 8;
static constexpr double kBalanceRel = 1.5;

std::shared_ptr<Worker> pick_worker(const std::string& text) {
  std::lock_guard<std::mutex> lk(g_workers_mu);
  std::vector<std::shared_ptr<Worker>> ws;
  for (auto& w : g_workers)
    if (w->healthy.load()) ws.push_back(w);
  if (ws.empty()) return nullptr;
  if (ws.size() == 1) return ws[0];

  if (g_policy == "round_robin") {
    return ws[g_rr++ % ws.size()];
  }
  if (g_policy == "random") {
    return ws[g_rng() % ws.size()];
  }
  if (g_policy == "power_of_two") {
    auto a = ws[g_rng() % ws.size()];
    auto b = ws[g_rng() % ws.size()];
    return a->load.load() <= b->load.load() ? a : b;
  }
  // cache_aware
  int min_load = INT32_MAX, max_load = 0;
  for (auto& w : ws) {
    min_load = std::min(min_load, w->load.load());
    max_load = std::max(max_load, w->load.load());
  }
  bool imbalanced = max_load - min_load > kBalanceAbs &&
                    max_load > kBalanceRel * std::max(min_load, 1);
  std::shared_ptr<Worker> best;
  double best_rate = -1.0;
  if (!imbalanced && !text.empty()) {
    for (auto& w : ws) {
      double rate = double(w->tree.match_len(text)) / double(text.size());
      if (rate > best_rate) {
        best_rate = rate;
        best = w;
      }
    }
    if (best_rate < kCacheThreshold) best = nullptr;
  }
  if (best) {
    g_m_cache_hits++;
  } else {
    g_m_cache_misses++;
    for (auto& w : ws)
      if (!best || w->load.load() < best->load.load()) best = w;
  }
  if (!text.empty()) best->tree.insert(text);
  return best;
}

// ------------------------------------------------------------- HTTP bits

static bool read_request(int fd, std::string& head, std::string& body) {
  std::string buf;
  char tmp[8192];
  size_t header_end = std::string::npos;
  while (header_end == std::string::npos) {
    ssize_t n = recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    buf.append(tmp, n);
    header_end = buf.find("\r\n\r\n");
    if (buf.size() > (16u << 20)) return false;
  }
  head = buf.substr(0, header_end + 4);
  body = buf.substr(header_end + 4);
  // content-length
  size_t cl = 0;
  {
    std::string lower;
    lower.reserve(head.size());
    for (char c : head) lower += std::tolower(c);
    auto p = lower.find("content-length:");
    if (p != std::string::npos) cl = std::stoul(lower.substr(p + 15));
  }
  while (body.size() < cl) {
    ssize_t n = recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    body.append(tmp, n);
  }
  return true;
}

static void send_all(int fd, const char* data, size_t len) {
  size_t off = 0;
  while (off < len) {
    ssize_t n = send(fd, data + off, len - off, MSG_NOSIGNAL);
    if (n <= 0) return;
    off += n;
  }
}

static void send_simple(int fd, int code, const std::string& body) {
  std::ostringstream ss;
  const char* status = code == 200 ? "OK" : (code == 404 ? "Not Found"
                                             : "Service Unavailable");
  ss << "HTTP/1.1 " << code << " " << status << "\r\n"
     << "Content-Type: application/json\r\n"
     << "Content-Length: " << body.size() << "\r\n"
     << "Connection: close\r\n\r\n"
     << body;
  auto s = ss.str();
  send_all(fd, s.data(), s.size());
}

static int connect_to(const std::string& host, int port) {
  struct addrinfo hints {}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints, &res))
    return -1;
  int fd = -1;
  for (auto* p = res; p; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

// crude extraction of the "text" JSON field for cache matching (the Rust
// router parses the full body; prefix matching only needs the text)
static std::string extract_text_field(const std::string& body) {
  auto p = body.find("\"text\"");
  if (p == std::string::npos) return "";
  p = body.find(':', p);
  if (p == std::string::npos) return "";
  p = body.find('"', p);
  if (p == std::string::npos) return "";
  std::string out;
  for (size_t i = p + 1; i < body.size(); i++) {
    char c = body[i];
    if (c == '\\' && i + 1 < body.size()) {
      out += body[i + 1];
      i++;
    } else if (c == '"') {
      break;
    } else {
      out += c;
    }
  }
  return out;
}

// one-shot HTTP client: send request, read to EOF, split status/body
// (upstreams get Connection: close so EOF delimits the response)
struct HttpResponse {
  int status = 0;
  std::string head, body;
};

static bool split_url(const std::string& url, std::string& host, int& port) {
  auto p = url.find("//");
  if (p == std::string::npos) return false;
  std::string hostport = url.substr(p + 2);
  auto slash = hostport.find('/');
  if (slash != std::string::npos) hostport = hostport.substr(0, slash);
  auto colon = hostport.rfind(':');
  if (colon == std::string::npos) return false;
  host = hostport.substr(0, colon);
  port = std::stoi(hostport.substr(colon + 1));
  return true;
}

static bool http_call(const std::string& url, const std::string& method,
                      const std::string& path, const std::string& body,
                      HttpResponse& resp) {
  std::string host;
  int port;
  if (!split_url(url, host, port)) return false;
  int fd = connect_to(host, port);
  if (fd < 0) return false;
  std::ostringstream req;
  req << method << " " << path << " HTTP/1.1\r\nHost: " << host
      << "\r\nContent-Type: application/json\r\nContent-Length: "
      << body.size() << "\r\nConnection: close\r\n\r\n" << body;
  auto s = req.str();
  send_all(fd, s.data(), s.size());
  std::string buf;
  char tmp[16384];
  ssize_t n;
  while ((n = recv(fd, tmp, sizeof(tmp), 0)) > 0) buf.append(tmp, n);
  close(fd);
  auto he = buf.find("\r\n\r\n");
  if (he == std::string::npos) return false;
  resp.head = buf.substr(0, he + 4);
  resp.body = buf.substr(he + 4);
  // HTTP/1.1 NNN ...
  auto sp = resp.head.find(' ');
  if (sp == std::string::npos) return false;
  resp.status = std::atoi(resp.head.c_str() + sp + 1);
  // de-chunk if needed (aiohttp may chunk JSON responses)
  std::string lower;
  for (char c : resp.head) lower += std::tolower(c);
  if (lower.find("transfer-encoding: chunked") != std::string::npos) {
    std::string out;
    size_t i = 0;
    while (i < resp.body.size()) {
      auto eol = resp.body.find("\r\n", i);
      if (eol == std::string::npos) break;
      size_t len = std::stoul(resp.body.substr(i, eol - i), nullptr, 16);
      if (len == 0) break;
      out += resp.body.substr(eol + 2, len);
      i = eol + 2 + len + 2;
    }
    resp.body = std::move(out);
  }
  return true;
}

static std::string random_hex32() {
  static const char* hexd = "0123456789abcdef";
  std::string s(32, '0');
  for (auto& c : s) c = hexd[g_rng() & 15];
  return s;
}

// PD pairing (pd_router.rs:23,210 dispatch-to-both): pick a pair, inject
// rid + disagg_decode_url into the JSON body, run prefill, and on
// disagg_handoff await the decode server's result for that rid.
static void pd_proxy_generate(int client, std::string body) {
  std::shared_ptr<PdPair> pair;
  {
    std::lock_guard<std::mutex> lk(g_workers_mu);
    for (auto& p : g_pd_pairs)
      if (!pair || p->load.load() < pair->load.load()) pair = p;
  }
  if (!pair) {
    g_m_errors++;
    send_simple(client, 503, "{\"error\":\"no PD pairs\"}");
    return;
  }
  pair->load++;
  std::string rid;
  auto rp = body.find("\"rid\"");
  if (rp != std::string::npos) {
    auto q1 = body.find('"', body.find(':', rp));
    auto q2 = body.find('"', q1 + 1);
    rid = body.substr(q1 + 1, q2 - q1 - 1);
  } else {
    rid = random_hex32();
  }
  // inject rid + decode ingest endpoint right after the opening brace
  auto brace = body.find('{');
  std::string inject = "\"rid\":\"" + rid + "\",\"disagg_decode_url\":\"" +
                       pair->decode_ingest + "\",";
  if (rp != std::string::npos)
    inject = "\"disagg_decode_url\":\"" + pair->decode_ingest + "\",";
  body.insert(brace + 1, inject);

  HttpResponse pre;
  if (!http_call(pair->prefill_url, "POST", "/generate", body, pre)) {
    pair->load--;
    g_m_errors++;
    send_simple(client, 503, "{\"error\":\"prefill unreachable\"}");
    return;
  }
  if (pre.status != 200 ||
      pre.body.find("\"disagg_handoff\"") == std::string::npos) {
    // finished entirely at prefill (errors, 1-token generations)
    pair->load--;
    send_simple(client, pre.status, pre.body);
    return;
  }
  g_m_pd_handoffs++;
  HttpResponse dec;
  if (!http_call(pair->decode_url, "GET", "/disagg_wait/" + rid, "", dec)) {
    pair->load--;
    g_m_errors++;
    send_simple(client, 503, "{\"error\":\"decode unreachable\"}");
    return;
  }
  pair->load--;
  send_simple(client, dec.status, dec.body);
}

static std::string prometheus_metrics() {
  std::ostringstream ss;
  ss << "# TYPE sgl_router_requests_total counter\n"
     << "sgl_router_requests_total " << g_m_requests.load() << "\n"
     << "# TYPE sgl_router_cache_hits_total counter\n"
     << "sgl_router_cache_hits_total " << g_m_cache_hits.load() << "\n"
     << "# TYPE sgl_router_cache_misses_total counter\n"
     << "sgl_router_cache_misses_total " << g_m_cache_misses.load() << "\n"
     << "# TYPE sgl_router_retries_total counter\n"
     << "sgl_router_retries_total " << g_m_retries.load() << "\n"
     << "# TYPE sgl_router_errors_total counter\n"
     << "sgl_router_errors_total " << g_m_errors.load() << "\n"
     << "# TYPE sgl_router_pd_handoffs_total counter\n"
     << "sgl_router_pd_handoffs_total " << g_m_pd_handoffs.load() << "\n";
  ss << "# TYPE sgl_router_processed_requests_total counter\n";
  ss << "# TYPE sgl_router_running_requests gauge\n";
  ss << "# TYPE sgl_router_worker_healthy gauge\n";
  std::lock_guard<std::mutex> lk(g_workers_mu);
  for (auto& w : g_workers) {
    ss << "sgl_router_processed_requests_total{worker=\"" << w->url << "\"} "
       << w->processed.load() << "\n"
       << "sgl_router_running_requests{worker=\"" << w->url << "\"} "
       << w->load.load() << "\n"
       << "sgl_router_worker_healthy{worker=\"" << w->url << "\"} "
       << (w->healthy.load() ? 1 : 0) << "\n";
  }
  return ss.str();
}

static void proxy_request(int client, const std::string& head,
                          const std::string& body) {
  std::string text = extract_text_field(body);
  std::shared_ptr<Worker> w;
  int up = -1;
  for (int attempt = 0; attempt < 3; attempt++) {
    w = pick_worker(text);
    if (!w) break;
    up = connect_to(w->host, w->port);
    if (up >= 0) break;
    w->healthy = false;  // health loop may revive it later
    g_m_retries++;
  }
  if (!w || up < 0) {
    g_m_errors++;
    send_simple(client, 503, "{\"error\":\"no reachable workers\"}");
    return;
  }
  w->load++;
  w->processed++;
  // rewrite: force upstream to close so we can stream until EOF
  std::string h = head;
  auto cpos = h.find("Connection:");
  if (cpos == std::string::npos) cpos = h.find("connection:");
  if (cpos != std::string::npos) {
    auto eol = h.find("\r\n", cpos);
    h.erase(cpos, eol - cpos + 2);
  }
  h.insert(h.size() - 2, "Connection: close\r\n");
  send_all(up, h.data(), h.size());
  send_all(up, body.data(), body.size());
  char tmp[16384];
  ssize_t n;
  while ((n = recv(up, tmp, sizeof(tmp), 0)) > 0) send_all(client, tmp, n);
  close(up);
  w->load--;
}

static void handle_conn(int client) {
  std::string head, body;
  if (read_request(client, head, body)) {
    // request line: METHOD PATH HTTP/1.1
    auto sp1 = head.find(' ');
    auto sp2 = head.find(' ', sp1 + 1);
    std::string path = head.substr(sp1 + 1, sp2 - sp1 - 1);
    g_m_requests++;
    if (path == "/router_health") {
      send_simple(client, 200, "{\"status\":\"ok\"}");
    } else if (path == "/metrics") {
      std::string m = prometheus_metrics();
      std::ostringstream ss;
      ss << "HTTP/1.1 200 OK\r\nContent-Type: text/plain; version=0.0.4\r\n"
         << "Content-Length: " << m.size() << "\r\nConnection: close\r\n\r\n"
         << m;
      auto s = ss.str();
      send_all(client, s.data(), s.size());
    } else if (g_pd_mode && path == "/generate") {
      pd_proxy_generate(client, body);
    } else if (path == "/list_workers") {
      std::ostringstream ss;
      ss << "{\"workers\":[";
      std::lock_guard<std::mutex> lk(g_workers_mu);
      for (size_t i = 0; i < g_workers.size(); i++) {
        if (i) ss << ",";
        ss << "{\"url\":\"" << g_workers[i]->url << "\",\"load\":"
           << g_workers[i]->load.load() << ",\"healthy\":"
           << (g_workers[i]->healthy.load() ? "true" : "false") << "}";
      }
      ss << "]}";
      send_simple(client, 200, ss.str());
    } else if (path.rfind("/remove_worker", 0) == 0) {
      auto q = path.find("url=");
      if (q != std::string::npos) {
        std::string url = path.substr(q + 4);
        std::lock_guard<std::mutex> lk(g_workers_mu);
        g_workers.erase(
            std::remove_if(g_workers.begin(), g_workers.end(),
                           [&](const std::shared_ptr<Worker>& w) {
                             return w->url == url;
                           }),
            g_workers.end());
        send_simple(client, 200, "{\"status\":\"removed\"}");
      } else {
        send_simple(client, 404, "{\"error\":\"missing url=\"}");
      }
    } else if (path.rfind("/add_worker", 0) == 0) {
      auto q = path.find("url=");
      if (q != std::string::npos) {
        std::string url = path.substr(q + 4);
        std::string hostport = url.substr(url.find("//") + 2);
        auto colon = hostport.rfind(':');
        auto w = std::make_shared<Worker>(
            hostport.substr(0, colon),
            std::stoi(hostport.substr(colon + 1)), url);
        std::lock_guard<std::mutex> lk(g_workers_mu);
        g_workers.push_back(w);
        send_simple(client, 200, "{\"status\":\"added\"}");
      } else {
        send_simple(client, 404, "{\"error\":\"missing url=\"}");
      }
    } else {
      proxy_request(client, head, body);
    }
  }
  close(client);
}

static std::shared_ptr<Worker> make_worker(const std::string& url) {
  std::string hostname;
  int wport;
  if (!split_url(url, hostname, wport)) return nullptr;
  return std::make_shared<Worker>(hostname, wport, url);
}

// poll a newline-separated worker-URL file; reconcile adds/removals
// (zero-K8s analog of service_discovery.rs pod watching)
static void discovery_loop(const std::string& file) {
  while (true) {
    std::this_thread::sleep_for(std::chrono::seconds(2));
    FILE* f = fopen(file.c_str(), "r");
    if (!f) continue;
    std::vector<std::string> urls;
    char line[512];
    while (fgets(line, sizeof(line), f)) {
      std::string u(line);
      while (!u.empty() && (u.back() == '\n' || u.back() == '\r' ||
                            u.back() == ' '))
        u.pop_back();
      if (!u.empty()) urls.push_back(u);
    }
    fclose(f);
    std::lock_guard<std::mutex> lk(g_workers_mu);
    // removals
    g_workers.erase(
        std::remove_if(g_workers.begin(), g_workers.end(),
                       [&](const std::shared_ptr<Worker>& w) {
                         return std::find(urls.begin(), urls.end(), w->url) ==
                                urls.end();
                       }),
        g_workers.end());
    // additions
    for (auto& u : urls) {
      bool known = false;
      for (auto& w : g_workers)
        if (w->url == u) known = true;
      if (!known) {
        auto w = make_worker(u);
        if (w) g_workers.push_back(std::move(w));
      }
    }
  }
}

int main(int argc, char** argv) {
  std::string host = "0.0.0.0";
  int port = 30080;
  std::string worker_list_file;
  std::vector<std::string> pd_prefill, pd_decode;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--port" && i + 1 < argc) port = std::stoi(argv[++i]);
    else if (a == "--host" && i + 1 < argc) host = argv[++i];
    else if (a == "--policy" && i + 1 < argc) g_policy = argv[++i];
    else if (a == "--pd") g_pd_mode = true;
    else if (a == "--prefill" && i + 1 < argc) pd_prefill.push_back(argv[++i]);
    else if (a == "--decode" && i + 1 < argc) pd_decode.push_back(argv[++i]);
    else if (a == "--worker-list-file" && i + 1 < argc)
      worker_list_file = argv[++i];
    else if (a == "--worker" && i + 1 < argc) {
      auto w = make_worker(argv[++i]);
      if (w) g_workers.push_back(std::move(w));
    }
  }
  if (g_pd_mode) {
    if (pd_prefill.empty() || pd_decode.empty()) {
      std::cerr << "--pd requires --prefill URL and --decode URL@INGEST\n";
      return 1;
    }
    size_t n = std::max(pd_prefill.size(), pd_decode.size());
    for (size_t i = 0; i < n; i++) {
      auto p = std::make_shared<PdPair>();
      p->prefill_url = pd_prefill[i % pd_prefill.size()];
      std::string d = pd_decode[i % pd_decode.size()];
      auto at = d.find('@');
      p->decode_url = d.substr(0, at);
      p->decode_ingest = at == std::string::npos ? "" : d.substr(at + 1);
      g_pd_pairs.push_back(std::move(p));
    }
  }

  int srv = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  inet_pton(AF_INET, host == "0.0.0.0" ? "0.0.0.0" : host.c_str(),
            &addr.sin_addr);
  if (bind(srv, (sockaddr*)&addr, sizeof(addr)) != 0) {
    perror("bind");
    return 1;
  }
  listen(srv, 512);
  if (!worker_list_file.empty())
    std::thread(discovery_loop, worker_list_file).detach();
  // background health probe: revive workers that come back
  std::thread([] {
    while (true) {
      std::this_thread::sleep_for(std::chrono::seconds(5));
      std::vector<std::shared_ptr<Worker>> snapshot;
      {
        std::lock_guard<std::mutex> lk(g_workers_mu);
        snapshot = g_workers;
      }
      for (auto& w : snapshot) {
        if (w->healthy.load()) continue;
        int fd = connect_to(w->host, w->port);
        if (fd >= 0) {
          const char* req =
              "GET /health HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n";
          send_all(fd, req, strlen(req));
          char buf[256];
          ssize_t n = recv(fd, buf, sizeof(buf) - 1, 0);
          close(fd);
          if (n > 12 && std::string(buf, n).find("200") != std::string::npos)
            w->healthy = true;
        }
      }
    }
  }).detach();
  std::cerr << "sgl_tpu_router listening on " << host << ":" << port
            << " policy=" << g_policy << " workers=" << g_workers.size()
            << std::endl;
  while (true) {
    int client = accept(srv, nullptr, nullptr);
    if (client < 0) continue;
    std::thread(handle_conn, client).detach();
  }
}
