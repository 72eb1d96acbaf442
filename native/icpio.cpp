// icpio — native data-loading runtime for icp_variants_tpu.
//
// The reference's data layer is C++ (FreeImage decode, PCL .pcd reader,
// boost CSV splitting — SURVEY §2.3); this library is its TPU-framework
// counterpart: a small C-ABI parsing core the Python host calls through
// ctypes. Python reads file headers (formats are header+blob), then hands
// the numeric blob to these routines, which run a tight strtod/strtol scan
// — 10-50x faster than numpy.loadtxt on ETH-scale ASCII files.
//
// Build: `make` in this directory (produces libicpio.so), or let
// icp_variants_tpu.runtime.native build it on first use.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parse up to `max_count` whitespace-separated floats from `path`,
// starting at byte `offset`, into `out`. Returns the number parsed, or -1
// on I/O error. Non-numeric tokens terminate the scan.
int64_t icpio_parse_floats(
    const char* path, int64_t offset, double* out, int64_t max_count) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
  int64_t size = ftell(f);
  if (offset < 0 || offset > size) { fclose(f); return -1; }
  int64_t len = size - offset;
  char* buf = (char*)malloc(len + 1);
  if (!buf) { fclose(f); return -1; }
  fseek(f, offset, SEEK_SET);
  int64_t got = (int64_t)fread(buf, 1, len, f);
  fclose(f);
  buf[got] = '\0';

  int64_t n = 0;
  char* p = buf;
  char* end = nullptr;
  while (n < max_count) {
    double v = strtod(p, &end);
    if (end == p) {
      // Non-numeric token: step onto it (strtod already consumed any
      // leading whitespace conceptually but leaves p unmoved), skip it,
      // and let the main loop retry — handles any number of stray words.
      while (*p && (unsigned char)*p <= ' ') ++p;
      if (!*p) break;
      while (*p && (unsigned char)*p > ' ') ++p;
      continue;
    }
    out[n++] = v;
    p = end;
  }
  free(buf);
  return n;
}

// Same scan in float32 (halves the Python-side copy for big clouds).
int64_t icpio_parse_floats_f32(
    const char* path, int64_t offset, float* out, int64_t max_count) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
  int64_t size = ftell(f);
  if (offset < 0 || offset > size) { fclose(f); return -1; }
  int64_t len = size - offset;
  char* buf = (char*)malloc(len + 1);
  if (!buf) { fclose(f); return -1; }
  fseek(f, offset, SEEK_SET);
  int64_t got = (int64_t)fread(buf, 1, len, f);
  fclose(f);
  buf[got] = '\0';

  int64_t n = 0;
  char* p = buf;
  char* end = nullptr;
  while (n < max_count) {
    float v = strtof(p, &end);
    if (end == p) {
      while (*p && (unsigned char)*p <= ' ') ++p;
      if (!*p) break;
      while (*p && (unsigned char)*p > ' ') ++p;
      continue;
    }
    out[n++] = v;
    p = end;
  }
  free(buf);
  return n;
}

// Threaded batch scan: parse `n_files` files concurrently (the data-loader
// prefetch path — an ETH sweep batch is 2*B .pcd files whose ASCII bodies
// dominate load time; the reference loads them serially through PCL,
// ETHDataLoader.h:66-98). Work is pulled from an atomic counter by
// min(n_threads, n_files) workers; each file writes its own disjoint
// output buffer, `counts[i]` gets the per-file parse count (or -1 on I/O
// error). Returns the number of files that parsed successfully.
int64_t icpio_parse_files_f32(
    const char* const* paths, const int64_t* offsets, float* const* outs,
    const int64_t* max_counts, int64_t* counts, int64_t n_files,
    int64_t n_threads) {
  if (n_files <= 0) return 0;
  if (n_threads <= 0) {
    unsigned hw = std::thread::hardware_concurrency();
    n_threads = hw ? (int64_t)hw : 4;
  }
  if (n_threads > n_files) n_threads = n_files;

  std::atomic<int64_t> next(0);
  std::atomic<int64_t> ok(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_files) return;
      counts[i] =
          icpio_parse_floats_f32(paths[i], offsets[i], outs[i], max_counts[i]);
      if (counts[i] >= 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  for (int64_t t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return ok.load();
}

// Recursive widest-axis median partition of `n` 3-D points (xyz rows of
// `points`, row-major (n, stride) with stride >= 3) to `depth` levels —
// the host side of the framework's kd search index (ops/kdtree.py). Exact
// floor/ceil halves at every split via std::nth_element, matching
// kd_partition_np. `perm` must hold 0..n-1 on entry and is permuted in
// place to block-grouped order; `starts`/`counts` receive the 2^depth
// blocks' (start, count) in tree order. Subtrees parallelize across
// `n_threads` workers once the level has enough nodes. Returns 0.
static void kd_split_once(
    const float* points, int64_t stride, int64_t* perm,
    int64_t start, int64_t count, int64_t h) {
  if (count <= 1) return;
  float mins[3] = {1e30f, 1e30f, 1e30f};
  float maxs[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = start; i < start + count; ++i) {
    const float* q = points + perm[i] * stride;
    for (int a = 0; a < 3; ++a) {
      if (q[a] < mins[a]) mins[a] = q[a];
      if (q[a] > maxs[a]) maxs[a] = q[a];
    }
  }
  int ax = 0;
  float best = maxs[0] - mins[0];
  for (int a = 1; a < 3; ++a) {
    if (maxs[a] - mins[a] > best) { best = maxs[a] - mins[a]; ax = a; }
  }
  std::nth_element(
      perm + start, perm + start + h, perm + start + count,
      [points, stride, ax](int64_t i, int64_t j) {
        return points[i * stride + ax] < points[j * stride + ax];
      });
}

static void kd_split_node(
    const float* points, int64_t stride, int64_t* perm,
    int64_t start, int64_t count, int level, int depth,
    int64_t* starts, int64_t* counts, int64_t node_id) {
  if (level == depth) {
    starts[node_id] = start;
    counts[node_id] = count;
    return;
  }
  int64_t h = count / 2;
  kd_split_once(points, stride, perm, start, count, h);
  kd_split_node(points, stride, perm, start, h, level + 1, depth,
                starts, counts, node_id * 2);
  kd_split_node(points, stride, perm, start + h, count - h, level + 1,
                depth, starts, counts, node_id * 2 + 1);
}

int64_t icpio_kd_partition(
    const float* points, int64_t n, int64_t stride, int64_t depth,
    int64_t* perm, int64_t* starts, int64_t* counts, int64_t n_threads) {
  if (n_threads <= 0) {
    unsigned hw = std::thread::hardware_concurrency();
    n_threads = hw ? (int64_t)hw : 4;
  }
  // Split serially until there are >= n_threads nodes, then fan out the
  // independent subtrees across the pool.
  int fan_level = 0;
  while ((1 << fan_level) < n_threads && fan_level < depth) ++fan_level;
  struct Node { int64_t start, count, id; };
  std::vector<Node> frontier;
  frontier.push_back({0, n, 0});
  for (int lvl = 0; lvl < fan_level; ++lvl) {
    std::vector<Node> next;
    for (size_t i = 0; i < frontier.size(); ++i) {
      const Node nd = frontier[i];
      int64_t h = nd.count / 2;
      kd_split_once(points, stride, perm, nd.start, nd.count, h);
      next.push_back({nd.start, h, nd.id * 2});
      next.push_back({nd.start + h, nd.count - h, nd.id * 2 + 1});
    }
    frontier.swap(next);
  }
  std::atomic<int64_t> cursor(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = cursor.fetch_add(1);
      if (i >= (int64_t)frontier.size()) return;
      const Node& nd = frontier[i];
      kd_split_node(points, stride, perm, nd.start, nd.count, fan_level,
                    (int)depth, starts, counts, nd.id);
    }
  };
  std::vector<std::thread> pool;
  for (int64_t t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (std::vector<std::thread>::iterator it = pool.begin();
       it != pool.end(); ++it) it->join();
  return 0;
}

}  // extern "C"
