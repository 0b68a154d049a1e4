// Multithreaded extraction of (src, dst, dist) candidate triples from the
// device kernel's packed result matrix.
//
// The batched SSSP kernel (matchtigs_tpu/ops/sssp.py) downloads one int32
// per (source, slot): (node << DIST_BITS) | dist, dist == dist_cap marking
// an empty slot.  Turning that into candidate triples with numpy (unpack,
// mask, nonzero, unmap gathers, int64 stack) cost ~3s at bench scale while
// competing with the concurrent host-routed Dijkstra for cores; this pass
// does the same filter + id-translation in one parallel sweep.  Output
// layout matches the native Dijkstra collectors (flat [3M+1] buffer,
// columns src/dst/dist; tests/test_native_parity.py checks numpy parity,
// matchtigs_tpu/ops/sssp.py frees via free_i64_buffer).

#include <cstdint>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {
using i64 = long long;
}

extern "C" i64 extract_packed_triples(
    i64 S, i64 C, const int32_t* packed, const int32_t* srcs,
    const int8_t* done, const int8_t* in_mask, const int32_t* to_orig,
    i64 dist_bits, i64 n_threads, i64** out_buf) {
  const int32_t dist_cap = (int32_t)((1 << dist_bits) - 1);
  int nt = (int)std::max<i64>(1, std::min<i64>(n_threads, 64));
  if (S < (1 << 12)) nt = 1;
  const i64 chunk = (S + nt - 1) / nt;

  std::vector<std::vector<i64>> local((size_t)nt);  // interleaved s,d,w
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t)
      ths.emplace_back([&, t] {
        i64 lo = t * chunk, hi = std::min<i64>(S, lo + chunk);
        auto& v = local[t];
        for (i64 i = lo; i < hi; ++i) {
          if (done && !done[i]) continue;
          const int32_t* row = packed + i * C;
          i64 src = srcs[i];
          i64 osrc = to_orig ? to_orig[src] : src;
          for (i64 c = 0; c < C; ++c) {
            int32_t key = row[c];
            int32_t d = key & dist_cap;
            if (d < 1 || d >= dist_cap) continue;
            int32_t node = key >> dist_bits;
            if (!in_mask[node]) continue;
            v.push_back(osrc);
            v.push_back(to_orig ? to_orig[node] : node);
            v.push_back(d);
          }
        }
      });
    for (auto& th : ths) th.join();
  }
  i64 n = 0;
  for (auto& v : local) n += (i64)v.size() / 3;
  i64* buf = (i64*)std::malloc(sizeof(i64) * (size_t)(3 * n + 1));
  if (!buf) return -1;
  // column layout: [0:n) src, [n:2n) dst, [2n:3n) dist
  {
    std::vector<std::thread> ths;
    i64 base = 0;
    for (int t = 0; t < nt; ++t) {
      i64 cnt = (i64)local[t].size() / 3;
      ths.emplace_back([&, t, base, cnt] {
        const i64* v = local[t].data();
        for (i64 j = 0; j < cnt; ++j) {
          buf[base + j] = v[3 * j];
          buf[n + base + j] = v[3 * j + 1];
          buf[2 * n + base + j] = v[3 * j + 2];
        }
      });
      base += cnt;
    }
    for (auto& th : ths) th.join();
  }
  *out_buf = buf;
  return n;
}
