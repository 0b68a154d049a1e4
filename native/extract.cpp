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

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <thread>
#include <vector>

#ifdef __linux__
#include <sys/mman.h>
#endif

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

// Fused expansion + pack for the matchtigs candidate collapse
// (algos/matchtigs.py:_collapse_candidates_packed): candidate c expands
// into |ids(u_c)| x |ids(v_c)| rows, each packed into ONE int64
//   min(a,b) << (idb+10) | max(a,b) << 10 | w << 3 | (a<=b) << 2
//   | is_canon[u] << 1 | is_canon[v]
// exactly like the numpy path, but in one MT pass with NO intermediate
// expansion columns (the five full-length temporaries were ~3GB of
// first-touch fault surface at 60M bases).  `out` is caller-allocated,
// sized by collapse_expand_count; returns the row count written.
extern "C" i64 collapse_expand_count(i64 n_cands, const i64* u,
                                     const i64* v, const i64* ids_count,
                                     i64 n_threads) {
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  if (nt == 1 || n_cands < (i64)1 << 18) {
    i64 s = 0;
    for (i64 c = 0; c < n_cands; ++c) s += ids_count[u[c]] * ids_count[v[c]];
    return s;
  }
  std::vector<i64> part((size_t)nt, 0);
  std::vector<std::thread> ts;
  const i64 chunk = (n_cands + nt - 1) / nt;
  for (i64 t = 0; t < nt; ++t) {
    const i64 lo = t * chunk;
    if (lo >= n_cands) break;
    ts.emplace_back([&, t, lo] {
      const i64 hi = std::min(n_cands, lo + chunk);
      i64 s = 0;
      for (i64 c = lo; c < hi; ++c) s += ids_count[u[c]] * ids_count[v[c]];
      part[(size_t)t] = s;
    });
  }
  for (auto& th : ts) th.join();
  i64 s = 0;
  for (i64 t = 0; t < nt; ++t) s += part[(size_t)t];
  return s;
}

// Dedup + unpack of the SORTED packed collapse rows: keep the first row
// per (lo, hi) key (= the minimum (w, o, su, sv): exactly the numpy
// first-of-run on the sorted array), drop self-pairs (lo == hi), and
// emit the unpacked columns in one MT pass — replaces ~6 numpy passes
// plus their fresh 280MB temporaries at 60M bases.  Threads own disjoint
// row ranges; a row is kept iff its key differs from its predecessor
// (readable across the range boundary), so per-thread counts + exclusive
// prefix make the emission deterministic and contiguous.  Returns the
// number of surviving rows; outputs must have capacity for all of them
// (callers pass arrays sized by a first count-only call with
// lo_out == nullptr).
extern "C" i64 collapse_dedup_unpack(i64 n, const i64* packed, i64 idb,
                                     i64 n_threads, i64* lo_out, i64* hi_out,
                                     i64* w_out, signed char* o_out,
                                     signed char* su_out,
                                     signed char* sv_out) {
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  const i64 chunk = (n + nt - 1) / nt;
  const i64 id_mask = ((i64)1 << idb) - 1;
  std::vector<i64> cnt((size_t)nt + 1, 0);
  auto keep_row = [&](i64 i) -> bool {
    const i64 key = packed[i] >> 10;
    if (i > 0 && (packed[i - 1] >> 10) == key) return false;
    const i64 lo = key >> idb, hi = key & id_mask;
    return lo != hi;
  };
  auto par = [&](auto fn) {
    if (nt == 1 || n < (i64)1 << 18) {
      fn(0, 0, n);
      return;
    }
    std::vector<std::thread> ts;
    for (i64 t = 0; t < nt; ++t) {
      const i64 lo = t * chunk;
      if (lo >= n) break;
      ts.emplace_back(fn, t, lo, std::min(n, lo + chunk));
    }
    for (auto& th : ts) th.join();
  };
  par([&](i64 t, i64 lo, i64 hi) {
    i64 c = 0;
    for (i64 i = lo; i < hi; ++i) c += keep_row(i) ? 1 : 0;
    cnt[(size_t)t + 1] = c;
  });
  for (i64 t = 0; t < nt; ++t) cnt[(size_t)t + 1] += cnt[(size_t)t];
  const i64 total = cnt[(size_t)nt];
  if (!lo_out) return total;  // count-only mode
  par([&](i64 t, i64 lo, i64 hi) {
    i64 pos = cnt[(size_t)t];
    for (i64 i = lo; i < hi; ++i) {
      if (!keep_row(i)) continue;
      const i64 v = packed[i];
      const i64 key = v >> 10;
      lo_out[pos] = key >> idb;
      hi_out[pos] = key & id_mask;
      w_out[pos] = (v >> 3) & 127;
      o_out[pos] = (signed char)((v >> 2) & 1);
      su_out[pos] = (signed char)((v >> 1) & 1);
      sv_out[pos] = (signed char)(v & 1);
      ++pos;
    }
  });
  return total;
}

extern "C" i64 collapse_expand_pack(i64 n_cands, const i64* u, const i64* v,
                                    const i64* w, const i64* ids_start,
                                    const i64* ids_count,
                                    const signed char* is_canon, i64 idb,
                                    i64 n_threads, i64* out) {
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  const i64 chunk = (n_cands + nt - 1) / nt;
  std::vector<i64> t_total((size_t)nt + 1, 0);
  auto par = [&](auto fn) {
    if (nt == 1) {
      fn(0, 0, n_cands);
      return;
    }
    std::vector<std::thread> ts;
    for (i64 t = 0; t < nt; ++t) {
      const i64 lo = t * chunk;
      if (lo >= n_cands) break;
      ts.emplace_back(fn, t, lo, std::min(n_cands, lo + chunk));
    }
    for (auto& th : ts) th.join();
  };
  par([&](i64 t, i64 lo, i64 hi) {
    i64 s = 0;
    for (i64 c = lo; c < hi; ++c) s += ids_count[u[c]] * ids_count[v[c]];
    t_total[(size_t)t + 1] = s;
  });
  for (i64 t = 0; t < nt; ++t) t_total[(size_t)t + 1] += t_total[(size_t)t];
  const i64 total = t_total[(size_t)nt];
  par([&](i64 t, i64 lo, i64 hi) {
    i64 pos = t_total[(size_t)t];
    for (i64 c = lo; c < hi; ++c) {
      const i64 uc = u[c], vc = v[c];
      const i64 cu = ids_count[uc], cv = ids_count[vc];
      const i64 su = is_canon[uc], sv = is_canon[vc];
      const i64 wc = w[c];
      const i64 au0 = ids_start[uc], bv0 = ids_start[vc];
      for (i64 i = 0; i < cu; ++i)
        for (i64 j = 0; j < cv; ++j) {
          const i64 a = au0 + i, b = bv0 + j;
          const i64 o = a <= b ? 1 : 0;
          const i64 mn = o ? a : b, mx = o ? b : a;
          out[pos++] = (mn << (idb + 10)) | (mx << 10) | (wc << 3) |
                       (o << 2) | (su << 1) | sv;
        }
    }
  });
  return total;
}

// Bulk-populate a destination range (MADV_POPULATE_WRITE, linux 5.14+)
// then MT-memcpy into it.  np.empty destinations otherwise pay lazy
// first-touch faults one page at a time — on this host's ballooning
// hypervisor a 1.2GB candidate concat measured 10.5s for ~0.5s of
// copying.  Safe no-op population on older kernels (copy still works).
extern "C" void copy_i64_populated(i64* dst, const i64* src, i64 n,
                                   i64 n_threads) {
#if defined(__linux__)
  constexpr int kPopulateWrite = 23;  // MADV_POPULATE_WRITE
  const uintptr_t a = (uintptr_t)dst;
  const uintptr_t lo = (a + 4095) & ~(uintptr_t)4095;
  const uintptr_t hi = (a + (size_t)n * 8) & ~(uintptr_t)4095;
  if (hi > lo) madvise((void*)lo, hi - lo, kPopulateWrite);
#endif
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  if (nt == 1 || n < (i64)1 << 20) {
    std::memcpy(dst, src, (size_t)n * 8);
    return;
  }
  std::vector<std::thread> ts;
  const i64 chunk = (n + nt - 1) / nt;
  for (i64 t = 0; t < nt; ++t) {
    const i64 lo2 = t * chunk;
    if (lo2 >= n) break;
    const i64 hi2 = std::min(n, lo2 + chunk);
    ts.emplace_back([=] {
      std::memcpy(dst + lo2, src + lo2, (size_t)(hi2 - lo2) * 8);
    });
  }
  for (auto& th : ts) th.join();
}

// collapse_dedup_unpack fused with the id->node resolution epilogue
// (algos/matchtigs.py:_collapse_candidates_packed): instead of emitting
// the o/su/sv orientation bits for a ~2.8GB numpy gather/where chain
// (node_of_id[lo/hi], mirror[...] — ~13.6s at 35.4M survivors on this
// ballooning host), resolve the concrete (ur, vr) node pair per
// survivor in the same MT emission pass.  Semantics are exactly the
// python epilogue's: a = node_of_id[lo], b = node_of_id[hi];
// (u_can, v_can) = o ? (a, b) : (b, a); ur = su ? u_can : mirror[u_can];
// vr = sv ? v_can : mirror[v_can].  Count-only mode when lo_out is
// NULL, like collapse_dedup_unpack.
extern "C" i64 collapse_dedup_resolve(i64 n, const i64* packed, i64 idb,
                                      const i64* node_of_id,
                                      const i64* mirror, i64 n_threads,
                                      i64* lo_out, i64* hi_out, i64* w_out,
                                      i64* ur_out, i64* vr_out) {
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  const i64 chunk = (n + nt - 1) / nt;
  const i64 id_mask = ((i64)1 << idb) - 1;
  std::vector<i64> cnt((size_t)nt + 1, 0);
  auto keep_row = [&](i64 i) -> bool {
    const i64 key = packed[i] >> 10;
    if (i > 0 && (packed[i - 1] >> 10) == key) return false;
    const i64 lo = key >> idb, hi = key & id_mask;
    return lo != hi;
  };
  auto par = [&](auto fn) {
    if (nt == 1 || n < (i64)1 << 18) {
      fn(0, 0, n);
      return;
    }
    std::vector<std::thread> ts;
    for (i64 t = 0; t < nt; ++t) {
      const i64 lo = t * chunk;
      if (lo >= n) break;
      ts.emplace_back(fn, t, lo, std::min(n, lo + chunk));
    }
    for (auto& th : ts) th.join();
  };
  par([&](i64 t, i64 lo, i64 hi) {
    i64 c = 0;
    for (i64 i = lo; i < hi; ++i) c += keep_row(i) ? 1 : 0;
    cnt[(size_t)t + 1] = c;
  });
  for (i64 t = 0; t < nt; ++t) cnt[(size_t)t + 1] += cnt[(size_t)t];
  const i64 total = cnt[(size_t)nt];
  if (!lo_out) return total;  // count-only mode
  par([&](i64 t, i64 lo, i64 hi) {
    i64 pos = cnt[(size_t)t];
    for (i64 i = lo; i < hi; ++i) {
      if (!keep_row(i)) continue;
      const i64 v = packed[i];
      const i64 key = v >> 10;
      const i64 l = key >> idb, h = key & id_mask;
      lo_out[pos] = l;
      hi_out[pos] = h;
      w_out[pos] = (v >> 3) & 127;
      const i64 a = node_of_id[l], b = node_of_id[h];
      const bool o = (v >> 2) & 1;
      const i64 u_can = o ? a : b, v_can = o ? b : a;
      ur_out[pos] = ((v >> 1) & 1) ? u_can : mirror[u_can];
      vr_out[pos] = (v & 1) ? v_can : mirror[v_can];
      ++pos;
    }
  });
  return total;
}
