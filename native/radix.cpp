// Multithreaded radix-partitioned unique-with-inverse over uint64 keys.
//
// Replaces np.unique(packed, return_inverse=True) in the graph builder
// (matchtigs_tpu/graph/build.py), whose single-threaded comparison sort +
// inverse scatter dominated graph construction at the 60M-base scale
// (29.5s of a 52s build over 31.4M keys).  The reference reaches the same
// node-identity step through compact-genome/genome-graph hashing
// (/root/reference/src/bin.rs:874-915); this is a sort-based design so the
// unique ids come out in ascending key order, matching np.unique exactly
// (parity-tested in tests/test_native_parity.py).
//
// Plan: one counting pass buckets keys by their top significant bits
// (shift derived from the max key, so low-entropy packed kmers still
// spread), a parallel scatter builds (key, index) pairs per bucket, each
// bucket is sorted and deduplicated independently (buckets are disjoint
// key ranges, so bucket-local ranks offset by a prefix over bucket unique
// counts are the global sorted ranks), and a final parallel pass writes
// the sorted unique keys and the inverse mapping.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>

#ifdef __linux__
#include <sys/mman.h>
#endif
#include <thread>
#include <vector>

namespace {

using u64 = uint64_t;
using i64 = long long;

struct KeyIdx {
  u64 key;
  int64_t idx;
};

int bucket_bits_for(i64 n) {
  // ~8k keys per bucket keeps per-bucket sorts cache-resident while the
  // bucket count stays far above the thread count for load balance.
  int bits = 1;
  while ((n >> bits) > 8192 && bits < 16) ++bits;
  return bits;
}

}  // namespace

extern "C" i64 unique_u64_inverse(i64 n, const u64* keys, u64* uniq_out,
                                  int32_t* inverse_out, i64 n_threads) {
  if (n <= 0) return 0;
  int nt = (int)std::max<i64>(1, std::min<i64>(n_threads, 64));
  if (n < (1 << 14)) nt = 1;

  // Max key -> shift so buckets use the top significant bits.
  u64 maxk = 0;
  for (i64 i = 0; i < n; ++i) maxk = std::max(maxk, keys[i]);
  int kbits = 1;
  while (kbits < 64 && (maxk >> kbits) != 0) ++kbits;
  const int bbits = bucket_bits_for(n);
  const int shift = kbits > bbits ? kbits - bbits : 0;
  const i64 nb = (i64)1 << bbits;

  // Phase 1: per-thread per-bucket counts.
  std::vector<i64> counts((size_t)nt * nb, 0);
  const i64 chunk = (n + nt - 1) / nt;
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t)
      ths.emplace_back([&, t] {
        i64 lo = t * chunk, hi = std::min<i64>(n, lo + chunk);
        i64* c = counts.data() + (size_t)t * nb;
        for (i64 i = lo; i < hi; ++i) ++c[keys[i] >> shift];
      });
    for (auto& th : ths) th.join();
  }
  // Bucket starts + per-thread scatter cursors (column-major prefix).
  std::vector<i64> bucket_start(nb + 1, 0);
  {
    i64 acc = 0;
    for (i64 b = 0; b < nb; ++b) {
      bucket_start[b] = acc;
      for (int t = 0; t < nt; ++t) {
        i64 c = counts[(size_t)t * nb + b];
        counts[(size_t)t * nb + b] = acc;  // becomes the cursor
        acc += c;
      }
    }
    bucket_start[nb] = acc;
  }

  // Phase 2: parallel scatter into (key, idx) pairs.
  std::vector<KeyIdx> pairs((size_t)n);
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t)
      ths.emplace_back([&, t] {
        i64 lo = t * chunk, hi = std::min<i64>(n, lo + chunk);
        i64* cur = counts.data() + (size_t)t * nb;
        for (i64 i = lo; i < hi; ++i) {
          u64 k = keys[i];
          pairs[(size_t)cur[k >> shift]++] = {k, i};
        }
      });
    for (auto& th : ths) th.join();
  }

  // Phase 3: per-bucket sort + unique count (dynamic scheduling).
  std::vector<i64> uniq_in_bucket(nb, 0);
  {
    std::atomic<i64> next{0};
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t)
      ths.emplace_back([&] {
        for (;;) {
          i64 b = next.fetch_add(1);
          if (b >= nb) return;
          KeyIdx* lo = pairs.data() + bucket_start[b];
          KeyIdx* hi = pairs.data() + bucket_start[b + 1];
          if (lo == hi) continue;
          std::sort(lo, hi, [](const KeyIdx& a, const KeyIdx& c) {
            return a.key < c.key;
          });
          i64 u = 1;
          for (KeyIdx* p = lo + 1; p < hi; ++p) u += (p->key != (p - 1)->key);
          uniq_in_bucket[b] = u;
        }
      });
    for (auto& th : ths) th.join();
  }
  // Prefix over bucket unique counts -> global base rank per bucket.
  std::vector<i64> uniq_base(nb + 1, 0);
  for (i64 b = 0; b < nb; ++b)
    uniq_base[b + 1] = uniq_base[b] + uniq_in_bucket[b];
  const i64 n_uniq = uniq_base[nb];

  // Phase 4: write unique keys + inverse ranks.
  {
    std::atomic<i64> next{0};
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t)
      ths.emplace_back([&] {
        for (;;) {
          i64 b = next.fetch_add(1);
          if (b >= nb) return;
          const KeyIdx* lo = pairs.data() + bucket_start[b];
          const KeyIdx* hi = pairs.data() + bucket_start[b + 1];
          i64 rank = uniq_base[b] - 1;
          u64 prev = 0;
          for (const KeyIdx* p = lo; p < hi; ++p) {
            if (p == lo || p->key != prev) {
              ++rank;
              uniq_out[rank] = p->key;
              prev = p->key;
            }
            inverse_out[p->idx] = (int32_t)rank;
          }
        }
      });
    for (auto& th : ths) th.join();
  }
  return n_uniq;
}

// Stable sort permutation over int32 keys in [0, n_keys):
// order_out[r] = original index of the r-th entry under (key, index)
// order — identical to np.argsort(keys, kind="stable"), which is the
// CSR bucketing step of graph/bigraph.py and ops/device_graph.py and
// cost ~2.1s single-threaded over 22.8M edges at the 60M-base scale.
//
// Two-level counting sort: an MT histogram pass buckets by the key's
// top bits (per-thread counts laid out thread-major within each bucket,
// so contiguous thread slices preserve original-index order = stability),
// an MT scatter fills per-bucket (key, index) runs, and each bucket is
// finished independently by a cache-resident counting sort over the low
// key bits.
extern "C" void stable_order_i32(i64 n, const int32_t* keys, i64 n_keys,
                                 i64* order_out, i64 n_threads) {
  if (n <= 0) return;
  int key_bits = 1;
  while (((i64)1 << key_bits) < n_keys) ++key_bits;
  const int low_bits = std::min(14, key_bits);
  const int bb = key_bits - low_bits;
  const i64 nb = (i64)1 << bb;
  const i64 nlow = (i64)1 << low_bits;
  const int nt = (int)std::max<i64>(1, std::min<i64>(n_threads, 16));
  const i64 chunk = (n + nt - 1) / nt;

  std::vector<i64> counts((size_t)nt * nb, 0);
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t) {
      ths.emplace_back([&, t] {
        i64* c = counts.data() + (size_t)t * nb;
        const i64 lo = t * chunk, hi = std::min<i64>(n, lo + chunk);
        for (i64 i = lo; i < hi; ++i) ++c[(u64)(uint32_t)keys[i] >> low_bits];
      });
    }
    for (auto& th : ths) th.join();
  }
  std::vector<i64> bucket_base(nb + 1, 0);
  {
    i64 acc = 0;
    for (i64 b = 0; b < nb; ++b) {
      bucket_base[b] = acc;
      for (int t = 0; t < nt; ++t) {
        i64 c = counts[(size_t)t * nb + b];
        counts[(size_t)t * nb + b] = acc;
        acc += c;
      }
    }
    bucket_base[nb] = acc;
  }
  std::vector<int32_t> tmp_key(n);
  std::vector<i64> tmp_idx(n);
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t) {
      ths.emplace_back([&, t] {
        i64* c = counts.data() + (size_t)t * nb;
        const i64 lo = t * chunk, hi = std::min<i64>(n, lo + chunk);
        for (i64 i = lo; i < hi; ++i) {
          const i64 pos = c[(u64)(uint32_t)keys[i] >> low_bits]++;
          tmp_key[pos] = keys[i];
          tmp_idx[pos] = i;
        }
      });
    }
    for (auto& th : ths) th.join();
  }
  {
    std::atomic<i64> next(0);
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; ++t) {
      ths.emplace_back([&] {
        std::vector<i64> c(nlow);
        for (;;) {
          const i64 b = next.fetch_add(1);
          if (b >= nb) break;
          const i64 lo = bucket_base[b], hi = bucket_base[b + 1];
          if (lo == hi) continue;
          std::fill(c.begin(), c.end(), 0);
          const i64 mask = nlow - 1;
          for (i64 i = lo; i < hi; ++i) ++c[tmp_key[i] & mask];
          i64 acc = lo;
          for (i64 v = 0; v < nlow; ++v) {
            const i64 cnt = c[v];
            c[v] = acc;
            acc += cnt;
          }
          for (i64 i = lo; i < hi; ++i)
            order_out[c[tmp_key[i] & mask]++] = tmp_idx[i];
        }
      });
    }
    for (auto& th : ths) th.join();
  }
}

namespace {
// MT LSD radix sort, 4 x 16-bit counting passes: per-thread histograms
// with a (bucket, thread) exclusive scan, so the scatter is stable and
// deterministic.  Even pass count: the result lands back in `key`.
static void lsd_radix_u64(unsigned long long* key, unsigned long long* tmp,
                          i64 n, i64 nt) {
  using u64 = unsigned long long;
  const i64 chunk = (n + nt - 1) / nt;
  auto par = [&](auto fn) {
    if (nt == 1 || n < (i64)1 << 16) {
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
  const i64 R = 1 << 16;
  std::vector<i64> hist((size_t)(nt * R));
  u64* src = key;
  u64* dst = tmp;
  for (int pass = 0; pass < 4; ++pass) {
    const int shift = pass * 16;
    std::fill(hist.begin(), hist.end(), 0);
    par([&](i64 t, i64 lo, i64 hi) {
      i64* h = hist.data() + t * R;
      for (i64 i = lo; i < hi; ++i) ++h[(src[i] >> shift) & 0xFFFF];
    });
    i64 sum = 0;
    for (i64 b = 0; b < R; ++b)
      for (i64 t = 0; t < nt; ++t) {
        i64& h = hist[(size_t)(t * R + b)];
        const i64 c = h;
        h = sum;
        sum += c;
      }
    par([&](i64 t, i64 lo, i64 hi) {
      i64* h = hist.data() + t * R;
      for (i64 i = lo; i < hi; ++i)
        dst[h[(src[i] >> shift) & 0xFFFF]++] = src[i];
    });
    std::swap(src, dst);
  }
}
}  // namespace

// MT pack + LSD radix value-sort + unpack for the greedy-acceptance key
// (d << 56 | u << 28 | v over int64 columns; ops/matching.py).  The numpy
// version pays three single-threaded 400MB passes to pack, one AVX-512
// np.sort (~70M keys/s/core), and three more passes to unpack -- ~1.6s at
// 51M candidates.  Here: one MT pack pass, four MT 16-bit LSD counting
// passes (stable; per-thread histograms + exclusive scan so the scatter
// is deterministic), one MT unpack pass.  Sorts the three columns
// IN PLACE by (d, u, v).  Requires u, v < 2^28 and 0 <= d < 256.
extern "C" i64 accept_sort_packed(i64 n, long long* cu, long long* cv,
                                  long long* cd, i64 n_threads) {
  using u64 = unsigned long long;
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  u64* key = static_cast<u64*>(std::malloc((size_t)n * 8));
  u64* tmp = static_cast<u64*>(std::malloc((size_t)n * 8));
  if (!key || !tmp) {
    std::free(key);
    std::free(tmp);
    return -1;
  }
  const i64 chunk = (n + nt - 1) / nt;
  auto par = [&](auto fn) {
    if (nt == 1 || n < (i64)1 << 16) {
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
  par([&](i64, i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      key[i] = ((u64)cd[i] << 56) | ((u64)cu[i] << 28) | (u64)cv[i];
  });
  lsd_radix_u64(key, tmp, n, nt);
  u64* src = key;  // 4 (even) passes: result is back in `key`
  par([&](i64, i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i) {
      const u64 k = src[i];
      cd[i] = (long long)(k >> 56);
      cu[i] = (long long)((k >> 28) & ((1u << 28) - 1));
      cv[i] = (long long)(k & ((1u << 28) - 1));
    }
  });
  std::free(key);
  std::free(tmp);
  return 0;
}


// In-place MT radix value sort of non-negative int64 keys (scratch is
// allocated internally).  Returns 0, or -1 on allocation failure.
extern "C" i64 radix_sort_i64(i64 n, long long* keys, i64 n_threads) {
  using u64 = unsigned long long;
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  u64* tmp = static_cast<u64*>(std::malloc((size_t)n * 8));
  if (!tmp) return -1;
  lsd_radix_u64(reinterpret_cast<u64*>(keys), tmp, n, nt);
  std::free(tmp);
  return 0;
}

namespace {
// Persistent key/tmp scratch for the chunked acceptance sorts (guarded;
// one acceptance sort runs at a time): re-faulting 0.8GB of fresh pages
// per pipeline pass costs multiple seconds on this ballooning host,
// while resident pages are free to reuse.
std::mutex g_accept_mu;
unsigned long long* g_accept_key = nullptr;
unsigned long long* g_accept_tmp = nullptr;
i64 g_accept_cap = 0;

void populate_pages(void* p, size_t bytes) {
#if defined(__linux__)
  constexpr int kPopulateWrite = 23;
  const uintptr_t a = (uintptr_t)p;
  const uintptr_t lo = (a + 4095) & ~(uintptr_t)4095;
  const uintptr_t hi = (a + bytes) & ~(uintptr_t)4095;
  if (hi > lo) madvise((void*)lo, hi - lo, kPopulateWrite);
#else
  (void)p;
  (void)bytes;
#endif
}

// Pack the candidate chunks straight into the persistent key buffer
// (d << 56 | u << 28 | v) and LSD-radix sort it.  Returns the sorted
// key pointer (persistent; valid until the next call) or nullptr on
// allocation failure.  Caller must hold g_accept_mu.
unsigned long long* pack_sort_chunks_locked(
    i64 n_chunks, const long long* const* us, const long long* const* vs,
    const long long* const* ds, const i64* lens, i64 n, i64 nt) {
  using u64 = unsigned long long;
  if (g_accept_cap < n) {
    std::free(g_accept_key);
    std::free(g_accept_tmp);
    g_accept_key = static_cast<u64*>(std::malloc((size_t)n * 8));
    g_accept_tmp = static_cast<u64*>(std::malloc((size_t)n * 8));
    g_accept_cap = (g_accept_key && g_accept_tmp) ? n : 0;
    if (!g_accept_cap) {
      std::free(g_accept_key);
      std::free(g_accept_tmp);
      g_accept_key = g_accept_tmp = nullptr;
      return nullptr;
    }
    populate_pages(g_accept_key, (size_t)n * 8);
    populate_pages(g_accept_tmp, (size_t)n * 8);
  }
  u64* key = g_accept_key;
  // pack each chunk into its slice of the key buffer (MT within chunks)
  i64 off = 0;
  for (i64 c = 0; c < n_chunks; ++c) {
    const i64 len = lens[c];
    const long long* up = us[c];
    const long long* vp = vs[c];
    const long long* dp = ds[c];
    u64* out = key + off;
    const i64 cnt = std::max<i64>(1, std::min<i64>(nt, len / (1 << 16)));
    if (cnt == 1) {
      for (i64 i = 0; i < len; ++i)
        out[i] = ((u64)dp[i] << 56) | ((u64)up[i] << 28) | (u64)vp[i];
    } else {
      std::vector<std::thread> ts;
      const i64 chunk = (len + cnt - 1) / cnt;
      for (i64 t = 0; t < cnt; ++t) {
        const i64 lo = t * chunk;
        if (lo >= len) break;
        const i64 hi = std::min(len, lo + chunk);
        ts.emplace_back([=] {
          for (i64 i = lo; i < hi; ++i)
            out[i] = ((u64)dp[i] << 56) | ((u64)up[i] << 28) | (u64)vp[i];
        });
      }
      for (auto& th : ts) th.join();
    }
    off += len;
  }
  lsd_radix_u64(key, g_accept_tmp, n, nt);
  return key;
}
}  // namespace

// The MT chunked-speculation acceptance scan over sorted packed keys
// (native/tigs.cpp; extern "C", identical accepted set as the unpacked
// scan, parity-tested).
extern "C" i64 greedy_accept_scan_packed_mt(
    i64 n_cands, const unsigned long long* keys, i64* m, const i64* mirror,
    const signed char* self_mirror, i64* u_out, i64* v_out, i64* d_out,
    i64 cap, i64 n_threads, i64 chunk_size);

// Fused chunk-concat + pack + radix sort + unpack for the acceptance
// key: the candidate chunks (device extraction, host-routed, overflow
// tail) are packed STRAIGHT into the key buffer — the separate 1.2GB
// three-column concatenation this replaces was the device-led path's
// biggest fault surface at 60M bases (10.5s for ~0.5s of copying).
// Outputs are the (d, u, v)-sorted columns written into caller buffers
// (bulk-populated first).  Same requirements as accept_sort_packed:
// u, v < 2^28, 0 <= d < 128.  Returns 0, -1 on allocation failure.
extern "C" i64 accept_sort_packed_chunks(
    i64 n_chunks, const long long* const* us, const long long* const* vs,
    const long long* const* ds, const i64* lens, long long* cu_out,
    long long* cv_out, long long* cd_out, i64 n_threads) {
  using u64 = unsigned long long;
  i64 n = 0;
  for (i64 c = 0; c < n_chunks; ++c) n += lens[c];
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  std::lock_guard<std::mutex> lock(g_accept_mu);
  populate_pages(cu_out, (size_t)n * 8);
  populate_pages(cv_out, (size_t)n * 8);
  populate_pages(cd_out, (size_t)n * 8);
  u64* key = pack_sort_chunks_locked(n_chunks, us, vs, ds, lens, n, nt);
  if (!key) return -1;
  // unpack (MT)
  {
    std::vector<std::thread> ts;
    const i64 chunk = (n + nt - 1) / nt;
    auto unpack = [&](i64 lo, i64 hi) {
      for (i64 i = lo; i < hi; ++i) {
        const u64 k = key[i];
        cd_out[i] = (long long)(k >> 56);
        cu_out[i] = (long long)((k >> 28) & ((1u << 28) - 1));
        cv_out[i] = (long long)(k & ((1u << 28) - 1));
      }
    };
    if (nt == 1 || n < (i64)1 << 16) {
      unpack(0, n);
    } else {
      for (i64 t = 0; t < nt; ++t) {
        const i64 lo = t * chunk;
        if (lo >= n) break;
        ts.emplace_back(unpack, lo, std::min(n, lo + chunk));
      }
      for (auto& th : ts) th.join();
    }
  }
  return 0;  // key/tmp persist for the next pass
}

// Fully fused acceptance: chunk-concat + pack + MT radix sort + packed
// MT acceptance scan, with only the ACCEPTED triples ever unpacked.
// Replaces accept_sort_packed_chunks + greedy_accept_scan_mt for the
// greedytig accept phase: the full-width unpack (3 columns) and the
// scan's re-read of them moved ~2.4GB at 51M candidates for ~1M accepted
// rows.  u_out/v_out/d_out have capacity `cap` (the caller bounds accepts
// by the total out-deficit).  Returns the accept count, -1 on allocation
// failure, -2 if cap is exceeded (impossible under the deficit bound).
extern "C" i64 accept_chunks_scan_packed(
    i64 n_chunks, const long long* const* us, const long long* const* vs,
    const long long* const* ds, const i64* lens, long long* m,
    const long long* mirror, const signed char* self_mirror,
    long long* u_out, long long* v_out, long long* d_out, i64 cap,
    i64 n_threads, i64 chunk_size) {
  i64 n = 0;
  for (i64 c = 0; c < n_chunks; ++c) n += lens[c];
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  std::lock_guard<std::mutex> lock(g_accept_mu);
  unsigned long long* key =
      pack_sort_chunks_locked(n_chunks, us, vs, ds, lens, n, nt);
  if (!key) return -1;
  return greedy_accept_scan_packed_mt(n, key, m, mirror, self_mirror,
                                      u_out, v_out, d_out, cap, nt,
                                      chunk_size);
}

// MT pack + 64-bit LSD radix + boundary dedup for the matching batch's
// per-pair max-profit edge selection (algos/matchtigs.py run_batch).
// Key = (lo*nb + hi) << 7 | dist: ascending order == (pair key asc,
// dist ASC), and minimal dist == maximal profit under the affine
// profit transform, so the FIRST row of each pair group survives —
// exactly the python oracle's packed2 sort + boundary mask.  The numpy
// version paid ~6 fresh 283MB temporaries (pack arithmetic, shifted
// copies, boolean gathers) whose first-touch page faults dominate on
// this ballooning host (~8s at 35.4M edges); here the only big
// allocations are the two key buffers, populated MT.  dist reads with
// an element stride so the caller can pass a 2D column view.  Requires
// lo, hi < nb, nb*nb <= 2^57, 0 <= dist < 128.  Returns the surviving
// count; *out is one malloc'd [3*count] buffer [lo..., hi..., dist...]
// (caller frees via free_i64_buffer), or NULL when count is 0 or
// allocation fails (return -1).
extern "C" i64 pair_dedup_min_dist(i64 n, const long long* lo,
                                   const long long* hi,
                                   const long long* dist, i64 dist_stride,
                                   i64 nb, i64 n_threads, i64** out) {
  using u64 = unsigned long long;
  *out = nullptr;
  if (n <= 0) return 0;
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  u64* key = static_cast<u64*>(std::malloc((size_t)n * 8));
  u64* tmp = static_cast<u64*>(std::malloc((size_t)n * 8));
  if (!key || !tmp) {
    std::free(key);
    std::free(tmp);
    return -1;
  }
  const i64 chunk = (n + nt - 1) / nt;
  auto par = [&](auto fn) {
    std::vector<std::thread> ts;
    for (i64 t = 0; t < nt; ++t) {
      const i64 a = t * chunk;
      if (a >= n) break;
      ts.emplace_back(fn, t, a, std::min(n, a + chunk));
    }
    for (auto& th : ts) th.join();
  };
  par([&](i64, i64 a, i64 b) {
    for (i64 i = a; i < b; ++i)
      key[i] = (((u64)lo[i] * (u64)nb + (u64)hi[i]) << 7) |
               (u64)dist[i * dist_stride];
  });
  lsd_radix_u64(key, tmp, n, nt);  // 4 passes: result back in `key`
  // survivor = first row of its pair group (key >> 7 differs from the
  // previous row's)
  std::vector<i64> cnt(nt, 0);
  par([&](i64 t, i64 a, i64 b) {
    i64 c = 0;
    for (i64 i = a; i < b; ++i)
      if (i == 0 || (key[i] >> 7) != (key[i - 1] >> 7)) ++c;
    cnt[t] = c;
  });
  i64 total = 0;
  std::vector<i64> off(nt, 0);
  for (i64 t = 0; t < nt; ++t) {
    off[t] = total;
    total += cnt[t];
  }
  i64* buf = nullptr;
  if (total > 0) {
    buf = static_cast<i64*>(std::malloc(((size_t)total * 3 + 1) * 8));
    if (!buf) {
      std::free(key);
      std::free(tmp);
      return -1;
    }
    par([&](i64 t, i64 a, i64 b) {
      i64 w = off[t];
      for (i64 i = a; i < b; ++i) {
        if (i != 0 && (key[i] >> 7) == (key[i - 1] >> 7)) continue;
        const u64 k2 = key[i] >> 7;
        const i64 l = (i64)(k2 / (u64)nb);
        buf[w] = l;
        buf[total + w] = (i64)(k2 - (u64)l * (u64)nb);
        buf[2 * total + w] = (i64)(key[i] & 127);
        ++w;
      }
    });
  }
  std::free(key);
  std::free(tmp);
  *out = buf;
  return total;
}

// MT permutation gather for the matching instance's edge bucketing
// (algos/matchtigs.py): out3[i] = {a,b,c}[order[i]] interleaved row-major
// and out_cc[i] = ccv[order[i]], with output pages first-touched by the
// writing threads.  Replaces np.stack(...)[order] + a second fancy-index
// gather — ~1.7GB of fresh single-threaded numpy temporaries (~7s at
// 35.4M edges on this ballooning host).
extern "C" void gather_edges_cc_i64(i64 n, const long long* order,
                                    const long long* a, const long long* b,
                                    const long long* c, const long long* ccv,
                                    long long* out3, long long* out_cc,
                                    i64 n_threads) {
  const i64 nt = std::max<i64>(1, std::min<i64>(n_threads, 16));
  const i64 chunk = (n + nt - 1) / nt;
  std::vector<std::thread> ts;
  for (i64 t = 0; t < nt; ++t) {
    const i64 lo = t * chunk;
    if (lo >= n) break;
    ts.emplace_back([&, lo] {
      const i64 hi = std::min(n, lo + chunk);
      for (i64 i = lo; i < hi; ++i) {
        const i64 j = order[i];
        out3[i * 3] = a[j];
        out3[i * 3 + 1] = b[j];
        out3[i * 3 + 2] = c[j];
        out_cc[i] = ccv[j];
      }
    });
  }
  for (auto& th : ts) th.join();
}
