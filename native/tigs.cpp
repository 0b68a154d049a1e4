// Native passes for the tig pipeline: greedy candidate acceptance and
// walk spelling.
//
// greedy_accept_scan: the reference's lock-based online matching
// (/root/reference/src/implementation/greedytigs/mod.rs:350-502) reduced
// to a deterministic linear scan over pre-sorted candidates with the same
// multiplicity rules (see ops/matching.py, which holds the python oracle).
//
// spell_walks_packed: the walk speller (/root/reference/src/bin.rs:486-605)
// reading the 2-bit packed sequence arena directly.

#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <queue>
#include <thread>
#include <unordered_map>
#include <utility>
#include <vector>

#ifdef __linux__
#include <sys/mman.h>
#endif

namespace {
using i64 = long long;

// Assemble thread-local triple vectors into one malloc'd buffer of layout
// [src..., dst..., dist...] (released by free_i64_buffer): the buffer is
// bulk-populated (MADV_POPULATE_WRITE) and the segments copied in
// parallel — at 51M triples the serial copy over fresh pages was a
// multi-second fault storm on this ballooning host, for ~0.15s of memcpy.
i64 concat_triples(std::vector<std::vector<i64>>& srcs,
                   std::vector<std::vector<i64>>& dsts,
                   std::vector<std::vector<i64>>& dists, i64** out_ptr) {
  const i64 nt = (i64)srcs.size();
  i64 total = 0;
  for (auto& v : srcs) total += (i64)v.size();
  i64* buf = (i64*)std::malloc(sizeof(i64) * (size_t)(3 * total) + 8);
  if (!buf) return -1;
#ifdef __linux__
  {
    constexpr int kPopulateWrite = 23;  // MADV_POPULATE_WRITE
    const uintptr_t a = (uintptr_t)buf;
    const uintptr_t lo = (a + 4095) & ~(uintptr_t)4095;
    const uintptr_t hi = (a + sizeof(i64) * (size_t)(3 * total)) &
                         ~(uintptr_t)4095;
    if (hi > lo) madvise((void*)lo, hi - lo, kPopulateWrite);
  }
#endif
  std::vector<i64> off(nt + 1, 0);
  for (i64 t = 0; t < nt; ++t) off[t + 1] = off[t] + (i64)srcs[t].size();
  std::vector<std::thread> copiers;
  for (i64 t = 0; t < nt; ++t) {
    copiers.emplace_back([&, t]() {
      std::copy(srcs[t].begin(), srcs[t].end(), buf + off[t]);
      std::copy(dsts[t].begin(), dsts[t].end(), buf + total + off[t]);
      std::copy(dists[t].begin(), dists[t].end(), buf + 2 * total + off[t]);
    });
  }
  for (auto& th : copiers) th.join();
  *out_ptr = buf;
  return total;
}
}

extern "C" {

// Candidates: cand_u/cand_v/cand_d (int64 [M]) pre-sorted by (d, u, v).
// m: signed multiplicities per node (int64 [N], mutated).
// mirror: mirror node ids.  self_mirror: 0/1 per node.
// accepted_out: capacity M, receives indices of accepted candidates.
// order: optional permutation (int64 [M] or null) -- candidates are
// visited as cand_*[order[i]] and accepted_out receives ORIGINAL indices,
// so the caller never materializes the sorted gather (a 3x 0.4GB random
// gather at 50M candidates).
// Returns number accepted.
i64 greedy_accept_scan_perm(i64 n_cands, const i64* order, const i64* cand_u,
                            const i64* cand_v, const i64* cand_d, i64* m,
                            const i64* mirror, const signed char* self_mirror,
                            i64* accepted_out) {
  i64 n_acc = 0;
  for (i64 ii = 0; ii < n_cands; ++ii) {
    i64 i = order ? order[ii] : ii;
    i64 u = cand_u[i];
    i64 v = cand_v[i];
    bool u_sm = self_mirror[u] != 0;
    i64 mu = mirror[u];
    bool is_mirror_edge = (v == mu) && !u_sm;

    i64 out_mult = u_sm ? m[u] : -m[u];
    if (out_mult <= 0) continue;
    bool v_sm = false;
    if (is_mirror_edge) {
      if (out_mult < 2) continue;
    } else {
      v_sm = self_mirror[v] != 0;
      if (m[v] <= 0) continue;
    }

    accepted_out[n_acc++] = i;
    i64 red = is_mirror_edge ? 2 : 1;
    if (u_sm) {
      m[u] -= 1;
    } else {
      m[u] += red;
      m[mu] -= red;
    }
    if (!is_mirror_edge) {
      m[v] -= 1;
      if (!v_sm) m[mirror[v]] += 1;
    }
  }
  return n_acc;
}

// MT variant of the accept scan for pre-sorted candidates (order == null
// path).  Exactness rests on multiplicity monotonicity: every update
// moves m[x] toward zero and no sign ever flips (accepts require
// out_mult >= red and in_mult >= 1 BEFORE the update), so a candidate
// rejected under ANY earlier m-state is rejected forever.  Chunked
// speculation is therefore exact: a parallel read-only filter under the
// chunk-start snapshot discards permanent rejects (the vast majority —
// accept density is ~3% at 60M bases), and only the snapshot-accepts go
// through the exact sequential scan.  Accepted set identical to
// greedy_accept_scan_perm (parity-tested).
i64 greedy_accept_scan_mt(i64 n_cands, const i64* cand_u, const i64* cand_v,
                          const i64* cand_d, i64* m, const i64* mirror,
                          const signed char* self_mirror, i64* accepted_out,
                          i64 n_threads, i64 chunk_size) {
  (void)cand_d;
  if (n_threads < 2 || n_cands < chunk_size * 2)
    return greedy_accept_scan_perm(n_cands, nullptr, cand_u, cand_v, cand_d,
                                   m, mirror, self_mirror, accepted_out);
  if (chunk_size < 1) chunk_size = 1 << 19;
  std::vector<std::vector<i64>> surv((size_t)n_threads);
  i64 n_acc = 0;
  for (i64 lo = 0; lo < n_cands; lo += chunk_size) {
    const i64 hi = std::min(n_cands, lo + chunk_size);
    const i64 span = hi - lo;
    const i64 nt = std::min<i64>(n_threads, std::max<i64>(1, span / 4096));
    const i64 sub = (span + nt - 1) / nt;
    auto filter = [&](i64 t) {
      auto& out = surv[(size_t)t];
      out.clear();
      const i64 s_lo = lo + t * sub, s_hi = std::min(hi, s_lo + sub);
      for (i64 i = s_lo; i < s_hi; ++i) {
        const i64 u = cand_u[i];
        const bool u_sm = self_mirror[u] != 0;
        const i64 out_mult = u_sm ? m[u] : -m[u];
        if (out_mult <= 0) continue;
        const i64 v = cand_v[i];
        if ((v == mirror[u]) && !u_sm) {
          if (out_mult < 2) continue;
        } else if (m[v] <= 0) {
          continue;
        }
        out.push_back(i);
      }
    };
    if (nt > 1) {
      std::vector<std::thread> ts;
      for (i64 t = 0; t < nt; ++t) ts.emplace_back(filter, t);
      for (auto& th : ts) th.join();
    } else {
      filter(0);
    }
    // Exact sequential scan over the snapshot survivors, in order.
    for (i64 t = 0; t < nt; ++t) {
      for (const i64 i : surv[(size_t)t]) {
        const i64 u = cand_u[i];
        const i64 v = cand_v[i];
        const bool u_sm = self_mirror[u] != 0;
        const i64 mu = mirror[u];
        const bool is_mirror_edge = (v == mu) && !u_sm;
        const i64 out_mult = u_sm ? m[u] : -m[u];
        if (out_mult <= 0) continue;
        bool v_sm = false;
        if (is_mirror_edge) {
          if (out_mult < 2) continue;
        } else {
          v_sm = self_mirror[v] != 0;
          if (m[v] <= 0) continue;
        }
        accepted_out[n_acc++] = i;
        const i64 red = is_mirror_edge ? 2 : 1;
        if (u_sm) {
          m[u] -= 1;
        } else {
          m[u] += red;
          m[mu] -= red;
        }
        if (!is_mirror_edge) {
          m[v] -= 1;
          if (!v_sm) m[mirror[v]] += 1;
        }
      }
    }
  }
  return n_acc;
}

// Packed-key variant of the MT chunked-speculation accept scan: consumes
// the radix-sorted acceptance keys (d << 56 | u << 28 | v, uint64)
// directly — no unpacked cu/cv/cd columns ever materialize (the unpack
// pass alone moved 1.6GB at 51M candidates) — and writes the ACCEPTED
// triples straight into caller buffers of capacity `cap` (the caller
// bounds accepts by the total out-deficit).  Same multiplicity protocol
// and identical accepted set as greedy_accept_scan_mt (parity-tested).
// Returns accepts, or -2 if cap is exceeded (impossible under the
// deficit bound; defensive).
i64 greedy_accept_scan_packed_mt(i64 n_cands, const unsigned long long* keys,
                                 i64* m, const i64* mirror,
                                 const signed char* self_mirror, i64* u_out,
                                 i64* v_out, i64* d_out, i64 cap,
                                 i64 n_threads, i64 chunk_size) {
  using u64 = unsigned long long;
  constexpr u64 MASK28 = (1u << 28) - 1;
  if (chunk_size < 1) chunk_size = 1 << 19;
  const bool mt = n_threads >= 2 && n_cands >= chunk_size * 2;
  std::vector<std::vector<i64>> surv((size_t)(mt ? n_threads : 0));
  i64 n_acc = 0;
  for (i64 lo = 0; lo < n_cands; lo += chunk_size) {
    const i64 hi = mt ? std::min(n_cands, lo + chunk_size) : n_cands;
    const i64 span = hi - lo;
    const i64 nt =
        mt ? std::min<i64>(n_threads, std::max<i64>(1, span / 4096)) : 1;
    const i64 sub = (span + nt - 1) / nt;
    auto filter = [&](i64 t) {
      auto& out = surv[(size_t)t];
      out.clear();
      const i64 s_lo = lo + t * sub, s_hi = std::min(hi, s_lo + sub);
      for (i64 i = s_lo; i < s_hi; ++i) {
        const u64 k = keys[i];
        const i64 u = (i64)((k >> 28) & MASK28);
        const bool u_sm = self_mirror[u] != 0;
        const i64 out_mult = u_sm ? m[u] : -m[u];
        if (out_mult <= 0) continue;
        const i64 v = (i64)(k & MASK28);
        if ((v == mirror[u]) && !u_sm) {
          if (out_mult < 2) continue;
        } else if (m[v] <= 0) {
          continue;
        }
        out.push_back(i);
      }
    };
    if (mt && nt > 1) {
      std::vector<std::thread> ts;
      for (i64 t = 0; t < nt; ++t) ts.emplace_back(filter, t);
      for (auto& th : ts) th.join();
    }
    // Exact sequential scan (over snapshot survivors when MT, else all).
    auto scan_one = [&](i64 i) -> int {
      const u64 k = keys[i];
      const i64 u = (i64)((k >> 28) & MASK28);
      const i64 v = (i64)(k & MASK28);
      const bool u_sm = self_mirror[u] != 0;
      const i64 mu = mirror[u];
      const bool is_mirror_edge = (v == mu) && !u_sm;
      const i64 out_mult = u_sm ? m[u] : -m[u];
      if (out_mult <= 0) return 0;
      bool v_sm = false;
      if (is_mirror_edge) {
        if (out_mult < 2) return 0;
      } else {
        v_sm = self_mirror[v] != 0;
        if (m[v] <= 0) return 0;
      }
      if (n_acc >= cap) return -1;
      u_out[n_acc] = u;
      v_out[n_acc] = v;
      d_out[n_acc] = (i64)(k >> 56);
      ++n_acc;
      const i64 red = is_mirror_edge ? 2 : 1;
      if (u_sm) {
        m[u] -= 1;
      } else {
        m[u] += red;
        m[mu] -= red;
      }
      if (!is_mirror_edge) {
        m[v] -= 1;
        if (!v_sm) m[mirror[v]] += 1;
      }
      return 0;
    };
    if (mt && nt > 1) {
      for (i64 t = 0; t < nt; ++t)
        for (const i64 i : surv[(size_t)t])
          if (scan_one(i) < 0) return -2;
    } else {
      for (i64 i = lo; i < hi; ++i)
        if (scan_one(i) < 0) return -2;
    }
    if (!mt) break;
  }
  return n_acc;
}

// Spell walks from the 2-bit packed arena (4 bases/byte, little-endian
// within the byte; seq_off holds BASE offsets, sequences not byte-aligned).
// The walk speller of /root/reference/src/bin.rs:486-605 over flat arrays:
// first edge spelled fully, every following original edge minus a k-1
// overlap (k-1-w after a cheap dummy of weight w), reverse complement
// taken from the tail for backward edges.  walks: flat edge ids (int64);
// walk_offsets: per-walk end offsets.  out: byte-per-base codes (feeds the
// ascii encoder); caller sizes it as (k-1)*n_walks + sum of edge weights.
// Returns total bytes written, or -1 on error.
static inline unsigned char base2(const unsigned char* packed, i64 idx) {
  return (packed[idx >> 2] >> ((idx & 3) << 1)) & 3;
}

static i64 spell_walk_range(const i64* walks, const i64* walk_offsets,
                            i64 w_begin, i64 w_end_idx, i64 start_pos,
                            const i64* handle, const i64* weight,
                            const signed char* forward,
                            const signed char* dummy,
                            const unsigned char* packed, const i64* seq_off,
                            i64 k, unsigned char* out, i64* out_offsets) {
  i64 pos = start_pos;
  i64 w_start = w_begin == 0 ? 0 : walk_offsets[w_begin - 1];
  for (i64 w = w_begin; w < w_end_idx; ++w) {
    i64 w_end = walk_offsets[w];
    if (w_end <= w_start) return -1;
    i64 first = walks[w_start];
    if (dummy[first]) return -1;
    {
      i64 h = handle[first];
      i64 s = seq_off[h], e = seq_off[h + 1];
      if (forward[first]) {
        for (i64 i = s; i < e; ++i) out[pos++] = base2(packed, i);
      } else {
        for (i64 i = e - 1; i >= s; --i) out[pos++] = 3 - base2(packed, i);
      }
    }
    i64 prev = first;
    for (i64 t = w_start + 1; t < w_end; ++t) {
      i64 cur = walks[t];
      if (dummy[cur]) {
        prev = cur;
        continue;
      }
      i64 offset = dummy[prev] ? (k - 1 - weight[prev]) : (k - 1);
      if (offset < 0) return -1;
      i64 h = handle[cur];
      i64 s = seq_off[h], e = seq_off[h + 1];
      if (forward[cur]) {
        for (i64 i = s + offset; i < e; ++i) out[pos++] = base2(packed, i);
      } else {
        for (i64 i = e - 1 - offset; i >= s; --i)
          out[pos++] = 3 - base2(packed, i);
      }
      prev = cur;
    }
    out_offsets[w] = pos;
    w_start = w_end;
  }
  return pos;
}

i64 spell_walks_packed(const i64* walks, const i64* walk_offsets, i64 n_walks,
                       const i64* handle, const i64* weight,
                       const signed char* forward, const signed char* dummy,
                       const unsigned char* packed, const i64* seq_off, i64 k,
                       unsigned char* out, i64* out_offsets) {
  return spell_walk_range(walks, walk_offsets, 0, n_walks, 0, handle, weight,
                          forward, dummy, packed, seq_off, k, out,
                          out_offsets);
}

// Multithreaded speller: per-walk output start offsets are derivable in
// closed form ((k-1) + sum of edge weights per walk, computed by the
// caller into walk_out_start [n_walks]), so threads write disjoint
// regions of `out`.  Returns total bytes, or -1 if any range errored.
i64 spell_walks_packed_mt(const i64* walks, const i64* walk_offsets,
                          i64 n_walks, const i64* handle, const i64* weight,
                          const signed char* forward,
                          const signed char* dummy,
                          const unsigned char* packed, const i64* seq_off,
                          i64 k, unsigned char* out, i64* out_offsets,
                          const i64* walk_out_start, i64 n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  std::vector<i64> results(n_threads);
  for (i64 t = 0; t < n_threads; ++t) {
    i64 w_begin = n_walks * t / n_threads;
    i64 w_end = n_walks * (t + 1) / n_threads;
    threads.emplace_back([=, &results]() {
      results[t] = (w_begin < w_end)
                       ? spell_walk_range(walks, walk_offsets, w_begin, w_end,
                                          walk_out_start[w_begin], handle,
                                          weight, forward, dummy, packed,
                                          seq_off, k, out, out_offsets)
                       : 0;
    });
  }
  for (auto& th : threads) th.join();
  i64 total = 0;
  for (i64 t = 0; t < n_threads; ++t) {
    i64 w_begin = n_walks * t / n_threads;
    i64 w_end = n_walks * (t + 1) / n_threads;
    if (w_begin >= w_end) continue;
    if (results[t] < 0) return -1;
    total = results[t];  // last non-empty range ends at the total
  }
  return total;
}

}  // extern "C" — reopened below (templates are not allowed inside)

namespace {

// Shared Dial ball loop for the bounded multi-target Dijkstra engines:
// a bucket queue (distances bounded by max_weight) over ONE epoch-stamped
// dense array packing (epoch << DBITS) | dist per node — a single random
// load per relaxation probe where separate epoch/dist arrays cost two
// cache misses; the loop is memory-bound on exactly those probes.  O(1)
// relaxation, no hashing, no per-source reinitialization (the reference's
// EpochNodeWeightArray, traitgraph-algo, upgraded with the
// bounded-distance bucket queue).  ET = int (DBITS = 8) covers
// max_weight <= 254 — every supported k (<= 127) — at half the probe
// footprint of the ET = long long fallback for wider bounds.
// `emit(src, u, d)` is called once per settled node in ascending-distance
// order (bucket insertion order within a distance, matching the original
// serial formulation bit for bit); returning false aborts with -1.
template <typename ET, int DBITS, typename Emit>
i64 dial_range(i64 n_nodes, i64 deg_pad, const int* nbr, const int* nw,
               const i64* sources, i64 s_begin, i64 s_end, i64 max_weight,
               Emit&& emit) {
  constexpr ET DMASK = (ET(1) << DBITS) - 1;
  const i64 ep_max = ((i64)1 << (8 * (i64)sizeof(ET) - DBITS - 1)) - 1;
  std::vector<ET> ed(n_nodes, ET(-1));
  std::vector<std::vector<int>> buckets((size_t)max_weight + 1);
  i64 ep = 0;
  for (i64 s = s_begin; s < s_end; ++s) {
    const i64 src = sources[s];
    if (++ep >= ep_max) {  // epoch field exhausted: re-stamp
      std::fill(ed.begin(), ed.end(), ET(-1));
      ep = 1;
    }
    const ET ep_sh = (ET)ep << DBITS;
    ed[src] = ep_sh;
    buckets[0].push_back((int)src);
    for (i64 d = 0; d <= max_weight; ++d) {
      auto& bucket = buckets[d];
      const ET want = ep_sh | (ET)d;
      for (size_t bi = 0; bi < bucket.size(); ++bi) {
        const i64 u = bucket[bi];
        if (bi + 2 < bucket.size())
          __builtin_prefetch(nbr + (i64)bucket[bi + 2] * deg_pad);
        if (ed[u] != want) continue;  // stale entry
        if (!emit(src, u, d)) {
          for (auto& b : buckets) b.clear();
          return -1;
        }
        const int* row = nbr + u * deg_pad;
        const int* wrow = nw + u * deg_pad;
        for (i64 j = 0; j < deg_pad; ++j) {
          const i64 v = row[j];
          if (v == n_nodes) continue;
          const i64 nd = d + wrow[j];
          if (nd > max_weight) continue;
          const ET e = ed[v];
          if ((e >> DBITS) != (ET)ep || nd < (i64)(e & DMASK)) {
            ed[v] = ep_sh | (ET)nd;
            buckets[nd].push_back((int)v);
          }
        }
      }
      bucket.clear();
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Bounded multi-target Dijkstra over the padded adjacency, host fallback
// for capacity-overflow sources and the reference-design baseline
// (traitgraph-algo Dijkstra analog: binary heap + sparse distance map,
// /root/reference call sites greedytigs/mod.rs:324-341).
// Emits candidate triples (source, target, dist) for targets with
// in_mask set and 1 <= dist <= max_weight into the [seg_start, seg_end)
// region of the output buffers.  Returns triples written or -1 on
// segment overflow.
static i64 dijkstra_range(i64 n_nodes, i64 deg_pad, const int* nbr,
                          const int* nw, const i64* sources, i64 s_begin,
                          i64 s_end, i64 max_weight,
                          const signed char* in_mask, i64 seg_start,
                          i64 seg_cap, i64* out_src, i64* out_dst,
                          i64* out_dist) {
  i64 n_out = 0;
  auto emit = [&](i64 src, i64 u, i64 d) {
    if (u != src && in_mask[u]) {
      if (n_out >= seg_cap) return false;
      out_src[seg_start + n_out] = src;
      out_dst[seg_start + n_out] = u;
      out_dist[seg_start + n_out] = d;
      ++n_out;
    }
    return true;
  };
  const i64 rc =
      max_weight <= 254
          ? dial_range<int, 8>(n_nodes, deg_pad, nbr, nw, sources, s_begin,
                               s_end, max_weight, emit)
          : dial_range<long long, 32>(n_nodes, deg_pad, nbr, nw, sources,
                                      s_begin, s_end, max_weight, emit);
  return rc < 0 ? -1 : n_out;
}

i64 bounded_dijkstra_candidates(i64 n_nodes, i64 deg_pad, const int* nbr,
                                const int* nw, i64 n_sources,
                                const i64* sources, i64 max_weight,
                                const signed char* in_mask, i64 out_cap,
                                i64* out_src, i64* out_dst, i64* out_dist) {
  return dijkstra_range(n_nodes, deg_pad, nbr, nw, sources, 0, n_sources,
                        max_weight, in_mask, 0, out_cap, out_src, out_dst,
                        out_dist);
}

// Growable-buffer multithreaded variant: each thread collects its triples
// into thread-local vectors (no preallocation, no overflow/retry); the
// results are concatenated into one heap buffer returned via *out_ptr
// (layout [src..., dst..., dist...]), to be released with free_i64_buffer.
// Returns the triple count.
static void dijkstra_collect(i64 n_nodes, i64 deg_pad, const int* nbr,
                             const int* nw, const i64* sources, i64 s_begin,
                             i64 s_end, i64 max_weight,
                             const signed char* in_mask,
                             std::vector<i64>& v_src, std::vector<i64>& v_dst,
                             std::vector<i64>& v_dist) {
  auto emit = [&](i64 src, i64 u, i64 d) {
    if (u != src && in_mask[u]) {
      v_src.push_back(src);
      v_dst.push_back(u);
      v_dist.push_back(d);
    }
    return true;
  };
  if (max_weight <= 254)
    dial_range<int, 8>(n_nodes, deg_pad, nbr, nw, sources, s_begin, s_end,
                       max_weight, emit);
  else
    dial_range<long long, 32>(n_nodes, deg_pad, nbr, nw, sources, s_begin,
                              s_end, max_weight, emit);
}

i64 bounded_dijkstra_candidates_auto(i64 n_nodes, i64 deg_pad, const int* nbr,
                                     const int* nw, i64 n_sources,
                                     const i64* sources, i64 max_weight,
                                     const signed char* in_mask, i64 n_threads,
                                     i64** out_ptr) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::vector<i64>> srcs(n_threads), dsts(n_threads),
      dists(n_threads);
  std::vector<std::thread> threads;
  for (i64 t = 0; t < n_threads; ++t) {
    i64 s_begin = n_sources * t / n_threads;
    i64 s_end = n_sources * (t + 1) / n_threads;
    threads.emplace_back([=, &srcs, &dsts, &dists]() {
      dijkstra_collect(n_nodes, deg_pad, nbr, nw, sources, s_begin, s_end,
                       max_weight, in_mask, srcs[t], dsts[t], dists[t]);
    });
  }
  for (auto& th : threads) th.join();
  return concat_triples(srcs, dsts, dists, out_ptr);
}

// Releases buffers returned via the i64** out-params here and in
// extract.cpp (all malloc'd).
void free_i64_buffer(i64* ptr) { std::free(ptr); }

// Reference-design baseline Dijkstra: per-source std::priority_queue
// binary heap + std::unordered_map sparse distance map — the semantics of
// the reference's DEFAULT strategy pair (StdBinaryHeap +
// hashbrown::HashMap NodeWeightArray,
// /root/reference/src/implementation/mod.rs:62-103) rather than the
// framework's Dial-bucket/epoch-array production path.  Used ONLY by
// bench.py as the independent baseline; the framework never calls it.
static void reference_dijkstra_collect(
    i64 n_nodes, i64 deg_pad, const int* nbr, const int* nw,
    const i64* sources, i64 s_begin, i64 s_end, i64 max_weight,
    const signed char* in_mask, std::vector<i64>& v_src,
    std::vector<i64>& v_dst, std::vector<i64>& v_dist) {
  using QE = std::pair<int, int>;  // (dist, node), min-heap
  for (i64 s = s_begin; s < s_end; ++s) {
    i64 src = sources[s];
    std::unordered_map<int, int> dist;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    dist.emplace((int)src, 0);
    heap.emplace(0, (int)src);
    while (!heap.empty()) {
      auto [d, u] = heap.top();
      heap.pop();
      auto it = dist.find(u);
      if (it != dist.end() && d > it->second) continue;  // stale entry
      if (u != (int)src && in_mask[u]) {
        v_src.push_back(src);
        v_dst.push_back(u);
        v_dist.push_back(d);
      }
      const int* row = nbr + (i64)u * deg_pad;
      const int* wrow = nw + (i64)u * deg_pad;
      for (i64 j = 0; j < deg_pad; ++j) {
        i64 v = row[j];
        if (v == n_nodes) continue;
        int nd = d + wrow[j];
        if (nd > max_weight) continue;
        auto [vit, inserted] = dist.try_emplace((int)v, nd);
        if (!inserted) {
          if (nd >= vit->second) continue;
          vit->second = nd;
        }
        heap.emplace(nd, (int)v);
      }
    }
  }
}

i64 reference_dijkstra_candidates(i64 n_nodes, i64 deg_pad, const int* nbr,
                                  const int* nw, i64 n_sources,
                                  const i64* sources, i64 max_weight,
                                  const signed char* in_mask, i64 n_threads,
                                  i64** out_ptr) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::vector<i64>> srcs(n_threads), dsts(n_threads),
      dists(n_threads);
  std::vector<std::thread> threads;
  for (i64 t = 0; t < n_threads; ++t) {
    i64 s_begin = n_sources * t / n_threads;
    i64 s_end = n_sources * (t + 1) / n_threads;
    threads.emplace_back([=, &srcs, &dsts, &dists]() {
      reference_dijkstra_collect(n_nodes, deg_pad, nbr, nw, sources, s_begin,
                                 s_end, max_weight, in_mask, srcs[t], dsts[t],
                                 dists[t]);
    });
  }
  for (auto& th : threads) th.join();
  return concat_triples(srcs, dsts, dists, out_ptr);
}

// Multithreaded variant: sources split into n_threads contiguous chunks,
// each writing its own out-buffer segment of size out_cap / n_threads.
// seg_counts[t] receives the triples written by thread t (-1 on that
// thread's segment overflow).  Returns 0.
i64 bounded_dijkstra_candidates_mt(i64 n_nodes, i64 deg_pad, const int* nbr,
                                   const int* nw, i64 n_sources,
                                   const i64* sources, i64 max_weight,
                                   const signed char* in_mask, i64 out_cap,
                                   i64* out_src, i64* out_dst, i64* out_dist,
                                   i64 n_threads, i64* seg_counts) {
  if (n_threads < 1) n_threads = 1;
  i64 seg_cap = out_cap / n_threads;
  std::vector<std::thread> threads;
  for (i64 t = 0; t < n_threads; ++t) {
    i64 s_begin = n_sources * t / n_threads;
    i64 s_end = n_sources * (t + 1) / n_threads;
    i64 seg_start = seg_cap * t;
    threads.emplace_back([=]() {
      seg_counts[t] =
          dijkstra_range(n_nodes, deg_pad, nbr, nw, sources, s_begin, s_end,
                         max_weight, in_mask, seg_start, seg_cap, out_src,
                         out_dst, out_dist);
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}
}
