// Sparse exact maximum-weight matching (general graphs, blossoms).
//
// Purpose: optimal matchtigs must be *exact* on every candidate component
// (the reference runs Kolmogorov's blossom5 on the full instance,
// /root/reference/src/implementation/matchtigs/mod.rs:724-746).  The dense
// O(n^2)-memory primal-dual template (native/blossom.cpp) caps out around
// n=2000; satellite-tangle components reach 35k+ ids.  This solver is the
// classic Galil primal-dual blossom algorithm over adjacency lists --
// O(V*E) time, O(V+E) memory -- implemented from the textbook formulation
// (single tree growth per stage, integer duals via doubled weights, lazy
// best-edge slack tracking).  It is NOT derived from the reference (which
// contains no matching code) nor from blossom5.
//
// Semantics: maximum-weight matching, NOT maximum cardinality (a vertex
// stays unmatched when matching it does not increase total weight) --
// matching the dense solver and networkx's default, which the fuzz tests
// compare against.
//
// All weights must be >= 0.  Internally weights are doubled so vertex
// duals stay integral (blossom duals stay even).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

using i64 = long long;

class SparseBlossom {
 public:
  SparseBlossom(int n, i64 m, const i64* eu, const i64* ev, const i64* ew)
      : n_(n), m_(m), eu_(eu), ev_(ev), ew_(ew) {
    max_w_ = 0;
    for (i64 e = 0; e < m_; ++e)
      if (2 * ew_[e] > max_w_) max_w_ = 2 * ew_[e];
    endpoint_.resize(2 * m_);
    for (i64 p = 0; p < 2 * m_; ++p)
      endpoint_[p] = (p & 1) ? (int)ev_[p / 2] : (int)eu_[p / 2];
    nbr_.resize(n_);
    for (i64 e = 0; e < m_; ++e) {
      nbr_[eu_[e]].push_back(2 * (int)e + 1);  // points toward ev
      nbr_[ev_[e]].push_back(2 * (int)e);      // points toward eu
    }
    mate_.assign(n_, -1);
    label_.assign(2 * n_, 0);
    label_end_.assign(2 * n_, -1);
    in_blossom_.resize(n_);
    for (int v = 0; v < n_; ++v) in_blossom_[v] = v;
    parent_.assign(2 * n_, -1);
    base_.resize(2 * n_);
    for (int v = 0; v < n_; ++v) base_[v] = v;
    childs_.assign(2 * n_, {});
    endps_.assign(2 * n_, {});
    best_edge_.assign(2 * n_, -1);
    blossom_best_edges_.assign(2 * n_, {});
    for (int b = n_; b < 2 * n_; ++b) unused_.push_back(b);
    dual_.assign(2 * n_, 0);
    for (int v = 0; v < n_; ++v) dual_[v] = max_w_;
    allow_.assign(m_, 0);
  }

  // 2*w(e) so duals stay integral
  i64 w2(i64 e) const { return 2 * ew_[e]; }
  i64 slack(i64 e) const {
    return dual_[eu_[e]] + dual_[ev_[e]] - w2(e);
  }

  // leaves of the blossom tree under b
  void blossom_leaves(int b, std::vector<int>& out) const {
    if (b < n_) {
      out.push_back(b);
      return;
    }
    for (int t : childs_[b]) blossom_leaves(t, out);
  }

  void assign_label(int w, int t, int p) {
    int b = in_blossom_[w];
    label_[w] = label_[b] = t;
    label_end_[w] = label_end_[b] = p;
    best_edge_[w] = best_edge_[b] = -1;
    if (t == 1) {
      std::vector<int> leaves;
      blossom_leaves(b, leaves);
      for (int v : leaves) queue_.push_back(v);
    } else if (t == 2) {
      int bb = base_[b];
      assign_label(endpoint_[mate_[bb]], 1, mate_[bb] ^ 1);
    }
  }

  // Trace back from both ends of edge k to find a common ancestor (new
  // blossom) or an augmenting path.  Returns base vertex or -1.
  int scan_blossom(int v, int w) {
    std::vector<int> path;
    int base = -1;
    while (v != -1 || w != -1) {
      int b = in_blossom_[v];
      if (label_[b] & 4) {
        base = base_[b];
        break;
      }
      path.push_back(b);
      label_[b] |= 4;
      if (mate_[base_[b]] == -1) {
        v = -1;
      } else {
        v = endpoint_[mate_[base_[b]]];
        b = in_blossom_[v];
        v = endpoint_[label_end_[b]];
      }
      if (w != -1) std::swap(v, w);
    }
    for (int b : path) label_[b] &= ~4;
    return base;
  }

  void add_blossom(int base, i64 k) {
    int v = (int)eu_[k], w = (int)ev_[k];
    int bb = in_blossom_[base];
    int bv = in_blossom_[v];
    int bw = in_blossom_[w];
    int b = unused_.back();
    unused_.pop_back();
    base_[b] = base;
    parent_[b] = -1;
    parent_[bb] = b;
    auto& path = childs_[b];
    auto& endps = endps_[b];
    path.clear();
    endps.clear();
    // trace from v's side up to the base
    while (bv != bb) {
      parent_[bv] = b;
      path.push_back(bv);
      endps.push_back(label_end_[bv]);
      v = endpoint_[label_end_[bv]];
      bv = in_blossom_[v];
    }
    path.push_back(bb);
    std::reverse(path.begin(), path.end());
    std::reverse(endps.begin(), endps.end());
    endps.push_back(2 * (int)k);
    // trace from w's side
    while (bw != bb) {
      parent_[bw] = b;
      path.push_back(bw);
      endps.push_back(label_end_[bw] ^ 1);
      w = endpoint_[label_end_[bw]];
      bw = in_blossom_[w];
    }
    label_[b] = 1;
    label_end_[b] = label_end_[bb];
    dual_[b] = 0;
    std::vector<int> leaves;
    blossom_leaves(b, leaves);
    for (int leaf : leaves) {
      if (label_[in_blossom_[leaf]] == 2) queue_.push_back(leaf);
      in_blossom_[leaf] = b;
    }
    // compute best edges to other S-blossoms
    std::vector<i64> best_to(2 * n_, -1);
    for (int child : path) {
      std::vector<std::vector<int>> nblists;
      if (blossom_best_edges_[child].empty()) {
        std::vector<int> cl;
        blossom_leaves(child, cl);
        nblists.emplace_back();
        for (int lv : cl)
          for (int p : nbr_[lv]) nblists.back().push_back(p / 2);
      } else {
        nblists.emplace_back(blossom_best_edges_[child]);
      }
      for (auto& nblist : nblists) {
        for (int e : nblist) {
          int i = (int)eu_[e], j = (int)ev_[e];
          if (in_blossom_[j] == b) std::swap(i, j);
          int bj = in_blossom_[j];
          if (bj != b && label_[bj] == 1 &&
              (best_to[bj] == -1 || slack(e) < slack(best_to[bj])))
            best_to[bj] = e;
        }
      }
      blossom_best_edges_[child].clear();
      best_edge_[child] = -1;
    }
    auto& bbe = blossom_best_edges_[b];
    bbe.clear();
    for (int j = 0; j < 2 * n_; ++j)
      if (best_to[j] != -1) bbe.push_back((int)best_to[j]);
    best_edge_[b] = -1;
    for (int e : bbe)
      if (best_edge_[b] == -1 || slack(e) < slack(best_edge_[b]))
        best_edge_[b] = e;
  }

  void expand_blossom(int b, bool endstage) {
    for (int child : childs_[b]) {
      parent_[child] = -1;
      if (child < n_) {
        in_blossom_[child] = child;
      } else if (endstage && dual_[child] == 0) {
        expand_blossom(child, endstage);
      } else {
        std::vector<int> leaves;
        blossom_leaves(child, leaves);
        for (int v : leaves) in_blossom_[v] = child;
      }
    }
    if (!endstage && label_[b] == 2) {
      // The T-blossom is being expanded mid-stage: relabel the even-length
      // alternating path from the label-entry child to the base, mark its
      // edges allowed, and T-label any other child reached from outside.
      auto& path = childs_[b];
      auto& endps = endps_[b];
      int nchild = (int)path.size();
      int entry_child = in_blossom_[endpoint_[label_end_[b] ^ 1]];
      int j = 0;
      for (; j < nchild; ++j)
        if (path[j] == entry_child) break;
      int jstep, endptrick;
      if (j & 1) {
        jstep = 1;
        endptrick = 0;
      } else {
        jstep = -1;
        endptrick = 1;
      }
      auto step = [&](int x) { return (x + jstep + nchild) % nchild; };
      auto ep = [&](int x) {  // endps[x - endptrick] with python-style wrap
        return endps[(x - endptrick + nchild) % nchild];
      };
      int p = label_end_[b];
      while (j != 0) {
        label_[endpoint_[p ^ 1]] = 0;
        label_[endpoint_[ep(j) ^ endptrick ^ 1]] = 0;
        assign_label(endpoint_[p ^ 1], 2, p);
        allow_[ep(j) / 2] = 1;
        j = step(j);
        p = ep(j) ^ endptrick;
        allow_[p / 2] = 1;
        j = step(j);
      }
      // base child keeps the T label without stepping to its mate
      int bv = path[0];
      label_[endpoint_[p ^ 1]] = label_[bv] = 2;
      label_end_[endpoint_[p ^ 1]] = label_end_[bv] = p;
      best_edge_[bv] = -1;
      // the remaining children: S-labelled ones stay; ones reached from
      // outside get a T label, others stay unlabeled
      j = step(j);
      while (path[j] != entry_child) {
        int bw = path[j];
        if (label_[bw] == 1) {
          j = step(j);
          continue;
        }
        std::vector<int> leaves;
        blossom_leaves(bw, leaves);
        int vv = -1;
        for (int lv : leaves)
          if (label_[lv] != 0) {
            vv = lv;
            break;
          }
        if (vv != -1) {
          label_[vv] = 0;
          label_[endpoint_[mate_[base_[bw]]]] = 0;
          assign_label(vv, 2, label_end_[vv]);
        }
        j = step(j);
      }
    }
    label_[b] = 0;
    label_end_[b] = -1;
    childs_[b].clear();
    endps_[b].clear();
    base_[b] = -1;
    blossom_best_edges_[b].clear();
    best_edge_[b] = -1;
    unused_.push_back(b);
  }

  // Swap matched/unmatched edges along the alternating path inside
  // blossom b from vertex v to the blossom base.
  void augment_blossom(int b, int v) {
    int t = v;
    while (parent_[t] != b) t = parent_[t];
    if (t >= n_) augment_blossom(t, v);
    auto& path = childs_[b];
    auto& endps = endps_[b];
    int nchild = (int)path.size();
    int i = 0;
    for (; i < nchild; ++i)
      if (path[i] == t) break;
    int j = i, jstep, endptrick;
    if (i & 1) {
      jstep = 1;
      endptrick = 0;
    } else {
      jstep = -1;
      endptrick = 1;
    }
    while (j != 0) {
      j = (j + jstep + nchild) % nchild;
      int tt = path[j];
      int p = endps[(j - endptrick + nchild) % nchild] ^ endptrick;
      if (tt >= n_) augment_blossom(tt, endpoint_[p]);
      j = (j + jstep + nchild) % nchild;
      tt = path[j];
      if (tt >= n_) augment_blossom(tt, endpoint_[p ^ 1]);
      mate_[endpoint_[p]] = p ^ 1;
      mate_[endpoint_[p ^ 1]] = p;
    }
    // rotate childs so t becomes the base
    std::vector<int> new_path(path.begin() + i, path.end());
    new_path.insert(new_path.end(), path.begin(), path.begin() + i);
    std::vector<int> new_endps(endps.begin() + i, endps.end());
    new_endps.insert(new_endps.end(), endps.begin(), endps.begin() + i);
    path.swap(new_path);
    endps.swap(new_endps);
    base_[b] = base_[path[0]];
  }

  void augment_matching(i64 k) {
    int v = (int)eu_[k], w = (int)ev_[k];
    for (int side = 0; side < 2; ++side) {
      int s = side == 0 ? v : w;
      int p = side == 0 ? 2 * (int)k + 1 : 2 * (int)k;
      for (;;) {
        int bs = in_blossom_[s];
        if (bs >= n_) augment_blossom(bs, s);
        mate_[s] = p;
        if (label_end_[bs] == -1) break;  // reached a free vertex
        int t = endpoint_[label_end_[bs]];
        int bt = in_blossom_[t];  // T-blossom one step back
        int s_next = endpoint_[label_end_[bt]];
        int j = endpoint_[label_end_[bt] ^ 1];  // vertex inside bt
        if (bt >= n_) augment_blossom(bt, j);
        mate_[j] = label_end_[bt];
        p = label_end_[bt] ^ 1;
        s = s_next;
      }
    }
  }

  void solve() {
    for (int stage = 0; stage < n_; ++stage) {
      std::fill(label_.begin(), label_.end(), 0);
      std::fill(best_edge_.begin(), best_edge_.end(), -1);
      for (int b = n_; b < 2 * n_; ++b) blossom_best_edges_[b].clear();
      std::fill(allow_.begin(), allow_.end(), 0);
      queue_.clear();
      for (int v = 0; v < n_; ++v)
        if (mate_[v] == -1 && label_[in_blossom_[v]] == 0)
          assign_label(v, 1, -1);
      bool augmented = false;
      for (;;) {
        while (!queue_.empty() && !augmented) {
          int v = queue_.back();
          queue_.pop_back();
          for (int p : nbr_[v]) {
            i64 k = p / 2;
            int w = endpoint_[p];
            if (in_blossom_[v] == in_blossom_[w]) continue;
            if (!allow_[k]) {
              i64 s = slack(k);
              if (s <= 0) allow_[k] = 1;
            }
            if (allow_[k]) {
              int bw = in_blossom_[w];
              if (label_[bw] == 0) {
                assign_label(w, 2, p ^ 1);
              } else if (label_[bw] == 1) {
                int base = scan_blossom(v, w);
                if (base >= 0) {
                  add_blossom(base, k);
                } else {
                  augment_matching(k);
                  augmented = true;
                  break;
                }
              } else if (label_[w] == 0) {
                label_[w] = 2;
                label_end_[w] = p ^ 1;
              }
            } else {
              int bw = in_blossom_[w];
              if (label_[bw] == 1) {
                int bv = in_blossom_[v];
                if (best_edge_[bv] == -1 || slack(k) < slack(best_edge_[bv]))
                  best_edge_[bv] = (int)k;
              } else if (label_[w] == 0) {
                if (best_edge_[w] == -1 || slack(k) < slack(best_edge_[w]))
                  best_edge_[w] = (int)k;
              }
            }
          }
          if (augmented) break;
        }
        if (augmented) break;

        // dual adjustment
        int delta_type = -1;
        i64 delta = 0;
        int delta_edge = -1, delta_blossom = -1;
        // type 1: minimum vertex dual (maximum-weight, not max-cardinality)
        for (int v = 0; v < n_; ++v)
          if (delta_type == -1 || dual_[v] < delta) {
            delta = dual_[v];
            delta_type = 1;
          }
        // type 2: free vertex/blossom to S-vertex edge
        for (int v = 0; v < n_; ++v)
          if (label_[in_blossom_[v]] == 0 && best_edge_[v] != -1) {
            i64 d = slack(best_edge_[v]);
            if (delta_type == -1 || d < delta) {
              delta = d;
              delta_type = 2;
              delta_edge = best_edge_[v];
            }
          }
        // type 3: S-to-S edge (half slack)
        for (int b = 0; b < 2 * n_; ++b)
          if (parent_[b] == -1 && label_[b] == 1 && best_edge_[b] != -1) {
            i64 d = slack(best_edge_[b]) / 2;
            if (delta_type == -1 || d < delta) {
              delta = d;
              delta_type = 3;
              delta_edge = best_edge_[b];
            }
          }
        // type 4: T-blossom dual
        for (int b = n_; b < 2 * n_; ++b)
          if (base_[b] >= 0 && parent_[b] == -1 && label_[b] == 2 &&
              (delta_type == -1 || dual_[b] < delta)) {
            delta = dual_[b];
            delta_type = 4;
            delta_blossom = b;
          }
        if (delta_type == -1) {
          delta_type = 1;
          delta = 0;
          for (int v = 0; v < n_; ++v)
            if (dual_[v] < delta) delta = dual_[v];
          if (delta < 0) delta = 0;
        }
        // apply
        for (int v = 0; v < n_; ++v) {
          int lbl = label_[in_blossom_[v]];
          if (lbl == 1)
            dual_[v] -= delta;
          else if (lbl == 2)
            dual_[v] += delta;
        }
        for (int b = n_; b < 2 * n_; ++b)
          if (base_[b] >= 0 && parent_[b] == -1) {
            if (label_[b] == 1)
              dual_[b] += delta;
            else if (label_[b] == 2)
              dual_[b] -= delta;
          }
        if (delta_type == 1) break;  // optimum reached
        if (delta_type == 2) {
          allow_[delta_edge] = 1;
          int i = (int)eu_[delta_edge];
          if (label_[in_blossom_[i]] == 0) i = (int)ev_[delta_edge];
          queue_.push_back(i);
        } else if (delta_type == 3) {
          allow_[delta_edge] = 1;
          queue_.push_back((int)eu_[delta_edge]);
        } else if (delta_type == 4) {
          expand_blossom(delta_blossom, false);
        }
      }
      if (!augmented) break;
      // end of stage: expand blossoms with zero dual
      for (int b = n_; b < 2 * n_; ++b)
        if (base_[b] >= 0 && parent_[b] == -1 && label_[b] == 1 &&
            dual_[b] == 0)
          expand_blossom(b, true);
    }
  }

  i64 extract(int* mate_out) const {
    i64 total = 0;
    for (int v = 0; v < n_; ++v) {
      if (mate_[v] >= 0) {
        int w = endpoint_[mate_[v]];
        mate_out[v] = w;
        if (v < w) total += ew_[mate_[v] / 2];
      } else {
        mate_out[v] = -1;
      }
    }
    return total;
  }

 private:
  int n_;
  i64 m_;
  const i64* eu_;
  const i64* ev_;
  const i64* ew_;
  i64 max_w_;
  std::vector<int> endpoint_;
  std::vector<std::vector<int>> nbr_;
  std::vector<int> mate_;
  std::vector<int> label_;
  std::vector<int> label_end_;
  std::vector<int> in_blossom_;
  std::vector<int> parent_;
  std::vector<int> base_;
  std::vector<std::vector<int>> childs_;
  std::vector<std::vector<int>> endps_;
  std::vector<int> best_edge_;
  std::vector<std::vector<int>> blossom_best_edges_;
  std::vector<int> unused_;
  std::vector<i64> dual_;
  std::vector<char> allow_;
  std::vector<int> queue_;
};

}  // namespace

extern "C" {

// Maximum-weight matching on a sparse general graph.
// n vertices; m edges (eu, ev, ew int64 arrays, ew >= 0).
// mate_out: int32 [n], partner or -1.  Returns total matched weight.
long long mwm_sparse(long long n, long long m, const long long* eu,
                     const long long* ev, const long long* ew,
                     int* mate_out) {
  SparseBlossom sb((int)n, m, eu, ev, ew);
  sb.solve();
  return sb.extract(mate_out);
}
}
