// Sparse exact maximum-weight matching (general graphs, blossoms).
//
// Purpose: optimal matchtigs must be *exact* on every candidate component
// (the reference runs Kolmogorov's blossom5 on the full instance,
// /root/reference/src/implementation/matchtigs/mod.rs:724-746).  The dense
// O(n^2)-memory primal-dual template (native/blossom.cpp) caps out around
// n=2000; satellite-tangle components reach 35k+ ids.  This solver is the
// Galil primal-dual blossom algorithm over adjacency lists -- O(V+E)
// memory, integer duals via doubled weights -- restructured as a
// MULTI-TREE single phase: every free vertex roots an alternating tree,
// all trees grow under one uniform dual delta, and an augmentation kills
// exactly the two trees it touches (tree_alive_/tree_of_ epochs) while
// the rest keep growing.  The canonical one-augmentation-per-stage
// formulation re-scans every free root after every augmentation, which is
// quadratic on big sparse instances (71M queue pops at n=30k).
//
// Multi-tree correctness notes (hard-won by fuzzing tie-heavy instances
// against the dense solver + networkx, and by the CHECKTREES structure
// validator):
//  * Tightness is tested directly (slack(e) <= 0), never cached: a
//    formerly tight edge's S endpoint can die and relabel T, raising the
//    slack again.
//  * Interior T-marks (a vertex inside a T-blossom reached from outside)
//    must record the SCANNER's tree, and mid-stage expansion must attach
//    the marked leaf to that tree: the mark's label_end points at the
//    scanning S-vertex, so attaching to the blossom's own tree would let
//    (mate, label_end) chains cross trees and break scan_blossom's
//    common-ancestor detection (same-tree "augmentations" that corrupt
//    the matching).
//  * Dual-adjustment candidates (delta2/delta3) come from a lazy event
//    heap keyed by projected tightness time (cumulative delta at which
//    the edge would become tight if its endpoint classes never changed).
//    Class changes can only RAISE an event's true key (a dead S side
//    freezes its dual while live S duals keep falling), and
//    rate-increasing transitions (a vertex becoming S) push fresh exact
//    events from that vertex's scan -- so a popped event revalidates
//    against the current classification and either wins, gets re-pushed
//    with its corrected key, or is discarded.  Cached best-edge hints
//    (the van Rantwijk scheme) are NOT sound across augmentations:
//    re-adopted vertices' frozen duals silently invalidate cached
//    argmins without invalidating the cache key.
//
// It is NOT derived from the reference (which contains no matching code)
// nor from blossom5.
//
// Semantics: maximum-weight matching, NOT maximum cardinality (a vertex
// stays unmatched when matching it does not increase total weight) --
// matching the dense solver and networkx's default, which the fuzz tests
// compare against.
//
// All weights must be >= 0.  Internally weights are doubled so vertex
// duals stay integral (blossom duals stay even).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <memory>
#include <queue>
#include <thread>
#include <utility>
#include <vector>

namespace {

using i64 = long long;

class SparseBlossom {
 public:
  // w_scale: internal weight multiplier (>= 2, even).  The default 2
  // makes vertex duals integral (the classical doubling).  Warm-started
  // pricing rounds pass the PREVIOUS round's scale times 2 and double
  // the incoming duals with it: all duals are then EVEN at entry -- the
  // same uniform-parity state a cold start has -- which keeps S-S edge
  // slacks even where it matters (the forced delta3 edge could otherwise
  // augment across a slack-1 cross-tree edge and leave a matched edge
  // off tight; see solve_priced's audit fallback).
  SparseBlossom(int n, i64 m, const i64* eu, const i64* ev, const i64* ew,
                i64 w_scale = 2)
      : n_(n), m_(m), eu_(eu), ev_(ev), ew_(ew), scale_(w_scale) {
    max_w_ = 0;
    for (i64 e = 0; e < m_; ++e)
      if (scale_ * ew_[e] > max_w_) max_w_ = scale_ * ew_[e];
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
    for (int b = n_; b < 2 * n_; ++b) unused_.push_back(b);
    dual_.assign(2 * n_, 0);
    // Feasibility needs dual_u + dual_v >= w2(e), i.e. dual >= max_w_/2
    // (max_w_ is the doubled max weight, so this is integral).  Starting
    // higher only costs extra dual travel per free vertex AND leaves no
    // edge tight for the greedy warm start.
    for (int v = 0; v < n_; ++v) dual_[v] = max_w_ / 2;
    stamp_.assign(2 * n_, 0);
    bevent_stamp_.assign(2 * n_, kInfEvent);
    tree_of_.assign(2 * n_, -1);
    tree_alive_.assign(n_, 1);
    event_stamp_.assign(m_, kInfEvent);
    cur_root_ = -1;
  }

  // ---- Lazy duals -------------------------------------------------------
  // A dual adjustment is O(1): only delta_total_ advances.  Each slot
  // stores the dual value materialized at stamp_[x]; the true dual drifts
  // from it at a rate fixed by the slot's CURRENT classification
  // (vertex: S -1 / T +1, top-level blossom: S +1 / T -1).  Because
  // delta_total_ only changes in the adjust step, structural operations
  // (labeling, blossom add/expand, tree death) keep true duals constant;
  // they just must materialize a slot BEFORE changing its classification
  // so the drift accrued under the old class is banked.  Every structural
  // op already touches exactly the slots whose class it changes, so
  // materialize-on-entry adds no asymptotic cost -- while the old eager
  // scheme's per-adjust O(n) dual sweep (plus the delta4 full-blossom
  // scan) dominated large solves (18k adjusts x 105k slots on the
  // bench-scale giant tangle).
  i64 true_dual_v(int v) const {
    int l = get_label(in_blossom_[v]);
    i64 dt = delta_total_ - stamp_[v];
    return dual_[v] + (l == 1 ? -dt : l == 2 ? dt : 0);
  }
  i64 true_dual_b(int b) const {
    if (base_[b] < 0 || parent_[b] != -1) return dual_[b];
    int l = get_label(b);
    i64 dt = delta_total_ - stamp_[b];
    return dual_[b] + (l == 1 ? dt : l == 2 ? -dt : 0);
  }
  void mat_v(int v) {
    dual_[v] = true_dual_v(v);
    stamp_[v] = delta_total_;
  }
  void mat_b(int b) {
    dual_[b] = true_dual_b(b);
    stamp_[b] = delta_total_;
  }
  // Bank the drift for a top-level slot and every vertex under it.
  void mat_top(int b) {
    if (b >= n_) mat_b(b);
    leaves_scratch2_.clear();
    blossom_leaves(b, leaves_scratch2_);
    for (int v : leaves_scratch2_) mat_v(v);
  }

  int get_label(int b) const {
    int l = label_[b];
    if (l == 0) return 0;
    return tree_alive_[tree_of_[b]] ? l : 0;
  }
  void set_label_tree(int b, int t) {
    // bank the drift accrued under the old classification first
    if (b >= n_)
      mat_b(b);
    else
      mat_v(b);
    label_[b] = t;
    tree_of_[b] = cur_root_;
    // every blossom T-labeling funnels through here: arm its delta4
    // (dual-hits-zero) expansion event
    if (t == 2 && b >= n_ && parent_[b] == -1 && base_[b] >= 0)
      push_bevent_key(b, delta_total_ + dual_[b]);
  }

  // scale_*w(e) so duals stay integral (scale_ = 2 cold; doubled per
  // warm pricing round, see constructor)
  i64 w2(i64 e) const { return scale_ * ew_[e]; }
  i64 slack(i64 e) const {
    return true_dual_v((int)eu_[e]) + true_dual_v((int)ev_[e]) - w2(e);
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
    mat_top(b);  // all leaves change dual rate with the blossom's label
    set_label_tree(w, t);
    set_label_tree(b, t);
    members_[cur_root_].push_back(w);
    label_end_[w] = label_end_[b] = p;
    if (t == 1) {
      std::vector<int> leaves;
      blossom_leaves(b, leaves);
      for (int v : leaves) queue_.push_back(v);
      // warm mode: every S-vertex dual drifts toward 0 independently
      // (free-root duals are NOT uniform), so each arms a zero event
      if (warm_)
        for (int v : leaves) push_vevent(v);
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
    long long steps = 0;
    while (v != -1 || w != -1) {
      if (++steps > 4 * (long long)n_ + 16) {
        std::fprintf(stderr, "blossom_sparse: scan_blossom cycle\n");
        std::abort();
      }
      int b = in_blossom_[v];
      if (get_label(b) & 4) {
        base = base_[b];
        break;
      }
      path.push_back(b);
      label_[b] |= 4;  // breadcrumb only; tree_of_ untouched
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
    // bank every slot whose classification this absorbs: the path's top
    // blossoms freeze (lose top-level status) and former T-leaves turn S
    {
      int x = bv;
      long long g2 = 0;
      while (x != bb && ++g2 <= 4 * (long long)n_ + 16) {
        mat_top(x);
        x = in_blossom_[endpoint_[label_end_[x]]];
      }
      x = bw;
      g2 = 0;
      while (x != bb && ++g2 <= 4 * (long long)n_ + 16) {
        mat_top(x);
        x = in_blossom_[endpoint_[label_end_[x]]];
      }
      mat_top(bb);
    }
    base_[b] = base;
    parent_[b] = -1;
    parent_[bb] = b;
    auto& path = childs_[b];
    auto& endps = endps_[b];
    path.clear();
    endps.clear();
    long long guard = 0;
    // trace from v's side up to the base
    while (bv != bb) {
      if (++guard > 4 * (long long)n_ + 16) {
        std::fprintf(stderr, "blossom_sparse: add_blossom cycle (v side)\n");
        std::abort();
      }
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
    guard = 0;
    // trace from w's side
    while (bw != bb) {
      if (++guard > 4 * (long long)n_ + 16) {
        std::fprintf(stderr, "blossom_sparse: add_blossom cycle (w side)\n");
        std::abort();
      }
      parent_[bw] = b;
      path.push_back(bw);
      endps.push_back(label_end_[bw] ^ 1);
      w = endpoint_[label_end_[bw]];
      bw = in_blossom_[w];
    }
    set_label_tree(b, 1);
    label_end_[b] = label_end_[bb];
    dual_[b] = 0;
    stamp_[b] = delta_total_;
    std::vector<int> leaves;
    blossom_leaves(b, leaves);
    for (int leaf : leaves) {
      // former T-leaves turn S with the new blossom: requeue so their
      // edges are scanned (and their delta events pushed) as S edges.
      if (get_label(in_blossom_[leaf]) == 2) {
        queue_.push_back(leaf);
        if (warm_) push_vevent(leaf);  // rate flips +1 -> -1: new zero key
      }
      in_blossom_[leaf] = b;
    }
  }

  void expand_blossom(int b, bool endstage) {
    std::vector<int> all_leaves;
    if (!endstage) blossom_leaves(b, all_leaves);
    // bank the whole subtree before any relabeling: children become
    // top-level, leaves change rate with the new labels.  delta_total_
    // is constant inside structural ops, so once stamped here every
    // intermediate label flip below reads consistent duals.
    if (!endstage) {
      mat_b(b);
      for (int child : childs_[b]) {
        if (child >= n_) mat_b(child);
      }
      for (int v : all_leaves) mat_v(v);
    }
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
    if (!endstage && get_label(b) == 2) {
      cur_root_ = tree_of_[b];
      // The T-blossom is being expanded mid-stage: relabel the even-length
      // alternating path from the label-entry child to the base, and
      // T-label any other child reached from outside.
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
        j = step(j);
        p = ep(j) ^ endptrick;
        j = step(j);
      }
      // base child keeps the T label without stepping to its mate.
      // Record membership (set_label_tree bypasses assign_label): the
      // death-repush enumerates a dead tree's slots via members_, and a
      // missed slot means its freed leaves' tight edges never rescan.
      int bv = path[0];
      set_label_tree(endpoint_[p ^ 1], 2);
      set_label_tree(bv, 2);
      members_[cur_root_].push_back(endpoint_[p ^ 1]);
      label_end_[endpoint_[p ^ 1]] = label_end_[bv] = p;
      // the remaining children: S-labelled ones stay; ones reached from
      // outside get a T label, others stay unlabeled
      j = step(j);
      while (path[j] != entry_child) {
        int bw = path[j];
        if (get_label(bw) == 1) {
          j = step(j);
          continue;
        }
        std::vector<int> leaves;
        blossom_leaves(bw, leaves);
        int vv = -1;
        for (int lv : leaves)
          if (get_label(lv) != 0) {
            vv = lv;
            break;
          }
        if (vv != -1) {
          label_[vv] = 0;
          label_[endpoint_[mate_[base_[bw]]]] = 0;
          // Attach to the tree that reached vv from outside (recorded in
          // the interior mark), not to the expanding blossom's tree.
          cur_root_ = tree_of_[vv];
          assign_label(vv, 2, label_end_[vv]);
          cur_root_ = tree_of_[b];
        }
        j = step(j);
      }
    }
    if (!endstage) {
      // Former internal edges become cross edges between the children,
      // and edges from outside S-vertices to now-unlabeled children
      // switch from rate-0 (S-T, not delta-relevant) to rate-1
      // (S-unlabeled) without any scan: refresh delta events for every
      // leaf's incident edges under the new top labels.
      for (int lv : all_leaves)
        for (int p : nbr_[lv]) push_event(p / 2);
    }
    label_[b] = 0;
    label_end_[b] = -1;
    childs_[b].clear();
    endps_[b].clear();
    base_[b] = -1;
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

  // Bank the dual drift of every top-level slot of tree r (call BEFORE
  // tree_alive_[r] = 0: banking reads the old classifications).
  void bank_tree(int r) {
    tops_scratch_.clear();
    for (int x : members_[r]) tops_scratch_.push_back(in_blossom_[x]);
    std::sort(tops_scratch_.begin(), tops_scratch_.end());
    tops_scratch_.erase(
        std::unique(tops_scratch_.begin(), tops_scratch_.end()),
        tops_scratch_.end());
    for (int top : tops_scratch_) {
      if (top >= n_ && base_[top] < 0) continue;
      mat_top(top);
    }
  }

  // After tree r died: freed vertices may sit on tight edges from live S
  // vertices that will never rescan on their own; requeue those S
  // vertices (their rescan also refreshes delta events toward the freed
  // vertices).  members_ records one labeled entry vertex per top-level
  // slot, so dedup tops and cover every leaf.  Clears members_[r].
  void repush_tree(int r) {
    tops_scratch_.clear();
    for (int x : members_[r]) tops_scratch_.push_back(in_blossom_[x]);
    std::sort(tops_scratch_.begin(), tops_scratch_.end());
    tops_scratch_.erase(
        std::unique(tops_scratch_.begin(), tops_scratch_.end()),
        tops_scratch_.end());
    leaves_scratch_.clear();
    for (int top : tops_scratch_) {
      if (base_[top] < 0) continue;  // expanded since
      blossom_leaves(top, leaves_scratch_);
    }
    for (int x : leaves_scratch_)
      for (int q : nbr_[x]) {
        int o = endpoint_[q];
        if (get_label(in_blossom_[o]) != 1) continue;
        // Requeue the S vertex only when the edge to the freed vertex
        // is actionable NOW (tight => it can adopt x); otherwise the
        // edge merely switched delta-rate (S-T -> S-unlabeled), which
        // needs a delta event, not a full neighborhood rescan.
        if (slack(q / 2) <= 0)
          queue_.push_back(o);
        else
          push_event(q / 2);
      }
    members_[r].clear();
  }

  // Deficiency augmentation (warm-start mode): an S-vertex whose dual
  // reached 0 prefers exposure (complementary slackness allows an
  // unmatched vertex exactly when y = 0).  Flip the even alternating
  // path from v up to its tree root: v becomes exposed at dual 0, the
  // root becomes matched; every flipped edge is tight, so the matching
  // weight increases by the root's dual.  Same traversal as one side of
  // augment_matching, except the starting vertex gets NO mate.
  void deficiency_augment(int v) {
    int s = v;
    int p = -1;
    long long guard = 0;
    for (;;) {
      if (++guard > 4 * (long long)n_ + 16) {
        std::fprintf(stderr, "blossom_sparse: deficiency cycle\n");
        std::abort();
      }
      int bs = in_blossom_[s];
      if (bs >= n_) augment_blossom(bs, s);
      mate_[s] = p;
      if (label_end_[bs] == -1) break;  // reached the tree root
      int t = endpoint_[label_end_[bs]];
      int bt = in_blossom_[t];
      int s_next = endpoint_[label_end_[bt]];
      int j = endpoint_[label_end_[bt] ^ 1];
      if (bt >= n_) augment_blossom(bt, j);
      mate_[j] = label_end_[bt];
      p = label_end_[bt] ^ 1;
      s = s_next;
    }
    // v is exposed and (after its tree dies) unlabeled: a later
    // augmentation INTO v walks v's side checking label_end_ of its
    // top slot, which must say "free end" (v is the base after the
    // rotation above).
    label_end_[v] = -1;
    label_end_[in_blossom_[v]] = -1;
  }

  void augment_matching(i64 k) {
    int v = (int)eu_[k], w = (int)ev_[k];
    for (int side = 0; side < 2; ++side) {
      int s = side == 0 ? v : w;
      int p = side == 0 ? 2 * (int)k + 1 : 2 * (int)k;
      long long guard = 0;
      for (;;) {
        if (++guard > 4 * (long long)n_ + 16) {
          std::fprintf(stderr, "blossom_sparse: augment cycle\n");
          std::abort();
        }
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

  // ---- Lazy delta-event heap -------------------------------------------
  // Events are (projected_tight_delta, edge): the cumulative DELTA_ at
  // which the edge becomes tight assuming its endpoint classes never
  // change.  Classes can only slow an edge down (raising the true key);
  // rate-increasing changes (an endpoint becoming S) push fresh events
  // from that endpoint's scan.  Pops revalidate lazily.
  //
  // Dedup: event_stamp_[e] tracks the lowest key currently in the heap
  // for e (kInfEvent when none); pushes at or above it are dropped -- the
  // stamped entry pops first and revalidates, so nothing is missed, and
  // rate-increasing changes (which LOWER the key) always get through.
  // Without this, rescans re-push every non-tight edge each time and the
  // heap grew to ~1e9 entries (18 GB) on the bench-scale tangles.
  static constexpr i64 kInfEvent = (i64)1 << 62;
  // Warm mode: (projected dual-zero delta_total_, S-vertex) events — the
  // per-vertex delta1.  Same lazy stamp/revalidate protocol as the edge
  // heap.
  void push_vevent_key(int v, i64 key) {
    if (key >= vevent_stamp_[v]) return;
    vevent_stamp_[v] = key;
    vevents_.push({key, v});
  }
  void push_vevent(int v) { push_vevent_key(v, delta_total_ + true_dual_v(v)); }
  void push_event_key(i64 e, i64 key) {
    if (key >= event_stamp_[e]) return;
    event_stamp_[e] = key;
    events_.push({key, e});
  }
  void push_bevent_key(i64 b, i64 key) {
    if (key >= bevent_stamp_[b]) return;
    bevent_stamp_[b] = key;
    bevents_.push({key, b});
  }
  void push_event(i64 e) {
    int bi = in_blossom_[eu_[e]], bj = in_blossom_[ev_[e]];
    if (bi == bj) return;
    int li = get_label(bi), lj = get_label(bj);
    i64 s = slack(e);
    if (li == 1 && lj == 1)
      push_event_key(e, delta_total_ + s / 2);
    else if ((li == 1 && lj == 0) || (li == 0 && lj == 1))
      push_event_key(e, delta_total_ + s);
  }

  void solve() {
    bool dbg = std::getenv("MATCHTIGS_BLOSSOM_DEBUG") != nullptr;
    bool checktrees = std::getenv("MATCHTIGS_BLOSSOM_CHECKTREES") != nullptr;
    // ONE phase, all trees grown simultaneously: every free vertex roots
    // an alternating tree; an augmentation kills exactly the two trees it
    // touches and the search continues -- the canonical per-stage variant
    // re-pushes and re-scans every free root after every augmentation,
    // which is quadratic on big sparse instances.
    members_.assign(n_, {});
    root_dual_ = max_w_ / 2;  // all free roots stay S, so duals agree
    // Greedy warm start: pre-match a maximal disjoint set of edges that
    // are TIGHT at the uniform initial duals (exactly the maximum-weight
    // edges).  Complementary slackness holds (matched => tight), every
    // remaining free vertex still has the shared root dual, and each
    // pre-matched pair saves one full tree-growth + augmentation.  The
    // standard blossom warm start; exactness is untouched.
    if (!std::getenv("MATCHTIGS_NO_WARM"))
      for (i64 e = 0; e < m_; ++e) {
        int u = (int)eu_[e], v = (int)ev_[e];
        if (u == v || mate_[u] != -1 || mate_[v] != -1) continue;
        if (slack(e) == 0) {
          mate_[u] = 2 * (int)e + 1;
          mate_[v] = 2 * (int)e;
        }
      }
    int live_roots = 0;
    for (int v = 0; v < n_; ++v)
      if (mate_[v] == -1) {
        // Warm mode: an exposed vertex at dual 0 already satisfies
        // complementary slackness -- it roots no tree and instead waits
        // unlabeled as an augmentation target (see the scan branch).
        if (warm_ && dual_[v] == 0) continue;
        cur_root_ = v;
        assign_label(v, 1, -1);
        ++live_roots;
      }
    const bool exact_delta =
        std::getenv("MATCHTIGS_BLOSSOM_EXACT_DELTA") != nullptr;
    while (live_roots > 0) {
      while (!queue_.empty()) {
        int v = queue_.back();
        queue_.pop_back();
        int bv0 = in_blossom_[v];
        if (get_label(bv0) != 1) continue;  // stale: tree died / relabeled
        cur_root_ = tree_of_[bv0];
        ++dbg_scans;
        for (int p : nbr_[v]) {
          i64 k = p / 2;
          int w = endpoint_[p];
          if (in_blossom_[v] == in_blossom_[w]) continue;
          // Tightness is tested directly: cached allow flags go stale in
          // the multi-tree phase (an S endpoint can die and relabel T,
          // raising the slack of a formerly tight edge).  The one
          // exception is the forced delta3 edge: an odd S-S slack
          // truncates to delta = s/2, leaving slack 1 after the
          // adjustment, so the direct test alone would livelock on
          // zero-delta rounds.  Like van Rantwijk's allowedge for the
          // delta3 winner, the edge is processed anyway (the doubled
          // weights make the leftover 1 a half-integrality artifact);
          // the force is valid only while both sides are still live S
          // and only for the current drain.
          int bw = in_blossom_[w];
          if (slack(k) <= 0 ||
              (k == forced_edge_ && get_label(bw) == 1)) {
            if (get_label(bw) == 0) {
              if (warm_ && mate_[base_[bw]] == -1) {
                // Warm mode: w is an exposed zero-dual vertex (deficiency-
                // exposed or pre-exposed), which stays UNLABELED -- the
                // tight edge to it is an augmenting path ending at w.
                // Only the scanner's tree dies; w's side has no tree and
                // its label_end_ is -1, so the augment walk stops there.
                int r1 = tree_of_[in_blossom_[v]];
                augment_matching(k);
                bank_tree(r1);
                tree_alive_[r1] = 0;
                live_roots -= 1;
                ++dbg_augments;
                repush_tree(r1);
                if (checktrees) validate_trees("augment-exposed");
                break;  // v's tree died with it
              }
              assign_label(w, 2, p ^ 1);
              if (checktrees) validate_trees("assign-T");
            } else if (get_label(bw) == 1) {
              int base = scan_blossom(v, w);
              if (base >= 0) {
                add_blossom(base, k);
                if (checktrees) validate_trees("add-blossom");
              } else {
                int r1 = tree_of_[in_blossom_[(int)eu_[k]]];
                int r2 = tree_of_[in_blossom_[(int)ev_[k]]];
                if (dbg)
                  std::fprintf(stderr,
                               "augment e%lld (%lld-%lld) kills %d %d\n",
                               k, eu_[k], ev_[k], r1, r2);
                augment_matching(k);
                // Tree death freezes every member's dual rate WITHOUT
                // touching the members (the tree_alive_ epoch trick), so
                // bank their drift now, before the flip, while get_label
                // still reports the old classes.
                bank_tree(r1);
                bank_tree(r2);
                tree_alive_[r1] = 0;
                tree_alive_[r2] = 0;
                live_roots -= 2;
                ++dbg_augments;
                repush_tree(r1);
                repush_tree(r2);
                if (checktrees) validate_trees("augment");
                break;  // v's tree died with it
              }
            } else if (get_label(w) == 0) {
              // w inside a T-blossom, unreached from outside; record the
              // mark under the SCANNER's tree (cur_root_): label_end_[w]
              // points back at the scanning S-vertex, so when the blossom
              // is expanded the marked leaf hangs off the scanner's tree
              // -- recording the blossom's tree instead lets the chains
              // cross trees, which breaks scan_blossom's common-ancestor
              // detection (same-tree augmentations, state corruption).
              // The mark is stale (masked to 0) iff the scanner's tree
              // dies first, exactly when it must not be used.
              set_label_tree(w, 2);
              label_end_[w] = p ^ 1;
              if (checktrees) validate_trees("interior-T");
            }
          } else {
            push_event(k);
          }
        }
      }
      if (live_roots <= 0) break;

      // dual adjustment
      ++dbg_adjusts;
      forced_edge_ = -1;  // a force lives for exactly one queue drain
      int delta_type = 1;
      // Cold mode: free roots share one dual trajectory (uniform init),
      // so root_dual_ IS delta1.  Warm mode: free-root duals are not
      // uniform; per-S-vertex zero events carry delta1 instead (every
      // live root is S and armed, so delta stays bounded).
      i64 delta = warm_ ? kInfEvent : root_dual_;
      i64 delta_edge = -1;
      int delta_blossom = -1;
      int delta_vertex = -1;
      if (warm_) {
        if (exact_delta) {
          for (int v = 0; v < n_; ++v)
            if (get_label(in_blossom_[v]) == 1 && true_dual_v(v) < delta) {
              delta = true_dual_v(v);
              delta_type = 5;
              delta_vertex = v;
            }
        } else {
          while (!vevents_.empty()) {
            auto [key, v] = vevents_.top();
            if (key - delta_total_ >= delta) break;
            vevents_.pop();
            if (key == vevent_stamp_[v]) vevent_stamp_[v] = kInfEvent;
            if (get_label(in_blossom_[v]) != 1) continue;  // stale
            i64 true_key = delta_total_ + true_dual_v(v);
            if (true_key > key) {
              push_vevent_key(v, true_key);
              continue;
            }
            delta = key - delta_total_;
            delta_type = 5;
            delta_vertex = v;
            // keep as a future constraint: a later (strictly smaller)
            // edge/blossom event may steal this adjustment, and the
            // vertex's zero bound must keep limiting future deltas
            push_vevent_key(v, key);
            break;
          }
        }
      }
      if (exact_delta) {
        // Oracle mode: hint-free delta selection by classifying every
        // edge directly (used by fuzz tests to cross-check the heap).
        for (i64 e = 0; e < m_; ++e) {
          int bi = in_blossom_[eu_[e]], bj = in_blossom_[ev_[e]];
          if (bi == bj) continue;
          int li = get_label(bi), lj = get_label(bj);
          if (li == 1 && lj == 1) {
            i64 d = slack(e) / 2;
            if (d < delta) { delta = d; delta_type = 3; delta_edge = e; }
          } else if ((li == 1 && lj == 0) || (li == 0 && lj == 1)) {
            i64 d = slack(e);
            if (d < delta) { delta = d; delta_type = 2; delta_edge = e; }
          }
        }
      } else {
        while (!events_.empty()) {
          auto [key, e] = events_.top();
          if (key - delta_total_ >= delta) break;  // cannot beat current best
          events_.pop();
          if (key == event_stamp_[e]) event_stamp_[e] = kInfEvent;
          int bi = in_blossom_[eu_[e]], bj = in_blossom_[ev_[e]];
          if (bi == bj) continue;
          int li = get_label(bi), lj = get_label(bj);
          i64 true_key;
          int ty;
          if (li == 1 && lj == 1) {
            true_key = delta_total_ + slack(e) / 2;
            ty = 3;
          } else if ((li == 1 && lj == 0) || (li == 0 && lj == 1)) {
            true_key = delta_total_ + slack(e);
            ty = 2;
          } else {
            continue;  // not delta-relevant; re-pushed on class change
          }
          if (true_key > key) {
            push_event_key(e, true_key);  // stale key: revalidate later
            continue;
          }
          // first valid pop = global minimum (true keys >= stored keys)
          delta = key - delta_total_;
          delta_type = ty;
          delta_edge = e;
          // keep as a future constraint; it is consumed by the scan that
          // processes the edge once tight
          push_event_key(e, key);
          break;
        }
      }
      if (exact_delta) {
        // Oracle mode: scan every top-level T-blossom directly.
        for (int b = n_; b < 2 * n_; ++b)
          if (base_[b] >= 0 && parent_[b] == -1 && get_label(b) == 2 &&
              true_dual_b(b) < delta) {
            delta = true_dual_b(b);
            delta_type = 4;
            delta_blossom = b;
          }
      } else {
        // delta4 via the blossom event heap: keys are the delta_total_
        // at which the T-blossom's dual hits zero; pops revalidate
        // (blossom may have died, been absorbed, or expanded).
        while (!bevents_.empty()) {
          auto [key, b] = bevents_.top();
          if (key - delta_total_ >= delta) break;
          bevents_.pop();
          if (key == bevent_stamp_[b]) bevent_stamp_[b] = kInfEvent;
          if (base_[b] < 0 || parent_[b] != -1 || get_label(b) != 2)
            continue;  // stale; re-armed on the next T-labeling
          i64 true_key = delta_total_ + true_dual_b(b);
          if (true_key > key) {
            push_bevent_key(b, true_key);
            continue;
          }
          delta = key - delta_total_;
          delta_type = 4;
          delta_blossom = (int)b;
          push_bevent_key(b, key);  // future constraint until expanded
          break;
        }
      }
      if (dbg) {
        std::fprintf(stderr, "adjust t%d delta=%lld edge=%lld duals:",
                     delta_type, delta, delta_edge);
        if (n_ <= 24)
          for (int v = 0; v < n_; ++v)
            std::fprintf(stderr, " %lld%c", true_dual_v(v),
                         get_label(in_blossom_[v]) == 1   ? 'S'
                         : get_label(in_blossom_[v]) == 2 ? 'T'
                                                          : '.');
        std::fprintf(stderr, "\n");
      }
      // O(1) dual adjustment: only the global clock advances; every
      // slot's drift is banked lazily when its classification changes.
      root_dual_ -= delta;
      delta_total_ += delta;
      if (dbg_adjusts % 1000000 == 0 &&
          std::getenv("MATCHTIGS_NATIVE_TRACE"))
        std::fprintf(stderr,
                     "[blossom] adjusts=%lld t%d delta=%lld live=%d "
                     "heap=%zu scans=%lld\n",
                     dbg_adjusts, delta_type, delta, live_roots,
                     events_.size(), dbg_scans);
      if (delta_type == 1) break;  // free roots hit dual 0: optimum
      if (delta_type == 5) {
        // Warm mode: S-vertex delta_vertex's dual reached 0 -- it
        // prefers exposure (CS holds at y = 0).  Flip the alternating
        // path to its root (the root becomes matched, weight grows by
        // the root's dual) and retire the tree.  If the vertex IS an
        // exposed root, the flip is a no-op beyond keeping it exposed.
        int r = tree_of_[in_blossom_[delta_vertex]];
        deficiency_augment(delta_vertex);
        bank_tree(r);
        tree_alive_[r] = 0;
        live_roots -= 1;
        ++dbg_augments;
        repush_tree(r);
        if (checktrees) validate_trees("deficiency");
        continue;
      }
      if (delta_type == 2) {
        int i = (int)eu_[delta_edge];
        if (get_label(in_blossom_[i]) != 1) i = (int)ev_[delta_edge];
        queue_.push_back(i);
      } else if (delta_type == 3) {
        // Odd S-S slack truncated to s/2 leaves slack 1: force the
        // winner so the scan processes it regardless (see the tightness
        // comment in the scan loop).
        forced_edge_ = delta_edge;
        int i = (int)eu_[delta_edge];
        if (get_label(in_blossom_[i]) != 1) i = (int)ev_[delta_edge];
        queue_.push_back(i);
      } else {
        expand_blossom(delta_blossom, false);
        if (checktrees) validate_trees("expand");
      }
    }
    // bank every dual so extract/verify/endstage-expand read raw values
    for (int v = 0; v < n_; ++v) mat_v(v);
    for (int b = n_; b < 2 * n_; ++b)
      if (base_[b] >= 0 && parent_[b] == -1) mat_b(b);
    if (std::getenv("MATCHTIGS_NATIVE_TRACE"))
      std::fprintf(stderr, "[blossom] scans=%lld adjusts=%lld augments=%lld\n",
                   dbg_scans, dbg_adjusts, dbg_augments);
  }

  // Debug-only: verify every labeled live blossom chains up to a free
  // root of its own tree via the (mate, label_end) alternation.  Prints
  // the first violation with the op tag and aborts.
  void validate_trees(const char* tag) {
    for (int v = 0; v < n_; ++v) {
      int b = in_blossom_[v];
      int l = get_label(b);
      if (l == 0) continue;
      int t = tree_of_[b];
      long long steps = 0;
      int cur = b;
      while (true) {
        if (++steps > 4 * (long long)n_ + 16) {
          std::fprintf(stderr, "[checktrees %s] CYCLE from v=%d b=%d tree=%d\n",
                       tag, v, b, t);
          std::abort();
        }
        int lc = get_label(cur);
        if (lc == 0) {
          std::fprintf(stderr,
                       "[checktrees %s] DEAD blossom %d on chain of v=%d "
                       "(tree %d, label_ %d, tree_of %d)\n",
                       tag, cur, v, t, label_[cur], tree_of_[cur]);
          std::abort();
        }
        if (tree_of_[cur] != t) {
          std::fprintf(stderr,
                       "[checktrees %s] TREE MIX on chain of v=%d: blossom %d "
                       "tree %d != %d\n",
                       tag, v, cur, tree_of_[cur], t);
          std::abort();
        }
        if (lc == 1) {
          int bm = mate_[base_[cur]];
          if (bm == -1) break;  // root reached
          cur = in_blossom_[endpoint_[bm]];
          if (get_label(cur) != 2) {
            std::fprintf(stderr,
                         "[checktrees %s] S->%d expected T at blossom %d "
                         "(chain of v=%d, tree %d)\n",
                         tag, get_label(cur), cur, v, t);
            std::abort();
          }
        } else {  // T blossom: label_end points at edge from S parent
          int le = label_end_[cur];
          if (le < 0) {
            std::fprintf(stderr,
                         "[checktrees %s] T blossom %d label_end=-1 (v=%d)\n",
                         tag, cur, v);
            std::abort();
          }
          cur = in_blossom_[endpoint_[le]];
          if (get_label(cur) != 1) {
            std::fprintf(stderr,
                         "[checktrees %s] T->%d expected S at blossom %d "
                         "(chain of v=%d, tree %d)\n",
                         tag, get_label(cur), cur, v, t);
            std::abort();
          }
        }
      }
    }
  }

  // Complementary-slackness audit (canonical verifyOptimum): prints every
  // violated constraint (unless quiet); returns the violation count.
  int verify_optimum(bool quiet = false) const {
    int bad = 0;
    for (int v = 0; v < n_; ++v) {
      if (dual_[v] < 0) {
        if (!quiet)
          std::fprintf(stderr, "VIOLATION dual[%d]=%lld < 0\n", v, dual_[v]);
        ++bad;
      }
      if (mate_[v] == -1 && dual_[v] != 0) {
        if (!quiet)
          std::fprintf(stderr, "VIOLATION single v=%d dual=%lld != 0\n", v,
                       dual_[v]);
        ++bad;
      }
    }
    for (int b = n_; b < 2 * n_; ++b)
      if (base_[b] >= 0 && dual_[b] < 0) {
        if (!quiet)
          std::fprintf(stderr, "VIOLATION blossom dual[%d]=%lld < 0\n", b,
                       dual_[b]);
        ++bad;
      }
    for (i64 e = 0; e < m_; ++e) {
      int i = (int)eu_[e], j = (int)ev_[e];
      i64 s = dual_[i] + dual_[j] - w2(e);
      // add 2*z for every blossom containing both endpoints
      auto chain = [&](int v0) {
        std::vector<int> c;
        int pb = parent_[v0];
        while (pb != -1) {
          c.push_back(pb);
          pb = parent_[pb];
        }
        return c;
      };
      std::vector<int> bi = chain(i), bj = chain(j);
      // common suffix (outermost blossoms shared)
      int a = (int)bi.size() - 1, bq = (int)bj.size() - 1;
      while (a >= 0 && bq >= 0 && bi[a] == bj[bq]) {
        s += 2 * dual_[bi[a]];
        --a;
        --bq;
      }
      bool matched =
          (mate_[i] >= 0 && mate_[i] / 2 == e) || (mate_[j] >= 0 && mate_[j] / 2 == e);
      if (s < 0) {
        if (!quiet)
          std::fprintf(stderr,
                       "VIOLATION edge %lld (%d-%d w%lld) slack=%lld < 0\n",
                       e, i, j, ew_[e], s);
        ++bad;
      }
      if (matched && s != 0) {
        if (!quiet)
          std::fprintf(stderr,
                       "VIOLATION matched edge %lld (%d-%d w%lld) slack=%lld "
                       "!= 0\n",
                       e, i, j, ew_[e], s);
        ++bad;
      }
    }
    return bad;
  }

  // Warm start from a previous solve on a SUBSET of this instance's
  // edges (column-generation pricing rounds): ``y`` comes from the
  // previous solver's folded_duals() -- a blossom-free feasible dual for
  // the old edge set -- and ``partner`` from its extract().  New edges
  // with negative slack are repaired by RAISING the smaller-id
  // endpoint's dual (raising never breaks feasibility); previous matched
  // pairs are kept only while their connecting edge is still tight, so
  // complementary slackness holds at entry.  Any feasible dual +
  // matching-of-tight-edges is a valid primal-dual start; the final
  // optimum is unaffected (verify_optimum and the pricing certificate
  // still audit it).  Must be called before solve().
  void warm_init(const i64* y, const int* partner) {
    warm_ = true;
    vevent_stamp_.assign(n_, kInfEvent);
    // y is in the PREVIOUS round's weight space (scale_/2): doubling it
    // lands in this round's space AND makes every dual even -- the
    // uniform-parity entry state (see the constructor comment).
    for (int v = 0; v < n_; ++v) dual_[v] = 2 * y[v];
    for (i64 e = 0; e < m_; ++e) {
      const i64 sl = dual_[eu_[e]] + dual_[ev_[e]] - w2(e);
      if (sl < 0) dual_[std::min(eu_[e], ev_[e])] += -sl;
    }
    for (int v = 0; v < n_; ++v) {
      const int w = partner[v];
      if (w <= v || w >= n_) continue;  // each pair once; -1 skips
      for (int p : nbr_[v]) {
        if (endpoint_[p] != w) continue;
        if (slack(p / 2) != 0) continue;  // tightness lost: leave exposed
        mate_[v] = p;
        mate_[w] = p ^ 1;
        break;
      }
    }
  }

  // Blossom-free feasible duals equivalent to the final (y, z) solution:
  // y'_v = y_v + sum of dual_[b] over blossoms containing v (per
  // verify_optimum's slack formula each endpoint's share of a common
  // blossom is dual_[b]).  Edges inside a blossom gain the blossom's
  // dual from BOTH endpoints -- exactly the z term -- so internal
  // matched edges stay tight under y'; a positive-dual blossom base's
  // external matched edge gains half a z and loses tightness (dropped
  // by warm_init; the vertex re-augments).  Valid after solve(), which
  // banks every dual slot.
  void folded_duals(i64* y_out) const {
    for (int v = 0; v < n_; ++v) {
      i64 y = dual_[v];
      for (int b = parent_[v]; b != -1; b = parent_[b]) y += dual_[b];
      y_out[v] = y;
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

  // Final vertex duals (doubled-weight space; valid after solve(), which
  // banks every slot).  Used by the column-generation pricing check.
  i64 dual_of(int v) const { return dual_[v]; }

 private:
  int n_;
  i64 m_;
  const i64* eu_;
  const i64* ev_;
  const i64* ew_;
  i64 max_w_;
  i64 scale_;
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
  std::vector<int> unused_;
  std::vector<i64> dual_;
  std::vector<int> queue_;
  std::vector<int> tree_of_;
  std::vector<char> tree_alive_;
  std::vector<std::vector<int>> members_;  // entry vertices labeled per root
  std::vector<int> tops_scratch_, leaves_scratch_, leaves_scratch2_;
  // min-heap of (projected tight delta_total_, edge)
  std::priority_queue<std::pair<i64, i64>, std::vector<std::pair<i64, i64>>,
                      std::greater<std::pair<i64, i64>>>
      events_;
  std::vector<i64> event_stamp_;  // lowest in-heap key per edge
  // min-heap of (projected dual-zero delta_total_, T-blossom)
  std::priority_queue<std::pair<i64, i64>, std::vector<std::pair<i64, i64>>,
                      std::greater<std::pair<i64, i64>>>
      bevents_;
  std::vector<i64> bevent_stamp_;
  // warm mode: min-heap of (projected dual-zero delta_total_, S-vertex)
  std::priority_queue<std::pair<i64, int>, std::vector<std::pair<i64, int>>,
                      std::greater<std::pair<i64, int>>>
      vevents_;
  std::vector<i64> vevent_stamp_;
  bool warm_ = false;
  std::vector<i64> stamp_;  // delta_total_ at last dual materialization
  i64 delta_total_ = 0;
  i64 forced_edge_ = -1;
  int cur_root_;
  i64 root_dual_ = 0;

 public:
  long long dbg_scans = 0, dbg_adjusts = 0, dbg_augments = 0;
};

}  // namespace

// Column-generation solve for giant components: solve on each vertex's
// top-T incident edges by weight, then PRICE every excluded edge against
// the final duals.  Exactness certificate: the reduced optimum's duals
// (y, z) are feasible odd-set duals for the FULL graph, and for any
// excluded edge slack >= y_u + y_v - w2 (blossom duals z only ADD), so
// y_u + y_v >= 2w proves the edge can join no better matching.  Edges
// that fail the check are added and the solve repeats (the reduced set
// grows monotonically, so the loop terminates; in the worst case it
// degenerates to the full instance, still exact).  The matching content
// can differ from a direct full solve among equal-weight optima; the
// total weight (and with the lexicographic profit encoding, the pair
// count) is identical.
static long long solve_priced(i64 nl, i64 ml, const i64* eu, const i64* ev,
                              const i64* ew, int* mate, bool verify,
                              bool verify_abort) {
  const bool trace = std::getenv("MATCHTIGS_NATIVE_TRACE") != nullptr;
  // Initial per-vertex top-K edge cut.  K trades initial instance size
  // against pricing rounds (each round is a full re-solve; blossom duals
  // cannot warm-start across added edges without Blossom-V-style dual
  // surgery).  Measured on the 60M giant (176k ids / 26.9M edges),
  // K=16: 4 solves of ~1.9M edges.
  int T = 16;
  if (const char* tk = std::getenv("MATCHTIGS_PRICE_TOPK"))
    T = std::max(1, std::atoi(tk));
  // per-vertex incidence (CSR over both endpoints)
  std::vector<i64> off(nl + 1, 0);
  for (i64 e = 0; e < ml; ++e) {
    ++off[eu[e] + 1];
    ++off[ev[e] + 1];
  }
  for (i64 v = 0; v < nl; ++v) off[v + 1] += off[v];
  std::vector<i64> inc(2 * ml);
  {
    std::vector<i64> cur(off.begin(), off.end() - 1);
    for (i64 e = 0; e < ml; ++e) {
      inc[cur[eu[e]]++] = e;
      inc[cur[ev[e]]++] = e;
    }
  }
  std::vector<char> keep(ml, 0);
  // strict order (weight desc, edge id asc) makes the top-T SET unique,
  // so nth_element's internal nondeterminism cannot leak into the result
  auto heavier = [&](i64 a, i64 b) {
    return ew[a] != ew[b] ? ew[a] > ew[b] : a < b;
  };
  for (i64 v = 0; v < nl; ++v) {
    i64 lo = off[v], hi = off[v + 1];
    if (hi - lo <= T) {
      for (i64 i = lo; i < hi; ++i) keep[inc[i]] = 1;
    } else {
      std::nth_element(inc.begin() + lo, inc.begin() + lo + T,
                       inc.begin() + hi, heavier);
      for (i64 i = lo; i < lo + T; ++i) keep[inc[i]] = 1;
    }
  }
  std::vector<i64> reu, rev, rew;
  reu.reserve(std::min<i64>(ml, (i64)T * nl));
  for (i64 e = 0; e < ml; ++e)
    if (keep[e]) {
      reu.push_back(eu[e]);
      rev.push_back(ev[e]);
      rew.push_back(ew[e]);
    }
  // Rounds 2+ warm-start from the previous round's folded duals +
  // matching: the added (violated) edges are repaired by dual raises
  // that expose only their endpoints, so the re-solve re-augments a few
  // thousand vertices instead of re-matching the whole component
  // (previously each round was a full cold solve).
  const bool price_warm = std::getenv("MATCHTIGS_NO_PRICE_WARM") == nullptr;
  std::vector<i64> y_prev;
  std::vector<int> mate_prev;
  bool have_prev = false;
  i64 scale = 2;  // doubled per warm round (parity; constructor comment)
  for (int round = 0;; ++round) {
    SparseBlossom sb((int)nl, (i64)reu.size(), reu.data(), rev.data(),
                     rew.data(), scale);
    const bool warm_round = have_prev && price_warm;
    if (warm_round) sb.warm_init(y_prev.data(), mate_prev.data());
    sb.solve();
    // Warm rounds are exact-or-fallback: warm duals do not share the
    // cold start's parity trajectory, so the forced delta3 edge can in
    // rare cases augment across a slack-1 cross-tree edge and leave a
    // matched edge 1 off tight in the doubled-weight space.  The silent
    // complementary-slackness audit (O(m)) catches any such hole and
    // the round re-solves cold -- warm speed when clean, cold exactness
    // always.
    std::unique_ptr<SparseBlossom> sb_cold;
    SparseBlossom* sbp = &sb;
    if (warm_round &&
        sb.verify_optimum(std::getenv("MATCHTIGS_WARM_AUDIT_VERBOSE") ==
                          nullptr)) {
      if (trace)
        std::fprintf(stderr,
                     "[blossom-priced] round %d: warm certificate failed; "
                     "re-solving cold\n",
                     round);
      sb_cold.reset(new SparseBlossom((int)nl, (i64)reu.size(), reu.data(),
                                      rev.data(), rew.data(), scale));
      sb_cold->solve();
      sbp = sb_cold.get();
    }
    SparseBlossom& sbr = *sbp;
    if (verify) {
      int bad = sbr.verify_optimum();
      if (bad && verify_abort) std::abort();
    }
    i64 violations = 0;
    for (i64 e = 0; e < ml; ++e) {
      if (keep[e]) continue;
      if (sbr.dual_of((int)eu[e]) + sbr.dual_of((int)ev[e]) < scale * ew[e]) {
        keep[e] = 1;
        reu.push_back(eu[e]);
        rev.push_back(ev[e]);
        rew.push_back(ew[e]);
        ++violations;
      }
    }
    if (trace)
      std::fprintf(stderr,
                   "[blossom-priced] round %d: %zu/%lld edges, %lld priced "
                   "in\n",
                   round, reu.size() - violations, ml, violations);
    if (violations == 0) return sbr.extract(mate);
    if (price_warm) {
      y_prev.resize(nl);
      mate_prev.resize(nl);
      sbr.folded_duals(y_prev.data());
      sbr.extract(mate_prev.data());
      have_prev = true;
      scale *= 2;  // next round doubles into a fresh uniform-parity space
    }
  }
}

extern "C" {

// Maximum-weight matching on a sparse general graph.
// n vertices; m edges (eu, ev, ew int64 arrays, ew >= 0).
// mate_out: int32 [n], partner or -1.  Returns total matched weight.
long long mwm_sparse(long long n, long long m, const long long* eu,
                     const long long* ev, const long long* ew,
                     int* mate_out) {
  SparseBlossom sb((int)n, m, eu, ev, ew);
  sb.solve();
  if (std::getenv("MATCHTIGS_BLOSSOM_VERIFY")) {
    int bad = sb.verify_optimum();
    if (bad && std::getenv("MATCHTIGS_BLOSSOM_VERIFY_ABORT")) std::abort();
  }
  return sb.extract(mate_out);
}

// Batched independent matchings: one SparseBlossom per component, solved
// big-first over an internal thread pool.  The optimal-matchtigs
// candidate graph decomposes into ~160k components at bench scale, most
// of them 2-16 ids; dispatching each from python cost ~1.3ms/component
// in glue + GIL serialization (100s cumulative) versus microseconds of
// solver work.  Components are the caller's concatenated slices:
// component c owns nodes [node_off[c], node_off[c+1]) of mate_out and
// edges [edge_off[c], edge_off[c+1]) with component-LOCAL endpoints.
// Returns the summed matched weight.
long long mwm_sparse_batch(long long n_comps, const long long* node_off,
                           const long long* edge_off, const long long* eu,
                           const long long* ev, const long long* ew,
                           int* mate_out, long long n_threads,
                           long long progress) {
  std::vector<i64> order(n_comps);
  for (i64 i = 0; i < n_comps; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](i64 a, i64 b) {
    return edge_off[a + 1] - edge_off[a] > edge_off[b + 1] - edge_off[b];
  });
  const bool verify = std::getenv("MATCHTIGS_BLOSSOM_VERIFY") != nullptr;
  const bool verify_abort =
      std::getenv("MATCHTIGS_BLOSSOM_VERIFY_ABORT") != nullptr;
  // Components at or above this edge count go through the priced
  // column-generation solve (solve_priced); env knob for testing.
  i64 price_threshold = 500000;
  if (const char* pt = std::getenv("MATCHTIGS_PRICE_THRESHOLD"))
    price_threshold = std::max<i64>(1, std::atoll(pt));
  int nt = (int)std::max<i64>(1, std::min<i64>(n_threads, 64));
  std::atomic<i64> next{0};
  std::atomic<long long> total{0};
  std::atomic<i64> ids_done{0};
  std::atomic<bool> finished{false};
  // Periodic %-progress (the reference prints dots during its matching,
  // matchtigs/mod.rs:224-232); the batch solve can run minutes on the
  // giant component with no other output.
  std::thread monitor;
  if (progress) {
    const i64 ids_total = node_off[n_comps];
    monitor = std::thread([&, ids_total] {
      int ticks = 0;
      while (!finished.load(std::memory_order_relaxed)) {
        std::this_thread::sleep_for(std::chrono::milliseconds(200));
        if (++ticks < 25) continue;  // ~5s between reports
        ticks = 0;
        i64 d = ids_done.load(std::memory_order_relaxed);
        std::fprintf(stderr, "[matching] %lld / %lld ids solved (%.0f%%)\n",
                     d, ids_total,
                     100.0 * (double)d / (double)std::max<i64>(1, ids_total));
      }
    });
  }
  // Size-class accounting under MATCHTIGS_NATIVE_TRACE: where do the
  // batch's core-seconds go — the priced giant, mid tangles, or the
  // long tail of tiny components?
  const bool trace = std::getenv("MATCHTIGS_NATIVE_TRACE") != nullptr;
  constexpr i64 kClasses = 4;  // <=32 edges, <=4096, < price, priced
  std::atomic<i64> cls_n[kClasses], cls_ms[kClasses];
  for (i64 i = 0; i < kClasses; ++i) {
    cls_n[i].store(0);
    cls_ms[i].store(0);
  }
  auto class_of = [&](i64 ml) {
    return ml <= 32 ? 0 : ml <= 4096 ? 1 : ml < price_threshold ? 2 : 3;
  };
  auto worker = [&] {
    for (;;) {
      i64 oi = next.fetch_add(1);
      if (oi >= n_comps) return;
      i64 c = order[oi];
      i64 nl = node_off[c + 1] - node_off[c];
      i64 ml = edge_off[c + 1] - edge_off[c];
      int* mate = mate_out + node_off[c];
      if (nl <= 0) continue;
      if (nl == 1 || ml == 0) {
        for (i64 i = 0; i < nl; ++i) mate[i] = -1;
        ids_done.fetch_add(nl, std::memory_order_relaxed);
        continue;
      }
      const bool big = ml > 1000000 && trace;
      auto t0 = std::chrono::steady_clock::now();
      if (ml >= price_threshold) {
        total.fetch_add(solve_priced(nl, ml, eu + edge_off[c],
                                     ev + edge_off[c], ew + edge_off[c],
                                     mate, verify, verify_abort));
      } else {
        SparseBlossom sb((int)nl, ml, eu + edge_off[c], ev + edge_off[c],
                         ew + edge_off[c]);
        sb.solve();
        if (verify) {
          int bad = sb.verify_optimum();
          if (bad && verify_abort) std::abort();
        }
        total.fetch_add(sb.extract(mate));
      }
      if (big)
        std::fprintf(
            stderr, "[blossom-batch] comp %lld: %lld ids %lld edges %.1fs\n",
            c, nl, ml,
            std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                          t0)
                .count());
      if (trace) {
        i64 us = std::chrono::duration_cast<std::chrono::microseconds>(
                     std::chrono::steady_clock::now() - t0)
                     .count();
        const i64 cl = class_of(ml);
        cls_n[cl].fetch_add(1, std::memory_order_relaxed);
        cls_ms[cl].fetch_add(us, std::memory_order_relaxed);
      }
      ids_done.fetch_add(nl, std::memory_order_relaxed);
    }
  };
  std::vector<std::thread> ths;
  for (int t = 0; t < nt; ++t) ths.emplace_back(worker);
  for (auto& th : ths) th.join();
  finished.store(true);
  if (monitor.joinable()) monitor.join();
  if (trace) {
    const char* names[kClasses] = {"<=32e", "<=4096e", "<price", "priced"};
    for (i64 i = 0; i < kClasses; ++i)
      if (cls_n[i].load())
        std::fprintf(stderr, "[blossom-batch] class %s: %lld comps, %.1f core-s\n",
                     names[i], cls_n[i].load(), cls_ms[i].load() / 1e6);
  }
  return total.load();
}
}
