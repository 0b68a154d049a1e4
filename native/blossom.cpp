// Exact maximum-weight matching in general graphs, dense O(n^3).
//
// In-process replacement for the external blossom5 binary the reference
// invokes as a subprocess for optimal matchtigs
// (/root/reference/src/implementation/matchtigs/mod.rs:724-746): the
// min-cost perfect matching on the doubled-graph reduction is solved here
// as a maximum-weight matching on per-component gadget instances, behind a
// C ABI loaded via ctypes (no file IPC, no third-party binary).
//
// Algorithm: classic primal-dual blossom method with explicit blossom
// nodes (ids n+1..2n) and dense slack bookkeeping, O(n^3).  Weights are
// doubled internally so all duals stay integral.  Edges with weight 0 are
// treated as absent; callers must keep n * max_weight < 2^61.
//
// Lineage: this is the well-known dense blossom template of the
// competitive-programming tradition (Jarnik-style dual maintenance with a
// dense slack matrix), written down from that folklore formulation -- not
// derived from the reference repository (which contains no matching code)
// nor from Kolmogorov's blossom5.  It now serves as the independent
// cross-check oracle for the production sparse solver
// (blossom_sparse.cpp).

#include <algorithm>
#include <cstdint>
#include <deque>
#include <vector>

namespace {

using ll = long long;

struct Edge {
  int u, v;
  ll w;
};

struct Solver {
  int n;    // real vertices, 1-indexed
  int n_x;  // vertices + live blossoms
  std::vector<std::vector<Edge>> g;
  std::vector<ll> lab;
  std::vector<int> match, slack, st, pa, S, vis;
  std::vector<std::vector<int>> flower;
  std::vector<std::vector<int>> flower_from;  // [b][x]: entry of x into b
  std::deque<int> q;
  int visit_tick = 0;

  explicit Solver(int n_) : n(n_) {
    int m = n * 2 + 1;
    g.assign(m, std::vector<Edge>(m));
    lab.assign(m, 0);
    match.assign(m, 0);
    slack.assign(m, 0);
    st.assign(m, 0);
    pa.assign(m, 0);
    S.assign(m, -1);
    vis.assign(m, 0);
    flower.assign(m, {});
    flower_from.assign(m, std::vector<int>(n + 1, 0));
  }

  ll e_delta(const Edge& e) const {
    return lab[e.u] + lab[e.v] - g[e.u][e.v].w * 2;
  }

  void update_slack(int u, int x) {
    if (!slack[x] || e_delta(g[u][x]) < e_delta(g[slack[x]][x])) slack[x] = u;
  }

  void set_slack(int x) {
    slack[x] = 0;
    for (int u = 1; u <= n; ++u)
      if (g[u][x].w > 0 && st[u] != x && S[st[u]] == 0) update_slack(u, x);
  }

  void q_push(int x) {
    if (x <= n) {
      q.push_back(x);
    } else {
      for (int v : flower[x]) q_push(v);
    }
  }

  void set_st(int x, int b) {
    st[x] = b;
    if (x > n)
      for (int v : flower[x]) set_st(v, b);
  }

  int get_pr(int b, int xr) {
    int pr = int(std::find(flower[b].begin(), flower[b].end(), xr) -
                 flower[b].begin());
    if (pr % 2 == 1) {
      std::reverse(flower[b].begin() + 1, flower[b].end());
      return int(flower[b].size()) - pr;
    }
    return pr;
  }

  void set_match(int u, int v) {
    match[u] = g[u][v].v;
    if (u > n) {
      Edge e = g[u][v];
      int xr = flower_from[u][e.u];
      int pr = get_pr(u, xr);
      for (int i = 0; i < pr; ++i) set_match(flower[u][i], flower[u][i ^ 1]);
      set_match(xr, v);
      std::rotate(flower[u].begin(), flower[u].begin() + pr, flower[u].end());
    }
  }

  void augment(int u, int v) {
    for (;;) {
      int xnv = st[match[u]];
      set_match(u, v);
      if (!xnv) return;
      set_match(xnv, st[pa[xnv]]);
      u = st[pa[xnv]];
      v = xnv;
    }
  }

  int get_lca(int u, int v) {
    for (++visit_tick; u || v; std::swap(u, v)) {
      if (u == 0) continue;
      if (vis[u] == visit_tick) return u;
      vis[u] = visit_tick;
      u = st[match[u]];
      if (u) u = st[pa[u]];
    }
    return 0;
  }

  void add_blossom(int u, int lca, int v) {
    int b = n + 1;
    while (b <= n_x && st[b]) ++b;
    if (b > n_x) ++n_x;
    lab[b] = 0;
    S[b] = 0;
    match[b] = match[lca];
    flower[b].clear();
    flower[b].push_back(lca);
    for (int x = u, y; x != lca; x = st[pa[y]]) {
      flower[b].push_back(x);
      flower[b].push_back(y = st[match[x]]);
      q_push(y);
    }
    std::reverse(flower[b].begin() + 1, flower[b].end());
    for (int x = v, y; x != lca; x = st[pa[y]]) {
      flower[b].push_back(x);
      flower[b].push_back(y = st[match[x]]);
      q_push(y);
    }
    set_st(b, b);
    for (int x = 1; x <= n_x; ++x) g[b][x].w = g[x][b].w = 0;
    for (int x = 1; x <= n; ++x) flower_from[b][x] = 0;
    for (int xs : flower[b]) {
      for (int x = 1; x <= n_x; ++x)
        if (g[b][x].w == 0 || e_delta(g[xs][x]) < e_delta(g[b][x])) {
          g[b][x] = g[xs][x];
          g[x][b] = g[x][xs];
        }
      for (int x = 1; x <= n; ++x)
        if (flower_from[xs][x]) flower_from[b][x] = xs;
    }
    set_slack(b);
  }

  void expand_blossom(int b) {
    for (int x : flower[b]) set_st(x, x);
    int xr = flower_from[b][g[b][pa[b]].u];
    int pr = get_pr(b, xr);
    for (int i = 0; i < pr; i += 2) {
      int xs = flower[b][i];
      int xns = flower[b][i + 1];
      pa[xs] = g[xns][xs].u;
      S[xs] = 1;
      S[xns] = 0;
      slack[xs] = 0;
      set_slack(xns);
      q_push(xns);
    }
    S[xr] = 1;
    pa[xr] = pa[b];
    for (size_t i = pr + 1; i < flower[b].size(); ++i) {
      int xs = flower[b][i];
      S[xs] = -1;
      set_slack(xs);
    }
    st[b] = 0;
  }

  bool on_found_edge(const Edge& e) {
    int u = st[e.u], v = st[e.v];
    if (S[v] == -1) {
      pa[v] = e.u;
      S[v] = 1;
      int nu = st[match[v]];
      slack[v] = slack[nu] = 0;
      S[nu] = 0;
      q_push(nu);
    } else if (S[v] == 0) {
      int lca = get_lca(u, v);
      if (!lca) {
        augment(u, v);
        augment(v, u);
        return true;
      }
      add_blossom(u, lca, v);
    }
    return false;
  }

  bool phase() {
    std::fill(S.begin(), S.end(), -1);
    std::fill(slack.begin(), slack.end(), 0);
    q.clear();
    for (int x = 1; x <= n_x; ++x)
      if (st[x] == x && !match[x]) {
        pa[x] = 0;
        S[x] = 0;
        q_push(x);
      }
    if (q.empty()) return false;
    for (;;) {
      while (!q.empty()) {
        int u = q.front();
        q.pop_front();
        if (S[st[u]] == 1) continue;
        for (int v = 1; v <= n; ++v)
          if (g[u][v].w > 0 && st[u] != st[v]) {
            if (e_delta(g[u][v]) == 0) {
              if (on_found_edge(g[u][v])) return true;
            } else {
              update_slack(u, st[v]);
            }
          }
      }
      ll d = -1;
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b && S[b] == 1 && (d < 0 || lab[b] / 2 < d))
          d = lab[b] / 2;
      for (int x = 1; x <= n_x; ++x)
        if (st[x] == x && slack[x]) {
          ll s = e_delta(g[slack[x]][x]);
          if (S[x] == -1) {
            if (d < 0 || s < d) d = s;
          } else if (S[x] == 0) {
            if (d < 0 || s / 2 < d) d = s / 2;
          }
        }
      for (int u = 1; u <= n; ++u) {
        if (S[st[u]] == 0) {
          if (lab[u] <= d || d < 0) return false;  // optimum reached
          lab[u] -= d;
        } else if (S[st[u]] == 1) {
          lab[u] += d;
        }
      }
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b) {
          if (S[b] == 0)
            lab[b] += d * 2;
          else if (S[b] == 1)
            lab[b] -= d * 2;
        }
      q.clear();
      for (int x = 1; x <= n_x; ++x)
        if (st[x] == x && slack[x] && st[slack[x]] != x &&
            e_delta(g[slack[x]][x]) == 0) {
          if (on_found_edge(g[slack[x]][x])) return true;
        }
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b && S[b] == 1 && lab[b] == 0) expand_blossom(b);
    }
  }

  ll solve(const ll* w) {
    n_x = n;
    ll w_max = 0;
    for (int u = 1; u <= n; ++u) {
      st[u] = u;
      match[u] = 0;
      flower_from[u][u] = u;
      for (int v = 1; v <= n; ++v) {
        ll wv = w[(ll)(u - 1) * n + (v - 1)];
        g[u][v] = Edge{u, v, wv};
        if (wv > w_max) w_max = wv;
      }
    }
    for (int u = n + 1; u < (int)st.size(); ++u) {
      st[u] = u;
      match[u] = 0;
    }
    for (int u = 1; u <= n_x; ++u) lab[u] = w_max;
    while (phase()) {
    }
    ll total = 0;
    for (int u = 1; u <= n; ++u)
      if (match[u] && match[u] < u) total += g[u][match[u]].w;
    return total;
  }
};

}  // namespace

extern "C" {

long long mwm_dense(int n, const long long* w, int* match_out) {
  if (n <= 0) return 0;
  Solver s(n);
  ll total = s.solve(w);
  for (int u = 1; u <= n; ++u)
    match_out[u - 1] =
        (s.match[u] >= 1 && s.match[u] <= n) ? s.match[u] - 1 : -1;
  return total;
}
}
