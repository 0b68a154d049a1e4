"""Maximum-weight matching front-end for optimal matchtigs.

The reference reduces optimal tig joining to min-cost *perfect* matching on
a doubled graph with 4 extra nodes per weakly connected component and ships
it to the external blossom5 binary
(/root/reference/src/implementation/matchtigs/mod.rs:600-746).  Here the
same optimum is computed as a maximum-weight matching directly:

- matching a candidate pair (join) saves ``s(e) = (k-1) - w(e)`` characters
  versus breaking both ends (the copy-pair edges of weight k-1 in the
  reference encoding);
- every component must keep at least one break (its Eulerian tour is a
  cycle that has to be cut), which the reference encodes as 4 zero-cost
  extra nodes per WCC; here each component instance gets 2 gadget nodes
  connected to all members with a dominating profit, absorbing exactly the
  two free tig ends;
- profits are scaled by (m+2) and offset by +1 per edge so the solver is
  lexicographically optimal: minimum cumulative length first, then minimum
  string count.

Solved per component with the native dense O(n^3) blossom
(:mod:`matchtigs_tpu.native`); falls back to networkx (pure python, same
optimum) when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging

import numpy as np

logger = logging.getLogger(__name__)

DENSE_LIMIT = 12000  # max gadget nodes per component for the dense solver


def max_weight_matching_dense(weights: np.ndarray) -> tuple[np.ndarray, int]:
    """Exact maximum-weight matching on a dense int64 weight matrix.

    weights[u, v] > 0 are edges; 0 means absent.  Returns (mate, total):
    mate[u] = partner or -1.
    """
    n = weights.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int32), 0
    assert weights.shape == (n, n)
    w = np.ascontiguousarray(weights, dtype=np.int64)
    assert (w == w.T).all(), "weight matrix must be symmetric"
    try:
        from .. import native

        lib = native.load()
    except Exception as e:  # toolchain missing: python fallback
        logger.warning("native matcher unavailable (%s); using networkx", e)
        return _mwm_networkx(w)
    mate = np.empty(n, dtype=np.int32)
    total = lib.mwm_dense(
        n,
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        mate.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return mate, int(total)


def _mwm_networkx(w: np.ndarray) -> tuple[np.ndarray, int]:
    import networkx as nx

    n = w.shape[0]
    gr = nx.Graph()
    gr.add_nodes_from(range(n))
    us, vs = np.nonzero(w > 0)
    for u, v in zip(us.tolist(), vs.tolist()):
        if u < v:
            gr.add_edge(u, v, weight=int(w[u, v]))
    matching = nx.max_weight_matching(gr, maxcardinality=False)
    mate = np.full(n, -1, dtype=np.int32)
    total = 0
    for u, v in matching:
        mate[u] = v
        mate[v] = u
        total += int(w[u, v])
    return mate, total


def optimal_component_matching(
    members: np.ndarray,
    edges: np.ndarray,  # int64 [M, 3]: (id_a, id_b, weight) within component
    k: int,
) -> list[tuple[int, int]]:
    """Solve one component's constrained matching; returns matched id pairs.

    `members` are the component's matching ids; two gadget nodes absorb the
    component's two mandatory tig ends for free.
    """
    m = len(members)
    if m == 0:
        return []
    if m + 2 > DENSE_LIMIT:
        raise RuntimeError(
            f"matching component with {m} nodes exceeds dense solver limit "
            f"{DENSE_LIMIT}; use greedy matchtigs for this input"
        )
    local = {int(x): i for i, x in enumerate(members)}
    n = m + 2  # + 2 gadget nodes
    big = np.int64(m + 2)
    w = np.zeros((n, n), dtype=np.int64)
    for a, b, wt in edges.tolist():
        ia, ib = local[int(a)], local[int(b)]
        profit = (k - 1 - int(wt)) * int(big) + 1
        assert profit >= 1
        w[ia, ib] = max(w[ia, ib], profit)
        w[ib, ia] = w[ia, ib]
    # gadget profit dominates any achievable join total
    p_big = (np.int64(k) * big) * np.int64(m + 1) + np.int64(1)
    w[:m, m] = p_big
    w[m, :m] = p_big
    w[:m, m + 1] = p_big
    w[m + 1, :m] = p_big

    mate, _ = max_weight_matching_dense(w)
    pairs = []
    for i in range(m):
        j = int(mate[i])
        if j >= 0 and j < m and i < j:
            pairs.append((int(members[i]), int(members[j])))
    return pairs
