"""Eulerian machinery for bidirected graphs.

Host-side (numpy + python) implementation of the capabilities the reference
pulls from ``bigraph::algo::eulerian`` and first-party balancing code:

- :func:`make_eulerian_with_breaking_edges` mirrors
  ``make_graph_eulerian_with_breaking_edges``
  (/root/reference/src/implementation/mod.rs:392-649) including its
  deterministic pairing orders (self-mirrors chunked in scan order, then
  out-nodes in DESCENDING node order x in-nodes ASCENDING, with
  mirror-collision avoidance as in ``choose_in_node_from_iterator``,
  mod.rs:252-285).
- :func:`eulerian_bicycle_decomposition` mirrors
  ``compute_minimum_bidirected_eulerian_cycle_decomposition``
  (/root/reference/src/implementation/eulertigs/mod.rs:119): Hierholzer
  tours where traversing an edge consumes its mirror, spliced into one
  bicycle per mirror-connected component via O(1) circular-list splices.
- :func:`break_cycles` mirrors the rotate-to-longest-dummy + break rules
  (/root/reference/src/implementation/eulertigs/mod.rs:126-186).

These stages are O(E) pointer walks over tiny data relative to the
shortest-path phase; the balancer and the tour walk dispatch to native
C++ passes (native/graphwalk.cpp) with the python implementations kept
as fallbacks and test oracles; imbalance scans are vectorized numpy.
"""

from __future__ import annotations

import heapq
import logging

import numpy as np

from ..graph.bigraph import Bigraph
from .walks import Walks

logger = logging.getLogger(__name__)

BREAKING = True  # dummy weight == k marks a breaking edge


def decomposes_into_eulerian_bicycles(g: Bigraph) -> bool:
    """True iff every binode is balanced (/root/reference usage at
    eulertigs/mod.rs:105)."""
    return bool(np.all(g.imbalances() == 0))


def assert_no_consecutive_dummy_edges(g: Bigraph, k: int) -> None:
    """No node may have both an incoming and an outgoing dummy edge,
    except a single mirror pair of nonzero weight.

    Vectorized analog of ``debug_assert_graph_has_no_consecutive_dummy_edges``
    (/root/reference/src/implementation/mod.rs:319-390).
    """
    d = g.is_dummy()
    src = g.srcs()
    dst = g.dsts()
    dummy_out = np.bincount(src[d], minlength=g.n_nodes)
    dummy_in = np.bincount(dst[d], minlength=g.n_nodes)
    both = np.flatnonzero((dummy_out > 0) & (dummy_in > 0))
    for v in both.tolist():
        ins = [e for e in g.in_edges_of(v) if d[e]]
        outs = [e for e in g.out_edges_of(v) if d[e]]
        if len(ins) == 1 and len(outs) == 1 and (ins[0] ^ 1) == outs[0]:
            assert g.weights()[ins[0]] != 0
            continue
        raise AssertionError(
            f"node {v} has both incoming and outgoing dummy edges "
            f"(self-mirror={g.is_self_mirror_node(v)}, in={ins}, out={outs})"
        )


class _LazyHeap:
    """Heap over node ids with lazy deletion against a membership dict."""

    def __init__(self, keys, values: dict, descending: bool) -> None:
        self.values = values
        self.sign = -1 if descending else 1
        self.heap = [self.sign * int(k) for k in keys]
        heapq.heapify(self.heap)

    def _clean(self) -> None:
        while self.heap and (self.sign * self.heap[0]) not in self.values:
            heapq.heappop(self.heap)

    def peek(self) -> int | None:
        self._clean()
        return self.sign * self.heap[0] if self.heap else None

    def peek2(self) -> tuple[int | None, int | None]:
        self._clean()
        if not self.heap:
            return None, None
        first = heapq.heappop(self.heap)
        self._clean()
        second = self.sign * self.heap[0] if self.heap else None
        heapq.heappush(self.heap, first)
        return self.sign * first, second


def make_eulerian_with_breaking_edges(
    g: Bigraph, k: int, dummy_edge_id: int
) -> int:
    """Add breaking dummy biedges (weight k) until every binode balances.

    Returns the updated dummy edge id counter.  Deterministic order matches
    the reference balancer exactly (see module docstring).  Dispatches to
    the native C++ pass; this python implementation is the fallback and
    test oracle.
    """
    try:
        return _make_eulerian_native(g, k, dummy_edge_id)
    except ImportError:
        logger.warning("native balancer unavailable; using python fallback")
        return make_eulerian_with_breaking_edges_py(g, k, dummy_edge_id)


def _make_eulerian_native(g: Bigraph, k: int, dummy_edge_id: int) -> int:
    from .. import native

    lib = native.load()
    n = g.n_nodes
    diff = np.ascontiguousarray(g.imbalances(), dtype=np.int64)
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    # Exact pair-count bound: phase 2 emits at most one pair per unit of
    # positive imbalance (bounded by edge count, NOT node count — parallel
    # biedges between one binode pair each contribute a unit); phase 1 emits
    # ceil(#odd-self-mirrors / 2) and its odd leftover consumes one in-unit
    # already counted in the positive sum.
    sm = g.self_mirror_mask()
    if logger.isEnabledFor(logging.INFO):
        # Imbalance-distribution statistics, matching the reference's
        # pre-balance log lines (mod.rs:428-479): unmatched node counts,
        # total dummies to add, and the histogram of differences 1/2/3/4
        # over non-self-mirror binodes.
        pos = diff[(diff > 0) & ~sm]
        n_sm = int(np.count_nonzero(sm & (diff != 0)))
        hist = np.bincount(np.minimum(pos, 5).astype(np.int64), minlength=6)
        logger.info(
            "Adding edges for %d unmatched in_nodes, %d unmatched "
            "out_nodes and %d unmatched self_mirror_nodes",
            len(pos),
            int(np.count_nonzero((diff < 0) & ~sm)),
            n_sm,
        )
        logger.info(
            "%d edges need to be added in total",
            (int(pos.sum()) + n_sm) // 2,
        )
        logger.info(
            "%d/%d/%d/%d binodes that are not self-mirrors have "
            "difference 1/2/3/4 (%d larger)",
            int(hist[1]), int(hist[2]), int(hist[3]), int(hist[4]),
            int(hist[5]),
        )
    bound = int(np.sum(diff[(diff > 0) & ~sm]))
    bound += (int(np.count_nonzero(sm & (diff != 0))) + 1) // 2
    capacity = max(1, bound)
    pairs = np.empty(2 * capacity, dtype=np.int64)
    p = native.as_ll_ptr
    n_pairs = lib.balance_breaking_edges(n, p(diff), p(mirror), p(pairs), capacity)
    while n_pairs == -2:  # defensive grow-and-retry; unreachable if bound holds
        capacity *= 2
        pairs = np.empty(2 * capacity, dtype=np.int64)
        n_pairs = lib.balance_breaking_edges(n, p(diff), p(mirror), p(pairs), capacity)
    if n_pairs < 0:
        raise AssertionError("balancer inconsistency (unbalanced totals)")
    if n_pairs:
        out_nodes = pairs[0 : 2 * n_pairs : 2]
        in_nodes = pairs[1 : 2 * n_pairs : 2]
        dummy_ids = np.arange(
            dummy_edge_id + 1, dummy_edge_id + n_pairs + 1, dtype=np.int64
        )
        g.add_biedge_pairs(
            src=out_nodes.astype(np.int32),
            dst=in_nodes.astype(np.int32),
            weight=np.full(n_pairs, k, dtype=np.int64),
            handle=np.full(n_pairs, -1, dtype=np.int64),
            forward=np.ones(n_pairs, dtype=bool),
            dummy_id=dummy_ids,
        )
    return dummy_edge_id + int(n_pairs)


def make_eulerian_with_breaking_edges_py(
    g: Bigraph, k: int, dummy_edge_id: int
) -> int:
    """Pure-python balancer (oracle for the native pass)."""
    diff = g.imbalances()
    sm = g.self_mirror_mask()
    node_ids = np.arange(g.n_nodes, dtype=np.int64)

    # find_non_eulerian_binodes_with_differences: self-mirrors with odd
    # degree are reported with difference 0 (consumed by the pairing phase);
    # ordinary unbalanced nodes carry their out-in difference.
    self_mirror_unbalanced = node_ids[sm & (diff != 0)]
    out_keys = node_ids[~sm & (diff < 0)]
    in_keys = node_ids[~sm & (diff > 0)]
    out_diff = {int(v): int(diff[v]) for v in out_keys}
    in_diff = {int(v): int(diff[v]) for v in in_keys}

    total_in = sum(in_diff.values())
    assert -sum(out_diff.values()) == total_in
    assert (total_in + len(self_mirror_unbalanced)) % 2 == 0
    logger.info(
        "Adding edges for %d unmatched in_nodes, %d unmatched out_nodes and "
        "%d unmatched self_mirror_nodes",
        len(in_diff),
        len(out_diff),
        len(self_mirror_unbalanced),
    )

    out_heap = _LazyHeap(out_diff.keys(), out_diff, descending=True)
    in_heap = _LazyHeap(in_diff.keys(), in_diff, descending=False)
    mirror = g.mirror_node

    def add_breaking(out_node: int, in_node: int, did: int) -> None:
        g.add_biedge_pair(out_node, in_node, weight=k, handle=-1, forward=True, dummy_id=did)

    # Phase 1: pair up unbalanced self-mirror nodes (mod.rs:481-524).
    sm_list = self_mirror_unbalanced.tolist()
    for i in range(0, len(sm_list) - 1, 2):
        dummy_edge_id += 1
        add_breaking(sm_list[i], sm_list[i + 1], dummy_edge_id)
    if len(sm_list) % 2 == 1:
        out_node = sm_list[-1]
        in_node = in_heap.peek()
        assert in_node is not None, (
            "Uneven number of self-mirrors, but no other nodes with missing in edges"
        )
        dummy_edge_id += 1
        add_breaking(out_node, in_node, dummy_edge_id)
        in_diff[in_node] -= 1
        mo = int(mirror[in_node])
        if in_diff[in_node] == 0:
            del in_diff[in_node]
            del out_diff[mo]
        else:
            out_diff[mo] += 1

    # Phase 2: out-nodes descending x in-nodes ascending (mod.rs:526-645).
    while True:
        out_node = out_heap.peek()
        if out_node is None:
            break
        d_out = out_diff[out_node]
        first, second = in_heap.peek2()
        assert first is not None, "No further in_nodes left"
        # choose_in_node_from_iterator (mod.rs:252-285): skip the first
        # in-node if it is the out-node's mirror (unless the deficit is
        # large enough that a mirror biedge, which fixes 2 units, helps)
        # or the out-node itself.
        in_node = first
        if (first == int(mirror[out_node]) and d_out > -2) or first == out_node:
            assert second is not None, "No further in_nodes left"
            in_node = second

        is_mirror = in_node == int(mirror[out_node])
        assert in_node != out_node, "balancer not designed for self mirrors here"
        dummy_edge_id += 1
        add_breaking(out_node, in_node, dummy_edge_id)

        out_diff[out_node] += 1
        in_diff[in_node] -= 1
        if out_diff[out_node] == 0:
            del out_diff[out_node]
        if in_diff.get(in_node) == 0:
            del in_diff[in_node]

        mirror_out = int(mirror[in_node])
        mirror_in = int(mirror[out_node])
        if mirror_out in out_diff:
            out_diff[mirror_out] += 1
            if out_diff[mirror_out] == 0:
                del out_diff[mirror_out]
        if mirror_in in in_diff:
            in_diff[mirror_in] -= 1
            if in_diff[mirror_in] == 0:
                del in_diff[mirror_in]

    assert not out_diff and not in_diff
    return dummy_edge_id


def eulerian_bicycle_decomposition(
    g: Bigraph, method: str = "parsplice"
) -> list[np.ndarray]:
    """Decompose a balanced bidirected graph into Eulerian bicycles.

    Traversing an edge consumes its mirror (e ^ 1).  The default
    ``method="parsplice"`` computes the splice set structurally (a
    deterministic spanning forest over pi-cycle pairs sharing a binode)
    and emits the final bicycles via concurrent piece chases — every
    heavy pass thread-parallel (native/graphwalk.cpp
    parsplice_decompose_impl; the serial Hierholzer rotation walk it
    replaces was the last ~2s dependent-load chain of the downstream at
    60M bases).  ``method="splice"`` is the serial-walk variant (pairing
    pi + one merged rotation walk), ``"pairing"`` and ``"hierholzer"``
    the earlier regression variants.  All methods yield the same number
    of bicycles and the same cumulative tig length (the one-bicycle-per-
    component minimum decomposition the reference computes,
    eulertigs/mod.rs:119 via the bigraph crate); the traversal order
    (hence the exact tig set) differs.

    Dispatches to the native C++ passes (native/graphwalk.cpp) when
    available; the python implementations are the fallback and test
    oracles.
    """
    try:
        if g.n_edges < 2**31 - 2 and g.n_nodes < 2**31 - 2:
            if method == "parsplice":
                return _decompose_native_i32(g, "euler_decompose_parsplice")
            if method == "splice":
                return _decompose_native_i32(g, "euler_decompose_splice")
            if method == "pairing":
                return _decompose_native_i32(g, "euler_decompose_pairing")
        return _eulerian_bicycle_decomposition_native(g)
    except ImportError:
        logger.warning("native graphwalk unavailable; using python fallback")
        if method == "parsplice":
            return eulerian_bicycle_decomposition_parsplice_py(g)
        if method == "splice":
            return eulerian_bicycle_decomposition_splice_py(g)
        if method == "pairing":
            return eulerian_bicycle_decomposition_pairing_py(g)
        return eulerian_bicycle_decomposition_py(g)


def _eulerian_bicycle_decomposition_pairing_native(g: Bigraph) -> list[np.ndarray]:
    return _decompose_native_i32(g, "euler_decompose_pairing")


def _eulerian_bicycle_decomposition_splice_native(g: Bigraph) -> list[np.ndarray]:
    return _decompose_native_i32(g, "euler_decompose_splice")


def _decompose_native_i32(g: Bigraph, fn_name: str) -> list[np.ndarray]:
    import os

    from .. import native

    lib = native.load()
    E = g.n_edges
    if E == 0:
        return []
    out_off, out_edges = g.out_csr()
    dst = np.ascontiguousarray(g.dsts(), dtype=np.int32)
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int32)
    out_off = np.ascontiguousarray(out_off, dtype=np.int64)
    oe32 = np.ascontiguousarray(out_edges, dtype=np.int32)
    cycles_out = np.empty(E, dtype=np.int64)
    offsets_out = np.empty(E, dtype=np.int64)
    n_cycles = getattr(lib, fn_name)(
        g.n_nodes,
        E,
        native.as_i32_ptr(dst),
        native.as_i32_ptr(mirror),
        native.as_ll_ptr(out_off),
        native.as_i32_ptr(oe32),
        min(os.cpu_count() or 1, 8),
        native.as_ll_ptr(cycles_out),
        native.as_ll_ptr(offsets_out),
    )
    if n_cycles == -1:
        raise AssertionError("open walk in balanced bidirected graph")
    if n_cycles < 0:
        raise AssertionError(f"{fn_name} internal error {n_cycles}")
    end = int(offsets_out[n_cycles - 1]) if n_cycles else 0
    return Walks(cycles_out[:end], offsets_out[:n_cycles])


def _eulerian_bicycle_decomposition_native(g: Bigraph) -> list[np.ndarray]:
    from .. import native

    lib = native.load()
    E = g.n_edges
    if E == 0:
        return []
    out_off, out_edges = g.out_csr()
    src = np.ascontiguousarray(g.srcs(), dtype=np.int64)
    dst = np.ascontiguousarray(g.dsts(), dtype=np.int64)
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    out_off = np.ascontiguousarray(out_off, dtype=np.int64)
    out_edges = np.ascontiguousarray(out_edges, dtype=np.int64)
    cycles_out = np.empty(E, dtype=np.int64)
    offsets_out = np.empty(E, dtype=np.int64)
    p = native.as_ll_ptr
    n_cycles = lib.euler_decompose(
        g.n_nodes,
        E,
        p(src),
        p(dst),
        p(mirror),
        p(out_off),
        p(out_edges),
        p(cycles_out),
        p(offsets_out),
    )
    if n_cycles == -1:
        raise AssertionError("open walk in balanced bidirected graph")
    if n_cycles < 0:
        raise AssertionError(f"euler_decompose internal error {n_cycles}")
    res = []
    prev = 0
    for i in range(n_cycles):
        end = int(offsets_out[i])
        res.append(cycles_out[prev:end].copy())
        prev = end
    return res


def eulerian_bicycle_decomposition_py(g: Bigraph) -> list[np.ndarray]:
    """Pure-python reference implementation (oracle for the native pass).

    Three phases: (A) raw closed Hierholzer subtours (mirror consumption);
    (B) group subtours by shared binodes (union-find over min(v, mirror v)
    keys) — this is the mirror-connected-component relation; (C) stitch
    each group into ONE bicycle, merging subtours in BFS order and
    flipping the *incoming* subtour to its mirror representation when it
    only shares the mirror side.  Phase B/C guarantee the minimum
    one-bicycle-per-component decomposition even when a subtour bridges
    several previously separate subtours.
    """
    if g.n_edges == 0:
        return []
    return _stitch_subtours_py(g, _subtours_hierholzer_py(g))


def eulerian_bicycle_decomposition_pairing_py(g: Bigraph) -> list[np.ndarray]:
    """Pairing-variant oracle: subtours from the mirror-compatible arc
    pairing (see _subtours_pairing_py), stitched like the Hierholzer
    variant.  Oracle for native euler_decompose_pairing."""
    if g.n_edges == 0:
        return []
    return _stitch_subtours_py(g, _subtours_pairing_py(g))


def eulerian_bicycle_decomposition_splice_py(g: Bigraph) -> list[np.ndarray]:
    """Splice-variant oracle (native euler_decompose_splice): pairing pi
    plus ONE merged Hierholzer-rotation walk per mirror-connected
    component — no subtour arena or stitch phase.

    Why one walk reaches the whole component: marking e and e^1 together
    drops every cycle's mirror image, so an unvisited in-arc at a walk
    node always starts a fresh whole-cycle-unvisited pi-cycle; and every
    cycle pair incident to binode {v, mirror v} has an in-arc AT v among
    its two mirror representations (a cycle through mirror(v) has an
    out-arc there whose mirror is an in-arc at v), so the persistent
    cursor scan over in-arcs of visited nodes finds every incident pair
    in its correctly-flipped representation.
    """
    E = g.n_edges
    if E == 0:
        return []
    out_off, out_edges = g.out_csr()
    out_edges = np.asarray(out_edges, dtype=np.int64)
    mirror = g.mirror_node
    dst = g.dsts()
    pi = _pairing_pi_py(g)
    visited = np.zeros(E, dtype=bool)
    cursor = np.asarray(out_off[:-1], dtype=np.int64).copy()

    def mark(e0: int) -> None:
        cur = e0
        while True:
            visited[cur] = True
            visited[cur ^ 1] = True
            cur = int(pi[cur])
            if cur == e0:
                break

    cycles: list[np.ndarray] = []
    for e0 in range(E):
        if visited[e0]:
            continue
        mark(e0)
        out: list[int] = []
        cur = e0
        while True:
            out.append(cur)
            v = int(dst[cur])
            mv = int(mirror[v])
            c = cursor[mv]  # in-arcs at v live in mv's out slice
            end = int(out_off[mv + 1])
            while c < end:
                a2 = int(out_edges[c]) ^ 1
                if not visited[a2]:
                    mark(a2)
                    pi[cur], pi[a2] = pi[a2], pi[cur]
                c += 1
            cursor[mv] = c
            cur = int(pi[cur])
            if cur == e0:
                break
        cycles.append(np.asarray(out, dtype=np.int64))
    return cycles


LABEL_STEP = 64  # splitter density of the native label/emission passes


def eulerian_bicycle_decomposition_parsplice_py(g: Bigraph) -> list[np.ndarray]:
    """Parallel-splice oracle: bit-for-bit the native
    euler_decompose_parsplice (graphwalk.cpp), expressed serially.

    Spec (shared with the native pass — any change must touch both):

    1. pi = deterministic mirror-compatible arc pairing; rep[e] = the
       minimum arc id of e's pi-cycle; pairlabel(e) = min(rep[e],
       rep[e^1]) names the {cycle, mirror cycle} PAIR.
    2. Records: scanning nodes ascending and each node's in-arc list (the
       out-CSR slice of mirror[v], mirrored) in order, emit (first in-arc
       of the node's first pair, first in-arc of pair p) for every other
       distinct pair p at the node.  Kruskal over the records in order
       keeps one spanning-forest edge per pair beyond its component root.
    3. Orientation: a root pair (minimum pairlabel of its component, and
       every record-free singleton pair) emits the cycle containing its
       minimum arc; BFS from each root (roots ascending; a pair's tree
       edges in acceptance order) orients children: if the parent-side
       record arc is not on the parent's chosen cycle, flip BOTH record
       arcs a -> pi[a]^1 (the mirror representation's in-arc at
       mirror(v)); the child's chosen cycle is the flipped child arc's,
       and the edge becomes the splice swap pi[aP] <-> pi[aC].  Swaps are
       resolved against the pristine pi, then applied sequentially in
       generation order.
    4. Start set S: arcs e ≡ 0 (mod LABEL_STEP) on chosen cycles, plus
       pi'[x] for each swap arc x (post-swap successors).  Each final
       cycle containing a start is emitted piecewise: a piece runs from a
       start to the next start along pi'; pieces chain into cycles in
       ascending first-start order.  Pairs whose component has no start
       (splitterless singletons) are emitted last, ascending chosen rep.
    """
    E = g.n_edges
    if E == 0:
        return []
    pi = _pairing_pi_py(g)
    out_off, out_edges = g.out_csr()
    out_edges = np.asarray(out_edges, dtype=np.int64)
    mirror = g.mirror_node

    # 1. per-arc cycle representatives (min arc of the pi-cycle)
    rep = np.full(E, -1, dtype=np.int64)
    for e0 in range(E):
        if rep[e0] >= 0:
            continue
        cyc = [e0]
        cur = int(pi[e0])
        while cur != e0:
            cyc.append(cur)
            cur = int(pi[cur])
        m = min(cyc)
        for a in cyc:
            rep[a] = m

    def pairlabel(a: int) -> int:
        return min(int(rep[a]), int(rep[a ^ 1]))

    # 2. records + Kruskal spanning forest
    records: list[tuple[int, int]] = []
    for v in range(g.n_nodes):
        mv = int(mirror[v])
        sl = out_edges[int(out_off[mv]) : int(out_off[mv + 1])]
        if len(sl) < 2:
            continue
        first_arc: dict[int, int] = {}
        a0 = None
        for oe in sl.tolist():
            a = oe ^ 1
            pl = pairlabel(a)
            if pl not in first_arc:
                first_arc[pl] = a
                if a0 is None:
                    a0 = a
                else:
                    records.append((a0, a))

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    tree: list[tuple[int, int, int, int]] = []  # (a0, a, p0, p)
    rec_pairs: list[int] = []
    for a0, a in records:
        pA, pB = pairlabel(a0), pairlabel(a)
        rec_pairs += [pA, pB]
        if find(pA) != find(pB):
            parent[find(pA)] = find(pB)
            tree.append((a0, a, pA, pB))

    # 3. roots, BFS orientation, swaps
    roots: list[int] = []
    root_seen: set[int] = set()
    for p in sorted(set(rec_pairs)):
        f = find(p)
        if f not in root_seen:
            root_seen.add(f)
            roots.append(p)
    adj: dict[int, list[int]] = {}
    for i, (_, _, p0, p) in enumerate(tree):
        adj.setdefault(p0, []).append(i)
        adj.setdefault(p, []).append(i)

    chosen: dict[int, int] = {}  # pairlabel -> chosen cycle rep
    for r in np.unique(rep).tolist():
        pl = min(r, int(rep[r ^ 1]))
        chosen.setdefault(pl, pl)
    has_start: set[int] = set()  # chosen reps with an emission start
    swaps: list[tuple[int, int]] = []
    visited: set[int] = set()
    for r0 in roots:
        visited.add(r0)
        queue = [r0]
        qi = 0
        while qi < len(queue):
            P = queue[qi]
            qi += 1
            for ei in adj.get(P, ()):
                a0, a, p0, p = tree[ei]
                C = p if p0 == P else p0
                if C in visited:
                    continue
                visited.add(C)
                aP, aC = (a0, a) if p0 == P else (a, a0)
                if int(rep[aP]) != chosen[P]:
                    aP = int(pi[aP]) ^ 1
                    aC = int(pi[aC]) ^ 1
                    assert int(rep[aP]) == chosen[P]
                chosen[C] = int(rep[aC])
                has_start.add(chosen[P])
                has_start.add(chosen[C])
                swaps.append((aP, aC))
                queue.append(C)
    for x, y in swaps:
        pi[x], pi[y] = pi[y], pi[x]

    # 4. start set, pieces, assembly, leftovers
    S: set[int] = set()
    for e in range(0, E, LABEL_STEP):
        r = int(rep[e])
        if chosen[min(r, int(rep[e ^ 1]))] == r:
            S.add(e)
            has_start.add(r)
    for x, y in swaps:
        S.add(int(pi[x]))
        S.add(int(pi[y]))

    starts = sorted(S)
    piece: dict[int, tuple[list[int], int]] = {}
    for s in starts:
        seq = [s]
        cur = int(pi[s])
        while cur not in S:
            seq.append(cur)
            cur = int(pi[cur])
        piece[s] = (seq, cur)

    cycles: list[np.ndarray] = []
    done: set[int] = set()
    for s in starts:
        if s in done:
            continue
        seq: list[int] = []
        j = s
        while True:
            sq, nx = piece[j]
            seq += sq
            done.add(j)
            j = nx
            if j == s:
                break
        cycles.append(np.asarray(seq, dtype=np.int64))
    for r in sorted(set(chosen.values())):
        if r in has_start:
            continue
        seq = [r]
        cur = int(pi[r])
        while cur != r:
            seq.append(cur)
            cur = int(pi[cur])
        cycles.append(np.asarray(seq, dtype=np.int64))
    assert sum(len(c) for c in cycles) == E // 2
    return cycles


def _pairing_pi_py(g: Bigraph) -> np.ndarray:
    """The deterministic mirror-compatible arc pairing pi (int64 [E]).

    At each binode, the i-th in-arc pairs with the i-th out-arc, where the
    in-arcs at v are the mirrors of the out-arcs at mirror(v) in CSR
    order; self-mirror nodes pair their in-arcs by a fixpoint-free
    involution (adjacent CSR ranks).  pi never sends an arc to its own
    mirror, so no pi-cycle equals its own mirror image (a self-mirror
    cycle would force a reflection fixed point m(e)=e — impossible — or
    an adjacent pair pi(e)=m(e) — forbidden); cycles come in mirror
    pairs.
    """
    E = g.n_edges
    out_off, out_edges = g.out_csr()
    out_edges = np.asarray(out_edges, dtype=np.int64)
    mirror = g.mirror_node
    src = g.srcs()

    v_of_pos = src[out_edges]  # node of each CSR position (sorted by src)
    rank = np.arange(E, dtype=np.int64) - out_off[v_of_pos]
    mv = mirror[v_of_pos].astype(np.int64)
    sm = mv == v_of_pos

    outdeg = out_off[1:] - out_off[:-1]
    if not np.array_equal(outdeg, outdeg[mirror]):
        raise AssertionError("open walk in balanced bidirected graph")
    sm_nodes = np.flatnonzero(mirror == np.arange(g.n_nodes))
    if np.any(outdeg[sm_nodes] % 2):
        raise AssertionError("open walk in balanced bidirected graph")

    pi = np.full(E, -1, dtype=np.int64)
    ns = ~sm
    # pi[mirror of i-th out-arc at mv] = i-th out-arc at v (both views of
    # the same pairing, so writing it for every non-self-mirror v is
    # idempotent)
    mpos = out_off[mv[ns]] + rank[ns]
    pi[out_edges[mpos] ^ 1] = out_edges[ns]
    # self-mirror: adjacent-rank involution
    smp = np.flatnonzero(sm)
    even = smp[rank[smp] % 2 == 0]
    pi[out_edges[even] ^ 1] = out_edges[even + 1]
    pi[out_edges[even + 1] ^ 1] = out_edges[even]
    assert not np.any(pi < 0)
    assert not np.any(pi == np.arange(E) ^ 1), "pairing maps arc to mirror"
    return pi


def _subtours_pairing_py(g: Bigraph) -> list[list[int]]:
    """Closed subtours of the arc pairing: scanning start arcs ascending
    and marking e and e^1 together keeps exactly one cycle per mirror
    pair — each biedge covered exactly once."""
    E = g.n_edges
    pi = _pairing_pi_py(g)

    visited = np.zeros(E, dtype=bool)
    tours: list[list[int]] = []
    for e0 in range(E):
        if visited[e0]:
            continue
        tour = []
        cur = e0
        while True:
            tour.append(cur)
            visited[cur] = True
            visited[cur ^ 1] = True
            cur = int(pi[cur])
            if cur == e0:
                break
        tours.append(tour)
    return tours


def _subtours_hierholzer_py(g: Bigraph) -> list[list[int]]:
    E = g.n_edges
    out_off, out_edges = g.out_csr()
    dst = g.dsts()
    src = g.srcs()

    used = np.zeros(E, dtype=bool)
    cursor = out_off[:-1].copy()

    def next_unused_out(v: int) -> int:
        c = cursor[v]
        end = out_off[v + 1]
        while c < end and used[out_edges[c]]:
            c += 1
        cursor[v] = c
        return int(out_edges[c]) if c < end else -1

    # -- Phase A: raw closed subtours
    tours: list[list[int]] = []
    for e0 in range(E):
        if used[e0]:
            continue
        tour = [e0]
        used[e0] = True
        used[e0 ^ 1] = True
        start = int(src[e0])
        cur = int(dst[e0])
        while True:
            while cur != start:
                e = next_unused_out(cur)
                assert e >= 0, "open walk in balanced bidirected graph"
                tour.append(e)
                used[e] = True
                used[e ^ 1] = True
                cur = int(dst[e])
            e = next_unused_out(start)
            if e < 0:
                break
            tour.append(e)
            used[e] = True
            used[e ^ 1] = True
            cur = int(dst[e])
        tours.append(tour)
    return tours


def _stitch_subtours_py(g: Bigraph, tours: list[list[int]]) -> list[np.ndarray]:
    """Phases B+C: group subtours by shared binodes, stitch each group
    into one bicycle (shared with both subtour generators)."""
    E = g.n_edges
    dst = g.dsts()
    mirror = g.mirror_node

    # -- Phase B: group subtours by shared binodes
    binode_tours: dict[int, list[int]] = {}
    for ti, tour in enumerate(tours):
        for e in tour:
            v = int(dst[e])
            b = min(v, int(mirror[v]))
            lst = binode_tours.setdefault(b, [])
            if not lst or lst[-1] != ti:
                lst.append(ti)

    # -- Phase C: stitch each group into one bicycle (BFS order)
    nxt = np.full(E, -1, dtype=np.int64)
    visited = [False] * len(tours)
    cycles: list[np.ndarray] = []
    for t0 in range(len(tours)):
        if visited[t0]:
            continue
        visited[t0] = True
        acc = tours[t0]
        for a, b in zip(acc, acc[1:]):
            nxt[a] = b
        nxt[acc[-1]] = acc[0]
        occ: dict[int, int] = {}
        for e in acc:
            occ.setdefault(int(dst[e]), e)
        total_len = len(acc)
        head = acc[0]

        # BFS over the shared-binode relation
        queue = [t0]
        qi = 0
        while qi < len(queue):
            t = queue[qi]
            qi += 1
            for e in tours[t]:
                v = int(dst[e])
                b = min(v, int(mirror[v]))
                for tn in binode_tours.get(b, ()):
                    if visited[tn]:
                        continue
                    visited[tn] = True
                    queue.append(tn)
                    sub = tours[tn]
                    # find the splice node: a node of `sub` (direct or via
                    # the mirror representation) present in `occ`
                    anchor = -1
                    for se in sub:
                        u = int(dst[se])
                        if u in occ:
                            anchor = occ[u]
                            break
                        if int(mirror[u]) in occ:
                            # flip the incoming subtour: reverse + e^1
                            sub = [x ^ 1 for x in reversed(sub)]
                            anchor = occ[int(mirror[u])]
                            break
                    assert anchor >= 0, "BFS neighbor without shared node"
                    av = int(dst[anchor])
                    sub_anchor = next(x for x in sub if int(dst[x]) == av)
                    for a2, b2 in zip(sub, sub[1:]):
                        nxt[a2] = b2
                    nxt[sub[-1]] = sub[0]
                    nxt[anchor], nxt[sub_anchor] = (
                        nxt[sub_anchor],
                        nxt[anchor],
                    )
                    for x in sub:
                        occ.setdefault(int(dst[x]), x)
                    tours[tn] = sub  # flipped representation for later BFS
                    total_len += len(sub)

        chain = np.empty(total_len, dtype=np.int64)
        e = head
        for i in range(total_len):
            chain[i] = e
            e = int(nxt[e])
        assert e == head, "stitched chain is not circular"
        cycles.append(chain)
    return cycles


def binode_wcc_labels(g: Bigraph) -> tuple[np.ndarray, int]:
    """Mirror-connected (binode) component labels: per-node int32 labels
    of the graph whose edges are the biedge endpoints plus the (v,
    mirror v) contractions — exactly the components the Eulerian
    decomposition emits one bicycle for.  Native union-find
    (graphwalk.cpp:wcc_labels); one endpoint row per biedge PAIR (the
    mirror arc connects the mirrored endpoints, already contracted).
    Reference analog of the WCC split at
    /root/reference/src/implementation/matchtigs/mod.rs:555-576."""
    from .. import native

    lib = native.load()
    n = g.n_nodes
    src_pairs = np.ascontiguousarray(g.srcs()[0::2], dtype=np.int32)
    dst_pairs = np.ascontiguousarray(g.dsts()[0::2], dtype=np.int32)
    mirr = np.ascontiguousarray(g.mirror_node, dtype=np.int32)
    src_all = np.concatenate([src_pairs, np.arange(n, dtype=np.int32)])
    dst_all = np.concatenate([dst_pairs, mirr])
    labels = np.empty(n, dtype=np.int32)
    n_comps = lib.wcc_labels(
        n,
        len(src_all),
        native.as_i32_ptr(np.ascontiguousarray(src_all)),
        native.as_i32_ptr(np.ascontiguousarray(dst_all)),
        native.as_i32_ptr(labels),
    )
    return labels, int(n_comps)


def wcc_part_assignment(
    g: Bigraph, n_parts: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic component->part assignment for the distributed
    euler+break: components ordered by descending biedge count (ties by
    label id) are dealt round-robin over parts, so every part sees a
    similar size profile.  Returns (per-node component labels,
    per-component part ids)."""
    labels, n_comps = binode_wcc_labels(g)
    cl = labels[g.srcs()[0::2]]  # component of each biedge pair
    sizes = np.bincount(cl, minlength=n_comps)
    order = np.lexsort((np.arange(n_comps), -sizes))
    part_of = np.empty(n_comps, dtype=np.int32)
    part_of[order] = np.arange(n_comps, dtype=np.int32) % n_parts
    if logger.isEnabledFor(logging.INFO):
        loads = np.bincount(part_of[cl], minlength=n_parts)
        frac = loads.max() / max(1, loads.sum())
        logger.info(
            "WCC euler distribution: %d components over %d parts, "
            "per-part biedge loads %s%s",
            int((sizes > 0).sum()),
            n_parts,
            loads.tolist(),
            (
                f" (component-capped: largest part holds {100 * frac:.0f}%"
                " of the biedges)"
                if frac > 0.6 and n_parts > 1
                else ""
            ),
        )
    return labels, part_of


def decompose_break_wcc_part(
    g: Bigraph, k: int, n_parts: int, part_id: int
) -> tuple[Walks, np.ndarray]:
    """Distributed per-WCC Eulerian decomposition + cycle break: this
    part's slice of the final tigs, plus one int64 merge key per tig.

    The balanced graph's mirror-connected components are dealt over
    ``n_parts`` (see :func:`wcc_part_assignment`); each part extracts its
    components as a subgraph under an ORDER-PRESERVING arc/node
    renumbering and runs the native parsplice with the global arc ids
    driving the splitter start set
    (graphwalk.cpp:euler_decompose_parsplice_gids).  Because every other
    parsplice phase is per-component and order-isomorphic under the
    renumbering, each slice's cycles are exactly the global run's cycles
    for those components — same content, rotation, and relative order —
    so concatenating all parts and stable-sorting by the per-cycle key
    ``class << 32 | first_arc_gid`` (class 0 = piece-assembled, 1 =
    splitterless leftover) reproduces the single-host tig stream
    byte-for-byte (:func:`merge_tig_parts`; the multiplicity of work the
    reference distributes per-WCC at matchtigs/mod.rs:555-576).

    Cycle break runs on the slice too
    (graphwalk.cpp:break_cycles_flat_cyc tags each tig with its source
    cycle); the returned keys are per-TIG (tigs of one cycle share its
    key and stay in emission order under a stable merge sort).
    """
    import os

    from .. import native

    lib = native.load()
    labels, part_of = wcc_part_assignment(g, n_parts)
    src = g.srcs()
    cl = labels[src[0::2]]
    pair_ids = np.flatnonzero(part_of[cl] == part_id).astype(np.int64)
    empty = (
        Walks(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)),
        np.empty(0, dtype=np.int64),
    )
    if not len(pair_ids):
        return empty
    arc_ids = np.empty(2 * len(pair_ids), dtype=np.int64)
    arc_ids[0::2] = 2 * pair_ids
    arc_ids[1::2] = 2 * pair_ids + 1

    # order-preserving subgraph renumbering (nodes sorted ascending; the
    # arc set is mirror- and endpoint-closed by construction)
    sub_src = src[arc_ids]
    sub_dst = g.dsts()[arc_ids]
    nodes = np.unique(sub_src)
    lsrc = np.searchsorted(nodes, sub_src)
    ldst = np.ascontiguousarray(
        np.searchsorted(nodes, sub_dst), dtype=np.int32
    )
    lmirror = np.ascontiguousarray(
        np.searchsorted(nodes, np.asarray(g.mirror_node)[nodes]),
        dtype=np.int32,
    )
    n_loc = len(nodes)
    E = len(arc_ids)
    out_off = np.zeros(n_loc + 1, dtype=np.int64)
    np.cumsum(np.bincount(lsrc, minlength=n_loc), out=out_off[1:])
    out_edges = np.ascontiguousarray(
        np.argsort(lsrc, kind="stable"), dtype=np.int32
    )

    cycles_out = np.empty(E, dtype=np.int64)
    offsets_out = np.empty(E, dtype=np.int64)
    n_assembled = np.zeros(1, dtype=np.int64)
    p = native.as_ll_ptr
    n_cycles = lib.euler_decompose_parsplice_gids(
        n_loc,
        E,
        native.as_i32_ptr(ldst),
        native.as_i32_ptr(lmirror),
        p(out_off),
        native.as_i32_ptr(out_edges),
        min(os.cpu_count() or 1, 8),
        p(np.ascontiguousarray(arc_ids)),
        p(cycles_out),
        p(offsets_out),
        p(n_assembled),
    )
    if n_cycles < 0:
        raise AssertionError(
            f"euler_decompose_parsplice_gids error {n_cycles}"
        )
    if n_cycles == 0:
        return empty
    end = int(offsets_out[n_cycles - 1])
    flat_global = arc_ids[cycles_out[:end]]
    offsets = offsets_out[:n_cycles]
    starts = np.concatenate([[0], offsets[:-1]])
    cycle_keys = (
        (np.arange(n_cycles, dtype=np.int64) >= int(n_assembled[0])).astype(
            np.int64
        )
        << 32
    ) | flat_global[starts]

    weights = np.ascontiguousarray(g.weights(), dtype=np.int64)
    dmask = np.ascontiguousarray(g.is_dummy(), dtype=np.int8)
    flat_c = np.ascontiguousarray(flat_global)
    offs_c = np.ascontiguousarray(offsets)
    tigs_out = np.empty(end, dtype=np.int64)
    tig_off = np.empty(max(end, 1), dtype=np.int64)
    tig_cycle = np.empty(max(end, 1), dtype=np.int64)
    n_tigs = lib.break_cycles_flat_cyc(
        n_cycles,
        p(flat_c),
        p(offs_c),
        p(weights),
        native.as_i8_ptr(dmask),
        k,
        p(tigs_out),
        p(tig_off),
        p(tig_cycle),
    )
    t_end = int(tig_off[n_tigs - 1]) if n_tigs else 0
    return (
        Walks(tigs_out[:t_end], tig_off[:n_tigs]),
        cycle_keys[tig_cycle[:n_tigs]],
    )


def merge_tig_parts(parts: list[tuple[Walks, np.ndarray]]) -> Walks:
    """Merge per-part tig slices into the global single-host tig order:
    stable sort by the per-tig merge keys (unique per cycle; stability
    keeps each cycle's tigs in emission order).  Parts must cover
    disjoint component sets (any part order works — keys are global)."""
    flats = [w.flat for w, _ in parts]
    offs = [w.offsets for w, _ in parts]
    keys = np.concatenate([k for _, k in parts]) if parts else np.empty(0)
    if not len(keys):
        return Walks(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    lengths = np.concatenate(
        [np.diff(o, prepend=np.int64(0)) for o in offs]
    )
    flat_all = np.concatenate(flats)
    starts_all = np.cumsum(lengths) - lengths
    perm = np.argsort(keys, kind="stable")
    L = lengths[perm]
    new_off = np.cumsum(L)
    new_starts = new_off - L
    idx = (
        np.arange(len(flat_all), dtype=np.int64)
        - np.repeat(new_starts, L)
        + np.repeat(starts_all[perm], L)
    )
    return Walks(flat_all[idx], new_off)


def break_cycles(g: Bigraph, cycles: list[np.ndarray], k: int) -> Walks:
    """Rotate each bicycle so its longest dummy is first, then break at
    breaking dummies (weight >= k) and at a dummy in position 0.

    Faithful to /root/reference/src/implementation/eulertigs/mod.rs:126-186.
    Dispatches to the native flat pass (graphwalk.cpp:break_cycles_flat);
    break_cycles_py is the oracle (the vectorized python still paid ~2s
    of gathers/rolls/slice objects at a 19M-edge bicycle).
    """
    try:
        from .. import native

        lib = native.load()
    except ImportError:
        logger.warning("native graphwalk unavailable; using python fallback")
        return Walks.from_list(break_cycles_py(g, cycles, k))
    if not len(cycles):
        return Walks(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    wk = Walks.from_list(cycles)  # no-op when the decomposition's flat form
    flat = np.ascontiguousarray(wk.flat, dtype=np.int64)
    cycle_off = np.ascontiguousarray(wk.offsets, dtype=np.int64)
    weights = np.ascontiguousarray(g.weights(), dtype=np.int64)
    dmask = np.ascontiguousarray(g.is_dummy(), dtype=np.int8)
    E = len(flat)
    tigs_out = np.empty(E, dtype=np.int64)
    tig_off = np.empty(max(E, 1), dtype=np.int64)
    import os

    n_tigs = lib.break_cycles_flat_mt(
        len(cycles),
        native.as_ll_ptr(flat),
        native.as_ll_ptr(cycle_off),
        native.as_ll_ptr(weights),
        native.as_i8_ptr(dmask),
        k,
        min(os.cpu_count() or 1, 8),
        native.as_ll_ptr(tigs_out),
        native.as_ll_ptr(tig_off),
        None,
        0,
    )
    end = int(tig_off[n_tigs - 1]) if n_tigs else 0
    return Walks(tigs_out[:end], tig_off[:n_tigs])


def break_cycles_py(
    g: Bigraph, cycles: list[np.ndarray], k: int
) -> list[np.ndarray]:
    """Python oracle for the native cycle breaker."""
    weights = g.weights()
    dummies = g.is_dummy()
    tigs: list[np.ndarray] = []

    for cycle in cycles:
        w = weights[cycle]
        d = dummies[cycle]
        dummy_w = np.where(d, w, 0)
        longest = int(dummy_w.max(initial=0))
        if longest > 0:
            # first index attaining the max, matching the reference's
            # strictly-greater scan
            idx = int(np.argmax(dummy_w))
            cycle = np.roll(cycle, -idx)
            d = np.roll(d, -idx)
            w = np.roll(w, -idx)

        breaks = d & (w >= k)
        if len(breaks):
            breaks[0] |= d[0]
        bpos = np.flatnonzero(breaks)
        # Segments between consecutive breaks, vectorized: the original
        # per-break python loop plus a per-tig assert loop cost seconds at
        # ~1M tigs (19M-edge bicycle at 60M bases).
        starts = np.concatenate([[0], bpos + 1])
        ends = np.concatenate([bpos, [len(cycle)]])
        # Tail rule: a trailing non-breaking dummy is dropped from the
        # last segment (eulertigs/mod.rs:126-186).
        if starts[-1] < len(cycle) and len(d) and d[-1]:
            ends[-1] = len(cycle) - 1
        keep = starts < ends
        starts, ends = starts[keep], ends[keep]
        assert not dummies[cycle[starts]].any()
        assert not dummies[cycle[ends - 1]].any()
        tigs.extend(
            cycle[s:e] for s, e in zip(starts.tolist(), ends.tolist())
        )
    return tigs
