"""Native C++ graph-walk passes vs their python oracles."""

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.pathtigs import (
    _compute_pathtigs_native,
    compute_pathtigs_py,
)
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.ops import euler

CASES = [
    dict(genome_length=3000, k=9, seed=0),
    dict(genome_length=6000, k=11, seed=1),
    dict(genome_length=2500, k=7, seed=2),
]


def _balanced_graph(case):
    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    euler.make_eulerian_with_breaking_edges(g, k, 0)
    return g


@pytest.mark.parametrize("case", CASES)
def test_euler_native_matches_python(case):
    g = _balanced_graph(case)
    native_cycles = euler._eulerian_bicycle_decomposition_native(g)
    py_cycles = euler.eulerian_bicycle_decomposition_py(g)
    assert len(native_cycles) == len(py_cycles)
    # identical traversal (same deterministic edge-order walk)
    for a, b in zip(native_cycles, py_cycles):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("case", CASES)
def test_euler_pairing_native_matches_python(case):
    g = _balanced_graph(case)
    native_cycles = euler._eulerian_bicycle_decomposition_pairing_native(g)
    py_cycles = euler.eulerian_bicycle_decomposition_pairing_py(g)
    assert len(native_cycles) == len(py_cycles)
    for a, b in zip(native_cycles, py_cycles):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("case", CASES)
def test_euler_splice_native_matches_python(case):
    g = _balanced_graph(case)
    native_cycles = euler._eulerian_bicycle_decomposition_splice_native(g)
    py_cycles = euler.eulerian_bicycle_decomposition_splice_py(g)
    assert len(native_cycles) == len(py_cycles)
    for a, b in zip(native_cycles, py_cycles):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("case", CASES)
def test_euler_parsplice_native_matches_python(case):
    g = _balanced_graph(case)
    native_cycles = euler._decompose_native_i32(g, "euler_decompose_parsplice")
    py_cycles = euler.eulerian_bicycle_decomposition_parsplice_py(g)
    assert len(native_cycles) == len(py_cycles)
    for a, b in zip(native_cycles, py_cycles):
        assert np.array_equal(a, b)


def _random_multi_component(seed):
    """Random balanced multi-component bigraph: clustered closed chains
    (some tiny — splitterless pi-cycles) plus self-mirror nodes."""
    from matchtigs_tpu.graph.bigraph import Bigraph

    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(1, 8))
    sizes = rng.integers(2, 30, n_clusters)
    n_sm = int(rng.integers(0, 4))
    n_pairs = int(sizes.sum())
    n = 2 * n_pairs + n_sm
    mirror = np.arange(n, dtype=np.int32)
    mirror[: 2 * n_pairs] ^= 1
    g = Bigraph(n, mirror)
    base = 0
    did = 0
    for sz in sizes:
        nodes = np.arange(base, base + 2 * int(sz))
        base += 2 * int(sz)
        for _ in range(int(rng.integers(1, 4))):
            m = int(rng.integers(1, 3 * int(sz)))
            chain = rng.choice(nodes, size=m, replace=True)
            for i in range(m):
                u, v = int(chain[i]), int(chain[(i + 1) % m])
                g.add_biedge_pair(u, v, int(rng.integers(1, 5)), -1, True, did)
                did += 1
    for s in range(2 * n_pairs, n):
        v = int(rng.integers(0, n))
        g.add_biedge_pair(s, v, 1, -1, True, did)
        did += 1
        g.add_biedge_pair(v, s, 1, -1, True, did)
        did += 1
    if not euler.decomposes_into_eulerian_bicycles(g):
        euler.make_eulerian_with_breaking_edges(g, 5, did)
    return g


@pytest.mark.parametrize("seed", range(40))
def test_euler_parsplice_fuzz_multi_component(seed):
    """Native parsplice == oracle bit-for-bit on random multi-component
    graphs; component count matches the serial splice; each biedge
    covered exactly once in exactly one orientation; every cycle a
    closed walk."""
    g = _random_multi_component(seed)
    nat = euler._decompose_native_i32(g, "euler_decompose_parsplice")
    ora = euler.eulerian_bicycle_decomposition_parsplice_py(g)
    assert len(nat) == len(ora)
    for i in range(len(nat)):
        assert np.array_equal(np.asarray(nat[i]), ora[i])
    spl = euler._decompose_native_i32(g, "euler_decompose_splice")
    assert len(spl) == len(nat)
    cov = np.zeros(g.n_edges, dtype=bool)
    dst, src = g.dsts(), g.srcs()
    for i in range(len(nat)):
        c = np.asarray(nat[i])
        assert not cov[np.minimum(c, c ^ 1)].any()
        cov[np.minimum(c, c ^ 1)] = True
        assert np.array_equal(dst[c], src[np.roll(c, -1)])
    assert cov[::2].all()


@pytest.mark.parametrize("case", CASES)
def test_euler_splice_equivalent_to_pairing(case):
    g = _balanced_graph(case)
    c_s = euler.eulerian_bicycle_decomposition(g, method="splice")
    c_p = euler.eulerian_bicycle_decomposition(g, method="pairing")
    assert len(c_s) == len(c_p)  # one bicycle per mirror component
    e_s = np.concatenate(c_s)
    e_p = np.concatenate(c_p)
    assert np.array_equal(
        np.sort(np.minimum(e_s, e_s ^ 1)), np.sort(np.minimum(e_p, e_p ^ 1))
    )
    dst, src = g.dsts(), g.srcs()
    for cyc in c_s:
        assert np.array_equal(dst[cyc], src[np.roll(cyc, -1)])


@pytest.mark.parametrize("case", CASES)
def test_euler_pairing_equivalent_to_hierholzer(case):
    """Same bicycle count (one per mirror-connected component), same
    biedge coverage, every cycle a closed mirror-consuming walk."""
    g = _balanced_graph(case)
    c_p = euler.eulerian_bicycle_decomposition(g, method="pairing")
    c_h = euler.eulerian_bicycle_decomposition(g, method="hierholzer")
    assert len(c_p) == len(c_h)

    def biedge_cover(cycles):
        e = np.concatenate(cycles)
        return np.sort(np.minimum(e, e ^ 1))

    # each biedge exactly once, in exactly one orientation
    cover = biedge_cover(c_p)
    assert np.array_equal(cover, biedge_cover(c_h))
    assert np.array_equal(cover, np.arange(0, g.n_edges, 2))
    dst, src = g.dsts(), g.srcs()
    for cyc in c_p:
        assert np.array_equal(dst[cyc], src[np.roll(cyc, -1)])


def test_euler_pairing_self_mirror_and_parallel_edges():
    """Self-mirror binodes (odd k-1 palindromes) and parallel biedges
    exercise the fixpoint-free involution and duplicate-slot branches."""
    from matchtigs_tpu.graph.bigraph import Bigraph

    # self-mirror node 2 with two parallel self-loop biedges plus a
    # 2-cycle through an ordinary mirror pair
    mirror = np.array([1, 0, 2], dtype=np.int32)
    g = Bigraph(3, mirror.copy())
    g.add_biedge_pair(2, 2, 1, 0, True, 0)
    g.add_biedge_pair(2, 2, 1, 1, True, 0)
    g.add_biedge_pair(2, 0, 1, 2, True, 0)
    g.add_biedge_pair(0, 2, 1, 3, True, 0)
    assert euler.decomposes_into_eulerian_bicycles(g)
    c_n = euler._eulerian_bicycle_decomposition_pairing_native(g)
    c_p = euler.eulerian_bicycle_decomposition_pairing_py(g)
    assert len(c_n) == len(c_p)
    for a, b in zip(c_n, c_p):
        assert np.array_equal(a, b)
    e = np.concatenate(c_n)
    assert np.array_equal(
        np.sort(np.minimum(e, e ^ 1)), np.arange(0, g.n_edges, 2)
    )


@pytest.mark.parametrize("case", CASES)
def test_pathtigs_native_matches_python(case):
    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    native_walks = _compute_pathtigs_native(g)
    py_walks = compute_pathtigs_py(g)
    assert len(native_walks) == len(py_walks)
    for a, b in zip(native_walks, py_walks):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("case", CASES)
def test_greedy_accept_native_matches_python(case):
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, collect_candidates
    from matchtigs_tpu.ops.matching import (
        _greedy_accept_native,
        greedy_accept_scan_py,
        unbalanced_nodes,
    )

    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    out_nodes, in_mask, mult = unbalanced_nodes(g)
    cands = collect_candidates(
        g, out_nodes, in_mask, k, GreedytigConfig(k=k)
    ).to_triples()
    order = np.lexsort((cands[:, 1], cands[:, 0], cands[:, 2]))
    cands = np.ascontiguousarray(cands[order])
    m1 = mult.copy()
    m2 = mult.copy()
    a_native = _greedy_accept_native(
        g,
        np.arange(len(cands), dtype=np.int64),  # identity: already sorted
        np.ascontiguousarray(cands[:, 0]),
        np.ascontiguousarray(cands[:, 1]),
        np.ascontiguousarray(cands[:, 2]),
        m1,
    )
    a_py = greedy_accept_scan_py(g, cands, m2)
    assert np.array_equal(a_native, a_py)
    assert np.array_equal(m1, m2)


@pytest.mark.parametrize("case", CASES)
def test_speller_native_matches_python(case):
    from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
    from matchtigs_tpu.io.writers import spell_walk, spell_walks_flat

    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    flat, offsets = spell_walks_flat(g, tigs, store, k)
    prev = 0
    for tig, end in zip(tigs, offsets.tolist()):
        expected = spell_walk(g, tig, store, k)
        assert np.array_equal(flat[prev:end], expected)
        prev = end


@pytest.mark.parametrize("case", CASES)
def test_balancer_native_matches_python(case):
    store, _, k = testing.make_unitig_store(**case)
    g1 = build_bigraph_from_unitigs(store, k)
    euler._make_eulerian_native(g1, k, 0)
    g2 = build_bigraph_from_unitigs(store, k)
    euler.make_eulerian_with_breaking_edges_py(g2, k, 0)
    assert g1.n_edges == g2.n_edges
    e1 = np.stack([g1.srcs(), g1.dsts(), g1.weights(), g1.dummy_ids()], axis=1)
    e2 = np.stack([g2.srcs(), g2.dsts(), g2.weights(), g2.dummy_ids()], axis=1)
    assert np.array_equal(e1, e2)
    assert euler.decomposes_into_eulerian_bicycles(g1)


def test_balancer_native_self_mirror_unit():
    """The reference's unit-test graph through the native balancer."""
    from matchtigs_tpu.graph.bigraph import Bigraph

    mirror = np.array([1, 0, 2, 3, 5, 4, 6, 7], dtype=np.int32)
    g1 = Bigraph(8, mirror)
    g2 = Bigraph(8, mirror.copy())
    for g in (g1, g2):
        g.add_biedge_pair(0, 3, 0, 1, True, 1)
        g.add_biedge_pair(2, 0, 0, 2, True, 2)
        g.add_biedge_pair(6, 4, 0, 3, True, 3)
        g.add_biedge_pair(7, 4, 0, 4, True, 4)
    euler._make_eulerian_native(g1, 4, 5)
    euler.make_eulerian_with_breaking_edges_py(g2, 4, 5)
    assert np.array_equal(
        np.stack([g1.srcs(), g1.dsts()], axis=1),
        np.stack([g2.srcs(), g2.dsts()], axis=1),
    )
    assert euler.decomposes_into_eulerian_bicycles(g1)


def _bridge_graph():
    """Two 2-biedge cycles A (nodes 0,1) and B (2,3) plus a bridge cycle
    (1<->3).  Hierholzer discovery order yields three separate subtours
    where the bridge shares nodes with BOTH A and B; the decomposition
    must stitch everything into ONE bicycle (regression: only the first
    anchor used to be spliced)."""
    from matchtigs_tpu.graph.bigraph import Bigraph

    mirror = np.array([4, 5, 6, 7, 0, 1, 2, 3], dtype=np.int32)
    g = Bigraph(8, mirror)
    g.add_biedge_pair(0, 1, 1, 0, True, 0)  # P1
    g.add_biedge_pair(1, 0, 1, 1, True, 0)  # P2
    g.add_biedge_pair(2, 3, 1, 2, True, 0)  # P3
    g.add_biedge_pair(3, 2, 1, 3, True, 0)  # P4
    g.add_biedge_pair(1, 3, 1, 4, True, 0)  # P5 (bridge)
    g.add_biedge_pair(3, 1, 1, 5, True, 0)  # P6 (bridge)
    assert g.verify_node_pairing() and g.verify_edge_mirror_property()
    assert euler.decomposes_into_eulerian_bicycles(g)
    return g


def test_bridging_subtour_single_bicycle_python():
    g = _bridge_graph()
    cycles = euler.eulerian_bicycle_decomposition_py(g)
    assert len(cycles) == 1, [c.tolist() for c in cycles]
    assert len(cycles[0]) == 6  # six biedges, one traversal each
    # valid circular walk
    c = cycles[0]
    assert np.all(g.dsts()[c[:-1]] == g.srcs()[c[1:]])
    assert g.dsts()[c[-1]] == g.srcs()[c[0]]


def test_bridging_subtour_single_bicycle_native():
    g = _bridge_graph()
    cycles = euler._eulerian_bicycle_decomposition_native(g)
    py = euler.eulerian_bicycle_decomposition_py(_bridge_graph())
    assert len(cycles) == 1
    assert np.array_equal(cycles[0], py[0])


def test_bridging_subtour_single_bicycle_splice_and_pairing():
    """The mirror-side bridge must still merge into ONE bicycle under
    both pairing-based decompositions."""
    for method in ("splice", "pairing"):
        g = _bridge_graph()
        cycles = euler.eulerian_bicycle_decomposition(g, method=method)
        assert len(cycles) == 1, method
        c = cycles[0]
        assert len(c) == 6
        assert np.all(g.dsts()[c[:-1]] == g.srcs()[c[1:]])
        assert g.dsts()[c[-1]] == g.srcs()[c[0]]


def test_euler_splice_self_mirror_and_parallel_edges():
    from matchtigs_tpu.graph.bigraph import Bigraph

    mirror = np.array([1, 0, 2], dtype=np.int32)
    g = Bigraph(3, mirror.copy())
    g.add_biedge_pair(2, 2, 1, 0, True, 0)
    g.add_biedge_pair(2, 2, 1, 1, True, 0)
    g.add_biedge_pair(2, 0, 1, 2, True, 0)
    g.add_biedge_pair(0, 2, 1, 3, True, 0)
    assert euler.decomposes_into_eulerian_bicycles(g)
    c_n = euler._eulerian_bicycle_decomposition_splice_native(g)
    c_p = euler.eulerian_bicycle_decomposition_splice_py(g)
    assert len(c_n) == len(c_p)
    for a, b in zip(c_n, c_p):
        assert np.array_equal(a, b)
    e = np.concatenate(c_n)
    assert np.array_equal(
        np.sort(np.minimum(e, e ^ 1)), np.arange(0, g.n_edges, 2)
    )


def test_balancer_native_parallel_biedges():
    """Imbalance is bounded by EDGE count, not node count: 10 parallel
    biedges between one binode pair need 10 breaking pairs on a 4-node
    graph (regression: the native output buffer was sized 2*n_nodes and
    overflowed / segfaulted here)."""
    from matchtigs_tpu.graph.bigraph import Bigraph

    mirror = np.array([1, 0, 3, 2], dtype=np.int32)
    g1 = Bigraph(4, mirror)
    g2 = Bigraph(4, mirror.copy())
    for g in (g1, g2):
        for i in range(10):
            g.add_biedge_pair(0, 2, 1, i, True, 0)
    euler._make_eulerian_native(g1, 5, 0)
    euler.make_eulerian_with_breaking_edges_py(g2, 5, 0)
    assert g1.n_edges == g2.n_edges == 40  # 10 original + 10 breaking pairs
    assert np.array_equal(
        np.stack([g1.srcs(), g1.dsts(), g1.weights()], axis=1),
        np.stack([g2.srcs(), g2.dsts(), g2.weights()], axis=1),
    )
    assert euler.decomposes_into_eulerian_bicycles(g1)


def test_balancer_native_capacity_sentinel():
    """Passing an undersized buffer returns -2 (grow-and-retry) instead of
    writing out of bounds."""
    from matchtigs_tpu import native
    from matchtigs_tpu.graph.bigraph import Bigraph

    mirror = np.array([1, 0, 3, 2], dtype=np.int32)
    g = Bigraph(4, mirror)
    for i in range(10):
        g.add_biedge_pair(0, 2, 1, i, True, 0)
    lib = native.load()
    diff = np.ascontiguousarray(g.imbalances(), dtype=np.int64)
    mirror64 = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    pairs = np.empty(2 * 4, dtype=np.int64)
    p = native.as_ll_ptr
    rc = lib.balance_breaking_edges(4, p(diff), p(mirror64), p(pairs), 4)
    assert rc == -2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unique_u64_inverse_matches_numpy(seed):
    """native/radix.cpp vs np.unique(return_inverse=True): bit-identical
    ascending unique keys and inverse, across duplicate-heavy and sparse
    key regimes (packed kmers have low entropy in the high bits)."""
    from matchtigs_tpu import native
    from matchtigs_tpu.graph.build import unique_with_inverse

    native.load()
    rng = np.random.default_rng(seed)
    for n, span in [(1 << 16, 1 << 10), (1 << 17, 1 << 40), (70001, 64)]:
        keys = rng.integers(0, span, n, dtype=np.uint64)
        uniq, inv = unique_with_inverse(keys)
        uniq_np, inv_np = np.unique(keys, return_inverse=True)
        assert np.array_equal(uniq, uniq_np)
        assert np.array_equal(inv, inv_np)
        assert uniq.dtype == np.uint64


@pytest.mark.parametrize("seed", [0, 3])
def test_extract_packed_triples_matches_numpy(seed):
    """native/extract.cpp vs the numpy unpack/nonzero/gather chain."""
    from matchtigs_tpu.ops.device_graph import DeviceGraph
    from matchtigs_tpu.ops.sssp import DIST_BITS, extract_packed_candidates

    rng = np.random.default_rng(seed)
    S, C, N = 3000, 8, 500
    cap = (1 << DIST_BITS) - 1
    nodes = rng.integers(0, N, (S, C)).astype(np.int32)
    dist = rng.integers(0, cap + 1, (S, C)).astype(np.int32)
    packed = (nodes << DIST_BITS) | dist
    srcs = rng.integers(0, N, S).astype(np.int32)
    done = rng.random(S) < 0.8
    in_mask = rng.random(N) < 0.5
    to_orig = rng.permutation(N).astype(np.int32)
    dg = DeviceGraph.__new__(DeviceGraph)
    dg.to_orig = to_orig

    tri = extract_packed_candidates(dg, packed, srcs, done, in_mask)

    # numpy oracle
    dn = nodes[done]
    dd = dist[done]
    sr = srcs[done]
    valid = (dd >= 1) & (dd < cap) & in_mask[dn]
    s_idx, c_idx = np.nonzero(valid)
    want = np.stack(
        [
            to_orig[sr[s_idx]].astype(np.int64),
            to_orig[dn[s_idx, c_idx]].astype(np.int64),
            dd[s_idx, c_idx].astype(np.int64),
        ],
        axis=1,
    )
    # row order: native emits row-major per source; the oracle's nonzero
    # is row-major too
    assert np.array_equal(tri.to_triples(), want)


@pytest.mark.parametrize("case", CASES)
def test_break_cycles_native_matches_python(case):
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs

    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    # a full greedytig balance gives dummies of both kinds
    compute_greedytigs(g.copy(), GreedytigConfig(k=k))
    euler.make_eulerian_with_breaking_edges(g, k, 0)
    cycles = euler.eulerian_bicycle_decomposition(g)
    t_n = euler.break_cycles(g, [c.copy() for c in cycles], k)
    t_p = euler.break_cycles_py(g, [c.copy() for c in cycles], k)
    assert len(t_n) == len(t_p)
    for a, b in zip(t_n, t_p):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("big_threshold", [1, 4, 64])
def test_break_cycles_mt_path_matches_serial(case, big_threshold):
    """The intra-cycle MT breaker (forced onto every cycle via a tiny
    big_threshold, 4 threads) == the serial walk bit-for-bit, including
    per-tig source-cycle ids."""
    from matchtigs_tpu import native
    from matchtigs_tpu.algos.greedytigs import (
        GreedytigConfig,
        compute_greedytigs,
    )
    from matchtigs_tpu.ops.walks import Walks

    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    compute_greedytigs(g.copy(), GreedytigConfig(k=k))
    euler.make_eulerian_with_breaking_edges(g, k, 0)
    cycles = euler.eulerian_bicycle_decomposition(g)
    wk = Walks.from_list(cycles)
    lib = native.load()
    p = native.as_ll_ptr
    flat = np.ascontiguousarray(wk.flat, dtype=np.int64)
    coff = np.ascontiguousarray(wk.offsets, dtype=np.int64)
    weights = np.ascontiguousarray(g.weights(), dtype=np.int64)
    dmask = np.ascontiguousarray(g.is_dummy(), dtype=np.int8)
    E = len(flat)

    def run(nt, big):
        tigs = np.empty(E, dtype=np.int64)
        toff = np.empty(max(E, 1), dtype=np.int64)
        tcyc = np.empty(max(E, 1), dtype=np.int64)
        n = lib.break_cycles_flat_mt(
            len(cycles), p(flat), p(coff), p(weights),
            native.as_i8_ptr(dmask), k, nt, p(tigs), p(toff), p(tcyc), big,
        )
        end = int(toff[n - 1]) if n else 0
        return tigs[:end].copy(), toff[:n].copy(), tcyc[:n].copy()

    serial = run(1, 1 << 62)
    forced = run(4, big_threshold)
    for a, b in zip(serial, forced):
        assert np.array_equal(a, b)


def test_stable_order_matches_numpy_argsort():
    """native stable_order_i32 == np.argsort(kind='stable') bit-exactly,
    over uniform, skewed, and degenerate key distributions."""
    from matchtigs_tpu.utils import sorting

    rng = np.random.default_rng(0)
    cases = [
        rng.integers(0, 1_000_000, size=200_000).astype(np.int32),
        rng.integers(0, 7, size=150_000).astype(np.int32),  # heavy dups
        np.zeros(100_000, dtype=np.int32),  # one bucket
        np.sort(rng.integers(0, 50_000, size=120_000)).astype(np.int32),
        rng.integers(0, 50_000, size=120_000)[::-1].copy().astype(np.int32),
    ]
    for i, keys in enumerate(cases):
        n_keys = int(keys.max(initial=0)) + 1
        got = sorting.stable_order(keys, n_keys)
        want = np.argsort(keys, kind="stable").astype(np.int64)
        assert np.array_equal(got, want), i
    # below the native threshold: numpy path
    small = rng.integers(0, 100, size=64).astype(np.int32)
    assert np.array_equal(
        sorting.stable_order(small, 100),
        np.argsort(small, kind="stable"),
    )


def test_greedy_accept_scan_mt_matches_serial():
    """The chunked-speculation MT accept scan must produce the identical
    accepted set and multiplicity updates as the serial scan (exactness
    rests on multiplicity monotonicity)."""
    import os

    import numpy as np

    from matchtigs_tpu import native
    from matchtigs_tpu import testing
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
    from matchtigs_tpu.ops.device_graph import build_device_graph
    from matchtigs_tpu.ops.matching import unbalanced_nodes
    from matchtigs_tpu.ops.sssp import host_dijkstra_candidates

    lib = native.load()
    store, _, k = testing.make_unitig_store(genome_length=60000, k=13, seed=11)
    g = build_bigraph_from_unitigs(store, k)
    out_nodes, in_mask, mult = unbalanced_nodes(g)
    dg = build_device_graph(g)
    cands = host_dijkstra_candidates(dg, out_nodes, k - 1, in_mask)
    cu, cv, cd = (np.ascontiguousarray(x, dtype=np.int64)
                  for x in (cands.u, cands.v, cands.d))
    key = (cd << 56) | (cu << 28) | cv
    order = np.argsort(key)
    cu, cv, cd = cu[order].copy(), cv[order].copy(), cd[order].copy()
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    sm = np.ascontiguousarray(g.self_mirror_mask(), dtype=np.int8)
    M = len(cu)
    p = native.as_ll_ptr
    i8 = native.as_i8_ptr

    m_ser = mult.astype(np.int64, copy=True)  # the scan mutates m in place
    acc_ser = np.empty(M, dtype=np.int64)
    n_ser = lib.greedy_accept_scan_perm(
        M, None, p(cu), p(cv), p(cd), p(m_ser), p(mirror), i8(sm), p(acc_ser))
    assert n_ser > 0

    for chunk in (16, 64, M):  # tiny chunks maximize cross-chunk traffic
        m_mt = mult.astype(np.int64, copy=True)
        acc_mt = np.empty(M, dtype=np.int64)
        n_mt = lib.greedy_accept_scan_mt(
            M, p(cu), p(cv), p(cd), p(m_mt), p(mirror), i8(sm), p(acc_mt),
            min(os.cpu_count() or 1, 4), chunk)
        assert n_mt == n_ser, (chunk, n_mt, n_ser)
        assert np.array_equal(acc_mt[:n_mt], acc_ser[:n_ser]), chunk
        assert np.array_equal(m_mt, m_ser), chunk


def test_fill_padded_adj_matches_numpy():
    """Native MT padded-adjacency fill must equal the numpy stable-sort
    construction (slot order = ascending edge id per node)."""
    import numpy as np

    from matchtigs_tpu import testing
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
    from matchtigs_tpu.ops import device_graph as dgm

    store, _, k = testing.make_unitig_store(genome_length=50000, k=11, seed=3)
    g = build_bigraph_from_unitigs(store, k)
    n = g.n_nodes
    src, dst = g.srcs(), g.dsts()
    w = np.minimum(g.weights(), 1 << 20).astype(np.int32)
    deg = np.bincount(src, minlength=n)
    deg_pad = max(dgm.MAX_DEGREE, int(deg.max(initial=0)))
    native_nbr, native_nw = dgm._fill_padded_adj(
        g, n, src, dst, w, deg_pad, 1 << 20
    )
    # numpy oracle (the ImportError fallback body)
    nbr = np.full((n + 1, deg_pad), n, dtype=np.int32)
    nw = np.full((n + 1, deg_pad), 1 << 20, dtype=np.int32)
    from matchtigs_tpu.utils.sorting import stable_order

    order = stable_order(src, n)
    slot = np.arange(len(src)) - np.repeat(
        np.concatenate([[0], np.cumsum(deg)[:-1]]), deg
    )
    nbr[src[order], slot] = dst[order]
    nw[src[order], slot] = w[order]
    assert np.array_equal(native_nbr, nbr)
    assert np.array_equal(native_nw, nw)


def test_chunked_accept_matches_concat():
    """greedy_accept on a chunk list (fused concat+pack+radix) must equal
    greedy_accept on the concatenated columns."""
    import numpy as np

    import matchtigs_tpu.ops.matching as M
    from matchtigs_tpu.graph.bigraph import Bigraph
    from matchtigs_tpu.ops.candidates import Candidates

    rng = np.random.default_rng(6)
    n = 100000
    mirror = np.arange(n, dtype=np.int32).reshape(-1, 2)[:, ::-1].reshape(-1)
    mirror[n - 2000:] = np.arange(n - 2000, n)  # self-mirror binodes
    g = Bigraph(n, mirror.copy())
    # Honor the production mirror invariant (m[mirror[x]] == -m[x];
    # self-mirror multiplicities in [0, 1]) — the fused scan's accept-count
    # bound (total out-deficit) relies on it.
    m0 = np.empty(n, dtype=np.int64)
    half = rng.integers(-2, 3, n // 2)
    m0[0::2] = half
    m0[1::2] = -half
    m0[n - 2000:] = rng.integers(0, 2, 2000)  # self-mirror mult in [0, 1]
    chunks = []
    for i in range(4):
        m = int(rng.integers(800_000, 1_500_000))  # total > 2^22
        chunks.append(Candidates(
            rng.integers(0, n, m).astype(np.int64),
            rng.integers(0, n, m).astype(np.int64),
            rng.integers(1, 31, m).astype(np.int64)))
    assert sum(len(c) for c in chunks) >= (1 << 22)
    cat = Candidates.concat(chunks)
    m_list, m_cat, m_fused = m0.copy(), m0.copy(), m0.copy()
    a_list = M.greedy_accept(g, chunks, m_list)
    a_cat = M.greedy_accept(g, cat, m_cat)
    assert np.array_equal(a_list, a_cat)
    assert np.array_equal(m_list, m_cat)
    # the fully fused scan (accept_chunks_scan_packed) must be eligible
    # here and bit-identical, including the multiplicity updates
    fused = M._native_accept_chunks_fused(g, chunks, m_fused)
    assert fused is not None
    assert np.array_equal(fused, a_cat)
    assert np.array_equal(m_fused, m_cat)


@pytest.mark.parametrize("stride", [1, 3])
def test_pair_dedup_min_dist_matches_python_oracle(stride):
    """native pair_dedup_min_dist == the packed2 value-sort + boundary
    dedup it replaces (algos/matchtigs.py run_batch): surviving
    (lo, hi, dist) rows in ascending pair order with the minimum dist
    (= max profit) kept per pair, including strided dist columns."""
    import ctypes

    from matchtigs_tpu import native
    from matchtigs_tpu.ops.sssp import _wrap_native_triples

    rng = np.random.default_rng(11)
    n, NB = 100_000, 5000
    lo = rng.integers(0, NB, n).astype(np.int64)
    hi = rng.integers(0, NB, n).astype(np.int64)
    lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
    d = rng.integers(0, 128, n).astype(np.int64)
    if stride == 1:
        dist_arr, d_ptr, est = d, native.as_ll_ptr(d), 1
    else:
        es = np.stack([lo * 0, hi * 0, d], axis=1)  # [n, 3] like run_batch
        es = np.ascontiguousarray(es)
        dist_arr = es[:, 2]
        d_ptr = ctypes.cast(
            es.ctypes.data + 2 * es.strides[1],
            ctypes.POINTER(ctypes.c_longlong),
        )
        est = es.strides[0] // 8

    # python oracle (the packed2 branch)
    packed2 = ((lo * np.int64(NB) + hi) << 7) | dist_arr
    packed2 = packed2.copy()
    packed2.sort()
    key2 = packed2 >> 7
    keep2 = np.empty(n, dtype=bool)
    keep2[0] = True
    np.not_equal(key2[1:], key2[:-1], out=keep2[1:])
    vals2 = packed2[keep2]
    k2 = vals2 >> 7
    exp_lo = k2 // np.int64(NB)
    exp_hi = k2 - exp_lo * np.int64(NB)
    exp_d = vals2 & 127

    lib = native.load()
    buf = ctypes.POINTER(ctypes.c_longlong)()
    cnt = int(
        lib.pair_dedup_min_dist(
            n, native.as_ll_ptr(lo), native.as_ll_ptr(hi), d_ptr, est,
            NB, 4, ctypes.byref(buf),
        )
    )
    trip = _wrap_native_triples(lib, buf, cnt)
    assert cnt == len(exp_lo)
    assert np.array_equal(trip.u, exp_lo)
    assert np.array_equal(trip.v, exp_hi)
    assert np.array_equal(trip.d, exp_d)


def test_gather_edges_cc_matches_numpy():
    """native gather_edges_cc_i64 == np.stack([a,b,c],1)[order] plus
    ccv[order]."""
    from matchtigs_tpu import native

    rng = np.random.default_rng(5)
    n = 50_000
    a = rng.integers(0, 1 << 40, n).astype(np.int64)
    b = rng.integers(0, 1 << 40, n).astype(np.int64)
    c = rng.integers(0, 1 << 40, n).astype(np.int64)
    ccv = rng.integers(0, 1000, n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)
    out3 = np.empty((n, 3), dtype=np.int64)
    out_cc = np.empty(n, dtype=np.int64)
    lib = native.load()
    p = native.as_ll_ptr
    lib.gather_edges_cc_i64(
        n, p(order), p(a), p(b), p(c), p(ccv), p(out3), p(out_cc), 4
    )
    assert np.array_equal(out3, np.stack([a, b, c], axis=1)[order])
    assert np.array_equal(out_cc, ccv[order])


def test_collapse_dedup_resolve_matches_python_epilogue():
    """native collapse_dedup_resolve (fused dedup+unpack+id->node
    resolution) == the python first-of-run dedup + node_of_id/mirror
    epilogue it replaces (algos/matchtigs.py:_collapse_candidates_packed)."""
    from matchtigs_tpu import native
    from matchtigs_tpu.algos.matchtigs import _ID_MASK, _IDB

    rng = np.random.default_rng(17)
    n_ids, n_nodes, n = 4000, 6000, 200_000
    a = rng.integers(0, n_ids, n).astype(np.int64)
    b = rng.integers(0, n_ids, n).astype(np.int64)
    w = rng.integers(0, 128, n).astype(np.int64)
    o = rng.integers(0, 2, n).astype(np.int64)
    su = rng.integers(0, 2, n).astype(np.int64)
    sv = rng.integers(0, 2, n).astype(np.int64)
    lo_in, hi_in = np.minimum(a, b), np.maximum(a, b)
    packed = (
        (lo_in << (_IDB + 10)) | (hi_in << 10) | (w << 3) | (o << 2)
        | (su << 1) | sv
    )
    packed.sort()
    node_of_id = rng.integers(0, n_nodes, n_ids).astype(np.int64)
    mirror = rng.permutation(n_nodes).astype(np.int64)

    # python oracle: first-of-run dedup, self-pair drop, resolve
    key = packed >> 10
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(key[1:], key[:-1], out=first[1:])
    vals = packed[first]
    lo = vals >> (_IDB + 10)
    hi = (vals >> 10) & _ID_MASK
    keep = lo != hi
    vals, lo, hi = vals[keep], lo[keep], hi[keep]
    wk = (vals >> 3) & 127
    oo = (vals >> 2) & 1
    ss = (vals >> 1) & 1
    tt = vals & 1
    a_n, b_n = node_of_id[lo], node_of_id[hi]
    u_can = np.where(oo == 1, a_n, b_n)
    v_can = np.where(oo == 1, b_n, a_n)
    exp_ur = np.where(ss == 1, u_can, mirror[u_can])
    exp_vr = np.where(tt == 1, v_can, mirror[v_can])

    lib = native.load()
    p = native.as_ll_ptr
    cnt = int(
        lib.collapse_dedup_resolve(
            n, p(packed), _IDB, p(node_of_id), p(mirror), 4,
            None, None, None, None, None,
        )
    )
    assert cnt == len(lo)
    out = [np.empty(cnt, dtype=np.int64) for _ in range(5)]
    lib.collapse_dedup_resolve(
        n, p(packed), _IDB, p(node_of_id), p(mirror), 4,
        p(out[0]), p(out[1]), p(out[2]), p(out[3]), p(out[4]),
    )
    for got, exp in zip(out, (lo, hi, wk, exp_ur, exp_vr)):
        assert np.array_equal(got, exp)
