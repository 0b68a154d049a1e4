import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
from matchtigs_tpu.algos.matchtigs import MatchtigConfig, compute_matchtigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.writers import spelled_length
from matchtigs_tpu.ops.perfect_matching import (
    _mwm_networkx,
    max_weight_matching_dense,
)


CASES = [
    dict(genome_length=3000, k=9, seed=0),
    dict(genome_length=8000, k=11, seed=1),
    dict(genome_length=2500, k=7, seed=2),
    dict(genome_length=5000, k=13, seed=3, n_sequences=2),
]


def test_native_blossom_matches_networkx():
    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(2, 24))
        w = np.zeros((n, n), dtype=np.int64)
        for u in range(n):
            for v in range(u + 1, n):
                if rng.random() < 0.4:
                    w[u, v] = w[v, u] = int(rng.integers(1, 100))
        _, total = max_weight_matching_dense(w)
        _, total_nx = _mwm_networkx(w)
        assert total == total_nx


@pytest.mark.parametrize("case", CASES)
def test_matchtigs_spell_exact_kmer_set(case):
    store, kmers, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_matchtigs(g, MatchtigConfig(k=k))
    testing.assert_tigs_spell_kmer_set(g, tigs, store, k, kmers, allow_duplicates=True)


@pytest.mark.parametrize("case", CASES)
def test_matchtigs_not_worse_than_greedytigs(case):
    """Optimal matching must achieve cumulative length <= greedy's."""
    store, _, k = testing.make_unitig_store(**case)
    g1 = build_bigraph_from_unitigs(store, k)
    greedy = compute_greedytigs(g1, GreedytigConfig(k=k))
    g2 = build_bigraph_from_unitigs(store, k)
    optimal = compute_matchtigs(g2, MatchtigConfig(k=k))
    len_g = sum(spelled_length(g1, t, k) for t in greedy)
    len_o = sum(spelled_length(g2, t, k) for t in optimal)
    assert len_o <= len_g


@pytest.mark.parametrize("case", CASES)
def test_matchtigs_walks_valid(case):
    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_matchtigs(g, MatchtigConfig(k=k))
    dummies = g.is_dummy()
    seen = np.zeros(g.n_edges, dtype=bool)
    for t in tigs:
        assert np.all(g.dsts()[t[:-1]] == g.srcs()[t[1:]])
        assert not dummies[t[0]] and not dummies[t[-1]]
        d = dummies[t]
        assert not np.any(d[:-1] & d[1:])
        for e in t.tolist():
            assert not seen[e] and not seen[e ^ 1]
            seen[e] = True
            seen[e ^ 1] = True
    assert np.all(seen[: g.n_edges][~dummies])


@pytest.mark.parametrize("seed", range(6))
def test_decomposed_allocation_matches_monolithic(seed):
    """The candidate-component decomposition + free-end knapsack must give
    the same objective as solving each input component whole with its two
    gadget nodes (the reference's doubled-graph construction)."""
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, collect_candidates
    from matchtigs_tpu.algos.matchtigs import (
        _allocate_and_match,
        _bidirected_components,
        _collapse_candidates,
        _matching_node_ids,
    )
    from matchtigs_tpu.ops.matching import unbalanced_nodes
    from matchtigs_tpu.ops.perfect_matching import component_matching_variants

    store, _, k = testing.make_unitig_store(
        genome_length=2500, k=9, seed=seed + 50
    )
    g = build_bigraph_from_unitigs(store, k)
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    diff = g.imbalances()
    cands = collect_candidates(g, out_nodes, in_mask, k, GreedytigConfig(k=k))
    ids_start, ids_count, n_ids, reps, offsets = _matching_node_ids(g, diff)
    ka, kb, kw, ku, kv = _collapse_candidates(g, cands, ids_start, ids_count, n_ids)
    if n_ids == 0:
        pytest.skip("balanced graph")
    comp = _bidirected_components(g)
    rep_counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
    id_comp = np.repeat(comp[reps].astype(np.int64), rep_counts)

    pairs = _allocate_and_match(ka, kb, kw, n_ids, id_comp, k)

    # monolithic oracle: per input component, all ids + edges, 2 gadgets
    edge_arr = np.stack([ka, kb, kw], axis=1) if len(ka) else np.empty((0, 3), np.int64)
    mono_pairs = []
    for c in np.unique(id_comp):
        members = np.flatnonzero(id_comp == c)
        sel = id_comp[edge_arr[:, 0]] == c if len(edge_arr) else np.empty(0, bool)
        v = component_matching_variants(members, edge_arr[sel], k, (2,))
        mono_pairs.extend(v[2][1])

    def profit(ps):
        wmap = {(int(a), int(b)): int(w) for a, b, w in edge_arr.tolist()}
        tot = 0
        for a, b in ps:
            tot += (k - 1 - wmap[(min(a, b), max(a, b))]) * 1000 + 1
        return tot

    assert profit(pairs) == profit(mono_pairs), (
        len(pairs),
        len(mono_pairs),
    )


def test_sparse_blossom_matches_dense_fuzz():
    """The sparse adjacency-list blossom and the dense O(n^3) blossom are
    independent implementations; totals must agree exactly.

    Weight regimes deliberately include tiny ranges (wmax 1-3): tie-heavy
    instances create many simultaneous tight edges and exercise the
    multi-tree solver's cross-tree interactions (interior T-marks, dead
    tree re-adoption, mid-stage expansions) that large random weights
    almost never reach.  The round-2 multi-tree corruption bugs only
    reproduced in this regime.
    """
    from matchtigs_tpu.ops.perfect_matching import (
        max_weight_matching_dense,
        max_weight_matching_sparse,
    )

    import os

    # also audit the dual certificate (complementary slackness) in-process
    os.environ["MATCHTIGS_BLOSSOM_VERIFY"] = "1"
    os.environ["MATCHTIGS_BLOSSOM_VERIFY_ABORT"] = "1"
    try:
        rng = np.random.default_rng(5)
        for trial in range(60):
            n = int(rng.integers(4, 120))
            m = int(rng.integers(n, 3 * n))
            u = rng.integers(0, n, m)
            v = rng.integers(0, n, m)
            keep = u != v
            u, v = u[keep], v[keep]
            if not len(u):
                continue
            wmax = int(rng.choice([1, 2, 3, 8, 1 << 10, 1 << 30]))
            w = rng.integers(1, wmax + 1, len(u)).astype(np.int64)
            edges = np.stack([u, v, w], axis=1)
            W = np.zeros((n, n), dtype=np.int64)
            np.maximum.at(W, (edges[:, 0], edges[:, 1]), edges[:, 2])
            np.maximum.at(W, (edges[:, 1], edges[:, 0]), edges[:, 2])
            W = np.maximum(W, W.T)
            mate_s, tot_s = max_weight_matching_sparse(n, edges)
            mate_d, tot_d = max_weight_matching_dense(W)
            assert tot_s == tot_d, (trial, tot_s, tot_d)
            # mate consistency
            for i, mi in enumerate(mate_s.tolist()):
                if mi >= 0:
                    assert mate_s[mi] == i
    finally:
        os.environ.pop("MATCHTIGS_BLOSSOM_VERIFY", None)
        os.environ.pop("MATCHTIGS_BLOSSOM_VERIFY_ABORT", None)


def test_sparse_blossom_multitree_regressions():
    """Minimized instances that corrupted the round-2 multi-tree solver.

    Instance A (19 nodes, unit weights) made a mid-stage T-blossom
    expansion attach an interior-marked leaf to the wrong tree (the
    blossom's instead of the scanner's), crossing the (mate, label_end)
    chains between trees and eventually augmenting within a single tree.
    Instance B (9 nodes) exposed a missed death-repush: the expansion's
    base child kept its T label via set_label_tree without a members_
    entry, so when its tree died a tight edge never rescanned and the
    final dual adjustment overshot (negative slack).
    """
    from matchtigs_tpu.ops.perfect_matching import (
        max_weight_matching_dense,
        max_weight_matching_sparse,
    )

    inst_a = np.array(
        [[5, 16, 1], [16, 3, 1], [7, 4, 1], [13, 18, 1], [4, 3, 1],
         [1, 8, 1], [11, 1, 1], [7, 11, 1], [2, 1, 1], [14, 10, 1],
         [15, 3, 1], [15, 2, 1], [8, 18, 1], [10, 6, 1], [3, 10, 1],
         [0, 4, 1], [13, 6, 1], [10, 9, 1], [12, 5, 1], [17, 14, 1],
         [13, 16, 1], [12, 17, 1], [18, 9, 1], [15, 11, 1]],
        dtype=np.int64,
    )
    inst_b = np.array(
        [[0, 4, 3], [0, 3, 3], [2, 0, 3], [1, 4, 3], [8, 3, 3],
         [6, 4, 3], [8, 5, 3], [8, 6, 3], [2, 7, 1]],
        dtype=np.int64,
    )
    for edges in (inst_a, inst_b):
        n = int(edges[:, :2].max()) + 1
        W = np.zeros((n, n), dtype=np.int64)
        np.maximum.at(W, (edges[:, 0], edges[:, 1]), edges[:, 2])
        np.maximum.at(W, (edges[:, 1], edges[:, 0]), edges[:, 2])
        W = np.maximum(W, W.T)
        mate_s, tot_s = max_weight_matching_sparse(n, edges)
        _, tot_d = max_weight_matching_dense(W)
        assert tot_s == tot_d
        for i, mi in enumerate(mate_s.tolist()):
            if mi >= 0:
                assert mate_s[mi] == i


def test_component_variants_sparse_equals_dense():
    """component_matching_variants must give identical profits whether the
    component is routed to the sparse solver (default) or the dense one
    (dense_limit large enough)."""
    from matchtigs_tpu.ops.perfect_matching import component_matching_variants

    rng = np.random.default_rng(9)
    k = 31
    for trial in range(20):
        m = int(rng.integers(4, 40))
        members = np.sort(
            rng.choice(np.arange(1000), size=m, replace=False)
        ).astype(np.int64)
        ne = int(rng.integers(m - 1, 3 * m))
        ia = rng.integers(0, m, ne)
        ib = rng.integers(0, m, ne)
        keep = ia != ib
        if not keep.any():
            continue
        edges = np.stack(
            [
                members[ia[keep]],
                members[ib[keep]],
                rng.integers(1, k - 1, keep.sum()).astype(np.int64),
            ],
            axis=1,
        )
        for deletions in [(0,), (0, 1), (0, 1, 2)]:
            vs = component_matching_variants(members, edges, k, deletions, None)
            vd = component_matching_variants(members, edges, k, deletions, 10_000)
            for j in deletions:
                assert vs[j][0] == vd[j][0], (trial, j, vs[j][0], vd[j][0])


def test_matchtigs_giant_component_exact():
    """End-to-end optimal matchtigs where candidate components exceed any
    dense limit: the sparse exact path must produce output no longer than
    greedy matchtigs and spell the exact kmer set."""
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
    from matchtigs_tpu.algos.matchtigs import MatchtigConfig, compute_matchtigs
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs

    store, kmers, k = testing.make_unitig_store(
        genome_length=20000, k=9, seed=21
    )
    g = build_bigraph_from_unitigs(store, k)
    # optimal <= greedy on cumulative length (theory ordering)
    gm = g.copy()
    tigs_m = compute_matchtigs(gm, MatchtigConfig(k=k))
    lm = sum(k - 1 + int(gm.weights()[t].sum()) for t in tigs_m)
    gg = g.copy()
    tigs_g = compute_greedytigs(gg, GreedytigConfig(k=k))
    lg = sum(k - 1 + int(gg.weights()[t].sum()) for t in tigs_g)
    assert lm <= lg
    testing.assert_tigs_spell_kmer_set(gm, tigs_m, store, k, kmers, allow_duplicates=True)


@pytest.mark.parametrize("seed", [0, 2, 5, 9])
def test_collapse_packed_matches_argsort_path(seed):
    """The packed value-sort collapse must produce the identical
    deduplicated (lo, hi, w) set as the argsort path, and its recovered
    (u, v, w) orientation rows must be real candidate shortest paths."""
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, collect_candidates
    from matchtigs_tpu.algos.matchtigs import (
        _collapse_candidates_packed,
        _matching_node_ids,
    )
    from matchtigs_tpu.algos import matchtigs as mt_mod
    from matchtigs_tpu.ops.matching import unbalanced_nodes

    store, _, k = testing.make_unitig_store(
        genome_length=4000, k=9, seed=seed
    )
    g = build_bigraph_from_unitigs(store, k)
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    diff = g.imbalances()
    cands = collect_candidates(g, out_nodes, in_mask, k, GreedytigConfig(k=k))
    ids_start, ids_count, n_ids, reps, offsets = _matching_node_ids(g, diff)
    if n_ids == 0 or len(cands) == 0:
        pytest.skip("balanced graph")

    pa, pb, pw, pu, pv = _collapse_candidates_packed(
        g, cands.u, cands.v, cands.d, ids_start, ids_count, n_ids
    )
    # oracle: the argsort path (force it by calling the body directly)
    u, v, w = cands.u, cands.v, cands.d
    cu, cv = ids_count[u], ids_count[v]
    pc = cu * cv
    multi = pc > 1
    if multi.any():
        um, vm, wm = u[multi], v[multi], w[multi]
        pcm = pc[multi]
        mtot = int(pcm.sum())
        base = np.cumsum(pcm) - pcm
        midx = np.repeat(np.arange(len(um), dtype=np.int64), pcm)
        off = np.arange(mtot, dtype=np.int64) - base[midx]
        cvm = cv[multi][midx]
        i = off // cvm
        j = off - i * cvm
        am = ids_start[um[midx]] + i
        bm = ids_start[vm[midx]] + j
        a = np.concatenate([ids_start[u[~multi]], am])
        b = np.concatenate([ids_start[v[~multi]], bm])
        ridx = np.concatenate(
            [np.flatnonzero(~multi), np.flatnonzero(multi)[midx]]
        )
    else:
        a, b, ridx = ids_start[u], ids_start[v], np.arange(len(u))
    keep = a != b
    kr = ridx[keep]
    lo, hi, wr = np.minimum(a, b)[keep], np.maximum(a, b)[keep], w[kr]
    order = np.lexsort((wr, lo * n_ids + hi))
    key_s = (lo * n_ids + hi)[order]
    first = np.ones(len(key_s), dtype=bool)
    first[1:] = key_s[1:] != key_s[:-1]
    sel = order[first]
    assert np.array_equal(pa, lo[sel]) and np.array_equal(pb, hi[sel])
    assert np.array_equal(pw, wr[sel])
    # orientation rows are real candidates with the right weight
    cand_set = {
        (int(x), int(y), int(z))
        for x, y, z in zip(cands.u, cands.v, cands.d)
    }
    for x, y, z in zip(pu.tolist(), pv.tolist(), pw.tolist()):
        assert (x, y, z) in cand_set


def test_wcc_labels_match_scipy():
    """Native union-find labels must equal scipy's connected_components
    labels exactly (same first-appearance ordering), since component
    iteration order feeds the deterministic free-end allocation."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    from matchtigs_tpu.algos.matchtigs import _connected_component_labels

    rng = np.random.default_rng(4)
    for trial in range(20):
        n = int(rng.integers(2, 400))
        m = int(rng.integers(0, 3 * n))
        rows = rng.integers(0, n, m).astype(np.int64)
        cols = rng.integers(0, n, m).astype(np.int64)
        got = _connected_component_labels(n, rows, cols)
        adj = coo_matrix((np.ones(m, np.int8), (rows, cols)), shape=(n, n))
        _, want = connected_components(adj, directed=False)
        assert np.array_equal(got, want), trial


def test_priced_batch_matches_direct_solve(monkeypatch):
    """The column-generation priced solve (top-T edges + dual pricing)
    must reach the exact optimum on dense instances where the reduction
    genuinely drops edges (degrees >> T=16)."""
    from matchtigs_tpu.ops.perfect_matching import (
        max_weight_matching_sparse,
        max_weight_matching_sparse_batch,
    )

    monkeypatch.setenv("MATCHTIGS_PRICE_THRESHOLD", "1")
    monkeypatch.setenv("MATCHTIGS_BLOSSOM_VERIFY", "1")
    monkeypatch.setenv("MATCHTIGS_BLOSSOM_VERIFY_ABORT", "1")
    rng = np.random.default_rng(8)
    for trial in range(15):
        n = int(rng.integers(30, 120))
        m = int(rng.integers(20 * n, 40 * n))  # avg degree 40-80 >> 16
        u = rng.integers(0, n, m)
        v = rng.integers(0, n, m)
        ok = u != v
        u, v = u[ok], v[ok]
        wmax = int(rng.choice([3, 50, 1 << 20]))
        w = rng.integers(1, wmax + 1, len(u)).astype(np.int64)
        node_off = np.array([0, n], dtype=np.int64)
        edge_off = np.array([0, len(u)], dtype=np.int64)
        mate, total = max_weight_matching_sparse_batch(
            node_off, edge_off, u.astype(np.int64), v.astype(np.int64), w
        )
        edges = np.stack([u, v, w], axis=1).astype(np.int64)
        _, want = max_weight_matching_sparse(n, edges)
        assert total == want, (trial, total, want)
        # mate is a consistent matching
        for a in range(n):
            b = int(mate[a])
            if b >= 0:
                assert int(mate[b]) == a


def test_priced_warm_start_rounds_match_cold(monkeypatch):
    """Pricing rounds warm-started from the previous round's folded duals
    + matching must reach the same exact total as fully cold rounds
    (MATCHTIGS_NO_PRICE_WARM).  Degrees >> top-K force real pricing
    rounds; tie-heavy small weights exercise the parity fallback (warm
    certificate audit -> cold re-solve)."""
    from matchtigs_tpu.ops.perfect_matching import (
        max_weight_matching_sparse,
        max_weight_matching_sparse_batch,
    )

    monkeypatch.setenv("MATCHTIGS_PRICE_THRESHOLD", "1")
    monkeypatch.setenv("MATCHTIGS_BLOSSOM_VERIFY", "1")
    monkeypatch.setenv("MATCHTIGS_BLOSSOM_VERIFY_ABORT", "1")
    rng = np.random.default_rng(123)
    for trial in range(12):
        n = int(rng.integers(40, 150))
        m = int(rng.integers(25 * n, 45 * n))
        u = rng.integers(0, n, m)
        v = rng.integers(0, n, m)
        ok = u != v
        u, v = u[ok].astype(np.int64), v[ok].astype(np.int64)
        wmax = int(rng.choice([2, 7, 1000, 1 << 19]))
        w = rng.integers(1, wmax + 1, len(u)).astype(np.int64)
        node_off = np.array([0, n], dtype=np.int64)
        edge_off = np.array([0, len(u)], dtype=np.int64)
        mate_w, total_w = max_weight_matching_sparse_batch(
            node_off, edge_off, u, v, w
        )
        monkeypatch.setenv("MATCHTIGS_NO_PRICE_WARM", "1")
        _, total_c = max_weight_matching_sparse_batch(
            node_off, edge_off, u, v, w
        )
        monkeypatch.delenv("MATCHTIGS_NO_PRICE_WARM")
        edges = np.stack([u, v, w], axis=1)
        _, want = max_weight_matching_sparse(n, edges)
        assert total_w == total_c == want, (trial, total_w, total_c, want)
        for a in range(n):
            b = int(mate_w[a])
            if b >= 0:
                assert int(mate_w[b]) == a


def test_native_collapse_pack_matches_numpy():
    """The fused native expansion+pack+radix (collapse_expand_pack) must
    produce exactly the sorted packed rows of the numpy expansion path."""
    from matchtigs_tpu import testing
    from matchtigs_tpu.algos import matchtigs as mtg
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
    from matchtigs_tpu.ops.matching import unbalanced_nodes

    store, _, k = testing.make_unitig_store(genome_length=60000, k=13, seed=9)
    g = build_bigraph_from_unitigs(store, k)
    _, _, mult = unbalanced_nodes(g)
    ids_start, ids_count, n_ids, _, _ = mtg._matching_node_ids(g, mult)
    rng = np.random.default_rng(2)
    nodes = np.flatnonzero(ids_count > 0)
    M = 20000
    u = rng.choice(nodes, M).astype(np.int64)
    v = rng.choice(nodes, M).astype(np.int64)
    w = rng.integers(1, k, M).astype(np.int64)
    mirror = g.mirror_node.astype(np.int64)
    is_canon = np.arange(g.n_nodes, dtype=np.int64) <= mirror

    got = mtg._expand_pack_native(g, u, v, w, ids_start, ids_count, is_canon)
    assert got is not None

    a, b, wrow, su, sv = mtg._expand_candidate_ids(
        u, v, w, ids_start, ids_count, extras=(is_canon[u], is_canon[v])
    )
    o = a <= b
    want = np.empty(len(a), dtype=np.int64)
    np.left_shift(np.where(o, a, b), mtg._IDB + 10, out=want)
    want |= np.where(o, b, a) << 10
    want |= wrow << 3
    want |= o.astype(np.int64) << 2
    want |= su.astype(np.int64) << 1
    want |= sv.astype(np.int64)
    want.sort()
    assert np.array_equal(got, want)
