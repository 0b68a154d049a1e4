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
