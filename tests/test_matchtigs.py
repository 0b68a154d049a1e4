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
