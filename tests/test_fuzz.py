"""Randomized differential fuzz across all four algorithms.

For many random graphs: every algorithm must preserve the exact canonical
k-mer set; pathtigs/eulertigs must not duplicate k-mers; the quality
ordering optimal <= greedy <= eulertigs <= pathtigs (cumulative length)
and eulertigs <= pathtigs (count) must hold; all walks must satisfy the
structural invariants.
"""

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
from matchtigs_tpu.algos.matchtigs import MatchtigConfig, compute_matchtigs
from matchtigs_tpu.algos.pathtigs import compute_pathtigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.writers import spelled_length


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_all_algorithms(seed):
    rng = np.random.default_rng(seed)
    genome_length = int(rng.integers(800, 6000))
    k = int(rng.choice([7, 9, 11, 13, 15, 21]))
    n_sequences = int(rng.integers(1, 4))
    store, kmers, k = testing.make_unitig_store(
        genome_length=genome_length, k=k, seed=seed + 100, n_sequences=n_sequences
    )
    if len(store) == 0:
        pytest.skip("degenerate: no unitigs")

    results = {}
    for name, run in [
        ("pathtigs", lambda g: compute_pathtigs(g)),
        ("eulertigs", lambda g: compute_eulertigs(g, EulertigConfig(k=k))),
        (
            "greedytigs",
            lambda g: compute_greedytigs(g, GreedytigConfig(k=k, batch_size=256)),
        ),
        (
            "matchtigs",
            lambda g: compute_matchtigs(g, MatchtigConfig(k=k, batch_size=256)),
        ),
    ]:
        g = build_bigraph_from_unitigs(store, k)
        tigs = run(g)
        testing.assert_tigs_spell_kmer_set(
            g,
            tigs,
            store,
            k,
            kmers,
            allow_duplicates=name in ("greedytigs", "matchtigs"),
        )
        total_len = sum(spelled_length(g, t, k) for t in tigs)
        results[name] = (len(tigs), total_len)

        # structural invariants
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

    assert results["matchtigs"][1] <= results["greedytigs"][1], results
    assert results["greedytigs"][1] <= results["eulertigs"][1], results
    assert results["eulertigs"][1] <= results["pathtigs"][1], results
    assert results["eulertigs"][0] <= results["pathtigs"][0], results
