import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
from matchtigs_tpu.algos.pathtigs import compute_pathtigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.writers import spell_walk, spelled_length
from matchtigs_tpu.ops import euler


CASES = [
    dict(genome_length=2000, k=11, seed=0),
    dict(genome_length=8000, k=15, seed=1),
    dict(genome_length=5000, k=9, seed=2),   # denser graph, more branching
    dict(genome_length=3000, k=7, seed=3),   # heavy branching
    dict(genome_length=4000, k=13, seed=4, n_sequences=3),
]


@pytest.mark.parametrize("case", CASES)
def test_pathtigs_spell_exact_kmer_set(case):
    store, kmers, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_pathtigs(g)
    testing.assert_tigs_spell_kmer_set(g, tigs, store, k, kmers, allow_duplicates=False)


@pytest.mark.parametrize("case", CASES)
def test_eulertigs_spell_exact_kmer_set(case):
    store, kmers, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    testing.assert_tigs_spell_kmer_set(g, tigs, store, k, kmers, allow_duplicates=False)


@pytest.mark.parametrize("case", CASES)
def test_eulertigs_not_worse_than_pathtigs(case):
    store, _, k = testing.make_unitig_store(**case)
    g1 = build_bigraph_from_unitigs(store, k)
    path_tigs = compute_pathtigs(g1)
    g2 = build_bigraph_from_unitigs(store, k)
    euler_tigs = compute_eulertigs(g2, EulertigConfig(k=k))
    # Eulertigs is the *minimum* representation without repetition, so its
    # string count and cumulative length cannot exceed any walk cover's.
    assert len(euler_tigs) <= len(path_tigs)
    len_euler = sum(spelled_length(g2, t, k) for t in euler_tigs)
    len_path = sum(spelled_length(g1, t, k) for t in path_tigs)
    assert len_euler <= len_path


@pytest.mark.parametrize("case", CASES)
def test_spelled_length_matches_materialized(case):
    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    for t in tigs:
        assert spelled_length(g, t, k) == len(spell_walk(g, t, store, k))


def test_eulerian_balancer_mirror_nodes_unit():
    """Port of the reference's only unit test
    (/root/reference/src/implementation/mod.rs:762-785): 8-node graph with
    self-mirror nodes; the balancer must terminate and balance everything."""
    from matchtigs_tpu.graph.bigraph import Bigraph

    mirror = np.array([1, 0, 2, 3, 5, 4, 6, 7], dtype=np.int32)
    g = Bigraph(8, mirror)
    # biedges: (0->3, weight 0), (2->0), (6->4), (7->4) as dummy pairs
    g.add_biedge_pair(0, 3, 0, 1, True, 1)
    g.add_biedge_pair(2, 0, 0, 2, True, 2)
    g.add_biedge_pair(6, 4, 0, 3, True, 3)
    g.add_biedge_pair(7, 4, 0, 4, True, 4)
    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()
    euler.make_eulerian_with_breaking_edges(g, k=4, dummy_edge_id=5)
    assert euler.decomposes_into_eulerian_bicycles(g)
    assert g.verify_edge_mirror_property()


@pytest.mark.parametrize("case", CASES)
def test_walks_are_connected_and_edge_disjoint(case):
    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    seen = np.zeros(g.n_edges, dtype=bool)
    for t in tigs:
        # connectivity: dst of each edge == src of the next
        assert np.all(g.dsts()[t[:-1]] == g.srcs()[t[1:]])
        for e in t.tolist():
            assert not seen[e] and not seen[e ^ 1], "biedge used twice"
            seen[e] = True
            seen[e ^ 1] = True
    # every original biedge covered exactly once
    orig = ~g.is_dummy()
    assert np.all(seen[: g.n_edges][orig])
