import numpy as np

from matchtigs_tpu import testing
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.sequence_store import SequenceStore
from matchtigs_tpu.utils import dna


def _store_from_ascii(seqs):
    store = SequenceStore()
    for s in seqs:
        store.add_ascii(s)
    store.finalize()
    return store


def test_simple_two_unitig_join():
    # Two unitigs overlapping by k-1 = 3: ACGTA and GTACC
    store = _store_from_ascii([b"ACGTA", b"GTACC"])
    g = build_bigraph_from_unitigs(store, k=4)
    assert g.n_edges == 4  # 2 unitigs x (fwd + mirror)
    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()
    # suffix(ACGTA, 3) == GTA == prefix(GTACC, 3): shared node
    assert g.dsts()[0] == g.srcs()[2]
    # weights are kmer counts: len + 1 - k = 2
    assert np.all(g.weights() == 2)


def test_mirror_edge_is_xor_one():
    store = _store_from_ascii([b"ACGTA", b"GTACC"])
    g = build_bigraph_from_unitigs(store, k=4)
    m = g.mirror_node
    for e in range(0, g.n_edges, 2):
        assert g.srcs()[e + 1] == m[g.dsts()[e]]
        assert g.dsts()[e + 1] == m[g.srcs()[e]]
        assert g.forwards()[e] and not g.forwards()[e + 1]


def test_self_mirror_node_detection():
    # Unitig ending in a reverse-complement palindromic (k-1)-mer: ACGT
    # (k-1=4): revcomp(ACGT) == ACGT.
    store = _store_from_ascii([b"CACGT"])
    g = build_bigraph_from_unitigs(store, k=5)
    sm = g.self_mirror_mask()
    assert sm.sum() == 1  # the ACGT endpoint
    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()


def test_imbalances_sum_zero_and_antisymmetric():
    store, _, k = testing.make_unitig_store(genome_length=5000, k=11, seed=3)
    g = build_bigraph_from_unitigs(store, k)
    diff = g.imbalances()
    m = g.mirror_node
    sm = g.self_mirror_mask()
    assert np.all(diff[m[~sm]] == -diff[~sm])
    assert np.all(np.abs(diff) <= 4)


def test_synthetic_unitigs_are_valid():
    store, kmers, k = testing.make_unitig_store(genome_length=8000, k=13, seed=1)
    # unitig kmers exactly reproduce the kmer set, no duplicates
    seqs = [store.get(i) for i in range(len(store))]
    multiset = testing.kmer_multiset_of_walk_seqs(seqs, k)
    assert len(multiset) == len(kmers)
    assert np.all(np.unique(multiset) == kmers)
    g = build_bigraph_from_unitigs(store, k)
    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()


def test_graph_edge_labels_overlap():
    # debug_assert_graph_edge_labels analog (/root/reference/src/bin.rs:381-416):
    # for consecutive edges, suffix(k-1) of the in-edge == prefix(k-1) of
    # the out-edge.
    store, _, k = testing.make_unitig_store(genome_length=3000, k=9, seed=7)
    g = build_bigraph_from_unitigs(store, k)
    for v in range(g.n_nodes):
        ins = g.in_edges_of(v)
        outs = g.out_edges_of(v)
        for ei in ins:
            for eo in outs:
                si = store.get(int(g.handles()[ei]))
                if not g.forwards()[ei]:
                    si = dna.revcomp(si)
                so = store.get(int(g.handles()[eo]))
                if not g.forwards()[eo]:
                    so = dna.revcomp(so)
                assert np.all(si[-(k - 1) :] == so[: k - 1])
