"""Edge cases: palindromic (self-reverse-complement) unitigs, self-loops,
mirror biedges, tiny inputs."""

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
from matchtigs_tpu.algos.pathtigs import compute_pathtigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.sequence_store import SequenceStore
from matchtigs_tpu.io.writers import spell_walk
from matchtigs_tpu.utils import dna


def _store(seqs):
    s = SequenceStore()
    for q in seqs:
        s.add_ascii(q)
    s.finalize()
    return s


def test_palindromic_unitig_mirror_biedge():
    # ACGCGT is its own reverse complement (k=4): the forward edge and its
    # mirror are parallel edges between mirror nodes (a mirror biedge).
    store = _store([b"ACGCGT"])
    k = 4
    g = build_bigraph_from_unitigs(store, k)
    assert g.n_edges == 2
    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()
    assert g.srcs()[0] == g.srcs()[1] and g.dsts()[0] == g.dsts()[1]
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    kmers = testing.kmer_set_of_codes(dna.encode_ascii(b"ACGCGT"), k)
    # a palindromic input sequence inherently spells a kmer and its
    # reverse complement (duplicate canonical kmers) -- real BCALM2 unitig
    # sets split such sequences, but the framework must not crash on them
    testing.assert_tigs_spell_kmer_set(g, tigs, store, k, kmers, allow_duplicates=True)


def test_self_loop_unitig():
    # A circular unitig: prefix (k-1)-mer == suffix (k-1)-mer -> self loop.
    # ACGAC with k=4: prefix ACG, suffix GAC... craft: ACGACG k=4:
    # prefix ACG, suffix ACG -> self loop at node ACG.
    store = _store([b"ACGACG"])
    k = 4
    g = build_bigraph_from_unitigs(store, k)
    assert g.srcs()[0] == g.dsts()[0]  # self loop
    for compute in (
        lambda gg: compute_pathtigs(gg),
        lambda gg: compute_eulertigs(gg, EulertigConfig(k=k)),
        lambda gg: compute_greedytigs(gg, GreedytigConfig(k=k, batch_size=8)),
    ):
        gg = g.copy()
        tigs = compute(gg)
        assert len(tigs) >= 1
        spelled = spell_walk(gg, tigs[0], store, k)
        km = testing.kmer_multiset_of_walk_seqs([spelled], k)
        expected = testing.kmer_set_of_codes(dna.encode_ascii(b"ACGACG"), k)
        assert np.all(np.unique(km) == expected)


def test_single_kmer_unitig():
    store = _store([b"ACGTA"])  # exactly k bases = 1 kmer
    k = 5
    g = build_bigraph_from_unitigs(store, k)
    assert g.weights()[0] == 1
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    assert len(tigs) == 1
    assert bytes(dna.decode_to_ascii(spell_walk(g, tigs[0], store, k))) in (
        b"ACGTA",
        b"TACGT",
    )


def test_two_disconnected_unitigs():
    # endpoint (k-1)-mers (and their reverse complements) all distinct
    store = _store([b"TACTGA", b"GATTCA"])
    k = 5
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    assert len(tigs) == 2


def test_greedytigs_on_balanced_graph():
    # circular genome: perfectly balanced, no sources at all
    store = _store([b"ACGACG"])
    k = 4
    g = build_bigraph_from_unitigs(store, k)
    assert np.all(g.imbalances() == 0)
    tigs = compute_greedytigs(g, GreedytigConfig(k=k, batch_size=8))
    assert len(tigs) == 1


def test_unitig_with_both_palindromic_endpoints():
    """A unitig whose prefix and suffix (k-1)-mers are both reverse-
    complement palindromes forms an isolated component of two unbalanced
    self-mirror nodes; the balancer pairs them and the bicycle breaks
    back into the single unitig."""
    seq = b"ACGTTGCA"  # k=5: prefix ACGT and suffix TGCA are palindromes
    store = _store([seq])
    k = 5
    g = build_bigraph_from_unitigs(store, k)
    sm = g.self_mirror_mask()
    assert sm.sum() == 2
    diff = g.imbalances()
    assert np.all(diff[np.flatnonzero(sm)] == 1)  # both odd parity
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    assert len(tigs) == 1
    spelled = spell_walk(g, tigs[0], store, k)
    assert (
        np.array_equal(spelled, dna.encode_ascii(seq))
        or np.array_equal(spelled, dna.revcomp(dna.encode_ascii(seq)))
    )


def test_greedytigs_with_palindromic_endpoints():
    seq = b"ACGTTGCA"
    store = _store([seq])
    k = 5
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_greedytigs(g, GreedytigConfig(k=k, batch_size=8))
    assert len(tigs) == 1
