import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.capi import TigGraphBuilder
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.utils import dna


def _builder_from_store(store, k):
    """Feed the builder the same topology the overlap builder derives."""
    g_ref = build_bigraph_from_unitigs(store, k)
    n_uni = len(store)
    b = TigGraphBuilder(n_uni)
    # derive merge calls from shared endpoints: for every consecutive edge
    # pair (in-edge e1 at node v, out-edge e2 at v), merge the unitigs.
    for v in range(g_ref.n_nodes):
        for ei in g_ref.in_edges_of(v):
            for eo in g_ref.out_edges_of(v):
                ua = int(g_ref.handles()[ei])
                ub = int(g_ref.handles()[eo])
                sa = bool(g_ref.forwards()[ei])
                sb = bool(g_ref.forwards()[eo])
                b.merge_nodes(ua, sa, ub, sb)
    weights = store.lengths + 1 - k
    b.build_graph(weights)
    return b, g_ref


def test_builder_reconstructs_topology():
    store, _, k = testing.make_unitig_store(genome_length=3000, k=9, seed=0)
    b, g_ref = _builder_from_store(store, k)
    g = b.graph
    assert g.n_edges == g_ref.n_edges
    # imbalance multiset must match (node numbering differs)
    assert sorted(g.imbalances().tolist()) == sorted(g_ref.imbalances().tolist())


@pytest.mark.parametrize("algo", [1, 2, 3, 4, 5])
def test_compute_tigs_flat_output(algo):
    store, kmers, k = testing.make_unitig_store(genome_length=3000, k=9, seed=1)
    b, _ = _builder_from_store(store, k)
    edges, inserts, limits = b.compute_tigs(algo, k)
    assert limits[-1] == len(edges) == len(inserts)
    # spell tigs from the flat output and check kmer coverage
    seqs = []
    prev = 0
    for lim in limits.tolist():
        tig_edges = edges[prev:lim]
        tig_ins = inserts[prev:lim]
        prev = lim
        parts = []
        for j, (se, ins) in enumerate(zip(tig_edges.tolist(), tig_ins.tolist())):
            if ins > 0:
                continue  # dummy: next edge overlaps by k-1-insert chars
            uid = abs(se)
            seq = store.get(uid)
            if se < 0:
                seq = dna.revcomp(seq)
            if j == 0:
                parts.append(seq)
            else:
                prev_ins = tig_ins[j - 1]
                offset = (k - 1) - int(prev_ins)
                parts.append(seq[offset:])
        seqs.append(np.concatenate(parts))
    ms = testing.kmer_multiset_of_walk_seqs(seqs, k)
    assert np.all(np.unique(ms) == kmers), f"algo {algo} kmer set mismatch"
    if algo in (1, 2, 3):
        assert len(ms) == len(kmers)
