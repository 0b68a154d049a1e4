"""k > 32 support: the u64 fast paths are bypassed (void-row node keys);
the kernel's packed sort keys still apply (dist < 128)."""

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.sequence_store import SequenceStore
from matchtigs_tpu.utils import dna


def _unitig_store_large_k(k: int, genome_length: int = 4000, seed: int = 0):
    """Split a genome into overlapping chunks (adjacent chunks share k-1
    bases): a valid unitig set for a linear genome at any k."""
    genome = testing.random_genome(genome_length, seed=seed)
    store = SequenceStore()
    chunk = 200
    start = 0
    while start < len(genome) - (k - 1):
        end = min(len(genome), start + chunk)
        store.add(genome[start:end])
        if end == len(genome):
            break
        start = end - (k - 1)
    store.finalize()
    return store, genome


def test_build_and_eulertigs_k63():
    k = 63
    store, genome = _unitig_store_large_k(k)
    g = build_bigraph_from_unitigs(store, k)
    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()
    tigs = compute_eulertigs(g, EulertigConfig(k=k))
    # a linear genome's chunks chain back into one tig spelling the genome
    assert len(tigs) == 1
    from matchtigs_tpu.io.writers import spell_walk

    spelled = spell_walk(g, tigs[0], store, k)
    assert (
        np.array_equal(spelled, genome)
        or np.array_equal(spelled, dna.revcomp(genome))
    )


def test_greedytigs_k63_runs():
    k = 63
    store, _ = _unitig_store_large_k(k, genome_length=6000, seed=1)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_greedytigs(g, GreedytigConfig(k=k, batch_size=64))
    assert len(tigs) >= 1


@pytest.mark.parametrize("k", [65, 97, 127])
def test_pipeline_fuzz_k_above_63(k):
    """End-to-end pipeline fuzz in the k in (63, 127] band (the packed
    integer generators stop at k=63; this uses the string generator)."""
    from matchtigs_tpu import testing
    from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
    from matchtigs_tpu.io.writers import spell_walk
    from matchtigs_tpu.utils import dna

    store, kmers, k = testing.make_unitig_store_strings(
        genome_length=4000, k=k, seed=k, n_sequences=3
    )
    g = build_bigraph_from_unitigs(store, k)
    assert g.verify_node_pairing() and g.verify_edge_mirror_property()

    def canon(s: str) -> str:
        rc = s[::-1].translate(str.maketrans("ACGT", "TGCA"))
        return min(s, rc)

    def spelled_kmer_set(g2, tigs):
        out = set()
        n_spelled = 0
        for t in tigs:
            seq = dna.decode_to_ascii(spell_walk(g2, t, store, k)).decode()
            for j in range(len(seq) - k + 1):
                out.add(canon(seq[j : j + k]))
                n_spelled += 1
        return out, n_spelled

    ge = g.copy()
    tigs_e = compute_eulertigs(ge, EulertigConfig(k=k))
    got, n_spelled = spelled_kmer_set(ge, tigs_e)
    assert got == kmers
    assert n_spelled == len(kmers)  # no duplicates for eulertigs

    gg = g.copy()
    tigs_g = compute_greedytigs(gg, GreedytigConfig(k=k, use_mesh=False))
    got_g, _ = spelled_kmer_set(gg, tigs_g)
    assert got_g == kmers
