import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs
from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.writers import spelled_length


CASES = [
    dict(genome_length=3000, k=9, seed=0),
    dict(genome_length=8000, k=11, seed=1),
    dict(genome_length=2500, k=7, seed=2),
    dict(genome_length=5000, k=13, seed=3, n_sequences=2),
]


@pytest.mark.parametrize("case", CASES)
def test_greedytigs_spell_exact_kmer_set(case):
    store, kmers, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_greedytigs(g, GreedytigConfig(k=k))
    # Greedy matchtigs may repeat k-mers (< k-1 per join) but must cover
    # the exact input k-mer set.
    testing.assert_tigs_spell_kmer_set(g, tigs, store, k, kmers, allow_duplicates=True)


@pytest.mark.parametrize("case", CASES)
def test_greedytigs_not_worse_than_eulertigs(case):
    store, _, k = testing.make_unitig_store(**case)
    g1 = build_bigraph_from_unitigs(store, k)
    euler_tigs = compute_eulertigs(g1, EulertigConfig(k=k))
    g2 = build_bigraph_from_unitigs(store, k)
    greedy_tigs = compute_greedytigs(g2, GreedytigConfig(k=k))
    # Joining via repeated kmers can only reduce count and length.
    assert len(greedy_tigs) <= len(euler_tigs)
    len_g = sum(spelled_length(g2, t, k) for t in greedy_tigs)
    len_e = sum(spelled_length(g1, t, k) for t in euler_tigs)
    assert len_g <= len_e


@pytest.mark.parametrize("case", CASES)
def test_greedytigs_duplication_bounded(case):
    """Each join duplicates at most k-2 kmers (path weight <= k-1 with
    >= 1 real kmer...; the duplicated count equals the dummy weight < k)."""
    store, kmers, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_greedytigs(g, GreedytigConfig(k=k))
    dummies = g.is_dummy()
    weights = g.weights()
    cheap = dummies & (weights < k)
    # every cheap dummy has weight in [1, k-1]
    assert np.all(weights[cheap] >= 1)
    total_dup = int(weights[np.flatnonzero(cheap)].sum()) // 2  # biedge pairs
    got = testing.spelled_kmers(g, tigs, store, k)
    n_dup_spelled = len(got) - len(np.unique(got))
    assert n_dup_spelled <= total_dup


def test_greedytigs_walks_valid():
    store, _, k = testing.make_unitig_store(genome_length=4000, k=9, seed=7)
    g = build_bigraph_from_unitigs(store, k)
    tigs = compute_greedytigs(g, GreedytigConfig(k=k))
    dummies = g.is_dummy()
    seen = np.zeros(g.n_edges, dtype=bool)
    for t in tigs:
        assert np.all(g.dsts()[t[:-1]] == g.srcs()[t[1:]])
        assert not dummies[t[0]] and not dummies[t[-1]]
        # no two consecutive dummies (spelling offset needs an original
        # neighbor; reference invariant mod.rs:319-390)
        d = dummies[t]
        assert not np.any(d[:-1] & d[1:])
        for e in t.tolist():
            assert not seen[e] and not seen[e ^ 1]
            seen[e] = True
            seen[e ^ 1] = True
    orig = ~dummies
    assert np.all(seen[: g.n_edges][orig])


def test_overflow_ladder_mode():
    """The on-device capacity-ladder retry path (overflow_mode='ladder')
    must agree with the host-tail default."""
    store, kmers, k = testing.make_unitig_store(genome_length=4000, k=9, seed=11)
    g1 = build_bigraph_from_unitigs(store, k)
    t1 = compute_greedytigs(
        g1,
        GreedytigConfig(
            k=k, initial_capacity=4, batch_size=64, overflow_mode="ladder"
        ),
    )
    g2 = build_bigraph_from_unitigs(store, k)
    t2 = compute_greedytigs(
        g2,
        GreedytigConfig(
            k=k, initial_capacity=4, batch_size=64, overflow_mode="host"
        ),
    )
    assert len(t1) == len(t2)
    l1 = sum(spelled_length(g1, t, k) for t in t1)
    l2 = sum(spelled_length(g2, t, k) for t in t2)
    assert l1 == l2
    testing.assert_tigs_spell_kmer_set(g1, t1, store, k, kmers, allow_duplicates=True)


def test_renumber_off_matches_on():
    store, _, k = testing.make_unitig_store(genome_length=5000, k=11, seed=12)
    g1 = build_bigraph_from_unitigs(store, k)
    t1 = compute_greedytigs(g1, GreedytigConfig(k=k, renumber=True))
    g2 = build_bigraph_from_unitigs(store, k)
    t2 = compute_greedytigs(g2, GreedytigConfig(k=k, renumber=False))
    assert len(t1) == len(t2)
    assert sum(spelled_length(g1, t, k) for t in t1) == sum(
        spelled_length(g2, t, k) for t in t2
    )


def test_engine_host_equals_device():
    """engine='host' (native Dijkstra) and engine='device' (batched
    kernel) must produce identical accepted candidate sets and tigs."""
    from matchtigs_tpu import testing
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs

    store, kmers, k = testing.make_unitig_store(
        genome_length=8000, k=11, seed=12
    )
    g = build_bigraph_from_unitigs(store, k)
    tigs_h = compute_greedytigs(
        g.copy(), GreedytigConfig(k=k, engine="host")
    )
    gd = g.copy()
    tigs_d = compute_greedytigs(gd, GreedytigConfig(k=k, engine="device"))
    assert len(tigs_h) == len(tigs_d)
    for a, b in zip(tigs_h, tigs_d):
        assert np.array_equal(a, b)
    testing.assert_tigs_spell_kmer_set(
        gd, tigs_d, store, k, kmers, allow_duplicates=True
    )


def test_engine_device_packed_extraction_equals_host():
    """With the mesh disabled, the batched kernel returns the raw packed
    (node << DIST_BITS | dist) matrix and triples come from the native
    extraction pass (native/extract.cpp); tigs must be identical to the
    host engine's."""
    from matchtigs_tpu import testing
    from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs

    store, kmers, k = testing.make_unitig_store(
        genome_length=8000, k=11, seed=12
    )
    g = build_bigraph_from_unitigs(store, k)
    tigs_h = compute_greedytigs(
        g.copy(), GreedytigConfig(k=k, engine="host")
    )
    gd = g.copy()
    tigs_d = compute_greedytigs(
        gd, GreedytigConfig(k=k, engine="device", use_mesh=False)
    )
    assert len(tigs_h) == len(tigs_d)
    for a, b in zip(tigs_h, tigs_d):
        assert np.array_equal(a, b)
    testing.assert_tigs_spell_kmer_set(
        gd, tigs_d, store, k, kmers, allow_duplicates=True
    )


def test_chunked_stage_identical_to_one_shot():
    """The two-chunk overlapped device stage (download/extraction/tail
    hidden under the second chunk's compute) must produce byte-identical
    tigs to the one-shot stage and the host path."""
    import numpy as np

    from matchtigs_tpu import testing
    from matchtigs_tpu.algos.greedytigs import (
        GreedytigConfig,
        SearchStats,
        compute_greedytigs,
    )
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs

    store, _, k = testing.make_unitig_store(genome_length=40000, k=13, seed=7)
    g = build_bigraph_from_unitigs(store, k)

    # tiny batch_size so len(pending) >= 8 * batch_size engages chunking
    cfg_chunked = GreedytigConfig(
        k=k, engine="device", use_mesh=False, batch_size=8,
        initial_capacity=8, overflow_mode="host",
    )
    stats = SearchStats()
    tigs_c = compute_greedytigs(g.copy(), cfg_chunked, stats=stats)
    assert stats.stage_times, "device stage must have run"

    cfg_one = GreedytigConfig(
        k=k, engine="device", use_mesh=False, batch_size=1 << 14,
        initial_capacity=8, overflow_mode="host",
    )
    tigs_o = compute_greedytigs(g.copy(), cfg_one)
    tigs_h = compute_greedytigs(g.copy(), GreedytigConfig(k=k, engine="host"))

    assert np.array_equal(tigs_c.flat, tigs_o.flat)
    assert np.array_equal(tigs_c.offsets, tigs_o.offsets)
    assert np.array_equal(tigs_c.flat, tigs_h.flat)
