

def test_csr_incremental_extension_matches_full_rebuild():
    """out/in CSR built once then extended across add_biedge_pairs must
    equal a from-scratch rebuild (order: key ascending, edge id stable)."""
    import numpy as np

    from matchtigs_tpu.graph.bigraph import Bigraph

    rng = np.random.default_rng(7)
    n = 12
    perm = np.array([1, 0, 3, 2, 5, 4, 7, 6, 9, 8, 10, 11], dtype=np.int32)
    g = Bigraph(n, perm.copy())
    for _ in range(10):
        u, v = rng.integers(0, n, 2)
        g.add_biedge_pair(int(u), int(v), 1, 0, True, 0)
    # prime the caches, then append more in two batches
    g.out_csr(), g.in_csr()
    for batch in range(2):
        m = 7 + batch
        g.add_biedge_pairs(
            rng.integers(0, n, m).astype(np.int32),
            rng.integers(0, n, m).astype(np.int32),
            np.ones(m, dtype=np.int64),
            np.full(m, -1, dtype=np.int64),
            np.ones(m, dtype=bool),
            np.zeros(m, dtype=np.int64),
        )
        off_i, ord_i = g.out_csr()
        ioff_i, iord_i = g.in_csr()
        fresh = Bigraph(n, perm.copy())
        fresh.edge_src = g.edge_src.copy()
        fresh.edge_dst = g.edge_dst.copy()
        fresh._n_edges = g.n_edges
        off_f, ord_f = fresh.out_csr()
        ioff_f, iord_f = fresh.in_csr()
        assert np.array_equal(off_i, off_f) and np.array_equal(ord_i, ord_f)
        assert np.array_equal(ioff_i, ioff_f) and np.array_equal(iord_i, iord_f)


def test_csr_cache_shared_across_copy_stays_correct():
    import numpy as np

    from matchtigs_tpu.graph.bigraph import Bigraph

    perm = np.array([1, 0, 3, 2], dtype=np.int32)
    g = Bigraph(4, perm.copy())
    g.add_biedge_pair(0, 2, 1, 0, True, 0)
    g.out_csr()
    g2 = g.copy()
    g2.add_biedge_pair(2, 0, 1, 0, True, 0)  # extends only the copy
    off2, ord2 = g2.out_csr()
    off1, ord1 = g.out_csr()
    assert len(ord1) == 2 and len(ord2) == 4
    assert np.array_equal(off1, np.array([0, 1, 1, 1, 2]))
    src2 = g2.srcs()[ord2]
    assert np.all(np.diff(src2) >= 0)


def test_degree_cache_incremental_matches_fresh():
    """Degrees/imbalances cached across add_biedge_pairs must equal a
    from-scratch recompute, and copies sharing the cache must stay
    consistent after diverging appends."""
    import numpy as np

    from matchtigs_tpu.graph.bigraph import Bigraph

    rng = np.random.default_rng(3)
    n = 10
    perm = np.array([1, 0, 3, 2, 4, 6, 5, 8, 7, 9], dtype=np.int32)
    g = Bigraph(n, perm.copy())
    for _ in range(6):
        u, v = rng.integers(0, n, 2)
        g.add_biedge_pair(int(u), int(v), 1, 0, True, 0)
    imb0 = g.imbalances()  # prime the cache
    g2 = g.copy()  # shares the cache tuple
    for m in (3, 5):
        g.add_biedge_pairs(
            rng.integers(0, n, m).astype(np.int32),
            rng.integers(0, n, m).astype(np.int32),
            np.ones(m, dtype=np.int64),
            np.full(m, -1, dtype=np.int64),
            np.ones(m, dtype=bool),
            np.zeros(m, dtype=np.int64),
        )
        fresh = Bigraph(n, perm.copy())
        fresh.edge_src = g.edge_src.copy()
        fresh.edge_dst = g.edge_dst.copy()
        fresh._n_edges = g.n_edges
        assert np.array_equal(g.out_degrees(), fresh.out_degrees())
        assert np.array_equal(g.in_degrees(), fresh.in_degrees())
        assert np.array_equal(g.imbalances(), fresh.imbalances())
    # the copy's view is unchanged by the original's appends
    assert np.array_equal(g2.imbalances(), imb0)
    # mutating the returned imbalance array must not poison the cache
    imb = g.imbalances()
    imb[:] = -999
    assert not np.array_equal(g.imbalances(), imb)
