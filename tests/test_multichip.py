import numpy as np
import pytest

import jax

from matchtigs_tpu import testing
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.ops.device_graph import build_device_graph
from matchtigs_tpu.ops.matching import unbalanced_nodes
from matchtigs_tpu.ops.sssp import (
    INF,
    batched_bounded_sssp,
    extract_packed_candidates,
)
from matchtigs_tpu.parallel.mesh import make_mesh, sharded_bounded_sssp


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8


def _candidate_set(cands):
    return set(zip(cands.u.tolist(), cands.v.tolist(), cands.d.tolist()))


@pytest.mark.parametrize("schedule", ["pool", "batch"])
def test_sharded_sssp_matches_single_device(schedule):
    """The mesh path runs the identical pipeline (packed download +
    native extraction) and must produce the same candidate triples as
    the single-device path — under both device schedulers."""
    store, _, k = testing.make_unitig_store(genome_length=5000, k=11, seed=0)
    g = build_bigraph_from_unitigs(store, k)
    dg = build_device_graph(g)
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    assert len(out_nodes) > 0
    mask = np.zeros(dg.n_nodes + 1, dtype=bool)
    mask[: len(in_mask)] = in_mask

    mesh = make_mesh()
    sources = np.asarray(out_nodes, dtype=np.int32)
    packed_m, dist_m, over_m, srcs_m = sharded_bounded_sssp(
        dg, sources, max_weight=k - 1, capacity=256, mesh=mesh, batch_size=4,
        schedule=schedule,
    )
    assert dist_m is None, "mesh path must use packed downloads"
    real = srcs_m != dg.n_nodes
    assert int(real.sum()) == len(sources)
    assert not over_m[real].any()
    cands_m = extract_packed_candidates(
        dg, packed_m, srcs_m, real & ~over_m, mask
    )

    packed_1, dist_1, over_1 = batched_bounded_sssp(
        dg, sources, max_weight=k - 1, capacity=256, return_packed=True
    )
    assert not over_1.any()
    cands_1 = extract_packed_candidates(dg, packed_1, sources, ~over_1, mask)

    assert len(cands_m) == len(cands_1) > 0
    assert _candidate_set(cands_m) == _candidate_set(cands_1)


def test_sharded_sssp_unpacked_fallback():
    """Graphs beyond the pack_out id range use two-key sorts and
    unpacked downloads on the mesh path too (same numbers)."""
    from matchtigs_tpu.parallel import mesh as mesh_mod

    store, _, k = testing.make_unitig_store(genome_length=3000, k=11, seed=3)
    g = build_bigraph_from_unitigs(store, k)
    dg = build_device_graph(g)
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    assert len(out_nodes) > 0
    mask = np.zeros(dg.n_nodes + 1, dtype=bool)
    mask[: len(in_mask)] = in_mask
    sources = np.asarray(out_nodes, dtype=np.int32)

    # force the unpacked path by patching the packing predicates
    orig_pack, orig_pack_out = mesh_mod._can_pack, mesh_mod._can_pack_out
    mesh_mod._can_pack = lambda *a: False
    mesh_mod._can_pack_out = lambda *a: False
    try:
        nodes_m, dist_m, over_m, srcs_m = sharded_bounded_sssp(
            dg, sources, max_weight=k - 1, capacity=256, batch_size=4
        )
    finally:
        mesh_mod._can_pack, mesh_mod._can_pack_out = orig_pack, orig_pack_out
    assert dist_m is not None
    real = srcs_m != dg.n_nodes
    assert not over_m[real].any()

    got = set()
    for i in np.flatnonzero(real):
        s = int(srcs_m[i])
        for n, d in zip(nodes_m[i], dist_m[i]):
            if int(n) != dg.sentinel and 1 <= int(d) < INF and mask[int(n)]:
                got.add((s, int(n), int(d)))

    packed_1, _, over_1 = batched_bounded_sssp(
        dg, sources, max_weight=k - 1, capacity=256, return_packed=True
    )
    cands_1 = extract_packed_candidates(dg, packed_1, sources, ~over_1, mask)
    assert got == _candidate_set(cands_1)


def test_sharded_accept_key_sort_matches_numpy():
    """The mesh-sharded odd-even merge-split sort is a full global sort
    (exact, including duplicate keys and the padded tail)."""
    from matchtigs_tpu.parallel.mesh import sharded_accept_key_sort

    rng = np.random.default_rng(0)
    for m in (0, 1, 7, 16, 1000, 54321):
        keys = rng.integers(0, 1 << 62, m, dtype=np.int64)
        got = sharded_accept_key_sort(keys)
        assert np.array_equal(got, np.sort(keys)), m
    # low-entropy duplicates (the d<<56 key space is highly clustered)
    keys = rng.integers(0, 5, 10000, dtype=np.int64)
    assert np.array_equal(sharded_accept_key_sort(keys), np.sort(keys))


def test_mesh_accept_path_matches_host_accept():
    """pack_accept_keys -> sharded sort -> packed scan must accept the
    same set (and multiplicity updates) as the host greedy_accept."""
    import matchtigs_tpu.ops.matching as M
    from matchtigs_tpu.graph.bigraph import Bigraph
    from matchtigs_tpu.ops.candidates import Candidates
    from matchtigs_tpu.parallel.mesh import sharded_accept_key_sort

    rng = np.random.default_rng(3)
    n = 5000
    mirror = np.arange(n, dtype=np.int32).reshape(-1, 2)[:, ::-1].reshape(-1)
    mirror[n - 200:] = np.arange(n - 200, n)  # self-mirrors
    g = Bigraph(n, mirror.copy())
    m0 = np.empty(n, dtype=np.int64)
    half = rng.integers(-2, 3, n // 2)
    m0[0::2] = half
    m0[1::2] = -half
    m0[n - 200:] = rng.integers(0, 2, 200)
    chunks = [
        Candidates(
            rng.integers(0, n, m).astype(np.int64),
            rng.integers(0, n, m).astype(np.int64),
            rng.integers(1, 31, m).astype(np.int64),
        )
        for m in (4000, 1, 2500)
    ]
    keys = M.pack_accept_keys(chunks)
    assert keys is not None
    m_mesh, m_host = m0.copy(), m0.copy()
    acc_mesh = M.greedy_accept_sorted_keys(
        g, sharded_accept_key_sort(keys), m_mesh
    )
    acc_host = M.greedy_accept(g, Candidates.concat(chunks), m_host)
    assert np.array_equal(acc_mesh, acc_host)
    assert np.array_equal(m_mesh, m_host)


def test_mesh_greedytigs_identical_to_single_device():
    """Full-pipeline parity: greedy matchtigs over the virtual 8-device
    mesh produce byte-identical tigs to the single-device/host path."""
    from matchtigs_tpu.algos.greedytigs import (
        GreedytigConfig,
        SearchStats,
        compute_greedytigs,
    )

    store, kmers, k = testing.make_unitig_store(
        genome_length=40000, k=13, seed=7
    )
    g = build_bigraph_from_unitigs(store, k)

    cfg_mesh = GreedytigConfig(
        k=k, use_mesh=True, engine="device", batch_size=8,
        host_route_threshold=-1, initial_capacity=64,
    )
    stats = SearchStats()
    g_mesh = g.copy()
    tigs_mesh = compute_greedytigs(g_mesh, cfg_mesh, stats=stats)
    assert stats.stage_times, "mesh stage must have run"

    cfg_host = GreedytigConfig(k=k, engine="host")
    tigs_host = compute_greedytigs(g.copy(), cfg_host)

    assert len(tigs_mesh) == len(tigs_host)
    assert np.array_equal(tigs_mesh.flat, tigs_host.flat)
    assert np.array_equal(tigs_mesh.offsets, tigs_host.offsets)

    # spelled kmers must equal the input set
    ms = testing.kmer_multiset_of_walk_seqs(
        list(_spell_all(g_mesh, tigs_mesh, store, k)), k
    )
    assert np.all(np.unique(ms) == kmers)


def _spell_all(g, tigs, store, k):
    from matchtigs_tpu.io.writers import spell_walks_flat

    flat, offsets = spell_walks_flat(g, tigs, store, k)
    lo = 0
    for end in offsets.tolist():
        yield flat[lo:end]
        lo = end


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    out = jitted(*args)
    assert out[0].shape[0] == 16


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
