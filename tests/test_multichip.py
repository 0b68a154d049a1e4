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
