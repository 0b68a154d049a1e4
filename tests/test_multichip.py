import numpy as np

import jax

from matchtigs_tpu import testing
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.ops.device_graph import build_device_graph
from matchtigs_tpu.ops.matching import unbalanced_nodes
from matchtigs_tpu.ops.sssp import INF, batched_bounded_sssp
from matchtigs_tpu.parallel.mesh import make_mesh, sharded_bounded_sssp


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_sssp_matches_single_device():
    store, _, k = testing.make_unitig_store(genome_length=5000, k=11, seed=0)
    g = build_bigraph_from_unitigs(store, k)
    dg = build_device_graph(g)
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    assert len(out_nodes) > 0

    mesh = make_mesh()
    nodes_m, cdist_m, over_m, total = sharded_bounded_sssp(
        dg, in_mask, out_nodes, max_weight=k - 1, capacity=256, mesh=mesh
    )
    assert not over_m.any()

    nodes_1, dist_1, over_1 = batched_bounded_sssp(
        dg, out_nodes, max_weight=k - 1, capacity=256
    )
    assert not over_1.any()

    mask = np.zeros(dg.n_nodes + 1, dtype=bool)
    mask[: len(in_mask)] = in_mask
    count_check = 0
    for i in range(len(out_nodes)):
        got = {
            (int(n), int(d))
            for n, d in zip(nodes_m[i], cdist_m[i])
            if d < INF
        }
        want = {
            (int(n), int(d))
            for n, d in zip(nodes_1[i], dist_1[i])
            if n != dg.sentinel and d >= 1 and mask[n]
        }
        assert got == want
        count_check += len(want)
    assert total == count_check


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    out = jitted(*args)
    assert out[0].shape[0] == 16


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
