"""Real 2-process multi-host test over the DCN code path.

Spawns two python processes (4 virtual CPU devices each) that call
``initialize_distributed`` and run the sharded bounded SSSP over the
global 8-device mesh; both must produce the full candidate set,
identical to each other and to the single-process result — proving the
multi-host branches (``jax.make_array_from_callback`` with
non-addressable shards, ``process_allgather``) actually execute, not
just the single-process virtual mesh.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_sssp(tmp_path):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    outs = [tmp_path / f"proc{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(WORKER),
                str(i),
                "2",
                str(port),
                str(outs[i]),
                str(REPO),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    res = [np.load(o) for o in outs]
    assert int(res[0]["n_devices"]) == 8
    for key in ("u", "v", "d", "tigs_flat", "tigs_offsets"):
        assert np.array_equal(res[0][key], res[1][key]), key

    # single-process reference on the in-process 8-device mesh
    from matchtigs_tpu import testing
    from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
    from matchtigs_tpu.ops.device_graph import build_device_graph
    from matchtigs_tpu.ops.matching import unbalanced_nodes
    from matchtigs_tpu.ops.sssp import (
        batched_bounded_sssp,
        extract_packed_candidates,
    )

    store, _, k = testing.make_unitig_store(genome_length=5000, k=11, seed=0)
    g = build_bigraph_from_unitigs(store, k)
    dg = build_device_graph(g)
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    mask = np.zeros(dg.n_nodes + 1, dtype=bool)
    mask[: len(in_mask)] = in_mask
    sources = np.asarray(out_nodes, dtype=np.int32)
    packed, _, over = batched_bounded_sssp(
        dg, sources, max_weight=k - 1, capacity=256, return_packed=True
    )
    cands = extract_packed_candidates(dg, packed, sources, ~over, mask)
    order = np.lexsort((cands.d, cands.v, cands.u))
    assert np.array_equal(res[0]["u"], cands.u[order])
    assert np.array_equal(res[0]["v"], cands.v[order])
    assert np.array_equal(res[0]["d"], cands.d[order])

    # the 2-process full pipeline (sliced host tails + allgather + mesh
    # acceptance sort) must equal the plain single-process host path
    from matchtigs_tpu.algos.greedytigs import (
        GreedytigConfig,
        compute_greedytigs,
    )

    tigs_host = compute_greedytigs(g.copy(), GreedytigConfig(k=k, engine="host"))
    assert np.array_equal(res[0]["tigs_flat"], tigs_host.flat)
    assert np.array_equal(res[0]["tigs_offsets"], tigs_host.offsets)
