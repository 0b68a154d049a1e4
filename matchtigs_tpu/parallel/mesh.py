"""Multi-chip scaling: source-batch data parallelism over a device mesh.

The reference's only parallelism is a shared-memory thread pool with a
mutex work queue (SURVEY.md §2.3 P1-P6).  The TPU-native analog per
BASELINE.json: the graph's padded adjacency is replicated to every device
(HBM-resident, read-only), the *source batch* of the bounded shortest-path
phase is sharded across a 1-D mesh axis, and per-device candidate counts /
buffers are merged with XLA collectives (psum / implicit all-gather via
output sharding) riding ICI.  Matching and Euler stitching run replicated
and deterministic on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.device_graph import DeviceGraph
from ..ops.sssp import INF, _can_pack, _sssp_kernel

SOURCE_AXIS = "sources"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host setup: call once per host before any jax use.

    Thin wrapper over ``jax.distributed.initialize``; afterwards
    ``make_mesh()`` spans the whole pod slice and
    :func:`sharded_bounded_sssp` runs SPMD across hosts (every host feeds
    the same deterministic global source array; candidate results are
    allgathered back to every host so matching and Euler stitching stay
    replicated-deterministic).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (SOURCE_AXIS,))


def _make_global(mesh: Mesh, spec: P, host_value: np.ndarray):
    """Build a (possibly multi-host) global array from the host-replicated
    numpy value: every process holds the same full array and contributes
    its addressable shards."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(host_value, sharding)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda idx: host_value[idx]
    )


def _to_host_global(x) -> np.ndarray:
    """Fetch a global array to host numpy on every process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


@functools.partial(
    jax.jit,
    static_argnames=("capacity", "max_rounds", "deg_pad", "packed", "mesh"),
)
def _sharded_sssp_step(
    nbr,
    nw,
    in_mask,
    sources,
    max_weight,
    capacity,
    max_rounds,
    deg_pad,
    packed,
    mesh,
):
    """One full device step over the mesh: sharded batched SSSP + target
    filtering + a psum of candidate counts (collective merge).

    sources are sharded over the mesh axis; graph arrays are replicated.
    Outputs come back with the source axis sharded (allgather happens
    implicitly when the host reads the global arrays).
    """

    def step(nbr, nw, in_mask, sources, max_weight):
        nodes, dist, overflow, _ = _sssp_kernel(
            nbr,
            nw,
            sources,
            max_weight,
            capacity=capacity,
            max_rounds=max_rounds,
            deg_pad=deg_pad,
            packed=packed,
        )
        sentinel = jnp.int32(nbr.shape[0] - 1)
        is_cand = (
            (nodes != sentinel)
            & (dist >= 1)
            & (dist < INF)
            & in_mask[jnp.minimum(nodes, sentinel)]
        )
        cand_dist = jnp.where(is_cand, dist, INF)
        local_count = jnp.sum(is_cand.astype(jnp.int32))
        total_count = jax.lax.psum(local_count, SOURCE_AXIS)
        return nodes, cand_dist, overflow, total_count

    spec_sharded = P(SOURCE_AXIS)
    spec_repl = P()
    out = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_repl, spec_repl, spec_repl, spec_sharded, spec_repl),
        out_specs=(spec_sharded, spec_sharded, spec_sharded, spec_repl),
    )(nbr, nw, in_mask, sources, max_weight)
    return out


def sharded_bounded_sssp(
    dg: DeviceGraph,
    in_mask: np.ndarray,
    sources: np.ndarray,
    max_weight: int,
    capacity: int = 128,
    mesh: Mesh | None = None,
    batch_size: int | None = None,
):
    """Data-parallel batched SSSP over all mesh devices.

    Returns (nodes [S, C], cand_dist [S, C], overflow [S], total_count):
    cand_dist is INF where the entry is not a valid (target, >=1) candidate.
    `batch_size` is the per-device batch; the global batch is
    batch_size * n_devices, looped over the source list with padding so
    only one program shape is ever compiled.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    sources = np.asarray(sources, dtype=np.int32)
    S = len(sources)
    if batch_size is None:
        batch_size = max(1, -(-S // n_dev))
    global_batch = batch_size * n_dev
    mask = np.zeros(dg.n_nodes + 1, dtype=bool)
    mask[: len(in_mask)] = in_mask

    nbr = _make_global(mesh, P(), dg.nbr)
    nw = _make_global(mesh, P(), dg.nw)
    mask_d = _make_global(mesh, P(), mask)

    all_nodes, all_dist, all_over = [], [], []
    total = 0
    for start in range(0, max(S, 1), global_batch):
        chunk = sources[start : start + global_batch]
        n_real = len(chunk)
        if n_real == 0:
            break
        pad = global_batch - n_real
        if pad:
            chunk = np.concatenate(
                [chunk, np.full(pad, dg.n_nodes, dtype=np.int32)]
            )
        sources_d = _make_global(mesh, P(SOURCE_AXIS), chunk)
        nodes, cand_dist, overflow, count = _sharded_sssp_step(
            nbr,
            nw,
            mask_d,
            sources_d,
            jnp.int32(max_weight),
            capacity=capacity,
            max_rounds=int(max_weight),
            deg_pad=dg.deg_pad,
            packed=_can_pack(dg, max_weight),
            mesh=mesh,
        )
        all_nodes.append(_to_host_global(nodes)[:n_real])
        all_dist.append(_to_host_global(cand_dist)[:n_real])
        all_over.append(_to_host_global(overflow)[:n_real])
        total += int(count)
    return (
        np.concatenate(all_nodes),
        np.concatenate(all_dist),
        np.concatenate(all_over),
        total,
    )
