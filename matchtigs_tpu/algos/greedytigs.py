"""Greedy matchtigs: near-optimal tigs with bounded k-mer repetition.

Capability-equivalent of ``GreedytigAlgorithm``
(/root/reference/src/implementation/greedytigs/mod.rs:200-801), restructured
TPU-first (SURVEY.md §7):

1. imbalance scan (vectorized) -> out-nodes / in-node target mask;
2. batched k-bounded shortest paths on device
   (:func:`matchtigs_tpu.ops.sssp.batched_bounded_sssp`) instead of
   per-source heap Dijkstras under a thread pool; sources whose search hit
   the capacity limit are retried with a larger working set (the staged
   parallelism analog of greedytigs/mod.rs:537-644);
3. deterministic global greedy matching over the candidate triples
   (:func:`matchtigs_tpu.ops.matching.greedy_accept`) replaces the
   lock-based online matching;
4. accepted paths become cheap dummy biedges (weight = distance < k); the
   deterministic breaking balancer + Eulerian decomposition + cycle break
   finish exactly as in eulertigs.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..graph.bigraph import Bigraph
from ..ops import euler
from ..ops.device_graph import build_device_graph
from ..ops.matching import greedy_accept, unbalanced_nodes
from ..ops.sssp import batched_bounded_sssp

logger = logging.getLogger(__name__)


@dataclass
class GreedytigConfig:
    k: int
    # Initial per-source working-set capacity for the batched search;
    # overflowing sources are retried with 4x capacity until complete.
    initial_capacity: int = 128
    max_capacity: int = 1 << 16
    batch_size: int = 1024


def collect_candidates(
    g: Bigraph,
    out_nodes: np.ndarray,
    in_mask: np.ndarray,
    k: int,
    config: GreedytigConfig,
) -> np.ndarray:
    """Run the batched bounded SSSP and extract (out, in, dist) triples."""
    dg = build_device_graph(g)
    sentinel = dg.sentinel
    triples: list[np.ndarray] = []

    pending = np.asarray(out_nodes, dtype=np.int32)
    capacity = config.initial_capacity
    batch_size = config.batch_size
    while len(pending) > 0:
        nodes, dist, overflow = batched_bounded_sssp(
            dg, pending, max_weight=k - 1, capacity=capacity, batch_size=batch_size
        )
        done = ~overflow
        if np.any(done):
            dn = nodes[done]
            dd = dist[done]
            srcs = pending[done]
            valid = (dn != sentinel) & (dd >= 1)
            valid &= in_mask[np.minimum(dn, len(in_mask) - 1)] & (
                dn != sentinel
            )
            s_idx, c_idx = np.nonzero(valid)
            if len(s_idx):
                triples.append(
                    np.stack(
                        [
                            srcs[s_idx].astype(np.int64),
                            dn[s_idx, c_idx].astype(np.int64),
                            dd[s_idx, c_idx].astype(np.int64),
                        ],
                        axis=1,
                    )
                )
        pending = pending[overflow]
        if len(pending) > 0:
            if capacity >= config.max_capacity:
                raise RuntimeError(
                    f"SSSP capacity {capacity} exhausted for {len(pending)} sources"
                )
            capacity *= 4
            batch_size = max(8, batch_size // 4)
            logger.info(
                "Retrying %d overflowed sources with capacity %d",
                len(pending),
                capacity,
            )

    if not triples:
        return np.empty((0, 3), dtype=np.int64)
    return np.concatenate(triples)


def compute_greedytigs(g: Bigraph, config: GreedytigConfig) -> list[np.ndarray]:
    """Mutates `g` (adds dummy biedges) and returns edge walks."""
    k = config.k
    out_nodes, in_mask, mult = unbalanced_nodes(g)
    logger.info(
        "Found %d nodes with missing outgoing and %d with missing incoming edges",
        len(out_nodes),
        int(in_mask.sum()),
    )

    candidates = collect_candidates(g, out_nodes, in_mask, k, config)
    logger.info("Found %d candidate shortest paths", len(candidates))

    accepted = greedy_accept(g, candidates, mult)
    logger.info("Accepted %d paths as cheap dummy edges", len(accepted))

    dummy_edge_id = 0
    if len(accepted):
        n = len(accepted)
        dummy_ids = np.arange(1, n + 1, dtype=np.int64)
        g.add_biedge_pairs(
            src=accepted[:, 0].astype(np.int32),
            dst=accepted[:, 1].astype(np.int32),
            weight=accepted[:, 2],
            handle=np.full(n, -1, dtype=np.int64),
            forward=np.ones(n, dtype=bool),
            dummy_id=dummy_ids,
        )
        dummy_edge_id = n

    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()

    logger.info("Making graph Eulerian by adding breaking dummy edges")
    euler.make_eulerian_with_breaking_edges(g, k, dummy_edge_id)
    if not euler.decomposes_into_eulerian_bicycles(g):
        raise AssertionError("Failed to make the graph Eulerian")

    cycles = euler.eulerian_bicycle_decomposition(g)
    logger.info("Found %d Eulerian bicycles", len(cycles))
    tigs = euler.break_cycles(g, cycles, k)
    logger.info("Found %d greedytigs", len(tigs))
    return tigs
