"""Optimal matchtigs: minimum plain-text representation with repetition.

Capability-equivalent of ``MatchtigAlgorithm``
(/root/reference/src/implementation/matchtigs/mod.rs:131-940):

1. imbalance scan; unbalanced self-mirrors get multiplicity 1 on both
   sides (mod.rs:176-191);
2. all-pairs k-bounded shortest paths between unbalanced nodes via the
   batched device kernel (replacing the threaded Dijkstra fan-out,
   mod.rs:321-541);
3. binodes expand into |imbalance| matching ids shared with their mirror
   (``GraphMatchingNodeMap``,
   /root/reference/src/implementation/mod.rs:188-250); candidate paths
   collapse to deduplicated id-pair edges (mod.rs:273-305);
4. the min-cost perfect matching on the doubled graph + 4 extra nodes per
   WCC (mod.rs:600-719) is solved as an equivalent per-component
   maximum-weight matching with a 2-gadget-node constraint
   (:mod:`matchtigs_tpu.ops.perfect_matching`) using the in-process native
   blossom instead of the external blossom5 subprocess (mod.rs:724-746);
5. matched pairs become cheap dummy biedges; balancing, Eulerian
   decomposition and cycle breaking finish as usual (mod.rs:828-928).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..graph.bigraph import Bigraph
from ..ops import euler
from ..ops.matching import unbalanced_nodes
from ..ops.perfect_matching import optimal_component_matching
from .greedytigs import GreedytigConfig, collect_candidates

logger = logging.getLogger(__name__)


@dataclass
class MatchtigConfig:
    k: int
    initial_capacity: int = 16
    max_capacity: int = 1 << 16
    batch_size: int = 8192
    # If set, the collapsed matching instance and its solution are written
    # to <prefix>.matching / <prefix>.matching.solution — the durable
    # intermediate analog of the reference's blossom5 files
    # (<prefix>.minimalperfectmatching[.solution], matchtigs/mod.rs:600-603).
    matching_file_prefix: str | None = None


def _matching_node_ids(g: Bigraph, diff: np.ndarray):
    """Assign |imbalance| consecutive matching ids per unbalanced binode
    class (shared between a node and its mirror), vectorized.

    Returns (ids_start [N], ids_count [N], total, reps, offsets): for node
    v its matching ids are ids_start[v] .. ids_start[v]+ids_count[v]-1.
    """
    mirror = g.mirror_node
    nodes = np.arange(g.n_nodes, dtype=np.int64)
    canon = np.minimum(nodes, mirror.astype(np.int64))
    counts = np.abs(diff).astype(np.int64)
    # both members of a class carry the same |diff|; scatter to the rep
    class_counts = np.zeros(g.n_nodes, dtype=np.int64)
    class_counts[canon] = counts  # either member writes the same value
    reps = np.flatnonzero(class_counts)
    offsets = np.zeros(len(reps) + 1, dtype=np.int64)
    np.cumsum(class_counts[reps], out=offsets[1:])
    rep_start = np.full(g.n_nodes, -1, dtype=np.int64)
    rep_start[reps] = offsets[:-1]
    ids_start = rep_start[canon]
    ids_count = class_counts[canon]
    return ids_start, ids_count, int(offsets[-1]), reps, offsets


def _collapse_candidates(
    g: Bigraph,
    candidates: np.ndarray,
    ids_start: np.ndarray,
    ids_count: np.ndarray,
    n_ids: int,
):
    """Expand candidate (u, v, w) triples into deduplicated matching-id
    pair edges, vectorized (the GraphMatchingNodeMap product expansion,
    /root/reference/src/implementation/matchtigs/mod.rs:273-305).

    Returns (keys_a, keys_b, w, u, v) arrays, one row per unique id pair.
    """
    if len(candidates) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e, e
    u = candidates[:, 0]
    v = candidates[:, 1]
    w = candidates[:, 2]
    assert np.all(w >= 1), "zero-weight candidate path"
    cu = ids_count[u]
    cv = ids_count[v]
    max_c = int(max(cu.max(initial=1), cv.max(initial=1)))
    parts = []
    for i in range(max_c):
        for j in range(max_c):
            mask = (i < cu) & (j < cv)
            if not mask.any():
                continue
            a = ids_start[u[mask]] + i
            b = ids_start[v[mask]] + j
            keep = a != b  # same-id self-loops only from mirror biedges
            parts.append(
                np.stack(
                    [
                        np.minimum(a, b)[keep],
                        np.maximum(a, b)[keep],
                        w[mask][keep],
                        u[mask][keep],
                        v[mask][keep],
                    ],
                    axis=1,
                )
            )
    allp = np.concatenate(parts)
    key = allp[:, 0] * n_ids + allp[:, 1]
    _, first = np.unique(key, return_index=True)
    rows = allp[first]
    return rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4]


def compute_matchtigs(g: Bigraph, config: MatchtigConfig) -> list[np.ndarray]:
    """Mutates `g` (adds dummy biedges) and returns edge walks."""
    k = config.k
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    diff = g.imbalances()
    logger.info(
        "Found %d nodes with missing outgoing and %d with missing incoming edges",
        len(out_nodes),
        int(in_mask.sum()),
    )

    # All-pairs bounded shortest paths (targets = every in-node).
    gt_config = GreedytigConfig(
        k=k,
        initial_capacity=config.initial_capacity,
        max_capacity=config.max_capacity,
        batch_size=config.batch_size,
    )
    candidates = collect_candidates(g, out_nodes, in_mask, k, gt_config)
    logger.info("Found %d candidate shortest paths", len(candidates))

    # Expand binodes into matching ids and collapse candidates to id pairs.
    ids_start, ids_count, n_ids, reps, offsets = _matching_node_ids(g, diff)
    logger.info("Matching instance has %d expanded nodes", n_ids)

    ka, kb, kw, ku, kv = _collapse_candidates(
        g, candidates, ids_start, ids_count, n_ids
    )
    logger.info("Collapsed to %d matching edges", len(ka))

    # Components of the bidirected graph (doubled edges + mirror pairing);
    # each component's Eulerian tour needs >= 1 break, granted free by the
    # per-component gadget (the reference's 4-extra-nodes-per-WCC).
    comp = _bidirected_components(g)
    id_comp = np.empty(n_ids, dtype=np.int64)
    for i, r in enumerate(reps.tolist()):
        id_comp[int(offsets[i]) : int(offsets[i + 1])] = comp[r]

    matched_pairs: list[tuple[int, int]] = []
    edge_arr = np.stack([ka, kb, kw], axis=1) if len(ka) else np.empty(
        (0, 3), dtype=np.int64
    )
    for c in np.unique(id_comp):
        members = np.flatnonzero(id_comp == c)
        if len(members) == 0:
            continue
        if len(edge_arr):
            sel = id_comp[edge_arr[:, 0]] == c
            comp_edges = edge_arr[sel]
        else:
            comp_edges = edge_arr
        matched_pairs.extend(
            optimal_component_matching(members, comp_edges, k)
        )
    logger.info("Matched %d id pairs", len(matched_pairs))

    if config.matching_file_prefix is not None:
        inst = f"{config.matching_file_prefix}.matching"
        with open(inst, "w") as f:
            f.write(f"{n_ids} {len(ka)}\n")
            for a, b, w in np.stack([ka, kb, kw], axis=1).tolist():
                f.write(f"{a} {b} {w}\n")
        with open(inst + ".solution", "w") as f:
            f.write(f"{n_ids} {len(matched_pairs)}\n")
            for a, b in matched_pairs:
                f.write(f"{a} {b}\n")
        logger.info("Wrote matching instance and solution to %s[.solution]", inst)

    # Apply matching: insert cheap dummy biedges (lookup matched id pairs
    # back to their (u, v, w) via the sorted pair keys).
    pair_keys = ka * n_ids + kb
    key_order = np.argsort(pair_keys)
    sorted_keys = pair_keys[key_order]
    dummy_edge_id = 0
    for a, b in matched_pairs:
        key = min(a, b) * n_ids + max(a, b)
        idx = int(key_order[np.searchsorted(sorted_keys, key)])
        assert pair_keys[idx] == key, "matched pair has no edge"
        dummy_edge_id += 1
        g.add_biedge_pair(
            int(ku[idx]),
            int(kv[idx]),
            weight=int(kw[idx]),
            handle=-1,
            forward=True,
            dummy_id=dummy_edge_id,
        )

    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()

    logger.info("Making graph Eulerian by completing unmatched nodes")
    euler.make_eulerian_with_breaking_edges(g, k, dummy_edge_id)
    if not euler.decomposes_into_eulerian_bicycles(g):
        raise AssertionError("Failed to make the graph Eulerian")
    euler.assert_no_consecutive_dummy_edges(g, k)

    cycles = euler.eulerian_bicycle_decomposition(g)
    logger.info("Found %d Eulerian bicycles", len(cycles))
    tigs = euler.break_cycles(g, cycles, k)
    logger.info("Found %d matchtigs", len(tigs))
    return tigs


def _bidirected_components(g: Bigraph) -> np.ndarray:
    """Connected components over edges + mirror-node pairing (undirected)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = g.n_nodes
    rows = np.concatenate([g.srcs(), np.arange(n, dtype=np.int32)])
    cols = np.concatenate([g.dsts(), g.mirror_node])
    data = np.ones(len(rows), dtype=np.int8)
    adj = coo_matrix((data, (rows, cols)), shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    return labels
